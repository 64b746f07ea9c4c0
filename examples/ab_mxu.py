"""Honest sync-mode A/B: round-8 gather-cost reductions.

Arms (benchmark scene, defaults otherwise — compact_decode="loop",
march_ladder, tile chunks, premul):

  base          : r7 ship — XLA serial gathers, no warp tables
  tables        : warp d/e tables (2 serial gathers/level instead of 4)
  mxu           : tables + MXU one-hot gather for the march majorant
                  fetch, transfer LUT, warp tables, envmap bilinear
                  (the shipped "auto" TPU path)
  mxu-march     : MXU majorant fetch only (tables off) — attribution
  mxu-phase2 /  : decode-structure re-check under the new cost model
  mxu-mixed       (the r6 single-loop verdict assumed serial marches)
  mxu-unchunked : chunk-size re-check
  mxu-spatial   : voxel-order decode compaction sort key
  mxu-ladder2   : n/2 shrink rungs instead of n/4
  mxu-pair      : x-pair packed dense — 4 decode gathers instead of 8

All arms are bit-identical or estimator-exact by construction
(tests/test_mxu_gather.py, test_scene warp/envmap pins,
test_pair_decode_bit_identical, ladder/spatial estimator pins).
Protocol: NOTES.md ROUND-5 DISCOVERY — fetch first, then per-program
walls.

Usage: python examples/ab_mxu.py [size [width height]]
"""

from __future__ import annotations

import os
import sys as _sys
import time

import numpy as np

_sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_atlas import _build_renderer  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    size = int(_sys.argv[1]) if len(_sys.argv) > 1 else 256
    width = int(_sys.argv[2]) if len(_sys.argv) > 2 else 960
    height = int(_sys.argv[3]) if len(_sys.argv) > 3 else 540

    @jax.jit
    def trivial(x):
        return x + 1.0

    trivial(jnp.float32(1.0)).block_until_ready()
    t0 = time.perf_counter()
    float(np.asarray(trivial(jnp.float32(41.0))))
    print(f"fetch (sync-mode switch): {time.perf_counter() - t0:.1f} s", flush=True)

    from volxel_tpu.render.pathtrace import render_sample
    from volxel_tpu.render.sampling import DeviceGrid, pack_dense_pairs
    from volxel_tpu.scene.environment import EnvState

    r, _ = _build_renderer(size, width=width, height=height)
    r.render_frame()
    ops = list(r._cached_operands)
    config = ops[0]
    env_i = next(i for i, o in enumerate(ops) if isinstance(o, EnvState))
    env = ops[env_i]
    env_bare = env._replace(warp_d=None, warp_e=None)
    grid_i = next(i for i, o in enumerate(ops) if isinstance(o, DeviceGrid))
    grid_pair = ops[grid_i]._replace(
        dense_pair=pack_dense_pairs(ops[grid_i].dense)
    )

    arms = {
        "base": (config._replace(mxu_gather=False), env_bare),
        "tables": (config._replace(mxu_gather=False), env),
        "mxu": (config._replace(mxu_gather=True), env),
        "mxu-march": (config._replace(mxu_gather=True), env_bare),
        # decode-structure re-check: with the march majorant fetch on the
        # MXU, the single-loop form's per-collision-iteration argsort may
        # lose to the two-phase park-and-batch decode (fewer sorts) —
        # the r6 verdict was taken under the serial-gather cost model
        "mxu-phase2": (
            config._replace(mxu_gather=True, compact_decode="phase2"), env),
        "mxu-mixed": (
            config._replace(mxu_gather=True, compact_decode="mixed"), env),
        "mxu-unchunked": (
            config._replace(mxu_gather=True, chunk_size=width * height), env),
        # spatial-key decode compaction: serialized gather latency drops
        # with index locality, and the sort is already paid
        "mxu-spatial": (
            config._replace(mxu_gather=True, compact_decode="loop-spatial"),
            env),
        # finer shrink rungs: halve the dead-width slack per ladder stage
        "mxu-ladder2": (
            config._replace(mxu_gather=True, ladder_factor=2), env),
        # x-pair packed dense: 4 decode gathers instead of 8
        "mxu-pair": (config._replace(mxu_gather=True), env, grid_pair),
    }

    def run(cfg, e, fi, g=None):
        o = list(ops)
        o[0] = cfg
        o[env_i] = e
        if g is not None:
            o[grid_i] = g
        return render_sample(*o, jnp.uint32(fi))

    print("== compiling all arms (excluded from timing)", flush=True)
    for tag, arm in arms.items():
        cfg, e, *g = arm
        t0 = time.perf_counter()
        run(cfg, e, 77, *g).block_until_ready()
        print(f"  {tag}: first run {time.perf_counter() - t0:.1f} s", flush=True)

    times: dict[str, list[float]] = {t: [] for t in arms}
    for p in range(3):
        print(f"== pass {p}", flush=True)
        for tag, arm in arms.items():
            cfg, e, *g = arm
            t0 = time.perf_counter()
            run(cfg, e, 100 + p, *g).block_until_ready()
            dt = time.perf_counter() - t0
            times[tag].append(dt)
            print(f"  {tag}: {dt:.3f} s", flush=True)

    print("== medians", flush=True)
    base = float(np.median(times["base"]))
    for tag, xs in times.items():
        m = float(np.median(xs))
        print(f"  {tag}: {m:.3f} s/sample ({(m / base - 1) * 100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
