"""Honest sync-mode A/B: in-loop shrink ladder for the single-loop march.

Arms (960x540, 256^3 benchmark scene, defaults otherwise):

  base@16200     : shipped defaults (compact_decode="loop", no ladder)
  ladder@16200   : march_ladder=True at the default chunk target
  ladder@64800   : the ladder absorbs in-chunk divergence, so the
  ladder@129600    chunk-size optimum may move up (fewer fixed costs)

Sizing data: examples/steps_decay.py — camera wavefronts run ~10-18%
occupied while the slowest lane marches ~100 iterations; width x
max_steps is ~9x sum(steps); ladder model predicted 3-4.5x on the march
loops. Protocol: NOTES.md ROUND-5 DISCOVERY.
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

    @jax.jit
    def trivial(x):
        return x + 1.0

    trivial(jnp.float32(1.0)).block_until_ready()
    t0 = time.perf_counter()
    float(np.asarray(trivial(jnp.float32(41.0))))
    print(f"fetch (sync-mode switch): {time.perf_counter() - t0:.1f} s", flush=True)

    from volxel_tpu.render.pathtrace import render_sample

    r, _ = _build_renderer(256, width=960, height=540)
    r.render_frame()
    ops = list(r._cached_operands)
    config = ops[0]

    arms = {
        "base@16200": config,
        "ladder@16200": config._replace(march_ladder=True),
        "ladder@64800": config._replace(march_ladder=True, chunk_size=64800),
        "ladder@129600": config._replace(march_ladder=True, chunk_size=129600),
    }

    def run(cfg, fi):
        o = list(ops)
        o[0] = cfg
        return render_sample(*o, jnp.uint32(fi))

    print("== compiling all arms (excluded from timing)", flush=True)
    for tag, cfg in arms.items():
        t0 = time.perf_counter()
        run(cfg, 77).block_until_ready()
        print(f"  {tag}: first run {time.perf_counter() - t0:.1f} s", flush=True)

    times: dict[str, list[float]] = {t: [] for t in arms}
    for p in range(3):
        print(f"== pass {p}", flush=True)
        for tag, cfg in arms.items():
            t0 = time.perf_counter()
            run(cfg, 100 + p).block_until_ready()
            dt = time.perf_counter() - t0
            times[tag].append(dt)
            print(f"  {tag}: {dt:.3f} s", flush=True)

    print("== medians", flush=True)
    base = float(np.median(times["base@16200"]))
    for tag, xs in times.items():
        m = float(np.median(xs))
        print(f"  {tag}: {m:.3f} s/sample ({(m / base - 1) * 100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
