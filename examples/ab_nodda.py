"""Honest sync-mode A/B: no_dda (delta/ratio tracking) compacted decode.

Delta tracking decodes the full trilinear+LUT chain EVERY event for every
live lane (no empty-space skipping, normal.glsl:36-55), so the per-event
9-gather decode is the entire cost. Arms (960x540, 256^3 benchmark
scene, mode=no_dda):

  full   : compact_decode=False — full-width decode every iteration
  compact: compact_decode="loop" (ships default) — decode ladder-compacted
           to the running lanes

Protocol: NOTES.md ROUND-5 DISCOVERY (tiny fetch first, interleaved
passes, compile excluded).
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

    r, _ = _build_renderer(256, mode="no_dda", width=960, height=540)
    r.render_frame()
    ops = list(r._cached_operands)
    config = ops[0]

    arms = {
        "full": config._replace(compact_decode=False),
        "compact": config._replace(compact_decode="loop"),
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
    base = float(np.median(times["full"]))
    for tag, xs in times.items():
        m = float(np.median(xs))
        print(f"  {tag}: {m:.3f} s/sample ({(m / base - 1) * 100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
