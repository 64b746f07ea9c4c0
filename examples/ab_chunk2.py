"""Honest sync-mode round 2: finer chunk sweep + mixed traversal +
ladder compact_secondary, all at 960x540/256^3.

Follow-ups to ab_chunk_sync.py (chunk32400 1.22 s vs 129600 2.75 s;
single-loop transmittance LOSES the all-active wavefront 1.13 vs 0.88):

  chunk 8100 / 16200 / 32400 (loop)   : find the knee
  mixed@32400                          : loop sample + phase2 transmittance
  loop@32400 (re-run)                  : anchor across sessions
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
        "loop@8100": config._replace(chunk_size=8100),
        "loop@16200": config._replace(chunk_size=16200),
        "loop@32400": config._replace(chunk_size=32400),
        "mixed@32400": config._replace(chunk_size=32400, compact_decode="mixed"),
        "mixed@16200": config._replace(chunk_size=16200, compact_decode="mixed"),
    }

    def run(cfg, fi):
        o = list(ops)
        o[0] = cfg
        return render_sample(*o, jnp.uint32(fi))

    print("== compiling (excluded)", flush=True)
    for tag, cfg in arms.items():
        t0 = time.perf_counter()
        run(cfg, 77).block_until_ready()
        print(f"  {tag}: first {time.perf_counter() - t0:.1f} s", flush=True)

    times: dict[str, list[float]] = {t: [] for t in arms}
    passes = 3
    for p in range(passes):
        print(f"== pass {p}", flush=True)
        for tag, cfg in arms.items():
            t0 = time.perf_counter()
            run(cfg, 100 + p).block_until_ready()
            dt = time.perf_counter() - t0
            times[tag].append(dt)
            print(f"  {tag}: {dt:.2f} s", flush=True)

    print("== medians", flush=True)
    for tag, xs in times.items():
        med = sorted(xs)[len(xs) // 2]
        print(f"  {tag}: med {med:.2f} s  best {min(xs):.2f}", flush=True)


if __name__ == "__main__":
    main()
