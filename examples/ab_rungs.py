"""Honest sync-mode A/B: compaction-ladder rung depth
(RenderConfig.compact_finest).

r6 shipped /8 /4 /2 cond-ladders at every compaction site (collision
decode, secondary traversal, env warp/lookup); measured live fractions
sit around 4% (NOTES r8 probe), so an n/8 width floor leaves 3-6x dead
width whenever the live count is below it. The r9 _compact_widths
ladder extends the rungs to n/finest (default 64). Arms sweep finest at
the current defaults (pair decode ON, mxu OFF, warp tables ON).

Protocol: NOTES.md ROUND-5 DISCOVERY — fetch first, then per-program
walls. All arms share the ulp realization contract of compact_decode.

Usage: python examples/ab_rungs.py [size [width height [passes]]]
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
    passes = int(_sys.argv[4]) if len(_sys.argv) > 4 else 3

    @jax.jit
    def trivial(x):
        return x + 1.0

    trivial(jnp.float32(1.0)).block_until_ready()
    t0 = time.perf_counter()
    float(np.asarray(trivial(jnp.float32(41.0))))
    print(f"fetch (sync-mode switch): {time.perf_counter() - t0:.1f} s", flush=True)

    from volxel_tpu.render.pathtrace import render_sample

    r, _ = _build_renderer(size, width=width, height=height)
    r.render_frame()
    ops = list(r._cached_operands)
    config = ops[0]

    arms = {f"finest{f}": config._replace(compact_finest=f)
            for f in (8, 16, 32, 64)}

    def run(cfg, fi):
        o = list(ops)
        o[0] = cfg
        return render_sample(*o, jnp.uint32(fi))

    print("== compiling arms (excluded from timing)", flush=True)
    for tag, cfg in arms.items():
        t0 = time.perf_counter()
        run(cfg, 77).block_until_ready()
        print(f"  {tag}: first run {time.perf_counter() - t0:.1f} s", flush=True)

    times: dict[str, list[float]] = {t: [] for t in arms}
    for p in range(passes):
        print(f"== pass {p}", flush=True)
        for tag, cfg in arms.items():
            t0 = time.perf_counter()
            run(cfg, 100 + p).block_until_ready()
            dt = time.perf_counter() - t0
            times[tag].append(dt)
            print(f"  {tag}: {dt:.3f} s", flush=True)

    print("== medians", flush=True)
    base = float(np.median(times["finest8"]))
    for tag, xs in times.items():
        m = float(np.median(xs))
        print(f"  {tag}: {m:.3f} s/sample ({(m / base - 1) * 100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
