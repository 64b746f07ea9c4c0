"""Honest sync-mode A/B round 2: march_ladder chunk-size optimum.

The in-loop shrink ladder absorbs in-chunk divergence (examples/
ab_ladder.py: -31% at 16200, -37.5% at 129600 vs the no-ladder 16200
baseline), so the chunk target that balanced width vs local-max-steps
moves up. Arms: ladder at 129600 / 259200 / unchunked (518400, one
while_loop, rungs down to ~500 lanes).
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
        "ladder@129600": config._replace(march_ladder=True, chunk_size=129600),
        "ladder@259200": config._replace(march_ladder=True, chunk_size=259200),
        "ladder@none": config._replace(march_ladder=True, chunk_size=None),
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
    for tag, xs in times.items():
        m = float(np.median(xs))
        print(f"  {tag}: {m:.3f} s/sample", flush=True)


if __name__ == "__main__":
    main()
