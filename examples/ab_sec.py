"""Honest sync-mode A/B: compact_secondary on/off at the r9 defaults.

The r5 A/B measured compact_secondary -7.2% (and it shipped default ON),
but that predates the march ladder, pair decode, and tile chunks; the r9
1080p/512^3 profile (examples/profile_real6.py) measured it a ~7% LOSS
(1.021 vs 1.08-1.14 s/sample) — the march ladder already narrows
secondary wavefronts, so the sort + permute overhead no longer pays.
This confirms at 960x540/256^3 before flipping the default.

Usage: python examples/ab_sec.py [size [width height [passes]]]
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

    arms = {
        "sec-on": config._replace(compact_secondary=True),
        "sec-off": config._replace(compact_secondary=False),
        # bounces=3: secondary extension rays exist only past bounce 1,
        # so the flag's real surface is multi-bounce renders
        "sec-on-b3": config._replace(compact_secondary=True, bounces=3),
        "sec-off-b3": config._replace(compact_secondary=False, bounces=3),
    }

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
    for tag, xs in times.items():
        m = float(np.median(xs))
        print(f"  {tag}: {m:.3f} s/sample", flush=True)


if __name__ == "__main__":
    main()
