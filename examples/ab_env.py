"""Honest sync-mode A/B: compact_env (ladder-compacted NEE environment
warp + escape lookup/pdf) at the new 16200-lane chunk default, plus a
1080p/512^3 headline preview with the full winning config.

The env warp costs real ~51 ms per 131k-lane call (NOTES.md r5 profile)
and runs per bounce per chunk at full width; compact_env runs it at the
width the consuming lanes need.
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
    print(f"default chunk_size: {config.chunk_size}", flush=True)

    arms = {
        "env_off": config._replace(compact_env=False),
        "env_on": config._replace(compact_env=True),
    }

    def run(o, cfg, fi):
        o = list(o)
        o[0] = cfg
        return render_sample(*o, jnp.uint32(fi))

    print("== compiling (excluded)", flush=True)
    for tag, cfg in arms.items():
        t0 = time.perf_counter()
        run(ops, cfg, 77).block_until_ready()
        print(f"  {tag}: first {time.perf_counter() - t0:.1f} s", flush=True)

    times: dict[str, list[float]] = {t: [] for t in arms}
    for p in range(3):
        print(f"== pass {p}", flush=True)
        for tag, cfg in arms.items():
            t0 = time.perf_counter()
            run(ops, cfg, 100 + p).block_until_ready()
            dt = time.perf_counter() - t0
            times[tag].append(dt)
            print(f"  {tag}: {dt:.2f} s", flush=True)
    for tag, xs in times.items():
        print(f"  {tag}: med {sorted(xs)[1]:.2f} s", flush=True)

    # ---- 1080p/512^3 headline preview (full defaults) ----
    print("== 1080p/512^3 preview (defaults)", flush=True)
    r2, _ = _build_renderer(512, width=1920, height=1080)
    r2.render_frame()
    ops2 = list(r2._cached_operands)
    t0 = time.perf_counter()
    run(ops2, ops2[0], 77).block_until_ready()
    print(f"  first (compile incl): {time.perf_counter() - t0:.1f} s", flush=True)
    for p in range(3):
        t0 = time.perf_counter()
        run(ops2, ops2[0], 200 + p).block_until_ready()
        print(f"  rep: {time.perf_counter() - t0:.2f} s", flush=True)


if __name__ == "__main__":
    main()
