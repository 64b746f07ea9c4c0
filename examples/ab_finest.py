"""A/B: decode-ladder rung depth (compact_finest 8 vs 16 vs 32) at the
DRIVER scale, wide AND filled framings, honest sync mode.

Motivation (examples/probe_partition.py, this session): the decode
engagement costs ~1.85 ms/iteration at 129600-lane stage width but only
~0.13 ms at 16200 — and the n/8=16200 floor rung is 3-4x wider than the
typical collided set (~4-5k lanes at the filled framing's 4% live
fraction), so every collision iteration overpays the rung gathers.
The r9 verdict (wash at 960x540/256^3 WIDE, examples/ab_rungs.py)
predates the filled protocol; at 512^3 filled the stage-1 ladder runs
~40 collision iterations per chunk at full width.

Also prints compile+first per arm — deeper rungs cost compile time
(finest32 measured ~2x at 960x540 in r9), which the driver bench pays.

Usage: python examples/ab_finest.py [size [reps]]
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

    from volxel_tpu.render.pathtrace import render_sample

    size = int(_sys.argv[1]) if len(_sys.argv) > 1 else 512
    reps = int(_sys.argv[2]) if len(_sys.argv) > 2 else 3

    @jax.jit
    def trivial(x):
        return x + 1.0

    trivial(jnp.float32(1.0)).block_until_ready()
    t0 = time.perf_counter()
    float(np.asarray(trivial(jnp.float32(41.0))))
    print(f"fetch (sync-mode switch): {time.perf_counter() - t0:.1f} s", flush=True)

    r, _ = _build_renderer(size, width=1920, height=1080)
    r.render_frame()
    ops_wide = list(r._cached_operands)

    from volxel_tpu.scene.camera import Camera

    r.camera = Camera(1.0)
    r.camera.rotate_around_view(0.6, 0.4)
    r.camera.zoom(0.8)
    r.settings.density_multiplier = 3.0
    r.restart_rendering()
    r.render_frame()
    ops_filled = list(r._cached_operands)
    config = ops_wide[0]

    def run(ops, cfg, fi=101):
        o = list(ops)
        o[0] = cfg
        return render_sample(*o, jnp.uint32(fi))

    def timed(tag, ops, cfg, n=reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(ops, cfg))
        print(f"  {tag}: compile+first {time.perf_counter() - t0:.1f} s",
              flush=True)
        xs = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(run(ops, cfg))
            xs.append(time.perf_counter() - t0)
        print(f"  {tag}: {[round(x, 3) for x in xs]} s", flush=True)

    arms = {
        "f8": config,
        "f16": config._replace(compact_finest=16),
        "f32": config._replace(compact_finest=32),
    }
    for p in range(2):
        print(f"== pass {p}", flush=True)
        for tag, cfg in arms.items():
            timed(f"{tag}/wide", ops_wide, cfg)
            timed(f"{tag}/filled", ops_filled, cfg, n=2)


if __name__ == "__main__":
    main()
