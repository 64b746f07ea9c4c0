"""Same-process fetch-free A/B: dense decoded field vs atlas 4-gather path
(VERDICT r3 item 4).

The dense=False path (lookup_density_brick_int's range_lo/range_hi/ptr/
atlas gather chain, sampling.py) is the de-facto fallback for volumes over
the dense budget, but it had no TPU perf number — only CPU tests. This
decides whether the >budget story is atlas-gather or slabs-only.

Protocol (NOTES.md measurement hygiene): one process, tightly interleaved
variants, multiple passes, block_until_ready only — NEVER a device->host
fetch (the first fetch poisons the session: +33 ms per dispatch forever).

Usage: python examples/ab_atlas.py [size] [frames] [passes]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _build_renderer(
    size: int, mode: str = "default", bounces: int = 1,
    width: int = 1920, height: int = 1080,
):
    from volxel_tpu import Renderer
    from volxel_tpu.grid import construct_brick_grid
    from volxel_tpu.utils.fixtures import synthetic_ct_volume

    vol = synthetic_ct_volume((size, size, size), bits_stored=12)
    grid = construct_brick_grid(
        vol.astype(np.float32) / vol.max(), transform=np.eye(4, dtype=np.float32)
    )
    r = Renderer(width=width, height=height)
    r.restart_from_grid(grid)
    r.camera.rotate_around_view(0.6, 0.4)
    r.camera.zoom(2.0)
    r.settings.bounces = bounces
    r.settings.max_samples = 10**9
    r.set_transfer_colors(
        [
            {"color": [0.5686, 0.2549, 0.6745, 0.54], "stop": 0.0},
            {"color": [0.9725, 0.8941, 0.3608, 1.0], "stop": 0.1782},
            {"color": [0.0, 1.0, 1.0, 0.17], "stop": 0.3985},
        ]
    )
    r.settings.sample_range = [0.0564, 1.0]
    r.render_mode = mode
    return r, grid


def main() -> None:
    import jax.numpy as jnp

    from volxel_tpu.render.pathtrace import render_sample
    from volxel_tpu.render.sampling import device_grid_from_brick

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    results: dict[str, list[float]] = {}

    def timed(tag, fn, fi0):
        fn(jnp.uint32(fi0)).block_until_ready()  # compile/warm
        t0 = time.perf_counter()
        for i in range(frames):
            out = fn(jnp.uint32(fi0 + 1 + i))
        out.block_until_ready()
        ms = (time.perf_counter() - t0) / frames * 1000.0
        results.setdefault(tag, []).append(ms)
        print(f"  {tag}: {ms:.3f} ms/sample", flush=True)

    r, grid = _build_renderer(size)
    r.render_frame()
    ops = list(r._cached_operands)
    dg_dense = ops[1]
    dg_atlas = device_grid_from_brick(grid, dense=False)

    def make(dg):
        o = list(ops)
        o[1] = dg
        return lambda fi: render_sample(*o, fi)

    variants = {
        "dense": make(dg_dense),
        "atlas": make(dg_atlas),
    }
    for p in range(passes):
        print(f"pass {p}:", flush=True)
        for tag, fn in variants.items():
            timed(tag, fn, fi0=1000 * p)

    print("\n== medians / bests ==")
    for tag, xs in results.items():
        print(
            f"{tag}: median {np.median(xs):.3f} best {min(xs):.3f} "
            f"runs {[round(x, 3) for x in xs]}"
        )


if __name__ == "__main__":
    main()
