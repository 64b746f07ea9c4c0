"""Same-process fetch-free A/Bs for the round-2 ranked perf candidates
that never got a recorded outcome (VERDICT r2 weakness 4):

  1. compacted secondary wavefront (RenderConfig.compact_secondary):
     stable-sort NEE shadow / bounce>=2 extension rays, half-width
     traversal via lax.cond when live lanes fit — bit-identical.
  2. bf16 majorant pyramid (device_grid_from_brick maj_dtype="bfloat16",
     rounded up — still a valid bound): halves the hot 1-gather-per-step
     traffic; statistically identical, not bit-identical.

Protocol (NOTES.md measurement hygiene): one process, tightly interleaved
variants, multiple passes, block_until_ready only — NEVER a device->host
fetch (the first fetch poisons the session: +33 ms per dispatch forever).

Usage: python examples/ab_round4.py [size] [frames] [passes]
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
    r.settings.bounces = bounces
    return r, grid


def main() -> None:
    import jax.numpy as jnp

    from volxel_tpu.render.pathtrace import render_sample
    from volxel_tpu.render.sampling import device_grid_from_brick

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    width = int(sys.argv[4]) if len(sys.argv) > 4 else 1920
    height = int(sys.argv[5]) if len(sys.argv) > 5 else 1080

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

    for bounces in (1, 3):
        r, grid = _build_renderer(size, bounces=bounces, width=width, height=height)
        r.render_frame()
        ops = list(r._cached_operands)
        cfg = ops[0]
        dg_f32 = ops[1]
        dg_bf16 = device_grid_from_brick(grid, maj_dtype="bfloat16")

        def make(cfg_v, dg):
            o = list(ops)
            o[0] = cfg_v
            o[1] = dg
            return lambda fi: render_sample(*o, fi)

        variants = {
            f"b{bounces}_base": make(cfg, dg_f32),
            f"b{bounces}_compact": make(
                cfg._replace(compact_secondary=True), dg_f32
            ),
            f"b{bounces}_bf16maj": make(cfg, dg_bf16),
            f"b{bounces}_both": make(
                cfg._replace(compact_secondary=True), dg_bf16
            ),
        }
        for p in range(passes):
            print(f"bounces={bounces} pass {p}:", flush=True)
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
