"""Same-process fetch-free A/B: scanline-band chunks vs tile-major chunks.

Motivation (NOTES r5): the volume-filling framing renders FASTER
(0.089 ms/sample) than the wide framing (0.103) despite doing ~25 steps
per ray vs p50=0 — because a lockstep chunk costs its own worst-case
lane, and the wide framing's 1920-wide scanline bands mix deep rays with
empty background. Tile-major chunk ordering (each chunk a 2D tile)
should concentrate the volume into fewer chunks and let background
tiles exit instantly.

The permutation is a pure lane reorder: RNG is keyed by global pixel
index, so the per-lane draw protocol is unchanged. (Per-pixel radiance
is NOT guaranteed bit-identical: XLA rounds fused transcendentals
position-dependently at the ulp level, and an ulp can flip a stochastic
collision compare — measured ~0.01% of 1080p pixels rendering a
different equally-valid realization; see NOTES r5.) perm/inv_perm ride
as jit ARGUMENTS (never closure constants — tunnel compile size limit).

Usage: python examples/ab_tileorder.py [size] [frames] [passes]
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tile_perm(width: int, height: int, tw: int, th: int) -> np.ndarray:
    """perm[j] = linear pixel index of the j-th lane in tile-major order."""
    assert width % tw == 0 and height % th == 0
    y, x = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    lin = (y * width + x).reshape(height // th, th, width // tw, tw)
    return lin.transpose(0, 2, 1, 3).reshape(-1).astype(np.uint32)


@functools.partial(__import__("jax").jit, static_argnums=(0,))
def _render_perm(config, grid, params, lut, env, inv_view, inv_proj,
                 light_dir, perm, inv_perm, frame_index):
    from volxel_tpu.render.pathtrace import render_pixels

    out = render_pixels(
        config, grid, params, lut, env, inv_view, inv_proj, light_dir,
        perm, frame_index,
    )
    return out[inv_perm]


def main() -> None:
    import jax.numpy as jnp

    from volxel_tpu.render.pathtrace import render_sample
    from examples.ab_atlas import _build_renderer

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    width, height = 1920, 1080

    r, _grid = _build_renderer(size, width=width, height=height)
    r.render_frame()
    ops = list(r._cached_operands)
    cfg = ops[0]

    results: dict[str, list[float]] = {}

    def timed(tag, fn, fi0):
        fn(jnp.uint32(fi0)).block_until_ready()
        t0 = time.perf_counter()
        for i in range(frames):
            out = fn(jnp.uint32(fi0 + 1 + i))
        out.block_until_ready()
        ms = (time.perf_counter() - t0) / frames * 1000.0
        results.setdefault(tag, []).append(ms)
        print(f"  {tag}: {ms:.3f} ms/sample", flush=True)

    variants = {"bands": lambda fi: render_sample(*ops, fi)}
    for tw, th in ((480, 270), (240, 135), (960, 540)):
        perm_np = tile_perm(width, height, tw, th)
        inv_np = np.empty_like(perm_np)
        inv_np[perm_np] = np.arange(perm_np.size, dtype=np.uint32)
        perm = jnp.asarray(perm_np)
        inv = jnp.asarray(inv_np)
        cfg_t = cfg._replace(chunk_size=tw * th)

        def make(cfg_t=cfg_t, perm=perm, inv=inv):
            return lambda fi: _render_perm(
                cfg_t, *ops[1:], perm, inv, fi
            )

        variants[f"tile{tw}x{th}"] = make()

    # one-time bit-identity check happens on CPU in tests; here we stay
    # fetch-free (NOTES: a single device->host fetch poisons the session)
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
