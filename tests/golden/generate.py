"""Regenerate golden render fixtures (run on CPU: python tests/golden/generate.py).

Goldens pin the full render pipeline: any change to RNG streams, traversal
logic, transfer sampling, env sampling, or accumulation shifts them.
Intentional changes regenerate with this script (review the diff visually
before committing).
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402


def scene():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from volxel_tpu import Renderer
    from volxel_tpu.grid import construct_brick_grid
    from volxel_tpu.utils.fixtures import synthetic_ct_volume

    vol = synthetic_ct_volume((24, 24, 24), bits_stored=12)
    grid = construct_brick_grid(
        vol.astype(np.float32) / vol.max(), transform=np.eye(4, dtype=np.float32)
    )
    r = Renderer(width=16, height=16)
    r.restart_from_grid(grid)
    r.camera.rotate_around_view(0.5, 0.3)
    r.camera.zoom(2.0)
    r.settings.bounces = 2
    r.settings.sample_range = [0.05, 1.0]
    return r


CASES = {
    "default": {"render_mode": "default"},
    "no_dda": {"render_mode": "no_dda"},
    "raymarch": {"render_mode": "raymarch"},
    "gradient": {"gradient_shading": True},
    "debug_hits": {"debug_hits": True},
}


def render_case(name: str) -> np.ndarray:
    r = scene()
    for key, value in CASES[name].items():
        if key == "render_mode":
            r.render_mode = value
        else:
            setattr(r.settings, key, value)
            r.restart_rendering()
    for _ in range(8):
        r.render_frame()
    return np.asarray(r._framebuffer, dtype=np.float32)


def main():
    out_dir = Path(__file__).parent
    for name in CASES:
        img = render_case(name)
        np.save(out_dir / f"{name}.npy", img)
        print(f"{name}: mean={img.mean():.5f} std={img.std():.5f}")


if __name__ == "__main__":
    sys.exit(main())
