"""Interactive-orbit demo (BASELINE config 3): jit-cached per-frame render.

Orbits the camera around a volume, rendering a few progressive samples per
step (the reference's interactive loop, viewer.ts:1183-1293) and writing
PNG frames. On one v5e chip each 1080p sample is well under a millisecond,
so a responsive orbit loop has headroom for hundreds of samples per view.

  python examples/orbit.py --zip scan.zip --out frames/ --steps 24
  python examples/orbit.py --synthetic 256 --size 512x512
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def main() -> None:
    from PIL import Image

    from volxel_tpu import Renderer
    from volxel_tpu.grid import construct_brick_grid
    from volxel_tpu.utils.fixtures import synthetic_ct_volume

    ap = argparse.ArgumentParser()
    ap.add_argument("--zip")
    ap.add_argument("--synthetic", type=int, default=128)
    ap.add_argument("--size", default="512x512")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--samples-per-step", type=int, default=24)
    ap.add_argument("--out", default="orbit_frames")
    args = ap.parse_args()

    w, h = (int(v) for v in args.size.split("x"))
    r = Renderer(width=w, height=h)
    if args.zip:
        r.restart_from_zip(Path(args.zip).read_bytes())
    else:
        vol = synthetic_ct_volume((args.synthetic,) * 3, bits_stored=12)
        r.restart_from_grid(
            construct_brick_grid(
                vol.astype(np.float32) / vol.max(),
                transform=np.eye(4, dtype=np.float32),
            )
        )
    r.camera.rotate_around_view(0.0, 0.35)
    r.camera.zoom(2.2)
    r.settings.bounces = 2
    r.settings.sample_range = [0.1, 1.0]
    r.set_transfer_colors(
        [
            {"color": [0.57, 0.25, 0.67, 0.54], "stop": 0.0},
            {"color": [0.97, 0.89, 0.36, 1.0], "stop": 0.18},
            {"color": [0.0, 1.0, 1.0, 0.17], "stop": 0.4},
        ]
    )

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    for step in range(args.steps):
        r.camera.rotate_around_view(2 * np.pi / args.steps, 0.0)
        r.restart_rendering()
        for _ in range(args.samples_per_step):
            r.render_frame()
        img = (np.clip(r.image(), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img).save(out_dir / f"frame_{step:03d}.png")
        print(f"frame {step + 1}/{args.steps}")
    total = time.time() - t0
    n = args.steps * args.samples_per_step
    print(f"{args.steps} views x {args.samples_per_step} samples in {total:.1f}s "
          f"({total / n * 1000:.2f} ms/sample incl. first compile)")


if __name__ == "__main__":
    main()
