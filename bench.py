"""Benchmark entry point — run by the driver on real TPU hardware.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Protocol (BASELINE.md): ms/frame at 1080p on a 512^3 DICOM-like volume,
default (DDA empty-space-skipping) render mode, bounces=1 and the
benchmark transfer function from the reference's public/benchmark.json.
Baseline: the reference's DDA mode at ~5.8 ms/sample (performance.txt:28-35).
vs_baseline > 1 means faster than the reference.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    t_setup = time.time()
    from volxel_tpu import Renderer
    from volxel_tpu.grid import construct_brick_grid
    from volxel_tpu.utils.fixtures import synthetic_ct_volume

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    width, height = 1920, 1080
    warmup = 3
    timed = 20

    vol = synthetic_ct_volume((size, size, size), bits_stored=12)
    grid = construct_brick_grid(
        vol.astype(np.float32) / vol.max(), transform=np.eye(4, dtype=np.float32)
    )
    del vol

    r = Renderer(width=width, height=height)
    r.restart_from_grid(grid)
    r.camera.rotate_around_view(0.6, 0.4)
    r.camera.zoom(2.0)
    # benchmark.json settings profile
    r.settings.bounces = 1
    r.settings.max_samples = 500
    r.set_transfer_colors(
        [
            {"color": [0.5686, 0.2549, 0.6745, 0.54], "stop": 0.0},
            {"color": [0.9725, 0.8941, 0.3608, 1.0], "stop": 0.1782},
            {"color": [0.0, 1.0, 1.0, 0.17], "stop": 0.3985},
        ]
    )
    r.settings.sample_range = [0.0564, 1.0]
    r.render_mode = "default"

    setup_s = time.time() - t_setup
    print(f"# setup {setup_s:.1f}s, compiling...", file=sys.stderr)

    t_compile = time.time()
    for _ in range(warmup):
        r.render_frame().block_until_ready()
    print(f"# compile+warmup {time.time() - t_compile:.1f}s", file=sys.stderr)

    times = []
    for _ in range(timed):
        t0 = time.perf_counter()
        r.render_frame().block_until_ready()
        times.append(time.perf_counter() - t0)
    ms_per_frame = float(np.median(times) * 1000.0)

    baseline_ms = 5.8  # reference DDA ms/sample (performance.txt:28-35)
    print(
        json.dumps(
            {
                "metric": f"ms/frame 1080p {size}^3 volume, DDA path-traced sample",
                "value": round(ms_per_frame, 3),
                "unit": "ms",
                "vs_baseline": round(baseline_ms / ms_per_frame, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
