"""Benchmark entry point — run by the driver on real TPU hardware.

Prints ONE JSON line whose required keys are
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
plus the reference-protocol sweep the driver/judge can inspect:
  "sweep":  ms/sample for {default, no_dda, raymarch} — mirroring the
            reference's performance.txt 4-way comparison and
            public/benchmark.json's 3-mode protocol
  "mrays_per_s": primary rays per second in the default mode
  "steps":  per-ray traversal step percentiles + caps (default mode),
            evidencing that the static loop caps never bind
  "ingest_s": 512^3 DICOM-ZIP -> brick grid wall time (reference claims
            "in excess of 2 minutes", README.md:12)

Protocol (BASELINE.md): 1080p, 512^3 volume, bounces=1, the benchmark
transfer function from public/benchmark.json. Baseline: the reference's
DDA mode at ~5.8 ms/sample (performance.txt:28-35). vs_baseline > 1 means
faster than the reference.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _time_mode(r, warmup: int = 2, timed: int = 12) -> float:
    for _ in range(warmup):
        r.render_frame().block_until_ready()
    times = []
    for _ in range(timed):
        t0 = time.perf_counter()
        r.render_frame().block_until_ready()
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1000.0)


def main() -> None:
    t_setup = time.time()
    from volxel_tpu import Renderer
    from volxel_tpu.grid import construct_brick_grid
    from volxel_tpu.utils.fixtures import synthetic_ct_volume

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    width, height = 1920, 1080

    vol = synthetic_ct_volume((size, size, size), bits_stored=12)
    grid = construct_brick_grid(
        vol.astype(np.float32) / vol.max(), transform=np.eye(4, dtype=np.float32)
    )

    # ingest timing: DICOM ZIP -> grid, the reference's ">2 minutes" path
    # (README.md:12). Sliced at the benchmark volume size.
    ingest_s = None
    if size >= 256:  # only meaningful at real scale
        from volxel_tpu.ingest.ziploader import read_zip_to_grid
        from volxel_tpu.utils.fixtures import write_dicom_zip
        import io
        import zipfile

        blobs_vol = vol[: min(size, 512)]
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
            from volxel_tpu.utils.fixtures import write_dicom_series

            for i, blob in enumerate(write_dicom_series(blobs_vol, bits_stored=12)):
                zf.writestr(f"series/slice_{i:04d}.dcm", blob)
        zip_bytes = buf.getvalue()
        del buf
        t0 = time.time()
        read_zip_to_grid(zip_bytes)
        ingest_s = round(time.time() - t0, 2)
        del zip_bytes
    del vol

    r = Renderer(width=width, height=height)
    r.restart_from_grid(grid)
    r.camera.rotate_around_view(0.6, 0.4)
    r.camera.zoom(2.0)
    # benchmark.json settings profile
    r.settings.bounces = 1
    r.settings.max_samples = 10**9
    r.set_transfer_colors(
        [
            {"color": [0.5686, 0.2549, 0.6745, 0.54], "stop": 0.0},
            {"color": [0.9725, 0.8941, 0.3608, 1.0], "stop": 0.1782},
            {"color": [0.0, 1.0, 1.0, 0.17], "stop": 0.3985},
        ]
    )
    r.settings.sample_range = [0.0564, 1.0]

    setup_s = time.time() - t_setup
    print(f"# setup {setup_s:.1f}s (ingest {ingest_s}s), compiling...", file=sys.stderr)

    # reference-protocol mode sweep (performance.txt / benchmark.json)
    sweep = {}
    for mode in ("default", "no_dda", "raymarch"):
        r.render_mode = mode  # resets accumulation + respecializes the jit
        t0 = time.time()
        sweep[mode] = round(_time_mode(r), 3)
        print(
            f"# {mode}: {sweep[mode]} ms/sample (incl. compile {time.time() - t0:.0f}s)",
            file=sys.stderr,
        )

    # step-count study on the benchmark scene (default mode)
    r.render_mode = "default"
    from volxel_tpu.utils.stepstats import step_statistics

    steps = step_statistics(r, "default")

    ms_per_frame = sweep["default"]
    baseline_ms = 5.8  # reference DDA ms/sample (performance.txt:28-35)
    print(
        json.dumps(
            {
                "metric": f"ms/frame 1080p {size}^3 volume, DDA path-traced sample",
                "value": ms_per_frame,
                "unit": "ms",
                "vs_baseline": round(baseline_ms / ms_per_frame, 4),
                "sweep_ms_per_sample": sweep,
                "mrays_per_s": round(width * height / (ms_per_frame / 1000.0) / 1e6, 1),
                "steps": steps,
                "ingest_s": ingest_s,
            }
        )
    )


if __name__ == "__main__":
    main()
