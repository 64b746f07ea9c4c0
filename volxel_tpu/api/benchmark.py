"""Declarative benchmark harness (reference viewer.ts:72-109, 840-890).

Runs VolxelBenchmark-shaped JSON specs: a list of scenarios (volume +
environment + settings + render mode), each rendered for `samples`
progressive frames with device fencing (`block_until_ready` standing in
for gl.finish, viewer.ts:1213-1218), producing VolxelBenchmarkResult-shaped
records with a device fingerprint.
"""

from __future__ import annotations

import datetime
import json
import platform
import time
from pathlib import Path

import jax

from volxel_tpu.api.renderer import Renderer
from volxel_tpu.api.settings import verify_settings


def device_fingerprint() -> dict:
    """VolxelBenchmarkDeviceResult analog (viewer.ts:225-242)."""
    devices = jax.devices()
    return {
        "platform": platform.platform(),
        "pythonVersion": platform.python_version(),
        "jaxVersion": jax.__version__,
        "deviceCount": len(devices),
        "accelerator": {
            "platform": devices[0].platform,
            "kind": getattr(devices[0], "device_kind", "unknown"),
            "count": len(devices),
        },
    }


def run_single_benchmark(
    renderer: Renderer,
    name: str | None = None,
    warmup: int = 1,
) -> dict:
    """Render maxSamples frames with fencing; report per-sample timing."""
    samples = int(renderer.settings.max_samples)
    renderer.restart_rendering()
    # compile outside the timed region (the reference's first-frame jank)
    for _ in range(warmup):
        renderer.render_frame().block_until_ready()
    renderer.restart_rendering()

    total = 0.0
    for _ in range(samples):
        t0 = time.perf_counter()
        fb = renderer.render_frame()
        fb.block_until_ready()
        total += time.perf_counter() - t0

    w, h = renderer._render_dims()
    return {
        "name": name,
        "settings": renderer.settings.to_json_dict(),
        "totalTime": total * 1000.0,
        "timePerSample": total * 1000.0 / max(samples, 1),
        "viewport": [0, 0, w, h],
        "device": device_fingerprint(),
        "timestamp": datetime.datetime.now(datetime.timezone.utc).isoformat(),
    }


def run_benchmark_collection(
    spec: dict,
    renderer: Renderer,
    load_zip=None,
    load_env=None,
) -> list[dict]:
    """Run a VolxelBenchmark spec (viewer.ts startBenchmark, :864-890).

    spec: {"sharedSettings": [SettingsExport...],
           "benchmarks": [{"zip"?, "env"?, "renderMode", "settings": int|export, "name"?}]}
    load_zip/load_env: callables resolving the spec's resource strings to
    bytes (the reference fetches URLs; here the host supplies a resolver).
    """
    results = []
    for entry in spec.get("benchmarks", []):
        if entry.get("zip") and load_zip is not None:
            data = load_zip(entry["zip"])
            if data is not None:
                renderer.restart_from_zip(data)
        if entry.get("env") and load_env is not None:
            data = load_env(entry["env"])
            if data is not None:
                renderer.load_env(data)
        settings = entry["settings"]
        if isinstance(settings, int):
            settings = spec["sharedSettings"][settings]
        renderer.restore_settings(verify_settings(settings))
        renderer.render_mode = entry["renderMode"]
        results.append(run_single_benchmark(renderer, name=entry.get("name")))
    return results


def save_benchmark(results: list[dict], path) -> None:
    Path(path).write_text(json.dumps(results, indent=2))
