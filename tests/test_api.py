"""API layer: ingest worker, color ramp, errors, overlay, benchmark runner."""

import numpy as np
import pytest

from volxel_tpu import Renderer
from volxel_tpu.api.benchmark import (
    device_fingerprint,
    run_benchmark_collection,
    run_single_benchmark,
)
from volxel_tpu.grid import construct_brick_grid
from volxel_tpu.ingest.worker import IngestWorker
from volxel_tpu.transfer.ramp import ColorRamp
from volxel_tpu.utils.fixtures import (
    synthetic_ct_volume,
    synthetic_env_hdr,
    write_dicom_series,
    write_dicom_zip,
)
from volxel_tpu.utils.profiling import StageTimer, frame_stats


@pytest.fixture(scope="module")
def volume():
    return synthetic_ct_volume((16, 16, 16), bits_stored=12)


@pytest.fixture(scope="module")
def grid(volume):
    return construct_brick_grid(
        volume.astype(np.float32) / volume.max(), transform=np.eye(4, dtype=np.float32)
    )


def test_ingest_worker_files_and_zip(volume):
    stages = []
    with IngestWorker(progress_callback=stages.append) as w:
        f1 = w.load_files(write_dicom_series(volume, bits_stored=12))
        f2 = w.load_zip(write_dicom_zip(volume, bits_stored=12))
        f3 = w.load_env(synthetic_env_hdr(16, 8))
        g1, g2, env = f1.result(60), f2.result(60), f3.result(60)
    np.testing.assert_array_equal(g1.atlas, g2.atlas)
    assert env.shape == (8, 16, 4)
    assert any("Brick grid" in s for s in stages)


def test_ingest_worker_error_propagates():
    with IngestWorker() as w:
        fut = w.load_zip(b"not a zip at all")
        with pytest.raises(Exception):
            fut.result(60)


def test_color_ramp_model():
    ramp = ColorRamp()
    events = []
    ramp.on_change(lambda stops: events.append(len(stops)))
    idx = ramp.add_stop(0.5, [1, 0, 0, 1])
    assert events == [3]
    assert ramp.stops[idx]["color"] == [1, 0, 0, 1]
    ramp.move_stop(idx, 0.25)
    ramp.set_color(idx, [0, 1, 0, 0.5])
    assert ramp.stops[1]["stop"] == 0.25
    ramp.remove_stop(idx)
    assert len(ramp.stops) == 2
    with pytest.raises(ValueError):
        ramp.remove_stop(0), ramp.remove_stop(0)
    lut = ramp.lut()
    assert lut.shape == (128, 4)
    # default insert color samples the ramp
    i2 = ramp.add_stop(0.75)
    assert len(ramp.stops[i2]["color"]) == 4


def test_error_state_gates_renderer(grid):
    r = Renderer(width=8, height=8)
    with pytest.raises(Exception):
        r.restart_from_zip(b"garbage")
    assert r.errored
    # restarts gated while errored (viewer.ts:1156)
    r.restart_from_grid(grid)
    assert r.grid is None or r._device_grid is None
    r.clear_error()
    r.restart_from_grid(grid)
    r.render_frame()
    assert r.frame_index == 1
    # suspend pauses without error
    r.suspend = True
    fb = r.render_frame()
    assert r.frame_index == 1


def test_clip_overlay_drawing(grid):
    r = Renderer(width=48, height=48)
    r.restart_from_grid(grid)
    r.camera.zoom(3.0)
    r.render_frame()
    plain = r.image()
    overlaid = r.image(show_clipping=True)
    assert not np.allclose(plain, overlaid)
    # with a hovered face highlighted
    ctl = r.make_clip_controller()
    ctl.hover((0.2, 0.15))
    overlaid2 = r.image(show_clipping=True)
    assert overlaid2.shape == plain.shape


def test_benchmark_single_and_collection(grid):
    r = Renderer(width=8, height=8)
    r.restart_from_grid(grid)
    r.settings.max_samples = 3
    res = run_single_benchmark(r, name="tiny")
    assert res["name"] == "tiny"
    assert res["timePerSample"] > 0
    assert res["viewport"] == [0, 0, 8, 8]
    assert res["device"]["accelerator"]["count"] >= 1

    spec = {
        "sharedSettings": [
            {
                "version": "v3",
                "transfer": {
                    "densityMultiplier": 1.0,
                    "transfer": {
                        "type": "color_stops",
                        "colors": [{"color": [1, 1, 1, 1], "stop": 0.0}],
                    },
                    "histogramRange": [0.0, 1.0],
                },
                "display": {
                    "samples": 2,
                    "bounces": 1,
                    "gamma": 2.2,
                    "exposure": 5.5,
                    "debugHits": False,
                    "renderMode": "raymarch",
                    "resolutionFactor": 1.0,
                },
                "lighting": {
                    "useEnv": True,
                    "showEnv": True,
                    "envStrength": 1.0,
                    "syncLightDir": False,
                    "lightDir": [-0.577, -0.577, -0.577],
                },
                "other": {
                    "cameraPos": [0, 0, -2],
                    "cameraLookAt": [0, 0, 0],
                    "clipMin": [0, 0, 0],
                    "clipMax": [1, 1, 1],
                },
            }
        ],
        "benchmarks": [
            {"renderMode": "raymarch", "settings": 0, "name": "rm"},
            {"renderMode": "no_dda", "settings": 0, "name": "dt"},
        ],
    }
    results = run_benchmark_collection(spec, r)
    assert [x["name"] for x in results] == ["rm", "dt"]
    assert results[0]["settings"]["renderMode"] == "raymarch"
    assert results[1]["settings"]["renderMode"] == "no_dda"


def test_profiling_utils():
    timer = StageTimer(log=False)
    with timer.stage("a"):
        pass
    with timer.stage("b"):
        pass
    rep = timer.report()
    assert set(rep) == {"a", "b"}
    stats = frame_stats([0.001, 0.002, 0.003])
    assert stats["frames"] == 3
    assert stats["median_ms"] == pytest.approx(2.0)


def test_from_attributes_and_transfer_file(volume, tmp_path):
    zip_path = tmp_path / "scan.zip"
    zip_path.write_bytes(write_dicom_zip(volume, bits_stored=12))
    settings_path = tmp_path / "settings.json"
    r0 = Renderer(width=8, height=8)
    r0.settings.bounces = 2
    import json

    settings_path.write_text(json.dumps(r0.export_settings()))
    env_path = tmp_path / "sky.hdr"
    env_path.write_bytes(synthetic_env_hdr(16, 8))

    r = Renderer.from_attributes(
        width=8,
        height=8,
        zip_path=zip_path,
        settings_path=settings_path,
        env_path=env_path,
        render_mode="raymarch",
    )
    assert r.render_mode == "raymarch"
    assert r.settings.bounces == 2
    assert r.grid is not None
    r.render_frame()

    r.load_transfer_function("0 0 0 0\n1 0.5 0.2 1\n")
    assert r._transfer_type == "full"
    assert len(r._transfer_colors) == 2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        r.load_transfer_function("no rows here")


def test_from_attributes_benchmark(volume, tmp_path):
    """benchmark_path mirrors attributeBenchmark (viewer.ts:840-848): the
    collection runs right after construction and lands on last_benchmark
    as VolxelBenchmarkResult-shaped records."""
    import json

    zip_path = tmp_path / "scan.zip"
    zip_path.write_bytes(write_dicom_zip(volume, bits_stored=12))
    r0 = Renderer(width=8, height=8)
    r0.settings.max_samples = 2
    spec = {
        "sharedSettings": [r0.export_settings()],
        "benchmarks": [
            {"zip": "scan.zip", "renderMode": "raymarch", "settings": 0,
             "name": "m1"},
            {"renderMode": "default", "settings": 0, "name": "m2"},
        ],
    }
    bench_path = tmp_path / "benchmark.json"
    bench_path.write_text(json.dumps(spec))

    r = Renderer.from_attributes(
        width=8, height=8, zip_path=zip_path, benchmark_path=bench_path
    )
    assert len(r.last_benchmark) == 2
    for rec in r.last_benchmark:
        assert rec["timePerSample"] > 0
        assert rec["viewport"] == [0, 0, 8, 8]
        assert "device" in rec
    assert [rec["name"] for rec in r.last_benchmark] == ["m1", "m2"]


def test_timeseries_from_zips(volume):
    from volxel_tpu.api.timeseries import TimeSeriesPlayer

    zips = [write_dicom_zip(volume, bits_stored=12) for _ in range(2)]
    r = Renderer(width=8, height=8)
    r.restart_from_grid(
        construct_brick_grid(
            volume.astype(np.float32) / volume.max(),
            transform=np.eye(4, dtype=np.float32),
        )
    )
    player = TimeSeriesPlayer.from_zips(r, zips)
    assert len(player) == 2
    frames = list(player.play(samples_per_step=1))
    assert len(frames) == 2


def test_from_attributes_urls(volume, tmp_path):
    """zip_url / env_url fetch over HTTP like the reference's
    restartFromZipUrl / loadEnvFromUrl (viewer.ts:991-1003,1035-1040),
    served here by a local http.server."""
    import threading
    from functools import partial
    from http.server import HTTPServer, SimpleHTTPRequestHandler

    (tmp_path / "scan.zip").write_bytes(write_dicom_zip(volume, bits_stored=12))
    (tmp_path / "sky.hdr").write_bytes(synthetic_env_hdr(16, 8))

    handler = partial(SimpleHTTPRequestHandler, directory=str(tmp_path))
    httpd = HTTPServer(("127.0.0.1", 0), handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        r = Renderer.from_attributes(
            width=8,
            height=8,
            zip_url=f"http://127.0.0.1:{port}/scan.zip",
            env_url=f"http://127.0.0.1:{port}/sky.hdr",
        )
        assert r.grid is not None
        assert r.environment.texture.shape[0] == 8  # fetched env applied
        r.render_frame()

        # non-2xx surfaces as an error like the reference's response.ok
        import urllib.error

        import pytest as _pytest

        with _pytest.raises(urllib.error.HTTPError):
            Renderer.from_attributes(
                width=8, height=8,
                zip_url=f"http://127.0.0.1:{port}/missing.zip",
            )
    finally:
        httpd.shutdown()
        httpd.server_close()
