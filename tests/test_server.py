"""Interactive preview server (api/server.py).

Reference behavior: viewer.ts:1183-1293 render loop + util.ts:30-143 input
wiring. The server renders progressively on a background thread and
responds to orbit/zoom/pan/clip commands over HTTP; every scene change
resets accumulation (restartRendering, viewer.ts:1155-1181).
"""

import json
import time
import urllib.request

import numpy as np
import pytest

from volxel_tpu import Renderer
from volxel_tpu.api.server import PreviewServer
from volxel_tpu.grid import construct_brick_grid
from volxel_tpu.utils.fixtures import synthetic_ct_volume


@pytest.fixture(scope="module")
def server():
    vol = synthetic_ct_volume((16, 16, 16), bits_stored=12)
    r = Renderer(width=32, height=32)
    r.restart_from_grid(
        construct_brick_grid(
            vol.astype(np.float32) / vol.max(), transform=np.eye(4, dtype=np.float32)
        )
    )
    r.camera.zoom(2.0)
    r.settings.max_samples = 10_000
    srv = PreviewServer(r, port=0)  # ephemeral port
    srv.start()
    yield srv
    srv.stop()


def _get(srv, path):
    return urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}", timeout=30)


def _post(srv, path, body: dict):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=json.dumps(body).encode(),
        method="POST",
    )
    return urllib.request.urlopen(req, timeout=30)


def _wait_for_frame(srv, timeout=60.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        with srv._png_cond:
            if srv._png:
                return srv._png
        time.sleep(0.1)
    raise TimeoutError("no frame rendered")


def test_serves_page_and_frame(server):
    page = _get(server, "/").read()
    assert b"volxel_tpu preview" in page
    _wait_for_frame(server)
    png = _get(server, "/frame.png").read()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    from PIL import Image
    import io

    img = np.asarray(Image.open(io.BytesIO(png)))
    assert img.shape == (32, 32, 3)


def test_state_reports_progress(server):
    _wait_for_frame(server)
    state = json.loads(_get(server, "/state").read())
    assert state["samples"] >= 1
    assert state["width"] == 32
    assert state["settings"]["version"] == "v3"


def test_rotate_restarts_accumulation(server):
    _wait_for_frame(server)
    # let it accumulate a few samples
    deadline = time.time() + 60
    while server.renderer.frame_index < 3 and time.time() < deadline:
        time.sleep(0.05)
    pose_before = server.renderer.camera.view_matrix().copy()
    _post(server, "/input", {"type": "rotate", "by": [0.3, 0.1]})
    deadline = time.time() + 60
    changed = False
    while time.time() < deadline:
        if not np.array_equal(server.renderer.camera.view_matrix(), pose_before):
            changed = True
            break
        time.sleep(0.05)
    assert changed, "rotate command did not reach the camera"


def test_zoom_and_pan_commands(server):
    d0 = np.linalg.norm(server.renderer.camera.pos)
    _post(server, "/input", {"type": "zoom", "by": 0.9})
    deadline = time.time() + 60
    while (
        np.linalg.norm(server.renderer.camera.pos) == d0
        and time.time() < deadline
    ):
        time.sleep(0.05)
    assert np.linalg.norm(server.renderer.camera.pos) != d0
    _post(server, "/input", {"type": "pan", "by": [0.05, 0.02]})  # must not error


def test_settings_update(server):
    _post(server, "/settings", {"bounces": 3})
    deadline = time.time() + 60
    while server.renderer.settings.bounces != 3 and time.time() < deadline:
        time.sleep(0.05)
    assert server.renderer.settings.bounces == 3


def test_bad_input_does_not_kill_loop(server):
    _post(server, "/input", {"type": "bogus"})
    _post(server, "/input", {"type": "rotate"})  # missing args
    time.sleep(0.3)
    assert server._render_thread.is_alive()


def test_stream_yields_frames(server):
    resp = _get(server, "/stream")
    assert resp.headers["Content-Type"].startswith("multipart/x-mixed-replace")
    data = resp.read(200)
    assert b"--frame" in data
    assert b"image/png" in data
    resp.close()


def test_histogram_endpoint(server):
    data = json.loads(_get(server, "/histogram").read())
    assert len(data["bars"]) > 0
    assert len(data["alpha"]) == len(data["bars"])
    assert all(0.0 <= v <= 1.0 for v in data["bars"])
    assert data["range"] == [0.0, 1.0]


def test_render_mode_command(server):
    _post(server, "/input", {"type": "render_mode", "mode": "raymarch"})
    deadline = time.time() + 60
    while server.renderer.render_mode != "raymarch" and time.time() < deadline:
        time.sleep(0.05)
    assert server.renderer.render_mode == "raymarch"
    _post(server, "/input", {"type": "render_mode", "mode": "default"})


def test_sample_range_settings(server):
    _post(server, "/settings", {"sample_range": [0.1, 0.9]})
    deadline = time.time() + 60
    while server.renderer.settings.sample_range != [0.1, 0.9] and time.time() < deadline:
        time.sleep(0.05)
    assert server.renderer.settings.sample_range == [0.1, 0.9]
    _post(server, "/settings", {"sample_range": [0.0, 1.0]})


def test_page_has_controls(server):
    page = _get(server, "/").read().decode()
    for control in ("density_multiplier", "exposure", "gamma", "hist", "mode"):
        assert f'id="{control}"' in page
