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
    # generous: suite runs can share the box with TPU benches
    return urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}", timeout=120)


def _post(srv, path, body: dict):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=json.dumps(body).encode(),
        method="POST",
    )
    return urllib.request.urlopen(req, timeout=120)


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


def test_page_has_touch_input(server):
    """The served page carries the reference's unified touch layer
    (util.ts:43-133): 1-finger rotate, 2-finger pinch zoom, 3-finger pan,
    with pointer events suppressed for touch so they don't double-fire."""
    page = _get(server, "/").read().decode()
    assert "touchstart" in page and "touchmove" in page
    for mode in ("'rotate'", "'pinch'", "'pan'"):
        assert mode in page
    assert "lastDist / cur" in page  # pinch ratio -> zoom factor
    assert "e.pointerType === 'touch'" in page


# -- round-3 widgets + hardening (VERDICT r2 items 7, 8) -----------------------


def test_transfer_endpoint_roundtrip(server):
    t = json.loads(_get(server, "/transfer").read())
    assert t["type"] == "color_stops" and len(t["colors"]) >= 2
    stops = [
        {"color": [1.0, 0.2, 0.1, 0.0], "stop": 0.0},
        {"color": [0.1, 0.9, 1.0, 0.8], "stop": 0.5},
        {"color": [1.0, 1.0, 1.0, 1.0], "stop": 1.0},
    ]
    _post(server, "/transfer", {"colors": stops})
    deadline = time.time() + 30
    while time.time() < deadline:
        t = json.loads(_get(server, "/transfer").read())
        if len(t["colors"]) == 3:
            break
        time.sleep(0.1)
    assert [c["stop"] for c in t["colors"]] == [0.0, 0.5, 1.0]


def test_light_drag_updates_direction(server):
    before = json.loads(_get(server, "/state").read())["settings"]["lighting"][
        "lightDir"
    ]
    _post(server, "/input", {"type": "light_drag", "by": [40, -25]})
    deadline = time.time() + 30
    while time.time() < deadline:
        after = json.loads(_get(server, "/state").read())["settings"]["lighting"][
            "lightDir"
        ]
        if not np.allclose(after, before):
            break
        time.sleep(0.1)
    assert not np.allclose(after, before)
    assert np.isclose(np.linalg.norm(after), 1.0, atol=1e-5)


def test_settings_export_import_cycle(server):
    export = json.loads(_get(server, "/settings.json").read())
    assert export["version"] == "v3"
    export["display"]["exposure"] = 7.25
    _post(server, "/settings_import", export)
    deadline = time.time() + 30
    while time.time() < deadline:
        state = json.loads(_get(server, "/state").read())
        if state["settings"]["display"]["exposure"] == 7.25:
            break
        time.sleep(0.1)
    assert state["settings"]["display"]["exposure"] == 7.25


def test_settings_import_rejects_bad_schema(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(server, "/settings_import", {"version": "v3", "nonsense": 1})
    assert exc.value.code == 400


def test_benchmark_roundtrip(server):
    _post(server, "/benchmark", {"samples": 3})
    deadline = time.time() + 60
    result = None
    while time.time() < deadline:
        result = json.loads(_get(server, "/benchmark_result").read())
        if result.get("running") is False and "time_per_sample_ms" in result:
            break
        time.sleep(0.2)
    assert result and result["running"] is False
    assert result["time_per_sample_ms"] > 0
    assert result["viewport"] == [32, 32]
    assert "device" in result


def test_render_error_surfaces_and_recovers(server):
    """A settings value that passes setattr but kills the render (bounces=0
    -> empty trace loop is fine; use a malformed sample_range) must surface
    at /state and auto-revert instead of freezing the stream (ADVICE r2)."""
    _post(server, "/settings", {"sample_range": "garbage"})
    deadline = time.time() + 60
    saw_error = False
    while time.time() < deadline:
        state = json.loads(_get(server, "/state").read())
        if state["error"]:
            saw_error = True
            break
        time.sleep(0.1)
    assert saw_error, "render error never surfaced at /state"
    # and the loop recovered: frames keep advancing afterwards
    s0 = json.loads(_get(server, "/state").read())["samples"]
    deadline = time.time() + 60
    while time.time() < deadline:
        s1 = json.loads(_get(server, "/state").read())["samples"]
        if s1 > s0:
            break
        time.sleep(0.2)
    assert s1 > s0, "render loop did not recover after the bad setting"


def test_page_has_round3_widgets(server):
    page = _get(server, "/").read().decode()
    for needle in (
        "ramp", "lightpad", "exportbtn", "importfile", "benchbtn",
        "/transfer", "light_drag", "/settings_import", "/benchmark",
    ):
        assert needle in page, needle


def test_dvr_preview_during_motion(server):
    """Camera drags stream shear-warp DVR previews, then progressive MC
    resumes when the interaction stops."""
    assert server.dvr_preview
    with server._png_cond:
        v0 = server._png_version
    _post(server, "/input", {"type": "rotate", "by": [0.05, 0.02]})
    deadline = time.time() + 30
    while time.time() < deadline:
        if server._motion_until > time.time() or server._png_version > v0:
            break
        time.sleep(0.05)
    # a frame was produced during/after motion without errors
    _wait_for_frame(server)
    deadline = time.time() + 30
    while time.time() < deadline:  # MC accumulation resumes after motion
        if (
            time.time() > server._motion_until
            and server.renderer.frame_index > 0
        ):
            break
        time.sleep(0.05)
    assert server.renderer.frame_index > 0
    assert server.last_error is None or "dvr" not in server.last_error


def test_server_over_distributed_renderer():
    """PreviewServer drives a DistributedRenderer on the 8-device mesh
    (config 3: interactive orbit loop on a mesh)."""
    from volxel_tpu.parallel.distributed import DistributedRenderer
    from volxel_tpu.parallel.mesh import make_mesh

    vol = synthetic_ct_volume((16, 16, 16), bits_stored=12)
    r = DistributedRenderer(width=32, height=32, sp=2, px=4)
    r.restart_from_grid(
        construct_brick_grid(
            vol.astype(np.float32) / vol.max(), transform=np.eye(4, dtype=np.float32)
        )
    )
    r.camera.zoom(2.0)
    r.settings.max_samples = 10_000
    srv = PreviewServer(r, port=0)
    srv.start()
    try:
        # the sharded path tracer's 8-device compile alone can take >60 s
        # on a loaded host — give the first frame a generous deadline
        _wait_for_frame(srv, timeout=300.0)
        state = json.loads(_get(srv, "/state").read())
        assert state["samples"] >= 2  # sp=2: each step advances 2 samples
        _post(srv, "/input", {"type": "rotate", "by": [0.2, 0.1]})
        _wait_for_frame(srv, timeout=300.0)
    finally:
        srv.stop()
