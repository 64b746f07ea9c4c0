"""Clip-box interaction: picking, skew lines, drag semantics."""

import numpy as np
import pytest

from volxel_tpu import Renderer
from volxel_tpu.grid import construct_brick_grid
from volxel_tpu.scene.interaction import (
    ClipBoxController,
    closest_points,
    cube_face,
    ray_box_intersection,
    ray_box_positions,
    world_ray,
)
from volxel_tpu.utils.fixtures import synthetic_ct_volume
from volxel_tpu.utils.histview import histogram_view_data


def test_ray_box_hit_and_miss():
    hit, near, far = ray_box_intersection([0, 0, -5], [0, 0, 1], [-1, -1, -1], [1, 1, 1])
    assert hit and near == pytest.approx(4.0) and far == pytest.approx(6.0)
    hit, _, _ = ray_box_intersection([0, 5, -5], [0, 0, 1], [-1, -1, -1], [1, 1, 1])
    assert not hit


def test_ray_box_positions_inside():
    pos = ray_box_positions([0, 0, 0], [0, 0, 1], [-1, -1, -1], [1, 1, 1])
    assert pos is not None
    np.testing.assert_allclose(pos[0], [0, 0, 0])
    np.testing.assert_allclose(pos[1], [0, 0, 1])


def test_cube_face_picking():
    lo, hi = [-1, -1, -1], [1, 1, 1]
    assert cube_face(lo, hi, [0, 0, 1]) == 0  # front +z
    assert cube_face(lo, hi, [0, 0, -1]) == 1  # back -z
    assert cube_face(lo, hi, [-1, 0, 0]) == 2  # left -x
    assert cube_face(lo, hi, [1, 0, 0]) == 3  # right +x
    assert cube_face(lo, hi, [0, 1, 0]) == 4  # top +y
    assert cube_face(lo, hi, [0, -1, 0]) == 5  # bottom -y
    assert cube_face(lo, hi, None) is None
    # interior point: clamped == pos, no face candidates
    assert cube_face(lo, hi, [0.5, 0.2, 0.0]) is None


def test_closest_points():
    res = closest_points([0, 0, 0], [1, 0, 0], [0, 1, 5], [0, 0, 1])
    assert res is not None
    p1, p2 = res
    np.testing.assert_allclose(p1, [0, 0, 0], atol=1e-9)
    np.testing.assert_allclose(p2, [0, 1, 0], atol=1e-9)
    # parallel lines -> None
    assert closest_points([0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 0, 0]) is None


@pytest.fixture(scope="module")
def renderer():
    vol = synthetic_ct_volume((16, 16, 16), bits_stored=12)
    grid = construct_brick_grid(
        vol.astype(np.float32) / vol.max(), transform=np.eye(4, dtype=np.float32)
    )
    r = Renderer(width=32, height=32)
    r.restart_from_grid(grid)
    r.camera.zoom(3.0)
    return r


def test_world_ray_center(renderer):
    origin, direction = world_ray(renderer.camera, (0.0, 0.0), 1.0)
    expect = renderer.camera.view - renderer.camera.pos
    expect = expect / np.linalg.norm(expect)
    np.testing.assert_allclose(direction, expect, atol=1e-6)


def test_clip_drag_shrinks_box(renderer):
    ctl = ClipBoxController(renderer)
    # hover off-center (a dead-center pick puts the face drag line on the
    # camera axis — degenerate in the reference too); the ray hits the
    # camera-facing back face (-z, face 1)
    face = ctl.hover((0.25, 0.2))
    assert face == 1
    assert ctl.begin_drag()
    before_min = list(renderer.settings.volume_clip_min)
    before_max = list(renderer.settings.volume_clip_max)
    # drag toward the screen center pushes the face deeper into the volume
    ctl.drag((0.1, 0.08))
    ctl.end_drag()
    after_min = renderer.settings.volume_clip_min
    after_max = renderer.settings.volume_clip_max
    assert (before_min != after_min) or (before_max != after_max)
    # invariants: normalized bounds, min gap preserved
    for a, b in zip(after_min, after_max):
        assert 0.0 <= a <= b <= 1.0
        assert b - a >= 0.1 - 1e-9


def test_histogram_view_data():
    hist = np.array([1000, 0, 10, 100, 1000], np.uint32)
    grad = np.array([1000, -1000, 10, 90, 900], np.int32)
    bars, alpha = histogram_view_data(hist, grad, 1000)
    assert bars[0] == 0 and alpha[0] == 0  # bin 0 skipped
    assert bars[4] == pytest.approx(1.0)
    assert bars[2] == pytest.approx(np.log10(10) / np.log10(1000))
    assert alpha[1] == pytest.approx(1.0)
    assert 0 <= alpha.min() and alpha.max() <= 1


# -- light-direction cube model (cubeDirection.ts) --------------------------------


def test_lightcube_initial_direction():
    from volxel_tpu.utils.lightcube import LightDirectionCube
    import math

    cube = LightDirectionCube()
    d = cube.direction
    # pitch -20, yaw 45 (cubeDirection.ts:110-111)
    rx, ry = math.radians(-20), math.radians(45)
    assert d == (
        -math.cos(rx) * math.sin(ry),
        math.sin(rx),
        math.cos(rx) * math.cos(ry),
    )


def test_lightcube_set_get_roundtrip():
    from volxel_tpu.utils.lightcube import LightDirectionCube
    import numpy as np

    cube = LightDirectionCube()
    for vec in ([0, 1, 0], [1, 2, 3], [-0.3, 0.5, -0.8]):
        cube.direction = vec
        got = np.array(cube.direction)
        want = np.array(vec, float)
        want /= np.linalg.norm(want)
        np.testing.assert_allclose(got, want, atol=1e-12)


def test_lightcube_drag_clamps_pitch():
    from volxel_tpu.utils.lightcube import LightDirectionCube

    cube = LightDirectionCube()
    events = []
    cube.on_change(events.append)
    cube.drag(10, 0)  # yaw += 5 degrees
    assert cube.yaw == 50.0
    cube.drag(0, -1000)  # pitch would exceed +90
    assert cube.pitch == 90.0
    assert len(events) == 2


def test_lightcube_drives_settings():
    from volxel_tpu.utils.lightcube import LightDirectionCube
    from volxel_tpu.api.settings import ViewerSettings

    s = ViewerSettings()
    cube = LightDirectionCube()
    cube.on_change(lambda d: setattr(s, "light_dir", list(d)))
    cube.drag(40, -12)
    assert s.light_dir == list(cube.direction)
