"""Checkpoint/resume: snapshot + exact-resume of a progressive render."""

import numpy as np
import pytest

from volxel_tpu import Renderer
from volxel_tpu.api.checkpoint import load_checkpoint, save_checkpoint
from volxel_tpu.grid import construct_brick_grid
from volxel_tpu.utils.fixtures import synthetic_ct_volume


@pytest.fixture(scope="module")
def grid():
    vol = synthetic_ct_volume((16, 16, 16), bits_stored=12)
    return construct_brick_grid(
        vol.astype(np.float32) / vol.max(), transform=np.eye(4, dtype=np.float32)
    )


def test_checkpoint_roundtrip_resumes_exactly(grid, tmp_path):
    path = tmp_path / "render.npz"

    r1 = Renderer(width=16, height=16)
    r1.restart_from_grid(grid)
    r1.camera.rotate_around_view(0.4, 0.2)
    r1.camera.zoom(2.0)
    r1.settings.bounces = 2
    for _ in range(9):
        r1.render_frame()
    save_checkpoint(r1, path)
    # continue to 14 samples
    for _ in range(5):
        r1.render_frame()
    final_direct = np.asarray(r1._framebuffer)

    # resume in a fresh renderer from the checkpoint
    r2 = Renderer(width=16, height=16)
    r2.restart_from_grid(grid)
    load_checkpoint(r2, path)
    assert r2.frame_index == 9
    assert r2.settings.bounces == 2
    np.testing.assert_allclose(r2.camera.pos, r1.camera.pos, atol=1e-6)
    for _ in range(5):
        r2.render_frame()
    final_resumed = np.asarray(r2._framebuffer)

    # RNG is keyed by frame index -> resumed convergence is bit-identical
    np.testing.assert_allclose(final_resumed, final_direct, atol=1e-6)


def test_checkpoint_resolution_mismatch_rejected(grid, tmp_path):
    path = tmp_path / "render.npz"
    r1 = Renderer(width=16, height=16)
    r1.restart_from_grid(grid)
    r1.render_frame()
    save_checkpoint(r1, path)

    r2 = Renderer(width=32, height=32)
    r2.restart_from_grid(grid)
    with pytest.raises(ValueError):
        load_checkpoint(r2, path)
