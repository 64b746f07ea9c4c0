"""DistributedRenderer facade on the 8-device CPU mesh."""

import numpy as np
import pytest

from volxel_tpu import Renderer
from volxel_tpu.grid import construct_brick_grid
from volxel_tpu.parallel.distributed import DistributedRenderer
from volxel_tpu.parallel.mesh import make_mesh
from volxel_tpu.utils.fixtures import synthetic_ct_volume


@pytest.fixture(scope="module")
def grid():
    vol = synthetic_ct_volume((16, 16, 16), bits_stored=12)
    return construct_brick_grid(
        vol.astype(np.float32) / vol.max(), transform=np.eye(4, dtype=np.float32)
    )


def _setup(r, grid):
    r.restart_from_grid(grid)
    r.camera.rotate_around_view(0.4, 0.2)
    r.camera.zoom(2.0)
    r.settings.bounces = 2
    return r


def test_distributed_matches_single_chip_mean(grid):
    """sp=4 distributed accumulation == mean of single-chip samples 0..N."""
    dist = _setup(DistributedRenderer(width=16, height=16, sp=4, px=2), grid)
    for _ in range(3):  # 3 steps x 4 samples = samples 0..11
        dist.render_frame()
    assert dist.samples_rendered() == 12

    single = _setup(Renderer(width=16, height=16), grid)
    from volxel_tpu.render.pathtrace import render_sample
    import jax.numpy as jnp

    single.render_frame()  # prime cache
    ops = single._cached_operands
    samples = [
        np.asarray(render_sample(*ops, jnp.uint32(i))) for i in range(12)
    ]
    expect = np.mean(samples, axis=0)
    np.testing.assert_allclose(
        np.asarray(dist._framebuffer), expect, atol=1e-5, rtol=1e-5
    )


def test_distributed_image_and_settings(grid):
    dist = _setup(DistributedRenderer(width=16, height=16, sp=2, px=4), grid)
    dist.render_frame()
    img = dist.image()
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()
    export = dist.export_settings()
    assert export["version"] == "v3"


def test_distributed_render_uses_mesh(grid):
    dist = _setup(DistributedRenderer(width=16, height=16, sp=4, px=2), grid)
    img = dist.render(samples=8)
    assert dist.samples_rendered() == 8
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()


def test_distributed_vz_tap_dtype(grid):
    """The vz_tap_dtype option threads through DistributedRenderer's slab
    rebuild into the sharded render fn (the payload/drift properties are
    pinned in test_volshard; this pins the user-facing plumbing)."""
    dist = _setup(
        DistributedRenderer(
            width=16, height=16, sp=1, px=2, vz=4, vz_tap_dtype="bfloat16"
        ),
        grid,
    )
    dist.render_frame()
    assert dist._slabbed is not None
    assert dist._slabbed.tap_dtype == "bfloat16"
    img = dist.image()
    assert np.isfinite(img).all()


def test_distributed_warmup_divergence_pinned(grid):
    """DOCUMENTED divergence (do not 'fix' either side): the single-chip
    renderer zero-weights warm-up samples 0..4 (viewer.ts:1356 — its
    accumulator is the mean of samples [5, N)), while DistributedRenderer
    folds ALL samples from index 0 into the accumulator (every sample is
    an iid estimator, so this is statistically sound and avoids wasting
    sp x 5 warm-up renders). The two framebuffers therefore differ until
    convergence; the single-chip one must equal the mean of samples
    [WARMUP, N) and the distributed one the mean of [0, N)."""
    import jax.numpy as jnp

    from volxel_tpu.render.pathtrace import WARMUP_SAMPLES, render_sample

    n = 8
    dist = _setup(DistributedRenderer(width=16, height=16, sp=2, px=4), grid)
    single = _setup(Renderer(width=16, height=16), grid)
    for _ in range(n // 2):
        dist.render_frame()
    for _ in range(n):
        single.render_frame()

    ops = single._cached_operands
    samples = [np.asarray(render_sample(*ops, jnp.uint32(i))) for i in range(n)]
    np.testing.assert_allclose(
        np.asarray(dist._framebuffer), np.mean(samples, axis=0),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(single._framebuffer),
        np.mean(samples[WARMUP_SAMPLES:], axis=0),
        atol=1e-5, rtol=1e-5,
    )
    assert not np.array_equal(
        np.asarray(dist._framebuffer), np.asarray(single._framebuffer)
    )
