"""MXU one-hot gather (render.mxu_gather): bit-exactness + integration.

The kernel's contract is that gathered VALUES are bit-equal to
`table[idx]` for every f32 bit pattern (byte-plane decomposition), so
swapping it into the DDA march's majorant fetch must leave renders
BIT-identical. On the CPU test mesh the Pallas kernel runs interpreted
(mxu_gather=True forces engagement; "auto" is TPU-only).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from volxel_tpu import Renderer
from volxel_tpu.grid import construct_brick_grid
from volxel_tpu.render.mxu_gather import mxu_gather_f32, pack_gather_table
from volxel_tpu.utils.fixtures import synthetic_ct_volume


@pytest.fixture(scope="module")
def grid():
    vol = synthetic_ct_volume((40, 24, 56), bits_stored=12)
    return construct_brick_grid(
        vol.astype(np.float32) / vol.max(), transform=np.eye(4, dtype=np.float32)
    )


def test_bit_exact_adversarial_table():
    """Every f32 bit pattern survives the byte-plane round trip: normals,
    denormals (below bf16's 2^-133 floor), zeros, NaN, +-Inf, huge."""
    rng = np.random.default_rng(7)
    t = (rng.standard_normal(4321) * 10.0 ** rng.integers(-38, 38, 4321)).astype(
        np.float32
    )
    t[::7] = np.float32(1e-42)  # f32 denormal
    t[::11] = 0.0
    t[::13] = -0.0
    t[1] = np.nan
    t[2] = np.inf
    t[3] = -np.inf
    flat = jnp.asarray(t)
    packed = pack_gather_table(flat)
    idx = jnp.asarray(rng.integers(0, t.size, size=10000).astype(np.int32))
    got = np.asarray(mxu_gather_f32(packed, idx))
    want = np.asarray(flat[idx])
    np.testing.assert_array_equal(got.view(np.uint32), want.view(np.uint32))


@pytest.mark.parametrize("dtype", ["int8", "bfloat16"])
def test_both_packings_bit_exact(dtype):
    """int8 (preferred — integer MXU accumulation) and bf16 (fallback)
    packings both reproduce every bit pattern."""
    rng = np.random.default_rng(11)
    t = rng.standard_normal(700).astype(np.float32)
    t[5] = np.nan
    t[6] = np.float32(1e-42)
    t[7] = -np.inf
    flat = jnp.asarray(t)
    packed = pack_gather_table(flat, dtype)
    idx = jnp.asarray(rng.integers(0, 700, size=3000).astype(np.int32))
    got = np.asarray(mxu_gather_f32(packed, idx))
    np.testing.assert_array_equal(
        got.view(np.uint32), np.asarray(flat[idx]).view(np.uint32)
    )


def test_block_padding_and_shapes():
    """Lane counts that aren't block multiples pad internally; any idx
    shape round-trips."""
    rng = np.random.default_rng(1)
    flat = jnp.asarray(rng.standard_normal(300).astype(np.float32))
    packed = pack_gather_table(flat)
    for shape in [(5,), (1333,), (8, 128), (3, 7, 11)]:
        idx = jnp.asarray(rng.integers(0, 300, size=shape).astype(np.int32))
        got = np.asarray(mxu_gather_f32(packed, idx, block=512))
        np.testing.assert_array_equal(got, np.asarray(flat[idx]))
        assert got.shape == shape


def test_premul_pyramid_compact_lookup_bit_equal(grid):
    """lookup_majorant_premul through the compact MXU table returns the
    exact texels of the stacked pyramid for random (mip, brick) taps —
    pinning the level-slicing + flat-index arithmetic."""
    import jax

    from volxel_tpu.render.sampling import (
        DeviceGrid,
        device_grid_from_brick,
        lookup_majorant_premul,
        pack_premul_pyramid,
    )

    dg = device_grid_from_brick(grid)
    # a premul stand-in with unique-ish values per texel
    rng = np.random.default_rng(3)
    maj_alpha_up = np.asarray(dg.maj_mips) * 0.0
    # rebuild each level with random values, nearest-upsampled like the
    # builder (sampling.build_majorant_pyramid)
    bz, by, bx = maj_alpha_up.shape[1:]
    for m in range(4):
        s = 1 << m
        level = rng.random((bz // s, by // s, bx // s)).astype(np.float32)
        maj_alpha_up[m] = level.repeat(s, 0).repeat(s, 1).repeat(s, 2)
    maj_alpha = jnp.asarray(maj_alpha_up)
    packed = pack_premul_pyramid(maj_alpha)
    g_mxu = dg._replace(maj_alpha=maj_alpha, maj_mxu=packed)
    g_ref = dg._replace(maj_alpha=maj_alpha)

    n = 4096
    ipos = jnp.asarray(
        rng.random((n, 3)).astype(np.float32)
        * np.array([bx * 8, by * 8, bz * 8], np.float32)
    )
    mip = jnp.asarray(rng.integers(0, 4, size=n).astype(np.int32))
    got = np.asarray(jax.jit(lookup_majorant_premul)(g_mxu, ipos, mip))
    want = np.asarray(jax.jit(lookup_majorant_premul)(g_ref, ipos, mip))
    np.testing.assert_array_equal(got.view(np.uint32), want.view(np.uint32))


@pytest.mark.parametrize("mode", ["default", "no_dda", "raymarch"])
def test_render_bit_identical_with_mxu_gather(grid, mode):
    """Full renders with mxu_gather forced ON (interpreted Pallas on CPU)
    are BIT-identical to the XLA-gather renders — covering the majorant
    pyramid (default march), the transfer LUT (all decode/raymarch
    sites), the warp tables, and the envmap bilinear."""
    from volxel_tpu.render.pathtrace import render_sample

    r = Renderer(width=32, height=24)
    r.restart_from_grid(grid)
    r.camera.rotate_around_view(0.5, 0.3)
    r.camera.zoom(2.0)
    r.settings.bounces = 2
    r.render_mode = mode
    r.render_frame()
    config, *rest = r._cached_operands
    images = {}
    for flag in (False, True):
        cfg = config._replace(mxu_gather=flag)
        images[flag] = np.asarray(render_sample(cfg, *rest, jnp.uint32(5)))
    np.testing.assert_array_equal(images[True], images[False])


def test_auto_is_off_on_cpu(grid):
    """mxu_gather='auto' must resolve OFF (measured loss on the chip —
    examples/ab_mxu.py r9 — and on CPU the Pallas kernel would run
    interpreted inside every march iteration)."""
    from volxel_tpu.render.pathtrace import _mxu_gather_engaged
    from volxel_tpu.render.sampling import device_grid_from_brick

    r = Renderer(width=8, height=8)
    assert r.mxu_gather == "auto"
    cfg = r._config()
    # "auto" resolves host-side (backend + hardware probe) to a bool
    assert cfg.mxu_gather is False
    assert not _mxu_gather_engaged(cfg, device_grid_from_brick(grid))
    assert _mxu_gather_engaged(cfg._replace(mxu_gather=True),
                               device_grid_from_brick(grid))
