"""Tile-march kernels (render/tilemarch.py): bit-parity vs the XLA path.

Runs in Pallas interpret mode on CPU; the same kernels were verified to
lower, run, and stay bit-equal on the chip (examples/ab_tilemarch.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from volxel_tpu.render import modes
from volxel_tpu.render.rng import seed_rays
from volxel_tpu.render.sampling import DeviceGrid, VolumeParams
from volxel_tpu.render.tilemarch import (
    LANES,
    pack_tile_rays,
    serial_march_sums,
    tile_block_corners,
    tile_march_sums,
)

EXT = 64  # (Z, Y, X) test volume


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    dense = jnp.asarray(rng.random((EXT, EXT, EXT), np.float32), jnp.bfloat16)
    ntiles = 3
    # coherent tiles: lanes fan out slightly from a per-tile origin, like
    # a screen micro-tile's frustum
    origin = rng.uniform(5, 20, (ntiles, 1, 3)).astype(np.float32)
    base_dir = rng.normal(size=(ntiles, 1, 3)).astype(np.float32)
    base_dir /= np.linalg.norm(base_dir, axis=-1, keepdims=True)
    spread = rng.normal(scale=0.01, size=(ntiles, LANES, 3)).astype(np.float32)
    idir = base_dir + spread
    ipos = np.broadcast_to(origin, (ntiles, LANES, 3)).copy()
    start = rng.uniform(0, 1, (ntiles, LANES)).astype(np.float32)
    dt = np.full((ntiles, LANES), 0.9, np.float32)
    far = np.full((ntiles, LANES), 80.0, np.float32)
    valid = rng.random((ntiles, LANES)) > 0.1
    rays = pack_tile_rays(
        jnp.asarray(ipos), jnp.asarray(idir), jnp.asarray(start),
        jnp.asarray(dt), jnp.asarray(far), jnp.asarray(valid),
    )
    ext4 = jnp.asarray([EXT, EXT, EXT, 0], jnp.int32)
    return dense, rays, ext4


@pytest.mark.parametrize("bz,neigh", [(8, (3, 2, 1)), (16, (2, 2, 1)),
                                      (8, (2, 2, 2))])
def test_tile_march_bit_equal_on_hits(scene, bz, neigh):
    dense, rays, ext4 = scene
    cb = tile_block_corners(rays, [EXT, EXT, EXT], bz, neigh, steps=16)
    sums, miss = tile_march_sums(
        dense, rays, cb, ext4, bz=bz, neigh=neigh, steps=16, interpret=True,
    )
    ref = serial_march_sums(dense, rays, ext4, steps=16)
    hit = np.asarray(miss) == 0
    assert hit.mean() > 0.5, f"degenerate scene: {hit.mean()}"
    np.testing.assert_array_equal(
        np.asarray(sums)[hit], np.asarray(ref)[hit],
        err_msg=f"bz {bz} neigh {neigh}: hit lanes must be bit-equal",
    )
    # missed lanes accumulate only their in-window steps — never more than ref
    assert np.all(np.asarray(sums) <= np.asarray(ref) + 1e-6)


def test_tile_march_invalid_lanes_zero(scene):
    dense, rays, ext4 = scene
    cb = tile_block_corners(rays, [EXT, EXT, EXT], 8, (3, 2, 1), steps=8)
    sums, miss = tile_march_sums(
        dense, rays, cb, ext4, steps=8, interpret=True)
    invalid = np.asarray(rays[:, 9]) <= 0.5
    assert np.all(np.asarray(sums)[invalid] == 0.0)
    assert np.all(np.asarray(miss)[invalid] == 0)


# ---------------------------------------------------------------------------
# Production path: sample_volume_raymarch_tiled == sample_volume_raymarch
# bit-exactly (non-missed lanes in-kernel, missed lanes via the compacted
# XLA fallback re-traced from the post-prologue state snapshot).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def render_scene():
    rng = np.random.default_rng(3)
    dense = jnp.asarray(
        rng.random((EXT, EXT, EXT), np.float32) * 0.9, jnp.bfloat16)
    bdim = EXT // 8
    grid = DeviceGrid(
        atlas=jnp.zeros((8, 8, 8), jnp.uint8),
        range_lo=jnp.zeros((bdim,) * 3, jnp.float32),
        range_hi=jnp.ones((bdim,) * 3, jnp.float32),
        ptr=jnp.zeros((bdim, bdim, bdim, 3), jnp.int32),
        maj_mips=jnp.ones((4, bdim, bdim, bdim), jnp.float32),
        extent=jnp.asarray([EXT, EXT, EXT], jnp.int32),
        dense=dense,
    )
    params = VolumeParams(
        aabb_lo=jnp.zeros(3), aabb_hi=jnp.full((3,), float(EXT)),
        transform_inv=jnp.eye(4, dtype=jnp.float32),
        vol_min=jnp.float32(0.0), vol_maj=jnp.float32(1.2),
        inv_maj=jnp.float32(1 / 1.2), density_scale=jnp.float32(1.0),
        albedo=jnp.full((3,), 0.9), phase_g=jnp.float32(0.0),
        sample_range=jnp.asarray([0.02, 0.98], jnp.float32),
    )
    lut = jnp.asarray(rng.random((128, 4)), jnp.float32)
    n = 2 * LANES
    origin = np.tile(np.array([[-10.0, 20.0, 25.0]], np.float32), (n, 1))
    origin[:, 1] += rng.normal(scale=1.0, size=n)
    origin[:, 2] += rng.normal(scale=1.0, size=n)
    d = np.tile(np.array([[1.0, 0.15, 0.1]], np.float32), (n, 1))
    d += rng.normal(scale=0.01, size=(n, 3)).astype(np.float32)
    d[::97] = rng.normal(size=d[::97].shape)  # wild lanes -> window misses
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    state = seed_rays(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(5))
    active = jnp.asarray(rng.random(n) > 0.05)
    return grid, params, lut, jnp.asarray(origin), jnp.asarray(d), state, active


def test_raymarch_tiled_bit_identical(render_scene):
    grid, params, lut, origin, d, state, active = render_scene
    ref = modes.sample_volume_raymarch(
        grid, params, lut, origin, d, state, active)
    tiled = modes.sample_volume_raymarch_tiled(
        grid, params, lut, origin, d, state, active, interpret=True)
    for nm, a, b in zip(["state", "hit", "t", "rgb", "le"], ref, tiled):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"{nm} must be bit-equal")


def test_raymarch_tiled_misses_exercised(render_scene):
    """The scene's wild lanes must actually exercise the fallback path —
    otherwise the bit-identity test proves less than it claims."""
    grid, params, lut, origin, d, state, active = render_scene
    from volxel_tpu.render import tilemarch as tm

    hit_box, near, far = modes.ray_box_intersection(
        modes.Rays(origin, d), params.aabb_lo, params.aabb_hi)
    ipos, idir = modes._to_index_space(params, origin, d)
    valid = active & hit_box
    state2, xi_tau = modes.rng_where(valid, state)
    tau_target = -jnp.log(1.0 - xi_tau)
    dt = (far - near) / modes.RAYMARCH_STEPS
    state2, xi_j = modes.rng_where(valid, state2)
    start = near + xi_j * dt
    n = origin.shape[0]
    tiledr = lambda x: x.reshape((n // tm.LANES, tm.LANES) + x.shape[1:])
    rays_p = tm.pack_tile_rays(
        tiledr(ipos), tiledr(idir), tiledr(start), tiledr(dt), tiledr(far),
        tiledr(valid), tiledr(tau_target))
    cb = tm.tile_block_corners_stochastic(
        rays_p, [EXT] * 3, 8, tm.effective_neigh(grid.dense.shape, 8, (3, 2, 1)),
        steps=modes.RAYMARCH_STEPS)
    scalars = jnp.stack([
        params.inv_maj, params.vol_maj, params.density_scale,
        params.sample_range[0], params.sample_range[1],
        jnp.float32(0), jnp.float32(0), jnp.float32(0)]).astype(jnp.float32)
    state4 = jnp.moveaxis(tiledr(state2), -1, 1).astype(jnp.uint32)
    outf, _ = tm.tile_march_sample(
        grid.dense, rays_p, state4, cb, jnp.transpose(lut), scalars,
        jnp.asarray([EXT, EXT, EXT, 0], jnp.int32),
        bz=8, neigh=tm.effective_neigh(grid.dense.shape, 8, (3, 2, 1)),
        steps=modes.RAYMARCH_STEPS, interpret=True)
    missed = np.asarray(outf[:, tm.O_MISS]).reshape(-1) > 0.5
    assert missed.any(), "wild lanes should miss the window"
    assert not missed.all(), "coherent lanes should stay in-window"


# ---------------------------------------------------------------------------
# End-to-end render integration (RenderConfig.tile_march)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def render_grid():
    from volxel_tpu.grid import construct_brick_grid

    rng = np.random.default_rng(11)
    return construct_brick_grid((rng.random((48, 48, 48)) * 0.9).astype(np.float32))


def _operands(render_grid, size_w=64, size_h=48):
    from volxel_tpu.api.renderer import Renderer

    r = Renderer(width=size_w, height=size_h, tile_march=False)
    r.restart_from_grid(render_grid)
    r.camera.rotate_around_view(0.5, 0.3)
    r.settings.render_mode = "raymarch"
    r.render_frame()
    return r._cached_operands


def test_tile_march_render_matches(render_grid):
    """Unchunked raymarch render with tile_march on vs off. The bounce-0
    sample outputs are BIT-equal (pinned above and re-verified on this
    scene's camera rays during development); the full frame can still
    drift by ~1 ulp on a few pixels because swapping the producer graph
    changes XLA's downstream fusion context and its transcendental
    rounding (the same position/fusion-dependent rounding documented for
    tile_chunks, NOTES r5). Contract: ulp-scale drift only."""
    from volxel_tpu.render.pathtrace import render_sample

    config, *rest = _operands(render_grid)
    assert config.width * config.height % LANES == 0
    base = config._replace(chunk_size=None, tile_march=False)
    tiled = config._replace(chunk_size=None, tile_march=True)
    a = np.asarray(render_sample(base, *rest, jnp.uint32(3)))
    b = np.asarray(render_sample(tiled, *rest, jnp.uint32(3)))
    n = a.shape[0]
    diff = (a != b).any(axis=-1)
    assert int(diff.sum()) <= max(2, n // 25), f"{diff.sum()}/{n} pixels differ"
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_tile_march_chunked_same_estimator(render_grid):
    """Chunked: tile_march nests 32x12 micro-tiles inside chunk tiles —
    a pure lane permutation with the unchanged per-lane draw protocol
    (tile_chunks contract). Lanes sit at different vector positions AND
    the producer graph changes, so XLA's position/fusion-dependent
    transcendental rounding flips a FEW percent of stochastic compares
    into different equally-valid realizations (measured 240/12288 on CPU
    at this scene); the converged images must agree."""
    from volxel_tpu.render.pathtrace import render_sample, render_sample_batch

    config, *rest = _operands(render_grid, size_w=128, size_h=96)
    base = config._replace(chunk_size=32 * 12 * 4, tile_march=False)
    tiled = config._replace(chunk_size=32 * 12 * 4, tile_march=True)
    a = np.asarray(render_sample(base, *rest, jnp.uint32(3)))
    b = np.asarray(render_sample(tiled, *rest, jnp.uint32(3)))
    n = a.shape[0]
    diff = int((a != b).any(axis=-1).sum())
    assert diff <= n // 20, f"{diff}/{n} pixels differ — not a near-pure perm"
    mean_a = np.asarray(render_sample_batch(24, base, *rest, jnp.uint32(0)))
    mean_b = np.asarray(render_sample_batch(24, tiled, *rest, jnp.uint32(0)))
    np.testing.assert_allclose(mean_a, mean_b, atol=0.08)
    assert np.abs(mean_a - mean_b).mean() < 2e-3
