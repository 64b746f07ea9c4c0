"""Tile-march kernel (render/tilemarch.py): bit-parity vs serial gathers.

Runs in Pallas interpret mode on CPU; the same kernel was verified to
lower and run on the chip (examples/ab_tilemarch.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from volxel_tpu.render.tilemarch import (
    LANES,
    pack_tile_rays,
    serial_march_sums,
    tile_corners,
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


@pytest.mark.parametrize("box", [(32, 32, 32), (16, 16, 64), (32, 32, 64)])
def test_tile_march_bit_equal_on_hits(scene, box):
    dense, rays, ext4 = scene
    dz, dy, dx = box
    corners = tile_corners(rays, [EXT, EXT, EXT], dz, dy, dx, steps=16)
    sums, miss = tile_march_sums(
        dense, rays, corners, ext4, dz=dz, dy=dy, dx=dx, steps=16,
        interpret=True,
    )
    ref = serial_march_sums(dense, rays, ext4, steps=16)
    hit = np.asarray(miss) == 0
    assert hit.mean() > 0.5, f"degenerate scene: {hit.mean()}"
    np.testing.assert_array_equal(
        np.asarray(sums)[hit], np.asarray(ref)[hit],
        err_msg=f"box {box}: hit lanes must be bit-equal",
    )
    # missed lanes accumulate only their in-box steps — never more than ref
    assert np.all(np.asarray(sums) <= np.asarray(ref) + 1e-6)


def test_tile_march_invalid_lanes_zero(scene):
    dense, rays, ext4 = scene
    corners = tile_corners(rays, [EXT, EXT, EXT], 32, 32, 32, steps=8)
    sums, miss = tile_march_sums(
        dense, rays, corners, ext4, steps=8, interpret=True)
    invalid = np.asarray(rays[:, 9]) <= 0.5
    assert np.all(np.asarray(sums)[invalid] == 0.0)
    assert np.all(np.asarray(miss)[invalid] == 0)
