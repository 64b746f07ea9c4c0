"""Brick grid: encoding round-trips + construction vs a naive reference.

The naive builder below mirrors the reference algorithm structure
(dicom_preprocessor/src/brick.rs:76-205) as an executable spec; the
vectorized construct_brick_grid must match it field for field.
"""

import numpy as np
import pytest

from volxel_tpu.grid import (
    BRICK_SIZE,
    NUM_MIPMAPS,
    construct_brick_grid,
    decode_ptr,
    decode_range,
    decode_voxel,
    encode_ptr,
    encode_range,
    encode_voxel,
)
from volxel_tpu.utils.mathutil import div_round_up


def test_range_roundtrip():
    rng = np.random.default_rng(0)
    lo = rng.uniform(-4, 4, 1000).astype(np.float32)
    hi = rng.uniform(-4, 4, 1000).astype(np.float32)
    dlo, dhi = decode_range(encode_range(lo, hi))
    np.testing.assert_array_equal(dlo, lo.astype(np.float16).astype(np.float32))
    np.testing.assert_array_equal(dhi, hi.astype(np.float16).astype(np.float32))


def test_ptr_roundtrip():
    rng = np.random.default_rng(1)
    xyz = rng.integers(0, 1024, size=(500, 3))
    out = decode_ptr(encode_ptr(xyz))
    np.testing.assert_array_equal(out, xyz)


def test_ptr_out_of_range_rejected():
    with pytest.raises(ValueError):
        encode_ptr(np.array([1024, 0, 0]))


def test_voxel_roundtrip_quantization():
    rng = np.random.default_rng(2)
    lo = np.float32(0.25)
    hi = np.float32(0.75)
    vals = rng.uniform(0.25, 0.75, 1000).astype(np.float32)
    enc = encode_voxel(vals, lo, hi)
    dec = decode_voxel(enc, lo, hi)
    assert np.max(np.abs(dec - vals)) <= (hi - lo) / 255.0 * 0.5 + 1e-6


def test_voxel_degenerate_range():
    assert encode_voxel(np.float32(0.5), np.float32(0.5), np.float32(0.5)) == 0


def _naive_lookup(data, x, y, z):
    ez, ey, ex = data.shape
    if 0 <= x < ex and 0 <= y < ey and 0 <= z < ez:
        return data[z, y, x]
    return np.float32(0.0)


def _naive_brick_minmax(data, brick_count):
    """Direct transliteration of the dilated window (brick.rs:99-112)."""
    bx, by, bz = brick_count
    lo = np.full((bz, by, bx), np.inf, np.float32)
    hi = np.full((bz, by, bx), -np.inf, np.float32)
    for cz in range(bz):
        for cy in range(by):
            for cx in range(bx):
                vals = []
                for dz in range(-2, BRICK_SIZE + 2):
                    for dy in range(-2, BRICK_SIZE + 2):
                        for dx in range(-2, BRICK_SIZE + 2):
                            vals.append(
                                _naive_lookup(
                                    data,
                                    cx * BRICK_SIZE + dx,
                                    cy * BRICK_SIZE + dy,
                                    cz * BRICK_SIZE + dz,
                                )
                            )
                lo[cz, cy, cx] = min(vals)
                hi[cz, cy, cx] = max(vals)
    return lo, hi


@pytest.fixture(scope="module")
def small_volume():
    rng = np.random.default_rng(42)
    data = rng.uniform(0, 1, size=(9, 12, 20)).astype(np.float32)
    # carve out a constant-zero region to exercise brick elision
    data[:, :, 8:] = 0.0
    return data


@pytest.fixture(scope="module")
def grid(small_volume):
    return construct_brick_grid(small_volume)


def test_brick_count_alignment(grid):
    align = 1 << NUM_MIPMAPS
    for b in grid.brick_count:
        assert b % align == 0
    assert grid.brick_count == (8, 8, 8)


def test_dilated_minmax_matches_naive(small_volume, grid):
    lo, hi = _naive_brick_minmax(small_volume, grid.brick_count)
    exp_lo, exp_hi = decode_range(encode_range(lo, hi))
    np.testing.assert_array_equal(grid.range_lo, exp_lo)
    np.testing.assert_array_equal(grid.range_hi, exp_hi)


def test_constant_bricks_elided(grid):
    # far-corner brick covers only zeros -> constant, no atlas pointer
    assert grid.range_lo[7, 7, 7] == grid.range_hi[7, 7, 7] == 0.0
    np.testing.assert_array_equal(grid.indirection[7, 7, 7], [0, 0, 0])
    bx, by, bz = grid.brick_count
    assert grid.brick_counter < bx * by * bz


def test_slot_order_is_z_major(grid):
    """Occupied bricks get sequential pointers in z-major scan order."""
    bx, by, bz = grid.brick_count
    occupied = (grid.range_lo != grid.range_hi).ravel()
    slot = 0
    for flat in np.nonzero(occupied)[0]:
        cz, rem = divmod(flat, by * bx)
        cy, cx = divmod(rem, bx)
        expect = [slot % bx, (slot // bx) % by, slot // (bx * by)]
        np.testing.assert_array_equal(grid.indirection[cz, cy, cx], expect)
        slot += 1
    assert slot == grid.brick_counter


def test_atlas_prune_size(grid):
    bx, by, _ = grid.brick_count
    layers = div_round_up(grid.brick_counter, bx * by)
    assert grid.atlas.shape == (layers * BRICK_SIZE, by * BRICK_SIZE, bx * BRICK_SIZE)


def test_lookup_roundtrip(small_volume, grid):
    """Decoded lookups match the source within u8 quantization error."""
    rng = np.random.default_rng(7)
    ez, ey, ex = small_volume.shape
    for _ in range(200):
        x = int(rng.integers(0, ex))
        y = int(rng.integers(0, ey))
        z = int(rng.integers(0, ez))
        got = grid.lookup((x, y, z))
        want = float(small_volume[z, y, x])
        bz, by_, bx_ = z >> 3, y >> 3, x >> 3
        width = float(grid.range_hi[bz, by_, bx_] - grid.range_lo[bz, by_, bx_])
        assert abs(got - want) <= width / 255.0 * 0.51 + 1e-5


def test_mip_pyramid(grid):
    bx, by, bz = grid.brick_count
    lo, hi = grid.range_lo, grid.range_hi
    for level, (mlo, mhi) in enumerate(grid.range_mips):
        factor = 1 << (level + 1)
        assert mlo.shape == (bz // factor, by // factor, bx // factor)
        # each mip texel bounds its 2x2x2 children
        z, y, x = lo.shape
        p_lo = lo.reshape(z // 2, 2, y // 2, 2, x // 2, 2).min(axis=(1, 3, 5))
        p_hi = hi.reshape(z // 2, 2, y // 2, 2, x // 2, 2).max(axis=(1, 3, 5))
        exp_lo, exp_hi = decode_range(encode_range(p_lo, p_hi))
        np.testing.assert_array_equal(mlo, exp_lo)
        np.testing.assert_array_equal(mhi, exp_hi)
        lo, hi = mlo, mhi


def test_packed_exports(grid):
    packed = grid.packed_range()
    lo, hi = decode_range(packed)
    np.testing.assert_array_equal(lo, grid.range_lo)
    np.testing.assert_array_equal(hi, grid.range_hi)
    ptrs = decode_ptr(grid.packed_indirection())
    np.testing.assert_array_equal(ptrs, grid.indirection)


def test_device_decode_bit_parity(small_volume, grid):
    """The on-device atlas->dense decoder (_decode_dense_device) must be
    bit-identical to the host decode_dense path: device_grid_from_brick
    defaults to device decode (VERDICT r3 item 2 — ships u8 atlas bytes
    instead of the bf16 field), so any drift would silently change every
    render. Same f32 op sequence, cast to bf16 at the end."""
    import numpy as np

    from volxel_tpu.render.sampling import device_grid_from_brick

    dev = device_grid_from_brick(grid, dense=True, decode_on_device=True)
    host = device_grid_from_brick(grid, dense=True, decode_on_device=False)
    a = np.asarray(dev.dense, dtype=np.float32)
    b = np.asarray(host.dense, dtype=np.float32)
    assert a.shape == b.shape
    np.testing.assert_array_equal(a, b)
    assert a.max() > 0  # non-trivial content decoded


def test_decode_brick_rows_matches_full(small_volume, grid):
    """decode_dense_brick_rows (the out-of-core slab decoder) must be
    bitwise equal to the corresponding slice of the full decode for every
    brick-row subrange — it feeds the vz capacity path."""
    import numpy as np

    from volxel_tpu.render.sampling import decode_dense, decode_dense_brick_rows

    full = decode_dense(grid)
    bz = grid.brick_count[2]
    for b0, b1 in [(0, bz), (0, 1), (bz - 1, bz), (1, 3), (2, 2)]:
        rows = decode_dense_brick_rows(grid, b0, b1)
        np.testing.assert_array_equal(rows, full[b0 * 8 : b1 * 8])
