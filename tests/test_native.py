"""Native C++ ingest kernels: exact parity with the numpy reference path."""

import numpy as np
import pytest

from volxel_tpu.grid import construct_brick_grid
from volxel_tpu.native.loader import native_available, scan_u16
from volxel_tpu.utils.fixtures import synthetic_ct_volume

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable (no g++?)"
)


def test_scan_u16_matches_numpy():
    vol = synthetic_ct_volume((16, 32, 24), bits_stored=12)
    hist, lo, hi = scan_u16(vol, 1 << 12)
    expect = np.bincount(vol.ravel(), minlength=1 << 12)
    np.testing.assert_array_equal(hist, expect)
    assert lo == int(vol.min())
    assert hi == int(vol.max())


def test_native_brick_grid_matches_numpy():
    vol = synthetic_ct_volume((20, 28, 36), bits_stored=12)
    data = vol.astype(np.float32) / vol.max()
    g_np = construct_brick_grid(data, use_native=False)
    g_cc = construct_brick_grid(data, use_native=True)

    assert g_cc.brick_count == g_np.brick_count
    assert g_cc.brick_counter == g_np.brick_counter
    np.testing.assert_array_equal(g_cc.range_lo, g_np.range_lo)
    np.testing.assert_array_equal(g_cc.range_hi, g_np.range_hi)
    np.testing.assert_array_equal(g_cc.indirection, g_np.indirection)
    np.testing.assert_array_equal(g_cc.atlas, g_np.atlas)
    for (alo, ahi), (blo, bhi) in zip(g_cc.range_mips, g_np.range_mips):
        np.testing.assert_array_equal(alo, blo)
        np.testing.assert_array_equal(ahi, bhi)


def test_native_handles_empty_and_constant():
    zeros = np.zeros((8, 8, 8), np.float32)
    g = construct_brick_grid(zeros, use_native=True)
    assert g.brick_counter == 0
    assert g.atlas.shape[0] == 0
