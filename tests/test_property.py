"""Property-based tests (hypothesis) for the pure codecs."""

import numpy as np
from hypothesis import given, settings, strategies as st

from volxel_tpu.grid.encoding import (
    decode_ptr,
    decode_range,
    decode_voxel,
    encode_ptr,
    encode_range,
    encode_voxel,
)
from volxel_tpu.ingest.dicom import parse_dicom
from volxel_tpu.ingest.exr import decode_exr, encode_exr_uncompressed
from volxel_tpu.ingest.hdr import decode_hdr, encode_hdr
from volxel_tpu.utils.fixtures import write_dicom_slice


@given(
    st.lists(
        st.floats(min_value=-100.0, max_value=100.0, width=32),
        min_size=1,
        max_size=32,
    ),
    st.lists(
        st.floats(min_value=-100.0, max_value=100.0, width=32),
        min_size=1,
        max_size=32,
    ),
)
def test_range_roundtrip_is_f16(lo, hi):
    n = min(len(lo), len(hi))
    lo = np.asarray(lo[:n], np.float32)
    hi = np.asarray(hi[:n], np.float32)
    dlo, dhi = decode_range(encode_range(lo, hi))
    np.testing.assert_array_equal(dlo, lo.astype(np.float16).astype(np.float32))
    np.testing.assert_array_equal(dhi, hi.astype(np.float16).astype(np.float32))


@given(st.lists(st.integers(min_value=0, max_value=1023), min_size=3, max_size=3))
def test_ptr_roundtrip(xyz):
    out = decode_ptr(encode_ptr(np.asarray(xyz)))
    np.testing.assert_array_equal(out, xyz)


@given(
    st.floats(min_value=0.0, max_value=1.0, width=32),
    st.floats(min_value=0.0, max_value=0.5, width=32),
    st.floats(min_value=0.53125, max_value=1.0, width=32),
)
def test_voxel_quantization_error_bound(v, lo, hi):
    lo32, hi32 = np.float32(lo), np.float32(hi)
    v32 = np.float32(np.clip(v, lo32, hi32))
    enc = encode_voxel(v32, lo32, hi32)
    dec = decode_voxel(enc, lo32, hi32)
    assert abs(float(dec) - float(v32)) <= float(hi32 - lo32) / 255.0 * 0.5 + 1e-6


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**16 - 1),
    st.floats(min_value=0.0625, max_value=10.0, width=32),
)
def test_dicom_writer_parser_roundtrip(rows, cols, fill, spacing):
    rng = np.random.default_rng(fill)
    px = rng.integers(0, 2**16, (rows, cols)).astype(np.uint16)
    blob = write_dicom_slice(px, pixel_spacing=(spacing, spacing), slice_thickness=spacing)
    f = parse_dicom(blob)
    np.testing.assert_array_equal(f.pixel_array()[0], px)
    assert f.pixel_spacing() == (np.float32(spacing), np.float32(spacing))


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=0, max_value=10_000),
)
def test_exr_roundtrip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 100, (h, w, 3)).astype(np.float32)
    out = decode_exr(encode_exr_uncompressed(img))
    np.testing.assert_allclose(out[..., :3], img, rtol=1e-6)


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=10_000),
)
def test_hdr_roundtrip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    img = (rng.uniform(0, 1, (h, w, 3)) * 8).astype(np.float32)
    out = decode_hdr(encode_hdr(img))
    scale = np.maximum(img.max(axis=-1, keepdims=True), 1e-6)
    np.testing.assert_allclose(out[..., :3] / scale, img / scale, atol=0.02)
