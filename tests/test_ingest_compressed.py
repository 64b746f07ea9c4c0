"""Compressed DICOM transfer syntaxes + codec round-trips.

Parity target: the reference decodes JPEG/RLE pixel data through
dicom-pixeldata features ["image","jpeg","native"]
(dicom_preprocessor/Cargo.toml:25). Here the codecs are in-repo
(ingest/jpeg.py, ingest/rle.py); lossless paths must BIT-MATCH the
uncompressed path end-to-end through parse_dicom().pixel_array().
"""

import io

import numpy as np
import pytest

from volxel_tpu.ingest import jpeg, rle
from volxel_tpu.ingest.dicom import DicomError, parse_dicom
from volxel_tpu.utils.fixtures import synthetic_ct_volume, write_dicom_slice


@pytest.fixture(scope="module")
def ct_slice():
    vol = synthetic_ct_volume((4, 48, 56), bits_stored=12)
    return vol[2].astype(np.uint16)


# -- raw codec round-trips -------------------------------------------------------


def test_jpeg_lossless_roundtrip_smooth(ct_slice):
    enc = jpeg.encode_lossless_sv1(ct_slice, precision=12)
    assert np.array_equal(jpeg.decode(enc), ct_slice)


def test_jpeg_lossless_roundtrip_16bit_random():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 65536, (33, 29)).astype(np.uint16)
    enc = jpeg.encode_lossless_sv1(img, precision=16)
    assert np.array_equal(jpeg.decode(enc), img)


def test_jpeg_lossless_compresses(ct_slice):
    enc = jpeg.encode_lossless_sv1(ct_slice, precision=12)
    assert len(enc) < ct_slice.nbytes  # smooth CT data must actually shrink


def test_jpeg_baseline_matches_pillow():
    PIL = pytest.importorskip("PIL.Image")
    y, x = np.mgrid[0:40, 0:56]
    img8 = ((np.sin(y / 5.0) * np.cos(x / 6.0) * 0.5 + 0.5) * 255).astype(np.uint8)
    buf = io.BytesIO()
    PIL.fromarray(img8, "L").save(buf, "JPEG", quality=92)
    data = buf.getvalue()
    mine = jpeg.decode(data)
    ref = np.asarray(PIL.open(io.BytesIO(data)))
    assert mine.shape == ref.shape
    # IDCT rounding is implementation-defined; decoders agree within 1 LSB
    assert np.abs(mine.astype(int) - ref.astype(int)).max() <= 1


def test_jpeg_progressive_named_error():
    PIL = pytest.importorskip("PIL.Image")
    img8 = np.zeros((16, 16), np.uint8)
    buf = io.BytesIO()
    PIL.fromarray(img8, "L").save(buf, "JPEG", progressive=True)
    with pytest.raises(jpeg.JpegError, match="progressive"):
        jpeg.decode(buf.getvalue())


def test_jpeg_lossless_native_matches_python(ct_slice, monkeypatch):
    """The C++ scan decoder and the Python loop must agree bit-exactly."""
    import volxel_tpu.native.loader as loader

    if not loader.native_available():
        pytest.skip("no native toolchain")
    enc = jpeg.encode_lossless_sv1(ct_slice, precision=12)
    native = jpeg.decode(enc)
    monkeypatch.setattr(loader, "native_available", lambda: False)
    python = jpeg.decode(enc)
    assert np.array_equal(native, python)


def test_rle_roundtrip(ct_slice):
    enc = rle.encode_rle(ct_slice)
    assert np.array_equal(rle.decode_rle(enc, *ct_slice.shape, 16), ct_slice)


def test_rle_roundtrip_uint8():
    rng = np.random.default_rng(3)
    # runs + noise to exercise both PackBits branches
    img = np.repeat(rng.integers(0, 255, (16, 8)).astype(np.uint8), 4, axis=1)
    enc = rle.encode_rle(img)
    assert np.array_equal(rle.decode_rle(enc, 16, 32, 8), img)


# -- end-to-end through the DICOM parser ----------------------------------------


def _pixels(blob):
    return parse_dicom(blob).pixel_array()[0]


def test_dicom_jpeg_lossless_sv1_bitmatch(ct_slice):
    plain = _pixels(write_dicom_slice(ct_slice, bits_stored=12))
    comp = _pixels(
        write_dicom_slice(
            ct_slice, bits_stored=12, transfer_syntax="1.2.840.10008.1.2.4.70"
        )
    )
    assert np.array_equal(plain, comp)


def test_dicom_rle_bitmatch(ct_slice):
    comp = _pixels(
        write_dicom_slice(
            ct_slice, bits_stored=12, transfer_syntax="1.2.840.10008.1.2.5"
        )
    )
    assert np.array_equal(comp, ct_slice)


def test_dicom_big_endian_bitmatch(ct_slice):
    be = _pixels(
        write_dicom_slice(
            ct_slice, bits_stored=12, transfer_syntax="1.2.840.10008.1.2.2"
        )
    )
    assert np.array_equal(be, ct_slice)


def test_dicom_jpeg_baseline_via_pillow():
    PIL = pytest.importorskip("PIL.Image")
    y, x = np.mgrid[0:32, 0:32]
    img8 = ((y * 8 + x) % 251).astype(np.uint8)
    buf = io.BytesIO()
    PIL.fromarray(img8, "L").save(buf, "JPEG", quality=95)
    blob = write_dicom_slice(
        img8.astype(np.uint16),
        bits_stored=8,
        bits_allocated=8,
        transfer_syntax="1.2.840.10008.1.2.4.50",
        encoded_frames=[buf.getvalue()],
    )
    ref = np.asarray(PIL.open(io.BytesIO(buf.getvalue())))
    out = _pixels(blob)
    assert out.dtype == np.uint16
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_dicom_metadata_survives_encapsulation(ct_slice):
    f = parse_dicom(
        write_dicom_slice(
            ct_slice,
            bits_stored=12,
            pixel_spacing=(0.7, 0.8),
            slice_thickness=2.5,
            transfer_syntax="1.2.840.10008.1.2.4.70",
        )
    )
    assert f.transfer_syntax == "1.2.840.10008.1.2.4.70"
    assert f.pixel_spacing() == (0.7, 0.8)
    assert f.slice_thickness() == 2.5
    assert f.bits_stored == 12


def test_dicom_jpegls_named_rejection(ct_slice):
    blob = write_dicom_slice(
        ct_slice,
        bits_stored=12,
        transfer_syntax="1.2.840.10008.1.2.4.80",
        encoded_frames=[b"\x00" * 8],
    )
    with pytest.raises(DicomError, match="JPEG-LS"):
        parse_dicom(blob)


def test_dicom_j2k_lossless_bitmatch(ct_slice):
    """JPEG 2000 lossless via OpenJPEG (cv2) — matches the reference's
    dicom-pixeldata native decoding of .90."""
    cv2 = pytest.importorskip("cv2")
    ok, buf = cv2.imencode(
        ".jp2", ct_slice, [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000, 1000]
    )
    assert ok
    blob = write_dicom_slice(
        ct_slice,
        bits_stored=12,
        transfer_syntax="1.2.840.10008.1.2.4.90",
        encoded_frames=[buf.tobytes()],
    )
    assert np.array_equal(_pixels(blob), ct_slice)


def test_dicom_j2k_raw_codestream(ct_slice):
    """DICOM J2K fragments are usually bare codestreams (no JP2 container)."""
    cv2 = pytest.importorskip("cv2")
    ok, buf = cv2.imencode(
        ".jp2", ct_slice, [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000, 1000]
    )
    data = buf.tobytes()
    start = data.find(b"\xff\x4f\xff\x51")
    assert start > 0
    blob = write_dicom_slice(
        ct_slice,
        bits_stored=12,
        transfer_syntax="1.2.840.10008.1.2.4.90",
        encoded_frames=[data[start:]],
    )
    assert np.array_equal(_pixels(blob), ct_slice)


def test_compressed_series_through_full_ingest(ct_slice):
    """JPEG-lossless ZIP series -> grid must equal the uncompressed path."""
    from volxel_tpu.ingest.series import read_dicom_series
    from volxel_tpu.utils.fixtures import write_dicom_series

    vol = synthetic_ct_volume((6, 24, 24), bits_stored=12)
    plain = write_dicom_series(vol, bits_stored=12)
    comp = write_dicom_series(
        vol, bits_stored=12, transfer_syntax="1.2.840.10008.1.2.4.70"
    )
    a = read_dicom_series(plain)
    b = read_dicom_series(comp)
    assert np.array_equal(a.data, b.data)
    assert np.array_equal(a.histogram, b.histogram)


# -- JPEG XL (1.2.840.10008.1.2.4.110/.112) -----------------------------------
# Reference parity: dicom_preprocessor decodes JPEG XL via its `jpegxl`
# feature (Cargo.toml:25). Encode side is the system libjxl — an external
# implementation, so these are not self-round-trip tests of repo code.


def _jxl_or_skip():
    from volxel_tpu.ingest import jxl

    if not jxl.jxl_available():
        pytest.skip("libjxl not available")
    return jxl


def test_dicom_jxl_lossless_exact():
    jxl = _jxl_or_skip()
    from volxel_tpu.ingest.dicom import parse_dicom

    rng = np.random.default_rng(7)
    pixels = rng.integers(0, 4096, (32, 48), dtype=np.uint16)
    blob = write_dicom_slice(
        pixels,
        bits_stored=12,
        transfer_syntax="1.2.840.10008.1.2.4.110",
        encoded_frames=[jxl.encode_jxl(pixels, lossless=True)],
    )
    np.testing.assert_array_equal(parse_dicom(blob).pixel_array()[0], pixels)


def test_dicom_jxl_lossy_decodes():
    jxl = _jxl_or_skip()
    from volxel_tpu.ingest.dicom import parse_dicom

    yy, xx = np.mgrid[0:64, 0:64]
    pixels = ((np.sin(yy / 9.0) + np.cos(xx / 7.0) + 2) * 60).astype(np.uint8)
    blob = write_dicom_slice(
        pixels.astype(np.uint16),
        bits_stored=8,
        bits_allocated=8,
        transfer_syntax="1.2.840.10008.1.2.4.112",
        encoded_frames=[jxl.encode_jxl(pixels, lossless=False, distance=1.0)],
    )
    decoded = parse_dicom(blob).pixel_array()[0]
    assert decoded.shape == pixels.shape
    # lossy: smooth content survives within a tight band
    err = np.abs(decoded.astype(int) - pixels.astype(int))
    assert err.mean() < 2.0 and err.max() < 16


def test_dicom_jxl_in_series_to_grid():
    """Whole pipeline: JXL series -> volume -> brick grid."""
    jxl = _jxl_or_skip()
    from volxel_tpu.ingest.series import read_dicoms_to_grid

    vol = synthetic_ct_volume((12, 16, 16), bits_stored=12)
    blobs = [
        write_dicom_slice(
            vol[z],
            bits_stored=12,
            instance_number=z + 1,
            transfer_syntax="1.2.840.10008.1.2.4.110",
            encoded_frames=[jxl.encode_jxl(vol[z], lossless=True)],
        )
        for z in range(vol.shape[0])
    ]
    grid = read_dicoms_to_grid(blobs)
    assert grid.index_extent[2] >= 12
