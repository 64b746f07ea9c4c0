"""Ingest: DICOM parsing, series folding, ZIP path, HDR decoding."""

import numpy as np
import pytest

from volxel_tpu.ingest import (
    parse_dicom,
    read_dicom_series,
    read_dicoms_to_grid,
    read_zip_series,
)
from volxel_tpu.ingest.dicom import DicomError
from volxel_tpu.ingest.hdr import decode_hdr, encode_hdr, EnvDecodeError
from volxel_tpu.ingest.ziploader import ZipIngestError, read_zip_to_grid
from volxel_tpu.utils.fixtures import (
    synthetic_ct_volume,
    synthetic_env_hdr,
    write_dicom_series,
    write_dicom_slice,
    write_dicom_zip,
)


@pytest.fixture(scope="module")
def volume():
    return synthetic_ct_volume((12, 24, 16), bits_stored=12)


def test_parse_single_slice(volume):
    blob = write_dicom_slice(volume[0], pixel_spacing=(0.7, 0.8), slice_thickness=2.5)
    f = parse_dicom(blob)
    assert not f.is_dicomdir
    px = f.pixel_array()
    assert px.shape == (1, 24, 16)
    np.testing.assert_array_equal(px[0], volume[0])
    assert f.pixel_spacing() == (0.7, 0.8)
    assert f.slice_thickness() == 2.5
    assert f.bits_stored == 16


def test_slice_thickness_defaults_to_min_spacing(volume):
    blob = write_dicom_slice(volume[0], pixel_spacing=(0.7, 0.5), slice_thickness=None)
    f = parse_dicom(blob)
    assert f.slice_thickness() == 0.5


def test_series_fold(volume):
    blobs = write_dicom_series(
        volume, pixel_spacing=(0.5, 0.5), slice_thickness=1.5, bits_stored=12
    )
    series = read_dicom_series(blobs)
    assert series.data.shape == volume.shape
    np.testing.assert_array_equal(series.data, volume)
    assert series.min == int(volume.min())
    assert series.max == int(volume.max())
    # histogram: 2^bits_stored bins summed over all slices
    assert len(series.histogram) == 1 << 12
    assert series.histogram.sum() == volume.size
    counts = np.bincount(volume.ravel(), minlength=1 << 12)
    np.testing.assert_array_equal(series.histogram, counts)
    # transform = scale(sx, sy, thickness)
    np.testing.assert_allclose(np.diag(series.transform), [0.5, 0.5, 1.5, 1.0])


def test_normalization(volume):
    blobs = write_dicom_series(volume, bits_stored=12)
    series = read_dicom_series(blobs)
    norm = series.normalized()
    assert norm.dtype == np.float32
    assert norm.max() == pytest.approx(1.0)
    np.testing.assert_allclose(
        norm, volume.astype(np.float32) / volume.max(), rtol=1e-6
    )


def test_histogram_gradient(volume):
    blobs = write_dicom_series(volume, bits_stored=12)
    series = read_dicom_series(blobs)
    grad, gmin, gmax = series.histogram_gradient()
    h = series.histogram.astype(np.int64)
    # reference semantics (dicom.rs:39-66)
    raw = np.empty_like(h)
    raw[0] = h[0]
    raw[1:] = h[1:] - h[:-1]
    assert gmin == int(np.abs(raw).min())
    assert gmax == int(np.abs(raw).max())
    assert grad[0] == raw[0] and grad[-1] == raw[-1]
    i = len(h) // 2
    expect = int(raw[i - 1] + raw[i] + raw[i + 1])
    trunc = int(np.sign(expect) * (abs(expect) // 3))
    assert grad[i] == trunc


def test_series_to_grid(volume):
    blobs = write_dicom_series(volume, bits_stored=12)
    grid = read_dicoms_to_grid(blobs)
    assert grid.min_maj == (0.0, 1.0)
    # brick counts align up to 8 bricks/axis -> minimum extent 64 (brick.rs:77)
    assert grid.index_extent == (64, 64, 64)
    assert grid.histogram.sum() == volume.size
    # center voxel decodes close to its normalized source value
    z, y, x = (s // 2 for s in volume.shape)
    got = grid.lookup((x, y, z))
    want = volume[z, y, x] / volume.max()
    assert abs(got - want) < 0.02


def test_zip_roundtrip(volume):
    blob = write_dicom_zip(volume, pixel_spacing=(0.5, 0.5), slice_thickness=1.5)
    series = read_zip_series(blob)
    np.testing.assert_array_equal(series.data, volume)
    grid = read_zip_to_grid(blob)
    assert grid.brick_counter > 0


def test_zip_multiple_folders_rejected(volume):
    import io
    import zipfile

    buf = io.BytesIO()
    blob = write_dicom_slice(volume[0])
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("a/one.dcm", blob)
        zf.writestr("b/two.dcm", blob)
    with pytest.raises(ZipIngestError):
        read_zip_series(buf.getvalue())


def test_bad_zip_rejected():
    with pytest.raises(ZipIngestError):
        read_zip_series(b"definitely not a zip")


def test_no_data_rejected():
    with pytest.raises(DicomError):
        read_dicom_series([])


def test_truncated_dicom_rejected():
    with pytest.raises((DicomError, Exception)):
        parse_dicom(b"\x00" * 10)


def test_hdr_roundtrip():
    rng = np.random.default_rng(3)
    img = (rng.uniform(0, 1, (16, 32, 3)) ** 2 * 20).astype(np.float32)
    decoded = decode_hdr(encode_hdr(img))
    assert decoded.shape == (16, 32, 4)
    np.testing.assert_allclose(decoded[..., 3], 1.0)
    # RGBE is ~1% precision with shared exponent
    scale = np.maximum(img.max(axis=-1, keepdims=True), 1e-6)
    np.testing.assert_allclose(decoded[..., :3] / scale, img / scale, atol=0.02)


def test_hdr_fixture_decodes():
    env = decode_hdr(synthetic_env_hdr(64, 32))
    assert env.shape == (32, 64, 4)
    assert env[..., :3].max() > 10  # sun patch is bright


def test_hdr_bad_magic():
    with pytest.raises(EnvDecodeError):
        decode_hdr(b"not an hdr file")


def test_exr_uncompressed_roundtrip():
    from volxel_tpu.ingest.exr import decode_exr, encode_exr_uncompressed

    rng = np.random.default_rng(5)
    img = rng.uniform(0, 10, (12, 20, 3)).astype(np.float32)
    decoded = decode_exr(encode_exr_uncompressed(img))
    assert decoded.shape == (12, 20, 4)
    np.testing.assert_allclose(decoded[..., :3], img, rtol=1e-6)
    np.testing.assert_allclose(decoded[..., 3], 1.0)


def test_exr_rgba_roundtrip():
    from volxel_tpu.ingest.exr import decode_exr, encode_exr_uncompressed

    rng = np.random.default_rng(6)
    img = rng.uniform(0, 2, (8, 16, 4)).astype(np.float32)
    decoded = decode_exr(encode_exr_uncompressed(img))
    np.testing.assert_allclose(decoded, img, rtol=1e-6)


def test_exr_dispatch_from_env_bytes():
    from volxel_tpu.ingest.exr import encode_exr_uncompressed
    from volxel_tpu.ingest.hdr import decode_env_bytes

    img = np.full((4, 8, 3), 2.5, np.float32)
    out = decode_env_bytes(encode_exr_uncompressed(img))
    np.testing.assert_allclose(out[..., :3], 2.5, rtol=1e-6)


def test_exr_bad_inputs():
    from volxel_tpu.ingest.exr import decode_exr

    with pytest.raises(EnvDecodeError):
        decode_exr(b"\x00" * 32)


def test_zip_zstd_entries():
    """ZIP method 93 (zstd) entries decode via the zstandard module —
    parity with the reference zip crate's zstd feature (Cargo.toml:30)."""
    import struct
    import zlib

    import zstandard

    from volxel_tpu.ingest.ziploader import read_zip_to_grid
    from volxel_tpu.utils.fixtures import synthetic_ct_volume, write_dicom_series

    vol = synthetic_ct_volume((8, 16, 16), bits_stored=12)
    blobs = write_dicom_series(vol, bits_stored=12)

    # hand-roll a zip with method-93 entries (zipfile can't write them)
    cctx = zstandard.ZstdCompressor()
    out = bytearray()
    central = bytearray()
    offsets = []
    for i, blob in enumerate(blobs):
        name = f"series/slice_{i:04d}.dcm".encode()
        comp = cctx.compress(blob)
        crc = zlib.crc32(blob) & 0xFFFFFFFF
        offsets.append(len(out))
        out += b"PK\x03\x04" + struct.pack(
            "<HHHHHIIIHH", 63, 0, 93, 0, 0, crc, len(comp), len(blob),
            len(name), 0,
        ) + name + comp
    for i, blob in enumerate(blobs):
        name = f"series/slice_{i:04d}.dcm".encode()
        comp_len = len(cctx.compress(blob))
        crc = zlib.crc32(blob) & 0xFFFFFFFF
        central += b"PK\x01\x02" + struct.pack(
            "<HHHHHHIIIHHHHHII", 63, 63, 0, 93, 0, 0, crc, comp_len,
            len(blob), len(name), 0, 0, 0, 0, 0, offsets[i],
        ) + name
    eocd = b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, len(blobs), len(blobs), len(central), len(out), 0
    )
    archive = bytes(out) + bytes(central) + eocd

    grid = read_zip_to_grid(archive)
    assert grid.index_extent[2] >= 8


def test_deflate64_decodes_zlib_streams():
    """zlib streams that avoid length code 285 are valid deflate64 (the
    code was REDEFINED by PKWARE; everything else is shared), so noisy
    data — max match far below 258 — gives an external-encoder check of
    every other code path (fixed + dynamic trees, stored blocks)."""
    import zlib

    from volxel_tpu.ingest.deflate64 import inflate64

    rng = np.random.default_rng(3)
    base = np.tile(rng.integers(0, 90, 139, dtype=np.uint8), 700)
    noise = (rng.random(base.size) < 0.2) * rng.integers(
        1, 255, base.size, dtype=np.uint8
    )
    data = (base ^ noise).tobytes()  # matches stay short: no code 285
    for level in (1, 6, 9):
        comp = zlib.compressobj(level, zlib.DEFLATED, -15)
        blob = comp.compress(data) + comp.flush()
        assert inflate64(blob, len(data)) == data
    comp = zlib.compressobj(0, zlib.DEFLATED, -15)  # stored blocks
    blob = comp.compress(data) + comp.flush()
    assert inflate64(blob, len(data)) == data


def test_deflate64_extended_codes():
    """Hand-assembled fixed-Huffman block using the deflate64-only codes:
    length code 285 (base 3 + 16 extra bits) and distance code 30
    (base 32769 + 14 extra bits) — a >32 KiB back-reference no plain
    deflate decoder accepts."""
    from volxel_tpu.ingest.deflate64 import inflate64

    rng = np.random.default_rng(9)
    prefix = rng.integers(0, 256, 40000, dtype=np.uint8).tobytes()

    bits = []

    def put_bits_lsb(value, n):  # extra-bits fields
        for i in range(n):
            bits.append((value >> i) & 1)

    def put_code_msb(value, n):  # huffman codes
        for i in reversed(range(n)):
            bits.append((value >> i) & 1)

    # block 1: stored (BFINAL=0, BTYPE=00), 40000 raw bytes
    put_bits_lsb(0, 1)
    put_bits_lsb(0, 2)
    while len(bits) % 8:
        bits.append(0)
    stream = bytearray()
    stream += bytes(int("".join(map(str, bits[i : i + 8][::-1])), 2)
                    for i in range(0, len(bits), 8))
    import struct

    stream += struct.pack("<HH", 40000, ~40000 & 0xFFFF)
    stream += prefix
    # block 2: fixed huffman (BFINAL=1, BTYPE=01)
    bits = []
    put_bits_lsb(1, 1)
    put_bits_lsb(1, 2)
    length, distance = 300, 40000
    put_code_msb(0b11000101, 8)          # litlen code 285 (280..287 -> 8 bits)
    put_bits_lsb(length - 3, 16)         # deflate64: 16 extra bits
    put_code_msb(30, 5)                  # distance code 30
    put_bits_lsb(distance - 32769, 14)   # 14 extra bits
    put_code_msb(0, 7)                   # end of block (256)
    while len(bits) % 8:
        bits.append(0)
    stream += bytes(int("".join(map(str, bits[i : i + 8][::-1])), 2)
                    for i in range(0, len(bits), 8))

    out = inflate64(bytes(stream), 40000 + length)
    assert out[:40000] == prefix
    expected_match = (prefix * 2)[40000 - distance : 40000 - distance + length]
    assert out[40000:] == expected_match


def test_zip_deflate64_entries():
    """Method-9 entries decode through the in-repo inflate64 (deflate
    streams are valid deflate64; relabeled to exercise the zip path)."""
    import struct
    import zlib

    from volxel_tpu.ingest.ziploader import read_zip_to_grid
    from volxel_tpu.utils.fixtures import synthetic_ct_volume, write_dicom_series

    vol = synthetic_ct_volume((8, 16, 16), bits_stored=12)
    blobs = write_dicom_series(vol, bits_stored=12)
    out = bytearray()
    central = bytearray()
    offsets = []
    for i, blob in enumerate(blobs):
        name = f"series/slice_{i:04d}.dcm".encode()
        # stored blocks (level 0): guaranteed free of the redefined code 285,
        # hence simultaneously valid deflate and deflate64
        comp_obj = zlib.compressobj(0, zlib.DEFLATED, -15)
        comp = comp_obj.compress(blob) + comp_obj.flush()
        crc = zlib.crc32(blob) & 0xFFFFFFFF
        offsets.append(len(out))
        out += b"PK\x03\x04" + struct.pack(
            "<HHHHHIIIHH", 21, 0, 9, 0, 0, crc, len(comp), len(blob),
            len(name), 0,
        ) + name + comp
        central += b"PK\x01\x02" + struct.pack(
            "<HHHHHHIIIHHHHHII", 21, 21, 0, 9, 0, 0, crc, len(comp),
            len(blob), len(name), 0, 0, 0, 0, 0, offsets[i],
        ) + name
    eocd = b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, len(blobs), len(blobs), len(central), len(out), 0
    )
    grid = read_zip_to_grid(bytes(out) + bytes(central) + eocd)
    assert grid.index_extent[2] >= 8


def test_zip_ppmd_entries():
    """ZIP method 98 (PPMd var.I) entries decode via ingest/ppmd.py —
    parity with the reference zip crate's ppmd feature (Cargo.toml:30).
    The resulting grid must equal the one from a stored-method archive
    of the same slices."""
    import struct
    import zlib

    from volxel_tpu.ingest.ppmd import zip_compress
    from volxel_tpu.ingest.ziploader import read_zip_to_grid
    from volxel_tpu.utils.fixtures import (
        synthetic_ct_volume,
        write_dicom_series,
        write_dicom_zip,
    )

    vol = synthetic_ct_volume((8, 16, 16), bits_stored=12)
    blobs = write_dicom_series(vol, bits_stored=12)

    # hand-roll a zip with method-98 entries (zipfile can't write them)
    out = bytearray()
    central = bytearray()
    offsets = []
    comps = [zip_compress(blob, order=8, mem_mb=8) for blob in blobs]
    for i, (blob, comp) in enumerate(zip(blobs, comps)):
        name = f"series/slice_{i:04d}.dcm".encode()
        crc = zlib.crc32(blob) & 0xFFFFFFFF
        offsets.append(len(out))
        out += b"PK\x03\x04" + struct.pack(
            "<HHHHHIIIHH", 63, 0, 98, 0, 0, crc, len(comp), len(blob),
            len(name), 0,
        ) + name + comp
    for i, (blob, comp) in enumerate(zip(blobs, comps)):
        name = f"series/slice_{i:04d}.dcm".encode()
        crc = zlib.crc32(blob) & 0xFFFFFFFF
        central += b"PK\x01\x02" + struct.pack(
            "<HHHHHHIIIHHHHHII", 63, 63, 0, 98, 0, 0, crc, len(comp),
            len(blob), len(name), 0, 0, 0, 0, 0, offsets[i],
        ) + name
    eocd = b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, len(blobs), len(blobs), len(central), len(out), 0
    )
    archive = bytes(out) + bytes(central) + eocd

    grid = read_zip_to_grid(archive)
    ref_grid = read_zip_to_grid(write_dicom_zip(vol, bits_stored=12))
    assert grid.index_extent == ref_grid.index_extent
    np.testing.assert_array_equal(
        np.asarray(grid.atlas), np.asarray(ref_grid.atlas)
    )
    np.testing.assert_array_equal(
        np.asarray(grid.packed_range()), np.asarray(ref_grid.packed_range())
    )
