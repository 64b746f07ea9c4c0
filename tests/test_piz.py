"""PIZ EXR compression (ingest/piz.py + exr.py wiring).

Parity target: the reference reads PIZ HDRIs via the Rust image/exr crates
(dicom_preprocessor/src/hdr.rs:23-36). PIZ is the most common wild HDRI
compression; these tests pin lossless round-trips of every codec stage and
the full decode_exr path on a polyhaven-style fixture.
"""

import numpy as np
import pytest

from volxel_tpu.ingest import piz
from volxel_tpu.ingest.exr import decode_exr, encode_exr_piz


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def test_huffman_roundtrip(rng):
    data = rng.integers(0, 4000, 5000).astype(np.uint16)
    data[1000:1400] = 77  # exercise the RLE pseudo-symbol
    assert np.array_equal(
        piz.huf_uncompress(piz.huf_compress(data), len(data)), data
    )


def test_huffman_single_symbol():
    data = np.full(100, 9, np.uint16)
    assert np.array_equal(
        piz.huf_uncompress(piz.huf_compress(data), 100), data
    )


@pytest.mark.parametrize("shape", [(32, 48), (33, 47), (1, 17), (16, 1), (5, 5)])
@pytest.mark.parametrize("mx", [100, 60000])  # mod-2^14 and mod-2^16 paths
def test_wavelet_roundtrip(rng, shape, mx):
    ny, nx = shape
    buf = rng.integers(0, min(mx + 1, 65536), ny * nx).astype(np.uint16)
    orig = buf.copy()
    piz.wav2_encode(buf, nx, 1, ny, nx, mx)
    if min(nx, ny) > 1:  # degenerate 1-pixel axes are a legitimate no-op
        assert not np.array_equal(buf, orig)
    piz.wav2_decode(buf, nx, 1, ny, nx, mx)
    assert np.array_equal(buf, orig)


def test_piz_chunk_roundtrip_half(rng):
    w, rows = 64, 32
    raw = rng.integers(0, 60000, rows * w * 3).astype("<u2").tobytes()
    chans = [(1, 2)] * 3
    assert piz.piz_uncompress(piz.piz_compress(raw, chans, w, rows), chans, w, rows) == raw


def test_piz_chunk_roundtrip_float(rng):
    w, rows = 48, 16
    raw = rng.random(rows * w).astype("<f4").tobytes()
    assert (
        piz.piz_uncompress(piz.piz_compress(raw, [(2, 4)], w, rows), [(2, 4)], w, rows)
        == raw
    )


def test_decode_exr_piz_polyhaven_style(rng):
    """Full-file path: odd height (partial last chunk), HALF channels,
    extra header attributes — the shape of a real polyhaven export."""
    h, w = 67, 128
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            np.exp(np.sin(x / 9.0)) * 3,
            np.abs(np.cos(y / 7.0)),
            rng.random((h, w)) * 0.2,
        ],
        -1,
    ).astype(np.float32)
    out = decode_exr(encode_exr_piz(img, half=True))
    assert out.shape == (h, w, 4)
    ref = img.astype(np.float16).astype(np.float32)
    assert np.array_equal(out[..., :3], ref)
    assert (out[..., 3] == 1.0).all()


def test_decode_exr_piz_float_exact(rng):
    img = rng.random((40, 32, 3)).astype(np.float32)
    out = decode_exr(encode_exr_piz(img, half=False))
    assert np.array_equal(out[..., :3], img)


def test_piz_actually_compresses():
    h, w = 64, 64
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([np.sin(x / 9.0), np.cos(y / 7.0), x * 0.0 + 0.5], -1).astype(
        np.float32
    )
    enc = encode_exr_piz(img, half=True)
    assert len(enc) < h * w * 3 * 2  # smaller than raw HALF payload


def test_environment_loads_piz(rng):
    """The env-map pipeline consumes PIZ files end-to-end."""
    from volxel_tpu.ingest import decode_env_bytes

    img = rng.random((32, 64, 3)).astype(np.float32)
    data = encode_exr_piz(img, half=True)
    out = decode_env_bytes(data)
    assert out.shape == (32, 64, 4)
    assert np.isfinite(out).all()


def test_huf_hostile_n_bits_rejected(monkeypatch):
    """A chunk whose header claims n_bits far past the buffer must be
    rejected (-4/corrupt), not read out of bounds — in both the native
    decoder and the Python fallback (advisor finding r2: unvalidated
    rd32(12) drove end_bit gigabytes past the allocation)."""
    import struct

    import volxel_tpu.ingest.piz as piz
    import volxel_tpu.native.loader as loader

    vals = np.arange(200, dtype=np.uint16) % 50
    blob = bytearray(piz.huf_compress(vals))
    struct.pack_into("<I", blob, 12, 0xFFFFFF00)  # hostile n_bits
    for force_python in ([False, True] if loader.native_available() else [True]):
        if force_python:
            monkeypatch.setattr(loader, "native_available", lambda: False)
        with pytest.raises(piz.PizError):
            piz.huf_uncompress(bytes(blob), len(vals))


def test_huf_hostile_table_rejected(monkeypatch):
    """A code-length table that never terminates within the buffer (all
    long-zerorun bytes) must hit the bounds check, not overread the
    8-byte fetch window past the padded allocation."""
    import struct

    import volxel_tpu.ingest.piz as piz
    import volxel_tpu.native.loader as loader

    # header: im=0, iM=65535 -> expects a full table; body is all 0xFF so
    # the reader keeps consuming 6-bit codes off the end of the data
    header = struct.pack("<5I", 0, 65535, 4, 8, 0)
    blob = header + b"\xff" * 4
    for force_python in ([False, True] if loader.native_available() else [True]):
        if force_python:
            monkeypatch.setattr(loader, "native_available", lambda: False)
        with pytest.raises(piz.PizError):
            piz.huf_uncompress(blob, 16)


def test_huf_native_matches_python_fallback(monkeypatch):
    """The native ImfHuf decode and the pure-Python loop must agree on
    real streams (including long >16-bit codes and RLE runs)."""
    import volxel_tpu.ingest.piz as piz
    import volxel_tpu.native.loader as loader

    if not loader.native_available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    # skewed distribution -> deep Huffman tree; repeats -> RLE runs
    vals = np.concatenate([
        (rng.zipf(1.2, 4000) % 60000).astype(np.uint16),
        np.repeat(rng.integers(0, 500, 40).astype(np.uint16), 77),
    ])
    blob = piz.huf_compress(vals)
    native_out = piz.huf_uncompress(blob, len(vals))
    monkeypatch.setattr(loader, "native_available", lambda: False)
    python_out = piz.huf_uncompress(blob, len(vals))
    np.testing.assert_array_equal(native_out, vals)
    np.testing.assert_array_equal(python_out, vals)
