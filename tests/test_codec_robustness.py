"""Malformed-input robustness for the in-repo codecs.

Production ingest sees truncated downloads and corrupt archives; every
decoder must fail with a typed error quickly — no hangs, no native
crashes, no unbounded allocation.
"""

from __future__ import annotations

import numpy as np
import pytest

from volxel_tpu.ingest.hdr import EnvDecodeError


import struct as _struct
import zlib as _zlib

_DECODE_ERRORS = (
    EnvDecodeError, ValueError, IndexError, KeyError, EOFError,
    _struct.error, _zlib.error,
)


def _mutations(blob: bytes, rng):
    yield blob[: len(blob) // 3]                      # truncation
    yield blob[: len(blob) // 2]                      # deeper truncation
    b = bytearray(blob)
    for _ in range(16):                               # byte corruption
        b[int(rng.integers(8, len(b)))] = int(rng.integers(0, 256))
    yield bytes(b)
    yield blob[:4] + b"\x00" * 64                     # garbage body


def test_exr_decoders_reject_garbage():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent / "fixtures"))
    from volxel_tpu.ingest.exr import decode_exr

    rng = np.random.default_rng(0)
    fixtures = Path(__file__).parent / "fixtures"
    for name in ("openexr_piz.exr", "openexr_pxr24.exr",
                 "openexr_b44.exr", "openexr_tiled_zip.exr",
                 "openexr_dwaa.exr", "openexr_dwab.exr",
                 "openexr_tiled_dwaa.exr", "openexr_dwaa_ya.exr"):
        blob = (fixtures / name).read_bytes()
        for mutant in _mutations(blob, rng):
            try:
                decode_exr(mutant)  # surviving mutants may decode to junk
            except _DECODE_ERRORS:
                pass


def test_jxl_decoder_rejects_garbage():
    jxl = pytest.importorskip("volxel_tpu.ingest.jxl")
    if not jxl.jxl_available():
        pytest.skip("libjxl unavailable")
    rng = np.random.default_rng(1)
    img = rng.integers(0, 4096, (24, 32), dtype=np.uint16)
    blob = jxl.encode_jxl(img, lossless=True)
    for mutant in _mutations(blob, rng):
        try:
            jxl.decode_jxl(mutant)
        except (ValueError, RuntimeError):
            pass


def test_dicom_parser_rejects_garbage():
    from volxel_tpu.ingest.dicom import DicomError, parse_dicom
    from volxel_tpu.utils.fixtures import write_dicom_slice

    rng = np.random.default_rng(2)
    pixels = rng.integers(0, 4096, (16, 16), dtype=np.uint16)
    blob = write_dicom_slice(pixels, bits_stored=12)
    for mutant in _mutations(blob, rng):
        try:
            parse_dicom(mutant)
        except _DECODE_ERRORS:
            pass


def test_deflate64_rejects_garbage():
    from volxel_tpu.ingest.deflate64 import Deflate64Error, inflate64

    rng = np.random.default_rng(3)
    for _ in range(24):
        junk = rng.integers(0, 256, int(rng.integers(1, 400)), dtype=np.uint8)
        try:
            out = inflate64(junk.tobytes(), max_output=1 << 20)
            assert len(out) <= (1 << 20) + 70000  # bounded even on survival
        except Deflate64Error:
            pass


def test_piz_rejects_garbage():
    from volxel_tpu.ingest.piz import PizError, piz_uncompress

    rng = np.random.default_rng(4)
    for _ in range(12):
        junk = rng.integers(0, 256, int(rng.integers(8, 600)), dtype=np.uint8)
        try:
            piz_uncompress(junk.tobytes(), [(1, 2)], 16, 16)
        except (PizError, ValueError, IndexError):
            pass


def test_ppmd_hostile_streams_never_crash():
    """The PPMd decoder (native C++ on the ingest path) consumes
    attacker-controlled ZIP payloads: garbage, truncations and random
    corruptions of valid streams must produce typed PpmdError or a
    bounded decode — never a crash or unexpected exception (the advisor's
    r2 Huffman finding was exactly this class)."""
    import random

    from volxel_tpu.ingest import ppmd

    rng = random.Random(99)
    for trial in range(120):
        n = rng.randrange(0, 200)
        blob = bytes(rng.randrange(256) for _ in range(n))
        try:
            kind = trial % 4
            if kind == 0:
                ppmd.zip_decompress(blob)
            elif kind == 1:
                ppmd.zip_decompress(blob, size=rng.randrange(0, 500))
            elif kind == 2:
                w = (
                    (rng.randrange(2, 17) - 1)
                    | ((rng.randrange(1, 17) - 1) << 4)
                    | (rng.randrange(0, 3) << 12)  # incl. CUT_OFF/FREEZE
                )
                ppmd.zip_decompress(
                    w.to_bytes(2, "little") + blob, size=rng.randrange(0, 2000)
                )
            else:
                s = bytearray(ppmd.zip_compress(b"hello world " * 20))
                for _ in range(rng.randrange(1, 6)):
                    s[rng.randrange(len(s))] ^= rng.randrange(1, 256)
                ppmd.zip_decompress(bytes(s), size=240)
        except ppmd.PpmdError:
            pass  # the only acceptable failure shape
