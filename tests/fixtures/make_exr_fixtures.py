"""Generate EXR fixtures with the CANONICAL OpenEXR implementation.

Provenance: written by the system libOpenEXR-3_1.so.30 (Debian
0.7/3.1.5) through its legacy C RGBA API, driven by ctypes — i.e. these
bytes were produced by the reference OpenEXR codec, NOT by this repo's
encoder. tests/test_exr_external.py decodes them with volxel_tpu's
in-repo decoder and compares against the deterministic source pattern,
validating the PIZ/PXR24/ZIP/tiled decode paths against the world
(VERDICT r2: round-trip-only codec validation can't catch mirrored spec
misreadings).

Run from the repo root: python tests/fixtures/make_exr_fixtures.py
"""

from __future__ import annotations

import ctypes
from ctypes import c_char_p, c_int, c_size_t, c_void_p
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent

IMF_WRITE_RGBA = 15
IMF_WRITE_YA = 0x18
IMF_ZIP = 3
IMF_PIZ = 4
IMF_PXR24 = 5
IMF_DWAA = 8
IMF_DWAB = 9

_lib = ctypes.CDLL("libOpenEXR-3_1.so.30")
_lib.ImfNewHeader.restype = c_void_p
_lib.ImfDeleteHeader.argtypes = [c_void_p]
_lib.ImfHeaderSetDataWindow.argtypes = [c_void_p] + [c_int] * 4
_lib.ImfHeaderSetDisplayWindow.argtypes = [c_void_p] + [c_int] * 4
_lib.ImfHeaderSetCompression.argtypes = [c_void_p, c_int]
_lib.ImfOpenOutputFile.restype = c_void_p
_lib.ImfOpenOutputFile.argtypes = [c_char_p, c_void_p, c_int]
_lib.ImfOutputSetFrameBuffer.argtypes = [c_void_p, c_void_p, c_size_t, c_size_t]
_lib.ImfOutputWritePixels.argtypes = [c_void_p, c_int]
_lib.ImfCloseOutputFile.argtypes = [c_void_p]
_lib.ImfOpenTiledOutputFile.restype = c_void_p
_lib.ImfOpenTiledOutputFile.argtypes = [
    c_char_p, c_void_p, c_int, c_int, c_int, c_int, c_int,
]
_lib.ImfTiledOutputSetFrameBuffer.argtypes = [
    c_void_p, c_void_p, c_size_t, c_size_t,
]
_lib.ImfTiledOutputWriteTile.argtypes = [c_void_p] + [c_int] * 4
_lib.ImfCloseTiledOutputFile.argtypes = [c_void_p]


_lib.ImfOpenInputFile.restype = c_void_p
_lib.ImfOpenInputFile.argtypes = [c_char_p]
_lib.ImfInputSetFrameBuffer.argtypes = [c_void_p, c_void_p, c_size_t, c_size_t]
_lib.ImfInputReadPixels.argtypes = [c_void_p, c_int, c_int]
_lib.ImfCloseInputFile.argtypes = [c_void_p]


def canonical_read(path: Path, h: int, w: int) -> np.ndarray:
    """Decode with the canonical library (RGBA half, fills G=B=Y for
    luminance files) — the expected output for lossy codecs."""
    f = _lib.ImfOpenInputFile(str(path).encode())
    assert f, f"ImfOpenInputFile failed for {path}"
    buf = np.zeros((h, w, 4), np.uint16)
    assert _lib.ImfInputSetFrameBuffer(f, buf.ctypes.data_as(c_void_p), 1, w)
    assert _lib.ImfInputReadPixels(f, 0, h - 1)
    _lib.ImfCloseInputFile(f)
    return buf.view(np.float16)


def pattern(h: int, w: int) -> np.ndarray:
    """Deterministic HDR-ish RGBA half pattern (recomputed by the test)."""
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    r = np.exp((x - w / 2) ** 2 / -((w / 4) ** 2)) * 10.0
    g = 0.5 + 0.5 * np.sin(x / 3.0) * np.cos(y / 5.0)
    b = (y / h) ** 2 * 4.0
    a = np.ones_like(r)
    rgba = np.stack([r, g, b, a], axis=-1)
    return rgba.astype(np.float16)  # what HALF storage keeps


def _rgba_buffer(img_f16: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(img_f16.view(np.uint16))


def write_scanline(path: Path, img: np.ndarray, compression: int) -> None:
    h, w = img.shape[:2]
    hdr = _lib.ImfNewHeader()
    _lib.ImfHeaderSetDataWindow(hdr, 0, 0, w - 1, h - 1)
    _lib.ImfHeaderSetDisplayWindow(hdr, 0, 0, w - 1, h - 1)
    _lib.ImfHeaderSetCompression(hdr, compression)
    out = _lib.ImfOpenOutputFile(str(path).encode(), hdr, IMF_WRITE_RGBA)
    assert out, f"ImfOpenOutputFile failed for {path}"
    buf = _rgba_buffer(img)
    assert _lib.ImfOutputSetFrameBuffer(
        out, buf.ctypes.data_as(c_void_p), 1, w
    )
    assert _lib.ImfOutputWritePixels(out, h)
    assert _lib.ImfCloseOutputFile(out)
    _lib.ImfDeleteHeader(hdr)


def write_tiled(
    path: Path, img: np.ndarray, compression: int, tile: int = 16
) -> None:
    h, w = img.shape[:2]
    hdr = _lib.ImfNewHeader()
    _lib.ImfHeaderSetDataWindow(hdr, 0, 0, w - 1, h - 1)
    _lib.ImfHeaderSetDisplayWindow(hdr, 0, 0, w - 1, h - 1)
    _lib.ImfHeaderSetCompression(hdr, compression)
    out = _lib.ImfOpenTiledOutputFile(
        str(path).encode(), hdr, IMF_WRITE_RGBA, tile, tile, 0, 0
    )  # ONE_LEVEL, ROUND_DOWN
    assert out, f"ImfOpenTiledOutputFile failed for {path}"
    buf = _rgba_buffer(img)
    assert _lib.ImfTiledOutputSetFrameBuffer(
        out, buf.ctypes.data_as(c_void_p), 1, w
    )
    for ty in range(-(-h // tile)):
        for tx in range(-(-w // tile)):
            assert _lib.ImfTiledOutputWriteTile(out, tx, ty, 0, 0)
    assert _lib.ImfCloseTiledOutputFile(out)
    _lib.ImfDeleteHeader(hdr)


def pattern_dwa(h: int, w: int) -> np.ndarray:
    """pattern() with a VARYING alpha so the DWA RLE stream carries real
    data (constant alpha collapses to one repeat run)."""
    img = pattern(h, w).astype(np.float32)
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img[..., 3] = 0.25 + 0.75 * ((x + y) % 7) / 6
    return img.astype(np.float16)


def write_luminance_dwa(path: Path, img: np.ndarray) -> None:
    """Y+A DWAA file: exercises the solo (non-CSC) lossy-DCT path."""
    h, w = img.shape[:2]
    hdr = _lib.ImfNewHeader()
    _lib.ImfHeaderSetDataWindow(hdr, 0, 0, w - 1, h - 1)
    _lib.ImfHeaderSetDisplayWindow(hdr, 0, 0, w - 1, h - 1)
    _lib.ImfHeaderSetCompression(hdr, IMF_DWAA)
    out = _lib.ImfOpenOutputFile(str(path).encode(), hdr, IMF_WRITE_YA)
    assert out, f"ImfOpenOutputFile failed for {path}"
    buf = _rgba_buffer(img)
    assert _lib.ImfOutputSetFrameBuffer(out, buf.ctypes.data_as(c_void_p), 1, w)
    assert _lib.ImfOutputWritePixels(out, h)
    assert _lib.ImfCloseOutputFile(out)
    _lib.ImfDeleteHeader(hdr)


def main() -> None:
    img = pattern(45, 70)  # sizes chosen to exercise partial chunks/tiles
    write_scanline(HERE / "openexr_piz.exr", img, IMF_PIZ)
    write_scanline(HERE / "openexr_pxr24.exr", img, IMF_PXR24)
    write_tiled(HERE / "openexr_tiled_zip.exr", img, IMF_ZIP)
    write_tiled(HERE / "openexr_tiled_piz.exr", img, IMF_PIZ)
    write_tiled(HERE / "openexr_tiled_pxr24.exr", img, IMF_PXR24)

    # DWA: lossy, so the expected output is the canonical DECODE of each
    # file (committed as .npy), not the source pattern
    dwa = pattern_dwa(70, 50)  # >1 DWAA chunk, partial blocks both axes
    write_scanline(HERE / "openexr_dwaa.exr", dwa, IMF_DWAA)
    write_scanline(HERE / "openexr_dwab.exr", dwa, IMF_DWAB)
    write_tiled(HERE / "openexr_tiled_dwaa.exr", dwa, IMF_DWAA)
    grey = pattern_dwa(40, 40)
    write_luminance_dwa(HERE / "openexr_dwaa_ya.exr", grey)
    for name, (h, w) in {
        "openexr_dwaa": (70, 50),
        "openexr_dwab": (70, 50),
        "openexr_tiled_dwaa": (70, 50),
        "openexr_dwaa_ya": (40, 40),
    }.items():
        expected = canonical_read(HERE / f"{name}.exr", h, w)
        np.save(HERE / f"{name}_expected.npy", expected)

    for f in sorted(HERE.glob("openexr_*.exr")):
        print(f.name, f.stat().st_size, "bytes")


if __name__ == "__main__":
    main()
