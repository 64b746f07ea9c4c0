"""Synthetic test fixtures: DICOM writers and procedural CT-like volumes.

The environment ships no DICOM sample data, so tests and benchmarks build
their own: a minimal Explicit-VR-Little-Endian writer producing files that
both this framework's parser and any conformant reader accept, plus
procedural density volumes with interesting structure (nested shells) for
render benchmarks.
"""

from __future__ import annotations

import io
import struct
import zipfile

import numpy as np

from volxel_tpu.ingest.hdr import encode_hdr


def _element(group: int, elem: int, vr: bytes, value: bytes) -> bytes:
    if len(value) % 2:
        value += b"\x00" if vr != b"UI" else b"\x00"
    head = struct.pack("<HH", group, elem)
    if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT"):
        return head + vr + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return head + vr + struct.pack("<H", len(value)) + value


def write_dicom_slice(
    pixels: np.ndarray,
    pixel_spacing: tuple[float, float] = (1.0, 1.0),
    slice_thickness: float | None = 1.0,
    bits_stored: int = 16,
    instance_number: int = 1,
) -> bytes:
    """Serialize one (rows, cols) uint16 slice as Explicit VR LE with preamble."""
    pixels = np.ascontiguousarray(pixels, dtype="<u2")
    rows, cols = pixels.shape

    meta_body = _element(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.1")
    meta = (
        _element(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body))) + meta_body
    )

    ds = b""
    ds += _element(0x0018, 0x0050, b"DS", str(slice_thickness).encode()) if slice_thickness is not None else b""
    ds += _element(0x0020, 0x0013, b"IS", str(instance_number).encode())
    ds += _element(0x0028, 0x0002, b"US", struct.pack("<H", 1))
    ds += _element(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    ds += _element(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    ds += _element(
        0x0028, 0x0030, b"DS", f"{pixel_spacing[0]}\\{pixel_spacing[1]}".encode()
    )
    ds += _element(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    ds += _element(0x0028, 0x0101, b"US", struct.pack("<H", bits_stored))
    ds += _element(0x0028, 0x0102, b"US", struct.pack("<H", bits_stored - 1))
    ds += _element(0x0028, 0x0103, b"US", struct.pack("<H", 0))
    ds += _element(0x7FE0, 0x0010, b"OW", pixels.tobytes())

    return b"\x00" * 128 + b"DICM" + meta + ds


def write_dicom_series(
    volume: np.ndarray,
    pixel_spacing: tuple[float, float] = (1.0, 1.0),
    slice_thickness: float = 1.0,
    bits_stored: int = 16,
) -> list[bytes]:
    """(Z, Y, X) uint16 volume -> one DICOM byte blob per slice."""
    return [
        write_dicom_slice(
            volume[z],
            pixel_spacing=pixel_spacing,
            slice_thickness=slice_thickness,
            bits_stored=bits_stored,
            instance_number=z + 1,
        )
        for z in range(volume.shape[0])
    ]


def write_dicom_zip(
    volume: np.ndarray,
    folder: str = "series",
    **kwargs,
) -> bytes:
    """(Z, Y, X) uint16 volume -> single-folder ZIP of DICOM slices."""
    blobs = write_dicom_series(volume, **kwargs)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for i, blob in enumerate(blobs):
            zf.writestr(f"{folder}/slice_{i:04d}.dcm", blob)
    return buf.getvalue()


def synthetic_ct_volume(
    size: tuple[int, int, int] = (64, 64, 64),
    bits_stored: int = 12,
    seed: int = 0,
) -> np.ndarray:
    """Procedural CT-like uint16 volume: nested density shells + noise.

    Shaped like a body-donor scan: an outer soft-tissue ellipsoid, a
    medium-density shell, and a dense core, with mild noise so bricks are
    non-constant where occupied.
    """
    z, y, x = size
    zz = np.arange(z, dtype=np.float32)[:, None, None]
    yy = np.arange(y, dtype=np.float32)[None, :, None]
    xx = np.arange(x, dtype=np.float32)[None, None, :]
    cz, cy, cx = (z - 1) / 2, (y - 1) / 2, (x - 1) / 2
    r = np.sqrt(
        ((xx - cx) / (x * 0.45)) ** 2
        + ((yy - cy) / (y * 0.45)) ** 2
        + ((zz - cz) / (z * 0.45)) ** 2
    )
    density = np.zeros(size, np.float32)
    density += np.where(r < 1.0, 0.25, 0.0)
    density += np.where(r < 0.7, 0.25, 0.0)
    density += np.where(r < 0.35, 0.4, 0.0)
    rng = np.random.default_rng(seed)
    noise = rng.uniform(0, 0.05, size).astype(np.float32)
    density = np.clip(density + noise * (r < 1.0), 0.0, 1.0)
    max_val = (1 << bits_stored) - 1
    return (density * max_val).astype(np.uint16)


def synthetic_env_hdr(width: int = 64, height: int = 32) -> bytes:
    """A small sky-like HDR environment: bright sun patch + gradient."""
    v = np.linspace(0, 1, height, dtype=np.float32)[:, None]
    u = np.linspace(0, 1, width, dtype=np.float32)[None, :]
    sky = np.stack(
        [
            0.3 + 0.2 * (1 - v) * np.ones_like(u),
            0.4 + 0.3 * (1 - v) * np.ones_like(u),
            0.7 + 0.3 * (1 - v) * np.ones_like(u),
        ],
        axis=-1,
    )
    sun = np.exp(-(((u - 0.25) * 18) ** 2 + ((v - 0.25) * 12) ** 2))
    img = sky + sun[..., None] * np.array([40.0, 35.0, 25.0], np.float32)
    return encode_hdr(img.astype(np.float32))
