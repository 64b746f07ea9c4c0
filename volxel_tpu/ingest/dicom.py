"""Minimal self-contained DICOM parser (no pydicom in this environment).

Covers what the reference ingest consumes (dicom_preprocessor/src/lib.rs:47-140):
uncompressed little-endian pixel data, 16-bit unsigned, 1 sample/pixel, plus
the geometry tags PixelSpacing (0028,0030) and SliceThickness (0018,0050),
and DICOMDIR detection via the directory record sequence (0004,1220).

Supports Explicit and Implicit VR Little Endian transfer syntaxes, files
with or without the 128-byte preamble, and nested sequences (skipped, except
for DICOMDIR detection).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

# transfer syntaxes
IMPLICIT_VR_LE = "1.2.840.10008.1.2"
EXPLICIT_VR_LE = "1.2.840.10008.1.2.1"

# tags (group, element) — reference lib.rs:36-45
TAG_PIXEL_SPACING = (0x0028, 0x0030)
TAG_SLICE_THICKNESS = (0x0018, 0x0050)
TAG_PIXEL_DATA = (0x7FE0, 0x0010)
TAG_ROWS = (0x0028, 0x0010)
TAG_COLUMNS = (0x0028, 0x0011)
TAG_BITS_ALLOCATED = (0x0028, 0x0100)
TAG_BITS_STORED = (0x0028, 0x0101)
TAG_PIXEL_REPRESENTATION = (0x0028, 0x0103)
TAG_SAMPLES_PER_PIXEL = (0x0028, 0x0002)
TAG_NUMBER_OF_FRAMES = (0x0028, 0x0008)
TAG_DICOMDIR_RECORD_SEQUENCE = (0x0004, 0x1220)
TAG_TRANSFER_SYNTAX = (0x0002, 0x0010)

# VRs with a 2-byte reserved field and 4-byte length in explicit VR
_LONG_VRS = {b"OB", b"OW", b"OF", b"OD", b"OL", b"SQ", b"UC", b"UR", b"UT", b"UN"}

_ITEM = (0xFFFE, 0xE000)
_ITEM_DELIM = (0xFFFE, 0xE00D)
_SEQ_DELIM = (0xFFFE, 0xE0DD)

UNDEFINED_LENGTH = 0xFFFFFFFF


class DicomError(ValueError):
    pass


@dataclass
class DicomFile:
    elements: dict[tuple[int, int], bytes]
    vrs: dict[tuple[int, int], str] = field(default_factory=dict)
    is_dicomdir: bool = False

    # -- typed accessors ------------------------------------------------------

    def raw(self, tag, default=None):
        return self.elements.get(tag, default)

    def string(self, tag, default=None) -> str | None:
        raw = self.elements.get(tag)
        if raw is None:
            return default
        return raw.decode("ascii", errors="replace").strip("\x00 ")

    def strings(self, tag) -> list[str]:
        s = self.string(tag)
        return [] if s is None else [p.strip() for p in s.split("\\")]

    def uint16(self, tag, default=None) -> int | None:
        raw = self.elements.get(tag)
        if raw is None or len(raw) < 2:
            return default
        return struct.unpack("<H", raw[:2])[0]

    def int_value(self, tag, default=None) -> int | None:
        """Integer from US/UL binary or IS string representation."""
        raw = self.elements.get(tag)
        if raw is None:
            return default
        vr = self.vrs.get(tag, "")
        if vr in ("US",) or (not vr and len(raw) == 2):
            return struct.unpack("<H", raw[:2])[0]
        if vr in ("UL",) or (not vr and len(raw) == 4):
            return struct.unpack("<I", raw[:4])[0]
        try:
            return int(raw.decode("ascii").strip("\x00 "))
        except ValueError as e:
            raise DicomError(f"cannot parse integer tag {tag}") from e

    def floats(self, tag) -> list[float]:
        return [float(s) for s in self.strings(tag) if s]

    # -- pixel payload (lib.rs:75-103 constraints) ----------------------------

    def pixel_array(self) -> np.ndarray:
        """Decode pixel data as (frames, rows, cols) uint16.

        Enforces the same constraints as the reference (lib.rs:77-84):
        1 sample/pixel, 16 bits allocated, unsigned representation.
        """
        if self.int_value(TAG_SAMPLES_PER_PIXEL, 1) != 1:
            raise DicomError("More than one sample per pixel not currently supported")
        if self.int_value(TAG_BITS_ALLOCATED, 16) != 16:
            raise DicomError("Currently only 16bit samples are supported")
        if self.int_value(TAG_PIXEL_REPRESENTATION, 0) != 0:
            raise DicomError("Currently only unsigned samples are supported")
        rows = self.int_value(TAG_ROWS)
        cols = self.int_value(TAG_COLUMNS)
        if rows is None or cols is None:
            raise DicomError("Missing Rows/Columns")
        frames = self.int_value(TAG_NUMBER_OF_FRAMES, 1) or 1
        raw = self.elements.get(TAG_PIXEL_DATA)
        if raw is None:
            raise DicomError("Missing PixelData")
        expected = rows * cols * frames * 2
        if len(raw) < expected:
            raise DicomError(
                f"PixelData too short: {len(raw)} < {expected} "
                "(compressed transfer syntaxes are not supported)"
            )
        return (
            np.frombuffer(raw[:expected], dtype="<u2")
            .reshape(frames, rows, cols)
            .astype(np.uint16)
        )

    @property
    def bits_stored(self) -> int:
        return self.int_value(TAG_BITS_STORED, 16) or 16

    def pixel_spacing(self) -> tuple[float, float]:
        """lib.rs:105-122 — required, two decimal strings."""
        vals = self.floats(TAG_PIXEL_SPACING)
        if len(vals) != 2:
            raise DicomError("Image did not contain pixel spacing information")
        return vals[0], vals[1]

    def slice_thickness(self) -> float:
        """lib.rs:124-133 — optional, defaults to min(pixel spacing)."""
        vals = self.floats(TAG_SLICE_THICKNESS)
        if vals:
            return vals[0]
        sx, sy = self.pixel_spacing()
        return min(sx, sy)


def _skip_sequence_undefined(buf: memoryview, pos: int, explicit: bool) -> int:
    """Skip an undefined-length SQ body, returning the offset past its delimiter."""
    depth = 1
    n = len(buf)
    while pos + 8 <= n and depth > 0:
        group, elem = struct.unpack_from("<HH", buf, pos)
        length = struct.unpack_from("<I", buf, pos + 4)[0]
        pos += 8
        tag = (group, elem)
        if tag == _SEQ_DELIM:
            depth -= 1
        elif tag == _ITEM:
            if length != UNDEFINED_LENGTH:
                pos += length
            # undefined-length items: keep scanning; nested delimiters handled below
        elif tag == _ITEM_DELIM:
            pass
        else:
            # element inside an undefined-length item
            pos -= 8
            pos = _skip_element(buf, pos, explicit)
    return pos


def _skip_element(buf: memoryview, pos: int, explicit: bool) -> int:
    """Advance past one data element (used only inside skipped sequences)."""
    group, elem = struct.unpack_from("<HH", buf, pos)
    pos += 4
    if explicit and (group, elem) not in (_ITEM, _ITEM_DELIM, _SEQ_DELIM):
        vr = bytes(buf[pos : pos + 2])
        if vr in _LONG_VRS:
            length = struct.unpack_from("<I", buf, pos + 4)[0]
            pos += 8
        else:
            length = struct.unpack_from("<H", buf, pos + 2)[0]
            pos += 4
        is_sq = vr == b"SQ"
    else:
        length = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
        is_sq = False
    if length == UNDEFINED_LENGTH:
        return _skip_sequence_undefined(buf, pos, explicit)
    if is_sq or not explicit:
        return pos + length
    return pos + length


def _parse_dataset(
    buf: memoryview,
    pos: int,
    explicit: bool,
    stop_group: int | None = None,
    end: int | None = None,
) -> tuple[dict, dict, int]:
    elements: dict[tuple[int, int], bytes] = {}
    vrs: dict[tuple[int, int], str] = {}
    n = len(buf) if end is None else end
    while pos + 8 <= n:
        group, elem = struct.unpack_from("<HH", buf, pos)
        if stop_group is not None and group != stop_group:
            break
        tag = (group, elem)
        pos += 4
        vr = b""
        if explicit and tag not in (_ITEM, _ITEM_DELIM, _SEQ_DELIM):
            vr = bytes(buf[pos : pos + 2])
            if vr in _LONG_VRS:
                length = struct.unpack_from("<I", buf, pos + 4)[0]
                pos += 8
            else:
                length = struct.unpack_from("<H", buf, pos + 2)[0]
                pos += 4
        else:
            length = struct.unpack_from("<I", buf, pos)[0]
            pos += 4

        is_sq = vr == b"SQ" or (
            not explicit and length == UNDEFINED_LENGTH and tag != TAG_PIXEL_DATA
        )
        if is_sq or (vr == b"" and not explicit and _looks_like_sq(buf, pos, length)):
            # record presence (for DICOMDIR detection) but skip the body
            elements[tag] = b""
            vrs[tag] = "SQ"
            if length == UNDEFINED_LENGTH:
                pos = _skip_sequence_undefined(buf, pos, explicit)
            else:
                pos += length
            continue

        if length == UNDEFINED_LENGTH:
            # undefined-length non-SQ (e.g. encapsulated pixel data): unsupported
            raise DicomError(
                "Undefined-length element outside a sequence "
                "(encapsulated/compressed pixel data is not supported)"
            )
        elements[tag] = bytes(buf[pos : pos + length])
        if vr:
            vrs[tag] = vr.decode("ascii", errors="replace")
        pos += length
    return elements, vrs, pos


def _looks_like_sq(buf: memoryview, pos: int, length: int) -> bool:
    """Implicit-VR defined-length SQ detection: body starts with an Item tag."""
    if length < 8 or pos + 8 > len(buf):
        return False
    group, elem = struct.unpack_from("<HH", buf, pos)
    return (group, elem) == _ITEM


def parse_dicom(data: bytes) -> DicomFile:
    """Parse a DICOM byte stream (preamble optional)."""
    buf = memoryview(data)
    pos = 0
    syntax = EXPLICIT_VR_LE
    if len(data) >= 132 and data[128:132] == b"DICM":
        pos = 132
        # file meta group (0002) is always explicit VR LE
        meta, _, pos = _parse_dataset(buf, pos, explicit=True, stop_group=0x0002)
        ts = meta.get(TAG_TRANSFER_SYNTAX)
        if ts is not None:
            syntax = ts.decode("ascii").strip("\x00 ")
    elif len(data) >= 8:
        # no preamble: sniff explicit VR by checking for a plausible VR code
        vr = data[4:6]
        explicit = vr.isalpha() and vr.isupper()
        syntax = EXPLICIT_VR_LE if explicit else IMPLICIT_VR_LE
    else:
        raise DicomError("Not a DICOM stream (too short)")

    if syntax == EXPLICIT_VR_LE:
        explicit = True
    elif syntax == IMPLICIT_VR_LE:
        explicit = False
    else:
        raise DicomError(f"Unsupported transfer syntax: {syntax}")

    elements, vrs, _ = _parse_dataset(buf, pos, explicit=explicit)
    if not any(group >= 0x0004 for group, _ in elements):
        raise DicomError("Not a DICOM stream (no dataset elements found)")
    is_dicomdir = TAG_DICOMDIR_RECORD_SEQUENCE in elements
    return DicomFile(elements=elements, vrs=vrs, is_dicomdir=is_dicomdir)
