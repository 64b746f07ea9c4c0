"""PPMd var.I codec tests.

Three layers of evidence:
  1. Round-trips across data classes (our encoder -> our decoder).
  2. Structural/parameter handling + typed errors on corrupt input.
  3. External conformance against the CANONICAL PPMd8 decoder bundled in
     this system's libarchive: its Ppmd8 function table is driven
     directly through ctypes and must decode our encoder's raw streams
     symbol-for-symbol (including the end marker). This is the same
     decoder the reference ecosystem's ZIP readers use.

The conformance layer passes for run/byte-range/repeat data classes and
short mixed text (abracadabra, mississippi) including the end marker;
long mixed text still diverges deep in SEE-statistics territory and
stays xfail until the last update rule is pinned.
"""

from __future__ import annotations

import ctypes
import random
import struct

import pytest

from volxel_tpu.ingest import ppmd

# ---------------------------------------------------------------------------
# round-trips
# ---------------------------------------------------------------------------

CASES = [
    b"",
    b"a",
    b"ab",
    b"aaa",
    b"abracadabra",
    b"mississippi",
    b"the quick brown fox jumps over the lazy dog " * 20,
    bytes(range(256)) * 4,
    b"\x00" * 5000,
    b"\xff" * 300,
]


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_roundtrip(data):
    for order in (2, 6, 16):
        stream = ppmd.compress(data, order=order, mem_mb=8)
        assert ppmd.decompress(stream, order=order, mem_mb=8) == data


def test_roundtrip_random():
    rng = random.Random(7)
    for _ in range(10):
        n = rng.randrange(0, 4000)
        data = bytes(rng.randrange(256) for _ in range(n))
        assert ppmd.zip_decompress(ppmd.zip_compress(data)) == data


def test_zip_parameter_word():
    blob = ppmd.zip_compress(b"hello", order=11, mem_mb=32)
    w = int.from_bytes(blob[:2], "little")
    assert (w & 0xF) + 1 == 11
    assert ((w >> 4) & 0xFF) + 1 == 32
    assert w >> 12 == 0  # restoration method: restart
    assert ppmd.zip_decompress(blob) == b"hello"


def test_errors():
    with pytest.raises(ppmd.PpmdError):
        ppmd.zip_decompress(b"\x01")  # shorter than the parameter word
    with pytest.raises(ppmd.PpmdError):
        ppmd.zip_decompress(b"\x05\x30" + b"\x00" * 8)  # restoration method 3
    with pytest.raises(ppmd.PpmdError):
        ppmd.compress(b"x", order=1)
    # size-limited decode of a stream that ends early
    stream = ppmd.compress(b"abc")
    with pytest.raises(ppmd.PpmdError):
        ppmd.decompress(stream, size=10)


def test_compression_ratio_sane():
    data = b"volxel " * 500
    comp = ppmd.compress(data)
    assert len(comp) < len(data) // 10


# ---------------------------------------------------------------------------
# canonical conformance (libarchive's bundled Ppmd8 decoder via ctypes)
# ---------------------------------------------------------------------------

# vaddrs of the modern-Ppmd8 function table and a fingerprint constant,
# valid for libarchive 3.6.2 as shipped in this image; the fingerprint
# check below makes the tests skip (not fail) on any other build.
_LIBARCHIVE = "libarchive.so.13"
_TABLE_VADDR = 0xC4AE0
_K_INIT_VADDR = 0x9C560


def _canonical():
    try:
        lib = ctypes.CDLL(_LIBARCHIVE)
    except OSError:
        return None
    base = None
    try:
        for line in open("/proc/self/maps"):
            if _LIBARCHIVE in line and line.split()[2] == "00000000":
                base = int(line.split("-")[0], 16)
                break
    except OSError:
        return None
    if base is None:
        return None
    fp = bytes((ctypes.c_ubyte * 16).from_address(base + _K_INIT_VADDR))
    want = struct.pack("<8H", 0x3CDD, 0x1F3F, 0x59BF, 0x48F3, 0x64A1, 0x5ABC, 0x6632, 0x6051)
    if fp != want:
        return None
    ptrs = (ctypes.c_uint64 * 6).from_address(base + _TABLE_VADDR)
    if not all(base < p < base + 0x100000 for p in ptrs):
        return None
    return lib, ptrs


_READ_T = ctypes.CFUNCTYPE(ctypes.c_ubyte, ctypes.c_void_p)


def _canonical_decode(stream: bytes, order=6, mem_mb=8, limit=1 << 16):
    """Decode a raw PPMd stream with libarchive's canonical decoder.
    Returns the decoded bytes up to its end marker (or `limit`)."""
    handle = _canonical()
    if handle is None:
        pytest.skip("canonical PPMd8 decoder not available in this environment")
    _lib, ptrs = handle
    construct = ctypes.CFUNCTYPE(None, ctypes.c_void_p)(ptrs[0])
    alloc = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p, ctypes.c_uint32)(ptrs[1])
    free = ctypes.CFUNCTYPE(None, ctypes.c_void_p)(ptrs[2])
    init = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_uint, ctypes.c_uint)(ptrs[3])
    rc_init = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p)(ptrs[4])
    decode = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p)(ptrs[5])

    p = ctypes.create_string_buffer(0x4000)
    pos = [0]
    data = stream + b"\x00" * 64

    def read_cb(_):
        if pos[0] < len(data):
            b = data[pos[0]]
            pos[0] += 1
            return b
        return 0

    cb = _READ_T(read_cb)
    vtable = (ctypes.c_uint64 * 2)(0, ctypes.cast(cb, ctypes.c_void_p).value)
    construct(p)
    assert alloc(p, mem_mb << 20)
    init(p, order, 0)
    ctypes.memmove(
        ctypes.addressof(p) + 0x78,
        ctypes.byref(ctypes.c_uint64(ctypes.addressof(vtable))),
        8,
    )
    assert rc_init(p)
    out = bytearray()
    try:
        while len(out) < limit:
            sym = decode(p)
            if sym < 0:
                break
            out.append(sym)
    finally:
        free(p)
    return bytes(out), sym


CONFORMANT = [
    b"\x00" * 200,
    b"aaaaaaaaaaaaaaaaaaaa",
    b"abracadabra",
    b"mississippi",
    bytes(range(256)),
    bytes(range(256)) * 2,
]

DIVERGENT_YET = [
    # long mixed text diverges tens of symbols in, in SEE-statistics
    # territory (suspect: see_update shift/count mechanics) — the
    # differential harness (examples/ppmd_differential.py) localizes it
    b"the quick brown fox jumps over the lazy dog " * 3,
]


@pytest.mark.parametrize("data", CONFORMANT, ids=range(len(CONFORMANT)))
def test_canonical_decodes_our_streams(data):
    stream = ppmd.compress(data, order=6, mem_mb=8)
    got, last = _canonical_decode(stream)
    assert got == data
    assert last == -1  # our end marker recognized


@pytest.mark.parametrize("data", DIVERGENT_YET, ids=range(len(DIVERGENT_YET)))
@pytest.mark.xfail(
    reason="a late SEE-statistics update rule still differs from the "
    "canonical model on long mixed text; see ingest/ppmd.py docstring",
    strict=False,
)
def test_canonical_decodes_mixed_text(data):
    stream = ppmd.compress(data, order=6, mem_mb=8)
    got, last = _canonical_decode(stream)
    assert got == data and last == -1
