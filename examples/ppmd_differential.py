"""Differential-development harness for ingest/ppmd.py: drive the
CANONICAL Ppmd8 decoder bundled in this system's libarchive directly via
ctypes, decode our encoder's streams symbol by symbol, and compare model
state (Range/Code, contexts, BinSumm/See cell touches) against our
implementation. This is the tool that localizes every conformance
divergence to an exact table cell or update rule; see tests/test_ppmd.py
for the resulting conformance status and NOTES.md for the method.

Usage: python examples/ppmd_differential.py [data-string]


Function table at vaddr 0xc4ae0: Construct, Alloc, Free, Init(p,order,restor),
RangeDec_Init(p), DecodeSymbol(p). CPpmd8 struct offsets (modern Ppmd8):
  MinContext@0x00 MaxContext@0x08 FoundState@0x10 OrderFall@0x18
  InitEsc@0x1c PrevSuccess@0x20 MaxOrder@0x24 RunLength@0x28 InitRL@0x2c
  Size@0x30 GlueCount@0x34 Base@0x38 LoUnit@0x40 HiUnit@0x48 Text@0x50
  UnitsStart@0x58 AlignOffset@0x60 RestoreMethod@0x64
  Range@0x68 Code@0x6c Low@0x70 Stream@0x78
  NS2BSIndx@0x258 NS2Indx@0x358 DummySee@0x45c See@0x460 BinSumm@0x1060
"""
import ctypes
import struct
import sys

lib = ctypes.CDLL("libarchive.so.13")

# find load base from /proc/self/maps (first r-xp or any mapping of the lib minus its file offset 0)
base = None
for line in open("/proc/self/maps"):
    if "libarchive.so.13" in line:
        start = int(line.split("-")[0], 16)
        off = int(line.split()[2], 16)
        if off == 0:
            base = start
            break
assert base is not None

TABLE = 0xC4AE0
ptrs = (ctypes.c_uint64 * 6).from_address(base + TABLE)
Construct = ctypes.CFUNCTYPE(None, ctypes.c_void_p)(ptrs[0])
Alloc = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p, ctypes.c_uint32)(ptrs[1])
Free = ctypes.CFUNCTYPE(None, ctypes.c_void_p)(ptrs[2])
Init = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_uint, ctypes.c_uint)(ptrs[3])
RangeDecInit = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p)(ptrs[4])
DecodeSymbol = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p)(ptrs[5])

READ_T = ctypes.CFUNCTYPE(ctypes.c_ubyte, ctypes.c_void_p)


class CanonDecoder:
    STRUCT_SIZE = 0x4000

    def __init__(self, stream: bytes, order=6, mem_mb=8, restor=0):
        self.p = ctypes.create_string_buffer(self.STRUCT_SIZE)
        self.stream = stream
        self.pos = 0

        def read_cb(_self):
            if self.pos < len(self.stream):
                b = self.stream[self.pos]
                self.pos += 1
                return b
            return 0

        self._read_cb = READ_T(read_cb)  # keep alive
        # libarchive fetches the Read fn from [stream_ptr + 8]
        self._vtable = (ctypes.c_uint64 * 2)(
            0, ctypes.cast(self._read_cb, ctypes.c_void_p).value
        )
        Construct(self.p)
        assert Alloc(self.p, mem_mb << 20)
        Init(self.p, order, restor)
        # Stream.In at +0x78 -> pointer to vtable (IByteIn has fn ptr at +0)
        ctypes.memmove(
            ctypes.addressof(self.p) + 0x78,
            ctypes.byref(ctypes.c_uint64(ctypes.addressof(self._vtable))),
            8,
        )
        self.rc_ok = RangeDecInit(self.p)

    def u32(self, off):
        return struct.unpack_from("<I", self.p, off)[0]

    def u64(self, off):
        return struct.unpack_from("<Q", self.p, off)[0]

    def decode(self):
        return DecodeSymbol(self.p)

    def state(self):
        base_ptr = self.u64(0x38)
        return {
            "min_ctx": self.u64(0x00) - base_ptr if self.u64(0x00) else -1,
            "found": self.u64(0x10) - base_ptr if self.u64(0x10) else -1,
            "order_fall": self.u32(0x18),
            "prev_success": self.u32(0x20),
            "run_length": struct.unpack_from("<i", self.p, 0x28)[0],
            "range": self.u32(0x68),
            "code": self.u32(0x6C),
            "low": self.u32(0x70),
            "pos": self.pos,
        }

    def read_ctx(self, ref):
        """Read a context at pool offset ref."""
        base_ptr = self.u64(0x38)
        buf = (ctypes.c_ubyte * 12).from_address(base_ptr + ref)
        b = bytes(buf)
        return {
            "num_stats": b[0],
            "flags": b[1],
            "summ_freq": int.from_bytes(b[2:4], "little"),
            "stats": int.from_bytes(b[4:8], "little"),
            "suffix": int.from_bytes(b[8:12], "little"),
            "one_sym": b[2],
            "one_freq": b[3],
        }

    def free(self):
        Free(self.p)


def main():
    from volxel_tpu.ingest import ppmd

    data = sys.argv[1].encode() if len(sys.argv) > 1 else b"aaa"
    stream = ppmd.compress(data, order=6, mem_mb=8)
    print(f"our stream for {data!r}: {stream.hex()}")

    d = CanonDecoder(stream + b"\x00" * 32)
    print("rc_ok:", d.rc_ok, "state:", d.state())
    out = []
    for i in range(len(data) + 4):
        s_before = d.state()
        sym = d.decode()
        out.append(sym)
        print(f"sym[{i}] = {sym} ({chr(sym) if 32 <= sym < 127 else '?'}) "
              f"ctx_before={s_before['min_ctx']:#x} range={s_before['range']:#x} "
              f"code={s_before['code']:#x} pos={s_before['pos']}")
        if sym < 0:
            break
    good = bytes(x for x in out if x >= 0)
    print("canonical decoded:", good, "expected:", data, "MATCH" if good == data and out[-1] == -1 else "DIFF")
    d.free()


if __name__ == "__main__":
    main()
