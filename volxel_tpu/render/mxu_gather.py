"""Exact f32 table gather as a one-hot MXU matmul (Pallas TPU kernel).

Why this exists: XLA TPU lowers per-lane dynamic gathers to a serialized
scalar pointer chase — measured ~8-50 ns/ELEMENT regardless of table
size (NOTES.md "First REAL profile"), which makes the DDA march's
one-majorant-gather-per-step the dominant cost of the default render
mode. The MXU can instead select table rows with a one-hot matmul at
N*T MAC cost: for a table of T elements and N lanes the wall time is
~N*T/peak_ops, which beats the serial chase whenever the table is
VMEM-small (the stacked majorant pyramid is 37k entries at 256^3 and
300k at 512^3; environment warp tables are <=131k).

Bit-exactness (the repo's oracle/sharding contracts demand the gathered
VALUES be identical to `table[idx]`): the f32 table is decomposed into
its four BYTE planes. Preferred packing stores them as int8 and runs
int8 x int8 -> int32 MXU dots (one nonzero 0/1 x byte product per lane,
integer accumulation — exact by construction, and int8 MXU throughput
is 2x bf16 on v5e). Fallback packing stores bytes as bf16 (integers
0..255 are exact in bf16; a single nonzero product accumulated in f32
is exact). Bytes are reassembled with integer shifts and a bitcast —
exact for EVERY f32 bit pattern, including denormals and NaNs. Pinned
by tests/test_mxu_gather.py.

Reference note: this implements the texture-unit role of the GPU's
`texelFetch` on brick ranges (sampling/common.glsl:50-53) for hardware
with no gather unit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tables larger than this don't go through the MXU path: the one-hot
# matmul costs N*T MACs, so past ~0.5M entries it loses to even the
# serialized XLA gather (and the packed planes outgrow VMEM).
MXU_GATHER_MAX_TABLE = 1 << 19

_LANE = 128  # table row width == vreg lane count
_DEFAULT_BLOCK = 1024  # lanes per grid step


def _byte_planes(flat: jax.Array) -> jax.Array:
    """(T,) f32 -> (R, 128, 4) uint32 byte values, R = ceil(T/128)."""
    t = flat.shape[0]
    r = -(-t // _LANE)
    padded = jnp.zeros((r * _LANE,), jnp.float32).at[:t].set(flat)
    bits = jax.lax.bitcast_convert_type(padded, jnp.uint32).reshape(r, _LANE)
    return jnp.stack(
        [(bits >> jnp.uint32(8 * p)) & jnp.uint32(0xFF) for p in range(4)], axis=-1
    )


def pack_gather_table(flat: jax.Array, dtype: str | None = None) -> jax.Array:
    """(T,) f32 -> (R, 4*128) byte planes, R = ceil(T/128).

    Column layout: plane p of element (row r, col c) lives at
    [r, p*128 + c]. dtype "int8" (default — int MXU path, exact integer
    accumulation) or "bfloat16" (fallback for backends without int8
    dots; 0..255 and 0/1 are exact in bf16, so still bit-exact). Pure
    elementwise ops — cheap to run in-graph so the packed table stays a
    loop-invariant the compiler hoists.
    """
    if dtype is None:
        dtype = preferred_pack_dtype() or "int8"
    planes = _byte_planes(flat)  # (R, 128, 4)
    stacked = jnp.concatenate(
        [planes[:, :, p] for p in range(4)], axis=1
    )  # (R, 4*128)
    if dtype == "int8":
        # bytes 0..255 don't fit int8; store value-128 (one int sub in
        # the kernel restores it after the dot — still exact)
        return (stacked.astype(jnp.int32) - 128).astype(jnp.int8)
    return stacked.astype(jnp.bfloat16)


def _gather_kernel(idx_ref, table_ref, out_ref):
    rows = table_ref.shape[0]
    idx = idx_ref[:]  # (B, 1) int32
    row = idx >> 7
    col = idx & 127
    onehot_bool = row == jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], rows), 1)
    if table_ref.dtype == jnp.int8:
        onehot = onehot_bool.astype(jnp.int8)
        vals = jax.lax.dot_general(
            onehot,
            table_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # undo the -128 bias: exactly one one-hot hit per lane
        vals = vals + 128
        colb = jnp.broadcast_to(col, (idx.shape[0], _LANE))

        def plane(p):
            sel = jnp.take_along_axis(
                vals[:, p * _LANE : (p + 1) * _LANE], colb, axis=1
            )
            return sel[:, :1].astype(jnp.uint32)

        bits = (
            plane(0)
            | (plane(1) << jnp.uint32(8))
            | (plane(2) << jnp.uint32(16))
            | (plane(3) << jnp.uint32(24))
        )
    else:
        onehot = onehot_bool.astype(jnp.bfloat16)
        vals = jnp.dot(
            onehot, table_ref[:], preferred_element_type=jnp.float32
        )  # each byte value exact (module docstring)
        colb = jnp.broadcast_to(col, (idx.shape[0], _LANE))

        def plane(p):
            sel = jnp.take_along_axis(
                vals[:, p * _LANE : (p + 1) * _LANE], colb, axis=1
            )
            return sel[:, :1]

        lo16 = plane(0) + plane(1) * 256.0
        hi16 = plane(2) + plane(3) * 256.0
        bits = lo16.astype(jnp.uint32) + (hi16.astype(jnp.uint32) << jnp.uint32(16))
    out_ref[:] = jax.lax.bitcast_convert_type(bits, jnp.float32)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _mxu_gather_call(table, idx2, block: int, interpret: bool):
    n = idx2.shape[0]
    grid = n // block
    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (table.shape[0], table.shape[1]),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx2, table)


_PROBE_CACHE: list = []


def preferred_pack_dtype() -> str | None:
    """One-shot hardware probe: the fastest packing whose kernel compiles
    AND returns bit-exact values on this backend (int8 MXU dots are 2x
    bf16 throughput on v5e; some Mosaic versions may lack int8 dot
    lowering). None = neither works — don't use the MXU path.

    The probe needs a real device round-trip, so it can only run OUTSIDE
    a trace (Renderer resolves mxu_gather="auto" host-side, which primes
    the cache). Reached mid-trace before any host-side probe — only
    possible when mxu was explicitly forced — it returns the preferred
    packing without probing and without poisoning the cache."""
    if _PROBE_CACHE:
        return _PROBE_CACHE[0]
    import numpy as np

    if isinstance(jnp.zeros((), jnp.float32), jax.core.Tracer):
        return "int8"
    result = None
    flat = jnp.arange(300, dtype=jnp.float32) * 1.7 - 250.0
    want = np.asarray(flat[::-1]).view(np.uint32)
    for dtype in ("int8", "bfloat16"):
        try:
            got = mxu_gather_f32(
                pack_gather_table(flat, dtype),
                jnp.arange(300, dtype=jnp.int32)[::-1],
            )
            if np.array_equal(np.asarray(got).view(np.uint32), want):
                result = dtype
                break
        except Exception:  # noqa: BLE001 — try the next packing
            continue
    _PROBE_CACHE.append(result)
    return result


def mxu_gather_supported() -> bool:
    """Does any packing work on this backend? Used by Renderer to resolve
    mxu_gather="auto" so a Mosaic lowering gap degrades to the XLA
    gather instead of failing every render."""
    return preferred_pack_dtype() is not None


def mxu_gather_f32(
    table: jax.Array,
    idx: jax.Array,
    *,
    block: int = _DEFAULT_BLOCK,
    interpret: bool | None = None,
) -> jax.Array:
    """Gather f32 values by flat element index from a packed table.

    table: (R, 4*128) int8/bf16 from pack_gather_table. idx: any int32
    shape, entries in [0, R*128). Returns f32 of idx's shape, bit-equal
    to `flat_table[idx]`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = idx.shape
    flat = idx.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    npad = -(-n // block) * block
    if npad != n:
        flat = jnp.concatenate([flat, jnp.zeros((npad - n,), jnp.int32)])
    out = _mxu_gather_call(table, flat[:, None], block, interpret)
    return out[:n, 0].reshape(shape)
