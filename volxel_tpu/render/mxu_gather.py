"""Exact f32 table gather as a one-hot MXU matmul (Pallas TPU kernel).

Why this exists: XLA TPU lowers per-lane dynamic gathers to a serialized
scalar pointer chase — measured ~8-50 ns/ELEMENT regardless of table
size (NOTES.md "First REAL profile"), which makes the DDA march's
one-majorant-gather-per-step the dominant cost of the default render
mode. The MXU can instead select table rows with a one-hot matmul at
N*T MAC cost: for a table of T elements and N lanes the wall time is
~N*T/peak_flops, which beats the serial chase whenever the table is
VMEM-small (the stacked majorant pyramid is 37k entries at 256^3 and
300k at 512^3; environment importance mips are <=64k).

Bit-exactness (the repo's oracle/sharding contracts demand the gathered
VALUES be identical to `table[idx]`): the f32 table is decomposed into
its four BYTE planes, each stored as bf16 (integers 0..255 are exact in
bf16). A one-hot row (0.0/1.0, exact in bf16) dotted with a byte plane
and accumulated in f32 reproduces each byte exactly (one nonzero
product, all other terms exact zeros), and the bytes are reassembled
with integer shifts and a bitcast — exact for EVERY f32 bit pattern,
including denormals and NaNs. Pinned by tests/test_mxu_gather.py.

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


def pack_gather_table(flat: jax.Array) -> jax.Array:
    """(T,) f32 -> (R, 4*128) bf16 byte planes, R = ceil(T/128).

    Column layout: plane p of element (row r, col c) lives at
    [r, p*128 + c]. Pure elementwise ops — cheap to run in-graph so the
    packed table stays a loop-invariant the compiler hoists.
    """
    t = flat.shape[0]
    r = -(-t // _LANE)
    padded = jnp.zeros((r * _LANE,), jnp.float32).at[:t].set(flat)
    bits = jax.lax.bitcast_convert_type(padded, jnp.uint32).reshape(r, _LANE)
    planes = [
        ((bits >> jnp.uint32(8 * p)) & jnp.uint32(0xFF)).astype(jnp.bfloat16)
        for p in range(4)
    ]
    return jnp.concatenate(planes, axis=1)


def _gather_kernel(idx_ref, table_ref, out_ref):
    rows = table_ref.shape[0]
    idx = idx_ref[:]  # (B, 1) int32
    row = idx >> 7
    col = idx & 127
    onehot = (
        row == jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], rows), 1)
    ).astype(jnp.bfloat16)
    vals = jnp.dot(
        onehot, table_ref[:], preferred_element_type=jnp.float32
    )  # (B, 4*128) — each byte value exact (see module docstring)
    colb = jnp.broadcast_to(col, (idx.shape[0], _LANE))

    def plane(p):
        sel = jnp.take_along_axis(vals[:, p * _LANE : (p + 1) * _LANE], colb, axis=1)
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


@functools.lru_cache(maxsize=1)
def mxu_gather_supported() -> bool:
    """One-shot hardware probe: does the kernel compile AND return
    bit-exact values on this backend? Used by Renderer to resolve
    mxu_gather="auto" so a Mosaic lowering gap degrades to the XLA
    gather instead of failing every render."""
    try:
        import numpy as np

        flat = jnp.arange(300, dtype=jnp.float32) * 1.7 - 250.0
        got = mxu_gather_f32(
            pack_gather_table(flat), jnp.arange(300, dtype=jnp.int32)[::-1]
        )
        return bool(
            np.array_equal(
                np.asarray(got).view(np.uint32),
                np.asarray(flat[::-1]).view(np.uint32),
            )
        )
    except Exception:  # noqa: BLE001 — any failure means "don't use it"
        return False


def mxu_gather_f32(
    table: jax.Array,
    idx: jax.Array,
    *,
    block: int = _DEFAULT_BLOCK,
    interpret: bool | None = None,
) -> jax.Array:
    """Gather f32 values by flat element index from a packed table.

    table: (R, 4*128) bf16 from pack_gather_table. idx: any int32 shape,
    entries in [0, R*128). Returns f32 of idx's shape, bit-equal to
    `flat_table[idx]`.
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
