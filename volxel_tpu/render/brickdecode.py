"""Sorted-block trilinear decode: the 8-tap volume fetch as DMA + MXU.

The collision decode's 8 trilinear taps into the dense field are the
last remaining per-lane HBM gathers of the default mode once the
majorant march rides mxu_gather — and XLA serializes them at ~8-50
ns/element (NOTES.md r5 profile). This module replaces them, for lanes
that cluster in space, with:

  1. lanes sorted by a coarse-morton key of their base tap's brick (the
     compaction sort already runs; only the key changes), so each
     512-lane block's taps sit in a compact spatial cell,
  2. per block, one (DZ, DY, 128)-voxel box of the dense bf16 field
     DMA'd into VMEM at a dynamic corner (the block's min clipped tap),
  3. each tap fetched from the box with a one-hot bf16 MXU dot: the box
     row (z*DY + y) selects a 128-voxel x-run, the in-run column is a
     take_along_axis — one nonzero 1.0 x bf16 product accumulated in
     f32 is EXACT, so taps are bit-equal to `dense[z, y, x].astype
     (f32)` and the whole decode is bit-identical to
     lookup_density_trilinear (pinned by tests/test_brickdecode.py).

Lanes whose taps fall outside their block's box report a miss and the
caller falls back to the serialized decode for that call — identical
estimator either way; this is purely a bandwidth/latency path.
Out-of-extent taps are 0 by the reference's OOB rule and are never
misses.

Reference note: this plays the role of the GPU texture cache for
`lookup_density_trilinear` (sampling/common.glsl:61-69) on hardware
with no gather unit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 512  # lanes per grid step (4096 tap fetches)
DZ = 16  # box depth (voxels)
DY = 16  # box height
DX = 128  # box width — one vreg row of x voxels


def _morton_key(bz, by, bxs):
    """Interleave 10+10+6 bits of (brick z, brick y, brick x super-run)
    — blocks of consecutive keys sit in compact spatial cells."""
    key = jnp.zeros_like(bz)
    for bit in range(10):
        key = key | ((bz >> bit) & 1) << (3 * bit + 2)
        key = key | ((by >> bit) & 1) << (3 * bit + 1)
        if bit < 6:
            key = key | ((bxs >> bit) & 1) << (3 * bit)
    return key


def decode_sort_key(grid, pos):
    """Coarse-morton sort key for blocked decode: morton of (brick z,
    brick y, 16-brick x super-run), x-run minor — so a block's taps
    share a (DZ, DY, DX)-ish cell."""
    ext = grid.extent
    base = jnp.clip(jnp.floor(pos - 0.5).astype(jnp.int32), 0, ext - 1)
    bx = base[..., 0] >> 3
    by = base[..., 1] >> 3
    bz = base[..., 2] >> 3
    return _morton_key(bz, by, bx >> 4) * 16 + (bx & 15)


def _kernel_factory(zdim: int, ydim: int, xdim: int):
    """Kernel closure over the static dense-field dims (Z, Y, X)."""

    def kernel(
        corners_ref,  # prefetch (nblocks, 4) i32 — box corner z, y, x, pad
        ext_ref,  # prefetch (3,) i32 — volume extent x, y, z
        base_ref,  # (BLOCK, 4) i32 — unclipped base voxel x, y, z, pad
        dense_ref,  # ANY (Z, Y, X) bfloat16
        taps_ref,  # out (BLOCK, 8) f32
        miss_ref,  # out (BLOCK, 1) i32
        win,  # VMEM (DZ, DY, DX) bfloat16
        sem,  # DMA
    ):
        i = pl.program_id(0)
        z0 = corners_ref[i, 0]
        y0 = corners_ref[i, 1]
        x0 = corners_ref[i, 2]
        cp = pltpu.make_async_copy(
            dense_ref.at[pl.ds(z0, DZ), pl.ds(y0, DY), pl.ds(x0, DX)],
            win,
            sem,
        )
        cp.start()
        cp.wait()
        table = win[:].reshape(DZ * DY, DX)  # leading-dim collapse only

        ex = ext_ref[0]
        ey = ext_ref[1]
        ez = ext_ref[2]
        base = base_ref[:]
        ux0 = base[:, 0:1]
        uy0 = base[:, 1:2]
        uz0 = base[:, 2:3]
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, DZ * DY), 1)
        miss_acc = jnp.zeros((BLOCK, 1), jnp.int32)
        tap_vals = []

        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    ux = ux0 + dx
                    uy = uy0 + dy
                    uz = uz0 + dz
                    inside = (
                        (ux >= 0)
                        & (ux < ex)
                        & (uy >= 0)
                        & (uy < ey)
                        & (uz >= 0)
                        & (uz < ez)
                    )
                    vx = jnp.clip(ux, 0, ex - 1) - x0
                    vy = jnp.clip(uy, 0, ey - 1) - y0
                    vz = jnp.clip(uz, 0, ez - 1) - z0
                    inbox = (
                        (vx >= 0)
                        & (vx < DX)
                        & (vy >= 0)
                        & (vy < DY)
                        & (vz >= 0)
                        & (vz < DZ)
                    )
                    # an out-of-extent tap is 0.0 by the OOB rule and
                    # needs no box data; only inside-but-outside-box
                    # taps are misses
                    miss_acc = miss_acc + (inside & ~inbox).astype(jnp.int32)
                    row = jnp.clip(vz * DY + vy, 0, DZ * DY - 1)
                    col = jnp.clip(vx, 0, DX - 1)
                    onehot = (row == rows_iota).astype(jnp.bfloat16)
                    vals = jnp.dot(
                        onehot, table, preferred_element_type=jnp.float32
                    )  # (B, DX) — one nonzero 1.0*bf16 product: exact f32
                    sel = jnp.take_along_axis(
                        vals, jnp.broadcast_to(col, (BLOCK, DX)), axis=1
                    )[:, 0:1]
                    tap_vals.append(jnp.where(inside, sel, 0.0))
        taps_ref[:] = jnp.concatenate(tap_vals, axis=1)
        miss_ref[:] = miss_acc

    return kernel


def blocked_taps(
    dense: jax.Array,
    corners: jax.Array,
    ext: jax.Array,
    base4: jax.Array,
    interpret: bool | None = None,
):
    """Run the kernel: (taps (n, 8) f32, miss (n, 1) i32). base4: (n, 4)
    i32, n a BLOCK multiple, lanes pre-sorted by decode_sort_key."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = base4.shape[0]
    nblocks = n // BLOCK
    kernel = _kernel_factory(*dense.shape)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((BLOCK, 4), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK, 8), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((DZ, DY, DX), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, 8), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(corners, ext, base4, dense)


def blocked_decode_possible(grid) -> bool:
    """Static gate: a dense field at least one box in every axis."""
    dense = getattr(grid, "dense", None)
    if dense is None or not hasattr(dense, "shape"):
        return False
    zdim, ydim, xdim = dense.shape
    return zdim >= DZ and ydim >= DY and xdim >= DX


def trilinear_blocked(grid, params, pos, live):
    """density_scale * trilinear density at pos — bit-equal to
    sampling.lookup_density_trilinear on the dense field — via the
    sorted-block kernel. pos: (n, 3) index-space positions PRE-SORTED by
    decode_sort_key (live lanes first). Returns (values (n,), any_miss
    scalar bool). On any_miss the caller must fall back (values for
    missed lanes are garbage)."""
    from volxel_tpu.render.sampling import _trilinear_acc

    ext = grid.extent.astype(jnp.int32)
    zdim, ydim, xdim = grid.dense.shape
    if zdim < DZ or ydim < DY or xdim < DX:
        raise ValueError(
            f"dense field {grid.dense.shape} smaller than the box "
            f"({DZ},{DY},{DX}) — use blocked_decode_possible() to gate"
        )
    n = pos.shape[0]
    p = pos - 0.5
    base = jnp.floor(p).astype(jnp.int32)  # (n, 3) x, y, z
    # dead lanes carry garbage positions; pin them to lane 0's base (the
    # sorted prefix starts live) so they can't blow the block's box
    base_n = jnp.where(live[:, None], base, base[0:1])
    npad = -(-n // BLOCK) * BLOCK
    if npad != n:
        base_n = jnp.concatenate(
            [base_n, jnp.broadcast_to(base_n[-1:], (npad - n, 3))]
        )
    bclip = jnp.clip(base_n, 0, ext - 1)
    mins = bclip.reshape(-1, BLOCK, 3).min(axis=1)  # (nblocks, 3) x, y, z
    dims = jnp.asarray([xdim, ydim, zdim], jnp.int32)
    box = jnp.asarray([DX, DY, DZ], jnp.int32)
    c = jnp.clip(mins, 0, dims - box)  # corner x, y, z
    corners = jnp.stack(
        [c[:, 2], c[:, 1], c[:, 0], jnp.zeros_like(c[:, 0])], axis=1
    )
    base4 = jnp.concatenate([base_n, jnp.zeros((npad, 1), jnp.int32)], axis=1)
    taps, miss = blocked_taps(grid.dense, corners, ext, base4)
    taps = taps[:n]
    any_miss = jnp.any((miss[:n, 0] > 0) & live)
    # replicate lookup_density_trilinear's exact accumulation order by
    # feeding the kernel taps through the shared weight chain
    counter = iter(range(8))
    acc = _trilinear_acc(pos, lambda _tap: taps[:, next(counter)])
    return params.density_scale * acc, any_miss
