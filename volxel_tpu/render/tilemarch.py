"""Tile-march: the raymarch step loop as DMA boxes + MXU selects.

The raymarch mode's per-step density taps are the one MC access pattern
in this tracer that is BOX-COHERENT: all lanes of a screen micro-tile
step through nearby voxels together (measured: examples/probe_tilebox.py
— p50 per-(tile, step) tap bbox is ~14x11x12 voxels on the 1080p/512^3
volume-filling framing, and a (32, 32, 32) box covers the full tricubic
tap support of 96.7% of live lane-steps at 22.6 GB/frame of DMA). XLA
lowers those taps as serialized ~6.5-11 ns/access gathers (NOTES.md
r5/r10 pricing); this kernel replaces them, per 384-lane tile, with:

  1. an in-kernel fori over the RAYMARCH_STEPS with a DOUBLE-BUFFERED
     async DMA: while step s computes, step s+1's (DZ, DY, DX) box of
     the dense bf16 field is already streaming HBM -> VMEM at a
     per-(tile, step) corner precomputed in-graph (corners ride an SMEM
     block — 64 steps x 4 ints per tile);
  2. each lane's tap fetched from the box with one transposed one-hot
     bf16 MXU contraction (vals[c, l] = sum_r table[r, c] onehot[r, l],
     row r = z-quotient*DY + y) followed by a one-hot column
     multiply-reduce (col c = z-phase*DX + x). Everything stays in
     lanes-LAST (1, L) orientation — no in-kernel transposes, full VPU
     width — and one nonzero 1.0 x bf16 product accumulated in f32 is
     EXACT, so taps are bit-equal to dense[z, y, x].astype(f32).

Box layout: DX < 128 packs ZP = 128//DX contiguous z-slabs into the
128-wide column (win laid out (DZ//ZP, DY, ZP, DX); the DMA issues ZP
contiguous-z copies) so the box can be cube-shaped — the tap clouds are
~isotropic, and a (32, 32, 32) box costs 4x less HBM than (32, 32, 128).

Lanes whose tap falls outside their tile's box (or the volume: OOB taps
are 0 by the reference rule and never misses) report a miss; the caller
falls back to the serialized gather for those lanes — identical
estimator either way, this is purely a bandwidth-vs-latency path.

Ref: raymarch.glsl:6-23 (the step loop), performance.txt:20-26.
Verdict/economics: NOTES.md round-11 tile-march entry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 384  # 32x12-pixel micro-tile
STEPS = 64  # RAYMARCH_STEPS (raymarch.glsl:6)

# per-lane ray field rows in the kernel's (T, 16, LANES) f32 input
F_IPOS = 0  # rows 0:3 index-space origin (x, y, z)
F_IDIR = 3  # rows 3:6 index-space direction
F_START = 6
F_DT = 7
F_FAR = 8
F_VALID = 9


def _kernel_factory(dz: int, dy: int, dx: int, steps: int):
    zp = 128 // dx
    dzq = dz // zp
    rows = dzq * dy

    def kernel(
        corners_ref,  # SMEM (1, steps, 4) i32 — box corner z, y, x, pad
        ext_ref,  # SMEM (1, 4) i32 — volume extent x, y, z, pad
        rays_ref,  # VMEM (1, 16, LANES) f32
        dense_ref,  # ANY (Z, Y, X) bfloat16
        sums_ref,  # out VMEM (1, 1, LANES) f32
        miss_ref,  # out VMEM (1, 1, LANES) i32
        win,  # VMEM (2, dzq, dy, zp, dx) bf16 — double-buffered box
        sem,  # DMA (2, zp)
    ):
        rays = rays_ref[0]  # (16, LANES)
        ipx = rays[F_IPOS:F_IPOS + 1]  # (1, L) each
        ipy = rays[F_IPOS + 1:F_IPOS + 2]
        ipz = rays[F_IPOS + 2:F_IPOS + 3]
        idx_ = rays[F_IDIR:F_IDIR + 1]
        idy_ = rays[F_IDIR + 1:F_IDIR + 2]
        idz_ = rays[F_IDIR + 2:F_IDIR + 3]
        start = rays[F_START:F_START + 1]
        dt = rays[F_DT:F_DT + 1]
        far = rays[F_FAR:F_FAR + 1]
        valid = rays[F_VALID:F_VALID + 1] > 0.5
        ex = ext_ref[0, 0]
        ey = ext_ref[0, 1]
        ez = ext_ref[0, 2]

        def dmas(slot, s):
            z0 = corners_ref[0, s, 0]
            y0 = corners_ref[0, s, 1]
            x0 = corners_ref[0, s, 2]
            return [
                pltpu.make_async_copy(
                    dense_ref.at[
                        pl.ds(z0 + zr * dzq, dzq),
                        pl.ds(y0, dy),
                        pl.ds(x0, dx),
                    ],
                    win.at[slot, :, :, zr, :],
                    sem.at[slot, zr],
                )
                for zr in range(zp)
            ]

        for cp in dmas(0, 0):
            cp.start()

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (zp * dx, LANES), 0)

        def body(s, carry):
            acc, miss = carry
            slot = jax.lax.rem(s, 2)

            @pl.when(s + 1 < steps)
            def _():
                for cp in dmas(1 - slot, s + 1):
                    cp.start()

            for cp in dmas(slot, s):
                cp.wait()
            table = win[slot].reshape(rows, zp * dx)

            t = jnp.minimum(start + s.astype(jnp.float32) * dt, far)
            ux = jnp.floor(ipx + t * idx_ - 0.5).astype(jnp.int32)
            uy = jnp.floor(ipy + t * idy_ - 0.5).astype(jnp.int32)
            uz = jnp.floor(ipz + t * idz_ - 0.5).astype(jnp.int32)
            inside = (
                (ux >= 0) & (ux < ex) & (uy >= 0) & (uy < ey)
                & (uz >= 0) & (uz < ez)
            )
            z0 = corners_ref[0, s, 0]
            y0 = corners_ref[0, s, 1]
            x0 = corners_ref[0, s, 2]
            vx = jnp.clip(ux, 0, ex - 1) - x0
            vy = jnp.clip(uy, 0, ey - 1) - y0
            vz = jnp.clip(uz, 0, ez - 1) - z0
            inbox = (
                (vx >= 0) & (vx < dx) & (vy >= 0) & (vy < dy)
                & (vz >= 0) & (vz < dz)
            )
            row = jnp.clip((vz % dzq) * dy + vy, 0, rows - 1)  # (1, L)
            col = jnp.clip((vz // dzq) * dx + vx, 0, zp * dx - 1)
            onehot = (row == row_iota).astype(jnp.bfloat16)  # (rows, L)
            # vals[c, l] = sum_r table[r, c] * onehot[r, l] — contraction
            # on dim 0 of both: no transposes, lanes stay on the lane axis
            vals = jax.lax.dot_general(
                table, onehot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (zp*dx, L)
            colsel = (col == col_iota).astype(jnp.float32)
            sel = jnp.sum(vals * colsel, axis=0, keepdims=True)  # (1, L)
            live = valid & inside
            acc = acc + jnp.where(live & inbox, sel, 0.0)
            miss = miss + (live & ~inbox).astype(jnp.int32)
            return acc, miss

        acc, miss = jax.lax.fori_loop(
            0, steps, body,
            (jnp.zeros((1, LANES), jnp.float32),
             jnp.zeros((1, LANES), jnp.int32)),
        )
        sums_ref[0] = acc
        miss_ref[0] = miss

    return kernel


@functools.partial(
    jax.jit, static_argnames=("dz", "dy", "dx", "steps", "interpret")
)
def tile_march_sums(
    dense: jax.Array,
    rays: jax.Array,  # (T, 16, LANES) f32 — see F_* rows / pack_tile_rays
    corners: jax.Array,  # (T, steps, 4) i32 — per-(tile, step) corner z, y, x
    ext4: jax.Array,  # (4,) i32 — volume extent x, y, z, pad
    dz: int = 32,
    dy: int = 32,
    dx: int = 32,
    steps: int = STEPS,
    interpret: bool | None = None,
):
    """Per-lane sum over `steps` of the nearest-tap density, via the
    tile-march kernel. Returns (sums (T, LANES) f32, miss (T, LANES) i32).
    Hit lanes (miss == 0) are BIT-equal to the serialized-gather sum."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if 128 % dx or dz % (128 // dx):
        raise ValueError(f"dx must divide 128 and 128//dx divide dz: {dz},{dx}")
    if dense.shape[0] < dz or dense.shape[1] < dy or dense.shape[2] < dx:
        raise ValueError(f"box ({dz},{dy},{dx}) larger than field {dense.shape}")
    ntiles = rays.shape[0]
    kernel = _kernel_factory(dz, dy, dx, steps)
    zp = 128 // dx
    sums, miss = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, steps, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 16, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ntiles, 1, LANES), jnp.float32),
            jax.ShapeDtypeStruct((ntiles, 1, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, dz // zp, dy, zp, dx), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, zp)),
        ],
        interpret=bool(interpret),
    )(corners, ext4.reshape(1, 4), rays, dense)
    return sums[:, 0, :], miss[:, 0, :]


def pack_tile_rays(ipos, idir, start, dt, far, valid):
    """(T, LANES, ...) per-lane fields -> the kernel's (T, 16, LANES)."""
    t, lanes = valid.shape
    out = jnp.zeros((t, 16, lanes), jnp.float32)
    out = out.at[:, F_IPOS:F_IPOS + 3].set(jnp.moveaxis(ipos, -1, 1))
    out = out.at[:, F_IDIR:F_IDIR + 3].set(jnp.moveaxis(idir, -1, 1))
    out = out.at[:, F_START].set(start)
    out = out.at[:, F_DT].set(dt)
    out = out.at[:, F_FAR].set(far)
    out = out.at[:, F_VALID].set(valid.astype(jnp.float32))
    return out


def tile_corners(rays: jax.Array, ext, dz: int, dy: int, dx: int,
                 steps: int = STEPS):
    """Per-(tile, step) box corners (z, y, x, 0): the clipped min tap of
    the tile's valid lanes at the step's t, clamped so the box fits the
    volume. Pure dense math, in-graph; scans over steps so the working
    set stays (T, L, 3)."""
    ipos = rays[:, F_IPOS:F_IPOS + 3]  # (T, 3, L)
    idir = rays[:, F_IDIR:F_IDIR + 3]
    start = rays[:, F_START:F_START + 1]  # (T, 1, L)
    dtt = rays[:, F_DT:F_DT + 1]
    far = rays[:, F_FAR:F_FAR + 1]
    valid = rays[:, F_VALID:F_VALID + 1] > 0.5
    ext_xyz = jnp.asarray(ext, jnp.int32)[:, None]  # (3, 1)
    box_xyz = jnp.asarray([dx, dy, dz], jnp.int32)
    big = jnp.int32(1 << 20)

    def one_step(s):
        t = jnp.minimum(start + s.astype(jnp.float32) * dtt, far)
        tap = jnp.floor(ipos + t * idir - 0.5).astype(jnp.int32)
        tapc = jnp.clip(tap, 0, ext_xyz - 1)
        lo = jnp.min(jnp.where(valid, tapc, big), axis=-1)  # (T, 3) x, y, z
        hi = jnp.max(jnp.where(valid, tapc, -big), axis=-1)
        # center the box on the cloud: covers [lo, hi] whenever the
        # extent fits, and splits the spill between both sides when it
        # does not (min-anchoring puts ALL misses on the high side)
        mid = (lo + hi + 1 - box_xyz) // 2
        return jnp.clip(mid, 0, jnp.maximum(ext_xyz[:, 0] - box_xyz, 0))

    lo = jax.lax.map(one_step, jnp.arange(steps))  # (S, T, 3)
    lo = jnp.moveaxis(lo, 0, 1)  # (T, S, 3)
    zeros = jnp.zeros_like(lo[..., :1])
    return jnp.concatenate(
        [lo[..., 2:3], lo[..., 1:2], lo[..., 0:1], zeros], axis=-1)


def serial_march_sums(dense, rays, ext4, steps: int = STEPS):
    """The XLA serialized-gather arm: identical math, one dynamic gather
    per live lane-step — the A/B baseline and the miss-lane fallback."""
    ipos = rays[:, F_IPOS:F_IPOS + 3]  # (T, 3, L)
    idir = rays[:, F_IDIR:F_IDIR + 3]
    start = rays[:, F_START]  # (T, L)
    dtt = rays[:, F_DT]
    far = rays[:, F_FAR]
    valid = rays[:, F_VALID] > 0.5
    ex, ey, ez = ext4[0], ext4[1], ext4[2]

    def body(s, acc):
        t = jnp.minimum(start + s.astype(jnp.float32) * dtt, far)
        ux = jnp.floor(ipos[:, 0] + t * idir[:, 0] - 0.5).astype(jnp.int32)
        uy = jnp.floor(ipos[:, 1] + t * idir[:, 1] - 0.5).astype(jnp.int32)
        uz = jnp.floor(ipos[:, 2] + t * idir[:, 2] - 0.5).astype(jnp.int32)
        inside = (
            (ux >= 0) & (ux < ex) & (uy >= 0) & (uy < ey)
            & (uz >= 0) & (uz < ez)
        )
        tap = dense[
            jnp.clip(uz, 0, ez - 1), jnp.clip(uy, 0, ey - 1),
            jnp.clip(ux, 0, ex - 1),
        ].astype(jnp.float32)
        return acc + jnp.where(valid & inside, tap, 0.0)

    return jax.lax.fori_loop(
        0, steps, body, jnp.zeros(valid.shape, jnp.float32))
