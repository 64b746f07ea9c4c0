"""Tile-march: the raymarch step loop as pipelined box DMA + MXU selects.

The raymarch mode's per-step density taps are the one MC access pattern
in this tracer that is BOX-COHERENT: all lanes of a screen micro-tile
step through nearby voxels together (examples/probe_tilequant.py — with
the exact jittered per-lane t, the p50 per-(tile, step) tap-support
bbox is ~13x10x12 voxels at 1080p/512^3 volume-filling framing). XLA
lowers those taps as serialized ~6.5-11 ns/access gathers (NOTES.md
r5/r10 pricing); this kernel replaces them with a dense window select:

  1. per (tile, step) grid step, a window of the bf16 dense field is
     streamed HBM -> VMEM by Pallas's AUTOMATIC pipelining: the field
     rides prod(neigh) block in_specs whose index_maps add neighborhood
     offsets to a per-(tile, step) base block index precomputed
     in-graph and scalar-prefetched. (User-level `make_async_copy`
     windows are NOT an option here: the tunnel's Mosaic compile helper
     crashes on any DMA window with a dynamic sublane offset or a
     non-128-aligned lane slice — bisect in NOTES.md round 12 /
     examples/probe_dma_rules_{t,u}.py. Automatic pipelining emits
     block-aligned copies, which it accepts; corner quantization to the
     block grid is the price, measured by probe_tilequant.py.)
  2. each lane's tap is fetched from the window with one one-hot bf16
     MXU contraction per block (vals[c, l] = sum_r table[r, c]
     onehot[r, l], row r = local z*16 + y) followed by a one-hot column
     multiply-reduce (col c = local x). Everything stays in lanes-LAST
     (1, L) orientation — no in-kernel transposes, full VPU width — and
     one nonzero 1.0 x bf16 product accumulated in f32 is EXACT, so
     taps are bit-equal to dense[z, y, x].astype(f32).

A lane whose step's (volume-clipped) tap support leaves the window
FREEZES before consuming that step's draws, recording the step; the
caller RESUMES it mid-ray through the XLA loop from the frozen
(state, tau, step) — bit-identical either way, and the re-trace costs
only the remaining steps of frozen lanes. OOB-of-volume taps are 0 by
the reference rule and never freeze.

Ref: raymarch.glsl:6-23 (the step loop), performance.txt:20-26.
Geometry/economics: NOTES.md round-12 tile-march entries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 384  # 32x12-pixel micro-tile
STEPS = 64  # RAYMARCH_STEPS (raymarch.glsl:6)

# block shape (BZ, BY, BX): BY/BX pinned by bf16 VMEM tiling (sublane
# mult of 16, lane mult of 128); BZ free. Default neighborhood (3, 2, 2)
# -> window (24, 32, 256): 12.3% lane freeze, kernel 0.574 s for the
# whole 1080p/512^3 filled wavefront (examples/probe_tileprod.py) —
# 128-wide windows freeze 58% of lanes and lose end-to-end.
BY = 16
BX = 128

# per-lane ray field rows in the kernel's (T, 16, LANES) f32 input
F_IPOS = 0  # rows 0:3 index-space origin (x, y, z)
F_IDIR = 3  # rows 3:6 index-space direction
F_START = 6
F_DT = 7
F_FAR = 8
F_VALID = 9
F_TAU = 10  # tau_target (sample kernel only; drawn in the prologue)


def effective_neigh(shape, bz: int, neigh) -> tuple:
    """Clamp the neighborhood so no block index can leave the field's
    block grid (index_maps add offsets 0..n-1 to the clipped base)."""
    nz, ny, nx = neigh
    return (
        min(nz, -(-shape[0] // bz)),
        min(ny, -(-shape[1] // BY)),
        min(nx, -(-shape[2] // BX)),
    )


def pack_tile_rays(ipos, idir, start, dt, far, valid, tau_target=None):
    """(T, LANES, ...) per-lane fields -> the kernel's (T, 16, LANES)."""
    t, lanes = valid.shape
    out = jnp.zeros((t, 16, lanes), jnp.float32)
    out = out.at[:, F_IPOS:F_IPOS + 3].set(jnp.moveaxis(ipos, -1, 1))
    out = out.at[:, F_IDIR:F_IDIR + 3].set(jnp.moveaxis(idir, -1, 1))
    out = out.at[:, F_START].set(start)
    out = out.at[:, F_DT].set(dt)
    out = out.at[:, F_FAR].set(far)
    out = out.at[:, F_VALID].set(valid.astype(jnp.float32))
    if tau_target is not None:
        out = out.at[:, F_TAU].set(tau_target)
    return out


def _block_corners(rays, ext, bz: int, neigh, steps: int, dilate: int):
    """Per-(tile, step) base BLOCK index (bz_i, by_i, bx_i, 0) covering
    the tile's tap support at the step's EXACT per-lane t. dilate=0 for
    the nearest tap (sums kernel), 1 for the stochastic tricubic support
    [floor(p-.5)-1, floor(p-.5)+2]. Pure dense math, in-graph; scans
    over steps so the working set stays (T, L, 3)."""
    nz, ny, nx = neigh
    ipos = rays[:, F_IPOS:F_IPOS + 3]  # (T, 3, L)
    idir = rays[:, F_IDIR:F_IDIR + 3]
    start = rays[:, F_START:F_START + 1]
    dtt = rays[:, F_DT:F_DT + 1]
    far = rays[:, F_FAR:F_FAR + 1]
    valid = rays[:, F_VALID:F_VALID + 1] > 0.5
    ext_xyz = jnp.asarray(ext, jnp.int32)[:, None]  # (3, 1) x, y, z
    blk_xyz = jnp.asarray([BX, BY, bz], jnp.int32)
    n_xyz = jnp.asarray([nx, ny, nz], jnp.int32)
    nb_xyz = -(-jnp.asarray(ext, jnp.int32) // blk_xyz)  # ceil div
    big = jnp.int32(1 << 20)

    def one_step(s):
        t = jnp.minimum(start + s.astype(jnp.float32) * dtt, far)
        base = jnp.floor(ipos + t * idir - 0.5).astype(jnp.int32)
        tlo = jnp.clip(base - dilate, 0, ext_xyz - 1)
        thi = jnp.clip(base + 1 + 2 * dilate, 0, ext_xyz - 1)
        lo = jnp.min(jnp.where(valid, tlo, big), axis=-1)  # (T, 3) x, y, z
        hi = jnp.max(jnp.where(valid, thi, -big), axis=-1)
        # OPTIMAL block anchor: the smallest a whose window still covers
        # hi (w_hi = (a + n)*blk >= hi + 1) — this maximizes low-side
        # coverage, so the window covers [lo, hi] whenever ANY anchor
        # can. (The r12 centered anchor floored the centre down by up to
        # a full block, uncovering the high side — measured 94.7%
        # per-lane freeze at p50 step 2, examples/probe_tileprod.py.)
        a = -((hi + 1 - n_xyz * blk_xyz) // -blk_xyz)  # ceil div
        a = jnp.clip(a, 0, jnp.maximum(nb_xyz - n_xyz, 0))
        return a

    a = jax.lax.map(one_step, jnp.arange(steps))  # (S, T, 3) x, y, z
    a = jnp.moveaxis(a, 0, 1)  # (T, S, 3)
    zeros = jnp.zeros_like(a[..., :1])
    return jnp.concatenate(
        [a[..., 2:3], a[..., 1:2], a[..., 0:1], zeros], axis=-1)


def tile_block_corners(rays, ext, bz: int = 8, neigh=(3, 2, 1),
                       steps: int = STEPS):
    """Block corners for the nearest-tap sums kernel."""
    return _block_corners(rays, ext, bz, neigh, steps, dilate=0)


def tile_block_corners_stochastic(rays, ext, bz: int = 8, neigh=(3, 2, 1),
                                  steps: int = STEPS):
    """Block corners covering the STOCHASTIC tricubic tap support: the
    chosen tap is floor(p - 0.5) + {-1..2} per axis at the lane's exact
    (jittered) t."""
    return _block_corners(rays, ext, bz, neigh, steps, dilate=1)


def _window_tap(blocks, cb_ref, t_idx, s_idx, ux, uy, uz, sel_mask,
                bz: int, neigh, lanes: int):
    """One-hot select of dense[uz, uy, ux] (f32, bit-exact) from the
    neighborhood blocks. Returns (tapv (1, L) f32, inwin (1, L) bool).
    sel_mask gates which lanes participate (others never match)."""
    nz, ny, nx = neigh
    z0 = cb_ref[t_idx, s_idx, 0] * bz
    y0 = cb_ref[t_idx, s_idx, 1] * BY
    x0 = cb_ref[t_idx, s_idx, 2] * BX
    vz = uz - z0
    vy = uy - y0
    vx = ux - x0
    inwin = (
        (vz >= 0) & (vz < nz * bz) & (vy >= 0) & (vy < ny * BY)
        & (vx >= 0) & (vx < nx * BX)
    )
    live = sel_mask & inwin
    rows = bz * BY
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (BX, lanes), 0)
    tapv = jnp.zeros((1, lanes), jnp.float32)
    for zo in range(nz):
        for yo in range(ny):
            for xo in range(nx):
                blk = blocks[(zo * ny + yo) * nx + xo]
                sel = (
                    live
                    & (vz // bz == zo) & (vy // BY == yo) & (vx // BX == xo)
                )
                rowb = jnp.where(
                    sel, (vz - zo * bz) * BY + (vy - yo * BY), -1)
                onehot = (rowb == row_iota).astype(jnp.bfloat16)
                table = blk[...].reshape(rows, BX)
                vals = jax.lax.dot_general(
                    table, onehot, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (BX, L)
                colb = jnp.where(sel, vx - xo * BX, -1)
                colsel = (colb == col_iota).astype(jnp.float32)
                tapv = tapv + jnp.sum(vals * colsel, axis=0, keepdims=True)
    return tapv, inwin


def _dense_block_specs(bz: int, neigh):
    """One BlockSpec per neighborhood offset; index_map adds the offset
    to the prefetched per-(tile, step) base block index."""
    nz, ny, nx = neigh

    def mk(zo, yo, xo):
        return pl.BlockSpec(
            (bz, BY, BX),
            lambda t, s, cb, zo=zo, yo=yo, xo=xo: (
                cb[t, s, 0] + zo, cb[t, s, 1] + yo, cb[t, s, 2] + xo),
            memory_space=pltpu.VMEM,
        )

    return [mk(zo, yo, xo)
            for zo in range(nz) for yo in range(ny) for xo in range(nx)]



# tiles per pallas_call: the scalar-prefetch corner table
# ((TILE_BATCH, steps, 4) int32) must fit SMEM — the on-chip bisect
# measured the compile helper crashing between 24 KB and 32 KB of
# prefetch (T=24/S=64 OK, T=32/S=64 HTTP 500; any (T, S) split at
# 16 KB OK). 16 tiles x 64 steps = 16 KB. lax.map over tile batches
# keeps every call at that size regardless of frame size.
TILE_BATCH = 16


def _batched_tiles(call, ntiles: int, tile_batch: int, arrays):
    """lax.map `call` over tile batches; arrays are (T, ...) operands
    split on dim 0; padding tiles are trimmed from each output."""
    tb = min(tile_batch, ntiles)
    nb = -(-ntiles // tb)
    padded = nb * tb

    def pad(x):
        if padded == ntiles:
            return x
        widths = [(0, padded - ntiles)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    batched = tuple(pad(x).reshape((nb, tb) + x.shape[1:]) for x in arrays)
    outs = jax.lax.map(call, batched)
    return tuple(
        o.reshape((padded,) + o.shape[2:])[:ntiles] for o in outs)


def _sums_kernel_factory(bz: int, neigh, steps: int, lanes: int):
    nblk = neigh[0] * neigh[1] * neigh[2]

    def kernel(cb_ref, ext_ref, rays_ref, *refs):
        blocks = refs[:nblk]
        sums_ref = refs[nblk]
        miss_ref = refs[nblk + 1]
        t_idx = pl.program_id(0)
        s_idx = pl.program_id(1)

        @pl.when(s_idx == 0)
        def _():
            sums_ref[0] = jnp.zeros((1, lanes), jnp.float32)
            miss_ref[0] = jnp.zeros((1, lanes), jnp.int32)

        rays = rays_ref[0]
        ipx = rays[F_IPOS:F_IPOS + 1]
        ipy = rays[F_IPOS + 1:F_IPOS + 2]
        ipz = rays[F_IPOS + 2:F_IPOS + 3]
        dxr = rays[F_IDIR:F_IDIR + 1]
        dyr = rays[F_IDIR + 1:F_IDIR + 2]
        dzr = rays[F_IDIR + 2:F_IDIR + 3]
        start = rays[F_START:F_START + 1]
        dt = rays[F_DT:F_DT + 1]
        far = rays[F_FAR:F_FAR + 1]
        valid = rays[F_VALID:F_VALID + 1] > 0.5
        ex = ext_ref[0, 0]
        ey = ext_ref[0, 1]
        ez = ext_ref[0, 2]

        t = jnp.minimum(start + s_idx.astype(jnp.float32) * dt, far)
        ux = jnp.floor(ipx + t * dxr - 0.5).astype(jnp.int32)
        uy = jnp.floor(ipy + t * dyr - 0.5).astype(jnp.int32)
        uz = jnp.floor(ipz + t * dzr - 0.5).astype(jnp.int32)
        inside = (
            (ux >= 0) & (ux < ex) & (uy >= 0) & (uy < ey)
            & (uz >= 0) & (uz < ez)
        )
        live = valid & inside
        tapv, inwin = _window_tap(
            blocks, cb_ref, t_idx, s_idx, ux, uy, uz, live, bz, neigh, lanes)
        sums_ref[0] += jnp.where(live & inwin, tapv, 0.0)
        miss_ref[0] += (live & ~inwin).astype(jnp.int32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("bz", "neigh", "steps", "interpret")
)
def tile_march_sums(
    dense: jax.Array,
    rays: jax.Array,  # (T, 16, LANES) f32 — see F_* rows / pack_tile_rays
    cb: jax.Array,  # (T, steps, 4) i32 — per-(tile, step) base block idx
    ext4: jax.Array,  # (4,) i32 — volume extent x, y, z, pad
    bz: int = 8,
    neigh: tuple = (3, 2, 1),
    steps: int = STEPS,
    interpret: bool | None = None,
):
    """Per-lane sum over `steps` of the nearest-tap density, via the
    pipelined tile-march kernel. Returns (sums (T, LANES) f32,
    miss (T, LANES) i32). Hit lanes (miss == 0) are BIT-equal to the
    serialized-gather sum (serial_march_sums)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    neigh = effective_neigh(dense.shape, bz, neigh)
    ntiles, _, lanes = rays.shape
    kernel = _sums_kernel_factory(bz, neigh, steps, lanes)
    nblk = neigh[0] * neigh[1] * neigh[2]
    tb = min(TILE_BATCH, ntiles)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tb, steps),
        in_specs=[
            pl.BlockSpec((1, 4), lambda t, s, cb: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 16, lanes), lambda t, s, cb: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + _dense_block_specs(bz, neigh),
        out_specs=[
            pl.BlockSpec((1, 1, lanes), lambda t, s, cb: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lanes), lambda t, s, cb: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=gs,
        out_shape=[
            jax.ShapeDtypeStruct((tb, 1, lanes), jnp.float32),
            jax.ShapeDtypeStruct((tb, 1, lanes), jnp.int32),
        ],
        interpret=bool(interpret),
    )
    sums, miss = _batched_tiles(
        lambda args: call(args[0], ext4.reshape(1, 4), args[1],
                          *([dense] * nblk)),
        ntiles, TILE_BATCH, (cb, rays),
    )
    return sums[:, 0, :], miss[:, 0, :]


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


# ---------------------------------------------------------------------------
# Production kernel: the full sample_volume_raymarch step loop in-kernel
# (raymarch.glsl:30-56 semantics — stochastic tricubic filter, transfer
# LUT, tau-target inversion — with the reference's exact draw protocol).
# ---------------------------------------------------------------------------

_U32 = jnp.uint32


def _k_rotl(x, k: int):
    return (x << _U32(k)) | (x >> _U32(32 - k))


def _k_next_u32(s):
    """xoshiro128++ step on 4x (1, L) uint32 planes — the exact op chain
    of render.rng.next_u32 (random.glsl:80-94)."""
    s0, s1, s2, s3 = s
    result = _k_rotl(s0 + s2, 7) + s0
    t = s1 << _U32(9)
    s2 = s2 ^ s0
    s3 = s3 ^ s1
    s1 = s1 ^ s2
    s0 = s0 ^ s3
    s2 = s2 ^ t
    s3 = _k_rotl(s3, 11)
    return (s0, s1, s2, s3), result


def _k_rng(s):
    s, r = _k_next_u32(s)
    # Mosaic has no u32 -> f32 cast; r >> 8 < 2^24 so the i32 hop is exact
    r24 = (r >> _U32(8)).astype(jnp.int32).astype(jnp.float32)
    return s, r24 * jnp.float32(1.0 / 16777216.0)


def _k_rng3_where(mask, s):
    """rng.rng3_where: 3 sequential draws; masked lanes keep their state."""
    s2, a = _k_rng(s)
    s2, b = _k_rng(s2)
    s2, c = _k_rng(s2)
    s = tuple(jnp.where(mask, n, o) for n, o in zip(s2, s))
    return s, (a, b, c)


# scalar row layout (SMEM (1, 8) f32)
S_INV_MAJ = 0
S_VOL_MAJ = 1
S_DEN_SCALE = 2
S_RANGE_LO = 3
S_RANGE_HI = 4

# outf rows
O_T = 0
O_R = 1
O_G = 2
O_B = 3
O_HIT = 4
O_MISS = 5
O_TAU = 6
O_MARCH = 7


def _sample_kernel_factory(bz: int, neigh, steps: int, lut_k: int,
                           lanes: int):
    nblk = neigh[0] * neigh[1] * neigh[2]

    def kernel(cb_ref, ext_ref, scal_ref, rays_ref, state_ref, lut_ref,
               *refs):
        blocks = refs[:nblk]
        outf_ref = refs[nblk]
        outs_ref = refs[nblk + 1]
        t_idx = pl.program_id(0)
        s_idx = pl.program_id(1)

        rays = rays_ref[0]
        valid = rays[F_VALID:F_VALID + 1] > 0.5

        @pl.when(s_idx == 0)
        def _():
            zf = jnp.zeros((1, lanes), jnp.float32)
            outf_ref[0, O_T:O_T + 1] = zf
            outf_ref[0, O_R:O_R + 1] = jnp.ones((1, lanes), jnp.float32)
            outf_ref[0, O_G:O_G + 1] = jnp.ones((1, lanes), jnp.float32)
            outf_ref[0, O_B:O_B + 1] = jnp.ones((1, lanes), jnp.float32)
            outf_ref[0, O_HIT:O_HIT + 1] = zf
            outf_ref[0, O_MISS:O_MISS + 1] = zf
            outf_ref[0, O_TAU:O_TAU + 1] = zf
            outf_ref[0, O_MARCH:O_MARCH + 1] = valid.astype(jnp.float32)
            outs_ref[0] = state_ref[0]

        marching = outf_ref[0, O_MARCH:O_MARCH + 1] > 0.5

        # the whole step is a no-op for tiles whose lanes all stopped;
        # the DMA still streams (pipelining is unconditional) but the
        # VPU/MXU work is skipped
        @pl.when(jnp.any(marching))
        def _():
            ipx = rays[F_IPOS:F_IPOS + 1]
            ipy = rays[F_IPOS + 1:F_IPOS + 2]
            ipz = rays[F_IPOS + 2:F_IPOS + 3]
            dxr = rays[F_IDIR:F_IDIR + 1]
            dyr = rays[F_IDIR + 1:F_IDIR + 2]
            dzr = rays[F_IDIR + 2:F_IDIR + 3]
            start = rays[F_START:F_START + 1]
            dt = rays[F_DT:F_DT + 1]
            far = rays[F_FAR:F_FAR + 1]
            tau_target = rays[F_TAU:F_TAU + 1]
            st = outs_ref[0]
            ex = ext_ref[0, 0]
            ey = ext_ref[0, 1]
            ez = ext_ref[0, 2]
            inv_maj = scal_ref[0, S_INV_MAJ]
            vol_maj = scal_ref[0, S_VOL_MAJ]
            den_scale = scal_ref[0, S_DEN_SCALE]
            range_lo = scal_ref[0, S_RANGE_LO]
            range_hi = scal_ref[0, S_RANGE_HI]

            tau = outf_ref[0, O_TAU:O_TAU + 1]
            missed = outf_ref[0, O_MISS:O_MISS + 1] > 0.5

            def cubic_weights(tf):
                # common.glsl:9-32 / sampling.stochastic_tricubic op
                # chain, replicated term for term
                t2 = tf * tf
                t3 = tf * t2
                w0 = jnp.float32(1 / 6) * (-t3 + 3.0 * t2 - 3.0 * tf + 1.0)
                w1 = jnp.float32(1 / 6) * (3.0 * t3 - 6.0 * t2 + 4.0)
                w2 = jnp.float32(1 / 6) * (-3.0 * t3 + 3.0 * t2 + 3.0 * tf + 1.0)
                w3 = jnp.float32(1 / 6) * t3
                return w0, w1, w2, w3

            t = jnp.minimum(start + s_idx.astype(jnp.float32) * dt, far)
            px_ = ipx + t * dxr - 0.5
            py_ = ipy + t * dyr - 0.5
            pz_ = ipz + t * dzr - 0.5
            fx_ = jnp.floor(px_)
            fy_ = jnp.floor(py_)
            fz_ = jnp.floor(pz_)

            # FREEZE-BEFORE-DRAWS: if this step's full (volume-clipped)
            # tricubic support [f-1, f+2] is not inside the window, the
            # lane freezes NOW — before consuming any of the step's
            # draws — recording its step in O_MISS (step+1; 0 = clean).
            # The caller's fallback then RESUMES the march from exactly
            # this step with the recorded state/tau, so the re-trace
            # costs only the remaining steps and stays bit-equal to the
            # pure-XLA lane (the support check is conservative: any tap
            # the reservoir could choose is available when it passes).
            bxi = fx_.astype(jnp.int32)
            byi = fy_.astype(jnp.int32)
            bzi = fz_.astype(jnp.int32)
            z0 = cb_ref[t_idx, s_idx, 0] * bz
            y0 = cb_ref[t_idx, s_idx, 1] * BY
            x0 = cb_ref[t_idx, s_idx, 2] * BX
            nz_, ny_, nx_ = neigh

            def sup_in(lo, hi, w0, wn, e):
                lo = jnp.clip(lo, 0, e - 1)
                hi = jnp.clip(hi, 0, e - 1)
                return (lo >= w0) & (hi < w0 + wn)

            support_ok = (
                sup_in(bxi - 1, bxi + 2, x0, nx_ * BX, ex)
                & sup_in(byi - 1, byi + 2, y0, ny_ * BY, ey)
                & sup_in(bzi - 1, bzi + 2, z0, nz_ * bz, ez)
            )
            new_miss = marching & ~support_ok
            live = marching & support_ok

            # stochastic_tricubic_offsets: p = pos - 0.5, reservoir over
            # taps 1..3 per axis, 9 masked draws in rng3 groups
            wx = cubic_weights(px_ - fx_)
            wy = cubic_weights(py_ - fy_)
            wz = cubic_weights(pz_ - fz_)
            sw_x, sw_y, sw_z = wx[0], wy[0], wz[0]
            ix = jnp.zeros_like(px_, jnp.int32)
            iy = jnp.zeros_like(px_, jnp.int32)
            iz = jnp.zeros_like(px_, jnp.int32)
            st_loc = (st[0:1], st[1:2], st[2:3], st[3:4])
            for k in (1, 2, 3):
                sw_x = sw_x + wx[k]
                sw_y = sw_y + wy[k]
                sw_z = sw_z + wz[k]
                st_loc, (ra, rb, rc) = _k_rng3_where(live, st_loc)
                ix = jnp.where(ra < wx[k] / jnp.maximum(1e-3, sw_x), k, ix)
                iy = jnp.where(rb < wy[k] / jnp.maximum(1e-3, sw_y), k, iy)
                iz = jnp.where(rc < wz[k] / jnp.maximum(1e-3, sw_z), k, iz)
            ux = bxi + ix - 1
            uy = byi + iy - 1
            uz = bzi + iz - 1

            inside = (
                (ux >= 0) & (ux < ex) & (uy >= 0) & (uy < ey)
                & (uz >= 0) & (uz < ez)
            )
            tapv, _ = _window_tap(
                blocks, cb_ref, t_idx, s_idx, ux, uy, uz,
                live & inside, bz, neigh, lanes)
            d_raw = den_scale * jnp.where(inside, tapv, 0.0)

            # lookup_transfer (common.glsl:78-83)
            dens = d_raw * inv_maj
            rejected = (dens < range_lo) | (dens > range_hi)
            li = jnp.clip(
                jnp.floor(dens * jnp.float32(lut_k)).astype(jnp.int32),
                0, lut_k - 1,
            )
            lut_iota = jax.lax.broadcasted_iota(jnp.int32, (lut_k, lanes), 0)
            lsel = (li == lut_iota).astype(jnp.float32)
            # HIGHEST: the f32 MXU path decomposes each f32 into 3 bf16
            # parts — exact for one-hot x f32 (24 mantissa bits covered);
            # the default single bf16 pass TRUNCATES the LUT values
            # (caught by the on-chip bit-parity check)
            rgba = jax.lax.dot_general(
                lut_ref[...], lsel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (4, L)
            alpha = jnp.where(rejected, 0.0, rgba[3:4])

            tau_new = tau + alpha * vol_maj * dt
            new_hit = live & (tau_new >= tau_target)

            outf_ref[0, O_T:O_T + 1] = jnp.where(
                new_hit, t, outf_ref[0, O_T:O_T + 1])
            outf_ref[0, O_R:O_R + 1] = jnp.where(
                new_hit, jnp.where(rejected, 0.0, rgba[0:1]),
                outf_ref[0, O_R:O_R + 1])
            outf_ref[0, O_G:O_G + 1] = jnp.where(
                new_hit, jnp.where(rejected, 0.0, rgba[1:2]),
                outf_ref[0, O_G:O_G + 1])
            outf_ref[0, O_B:O_B + 1] = jnp.where(
                new_hit, jnp.where(rejected, 0.0, rgba[2:3]),
                outf_ref[0, O_B:O_B + 1])
            outf_ref[0, O_HIT:O_HIT + 1] = jnp.maximum(
                outf_ref[0, O_HIT:O_HIT + 1], new_hit.astype(jnp.float32))
            # O_MISS records the FREEZE STEP + 1 (0 = never missed); a
            # lane freezes at most once (marching drops to 0 with it)
            outf_ref[0, O_MISS:O_MISS + 1] = jnp.where(
                new_miss, s_idx.astype(jnp.float32) + 1.0,
                jnp.where(missed, outf_ref[0, O_MISS:O_MISS + 1], 0.0))
            outf_ref[0, O_TAU:O_TAU + 1] = jnp.where(live, tau_new, tau)
            outf_ref[0, O_MARCH:O_MARCH + 1] = (
                (live & ~new_hit).astype(jnp.float32))
            s0n, s1n, s2n, s3n = st_loc
            outs_ref[0] = jnp.concatenate([s0n, s1n, s2n, s3n], axis=0)

    return kernel


def tile_march_sample(
    dense, rays, state4, cb, lut_t, scalars, ext4,
    bz: int = 8, neigh: tuple = (3, 2, 1), steps: int = STEPS,
    interpret: bool | None = None,
):
    """Run the production sample kernel over (T, LANES) tiles.

    rays: (T, 16, LANES) f32 (pack_tile_rays with tau_target); state4:
    (T, 4, LANES) u32 post-prologue xoshiro state; cb: block corners
    from tile_block_corners_stochastic; lut_t: (4, K) f32 transposed
    transfer LUT; scalars: (8,) f32 (S_* rows); ext4: (4,) i32.
    Returns (outf (T, 8, LANES) f32 — O_* rows, outs (T, 4, LANES) u32).
    Non-missed lanes are BIT-equal to sample_volume_raymarch."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    neigh = effective_neigh(dense.shape, bz, neigh)
    ntiles, _, lanes = rays.shape
    lut_k = lut_t.shape[1]
    kernel = _sample_kernel_factory(bz, neigh, steps, lut_k, lanes)
    nblk = neigh[0] * neigh[1] * neigh[2]
    tb = min(TILE_BATCH, ntiles)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tb, steps),
        in_specs=[
            pl.BlockSpec((1, 4), lambda t, s, cb: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda t, s, cb: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 16, lanes), lambda t, s, cb: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, lanes), lambda t, s, cb: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, lut_k), lambda t, s, cb: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + _dense_block_specs(bz, neigh),
        out_specs=[
            pl.BlockSpec((1, 8, lanes), lambda t, s, cb: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, lanes), lambda t, s, cb: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=gs,
        out_shape=[
            jax.ShapeDtypeStruct((tb, 8, lanes), jnp.float32),
            jax.ShapeDtypeStruct((tb, 4, lanes), jnp.uint32),
        ],
        interpret=bool(interpret),
    )
    return _batched_tiles(
        lambda args: call(args[0], ext4.reshape(1, 4), scalars.reshape(1, 8),
                          args[1], args[2], lut_t, *([dense] * nblk)),
        ntiles, TILE_BATCH, (cb, rays, state4),
    )
