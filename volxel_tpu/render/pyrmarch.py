"""Pyramid-march: the DDA march loop in-kernel over a VMEM-resident
premul majorant pyramid.

The default mode's march (dda.glsl:65-98 / modes._sample_compact_loop)
is one majorant fetch + a handful of VPU ops per step; XLA lowers the
fetch as a serialized per-lane gather measured at a FLAT ~14.6
ns/lane-access — independent of index locality and table size
(examples/probe_gatherloc.py, NOTES.md round 13). The whole compact
premul pyramid is VMEM-small (1.2 MB int8-packed at 512^3), so the
march can instead run INSIDE one Pallas kernel: the pyramid stays
resident, each step's majorant is a one-hot int8 MXU contraction
(bit-exact byte-plane decomposition, as render.mxu_gather), and the
per-step cost drops to the ~6.9 ns/lane-step the round-9 probe measured
(examples/probe_march_kernel.py) — with no per-step XLA loop overhead.

Execution model: lanes march until their FIRST collision candidate
(tau exhausted), escape, or per-lane step-budget exhaustion, and PARK
there (the tilemarch freeze protocol, but at a per-lane boundary the
estimator defines: collisions are where all draws happen). The caller
(modes.sample_volume_dda_pyr / transmittance_dda_pyr) runs the
collision decode + RNG draws in XLA and re-enters the kernel — the
while_loop becomes per-COLLISION rounds instead of per-step iterations.
Every f32 op in the kernel replicates the XLA march chain op-for-op
(mults/adds/divs individually rounded, min/max associative), and the
majorant bytes are reassembled exactly, so parked states are BIT-equal
to the XLA march (pinned by tests/test_pyrmarch.py; chip check in
examples/probe_pyr.py).

The fetch is split at 128-row-aligned pyramid level boundaries into up
to three one-hot groups (level 0 / level 1 / coarser), each gated on
`any lane at that level this step`: empty-space marches ride mips 2-3
(37k entries at 512^3 -> ~0.4% of the full dot's MACs), so wide
framings skip the level-0 contraction almost every step.

Ref: dda.glsl:65-98 (sampleDDA), dda.glsl:21-62 (transmittanceDDA),
common.glsl:50-53 (majorant fetch). Cost model: NOTES.md rounds 9/13.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128  # lanes per kernel block (one vreg lane-width)

# input rows of the (B, 16, LANES) f32 ray block
R_IPX, R_IPY, R_IPZ = 0, 1, 2
R_IDX, R_IDY, R_IDZ = 3, 4, 5
R_RIX, R_RIY, R_RIZ = 6, 7, 8  # 1/idir, precomputed by the caller (one
# division site so kernel and XLA rounds share the exact quotient bits)
R_T = 9
R_TAU = 10
R_MIP = 11
R_FAR = 12
R_BUDGET = 13  # remaining per-lane iterations (exact small ints in f32)
R_RUN = 14

# output rows of the (B, 8, LANES) f32 result block
O_T = 0
O_TAU = 1
O_MIP = 2
O_MAJ = 3  # majorant at the collision step (the real-collision test)
O_KIND = 4
O_BUDGET = 5

KIND_IDLE = 0.0  # lane wasn't running (or safety bound hit: retry)
KIND_COLL = 1.0  # parked at a live collision: decode + draws next
KIND_DONE = 2.0  # escaped at collision / left the box / budget out

# pyramid tables above this entry count don't fit the VMEM-resident
# kernel (int8 packing = 4 B/entry + one-hot/iota working set); 512^3
# is ~300k entries, 1024^3 (~2.4M) must fall back to the XLA march.
PYR_MAX_ENTRIES = 1 << 19

# mip-dependent constants (modes.MIP_* / _step_dda), baked static
_DIMS_F32 = (8.0, 16.0, 32.0, 64.0)


def _sel4(m, vals):
    """Per-lane select of one of 4 values by mip — where-chain (the
    sampling._sel4 shape): no gathers, and only STATIC shift amounts
    ever reach Mosaic."""
    return jnp.where(
        m <= 1,
        jnp.where(m == 0, vals[0], vals[1]),
        jnp.where(m == 2, vals[2], vals[3]),
    )


def fetch_groups(dims, offsets, rows: int) -> tuple:
    """Static one-hot fetch groups ((row_off, n_rows), ...): split at
    pyramid level boundaries that land on 128-element row boundaries so
    each group's contraction can be gated on `any lane at that level`.
    Unaligned boundaries merge into the preceding group."""
    bounds = [0]
    for m in range(1, 4):
        if offsets[m] % 128 == 0:
            bounds.append(offsets[m] // 128)
    bounds.append(rows)
    groups = []
    for a, b in zip(bounds, bounds[1:]):
        if b > a:
            groups.append((a, b - a))
    return tuple(groups)


def _kernel_factory(groups, offsets, cyx, cx, steps_cap: int, lanes: int):
    """Kernel over one (16, lanes) ray block with the packed pyramid
    resident. offsets/cyx/cx: per-level flat-index constants of the
    compact pyramid (sampling._compact_pyramid_dims)."""

    # per-level flat index uses only STATIC shifts (sel4 over levels)
    def level_idx(vx, vy, vz, m):
        return (
            offsets[m]
            + (vz >> m) * cyx[m]
            + (vy >> m) * cx[m]
            + (vx >> m)
        )

    def kernel(ext_ref, rays_ref, table_ref, out_ref):
        rays = rays_ref[0]
        ipx = rays[R_IPX:R_IPX + 1]
        ipy = rays[R_IPY:R_IPY + 1]
        ipz = rays[R_IPZ:R_IPZ + 1]
        idx_ = rays[R_IDX:R_IDX + 1]
        idy_ = rays[R_IDY:R_IDY + 1]
        idz_ = rays[R_IDZ:R_IDZ + 1]
        rix = rays[R_RIX:R_RIX + 1]
        riy = rays[R_RIY:R_RIY + 1]
        riz = rays[R_RIZ:R_RIZ + 1]
        far = rays[R_FAR:R_FAR + 1]
        run = rays[R_RUN:R_RUN + 1] > 0.5
        ex = ext_ref[0, 0]
        ey = ext_ref[0, 1]
        ez = ext_ref[0, 2]

        col_iota = jax.lax.broadcasted_iota(jnp.int32, (128, lanes), 0)

        def fetch(idx, mask):
            """table[idx] reassembled bit-exactly from int8 byte planes
            (render.mxu_gather packing); masked lanes return garbage the
            caller never reads. Level groups are gated on occupancy."""
            row = idx >> 7
            col = idx & 127
            vals = jnp.zeros((512, lanes), jnp.int32)
            for off, nr in groups:
                rowg = jnp.where(
                    mask & (row >= off) & (row < off + nr), row - off, -1
                )

                def dot_group(off=off, nr=nr, rowg=rowg):
                    row_iota = jax.lax.broadcasted_iota(
                        jnp.int32, (nr, lanes), 0
                    )
                    onehot = (rowg == row_iota).astype(jnp.int8)
                    return jax.lax.dot_general(
                        table_ref[off:off + nr],
                        onehot,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )

                if len(groups) == 1:
                    vals = vals + dot_group()
                else:
                    vals = vals + jax.lax.cond(
                        jnp.any(rowg >= 0),
                        dot_group,
                        lambda: jnp.zeros((512, lanes), jnp.int32),
                    )
            vals = vals + 128  # undo the int8 pack bias (one hit per lane)
            colsel = col == col_iota

            def plane(p):
                sub = jnp.where(colsel, vals[p * 128:(p + 1) * 128], 0)
                return jnp.sum(sub, axis=0, keepdims=True).astype(jnp.uint32)

            bits = (
                plane(0)
                | (plane(1) << jnp.uint32(8))
                | (plane(2) << jnp.uint32(16))
                | (plane(3) << jnp.uint32(24))
            )
            return jax.lax.bitcast_convert_type(bits, jnp.float32)

        def body(carry):
            t, tau, mip, budget, march, kind, maj_out, k = carry

            # --- the exact modes._sample_compact_loop march chain ---
            mip_i = jnp.clip(
                jnp.floor(mip + 0.5).astype(jnp.int32), 0, 3
            )
            cxw = ipx + t * idx_
            cyw = ipy + t * idy_
            czw = ipz + t * idz_
            # _majorant_coords: floor -> clip to extent -> brick >> 3
            vx = jnp.clip(jnp.floor(cxw).astype(jnp.int32), 0, ex - 1) >> 3
            vy = jnp.clip(jnp.floor(cyw).astype(jnp.int32), 0, ey - 1) >> 3
            vz = jnp.clip(jnp.floor(czw).astype(jnp.int32), 0, ez - 1) >> 3
            idxf = _sel4(
                mip_i, [level_idx(vx, vy, vz, m) for m in range(4)]
            )
            maj = fetch(idxf, march)
            # _step_dda at the traced mip
            dim = _sel4(mip_i, [jnp.float32(d) for d in _DIMS_F32])
            offx = jnp.where(rix >= 0.0, dim + 0.5, -0.5)
            offy = jnp.where(riy >= 0.0, dim + 0.5, -0.5)
            offz = jnp.where(riz >= 0.0, dim + 0.5, -0.5)
            tmx = (jnp.floor(cxw / dim) * dim + offx - cxw) * rix
            tmy = (jnp.floor(cyw / dim) * dim + offy - cyw) * riy
            tmz = (jnp.floor(czw / dim) * dim + offz - czw) * riz
            dt = jnp.minimum(jnp.minimum(tmx, tmy), tmz)
            t_new = t + dt
            tau_new = tau - maj * dt
            collided = tau_new <= 0.0
            t_coll = t_new + tau_new / jnp.maximum(maj, 1e-20)
            escaped = t_coll >= far
            out_far = ~collided & (t_new >= far)

            coll_live = march & collided & ~escaped
            done = march & ((collided & escaped) | out_far)
            cont = march & ~collided & ~out_far

            t = jnp.where(
                march & collided, t_coll, jnp.where(march, t_new, t)
            )
            tau = jnp.where(march & ~collided, tau_new, tau)
            mip = jnp.where(
                march & ~collided, jnp.minimum(mip + 0.25, 3.0), mip
            )
            budget = jnp.where(march, budget - 1.0, budget)
            maj_out = jnp.where(coll_live, maj, maj_out)
            capped = cont & (budget <= 0.5)
            kind = jnp.where(
                coll_live,
                KIND_COLL,
                jnp.where(done | capped, KIND_DONE, kind),
            )
            march = cont & (budget > 0.5)
            return t, tau, mip, budget, march, kind, maj_out, k + 1

        def cond(carry):
            march, k = carry[4], carry[7]
            return jnp.any(march) & (k < steps_cap)

        t0 = rays[R_T:R_T + 1]
        tau0 = rays[R_TAU:R_TAU + 1]
        mip0 = rays[R_MIP:R_MIP + 1]
        budget0 = rays[R_BUDGET:R_BUDGET + 1]
        march0 = run & (budget0 > 0.5)
        kind0 = jnp.where(run & (budget0 <= 0.5), KIND_DONE, KIND_IDLE)
        t, tau, mip, budget, march, kind, maj_out, _ = jax.lax.while_loop(
            cond,
            body,
            (
                t0,
                tau0,
                mip0,
                budget0,
                march0,
                kind0,
                jnp.zeros((1, lanes), jnp.float32),
                jnp.int32(0),
            ),
        )
        out_ref[0, O_T:O_T + 1] = t
        out_ref[0, O_TAU:O_TAU + 1] = tau
        out_ref[0, O_MIP:O_MIP + 1] = mip
        out_ref[0, O_MAJ:O_MAJ + 1] = maj_out
        out_ref[0, O_KIND:O_KIND + 1] = kind
        out_ref[0, O_BUDGET:O_BUDGET + 1] = budget

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("groups", "offsets", "cyx", "cx", "steps_cap",
                     "interpret"),
)
def _pyr_march_call(
    table, rays, ext4, groups, offsets, cyx, cx, steps_cap, interpret
):
    nb, _, lanes = rays.shape
    kernel = _kernel_factory(groups, offsets, cyx, cx, steps_cap, lanes)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 16, lanes), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (table.shape[0], table.shape[1]),
                lambda b: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, lanes), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nb, 8, lanes), jnp.float32),
        interpret=bool(interpret),
    )(ext4.reshape(1, 4), rays, table)


def pyr_march(
    table,  # (R, 512) int8 — pack_premul_pyramid(maj_alpha, "int8")
    pyr_shape,  # static stacked-pyramid shape (4, bz, by, bx)
    extent,  # (3,) i32 volume extent x, y, z
    ipos, idir, ri,  # (n, 3) f32 index-space rays + caller's 1/idir
    t, tau, mip,  # (n,) f32 march state
    far,  # (n,) f32
    budget,  # (n,) f32 remaining per-lane iterations (exact small ints)
    running,  # (n,) bool
    steps_cap: int,
    interpret: bool | None = None,
):
    """March every running lane to its next collision candidate (or
    escape / budget exhaustion) inside one Pallas dispatch. Returns
    (t, tau, mip, majorant, kind, budget) per lane — see the O_* rows.
    Parked states are bit-equal to the XLA march chain."""
    from volxel_tpu.render.sampling import _compact_pyramid_dims

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dims, offsets = _compact_pyramid_dims(pyr_shape)
    cx = tuple(d[2] for d in dims)
    cyx = tuple(d[1] * d[2] for d in dims)
    groups = fetch_groups(dims, offsets, table.shape[0])

    n = t.shape[0]
    npad = -(-n // LANES) * LANES
    nb = npad // LANES

    def row(x):
        return jnp.zeros((npad,), jnp.float32).at[:n].set(
            x.astype(jnp.float32)
        )

    rows = jnp.stack(
        [
            row(ipos[:, 0]), row(ipos[:, 1]), row(ipos[:, 2]),
            row(idir[:, 0]), row(idir[:, 1]), row(idir[:, 2]),
            row(ri[:, 0]), row(ri[:, 1]), row(ri[:, 2]),
            row(t), row(tau), row(mip), row(far), row(budget),
            row(running), jnp.zeros((npad,), jnp.float32),
        ],
        axis=0,
    )  # (16, npad)
    rays = jnp.swapaxes(rows.reshape(16, nb, LANES), 0, 1)
    ext4 = jnp.concatenate(
        [extent.astype(jnp.int32), jnp.zeros((1,), jnp.int32)]
    )
    out = _pyr_march_call(
        table, rays, ext4, groups, tuple(offsets), cyx, cx,
        int(steps_cap) + 2, bool(interpret),
    )
    flat = jnp.moveaxis(out, 1, 0).reshape(8, npad)[:, :n]
    return (
        flat[O_T], flat[O_TAU], flat[O_MIP], flat[O_MAJ], flat[O_KIND],
        flat[O_BUDGET],
    )
