"""Volume traversal modes: DDA empty-space skipping, delta tracking, raymarch.

JAX re-designs of shaders/sampling/{dda,normal,raymarch}.glsl. The GL
originals are per-pixel divergent loops; here every function advances the
whole ray wavefront in lockstep under an active mask inside a
lax.while_loop (or a static fori for raymarch), exiting when every lane is
done. Mode selection is static (config -> specialized jit), the direct
analog of the reference's shader #define injection (viewer.ts:771-787).

All functions share the signature contract:
  sample_volume_*(grid, params, lut, origin, direction, state, active)
    -> (state, hit, t, rgb, Le_add)
  transmittance_*(grid, params, lut, origin, direction, state, active)
    -> (state, Tr)
with origin/direction in world space, state the per-ray RNG state, and
`active` masking rays that should not trace. Draw consumption is
REFERENCE-EXACT per lane (rng_where): inactive/box-missing lanes consume
nothing, and within the loops each draw happens exactly where the GLSL
performs it — collision iterations only, tau resets only on null
collisions, RR only under the threshold. tests/test_parity_oracle.py
pins this at the ulp level; do not add or move rng calls casually.

Loop caps: the reference caps transmittanceDDA at 100 steps (dda.glsl:18)
and leaves the others unbounded; unbounded loops don't exist on TPU, so the
others get generous static caps (config below) — an escape hatch that in
practice never binds before near_far.y is reached.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from volxel_tpu.render.rays import Rays, ray_box_intersection
from volxel_tpu.render.rng import rng_where
from volxel_tpu.render.sampling import (
    VolumeParams,
    lookup_density_stochastic,
    lookup_density_trilinear,
    lookup_majorant,
    lookup_majorant_premul,
    lookup_transfer,
    world_to_index_dir,
    world_to_index_point,
)

# static loop caps
DDA_SAMPLE_MAX_STEPS = 1024
DDA_TRANSMITTANCE_MAX_STEPS = 100  # dda.glsl:18
TRACKING_MAX_EVENTS = 512
RAYMARCH_STEPS = 64  # raymarch.glsl:6

# adaptive mip schedule (dda.glsl:6-8)
MIP_START = 3.0
MIP_SPEED_UP = 0.25
MIP_SPEED_DOWN = 2.0


def _to_index_space(params: VolumeParams, origin, direction):
    ipos = world_to_index_point(params, origin)
    idir = world_to_index_dir(params, direction)  # non-normalized, like the GL
    return ipos, idir


def _step_dda(pos, inv_dir, mip_i):
    """Axis-aligned brick DDA step at a mip level (dda.glsl:10-16)."""
    dim = (8 * (1 << mip_i)).astype(jnp.float32)[..., None]
    offs = jnp.where(inv_dir >= 0.0, dim + 0.5, -0.5)
    tmax = (jnp.floor(pos / dim) * dim + offs - pos) * inv_dir
    return jnp.min(tmax, axis=-1)


def _round_mip(mip):
    return jnp.clip(jnp.floor(mip + 0.5).astype(jnp.int32), 0, 3)


# ---------------------------------------------------------------------------
# DDA null-collision (default mode) — dda.glsl
# ---------------------------------------------------------------------------


def _majorant_alpha(lut, sample_range, norm_density, envelope: bool):
    """Alpha factor for the brick majorant.

    envelope=False: the reference's rule — transfer(max_density).alpha
    (dda.glsl:36). With a NON-monotone transfer alpha this can
    UNDERESTIMATE the true bound over the brick's densities, clipping the
    real-collision probability (measured ~26% bright on the benchmark
    ramp at 128^3, tests/test_parity_large.py).

    envelope=True (physical_majorant extension): prefix-max of the
    range-masked LUT alpha — a true upper bound of alpha(d) for every
    d <= max_density, restoring unbiasedness while keeping empty-space
    skipping (bins below sample_range still give 0).
    """
    if not envelope:
        return lookup_transfer(lut, sample_range, norm_density)[..., 3]
    k = lut.shape[0]
    edges = jnp.arange(k, dtype=jnp.float32) / k
    overlap = (edges + 1.0 / k > sample_range[0]) & (edges <= sample_range[1])
    env = jax.lax.cummax(jnp.where(overlap, lut[:, 3], 0.0))
    idx = jnp.clip(jnp.floor(norm_density * k).astype(jnp.int32), 0, k - 1)
    return jnp.where(norm_density < sample_range[0], 0.0, env[idx])


def build_premul_majorant(maj_mips, params, lut, majorant_envelope: bool = False):
    """Precompute the fully-scaled DDA step majorant over the whole stacked
    pyramid: vol_maj * transfer_alpha(density_scale * maj_mips * inv_maj).

    The DDA inner march then fetches the final per-step majorant with ONE
    gather (lookup_majorant_premul) instead of pyramid gather + LUT gather
    + three scalar multiplies per step. The per-element op SEQUENCE here is
    exactly the inline chain in _step_majorant (scale, normalize, LUT index
    + fetch, vol_maj multiply — all individually-rounded f32 ops with no
    mul+add pairs for XLA to contract), so gathered values are bit-equal to
    the inline computation and renders are BIT-IDENTICAL (pinned by
    tests/test_render.py::test_premul_majorant_bit_identity).

    Rebuilt whenever the transfer/settings change (~1M elementwise ops for
    512^3 — negligible against one frame).
    """
    maj_density = params.density_scale * maj_mips.astype(jnp.float32)
    return params.vol_maj * _majorant_alpha(
        lut, params.sample_range, maj_density * params.inv_maj, majorant_envelope
    )


def _step_majorant(grid, params, lut, curr, mip_i, envelope: bool):
    """Per-step scaled majorant for the DDA march: premultiplied single
    gather when grid.maj_alpha is present, else the inline two-gather chain
    (dda.glsl:36). The branch is static (pytree structure)."""
    if getattr(grid, "maj_alpha", None) is not None:
        return lookup_majorant_premul(grid, curr, mip_i)
    maj_density = lookup_majorant(grid, params, curr, mip_i)
    return params.vol_maj * _majorant_alpha(
        lut, params.sample_range, maj_density * params.inv_maj, envelope
    )


# compacted decode engages at real wavefront widths only (matches
# pathtrace.COMPACT_MIN_LANES); below it the plain full-width decode keeps
# small renders single-program and exactly reproducible across shardings.
# 6144 = strictly above the largest bit-pinned test render (64^2 = 4096
# lanes) and below the smallest production chunk size (8100).
COMPACT_DECODE_MIN_LANES = 6144


def _ladder_rungs(n: int, factor: int = 4) -> list[int]:
    """Static stage widths for the in-loop shrink ladder: n, n/factor,
    n/factor^2... down to ~256 lanes (below that the while_loop's fixed
    per-iteration cost dominates any width saving). factor 2 halves the
    dead-width slack per stage at the cost of more (lazily-sorted)
    transitions (RenderConfig.ladder_factor)."""
    rungs = [n]
    while rungs[-1] // factor >= 256:
        rungs.append(rungs[-1] // factor)
    return rungs


# finest compaction rung divisor (width floor n/COMPACT_FINEST): trace-time
# default shared by every cond-ladder compaction site (decode, secondary
# traversal, env) when no finest is threaded in. The r9 chip A/B measured
# rung depth a WASH (examples/ab_rungs.py — the march ladder narrows the
# wavefront first), so this stays at r6's 8; RenderConfig.compact_finest
# overrides per render.
COMPACT_FINEST = 8


def _compact_widths(
    n: int, finest: int | None = None, floor: int = 256
) -> list[int]:
    """Increasing cond-ladder widths n//finest, ..., n//2 (each >= floor;
    the full width n is the caller's fallback rung). r6 shipped a fixed
    n/8 floor; the r8 decode-set probe measured per-iteration live
    fractions around 4%, and the r9 march-kernel probe showed gather cost
    ~6.5 ns/lane/element at any width — so an n/8 floor leaves 3-6x dead
    width on the table whenever the live count sits below it."""
    widths = []
    d = COMPACT_FINEST if finest is None else finest
    while d >= 2:
        w = n // d
        if w >= floor and (not widths or w > widths[-1]):
            widths.append(w)
        d //= 2
    return widths


def _width_ladder(cnt, widths, case_at, full_case, operand):
    """Nested runtime lax.cond picking the NARROWEST rung admitting all
    `cnt` live lanes: generalizes the hand-rolled /8 /4 /2 nests to the
    _compact_widths rungs. case_at(width) -> fn(operand); full_case runs
    the uncompacted width."""

    def build(i):
        if i == len(widths):
            return full_case
        return lambda op: jax.lax.cond(
            cnt <= widths[i], case_at(widths[i]), build(i + 1), op
        )

    return build(0)(operand)


def _cumsum_mxu(x):
    """Inclusive cumsum of a 1D f32 vector of exact integers (< 2^24) as
    triangular MXU dots: reshape (m, 128), one (128, 128) upper-triangular
    dot for within-row prefixes, recurse on the m row totals. XLA TPU
    lowers jnp.cumsum as a serialized scan (~14.5 ns/element — 1.9 ms at
    131k lanes, NOTES r5 profile); the dot form is a handful of MXU
    passes. Exact: inputs and the 0/1 triangle are combined at
    precision=HIGHEST (f32-exact products), accumulation is f32, and
    every partial sum stays an integer < 2^24."""
    n = x.shape[0]
    if n <= 256:
        return jnp.cumsum(x)
    pad = (-n) % 128
    xp = jnp.pad(x, (0, pad)).reshape(-1, 128)
    tri = (
        jnp.arange(128, dtype=jnp.int32)[:, None]
        <= jnp.arange(128, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)
    pre = jnp.dot(xp, tri, precision=jax.lax.Precision.HIGHEST)
    rows = pre[:, -1]
    offs = _cumsum_mxu(rows) - rows  # exclusive row offsets
    return (pre + offs[:, None]).reshape(-1)[:n]


def _partition_perm(mask):
    """(order, inv) of the stable mask-first partition — the IDENTICAL
    permutation to order = argsort(~mask, stable), inv = argsort(order),
    built from ONE cumsum + one scatter instead of two sorts (XLA TPU
    sorts cost ~2.9 ms/131k lanes vs cumsum 1.9 — NOTES r5 profile;
    every compaction site pays this every engagement). Above 1024 lanes
    the cumsum itself rides the MXU (_cumsum_mxu — bit-exact, integer
    math)."""
    n = mask.shape[0]
    if n > 1024:
        c = _cumsum_mxu(mask.astype(jnp.float32)).astype(jnp.int32)
    else:
        c = jnp.cumsum(mask.astype(jnp.int32))
    iota = jnp.arange(n, dtype=jnp.int32)
    inv = jnp.where(mask, c - 1, c[-1] + iota - c)
    order = jnp.zeros((n,), jnp.int32).at[inv].set(iota, unique_indices=True)
    return order, inv


def _inverse_perm(perm):
    """Inverse permutation by scatter — cheaper than argsort(perm)."""
    n = perm.shape[0]
    return (
        jnp.zeros((n,), jnp.int32)
        .at[perm]
        .set(jnp.arange(n, dtype=jnp.int32), unique_indices=True)
    )


def _decode_rgba(grid, params, lut, pos):
    """Collision-point density decode: trilinear + transfer LUT (the
    9-gather chain of dda.glsl:81-83)."""
    return lookup_transfer(
        lut,
        params.sample_range,
        lookup_density_trilinear(grid, params, pos) * params.inv_maj,
        mxu=getattr(grid, "lut_mxu", None),
    )


def _compact_decode_rgba(
    grid, params, lut, pos, live, spatial: bool = False,
    finest: int | None = None,
):
    """_decode_rgba evaluated only (approximately) for `live` lanes.

    XLA TPU lowers the per-lane volume gathers to serialized ~27-50
    ns/element accesses (NOTES.md r5 real profile), so decode cost is
    proportional to WIDTH, not work masked: sorting live lanes to a
    prefix and decoding at the narrowest sufficient width (the
    _compact_widths rungs — runtime lax.cond ladder) makes the
    per-iteration collision
    decode cost track the collided fraction instead of the wavefront
    width. Iterations with no collisions skip everything (one
    any-reduce).

    Contract (same class as RenderConfig.tile_chunks): per-lane values
    are a pure function of the lane's own inputs, but XLA's fused
    codegen rounds transcendentals position-dependently at the ulp
    level, so a lane decoded at a different width/position may differ by
    an ulp — same estimator, possibly a different equally-valid
    realization. Exact bitwise reproducibility across shard geometries
    is only guaranteed with compact_decode off.
    """
    n = live.shape[0]
    if n < COMPACT_DECODE_MIN_LANES:
        return _decode_rgba(grid, params, lut, pos)

    def no_collisions(_):
        return jnp.zeros((n, 4), jnp.float32)

    def compacted(_):
        if spatial:
            # order live lanes by their base tap's z-major voxel index:
            # the serialized gather is a latency-bound pointer chase
            # whose per-element cost drops with index locality (NOTES r5
            # profile), and memory-order taps walk the dense field
            # near-sequentially. Dead lanes sort to the suffix (key
            # 2^30 > any voxel index). Same width ladder + ulp
            # realization contract as the liveness-only key.
            base = jnp.clip(
                jnp.floor(pos - 0.5).astype(jnp.int32), 0, grid.extent - 1
            )
            flat = (
                base[..., 2] * grid.extent[1] + base[..., 1]
            ) * grid.extent[0] + base[..., 0]
            key = jnp.where(live, flat, jnp.int32(1 << 30))
            order = jnp.argsort(key, stable=True)
        else:
            order, _ = _partition_perm(live)  # live lanes first
        cnt = jnp.sum(live)

        # prefix gather + prefix scatter, NOT full permutes: the old form
        # paid pos[order] (3n elements) + rgba_p[inv] (4n) serialized
        # accesses EVERY collision iteration to decode a width-w prefix;
        # gathering pos only for order[:width] and scattering the decoded
        # rgba back through the same prefix costs 7*width instead of
        # 6n + 7*width (r9; examples/ab_scatterdec.py). Live lanes receive
        # bit-identical values either way; dead lanes now hold 0 instead
        # of decoded garbage — every consumer masks by `live`.
        def decode_at(width):
            def f(_):
                sel = order[:width]
                rgba_w = _decode_rgba(grid, params, lut, pos[sel])
                return jnp.zeros((n, 4), jnp.float32).at[sel].set(
                    rgba_w, unique_indices=True
                )

            return f

        return _width_ladder(
            cnt, _compact_widths(n, finest), decode_at, decode_at(n), 0
        )

    return jax.lax.cond(jnp.any(live), compacted, no_collisions, 0)


def sample_volume_dda(
    grid, params, lut, origin, direction, state, active,
    majorant_envelope: bool = False, with_stats: bool = False,
    compact_phase2: bool = False, inner_unroll: int = 1,
):
    """Two-phase DDA distance sampling (dda.glsl:65-98).

    inner_unroll runs that many march steps per phase-1 while_loop
    iteration — the march consumes no RNG and every update is masked, so
    the per-lane trajectories are bit-identical for any unroll (the step
    guard `it < cap` and the any(march) iteration count reproduce the
    rolled loop's exit behavior exactly); it trades (inner_unroll - 1)
    wasted masked sub-steps at round boundaries for that fraction of the
    while_loop's per-iteration dispatch overhead.

    compact_phase2 routes the phase-2 collision decode through
    _compact_decode_rgba (decode only the parked lanes, at the narrowest
    sufficient width) instead of the full wavefront width — the parked
    fraction per outer round is typically small, and XLA TPU serializes
    gathers per element, so the decode is the dominant outer-round cost
    (NOTES.md r5 real profile). Same values for consumed lanes
    (_compact_decode_rgba contract: bit-equal below
    COMPACT_DECODE_MIN_LANES, ulp-level above).

    TPU restructure of the per-pixel loop: the GLSL evaluates the
    expensive trilinear+LUT density decode only on collision iterations,
    but a naive lockstep port pays it every step for every lane (9 of the
    11 gathers per iteration). Here phase 1 (inner while_loop) marches
    lanes with the cheap majorant/step work only (2 gathers/step),
    parking lanes at their collision points; phase 2 (outer loop body)
    decodes density and consumes the real/null draws for ALL parked
    lanes at once. Per-lane op and RNG-draw sequences are unchanged —
    renders are BIT-IDENTICAL to the single-loop form (the per-lane
    stream only depends on that lane's own state), and ~2x faster at
    benchmark scale (NOTES.md round 3b A/B: 0.105 vs 0.198 ms/sample).
    """
    hit_box, near, far = ray_box_intersection(
        Rays(origin, direction), params.aabb_lo, params.aabb_hi
    )
    ipos, idir = _to_index_space(params, origin, direction)
    ri = 1.0 / idir

    # GLSL consumes the tau draw after the box test (dda.glsl:76-77):
    # box-missing / inactive lanes consume nothing
    state, xi = rng_where(active & hit_box, state)
    t0 = near + 1e-6
    tau0 = -jnp.log(1.0 - xi)
    running0 = active & hit_box & (t0 < far)

    n = origin.shape[0]
    zf = jnp.zeros((n,), jnp.float32)
    init = (
        state,
        t0,
        tau0,
        jnp.full((n,), MIP_START, jnp.float32),
        running0,
        jnp.zeros((n,), jnp.bool_),  # hit
        jnp.ones((n, 3), jnp.float32),  # rgb at collision
        jnp.int32(0),  # scalar iteration counter (the loop cap)
        jnp.zeros((n,), jnp.bool_),  # pending collision (parked lane)
        zf,  # majorant saved at the collision step
    )
    if with_stats:
        init = init + (jnp.zeros((n,), jnp.int32),)  # per-lane step counts

    def outer_cond(carry):
        running, it = carry[4], carry[7]
        return jnp.any(running) & (it < DDA_SAMPLE_MAX_STEPS)

    def outer_body(carry):
        if with_stats:
            (state, t, tau, mip, running, hit, rgb_out, it, pending, maj_s, steps) = carry
        else:
            (state, t, tau, mip, running, hit, rgb_out, it, pending, maj_s) = carry
            steps = None

        # ---- phase 1: march lanes without a parked collision ----
        def inner_cond(c):
            running, it, pending = c[3], c[4], c[5]
            return jnp.any(running & ~pending) & (it < DDA_SAMPLE_MAX_STEPS)

        def inner_step(c):
            if with_stats:
                t, tau, mip, running, it, pending, maj_s, steps = c
            else:
                t, tau, mip, running, it, pending, maj_s = c
            # the it-cap guard + any(march) increment make unrolled
            # sub-steps exact no-ops once the rolled loop would have
            # exited (bit-identical for any inner_unroll)
            march = running & ~pending & (it < DDA_SAMPLE_MAX_STEPS)
            mip_i = _round_mip(mip)
            curr = ipos + t[..., None] * idir
            majorant = _step_majorant(
                grid, params, lut, curr, mip_i, majorant_envelope
            )
            dt = _step_dda(curr, ri, mip_i)
            t_new = t + dt
            tau_new = tau - majorant * dt
            collided = tau_new <= 0.0
            # step back to the collision point
            t_coll = t_new + tau_new / jnp.maximum(majorant, 1e-20)
            escaped = t_coll >= far

            coll = march & collided
            esc_c = coll & escaped  # escape at the collision: no draws
            new_pending = coll & ~escaped
            out_far = march & ~collided & (t_new >= far)
            t = jnp.where(coll, t_coll, jnp.where(march, t_new, t))
            tau = jnp.where(march & ~collided, tau_new, tau)
            mip = jnp.where(
                march & ~collided, jnp.minimum(mip + MIP_SPEED_UP, 3.0), mip
            )
            maj_s = jnp.where(new_pending, majorant, maj_s)
            pending = pending | new_pending
            running = running & ~esc_c & ~out_far
            out = (t, tau, mip, running, it + jnp.any(march).astype(jnp.int32), pending, maj_s)
            if with_stats:
                # identical per-lane counts to the single-loop form: each
                # march iteration was one body iteration there
                return out + (steps + march.astype(jnp.int32),)
            return out

        def inner_body(c):
            for _ in range(inner_unroll):
                c = inner_step(c)
            return c

        inner_init = (t, tau, mip, running, it, pending, maj_s)
        if with_stats:
            inner_init = inner_init + (steps,)
        inner_out = jax.lax.while_loop(inner_cond, inner_body, inner_init)
        t, tau, mip, running, it, pending, maj_s = inner_out[:7]
        if with_stats:
            steps = inner_out[7]

        # ---- phase 2: decode density + draws for all parked lanes ----
        live = running & pending
        if compact_phase2:
            rgba = _compact_decode_rgba(
                grid, params, lut, ipos + t[..., None] * idir, live
            )
        else:
            rgba = lookup_transfer(
                lut,
                params.sample_range,
                lookup_density_trilinear(grid, params, ipos + t[..., None] * idir)
                * params.inv_maj,
                mxu=getattr(grid, "lut_mxu", None),
            )
        d = params.vol_maj * rgba[..., 3]
        # GLSL draw protocol (dda.glsl:81-96): the real/null draw happens
        # only on non-escaped collision iterations; the tau reset only on
        # NULL collisions (a real collision returns before it). Masked
        # consumption keeps per-lane streams identical to the reference
        # (and independent of wavefront iteration count / sharding).
        state, xi1 = rng_where(live, state)
        real = xi1 * maj_s < d
        state, xi2 = rng_where(live & ~real, state)
        tau = jnp.where(live & ~real, -jnp.log(1.0 - xi2), tau)
        mip = jnp.where(live & ~real, jnp.maximum(0.0, mip - MIP_SPEED_DOWN), mip)
        new_hit = live & real
        rgb_out = jnp.where(new_hit[..., None], rgba[..., :3], rgb_out)
        hit = hit | new_hit
        running = running & ~new_hit
        pending = jnp.zeros_like(pending)
        out = (state, t, tau, mip, running, hit, rgb_out, it, pending, maj_s)
        if with_stats:
            return out + (steps,)
        return out

    final = jax.lax.while_loop(outer_cond, outer_body, init)
    state, t, hit, rgb = final[0], final[1], final[5], final[6]
    le_add = jnp.zeros((n, 3), jnp.float32)  # emission stub (common.glsl:87-88)
    if with_stats:
        return state, hit, t, rgb, le_add, final[10]
    return state, hit, t, rgb, le_add


def _sample_compact_loop(
    grid, params, lut, ipos, idir, far, next_w, majorant_envelope, with_stats,
    spatial=False, finest=None,
):
    """cond/body for sample_volume_dda_compact's march while_loop at one
    width. next_w (a narrower ladder rung) adds the shrink-ladder handoff
    exit: leave the loop once the running count fits the next rung."""
    ri = 1.0 / idir

    def cond(carry):
        running, it = carry[4], carry[7]
        ok = jnp.any(running) & (it < DDA_SAMPLE_MAX_STEPS)
        if next_w is not None:
            ok = ok & (jnp.sum(running) > next_w)
        return ok

    def body(carry):
        if with_stats:
            (state, t, tau, mip, running, hit, rgb_out, it, steps) = carry
        else:
            (state, t, tau, mip, running, hit, rgb_out, it) = carry
            steps = None

        mip_i = _round_mip(mip)
        curr = ipos + t[..., None] * idir
        majorant = _step_majorant(grid, params, lut, curr, mip_i, majorant_envelope)
        dt = _step_dda(curr, ri, mip_i)
        t_new = t + dt
        tau_new = tau - majorant * dt
        collided = tau_new <= 0.0
        t_coll = t_new + tau_new / jnp.maximum(majorant, 1e-20)
        escaped = t_coll >= far

        coll = running & collided
        esc_c = coll & escaped  # escape at the collision: no draws
        live = coll & ~escaped
        out_far = running & ~collided & (t_new >= far)
        t = jnp.where(coll, t_coll, jnp.where(running, t_new, t))
        tau = jnp.where(running & ~collided, tau_new, tau)
        mip = jnp.where(
            running & ~collided, jnp.minimum(mip + MIP_SPEED_UP, 3.0), mip
        )

        # collision decode, compacted to the collided lanes
        rgba = _compact_decode_rgba(
            grid, params, lut, ipos + t[..., None] * idir, live, spatial,
            finest,
        )
        d = params.vol_maj * rgba[..., 3]
        state, xi1 = rng_where(live, state)
        real = xi1 * majorant < d
        state, xi2 = rng_where(live & ~real, state)
        tau = jnp.where(live & ~real, -jnp.log(1.0 - xi2), tau)
        mip = jnp.where(live & ~real, jnp.maximum(0.0, mip - MIP_SPEED_DOWN), mip)
        new_hit = live & real
        rgb_out = jnp.where(new_hit[..., None], rgba[..., :3], rgb_out)
        hit = hit | new_hit
        running = running & ~new_hit & ~esc_c & ~out_far
        out = (state, t, tau, mip, running, hit, rgb_out, it + 1)
        if with_stats:
            # every body iteration is one marching step for running lanes
            # (the pre-update running mask, matching the two-phase count)
            return out + (steps + carry[4].astype(jnp.int32),)
        return out

    return cond, body


def sample_volume_dda_compact(
    grid, params, lut, origin, direction, state, active,
    majorant_envelope: bool = False, with_stats: bool = False,
    ladder: bool = False, spatial_decode: bool = False,
    finest: int | None = None,
):
    """Single-loop DDA distance sampling with a COMPACTED collision decode.

    Same per-lane op + RNG-draw protocol as sample_volume_dda (every draw
    consumed exactly where dda.glsl:65-98 consumes it), structured for the
    real TPU cost model (NOTES.md r5): serialized gathers make decode cost
    proportional to width, and the two-phase loop's park-and-wait makes
    every parked lane wait for the chunk's slowest marcher each round
    (sum_k max_l steps_k >= max_l sum_k steps). Here every running lane
    marches every iteration (iterations = the chunk's max TOTAL path
    length) and the expensive 9-gather collision decode runs compacted to
    the collided lanes via _compact_decode_rgba. Realization contract:
    see _compact_decode_rgba (ulp-level, same estimator).

    ladder=True additionally narrows the WHOLE march as lanes terminate
    (in-loop shrink ladder): the while_loop exits whenever the running
    count fits the next rung (n/4, n/16, ... — _ladder_rungs), running
    lanes are stable-sorted to a prefix, and the march continues at that
    width. Camera wavefronts run ~10-18% occupied while the chunk's
    slowest lane marches ~100 iterations (examples/steps_decay.py), and
    serialized gathers price every iteration by WIDTH — full width pays
    ~9x the useful gather-lane-slots. Per-lane op + draw sequences are
    unchanged (masked draws are pure functions of lane state); engages at
    COMPACT_DECODE_MIN_LANES with the same ulp realization contract.
    """
    hit_box, near, far = ray_box_intersection(
        Rays(origin, direction), params.aabb_lo, params.aabb_hi
    )
    ipos, idir = _to_index_space(params, origin, direction)

    state, xi = rng_where(active & hit_box, state)
    t0 = near + 1e-6
    tau0 = -jnp.log(1.0 - xi)
    running0 = active & hit_box & (t0 < far)

    n = origin.shape[0]
    rungs = _ladder_rungs(n, int(ladder) if ladder and ladder is not True else 4)
    use_ladder = (
        ladder and not with_stats
        and n >= COMPACT_DECODE_MIN_LANES and len(rungs) > 1
    )
    if not use_ladder:
        cond, body = _sample_compact_loop(
            grid, params, lut, ipos, idir, far, None, majorant_envelope,
            with_stats, spatial_decode, finest,
        )
        init = (
            state,
            t0,
            tau0,
            jnp.full((n,), MIP_START, jnp.float32),
            running0,
            jnp.zeros((n,), jnp.bool_),  # hit
            jnp.ones((n, 3), jnp.float32),  # rgb at collision
            jnp.int32(0),
        )
        if with_stats:
            init = init + (jnp.zeros((n,), jnp.int32),)
        final = jax.lax.while_loop(cond, body, init)
        state, t, hit, rgb = final[0], final[1], final[5], final[6]
        le_add = jnp.zeros((n, 3), jnp.float32)
        if with_stats:
            return state, hit, t, rgb, le_add, final[8]
        return state, hit, t, rgb, le_add

    # ---- in-loop shrink ladder ----
    # Stage s runs the march at width rungs[s] until the running count
    # fits rungs[s+1]; a lax.cond-guarded stable sort then packs running
    # lanes to a prefix (finished lanes hand their outputs to `suffixes`)
    # and the march continues narrower. Columns are packed into one f32
    # matrix so each transition costs one argsort + 4 row-gathers, not 19
    # scalar-column gathers (serialized-gather cost model).
    idx = jnp.arange(n, dtype=jnp.int32)
    t, tau = t0, tau0
    mip = jnp.full((n,), MIP_START, jnp.float32)
    running = running0
    hit = jnp.zeros((n,), jnp.bool_)
    rgb = jnp.ones((n, 3), jnp.float32)
    it = jnp.int32(0)
    ip, idr, fr = ipos, idir, far
    suffixes: list = []  # per-transition (idx, state, t, hit, rgb)
    any_sorted = jnp.zeros((), jnp.bool_)
    for si, w in enumerate(rungs):
        next_w = rungs[si + 1] if si + 1 < len(rungs) else None
        cond, body = _sample_compact_loop(
            grid, params, lut, ip, idr, fr, next_w, majorant_envelope, False,
            spatial_decode, finest,
        )
        state, t, tau, mip, running, hit, rgb, it = jax.lax.while_loop(
            cond, body, (state, t, tau, mip, running, hit, rgb, it)
        )
        if next_w is None:
            break
        # sort only when a running lane lies OUTSIDE the kept prefix —
        # after a previous sort (or a lucky layout) survivors are often
        # already packed, and the argsort + permute gathers can be
        # skipped entirely (the slice alone is the transition)
        needs_sort = jnp.any(running[next_w:])
        any_sorted = any_sorted | needs_sort
        fpack = jnp.concatenate(
            [t[:, None], tau[:, None], mip[:, None], rgb, ip, idr,
             fr[:, None]],
            axis=1,
        )  # (w, 13): t, tau, mip, rgb[3], ipos[3], idir[3], far
        bpack = jnp.stack([running, hit], axis=1)

        def _sorted(_, running=running, state=state, fpack=fpack,
                    bpack=bpack, idx=idx):
            order, _ = _partition_perm(running)  # running first
            return state[order], fpack[order], bpack[order], idx[order]

        def _unsorted(_, state=state, fpack=fpack, bpack=bpack, idx=idx):
            return state, fpack, bpack, idx

        state, fpack, bpack, idx = jax.lax.cond(needs_sort, _sorted, _unsorted, 0)
        # the suffix holds only finished lanes (count(running) <= next_w,
        # or the cap exited the whole march — then their current values
        # ARE final); record their outputs
        suffixes.append((
            idx[next_w:], state[next_w:], fpack[next_w:, 0],
            bpack[next_w:, 1], fpack[next_w:, 3:6],
        ))
        state, idx = state[:next_w], idx[:next_w]
        t, tau, mip = fpack[:next_w, 0], fpack[:next_w, 1], fpack[:next_w, 2]
        rgb = fpack[:next_w, 3:6]
        ip, idr = fpack[:next_w, 6:9], fpack[:next_w, 9:12]
        fr = fpack[:next_w, 12]
        running, hit = bpack[:next_w, 0], bpack[:next_w, 1]

    # reassemble original lane order. Concatenating [final prefix,
    # suffixes newest-first] makes the never-sorted layout exactly the
    # identity permutation, so empty chunks skip the unsort gathers.
    idx_all = jnp.concatenate([idx] + [s[0] for s in reversed(suffixes)])
    state_all = jnp.concatenate([state] + [s[1] for s in reversed(suffixes)])
    opack = jnp.concatenate(
        [jnp.concatenate(
            [t[:, None], rgb, hit[:, None].astype(jnp.float32)], axis=1)]
        + [jnp.concatenate(
            [s[2][:, None], s[4], s[3][:, None].astype(jnp.float32)], axis=1)
           for s in reversed(suffixes)]
    )  # (n, 5): t, rgb[3], hit

    def _unsort(_):
        inv = _inverse_perm(idx_all)
        return state_all[inv], opack[inv]

    def _keep(_):
        return state_all, opack

    state, opack = jax.lax.cond(any_sorted, _unsort, _keep, 0)
    le_add = jnp.zeros((n, 3), jnp.float32)
    return state, opack[:, 4] > 0.5, opack[:, 0], opack[:, 1:4], le_add


def sample_volume_dda_pyr(
    grid, params, lut, origin, direction, state, active,
    majorant_envelope: bool = False, spatial_decode: bool = False,
    finest: int | None = None,
):
    """DDA distance sampling with the march INSIDE a Pallas kernel
    (render.pyrmarch): the premul majorant pyramid stays VMEM-resident
    and each lane marches to its next collision candidate at in-kernel
    fetch cost (~6.9 ns/lane-step vs XLA's flat ~14.6 ns serialized
    gather — NOTES.md rounds 9/13), parking there. This outer loop then
    runs per COLLISION round — decode + draws for the parked lanes,
    exactly the op/draw chain of _sample_compact_loop's collision arm —
    and re-enters the kernel. Per-lane op + RNG-draw sequences are
    UNCHANGED (kernel steps are bit-equal to the XLA march; draws are
    per-lane state functions), so renders are bit-identical to
    sample_volume_dda below COMPACT_DECODE_MIN_LANES and carry the same
    compacted-decode ulp realization contract above it. Per-lane step
    budgets reproduce the global DDA_SAMPLE_MAX_STEPS cap exactly
    (every running lane participates in every iteration of the
    single-loop form, so personal and global counts coincide).

    Requires grid.maj_pyr (+ maj_alpha for shape/decode); the caller
    gates on that (pathtrace._pyr_engaged). No shrink ladder: blocks of
    pyrmarch.LANES exit the in-kernel loop as soon as their own lanes
    park, a finer-grained width adaptation than the global rungs.
    """
    from volxel_tpu.render.pyrmarch import KIND_COLL, KIND_DONE, pyr_march

    hit_box, near, far = ray_box_intersection(
        Rays(origin, direction), params.aabb_lo, params.aabb_hi
    )
    ipos, idir = _to_index_space(params, origin, direction)
    ri = 1.0 / idir

    state, xi = rng_where(active & hit_box, state)
    t0 = near + 1e-6
    tau0 = -jnp.log(1.0 - xi)
    running0 = active & hit_box & (t0 < far)

    n = origin.shape[0]
    pyr_shape = tuple(grid.maj_alpha.shape)

    def cond(carry):
        return jnp.any(carry[4])

    def body(carry):
        state, t, tau, mip, running, hit, rgb_out, budget = carry
        t, tau, mip, maj, kind, budget = pyr_march(
            grid.maj_pyr, pyr_shape, grid.extent, ipos, idir, ri,
            t, tau, mip, far, budget, running, DDA_SAMPLE_MAX_STEPS,
        )
        coll_live = running & (jnp.abs(kind - KIND_COLL) < 0.5)
        done = running & (jnp.abs(kind - KIND_DONE) < 0.5)

        rgba = _compact_decode_rgba(
            grid, params, lut, ipos + t[..., None] * idir, coll_live,
            spatial_decode, finest,
        )
        d = params.vol_maj * rgba[..., 3]
        state, xi1 = rng_where(coll_live, state)
        real = xi1 * maj < d
        state, xi2 = rng_where(coll_live & ~real, state)
        tau = jnp.where(coll_live & ~real, -jnp.log(1.0 - xi2), tau)
        mip = jnp.where(
            coll_live & ~real, jnp.maximum(0.0, mip - MIP_SPEED_DOWN), mip
        )
        new_hit = coll_live & real
        rgb_out = jnp.where(new_hit[..., None], rgba[..., :3], rgb_out)
        hit = hit | new_hit
        running = running & ~new_hit & ~done
        return (state, t, tau, mip, running, hit, rgb_out, budget)

    init = (
        state,
        t0,
        tau0,
        jnp.full((n,), MIP_START, jnp.float32),
        running0,
        jnp.zeros((n,), jnp.bool_),
        jnp.ones((n, 3), jnp.float32),
        jnp.full((n,), DDA_SAMPLE_MAX_STEPS, jnp.float32),
    )
    final = jax.lax.while_loop(cond, body, init)
    state, t, hit, rgb = final[0], final[1], final[5], final[6]
    return state, hit, t, rgb, jnp.zeros((n, 3), jnp.float32)


def transmittance_dda_pyr(
    grid, params, lut, origin, direction, state, active,
    physical: bool = False, majorant_envelope: bool = False,
    spatial_decode: bool = False, finest: int | None = None,
):
    """transmittance_dda_compact with the march in-kernel — the
    sample_volume_dda_pyr structure applied to the ratio-tracking
    shadow/camera transmittance loop (dda.glsl:21-62 draw protocol:
    real collisions keep marching with a redrawn tau; RR under 0.1)."""
    from volxel_tpu.render.pyrmarch import KIND_COLL, KIND_DONE, pyr_march

    hit_box, near, far = ray_box_intersection(
        Rays(origin, direction), params.aabb_lo, params.aabb_hi
    )
    ipos, idir = _to_index_space(params, origin, direction)
    ri = 1.0 / idir

    state, xi = rng_where(active & hit_box, state)
    t0 = near + 1e-6
    tau0 = -jnp.log(1.0 - xi)
    running0 = active & hit_box & (t0 < far)

    n = origin.shape[0]
    pyr_shape = tuple(grid.maj_alpha.shape)

    def cond(carry):
        return jnp.any(carry[4])

    def body(carry):
        state, t, tau, mip, running, tr, budget = carry
        t, tau, mip, maj, kind, budget = pyr_march(
            grid.maj_pyr, pyr_shape, grid.extent, ipos, idir, ri,
            t, tau, mip, far, budget, running,
            DDA_TRANSMITTANCE_MAX_STEPS,
        )
        check = running & (jnp.abs(kind - KIND_COLL) < 0.5)
        done = running & (jnp.abs(kind - KIND_DONE) < 0.5)

        rgba = _compact_decode_rgba(
            grid, params, lut, ipos + t[..., None] * idir, check,
            spatial_decode, finest,
        )
        d = params.vol_maj * rgba[..., 3]
        state, xi1 = rng_where(check, state)
        real = xi1 * maj < d

        if physical:
            ratio = jnp.maximum(0.0, 1.0 - d / jnp.maximum(maj, 1e-20))
        else:
            ratio = jnp.maximum(
                0.0, 1.0 - params.vol_maj / jnp.maximum(maj, 1e-20)
            )
        tr_new = jnp.where(check & real, tr * ratio, tr)
        rr_active = check & real & (tr_new < 0.1)
        state, xi_rr = rng_where(rr_active, state)
        killed = rr_active & (xi_rr < (1.0 - tr_new))
        tr_new = jnp.where(
            rr_active & ~killed, tr_new / jnp.maximum(tr_new, 1e-20), tr_new
        )
        tr = jnp.where(killed, 0.0, tr_new)

        state, xi2 = rng_where(check & ~killed, state)
        tau = jnp.where(check, -jnp.log(1.0 - xi2), tau)
        mip = jnp.where(check, jnp.maximum(0.0, mip - MIP_SPEED_DOWN), mip)
        running = running & ~killed & ~done
        return (state, t, tau, mip, running, tr, budget)

    init = (
        state,
        t0,
        tau0,
        jnp.full((n,), MIP_START, jnp.float32),
        running0,
        jnp.ones((n,), jnp.float32),
        jnp.full((n,), DDA_TRANSMITTANCE_MAX_STEPS, jnp.float32),
    )
    final = jax.lax.while_loop(cond, body, init)
    return final[0], final[5]


def _transmittance_compact_loop(
    grid, params, lut, ipos, idir, far, next_w, physical,
    majorant_envelope, with_stats, spatial=False, finest=None,
):
    """cond/body for transmittance_dda_compact's while_loop at one width
    (next_w: shrink-ladder handoff exit, as in _sample_compact_loop)."""
    ri = 1.0 / idir

    def cond(carry):
        running, it = carry[4], carry[6]
        ok = jnp.any(running) & (it < DDA_TRANSMITTANCE_MAX_STEPS)
        if next_w is not None:
            ok = ok & (jnp.sum(running) > next_w)
        return ok

    def body(carry):
        if with_stats:
            (state, t, tau, mip, running, tr, it, steps) = carry
        else:
            (state, t, tau, mip, running, tr, it) = carry
            steps = None

        mip_i = _round_mip(mip)
        curr = ipos + t[..., None] * idir
        majorant = _step_majorant(grid, params, lut, curr, mip_i, majorant_envelope)
        dt = _step_dda(curr, ri, mip_i)
        t_new = t + dt
        tau_new = tau - majorant * dt
        collided = tau_new <= 0.0
        t_coll = t_new + tau_new / jnp.maximum(majorant, 1e-20)
        escaped = t_coll >= far

        coll = running & collided
        esc_c = coll & escaped
        check = coll & ~escaped
        out_far = running & ~collided & (t_new >= far)
        t = jnp.where(coll, t_coll, jnp.where(running, t_new, t))
        tau = jnp.where(running & ~collided, tau_new, tau)
        mip = jnp.where(
            running & ~collided, jnp.minimum(mip + MIP_SPEED_UP, 3.0), mip
        )

        rgba = _compact_decode_rgba(
            grid, params, lut, ipos + t[..., None] * idir, check, spatial,
            finest,
        )
        d = params.vol_maj * rgba[..., 3]
        state, xi1 = rng_where(check, state)
        real = xi1 * majorant < d

        if physical:
            ratio = jnp.maximum(0.0, 1.0 - d / jnp.maximum(majorant, 1e-20))
        else:
            ratio = jnp.maximum(
                0.0, 1.0 - params.vol_maj / jnp.maximum(majorant, 1e-20)
            )
        tr_new = jnp.where(check & real, tr * ratio, tr)
        rr_active = check & real & (tr_new < 0.1)
        state, xi_rr = rng_where(rr_active, state)
        killed = rr_active & (xi_rr < (1.0 - tr_new))
        tr_new = jnp.where(
            rr_active & ~killed, tr_new / jnp.maximum(tr_new, 1e-20), tr_new
        )
        tr = jnp.where(killed, 0.0, tr_new)

        state, xi2 = rng_where(check & ~killed, state)
        tau = jnp.where(check, -jnp.log(1.0 - xi2), tau)
        mip = jnp.where(check, jnp.maximum(0.0, mip - MIP_SPEED_DOWN), mip)
        running = running & ~killed & ~esc_c & ~out_far
        out = (state, t, tau, mip, running, tr, it + 1)
        if with_stats:
            return out + (steps + carry[4].astype(jnp.int32),)
        return out

    return cond, body


def transmittance_dda_compact(
    grid,
    params,
    lut,
    origin,
    direction,
    state,
    active,
    physical: bool = False,
    majorant_envelope: bool = False,
    with_stats: bool = False,
    ladder: bool = False,
    spatial_decode: bool = False,
    finest: int | None = None,
):
    """Single-loop transmittance with a compacted collision decode —
    sample_volume_dda_compact's counterpart of transmittance_dda (same
    per-lane draw protocol as dda.glsl:21-62). ladder: the in-loop shrink
    ladder, same mechanics + contract as sample_volume_dda_compact."""
    hit_box, near, far = ray_box_intersection(
        Rays(origin, direction), params.aabb_lo, params.aabb_hi
    )
    ipos, idir = _to_index_space(params, origin, direction)

    state, xi = rng_where(active & hit_box, state)
    t0 = near + 1e-6
    tau0 = -jnp.log(1.0 - xi)
    running0 = active & hit_box & (t0 < far)

    n = origin.shape[0]
    rungs = _ladder_rungs(n, int(ladder) if ladder and ladder is not True else 4)
    use_ladder = (
        ladder and not with_stats
        and n >= COMPACT_DECODE_MIN_LANES and len(rungs) > 1
    )
    if not use_ladder:
        cond, body = _transmittance_compact_loop(
            grid, params, lut, ipos, idir, far, None, physical,
            majorant_envelope, with_stats, spatial_decode, finest,
        )
        init = (
            state,
            t0,
            tau0,
            jnp.full((n,), MIP_START, jnp.float32),
            running0,
            jnp.ones((n,), jnp.float32),  # Tr
            jnp.int32(0),
        )
        if with_stats:
            init = init + (jnp.zeros((n,), jnp.int32),)
        final = jax.lax.while_loop(cond, body, init)
        state, tr = final[0], final[5]
        if with_stats:
            return state, tr, final[7]
        return state, tr

    # ---- in-loop shrink ladder (see sample_volume_dda_compact) ----
    idx = jnp.arange(n, dtype=jnp.int32)
    t, tau = t0, tau0
    mip = jnp.full((n,), MIP_START, jnp.float32)
    running = running0
    tr = jnp.ones((n,), jnp.float32)
    it = jnp.int32(0)
    ip, idr, fr = ipos, idir, far
    suffixes: list = []  # per-transition (idx, state, tr)
    any_sorted = jnp.zeros((), jnp.bool_)
    for si, w in enumerate(rungs):
        next_w = rungs[si + 1] if si + 1 < len(rungs) else None
        cond, body = _transmittance_compact_loop(
            grid, params, lut, ip, idr, fr, next_w, physical,
            majorant_envelope, False, spatial_decode, finest,
        )
        state, t, tau, mip, running, tr, it = jax.lax.while_loop(
            cond, body, (state, t, tau, mip, running, tr, it)
        )
        if next_w is None:
            break
        # sort only when a running lane lies OUTSIDE the kept prefix —
        # after a previous sort (or a lucky layout) survivors are often
        # already packed, and the argsort + permute gathers can be
        # skipped entirely (the slice alone is the transition)
        needs_sort = jnp.any(running[next_w:])
        any_sorted = any_sorted | needs_sort
        fpack = jnp.concatenate(
            [t[:, None], tau[:, None], mip[:, None], tr[:, None], ip, idr,
             fr[:, None]],
            axis=1,
        )  # (w, 11): t, tau, mip, tr, ipos[3], idir[3], far

        def _sorted(_, running=running, state=state, fpack=fpack, idx=idx):
            order, _ = _partition_perm(running)
            return state[order], fpack[order], running[order], idx[order]

        def _unsorted(_, running=running, state=state, fpack=fpack, idx=idx):
            return state, fpack, running, idx

        state, fpack, running, idx = jax.lax.cond(needs_sort, _sorted, _unsorted, 0)
        suffixes.append((idx[next_w:], state[next_w:], fpack[next_w:, 3]))
        state, idx = state[:next_w], idx[:next_w]
        t, tau, mip = fpack[:next_w, 0], fpack[:next_w, 1], fpack[:next_w, 2]
        tr = fpack[:next_w, 3]
        ip, idr = fpack[:next_w, 4:7], fpack[:next_w, 7:10]
        fr = fpack[:next_w, 10]
        running = running[:next_w]

    idx_all = jnp.concatenate([idx] + [s[0] for s in reversed(suffixes)])
    state_all = jnp.concatenate([state] + [s[1] for s in reversed(suffixes)])
    tr_all = jnp.concatenate([tr] + [s[2] for s in reversed(suffixes)])

    def _unsort(_):
        inv = _inverse_perm(idx_all)
        return state_all[inv], tr_all[inv]

    def _keep(_):
        return state_all, tr_all

    state, tr = jax.lax.cond(any_sorted, _unsort, _keep, 0)
    return state, tr


def transmittance_dda(
    grid,
    params,
    lut,
    origin,
    direction,
    state,
    active,
    physical: bool = False,
    majorant_envelope: bool = False,
    with_stats: bool = False,
    compact_phase2: bool = False,
    inner_unroll: int = 1,
):
    hit_box, near, far = ray_box_intersection(
        Rays(origin, direction), params.aabb_lo, params.aabb_hi
    )
    ipos, idir = _to_index_space(params, origin, direction)
    ri = 1.0 / idir

    state, xi = rng_where(active & hit_box, state)  # dda.glsl:23-31
    t0 = near + 1e-6
    tau0 = -jnp.log(1.0 - xi)
    running0 = active & hit_box & (t0 < far)

    n = origin.shape[0]
    # two-phase structure mirroring sample_volume_dda: phase 1 marches
    # with the cheap majorant work only, phase 2 decodes density and
    # consumes the draws for all parked collisions at once. Per-lane op
    # and draw sequences identical to the single-loop form.
    init = (
        state,
        t0,
        tau0,
        jnp.full((n,), MIP_START, jnp.float32),
        running0,
        jnp.ones((n,), jnp.float32),  # Tr
        jnp.int32(0),
        jnp.zeros((n,), jnp.bool_),  # pending collision
        jnp.zeros((n,), jnp.float32),  # majorant saved at the collision
    )
    if with_stats:
        init = init + (jnp.zeros((n,), jnp.int32),)

    def outer_cond(carry):
        running, it = carry[4], carry[6]
        return jnp.any(running) & (it < DDA_TRANSMITTANCE_MAX_STEPS)

    def outer_body(carry):
        if with_stats:
            (state, t, tau, mip, running, tr, it, pending, maj_s, steps) = carry
        else:
            (state, t, tau, mip, running, tr, it, pending, maj_s) = carry
            steps = None

        def inner_cond(c):
            running, it, pending = c[3], c[4], c[5]
            return jnp.any(running & ~pending) & (it < DDA_TRANSMITTANCE_MAX_STEPS)

        def inner_step(c):
            if with_stats:
                t, tau, mip, running, it, pending, maj_s, steps = c
            else:
                t, tau, mip, running, it, pending, maj_s = c
            # see sample_volume_dda.inner_step: cap guard + any(march)
            # increment keep unrolled sub-steps bit-identical
            march = running & ~pending & (it < DDA_TRANSMITTANCE_MAX_STEPS)
            mip_i = _round_mip(mip)
            curr = ipos + t[..., None] * idir
            majorant = _step_majorant(
                grid, params, lut, curr, mip_i, majorant_envelope
            )
            dt = _step_dda(curr, ri, mip_i)
            t_new = t + dt
            tau_new = tau - majorant * dt
            collided = tau_new <= 0.0
            t_coll = t_new + tau_new / jnp.maximum(majorant, 1e-20)
            escaped = t_coll >= far

            coll = march & collided
            esc_c = coll & escaped  # escaped at the collision: no draws
            new_pending = coll & ~escaped
            out_far = march & ~collided & (t_new >= far)
            t = jnp.where(coll, t_coll, jnp.where(march, t_new, t))
            tau = jnp.where(march & ~collided, tau_new, tau)
            mip = jnp.where(
                march & ~collided, jnp.minimum(mip + MIP_SPEED_UP, 3.0), mip
            )
            maj_s = jnp.where(new_pending, majorant, maj_s)
            pending = pending | new_pending
            running = running & ~esc_c & ~out_far
            out = (t, tau, mip, running, it + jnp.any(march).astype(jnp.int32), pending, maj_s)
            if with_stats:
                return out + (steps + march.astype(jnp.int32),)
            return out

        def inner_body(c):
            for _ in range(inner_unroll):
                c = inner_step(c)
            return c

        inner_init = (t, tau, mip, running, it, pending, maj_s)
        if with_stats:
            inner_init = inner_init + (steps,)
        inner_out = jax.lax.while_loop(inner_cond, inner_body, inner_init)
        t, tau, mip, running, it, pending, maj_s = inner_out[:7]
        if with_stats:
            steps = inner_out[7]

        # ---- phase 2: density decode + draws for parked lanes ----
        check = running & pending
        if compact_phase2:
            rgba = _compact_decode_rgba(
                grid, params, lut, ipos + t[..., None] * idir, check
            )
        else:
            rgba = lookup_transfer(
                lut,
                params.sample_range,
                lookup_density_trilinear(grid, params, ipos + t[..., None] * idir)
                * params.inv_maj,
                mxu=getattr(grid, "lut_mxu", None),
            )
        d = params.vol_maj * rgba[..., 3]
        # real/null draw only on live collision iterations (dda.glsl:41-44)
        state, xi1 = rng_where(check, state)
        real = xi1 * maj_s < d

        if physical:
            # proper ratio tracking: Tr *= 1 - density/local_majorant
            # (the unbiased null-collision update; extension beyond the
            # reference, giving soft shadows in default mode)
            ratio = jnp.maximum(0.0, 1.0 - d / jnp.maximum(maj_s, 1e-20))
        else:
            # reference quirk (dda.glsl:48): Tr *= max(0, 1 - global/local)
            # which is 0 whenever transfer alpha <= 1 — real collisions
            # are opaque, shadows are binary
            ratio = jnp.maximum(
                0.0, 1.0 - params.vol_maj / jnp.maximum(maj_s, 1e-20)
            )
        tr_new = jnp.where(check & real, tr * ratio, tr)
        # russian roulette only when a real collision dropped Tr below the
        # threshold (dda.glsl:50-54); a killed lane returns before the tau
        # reset draw
        rr_active = check & real & (tr_new < 0.1)
        state, xi_rr = rng_where(rr_active, state)
        killed = rr_active & (xi_rr < (1.0 - tr_new))
        tr_new = jnp.where(
            rr_active & ~killed, tr_new / jnp.maximum(tr_new, 1e-20), tr_new
        )
        tr = jnp.where(killed, 0.0, tr_new)

        state, xi2 = rng_where(check & ~killed, state)
        tau = jnp.where(check, -jnp.log(1.0 - xi2), tau)
        mip = jnp.where(check, jnp.maximum(0.0, mip - MIP_SPEED_DOWN), mip)
        running = running & ~killed
        pending = jnp.zeros_like(pending)
        out = (state, t, tau, mip, running, tr, it, pending, maj_s)
        if with_stats:
            return out + (steps,)
        return out

    final = jax.lax.while_loop(outer_cond, outer_body, init)
    state, tr = final[0], final[5]
    if with_stats:
        return state, tr, final[9]
    return state, tr


# ---------------------------------------------------------------------------
# Delta / ratio tracking (no_dda mode) — normal.glsl
# ---------------------------------------------------------------------------


def _simple_sample_loop(
    grid, params, lut, ipos, idir, far, next_w, compact, with_stats,
    finest=None,
):
    """cond/body for sample_volume_simple's event while_loop at one width
    (next_w: shrink-ladder handoff, as in _sample_compact_loop)."""

    def cond(carry):
        running, it = carry[2], carry[5]
        ok = jnp.any(running) & (it < TRACKING_MAX_EVENTS)
        if next_w is not None:
            ok = ok & (jnp.sum(running) > next_w)
        return ok

    def body(carry):
        if with_stats:
            state_in, t, running, hit, rgb_out, it, steps = carry
        else:
            state_in, t, running, hit, rgb_out, it = carry
        state = state_in
        pos = ipos + t[..., None] * idir
        if compact:
            rgba = _compact_decode_rgba(
                grid, params, lut, pos, running, compact == "spatial",
                finest,
            )
        else:
            rgba = lookup_transfer(
                lut,
                params.sample_range,
                lookup_density_trilinear(grid, params, pos) * params.inv_maj,
                mxu=getattr(grid, "lut_mxu", None),
            )
        d = params.vol_maj * rgba[..., 3]
        p_real = d * params.inv_maj
        # classify draw on every live iteration; the advance draw only on
        # null collisions (a real one returns first, normal.glsl:47-53)
        state, xi1 = rng_where(running, state)
        real = xi1 < p_real
        new_hit = running & real
        hit = hit | new_hit
        rgb_out = jnp.where(new_hit[..., None], rgba[..., :3], rgb_out)
        state, xi2 = rng_where(running & ~real, state)
        t_new = t - jnp.log(1.0 - xi2) * params.inv_maj
        t = jnp.where(running & ~real, t_new, t)
        if with_stats:
            steps = steps + running.astype(jnp.int32)
            running = running & ~real & (t < far)
            return (state, t, running, hit, rgb_out, it + 1, steps)
        running = running & ~real & (t < far)
        return (state, t, running, hit, rgb_out, it + 1)

    return cond, body


def sample_volume_simple(
    grid, params, lut, origin, direction, state, active,
    with_stats: bool = False, compact: bool = False, ladder: bool = False,
    finest: int | None = None,
):
    """Delta tracking (normal.glsl:36-55). compact routes the per-event
    9-gather density decode through _compact_decode_rgba for the running
    lanes only — delta tracking decodes EVERY event for EVERY live lane
    (no empty-space skipping), so the decode is the whole cost and the
    running fraction decays fast (same contract as the DDA variants).
    ladder: the in-loop shrink ladder, same mechanics + contract as
    sample_volume_dda_compact (the event loop's per-iteration cost is
    priced by WIDTH under serialized gathers)."""
    hit_box, near, far = ray_box_intersection(
        Rays(origin, direction), params.aabb_lo, params.aabb_hi
    )
    ipos, idir = _to_index_space(params, origin, direction)

    state, xi = rng_where(active & hit_box, state)  # normal.glsl:40
    t0 = near - jnp.log(1.0 - xi) * params.inv_maj
    running0 = active & hit_box & (t0 < far)

    n = origin.shape[0]
    rungs = _ladder_rungs(n, int(ladder) if ladder and ladder is not True else 4)
    use_ladder = (
        ladder and not with_stats
        and n >= COMPACT_DECODE_MIN_LANES and len(rungs) > 1
    )
    if not use_ladder:
        cond, body = _simple_sample_loop(
            grid, params, lut, ipos, idir, far, None, compact, with_stats,
            finest,
        )
        init = (
            state,
            t0,
            running0,
            jnp.zeros((n,), jnp.bool_),
            jnp.ones((n, 3), jnp.float32),
            jnp.int32(0),
        )
        if with_stats:
            init = init + (jnp.zeros((n,), jnp.int32),)
        final = jax.lax.while_loop(cond, body, init)
        state, t, hit, rgb = final[0], final[1], final[3], final[4]
        le_add = jnp.zeros((n, 3), jnp.float32)
        if with_stats:
            return state, hit, t, rgb, le_add, final[6]
        return state, hit, t, rgb, le_add

    # ---- in-loop shrink ladder (see sample_volume_dda_compact) ----
    idx = jnp.arange(n, dtype=jnp.int32)
    t = t0
    running = running0
    hit = jnp.zeros((n,), jnp.bool_)
    rgb = jnp.ones((n, 3), jnp.float32)
    it = jnp.int32(0)
    ip, idr, fr = ipos, idir, far
    suffixes: list = []  # per-transition (idx, state, t, hit, rgb)
    any_sorted = jnp.zeros((), jnp.bool_)
    for si, w in enumerate(rungs):
        next_w = rungs[si + 1] if si + 1 < len(rungs) else None
        cond, body = _simple_sample_loop(
            grid, params, lut, ip, idr, fr, next_w, compact, False, finest,
        )
        state, t, running, hit, rgb, it = jax.lax.while_loop(
            cond, body, (state, t, running, hit, rgb, it)
        )
        if next_w is None:
            break
        # sort only when a running lane lies OUTSIDE the kept prefix —
        # after a previous sort (or a lucky layout) survivors are often
        # already packed, and the argsort + permute gathers can be
        # skipped entirely (the slice alone is the transition)
        needs_sort = jnp.any(running[next_w:])
        any_sorted = any_sorted | needs_sort
        fpack = jnp.concatenate(
            [t[:, None], rgb, ip, idr, fr[:, None]], axis=1,
        )  # (w, 11): t, rgb[3], ipos[3], idir[3], far
        bpack = jnp.stack([running, hit], axis=1)

        def _sorted(_, running=running, state=state, fpack=fpack,
                    bpack=bpack, idx=idx):
            order, _ = _partition_perm(running)
            return state[order], fpack[order], bpack[order], idx[order]

        def _unsorted(_, state=state, fpack=fpack, bpack=bpack, idx=idx):
            return state, fpack, bpack, idx

        state, fpack, bpack, idx = jax.lax.cond(needs_sort, _sorted, _unsorted, 0)
        suffixes.append((
            idx[next_w:], state[next_w:], fpack[next_w:, 0],
            bpack[next_w:, 1], fpack[next_w:, 1:4],
        ))
        state, idx = state[:next_w], idx[:next_w]
        t, rgb = fpack[:next_w, 0], fpack[:next_w, 1:4]
        ip, idr = fpack[:next_w, 4:7], fpack[:next_w, 7:10]
        fr = fpack[:next_w, 10]
        running, hit = bpack[:next_w, 0], bpack[:next_w, 1]

    idx_all = jnp.concatenate([idx] + [s[0] for s in reversed(suffixes)])
    state_all = jnp.concatenate([state] + [s[1] for s in reversed(suffixes)])
    opack = jnp.concatenate(
        [jnp.concatenate(
            [t[:, None], rgb, hit[:, None].astype(jnp.float32)], axis=1)]
        + [jnp.concatenate(
            [s[2][:, None], s[4], s[3][:, None].astype(jnp.float32)], axis=1)
           for s in reversed(suffixes)]
    )  # (n, 5): t, rgb[3], hit

    def _unsort(_):
        inv = _inverse_perm(idx_all)
        return state_all[inv], opack[inv]

    def _keep(_):
        return state_all, opack

    state, opack = jax.lax.cond(any_sorted, _unsort, _keep, 0)
    le_add = jnp.zeros((n, 3), jnp.float32)
    return state, opack[:, 4] > 0.5, opack[:, 0], opack[:, 1:4], le_add


def _simple_transmittance_loop(
    grid, params, lut, ipos, idir, far, next_w, compact, with_stats,
    finest=None,
):
    """cond/body for transmittance_simple's event while_loop at one width
    (next_w: shrink-ladder handoff)."""

    def cond(carry):
        running, it = carry[2], carry[4]
        ok = jnp.any(running) & (it < TRACKING_MAX_EVENTS)
        if next_w is not None:
            ok = ok & (jnp.sum(running) > next_w)
        return ok

    def body(carry):
        if with_stats:
            state_in, t, running, tr, it, steps = carry
        else:
            state_in, t, running, tr, it = carry
        state = state_in
        pos = ipos + t[..., None] * idir
        if compact:
            rgba = _compact_decode_rgba(
                grid, params, lut, pos, running, compact == "spatial",
                finest,
            )
        else:
            rgba = lookup_transfer(
                lut,
                params.sample_range,
                lookup_density_trilinear(grid, params, pos) * params.inv_maj,
                mxu=getattr(grid, "lut_mxu", None),
            )
        d = params.vol_maj * rgba[..., 3]
        tr_new = jnp.where(running, tr * (1.0 - d * params.inv_maj), tr)
        # russian roulette draw only below the threshold (normal.glsl:20-26);
        # a killed lane returns before the advance draw
        rr_active = running & (tr_new < 0.1)
        state, xi_rr = rng_where(rr_active, state)
        killed = rr_active & (xi_rr < (1.0 - tr_new))
        tr_new = jnp.where(
            rr_active & ~killed, tr_new / jnp.maximum(tr_new, 1e-20), tr_new
        )
        tr = jnp.where(killed, 0.0, tr_new)
        state, xi2 = rng_where(running & ~killed, state)
        t_new = t - jnp.log(1.0 - xi2) * params.inv_maj
        t = jnp.where(running, t_new, t)
        if with_stats:
            steps = steps + running.astype(jnp.int32)
            running = running & ~killed & (t < far)
            return (state, t, running, tr, it + 1, steps)
        running = running & ~killed & (t < far)
        return (state, t, running, tr, it + 1)

    return cond, body


def transmittance_simple(
    grid, params, lut, origin, direction, state, active,
    with_stats: bool = False, compact: bool = False, ladder: bool = False,
    finest: int | None = None,
):
    """Ratio-tracking transmittance (normal.glsl:8-33); compact and
    ladder as in sample_volume_simple."""
    hit_box, near, far = ray_box_intersection(
        Rays(origin, direction), params.aabb_lo, params.aabb_hi
    )
    ipos, idir = _to_index_space(params, origin, direction)

    state, xi = rng_where(active & hit_box, state)  # normal.glsl:14
    t0 = near - jnp.log(1.0 - xi) * params.inv_maj
    running0 = active & hit_box & (t0 < far)

    n = origin.shape[0]
    rungs = _ladder_rungs(n, int(ladder) if ladder and ladder is not True else 4)
    use_ladder = (
        ladder and not with_stats
        and n >= COMPACT_DECODE_MIN_LANES and len(rungs) > 1
    )
    if not use_ladder:
        cond, body = _simple_transmittance_loop(
            grid, params, lut, ipos, idir, far, None, compact, with_stats,
            finest,
        )
        init = (state, t0, running0, jnp.ones((n,), jnp.float32), jnp.int32(0))
        if with_stats:
            init = init + (jnp.zeros((n,), jnp.int32),)
        final = jax.lax.while_loop(cond, body, init)
        state, tr = final[0], final[3]
        if with_stats:
            return state, tr, final[5]
        return state, tr

    # ---- in-loop shrink ladder (see sample_volume_dda_compact) ----
    idx = jnp.arange(n, dtype=jnp.int32)
    t = t0
    running = running0
    tr = jnp.ones((n,), jnp.float32)
    it = jnp.int32(0)
    ip, idr, fr = ipos, idir, far
    suffixes: list = []  # per-transition (idx, state, tr)
    any_sorted = jnp.zeros((), jnp.bool_)
    for si, w in enumerate(rungs):
        next_w = rungs[si + 1] if si + 1 < len(rungs) else None
        cond, body = _simple_transmittance_loop(
            grid, params, lut, ip, idr, fr, next_w, compact, False, finest,
        )
        state, t, running, tr, it = jax.lax.while_loop(
            cond, body, (state, t, running, tr, it)
        )
        if next_w is None:
            break
        # sort only when a running lane lies OUTSIDE the kept prefix —
        # after a previous sort (or a lucky layout) survivors are often
        # already packed, and the argsort + permute gathers can be
        # skipped entirely (the slice alone is the transition)
        needs_sort = jnp.any(running[next_w:])
        any_sorted = any_sorted | needs_sort
        fpack = jnp.concatenate(
            [t[:, None], tr[:, None], ip, idr, fr[:, None]], axis=1,
        )  # (w, 9): t, tr, ipos[3], idir[3], far

        def _sorted(_, running=running, state=state, fpack=fpack, idx=idx):
            order, _ = _partition_perm(running)
            return state[order], fpack[order], running[order], idx[order]

        def _unsorted(_, running=running, state=state, fpack=fpack, idx=idx):
            return state, fpack, running, idx

        state, fpack, running, idx = jax.lax.cond(needs_sort, _sorted, _unsorted, 0)
        suffixes.append((idx[next_w:], state[next_w:], fpack[next_w:, 1]))
        state, idx = state[:next_w], idx[:next_w]
        t, tr = fpack[:next_w, 0], fpack[:next_w, 1]
        ip, idr = fpack[:next_w, 2:5], fpack[:next_w, 5:8]
        fr = fpack[:next_w, 8]
        running = running[:next_w]

    idx_all = jnp.concatenate([idx] + [s[0] for s in reversed(suffixes)])
    state_all = jnp.concatenate([state] + [s[1] for s in reversed(suffixes)])
    tr_all = jnp.concatenate([tr] + [s[2] for s in reversed(suffixes)])

    def _unsort(_):
        inv = _inverse_perm(idx_all)
        return state_all[inv], tr_all[inv]

    def _keep(_):
        return state_all, tr_all

    state, tr = jax.lax.cond(any_sorted, _unsort, _keep, 0)
    return state, tr


# ---------------------------------------------------------------------------
# Fixed-step ray marching (raymarch mode) — raymarch.glsl
# ---------------------------------------------------------------------------


def _raymarch_loop(grid, params, lut, ipos, idir, start, dt, far, tau_target,
                   next_w):
    """cond/body for sample_volume_raymarch's step while_loop at one width
    (next_w: shrink-ladder handoff). The while form with an any(marching)
    exit is draw-for-draw identical to the reference's fixed-count loop:
    the GLSL returns on the hit step, so steps after every lane has
    hit/missed consume nothing (raymarch.glsl:42-55)."""

    def cond(carry):
        marching, i = carry[1], carry[6]
        ok = jnp.any(marching) & (i < RAYMARCH_STEPS)
        if next_w is not None:
            ok = ok & (jnp.sum(marching) > next_w)
        return ok

    def body(carry):
        state, marching, tau, hit, t_out, rgb_out, i = carry
        t = jnp.minimum(start + i * dt, far)
        state, d_raw = lookup_density_stochastic(
            grid, params, ipos + t[..., None] * idir, state, mask=marching
        )
        rgba = lookup_transfer(lut, params.sample_range, d_raw * params.inv_maj,
                               mxu=getattr(grid, "lut_mxu", None))
        tau_new = tau + rgba[..., 3] * params.vol_maj * dt
        new_hit = marching & (tau_new >= tau_target)
        hit = hit | new_hit
        t_out = jnp.where(new_hit, t, t_out)
        rgb_out = jnp.where(new_hit[..., None], rgba[..., :3], rgb_out)
        tau = jnp.where(marching, tau_new, tau)
        marching = marching & ~new_hit
        return (state, marching, tau, hit, t_out, rgb_out, i + 1)

    return cond, body


def sample_volume_raymarch(grid, params, lut, origin, direction, state, active,
                           ladder: bool = False):
    """Stochastic-filter fixed-step raymarch (raymarch.glsl:30-56).

    ladder: the in-loop shrink ladder (see sample_volume_dda_compact) —
    a raymarch wavefront starts at the box-hit fraction (~18% on the
    wide benchmark framing) and shrinks as lanes reach their tau target,
    while the reference-shaped loop pays full width all RAYMARCH_STEPS
    iterations."""
    hit_box, near, far = ray_box_intersection(
        Rays(origin, direction), params.aabb_lo, params.aabb_hi
    )
    ipos, idir = _to_index_space(params, origin, direction)

    valid = active & hit_box
    # tau target + start jitter consumed after the box test (raymarch.glsl:37-40)
    state, xi_tau = rng_where(valid, state)
    tau_target = -jnp.log(1.0 - xi_tau)
    dt = (far - near) / RAYMARCH_STEPS
    state, xi_j = rng_where(valid, state)
    start = near + xi_j * dt

    n = origin.shape[0]
    rungs = _ladder_rungs(n, int(ladder) if ladder and ladder is not True else 4)
    tau = jnp.zeros((n,), jnp.float32)
    hit = jnp.zeros((n,), jnp.bool_)
    t_out = jnp.zeros((n,), jnp.float32)
    rgb_out = jnp.ones((n, 3), jnp.float32)
    le_add = jnp.zeros((n, 3), jnp.float32)

    use_ladder = (
        ladder and n >= COMPACT_DECODE_MIN_LANES and len(rungs) > 1
    )
    if not use_ladder:
        cond, body = _raymarch_loop(
            grid, params, lut, ipos, idir, start, dt, far, tau_target, None
        )
        final = jax.lax.while_loop(
            cond, body,
            (state, valid, tau, hit, t_out, rgb_out, jnp.int32(0)),
        )
        state, _, tau, hit, t_out, rgb_out = final[:6]
        return state, hit, t_out, rgb_out, le_add

    # ---- in-loop shrink ladder (see sample_volume_dda_compact) ----
    idx = jnp.arange(n, dtype=jnp.int32)
    marching = valid
    i = jnp.int32(0)
    ip, idr = ipos, idir
    st_, dt_, fr, tt = start, dt, far, tau_target
    suffixes: list = []  # per-transition (idx, state, t_out, hit, rgb)
    any_sorted = jnp.zeros((), jnp.bool_)
    for si, w in enumerate(rungs):
        next_w = rungs[si + 1] if si + 1 < len(rungs) else None
        cond, body = _raymarch_loop(
            grid, params, lut, ip, idr, st_, dt_, fr, tt, next_w
        )
        state, marching, tau, hit, t_out, rgb_out, i = jax.lax.while_loop(
            cond, body, (state, marching, tau, hit, t_out, rgb_out, i)
        )
        if next_w is None:
            break
        # sort only when a running lane lies OUTSIDE the kept prefix —
        # after a previous sort (or a lucky layout) survivors are often
        # already packed, and the argsort + permute gathers can be
        # skipped entirely (the slice alone is the transition)
        needs_sort = jnp.any(marching[next_w:])
        any_sorted = any_sorted | needs_sort
        fpack = jnp.concatenate(
            [tau[:, None], t_out[:, None], rgb_out, ip, idr, st_[:, None],
             dt_[:, None], fr[:, None], tt[:, None]],
            axis=1,
        )  # (w, 15): tau, t_out, rgb[3], ipos[3], idir[3], start, dt, far, tau_target
        bpack = jnp.stack([marching, hit], axis=1)

        def _sorted(_, marching=marching, state=state, fpack=fpack,
                    bpack=bpack, idx=idx):
            order, _ = _partition_perm(marching)
            return state[order], fpack[order], bpack[order], idx[order]

        def _unsorted(_, state=state, fpack=fpack, bpack=bpack, idx=idx):
            return state, fpack, bpack, idx

        state, fpack, bpack, idx = jax.lax.cond(needs_sort, _sorted, _unsorted, 0)
        suffixes.append((
            idx[next_w:], state[next_w:], fpack[next_w:, 1],
            bpack[next_w:, 1], fpack[next_w:, 2:5],
        ))
        state, idx = state[:next_w], idx[:next_w]
        tau, t_out = fpack[:next_w, 0], fpack[:next_w, 1]
        rgb_out = fpack[:next_w, 2:5]
        ip, idr = fpack[:next_w, 5:8], fpack[:next_w, 8:11]
        st_, dt_ = fpack[:next_w, 11], fpack[:next_w, 12]
        fr, tt = fpack[:next_w, 13], fpack[:next_w, 14]
        marching, hit = bpack[:next_w, 0], bpack[:next_w, 1]

    idx_all = jnp.concatenate([idx] + [s[0] for s in reversed(suffixes)])
    state_all = jnp.concatenate([state] + [s[1] for s in reversed(suffixes)])
    opack = jnp.concatenate(
        [jnp.concatenate(
            [t_out[:, None], rgb_out, hit[:, None].astype(jnp.float32)],
            axis=1)]
        + [jnp.concatenate(
            [s[2][:, None], s[4], s[3][:, None].astype(jnp.float32)], axis=1)
           for s in reversed(suffixes)]
    )  # (n, 5): t_out, rgb[3], hit

    def _unsort(_):
        inv = _inverse_perm(idx_all)
        return state_all[inv], opack[inv]

    def _keep(_):
        return state_all, opack

    state, opack = jax.lax.cond(any_sorted, _unsort, _keep, 0)
    return state, opack[:, 4] > 0.5, opack[:, 0], opack[:, 1:4], le_add


def sample_volume_raymarch_tiled(
    grid, params, lut, origin, direction, state, active,
    bz: int = 8, neigh: tuple = (3, 2, 1), finest: int | None = None,
    interpret: bool | None = None,
):
    """sample_volume_raymarch with the step loop's stochastic taps
    answered by the pipelined tile-march Pallas kernel
    (render/tilemarch.py): per 384-lane screen micro-tile, each step's
    tap support streams through VMEM as a block window (bandwidth-bound)
    instead of XLA's serialized per-lane gathers (latency-bound).

    BIT-equal to sample_volume_raymarch for EVERY lane: non-missed lanes
    replicate the exact op/draw chain in-kernel (one nonzero one-hot MXU
    product is exact); lanes whose tap ever leaves their tile's window
    are re-traced from the post-prologue state snapshot by the XLA loop,
    compacted to the miss count's width rung. Requires lanes arranged
    micro-tile-major (n divisible by tilemarch.LANES) and a dense grid.

    Ref: raymarch.glsl:30-56; economics NOTES.md round 12.
    """
    from volxel_tpu.render import tilemarch as tm

    hit_box, near, far = ray_box_intersection(
        Rays(origin, direction), params.aabb_lo, params.aabb_hi
    )
    ipos, idir = _to_index_space(params, origin, direction)

    valid = active & hit_box
    # tau target + start jitter consumed after the box test (raymarch.glsl:37-40)
    state, xi_tau = rng_where(valid, state)
    tau_target = -jnp.log(1.0 - xi_tau)
    dt = (far - near) / RAYMARCH_STEPS
    state, xi_j = rng_where(valid, state)
    start = near + xi_j * dt
    state_snap = state  # post-prologue: the fallback re-traces from here

    n = origin.shape[0]
    lanes = tm.LANES
    ntiles = n // lanes

    def tiled(x):
        return x.reshape((ntiles, lanes) + x.shape[1:])

    rays_p = tm.pack_tile_rays(
        tiled(ipos), tiled(idir), tiled(start), tiled(dt), tiled(far),
        tiled(valid), tiled(tau_target),
    )
    zdim, ydim, xdim = grid.dense.shape
    neigh_eff = tm.effective_neigh(grid.dense.shape, bz, neigh)
    cb = tm.tile_block_corners_stochastic(
        rays_p, [xdim, ydim, zdim], bz, neigh_eff, steps=RAYMARCH_STEPS
    )
    scalars = jnp.stack([
        params.inv_maj, params.vol_maj, params.density_scale,
        params.sample_range[0], params.sample_range[1],
        jnp.float32(0), jnp.float32(0), jnp.float32(0),
    ]).astype(jnp.float32)
    state4 = jnp.moveaxis(tiled(state_snap), -1, 1).astype(jnp.uint32)
    ext4 = jnp.asarray([xdim, ydim, zdim, 0], jnp.int32)
    outf, outs = tm.tile_march_sample(
        grid.dense, rays_p, state4, cb, jnp.transpose(lut), scalars, ext4,
        bz=bz, neigh=neigh_eff, steps=RAYMARCH_STEPS, interpret=interpret,
    )
    hit_k = outf[:, tm.O_HIT].reshape(n) > 0.5
    t_k = outf[:, tm.O_T].reshape(n)
    rgb_k = jnp.moveaxis(outf[:, tm.O_R:tm.O_B + 1], 1, 2).reshape(n, 3)
    # O_MISS = freeze step + 1 (0 = clean): the lane froze BEFORE
    # consuming that step's draws, so outs/O_TAU hold its exact mid-ray
    # state and the fallback RESUMES from there (cost ~ remaining steps
    # of missed lanes, not a full re-trace)
    miss_step = outf[:, tm.O_MISS].reshape(n)
    missed = miss_step > 0.5
    i0 = jnp.maximum(miss_step - 1.0, 0.0)
    tau0 = outf[:, tm.O_TAU].reshape(n)
    state_k = jnp.moveaxis(outs, 1, 2).reshape(n, 4).astype(state_snap.dtype)

    # ---- resume fallback for the frozen lanes, width-compacted ----
    order, _ = _partition_perm(missed)
    cnt = jnp.sum(missed.astype(jnp.int32))
    fpack = jnp.concatenate(
        [ipos, idir, start[:, None], dt[:, None], far[:, None],
         tau_target[:, None], i0[:, None], tau0[:, None]], axis=1,
    )[order]  # (n, 14)
    m_s = missed[order]
    st_s = state_k[order]

    def run_at(w):
        def f(_):
            ip, idr = fpack[:w, 0:3], fpack[:w, 3:6]
            st_, dt_ = fpack[:w, 6], fpack[:w, 7]
            fr, tt = fpack[:w, 8], fpack[:w, 9]
            i_l, ta = fpack[:w, 10], fpack[:w, 11]
            stf, hitf, t_of, rgbf = _raymarch_resume(
                grid, params, lut, ip, idr, st_, dt_, fr, tt,
                st_s[:w], m_s[:w], i_l, ta,
            )
            pad = n - w
            return (
                jnp.concatenate([stf, st_s[w:]]),
                jnp.concatenate([hitf, jnp.zeros((pad,), jnp.bool_)]),
                jnp.concatenate([t_of, jnp.zeros((pad,), jnp.float32)]),
                jnp.concatenate([rgbf, jnp.ones((pad, 3), jnp.float32)]),
            )
        return f

    widths = _compact_widths(n, finest)
    st_f, hit_f, t_f, rgb_f = _width_ladder(
        cnt, widths, run_at, run_at(n), 0
    )
    inv = _inverse_perm(order)
    st_f, hit_f, t_f, rgb_f = st_f[inv], hit_f[inv], t_f[inv], rgb_f[inv]

    state = jnp.where(missed[:, None], st_f, state_k)
    hit = jnp.where(missed, hit_f, hit_k)
    t_out = jnp.where(missed, t_f, t_k)
    rgb_out = jnp.where(missed[:, None], rgb_f, rgb_k)
    le_add = jnp.zeros((n, 3), jnp.float32)
    return state, hit, t_out, rgb_out, le_add


def _raymarch_resume(grid, params, lut, ipos, idir, start, dt, far,
                     tau_target, state, resumed, i0, tau0):
    """Resume sample_volume_raymarch's step loop mid-ray: each lane
    continues from its own step index i0 with its frozen (state, tau).
    The op/draw chain per step replicates _raymarch_loop exactly (the
    per-lane f32 step index is the same value the scalar counter
    broadcasts), so resumed lanes are bit-equal to a pure-XLA trace.
    Returns (state, hit, t_out, rgb_out)."""
    n = ipos.shape[0]
    marching0 = resumed & (i0 < RAYMARCH_STEPS)

    def cond(carry):
        return jnp.any(carry[1])

    def body(carry):
        state, marching, tau, hit, t_out, rgb_out, i_l = carry
        t = jnp.minimum(start + i_l * dt, far)
        state, d_raw = lookup_density_stochastic(
            grid, params, ipos + t[..., None] * idir, state, mask=marching
        )
        rgba = lookup_transfer(lut, params.sample_range, d_raw * params.inv_maj,
                               mxu=getattr(grid, "lut_mxu", None))
        tau_new = tau + rgba[..., 3] * params.vol_maj * dt
        new_hit = marching & (tau_new >= tau_target)
        hit = hit | new_hit
        t_out = jnp.where(new_hit, t, t_out)
        rgb_out = jnp.where(new_hit[..., None], rgba[..., :3], rgb_out)
        tau = jnp.where(marching, tau_new, tau)
        i_l = jnp.where(marching, i_l + 1.0, i_l)
        marching = marching & ~new_hit & (i_l < RAYMARCH_STEPS)
        return (state, marching, tau, hit, t_out, rgb_out, i_l)

    final = jax.lax.while_loop(
        cond, body,
        (state, marching0, tau0, jnp.zeros((n,), jnp.bool_),
         jnp.zeros((n,), jnp.float32), jnp.ones((n, 3), jnp.float32), i0),
    )
    return final[0], final[3], final[4], final[5]


def transmittance_raymarch(grid, params, lut, origin, direction, state, active):
    hit_box, near, far = ray_box_intersection(
        Rays(origin, direction), params.aabb_lo, params.aabb_hi
    )
    ipos, idir = _to_index_space(params, origin, direction)

    valid = active & hit_box
    dt = (far - near) / RAYMARCH_STEPS
    state, xi_j = rng_where(valid, state)  # raymarch.glsl:17
    start = near + xi_j * dt

    n = origin.shape[0]

    def body(i, carry):
        state, tau = carry
        t = jnp.minimum(start + i * dt, far)
        # all 64 steps consume draws (no early out in raymarch.glsl:18-22)
        state, d_raw = lookup_density_stochastic(
            grid, params, ipos + t[..., None] * idir, state, mask=valid
        )
        alpha = lookup_transfer(lut, params.sample_range, d_raw * params.inv_maj,
                                mxu=getattr(grid, "lut_mxu", None))[..., 3]
        tau = tau + jnp.where(valid, alpha * params.vol_maj * dt, 0.0)
        return (state, tau)

    state, tau = jax.lax.fori_loop(0, RAYMARCH_STEPS, body, (jnp.asarray(state), jnp.zeros((n,), jnp.float32)))
    return state, jnp.exp(-tau)


MODE_FUNCTIONS = {
    "default": (sample_volume_dda, transmittance_dda),
    "no_dda": (sample_volume_simple, transmittance_simple),
    "raymarch": (sample_volume_raymarch, transmittance_raymarch),
}


def get_mode_functions(
    mode: str,
    physical_shadows: bool = False,
    physical_majorant: bool = False,
    compact_decode: bool | str = False,
    dda_unroll: int = 1,
    march_ladder: bool = False,
    ladder_factor: int = 4,
    compact_finest: int | None = None,
    pyr_march: bool = False,
):
    """Mode dispatch with the optional physical-transmittance and
    physical-majorant extensions (both default-mode only — the other
    modes use the global majorant and need neither). compact_decode
    selects a compacted-collision-decode DDA variant (see
    _compact_decode_rgba for the cost model + realization contract):
    "loop" (or True) = the single-loop forms (sample_volume_dda_compact);
    "phase2" = the two-phase forms with only the phase-2 decode
    compacted; "mixed" = single-loop sample_volume + phase2-compacted
    two-phase transmittance (the honest decomposition showed the
    single-loop form wins the distance-sampling wavefront but loses the
    all-active transmittance wavefront — examples/ab_chunk_sync.py).
    Same draw protocol in all variants. dda_unroll > 1 unrolls the
    two-phase inner march loop (bit-identical; ignored by the
    single-loop forms). march_ladder enables the in-loop shrink ladder
    on the single-loop forms (see sample_volume_dda_compact)."""
    import functools

    sample_volume, transmittance = MODE_FUNCTIONS[mode]
    if mode == "raymarch" and march_ladder:
        # the raymarch wavefront starts at the box-hit fraction and
        # shrinks as lanes reach their tau target; the ladder narrows the
        # fixed-step loop accordingly (transmittance_raymarch keeps its
        # constant-width loop — its entry width is already compacted by
        # the caller's compact_secondary ladder)
        sample_volume = functools.partial(
            sample_volume_raymarch, ladder=ladder_factor)
    if mode == "no_dda" and (compact_decode or march_ladder):
        # delta/ratio tracking decode the volume EVERY event for every
        # live lane; any truthy compact_decode compacts that decode to
        # the running lanes (same contract as the default-mode variants).
        # march_ladder narrows the whole event loop as lanes terminate.
        simple_compact = (
            "spatial" if compact_decode == "loop-spatial"
            else bool(compact_decode)
        )
        lad = ladder_factor if march_ladder else False
        sample_volume = functools.partial(
            sample_volume_simple, compact=simple_compact, ladder=lad,
            finest=compact_finest,
        )
        transmittance = functools.partial(
            transmittance_simple, compact=simple_compact, ladder=lad,
            finest=compact_finest,
        )
    if mode == "default" and pyr_march:
        # in-kernel pyramid march (render.pyrmarch): the caller has
        # verified grid.maj_pyr exists (pathtrace._pyr_engaged). The
        # shrink ladder is structurally replaced by per-block kernel
        # exits; decode compaction keys carry over.
        spatial = compact_decode == "loop-spatial"
        sample_volume = functools.partial(
            sample_volume_dda_pyr, spatial_decode=spatial,
            finest=compact_finest, majorant_envelope=physical_majorant,
        )
        transmittance = functools.partial(
            transmittance_dda_pyr, spatial_decode=spatial,
            finest=compact_finest, physical=physical_shadows,
            majorant_envelope=physical_majorant,
        )
        return sample_volume, transmittance
    if mode == "default":
        if compact_decode in (True, "loop", "loop-spatial"):
            # "loop-spatial": the compacted decode's sort key becomes the
            # base tap's z-major voxel index (see _compact_decode_rgba) —
            # gathers then walk the dense field near-sequentially
            spatial = compact_decode == "loop-spatial"
            sv_base = functools.partial(
                sample_volume_dda_compact, spatial_decode=spatial,
                finest=compact_finest)
            tr_base = functools.partial(
                transmittance_dda_compact, spatial_decode=spatial,
                finest=compact_finest)
        elif compact_decode == "mixed":
            sv_base = functools.partial(
                sample_volume_dda_compact, finest=compact_finest)
            tr_base = functools.partial(transmittance_dda, compact_phase2=True)
        elif compact_decode == "phase2":
            sv_base = functools.partial(sample_volume_dda, compact_phase2=True)
            tr_base = functools.partial(transmittance_dda, compact_phase2=True)
        elif compact_decode:
            raise ValueError(f"unknown compact_decode: {compact_decode!r}")
        else:
            sv_base, tr_base = sample_volume_dda, transmittance_dda
        single_sv = (True, "loop", "loop-spatial", "mixed")
        single_tr = (True, "loop", "loop-spatial")
        if dda_unroll > 1:
            # the single-loop forms have no inner march loop to unroll
            if compact_decode not in single_sv:
                sv_base = functools.partial(sv_base, inner_unroll=dda_unroll)
            if compact_decode not in single_tr:
                tr_base = functools.partial(tr_base, inner_unroll=dda_unroll)
        if march_ladder:
            # the shrink ladder exists on the single-loop forms only
            if compact_decode in single_sv:
                sv_base = functools.partial(sv_base, ladder=ladder_factor)
            if compact_decode in single_tr:
                tr_base = functools.partial(tr_base, ladder=ladder_factor)
        sample_volume, transmittance = sv_base, tr_base
        if physical_majorant:
            sample_volume = functools.partial(sv_base, majorant_envelope=True)
        if physical_shadows or physical_majorant:
            transmittance = functools.partial(
                tr_base,
                physical=physical_shadows,
                majorant_envelope=physical_majorant,
            )
    return sample_volume, transmittance
