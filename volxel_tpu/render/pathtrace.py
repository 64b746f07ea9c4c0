"""Wavefront volumetric path tracer (shaders/fragment.frag in JAX).

One call renders one progressive sample for every pixel: seeds per-ray RNG
from (pixel, frame) exactly like the reference (fragment.frag:143-144),
builds jittered camera rays, and runs trace_path (fragment.frag:79-124) —
NEE with MIS power heuristic, Henyey-Greenstein scattering, russian
roulette — over the whole ray wavefront with masked lockstep bounces.

Static configuration (render mode, bounce count, env toggles, resolution)
specializes the jit, mirroring the reference's compile-time shader #define
injection (viewer.ts:771-787).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from volxel_tpu.render.modes import (
    _compact_widths,
    _partition_perm,
    _width_ladder,
    get_mode_functions,
    sample_volume_raymarch_tiled,
)
from volxel_tpu.render.rays import (
    Rays,
    camera_rays,
    luma,
    phase_henyey_greenstein,
    pixel_ndc,
    power_heuristic,
    ray_box_intersection,
    sample_phase_henyey_greenstein,
    sanitize,
)
from volxel_tpu.render.rng import rng2, rng2_where, rng_where, seed_rays
from volxel_tpu.render.sampling import DeviceGrid, VolumeParams, lookup_transfer  # noqa: F401
from volxel_tpu.scene.environment import (
    EnvState,
    background_color,
    lookup_environment,
    lookup_environment_light,
    pdf_environment,
    sample_environment,
    sample_environment_light,
)


class RenderConfig(NamedTuple):
    """Static (hashable) render configuration -> one jit specialization."""

    width: int
    height: int
    mode: str = "default"  # default | no_dda | raymarch
    bounces: int = 3
    show_environment: bool = True
    use_env: bool = True
    debug_hits: bool = False
    hide_envmap: bool = False
    gradient_shading: bool = False  # config 4: first-hit Blinn-Phong
    # extension: unbiased ratio-tracking shadow transmittance instead of
    # the reference's binary-shadow quirk (see modes.transmittance_dda)
    physical_shadows: bool = False
    # extension: true equirect solid-angle env pdf on both MIS sides
    # instead of the reference's 1/(4*pi) texel mass (scene.environment)
    physical_pdf: bool = False
    # extension: prefix-max alpha envelope for the DDA brick majorant —
    # fixes the reference's non-monotone-transfer majorant clipping
    # (~26% bright on the benchmark ramp; modes._majorant_alpha)
    physical_majorant: bool = False
    # wavefront chunking: the traversal while_loops run until EVERY lane
    # finishes, so one worst-case ray stalls the whole wavefront. Chunking
    # lax.maps the trace over coherent pixel blocks, letting each block
    # exit at its local maximum instead. None = single wavefront.
    chunk_size: int | None = None
    # stable-sort secondary rays (NEE shadow rays; bounce>=2 extension
    # rays) so live lanes occupy a prefix, and when they fit in half the
    # wavefront run the traversal loop at half vector width (lax.cond
    # picks the branch at runtime). Per-lane RNG state travels with its
    # lane, so renders stay bit-identical
    # (tests/test_render.py::test_compact_secondary_bit_identical).
    # Default OFF since r9: the flag won -7.2% under the r5 structure,
    # but the march ladder now narrows secondary wavefronts in-loop, so
    # the sort + permute overhead no longer pays — measured a wash at
    # bounces=1 (0.320 vs 0.317 s/sample at 960x540/256^3) and a -7.6%
    # LOSS at bounces=3 (0.579 vs 0.535; examples/ab_sec.py), and -7%
    # at 1080p/512^3 bounces=1 (examples/profile_real6.py).
    compact_secondary: bool = False
    # fold vol_maj * transfer_alpha(...) into the majorant pyramid
    # IN-GRAPH (modes.build_premul_majorant, hoisted as loop-invariant by
    # XLA) so the DDA march gathers once per step instead of pyramid +
    # LUT. Bit-identical renders (pinned by
    # tests/test_render.py::test_premul_majorant_bit_identity). Default
    # ON: the honest sync-mode A/B measured -9.6% real frame time (8.83
    # vs 9.78 s at 960x540/256^3 — examples/profile_real3.py; XLA TPU
    # gathers serialize at ~27 ns/element, so removing one gather per
    # march step is a real win; the earlier "wash" was relay-ack
    # fiction, NOTES.md r5 discovery section).
    premul_majorant: bool = True
    # tile-major chunk ordering (NOTES r5): group each lockstep chunk as a
    # 2D tile instead of a full-width scanline band, so a chunk's
    # worst-case lane is drawn from a compact screen region — background
    # tiles exit instantly and volume tiles are uniformly busy. Measured
    # 0.086-0.097 vs 0.099-0.257 ms/sample for bands on the wide
    # benchmark framing (examples/ab_tileorder.py). A pure lane
    # permutation: the per-lane RNG/draw protocol is unchanged (keyed by
    # global pixel index), but XLA's codegen rounds fused transcendentals
    # position-dependently at the ulp level, and an ulp can flip a
    # stochastic collision compare — so isolated pixels (~0.01%) render a
    # DIFFERENT equally-valid realization of the same estimator than the
    # band order (investigation: NOTES r5; contract pinned by
    # tests/test_render.py::test_tile_chunks_same_estimator). Only
    # engages when the frame is actually chunked (> the chunk target).
    tile_chunks: bool = True
    # compacted collision decode for the DDA traversal: the 9-gather
    # trilinear+LUT decode sorts collided lanes to a prefix and runs at
    # the narrowest sufficient width (n/8..n lax.cond ladder), so decode
    # cost tracks the collided FRACTION instead of the wavefront width
    # (XLA TPU gathers serialize per element — NOTES.md r5 real profile).
    # "loop"/True = single-loop DDA decoding compactly every iteration
    # (modes.sample_volume_dda_compact); "loop-spatial" = same, with the
    # compaction sort keyed by the base tap's z-major voxel index so the
    # serialized decode gathers walk memory near-sequentially (the r5
    # profile: gather latency drops with index locality); "phase2" =
    # keep the two-phase park-and-batch march, compact only the
    # phase-2 decode. Same
    # per-lane op + draw protocol in all variants; below
    # modes.COMPACT_DECODE_MIN_LANES lanes the decode is full-width and
    # results are bit-identical to the baseline (pinned by
    # tests/test_render.py::test_compact_decode_bit_identical_small); at
    # compacted widths the tile_chunks ulp contract applies (same
    # estimator, position-dependent transcendental rounding). Default
    # "loop": the honest sync-mode A/B measured -67.6% real frame time
    # (2.66 vs 8.22 s at 960x540/256^3, examples/ab_compact.py, 3
    # interleaved passes reproducible to ~1%; "phase2" alone -37%) — the
    # two-phase park-and-wait structure, not loop dispatch, was the cost.
    compact_decode: bool | str = "loop"
    # unroll factor for the two-phase DDA inner march loop: >1 runs that
    # many march steps per while_loop iteration, trading masked wasted
    # sub-steps at round boundaries for while_loop dispatch overhead.
    # BIT-identical for any value (the march consumes no RNG; cap guard +
    # any(march) iteration count reproduce the rolled exits — pinned by
    # tests/test_render.py::test_dda_unroll_bit_identical). Measured a
    # LOSS in the honest sync-mode A/B (+3.2% at 2, +10.3% at 4 —
    # examples/ab_compact.py: while_loop dispatch overhead is not the
    # cost; the masked wasted sub-steps are). Default 1; kept as a knob
    # for hardware where loop dispatch dominates. Ignored when
    # compact_decode selects the single-loop forms.
    dda_unroll: int = 1
    # in-loop shrink ladder for the single-loop marches: the while_loop
    # exits whenever the running count fits the next rung (n/4, n/16...),
    # running lanes are stable-sorted to a prefix, and the march
    # continues at that width (modes.sample_volume_dda_compact ladder=).
    # Serialized gathers price every march iteration by WIDTH, and camera
    # wavefronts run ~10-18% occupied while the chunk's slowest lane
    # marches ~100 iterations (examples/steps_decay.py: width x max_steps
    # is ~9x sum(steps)). Same engagement gate + ulp realization contract
    # as compact_decode; no-op unless compact_decode selects the
    # single-loop forms (default mode) / the mode is no_dda. Default ON:
    # honest sync-mode A/B measured -31% at 16200-lane chunks and -37.5%
    # at 129600 (0.618 -> 0.386 s/sample, 960x540/256^3,
    # examples/ab_ladder.py) — the ladder absorbs in-chunk divergence, so
    # the chunk-size optimum moves up (see Renderer._pick_chunk_size).
    march_ladder: bool = True
    # compact the NEE environment warp + the escape-ray env lookup/pdf to
    # the lanes that consume them (_compact_apply ladder): the
    # hierarchical warp is the most expensive non-traversal op (real 51
    # ms per 131k-lane call, NOTES.md r5 profile) and runs once per
    # bounce per chunk, while the consuming lanes (live at bounce b /
    # escaped at bounce b) are often a small fraction. Dead-lane outputs
    # are fills, masked by the existing valid_nee/miss guards. Same ulp
    # realization contract as compact_decode; engages with
    # n >= COMPACT_MIN_LANES (pinned by
    # tests/test_render.py::test_compact_env_same_estimator). Default ON:
    # real -15% (0.61 vs 0.72 s/sample at 960x540/256^3, 16200-lane
    # chunks — examples/ab_env.py).
    compact_env: bool = True
    # rung shrink factor for march_ladder: each ladder stage keeps
    # n/factor lanes. 4 (default) = fewer sort transitions; 2 halves the
    # dead-width slack per stage — transitions are lazy (sort only when
    # survivors overflow the prefix) so finer rungs are cheaper than
    # they were when the ladder shipped (NOTES r7).
    ladder_factor: int = 4
    # finest compaction rung divisor shared by every cond-ladder
    # compaction site (collision decode, secondary traversal, env
    # warp/lookup): widths n/compact_finest .. n/2, n, each >= 256
    # lanes (modes._compact_widths). The r9 chip A/B
    # (examples/ab_rungs.py: finest 8/16/32/64 all within 0.5% at
    # 960x540/256^3) measured rung depth a WASH — the march ladder has
    # already narrowed the wavefront before these sites see it — so the
    # default stays at r6's 8 (deeper rungs cost ~2x compile for no
    # runtime win). Same ulp realization contract as compact_decode.
    compact_finest: int = 8
    # run the DDA march's per-step majorant fetch as a one-hot MXU
    # matmul over the compact premul pyramid (render.mxu_gather) instead
    # of XLA's serialized per-lane gather. Gathered values are BIT-EXACT
    # (byte-plane decomposition — see mxu_gather module docstring), so
    # renders are bit-identical either way. Default OFF: the honest
    # chip A/B measured it a LOSS at shipped table sizes (+5.3% all
    # sites, +2.1% march-only — examples/ab_mxu.py r9; the per-iteration
    # pallas_call + N*T MACs cost more than the serialized gather).
    # "auto" engages on the TPU backend when premul_majorant is on and
    # the compact pyramid fits the MXU budget; True forces it (CPU runs
    # the kernel interpreted — tests only).
    mxu_gather: bool | str = False
    # raymarch mode: answer the camera wavefront's per-step stochastic
    # taps with the pipelined tile-march Pallas kernel
    # (render/tilemarch.py) — per 384-lane screen micro-tile, each
    # step's tap window streams HBM->VMEM as block in_specs
    # (bandwidth-bound) instead of XLA's serialized per-lane gathers
    # (latency-bound). BIT-identical renders: in-window lanes replicate
    # the exact op/draw chain in-kernel; window-miss lanes re-trace via
    # the compacted XLA loop (modes.sample_volume_raymarch_tiled,
    # pinned by tests/test_tilemarch.py). Engages only for mode ==
    # "raymarch" on the camera bounce with a dense grid and a
    # micro-tile-compatible chunk tiling; chunk lanes are then ordered
    # micro-tile-major (a pure permutation — same estimator contract as
    # tile_chunks). True forces (CPU interprets the kernel — tests).
    tile_march: bool = False
    # tile-march window geometry: (block z, neigh z, neigh y, neigh x);
    # block is (bz, 16, 128) — sublane/lane dims pinned by bf16 VMEM
    # tiling. Default window (24, 32, 256): 12.3% lane freeze / kernel
    # 0.574 s for the whole 1080p/512^3 filled wavefront vs the XLA
    # sample leg's 2.60 s (examples/probe_tileprod.py, optimal anchor);
    # the 128-wide window is a LOSS (58% freeze -> resume dominates).
    tile_march_geom: tuple = (8, 3, 2, 2)
    # default mode: run the DDA march loop INSIDE a Pallas kernel with
    # the compact premul pyramid VMEM-resident (render.pyrmarch) — each
    # lane marches to its next collision candidate at in-kernel one-hot
    # MXU fetch cost (~6.9 ns/lane-step, examples/probe_march_kernel.py)
    # instead of XLA's flat ~14.6 ns/lane-step serialized gather
    # (examples/probe_gatherloc.py), parking at collisions; the XLA
    # loop becomes per-collision rounds (decode + draws). Same per-lane
    # op + draw protocol — bit-identical below
    # modes.COMPACT_DECODE_MIN_LANES, the compacted-decode ulp contract
    # above (pinned by tests/test_pyrmarch.py). Requires
    # premul_majorant and a pyramid within pyrmarch.PYR_MAX_ENTRIES.
    # True forces (CPU interprets the kernel — tests); default OFF
    # pending the chip A/B (examples/ab_pyr.py).
    pyr_march: bool = False


def _mxu_on(config) -> bool:
    """Static (trace-time) backend gate for the MXU gather paths."""
    import jax as _jax

    if config.mxu_gather is False:
        return False
    return config.mxu_gather is True or _jax.default_backend() == "tpu"


def _pyr_engaged(config, grid) -> bool:
    """Static (trace-time) gate for the in-kernel pyramid march: default
    mode with the premul pyramid present and VMEM-small."""
    from volxel_tpu.render.pyrmarch import PYR_MAX_ENTRIES
    from volxel_tpu.render.sampling import _compact_pyramid_dims

    if not config.pyr_march or config.mode != "default":
        return False
    if getattr(grid, "maj_mips", None) is None:
        return False
    dims, offsets = _compact_pyramid_dims(grid.maj_mips.shape)
    total = offsets[-1] + dims[-1][0] * dims[-1][1] * dims[-1][2]
    return total <= PYR_MAX_ENTRIES


def _mxu_gather_engaged(config, grid) -> bool:
    """Static (trace-time) decision for the MXU majorant fetch."""
    from volxel_tpu.render.mxu_gather import MXU_GATHER_MAX_TABLE
    from volxel_tpu.render.sampling import _compact_pyramid_dims

    if not _mxu_on(config) or not config.premul_majorant:
        return False
    if getattr(grid, "maj_mips", None) is None:
        return False
    dims, offsets = _compact_pyramid_dims(grid.maj_mips.shape)
    total = offsets[-1] + dims[-1][0] * dims[-1][1] * dims[-1][2]
    return total <= MXU_GATHER_MAX_TABLE


# compact_secondary only engages at real wavefront widths: below this the
# sort/permute/cond machinery costs more in compile time than the narrowed
# traversal saves (and small CPU test renders keep the plain single-path
# program). Static gate — n is known at trace time. 6144 = above the
# largest bit-pinned test render (64^2), below the smallest production
# chunk (8100); matches modes.COMPACT_DECODE_MIN_LANES.
COMPACT_MIN_LANES = 6144


def _compacted_secondary(fn, n_fill, valid, lane_arrays, fill_values,
                         finest=None):
    """Run `fn(*lane_arrays_prefix, valid_prefix)` at the narrowest
    sufficient width (the _compact_widths rungs — runtime
    lax.cond ladder, same
    shape as modes._compact_decode_rgba). Lanes are stable-sorted so live
    ones form a prefix; outputs are scattered back to lane order. The
    traversal loop's real cost is proportional to WIDTH (serialized
    gathers, NOTES.md r5), and NEE shadow / post-RR extension wavefronts
    are often far below half occupancy.

    fn: (*per_lane_arrays, valid) -> (state, *outputs)  — all per-lane.
    n_fill: per-output fill for the untraversed dead tail (state is
    passed through untouched and needs no fill).
    """
    n = valid.shape[0]
    order, inv = _partition_perm(valid)  # live lanes first
    perm = [a[order] for a in lane_arrays]
    v_p = valid[order]
    cnt = jnp.sum(valid)

    def narrow_case(width):
        def f(args):
            arrs, v = args
            out = fn(*[a[:width] for a in arrs], v[:width])
            state_w, rest = out[0], out[1:]
            state_full = jnp.concatenate([state_w, arrs[n_fill][width:]], axis=0)
            filled = [
                jnp.concatenate(
                    [
                        r,
                        jnp.broadcast_to(
                            f, (n - width,) + r.shape[1:]
                        ).astype(r.dtype),
                    ],
                    axis=0,
                )
                for r, f in zip(rest, fill_values)
            ]
            return (state_full, *filled)

        return f

    def full_case(args):
        arrs, v = args
        return fn(*arrs, v)

    out = _width_ladder(
        cnt, _compact_widths(n, finest), narrow_case, full_case, (perm, v_p)
    )
    return tuple(o[inv] for o in out)


def _compact_apply(fn, live, arrays, fill_values, finest=None):
    """Evaluate the per-lane `fn(*arrays)` at the narrowest sufficient
    ladder width (the _compact_widths rungs — runtime lax.cond),
    with `live` lanes
    sorted to a prefix; dead-lane outputs take `fill_values`. For
    gather-heavy per-lane ops (environment warp/pdf/lookup) whose real
    cost is proportional to width (NOTES.md r5 serialized-gather model).
    Outputs for dead lanes MUST be masked by the caller anyway — fills
    only keep shapes total. Same ulp realization contract as
    modes._compact_decode_rgba."""
    n = live.shape[0]
    order, inv = _partition_perm(live)
    perm = [a[order] for a in arrays]
    cnt = jnp.sum(live)

    def narrow_case(width):
        def f(arrs):
            out = fn(*[a[:width] for a in arrs])
            outs = out if isinstance(out, tuple) else (out,)
            return tuple(
                jnp.concatenate(
                    [
                        r,
                        jnp.broadcast_to(
                            fv, (n - width,) + r.shape[1:]
                        ).astype(r.dtype),
                    ],
                    axis=0,
                )
                for r, fv in zip(outs, fill_values)
            )

        return f

    def full_case(arrs):
        out = fn(*arrs)
        return out if isinstance(out, tuple) else (out,)

    out = _width_ladder(
        cnt, _compact_widths(n, finest), narrow_case, full_case, perm
    )
    return tuple(o[inv] for o in out)


def trace_path(
    config: RenderConfig,
    grid: DeviceGrid,
    params: VolumeParams,
    lut,
    env: EnvState,
    light_dir,
    origin,
    direction,
    state,
):
    """fragment.frag:79-124 vectorized over the ray wavefront."""
    sample_volume, transmittance = get_mode_functions(
        config.mode,
        config.physical_shadows,
        config.physical_majorant,
        compact_decode=config.compact_decode,
        dda_unroll=config.dda_unroll,
        march_ladder=config.march_ladder,
        ladder_factor=config.ladder_factor,
        compact_finest=config.compact_finest,
        pyr_march=getattr(grid, "maj_pyr", None) is not None,
    )
    n = origin.shape[0]

    radiance = jnp.zeros((n, 3), jnp.float32)
    throughput = jnp.ones((n, 3), jnp.float32)
    active = jnp.ones((n,), jnp.bool_)
    n_paths = jnp.zeros((n,), jnp.int32)
    f_p = jnp.zeros((n,), jnp.float32)

    def env_radiance(directions):
        if config.use_env:
            return lookup_environment(env, directions)
        return lookup_environment_light(env, directions, light_dir)

    from volxel_tpu.render.tilemarch import LANES as _TM_LANES

    tile_march_on = (
        config.tile_march
        and config.mode == "raymarch"
        and getattr(grid, "dense", None) is not None
        and n % _TM_LANES == 0
    )

    for bounce in range(config.bounces):
        if tile_march_on and bounce == 0:
            # camera wavefront: micro-tile-coherent (the tiling nests
            # 32x12 micro-tiles when tile_march is on) — the one MC
            # access pattern the bandwidth-bound kernel fits
            bz, nz, ny, nx = config.tile_march_geom
            state, hit, t, rgb, le_add = sample_volume_raymarch_tiled(
                grid, params, lut, origin, direction, state, active,
                bz=bz, neigh=(nz, ny, nx), finest=config.compact_finest,
            )
        elif config.compact_secondary and bounce > 0 and n >= COMPACT_MIN_LANES:
            # extension rays: most lanes are dead after bounce 1
            state, hit, t, rgb, le_add = _compacted_secondary(
                lambda o, d, st, a: sample_volume(grid, params, lut, o, d, st, a),
                2,  # state is lane_arrays[2]
                active,
                (origin, direction, state),
                (False, 0.0, 1.0, 0.0),
                finest=config.compact_finest,
            )
        else:
            state, hit, t, rgb, le_add = sample_volume(
                grid, params, lut, origin, direction, state, active
            )
        hit = hit & active
        miss = active & ~hit
        radiance = radiance + le_add

        # escaped rays: environment contribution with MIS (fragment.frag:117-121)
        if config.show_environment:
            if config.compact_env and n >= COMPACT_MIN_LANES:
                le, pdf_esc = _compact_apply(
                    lambda d: (
                        env_radiance(d),
                        pdf_environment(env, d, config.physical_pdf),
                    ),
                    miss,
                    (direction,),
                    (0.0, 0.0),
                    finest=config.compact_finest,
                )
            else:
                le = env_radiance(direction)
                pdf_esc = pdf_environment(env, direction, config.physical_pdf)
            mis = jnp.where(
                n_paths > 0,
                power_heuristic(f_p, pdf_esc),
                1.0,
            )
            radiance = radiance + jnp.where(
                miss[..., None], throughput * mis[..., None] * le, 0.0
            )
        active = hit

        # advance to the collision and absorb (fragment.frag:81-84 + mode rgb)
        origin = jnp.where(hit[..., None], origin + t[..., None] * direction, origin)
        throughput = jnp.where(
            hit[..., None], throughput * params.albedo * rgb, throughput
        )

        # next-event estimation toward the environment (fragment.frag:86-98).
        # Draws are consumed per-lane exactly as the GLSL does (only inside
        # the loop body = rays that hit) — reference RNG-stream parity,
        # pinned by tests/test_parity_oracle.py.
        state, xi2 = rng2_where(active, state)
        if config.use_env:
            if config.compact_env and n >= COMPACT_MIN_LANES:
                # the warp's gathers serialize per element — run it only
                # at the width the live lanes need
                le_nee, pdf_nee, w_i = _compact_apply(
                    lambda x: sample_environment(env, x, config.physical_pdf),
                    active,
                    (xi2,),
                    (0.0, 0.0, 0.0),
                    finest=config.compact_finest,
                )
            else:
                le_nee, pdf_nee, w_i = sample_environment(
                    env, xi2, config.physical_pdf
                )
        else:
            # analytic light fallback: pure vector math, nothing to compact
            le_nee, pdf_nee, w_i = sample_environment_light(env, xi2, light_dir)
        valid_nee = active & (pdf_nee > 0.0)
        f_p_nee = phase_henyey_greenstein(
            jnp.sum(-direction * w_i, axis=-1), params.phase_g
        )
        mis_nee = (
            power_heuristic(pdf_nee, f_p_nee)
            if config.show_environment
            else jnp.ones((n,), jnp.float32)
        )
        if config.compact_secondary and n >= COMPACT_MIN_LANES:
            state, tr = _compacted_secondary(
                lambda o, w, st, v: transmittance(grid, params, lut, o, w, st, v),
                2,
                valid_nee,
                (origin, w_i, state),
                (0.0,),
                finest=config.compact_finest,
            )
        else:
            state, tr = transmittance(
                grid, params, lut, origin, w_i, state, valid_nee
            )
        radiance = radiance + jnp.where(
            valid_nee[..., None],
            throughput
            * (mis_nee * f_p_nee * tr / jnp.maximum(pdf_nee, 1e-20))[..., None]
            * le_nee,
            0.0,
        )
        n_paths = n_paths + active.astype(jnp.int32)

        # bounce cap (fragment.frag:101)
        active = active & (n_paths < config.bounces)

        # russian roulette: the draw happens only when rr_val < 0.1 on a
        # live lane (fragment.frag:102-107)
        rr_val = luma(throughput)
        low = active & (rr_val < 0.1)
        state, xi_rr = rng_where(low, state)
        killed = low & (xi_rr < 1.0 - rr_val)
        throughput = jnp.where(
            (low & ~killed)[..., None],
            throughput / jnp.maximum(rr_val, 1e-20)[..., None],
            throughput,
        )
        active = active & ~killed

        # scatter draw only for surviving lanes (fragment.frag:110-113)
        state, xi_ph = rng2_where(active, state)
        new_dir = sample_phase_henyey_greenstein(direction, params.phase_g, xi_ph)
        f_p = jnp.where(
            active,
            phase_henyey_greenstein(
                jnp.sum(-direction * new_dir, axis=-1), params.phase_g
            ),
            f_p,
        )
        direction = jnp.where(active[..., None], new_dir, direction)

    return state, radiance


def _debug_hits(config, params, env, light_dir, origin, direction):
    """u_debugHits mode (fragment.frag:147-153)."""
    hit, near, far = ray_box_intersection(
        Rays(origin, direction), params.aabb_lo, params.aabb_hi
    )
    hit_min = jnp.where(
        (near < 0.0)[..., None], origin, origin + near[..., None] * direction
    )
    rgb_hit = (hit_min - params.aabb_lo) / (params.aabb_hi - params.aabb_lo)
    bg = background_color(env, direction, config.hide_envmap, light_dir)
    return jnp.where(hit[..., None], rgb_hit, bg)


def render_pixels(
    config: RenderConfig,
    grid: DeviceGrid,
    params: VolumeParams,
    lut,
    env: EnvState,
    inv_view,
    inv_proj,
    light_dir,
    pixel_index,
    frame_index,
):
    """Render one sample for an explicit pixel-index subset -> (n, 3).

    The building block for sharded rendering: pixel_index is any uint32
    subset of [0, width*height); RNG seeding depends only on the global
    pixel index + frame, so a sharded render is bit-identical to a
    single-device one.
    """
    if (
        config.premul_majorant
        and config.mode == "default"
        and not config.debug_hits
        and getattr(grid, "maj_mips", None) is not None
        and getattr(grid, "maj_alpha", None) is None
        and hasattr(grid, "_replace")
    ):
        from volxel_tpu.render.modes import build_premul_majorant

        maj_alpha = build_premul_majorant(
            grid.maj_mips, params, lut, config.physical_majorant
        )
        maj_mxu = None
        maj_pyr = None
        if _mxu_gather_engaged(config, grid):
            from volxel_tpu.render.sampling import pack_premul_pyramid

            maj_mxu = pack_premul_pyramid(maj_alpha)
        if _pyr_engaged(config, grid):
            from volxel_tpu.render.sampling import pack_premul_pyramid

            maj_pyr = pack_premul_pyramid(maj_alpha, "int8")
        grid = grid._replace(
            maj_alpha=maj_alpha, maj_mxu=maj_mxu, maj_pyr=maj_pyr
        )
    if (
        _mxu_on(config)
        and not config.debug_hits
        and hasattr(grid, "_replace")
        and getattr(grid, "lut_mxu", None) is None
    ):
        from volxel_tpu.render.mxu_gather import pack_gather_table

        grid = grid._replace(lut_mxu=pack_gather_table(jnp.ravel(lut)))
    if (
        _mxu_on(config)
        and not config.debug_hits
        and getattr(env, "warp_d", None) is not None
        and env.warp_d_mxu is None
    ):
        from volxel_tpu.render.mxu_gather import (
            MXU_GATHER_MAX_TABLE,
            pack_gather_table,
        )
        from volxel_tpu.scene.environment import pack_warp_tables

        d_mxu, e_mxu = pack_warp_tables(env.warp_d, env.warp_e)
        envmap_mxu = None
        if env.envmap.size <= MXU_GATHER_MAX_TABLE:
            envmap_mxu = pack_gather_table(env.envmap.reshape(-1))
        env = env._replace(
            warp_d_mxu=d_mxu,
            warp_e_mxu=e_mxu,
            envmap_mxu=envmap_mxu,
            imp0_mxu=pack_gather_table(env.imp_mips[0].reshape(-1)),
        )
    state = seed_rays(pixel_index, frame_index)

    state, j1 = rng2(state)
    state, j2 = rng2(state)
    px = (pixel_index % jnp.uint32(config.width)).astype(jnp.float32)
    py = (pixel_index // jnp.uint32(config.width)).astype(jnp.float32)
    tex = jnp.stack(
        [
            (px + 0.5) / config.width,
            (py + 0.5) / config.height,
        ],
        axis=-1,
    )
    jitter = (j1 + j2) / 2.0
    ndc = tex + (jitter * 2.0 - 1.0) / jnp.array(
        [config.width, config.height], jnp.float32
    )
    rays = camera_rays(inv_view, inv_proj, ndc)

    if config.debug_hits:
        return _debug_hits(config, params, env, light_dir, rays.origin, rays.direction)

    if config.gradient_shading:
        from volxel_tpu.render.shading import trace_shaded

        def shade(origin, direction, st):
            st, out = trace_shaded(
                config, grid, params, lut, env, light_dir, origin, direction, st
            )
            return out

        trace = shade
    else:

        def trace(origin, direction, st):
            st, radiance = trace_path(
                config, grid, params, lut, env, light_dir, origin, direction, st
            )
            return sanitize(radiance)

    n = pixel_index.shape[0]
    chunk = _effective_chunk_size(n, config.chunk_size)
    if chunk is not None:
        chunks = n // chunk

        def one_chunk(args):
            origin, direction, st = args
            return trace(origin, direction, st)

        return jax.lax.map(
            one_chunk,
            (
                rays.origin.reshape(chunks, chunk, 3),
                rays.direction.reshape(chunks, chunk, 3),
                state.reshape(chunks, chunk, 4),
            ),
        ).reshape(n, 3)
    return trace(rays.origin, rays.direction, state)


def _effective_chunk_size(n: int, requested: int | None) -> int | None:
    """Adapt the requested chunk size to this wavefront's lane count.

    Under pixel sharding each device traces n/px lanes, so a chunk size
    picked from the GLOBAL pixel count may not divide the local wavefront;
    falling back to the largest divisor <= requested keeps sharded renders
    chunked instead of silently reverting to one monolithic while_loop.
    """
    if requested is None or n <= requested:
        return None
    k = -(-n // requested)  # smallest chunk count giving chunks <= requested
    while k < n and n % k != 0:
        k += 1
    size = n // k
    return size if 1 < size < n else None


def tile_dims(width: int, height: int, target: int,
              multiple: tuple[int, int] | None = None) -> tuple[int, int] | None:
    """Pick (tw, th) with tw | width, th | height, tw*th <= target,
    maximizing area then squareness. None if no pair reaches >= target/2
    (degenerate dims — band chunking is as good). `multiple` additionally
    constrains tw/th to multiples of (mw, mh) — used by tile_march to
    nest whole micro-tiles inside each chunk tile."""
    div_w = [d for d in range(4, width + 1) if width % d == 0]
    div_h = [d for d in range(4, height + 1) if height % d == 0]
    if multiple is not None:
        mw, mh = multiple
        div_w = [d for d in div_w if d % mw == 0]
        div_h = [d for d in div_h if d % mh == 0]
    best = None
    for tw in div_w:
        for th in div_h:
            a = tw * th
            if a > target:
                continue
            key = (a, -abs(tw - th))
            if best is None or key > best[0]:
                best = (key, (tw, th))
    # need a real 2D tile (>=4 voxels each way) filling most of the chunk
    # budget; otherwise band chunking is as good
    if best is None or best[0][0] * 2 < target:
        return None
    return best[1]


def _tile_permutations(config: RenderConfig):
    """(perm, inv_perm, tile_area) for tile-major chunk ordering, or None.

    perm[j] = the linear pixel index traced by lane j; inv_perm scatters
    the traced radiance back to linear order. Both are computed IN-GRAPH
    from iota (never host constants — the tunnel's remote-compile size
    limit rejects multi-MB program constants)."""
    if not config.tile_chunks or config.chunk_size is None:
        return None
    w, h = config.width, config.height
    micro = None
    if config.tile_march and config.mode == "raymarch":
        # nest whole 32x12 micro-tiles inside each chunk tile so a
        # chunk reshapes to the tile-march kernel's (T, 384) wavefront
        # with box-coherent tiles; still a pure permutation (same
        # estimator contract as tile_chunks)
        from volxel_tpu.render.tilemarch import LANES as _tm_lanes

        micro = (32, _tm_lanes // 32)
        t = tile_dims(w, h, config.chunk_size, multiple=micro)
        if t is None:
            micro = None
            t = tile_dims(w, h, config.chunk_size)
    else:
        t = tile_dims(w, h, config.chunk_size)
    if t is None or t[0] * t[1] >= w * h:
        return None
    tw, th = t
    tiles_x = w // tw
    area = tw * th
    j = jnp.arange(w * h, dtype=jnp.uint32)
    tile_id, within = j // area, j % area
    ty, tx = tile_id // tiles_x, tile_id % tiles_x
    i = j
    x, y = i % w, i // w
    if micro is None:
        wy, wx = within // tw, within % tw
        within_inv = (y % th) * tw + (x % tw)
    else:
        mw, mh = micro
        ma = mw * mh
        micros_x = tw // mw
        mid, mwi = within // ma, within % ma
        wy = (mid // micros_x) * mh + mwi // mw
        wx = (mid % micros_x) * mw + mwi % mw
        lx, ly = x % tw, y % th
        within_inv = ((ly // mh) * micros_x + (lx // mw)) * ma \
            + (ly % mh) * mw + (lx % mw)
    perm = (ty * th + wy) * w + tx * tw + wx
    inv = ((y // th) * tiles_x + (x // tw)) * area + within_inv
    return perm, inv, area


@functools.partial(jax.jit, static_argnums=(0,))
def render_sample(
    config: RenderConfig,
    grid: DeviceGrid,
    params: VolumeParams,
    lut,
    env: EnvState,
    inv_view,
    inv_proj,
    light_dir,
    frame_index,
):
    """Render one progressive sample -> (height*width, 3) float32 radiance.

    Pixel order is row-major with row 0 at the image bottom (GL fragment
    convention); hosts reshape to (height, width, 3) and flip for display.
    """
    n = config.width * config.height
    tiling = _tile_permutations(config)
    if tiling is None:
        pixel_index = jnp.arange(n, dtype=jnp.uint32)
        inv = None
    else:
        pixel_index, inv, area = tiling
        config = config._replace(chunk_size=area)
    out = render_pixels(
        config,
        grid,
        params,
        lut,
        env,
        inv_view,
        inv_proj,
        light_dir,
        pixel_index,
        frame_index,
    )
    return out if inv is None else out[inv]


@functools.partial(jax.jit, static_argnums=(0, 1))
def render_sample_batch(
    n_samples: int,
    config: RenderConfig,
    grid: DeviceGrid,
    params: VolumeParams,
    lut,
    env: EnvState,
    inv_view,
    inv_proj,
    light_dir,
    frame_index,
):
    """Render n_samples consecutive progressive samples in ONE dispatch,
    returning their on-device mean -> (height*width, 3).

    Dispatch amortization for the progressive loop: per-frame host
    round-trips dominate once a sample costs ~0.3 ms. Results are
    bit-compatible with averaging n_samples single calls (same per-sample
    RNG streams keyed by frame_index + i).
    """
    n = config.width * config.height
    tiling = _tile_permutations(config)
    if tiling is None:
        pixel_index = jnp.arange(n, dtype=jnp.uint32)
        inv = None
    else:
        pixel_index, inv, area = tiling
        config = config._replace(chunk_size=area)

    def body(i, acc):
        s = render_pixels(
            config,
            grid,
            params,
            lut,
            env,
            inv_view,
            inv_proj,
            light_dir,
            pixel_index,
            frame_index + i.astype(jnp.uint32),
        )
        return acc + s

    total = jax.lax.fori_loop(0, n_samples, body, jnp.zeros((n, 3), jnp.float32))
    total = total if inv is None else total[inv]
    return total / n_samples


def accumulate(previous, sample, sample_weight):
    """Progressive running average (fragment.frag:158, viewer.ts:1356)."""
    return sample_weight * previous + (1.0 - sample_weight) * sample


WARMUP_SAMPLES = 5  # lowResolutionDuration (viewer.ts:132)


@functools.partial(jax.jit, donate_argnums=(0,))
def accumulate_progressive(previous, sample, frame_index):
    """Fold one sample into the accumulator with the reference's warm-up
    weighting (viewer.ts:1356), computed on-device: frames < WARMUP get
    weight 0 (overwrite), later frames form a running average."""
    f = frame_index.astype(jnp.float32)
    w = jnp.where(
        f < WARMUP_SAMPLES,
        0.0,
        (f - WARMUP_SAMPLES) / (f - WARMUP_SAMPLES + 1.0),
    )
    return w * previous + (1.0 - w) * sample


@functools.partial(jax.jit, static_argnums=())
def tonemap(image, exposure, gamma):
    """Hable/Uncharted2 filmic tonemap + gamma (blit.frag:17-35)."""

    def hable(rgb):
        a, b, c, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
        return ((rgb * (a * rgb + c * b) + d * e) / (rgb * (a * rgb + b) + d * f)) - e / f

    w = jnp.float32(11.2)
    mapped = hable(exposure * image) / hable(w)
    return jnp.power(jnp.clip(mapped, 0.0, None), 1.0 / gamma)
