"""Render core: mode agreement, accumulation, debug modes, exactness checks."""

import numpy as np
import jax.numpy as jnp
import pytest

from volxel_tpu import Renderer
from volxel_tpu.grid import construct_brick_grid
from volxel_tpu.render.pathtrace import tonemap
from volxel_tpu.scene.environment import lookup_environment
from volxel_tpu.utils.fixtures import synthetic_ct_volume


@pytest.fixture(scope="module")
def grid():
    vol = synthetic_ct_volume((32, 32, 32), bits_stored=12)
    return construct_brick_grid(
        vol.astype(np.float32) / vol.max(), transform=np.eye(4, dtype=np.float32)
    )


def _renderer(grid, size=48, **settings):
    r = Renderer(width=size, height=size)
    r.restart_from_grid(grid)
    r.camera.rotate_around_view(0.5, 0.3)
    r.camera.zoom(2.0)
    for k, v in settings.items():
        setattr(r.settings, k, v)
    return r


def test_modes_converge_to_same_image(grid):
    """The three traversal estimators compute the same integral
    (sampling.glsl dispatch; cross-check per SURVEY §4.3)."""
    images = {}
    for mode in ("default", "no_dda", "raymarch"):
        r = _renderer(grid, size=24, bounces=2)
        r.render_mode = mode
        for _ in range(72):
            r.render_frame()
        images[mode] = r.raw_image()
    base = images["default"]
    scale = np.abs(base).mean() + 1e-6
    for mode in ("no_dda", "raymarch"):
        diff = np.abs(images[mode] - base).mean() / scale
        assert diff < 0.12, f"{mode} differs from default by {diff:.3f}"


def test_empty_volume_equals_environment(grid):
    """Zero-alpha transfer -> every ray escapes -> image == env lookup."""
    r = _renderer(grid, size=24)
    r.set_transfer_colors([{"color": [1, 1, 1, 0.0], "stop": 0.0}])
    r.render_frame()
    sample = np.asarray(r._framebuffer).reshape(24, 24, 3)

    # expected: pure environment radiance along the (jittered) camera rays;
    # compare against center-pixel unjittered lookup with loose tolerance
    from volxel_tpu.render.rays import camera_rays, pixel_ndc

    inv_view = jnp.asarray(np.linalg.inv(r.camera.view_matrix()))
    inv_proj = jnp.asarray(np.linalg.inv(r.camera.proj_matrix(1.0)))
    ndc = pixel_ndc(24, 24, jnp.full((24 * 24, 2), 0.5, jnp.float32))
    rays = camera_rays(inv_view, inv_proj, ndc)
    expect = np.asarray(lookup_environment(r.environment.state, rays.direction))
    expect = expect.reshape(24, 24, 3)
    np.testing.assert_allclose(sample, expect, atol=0.35, rtol=0.2)


def test_opaque_volume_blocks_environment(grid):
    """Fully opaque volume: center pixel radiance differs from background."""
    r = _renderer(grid, size=24, bounces=1)
    r.set_transfer_colors([{"color": [0.0, 0.0, 0.0, 1.0], "stop": 0.0}])
    r.render_frame()
    img = np.asarray(r._framebuffer).reshape(24, 24, 3)
    center = img[12, 12]
    # black albedo-ish volume with 1 bounce: radiance should be small
    assert center.max() < 1.0


def test_accumulation_warmup_semantics(grid):
    """Samples 0..4 overwrite (weight 0); sample 5+ average (viewer.ts:1356)."""
    r = _renderer(grid, size=16)
    assert r.sample_weight() == 0.0
    fb_prev = None
    for i in range(5):
        assert r.sample_weight() == 0.0
        fb = np.asarray(r.render_frame())
        fb_prev = fb
    # frame 5: weight 0 -> buffer = new sample entirely
    assert r.sample_weight() == 0.0
    fb5 = np.asarray(r.render_frame())
    # frame 6: weight 1/2
    assert r.sample_weight() == pytest.approx(0.5)
    fb6 = np.asarray(r.render_frame())
    assert not np.allclose(fb6, fb5)


def test_debug_hits_coordinates(grid):
    r = _renderer(grid, size=32, debug_hits=True)
    r.render_frame()
    img = r.raw_image()
    # hit pixels encode [0,1] AABB coordinates; background is checkerboard gray
    assert img.min() >= -1e-5  # float32 rounding at AABB faces
    assert img.max() <= 1.01
    center = img[16, 16]
    assert (center >= -1e-5).all() and (center <= 1 + 1e-5).all()
    assert img.std() > 0.01  # actually shows structure


def test_render_modes_property(grid):
    r = _renderer(grid, size=16)
    with pytest.raises(ValueError):
        r.render_mode = "fancy"
    r.render_mode = "raymarch"
    assert r.render_mode == "raymarch"
    assert r.frame_index == 0  # restart on change


def test_settings_roundtrip(grid):
    r = _renderer(grid, size=16)
    r.settings.bounces = 2
    r.settings.exposure = 3.3
    r.camera.rotate_around_view(0.2, 0.1)
    export = r.export_settings()

    r2 = _renderer(grid, size=16)
    r2.restore_settings(export)
    assert r2.settings.bounces == 2
    assert r2.settings.exposure == 3.3
    np.testing.assert_allclose(r2.camera.pos, r.camera.pos, atol=1e-6)
    export2 = r2.export_settings()
    assert export2["display"] == export["display"]
    assert export2["other"]["cameraPos"] == pytest.approx(export["other"]["cameraPos"])


def test_reference_benchmark_settings_render(grid):
    """The reference repo's real benchmark settings drive a render."""
    import json

    with open("/root/reference/public/benchmark.json") as f:
        bench = json.load(f)
    r = _renderer(grid, size=16)
    r.restore_settings(bench["sharedSettings"][0])
    assert r.settings.bounces == 1
    assert r.settings.max_samples == 500
    r.settings.resolution_factor = 1.0  # keep the tiny test viewport
    img = None
    for _ in range(3):
        img = r.render_frame()
    assert np.isfinite(np.asarray(img)).all()


def test_dense_fetch_matches_brick_path(grid):
    """Pre-decoded dense field == brick indirection path (bf16 tolerance)."""
    from volxel_tpu.render.sampling import device_grid_from_brick

    r = _renderer(grid, size=24, bounces=2)
    imgs = {}
    for label, dense in (("brick", False), ("dense", True)):
        r._device_grid = device_grid_from_brick(grid, dense=dense)
        r.restart_rendering()
        for _ in range(16):
            r.render_frame()
        imgs[label] = r.raw_image()
    scale = np.abs(imgs["brick"]).mean() + 1e-9
    assert np.abs(imgs["dense"] - imgs["brick"]).mean() / scale < 0.02


def test_chunked_wavefront_matches_unchunked(grid):
    """lax.map chunking is a pure scheduling change — bit-identical."""
    from volxel_tpu.render.pathtrace import render_sample
    import jax.numpy as jnp

    r = _renderer(grid, size=16, bounces=2)
    operands = (
        r._device_grid,
        r.volume_params(),
        r._lut,
        r.environment.state,
        jnp.asarray(np.linalg.inv(r.camera.view_matrix())),
        jnp.asarray(np.linalg.inv(r.camera.proj_matrix(1.0))),
        jnp.asarray(r.settings.light_dir, jnp.float32),
        jnp.uint32(0),
    )
    full = np.asarray(render_sample(r._config(), *operands))
    chunked = np.asarray(
        render_sample(r._config()._replace(chunk_size=64), *operands)
    )
    np.testing.assert_allclose(chunked, full, atol=1e-6)


def test_tonemap_hable():
    img = jnp.asarray([[0.0, 0.5, 2.0]], jnp.float32)
    out = np.asarray(tonemap(img, jnp.float32(1.0), jnp.float32(2.2)))
    assert out.shape == (1, 3)
    # black maps to ~0 up to float32 cancellation in hable (the GL shader
    # has the same residual: E/F computed twice in different orders)
    assert out[0, 0] == pytest.approx(0.0, abs=5e-3)
    assert 0 < out[0, 1] < out[0, 2] <= 1.0


def test_clip_box_limits_extent(grid):
    """Clipping the volume to a thin slab shrinks the hit region."""
    r = _renderer(grid, size=32, debug_hits=True)
    r.render_frame()
    full = r.raw_image()
    r.settings.volume_clip_min = [0.45, 0.0, 0.0]
    r.settings.volume_clip_max = [0.55, 1.0, 1.0]
    r.restart_rendering()
    r.render_frame()
    clipped = r.raw_image()
    assert not np.allclose(full, clipped)


def test_physical_shadows_differ_from_reference_quirk(grid):
    """The physical-transmittance extension produces different (softer)
    shadows than the reference's binary quirk, and stays finite."""
    imgs = {}
    for flag in (False, True):
        r = _renderer(grid, size=24, bounces=1)
        r.settings.physical_shadows = flag
        r.restart_rendering()
        for _ in range(24):
            r.render_frame()
        imgs[flag] = r.raw_image()
        assert np.isfinite(imgs[flag]).all()
    assert not np.allclose(imgs[False], imgs[True])
    # physical transmittance can only let MORE light through than the
    # binary quirk (Tr_quirk = 0 <= Tr_phys on every shadow ray)
    assert imgs[True].mean() >= imgs[False].mean() - 1e-4


def test_settings_roundtrip_full_transfer(grid):
    """FULL-type transfer functions survive export -> verify -> restore."""
    r = _renderer(grid, size=16)
    rows = [[0.0, 0.0, 0.0, 0.0], [0.2, 0.4, 0.6, 0.5], [1.0, 1.0, 1.0, 1.0]]
    r.set_transfer_full(rows)
    export = r.export_settings()
    assert export["transfer"]["transfer"]["type"] == "full"

    r2 = _renderer(grid, size=16)
    r2.restore_settings(export)
    assert r2._transfer_type == "full"
    np.testing.assert_allclose(np.asarray(r2._lut), np.asarray(rows), atol=1e-6)
    r2.render_frame()


def test_bf16_majorant_statistical_agreement():
    """Opt-in bf16 majorant pyramid (rounded up, still a valid bound):
    the estimator stays unbiased, so converged means must agree with the
    f32-pyramid render within MC noise; and the pyramid must still
    dominate the f32 one pointwise (conservativeness)."""
    import jax.numpy as jnp

    from volxel_tpu.api.renderer import Renderer
    from volxel_tpu.render.pathtrace import render_sample
    from volxel_tpu.render.sampling import device_grid_from_brick
    from volxel_tpu.utils.fixtures import synthetic_ct_volume

    vol = synthetic_ct_volume((24, 24, 24), bits_stored=12)
    grid = construct_brick_grid(
        vol.astype(np.float32) / vol.max(), transform=np.eye(4, dtype=np.float32)
    )
    stats = {}
    for maj_dtype in ("float32", "bfloat16"):
        r = Renderer(width=16, height=16)
        r.restart_from_grid(grid)
        r._device_grid = device_grid_from_brick(grid, maj_dtype=maj_dtype)
        r.camera.rotate_around_view(0.4, 0.2)
        r.camera.zoom(2.0)
        r.settings.bounces = 1
        r.render_frame()
        ops = r._cached_operands
        samples = np.stack([
            np.asarray(render_sample(*ops, jnp.uint32(i))) for i in range(48)
        ])
        stats[maj_dtype] = (samples.mean(0), samples.var(0) / len(samples))
    mean_f, varm_f = stats["float32"]
    mean_b, varm_b = stats["bfloat16"]
    se = np.sqrt(varm_f + varm_b)
    z = np.abs(mean_f - mean_b) / np.maximum(se, 1e-6)
    frac_ok = float((z.max(axis=-1) < 5.0).mean())
    assert frac_ok > 0.98, f"bf16 majorant biased the estimator (max z {z.max():.1f})"
    assert abs(mean_f.mean() - mean_b.mean()) < 4 * np.sqrt(
        (varm_f.mean() + varm_b.mean()) / mean_f.size
    ) + 1e-4


def test_physical_majorant_fixes_dda_bright_bias():
    """The physical_majorant extension (prefix-max alpha envelope,
    modes._majorant_alpha): with the benchmark's NON-monotone transfer
    ramp the reference's majorant rule clips real-collision
    probabilities and the default mode renders systematically bright vs
    no_dda (test_parity_large.py measured +26% at 128^3). The envelope
    must remove most of that gap while staying a valid bound."""
    import json
    from pathlib import Path

    import jax.numpy as jnp

    from volxel_tpu.render.pathtrace import render_sample

    fixture = Path(__file__).parent / "fixtures" / "reference_benchmark.json"
    vol = synthetic_ct_volume((64, 64, 64), bits_stored=12)
    big_grid = construct_brick_grid(
        vol.astype(np.float32) / vol.max(), transform=np.eye(4, dtype=np.float32)
    )

    means = {}
    for tag, mode, pm in (
        ("plain", "default", False),
        ("envelope", "default", True),
        ("no_dda", "no_dda", False),
    ):
        r = Renderer(width=32, height=32)
        r.restart_from_grid(big_grid)
        r.restore_settings(json.loads(fixture.read_text())["sharedSettings"][0])
        r.settings.resolution_factor = 1.0
        r.render_mode = mode
        r.settings.physical_majorant = pm
        r.render_frame()
        ops = r._cached_operands
        acc = np.zeros((32 * 32, 3))
        n = 48
        for i in range(n):
            acc += np.asarray(render_sample(*ops, jnp.uint32(i)), np.float64)
        means[tag] = acc / n

    gap_plain = abs(means["plain"].mean() - means["no_dda"].mean())
    gap_env = abs(means["envelope"].mean() - means["no_dda"].mean())
    # the clipping bias must exist on this scene (canary) ...
    assert gap_plain > 0.02 * means["no_dda"].mean()
    # ... and the envelope must remove most of it
    assert gap_env < 0.5 * gap_plain, (
        f"envelope left {gap_env:.4f} of a {gap_plain:.4f} gap"
    )


def test_warmup_low_res_preview(grid):
    """settings.warmup_low_res replicates the reference's responsiveness
    drop (0.33 resolutionFactor for the first 5 frames,
    viewer.ts:132,1185-1188): warm-up frames produce a display-only
    low-res preview, and the CONVERGED accumulation is bit-identical to
    the full-res path (warm-up samples have zero weight either way)."""
    imgs = {}
    fbs = {}
    for warm in (False, True):
        r = _renderer(grid, size=24, bounces=1)
        r.settings.warmup_low_res = warm
        for i in range(3):
            r.render_frame()
        imgs[warm] = r.image()
        # continue past warm-up: accumulation must converge identically
        for i in range(3, 8):
            r.render_frame()
        fbs[warm] = np.asarray(r._framebuffer)
        assert r.image().shape == (24, 24, 3)
    # during warm-up the preview is a different (coarser) picture
    assert imgs[True].shape == imgs[False].shape
    assert not np.array_equal(imgs[True], imgs[False])
    # and the post-warm-up accumulation is bit-identical
    np.testing.assert_array_equal(fbs[True], fbs[False])


def test_render_batched_with_warmup_low_res(grid):
    """Regression (advisor r3, medium): Renderer.render(samples > 6) with
    warmup_low_res=True crashed — the cache-priming render_frame() took the
    warm-up preview branch and never built _cached_operands. The batched
    render must work and match the warmup-off batched render bit-exactly
    (warm-up frames are display-only)."""
    imgs = {}
    for warm in (False, True):
        r = _renderer(grid, size=24, bounces=1)
        r.settings.warmup_low_res = warm
        imgs[warm] = r.render(samples=9)
    np.testing.assert_array_equal(imgs[True], imgs[False])


def test_compact_secondary_bit_identical(grid):
    """RenderConfig.compact_secondary (sorted half-width secondary
    wavefront) is advertised bit-identical in docs/PARITY.md — pin it.
    The guarantee rests on the per-lane masked-RNG invariant: compaction
    only permutes lanes, every lane's draw sequence is a function of its
    own state (render/rng.py), so any reordering renders the same image.
    Rendered at 128x128 = COMPACT_MIN_LANES so the compacted path (which
    only engages at real wavefront widths) is actually exercised."""
    from volxel_tpu.render.pathtrace import COMPACT_MIN_LANES, render_sample

    r = _renderer(grid, size=128, bounces=3)
    r.render_frame()  # build operands
    config, *rest = r._cached_operands
    assert config.width * config.height >= COMPACT_MIN_LANES
    images = {}
    for flag in (False, True):
        # compact_decode pinned OFF: at this width (= the compact gate)
        # the compacted decode ladder runs at arm-dependent widths, whose
        # position-dependent transcendental rounding would mask the
        # permutation invariant this test pins (see
        # test_compact_decode_same_estimator_wide for that contract).
        cfg = config._replace(compact_secondary=flag, compact_decode=False)
        images[flag] = np.asarray(render_sample(cfg, *rest, jnp.uint32(7)))
    np.testing.assert_array_equal(images[True], images[False])


def test_premul_majorant_bit_identity(grid):
    """RenderConfig.premul_majorant folds transfer alpha + scaling into
    the majorant pyramid in-graph (modes.build_premul_majorant) so the DDA
    march gathers once per step. The builder runs the exact inline
    per-element op chain (individually rounded f32 multiplies, no mul+add
    pairs to FMA-contract), so renders must be BIT-identical — both with
    the reference majorant rule and with the physical_majorant envelope."""
    from volxel_tpu.render.pathtrace import render_sample

    for phys in (False, True):
        r = _renderer(grid, size=32, bounces=2, physical_majorant=phys)
        r.render_frame()
        config, *rest = r._cached_operands
        images = {}
        for flag in (False, True):
            cfg = config._replace(premul_majorant=flag)
            images[flag] = np.asarray(render_sample(cfg, *rest, jnp.uint32(9)))
        np.testing.assert_array_equal(images[True], images[False])


def test_compact_decode_bit_identical_small(grid):
    """RenderConfig.compact_decode swaps the two-phase DDA for the
    single-loop compacted-collision-decode form
    (modes.sample_volume_dda_compact / transmittance_dda_compact). Below
    modes.COMPACT_DECODE_MIN_LANES lanes the decode falls back to full
    width, where the variant must be BIT-identical to the two-phase form
    — this pins that the per-lane op + RNG-draw sequences are the same
    loop restructured, not a different estimator. Covers the physical
    transmittance/majorant branches too."""
    from volxel_tpu.render.modes import COMPACT_DECODE_MIN_LANES
    from volxel_tpu.render.pathtrace import render_sample

    for phys in (False, True):
        r = _renderer(
            grid, size=32, bounces=3,
            physical_shadows=phys, physical_majorant=phys,
        )
        r.render_frame()
        config, *rest = r._cached_operands
        assert config.width * config.height < COMPACT_DECODE_MIN_LANES
        images = {}
        for flag in (False, "loop", "phase2", "mixed"):
            cfg = config._replace(compact_decode=flag)
            images[flag] = np.asarray(render_sample(cfg, *rest, jnp.uint32(11)))
        np.testing.assert_array_equal(images["loop"], images[False])
        np.testing.assert_array_equal(images["phase2"], images[False])
        np.testing.assert_array_equal(images["mixed"], images[False])

    # no_dda: compact_decode compacts the per-event decode to the running
    # lanes (modes.sample_volume_simple(compact=True)) — same fallback
    # guarantee below the gate
    r = _renderer(grid, size=32, bounces=2)
    r.render_mode = "no_dda"
    r.render_frame()
    config, *rest = r._cached_operands
    images = {}
    for flag in (False, "loop"):
        cfg = config._replace(compact_decode=flag)
        images[flag] = np.asarray(render_sample(cfg, *rest, jnp.uint32(11)))
    np.testing.assert_array_equal(images["loop"], images[False])


def test_march_ladder_same_estimator(grid, monkeypatch):
    """RenderConfig.march_ladder (in-loop shrink ladder: the march
    while_loop exits when the running count fits the next rung, lanes
    are stable-sorted to a prefix, the march continues narrower —
    modes._ladder_rungs). Per-lane op + masked-draw sequences are
    unchanged, so the same-estimator contract of compact_decode applies;
    pin it with the gate lowered so the ladder actually engages and
    hands off lanes at test scale. Covers the physical branches (the
    transmittance ladder) and the capped-march freeze path implicitly."""
    import volxel_tpu.render.modes as modes
    from volxel_tpu.render.pathtrace import render_sample, render_sample_batch

    monkeypatch.setattr(modes, "COMPACT_DECODE_MIN_LANES", 256)
    for phys in (False, True):
        r = _renderer(
            grid, size=48, bounces=2,
            physical_shadows=phys, physical_majorant=phys,
        )
        r.render_frame()
        config, *rest = r._cached_operands
        # 2+ rungs at this width — the ladder really runs
        assert len(modes._ladder_rungs(config.width * config.height)) > 1
        cfgs = {
            flag: config._replace(march_ladder=flag) for flag in (False, True)
        }
        # finer rungs (RenderConfig.ladder_factor=2) share the contract
        cfgs[2] = config._replace(march_ladder=True, ladder_factor=2)
        one = {
            flag: np.asarray(render_sample(cfg, *rest, jnp.uint32(5)))
            for flag, cfg in cfgs.items()
        }
        n = one[False].shape[0]
        for arm in (True, 2):
            diff_pixels = int((one[arm] != one[False]).any(axis=-1).sum())
            assert diff_pixels <= max(2, n // 200), (
                f"march_ladder(phys={phys}, arm={arm}): {diff_pixels}/{n} "
                "pixels differ — the ladder is no longer a pure width "
                "restructure"
            )
        if not phys:
            mean = {
                flag: np.asarray(render_sample_batch(32, cfg, *rest, jnp.uint32(0)))
                for flag, cfg in cfgs.items()
            }
            np.testing.assert_allclose(mean[True], mean[False], atol=0.08)
            assert np.abs(mean[True] - mean[False]).mean() < 2e-3

    # no_dda / raymarch: the same ladder narrows the delta/ratio-tracking
    # event loops (modes.sample_volume_simple ladder=) and the raymarch
    # step loop (modes.sample_volume_raymarch ladder=)
    for mode in ("no_dda", "raymarch"):
        r = _renderer(grid, size=48, bounces=2)
        r.render_mode = mode
        r.render_frame()
        config, *rest = r._cached_operands
        one = {}
        for flag in (False, True):
            cfg = config._replace(march_ladder=flag)
            one[flag] = np.asarray(render_sample(cfg, *rest, jnp.uint32(5)))
        n = one[False].shape[0]
        diff_pixels = int((one[True] != one[False]).any(axis=-1).sum())
        assert diff_pixels <= max(2, n // 200), mode
        np.testing.assert_allclose(one[True], one[False], atol=0.5)


def test_dda_unroll_bit_identical(grid):
    """RenderConfig.dda_unroll runs K march steps per two-phase inner
    while_loop iteration. The march consumes no RNG and every update is
    masked, so any unroll must render BIT-identically (the `it < cap`
    march guard + any(march) iteration increment reproduce the rolled
    loop's exits exactly, even at round boundaries)."""
    from volxel_tpu.render.pathtrace import render_sample

    r = _renderer(grid, size=32, bounces=3, physical_shadows=True)
    r.render_frame()
    config, *rest = r._cached_operands
    images = {
        k: np.asarray(
            render_sample(config._replace(dda_unroll=k), *rest, jnp.uint32(13))
        )
        for k in (1, 3, 4)
    }
    np.testing.assert_array_equal(images[3], images[1])
    np.testing.assert_array_equal(images[4], images[1])


def test_compact_decode_same_estimator_wide(grid, monkeypatch):
    """At compacted widths the decode runs at a lane-count-dependent
    width (n/8..n lax.cond ladder), so the tile_chunks ulp contract
    applies: XLA rounds fused transcendentals position-dependently, an
    ulp can flip a stochastic compare, and a FEW pixels may render a
    different equally-valid realization. Pin that contract (almost all
    pixels bit-equal, converged images agree) with the gate lowered so
    the compacted ladder actually runs at test scale."""
    import volxel_tpu.render.modes as modes
    from volxel_tpu.render.pathtrace import render_sample, render_sample_batch

    monkeypatch.setattr(modes, "COMPACT_DECODE_MIN_LANES", 256)
    r = _renderer(grid, size=48, bounces=2)
    r.render_frame()
    config, *rest = r._cached_operands
    arms = (False, "loop", "loop-spatial", "phase2")
    cfgs = {flag: config._replace(compact_decode=flag) for flag in arms}
    one = {
        flag: np.asarray(render_sample(cfg, *rest, jnp.uint32(5)))
        for flag, cfg in cfgs.items()
    }
    mean = {
        flag: np.asarray(render_sample_batch(32, cfg, *rest, jnp.uint32(0)))
        for flag, cfg in cfgs.items()
    }
    n = one[False].shape[0]
    for flag in ("loop", "loop-spatial", "phase2"):
        diff_pixels = int((one[flag] != one[False]).any(axis=-1).sum())
        assert diff_pixels <= max(2, n // 200), (
            f"{flag}: {diff_pixels}/{n} pixels differ — compact_decode is no "
            "longer a near-pure restructure; investigate before shipping"
        )
        np.testing.assert_allclose(mean[flag], mean[False], atol=0.08)
        assert np.abs(mean[flag] - mean[False]).mean() < 2e-3


def test_compact_env_same_estimator(grid, monkeypatch):
    """RenderConfig.compact_env (ladder-compacted NEE env warp + escape
    lookup/pdf, default ON) pins its contract: dead-lane fills never leak
    (they are masked by valid_nee/miss), live-lane values match the
    full-width evaluation up to the ulp realization contract."""
    import volxel_tpu.render.pathtrace as pt
    from volxel_tpu.render.pathtrace import render_sample, render_sample_batch

    monkeypatch.setattr(pt, "COMPACT_MIN_LANES", 256)
    r = _renderer(grid, size=48, bounces=3)
    r.render_frame()
    config, *rest = r._cached_operands
    assert config.use_env  # NEE warp compaction only engages on the env path
    cfgs = {flag: config._replace(compact_env=flag) for flag in (False, True)}
    one = {
        flag: np.asarray(render_sample(cfg, *rest, jnp.uint32(5)))
        for flag, cfg in cfgs.items()
    }
    n = one[True].shape[0]
    diff_pixels = int((one[True] != one[False]).any(axis=-1).sum())
    assert diff_pixels <= max(2, n // 200), (
        f"{diff_pixels}/{n} pixels differ — compact_env fills are leaking "
        "or the compaction is no longer near-pure"
    )
    mean = {
        flag: np.asarray(render_sample_batch(32, cfg, *rest, jnp.uint32(0)))
        for flag, cfg in cfgs.items()
    }
    np.testing.assert_allclose(mean[True], mean[False], atol=0.08)
    assert np.abs(mean[True] - mean[False]).mean() < 2e-3


def test_tile_dims_selection():
    from volxel_tpu.render.pathtrace import tile_dims

    # the 1080p benchmark shape: max-area divisor pair, squarest tie-break
    assert tile_dims(1920, 1080, 129600) == (480, 270)
    # degenerate dims (prime width, tiny target) fall back to bands
    assert tile_dims(1913, 1080, 1000) is None
    # target >= full frame -> the whole image is one tile (caller skips)
    tw, th = tile_dims(64, 64, 64 * 64)
    assert tw * th == 64 * 64


def test_tile_chunks_same_estimator(grid):
    """RenderConfig.tile_chunks (tile-major chunk ordering, default ON)
    pins its contract: a pure lane permutation with an unchanged per-lane
    RNG/draw protocol. XLA rounds fused transcendentals
    position-dependently at the ulp level, and an ulp can flip a
    stochastic collision compare — so a FEW pixels (measured 1/2304 on
    CPU at this scene, ~0.01% on TPU at 1080p) may render a different
    equally-valid realization than the band order (NOTES r5). Contract:
    almost all pixels bit-equal per sample, converged images agree."""
    from volxel_tpu.render.pathtrace import render_sample, render_sample_batch

    r = _renderer(grid, size=48, bounces=2)
    r.render_frame()
    config, *rest = r._cached_operands
    cfgs = {
        "tiles": config._replace(chunk_size=16 * 12, tile_chunks=True),
        "bands": config._replace(chunk_size=16 * 12, tile_chunks=False),
    }
    one = {
        tag: np.asarray(render_sample(cfg, *rest, jnp.uint32(5)))
        for tag, cfg in cfgs.items()
    }
    n = one["tiles"].shape[0]
    diff_pixels = int((one["tiles"] != one["bands"]).any(axis=-1).sum())
    assert diff_pixels <= max(2, n // 200), (
        f"{diff_pixels}/{n} pixels differ — tile ordering is no longer a "
        "near-pure permutation; investigate before shipping"
    )
    mean = {
        tag: np.asarray(render_sample_batch(32, cfg, *rest, jnp.uint32(0)))
        for tag, cfg in cfgs.items()
    }
    np.testing.assert_allclose(mean["tiles"], mean["bands"], atol=0.08)
    assert np.abs(mean["tiles"] - mean["bands"]).mean() < 2e-3


def test_pair_decode_bit_identical(grid):
    """Renderer(pair_decode=True) packs x-adjacent bf16 taps into one
    uint32 element so the trilinear decode fetches 8 taps with 4
    serialized gathers (sampling.pack_dense_pairs). Tap values and
    accumulation order replicate _trilinear_acc exactly, so renders are
    BIT-identical — including boundary columns, where the pair's high
    half must not leak (the x1-at-clip(0) select)."""
    images = {}
    for flag in (False, True):
        r = Renderer(width=48, height=48, pair_decode=flag, octo_decode=False)
        r.restart_from_grid(grid)
        r.camera.rotate_around_view(0.5, 0.3)
        # close zoom: rays graze the AABB so boundary taps are exercised
        r.camera.zoom(0.6)
        r.settings.bounces = 2
        for _ in range(3):
            r.render_frame()
        images[flag] = np.asarray(r._framebuffer)
    np.testing.assert_array_equal(images[True], images[False])
    # and directly on the lookup, including out-of-volume positions
    from volxel_tpu.render.sampling import (
        device_grid_from_brick,
        lookup_density_trilinear,
        pack_dense_pairs,
    )

    dg = device_grid_from_brick(grid)
    dgp = dg._replace(dense_pair=pack_dense_pairs(dg.dense))
    r = _renderer(grid, size=8)
    params = r.volume_params()
    rng = np.random.default_rng(13)
    ext = np.asarray(dg.extent, np.float32)
    pos = jnp.asarray(
        (rng.random((5000, 3)) * (ext + 6.0) - 3.0).astype(np.float32)
    )
    want = np.asarray(lookup_density_trilinear(dg, params, pos))
    got = np.asarray(lookup_density_trilinear(dgp, params, pos))
    np.testing.assert_array_equal(
        got.view(np.uint32), want.view(np.uint32)
    )


def test_partition_perm_matches_argsort():
    """modes._partition_perm must produce the EXACT stable-partition
    permutation of argsort(~mask) and its inverse — every compaction
    site's bit-identity rests on this equivalence."""
    from volxel_tpu.render.modes import _inverse_perm, _partition_perm

    rng = np.random.default_rng(17)
    # 12960 rides the MXU cumsum (_cumsum_mxu) at a production-like
    # non-multiple-of-128 width; 1025 is the engagement boundary + 1
    for n in (1, 7, 256, 1025, 4096, 12960):
        for p in (0.0, 0.03, 0.5, 0.97, 1.0):
            mask = jnp.asarray(rng.random(n) < p)
            order, inv = _partition_perm(mask)
            want_order = np.argsort(~np.asarray(mask), kind="stable")
            np.testing.assert_array_equal(np.asarray(order), want_order)
            np.testing.assert_array_equal(
                np.asarray(inv), np.argsort(want_order, kind="stable")
            )
            perm = rng.permutation(n).astype(np.int32)
            np.testing.assert_array_equal(
                np.asarray(_inverse_perm(jnp.asarray(perm))),
                np.argsort(perm, kind="stable"),
            )


def test_quad_decode_bit_identical(grid):
    """Renderer(quad_decode=True) packs the 4 xy-plane bf16 taps of a
    trilinear stencil into one complex64 element so the decode fetches 8
    taps with 2 serialized gathers (sampling.pack_dense_quads). Tap
    values and accumulation order replicate _trilinear_acc exactly, so
    renders are BIT-identical — including boundary rows/columns, where
    the high halves must not leak (the x1/y1-at-clip(0) selects)."""
    images = {}
    for flag in (False, True):
        r = Renderer(
            width=48, height=48, pair_decode=False, quad_decode=flag,
            octo_decode=False,
        )
        r.restart_from_grid(grid)
        r.camera.rotate_around_view(0.5, 0.3)
        # close zoom: rays graze the AABB so boundary taps are exercised
        r.camera.zoom(0.6)
        r.settings.bounces = 2
        for _ in range(3):
            r.render_frame()
        images[flag] = np.asarray(r._framebuffer)
    np.testing.assert_array_equal(images[True], images[False])
    # and directly on the lookup, including out-of-volume positions
    from volxel_tpu.render.sampling import (
        device_grid_from_brick,
        lookup_density_trilinear,
        pack_dense_quads,
    )

    dg = device_grid_from_brick(grid)
    dgq = dg._replace(dense_quad=pack_dense_quads(dg.dense))
    r = _renderer(grid, size=8)
    params = r.volume_params()
    rng = np.random.default_rng(13)
    ext = np.asarray(dg.extent, np.float32)
    pos = jnp.asarray(
        (rng.random((5000, 3)) * (ext + 6.0) - 3.0).astype(np.float32)
    )
    want = np.asarray(lookup_density_trilinear(dg, params, pos))
    got = np.asarray(lookup_density_trilinear(dgq, params, pos))
    np.testing.assert_array_equal(
        got.view(np.uint32), want.view(np.uint32)
    )


def test_octo_decode_bit_identical(grid):
    """Renderer(octo_decode=True) packs ALL 8 bf16 taps of the trilinear
    stencil into one (Z, Y, X, 4)-uint32 row so the decode is ONE row
    gather (sampling.pack_dense_octo). Tap values and accumulation order
    replicate _trilinear_acc exactly, so renders are BIT-identical —
    including boundary planes, where the shifted channels must not leak
    (the x1/y1/z1-at-clip(0) selects)."""
    images = {}
    for flag in (False, True):
        r = Renderer(width=48, height=48, pair_decode=False, octo_decode=flag)
        r.restart_from_grid(grid)
        r.camera.rotate_around_view(0.5, 0.3)
        # close zoom: rays graze the AABB so boundary taps are exercised
        r.camera.zoom(0.6)
        r.settings.bounces = 2
        for _ in range(3):
            r.render_frame()
        images[flag] = np.asarray(r._framebuffer)
    np.testing.assert_array_equal(images[True], images[False])
    # and directly on the lookup, including out-of-volume positions
    from volxel_tpu.render.sampling import (
        device_grid_from_brick,
        lookup_density_trilinear,
        pack_dense_octo,
    )

    dg = device_grid_from_brick(grid)
    dgo = dg._replace(dense_octo=pack_dense_octo(dg.dense))
    r = _renderer(grid, size=8)
    params = r.volume_params()
    rng = np.random.default_rng(13)
    ext = np.asarray(dg.extent, np.float32)
    pos = jnp.asarray(
        (rng.random((5000, 3)) * (ext + 6.0) - 3.0).astype(np.float32)
    )
    want = np.asarray(lookup_density_trilinear(dg, params, pos))
    got = np.asarray(lookup_density_trilinear(dgo, params, pos))
    np.testing.assert_array_equal(
        got.view(np.uint32), want.view(np.uint32)
    )


def test_octo_auto_budget(grid):
    """octo_decode="auto" engages while the 16 B/voxel packed field fits
    OCTO_BUDGET_BYTES and falls back to pair_decode beyond it (a 1024^3
    volume would need 16 GiB — more than a v5e's whole HBM)."""
    import volxel_tpu.render.sampling as sampling

    r = Renderer(width=8, height=8)
    r.restart_from_grid(grid)
    assert r._device_grid.dense_octo is not None
    assert r._device_grid.dense_pair is None
    old = sampling.OCTO_BUDGET_BYTES
    sampling.OCTO_BUDGET_BYTES = 1
    try:
        r2 = Renderer(width=8, height=8)
        r2.restart_from_grid(grid)
        assert r2._device_grid.dense_octo is None
        assert r2._device_grid.dense_pair is not None
    finally:
        sampling.OCTO_BUDGET_BYTES = old
