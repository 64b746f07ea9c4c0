"""Shear-warp DVR: XLA reference vs Pallas kernel (render/shearwarp.py).

North-star Pallas item, attempt #2. The Pallas kernel streams slices
through VMEM with persistent accumulators; on CPU it runs in interpreter
mode (Mosaic semantics, no hardware), the TPU A/B lives in
bench_shearwarp.py / NOTES.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volxel_tpu.render.shearwarp import (
    render_dvr,
    shear_parameters,
)
from volxel_tpu.transfer.function import generate_transfer_function


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    vol = np.zeros((32, 24, 40), np.float32)
    vol[8:24, 6:18, 10:30] = rng.random((16, 12, 20)).astype(np.float32)
    lut = jnp.asarray(
        generate_transfer_function(
            [
                {"color": [1.0, 0.5, 0.2, 0.3], "stop": 0.0},
                {"color": [0.2, 0.6, 1.0, 0.9], "stop": 1.0},
            ]
        )
    )
    return jnp.asarray(vol), lut


def test_shear_parameters_axes():
    perm, flip, sx, sy = shear_parameters([0.1, 0.2, 0.9])
    assert perm == (0, 1, 2) and not flip
    perm, flip, _, _ = shear_parameters([0.1, 0.2, -0.9])
    assert flip
    perm, _, sx, sy = shear_parameters([-0.9, 0.1, 0.2])
    assert perm == (2, 1, 0)
    # shear magnitudes never exceed 1 (principal axis dominates)
    for vd in ([0.5, 0.5, 0.6], [1, 1, 1], [-0.7, 0.2, 0.7]):
        _, _, sx, sy = shear_parameters(vd)
        assert abs(sx) <= 1.0 + 1e-9 and abs(sy) <= 1.0 + 1e-9


@pytest.mark.parametrize(
    "view_dir", [[0.2, 0.3, 0.9], [-0.9, 0.1, 0.3], [0.1, -0.8, 0.2], [0, 0, 1]]
)
def test_pallas_matches_xla(scene, view_dir):
    vol, lut = scene
    cx, tx = render_dvr(vol, lut, view_dir, vol_maj=1.0, use_pallas=False)
    cp, tp = render_dvr(
        vol, lut, view_dir, vol_maj=1.0, use_pallas=True, interpret=True
    )
    assert cx.shape == cp.shape
    np.testing.assert_allclose(np.asarray(cx), np.asarray(cp), atol=2e-5)
    np.testing.assert_allclose(np.asarray(tx), np.asarray(tp), atol=2e-5)


def test_dvr_renders_content(scene):
    vol, lut = scene
    c, t = render_dvr(vol, lut, [0.2, 0.3, 0.9], vol_maj=1.0, use_pallas=False)
    c, t = np.asarray(c), np.asarray(t)
    assert np.isfinite(c).all() and c.max() > 0.05
    assert (t >= 0).all() and (t <= 1).all()
    assert t.min() < 0.9  # the box actually absorbs


def test_dvr_energy_conservation(scene):
    """C + T <= 1 per channel when LUT colors are <= 1 (over-operator)."""
    vol, lut = scene
    c, t = render_dvr(vol, lut, [0.3, 0.2, 0.9], vol_maj=1.0, use_pallas=False)
    assert (np.asarray(c).max(axis=-1) <= 1.0 - np.asarray(t) + 1e-5).all()


def test_gather_probe():
    """Documents the Mosaic gather surface this design is built around:
    same-shape row-local take_along_axis with 128-wide rows lowers; that
    covers the 128-entry transfer LUT but NOT per-ray volume taps — hence
    shear-warp (gather-free slice translation) rather than a Pallas DDA.
    Runs in interpreter mode on CPU; on TPU hardware the same op was
    verified to lower natively. Round-3 re-probe on hardware (NOTES.md):
    gathers are confined to ONE vreg along the gathered dimension
    ("Multiple source vregs along gather dimension") — axis-0 gathers span
    at most 8 sublanes, axis-1 at most 128 lanes, and flat/arbitrary-index
    forms reject with "Only 2D gather is supported". A Pallas MC raymarch
    over a VMEM-resident volume therefore cannot express its per-ray taps;
    the evidence lives here so future Mosaic releases can be re-tested.

    Round-4 re-probe (jax 0.9.0, one v5e via axon, 2026-08-17): status
    unchanged — axis-1 row-local take_along_axis lowers and runs;
    axis-0 gather over a 512-row table and flat 1-D `table[idx]` both
    reject ("Only 2D gather is supported" / multi-vreg); no
    dynamic_gather symbol exists in pallas.tpu. The VMEM-resident
    majorant-pyramid DDA kernel remains inexpressible.

    Round-5 re-probe (jax 0.9.0, same chip, later in 2026-08-17):
    unchanged — axis-1 lowers+runs, axis-0 512-row and flat 1-D forms
    still reject, no *gather* symbol in pallas.tpu's namespace. Door
    still closed."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.random((256, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 128, (256, 128)), jnp.int32)

    def k(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

    with pltpu.force_tpu_interpret_mode():
        out = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
    assert np.array_equal(
        np.asarray(out), np.take_along_axis(np.asarray(tab), np.asarray(idx), 1)
    )


def test_renderer_dvr_preview():
    """Renderer.render_dvr end-to-end on a loaded volume."""
    from volxel_tpu import Renderer
    from volxel_tpu.grid import construct_brick_grid
    from volxel_tpu.utils.fixtures import synthetic_ct_volume

    vol = synthetic_ct_volume((24, 24, 24), bits_stored=12)
    r = Renderer(width=32, height=32)
    r.restart_from_grid(
        construct_brick_grid(
            vol.astype(np.float32) / vol.max(),
            transform=np.eye(4, dtype=np.float32),
        )
    )
    r.camera.rotate_around_view(0.4, 0.25)
    img = r.render_dvr(use_pallas=False)
    assert img.ndim == 3 and img.shape[2] == 3
    assert np.isfinite(img).all()
    assert img.max() > 0.01


@pytest.mark.parametrize(
    "d",
    [
        (2.0, 1.0, 1.0),   # x principal
        (-2.0, 1.0, 1.0),  # x principal, flipped
        (1.0, 2.0, 1.0),   # y principal
        (1.0, 1.0, 2.0),   # z principal
        (1.0, 1.0, -2.0),  # z principal, flipped
    ],
)
def test_shear_collinear_voxels_align(d):
    """Two voxels collinear with the view ray land on the SAME intermediate
    pixel — the defining property of the shear factorization. Pins the
    (sx, sy) component mapping per principal axis (ADVICE r2: x-principal
    views previously drifted along Z instead of Y)."""
    import numpy as np

    from volxel_tpu.render.shearwarp import render_dvr

    n = 12
    vol = np.zeros((n, n, n), np.float32)
    p0 = np.array([4, 4, 4], np.float64)  # (x, y, z)
    p1 = p0 + np.asarray(d)  # next lattice point along the ray
    assert np.allclose(p1, np.round(p1)), "test construction: lattice-aligned"
    for p in (p0, p1.round()):
        x, y, z = (int(v) for v in p)
        vol[z, y, x] = 1.0

    lut = np.ones((128, 4), np.float32)
    lut[0] = 0.0  # empty space stays transparent
    c, _t = render_dvr(
        jnp.asarray(vol), jnp.asarray(lut), np.asarray(d), vol_maj=1.0,
        density_scale=8.0, use_pallas=False,
    )
    lum = np.asarray(c).sum(axis=-1)
    ys, xs = np.nonzero(lum > 0.05 * lum.max())
    assert np.ptp(ys) <= 1 and np.ptp(xs) <= 1, (
        f"collinear voxels split across the intermediate image "
        f"(rows {sorted(set(ys))}, cols {sorted(set(xs))}) for view {d}"
    )


def test_screen_warp_aligns_with_camera():
    """The warp half of shear-warp: the screen-space preview must place
    the volume where the ray tracer sees it. Compare the footprint of the
    warped DVR against debug_hits (deterministic ray-box footprint)."""
    from volxel_tpu import Renderer
    from volxel_tpu.grid import construct_brick_grid
    from volxel_tpu.utils.fixtures import synthetic_ct_volume

    vol = synthetic_ct_volume((24, 24, 24), bits_stored=12)
    r = Renderer(width=48, height=48)
    r.restart_from_grid(
        construct_brick_grid(
            vol.astype(np.float32) / vol.max(),
            transform=np.eye(4, dtype=np.float32),
        )
    )
    r.camera.rotate_around_view(0.5, 0.3)
    r.camera.zoom(2.0)

    preview = r.render_dvr(use_pallas=False, screen=True)
    assert preview.shape == (48, 48, 3)
    assert np.isfinite(preview).all()

    # analytic reference: project the DATA region's corners (the volume
    # occupies [0, 24)^3 of the mip-padded 64^3 index box) to pixels
    ct = r.volume.combined_transform().astype(np.float64)
    view = r.camera.view_matrix().astype(np.float64)
    proj = r.camera.proj_matrix(1.0).astype(np.float64)
    pxs, pys = [], []
    for cx in (0, 24):
        for cy in (0, 24):
            for cz in (0, 24):
                w = ct @ np.array([cx, cy, cz, 1.0])
                c = proj @ view @ w
                nd = c[:2] / c[3]
                pxs.append((nd[0] + 1) / 2 * 48)
                pys.append((1 - (nd[1] + 1) / 2) * 48)
    x0, x1 = min(pxs) - 1.5, max(pxs) + 1.5
    y0, y1 = min(pys) - 1.5, max(pys) + 1.5

    pre_mask = np.abs(preview - preview[0, 0]).max(axis=-1) > 0.02
    ys, xs = np.nonzero(pre_mask)
    assert ys.size > 10, "preview rendered no content"
    inside = (xs >= x0) & (xs <= x1) & (ys >= y0) & (ys <= y1)
    assert inside.mean() > 0.95, (
        f"warped content leaks outside the projected data bbox "
        f"({inside.mean():.0%} inside [{x0:.0f},{x1:.0f}]x[{y0:.0f},{y1:.0f}], "
        f"content bbox x {xs.min()}..{xs.max()} y {ys.min()}..{ys.max()})"
    )
    # and it fills a sensible fraction of that bbox (not a stray dot)
    assert ys.size > 0.15 * (x1 - x0) * (y1 - y0), "content too small"


def test_render_preview_matches_render_dvr_screen():
    """The fixed-canvas cached preview pipeline must agree with the
    (retraced-per-view) render_dvr screen path, and must not recompile
    across camera angles (same jit signature)."""
    from volxel_tpu import Renderer
    from volxel_tpu.grid import construct_brick_grid
    from volxel_tpu.utils.fixtures import synthetic_ct_volume

    vol = synthetic_ct_volume((24, 24, 24), bits_stored=12)
    r = Renderer(width=40, height=40)
    r.restart_from_grid(
        construct_brick_grid(
            vol.astype(np.float32) / vol.max(),
            transform=np.eye(4, dtype=np.float32),
        )
    )
    r.camera.zoom(2.0)
    from volxel_tpu.render.pathtrace import tonemap

    for angle in ((0.5, 0.3), (0.2, -0.1), (1.4, 0.6)):
        r.camera.rotate_around_view(*angle)
        fast = r.render_preview(use_pallas=False)
        slow = tonemap(
            jnp.asarray(r.render_dvr(use_pallas=False, screen=True)),
            jnp.float32(1.0), jnp.float32(1.0),
        )  # render_dvr already tonemapped; compare shapes + correlation
        assert fast.shape == (40, 40, 3)
        assert np.isfinite(fast).all()
        slow_img = r.render_dvr(use_pallas=False, screen=True)
        # same content placement: high correlation between the two paths
        a = fast.ravel() - fast.mean()
        b = slow_img.ravel() - slow_img.mean()
        corr = float((a @ b) / np.sqrt((a @ a) * (b @ b) + 1e-12))
        assert corr > 0.98, f"angle {angle}: corr {corr:.3f}"
