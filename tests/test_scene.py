"""Scene: camera math, volume transforms, environment sampling."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from volxel_tpu.render.rays import camera_rays
from volxel_tpu.scene.camera import Camera
from volxel_tpu.scene.environment import (
    Environment,
    build_env_state,
    default_environment,
)
from volxel_tpu.scene.environment import lookup_environment as _lookup_env
from volxel_tpu.scene.environment import pdf_environment as _pdf_env
from volxel_tpu.scene.environment import sample_environment as _sample_env

# these run inside jitted render functions in production; jit here too
lookup_environment = jax.jit(_lookup_env)
pdf_environment = jax.jit(_pdf_env)
sample_environment = jax.jit(_sample_env)
from volxel_tpu.scene.volume import Volume
from volxel_tpu.utils.mathutil import scale_matrix


def test_camera_center_ray_points_at_view():
    cam = Camera(1.0)
    cam.rotate_around_view(0.5, 0.3)
    cam.zoom(2.0)
    inv_view = jnp.asarray(np.linalg.inv(cam.view_matrix()))
    inv_proj = jnp.asarray(np.linalg.inv(cam.proj_matrix(1.0)))
    rays = camera_rays(inv_view, inv_proj, jnp.asarray([[0.5, 0.5]]))
    expect = (cam.view - cam.pos) / np.linalg.norm(cam.view - cam.pos)
    np.testing.assert_allclose(np.asarray(rays.direction[0]), expect, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rays.origin[0]), cam.pos, atol=1e-5)


def test_camera_zoom_clamps():
    cam = Camera(1.0)
    assert not cam.zoom(0.05)  # would go below 0.1
    assert not cam.zoom(15.0)  # would exceed 10
    assert cam.zoom(2.0)
    assert np.linalg.norm(cam.pos - cam.view) == pytest.approx(2.0)


def test_camera_pitch_clamped():
    cam = Camera(1.0)
    cam.rotate_around_view(0.0, 10.0)
    assert cam.pitch == pytest.approx(np.pi / 2 - 0.01)


def test_volume_unit_cube_rescale():
    # 100 x 50 x 25 world extent via spacing transform
    vol = Volume([100, 100, 100], scale_matrix((1.0, 0.5, 0.25)))
    size = vol.rescale_to_unit_cube()
    assert size == pytest.approx(100.0)
    lo, hi = vol.aabb()
    np.testing.assert_allclose(hi - lo, [1.0, 0.5, 0.25], atol=1e-5)
    np.testing.assert_allclose((lo + hi) / 2, 0.0, atol=1e-5)


def test_volume_aabb_clipped():
    vol = Volume([10, 10, 10], np.eye(4, dtype=np.float32))
    lo, hi = vol.aabb_clipped([0.25, 0.0, 0.5], [0.75, 1.0, 1.0])
    np.testing.assert_allclose(lo, [2.5, 0.0, 5.0], atol=1e-5)
    np.testing.assert_allclose(hi, [7.5, 10.0, 10.0], atol=1e-5)


def test_env_constant_pdf_and_radiance():
    const = np.full((16, 32, 3), 2.0, np.float32)
    state = build_env_state(const, strength=1.0)
    rnd = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (512, 2)).astype(np.float32))
    le, pdf, w_i = sample_environment(state, rnd)
    np.testing.assert_allclose(np.asarray(le), 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pdf), 1.0 / (4 * np.pi), rtol=1e-4)
    norms = np.linalg.norm(np.asarray(w_i), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_env_importance_concentrates_on_bright_patch():
    img = np.full((32, 64, 3), 0.01, np.float32)
    img[8:12, 16:24] = 50.0  # bright patch
    state = build_env_state(img)
    rng = np.random.default_rng(1)
    rnd = jnp.asarray(rng.uniform(0, 1, (2048, 2)).astype(np.float32))
    le, pdf, w_i = sample_environment(state, rnd)
    bright = np.asarray(le).max(axis=-1) > 1.0
    assert bright.mean() > 0.5  # most samples land on the patch
    assert np.asarray(pdf)[bright].mean() > np.asarray(pdf)[~bright].mean()


def test_env_lookup_directions():
    img = np.zeros((64, 128, 3), np.float32)
    img[-4:, :] = 5.0  # texture rows near v=1 <-> +Y (up)
    state = build_env_state(img)
    up = lookup_environment(state, jnp.asarray([[0.0, 1.0, 0.0]]))
    down = lookup_environment(state, jnp.asarray([[0.0, -1.0, 0.0]]))
    assert float(up[0, 0]) > 1.0
    assert float(down[0, 0]) < 0.1


def test_env_sample_lookup_consistency():
    """Radiance returned by sampling == direct lookup of returned direction."""
    img = np.random.default_rng(2).uniform(0.1, 3.0, (32, 64, 3)).astype(np.float32)
    state = build_env_state(img)
    rnd = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (256, 2)).astype(np.float32))
    le, pdf, w_i = sample_environment(state, rnd)
    le2 = lookup_environment(state, w_i)
    np.testing.assert_allclose(np.asarray(le), np.asarray(le2), rtol=2e-2, atol=1e-2)


def test_default_environment_top_bright():
    env = default_environment()
    up = lookup_environment(env.state, jnp.asarray([[0.0, 1.0, 0.0]]))
    down = lookup_environment(env.state, jnp.asarray([[0.0, -1.0, 0.0]]))
    assert float(np.asarray(up).mean()) > float(np.asarray(down).mean())


def test_pdf_environment_mean_near_uniform():
    """For a constant map, pdf_environment == 1/(4pi) (environment.glsl:82-86)."""
    const = np.full((16, 32, 3), 3.0, np.float32)
    state = build_env_state(const)
    dirs = np.random.default_rng(4).normal(size=(128, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    pdf = np.asarray(pdf_environment(state, jnp.asarray(dirs.astype(np.float32))))
    np.testing.assert_allclose(pdf, 1.0 / (4 * np.pi), rtol=1e-3)


def _nonuniform_env(h=64, w=128):
    """Env with strong latitude structure so the equirect Jacobian matters."""
    rng = np.random.default_rng(11)
    img = rng.random((h, w, 3)).astype(np.float32) * 0.2
    img[: h // 5, :, :] += 6.0      # bright cap near one pole
    img[h // 2, :, 1] += 3.0        # bright equator band
    return Environment(img)


def test_physical_pdf_is_the_samplers_true_density():
    """E[f/pdf] over warp samples must equal the integral of f over the
    sphere iff the reported pdf IS the sampling density. f = max(0, y)
    (integral pi) has latitude structure, so the reference's 1/(4*pi)
    texel-mass quirk converges to the WRONG value (4/pi times off for a
    uniform env: int f * 2/(pi sin t) dw = 4) while physical=True is
    consistent. (f = 1 cannot discriminate: the missing Jacobian
    integrates out exactly.)"""
    env = _nonuniform_env()
    rng = np.random.default_rng(3)
    rnd2 = jnp.asarray(rng.random((400_000, 2)).astype(np.float32))
    target = np.pi  # integral of max(0, y) over the unit sphere

    _, pdf_phys, w_phys = _sample_env(env.state, rnd2, physical=True)
    f = jnp.maximum(w_phys[..., 1], 0.0)
    est_phys = float(jnp.mean(f / jnp.maximum(pdf_phys, 1e-20)))
    assert abs(est_phys - target) / target < 0.05, est_phys

    _, pdf_quirk, w_quirk = _sample_env(env.state, rnd2)
    fq = jnp.maximum(w_quirk[..., 1], 0.0)
    est_quirk = float(jnp.mean(fq / jnp.maximum(pdf_quirk, 1e-20)))
    assert abs(est_quirk - target) / target > 0.15, (
        "the quirk pdf unexpectedly passed the consistency test; "
        "the extension would be pointless on this env"
    )


def test_physical_pdf_sides_agree():
    """pdf_environment(physical) must report the same density
    sample_environment(physical) attaches to its own draws (both sides of
    the MIS pair see one distribution). Texel-edge roundtrips can land in
    a neighboring texel for a tiny fraction of draws."""
    env = _nonuniform_env()
    rng = np.random.default_rng(4)
    rnd2 = jnp.asarray(rng.random((50_000, 2)).astype(np.float32))
    _, pdf_s, w_i = _sample_env(env.state, rnd2, physical=True)
    pdf_q = _pdf_env(env.state, w_i, physical=True)
    rel = np.abs(np.asarray(pdf_q) - np.asarray(pdf_s)) / np.maximum(
        np.asarray(pdf_s), 1e-12
    )
    assert float(np.mean(rel < 1e-3)) > 0.99, float(np.mean(rel < 1e-3))


def test_physical_pdf_renders(tmp_path):
    """settings.physical_pdf drives a full render to finite output and
    changes the image (the MIS weights differ) without changing the
    default path."""
    from volxel_tpu.api.renderer import Renderer
    from volxel_tpu.grid.brick import construct_brick_grid

    rng = np.random.default_rng(5)
    vol = (rng.random((16, 16, 16)) > 0.6).astype(np.float32) * 0.8
    grid = construct_brick_grid(vol, transform=np.eye(4, dtype=np.float32))
    imgs = {}
    for phys in (False, True):
        r = Renderer(width=24, height=24)
        r.restart_from_grid(grid)
        r.load_env(  # nonuniform env so the pdfs differ
            __import__("volxel_tpu.utils.fixtures", fromlist=["x"]).synthetic_env_hdr(32, 16)
        )
        r.camera.zoom(2.0)
        r.settings.bounces = 2
        r.settings.physical_pdf = phys
        imgs[phys] = np.asarray(r.render_frame())
    assert np.isfinite(imgs[False]).all() and np.isfinite(imgs[True]).all()
    assert not np.allclose(imgs[False], imgs[True])


def test_warp_tables_bit_identical():
    """EnvState.warp_d/warp_e replace the descent's 4 per-level taps with
    2 precomputed-decision fetches; d/e replay the inline f32 op chain per
    texel, so outputs must be BIT-identical to the table-free descent —
    for both pdf conventions, on a non-trivial map."""
    img = np.random.default_rng(5).uniform(0.0, 4.0, (64, 128, 3)).astype(np.float32)
    img[5:9, 40:70] = 80.0
    state = build_env_state(img)
    assert state.warp_d is not None and len(state.warp_d) == 9
    assert state.warp_f is not None and len(state.warp_f) == 9
    # three generations: fused rows (default) / d+e tables / inline quad
    # taps — all must agree to the bit (incl. the envmap_quad le fetch)
    tables = state._replace(warp_f=None, envmap_quad=None)
    bare = state._replace(
        warp_d=None, warp_e=None, warp_f=None, envmap_quad=None
    )
    rnd = jnp.asarray(
        np.random.default_rng(6).uniform(0, 1, (4096, 2)).astype(np.float32)
    )
    for physical in (False, True):
        # _sample_env (unjitted): the module-level jit wrapper would trace
        # `physical`, which gates python-level branches
        got = _sample_env(state, rnd, physical)
        mid = _sample_env(tables, rnd, physical)
        want = _sample_env(bare, rnd, physical)
        for g, m, w in zip(got, mid, want):
            np.testing.assert_array_equal(
                np.asarray(g).view(np.uint32), np.asarray(w).view(np.uint32)
            )
            np.testing.assert_array_equal(
                np.asarray(m).view(np.uint32), np.asarray(w).view(np.uint32)
            )


def test_warp_tables_mxu_bit_identical():
    """The MXU byte-plane packing of the warp tables (attached on TPU by
    render_pixels) returns bit-equal d/e values — pinned here through the
    full sampler with the Pallas kernel interpreted on CPU."""
    from volxel_tpu.scene.environment import pack_warp_tables

    img = np.random.default_rng(7).uniform(0.0, 2.0, (32, 64, 3)).astype(np.float32)
    state = build_env_state(img)
    from volxel_tpu.render.mxu_gather import pack_gather_table

    d_mxu, e_mxu = pack_warp_tables(state.warp_d, state.warp_e)
    packed = state._replace(
        warp_d_mxu=d_mxu, warp_e_mxu=e_mxu,
        imp0_mxu=pack_gather_table(state.imp_mips[0].reshape(-1)),
    )
    rnd = jnp.asarray(
        np.random.default_rng(8).uniform(0, 1, (1024, 2)).astype(np.float32)
    )
    for physical in (False, True):
        got = _sample_env(packed, rnd, physical)
        want = _sample_env(state, rnd, physical)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(
                np.asarray(g).view(np.uint32), np.asarray(w).view(np.uint32)
            )
    # the physical pdf's texel fetch rides imp0_mxu too
    d = np.random.default_rng(12).normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    gp = _pdf_env(packed, jnp.asarray(d), True)
    wp = _pdf_env(state, jnp.asarray(d), True)
    np.testing.assert_array_equal(
        np.asarray(gp).view(np.uint32), np.asarray(wp).view(np.uint32)
    )


def test_envmap_mxu_bilinear_bit_identical():
    """lookup_environment through the MXU envmap packing (attached on TPU
    by render_pixels for VMEM-small maps) is bit-identical — incl. the
    pole-clamp taps the oracle once caught."""
    from volxel_tpu.render.mxu_gather import pack_gather_table

    img = np.random.default_rng(9).uniform(0.0, 5.0, (16, 32, 3)).astype(np.float32)
    state = build_env_state(img)
    packed = state._replace(envmap_mxu=pack_gather_table(state.envmap.reshape(-1)))
    rng = np.random.default_rng(10)
    d = rng.normal(size=(2048, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d[:8] = [[0, 1, 0], [0, -1, 0], [1, 0, 0], [-1, 0, 0],
             [0, 0.9999999, 0.0001], [0, -0.9999999, 0.0001],
             [0.0001, 0.99999, 0], [0, 0, 1]]  # poles + seam
    got = _lookup_env(packed, jnp.asarray(d))
    want = _lookup_env(state, jnp.asarray(d))
    np.testing.assert_array_equal(
        np.asarray(got).view(np.uint32), np.asarray(want).view(np.uint32)
    )
