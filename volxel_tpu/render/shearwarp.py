"""Shear-warp direct volume rendering — the Pallas fast path (attempt #2).

The north star asks for the hot loop as a tiled Pallas kernel. Round 1
found Mosaic cannot express the per-ray brick-atlas gathers of the DDA
traversal; re-probing this round shows Mosaic now supports only row-local
128-wide `take_along_axis` gathers (tests/test_shearwarp.py::test_gather_probe
documents the probe), which covers a 128-entry transfer LUT but still not
per-ray volume taps. The gather-free factorization is the classic
Lacroute–Levoy shear-warp: for a parallel projection along the principal
view axis, every slice's contribution to the intermediate image is a pure
2D TRANSLATION — dense VPU math, slices streamed through VMEM — and the
perspective-correcting screen mapping is one 2D warp at the end.

Pipeline (absorption–emission DVR, a deterministic fast-preview mode next
to the Monte-Carlo modes; raymarch.glsl's Beer–Lambert accumulation):

  1. choose principal axis k = argmax |view dir| (host, static permutation)
  2. per slice z: bilinear-shift the slice by (sx*z+tx, sy*z+ty), classify
     density through the transfer LUT, composite front-to-back:
     C += T * alpha' * rgb;  T *= 1 - alpha';  alpha' = 1 - exp(-sigma dt)
  3. warp the intermediate image to the screen (XLA bilinear, host matrix)

Two implementations with IDENTICAL math, pinned against each other:
  * shearwarp_intermediate_xla — jnp scan (runs everywhere)
  * shearwarp_intermediate_pallas — Pallas kernel: slices stream
    HBM->VMEM via the grid pipeline, accumulators persist in VMEM scratch
    across grid steps, transfer classification uses the row-local gather,
    early-out on opaque tiles via pl.when. The same-process A/B against
    the XLA version lives in bench_shearwarp() and NOTES.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# shared math
# ---------------------------------------------------------------------------


def shear_parameters(view_dir: np.ndarray):
    """Principal axis + per-slice shear for a parallel projection.

    Returns (perm, flip, sx, sy): permute the (Z, Y, X) volume by `perm`
    so the principal axis is Z, flip slice order if the view runs -z,
    then slice z is translated by (sx*z, sy*z) in (y, x).
    """
    d = np.asarray(view_dir, np.float64)
    k = int(np.argmax(np.abs(d)))  # 0=x, 1=y, 2=z in (x, y, z) order
    # permutation of (Z, Y, X) axes putting principal axis first
    perms = {
        2: (0, 1, 2),  # z principal: (Z, Y, X)
        1: (1, 0, 2),  # y principal: (Y, Z, X)
        0: (2, 1, 0),  # x principal: (X, Y, Z)
    }
    perm = perms[k]
    # component feeding (sx, sy): sx shifts slice COLUMNS, sy shifts slice
    # ROWS. After `perm`, an x-principal slice is (rows=worldY, cols=worldZ)
    # so sx reads d.z and sy reads d.y; y-principal is (rows=worldZ,
    # cols=worldX); z-principal is (rows=worldY, cols=worldX).
    axes_xyz = {2: (0, 1), 1: (0, 2), 0: (2, 1)}[k]
    dz = d[k]
    flip = dz < 0
    # drift of a ray's (row, col) footprint per slice is d_rc/|d_p| with or
    # without the flip: reversing slice order also reverses the traversal
    # direction along the principal axis, so the two sign changes cancel
    # (pinned by test_shear_collinear_voxels_align's flipped cases)
    s = -d[list(axes_xyz)] / abs(dz)
    sx, sy = float(s[0]), float(s[1])
    return perm, bool(flip), sx, sy


def _composite_slice(c_acc, t_acc, rgb, alpha):
    """Front-to-back over operator (raymarch.glsl Beer-Lambert analog)."""
    contrib = t_acc[..., None] * alpha[..., None] * rgb
    return c_acc + contrib, t_acc * (1.0 - alpha)


def _classify(slice_vals, lut, inv_maj, sigma_dt):
    """Density -> (rgb, alpha') through the NEAREST transfer LUT."""
    k = lut.shape[0]
    idx = jnp.clip(
        jnp.floor(slice_vals * inv_maj * k).astype(jnp.int32), 0, k - 1
    )
    rgba = lut[idx]
    alpha = 1.0 - jnp.exp(-rgba[..., 3] * sigma_dt)
    return rgba[..., :3], alpha


def _shift_bilinear(img, uy, ux, out_h, out_w):
    """Place `img` into an (out_h, out_w) canvas translated by (uy, ux)
    (fractional, non-negative), bilinearly. jnp version."""
    iy = jnp.floor(uy).astype(jnp.int32)
    ix = jnp.floor(ux).astype(jnp.int32)
    fy = uy - iy
    fx = ux - ix
    h, w = img.shape
    padded = jnp.zeros((out_h, out_w), img.dtype)
    padded = jax.lax.dynamic_update_slice(padded, img, (iy, ix))
    shifted_y = jax.lax.dynamic_update_slice(
        jnp.zeros((out_h, out_w), img.dtype), img, (iy + 1, ix)
    )
    row = padded * (1.0 - fy) + shifted_y * fy
    shifted_x = jnp.roll(row, 1, axis=1)
    shifted_x = shifted_x.at[:, 0].set(0.0)
    return row * (1.0 - fx) + shifted_x * fx


# ---------------------------------------------------------------------------
# XLA reference implementation
# ---------------------------------------------------------------------------


def shearwarp_intermediate_xla(
    volume, lut, sx: float, sy: float, inv_maj, sigma_dt
):
    """(Z, Y, X) dense volume -> (Hi, Wi, 3) intermediate image + alpha.

    lax.scan over slices; identical math to the Pallas kernel.
    """
    z_n, y_n, x_n = volume.shape
    out_h = y_n + int(np.ceil(abs(sy) * (z_n - 1))) + 1
    out_w = x_n + int(np.ceil(abs(sx) * (z_n - 1))) + 1
    ty = max(0.0, -sy * (z_n - 1))
    tx = max(0.0, -sx * (z_n - 1))

    def step(carry, z):
        c_acc, t_acc = carry
        sl = volume[z].astype(jnp.float32)
        rgb, alpha = _classify(sl, lut, inv_maj, sigma_dt)
        uy = jnp.clip(sy * z.astype(jnp.float32) + ty, 0.0, out_h - y_n - 1)
        ux = jnp.clip(sx * z.astype(jnp.float32) + tx, 0.0, out_w - x_n - 1)
        rgb_s = jnp.stack(
            [_shift_bilinear(rgb[..., i], uy, ux, out_h, out_w) for i in range(3)],
            axis=-1,
        )
        a_s = _shift_bilinear(alpha, uy, ux, out_h, out_w)
        c_new, t_new = _composite_slice(c_acc, t_acc, rgb_s, a_s)
        # same early-out semantics as the Pallas kernel (pl.when on
        # max(t) > 1e-4): once opaque, later slices contribute nothing,
        # so the two implementations stay bit-comparable on dense scenes
        opaque = jnp.max(t_acc) <= 1e-4
        c_acc = jnp.where(opaque, c_acc, c_new)
        t_acc = jnp.where(opaque, t_acc, t_new)
        return (c_acc, t_acc), None

    c0 = jnp.zeros((out_h, out_w, 3), jnp.float32)
    t0 = jnp.ones((out_h, out_w), jnp.float32)
    (c_acc, t_acc), _ = jax.lax.scan(step, (c0, t0), jnp.arange(z_n))
    return c_acc, t_acc


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _sw_kernel(
    params_ref, vol_ref, lut_ref, c_ref, t_ref, c_acc, t_acc, *, out_h, out_w,
    stacked=True,
):
    """One grid step = one slice. Accumulators live in VMEM scratch and
    persist across the sequential TPU grid; outputs written at the last
    step. Images are channel-first (3, H, W) so H, W ride the TPU's
    (sublane, lane) tiling.

    out_h/out_w are the LOGICAL intermediate dims (static); the canvas is
    padded to the (8, 128) alignment tpu.dynamic_rotate requires, with
    padding rows/cols starting at 0 transmittance so they never contribute
    and never block the early-out."""
    z = pl.program_id(0)
    nz = pl.num_programs(0)

    rows = jax.lax.broadcasted_iota(jnp.int32, t_acc.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, t_acc.shape, 1)
    logical = (rows < out_h) & (cols < out_w)

    @pl.when(z == 0)
    def _():
        c_acc[:] = jnp.zeros_like(c_acc)
        t_acc[:] = logical.astype(jnp.float32)

    sx = params_ref[0]
    sy = params_ref[1]
    tx = params_ref[2]
    ty = params_ref[3]
    inv_maj = params_ref[4]
    sigma_dt = params_ref[5]

    # early-out once (this tile of) the intermediate image is opaque
    @pl.when(jnp.max(t_acc[:]) > 1e-4)
    def _():
        sl = vol_ref[0].astype(jnp.float32)  # (Y, X)
        y_n, x_n = sl.shape
        k = lut_ref.shape[0]  # 128 — the row-local gather width

        # classify: row-local 128-wide take_along_axis gather (4 channels);
        # pad the flat index stream up to a multiple of the LUT width
        total = y_n * x_n
        pad = (-total) % k
        idx = jnp.clip(
            jnp.floor(sl * inv_maj * k).astype(jnp.int32), 0, k - 1
        ).reshape(-1)
        if pad:
            idx = jnp.concatenate([idx, jnp.zeros((pad,), jnp.int32)])
        idx = idx.reshape(-1, k)
        rows = idx.shape[0]

        def chan(i):
            tab = jnp.broadcast_to(lut_ref[:, i], (rows, k))
            flat = jnp.take_along_axis(tab, idx, axis=1).reshape(-1)
            return flat[:total].reshape(y_n, x_n)

        r, g, b = chan(0), chan(1), chan(2)
        alpha = 1.0 - jnp.exp(-chan(3) * sigma_dt)

        pad_h = c_acc.shape[1]
        pad_w = c_acc.shape[2]
        zf = z.astype(jnp.float32)
        uy = jnp.clip(sy * zf + ty, 0.0, out_h - y_n - 1)
        ux = jnp.clip(sx * zf + tx, 0.0, out_w - x_n - 1)
        iy = jnp.floor(uy).astype(jnp.int32)
        ix = jnp.floor(ux).astype(jnp.int32)
        fy = uy - iy.astype(jnp.float32)
        fx = ux - ix.astype(jnp.float32)

        # bilinear placement on the FULL canvas: static 4-tap fractional
        # combine, then dynamic rotates (tpu.dynamic_rotate). Mosaic cannot
        # lower dynamic-offset vector windows (it must prove sublane
        # alignment — kernel fault on hardware, NOTES.md r3), but dynamic
        # full-array rotates are native; the clip on (uy, ux) guarantees
        # the rolled block never wraps.
        def frac_block(img):
            p00 = jnp.pad(img, ((0, 1), (0, 1)))
            p10 = jnp.pad(img, ((1, 0), (0, 1)))
            p01 = jnp.pad(img, ((0, 1), (1, 0)))
            p11 = jnp.pad(img, ((1, 0), (1, 0)))
            blk = (
                p00 * (1 - fy) * (1 - fx)
                + p10 * fy * (1 - fx)
                + p01 * (1 - fy) * fx
                + p11 * fy * fx
            )
            return jnp.pad(
                blk, ((0, pad_h - (y_n + 1)), (0, pad_w - (x_n + 1)))
            )

        t_cur = t_acc[:]
        if stacked:
            # ONE (4*pad_h)-tall canvas holds all 4 channels, so the
            # whole slice costs 2 rotates instead of 8. The global roll
            # cannot leak rows across channel segments: each segment's
            # content spans rows [0, y_n+1) and iy <= out_h - y_n - 1,
            # so the shifted block ends <= out_h <= pad_h into its
            # segment (the last segment therefore never wraps either).
            canvas = jnp.concatenate(
                [frac_block(img) for img in (alpha, r, g, b)], axis=0
            )
            canvas = pltpu.roll(canvas, iy, 0)
            canvas = pltpu.roll(canvas, ix, 1)
            a_w = canvas[0:pad_h]
            for i in range(3):
                c_acc[i] = c_acc[i] + t_cur * a_w * canvas[
                    (i + 1) * pad_h:(i + 2) * pad_h
                ]
        else:
            def place(img):
                canvas = pltpu.roll(frac_block(img), iy, 0)
                return pltpu.roll(canvas, ix, 1)

            a_w = place(alpha)
            for i, img in enumerate((r, g, b)):
                c_acc[i] = c_acc[i] + t_cur * a_w * place(img)
        t_acc[:] = t_cur * (1.0 - a_w)

    @pl.when(z == nz - 1)
    def _():
        c_ref[:] = c_acc[:]
        t_ref[:] = t_acc[:]


def shearwarp_intermediate_pallas(
    volume, lut, sx: float, sy: float, inv_maj, sigma_dt, stacked: bool = True
):
    """Pallas version of shearwarp_intermediate_xla (same outputs)."""
    z_n, y_n, x_n = volume.shape
    out_h = y_n + int(np.ceil(abs(sy) * (z_n - 1))) + 1
    out_w = x_n + int(np.ceil(abs(sx) * (z_n - 1))) + 1
    ty = max(0.0, -sy * (z_n - 1))
    tx = max(0.0, -sx * (z_n - 1))
    # tpu.dynamic_rotate needs (sublane, lane)-aligned shapes
    pad_h = -(-out_h // 8) * 8
    pad_w = -(-out_w // 128) * 128

    params = jnp.asarray(
        [sx, sy, tx, ty, float(inv_maj), float(sigma_dt)], jnp.float32
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(z_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, y_n, x_n), lambda z: (z, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (lut.shape[0], 4), lambda z: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (3, pad_h, pad_w), lambda z: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (pad_h, pad_w), lambda z: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, pad_h, pad_w), jnp.float32),
            pltpu.VMEM((pad_h, pad_w), jnp.float32),
        ],
    )
    c_acc, t_acc = pl.pallas_call(
        functools.partial(_sw_kernel, out_h=out_h, out_w=out_w, stacked=stacked),
        out_shape=[
            jax.ShapeDtypeStruct((3, pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(params, volume, lut)
    c_acc = c_acc[:, :out_h, :out_w]
    t_acc = t_acc[:out_h, :out_w]
    return jnp.transpose(c_acc, (1, 2, 0)), t_acc


# ---------------------------------------------------------------------------
# full render: permute -> intermediate -> screen warp
# ---------------------------------------------------------------------------


def render_dvr(
    dense,
    lut,
    view_dir,
    vol_maj: float,
    density_scale: float = 1.0,
    use_pallas: bool | None = None,
    interpret: bool = False,
):
    """Deterministic shear-warp DVR of a dense (Z, Y, X) field.

    Returns the intermediate-space composited image (Hi, Wi, 3) — the
    screen warp is an affine 2D resample left to the display path (the
    "warp" half of shear-warp; cheap and XLA-friendly).
    """
    perm, flip, sx, sy = shear_parameters(view_dir)
    vol = jnp.transpose(dense, perm)
    if flip:
        vol = vol[::-1]
    sigma_dt = density_scale * float(np.sqrt(1.0 + sx * sx + sy * sy))
    inv_maj = 1.0 / vol_maj
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    fn = (
        shearwarp_intermediate_pallas if use_pallas else shearwarp_intermediate_xla
    )
    if use_pallas and interpret:
        fn = functools.partial(_interpret_pallas, fn)
    c, t = fn(vol.astype(jnp.float32), lut, sx, sy, inv_maj, sigma_dt)
    return c, t


def _interpret_pallas(fn, *args):
    with pltpu.force_tpu_interpret_mode():
        return fn(*args)


# ---------------------------------------------------------------------------
# fixed-shape interactive preview pipeline (one compile per principal axis)
# ---------------------------------------------------------------------------
#
# The ad-hoc render_dvr path recompiles per camera angle because the
# intermediate image's shape depends on the shear magnitudes. For the
# interactive server that is unusable (seconds of compile per drag tick on
# the tunnel), so the preview pipeline fixes the canvas at the worst-case
# shear (|s| <= 1 always, principal-axis dominance) and passes sx/sy/tx/ty
# as TRACED scalars: at most 6 specializations (3 principal axes x flip)
# ever compile, then every camera angle reuses them.


def _shearwarp_intermediate_xla_dyn(vol, lut, sx, sy, inv_maj, sigma_dt):
    """Fixed-canvas XLA scan: sx/sy are traced scalars."""
    z_n, y_n, x_n = vol.shape
    out_h = y_n + z_n  # >= y_n + ceil(|sy|*(z_n-1)) + 1 for |sy| <= 1
    out_w = x_n + z_n
    ty = jnp.maximum(0.0, -sy * (z_n - 1))
    tx = jnp.maximum(0.0, -sx * (z_n - 1))

    def step(carry, z):
        c_acc, t_acc = carry
        sl = vol[z].astype(jnp.float32)
        rgb, alpha = _classify(sl, lut, inv_maj, sigma_dt)
        zf = z.astype(jnp.float32)
        uy = jnp.clip(sy * zf + ty, 0.0, out_h - y_n - 1)
        ux = jnp.clip(sx * zf + tx, 0.0, out_w - x_n - 1)
        rgb_s = jnp.stack(
            [_shift_bilinear(rgb[..., i], uy, ux, out_h, out_w) for i in range(3)],
            axis=-1,
        )
        a_s = _shift_bilinear(alpha, uy, ux, out_h, out_w)
        c_new, t_new = _composite_slice(c_acc, t_acc, rgb_s, a_s)
        opaque = jnp.max(t_acc) <= 1e-4
        c_acc = jnp.where(opaque, c_acc, c_new)
        t_acc = jnp.where(opaque, t_acc, t_new)
        return (c_acc, t_acc), None

    c0 = jnp.zeros((out_h, out_w, 3), jnp.float32)
    t0 = jnp.ones((out_h, out_w), jnp.float32)
    (c_acc, t_acc), _ = jax.lax.scan(step, (c0, t0), jnp.arange(z_n))
    return c_acc, t_acc


def _shearwarp_intermediate_pallas_dyn(vol, lut, sx, sy, inv_maj, sigma_dt):
    """Fixed-canvas Pallas kernel: sx/sy/tx/ty via SMEM (already dynamic)."""
    z_n, y_n, x_n = vol.shape
    out_h = y_n + z_n
    out_w = x_n + z_n
    pad_h = -(-out_h // 8) * 8
    pad_w = -(-out_w // 128) * 128
    ty = jnp.maximum(0.0, -sy * (z_n - 1))
    tx = jnp.maximum(0.0, -sx * (z_n - 1))
    params = jnp.stack(
        [
            jnp.float32(sx),
            jnp.float32(sy),
            jnp.float32(tx),
            jnp.float32(ty),
            jnp.float32(inv_maj),
            jnp.float32(sigma_dt),
        ]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(z_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, y_n, x_n), lambda z: (z, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (lut.shape[0], 4), lambda z: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (3, pad_h, pad_w), lambda z: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((pad_h, pad_w), lambda z: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, pad_h, pad_w), jnp.float32),
            pltpu.VMEM((pad_h, pad_w), jnp.float32),
        ],
    )
    c_acc, t_acc = pl.pallas_call(
        functools.partial(_sw_kernel, out_h=out_h, out_w=out_w),
        out_shape=[
            jax.ShapeDtypeStruct((3, pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(params, vol, lut)
    return jnp.transpose(c_acc[:, :out_h, :out_w], (1, 2, 0)), t_acc[:out_h, :out_w]


def _warp_apply(c_img, t_img, h_mat, width: int, height: int, bg, exposure, gamma):
    """Inverse-homography resample + composite + tonemap (traced)."""
    out_h, out_w = t_img.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32) + 0.5,
        jnp.arange(width, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    denom = h_mat[2, 0] * xs + h_mat[2, 1] * ys + h_mat[2, 2]
    src_c = (h_mat[0, 0] * xs + h_mat[0, 1] * ys + h_mat[0, 2]) / denom
    src_r = (h_mat[1, 0] * xs + h_mat[1, 1] * ys + h_mat[1, 2]) / denom
    r0 = jnp.floor(src_r)
    c0 = jnp.floor(src_c)
    fr = src_r - r0
    fc = src_c - c0
    inside = (
        (src_r >= 0) & (src_r <= out_h - 1) & (src_c >= 0) & (src_c <= out_w - 1)
    )
    r0i = jnp.clip(r0.astype(jnp.int32), 0, out_h - 1)
    c0i = jnp.clip(c0.astype(jnp.int32), 0, out_w - 1)
    r1i = jnp.clip(r0i + 1, 0, out_h - 1)
    c1i = jnp.clip(c0i + 1, 0, out_w - 1)

    def bil(img):
        t00 = img[r0i, c0i]
        t01 = img[r0i, c1i]
        t10 = img[r1i, c0i]
        t11 = img[r1i, c1i]
        fr_ = fr[..., None] if img.ndim == 3 else fr
        fc_ = fc[..., None] if img.ndim == 3 else fc
        top = t00 * (1 - fc_) + t01 * fc_
        bot = t10 * (1 - fc_) + t11 * fc_
        return top * (1 - fr_) + bot * fr_

    color = jnp.where(inside[..., None], bil(c_img), 0.0)
    trans = jnp.where(inside, bil(t_img), 1.0)
    from volxel_tpu.render.pathtrace import tonemap

    img = tonemap(color + trans[..., None] * bg, exposure, gamma)
    return jnp.clip(img, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("width", "height", "use_pallas"))
def _preview_jit(
    vol, lut, sx, sy, inv_maj, sigma_dt, h_mat, bg, exposure, gamma,
    width, height, use_pallas,
):
    fn = (
        _shearwarp_intermediate_pallas_dyn
        if use_pallas
        else _shearwarp_intermediate_xla_dyn
    )
    c, t = fn(vol.astype(jnp.float32), lut, sx, sy, inv_maj, sigma_dt)
    return _warp_apply(c, t, h_mat, width, height, bg, exposure, gamma)


def preview_homography(
    view_dir, vol_shape, combined_transform, view, proj,
    width: int, height: int, occupied_mid=None,
):
    """Host-side per-frame math for the fixed-canvas preview: shear
    parameters + the screen->intermediate homography. Returns
    (perm, flip, sx, sy, h_mat) — everything _preview_jit needs."""
    perm, flip, sx, sy = shear_parameters(view_dir)
    dims = np.array(vol_shape, np.int64)
    pdims = dims[list(perm)]
    z_n, y_n, x_n = int(pdims[0]), int(pdims[1]), int(pdims[2])
    out_h, out_w = y_n + z_n, x_n + z_n
    ty = max(0.0, -sy * (z_n - 1))
    tx = max(0.0, -sx * (z_n - 1))
    if occupied_mid is not None:
        mid_p = np.asarray(occupied_mid, np.float64)[list(perm)]
        zm = float(mid_p[0])
        if flip:
            zm = (z_n - 1) - zm
    else:
        zm = 0.5 * (z_n - 1)

    corners_rc = np.array(
        [[0, 0], [0, out_w - 1], [out_h - 1, 0], [out_h - 1, out_w - 1]],
        np.float64,
    )
    y_p = corners_rc[:, 0] - (sy * zm + ty)
    x_p = corners_rc[:, 1] - (sx * zm + tx)
    zp = np.full(4, zm)
    if flip:
        zp = (z_n - 1) - zp
    pcoords = np.stack([zp, y_p, x_p], axis=1)
    idx_zyx = np.empty((4, 3), np.float64)
    for i, axis in enumerate(perm):
        idx_zyx[:, axis] = pcoords[:, i]
    idx_xyz1 = np.stack(
        [idx_zyx[:, 2], idx_zyx[:, 1], idx_zyx[:, 0], np.ones(4)], axis=1
    )
    world = (combined_transform.astype(np.float64) @ idx_xyz1.T).T
    clip = (proj.astype(np.float64) @ view.astype(np.float64) @ world.T).T
    ndc = clip[:, :2] / clip[:, 3:4]
    px = (ndc[:, 0] + 1.0) * 0.5 * width
    py = (1.0 - (ndc[:, 1] + 1.0) * 0.5) * height
    h_mat = _homography(
        np.stack([px, py], axis=1), corners_rc[:, ::-1].astype(np.float64)
    )
    return perm, flip, sx, sy, h_mat.astype(np.float32)


# ---------------------------------------------------------------------------
# the "warp" half: intermediate image -> screen (Lacroute-Levoy step 2)
# ---------------------------------------------------------------------------


def _homography(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3x3 projective transform mapping 4 src (x, y) points onto dst."""
    a = []
    b = []
    for (x, y), (u, v) in zip(src, dst):
        a.append([x, y, 1, 0, 0, 0, -u * x, -u * y])
        b.append(u)
        a.append([0, 0, 0, x, y, 1, -v * x, -v * y])
        b.append(v)
    h = np.linalg.solve(np.asarray(a, np.float64), np.asarray(b, np.float64))
    return np.append(h, 1.0).reshape(3, 3)


def warp_to_screen(
    c_img,
    t_img,
    view_dir,
    vol_shape,
    combined_transform: np.ndarray,
    view: np.ndarray,
    proj: np.ndarray,
    width: int,
    height: int,
    background=None,
    occupied_mid: np.ndarray | None = None,
):
    """Resample the intermediate (sheared-space) image to screen pixels.

    The intermediate plane at the volume's mid slice zm maps projectively
    onto the screen; the 3x3 homography is solved from its 4 corners
    pushed through index -> world -> clip. Points off the base plane pick
    up the classic shear-warp parallax approximation — exactly the
    trade the original factorization makes for interactivity.

    Returns (height, width, 3) float32, row 0 = image top, composited
    over `background` (scalar/rgb, default dark grey) using the
    intermediate transmittance.
    """
    c_img = jnp.asarray(c_img)
    t_img = jnp.asarray(t_img)
    out_h, out_w = int(t_img.shape[0]), int(t_img.shape[1])
    perm, flip, sx, sy = shear_parameters(view_dir)
    dims = np.array(vol_shape, np.int64)  # (Z, Y, X) of the ORIGINAL field
    pdims = dims[list(perm)]  # permuted (z', rows, cols)
    z_n = int(pdims[0])
    ty = max(0.0, -sy * (z_n - 1))
    tx = max(0.0, -sx * (z_n - 1))
    # reference plane for the homography: the OCCUPIED region's center
    # along the principal axis, not the padded box's — mip-alignment can
    # pad small volumes massively, and a perspective camera makes plane
    # choice = parallax placement (occupied_mid is (Z, Y, X) voxel coords)
    if occupied_mid is not None:
        mid_p = np.asarray(occupied_mid, np.float64)[list(perm)]
        zm = float(mid_p[0])
        if flip:
            zm = (z_n - 1) - zm
    else:
        zm = 0.5 * (z_n - 1)

    # intermediate corners -> permuted voxel coords on the zm plane
    corners_rc = np.array(
        [[0, 0], [0, out_w - 1], [out_h - 1, 0], [out_h - 1, out_w - 1]],
        np.float64,
    )
    y_p = corners_rc[:, 0] - (sy * zm + ty)
    x_p = corners_rc[:, 1] - (sx * zm + tx)
    zp = np.full(4, zm)
    if flip:
        zp = (z_n - 1) - zp
    # permuted (z', row, col) -> original (Z, Y, X) index
    pcoords = np.stack([zp, y_p, x_p], axis=1)
    idx_zyx = np.empty((4, 3), np.float64)
    for i, axis in enumerate(perm):
        idx_zyx[:, axis] = pcoords[:, i]
    # original index (x, y, z) -> world -> clip -> pixel
    idx_xyz1 = np.stack(
        [idx_zyx[:, 2], idx_zyx[:, 1], idx_zyx[:, 0], np.ones(4)], axis=1
    )
    world = (combined_transform.astype(np.float64) @ idx_xyz1.T).T
    clip = (proj.astype(np.float64) @ view.astype(np.float64) @ world.T).T
    ndc = clip[:, :2] / clip[:, 3:4]
    px = (ndc[:, 0] + 1.0) * 0.5 * width
    py = (1.0 - (ndc[:, 1] + 1.0) * 0.5) * height  # row 0 = top

    h_mat = _homography(
        np.stack([px, py], axis=1), corners_rc[:, ::-1].astype(np.float64)
    )  # screen pixel -> intermediate (c, r)

    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32) + 0.5,
        jnp.arange(width, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    hm = jnp.asarray(h_mat, jnp.float32)
    denom = hm[2, 0] * xs + hm[2, 1] * ys + hm[2, 2]
    src_c = (hm[0, 0] * xs + hm[0, 1] * ys + hm[0, 2]) / denom
    src_r = (hm[1, 0] * xs + hm[1, 1] * ys + hm[1, 2]) / denom

    r0 = jnp.floor(src_r)
    c0 = jnp.floor(src_c)
    fr = src_r - r0
    fc = src_c - c0
    inside = (
        (src_r >= 0) & (src_r <= out_h - 1) & (src_c >= 0) & (src_c <= out_w - 1)
    )
    r0i = jnp.clip(r0.astype(jnp.int32), 0, out_h - 1)
    c0i = jnp.clip(c0.astype(jnp.int32), 0, out_w - 1)
    r1i = jnp.clip(r0i + 1, 0, out_h - 1)
    c1i = jnp.clip(c0i + 1, 0, out_w - 1)

    def bil(img):
        t00 = img[r0i, c0i]
        t01 = img[r0i, c1i]
        t10 = img[r1i, c0i]
        t11 = img[r1i, c1i]
        fr_ = fr[..., None] if img.ndim == 3 else fr
        fc_ = fc[..., None] if img.ndim == 3 else fc
        top = t00 * (1 - fc_) + t01 * fc_
        bot = t10 * (1 - fc_) + t11 * fc_
        return top * (1 - fr_) + bot * fr_

    color = bil(c_img)
    trans = bil(t_img)
    color = jnp.where(inside[..., None], color, 0.0)
    trans = jnp.where(inside, trans, 1.0)
    bg = jnp.asarray(
        background if background is not None else [0.04, 0.04, 0.05],
        jnp.float32,
    )
    return (color + trans[..., None] * bg).astype(jnp.float32)
