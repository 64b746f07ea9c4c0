"""Environment lighting: equirect map, importance pyramid, warp sampling.

TPU-native rebuild of representation/environment.ts + shaders/environment.glsl:
the GPU "fragment-shader compute" importance build (environment.ts:47-58)
becomes a resize + average-pool mip pyramid; the per-sample hierarchical
warp (environment.glsl:38-68) is a statically unrolled descent over the
pyramid, vectorized over all rays with gathers.

Conventions: the stored envmap is in **texture space** — row j corresponds
to texture v=(j+0.5)/H, where v = 1 - acos(y)/pi (v grows toward +Y / "up").
Decoded images (row 0 = image top = sky) must be flipped on construction;
this mirrors the reference's UNPACK_FLIP_Y_WEBGL upload (environment.ts:31).

Faithfully replicated reference quirks (documented, kept for parity):
  * pdf uses 1/(4*pi) rather than the true equirect solid-angle Jacobian
    (environment.glsl:80-86)
  * pdf_environment() scales luma by env_strength while the importance map
    is built unscaled (environment.glsl:82-86 vs envSetup.frag:24-37)

Extension (settings.physical_pdf, off by default): `physical=True` makes
both sides of the MIS pair report the ACTUAL density of the hierarchical
warp sampler over solid angle — importance-map texel mass times the
equirect Jacobian 1/(2*pi^2*sin(theta)) — turning NEE+MIS into a
consistent estimator (E[1/pdf] = 4*pi; pinned by tests/test_scene.py).
Both quirks above vanish in this mode: the pdf reads the same unscaled
importance map the sampler warps through.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from volxel_tpu.utils.mathutil import LUMA_WEIGHTS, M_PI

# importance map resolution (power of two; environment.ts:9)
IMP_DIM = 512
IMP_BASE_MIP = 9  # log2(IMP_DIM)


class EnvState(NamedTuple):
    """Device-side environment: pytree of jnp arrays."""

    envmap: jax.Array  # (H, W, 3) float32, texture space (row 0 = v~0)
    imp_mips: tuple  # mips[0]=(512,512) ... mips[9]=(1,1) float32
    strength: jax.Array  # scalar float32
    # precomputed warp-descent decision tables (one per descent level,
    # index = the `mip` of sample_environment's loop): warp_d[m][qy, qx]
    # is the left-column probability d and warp_e[m][qy, qx, lr] the
    # bottom probability e for the left (lr=0) / right (lr=1) column of
    # the quad at (qy, qx). Each value replays the inline f32 op chain
    # (adds + guarded divide) per texel, so the descent's compares and
    # px/py updates are BIT-identical while the per-level gather count
    # drops 4 -> 2 (XLA TPU prices gathers per element — NOTES.md r5).
    warp_d: tuple | None = None  # m: (dim/2, dim/2) float32
    warp_e: tuple | None = None  # m: (dim/2, dim/2, 2) float32
    # MXU-gather packings of warp_d / warp_e (render.mxu_gather byte
    # planes), attached by render_pixels when RenderConfig.mxu_gather
    # engages; values bit-equal to the raw tables.
    warp_d_mxu: tuple | None = None
    warp_e_mxu: tuple | None = None
    # MXU-gather packing of the envmap itself (bilinear taps), attached
    # by render_pixels when the map fits the MXU budget (the default
    # 8x6 checkerboard and typical small HDRs; multi-megapixel EXRs keep
    # the XLA gather).
    envmap_mxu: jax.Array | None = None
    # MXU-gather packing of imp_mips[0] (the warp's final texel-ratio
    # fetch + the physical pdf's texel fetch).
    imp0_mxu: jax.Array | None = None
    # fused warp rows: warp_f[m][qy, qx] = (d, eL, eR) — ONE size-3 row
    # gather per descent level instead of d + e (probe_wide_gather.py:
    # XLA TPU prices a trailing row window like a single element
    # access). Values are the same warp_d/warp_e entries, so compares
    # stay bit-identical.
    warp_f: tuple | None = None  # m: (dim/2, dim/2, 3) float32
    # 2x2-quad packed envmap: envmap_quad[y, x] = the 12 floats of the
    # bilinear stencil based at (y, x) — rows y, min(y+1, H-1); columns
    # x, (x+1) % W (GL REPEAT in u, CLAMP in v) — so a bilinear sample
    # is ONE row gather instead of four. 4x the envmap's HBM.
    envmap_quad: jax.Array | None = None


def luma(rgb):
    return (
        rgb[..., 0] * LUMA_WEIGHTS[0]
        + rgb[..., 1] * LUMA_WEIGHTS[1]
        + rgb[..., 2] * LUMA_WEIGHTS[2]
    )


def _host_cpu_device():
    """The host CPU device when the session exposes one ALONGSIDE an
    accelerator backend (volxel_tpu.__init__ widens jax_platforms), else
    None (pure-CPU sessions build in place anyway)."""
    try:
        if jax.default_backend() == "cpu":
            return None
        return jax.local_devices(backend="cpu")[0]
    except Exception:  # noqa: BLE001 — no cpu backend exposed
        return None


def build_env_state(envmap_texture: np.ndarray, strength: float = 1.0) -> EnvState:
    """Build the importance pyramid from a texture-space (H, W, 3) envmap.

    The build is ~110 small one-shot eager ops — on a remote-compile
    accelerator backend each op pays a tunnel compile round trip
    (measured 73 s of BENCH_r04's setup; ref builds the same map in one
    fragment dispatch, environment.ts:47-58). It therefore runs on the
    host CPU backend whenever one is exposed, and the finished pytree is
    uploaded once with a single uncommitted device_put (so sharded
    renders can still replicate it freely).
    """
    cpu = _host_cpu_device()
    if cpu is None:
        return _build_env_state_impl(envmap_texture, strength, use_pallas=None)
    with jax.default_device(cpu):
        state = _build_env_state_impl(envmap_texture, strength, use_pallas=False)
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), state)
    return jax.device_put(state)


def _build_env_state_impl(
    envmap_texture: np.ndarray, strength: float, use_pallas: bool | None
) -> EnvState:
    from volxel_tpu.render.pallas_ops import build_importance_pyramid

    env = jnp.asarray(envmap_texture[..., :3], dtype=jnp.float32)
    lum = luma(env)
    base = jax.image.resize(lum, (IMP_DIM, IMP_DIM), method="linear")
    mips = (base,) + tuple(build_importance_pyramid(base, use_pallas=use_pallas))
    warp_d, warp_e = build_warp_tables(mips)
    warp_f = tuple(
        jnp.concatenate([d[..., None], e], axis=-1)
        for d, e in zip(warp_d, warp_e)
    )
    return EnvState(
        envmap=env,
        imp_mips=mips,
        strength=jnp.float32(strength),
        warp_d=warp_d,
        warp_e=warp_e,
        warp_f=warp_f,
        envmap_quad=pack_envmap_quad(env) if env.size <= ENVQUAD_BUDGET_ELEMS
        else None,
    )


# envmap_quad is built for maps up to this many f32 elements (the packing
# costs 4x the map: a 2048x1024 RGB map is 25 MB -> 100 MB packed)
ENVQUAD_BUDGET_ELEMS = 64 << 20


def pack_envmap_quad(tex: jax.Array) -> jax.Array:
    """(H, W, 3) f32 -> (H, W, 12) bilinear-stencil rows (see
    EnvState.envmap_quad). Pure elementwise — built once at env load."""
    x1 = jnp.roll(tex, -1, axis=1)  # column (x+1) % W  (GL REPEAT)
    y1 = jnp.concatenate([tex[1:], tex[-1:]], axis=0)  # row min(y+1, H-1)
    y1x1 = jnp.roll(y1, -1, axis=1)
    return jnp.concatenate([tex, x1, y1, y1x1], axis=-1)


def build_warp_tables(mips) -> tuple[tuple, tuple]:
    """Per-level warp decision tables (see EnvState): for every aligned
    2x2 quad of mips[m], the left-column probability d and the two
    column-conditional bottom probabilities (eL, eR), computed with the
    exact inline op sequence of sample_environment so the descent's
    compares are bit-identical. ~350k texels total — negligible build."""
    warp_d, warp_e = [], []
    for m in range(IMP_BASE_MIP):
        imp = mips[m]
        w00 = imp[0::2, 0::2]
        w10 = imp[0::2, 1::2]
        w01 = imp[1::2, 0::2]
        w11 = imp[1::2, 1::2]
        q0 = w00 + w01
        q1 = w10 + w11
        d = q0 / jnp.maximum(1e-8, q0 + q1)
        e_l = w00 / jnp.maximum(1e-8, q0)
        e_r = w10 / jnp.maximum(1e-8, q1)
        warp_d.append(d)
        warp_e.append(jnp.stack([e_l, e_r], axis=-1))
    return tuple(warp_d), tuple(warp_e)


class Environment:
    """Host-side environment holder (reference Environment class)."""

    def __init__(self, image_top_down: np.ndarray, strength: float = 1.0):
        # decoded images have row 0 at the top; flip to texture space
        tex = np.ascontiguousarray(image_top_down[::-1, :, :3], dtype=np.float32)
        self.texture = tex
        self.strength = float(strength)
        self.state = build_env_state(tex, strength)

    def with_strength(self, strength: float) -> "Environment":
        self.strength = float(strength)
        self.state = self.state._replace(strength=jnp.float32(strength))
        return self


def default_environment() -> Environment:
    """8x6 checkerboard with a bright top third (environment.ts:94-120)."""
    width, height = 8, 6
    data = np.zeros((height, width, 3), np.float32)
    for y in range(height):
        top = y < height // 3
        for x in range(width):
            light = ((x + y) & 1) == 0
            val = (3.0 if light else 0.9) if top else (0.1 if light else 0.0)
            data[y, x, :] = val
    return Environment(data)


# -- device-side sampling ------------------------------------------------------


def _bilinear_wrap_clamp(tex: jax.Array, u, v, packed=None, quad=None):
    """Bilinear sample of (H, W, C) with wrap in u, clamp in v (GL REPEAT/CLAMP).

    `packed`, when given, is the MXU-gather packing of tex (bit-equal
    taps through one Pallas call instead of 4 vector gathers). `quad` is
    the EnvState.envmap_quad stencil-row packing — the same 4 taps in
    ONE row gather (bit-equal values; wins over `packed`)."""
    h, w = tex.shape[0], tex.shape[1]
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    # GL CLAMP_TO_EDGE clamps each tap independently: for y0 = -1 the two
    # rows are clamp(-1)=0 and clamp(0)=0 — NOT rows 0 and 1 (caught by
    # the scalar GLSL oracle at the equirect poles, tests/oracle.py)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    if quad is not None:
        q = quad[y0i, x0i]  # (..., 12): t00, t10, t01, t11 RGB triples
        t00, t10 = q[..., 0:3], q[..., 3:6]
        # the packed row's second-row half is row y0i+1; when y0 < 0 the
        # clamp aliases BOTH rows to row 0, so the row-y half is the
        # right value (mirrors the trilinear packings' low-edge selects)
        y_low = (y0.astype(jnp.int32) < 0)[..., None]
        t01 = jnp.where(y_low, t00, q[..., 6:9])
        t11 = jnp.where(y_low, t10, q[..., 9:12])
    elif packed is not None:
        from volxel_tpu.render.mxu_gather import mxu_gather_f32

        c = tex.shape[2]
        ch = jnp.arange(c, dtype=jnp.int32)
        base = jnp.stack(
            [y0i * w + x0i, y0i * w + x1i, y1i * w + x0i, y1i * w + x1i]
        )
        taps = mxu_gather_f32(packed, base[..., None] * c + ch)
        t00, t10, t01, t11 = taps[0], taps[1], taps[2], taps[3]
    else:
        t00 = tex[y0i, x0i]
        t10 = tex[y0i, x1i]
        t01 = tex[y1i, x0i]
        t11 = tex[y1i, x1i]
    return (
        t00 * (1 - fx) * (1 - fy)
        + t10 * fx * (1 - fy)
        + t01 * (1 - fx) * fy
        + t11 * fx * fy
    )


def _dir_to_uv(direction):
    u = jnp.arctan2(direction[..., 2], direction[..., 0]) / (2.0 * M_PI) + 0.5
    v = 1.0 - jnp.arccos(jnp.clip(direction[..., 1], -1.0, 1.0)) / M_PI
    return u, v


def lookup_environment(env: EnvState, direction):
    """Equirect radiance lookup (environment.glsl:19-27)."""
    u, v = _dir_to_uv(direction)
    return env.strength * _bilinear_wrap_clamp(
        env.envmap, u, v, getattr(env, "envmap_mxu", None),
        getattr(env, "envmap_quad", None),
    )


def lookup_environment_light(env: EnvState, direction, light_dir):
    """Procedural directional-light fallback (environment.glsl:20-22)."""
    d = jnp.sum(direction * (-light_dir), axis=-1)
    glow = jnp.clip(jnp.power(jnp.maximum(d, 0.0), 300.0), 0.0, 1.0) * 4.0 + 0.01
    return env.strength * glow[..., None] * jnp.ones(3, jnp.float32)


def _warp_gather(raw: jax.Array, packed, flat_idx):
    """One warp-table fetch: MXU one-hot gather when a packing is
    attached (bit-equal values — render.mxu_gather), else XLA gather."""
    if packed is not None:
        from volxel_tpu.render.mxu_gather import mxu_gather_f32

        return mxu_gather_f32(packed, flat_idx)
    return raw.reshape(-1)[flat_idx]


def pack_warp_tables(warp_d: tuple, warp_e: tuple) -> tuple[tuple, tuple]:
    """MXU byte-plane packings for every warp level (render.mxu_gather)."""
    from volxel_tpu.render.mxu_gather import pack_gather_table

    d_mxu = tuple(pack_gather_table(d.reshape(-1)) for d in warp_d)
    e_mxu = tuple(pack_gather_table(e.reshape(-1)) for e in warp_e)
    return d_mxu, e_mxu


def sample_environment(env: EnvState, rnd2, physical: bool = False):
    """Hierarchical warp sample (environment.glsl:36-80).

    rnd2: (..., 2) uniforms. Returns (Le (...,3), pdf (...), w_i (...,3)).
    physical=True reports the warp's true solid-angle density instead of
    the reference's 1/(4*pi)-scaled texel mass (module docstring).
    """
    shape = rnd2.shape[:-1]
    pos_x = jnp.zeros(shape, jnp.int32)
    pos_y = jnp.zeros(shape, jnp.int32)
    px = rnd2[..., 0]
    py = rnd2[..., 1]

    for mip in range(IMP_BASE_MIP - 1, -1, -1):
        if getattr(env, "warp_f", None) is not None and env.warp_d_mxu is None:
            # fused-row path: ONE (d, eL, eR) row gather per level
            # (EnvState.warp_f docstring); same table entries as
            # warp_d/warp_e, so every compare stays bit-identical
            # (pinned by tests/test_scene.py::test_warp_tables_bit_identical)
            row = env.warp_f[mip][pos_y, pos_x]
            d = row[..., 0]
            go_right = px >= d
            e = jnp.where(go_right, row[..., 2], row[..., 1])
        elif env.warp_d is not None:
            # table path: 2 gathers/level instead of 4 (EnvState.warp_d
            # docstring); d/e values and every compare bit-identical to
            # the inline chain below (pinned by
            # tests/test_scene.py::test_warp_tables_bit_identical)
            dim_q = env.warp_d[mip].shape[1]
            d = _warp_gather(
                env.warp_d[mip],
                env.warp_d_mxu[mip] if env.warp_d_mxu is not None else None,
                pos_y * dim_q + pos_x,
            )
            go_right = px >= d
            e = _warp_gather(
                env.warp_e[mip],
                env.warp_e_mxu[mip] if env.warp_e_mxu is not None else None,
                (pos_y * dim_q + pos_x) * 2 + go_right.astype(jnp.int32),
            )
        else:
            imp = env.imp_mips[mip]  # (512>>mip, 512>>mip)
            w00 = imp[pos_y * 2, pos_x * 2]
            w10 = imp[pos_y * 2, pos_x * 2 + 1]
            w01 = imp[pos_y * 2 + 1, pos_x * 2]
            w11 = imp[pos_y * 2 + 1, pos_x * 2 + 1]
            q0 = w00 + w01  # left column
            q1 = w10 + w11  # right column
            d = q0 / jnp.maximum(1e-8, q0 + q1)
            go_right = px >= d
            w_sel_bottom = jnp.where(go_right, w10, w00)
            q_sel = jnp.where(go_right, q1, q0)
            e = w_sel_bottom / jnp.maximum(1e-8, q_sel)
        px = jnp.where(go_right, (px - d) / jnp.maximum(1e-8, 1.0 - d), px / jnp.maximum(1e-8, d))
        pos_x = pos_x * 2 + go_right.astype(jnp.int32)
        go_up = py >= e
        py = jnp.where(go_up, (py - e) / jnp.maximum(1e-8, 1.0 - e), py / jnp.maximum(1e-8, e))
        pos_y = pos_y * 2 + go_up.astype(jnp.int32)

    inv_dim = 1.0 / IMP_DIM
    uv_x = (pos_x.astype(jnp.float32) + px) * inv_dim
    uv_y = (pos_y.astype(jnp.float32) + py) * inv_dim
    theta = jnp.clip(1.0 - uv_y, 0.0, 1.0) * M_PI
    phi = (jnp.clip(uv_x, 0.0, 1.0) * 2.0 - 1.0) * M_PI
    sin_t = jnp.sin(theta)
    w_i = jnp.stack([sin_t * jnp.cos(phi), jnp.cos(theta), sin_t * jnp.sin(phi)], axis=-1)

    le = env.strength * _bilinear_wrap_clamp(
        env.envmap, uv_x, uv_y, getattr(env, "envmap_mxu", None),
        getattr(env, "envmap_quad", None),
    )
    avg_w = env.imp_mips[IMP_BASE_MIP][0, 0]
    texel_ratio = (
        _warp_gather(env.imp_mips[0], env.imp0_mxu, pos_y * IMP_DIM + pos_x)
        / avg_w
    )
    if physical:
        # texel mass / (avg * N) over uv-area 1/N, through the equirect
        # Jacobian d(omega) = 2*pi^2*sin(theta) d(uv): the warp's actual
        # direction density. sin(theta) -> 0 only on the measure-zero
        # poles; the clamp keeps the division finite there.
        pdf = texel_ratio / (
            2.0 * M_PI * M_PI * jnp.maximum(sin_t, jnp.float32(1e-6))
        )
    else:
        pdf = texel_ratio * jnp.float32(1.0 / (4.0 * M_PI))
    return le, pdf, w_i


def sample_environment_light(env: EnvState, rnd2, light_dir):
    """Directional-light sampling branch (environment.glsl:30-33)."""
    shape = rnd2.shape[:-1]
    w_i = jnp.broadcast_to(-light_dir, shape + (3,))
    le = jnp.broadcast_to(env.strength * jnp.float32(4.01), shape)
    return le[..., None] * jnp.ones(3, jnp.float32), jnp.ones(shape, jnp.float32), w_i


def pdf_environment(env: EnvState, direction, physical: bool = False):
    """environment.glsl:82-86 — strength-scaled luma over mean importance.

    physical=True returns the density sample_environment(physical=True)
    actually draws this direction with: the importance-map texel holding
    (u, v) (the very table the warp descends — unscaled, unlike the
    reference's strength-scaled radiance luma) over the equirect Jacobian.
    """
    avg_w = env.imp_mips[IMP_BASE_MIP][0, 0]
    if physical:
        u, v = _dir_to_uv(direction)
        px = jnp.clip((u * IMP_DIM).astype(jnp.int32), 0, IMP_DIM - 1)
        py = jnp.clip((v * IMP_DIM).astype(jnp.int32), 0, IMP_DIM - 1)
        sin_t = jnp.sqrt(
            jnp.maximum(1.0 - jnp.clip(direction[..., 1], -1.0, 1.0) ** 2, 0.0)
        )
        return _warp_gather(
            env.imp_mips[0], getattr(env, "imp0_mxu", None), py * IMP_DIM + px
        ) / avg_w / (
            2.0 * M_PI * M_PI * jnp.maximum(sin_t, jnp.float32(1e-6))
        )
    le = lookup_environment(env, direction)
    return luma(le) / avg_w * jnp.float32(1.0 / (4.0 * M_PI))


def background_color(env: EnvState, direction, hide_envmap: bool, light_dir=None):
    """get_background_color (environment.glsl:89-96) for debug-hits mode."""
    if not hide_envmap:
        return lookup_environment(env, direction)
    d = direction
    horiz = d / jnp.maximum(
        jnp.linalg.norm(d * jnp.array([1.0, 0.0, 1.0]), axis=-1, keepdims=True), 1e-8
    )
    horiz = horiz * jnp.array([1.0, 0.0, 1.0])
    angle_h = jnp.sum(jnp.array([0.0, 0.0, 1.0]) * horiz, axis=-1) * 0.5 + 0.5
    angle_h = jnp.where(jnp.round(angle_h * 8.0).astype(jnp.int32) % 2 == 0, 1.0, 0.0)
    dn = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
    angle_v = jnp.sum(dn * horiz, axis=-1)
    angle_v = jnp.where(jnp.round(angle_v * 8.0).astype(jnp.int32) % 2 == 0, 0.0, 1.0)
    return (jnp.abs(angle_h - angle_v) * 0.05)[..., None] * jnp.ones(3, jnp.float32)
