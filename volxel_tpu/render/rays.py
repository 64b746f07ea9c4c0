"""Ray setup and intersection utilities (shaders/utils.glsl in JAX).

Camera rays are generated from inverse view/projection matrices exactly as
cameraWorldPos/cameraWorldDir (utils.glsl:23-40), with the reference's
sub-pixel anti-aliasing jitter (fragment.frag:57-65, seeded with the
average of two rng2 draws, fragment.frag:147).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from volxel_tpu.utils.mathutil import LUMA_WEIGHTS


class Rays(NamedTuple):
    origin: jax.Array  # (..., 3)
    direction: jax.Array  # (..., 3)


def camera_world_pos(inv_view):
    h = inv_view @ jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)
    return h[:3] / h[3]


def camera_rays(inv_view, inv_proj, ndc_xy):
    """World-space rays through NDC positions (utils.glsl:28-40).

    ndc_xy: (..., 2) in [0,1]^2 screen space.
    """
    cam_pos = camera_world_pos(inv_view)
    clip = jnp.concatenate(
        [
            ndc_xy * 2.0 - 1.0,
            jnp.zeros(ndc_xy.shape[:-1] + (1,), jnp.float32),
            jnp.ones(ndc_xy.shape[:-1] + (1,), jnp.float32),
        ],
        axis=-1,
    )
    view_h = clip @ inv_proj.T
    view = view_h[..., :3] / view_h[..., 3:4]
    world_h = jnp.concatenate([view, jnp.ones_like(view[..., :1])], axis=-1) @ inv_view.T
    world = world_h[..., :3] / world_h[..., 3:4]
    direction = world - cam_pos
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    return Rays(jnp.broadcast_to(cam_pos, direction.shape), direction)


def pixel_ndc(width: int, height: int, jitter):
    """Per-pixel screen positions with AA jitter (fragment.frag:57-65).

    jitter: (..., 2) uniforms in [0,1). Returns (..., 2) screen coords where
    (...) = (height*width,) flattened pixel order (row-major, row 0 bottom —
    GL fragment convention).
    """
    ys, xs = jnp.meshgrid(
        (jnp.arange(height, dtype=jnp.float32) + 0.5) / height,
        (jnp.arange(width, dtype=jnp.float32) + 0.5) / width,
        indexing="ij",
    )
    tex = jnp.stack([xs, ys], axis=-1).reshape(-1, 2)
    offs = (jitter * 2.0 - 1.0) / jnp.array([width, height], jnp.float32)
    return tex + offs


def ray_box_intersection(rays: Rays, aabb_lo, aabb_hi):
    """Slab test (utils.glsl:61-69). Returns (hit, near, far)."""
    inv_dir = 1.0 / rays.direction
    lo = (aabb_lo - rays.origin) * inv_dir
    hi = (aabb_hi - rays.origin) * inv_dir
    tmin = jnp.minimum(lo, hi)
    tmax = jnp.maximum(lo, hi)
    near = jnp.maximum(0.0, jnp.max(tmin, axis=-1))
    far = jnp.min(tmax, axis=-1)
    return near <= far, near, far


def luma(rgb):
    return (
        rgb[..., 0] * LUMA_WEIGHTS[0]
        + rgb[..., 1] * LUMA_WEIGHTS[1]
        + rgb[..., 2] * LUMA_WEIGHTS[2]
    )


def power_heuristic(a, b):
    return (a * a) / (a * a + b * b)


def sanitize(x):
    """Replace NaN/Inf with 0 (utils.glsl:96-98)."""
    return jnp.where(jnp.isfinite(x), x, 0.0)


# -- phase functions (utils.glsl:119-139) ---------------------------------------


def phase_henyey_greenstein(cos_t, g):
    denom = 1.0 + g * g + 2.0 * g * cos_t
    return (
        jnp.float32(1.0 / (4.0 * jnp.pi))
        * (1.0 - g * g)
        / (denom * jnp.sqrt(jnp.maximum(denom, 1e-12)))
    )


def align_to(n, v):
    """Build a tangent frame around n and express v in it (utils.glsl:106-113)."""
    use_x = jnp.abs(n[..., 0]) > jnp.abs(n[..., 1])
    inv_len_xz = 1.0 / jnp.sqrt(n[..., 0] ** 2 + n[..., 2] ** 2 + 1e-20)
    inv_len_yz = 1.0 / jnp.sqrt(n[..., 1] ** 2 + n[..., 2] ** 2 + 1e-20)
    t_x = jnp.where(
        use_x[..., None],
        jnp.stack([-n[..., 2], jnp.zeros_like(n[..., 0]), n[..., 0]], -1)
        * inv_len_xz[..., None],
        jnp.stack([jnp.zeros_like(n[..., 0]), n[..., 2], -n[..., 1]], -1)
        * inv_len_yz[..., None],
    )
    b = jnp.cross(n, t_x)
    out = v[..., 0:1] * t_x + v[..., 1:2] * b + v[..., 2:3] * n
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def sample_phase_henyey_greenstein(direction, g, rnd2):
    """HG importance sample around `direction` (utils.glsl:131-139)."""
    u, v = rnd2[..., 0], rnd2[..., 1]
    iso_cos = 1.0 - 2.0 * u
    sqr_g = g * g
    frac = (1.0 - sqr_g) / (1.0 - g + 2.0 * g * u + 1e-20)
    hg_cos = (1.0 + sqr_g - frac * frac) / (2.0 * g + 1e-20)
    cos_t = jnp.where(jnp.abs(g) < 1e-4, iso_cos, hg_cos)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * jnp.pi * v
    local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
    return align_to(direction, local)
