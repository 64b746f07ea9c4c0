"""Gradient-shaded surface rendering (BASELINE config 4 — beyond the reference).

First-hit rendering with central-difference density gradients and
Blinn-Phong shading: the classic "CT surface" look. Reuses the traversal
modes for collision finding and shadowing; the normal comes from six
trilinear taps around the hit point. Not present in the reference (its
emission hook is a stub, sampling/common.glsl:87-88); required by the
framework's config 4 (occupancy bricks + adaptive step + early termination
+ gradient Blinn-Phong).
"""

from __future__ import annotations

import jax.numpy as jnp

from volxel_tpu.render.modes import get_mode_functions
from volxel_tpu.render.rays import Rays, ray_box_intersection, sanitize
from volxel_tpu.render.sampling import (
    lookup_density_trilinear,
    world_to_index_point,
)
from volxel_tpu.scene.environment import lookup_environment, lookup_environment_light

# Blinn-Phong material constants
K_AMBIENT = 0.15
K_DIFFUSE = 0.75
K_SPECULAR = 0.25
SHININESS = 32.0


def density_gradient(grid, params, ipos):
    """Central-difference gradient in index space: 6 trilinear taps."""
    grads = []
    for axis in range(3):
        offset = jnp.zeros((3,), jnp.float32).at[axis].set(1.0)
        hi = lookup_density_trilinear(grid, params, ipos + offset)
        lo = lookup_density_trilinear(grid, params, ipos - offset)
        grads.append((hi - lo) * 0.5)
    return jnp.stack(grads, axis=-1)


def trace_shaded(config, grid, params, lut, env, light_dir, origin, direction, state):
    """One-hit gradient Blinn-Phong shading with a traced shadow ray."""
    sample_volume, transmittance = get_mode_functions(
        config.mode, getattr(config, 'physical_shadows', False),
        compact_decode=getattr(config, 'compact_decode', False),
        march_ladder=getattr(config, 'march_ladder', False),
    )
    n = origin.shape[0]
    active = jnp.ones((n,), jnp.bool_)

    state, hit, t, rgb, _ = sample_volume(
        grid, params, lut, origin, direction, state, active
    )

    hit_pos = origin + t[..., None] * direction
    ipos = world_to_index_point(params, hit_pos)
    grad = density_gradient(grid, params, ipos)
    grad_len = jnp.linalg.norm(grad, axis=-1, keepdims=True)
    normal = -grad / jnp.maximum(grad_len, 1e-8)
    # flip toward the viewer so backside hits still shade
    facing = jnp.sum(normal * (-direction), axis=-1, keepdims=True)
    normal = jnp.where(facing < 0, -normal, normal)

    light = -jnp.broadcast_to(light_dir, (n, 3))
    state, shadow = transmittance(grid, params, lut, hit_pos, light, state, hit)

    n_dot_l = jnp.maximum(jnp.sum(normal * light, axis=-1), 0.0)
    half = light - direction
    half = half / jnp.maximum(jnp.linalg.norm(half, axis=-1, keepdims=True), 1e-8)
    n_dot_h = jnp.maximum(jnp.sum(normal * half, axis=-1), 0.0)
    spec = jnp.power(n_dot_h, SHININESS)

    shaded = (
        rgb * (K_AMBIENT + K_DIFFUSE * (n_dot_l * shadow)[..., None])
        + K_SPECULAR * (spec * shadow)[..., None]
    )

    if config.use_env:
        bg = lookup_environment(env, direction)
    else:
        bg = lookup_environment_light(env, direction, light_dir)
    if not config.show_environment:
        bg = jnp.zeros_like(bg)

    return state, sanitize(jnp.where(hit[..., None], shaded, bg))
