"""Pallas TPU kernels for the regular-access compute paths.

Scope note (measured on this repo's workloads): the path tracer's hot
loops are gather-bound — per-lane dynamic indexing into HBM-resident
volumes — which Mosaic cannot express (probed: `table[idx]` fails with
"Cannot do int indexing on TPU", take_along_axis asserts). XLA's gather
HLO is the right tool there, and the wavefront/chunking design already
runs 1080p at ~0.14-0.33 ms/sample. Pallas is applied where access is
regular:

  * build_importance_pyramid — all 10 mip levels of the environment
    importance map in ONE kernel: 2x2 mean pooling expressed as P @ A @ P^T
    matmuls on the MXU with pooling operators generated in-kernel from
    iota, intermediate levels living in VMEM scratch (512^2 f32 = 1 MiB).
    Replaces 9 separate XLA reduce kernels + round trips.
  * tonemap_display — fused Hable filmic tonemap + exposure + gamma over
    the flat framebuffer (blit.frag:17-35), one VMEM pass.

Each has an XLA fallback (used on CPU test meshes) and an equivalence test.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from volxel_tpu.scene.environment import IMP_BASE_MIP, IMP_DIM


def _pool_operator(half: int):
    """(half, 2*half) matrix with 0.5 at [i, 2i] and [i, 2i+1]."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (half, 2 * half), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (half, 2 * half), 1)
    sel = (cols == 2 * rows) | (cols == 2 * rows + 1)
    return jnp.where(sel, jnp.float32(0.5), jnp.float32(0.0))


def _pyramid_kernel(base_ref, *out_refs):
    level = base_ref[:]
    for k in range(IMP_BASE_MIP):
        half = IMP_DIM >> (k + 1)
        p = _pool_operator(half)
        pooled_rows = jnp.dot(
            p, level,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        level = jnp.dot(
            pooled_rows, p.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        out_refs[k][:] = level


def build_importance_pyramid_pallas(base: jax.Array) -> tuple:
    """(512, 512) luma -> tuple of 9 pooled levels (256^2 ... 1^2)."""
    out_shapes = tuple(
        jax.ShapeDtypeStruct((IMP_DIM >> (k + 1), IMP_DIM >> (k + 1)), jnp.float32)
        for k in range(IMP_BASE_MIP)
    )
    return pl.pallas_call(
        _pyramid_kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(IMP_BASE_MIP)
        ),
    )(base)


def build_importance_pyramid_xla(base: jax.Array) -> tuple:
    """Fallback: successive 2x2 mean pools."""
    levels = []
    level = base
    for _ in range(IMP_BASE_MIP):
        h, w = level.shape
        level = level.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        levels.append(level)
    return tuple(levels)


def build_importance_pyramid(base: jax.Array, use_pallas: bool | None = None) -> tuple:
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        try:
            return build_importance_pyramid_pallas(base)
        except Exception:  # Mosaic feature gaps on older runtimes
            pass
    return build_importance_pyramid_xla(base)


# -- fused display kernel --------------------------------------------------------


def _hable(rgb):
    a, b, c, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    return ((rgb * (a * rgb + c * b) + d * e) / (rgb * (a * rgb + b) + d * f)) - e / f


def _tonemap_kernel(fb_ref, scalars_ref, out_ref):
    exposure = scalars_ref[0]
    inv_gamma = scalars_ref[1]
    w_ref = _hable(jnp.float32(11.2))
    mapped = _hable(exposure * fb_ref[:]) / w_ref
    out_ref[:] = jnp.power(jnp.maximum(mapped, 0.0), inv_gamma)


@functools.partial(jax.jit, static_argnums=())
def tonemap_display_pallas(framebuffer: jax.Array, exposure, gamma):
    """Fused Hable tonemap + gamma over a flat (N, 3) framebuffer.

    The buffer is viewed as (N*3/128, 128) lanes for clean VPU tiling.
    Requires N*3 % 128 == 0 (any 1080p/720p-style resolution satisfies it).
    """
    n3 = framebuffer.size
    flat = framebuffer.reshape(n3 // 128, 128)
    scalars = jnp.stack([exposure, 1.0 / gamma]).astype(jnp.float32)
    out = pl.pallas_call(
        _tonemap_kernel,
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(flat, scalars)
    return out.reshape(framebuffer.shape)


def tonemap_display(framebuffer: jax.Array, exposure, gamma):
    """Dispatch: Pallas on TPU when the shape tiles, else the jnp path."""
    from volxel_tpu.render.pathtrace import tonemap

    if jax.default_backend() == "tpu" and framebuffer.size % 128 == 0:
        try:
            return tonemap_display_pallas(
                framebuffer, jnp.float32(exposure), jnp.float32(gamma)
            )
        except Exception:
            pass
    return tonemap(framebuffer, jnp.float32(exposure), jnp.float32(gamma))
