"""Multi-chip rendering: pixel-sharded + sample-parallel over a device mesh.

TPU-native replacement for everything the reference cannot do (it is
single-GPU): the ray wavefront shards over the 'px' mesh axis and each
'sp' rank renders a different progressive sample of the same frame; the
per-rank radiances are combined with a psum-mean over ICI. Because RNG
seeding is a pure function of (global pixel index, global sample index),
the sharded render is bit-identical to the equivalent single-chip sequence
of samples.

Operand placement: LUT/env/camera are replicated; the grid is either
replicated (a 512^3 brick grid is ~150 MiB — comfortably resident per chip)
or, on a mesh with a 'vz' axis, a SlabbedVolume whose dense field is
z-slab-sharded with ICI halos (parallel/volshard.py) for volumes beyond one
chip's HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from volxel_tpu.render.pathtrace import RenderConfig, render_pixels


def sharded_render_fn(
    config: RenderConfig,
    mesh: Mesh,
    slab_axis: str | None = None,
    tap_dtype: str = "float32",
):
    """Build a jitted sharded render: (operands..., frame_index) -> (n, 3).

    Each 'sp' rank renders sample `frame_index * sp + rank`; the result is
    the mean over ranks — i.e. one call advances `sp` progressive samples.
    With slab_axis set the grid operand must be a SlabbedVolume built on
    that mesh axis; ray state is replicated over it and density taps psum
    over it (bit-identical to the replicated-grid render).
    """
    n = config.width * config.height
    sp = mesh.shape["sp"]
    px = mesh.shape["px"]
    if n % px != 0:
        raise ValueError(f"pixel count {n} not divisible by px axis {px}")
    if slab_axis is not None and slab_axis not in mesh.shape:
        raise ValueError(f"slab rendering needs a mesh with a {slab_axis!r} axis")
    slab = slab_axis is not None

    def per_device(grid, params, lut, env, inv_view, inv_proj, light_dir, frame_index):
        px_rank = jax.lax.axis_index("px")
        sp_rank = jax.lax.axis_index("sp")
        if slab:
            grid = grid.local_grid()
        local_n = n // px
        pixel_index = (px_rank * local_n + jnp.arange(local_n)).astype(jnp.uint32)
        sample_index = frame_index * jnp.uint32(sp) + sp_rank.astype(jnp.uint32)
        radiance = render_pixels(
            config,
            grid,
            params,
            lut,
            env,
            inv_view,
            inv_proj,
            light_dir,
            pixel_index,
            sample_index,
        )
        # sample-parallel mean over ICI
        return jax.lax.pmean(radiance, "sp")

    # operands replicated except a slab-sharded grid; output pixels sharded
    # along 'px' (replicated over 'sp' by the pmean and over 'vz' by the
    # lookup psums).
    # check_vma=False: the traversal while_loops initialize carries from
    # replicated constants that become device-varying inside the body
    # (RNG state depends on axis_index); semantics are correct, only the
    # static varying-axis check cannot prove it.
    if slab:
        from volxel_tpu.parallel.volshard import SlabbedVolume

        grid_spec = SlabbedVolume(
            P(slab_axis, None, None), P(), slab_axis, tap_dtype
        )
    else:
        grid_spec = P()
    mapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(grid_spec, P(), P(), P(), P(), P(), P(), P()),
        out_specs=P("px", None),
        check_vma=False,
    )  # jax.shard_map keyword-only API (jax >= 0.8)
    return jax.jit(mapped)


def render_sample_sharded(
    config: RenderConfig,
    mesh: Mesh,
    grid,
    params,
    lut,
    env,
    inv_view,
    inv_proj,
    light_dir,
    frame_index,
):
    """One sharded progressive step (advances mesh.shape['sp'] samples).

    `grid` may be a DeviceGrid (replicated) or a SlabbedVolume (z-slab
    sharded dense field on a mesh with a 'vz' axis) — detected by type.
    """
    from volxel_tpu.parallel.volshard import SlabbedVolume

    slab_axis = grid.axis if isinstance(grid, SlabbedVolume) else None
    tap_dtype = grid.tap_dtype if isinstance(grid, SlabbedVolume) else "float32"
    fn = _cached_sharded_fn(config, mesh, slab_axis, tap_dtype)
    return fn(grid, params, lut, env, inv_view, inv_proj, light_dir, frame_index)


_FN_CACHE: dict = {}


def _cached_sharded_fn(
    config: RenderConfig,
    mesh: Mesh,
    slab_axis: str | None = None,
    tap_dtype: str = "float32",
):
    key = (
        config,
        tuple(d.id for d in mesh.devices.flat),
        mesh.shape["sp"],
        slab_axis,
        tap_dtype,
    )
    if key not in _FN_CACHE:
        _FN_CACHE[key] = sharded_render_fn(config, mesh, slab_axis, tap_dtype)
    return _FN_CACHE[key]
