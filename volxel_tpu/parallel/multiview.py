"""Multi-view batch rendering (BASELINE config 5's data-parallel axis).

Renders V camera views of the same scene in one dispatch: vmap over the
camera matrices on one chip, or views sharded over the 'sp' mesh axis with
pixels over 'px' for multi-chip. Each view consumes a distinct RNG stream
(sample index = frame * V + view), so batched results are bit-identical to
rendering the views one at a time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from volxel_tpu.render.pathtrace import RenderConfig, render_pixels


@functools.partial(jax.jit, static_argnums=(0,))
def render_views(
    config: RenderConfig,
    grid,
    params,
    lut,
    env,
    inv_views,  # (V, 4, 4)
    inv_projs,  # (V, 4, 4)
    light_dir,
    frame_index,
):
    """vmap over views -> (V, width*height, 3)."""
    n = config.width * config.height
    pixel_index = jnp.arange(n, dtype=jnp.uint32)
    n_views = inv_views.shape[0]
    view_ids = jnp.arange(n_views, dtype=jnp.uint32)

    def one(inv_view, inv_proj, view_id):
        return render_pixels(
            config,
            grid,
            params,
            lut,
            env,
            inv_view,
            inv_proj,
            light_dir,
            pixel_index,
            frame_index * jnp.uint32(n_views) + view_id,
        )

    return jax.vmap(one)(inv_views, inv_projs, view_ids)


def sharded_multiview_fn(config: RenderConfig, mesh: Mesh, n_views: int):
    """Views sharded over 'sp', pixels over 'px' -> (V, n, 3) jitted fn."""
    n = config.width * config.height
    sp = mesh.shape["sp"]
    px = mesh.shape["px"]
    if n_views % sp != 0 or n % px != 0:
        raise ValueError(
            f"views {n_views} must divide sp={sp}, pixels {n} must divide px={px}"
        )

    def per_device(grid, params, lut, env, inv_views, inv_projs, light_dir, frame_index):
        sp_rank = jax.lax.axis_index("sp")
        px_rank = jax.lax.axis_index("px")
        local_n = n // px
        pixel_index = (px_rank * local_n + jnp.arange(local_n)).astype(jnp.uint32)
        local_v = n_views // sp

        def one(i, acc):
            view_id = sp_rank.astype(jnp.uint32) * jnp.uint32(local_v) + i.astype(
                jnp.uint32
            )
            out = render_pixels(
                config,
                grid,
                params,
                lut,
                env,
                inv_views[i],
                inv_projs[i],
                light_dir,
                pixel_index,
                frame_index * jnp.uint32(n_views) + view_id,
            )
            return acc.at[i].set(out)

        init = jnp.zeros((local_v, local_n, 3), jnp.float32)
        return jax.lax.fori_loop(0, local_v, one, init)

    mapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("sp"), P("sp"), P(), P()),
        out_specs=P("sp", "px", None),
        check_vma=False,
    )
    return jax.jit(mapped)
