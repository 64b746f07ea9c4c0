"""DistributedRenderer: the Renderer facade over a device mesh.

Same public API as api.renderer.Renderer, but each progressive step runs
sample-parallel x pixel-parallel over the mesh (parallel/shard.py) and
advances `sp` samples at once. Convergence matches the single-chip
renderer exactly (RNG keyed by global pixel + sample index); the
accumulator update accounts for the sp-sample stride.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from volxel_tpu.api.renderer import Renderer
from volxel_tpu.parallel.mesh import make_mesh
from volxel_tpu.parallel.shard import render_sample_sharded



class DistributedRenderer(Renderer):
    def __init__(self, *args, mesh=None, sp: int = 1, px: int | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.mesh = mesh if mesh is not None else make_mesh(sp=sp, px=px)
        self.sp = self.mesh.shape["sp"]

    def render_frame(self):
        """One sharded step = `sp` progressive samples, mean-combined.

        All samples accumulate uniformly from index 0 (the reference's
        zero-weight warm-up is a display nicety for its low-res preview
        frames; every sample is an iid estimator, so including indices
        0..4 changes nothing statistically).
        """
        if self._device_grid is None:
            raise RuntimeError("No volume loaded")
        if self.errored:
            raise RuntimeError(
                "Renderer is in an error state (clear_error() to resume)"
            ) from self.last_error
        if self.suspend:
            return self._framebuffer

        config = self._config()
        n = config.width * config.height
        if self._framebuffer.shape[0] != n:
            self._framebuffer = jnp.zeros((n, 3), jnp.float32)

        if self._cached_operands is None:
            w, h = config.width, config.height
            inv_view = jnp.asarray(
                np.linalg.inv(self.camera.view_matrix()).astype(np.float32)
            )
            inv_proj = jnp.asarray(
                np.linalg.inv(self.camera.proj_matrix(w / h)).astype(np.float32)
            )
            self._cached_operands = (
                config,
                self._device_grid,
                self.volume_params(),
                self._lut,
                self.environment.state,
                inv_view,
                inv_proj,
                jnp.asarray(self.settings.light_dir, jnp.float32),
            )

        config = self._cached_operands[0]
        # the sharded call renders samples [f*sp, f*sp + sp) for step f
        step = self.frame_index
        mean_sp = render_sample_sharded(
            config,
            self.mesh,
            *self._cached_operands[1:],
            jnp.uint32(step),
        )
        count = step * self.sp
        self._framebuffer = (count * self._framebuffer + self.sp * mean_sp) / (
            count + self.sp
        )
        self.frame_index += 1
        return self._framebuffer

    def samples_rendered(self) -> int:
        return self.frame_index * self.sp

    def render(self, samples: int | None = None, batch: int | None = None):
        """Progressive render on the mesh (overrides the single-chip
        batched path — each step already advances sp samples)."""
        total = samples if samples is not None else self.settings.max_samples
        steps = -(-total // self.sp)
        for _ in range(steps):
            self.render_frame()
        return self.image()
