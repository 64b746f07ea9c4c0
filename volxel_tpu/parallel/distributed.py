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
    """vz > 1 additionally shards the volume's dense field into z-slabs
    with ICI halos over the 'vz' mesh axis (parallel/volshard.py) — the
    memory-capacity axis for volumes beyond one chip's HBM. Renders stay
    bit-identical to the replicated-volume path."""

    def __init__(
        self,
        *args,
        mesh=None,
        sp: int = 1,
        px: int | None = None,
        vz: int = 1,
        vz_tap_dtype: str = "float32",
        **kwargs,
    ):
        # tile_march stays OFF under sharding unless explicitly forced:
        # the pipelined kernel inside shard_map is untested on real
        # multi-chip topologies (single-chip tunnel here), and the
        # sharded paths' bit-identity contract is load-bearing
        kwargs.setdefault("tile_march", False)
        super().__init__(*args, **kwargs)
        self.mesh = mesh if mesh is not None else make_mesh(sp=sp, px=px, vz=vz)
        self.sp = self.mesh.shape["sp"]
        self.vz = self.mesh.shape.get("vz", 1)
        # "bfloat16" halves the vz density-tap all-reduce payload (the one
        # expensive collective in the slab design, ~330 MB/1080p sample at
        # f32 — NOTES.md) for ~2^-8 relative image drift; default keeps
        # bit-identity with single-chip renders.
        self.vz_tap_dtype = vz_tap_dtype
        self._slabbed = None

    def restart_from_grid(self, grid) -> None:
        """setupFromGrid on a vz mesh: the dense field goes STRAIGHT from
        the host brick grid to per-device z-slabs (volshard.
        build_slabbed_volume_from_brick) — the full field is never
        materialized on any one device or on host, so volumes beyond one
        chip's HBM budget load (VERDICT r3 item 1). Renders stay
        bit-identical to the replicated path (tests/test_volshard.py)."""
        if self.vz == 1:
            return super().restart_from_grid(grid)
        if self.errored:
            return  # restarts are gated while errored (viewer.ts:1156)
        from volxel_tpu.parallel.volshard import build_slabbed_volume_from_brick
        from volxel_tpu.scene.volume import Volume

        self.grid = grid
        self.density_scale = 1.0
        self.settings.volume_clip_min = [0.0, 0.0, 0.0]
        self.settings.volume_clip_max = [1.0, 1.0, 1.0]
        self.volume = Volume.from_grid(grid)
        self.density_scale *= self.volume.rescale_to_unit_cube()
        self._slabbed = build_slabbed_volume_from_brick(
            grid,
            self.mesh,
            tap_dtype=self.vz_tap_dtype,
            maj_dtype=self.maj_dtype,
        )
        self._device_grid = self._slabbed.meta
        self.restart_rendering()

    def _render_grid(self):
        """The grid operand for sharded renders (slab-sharded when vz>1)."""
        if self.vz == 1:
            return self._device_grid
        if self._slabbed is None or self._slabbed.meta.extent is not self._device_grid.extent:
            from volxel_tpu.parallel.volshard import build_slabbed_volume

            self._slabbed = build_slabbed_volume(
                self._device_grid, self.mesh, tap_dtype=self.vz_tap_dtype
            )
        return self._slabbed

    _operand_grid = _render_grid  # shared operand-priming hook (api.renderer)

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

        self._prime_operands(config)
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
