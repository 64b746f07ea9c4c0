"""Render-time volume sharding: z-slab dense field with ICI halo exchange.

North star configs[4]: "large or time-series volumes shard as bricks across
chips with halo exchange over ICI". The bulk operand is the decoded dense
voxel field (DeviceGrid.dense — a 512^3 bf16 field is 256 MiB; 2048^3 is
16 GiB and MUST shard); everything else in the grid (majorant pyramid,
extent) is a few MiB of metadata and stays replicated.

At load time the dense field is z-slab-sharded over the 'vz' mesh axis and
every device exchanges a SLAB_HALO(=2)-voxel boundary band with its
neighbors via one bidirectional ppermute pair — the reference's brick
dilation half-width (brick.rs:101-103), which also covers every trilinear
stencil (common.glsl:61-69), so all filter taps whose owner is this device
resolve locally. At render time lookups psum owner-masked local taps over
'vz' (render.sampling.SlabGrid); renders are bit-identical to the
replicated-grid path (tests/test_volshard.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from volxel_tpu.parallel.slab import _halo_exchange_z
from volxel_tpu.render.sampling import SLAB_HALO, DeviceGrid, SlabGrid
from volxel_tpu.utils.mathutil import div_round_up


class SlabbedVolume:
    """DeviceGrid split for sharding: bulk dense field + replicated metadata.

    `dense_halo` is a global jax array of shape (vz*(slab+2*SLAB_HALO), Y, X)
    sharded P('vz', None, None): each device's local block is its slab plus
    materialized halos. `meta` is the DeviceGrid with dense=None (replicated).
    Registered as a pytree so it can flow through shard_map operand lists.
    """

    def __init__(self, dense_halo, meta: DeviceGrid, axis: str,
                 tap_dtype: str = "float32"):
        self.dense_halo = dense_halo
        self.meta = meta
        self.axis = axis
        self.tap_dtype = tap_dtype

    def tree_flatten(self):
        return (self.dense_halo, self.meta), (self.axis, self.tap_dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, axis=aux[0], tap_dtype=aux[1])

    def in_spec(self):
        """shard_map in_spec pytree: dense sharded over axis, meta replicated."""
        return SlabbedVolume(
            P(self.axis, None, None), P(), self.axis, self.tap_dtype
        )

    def local_grid(self) -> SlabGrid:
        """Per-device view (call inside shard_map): the SlabGrid lookups use."""
        return SlabGrid(
            dense_local=self.dense_halo,
            maj_mips=self.meta.maj_mips,
            extent=self.meta.extent,
            axis=self.axis,
            tap_dtype=self.tap_dtype,
        )


jax.tree_util.register_pytree_node(
    SlabbedVolume,
    SlabbedVolume.tree_flatten,
    SlabbedVolume.tree_unflatten,
)


def _exchange(local, axis):
    return _halo_exchange_z(local, axis)


def build_slabbed_volume(
    grid: DeviceGrid, mesh: Mesh, axis: str = "vz", tap_dtype: str = "float32"
) -> SlabbedVolume:
    """Shard a DeviceGrid's dense field into halo'd z-slabs over `axis`.

    One jitted shard_map does the halo exchange on-device (ppermute over
    ICI); the result stays resident, sharded, for all subsequent frames.
    `tap_dtype="bfloat16"` opts into half-payload density-tap all-reduces
    (see SlabGrid.tap_dtype; off by default to preserve bit-identity).
    """
    if grid.dense is None:
        raise ValueError(
            "volume sharding requires the dense decoded field "
            "(device_grid_from_brick(dense=True))"
        )
    n = mesh.shape[axis]
    z, y, x = grid.dense.shape
    slab = div_round_up(z, n)
    z_pad = slab * n
    dense = grid.dense
    if z_pad != z:
        dense = jnp.pad(dense, ((0, z_pad - z), (0, 0), (0, 0)))

    sharding = NamedSharding(mesh, P(axis, None, None))
    dense = jax.device_put(dense, sharding)
    fn = shard_map(
        functools.partial(_exchange, axis=axis),
        mesh=mesh,
        in_specs=P(axis, None, None),
        out_specs=P(axis, None, None),
        check_vma=False,
    )
    dense_halo = jax.jit(fn)(dense)
    meta = grid._replace(dense=None)
    return SlabbedVolume(dense_halo, meta, axis, tap_dtype)
