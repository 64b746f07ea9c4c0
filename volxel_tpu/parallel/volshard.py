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

import numpy as np

from volxel_tpu.parallel.slab import _halo_exchange_z
from volxel_tpu.render.sampling import (
    SLAB_HALO,
    DeviceGrid,
    SlabGrid,
    build_majorant_pyramid,
    decode_dense_brick_rows,
)
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
            "volume sharding from a DeviceGrid requires the dense decoded "
            "field (device_grid_from_brick(dense=True)); for volumes too "
            "large to decode on one device use "
            "build_slabbed_volume_from_brick(host_brick_grid, mesh)"
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


def build_slabbed_volume_from_brick(
    grid,
    mesh: Mesh,
    axis: str = "vz",
    tap_dtype: str = "float32",
    maj_dtype: str = "float32",
) -> SlabbedVolume:
    """Build a SlabbedVolume DIRECTLY from a host BrickGrid — the
    out-of-core load path (north-star configs[4], BASELINE.md:27-28).

    Unlike build_slabbed_volume, the full dense field is NEVER
    materialized anywhere: each device's halo'd z-slab is decoded on host
    from just its brick rows (decode_dense_brick_rows — peak host memory
    one slab) and placed on its owner via jax.make_array_from_callback.
    Boundary halos are zero, exactly what _halo_exchange_z's edge devices
    receive, and slab interiors decode the same per-voxel math — so the
    result is BIT-IDENTICAL to build_slabbed_volume of the replicated
    dense field (pinned by tests/test_volshard.py). The replicated
    metadata keeps only what SlabGrid reads (majorant pyramid + extent);
    atlas/ranges/ptr are empty so nothing volume-sized rides along
    replicated.

    `grid` is a grid.brick.BrickGrid (host side).
    """
    import ml_dtypes

    bx, by, bz = grid.brick_count
    z, y, x = bz * 8, by * 8, bx * 8
    n = mesh.shape[axis]
    slab = div_round_up(z, n)
    local_z = slab + 2 * SLAB_HALO
    shape = (n * local_z, y, x)
    sharding = NamedSharding(mesh, P(axis, None, None))

    cache: dict[int, np.ndarray] = {}

    def _block(d: int) -> np.ndarray:
        if d not in cache:
            z0 = d * slab - SLAB_HALO
            z1 = d * slab + slab + SLAB_HALO
            blk = np.zeros((local_z, y, x), ml_dtypes.bfloat16)
            zlo, zhi = max(z0, 0), min(z1, z)
            if zlo < zhi:
                b0, b1 = zlo >> 3, (zhi + 7) >> 3
                rows = decode_dense_brick_rows(grid, b0, b1)
                blk[zlo - z0 : zhi - z0] = rows[zlo - b0 * 8 : zhi - b0 * 8]
            cache[d] = blk
        return cache[d]

    def _callback(index):
        start = index[0].start or 0
        return _block(start // local_z)

    dense_halo = jax.make_array_from_callback(shape, sharding, _callback)
    cache.clear()

    maj = build_majorant_pyramid(grid, maj_dtype)
    meta = DeviceGrid(
        atlas=jnp.zeros((0, 0, 0), jnp.uint8),
        range_lo=jnp.zeros((0, 0, 0), jnp.float32),
        range_hi=jnp.zeros((0, 0, 0), jnp.float32),
        ptr=jnp.zeros((0, 0, 0, 3), jnp.int32),
        maj_mips=jnp.asarray(maj),
        extent=jnp.asarray(np.array(grid.index_extent, np.int32)),
        dense=None,
    )
    return SlabbedVolume(dense_halo, meta, axis, tap_dtype)
