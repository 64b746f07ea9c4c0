"""Device-mesh construction helpers.

The reference is single-GPU; its only parallelism is a Web Worker and the
implicit per-pixel SIMT of the fragment shader (SURVEY §2.5). Here the
scaling axes are explicit:

  'sp' — sample parallelism: each rank renders a different progressive
         sample index of the same frame, combined with a psum-mean. The
         multi-chip generalization of the reference's temporal
         accumulation loop (viewer.ts:1194-1226).
  'px' — pixel parallelism: the ray wavefront is sharded across chips,
         the multi-chip generalization of the fragment-shader launch.
  'vz' — volume z-slab sharding: the dense voxel field is split across
         chips with 2-voxel ICI halos (parallel/volshard.py) for volumes
         beyond one chip's HBM; density taps psum over this axis.

All axes ride ICI; no host round-trips inside a frame.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    sp: int = 1,
    px: int | None = None,
    vz: int = 1,
    devices=None,
) -> Mesh:
    """Build a (sp, px[, vz]) mesh over the available devices.

    px defaults to len(devices) // (sp * vz). The 'vz' axis is only added
    when vz > 1 (keeping the common 2-axis shape for the replicated-volume
    case). With vz > 1, prefer vz innermost (fastest-varying devices =
    nearest ICI neighbors) since halo ppermutes ride that axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if px is None:
        px = len(devices) // (sp * vz)
    if sp * px * vz != len(devices):
        raise ValueError(
            f"mesh {sp}x{px}" + (f"x{vz}" if vz > 1 else "")
            + f" != {len(devices)} devices"
        )
    if vz > 1:
        arr = np.array(devices).reshape(sp, px, vz)
        return Mesh(arr, axis_names=("sp", "px", "vz"))
    arr = np.array(devices).reshape(sp, px)
    return Mesh(arr, axis_names=("sp", "px"))
