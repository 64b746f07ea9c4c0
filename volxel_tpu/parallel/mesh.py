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

Both axes ride ICI; no host round-trips inside a frame.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    sp: int = 1,
    px: int | None = None,
    devices=None,
) -> Mesh:
    """Build a (sp, px) mesh over the available devices.

    px defaults to len(devices) // sp.
    """
    devices = list(devices if devices is not None else jax.devices())
    if px is None:
        px = len(devices) // sp
    if sp * px != len(devices):
        raise ValueError(f"mesh {sp}x{px} != {len(devices)} devices")
    arr = np.array(devices).reshape(sp, px)
    return Mesh(arr, axis_names=("sp", "px"))
