"""volxel_tpu — a TPU-native progressive Monte-Carlo volume path-tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Volxel/Volxel
(a browser WebGL2 + Rust/WASM DICOM volume path tracer). The compute path is
functional JAX specialized per render mode; ingest is numpy + native C++;
multi-chip scaling uses jax.sharding meshes over ICI.

Layer map (mirrors reference SURVEY.md §1, re-architected for TPU):
  grid/      brick acceleration structure (ranges, indirection, atlas, mips)
  ingest/    DICOM / ZIP / HDR decoding to dense grids (host side)
  scene/     camera, volume transforms, environment lighting
  transfer/  1D RGBA transfer-function LUTs
  render/    the path-tracing kernels (raymarch / delta-tracking / DDA modes)
  api/       Renderer facade, versioned settings JSON, benchmark harness
  parallel/  device-mesh sharding: pixel-sharded rendering, brick slab sharding
  utils/     matrices, fixtures, misc
"""

__version__ = "0.1.0"

from volxel_tpu.api.renderer import Renderer  # noqa: F401
from volxel_tpu.api.settings import (  # noqa: F401
    SettingsExport,
    load_settings,
    save_settings,
    verify_settings,
)
