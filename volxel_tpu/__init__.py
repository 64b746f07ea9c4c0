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

import os as _os


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: render-config compiles cost
    10-30 s on TPU; caching them makes every process after the first
    start instantly. Opt out with VOLXEL_TPU_NO_COMPILE_CACHE=1."""
    if _os.environ.get("VOLXEL_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        path = _os.environ.get(
            "VOLXEL_TPU_COMPILE_CACHE",
            _os.path.join(
                _os.environ.get("XDG_CACHE_HOME", _os.path.expanduser("~/.cache")),
                "volxel_tpu_xla",
            ),
        )
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a requirement


_enable_compilation_cache()

from volxel_tpu.api.renderer import Renderer  # noqa: F401
from volxel_tpu.api.settings import (  # noqa: F401
    SettingsExport,
    load_settings,
    save_settings,
    verify_settings,
)
