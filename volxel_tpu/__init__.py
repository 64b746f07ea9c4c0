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
    start instantly. Opt out with VOLXEL_TPU_NO_COMPILE_CACHE=1.

    The cache directory is keyed by a host-CPU fingerprint: JAX's cache
    key does NOT cover the host's CPU features, so XLA:CPU executables
    AOT-compiled on one machine deserialize on another (cpu_aot_loader
    logs the feature mismatch and warns of SIGILL) — observed as
    intermittent segfaults in CPU test runs when the VM image carried a
    previous host's cache. TPU entries are unaffected but live under the
    same tag (a new host starts a fresh cache either way).

    The cache is not enabled at all when JAX runs on CPU: this jaxlib's
    XLA:CPU executable (de)serialization is unreliable for large
    programs (observed: SIGSEGV deserializing cross-machine entries and
    SIGABRT inside put_executable_and_time serializing fresh ones during
    the test suite), and CPU compiles are cheap enough that the cache
    only ever paid for itself on the TPU side."""
    if _os.environ.get("VOLXEL_TPU_NO_COMPILE_CACHE"):
        return
    if "cpu" in (_os.environ.get("JAX_PLATFORMS") or "").lower():
        return
    try:
        import hashlib as _hashlib
        import platform as _plat

        import jax

        flags = ""
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith(("flags", "Features")):
                        flags = line
                        break
        except OSError:
            pass
        tag = (
            f"{_plat.machine()}-"
            f"{_hashlib.sha256(flags.encode()).hexdigest()[:12]}"
        )
        path = _os.environ.get(
            "VOLXEL_TPU_COMPILE_CACHE",
            _os.path.join(
                _os.environ.get("XDG_CACHE_HOME", _os.path.expanduser("~/.cache")),
                "volxel_tpu_xla",
                tag,
            ),
        )
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a requirement


def _expose_host_cpu_backend() -> None:
    """Widen jax_platforms so the host CPU backend coexists with the
    accelerator backend (priority order keeps the accelerator default).

    Why: cheap eager preprocessing (the env importance build — ~110
    small one-shot ops) costs ~0.6 s PER OP on a tunneled remote-compile
    backend (BENCH_r04 measured it as 73 of the 115 s setup); on the
    host CPU the same build is milliseconds, and the finished pytree is
    device_put once. Must run before the first backend use — harmless
    no-op if backends already initialized (config.update raises) or when
    JAX_PLATFORMS already includes cpu / is unset."""
    plats = _os.environ.get("JAX_PLATFORMS") or ""
    if not plats or "cpu" in plats.lower():
        return
    try:
        import jax

        jax.config.update("jax_platforms", plats + ",cpu")
    except Exception:
        pass


_enable_compilation_cache()
_expose_host_cpu_backend()

from volxel_tpu.api.renderer import Renderer  # noqa: F401
from volxel_tpu.api.settings import (  # noqa: F401
    SettingsExport,
    load_settings,
    save_settings,
    verify_settings,
)
