"""A/B: MXU triangular-dot cumsum in _partition_perm vs the serialized
jnp.cumsum scan — full render_sample, default mode, wide AND filled
framings (one process, honest sync mode).

Every compaction engagement (collision-decode iterations, ladder
transitions, secondary/env sites) pays _partition_perm at wavefront
width; the r5 profile priced the scan cumsum at 1.9 ms/131k lanes and
cumsum+scatter at 2.7 — likely the dominant per-engagement cost now
that the octo decode cut the actual decode to ~1 row gather.

Arms recompile (jax.clear_caches between them — same config, so the
trace cache can't be allowed to alias them).

Usage: python examples/ab_cumsum.py [size [reps]]
"""

from __future__ import annotations

import os
import sys as _sys
import time

import numpy as np

_sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_atlas import _build_renderer  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from volxel_tpu.render import modes
    from volxel_tpu.render.pathtrace import render_sample

    size = int(_sys.argv[1]) if len(_sys.argv) > 1 else 512
    reps = int(_sys.argv[2]) if len(_sys.argv) > 2 else 3

    @jax.jit
    def trivial(x):
        return x + 1.0

    trivial(jnp.float32(1.0)).block_until_ready()
    t0 = time.perf_counter()
    float(np.asarray(trivial(jnp.float32(41.0))))
    print(f"fetch (sync-mode switch): {time.perf_counter() - t0:.1f} s", flush=True)

    r, _ = _build_renderer(size, width=1920, height=1080)
    r.render_frame()
    ops_wide = list(r._cached_operands)

    from volxel_tpu.scene.camera import Camera

    r.camera = Camera(1.0)
    r.camera.rotate_around_view(0.6, 0.4)
    r.camera.zoom(0.8)
    r.settings.density_multiplier = 3.0
    r.restart_rendering()
    r.render_frame()
    ops_filled = list(r._cached_operands)

    def run(ops, fi=101):
        return render_sample(*ops, jnp.uint32(fi))

    def timed(tag, ops, n=reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(ops))
        print(f"  {tag}: compile+first {time.perf_counter() - t0:.1f} s",
              flush=True)
        xs = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(run(ops))
            xs.append(time.perf_counter() - t0)
        print(f"  {tag}: {[round(x, 3) for x in xs]} s", flush=True)

    scan_cumsum = lambda x: jnp.cumsum(x)  # noqa: E731
    mxu_cumsum = modes._cumsum_mxu

    for p in range(2):
        for arm, fn in (("scan", scan_cumsum), ("mxu", mxu_cumsum)):
            modes._cumsum_mxu = fn
            jax.clear_caches()
            print(f"== pass {p} arm {arm}", flush=True)
            timed(f"{arm}/wide", ops_wide)
            timed(f"{arm}/filled", ops_filled, n=2)
    modes._cumsum_mxu = mxu_cumsum


if __name__ == "__main__":
    main()
