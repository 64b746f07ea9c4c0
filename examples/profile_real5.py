"""REAL profile, part 5: where the post-ladder 0.35 s/sample lives.

Operating point: march_ladder=True, chunk target 129600, compact_decode
"loop", premul+compact_secondary+compact_env ON.

  mode anchors 960x540/256^3      : default / no_dda / raymarch
  1080p/512^3 default anchor      : the driver-graded headline scene
  ladder on/off at 129600         : net ladder win at the shipping chunk
  transition primitives at 129600 : argsort(bool)+permute, (n,13) row
                                    gather vs 13 column gathers
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

    @jax.jit
    def trivial(x):
        return x + 1.0

    trivial(jnp.float32(1.0)).block_until_ready()
    t0 = time.perf_counter()
    float(np.asarray(trivial(jnp.float32(41.0))))
    print(f"fetch (sync-mode switch): {time.perf_counter() - t0:.1f} s", flush=True)

    from volxel_tpu.render.pathtrace import render_sample

    def timed(tag, fn, reps=3):
        try:
            t0 = time.perf_counter()
            fn().block_until_ready()
            print(f"  {tag}: compile+first {time.perf_counter() - t0:.1f} s", flush=True)
            xs = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn().block_until_ready()
                xs.append(time.perf_counter() - t0)
            print(f"  {tag}: {[round(x, 3) for x in xs]} s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {tag}: FAILED {type(e).__name__}: {e}", flush=True)

    r, _ = _build_renderer(256, width=960, height=540)
    r.render_frame()
    ops = list(r._cached_operands)
    config = ops[0]
    print(f"chunk={config.chunk_size} ladder={config.march_ladder}", flush=True)

    def run(cfg, fi=101):
        o = list(ops)
        o[0] = cfg
        return render_sample(*o, jnp.uint32(fi))

    print("== mode anchors 960x540/256^3 (new defaults)", flush=True)
    for mode in ("default", "no_dda", "raymarch"):
        timed(f"{mode}", lambda m=mode: run(config._replace(mode=m)))
    print("== ladder net at 129600", flush=True)
    timed("default ladder=False", lambda: run(config._replace(march_ladder=False)))

    print("== transition primitives at 129600 lanes (K=16 chained)", flush=True)
    n, K = 129600, 16
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.standard_normal((n, 13)).astype(np.float32))
    mask = jnp.asarray(rng.random(n) < 0.15)

    @jax.jit
    def do_argsort_rowgather(m, v):
        def body(k, v):
            order = jnp.argsort(~m, stable=True)
            return v.at[:, 0].set(v[order][:, 0] * 0.5 + v[:, 0])
        return jax.lax.fori_loop(0, K, body, v)

    timed("argsort+(n,13) row gather", lambda: do_argsort_rowgather(mask, vals))

    @jax.jit
    def do_argsort_cols(m, v):
        def body(k, v):
            order = jnp.argsort(~m, stable=True)
            cols = [v[:, i][order] for i in range(13)]
            return v.at[:, 0].set(sum(cols) * (1.0 / 13.0) + v[:, 0])
        return jax.lax.fori_loop(0, K, body, v)

    timed("argsort+13 column gathers", lambda: do_argsort_cols(mask, vals))

    print("== 1080p/512^3 default anchor (driver scene)", flush=True)
    del r, ops
    r2, _ = _build_renderer(512, width=1920, height=1080)
    r2.render_frame()
    ops2 = list(r2._cached_operands)
    cfg2 = ops2[0]
    print(f"chunk={cfg2.chunk_size}", flush=True)

    def run2(fi=101):
        return render_sample(*([cfg2] + ops2[1:]), jnp.uint32(fi))

    timed("1080p/512^3 default", run2)


if __name__ == "__main__":
    main()
