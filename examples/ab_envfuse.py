"""Honest sync-mode A/B: fused env row-gathers on/off (round 10).

warp_f fuses the hierarchical warp descent to 1 gather/level (was 2);
envmap_quad fuses every envmap bilinear (NEE le, escape background, pdf)
to 1 row gather (was 4). Gathers are latency-priced per ACCESS
(probe_wide_gather.py), and the 2M-lane background bilinear is most of
the debug_hits floor — expect the win to scale with escaped-ray count.

Usage: python -u examples/ab_envfuse.py [size [width height [passes]]]
"""

from __future__ import annotations

import os
import sys as _sys
import time

import numpy as np

_examples = os.path.dirname(os.path.abspath(__file__))
_sys.path.insert(0, _examples)
_sys.path.insert(0, os.path.dirname(_examples))
from ab_atlas import _build_renderer  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    size = int(_sys.argv[1]) if len(_sys.argv) > 1 else 512
    width = int(_sys.argv[2]) if len(_sys.argv) > 2 else 1920
    height = int(_sys.argv[3]) if len(_sys.argv) > 3 else 1080
    passes = int(_sys.argv[4]) if len(_sys.argv) > 4 else 2

    @jax.jit
    def trivial(x):
        return x + 1.0

    trivial(jnp.float32(1.0)).block_until_ready()
    t0 = time.perf_counter()
    float(np.asarray(trivial(jnp.float32(41.0))))
    print(f"fetch (sync-mode switch): {time.perf_counter() - t0:.1f} s", flush=True)

    from volxel_tpu.render.pathtrace import render_sample

    r, _ = _build_renderer(size, width=width, height=height)
    r.render_frame()
    ops = list(r._cached_operands)
    config = ops[0]
    env_fused = ops[4]
    env_plain = env_fused._replace(warp_f=None, envmap_quad=None)

    arms = {"fused": env_fused, "plain": env_plain}

    def run(env, fi, cfg=config):
        o = list(ops)
        o[0] = cfg
        o[4] = env
        return render_sample(*o, jnp.uint32(fi))

    print("== compiling arms (excluded from timing)", flush=True)
    for tag, env in arms.items():
        t0 = time.perf_counter()
        run(env, 77).block_until_ready()
        print(f"  {tag}: first run {time.perf_counter() - t0:.1f} s", flush=True)
    # debug_hits floor per arm (background bilinear dominates it)
    floors = {}
    for tag, env in arms.items():
        cfg = config._replace(debug_hits=True)
        run(env, 1, cfg).block_until_ready()
        t0 = time.perf_counter()
        run(env, 2, cfg).block_until_ready()
        floors[tag] = time.perf_counter() - t0
        print(f"  {tag} debug_hits floor: {floors[tag]:.3f} s", flush=True)

    times: dict[str, list[float]] = {t: [] for t in arms}
    for p in range(passes):
        print(f"== pass {p}", flush=True)
        for tag, env in arms.items():
            t0 = time.perf_counter()
            run(env, 100 + p).block_until_ready()
            dt = time.perf_counter() - t0
            times[tag].append(dt)
            print(f"  {tag}: {dt:.3f} s", flush=True)

    print("== medians", flush=True)
    med = {tag: float(np.median(xs)) for tag, xs in times.items()}
    for tag, m in med.items():
        print(f"  {tag}: {m:.3f} s/sample", flush=True)
    if med.get("plain"):
        print(
            f"  fused vs plain: {100 * (med['fused'] / med['plain'] - 1):+.1f}%",
            flush=True,
        )

    frames = {tag: np.asarray(run(env, 4242)) for tag, env in arms.items()}
    same = (frames["fused"].view(np.uint32) == frames["plain"].view(np.uint32)).all()
    print(f"  fused bit-identical to plain: {bool(same)}", flush=True)


if __name__ == "__main__":
    main()
