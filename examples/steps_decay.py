"""Per-iteration running-lane decay of the camera sample_volume march.

Sizes the in-loop shrink-ladder idea: if most lanes terminate early and a
few marchers force the chunk's while_loop to run long, the full-width
per-iteration majorant gather wastes width x (max_steps - lane_steps)
gather-lane-slots. Reports, per tile-major 16200-lane chunk:

  max steps, mean steps, sum(steps) vs width*max ("slack ratio"),
  and the global running-count decay curve (fraction of lanes still
  running after i iterations, chunk-averaged).

CPU (the counts are hardware-independent).
"""

from __future__ import annotations

import os
import sys as _sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

import numpy as np

_sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_atlas import _build_renderer  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from volxel_tpu.render.modes import get_mode_functions
    from volxel_tpu.render.pathtrace import _tile_permutations
    from volxel_tpu.render.rays import camera_rays
    from volxel_tpu.render.rng import rng2, seed_rays

    import sys

    w, h, size = 960, 540, 256
    r, _ = _build_renderer(size, width=w, height=h)
    if "--filled" in sys.argv:
        # the volume-filling 3x-density protocol (bench._frame_filled)
        from volxel_tpu.scene.camera import Camera

        r.camera = Camera(1.0)
        r.camera.rotate_around_view(0.6, 0.4)
        r.camera.zoom(0.8)
        r.settings.density_multiplier = 3.0
        r.restart_rendering()
        print("framing: FILLED (97.5% AABB coverage, 3x density)", flush=True)
    r.render_frame()
    ops = list(r._cached_operands)
    config = ops[0]
    grid, params, lut = ops[1], ops[2], ops[3]
    cs = config.chunk_size
    perm, _inv, area = _tile_permutations(config)
    cs = area
    print(f"chunk={cs}  chunks={w * h // cs}", flush=True)

    inv_view = jnp.asarray(np.linalg.inv(r.camera.view_matrix()).astype(np.float32))
    inv_proj = jnp.asarray(
        np.linalg.inv(r.camera.proj_matrix(w / h)).astype(np.float32)
    )

    sv, tr = get_mode_functions("default", compact_decode="loop")

    def steps_of(fn, out_idx):
        @jax.jit
        def traced(grid, params, lut, inv_view, inv_proj):
            pixel_index = jnp.asarray(perm, jnp.uint32)

            def one(pi):
                state = seed_rays(pi, jnp.uint32(3))
                state, jit2 = rng2(state)
                px = (pi % jnp.uint32(w)).astype(jnp.float32)
                py = (pi // jnp.uint32(w)).astype(jnp.float32)
                tex = jnp.stack([(px + 0.5) / w, (py + 0.5) / h], axis=-1)
                ndc = tex + (jit2 * 2.0 - 1.0) / jnp.array([w, h], jnp.float32)
                rays = camera_rays(inv_view, inv_proj, ndc)
                active = jnp.ones(pi.shape, jnp.bool_)
                out = fn(
                    grid, params, lut, rays.origin, rays.direction, state,
                    active, with_stats=True,
                )
                return out[out_idx]

            return jax.lax.map(one, pixel_index.reshape(-1, cs))

        return np.asarray(traced(grid, params, lut, inv_view, inv_proj))

    for tag, fn, out_idx in (("sample_volume", sv, 5), ("transmittance", tr, 2)):
        steps = steps_of(fn, out_idx)  # (chunks, cs) int32
        mx = steps.max(axis=1)
        sm = steps.sum(axis=1)
        slack = (mx.astype(np.float64) * cs) / np.maximum(sm, 1)
        print(f"== {tag} (camera wavefront)", flush=True)
        print(
            f"  per-chunk max: min/p50/max = {mx.min()}/{np.median(mx):.0f}/{mx.max()}"
        )
        print(
            f"  per-lane steps: p50/p90/p99 = "
            f"{np.percentile(steps, 50):.0f}/{np.percentile(steps, 90):.0f}/"
            f"{np.percentile(steps, 99):.0f}  mean {steps.mean():.1f}"
        )
        print(
            f"  slack ratio width*max / sum(steps): p50 {np.median(slack):.2f}  "
            f"mean {slack.mean():.2f}"
        )
        # running fraction after i iterations ~= fraction of lanes whose
        # step count exceeds i (exact for monotone-shrinking running sets)
        iters = np.arange(0, steps.max() + 1)
        frac = (steps[..., None] > iters[None, None, :]).mean(axis=(0, 1))
        marks = [1, 2, 4, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256]
        decay = {i: round(float(frac[i]), 4) for i in marks if i < len(frac)}
        print(f"  running fraction after i iters: {decay}", flush=True)
        # ladder model: per-iteration gather cost ~ a + b*width(i) with
        # width(i) = cs * frac(i) rounded up to the next power-of-2 ladder
        # rung; full-width cost ~ a + b*cs every iteration
        b = 0.44e-3 / 16200  # measured: one 16200-lane gather = 0.44 ms
        for a_ms in (0.02, 0.05, 0.1):
            a = a_ms * 1e-3
            full = mx.mean() * (a + b * cs)
            rungs = cs / (2 ** np.arange(0, 7))
            widths = np.array(
                [rungs[rungs >= f * cs].min() if (rungs >= f * cs).any() else rungs[-1]
                 for f in frac]
            )
            ladd = np.sum(a + b * widths[: int(mx.mean()) + 1])
            print(
                f"  model a={a_ms} ms: full {full * 1e3:.1f} ms/chunk-loop, "
                f"ladder {ladd * 1e3:.1f} ms ({full / ladd:.2f}x)",
                flush=True,
            )


if __name__ == "__main__":
    main()
