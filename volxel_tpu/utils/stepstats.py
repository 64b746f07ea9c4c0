"""Traversal step-count statistics: the loop-cap variance study.

The TPU traversal loops carry static iteration caps (modes.py:44-47) where
the GL originals are unbounded (except transmittanceDDA's 100-step cap,
dda.glsl:18). This module measures the actual per-ray step distributions on
a scene so the caps are evidence-backed: a capped lane silently truncates
the estimator (biasing dense scenes), so the percentiles and max must stay
well under the caps. tests/test_stepstats.py pins this on a 3x-density
scene; bench.py reports the percentiles on the benchmark scene.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from volxel_tpu.render import modes
from volxel_tpu.render.rays import camera_rays
from volxel_tpu.render.rng import rng2, seed_rays


def _operands(renderer):
    r = renderer
    w, h = r.width, r.height
    inv_view = jnp.asarray(np.linalg.inv(r.camera.view_matrix()).astype(np.float32))
    inv_proj = jnp.asarray(
        np.linalg.inv(r.camera.proj_matrix(w / h)).astype(np.float32)
    )
    return r._device_grid, r.volume_params(), r._lut, inv_view, inv_proj


MAX_RAYS = 1 << 16  # cap the instrumented wavefront (large lane counts
# compile slowly and have crashed the tunneled TPU worker; NOTES.md).
# 64k uniformly strided pixels give the percentiles to well under 1%.
CHUNK = 1 << 14  # lanes per instrumented block: the monolithic 256k-lane
# jit took 104 s to compile at 1080p/256^3 and faulted the TPU worker at
# 512^3 (BENCH_r02); lax.map over blocks mirrors render_pixels' chunking
# (pathtrace.py), which exists for exactly this reason. Callers must also
# sandbox (bench.py runs this in a subprocess with a deadline: the r3
# chip faulted on the instrumented program even chunked at 32k lanes).


def step_statistics(renderer, mode: str | None = None, sample_index: int = 0) -> dict:
    """Per-ray step counts for one primary-visibility wavefront plus the
    shadow-ray transmittance wavefront from the hit points.

    At most MAX_RAYS pixels are measured, strided uniformly across the
    image. Returns {"sample": stats, "transmittance": stats, "mode": ...}
    where stats = {p50, p90, p99, max, cap, frac_at_cap}.
    """
    r = renderer
    mode = mode or r.settings.render_mode
    if mode == "raymarch":
        # fixed-step: 64 iterations always, no caps to study
        fixed = {
            "p50": 64, "p90": 64, "p99": 64, "max": 64,
            "cap": modes.RAYMARCH_STEPS, "frac_at_cap": 0.0,
        }
        return {"sample": fixed, "transmittance": fixed, "mode": mode}

    grid, params, lut, inv_view, inv_proj = _operands(r)
    w, h = r.width, r.height
    total = w * h
    stride = max(1, -(-total // MAX_RAYS))
    pixel_index_np = np.arange(0, total, stride, dtype=np.uint32)
    n = pixel_index_np.shape[0]
    # pad to a CHUNK multiple; padding lanes are inactive (active=False) and
    # sliced away on the host before computing the percentiles
    pad = (-n) % CHUNK
    pixel_index = jnp.asarray(
        np.concatenate([pixel_index_np, np.zeros((pad,), np.uint32)])
    )
    active_all = jnp.asarray(
        np.concatenate([np.ones((n,), bool), np.zeros((pad,), bool)])
    )

    sample_volume, transmittance = modes.MODE_FUNCTIONS[mode]
    light = jnp.asarray(r.settings.light_dir, jnp.float32)

    # operands MUST be jit arguments, not closure constants: baked-in
    # constants embed the whole dense field in the program, which blew the
    # remote-compile request past its length limit (HTTP 413) and caused
    # the r2/r3 instrumented-compile pathologies at 512^3
    @jax.jit
    def run(grid, params, lut, inv_view, inv_proj, light, pixel_index, active_all):
        def one_block(args):
            pixel_index, active = args
            state = seed_rays(pixel_index, jnp.uint32(sample_index))
            state, jit2 = rng2(state)
            px = (pixel_index % jnp.uint32(w)).astype(jnp.float32)
            py = (pixel_index // jnp.uint32(w)).astype(jnp.float32)
            tex = jnp.stack([(px + 0.5) / w, (py + 0.5) / h], axis=-1)
            ndc = tex + (jit2 * 2.0 - 1.0) / jnp.array([w, h], jnp.float32)
            rays = camera_rays(inv_view, inv_proj, ndc)
            state, hit, t, _rgb, _le, s_steps = sample_volume(
                grid, params, lut, rays.origin, rays.direction, state, active,
                with_stats=True,
            )
            # shadow rays from the hit points toward the light (NEE wavefront)
            origin = rays.origin + t[..., None] * rays.direction
            direction = jnp.broadcast_to(
                -light / jnp.linalg.norm(light), origin.shape
            )
            state, _tr, t_steps = transmittance(
                grid, params, lut, origin, direction, state, hit, with_stats=True
            )
            return s_steps, hit, t_steps

        blocks = pixel_index.shape[0] // CHUNK
        s_steps, hit, t_steps = jax.lax.map(
            one_block,
            (
                pixel_index.reshape(blocks, CHUNK),
                active_all.reshape(blocks, CHUNK),
            ),
        )
        return s_steps.reshape(-1), hit.reshape(-1), t_steps.reshape(-1)

    s_steps, hit, t_steps = (
        np.asarray(x)[:n]
        for x in run(
            grid, params, lut, inv_view, inv_proj, light, pixel_index, active_all
        )
    )

    s_cap = (
        modes.DDA_SAMPLE_MAX_STEPS if mode == "default" else modes.TRACKING_MAX_EVENTS
    )
    t_cap = (
        modes.DDA_TRANSMITTANCE_MAX_STEPS
        if mode == "default"
        else modes.TRACKING_MAX_EVENTS
    )
    return {
        "mode": mode,
        "sample": _stats(s_steps, s_cap),
        "transmittance": _stats(t_steps[hit], t_cap),
    }


def _stats(steps: np.ndarray, cap: int) -> dict:
    if steps.size == 0:
        return {"p50": 0, "p90": 0, "p99": 0, "max": 0, "cap": cap, "frac_at_cap": 0.0}
    return {
        "p50": int(np.percentile(steps, 50)),
        "p90": int(np.percentile(steps, 90)),
        "p99": int(np.percentile(steps, 99)),
        "max": int(steps.max()),
        "cap": cap,
        "frac_at_cap": float((steps >= cap).mean()),
    }

