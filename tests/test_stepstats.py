"""Loop-cap variance study (NOTES.md round-1 item): caps must not bind.

The traversal loop caps (modes.py:44-47) are an escape hatch for the TPU's
static-loop requirement; a capped lane silently truncates the transmittance
or distance-sampling estimator and biases the image. These tests measure
per-ray step distributions on a HEAVY scene — 3x density multiplier, the
reference's own stress protocol (performance.txt:1-10) — and pin that no
lane reaches a cap, with real headroom.
"""

import numpy as np
import pytest

from volxel_tpu import Renderer
from volxel_tpu.grid import construct_brick_grid
from volxel_tpu.utils.fixtures import synthetic_ct_volume
from volxel_tpu.utils.stepstats import step_statistics


@pytest.fixture(scope="module")
def dense_renderer():
    vol = synthetic_ct_volume((48, 48, 48), bits_stored=12)
    r = Renderer(width=48, height=48)
    r.restart_from_grid(
        construct_brick_grid(
            vol.astype(np.float32) / vol.max(), transform=np.eye(4, dtype=np.float32)
        )
    )
    r.camera.rotate_around_view(0.5, 0.3)
    r.camera.zoom(2.0)
    # the reference's stress protocol: 3x density (performance.txt:2)
    r.settings.density_multiplier = 3.0
    return r


@pytest.mark.parametrize("mode", ["default", "no_dda"])
def test_caps_do_not_bind_on_dense_scene(dense_renderer, mode):
    stats = step_statistics(dense_renderer, mode)
    for kind in ("sample", "transmittance"):
        s = stats[kind]
        assert s["frac_at_cap"] == 0.0, f"{mode}/{kind} lanes hit the cap: {s}"
        # demand 25% headroom between the observed max and the cap so the
        # margin survives scene variation, not just this fixture
        assert s["max"] <= 0.75 * s["cap"], f"{mode}/{kind} too close to cap: {s}"


def test_steps_respond_to_density(dense_renderer):
    """Sanity: heavier scenes take more null-collision events (the
    statistic actually measures traversal work)."""
    light = step_statistics(dense_renderer, "no_dda")
    dense_renderer.settings.density_multiplier = 0.5
    try:
        lighter = step_statistics(dense_renderer, "no_dda")
    finally:
        dense_renderer.settings.density_multiplier = 3.0
    assert light["sample"]["p90"] > lighter["sample"]["p90"]


def test_per_lane_steps_do_not_change_images(dense_renderer):
    """The instrumented carry must not perturb rendering (pure extra
    output; masked increments)."""
    from volxel_tpu.render import modes
    import jax.numpy as jnp
    from volxel_tpu.render.rng import seed_rays

    r = dense_renderer
    grid = r._device_grid
    params = r.volume_params()
    n = 64
    state = seed_rays(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(0))
    origin = jnp.tile(jnp.asarray([[0.5, 0.5, -2.0]], jnp.float32), (n, 1))
    direction = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    active = jnp.ones((n,), bool)
    plain = modes.sample_volume_dda(
        grid, params, r._lut, origin, direction, state, active
    )
    stats = modes.sample_volume_dda(
        grid, params, r._lut, origin, direction, state, active, with_stats=True
    )
    for a, b in zip(plain, stats[:-1]):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "f":
            # missed rays carry NaN t from the slab test in both variants
            assert np.array_equal(a, b, equal_nan=True)
        else:
            assert np.array_equal(a, b)
    assert stats[-1].shape == (n,)
