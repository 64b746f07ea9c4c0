"""Pallas kernels: XLA-fallback equivalence (kernels themselves run on TPU;
on the CPU test mesh the dispatchers must fall back cleanly)."""

import numpy as np
import jax
import jax.numpy as jnp

from volxel_tpu.render.pallas_ops import (
    build_importance_pyramid,
    build_importance_pyramid_xla,
    tonemap_display,
)
from volxel_tpu.render.pathtrace import tonemap
from volxel_tpu.scene.environment import IMP_BASE_MIP


def test_pyramid_dispatch_on_cpu_falls_back():
    base = jnp.asarray(
        np.random.default_rng(0).uniform(0, 5, (512, 512)), jnp.float32
    )
    out = build_importance_pyramid(base)
    ref = build_importance_pyramid_xla(base)
    assert len(out) == IMP_BASE_MIP
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    assert out[-1].shape == (1, 1)


def test_pyramid_level_semantics():
    base = jnp.ones((512, 512), jnp.float32) * 3.0
    out = build_importance_pyramid(base)
    for level in out:
        np.testing.assert_allclose(np.asarray(level), 3.0, rtol=1e-6)


def test_tonemap_display_fallback_matches():
    fb = jnp.asarray(np.random.default_rng(1).uniform(0, 4, (256, 3)), jnp.float32)
    a = np.asarray(tonemap_display(fb, 5.5, 2.2))
    b = np.asarray(tonemap(fb, jnp.float32(5.5), jnp.float32(2.2)))
    np.testing.assert_allclose(a, b, atol=1e-6)
