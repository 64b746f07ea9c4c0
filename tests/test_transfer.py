"""Transfer-function LUT generation parity (utils/data.ts:21-60)."""

import numpy as np
import pytest

from volxel_tpu.transfer import generate_transfer_function, parse_transfer_function


def test_default_white_ramp():
    lut = generate_transfer_function(
        [
            {"color": [1, 1, 1, 0], "stop": 0.0},
            {"color": [1, 1, 1, 1], "stop": 1.0},
        ]
    )
    assert lut.shape == (128, 4)
    np.testing.assert_allclose(lut[:, :3], 1.0)
    # alpha ramps linearly from 0
    np.testing.assert_allclose(lut[0], [1, 1, 1, 0])
    np.testing.assert_allclose(lut[64, 3], 0.5, atol=1 / 128)
    assert (np.diff(lut[:, 3]) >= -1e-6).all()


def test_extrapolation_before_first_stop():
    """Reference quirk (data.ts:37-42): the first stop is latched at i=0, so
    positions below it EXTRAPOLATE the first segment (negative progress) —
    there is no transparent-black fill."""
    lut = generate_transfer_function(
        [
            {"color": [1, 0, 0, 1], "stop": 0.5},
            {"color": [0, 1, 0, 1], "stop": 1.0},
        ]
    )
    # i=0 latches the first stop's color verbatim
    np.testing.assert_allclose(lut[0], [1, 0, 0, 1])
    # below the stop: negative progress -> extrapolation beyond c0
    np.testing.assert_allclose(lut[32], [1.5, -0.5, 0, 1], atol=0.03)
    # at first stop: exactly c0
    np.testing.assert_allclose(lut[64], [1, 0, 0, 1], atol=0.02)
    # halfway between the stops
    np.testing.assert_allclose(lut[96][1], 0.5, atol=0.02)


def test_hold_after_last_stop():
    lut = generate_transfer_function(
        [
            {"color": [0.2, 0.4, 0.6, 0.8], "stop": 0.0},
            {"color": [1, 1, 1, 1], "stop": 0.25},
        ]
    )
    np.testing.assert_allclose(lut[127], [1, 1, 1, 1])
    np.testing.assert_allclose(lut[64], [1, 1, 1, 1])


def test_single_stop_constant():
    lut = generate_transfer_function([{"color": [0.3, 0.2, 0.1, 0.5], "stop": 0.0}])
    np.testing.assert_allclose(lut, np.tile([0.3, 0.2, 0.1, 0.5], (128, 1)), atol=1e-6)


def test_stop_out_of_range_rejected():
    with pytest.raises(ValueError):
        generate_transfer_function([{"color": [1, 1, 1, 1], "stop": 1.5}])
    with pytest.raises(ValueError):
        generate_transfer_function([])


def test_parse_transfer_function():
    text = "0.1 0.2 0.3 0.4\nbad line\n1 1 1 1\n0.5 0.5\n"
    rows = parse_transfer_function(text)
    assert rows == [[0.1, 0.2, 0.3, 0.4], [1.0, 1.0, 1.0, 1.0]]
