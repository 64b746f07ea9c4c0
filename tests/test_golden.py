"""Golden-image regression: full pipeline against pinned CPU renders."""

from pathlib import Path

import numpy as np
import pytest

GOLDEN_DIR = Path(__file__).parent / "golden"
CASES = ["default", "no_dda", "raymarch", "gradient", "debug_hits"]


@pytest.mark.parametrize("name", CASES)
def test_golden(name):
    golden_path = GOLDEN_DIR / f"{name}.npy"
    if not golden_path.exists():
        pytest.skip("golden missing — run tests/golden/generate.py")
    from tests.golden.generate import render_case

    got = render_case(name)
    want = np.load(golden_path)
    np.testing.assert_allclose(
        got,
        want,
        atol=1e-5,
        rtol=1e-4,
        err_msg=f"{name} drifted from golden — if intentional, regenerate "
        "with tests/golden/generate.py and review visually",
    )
