"""Golden-image pinning for the 5 BASELINE configs (VERDICT r1 missing #4).

The PNGs in tests/goldens/ were rendered by scripts/make_goldens.py on the
CPU backend; re-rendering here must match within a small tolerance (XLA CPU
is deterministic run-to-run; the slack absorbs cross-version float
reassociation).  Regenerate deliberately with scripts/make_goldens.py when
an intentional image change lands — the git diff of the PNG is the review
artifact.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")


def _load(n):
    from PIL import Image
    return np.asarray(Image.open(os.path.join(GOLDEN_DIR, f"config{n}.png")))


@pytest.mark.slow
@pytest.mark.parametrize("n", [1, 2, 3, 4, 5])
def test_golden_config(n):
    from scripts.make_goldens import render_golden
    golden = _load(n)
    got = np.asarray(render_golden(n))
    assert got.shape == golden.shape
    diff = np.abs(got.astype(np.int32) - golden.astype(np.int32))
    # Exact for almost every pixel; ≤2/255 everywhere except a sliver of
    # edge pixels where reassociation can flip a rasterization tie.
    frac_off = float(np.mean(np.any(diff > 2, axis=-1)))
    assert frac_off < 2e-3, f"config{n}: {frac_off:.4%} pixels off by >2"
    assert float(np.mean(diff)) < 0.5


@pytest.mark.slow
@pytest.mark.parametrize("name", ["wireframe", "kbuffer", "shadows",
                                  "mips", "point_shadows", "spot_shadows",
                                  "skinning", "ssaa", "trilinear",
                                  "ssao"])
def test_golden_feature(name):
    """Feature-path goldens: wireframe, K-buffer, shadows, mips
    (ROADMAP #11)."""
    from PIL import Image
    from scripts.make_goldens import render_feature
    golden = np.asarray(Image.open(
        os.path.join(GOLDEN_DIR, f"feature_{name}.png")))
    got = np.asarray(render_feature(name))
    assert got.shape == golden.shape
    diff = np.abs(got.astype(np.int32) - golden.astype(np.int32))
    frac_off = float(np.mean(np.any(diff > 2, axis=-1)))
    assert frac_off < 2e-3, f"{name}: {frac_off:.4%} pixels off by >2"
