"""CIEDE2000 metric — known-value checks (Sharma et al. 2005 test pairs)
and the SLIC metric option."""

import numpy as np
import pytest

from various_image_processings_tpu.core.ciede2000 import ciede2000_square

# (L1, a1, b1, L2, a2, b2, expected ΔE00) — Sharma, Wu, Dalal (2005) Table 1
SHARMA_CASES = [
    (50.0000, 2.6772, -79.7751, 50.0000, 0.0000, -82.7485, 2.0425),
    (50.0000, 3.1571, -77.2803, 50.0000, 0.0000, -82.7485, 2.8615),
    (50.0000, 2.8361, -74.0200, 50.0000, 0.0000, -82.7485, 3.4412),
    (50.0000, -1.3802, -84.2814, 50.0000, 0.0000, -82.7485, 1.0000),
    (50.0000, 2.5000, 0.0000, 50.0000, 0.0000, -2.5000, 4.3065),
    (50.0000, 2.5000, 0.0000, 73.0000, 25.0000, -18.0000, 27.1492),
    (50.0000, 2.5000, 0.0000, 50.0000, 3.2592, 0.3350, 1.0000),
    (63.0109, -31.0961, -5.8663, 62.8187, -29.7946, -4.0864, 1.2630),
    (90.8027, -2.0831, 1.4410, 91.1528, -1.6435, 0.0447, 1.4441),
    (2.0776, 0.0795, -1.1350, 0.9033, -0.0636, -0.5514, 0.9082),
]


@pytest.mark.parametrize("case", SHARMA_CASES)
def test_sharma_values(case):
    l1, a1, b1, l2, a2, b2, expected = case
    got = float(np.sqrt(np.asarray(ciede2000_square(l1, a1, b1, l2, a2, b2))))
    assert abs(got - expected) < 1e-3


def test_symmetric_zero():
    assert float(np.asarray(ciede2000_square(50.0, 10.0, -5.0,
                                             50.0, 10.0, -5.0))) == 0.0


def test_slic_with_ciede2000_metric():
    from various_image_processings_tpu.ops.slic import superpixel_slic
    img = np.zeros((40, 40, 3), np.uint8)
    img[:20] = (255, 0, 0)
    img[20:] = (0, 0, 255)
    labels = superpixel_slic(img, superpixel_size=20, num_iteration=3,
                             metric="ciede2000")
    assert labels.shape == (40, 40)
    assert (labels[:20] != labels[20:]).all() or len(np.unique(labels)) >= 2


def test_slic_rejects_unknown_metric():
    from various_image_processings_tpu.models.slic import SuperpixelSLIC
    with pytest.raises(ValueError, match="metric"):
        SuperpixelSLIC(32, 32, 16, metric="manhattan")


def test_ciede2000_ref_device_vs_golden():
    """The all-f32 device variant vs the dtype-exact golden twin: bounded
    drift from the C++'s incidental double promotions (the golden twin is
    the oracle-pinned one — tests/test_reference_oracle.py)."""
    from various_image_processings_tpu.core.ciede2000 import ciede2000_ref_square
    from various_image_processings_tpu.golden.ciede2000_ref import (
        ciede2000_ref_square as golden_ref)
    rng = np.random.default_rng(7)
    v = rng.integers(-255, 256, (2048, 6)).astype(np.int32)
    dev = np.asarray(ciede2000_ref_square(v[:, 0], v[:, 1], v[:, 2],
                                          v[:, 3], v[:, 4], v[:, 5]))
    gold = golden_ref(v[:, 0], v[:, 1], v[:, 2], v[:, 3], v[:, 4], v[:, 5])
    np.testing.assert_allclose(dev, gold, rtol=5e-4, atol=5e-2)


def test_slic_with_ciede2000_ref_metric():
    from various_image_processings_tpu.ops.slic import superpixel_slic
    img = np.zeros((40, 40, 3), np.uint8)
    img[:20] = (255, 0, 0)
    img[20:] = (0, 0, 255)
    labels = superpixel_slic(img, superpixel_size=20, num_iteration=3,
                             metric="ciede2000_ref")
    assert labels.shape == (40, 40)
    assert len(np.unique(labels)) >= 2
