"""Native C++ host runtime vs the pure-Python fallbacks."""

import numpy as np
import pytest

from various_image_processings_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def test_ccl_matches_scipy_path():
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 4, size=(40, 37)).astype(np.int32)
    comp_n, ncomp_n = native.ccl_4conn(labels)

    # force the scipy fallback by calling the internals directly
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components
    h, w = labels.shape
    idx = np.arange(h * w).reshape(h, w)
    src, dst = [], []
    m = labels[:, 1:] == labels[:, :-1]
    src.append(idx[:, :-1][m]); dst.append(idx[:, 1:][m])
    m = labels[1:, :] == labels[:-1, :]
    src.append(idx[:-1, :][m]); dst.append(idx[1:, :][m])
    g = coo_matrix((np.ones(sum(len(s) for s in src), np.int8),
                    (np.concatenate(src), np.concatenate(dst))),
                   shape=(h * w, h * w))
    ncomp_s, comp_s = connected_components(g, directed=False)
    comp_s = comp_s.reshape(h, w)
    _, first, inv = np.unique(comp_s.reshape(-1), return_index=True,
                              return_inverse=True)
    order = np.argsort(np.argsort(first))
    comp_s = order[inv].reshape(h, w)

    assert ncomp_n == ncomp_s
    np.testing.assert_array_equal(comp_n, comp_s)


def test_trace_contour_square():
    m = np.zeros((20, 20), np.uint8)
    m[5:10, 5:10] = 255
    contour = native.trace_contour(m, 5, 5)
    assert len(contour) == 16
    assert set(contour) == {(x, y) for y in range(5, 10) for x in range(5, 10)
                            if y in (5, 9) or x in (5, 9)}


def test_trace_contour_single_pixel():
    m = np.zeros((10, 10), np.uint8)
    m[4, 4] = 255
    assert native.trace_contour(m, 4, 4) == [(4, 4)]


def test_component_sums():
    labels = np.array([[0, 0], [1, 1]], np.int32)
    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    sums = native.component_sums(labels, img, 2)
    np.testing.assert_array_equal(sums[0], [1, 0, 3, 5, 7, 2])
    np.testing.assert_array_equal(sums[1], [1, 2, 15, 17, 19, 2])


def test_slic_merge_matches_python_path(monkeypatch):
    from various_image_processings_tpu.models import slic as slic_mod
    rng = np.random.RandomState(3)
    labels = rng.randint(0, 6, size=(60, 50)).astype(np.int32)
    lab = rng.randint(0, 255, size=(60, 50, 3)).astype(np.uint8)

    with_native = slic_mod.enforce_connectivity(labels, lab, sp_size=30)

    # force the python fallback (both native entry points)
    monkeypatch.setattr(native, "slic_connectivity", lambda *a, **k: None)
    monkeypatch.setattr(native, "slic_merge", lambda *a, **k: None)
    without_native = slic_mod.enforce_connectivity(labels, lab, sp_size=30)
    np.testing.assert_array_equal(with_native, without_native)


def _staged_connectivity(labels, lab, min_area):
    """The pre-fusion staged composition (ccl + sums + merge + numpy
    compaction) — kept in the tests as the equality oracle for the fused
    native call."""
    comp, ncomp = native.ccl_4conn(labels)
    sums = native.component_sums(comp, lab, ncomp)
    sizes = sums[:, 5]
    means = sums[:, 2:5] // sizes[:, None]
    mapping = native.slic_merge(comp, means, sizes, min_area)
    _, first_idx, inv = np.unique(mapping, return_index=True,
                                  return_inverse=True)
    rank = np.argsort(np.argsort(first_idx)).astype(np.int32)
    return rank[inv][comp]


@pytest.mark.parametrize("seed,shape,nlabels", [
    (0, (60, 50), 6), (1, (37, 83), 12), (2, (128, 128), 40),
])
def test_fused_connectivity_equals_staged(seed, shape, nlabels):
    """vip_slic_connectivity (run-based, one call) must reproduce the
    staged ccl_4conn + component_sums + slic_merge + compaction pipeline
    bit-for-bit on noisy label maps (high fragmentation — the hard case
    for run/merge bookkeeping)."""
    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, nlabels, size=shape).astype(np.int32)
    lab = rng.randint(0, 255, size=shape + (3,)).astype(np.uint8)
    for min_area in (0, 5, 33):
        fused = native.slic_connectivity(labels, lab, min_area)
        staged = _staged_connectivity(labels, lab, min_area)
        np.testing.assert_array_equal(fused, staged)


def test_fused_connectivity_uniform_and_single_row():
    if not native.available():
        pytest.skip("native lib unavailable")
    labels = np.zeros((9, 9), np.int32)
    lab = np.full((9, 9, 3), 7, np.uint8)
    out = native.slic_connectivity(labels, lab, 4)
    np.testing.assert_array_equal(out, np.zeros((9, 9), np.int32))
    labels = np.array([[0, 0, 1, 2, 2]], np.int32)
    lab = np.zeros((1, 5, 3), np.uint8)
    out = native.slic_connectivity(labels, lab, 0)  # no merging
    np.testing.assert_array_equal(out, [[0, 0, 1, 2, 2]])
