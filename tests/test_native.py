"""Native C++ host-runtime kernels: build, correctness vs numpy fallbacks."""

import numpy as np
import pytest

from pytheiasfm_tpu import native


@pytest.fixture(scope="module")
def lib_available():
    ok = native.available()
    if not ok:
        pytest.skip("native toolchain unavailable")
    return ok


def test_build_and_load(lib_available):
    assert native.available()


def test_uf_components_matches_unionfind(lib_available, rng):
    from pytheiasfm_tpu.sfm.view_graph import UnionFind

    n = 5000
    edges = rng.integers(0, n, size=(20000, 2))
    roots = native.uf_components(n, edges[:, 0], edges[:, 1])
    uf = UnionFind(n)
    for a, b in edges:
        uf.union(int(a), int(b))
    py_roots = np.fromiter((uf.find(i) for i in range(n)), np.int64, n)
    # Same partition (labels may differ): compare canonical relabelings.
    _, nat_lab = np.unique(roots, return_inverse=True)
    _, py_lab = np.unique(py_roots, return_inverse=True)
    # Two partitions are equal iff the pairing of labels is a bijection.
    pairs = set(zip(nat_lab.tolist(), py_lab.tolist()))
    assert len(pairs) == len(set(p[0] for p in pairs)) == len(
        set(p[1] for p in pairs)
    )


def test_mfas_native_matches_python(lib_available, rng):
    import pytheiasfm_tpu.math.graph as g

    n, e = 60, 400
    edges = rng.integers(0, n, size=(e, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    w = rng.uniform(0, 1, size=len(edges))
    nat = native.mfas_ordering(n, edges[:, 0], edges[:, 1], w)
    # Force the Python fallback by calling the module implementation with
    # the native dispatch bypassed.
    orig = native.mfas_ordering
    try:
        native.mfas_ordering = lambda *a, **k: None
        py = g.mfas_ordering(edges, w, n)
    finally:
        native.mfas_ordering = orig
    np.testing.assert_array_equal(nat, py)


def test_mfas_acyclic_graph_is_topological(lib_available):
    # A DAG chain: ordering must follow edge direction.
    n = 20
    src = np.arange(n - 1)
    dst = np.arange(1, n)
    w = np.ones(n - 1)
    order = native.mfas_ordering(n, src, dst, w)
    assert all(order[s] < order[d] for s, d in zip(src, dst))


def test_track_builder_uses_native(lib_available):
    from pytheiasfm_tpu.sfm.reconstruction import Reconstruction
    from pytheiasfm_tpu.sfm.track_builder import TrackBuilder

    recon = Reconstruction()
    for v in range(4):
        recon.add_view(f"v{v}")
    tb = TrackBuilder()
    # Two consistent tracks across 4 views + one inconsistent component.
    for v in range(3):
        tb.add_feature_correspondence(v, (10.0 + v, 20.0), v + 1, (11.0 + v, 20.0))
        tb.add_feature_correspondence(v, (50.0 + v, 60.0), v + 1, (51.0 + v, 60.0))
    # Inconsistent: view 0 feature matched to two distinct view-1 features
    # that are also matched to each other's component.
    tb.add_feature_correspondence(0, (1.0, 1.0), 1, (2.0, 2.0))
    tb.add_feature_correspondence(0, (3.0, 3.0), 1, (2.0, 2.0))
    n = tb.build_tracks(recon)
    assert n == 2
    assert recon.num_tracks() == 2
    assert all(
        len(recon.track_observations(t)) == 4 for t in range(recon.num_tracks())
    )
