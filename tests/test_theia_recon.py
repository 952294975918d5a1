"""Tests for the Theia `.recon` cereal portable-binary codec.

Mirrors the reference's reconstruction reader/writer round-trip contract
(`io/reconstruction_reader.cc:38`, `io/reconstruction_writer.cc:38`), plus
loading the shipped ground-truth fixtures used for cross-validation.
"""

import os

import numpy as np
import pytest

from pytheiasfm_tpu.io.theia_recon import (
    read_theia_reconstruction,
    read_theia_view_graph,
    write_theia_reconstruction,
    write_theia_view_graph,
)
from pytheiasfm_tpu.models.intrinsics import CameraIntrinsicsModelType
from pytheiasfm_tpu.sfm.reconstruction import CameraIntrinsicsPrior, Reconstruction
from pytheiasfm_tpu.sfm.view_graph import TwoViewInfo, ViewGraph

FOUNTAIN = "/root/reference/data/sfm/fountain11.bin"
GT_FOUNTAIN = "/root/reference/data/sfm/gt_fountain11.bin"
_has_fixtures = os.path.exists(FOUNTAIN) and os.path.exists(GT_FOUNTAIN)


@pytest.mark.skipif(not _has_fixtures, reason="reference fixtures unavailable")
def test_read_fountain11_fixture():
    rec = read_theia_reconstruction(FOUNTAIN)
    assert rec.num_views() == 11
    assert rec.num_tracks() == 16616
    assert rec.num_observations() == 75022
    assert rec.view_estimated.all()
    assert rec.track_estimated.all()
    assert sorted(rec.view_names) == [f"{i:04d}.png" for i in range(11)]
    # Strecha fountain focal length (pixels) from the fixture's priors.
    g = rec.view_group[rec.view_id_from_name("0005.png")]
    assert rec.group_model[g] == CameraIntrinsicsModelType.PINHOLE
    assert rec.intrinsics[g, 0] == pytest.approx(2759.48, abs=0.01)
    # Homogeneous points should have w ~ 1 (the fixture stores near-affine).
    w = rec.points[:, 3]
    assert np.all(np.abs(w) > 0.5)


@pytest.mark.skipif(not _has_fixtures, reason="reference fixtures unavailable")
def test_read_gt_fountain11_fixture():
    gt = read_theia_reconstruction(GT_FOUNTAIN)
    assert gt.num_views() == 11
    assert gt.view_estimated.all()
    # Known Strecha GT camera center of 0005.png (meters).
    v = gt.view_id_from_name("0005.png")
    assert np.allclose(gt.view_extrinsics[v, :3], [-14.16, -3.321, 0.086], atol=5e-3)
    # Baselines between consecutive cameras are ~1-2 m.
    pos = np.array(
        [
            gt.view_extrinsics[gt.view_id_from_name(f"{i:04d}.png"), :3]
            for i in range(11)
        ]
    )
    steps = np.linalg.norm(np.diff(pos, axis=0), axis=1)
    assert np.all(steps > 0.3) and np.all(steps < 4.0)


def _synthetic_recon():
    rec = Reconstruction()
    prior = CameraIntrinsicsPrior(
        image_width=640,
        image_height=480,
        focal_length=525.0,
        principal_point=(320.0, 240.0),
    )
    for i in range(4):
        v = rec.add_view(f"img{i}.png", group_id=0 if i else None, prior=prior)
        rec.view_extrinsics[v] = np.arange(6) * 0.1 + i
        rec.view_estimated[v] = i % 2 == 0
    rng = np.random.default_rng(3)
    for t in range(9):
        tid = rec.add_track(np.append(rng.normal(size=3), 1.0))
        rec.track_colors[tid] = [t, 2 * t, 3 * t]
        for v in range(4):
            if (t + v) % 3 != 0:
                rec.add_observation(v, tid, rng.uniform(0, 640, 2))
    return rec


def test_recon_write_read_round_trip(tmp_path):
    rec = _synthetic_recon()
    path = str(tmp_path / "rt.recon")
    write_theia_reconstruction(rec, path)
    r2 = read_theia_reconstruction(path)
    assert r2.num_views() == rec.num_views()
    assert r2.num_tracks() == rec.num_tracks()
    assert r2.num_observations() == rec.num_observations()
    assert r2.view_names == rec.view_names
    assert np.allclose(r2.view_extrinsics, rec.view_extrinsics)
    assert np.array_equal(r2.view_estimated, rec.view_estimated)
    assert np.allclose(r2.points, rec.points)
    assert np.array_equal(r2.track_colors, rec.track_colors)
    assert np.allclose(r2.intrinsics, rec.intrinsics)
    # Observation row order is not a contract of the wire format (the
    # reference stores unordered maps) — compare keyed by (view, track).
    def keyed(r):
        return {
            (int(v), int(t)): tuple(uv)
            for v, t, uv in zip(r.obs_view, r.obs_track, r.obs_uv)
        }

    k1, k2 = keyed(rec), keyed(r2)
    assert k1.keys() == k2.keys()
    for k in k1:
        assert np.allclose(k1[k], k2[k])
    # Shared intrinsics group structure survives.
    assert np.array_equal(r2.view_group, rec.view_group)


def test_view_graph_round_trip(tmp_path):
    g = ViewGraph()
    rng = np.random.default_rng(0)
    for (a, b) in [(0, 1), (1, 2), (0, 2), (2, 3)]:
        info = TwoViewInfo(
            focal_length_1=500.0 + a,
            focal_length_2=500.0 + b,
            position_2=rng.normal(size=3),
            rotation_2=rng.normal(size=3) * 0.1,
            num_verified_matches=100 + a + b,
            num_homography_inliers=30,
            visibility_score=7,
            scale_estimate=1.5,
        )
        g.add_edge(a, b, info)
    path = str(tmp_path / "graph.vg")
    write_theia_view_graph(g, path)
    g2 = read_theia_view_graph(path)
    assert set(g2.edges) == set(g.edges)
    for key in g.edges:
        i1, i2 = g.edges[key], g2.edges[key]
        assert np.allclose(i1.position_2, i2.position_2)
        assert np.allclose(i1.rotation_2, i2.rotation_2)
        assert i1.num_verified_matches == i2.num_verified_matches
        assert i1.visibility_score == i2.visibility_score
        assert i1.scale_estimate == i2.scale_estimate
