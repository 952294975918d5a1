"""I/O round-trips (SURVEY.md §2.11): npz checkpoint, Bundler, NVM, JSON,
PLY, COLMAP, NeRFStudio, calibration."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from pytheiasfm_tpu import io as tio
from pytheiasfm_tpu.ops import rotation as rotops


def assert_same_rotations(aa1, aa2, atol=1e-5):
    """Angle-axis at angle pi is sign-ambiguous; compare matrices."""
    import jax

    R1 = np.asarray(
        jax.vmap(rotops.angle_axis_to_rotation_matrix)(jnp.asarray(aa1))
    )
    R2 = np.asarray(
        jax.vmap(rotops.angle_axis_to_rotation_matrix)(jnp.asarray(aa2))
    )
    np.testing.assert_allclose(R1, R2, atol=atol)
from pytheiasfm_tpu.sfm.reconstruction import CameraIntrinsicsPrior
from pytheiasfm_tpu.utils.synthetic import SyntheticSceneOptions, generate_scene


@pytest.fixture
def scene():
    recon, gt_ext, gt_pts = generate_scene(
        SyntheticSceneOptions(num_views=4, num_tracks=30, seed=3)
    )
    # Mark everything estimated with GT values so exporters have content.
    recon.view_estimated[:] = True
    recon.points[:, :3] = gt_pts
    recon.points[:, 3] = 1.0
    recon.track_estimated[:] = True
    recon.track_colors[:] = np.array([10, 20, 30], np.uint8)
    return recon


def test_npz_checkpoint_roundtrip(tmp_path, scene):
    path = str(tmp_path / "scene.npz")
    tio.write_reconstruction(scene, path)
    back = tio.read_reconstruction(path)
    assert back.num_views() == scene.num_views()
    assert back.num_tracks() == scene.num_tracks()
    assert back.num_observations() == scene.num_observations()
    np.testing.assert_allclose(back.view_extrinsics, scene.view_extrinsics)
    np.testing.assert_allclose(back.points, scene.points)
    np.testing.assert_allclose(back.intrinsics, scene.intrinsics)
    assert back.view_names == scene.view_names
    np.testing.assert_array_equal(back.obs_uv, scene.obs_uv)


def test_bundler_roundtrip(tmp_path, scene):
    bundle = str(tmp_path / "bundle.out")
    lists = str(tmp_path / "list.txt")
    tio.write_bundler_files(scene, bundle, lists)
    back = tio.read_bundler_files(lists, bundle)
    assert back.num_views() == scene.num_views()
    assert back.num_tracks() == scene.num_tracks()
    # Camera centers round-trip through the bundler frame flip.
    np.testing.assert_allclose(
        back.view_extrinsics[:, :3], scene.view_extrinsics[:, :3], atol=1e-6
    )
    assert_same_rotations(back.view_extrinsics[:, 3:], scene.view_extrinsics[:, 3:])
    w = back.points[:, 3:4]
    np.testing.assert_allclose(
        back.points[:, :3] / w, scene.points[:, :3], atol=1e-6
    )
    # Bundler keeps pp-centered pixels; the imported cameras have pp = 0
    # (reference convention). Row order differs (track-major), so compare
    # keyed by (view, track).
    scene_obs = {
        (int(v), int(t)): scene.obs_uv[o]
        - scene.intrinsics[scene.view_group[v]][3:5]
        for o, (v, t) in enumerate(zip(scene.obs_view, scene.obs_track))
    }
    for o, (v, t) in enumerate(zip(back.obs_view, back.obs_track)):
        np.testing.assert_allclose(
            back.obs_uv[o], scene_obs[(int(v), int(t))], atol=1e-6
        )


def test_nvm_roundtrip(tmp_path, scene):
    path = str(tmp_path / "model.nvm")
    tio.export_nvm_file(scene, path)
    back = tio.import_nvm_file(path)
    assert back.num_views() == scene.num_views()
    assert back.num_tracks() == scene.num_tracks()
    np.testing.assert_allclose(
        back.view_extrinsics[:, :3], scene.view_extrinsics[:, :3], atol=1e-6
    )
    assert_same_rotations(back.view_extrinsics[:, 3:], scene.view_extrinsics[:, 3:])
    # NVM features are pp-centered and the importer has no pp prior (pp = 0),
    # and its rows come back track-major — compare keyed by (view, track).
    scene_obs = {
        (int(v), int(t)): scene.obs_uv[o]
        - scene.intrinsics[scene.view_group[v]][3:5]
        for o, (v, t) in enumerate(zip(scene.obs_view, scene.obs_track))
    }
    for o, (v, t) in enumerate(zip(back.obs_view, back.obs_track)):
        np.testing.assert_allclose(
            back.obs_uv[o], scene_obs[(int(v), int(t))], atol=1e-6
        )


def test_json_ply_colmap_nerfstudio(tmp_path, scene):
    tio.write_reconstruction_json(scene, str(tmp_path / "r.json"))
    doc = json.load(open(tmp_path / "r.json"))
    assert len(doc["views"]) == scene.num_views()
    assert len(doc["tracks"]) == scene.num_tracks()

    assert tio.write_ply_file(str(tmp_path / "r.ply"), scene)
    header = open(tmp_path / "r.ply").read().split("end_header")[0]
    assert "element vertex" in header

    assert tio.write_colmap_files(scene, str(tmp_path / "colmap"))
    for fn in ("cameras.txt", "images.txt", "points3D.txt"):
        assert os.path.exists(tmp_path / "colmap" / fn)
    # images.txt camera lines: 10 tokens (id, q4, t3, cam_id, name).
    lines = open(tmp_path / "colmap" / "images.txt").read().splitlines()
    assert len(lines[0].split()) == 10

    assert tio.write_nerfstudio_files(scene, str(tmp_path / "ns"))
    doc = json.load(open(tmp_path / "ns" / "transforms.json"))
    assert len(doc["frames"]) == scene.num_views()
    # c2w must be a rigid transform.
    M = np.asarray(doc["frames"][0]["transform_matrix"])
    np.testing.assert_allclose(M[:3, :3] @ M[:3, :3].T, np.eye(3), atol=1e-6)

    assert tio.write_sdfstudio_files(scene, str(tmp_path / "sdf"))
    assert os.path.exists(tmp_path / "sdf" / "meta_data.json")


def test_calibration_roundtrip(tmp_path):
    priors = {
        "img1.jpg": CameraIntrinsicsPrior(
            image_width=640,
            image_height=480,
            focal_length=525.0,
            principal_point=(320.0, 240.0),
            radial_distortion=(0.1, -0.05),
        ),
        "img2.jpg": CameraIntrinsicsPrior(image_width=800, image_height=600),
    }
    path = str(tmp_path / "calib.json")
    tio.write_calibration(path, priors)
    back = tio.read_calibration(path)
    assert set(back) == set(priors)
    assert back["img1.jpg"].focal_length == 525.0
    assert back["img1.jpg"].radial_distortion == (0.1, -0.05)
    assert back["img2.jpg"].focal_length is None
