"""BA feature tests: intrinsics optimization, track parametrizations, mixed
camera models, shared intrinsics groups, PCG tolerance.

Mirrors the reference's bundle_adjuster gtests for OptimizeIntrinsicsType
(`bundle_adjustment.h:71`, `camera_intrinsics_model.h:118`) and the
homogeneous / inverse-depth parametrizations (`bundle_adjustment.h:127-131`,
`bundle_adjuster.h:79`).
"""

import numpy as np
import pytest

from pytheiasfm_tpu.ba import BundleAdjustmentOptions
from pytheiasfm_tpu.ba.entry import (
    bundle_adjust_partial_reconstruction,
    bundle_adjust_reconstruction,
)
from pytheiasfm_tpu.ba.lm import TrackParametrizationType
from pytheiasfm_tpu.models.intrinsics import (
    CameraIntrinsicsModelType as M,
    OptimizeIntrinsicsType as OI,
    intrinsics_subset_mask,
)
from pytheiasfm_tpu.utils.synthetic import random_reconstruction


def _perturbed_scene(rng, V=8, T=80, model=M.PINHOLE, shared_group=True, **kw):
    recon = random_reconstruction(num_views=V, num_tracks=T, seed=7, model=model, **kw)
    if shared_group:
        # Collapse all views into one shared intrinsics group (the generator
        # gives each view its own).
        recon.view_group[:] = 0
        recon.intrinsics = recon.intrinsics[:1]
        recon.group_model = recon.group_model[:1]
    gt_ext = recon.view_extrinsics.copy()
    gt_pts = recon.points.copy()
    recon.view_extrinsics[2:] += rng.normal(size=(V - 2, 6)) * 0.01
    recon.points[:, :3] += rng.normal(size=(T, 3)) * 0.02
    return recon, gt_ext, gt_pts


def _gauge_fixed_ba(options, recon):
    """BA with the first two cameras held constant (gauge fixing), all
    tracks free — mirrors the reference gtests' fixed-camera pattern."""
    return bundle_adjust_partial_reconstruction(
        options,
        list(range(2, recon.num_views())),
        list(range(recon.num_tracks())),
        recon,
    )


def test_subset_masks_match_reference_layouts():
    m = intrinsics_subset_mask(M.PINHOLE, OI.FOCAL_LENGTH)
    assert m[0] and not m[1:].any()
    m = intrinsics_subset_mask(M.PINHOLE, OI.RADIAL_DISTORTION)
    assert m[5] and m[6] and not m[:5].any()
    m = intrinsics_subset_mask(M.PINHOLE_RADIAL_TANGENTIAL, OI.TANGENTIAL_DISTORTION)
    assert m[8] and m[9] and m.sum() == 2
    m = intrinsics_subset_mask(M.FISHEYE, OI.RADIAL_DISTORTION)
    assert m[5:9].all() and m.sum() == 4
    m = intrinsics_subset_mask(M.FOV, OI.PRINCIPAL_POINTS)
    assert m[2] and m[3] and m.sum() == 2  # FOV has no skew slot
    m = intrinsics_subset_mask(M.DOUBLE_SPHERE, OI.RADIAL_DISTORTION)
    assert m[5] and m[6] and m.sum() == 2  # xi/alpha count as distortion
    assert intrinsics_subset_mask(M.PINHOLE, OI.ALL).sum() == 7
    assert not intrinsics_subset_mask(M.PINHOLE, OI.NONE).any()


def test_ba_optimizes_focal_length(rng):
    recon, gt_ext, _ = _perturbed_scene(rng)
    gt_focal = recon.intrinsics[0, 0]
    recon.intrinsics[0, 0] *= 1.05  # 5% focal error
    options = BundleAdjustmentOptions(
        intrinsics_to_optimize=OI.FOCAL_LENGTH, max_num_iterations=80
    )
    summary = bundle_adjust_reconstruction(options, recon)
    assert bool(summary.success)
    assert recon.intrinsics[0, 0] == pytest.approx(gt_focal, rel=1e-4)


def test_ba_optimizes_radial_distortion(rng):
    recon, _, _ = _perturbed_scene(rng)
    gt = recon.intrinsics[0].copy()
    recon.intrinsics[0, 5] = 0.05  # spurious k1
    recon.intrinsics[0, 0] *= 1.02
    options = BundleAdjustmentOptions(
        intrinsics_to_optimize=OI.FOCAL_LENGTH | OI.RADIAL_DISTORTION,
        max_num_iterations=100,
    )
    summary = bundle_adjust_reconstruction(options, recon)
    assert bool(summary.success)
    assert recon.intrinsics[0, 0] == pytest.approx(gt[0], rel=1e-3)
    assert abs(recon.intrinsics[0, 5] - gt[5]) < 1e-3


def test_ba_intrinsics_none_stays_constant(rng):
    recon, _, _ = _perturbed_scene(rng)
    before = recon.intrinsics.copy()
    options = BundleAdjustmentOptions(max_num_iterations=20)
    bundle_adjust_reconstruction(options, recon)
    np.testing.assert_array_equal(recon.intrinsics, before)


def test_ba_shared_group_uses_all_views(rng):
    """All views share one intrinsics group; the shared focal must be
    recovered jointly (the reference dedups the shared_ptr block)."""
    recon, _, _ = _perturbed_scene(rng, V=10, T=100)
    assert len(set(recon.view_group.tolist())) == 1, recon.view_group
    gt_focal = recon.intrinsics[0, 0]
    recon.intrinsics[0, 0] *= 0.96
    options = BundleAdjustmentOptions(
        intrinsics_to_optimize=OI.FOCAL_LENGTH, max_num_iterations=80
    )
    summary = bundle_adjust_reconstruction(options, recon)
    assert bool(summary.success)
    assert recon.intrinsics[0, 0] == pytest.approx(gt_focal, rel=1e-4)


@pytest.mark.parametrize(
    "tp",
    [
        TrackParametrizationType.XYZW,
        TrackParametrizationType.XYZW_MANIFOLD,
        TrackParametrizationType.INVERSE_DEPTH,
    ],
)
def test_ba_track_parametrizations_recover(rng, tp):
    recon, gt_ext, gt_pts = _perturbed_scene(rng)
    options = BundleAdjustmentOptions(
        track_parametrization_type=tp, max_num_iterations=80
    )
    summary = _gauge_fixed_ba(options, recon)
    assert bool(summary.success)
    got = recon.points[:, :3] / recon.points[:, 3:4]
    want = gt_pts[:, :3] / gt_pts[:, 3:4]
    np.testing.assert_allclose(got, want, atol=2e-4)
    np.testing.assert_allclose(
        recon.view_extrinsics[:, :3], gt_ext[:, :3], atol=2e-4
    )


def test_ba_inverse_depth_updates_container_depths(rng):
    recon, _, _ = _perturbed_scene(rng)
    options = BundleAdjustmentOptions(
        track_parametrization_type=TrackParametrizationType.INVERSE_DEPTH,
        max_num_iterations=40,
    )
    bundle_adjust_reconstruction(options, recon)
    assert (recon.track_inverse_depth[recon.track_estimated] > 0).all()


def test_ba_mixed_camera_models(rng):
    """Two intrinsics groups with different camera models in ONE problem
    (the reference handles heterogeneous rigs natively,
    create_reprojection_error_cost_function.h)."""
    recon = random_reconstruction(num_views=4, num_tracks=60, seed=1, model=M.PINHOLE)
    extra = random_reconstruction(
        num_views=4, num_tracks=60, seed=2, model=M.DIVISION_UNDISTORTION
    )
    # Graft the second scene's views+obs into the first container under a
    # new group (same world points for simplicity: reuse extra's tracks).
    offs_v = recon.num_views()
    offs_t = recon.num_tracks()
    for v in range(extra.num_views()):
        nv = recon.add_view(
            f"mixed_{v}", group_id=None, prior=extra.view_priors[v]
        )
        recon.view_extrinsics[nv] = extra.view_extrinsics[v]
        recon.view_estimated[nv] = True
    g = recon.view_group[offs_v]
    recon.intrinsics[g] = extra.intrinsics[extra.view_group[0]]
    recon.group_model[g] = M.DIVISION_UNDISTORTION
    for t in range(extra.num_tracks()):
        nt = recon.add_track(extra.points[t])
        for row in extra.track_observations(t):
            recon.add_observation(
                offs_v + int(extra.obs_view[row]), nt, extra.obs_uv[row]
            )
    gt_ext = recon.view_extrinsics.copy()
    gt_pts = recon.points.copy()
    # Perturb all but two gauge-fixing views per connected component.
    free = [v for v in range(recon.num_views()) if v not in (0, 1, offs_v, offs_v + 1)]
    recon.view_extrinsics[free] += rng.normal(size=(len(free), 6)) * 0.005
    recon.points[:, :3] += rng.normal(size=(recon.num_tracks(), 3)) * 0.01
    options = BundleAdjustmentOptions(max_num_iterations=60)
    summary = bundle_adjust_partial_reconstruction(
        options, free, list(range(recon.num_tracks())), recon
    )
    assert bool(summary.success)
    np.testing.assert_allclose(
        recon.view_extrinsics[:, :3], gt_ext[:, :3], atol=5e-4
    )


def test_pcg_tolerance_early_exit_converges(rng):
    """A loose linear_solver_tolerance must still reach the optimum (the
    trust region compensates) — and honoring the option at all is the fix
    for the round-1 dead-field finding."""
    recon, gt_ext, _ = _perturbed_scene(rng)
    options = BundleAdjustmentOptions(
        linear_solver_tolerance=0.3, max_num_iterations=120
    )
    summary = _gauge_fixed_ba(options, recon)
    assert bool(summary.success)
    np.testing.assert_allclose(
        recon.view_extrinsics[:, :3], gt_ext[:, :3], atol=5e-4
    )
