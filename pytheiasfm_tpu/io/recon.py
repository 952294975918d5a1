"""Native checkpoint: versioned npz of the SoA scene state (+ JSON export).

Re-design of `/root/reference/src/theia/io/reconstruction_writer.cc:38,72` /
`reconstruction_reader.cc:38,71` (cereal portable-binary of the pointer
graph, `CEREAL_CLASS_VERSION` versioning). The SoA container serializes as
flat arrays — the checkpoint IS the device layout, so resume costs one
`device_put` per array instead of a graph walk.
"""

from __future__ import annotations

import json

import numpy as np

from ..sfm.reconstruction import CameraIntrinsicsPrior, Reconstruction

__all__ = ["write_reconstruction", "read_reconstruction", "write_reconstruction_json"]

_FORMAT_VERSION = 1


def write_reconstruction(recon: Reconstruction, path: str) -> None:
    """Parity: `theia::WriteReconstruction` (`reconstruction_writer.cc:38`)."""
    priors = [
        {
            "image_width": p.image_width,
            "image_height": p.image_height,
            "model": int(p.camera_intrinsics_model_type),
            "focal_length": p.focal_length,
            "principal_point": list(p.principal_point) if p.principal_point else None,
            "aspect_ratio": p.aspect_ratio,
            "skew": p.skew,
            "radial_distortion": list(p.radial_distortion),
            "tangential_distortion": list(p.tangential_distortion),
        }
        for p in recon.view_priors
    ]
    np.savez_compressed(
        path,
        format_version=np.int32(_FORMAT_VERSION),
        view_names=np.asarray(recon.view_names, dtype=object),
        view_timestamps=np.asarray(recon.view_timestamps),
        view_extrinsics=recon.view_extrinsics,
        view_group=recon.view_group,
        view_estimated=recon.view_estimated,
        view_priors_json=np.asarray(json.dumps(priors)),
        intrinsics=recon.intrinsics,
        group_model=np.asarray([int(m) for m in recon.group_model], np.int32),
        points=recon.points,
        track_estimated=recon.track_estimated,
        track_colors=recon.track_colors,
        track_inverse_depth=recon.track_inverse_depth,
        track_reference_view=recon.track_reference_view,
        obs_view=recon.obs_view,
        obs_track=recon.obs_track,
        obs_uv=recon.obs_uv,
        obs_sqrt_inv_cov=recon.obs_sqrt_inv_cov,
        obs_depth_prior=recon.obs_depth_prior,
        obs_depth_prior_variance=recon.obs_depth_prior_variance,
    )


def read_reconstruction(path: str) -> Reconstruction:
    """Parity: `theia::ReadReconstruction` (`reconstruction_reader.cc:38`)."""
    from ..models.intrinsics import CameraIntrinsicsModelType

    data = np.load(path, allow_pickle=True)
    version = int(data["format_version"])
    if version > _FORMAT_VERSION:
        raise ValueError(f"checkpoint version {version} is newer than supported")

    recon = Reconstruction()
    priors = json.loads(str(data["view_priors_json"]))
    names = list(data["view_names"])
    groups = data["view_group"]
    group_model = [CameraIntrinsicsModelType(int(m)) for m in data["group_model"]]
    for i, name in enumerate(names):
        p = priors[i]
        prior = CameraIntrinsicsPrior(
            image_width=p["image_width"],
            image_height=p["image_height"],
            camera_intrinsics_model_type=CameraIntrinsicsModelType(p["model"]),
            focal_length=p["focal_length"],
            principal_point=tuple(p["principal_point"])
            if p["principal_point"]
            else None,
            aspect_ratio=p["aspect_ratio"],
            skew=p["skew"],
            radial_distortion=tuple(p["radial_distortion"]),
            tangential_distortion=tuple(p["tangential_distortion"]),
        )
        recon.add_view(
            str(name),
            group_id=int(groups[i]),
            timestamp=float(data["view_timestamps"][i]),
            prior=prior,
        )
    # Overwrite the arrays wholesale (add_view built the right shapes).
    recon.view_extrinsics = np.array(data["view_extrinsics"])
    recon.view_group = np.array(data["view_group"])
    recon.view_estimated = np.array(data["view_estimated"])
    recon.intrinsics = np.array(data["intrinsics"])
    recon.group_model = group_model
    T = len(data["points"])
    for _ in range(T):
        recon.add_track()
    recon.points = np.array(data["points"])
    recon.track_estimated = np.array(data["track_estimated"])
    recon.track_colors = np.array(data["track_colors"])
    recon.track_inverse_depth = np.array(data["track_inverse_depth"])
    recon.track_reference_view = np.array(data["track_reference_view"])
    for v, t, uv, sic in zip(
        data["obs_view"], data["obs_track"], data["obs_uv"], data["obs_sqrt_inv_cov"]
    ):
        recon.add_observation(int(v), int(t), uv, sic)
    recon.obs_depth_prior = np.array(data["obs_depth_prior"])
    recon.obs_depth_prior_variance = np.array(data["obs_depth_prior_variance"])
    return recon


def write_reconstruction_json(recon: Reconstruction, path: str) -> None:
    """Parity: `theia::WriteReconstructionJson`
    (`reconstruction_writer.h:59`)."""
    out = {
        "views": [
            {
                "name": recon.view_names[v],
                "timestamp": recon.view_timestamps[v],
                "estimated": bool(recon.view_estimated[v]),
                "position": recon.view_extrinsics[v, :3].tolist(),
                "orientation_angle_axis": recon.view_extrinsics[v, 3:].tolist(),
                "intrinsics_group": int(recon.view_group[v]),
            }
            for v in range(recon.num_views())
        ],
        "intrinsics_groups": [
            {
                "model": int(recon.group_model[g]),
                "parameters": recon.intrinsics[g].tolist(),
            }
            for g in range(len(recon.group_model))
        ],
        "tracks": [
            {
                "point": recon.points[t].tolist(),
                "estimated": bool(recon.track_estimated[t]),
                "color": recon.track_colors[t].tolist(),
            }
            for t in range(recon.num_tracks())
        ],
        "observations": [
            {
                "view": int(recon.obs_view[o]),
                "track": int(recon.obs_track[o]),
                "pixel": recon.obs_uv[o].tolist(),
            }
            for o in range(recon.num_observations())
        ],
    }
    with open(path, "w") as f:
        json.dump(out, f)
