"""Theia ``.recon`` (cereal portable-binary) reader/writer.

Parity: `theia::ReadReconstruction` / `WriteReconstruction`
(`io/reconstruction_reader.cc:38,71`, `io/reconstruction_writer.cc:38,72`) and
`ReadViewGraph` / `WriteViewGraph`. The reference serializes the whole object
graph with cereal's ``PortableBinaryArchive``; this module is a from-scratch
Python codec for that wire format so the reference's ground-truth fixtures
(`data/sfm/fountain11.bin`, `gt_fountain11.bin`) can be loaded for
cross-validation, and our reconstructions can be exported back for the
reference tooling to consume.

Wire format (cereal 1.x portable binary, all little-endian here):
  - archive header: 1 byte endianness flag (1 = little endian)
  - versioned types (``serialize(ar, version)``): a uint32 class version is
    written once per archive, immediately before the first instance of each
    distinct type
  - std::string / std::vector: uint64 size + raw payload
  - std::unordered_map / set: uint64 size + entries (key then value)
  - Eigen matrices (`io/eigen_serializable.h`): int32 rows, int32 cols, then
    raw column-major scalars
  - polymorphic std::shared_ptr: uint32 polymorphic_id (0 = null; MSB set =
    new type, followed by the registered type-name string; bit30 = static
    type), then pointer tracking: uint32 ptr id (MSB set = first occurrence,
    followed by the object payload)

Object layouts follow the reference ``serialize()`` bodies exactly:
`Reconstruction` (`sfm/reconstruction.h:183`), `View` (`sfm/view.h:119`),
`Camera` v1 (`camera/camera.h:211`), `CameraIntrinsicsPrior` v4
(`sfm/camera_intrinsics_prior.h:118`), `Feature` (`sfm/feature.h:110`),
`Track` (`sfm/track.h:95`), `ViewGraph` (`view_graph/view_graph.h:129`),
`TwoViewInfo` v1 (`sfm/twoview_info.h:133`).

Two dialects are supported, auto-detected by attempting the modern layout and
requiring exact end-of-archive consumption:
  - "modern": the current pyTheia ``serialize()`` bodies above;
  - "legacy": the layout of the shipped fixtures `data/sfm/fountain11.bin` /
    `gt_fountain11.bin` (written before the timestamp/prior/inverse-depth
    additions): Reconstruction has no ``view_timestamp_to_id_``; View is
    (name, is_estimated, Camera, CameraIntrinsicsPrior, features) with no
    reverse feature map and no pose priors; Feature is a bare Vector2d;
    Track is (is_estimated, view_ids, point, color).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from ..models.intrinsics import NUM_INTRINSICS, CameraIntrinsicsModelType
from ..sfm.reconstruction import CameraIntrinsicsPrior, Reconstruction
from ..sfm.view_graph import TwoViewInfo, ViewGraph

__all__ = [
    "read_theia_reconstruction",
    "write_theia_reconstruction",
    "read_theia_view_graph",
    "write_theia_view_graph",
]

_MSB = 0x80000000
_MSB2 = 0x40000000

# cereal registered names (CEREAL_REGISTER_TYPE in camera/*.h) <-> model enum.
_MODEL_BY_NAME = {
    "theia::PinholeCameraModel": CameraIntrinsicsModelType.PINHOLE,
    "theia::PinholeRadialTangentialCameraModel": CameraIntrinsicsModelType.PINHOLE_RADIAL_TANGENTIAL,
    "theia::FisheyeCameraModel": CameraIntrinsicsModelType.FISHEYE,
    "theia::FOVCameraModel": CameraIntrinsicsModelType.FOV,
    "theia::DivisionUndistortionCameraModel": CameraIntrinsicsModelType.DIVISION_UNDISTORTION,
    "theia::DoubleSphereCameraModel": CameraIntrinsicsModelType.DOUBLE_SPHERE,
    "theia::ExtendedUnifiedCameraModel": CameraIntrinsicsModelType.EXTENDED_UNIFIED,
    "theia::OrthographicCameraModel": CameraIntrinsicsModelType.ORTHOGRAPHIC,
}
_NAME_BY_MODEL = {v: k for k, v in _MODEL_BY_NAME.items()}

# CameraIntrinsicsPrior.camera_intrinsics_model_type strings (the enum's
# string form, camera_intrinsics_model_type.h:38-48).
_PRIOR_MODEL_STR = {
    "PINHOLE": CameraIntrinsicsModelType.PINHOLE,
    "PINHOLE_RADIAL_TANGENTIAL": CameraIntrinsicsModelType.PINHOLE_RADIAL_TANGENTIAL,
    "FISHEYE": CameraIntrinsicsModelType.FISHEYE,
    "FOV": CameraIntrinsicsModelType.FOV,
    "DIVISION_UNDISTORTION": CameraIntrinsicsModelType.DIVISION_UNDISTORTION,
    "DOUBLE_SPHERE": CameraIntrinsicsModelType.DOUBLE_SPHERE,
    "EXTENDED_UNIFIED": CameraIntrinsicsModelType.EXTENDED_UNIFIED,
    "ORTHOGRAPHIC": CameraIntrinsicsModelType.ORTHOGRAPHIC,
}
_PRIOR_STR_BY_MODEL = {v: k for k, v in _PRIOR_MODEL_STR.items()}


# --------------------------------------------------------------------- reader


class _Reader:
    def __init__(self, data: bytes, legacy: bool = False):
        self.data = data
        self.off = 0
        self.legacy = legacy
        self.versions: dict[str, int] = {}
        self.poly_names: dict[int, str] = {}
        self.shared: dict[int, object] = {}

    # primitives ----------------------------------------------------------
    def raw(self, n: int) -> bytes:
        b = self.data[self.off : self.off + n]
        if len(b) != n:
            raise ValueError("theia_recon: truncated archive")
        self.off += n
        return b

    def u8(self) -> int:
        return self.raw(1)[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.raw(4))[0]

    def i32(self) -> int:
        return struct.unpack("<i", self.raw(4))[0]

    def u64(self) -> int:
        return struct.unpack("<Q", self.raw(8))[0]

    def f64(self) -> float:
        return struct.unpack("<d", self.raw(8))[0]

    def boolean(self) -> bool:
        return self.u8() != 0

    def string(self) -> str:
        n = self.u64()
        return self.raw(n).decode("utf-8", errors="replace")

    def doubles(self, n: int) -> np.ndarray:
        return np.frombuffer(self.raw(8 * n), "<f8").copy()

    def eigen(self, dtype="<f8") -> np.ndarray:
        rows, cols = self.i32(), self.i32()
        item = np.dtype(dtype).itemsize
        flat = np.frombuffer(self.raw(rows * cols * item), dtype)
        # cereal saves Eigen's default (column-major) storage order.
        return flat.reshape((cols, rows)).T.copy()

    def version(self, type_key: str) -> int:
        if type_key not in self.versions:
            self.versions[type_key] = self.u32()
        return self.versions[type_key]

    # composite types ------------------------------------------------------
    def prior(self, n: int) -> tuple[bool, np.ndarray]:
        self.version(f"Prior<{n}>")
        is_set = self.boolean()
        vals = self.doubles(n)
        return is_set, vals

    def intrinsics_prior(self) -> CameraIntrinsicsPrior:
        """All version branches of the reference's serialize
        (`camera_intrinsics_prior.h:118-186`): v<=1 uses per-component
        Prior<1> focal/ppx/ppy/..., v2 a Prior<2> radial, v3 adds the model
        string, v4 adds the Prior<2> principal point."""
        v = self.version("CameraIntrinsicsPrior")
        p = CameraIntrinsicsPrior()
        if v <= 1:
            if v >= 1:
                p.image_width = self.i32()
                p.image_height = self.i32()
            set_f, f = self.prior(1)
            set_ppx, ppx = self.prior(1)
            set_ppy, ppy = self.prior(1)
            set_a, a = self.prior(1)
            set_s, s = self.prior(1)
            set_r1, r1 = self.prior(1)
            set_r2, r2 = self.prior(1)
            if set_f:
                p.focal_length = float(f[0])
            if set_ppx and set_ppy:
                p.principal_point = (float(ppx[0]), float(ppy[0]))
            if set_a:
                p.aspect_ratio = float(a[0])
            if set_s:
                p.skew = float(s[0])
            if set_r1 and set_r2:
                p.radial_distortion = (float(r1[0]), float(r2[0]), 0.0, 0.0)
            return p
        p.image_width = self.i32()
        p.image_height = self.i32()
        if v >= 3:
            model_str = self.string()
            p.camera_intrinsics_model_type = _PRIOR_MODEL_STR.get(
                model_str, CameraIntrinsicsModelType.PINHOLE
            )
        set_f, f = self.prior(1)
        if set_f:
            p.focal_length = float(f[0])
        if v >= 4:
            set_pp, pp = self.prior(2)
            if set_pp:
                p.principal_point = (float(pp[0]), float(pp[1]))
        set_a, a = self.prior(1)
        if set_a:
            p.aspect_ratio = float(a[0])
        set_s, s = self.prior(1)
        if set_s:
            p.skew = float(s[0])
        if v >= 3:
            set_rd, rd = self.prior(4)
        else:
            set_rd, rd = self.prior(2)
        if set_rd:
            p.radial_distortion = tuple(float(x) for x in rd)
        set_td, td = self.prior(2)
        if set_td:
            p.tangential_distortion = tuple(float(x) for x in td)
        set_pos, pos = self.prior(3)
        if set_pos:
            p.position = pos.copy()
        set_ori, ori = self.prior(3)
        if set_ori:
            p.orientation = ori.copy()
        set_lat, lat = self.prior(1)
        if set_lat:
            p.latitude = float(lat[0])
        set_lon, lon = self.prior(1)
        if set_lon:
            p.longitude = float(lon[0])
        set_alt, alt = self.prior(1)
        if set_alt:
            p.altitude = float(alt[0])
        return p

    def intrinsics_model(self):
        """Polymorphic shared_ptr<CameraIntrinsicsModel> -> (model_type, params)
        or a previously-decoded shared object."""
        poly_id = self.u32()
        if poly_id == 0:
            return None
        if poly_id & _MSB:
            name = self.string()
            self.poly_names[poly_id & ~(_MSB | _MSB2)] = name
        else:
            name = self.poly_names[poly_id & ~(_MSB | _MSB2)]
        # ptr_wrapper (memory.hpp:262-271): tracking id, payload on first use.
        ptr_id = self.u32()
        if ptr_id == 0:
            return None
        key = ptr_id & ~_MSB
        if not (ptr_id & _MSB):
            return self.shared[key]
        model = _MODEL_BY_NAME[name]
        self.version(name)  # derived class version
        self.version("CameraIntrinsicsModel")  # base subobject version
        nparams = self.u64()  # std::vector<double> parameters_
        params = self.doubles(nparams)
        obj = (model, params)
        self.shared[key] = obj
        return obj

    def camera(self):
        """-> (extrinsics[6], (model, params) or shared ref, image_size[2])."""
        v = self.version("Camera")
        if v > 0:
            ext = self.doubles(6)
            model = self.intrinsics_model()
            size = np.frombuffer(self.raw(8), "<i4").copy()
        else:
            # v0: raw [6 extrinsics + 7 pinhole params] then image size
            # (camera.h:224-249). No pointer sharing in v0 archives.
            params = self.doubles(13)
            ext = params[:6]
            model = (CameraIntrinsicsModelType.PINHOLE, params[6:])
            size = np.frombuffer(self.raw(8), "<i4").copy()
        return ext, model, size

    def feature(self):
        if self.legacy:
            # Legacy Feature was a bare Eigen::Vector2d (no covariance).
            pt = self.eigen()
            return pt.ravel(), np.eye(2), 0.0, 0.0
        self.version("Feature")
        pt = self.eigen()  # Vector2d
        cov = self.eigen()  # Matrix2d
        depth_prior = self.f64()
        depth_prior_var = self.f64()
        return pt.ravel(), cov, depth_prior, depth_prior_var

    # Bulk feature-map dtypes: after the one-time "Feature" version u32,
    # every map entry is a FIXED-size record (cereal emits the eigen
    # rows/cols headers per record), so a whole view's feature map parses
    # as one np.frombuffer — the per-record Python loop here was ~1.2 s of
    # the 1.5 s fountain-11 archive load.
    _FEAT_ENTRY = np.dtype(
        [
            ("tid", "<u4"),
            ("r1", "<i4"), ("c1", "<i4"), ("pt", "<f8", (2,)),
            ("r2", "<i4"), ("c2", "<i4"), ("cov", "<f8", (4,)),
            ("depth", "<f8"), ("dvar", "<f8"),
        ]
    )
    _FEAT_ENTRY_LEGACY = np.dtype(
        [("tid", "<u4"), ("r1", "<i4"), ("c1", "<i4"), ("pt", "<f8", (2,))]
    )
    # Reverse-map record (feature first, then the track id).
    _FEAT_REV = np.dtype(
        [
            ("r1", "<i4"), ("c1", "<i4"), ("pt", "<f8", (2,)),
            ("r2", "<i4"), ("c2", "<i4"), ("cov", "<f8", (4,)),
            ("depth", "<f8"), ("dvar", "<f8"), ("tid", "<u4"),
        ]
    )

    def _feature_map(self, n_feat: int):
        """-> (tids [N] i64, pts [N,2], cov [N,2,2], depth [N], dvar [N])."""
        first = None
        # The first-ever feature record carries the class version u32;
        # parse it via the slow path so the version cache is primed.
        if n_feat > 0 and not self.legacy and "Feature" not in self.versions:
            tid = self.u32()
            first = (tid, self.feature())
            n_feat -= 1
        ent = self._FEAT_ENTRY_LEGACY if self.legacy else self._FEAT_ENTRY
        raw = self.raw(ent.itemsize * n_feat)
        rec = np.frombuffer(raw, ent)
        if n_feat and not (
            (rec["r1"] == 2).all() and (rec["c1"] == 1).all()
            and (self.legacy or ((rec["r2"] == 2) & (rec["c2"] == 2)).all())
        ):
            raise ValueError("theia_recon: feature map shape headers mismatch")
        tids = rec["tid"].astype(np.int64)
        pts = rec["pt"].astype(np.float64).reshape(-1, 2)
        if self.legacy:
            cov = np.broadcast_to(np.eye(2), (n_feat, 2, 2))
            depth = np.zeros(n_feat)
            dvar = np.zeros(n_feat)
        else:
            # cereal stores Eigen column-major; Matrix2d symmetric anyway.
            cov = rec["cov"].astype(np.float64).reshape(-1, 2, 2)
            depth = rec["depth"].astype(np.float64)
            dvar = rec["dvar"].astype(np.float64)
        if first is not None:
            ftid, (fpt, fcov, fd, fdv) = first
            tids = np.concatenate([[ftid], tids])
            pts = np.concatenate([fpt[None], pts])
            cov = np.concatenate([fcov[None], cov])
            depth = np.concatenate([[fd], depth])
            dvar = np.concatenate([[fdv], dvar])
        return tids, pts, cov, depth, dvar

    def view(self):
        self.version("View")
        name = self.string()
        timestamp = 0.0 if self.legacy else self.f64()
        is_estimated = self.boolean()
        cam = self.camera()
        prior = self.intrinsics_prior()
        n_feat = self.u64()
        features = self._feature_map(n_feat)
        if self.legacy:
            return name, timestamp, is_estimated, cam, prior, features
        # features_to_tracks_: redundant reverse map; skip in bulk (the
        # record is fixed-size once the Feature version is known).
        n_rev = self.u64()
        if n_rev and "Feature" not in self.versions:
            self.feature()
            self.u32()
            n_rev -= 1
        self.raw(self._FEAT_REV.itemsize * n_rev)
        position_prior = self.eigen().ravel()
        position_sqrt_info = self.eigen()
        has_position_prior = self.boolean()
        gravity_prior = self.eigen().ravel()
        gravity_sqrt_info = self.eigen()
        has_gravity_prior = self.boolean()
        orientation_prior = self.eigen().ravel()
        orientation_sqrt_info = self.eigen()
        has_orientation_prior = self.boolean()
        if has_position_prior:
            prior.position = position_prior
            prior.position_sqrt_information = position_sqrt_info
        if has_gravity_prior:
            prior.gravity = gravity_prior
            prior.gravity_sqrt_information = gravity_sqrt_info
        if has_orientation_prior:
            prior.orientation = orientation_prior
            prior.orientation_sqrt_information = orientation_sqrt_info
        return name, timestamp, is_estimated, cam, prior, features

    def track(self):
        self.version("Track")
        is_estimated = self.boolean()
        n_views = self.u64()
        view_ids = [self.u32() for _ in range(n_views)]
        if self.legacy:
            point = self.eigen().ravel()  # Vector4d
            color = self.eigen("u1").ravel()  # Matrix<uint8,3,1>
            return (is_estimated, view_ids, 0xFFFFFFFF, 0.0, point, color, np.zeros(3))
        reference_view_id = self.u32()
        inverse_depth = self.f64()
        point = self.eigen().ravel()  # Vector4d
        color = self.eigen("u1").ravel()  # Matrix<uint8,3,1>
        reference_bearing = self.eigen().ravel()
        # reference_descriptor_: VectorXf (possibly 0x1).
        self.eigen("<f4")
        return (
            is_estimated,
            view_ids,
            reference_view_id,
            inverse_depth,
            point,
            color,
            reference_bearing,
        )

    def tracks_fast(self, n_tracks: int):
        """Parse `n_tracks` modern-dialect track records with one tight
        struct.unpack_from loop (no per-field method dispatch — the
        16.6k-track fountain archive spent ~0.3 s in `track()`'s method
        calls). Same wire layout as `track()`; the first record primes the
        class-version cache via the slow path."""
        out = []
        if n_tracks > 0 and "Track" not in self.versions:
            tid0 = self.u32()
            out.append((tid0, self.track()))
            n_tracks -= 1
        data = self.data
        off = self.off
        upk = struct.unpack_from
        fromb = np.frombuffer
        for _ in range(n_tracks):
            (tid,) = upk("<I", data, off)
            off += 4
            is_est = data[off] != 0
            (n_views,) = upk("<Q", data, off + 1)
            off += 9
            view_ids = fromb(data, "<u4", n_views, off).tolist()
            off += 4 * n_views
            ref_vid, = upk("<I", data, off)
            inv_depth, = upk("<d", data, off + 4)
            # Vector4d, Matrix<u8,3,1>, Vector3d eigen records (fixed
            # rows/cols headers validated by the final EOF check).
            point = fromb(data, "<f8", 4, off + 20).copy()
            color = fromb(data, "u1", 3, off + 60).copy()
            bearing = fromb(data, "<f8", 3, off + 71).copy()
            off += 95
            dr, dc = upk("<ii", data, off)
            off += 8 + 4 * dr * dc  # reference_descriptor_ VectorXf
            out.append(
                (tid, (is_est, view_ids, ref_vid, inv_depth, point, color,
                       bearing))
            )
        self.off = off
        return out

    _LEGACY_NO_BEARING = np.zeros(3)

    def tracks_fast_legacy(self, n_tracks: int):
        """Legacy-dialect analogue of `tracks_fast`: record after the track
        id is is_estimated(u8) + n_views(u64) + view_ids(u32 x n) + eigen
        Vector4d (8-byte rows/cols header + 32 bytes) + eigen
        Matrix<u8,3,1> (header + 3 bytes). The first record primes the
        class-version cache via the slow path."""
        out = []
        if n_tracks > 0 and "Track" not in self.versions:
            tid0 = self.u32()
            out.append((tid0, self.track()))
            n_tracks -= 1
        data = self.data
        off = self.off
        upk = struct.unpack_from
        fromb = np.frombuffer
        no_bearing = self._LEGACY_NO_BEARING
        for _ in range(n_tracks):
            (tid,) = upk("<I", data, off)
            off += 4
            is_est = data[off] != 0
            (n_views,) = upk("<Q", data, off + 1)
            off += 9
            view_ids = fromb(data, "<u4", n_views, off).tolist()
            off += 4 * n_views
            point = fromb(data, "<f8", 4, off + 8).copy()
            color = fromb(data, "u1", 3, off + 48).copy()
            off += 51
            out.append(
                (tid, (is_est, view_ids, 0xFFFFFFFF, 0.0, point, color,
                       no_bearing))
            )
        self.off = off
        return out

    def two_view_info(self) -> TwoViewInfo:
        v = self.version("TwoViewInfo")
        info = TwoViewInfo()
        info.focal_length_1 = self.f64()
        info.focal_length_2 = self.f64()
        info.position_2 = self.eigen().ravel()
        info.rotation_2 = self.eigen().ravel()
        info.num_verified_matches = self.i32()
        info.num_homography_inliers = self.i32()
        info.scale_estimate = self.f64()
        if v > 0:
            info.visibility_score = self.i32()
        return info


def _parse_reconstruction(data: bytes, legacy: bool):
    """Parse the archive; returns (views, tracks, view_to_group) keyed by
    original ids. Raises on any structural mismatch; callers require the
    archive to be consumed exactly to EOF."""
    r = _Reader(data, legacy=legacy)
    if r.u8() != 1:
        raise NotImplementedError("theia_recon: big-endian archives unsupported")
    r.version("Reconstruction")
    r.u32()  # next_track_id_
    r.u32()  # next_view_id_
    for _ in range(r.u64()):  # view_name_to_id_ (reconstructed from views_)
        r.string()
        r.u32()
    if not legacy:
        for _ in range(r.u64()):  # view_timestamp_to_id_
            r.f64()
            r.u32()
    n_views = r.u64()
    views = {}
    for _ in range(n_views):
        vid = r.u32()
        views[vid] = r.view()
    n_tracks = r.u64()
    if legacy:
        tracks = dict(r.tracks_fast_legacy(n_tracks))
    else:
        tracks = dict(r.tracks_fast(n_tracks))
    view_to_group = {}
    for _ in range(r.u64()):
        vid = r.u32()
        view_to_group[vid] = r.u32()
    for _ in range(r.u64()):  # camera_intrinsics_groups_ (redundant)
        r.u32()
        for _ in range(r.u64()):
            r.u32()
    if r.off != len(data):
        raise ValueError(
            f"theia_recon: {len(data) - r.off} trailing bytes (wrong dialect?)"
        )
    return views, tracks, view_to_group


def read_theia_reconstruction(path: str) -> Reconstruction:
    """Load a reference ``.recon`` / ``.bin`` file into our SoA container.

    Parity: `theia::ReadReconstruction` (`io/reconstruction_reader.cc:38-71`).
    View/track ids are remapped densely (ascending original id order); view
    names, priors, poses, points, colors and per-view features all carry over.
    Auto-detects the modern vs. legacy serialization dialect.
    """
    with open(path, "rb") as f:
        data = f.read()
    try:
        views, tracks, view_to_group = _parse_reconstruction(data, legacy=False)
    except Exception:
        views, tracks, view_to_group = _parse_reconstruction(data, legacy=True)

    recon = Reconstruction()
    vid_map = {}
    group_map: dict[int, int] = {}
    for vid in sorted(views):
        name, timestamp, is_est, (ext, model, size), prior, _ = views[vid]
        if model is not None:
            model_type, params = model
            prior.camera_intrinsics_model_type = model_type
        if prior.image_width == 0 and size[0] > 0:
            prior.image_width, prior.image_height = int(size[0]), int(size[1])
        src_group = view_to_group.get(vid, vid)
        new_id = recon.add_view(
            name, group_id=group_map.get(src_group), timestamp=timestamp, prior=prior
        )
        group_map.setdefault(src_group, int(recon.view_group[new_id]))
        vid_map[vid] = new_id
        recon.view_extrinsics[new_id] = ext
        recon.view_estimated[new_id] = is_est
        if model is not None:
            g = recon.view_group[new_id]
            n = min(len(params), recon.intrinsics.shape[1])
            recon.intrinsics[g, :] = 0.0
            recon.intrinsics[g, :n] = params[:n]
            recon.group_model[g] = model_type

    # Bulk-assemble tracks and observations (the container's incremental
    # add_track/add_observation appends are O(n^2) at this scale).
    tid_map = {}
    T = len(tracks)
    recon.points = np.zeros((T, 4), recon.dtype)
    recon.track_estimated = np.zeros((T,), bool)
    recon.track_colors = np.zeros((T, 3), np.uint8)
    recon.track_inverse_depth = np.zeros((T,), recon.dtype)
    recon.track_reference_view = np.full((T,), -1, np.int32)
    recon._track_obs = [[] for _ in range(T)]
    for new_t, tid in enumerate(sorted(tracks)):
        is_est, _, ref_vid, inv_depth, point, color, _ = tracks[tid]
        recon.points[new_t] = point
        recon.track_estimated[new_t] = is_est
        recon.track_colors[new_t] = color
        recon.track_inverse_depth[new_t] = inv_depth
        if ref_vid in vid_map:
            recon.track_reference_view[new_t] = vid_map[ref_vid]
        tid_map[tid] = new_t

    # Vectorized observation assembly (the per-row Python loops here were
    # most of the archive-load wall clock at fountain scale).
    max_tid = max(tracks) if tracks else -1
    tid_arr = np.full(max_tid + 2, -1, np.int64)
    for tid, nt in tid_map.items():
        tid_arr[tid] = nt
    ov_parts, ot_parts, uv_parts, sic_parts, dp_parts, dpv_parts = (
        [], [], [], [], [], []
    )
    for vid in sorted(views):
        tids, pts, cov, depth, dvar = views[vid][5]
        v_new = vid_map[vid]
        order = np.argsort(tids, kind="stable")
        tids, pts, cov = tids[order], pts[order], cov[order]
        depth, dvar = depth[order], dvar[order]
        known = (tids <= max_tid) & (tid_arr[np.minimum(tids, max_tid + 1)] >= 0)
        tids, pts, cov = tids[known], pts[known], cov[known]
        depth, dvar = depth[known], dvar[known]
        ov_parts.append(np.full(len(tids), v_new, np.int32))
        ot_parts.append(tid_arr[tids].astype(np.int32))
        uv_parts.append(pts)
        # Diagonal sqrt-inverse covariance, the form our BA consumes.
        d = np.clip(cov[:, [0, 1], [0, 1]], 1e-12, None)
        sic_parts.append(1.0 / np.sqrt(d))
        dp_parts.append(depth)
        dpv_parts.append(dvar)
    cat = lambda parts, dt: (
        np.concatenate(parts).astype(dt)
        if parts
        else np.zeros((0,), dt)
    )
    recon.obs_view = cat(ov_parts, np.int32)
    recon.obs_track = cat(ot_parts, np.int32)
    O = len(recon.obs_view)
    recon.obs_uv = cat(uv_parts, recon.dtype).reshape(O, 2)
    recon.obs_sqrt_inv_cov = cat(sic_parts, recon.dtype).reshape(O, 2)
    recon.obs_depth_prior = cat(dp_parts, recon.dtype)
    recon.obs_depth_prior_variance = cat(dpv_parts, recon.dtype)
    # _track_obs: rows grouped by track via one argsort + split.
    order = np.argsort(recon.obs_track, kind="stable")
    counts = np.bincount(recon.obs_track, minlength=T)
    bounds = np.zeros(T + 1, np.int64)
    np.cumsum(counts, out=bounds[1:])
    recon._track_obs = [
        order[bounds[t] : bounds[t + 1]].tolist() for t in range(T)
    ]
    # First observing view (archive order = ascending view id) becomes the
    # reference view where the track had none.
    need_ref = recon.track_reference_view < 0
    if need_ref.any() and O:
        first_row = order[bounds[:-1]]
        has_obs = counts > 0
        sel = need_ref & has_obs
        recon.track_reference_view[sel] = recon.obs_view[
            np.where(counts > 0, first_row, 0)
        ][sel]
    for row in range(O):
        v, t = int(recon.obs_view[row]), int(recon.obs_track[row])
        recon._view_track_to_obs[v][t] = row
    return recon


def read_theia_view_graph(path: str) -> ViewGraph:
    """Parity: `theia::ReadViewGraph` (cereal archive of `ViewGraph`)."""
    with open(path, "rb") as f:
        r = _Reader(f.read())
    if r.u8() != 1:
        raise NotImplementedError("theia_recon: big-endian archives unsupported")
    r.version("ViewGraph")
    for _ in range(r.u64()):  # vertices_ (redundant adjacency)
        r.u32()
        for _ in range(r.u64()):
            r.u32()
    graph = ViewGraph()
    for _ in range(r.u64()):
        v1, v2 = r.u32(), r.u32()
        graph.add_edge(v1, v2, r.two_view_info())
    return graph


# --------------------------------------------------------------------- writer


class _Writer:
    def __init__(self):
        self.parts: list[bytes] = []
        self.versions: set[str] = set()
        self.poly_ids: dict[str, int] = {}
        self.next_poly = 1
        self.shared_ids: dict[int, int] = {}
        self.next_ptr = 1

    def raw(self, b: bytes):
        self.parts.append(b)

    def u8(self, x):
        self.raw(struct.pack("<B", x))

    def u32(self, x):
        self.raw(struct.pack("<I", x))

    def i32(self, x):
        self.raw(struct.pack("<i", x))

    def u64(self, x):
        self.raw(struct.pack("<Q", x))

    def f64(self, x):
        self.raw(struct.pack("<d", float(x)))

    def boolean(self, x):
        self.u8(1 if x else 0)

    def string(self, s: str):
        b = s.encode("utf-8")
        self.u64(len(b))
        self.raw(b)

    def doubles(self, arr):
        self.raw(np.ascontiguousarray(arr, "<f8").tobytes())

    def eigen(self, arr, dtype="<f8"):
        a = np.asarray(arr)
        if a.ndim == 1:
            a = a[:, None]
        self.i32(a.shape[0])
        self.i32(a.shape[1])
        self.raw(np.asfortranarray(a.astype(dtype)).tobytes(order="F"))

    def version(self, type_key: str, v: int):
        if type_key not in self.versions:
            self.versions.add(type_key)
            self.u32(v)

    def prior(self, n: int, values=None):
        self.version(f"Prior<{n}>", 0)
        self.boolean(values is not None)
        vals = np.zeros(n) if values is None else np.asarray(values, "<f8").ravel()
        out = np.zeros(n)
        out[: min(n, len(vals))] = vals[: min(n, len(vals))]
        self.doubles(out)

    def intrinsics_prior(self, p: CameraIntrinsicsPrior):
        self.version("CameraIntrinsicsPrior", 4)
        self.i32(p.image_width)
        self.i32(p.image_height)
        self.string(_PRIOR_STR_BY_MODEL[p.camera_intrinsics_model_type])
        self.prior(1, None if p.focal_length is None else [p.focal_length])
        self.prior(2, p.principal_point)
        self.prior(1, None if p.aspect_ratio is None else [p.aspect_ratio])
        self.prior(1, None if p.skew is None else [p.skew])
        self.prior(4, p.radial_distortion if p.radial_distortion else None)
        self.prior(2, p.tangential_distortion if p.tangential_distortion else None)
        self.prior(3, p.position)
        self.prior(3, p.orientation)
        self.prior(1, None if p.latitude is None else [p.latitude])
        self.prior(1, None if p.longitude is None else [p.longitude])
        self.prior(1, None if p.altitude is None else [p.altitude])

    def intrinsics_model(self, group_key: int, model: CameraIntrinsicsModelType, params):
        name = _NAME_BY_MODEL[model]
        if name in self.poly_ids:
            self.u32(self.poly_ids[name])
        else:
            pid = self.next_poly
            self.next_poly += 1
            self.poly_ids[name] = pid
            self.u32(pid | _MSB)
            self.string(name)
        if group_key in self.shared_ids:
            self.u32(self.shared_ids[group_key])
            return
        ptr_id = self.next_ptr
        self.next_ptr += 1
        self.shared_ids[group_key] = ptr_id
        self.u32(ptr_id | _MSB)
        self.version(name, 1)
        self.version("CameraIntrinsicsModel", 0)
        n = NUM_INTRINSICS[model]
        self.u64(n)
        self.doubles(np.asarray(params)[:n])

    def feature(self, uv, sqrt_inv_cov):
        self.version("Feature", 0)
        self.eigen(np.asarray(uv, "<f8"))
        # Invert our diagonal sqrt-information back to a covariance matrix.
        sic = np.asarray(sqrt_inv_cov, "<f8")
        cov = np.diag(1.0 / np.clip(sic, 1e-12, None) ** 2)
        self.eigen(cov)
        self.f64(0.0)
        self.f64(0.0)

    def two_view_info(self, info: TwoViewInfo):
        self.version("TwoViewInfo", 1)
        self.f64(info.focal_length_1)
        self.f64(info.focal_length_2)
        self.eigen(np.asarray(info.position_2, "<f8"))
        self.eigen(np.asarray(info.rotation_2, "<f8"))
        self.i32(int(info.num_verified_matches))
        self.i32(int(info.num_homography_inliers))
        self.f64(info.scale_estimate)
        self.i32(int(getattr(info, "visibility_score", 0)))

    def tobytes(self) -> bytes:
        return b"".join(self.parts)


def write_theia_reconstruction(recon: Reconstruction, path: str) -> None:
    """Write our container as a reference-compatible ``.recon`` archive.

    Parity: `theia::WriteReconstruction` (`io/reconstruction_writer.cc:38-72`).
    """
    w = _Writer()
    w.u8(1)  # little-endian header
    w.version("Reconstruction", 0)
    V, T = recon.num_views(), recon.num_tracks()
    w.u32(T)  # next_track_id_
    w.u32(V)  # next_view_id_
    w.u64(V)
    for v in range(V):
        w.string(recon.view_names[v])
        w.u32(v)
    w.u64(V)
    for v in range(V):
        w.f64(recon.view_timestamps[v])
        w.u32(v)
    w.u64(V)
    for v in range(V):
        w.u32(v)
        w.version("View", 0)
        w.string(recon.view_names[v])
        w.f64(recon.view_timestamps[v])
        w.boolean(bool(recon.view_estimated[v]))
        # Camera v1.
        w.version("Camera", 1)
        w.doubles(recon.view_extrinsics[v])
        g = int(recon.view_group[v])
        w.intrinsics_model(g, recon.group_model[g], recon.intrinsics[g])
        prior = recon.view_priors[v]
        w.raw(struct.pack("<2i", prior.image_width, prior.image_height))
        w.intrinsics_prior(prior)
        track_ids = recon.tracks_in_view(v)
        w.u64(len(track_ids))
        for t in track_ids:
            row = recon._view_track_to_obs[v][t]
            w.u32(t)
            w.feature(recon.obs_uv[row], recon.obs_sqrt_inv_cov[row])
        w.u64(len(track_ids))  # features_to_tracks_ reverse map
        for t in track_ids:
            row = recon._view_track_to_obs[v][t]
            w.feature(recon.obs_uv[row], recon.obs_sqrt_inv_cov[row])
            w.u32(t)
        pos = prior.position if prior.position is not None else np.zeros(3)
        pos_info = (
            prior.position_sqrt_information
            if prior.position_sqrt_information is not None
            else np.eye(3)
        )
        w.eigen(pos)
        w.eigen(pos_info)
        w.boolean(prior.position is not None)
        grav = prior.gravity if prior.gravity is not None else np.zeros(3)
        grav_info = (
            prior.gravity_sqrt_information
            if prior.gravity_sqrt_information is not None
            else np.eye(3)
        )
        w.eigen(grav)
        w.eigen(grav_info)
        w.boolean(prior.gravity is not None)
        ori = prior.orientation if prior.orientation is not None else np.zeros(3)
        ori_info = (
            prior.orientation_sqrt_information
            if prior.orientation_sqrt_information is not None
            else np.eye(3)
        )
        w.eigen(ori)
        w.eigen(ori_info)
        w.boolean(prior.orientation is not None)
    w.u64(T)
    for t in range(T):
        w.u32(t)
        w.version("Track", 0)
        w.boolean(bool(recon.track_estimated[t]))
        rows = recon.track_observations(t)
        w.u64(len(rows))
        for r in rows:
            w.u32(int(recon.obs_view[r]))
        w.u32(int(recon.track_reference_view[t]) & 0xFFFFFFFF)
        w.f64(recon.track_inverse_depth[t])
        w.eigen(np.asarray(recon.points[t], "<f8"))
        w.eigen(np.asarray(recon.track_colors[t], np.uint8), "u1")
        w.eigen(np.zeros(3))  # reference_bearing_
        w.eigen(np.zeros((0, 1), "<f4"), "<f4")  # reference_descriptor_
    w.u64(V)
    for v in range(V):
        w.u32(v)
        w.u32(int(recon.view_group[v]))
    groups: dict[int, list[int]] = {}
    for v in range(V):
        groups.setdefault(int(recon.view_group[v]), []).append(v)
    w.u64(len(groups))
    for g, members in groups.items():
        w.u32(g)
        w.u64(len(members))
        for v in members:
            w.u32(v)
    with open(path, "wb") as f:
        f.write(w.tobytes())


def write_theia_view_graph(graph: ViewGraph, path: str) -> None:
    """Parity: `theia::WriteViewGraph`."""
    w = _Writer()
    w.u8(1)
    w.version("ViewGraph", 0)
    adjacency: dict[int, set[int]] = {}
    for (v1, v2) in graph.edges:
        adjacency.setdefault(v1, set()).add(v2)
        adjacency.setdefault(v2, set()).add(v1)
    w.u64(len(adjacency))
    for v, nbrs in adjacency.items():
        w.u32(v)
        w.u64(len(nbrs))
        for n in nbrs:
            w.u32(n)
    w.u64(len(graph.edges))
    for (v1, v2), info in graph.edges.items():
        w.u32(v1)
        w.u32(v2)
        w.two_view_info(info)
    with open(path, "wb") as f:
        f.write(w.tobytes())
