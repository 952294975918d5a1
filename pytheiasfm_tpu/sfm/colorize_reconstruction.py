"""Colorize reconstruction tracks from source images.

Parity: `/root/reference/src/theia/sfm/colorize_reconstruction.{h,cc}` —
the reference fans image loads out over a ThreadPool and averages, per
track, the image color sampled at each observing feature. Here each image's
feature colors are sampled with one vectorized bilinear gather (numpy, host:
image I/O is host work by design, SURVEY.md §7), then a single segment-sum
over the observation table accumulates per-track means.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["colorize_reconstruction", "sample_bilinear"]


def sample_bilinear(image: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """Bilinear color sampling. image [H, W, C] uint8/float, uv [N, 2] pixel
    coords (x, y). Returns [N, C] float64."""
    h, w = image.shape[:2]
    img = image.astype(np.float64)
    if img.ndim == 2:
        img = img[..., None]
    x = np.clip(uv[:, 0], 0.0, w - 1.0)
    y = np.clip(uv[:, 1], 0.0, h - 1.0)
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    c00 = img[y0, x0]
    c01 = img[y0, x1]
    c10 = img[y1, x0]
    c11 = img[y1, x1]
    return (
        c00 * (1 - fx) * (1 - fy)
        + c01 * fx * (1 - fy)
        + c10 * (1 - fx) * fy
        + c11 * fx * fy
    )


def colorize_reconstruction(
    recon,
    image_directory: str,
    image_loader=None,
) -> int:
    """Set `recon.track_colors` from the images named by `recon.view_names`.

    Parity: `theia::ColorizeReconstruction(image_directory, num_threads,
    recon)` (`colorize_reconstruction.h`). `image_loader(path) -> [H, W, 3]
    uint8` may be injected (defaults to Pillow). Views whose image is missing
    are skipped. Returns the number of tracks colorized.
    """
    if image_loader is None:

        def image_loader(path):
            from PIL import Image

            with Image.open(path) as img:
                return np.asarray(img.convert("RGB"))

    T = recon.num_tracks()
    color_sum = np.zeros((T, 3), np.float64)
    color_cnt = np.zeros((T,), np.int64)

    obs_view = np.asarray(recon.obs_view)
    obs_track = np.asarray(recon.obs_track)
    obs_uv = np.asarray(recon.obs_uv, np.float64)

    for v, name in enumerate(recon.view_names):
        base = name if os.path.isabs(name) else os.path.join(image_directory, name)
        path = None
        for cand in (base, base + ".png", base + ".jpg", base + ".jpeg"):
            if os.path.exists(cand):
                path = cand
                break
        if path is None:
            continue
        rows = np.flatnonzero(obs_view == v)
        if len(rows) == 0:
            continue
        image = image_loader(path)
        colors = sample_bilinear(image, obs_uv[rows])
        if colors.shape[1] == 1:
            colors = np.repeat(colors, 3, axis=1)
        tracks = obs_track[rows]
        np.add.at(color_sum, tracks, colors[:, :3])
        np.add.at(color_cnt, tracks, 1)

    seen = color_cnt > 0
    recon.track_colors[seen] = np.clip(
        color_sum[seen] / color_cnt[seen, None], 0, 255
    ).astype(np.uint8)
    return int(seen.sum())
