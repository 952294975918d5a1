"""ECEF <-> geodetic (LLA) coordinate conversion on WGS-84.

Re-design of `/root/reference/src/theia/sfm/gps_converter.{h,cc}`
(`gps_converter.h:61,66`), which implements Olson's closed-form method
(Olson, D.K., "Converting Earth-Centered, Earth-Fixed Coordinates to
Geodetic Coordinates", IEEE TAES 32(1), 1996). The reference converts one
point at a time with a branch on c^2 > 0.3; here both branches are computed
and selected with `where`, so the function is vectorized over [..., 3]
batches and jit/vmap-friendly.

Latitude/longitude are degrees; altitude and ECEF are meters.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["ecef_to_lla", "lla_to_ecef", "GPSConverter"]

# WGS-84 constants (same geodesy constants as the reference, gps_converter.cc:46-60).
_A = 6378137.0  # semi-major axis
_E2 = 6.6943799901377997e-3  # first eccentricity squared
_A1 = _A * _E2
_A2 = _A1 * _A1
_A3 = _A1 * _E2 / 2.0
_A4 = 2.5 * _A2
_A5 = _A1 + _A3
_A6 = 1.0 - _E2


def ecef_to_lla(ecef):
    """[..., 3] ECEF meters -> [..., 3] (lat deg, lon deg, alt m)."""
    ecef = jnp.asarray(ecef)
    x, y, z = ecef[..., 0], ecef[..., 1], ecef[..., 2]
    zp = jnp.abs(z)
    w2 = x * x + y * y
    w = jnp.sqrt(w2)
    r2 = w2 + z * z
    r = jnp.sqrt(r2)
    lon = jnp.arctan2(y, x)

    s2 = z * z / r2
    c2 = w2 / r2
    u = _A2 / r
    v = _A3 - _A4 / r

    # Branch 1 (c2 > 0.3): compute from sine; branch 2: from cosine.
    s_b1 = (zp / r) * (1.0 + c2 * (_A1 + u + s2 * v) / r)
    s_b1 = jnp.clip(s_b1, -1.0, 1.0)
    lat_b1 = jnp.arcsin(s_b1)
    c_b1 = jnp.sqrt(jnp.maximum(1.0 - s_b1 * s_b1, 0.0))

    c_b2 = (w / r) * (1.0 - s2 * (_A5 - u - c2 * v) / r)
    c_b2 = jnp.clip(c_b2, -1.0, 1.0)
    lat_b2 = jnp.arccos(c_b2)
    s_b2 = jnp.sqrt(jnp.maximum(1.0 - c_b2 * c_b2, 0.0))

    use1 = c2 > 0.3
    s = jnp.where(use1, s_b1, s_b2)
    c = jnp.where(use1, c_b1, c_b2)
    lat = jnp.where(use1, lat_b1, lat_b2)
    ss = s * s

    g = 1.0 - _E2 * ss
    rg = _A / jnp.sqrt(g)
    rf = _A6 * rg
    u = w - rg * c
    v = zp - rf * s
    f = c * u + s * v
    m = c * v - s * u
    p = m / (rf / g + f)
    lat = lat + p
    alt = f + m * p / 2.0
    lat = jnp.where(z < 0.0, -lat, lat)
    return jnp.stack([jnp.rad2deg(lat), jnp.rad2deg(lon), alt], axis=-1)


def lla_to_ecef(lla):
    """[..., 3] (lat deg, lon deg, alt m) -> [..., 3] ECEF meters."""
    lla = jnp.asarray(lla)
    lat = jnp.deg2rad(lla[..., 0])
    lon = jnp.deg2rad(lla[..., 1])
    alt = lla[..., 2]
    sin_lat = jnp.sin(lat)
    n = _A / jnp.sqrt(1.0 - _E2 * sin_lat * sin_lat)
    x = (n + alt) * jnp.cos(lat) * jnp.cos(lon)
    y = (n + alt) * jnp.cos(lat) * jnp.sin(lon)
    z = (n * _A6 + alt) * sin_lat
    return jnp.stack([x, y, z], axis=-1)


class GPSConverter:
    """API-parity shim: `theia::GPSConverter` (`gps_converter.h:54-67`)."""

    ECEFToLLA = staticmethod(ecef_to_lla)
    LLAToECEF = staticmethod(lla_to_ecef)
