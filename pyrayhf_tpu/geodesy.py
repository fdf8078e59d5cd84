"""Geodesy and oblique↔vertical ionogram utilities (pure jnp).

Covers the reference L4 layer (``/root/reference/PyRayHF/library.py``):
``great_circle_point`` :2340-2387, ``oblique_to_vertical`` :2697-2742,
``earth_radius_at_latitude`` :2745-2772, ``calculate_gcd`` :2775-2830,
``azimuth_between_points`` :2833-2863, ``vertical_to_magnetic_angle`` :441-456.

The reference's PyIRI dependency for longitude wrapping (ref :2385) is replaced
by an explicit wrap to (-180, 180].
"""

import jax.numpy as jnp

from .constants import R_E

__all__ = ["great_circle_point", "oblique_to_vertical",
           "earth_radius_at_latitude", "calculate_gcd",
           "azimuth_between_points", "vertical_to_magnetic_angle",
           "adjust_longitude"]


def vertical_to_magnetic_angle(inclination_deg):
    """ψ = 90 − |inclination| [deg] (ref :441-456)."""
    return 90.0 - jnp.abs(inclination_deg)


def adjust_longitude(lon, mode="to180"):
    """Wrap longitudes to [-180, 180) ('to180') or [0, 360) ('to360')."""
    lon = jnp.asarray(lon, dtype=float)
    if mode == "to180":
        return (lon + 180.0) % 360.0 - 180.0
    if mode == "to360":
        return lon % 360.0
    raise ValueError("mode must be 'to180' or 'to360'")


def great_circle_point(tlat, tlon, gcd, az):
    """Destination lat/lon from origin, distance [km] and azimuth [deg].

    Spherical Earth (ref :2340-2387).
    """
    s = jnp.asarray(gcd, dtype=float) / R_E
    tlat_r = jnp.deg2rad(tlat)
    tlon_r = jnp.deg2rad(tlon)
    az_r = jnp.deg2rad(az)

    rlat_r = jnp.arcsin(jnp.sin(tlat_r) * jnp.cos(s)
                        + jnp.cos(tlat_r) * jnp.sin(s) * jnp.cos(az_r))
    rlon_r = tlon_r + jnp.arctan2(
        jnp.sin(az_r) * jnp.sin(s) * jnp.cos(tlat_r),
        jnp.cos(s) - jnp.sin(tlat_r) * jnp.sin(rlat_r))
    return jnp.rad2deg(rlat_r), adjust_longitude(jnp.rad2deg(rlon_r), "to180")


def oblique_to_vertical(range_km, group_path_km, freq_oblique_mhz, R_E_km=R_E):
    """Secant-law oblique→vertical equivalence with curvature correction.

    (ref :2697-2742) Returns (freq_vertical_mhz, height_virtual_km).
    """
    p = jnp.asarray(group_path_km, dtype=float)
    f_o = jnp.asarray(freq_oblique_mhz, dtype=float)
    D = range_km
    theta = (D / 2.0) / R_E_km
    curvature_correction = R_E_km * (1.0 - jnp.cos(theta))
    phi = jnp.arcsin(D / p)
    height_virtual_km = 0.5 * p * jnp.cos(phi) - curvature_correction
    freq_vertical_mhz = f_o * jnp.cos(phi)
    return freq_vertical_mhz, height_virtual_km


def earth_radius_at_latitude(latitude):
    """Oblate-spheroid Earth radius [km] at geodetic latitude
    (ref :2745-2772)."""
    lat = jnp.deg2rad(latitude)
    a = 6378.137
    b = 6356.7523142
    num = (a ** 2 * jnp.cos(lat)) ** 2 + (b ** 2 * jnp.sin(lat)) ** 2
    den = (a * jnp.cos(lat)) ** 2 + (b * jnp.sin(lat)) ** 2
    return jnp.sqrt(num / den)


def calculate_gcd(lon0, lat0, lon1, lat1):
    """Great-circle distance in degrees (ref :2775-2830)."""
    coslt1 = jnp.cos(jnp.deg2rad(lat1))
    sinlt1 = jnp.sin(jnp.deg2rad(lat1))
    coslt0 = jnp.cos(jnp.deg2rad(lat0))
    sinlt0 = jnp.sin(jnp.deg2rad(lat0))
    cosl0l1 = jnp.cos(jnp.deg2rad(jnp.asarray(lon1, dtype=float)
                                  - jnp.asarray(lon0, dtype=float)))
    cosc = sinlt0 * sinlt1 + coslt0 * coslt1 * cosl0l1
    cosc = jnp.clip(cosc, -1.0, 1.0)
    return jnp.rad2deg(jnp.arccos(cosc))


def azimuth_between_points(lon1_deg, lat1_deg, lon2_deg, lat2_deg):
    """Forward azimuth [deg, 0..360) from point 1 to 2 (ref :2833-2863)."""
    lat1 = jnp.deg2rad(lat1_deg)
    lon1 = jnp.deg2rad(lon1_deg)
    lat2 = jnp.deg2rad(lat2_deg)
    lon2 = jnp.deg2rad(lon2_deg)
    dlon = lon2 - lon1
    x = jnp.sin(dlon) * jnp.cos(lat2)
    y = (jnp.cos(lat1) * jnp.sin(lat2)
         - jnp.sin(lat1) * jnp.cos(lat2) * jnp.cos(dlon))
    return (jnp.rad2deg(jnp.arctan2(x, y)) + 360.0) % 360.0
