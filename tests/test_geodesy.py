"""Geodesy parity tests vs reference oracle goldens + identity checks."""

import numpy as np
from numpy.testing import assert_allclose

from pyrayhf_tpu.constants import constants
from pyrayhf_tpu.geodesy import (azimuth_between_points, calculate_gcd,
                                 earth_radius_at_latitude, great_circle_point,
                                 oblique_to_vertical,
                                 vertical_to_magnetic_angle)


def test_vertical_to_magnetic_angle():
    assert float(vertical_to_magnetic_angle(60.0)) == 30.0
    out = np.asarray(vertical_to_magnetic_angle(np.array([0.0, -45.0, 90.0])))
    assert_allclose(out, [90.0, 45.0, 0.0])


def test_oblique_to_vertical_identities():
    """Identity test against defining geometry (ref test_core.py:890-916)."""
    D = 600.0
    p = np.array([900.0, 1100.0, 1500.0])
    f_o = np.array([5.0, 10.0, 15.0])
    f_v, h_v = oblique_to_vertical(D, p, f_o)
    f_v, h_v = np.asarray(f_v), np.asarray(h_v)
    _, _, Re, _ = constants()
    theta = (D / 2.0) / Re
    dcurv = Re * (1.0 - np.cos(theta))
    phi = np.arcsin(D / p)
    assert_allclose(f_v / f_o, np.cos(phi), rtol=1e-12)
    assert_allclose(h_v + dcurv, 0.5 * p * np.cos(phi), rtol=1e-12)
    assert np.all(h_v >= 0)


def test_oblique_to_vertical_parity(goldens):
    f_v, h_v = oblique_to_vertical(600.0, np.array([900.0, 1100.0, 1500.0]),
                                   np.array([5.0, 10.0, 15.0]))
    assert_allclose(np.asarray(f_v), goldens["obl2vert_fv"], rtol=1e-13)
    assert_allclose(np.asarray(h_v), goldens["obl2vert_hv"], rtol=1e-13)


def test_earth_radius_parity(goldens):
    out = np.asarray(earth_radius_at_latitude(goldens["earth_radius_lats"]))
    assert_allclose(out, goldens["earth_radius"], rtol=1e-13)


def test_gcd_azimuth_parity(goldens):
    lon0 = np.array([10.0, -150.0])
    lat0 = np.array([45.0, 4.5])
    lon1 = np.array([30.0, -140.0])
    lat1 = np.array([50.0, 10.0])
    assert_allclose(np.asarray(calculate_gcd(lon0, lat0, lon1, lat1)),
                    goldens["gcd"], rtol=1e-13)
    assert_allclose(np.asarray(azimuth_between_points(lon0, lat0, lon1, lat1)),
                    goldens["azimuth"], rtol=1e-13)


def test_great_circle_roundtrip():
    """Destination point consistency: gcd/azimuth back to the destination."""
    tlat, tlon = 40.0, -100.0
    gcd_km = np.array([500.0, 1500.0, 3000.0])
    az = 63.0
    rlat, rlon = great_circle_point(tlat, tlon, gcd_km, az)
    rlat, rlon = np.asarray(rlat), np.asarray(rlon)
    # recompute distance & azimuth from origin to each destination
    _, _, Re, _ = constants()
    gcd_deg = np.asarray(calculate_gcd(np.full(3, tlon), np.full(3, tlat),
                                       rlon, rlat))
    assert_allclose(np.deg2rad(gcd_deg) * Re, gcd_km, rtol=1e-10)
    az_back = np.asarray(azimuth_between_points(np.full(3, tlon),
                                                np.full(3, tlat), rlon, rlat))
    assert_allclose(az_back, np.full(3, az), rtol=1e-8)
