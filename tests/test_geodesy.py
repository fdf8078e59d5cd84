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


def test_adjust_longitude_wrap():
    from pyrayhf_tpu.geodesy import adjust_longitude
    import pytest
    np.testing.assert_allclose(
        np.asarray(adjust_longitude(np.array([-190.0, 190.0, 180.0, 0.0]))),
        [170.0, -170.0, -180.0, 0.0])   # half-open [-180, 180)
    np.testing.assert_allclose(
        np.asarray(adjust_longitude(np.array([-10.0, 370.0]), "to360")),
        [350.0, 10.0])
    with pytest.raises(ValueError):
        adjust_longitude(0.0, "bad")


def test_interp_exact_edge_semantics():
    """np.interp parity: exact-node hits, edge clamps, NaN queries."""
    from pyrayhf_tpu.interp import interp_exact
    xp = np.array([0.0, 1.0, 2.5, 7.0])
    fp = np.array([10.0, 20.0, -5.0, 3.0])
    q = np.array([-1.0, 0.0, 0.5, 1.0, 2.5, 3.0, 7.0, 9.0, np.nan])
    ours = np.asarray(interp_exact(q, xp, fp))
    ref = np.interp(q, xp, fp)
    np.testing.assert_allclose(ours[:-1], ref[:-1], rtol=1e-15)
    assert np.isnan(ours[-1])


def test_dipole_field_matches_degree1():
    from pyrayhf_tpu.igrf import dipole_field, igrf_field, IGRF13_2020_N3
    c1 = {"g": IGRF13_2020_N3["g"][:2, :2], "h": IGRF13_2020_N3["h"][:2, :2]}
    a = dipole_field(30.0, 40.0, 200.0)
    b = igrf_field(30.0, 40.0, 200.0, coeffs=c1)
    for x, y in zip(a, b):
        np.testing.assert_allclose(float(x), float(y), rtol=1e-12)
