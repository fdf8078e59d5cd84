"""3-D magnetoionic ray tracer: parity, symmetry, deflection physics."""

import numpy as np
import pytest

import pyrayhf_tpu as prt
from pyrayhf_tpu.constants import C_KM_S
from pyrayhf_tpu.magnetoionic import find_X, find_Y, find_mu_mup
from pyrayhf_tpu.trace3d import build_field_3d, trace_ray_3d, trace_rays_3d


@pytest.fixture(scope="module")
def day(day_profile):
    d = day_profile
    return (np.asarray(d["alt"], float), np.asarray(d["den"], float),
            np.asarray(d["bmag"], float), np.asarray(d["bpsi"], float))


@pytest.fixture(scope="module")
def uniform_field(day):
    """Horizontally-uniform 3-D field from the day profile."""
    alt, den, bmag, bpsi = day
    lat = np.linspace(20.0, 55.0, 36)
    lon = np.linspace(-90.0, -50.0, 41)
    shape = (alt.size, lat.size, lon.size)
    return build_field_3d(alt, lat, lon,
                          np.broadcast_to(den[:, None, None], shape),
                          np.broadcast_to(bmag[:, None, None], shape),
                          np.broadcast_to(bpsi[:, None, None], shape),
                          8e6, "O"), (alt, den, bmag, bpsi)


def _trace_2d_spherical(alt, den, bmag, bpsi, f0, elev, step_km=2.0):
    zg = np.concatenate([np.arange(0.0, alt[0], 2.0), alt])
    ext = lambda v, v0: np.concatenate([np.full(zg.size - alt.size, v0), v])
    deng, bg, pg = ext(den, 1e6), ext(bmag, bmag[0]), ext(bpsi, bpsi[0])
    X = find_X(deng, f0)
    Y = find_Y(f0, bg)
    mu, mup = find_mu_mup(X, Y, pg, "O")
    x = np.linspace(0.0, 2500.0, 64)
    mu2 = np.broadcast_to(np.asarray(mu)[:, None], (zg.size, x.size))
    mup2 = np.broadcast_to(np.asarray(mup)[:, None], (zg.size, x.size))
    nag = prt.build_refractive_index_interpolator_spherical(zg, x, mu2)
    mupf = prt.build_mup_function(mup2, x, zg, geometry="spherical")
    return prt.trace_ray_spherical_gradient(nag, mupf, 0.0, 0.0, elev,
                                            step_km=step_km)


def test_matches_2d_spherical_on_uniform_field(uniform_field):
    """On a horizontally-uniform ionosphere the 3-D ECEF trace reduces to
    the 2-D spherical tracer (range/path/delay < 0.5%), with machine-zero
    cross-track."""
    field, (alt, den, bmag, bpsi) = uniform_field
    o = trace_ray_3d(field, 30.0, -75.0, 40.0, 0.0, step_km=2.0)
    g = _trace_2d_spherical(alt, den, bmag, bpsi, 8e6, 40.0)
    assert o["status"] == "ground" and g["status"] == "ground"
    for k in ("ground_range_km", "group_path_km", "group_delay_sec"):
        assert abs(float(o[k]) / float(g[k]) - 1.0) < 5e-3, k
    assert abs(float(o["cross_track_km"])) < 1e-6
    # phase ordering holds in 3-D too
    pp, gp = float(o["phase_path_km"]), float(o["group_path_km"])
    assert pp < gp < float(o["group_delay_sec"]) * C_KM_S


def test_azimuth_invariance_uniform(uniform_field):
    """A uniform field has no preferred azimuth: the same elevation lands
    at the same range for any launch direction (inside the domain)."""
    field, _ = uniform_field
    o_n = trace_ray_3d(field, 32.0, -70.0, 45.0, 0.0, step_km=2.0)
    o_e = trace_ray_3d(field, 32.0, -70.0, 45.0, 90.0, step_km=2.0)
    o_sw = trace_ray_3d(field, 38.0, -60.0, 45.0, 225.0, step_km=2.0)
    r = [float(o["ground_range_km"]) for o in (o_n, o_e, o_sw)]
    assert np.isfinite(r).all()
    np.testing.assert_allclose(r[1:], r[0], rtol=2e-3)


def test_transverse_gradient_deflects_ray(day):
    """An eastward density increase pushes a northbound ray WEST (toward
    higher μ): cross-track < 0, and the landing longitude shifts west."""
    alt, den, bmag, bpsi = day
    lat = np.linspace(20.0, 55.0, 36)
    lon = np.linspace(-90.0, -50.0, 41)
    shape = (alt.size, lat.size, lon.size)
    ramp = 1.0 + 0.5 * (lon[None, None, :] + 75.0) / 25.0   # +50%/25° east
    Ne = np.broadcast_to(den[:, None, None], shape) * ramp
    field = build_field_3d(
        alt, lat, lon, Ne,
        np.broadcast_to(bmag[:, None, None], shape),
        np.broadcast_to(bpsi[:, None, None], shape), 8e6, "O")
    o = trace_ray_3d(field, 30.0, -75.0, 35.0, 0.0, step_km=2.0)
    assert o["status"] == "ground"
    ct = float(o["cross_track_km"])
    assert ct < -1.0, ct                      # deflected west of the plane
    assert float(o["landing_lon_deg"]) < -75.0


def test_multihop_composition_3d(uniform_field):
    """Two specular hops through a uniform field double the single-hop
    great-circle range (same elevation)."""
    field, _ = uniform_field
    o1 = trace_ray_3d(field, 26.0, -75.0, 40.0, 0.0, step_km=2.0,
                      s_max_km=3000.0)
    o2 = trace_ray_3d(field, 26.0, -75.0, 40.0, 0.0, step_km=2.0,
                      s_max_km=3000.0, n_hops=2)
    r1, r2 = float(o1["ground_range_km"]), float(o2["ground_range_km"])
    assert o1["status"] == "ground" and o2["status"] == "ground"
    assert abs(r2 / (2.0 * r1) - 1.0) < 0.01
    assert abs(float(o2["group_path_km"])
               / (2.0 * float(o1["group_path_km"])) - 1.0) < 0.01


def test_fan_batching(uniform_field):
    """[E, A] fan in one launch, consistent with single-ray calls.

    Near-vertical rays freeze at the μ→0 layer (NaN landing) — the same
    zero-RHS semantics as the 2-D tracers and the reference
    (ref ``library.py:987-988``); oblique rays land."""
    field, _ = uniform_field
    els = np.array([25.0, 45.0, 85.0])
    azs = np.array([0.0, 90.0])
    out = trace_rays_3d(field, 30.0, -75.0, els, azs, step_km=2.0,
                        s_max_km=2500.0)
    rng = np.asarray(out["ground_range_km"])
    assert rng.shape == (3, 2)
    # single-ray consistency
    o = trace_ray_3d(field, 30.0, -75.0, 45.0, 90.0, step_km=2.0,
                     s_max_km=2500.0)
    np.testing.assert_allclose(rng[1, 1], float(o["ground_range_km"]),
                               rtol=1e-10)
    assert np.isfinite(rng[:2]).all()         # oblique rays land
    assert np.isnan(rng[2]).all()             # near-vertical: frozen at μ→0
    # the frozen rays stalled at the column's first evanescent sample
    mu_col = np.asarray(field["mu"])[:, 0, 0]
    alt_g = np.asarray(field["alt"])
    z_evan = alt_g[np.argmax(~np.isfinite(mu_col))]
    np.testing.assert_allclose(np.asarray(out["apex_alt_km"])[2], z_evan,
                               atol=3.0)


def test_home_ray_3d_uniform_matches_2d(uniform_field, day):
    """Uniform volume: the 3-D homing reduces to the 2-D great-circle
    problem — machine-zero azimuth correction and the same low-ray
    delay as synthesize_oblique_ionogram."""
    from pyrayhf_tpu.trace3d import home_ray_3d

    field, (alt, den, bmag, bpsi) = uniform_field
    h = home_ray_3d(field, 38.0, -72.0, 33.7, -72.0, n_elev=64, n_az=9)
    assert abs(float(h["azimuth_offset_low_deg"])) < 1e-8
    D = float(h["range_km"])
    o = prt.synthesize_oblique_ionogram(np.array([8e6]), D, alt, den,
                                        bmag, bpsi, geometry="spherical",
                                        n_elev=256)
    assert abs(float(h["delay_low_sec"])
               / float(o["delay_low_sec"][0]) - 1.0) < 2e-3
    # phase < group at the link in 3-D too
    assert float(h["phase_path_low_km"]) < float(h["group_path_low_km"])


def test_home_ray_3d_ridge_correction(day):
    """Through an east-west ridge the homed solution needs a nonzero
    azimuth correction, and actually hits the receiver: re-tracing the
    solved (elevation, azimuth) lands within 1 km of the target."""
    from pyrayhf_tpu.geodesy import calculate_gcd
    from pyrayhf_tpu.trace3d import build_field_3d, home_ray_3d, \
        trace_ray_3d

    alt, den, bmag, bpsi = day
    lat = np.linspace(10.0, 45.0, 36)
    lon = np.linspace(-90.0, -50.0, 41)
    shape = (alt.size, lat.size, lon.size)
    U = lambda v: np.broadcast_to(v[:, None, None], shape)
    ridge = 1.0 + 0.4 * np.exp(-((lon + 65.0) / 8.0) ** 2)
    field = build_field_3d(alt, lat, lon, U(den) * ridge[None, None, :],
                           U(bmag), U(bpsi), 8e6, "O")
    rx = (33.7, -72.0)
    h = home_ray_3d(field, 38.0, -72.0, *rx, n_elev=64, n_az=11,
                    az_span_deg=6.0)
    off = float(h["azimuth_offset_low_deg"])
    assert np.isfinite(off) and abs(off) > 0.02
    o = trace_ray_3d(field, 38.0, -72.0, float(h["elev_low_deg"]),
                     float(h["azimuth_low_deg"]), step_km=2.0)
    miss = np.deg2rad(float(calculate_gcd(
        float(o["landing_lon_deg"]), float(o["landing_lat_deg"]),
        rx[1], rx[0]))) * 6371.0
    assert o["status"] == "ground"
    assert miss < 1.0, miss


def test_oblique_ionogram_3d_uniform_matches_1d(day):
    """Uniform volume: the 3-D oblique ionogram (per-frequency two-angle
    homing) reproduces the 1-D homing delays with ~zero azimuth offsets
    and the same NaN (above-MUF) structure."""
    from pyrayhf_tpu.trace3d import synthesize_oblique_ionogram_3d

    alt, den, bmag, bpsi = day
    lat = np.linspace(20.0, 55.0, 26)
    lon = np.linspace(-90.0, -50.0, 26)
    shape = (alt.size, lat.size, lon.size)
    U = lambda v: np.broadcast_to(v[:, None, None], shape)
    f0s = np.array([6e6, 9e6, 25e6])       # 25 MHz: above the link MUF
    o3 = synthesize_oblique_ionogram_3d(
        f0s, 36.0, -72.0, 30.0, -72.0, alt, lat, lon,
        U(den), U(bmag), U(bpsi), n_elev=64, n_az=5, az_span_deg=3.0,
        step_km=2.0)
    D = float(o3["range_km"])
    o1 = prt.synthesize_oblique_ionogram(f0s, D, alt, den, bmag, bpsi,
                                         geometry="spherical", n_elev=256)
    d3 = np.asarray(o3["delay_low_sec"])
    d1 = np.asarray(o1["delay_low_sec"])
    assert np.array_equal(np.isfinite(d3), np.isfinite(d1))
    m = np.isfinite(d1)
    assert m.sum() == 2
    np.testing.assert_allclose(d3[m], d1[m], rtol=5e-3)
    assert np.abs(np.asarray(o3["azimuth_offset_low_deg"])[m]).max() < 1e-6


def test_oblique_ionogram_3d_row_matches_single_homing(day):
    """One ionogram row ≡ the direct single-link home_ray_3d at the same
    frequency: the one-launch sweep fan (frequency INDEX as a frozen
    state channel offsetting the packed gather into the stacked
    tables) must integrate and cross exactly like the per-frequency
    homing fan on the matching field slice."""
    from pyrayhf_tpu.trace3d import (build_field_3d,
                                     synthesize_oblique_ionogram_3d)

    alt, den, bmag, bpsi = day
    lat = np.linspace(20.0, 55.0, 16)
    lon = np.linspace(-90.0, -50.0, 16)
    shape = (alt.size, lat.size, lon.size)
    U = lambda v: np.broadcast_to(v[:, None, None], shape)
    kw = dict(n_elev=16, n_az=3, az_span_deg=3.0, step_km=4.0,
              s_max_km=2400.0)
    o3 = synthesize_oblique_ionogram_3d(
        np.array([6e6, 9e6]), 36.0, -72.0, 30.0, -72.0, alt, lat, lon,
        U(den), U(bmag), U(bpsi), **kw)
    fld = build_field_3d(alt, lat, lon, U(den), U(bmag), U(bpsi), 6e6)
    one = prt.home_ray_3d(fld, 36.0, -72.0, 30.0, -72.0, **kw)
    d0 = float(np.asarray(o3["delay_low_sec"])[0])
    assert np.isfinite(d0)
    np.testing.assert_allclose(d0, float(one["delay_low_sec"]),
                               rtol=1e-9)
    np.testing.assert_allclose(
        float(np.asarray(o3["elev_low_deg"])[0]),
        float(one["elev_low_deg"]), rtol=1e-9)


def test_build_field_3d_batch_matches_single():
    """The stacked [F, ...] field builder ≡ per-frequency build_field_3d,
    the HBM budget guard raises, and frequency chunking in
    synthesize_oblique_ionogram_3d reproduces the all-at-once result
    (padded last chunk). Since the one-launch sweep fan, rays of every
    frequency share one batched program, so different chunk sizes mean
    different batch shapes — XLA may tile/fuse the [R, n_steps]
    kernels differently, which shows up as ulp-level (≤1e-15 rel)
    drift; the check is correspondingly a tight allclose, with the NaN
    (above-MUF) pattern still required identical."""
    from pyrayhf_tpu.trace3d import build_field_3d_batch

    alt = np.linspace(80.0, 500.0, 85)
    den = 4e11 * np.exp(-(alt - 300.0) ** 2 / (2 * 50.0 ** 2))
    lat = np.linspace(20.0, 55.0, 9)
    lon = np.linspace(-90.0, -50.0, 9)
    shape = (alt.size, lat.size, lon.size)
    U = lambda v: np.broadcast_to(v[:, None, None], shape)
    vol = (U(den), U(np.full(alt.size, 3e-5)), U(np.full(alt.size, 70.0)))
    f0s = np.array([5e6, 7e6])
    fb = build_field_3d_batch(alt, lat, lon, *vol, f0s)
    for i, f0 in enumerate(f0s):
        f1 = build_field_3d(alt, lat, lon, *vol, float(f0))
        for k in ("mu", "mup", "kappa", "dmu_dalt", "dmu_dlat",
                  "dmu_dlon"):
            a, b = np.asarray(fb[k][i]), np.asarray(f1[k])
            assert np.array_equal(np.isnan(a), np.isnan(b)), k
            m = np.isfinite(b)
            # jit (batch) vs eager (single) differ by FMA contraction;
            # the horizontal gradients of this uniform field are ~1e-15
            # cancellation noise, hence the absolute floor
            np.testing.assert_allclose(a[m], b[m], rtol=1e-9, atol=1e-12)
    with pytest.raises(ValueError, match="chunk the"):
        build_field_3d_batch(alt, lat, lon, *vol, f0s,
                             hbm_budget_bytes=1024)

    from pyrayhf_tpu.trace3d import synthesize_oblique_ionogram_3d
    kw = dict(n_elev=24, n_az=3, az_span_deg=3.0, step_km=8.0,
              s_max_km=2400.0)
    f3 = np.array([5e6, 7e6, 20e6])
    o3 = synthesize_oblique_ionogram_3d(
        f3, 36.0, -72.0, 30.0, -72.0, alt, lat, lon, *vol, **kw)
    o3c = synthesize_oblique_ionogram_3d(
        f3, 36.0, -72.0, 30.0, -72.0, alt, lat, lon, *vol,
        freq_chunk=2, **kw)
    for k in o3:
        a, b = np.asarray(o3[k]), np.asarray(o3c[k])
        assert np.array_equal(np.isnan(a), np.isnan(b)), k
        m = np.isfinite(a)
        np.testing.assert_allclose(a[m], b[m], rtol=1e-12, err_msg=k)


def test_adaptive_3d_matches_fixed_step(uniform_field):
    """The DP5(4) adaptive 3-D integration agrees with fine fixed-step
    RK4 on range/path (<0.3%) and reports the same landing."""
    field, _ = uniform_field
    fx = trace_ray_3d(field, 30.0, -75.0, 35.0, 20.0, step_km=1.0)
    ad = trace_ray_3d(field, 30.0, -75.0, 35.0, 20.0, step_km=5.0,
                      rtol=1e-7, atol=1e-9, max_step_km=10.0)
    assert fx["status"] == "ground" and ad["status"] == "ground"
    for k in ("ground_range_km", "group_path_km", "group_delay_sec"):
        assert abs(float(ad[k]) / float(fx[k]) - 1.0) < 3e-3, k
    assert abs(float(ad["cross_track_km"])) < 1e-6
