"""MUF transmission-curve scaling and Fresnel ground reflection."""

import numpy as np
import pytest

import pyrayhf_tpu as prt
from pyrayhf_tpu.ground import (GROUND_PRESETS, fresnel_coefficients,
                                ground_reflection_loss_db)
from pyrayhf_tpu.muf import (muf_from_profile, muf_from_vertical_ionogram,
                             vertical_to_oblique)


@pytest.fixture(scope="module")
def day(day_profile):
    d = day_profile
    return d["alt"], d["den"], d["bmag"], d["bpsi"]


# ---------------------------------------------------------------- ground

def test_fresnel_limits():
    """|R| → 1 at grazing incidence and in the perfect-conductor limit,
    for every preset."""
    f = 10e6
    for name in GROUND_PRESETS:
        # loss ∝ ψ near grazing; 0.001° is deep in the limit
        assert float(ground_reflection_loss_db(f, 0.001, name)) < 0.02
    assert float(ground_reflection_loss_db(f, 45.0, (15.0, 1e6))) < 0.01


def test_fresnel_split_real_matches_numpy_complex():
    """The split-real device path (the TPU backend has no complex dtype)
    reproduces NumPy's native complex Fresnel algebra to f64 precision,
    across presets, frequencies and the full grazing-angle range —
    including the σ→0 branch-cut edge of the complex sqrt."""
    eps0 = 8.8541878128e-12
    psis = np.linspace(0.01, 89.99, 337)
    for eps_r, sigma in list(GROUND_PRESETS.values()) + [(3.0, 0.0)]:
        for f in (2e6, 10e6, 30e6):
            eps_c = eps_r - 1j * sigma / (2 * np.pi * f * eps0)
            s = np.sin(np.deg2rad(psis))
            root = np.sqrt(eps_c - np.cos(np.deg2rad(psis)) ** 2)
            rh = (s - root) / (s + root)
            rv = (eps_c * s - root) / (eps_c * s + root)
            r_v, r_h = fresnel_coefficients(f, psis, eps_r, sigma)
            np.testing.assert_allclose(np.asarray(r_v), rv,
                                       rtol=1e-12, atol=1e-14)
            np.testing.assert_allclose(np.asarray(r_h), rh,
                                       rtol=1e-12, atol=1e-14)


def test_fresnel_pseudo_brewster():
    """Vertical-pol |R| has its minimum at ψ_B = atan(1/√ε_r) for a
    low-loss ground (σ → 0)."""
    eps_r = 3.0
    psis = np.linspace(1.0, 89.0, 881)
    loss = np.asarray(ground_reflection_loss_db(
        10e6, psis, (eps_r, 1e-7), polarization="vertical"))
    got = psis[np.argmax(loss)]
    expect = np.degrees(np.arctan(1.0 / np.sqrt(eps_r)))
    assert abs(got - expect) < 0.5


def test_fresnel_ordering_and_pol():
    """Sea is the best reflector; circular is the mean power of h and v."""
    f, psi = 10e6, 20.0
    losses = {g: float(ground_reflection_loss_db(f, psi, g))
              for g in GROUND_PRESETS}
    assert losses["sea"] < losses["wet"] < losses["medium"]
    r_v, r_h = fresnel_coefficients(f, psi, *GROUND_PRESETS["medium"])
    pc = 0.5 * (abs(r_v) ** 2 + abs(r_h) ** 2)
    np.testing.assert_allclose(
        float(ground_reflection_loss_db(f, psi, "medium")),
        -10 * np.log10(pc), rtol=1e-12)
    # |R| ≤ 1 everywhere (passive surface)
    assert (np.asarray(ground_reflection_loss_db(
        f, np.linspace(0.5, 89.5, 90), "dry")) >= 0).all()


def test_multihop_ground_loss_in_link(day):
    """ground= adds exactly (n_hops−1)·Fresnel(f, elev) to the link loss
    and nothing else; ground=None keeps the 0 dB perfect reflector."""
    alt, den, bmag, bpsi = day
    f0s = np.arange(6e6, 12e6, 2e6)
    kw = dict(geometry="cartesian", n_elev=181, n_hops=2)
    o0 = prt.synthesize_oblique_ionogram(f0s, 2000.0, alt, den, bmag, bpsi,
                                         **kw)
    o1 = prt.synthesize_oblique_ionogram(f0s, 2000.0, alt, den, bmag, bpsi,
                                         ground="medium", **kw)
    m = np.isfinite(np.asarray(o0["delay_low_sec"]))
    assert m.any()
    gl0 = np.asarray(o0["ground_loss_low_db"])
    gl1 = np.asarray(o1["ground_loss_low_db"])
    assert (gl0[m] == 0).all()
    expect = np.asarray(ground_reflection_loss_db(
        f0s, np.asarray(o1["elev_low_deg"]), "medium"))
    np.testing.assert_allclose(gl1[m], expect[m], rtol=1e-10)
    # link loss differs by exactly the ground loss
    d = np.asarray(o1["link_loss_low_db"]) - np.asarray(o0["link_loss_low_db"])
    np.testing.assert_allclose(d[m], gl1[m], rtol=1e-10)
    # NaN structure preserved
    assert np.isnan(gl1[~m]).all()


# ------------------------------------------------------------------- muf

def test_vertical_to_oblique_roundtrip():
    """Exact inverse of the reference's oblique_to_vertical."""
    rng = np.random.default_rng(0)
    fv = rng.uniform(2, 12, 32)
    hv = rng.uniform(90, 450, 32)
    D = 1800.0
    fo, p = vertical_to_oblique(fv, hv, D)
    fv2, hv2 = prt.oblique_to_vertical(D, np.asarray(p), np.asarray(fo))
    np.testing.assert_allclose(np.asarray(fv2), fv, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(hv2), hv, rtol=1e-12)
    # NaN propagates (escaped vertical echo)
    fo_n, _ = vertical_to_oblique(np.nan, 300.0, D)
    assert np.isnan(float(fo_n))


def test_muf_monotone_in_distance(day):
    """MUF(D) grows with link distance (larger secant) and exceeds the
    critical frequency."""
    alt, den, bmag, bpsi = day
    D = np.array([500.0, 1000.0, 2000.0, 3000.0])
    muf = np.asarray(muf_from_profile(D, den, bmag, bpsi, alt))
    assert np.isfinite(muf).all()
    assert (np.diff(muf) > 0).all()
    foF2 = prt.den2freq(den.max()) / 1e6
    assert (muf > foF2).all()
    assert muf[0] < 2.0 * foF2          # short link: modest secant


def test_muf_matches_ray_traced_link(day):
    """Transmission-curve MUF agrees with the full ray-traced link MUF
    (homing fan) within the classical secant-law accuracy (~5%)."""
    alt, den, bmag, bpsi = day
    D = 2000.0
    muf = float(muf_from_profile(D, den, bmag, bpsi, alt))
    f0s = np.arange(10e6, 40e6, 0.5e6)
    o = prt.synthesize_oblique_ionogram(f0s, D, alt, den, bmag, bpsi,
                                        geometry="spherical", n_elev=256)
    dl = np.asarray(o["delay_low_sec"])
    assert np.isfinite(dl).any()
    link = f0s[np.isfinite(dl)].max() / 1e6
    assert abs(muf / link - 1.0) < 0.05, (muf, link)


def test_muf_map_matches_single(day):
    """Batched MUF map equals per-profile muf_from_profile rows."""
    from pyrayhf_tpu.muf import muf_map

    alt, den, bmag, bpsi = day
    scale = np.array([0.8, 1.0, 1.2])
    den_b = scale[:, None] * den[None, :]
    bmag_b = np.broadcast_to(bmag, (3, alt.size))
    bpsi_b = np.broadcast_to(bpsi, (3, alt.size))
    D = np.array([1000.0, 3000.0])
    m = np.asarray(muf_map(D, den_b, bmag_b, bpsi_b, alt))
    assert m.shape == (2, 3)
    for i, d in enumerate(D):
        for j in range(3):
            single = float(muf_from_profile(d, den_b[j], bmag_b[j],
                                            bpsi_b[j], alt))
            np.testing.assert_allclose(m[i, j], single, rtol=1e-10)
    # denser ionosphere -> higher MUF at fixed D
    assert (np.diff(m, axis=1) > 0).all()
