"""Property-based parity: random profiles vs the LIVE reference oracle.

The fixed goldens pin a handful of workloads; this suite generates random
ionospheric profiles (layered Chapman-like shapes, E-valleys, random
magnetic fields, uniform and non-uniform altitude grids) and compares our
operator against the reference implementation EXECUTED in-process (same
import-stub harness as tools/gen_reference_goldens.py — behavioral oracle
use, no code copied). Skipped when /root/reference is not mounted.
"""

import pathlib
import sys

import numpy as np
import pytest

from pyrayhf_tpu.forward import vertical_forward_operator
from pyrayhf_tpu.magnetoionic import find_mu_mup
from pyrayhf_tpu.pallas_vh import ionogram_fast_xla

import jax.numpy as jnp

_REF = pathlib.Path("/root/reference/PyRayHF/library.py")


@pytest.fixture(scope="module")
def oracle():
    if not _REF.exists():
        pytest.skip("reference implementation not mounted")
    sys.path.insert(0, str(pathlib.Path(__file__).resolve()
                           .parents[1] / "tools"))
    from gen_reference_goldens import _load_reference
    return _load_reference()


def _random_profile(rng, n_alt, nonuniform=False):
    if nonuniform:
        alt = np.sort(rng.uniform(80.0, 700.0, n_alt))
        alt[0], alt[-1] = 80.0, 700.0
        # enforce strictly increasing
        alt = np.maximum.accumulate(alt + np.arange(n_alt) * 1e-6)
    else:
        alt = np.linspace(80.0, 700.0, n_alt)
    hmF2 = rng.uniform(220.0, 400.0)
    nmF2 = rng.uniform(2e11, 4e12)
    wF2 = rng.uniform(30.0, 90.0)
    den = nmF2 * np.exp(-(alt - hmF2) ** 2 / (2 * wF2 ** 2))
    if rng.random() < 0.6:                       # E layer + valley
        nmE = nmF2 * rng.uniform(0.02, 0.4)
        den = den + nmE * np.exp(-(alt - rng.uniform(95.0, 120.0)) ** 2
                                 / (2 * rng.uniform(4.0, 12.0) ** 2))
    if rng.random() < 0.3:                       # F1 ledge
        den = den + nmF2 * rng.uniform(0.1, 0.5) * np.exp(
            -(alt - rng.uniform(160.0, 210.0)) ** 2
            / (2 * rng.uniform(15.0, 40.0) ** 2))
    bmag = rng.uniform(2e-5, 6e-5) * (1.0 - 0.3 * (alt - 80.0) / 620.0)
    bpsi = np.full_like(alt, rng.uniform(5.0, 85.0))
    return alt, den, bmag, bpsi


def test_forward_operator_random_profiles_vs_oracle(oracle):
    """20 random profiles × O/X × n_points {50, 200}: NaN patterns equal;
    X-mode within 1e-6 km; O-mode within the reference's own documented
    near-reflection rounding (≤ 0.05 km, typically ≤ 5e-3)."""
    rng = np.random.default_rng(2026)
    freqs = np.arange(0.5, 16.01, 0.5)
    for trial in range(20):
        n_alt = int(rng.integers(150, 620))
        alt, den, bmag, bpsi = _random_profile(
            rng, n_alt, nonuniform=(trial % 4 == 3))
        mode = "O" if trial % 2 == 0 else "X"
        npts = 50 if trial % 3 == 0 else 200
        ref = oracle.vertical_forward_operator(freqs, den, bmag, bpsi, alt,
                                               mode, npts)
        ours = np.asarray(vertical_forward_operator(
            freqs, den, bmag, bpsi, alt, mode=mode, n_points=npts))
        assert np.array_equal(np.isnan(ours), np.isnan(ref)), \
            (trial, mode, npts)
        m = np.isfinite(ref)
        if not m.any():
            continue
        d = np.abs(ours[m] - ref[m]).max()
        tol = 1e-6 if mode == "X" else 0.05
        assert d < tol, (trial, mode, npts, d)

        # the fast sweep engine agrees with the parity operator
        if alt.ndim == 1 and trial % 5 == 0:
            fast = np.asarray(ionogram_fast_xla(
                jnp.asarray(freqs), jnp.asarray(den)[None, :],
                jnp.asarray(bmag)[None, :], jnp.asarray(bpsi)[None, :],
                jnp.asarray(alt),
                mode_mult=1.0 if mode == "O" else -1.0,
                n_points=npts))[0]
            assert np.array_equal(np.isnan(fast), np.isnan(ref)), trial
            assert np.abs(fast[m] - ref[m]).max() < max(tol, 1e-5), trial


def test_mu_mup_random_lattice_vs_oracle(oracle):
    """Random (X, Y, ψ) points incl. near-cutoff: both modes, both
    arithmetic settings, vs the live reference."""
    rng = np.random.default_rng(7)
    X = np.concatenate([rng.uniform(0.0, 1.5, 400),
                        1.0 - 10.0 ** rng.uniform(-12, -1, 200),
                        rng.uniform(0.0, 0.1, 100)])
    Y = np.concatenate([rng.uniform(0.0, 0.9, 500),
                        rng.uniform(0, 1e-13, 200)])
    psi = rng.uniform(0.0, 90.0, 700)
    # NumPy and XLA evaluate the SAME expression sequence with different
    # ulp-level rounding (FMA contraction); the O-mode denominator
    # amplifies that by ~eps/(1-X)^2, so the attainable agreement is a
    # per-sample bound, not a uniform rtol: below 1-X ~ 1e-9 even the
    # sign is noise (NaN-vs-tiny-mu — excluded, like the golden lattice
    # test's X==1 artifacts); above it the bound decays quadratically to
    # the 1e-9/1e-8 floors.
    xm1 = np.abs(1.0 - X)
    deep = xm1 < 1e-9
    xm1_safe = np.maximum(xm1, 1e-30)
    tol_mu = 1e-9 + 1e-15 / xm1_safe ** 2
    tol_mup = 1e-8 + 1e-14 / xm1_safe ** 2
    for mode in "OX":
        mu_r, mup_r = oracle.find_mu_mup(X.copy(), Y.copy(), psi.copy(),
                                         mode)
        mu_o, mup_o = find_mu_mup(X, Y, psi, mode,
                                  arithmetic="reference")
        mu_o, mup_o = np.asarray(mu_o), np.asarray(mup_o)
        assert np.array_equal(np.isnan(mu_o)[~deep],
                              np.isnan(mu_r)[~deep]), mode
        m = np.isfinite(mu_r) & np.isfinite(mu_o) & ~deep
        rel = np.abs(mu_o[m] / mu_r[m] - 1.0)
        assert np.all(rel < tol_mu[m]), (mode, rel.max())
        m2 = np.isfinite(mup_r) & np.isfinite(mup_o) & ~deep
        rel2 = np.abs(mup_o[m2] / mup_r[m2] - 1.0)
        assert np.all(rel2 < tol_mup[m2]), (mode, rel2.max())
        # the bulk of the lattice is bit-tight
        assert np.median(rel) < 1e-12, mode
        assert np.median(rel2) < 1e-11, mode


def test_snell_tracer_random_rays_vs_oracle(oracle):
    """Random profiles × random (freq, elevation) rays vs the live
    reference Snell tracers (both geometries)."""
    from pyrayhf_tpu.snell import (trace_ray_cartesian_snells,
                                   trace_ray_spherical_snells)
    rng = np.random.default_rng(99)
    keys = ["group_path_km", "group_delay_sec", "ground_range_km"]
    for trial in range(8):
        alt, den, bmag, bpsi = _random_profile(rng, 300)
        f0 = float(rng.uniform(3e6, 14e6))
        el = float(rng.uniform(15.0, 75.0))
        mode = "O" if trial % 2 == 0 else "X"
        for tag, ours_fn, ref_fn, tol in (
                ("cart", trace_ray_cartesian_snells,
                 oracle.trace_ray_cartesian_snells, 1e-8),
                ("sph", trace_ray_spherical_snells,
                 oracle.trace_ray_spherical_snells, 5e-3)):
            rr = ref_fn(f0, el, alt, den, bmag, bpsi, mode)
            ro = ours_fn(f0, el, alt, den, bmag, bpsi, mode)
            for k in keys:
                vr, vo = float(rr[k]), float(ro[k])
                if np.isnan(vr):
                    assert np.isnan(vo), (trial, tag, mode, k)
                    continue
                assert np.isfinite(vo), (trial, tag, mode, k)
                rel = abs(vo - vr) / max(abs(vr), 1e-12)
                assert rel < tol, (trial, tag, mode, k, vr, vo)


def test_random_profiles_new_observable_invariants():
    """Physics invariants of the round-3 observables hold on random
    profiles: phase ≤ geometric ≤ group path on every valid Snell ray;
    h_p ≤ h' per finite echo; Faraday > 0 above penetration and
    falls with frequency; MUF(D) monotone in D and ≥ foF2."""
    import pyrayhf_tpu as prt
    from pyrayhf_tpu.constants import C_KM_S
    from pyrayhf_tpu.muf import muf_from_profile

    rng = np.random.default_rng(7)
    for trial in range(6):
        alt, den, bmag, bpsi = _random_profile(rng, 240)
        foF2 = float(prt.den2freq(den.max())) / 1e6

        # Snell path ordering on a small random fan
        f0s = rng.uniform(0.35, 0.9, 2) * foF2 * 1e6
        els = rng.uniform(15.0, 65.0, 3)
        o = prt.trace_rays_cartesian_snells(f0s, els, alt, den, bmag,
                                            bpsi, "O")
        pp = np.asarray(o["phase_path_km"])
        gp = np.asarray(o["group_path_km"])
        gd = np.asarray(o["group_delay_sec"]) * C_KM_S
        m = np.isfinite(pp)
        assert (pp[m] <= gp[m] + 1e-9).all(), trial
        assert (gp[m] <= gd[m] + 1e-9).all(), trial

        # phase height ≤ virtual height
        freqs = np.arange(1.0, foF2 * 1.2, 0.5)
        vh = np.asarray(prt.vertical_forward_operator(freqs, den, bmag,
                                                      bpsi, alt))
        hp = np.asarray(prt.vertical_phase_operator(freqs, den, bmag,
                                                    bpsi, alt))
        mm = np.isfinite(vh) & np.isfinite(hp)
        assert (hp[mm] <= vh[mm] + 1e-9).all(), trial

        # Faraday positive above penetration, decreasing with f
        ff = np.array([3.0, 6.0]) * foF2 * 1e6
        om = np.asarray(prt.faraday_rotation_vertical(ff, den, bmag,
                                                      bpsi, alt))
        assert np.isfinite(om).all() and (om > 0).all(), trial
        assert om[0] > om[1], trial

        # MUF monotone and above foF2
        D = np.array([800.0, 2000.0, 3200.0])
        muf = np.asarray(muf_from_profile(D, den, bmag, bpsi, alt))
        assert np.isfinite(muf).all(), trial
        assert (np.diff(muf) > 0).all(), trial
        assert (muf > foF2 * 0.999).all(), trial
