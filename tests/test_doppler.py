"""Vertical-incidence Doppler sounding (pyrayhf_tpu.doppler).

A capability beyond the reference (PyRayHF has no Doppler product;
`/root/reference/PyRayHF/library.py` never differentiates in time), built on
the differentiable phase-height operator. Validation strategy:

1. analytic moving-mirror limit: a sharp reflector at height h moving with
   velocity v gives f_D = -2 f v / c exactly;
2. exactness of the jvp against central finite differences of the masked
   phase operator on a realistic profile (the jvp IS the derivative of the
   discretised program, so agreement is to quadrature-noise level);
3. physical structure on the reference day profile: uniform uplift =>
   negative Doppler at every reflected frequency, escaped rows NaN;
4. masked operator == parity phase operator where valid.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

import pyrayhf_tpu as prt
from pyrayhf_tpu.constants import C_KM_S
from pyrayhf_tpu.doppler import doppler_shift_vertical, phase_height_and_mask


def _mirror_profile(h_mirror, n=600):
    """Vacuum below a sharp overdense layer topping out above h_mirror."""
    alt = np.linspace(80.0, 700.0, n)
    width = 8.0
    den = 4e12 / (1.0 + np.exp(-(alt - h_mirror) / width))
    den = np.maximum(den, 1.0)
    bmag = np.full(n, 1e-16)        # unmagnetized branch
    bpsi = np.full(n, 0.0)
    return alt, den, bmag, bpsi


def test_moving_mirror_doppler():
    """f_D = -2 f v / c for a rigidly uplifting sharp layer.

    d(den)/dt of a profile translating upward at v km/s is
    -v * d(den)/dh; the phase height below a steep unmagnetized layer
    tracks the layer, so dh_p/dt = v and f_D = -2 f v / c.
    """
    h0 = 300.0
    v = 0.05                                   # km/s uplift
    alt, den, bmag, bpsi = _mirror_profile(h0)
    # profile moving UP: den(h, t) = den0(h - v t) => d/dt = -v * d(den0)/dh
    dden_dt = -v * np.gradient(den, alt)

    freqs = np.array([2.0, 4.0, 8.0])          # all well below foF2 ~ 18 MHz
    out = doppler_shift_vertical(freqs, den, dden_dt, bmag, bpsi, alt,
                                 mode="O", n_points=400)
    fd = np.asarray(out["doppler_hz"])
    expected = -2.0 * freqs * 1e6 * v / C_KM_S
    # the mirror is not infinitely sharp and the wave penetrates to X=1, so
    # allow a few percent; the sign and scaling must be exact
    assert np.all(np.isfinite(fd))
    assert_allclose(fd, expected, rtol=5e-2)
    # the phase-height rate itself is the uplift velocity
    assert_allclose(np.asarray(out["dhp_dt_km_s"]), v, rtol=5e-2)


def test_jvp_matches_finite_difference(day_profile):
    """The jvp is the exact derivative of the discretised operator."""
    alt = np.asarray(day_profile["alt"], dtype=float)
    den = np.asarray(day_profile["den"], dtype=float)
    bmag = np.asarray(day_profile["bmag"], dtype=float)
    bpsi = np.asarray(day_profile["bpsi"], dtype=float)
    # smooth relative perturbation (a TID-like tendency)
    dden_dt = den * 1e-3 * np.sin(2 * np.pi * (alt - alt[0]) / 150.0)

    freqs = np.array([3.0, 5.0, 7.0])
    out = doppler_shift_vertical(freqs, den, dden_dt, bmag, bpsi, alt,
                                 mode="O", n_points=300)
    eps = 1e-3
    hp_p, v_p = phase_height_and_mask(freqs, den + eps * dden_dt, bmag, bpsi,
                                      alt, mode_mult=1.0, n_points=300)
    hp_m, v_m = phase_height_and_mask(freqs, den - eps * dden_dt, bmag, bpsi,
                                      alt, mode_mult=1.0, n_points=300)
    fd_fd = np.asarray(-(2.0 * freqs * 1e6 / C_KM_S)
                       * (hp_p - hp_m) / (2 * eps))
    ok = np.asarray(v_p & v_m)
    fd = np.asarray(out["doppler_hz"])
    assert ok.all()
    assert_allclose(fd, fd_fd, rtol=2e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["O", "X"])
def test_uplift_gives_negative_doppler(day_profile, mode):
    """Uniform uplift: every reflected frequency red-shifts (f_D < 0)."""
    alt = np.asarray(day_profile["alt"], dtype=float)
    den = np.asarray(day_profile["den"], dtype=float)
    bmag = np.asarray(day_profile["bmag"], dtype=float)
    bpsi = np.asarray(day_profile["bpsi"], dtype=float)
    v = 0.02
    dden_dt = -v * np.gradient(den, alt)

    freqs = np.arange(2.0, 16.0, 0.5)
    out = doppler_shift_vertical(freqs, den, dden_dt, bmag, bpsi, alt,
                                 mode=mode)
    fd = np.asarray(out["doppler_hz"])
    reflected = np.isfinite(fd)
    assert reflected.sum() >= 10          # most of the sweep reflects
    assert np.all(fd[reflected] < 0.0)
    # escaped rows (above the critical frequency) must be NaN, like the
    # parity operators' escape semantics
    hi = doppler_shift_vertical(np.array([30.0]), den, dden_dt, bmag, bpsi,
                                alt, mode=mode)
    assert np.isnan(np.asarray(hi["doppler_hz"])).all()


def test_masked_phase_equals_parity_operator(day_profile):
    alt = np.asarray(day_profile["alt"], dtype=float)
    den = np.asarray(day_profile["den"], dtype=float)
    bmag = np.asarray(day_profile["bmag"], dtype=float)
    bpsi = np.asarray(day_profile["bpsi"], dtype=float)
    freqs = np.arange(1.0, 17.0, 1.0)
    hp_parity = np.asarray(prt.vertical_phase_operator(
        freqs, den, bmag, bpsi, alt, mode="O", n_points=200))
    hp_m, valid = phase_height_and_mask(freqs, den, bmag, bpsi, alt,
                                        mode_mult=1.0, n_points=200)
    hp_m, valid = np.asarray(hp_m), np.asarray(valid)
    assert_allclose(hp_m[valid], hp_parity[valid], rtol=1e-10)
    assert np.isnan(hp_parity[~valid]).all()


def test_doppler_is_vmappable(day_profile):
    """Batched Doppler over a profile stack — one fused program."""
    alt = np.asarray(day_profile["alt"], dtype=float)
    den = np.asarray(day_profile["den"], dtype=float)
    bmag = np.asarray(day_profile["bmag"], dtype=float)
    bpsi = np.asarray(day_profile["bpsi"], dtype=float)
    scales = jnp.array([0.8, 1.0, 1.2])
    dens = scales[:, None] * den[None, :]
    v = 0.03
    ddens = jnp.stack([-v * jnp.gradient(d, alt[1] - alt[0]) for d in dens])
    freqs = jnp.arange(2.0, 10.0, 1.0)

    def one(d, dd):
        return doppler_shift_vertical(freqs, d, dd, bmag, bpsi, alt,
                                      mode="O")["doppler_hz"]

    batched = jax.vmap(one)(dens, ddens)
    single = one(dens[1], ddens[1])
    assert_allclose(np.asarray(batched[1]), np.asarray(single), rtol=1e-12)
