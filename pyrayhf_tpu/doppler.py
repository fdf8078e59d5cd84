"""Vertical-incidence HF Doppler sounding from the differentiable phase operator.

A time-varying ionosphere shifts the frequency of a vertically reflected
sounding wave by

    f_D = -(f / c) * dP/dt,      P = 2 * integral mu dh   (round-trip phase path)

so the Doppler shift is exactly the time derivative of the (one-way) phase
height h_p(f) produced by :func:`pyrayhf_tpu.vertical_phase_operator`:

    f_D = -(2 f / c) * dh_p/dt.

The reference (PyRayHF, ``/root/reference/PyRayHF/library.py``) has no Doppler
product at all — this module exists *because* the TPU build's forward
operators are differentiable: given the electron-density tendency
``dden_dt`` (and optionally magnetic-field tendencies), ``jax.jvp`` through
the full regrid + Appleton-Hartree + quadrature pipeline yields the exact
Doppler shift of the discretised operator, including the motion of the
reflection height itself (the regrid's per-frequency critical-height solve is
part of the differentiated program). No finite-difference step size to tune,
no second forward pass.

All functions are jit/vmap-compatible; batch over profiles with ``jax.vmap``.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .constants import C_KM_S
from .grid import regrid_core
from .magnetoionic import find_X, find_Y, find_mu_mup_masked, mode_multiplier

__all__ = ["phase_height_and_mask", "doppler_shift_vertical"]


@partial(jax.jit, static_argnames=("mode_mult", "n_points"))
def phase_height_and_mask(freq_mhz, den, bmag, bpsi, alt,
                          mode_mult=1.0, n_points=200):
    """Gradient-safe phase-height operator: (h_p, valid), finite everywhere.

    The masked companion to :func:`pyrayhf_tpu.vertical_phase_operator`
    (exactly as :func:`pyrayhf_tpu.forward.vh_and_mask` is to
    ``vertical_forward_operator``): escaped rays carry ``valid=False`` and a
    finite placeholder h_p = min(alt), so ``jax.jvp``/``jax.grad`` through any
    ``jnp.where(valid, ...)`` selection is finite. Where ``valid``, h_p equals
    the parity operator's phase height.
    """
    freq_hz = jnp.asarray(freq_mhz, dtype=float) * 1e6
    rg = regrid_core(freq_hz, den, bmag, bpsi, alt,
                     mode_mult=mode_mult, n_points=n_points, masked=True)
    aX = find_X(rg["den"], rg["freq"])
    aY = find_Y(rg["freq"], rg["bmag"])
    mode = "O" if mode_mult > 0 else "X"
    mu, _, pt_ok = find_mu_mup_masked(aX, aY, rg["bpsi"], mode)
    # mu -> 0 at the reflection height: bounded integrand, no ceiling needed
    # (contrast the mu' ceiling in forward.vh_and_mask)
    pt_ok = pt_ok & (mu >= 0.0)
    contrib = jnp.where(pt_ok, mu * rg["dist"], 0.0)
    ih = jnp.sum(contrib, axis=1)
    valid = rg["row_ok"] & (ih != 0.0)
    hp = jnp.where(valid, ih, 0.0) + jnp.min(alt)
    return hp, valid


@partial(jax.jit, static_argnames=("mode_mult", "n_points"))
def _doppler_core(freq_mhz, den, dden_dt, bmag, dbmag_dt, bpsi, dbpsi_dt, alt,
                  mode_mult, n_points):
    freq_mhz = jnp.asarray(freq_mhz, dtype=float)

    def hp_of_env(d, b, p):
        return phase_height_and_mask(freq_mhz, d, b, p, alt,
                                     mode_mult=mode_mult, n_points=n_points)

    (hp, valid), (dhp, _) = jax.jvp(
        hp_of_env,
        (jnp.asarray(den, dtype=float), jnp.asarray(bmag, dtype=float),
         jnp.asarray(bpsi, dtype=float)),
        (jnp.asarray(dden_dt, dtype=float), jnp.asarray(dbmag_dt, dtype=float),
         jnp.asarray(dbpsi_dt, dtype=float)))
    f_hz = freq_mhz * 1e6
    fd = -(2.0 * f_hz / C_KM_S) * dhp          # [Hz]; dhp in km/s
    nan = jnp.nan
    return (jnp.where(valid, fd, nan), jnp.where(valid, hp, nan),
            jnp.where(valid, dhp, nan))


def doppler_shift_vertical(freq, den, dden_dt, bmag, bpsi, alt, mode="O",
                           n_points=200, dbmag_dt=None, dbpsi_dt=None):
    """Vertical-incidence Doppler shift f_D(f) [Hz] of a sounding sweep.

    Parameters
    ----------
    freq : [N_freq] sounding frequencies [MHz]
    den, bmag, bpsi, alt : [N_alt] profile arrays (same convention as
        ``vertical_forward_operator``: electron density [m^-3], |B| [T],
        propagation-to-B angle [deg], altitude [km])
    dden_dt : [N_alt] electron-density tendency [m^-3 / s]
    mode : 'O' or 'X'
    dbmag_dt, dbpsi_dt : optional [N_alt] field tendencies (default 0; the
        geomagnetic field varies on timescales where these are negligible,
        but storm-time studies can supply them)

    Returns
    -------
    dict with keys
      ``doppler_hz``  [N_freq] f_D = -(2 f / c) * dh_p/dt; NaN for escaped rays
      ``phase_height_km`` [N_freq] h_p(f)
      ``dhp_dt_km_s`` [N_freq] the phase-height rate itself

    Notes
    -----
    For a sharp reflector at height h below which the medium is vacuum,
    h_p = h and f_D = -2 f v / c with v = dh/dt — the classical moving-mirror
    formula; ``tests/test_doppler.py`` pins this limit analytically.
    """
    den = jnp.asarray(den, dtype=float)
    z = jnp.zeros_like(den)
    fd, hp, dhp = _doppler_core(
        freq, den, dden_dt, bmag,
        z if dbmag_dt is None else dbmag_dt,
        bpsi, z if dbpsi_dt is None else dbpsi_dt, alt,
        mode_mult=mode_multiplier(mode), n_points=n_points)
    return {"doppler_hz": fd, "phase_height_km": hp, "dhp_dt_km_s": dhp}
