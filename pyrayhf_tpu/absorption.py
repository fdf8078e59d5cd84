"""HF collisional absorption (D/E-region): coefficients and integrals.

Capability beyond the reference: PyRayHF traces lossless rays — its group
delays ignore the electron–neutral collisions that attenuate every real HF
link (the reference has no collision frequency anywhere; see the lossless
Appleton–Hartree form at ``/root/reference/PyRayHF/library.py:161-256``).
This module adds the standard quasi-longitudinal (QL) absorption model on
top of the same μ fields the tracers already evaluate:

    κ [Np/m] = ωp²·ν / (2·c·μ·((ω ± ωL)² + ν²))       (+ O-mode, − X-mode)

with ωp² = (2π·CP)²·Ne the plasma frequency, ωL = 2π·G_P·B·|cos ψ| the
longitudinal gyrofrequency component, and ν the effective electron–neutral
collision frequency (Davies, *Ionospheric Radio*, eq. 7.20; Budden,
*The Propagation of Radio Waves*, §13). The X-mode denominator (ω − ωL)²
is smaller, so the extraordinary wave is absorbed more — the familiar
asymmetry of ionograms.

Everything is expressed through the package's own constants (``CP``,
``G_P``), is branch-free jnp, and is differentiable — absorption can sit
inside retrieval loss functions.

Two integration modes:

* :func:`vertical_absorption_operator` — two-way vertical-incidence
  absorption L(f) [dB] on the same stretched reflection grid the forward
  operator uses (so the deviative 1/μ blow-up near reflection is resolved
  by the same fine-near-reflection sampling that makes vh accurate);
* per-path absorption in the oblique tracers — the Snell tracers integrate
  κ along the mirrored path exactly like the group delay (κ is one more
  per-layer channel), and the 2-D homing accumulates κ at path midpoints.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .constants import C_KM_S, CP, G_P
from .grid import regrid_core
from .magnetoionic import find_mu_mup, find_X, find_Y, mode_multiplier

__all__ = ["collision_frequency", "absorption_coefficient",
           "vertical_absorption_operator"]

# Np → dB
_DB_PER_NP = 8.685889638065037

# Exponential effective-collision-frequency model defaults:
#   ν(h) = NU0 · exp(−h/H)  with  NU0 = 1.86e11 s⁻¹,  H = 1/0.15 km.
# This is the classic single-exponential fit to mid-latitude D/E-region
# effective collision frequencies (ν ≈ 5e6 s⁻¹ at 70 km, 2.5e5 at 90 km,
# 5.7e4 at 100 km — e.g. Davies 1990, fig. 3.8). The profile follows the
# neutral-density scale height, hence one exponential across D and E.
_NU0_DEFAULT = 1.86e11
_H_DEFAULT = 1.0 / 0.15


def collision_frequency(alt_km, nu0=_NU0_DEFAULT, scale_km=_H_DEFAULT):
    """Effective electron–neutral collision frequency ν(h) [s⁻¹].

    Single-exponential model ``nu0 · exp(−alt/scale_km)`` (see module
    docstring for provenance and defaults). Pass a custom (``nu0``,
    ``scale_km``) — or bypass this function entirely and hand any ν array
    to the integrators — for event conditions (PCA, flares).
    """
    alt_km = jnp.asarray(alt_km, dtype=float)
    return nu0 * jnp.exp(-alt_km / scale_km)


def absorption_coefficient(ne_m3, nu_hz, f_hz, babs_t, bpsi_deg, mu,
                           mode="O"):
    """QL absorption coefficient κ [dB/km] (Davies eq. 7.20).

    ``mu`` is the real phase refractive index along the path (from
    :func:`pyrayhf_tpu.magnetoionic.find_mu_mup`); κ therefore includes
    both the non-deviative (μ≈1, ν-dominated) and deviative (μ→0 near
    reflection) regimes. NaN μ (evanescent) propagates to NaN κ.
    """
    mm = mode_multiplier(mode)
    ne_m3 = jnp.asarray(ne_m3, dtype=float)
    nu_hz = jnp.asarray(nu_hz, dtype=float)
    omega = 2.0 * jnp.pi * jnp.asarray(f_hz, dtype=float)
    omega_p2 = (2.0 * jnp.pi * CP) ** 2 * ne_m3
    psi = jnp.deg2rad(jnp.asarray(bpsi_deg, dtype=float))
    omega_l = 2.0 * jnp.pi * G_P * jnp.asarray(babs_t, dtype=float) \
        * jnp.abs(jnp.cos(psi))
    c_m_s = C_KM_S * 1e3
    mu = jnp.asarray(mu, dtype=float)
    mu_s = jnp.where(mu > 0.0, mu, jnp.nan)
    kappa_np_m = omega_p2 * nu_hz / (
        2.0 * c_m_s * mu_s * ((omega + mm * omega_l) ** 2 + nu_hz ** 2))
    return kappa_np_m * 1e3 * _DB_PER_NP


@partial(jax.jit, static_argnames=("mode_mult", "n_points"))
def _vert_abs_core(freq_mhz, den, bmag, bpsi, alt, nu, mode_mult, n_points):
    freq_hz = jnp.asarray(freq_mhz, dtype=float) * 1e6
    rg = regrid_core(freq_hz, den, bmag, bpsi, alt,
                     mode_mult=mode_mult, n_points=n_points)
    aX = find_X(rg["den"], rg["freq"])
    aY = find_Y(rg["freq"], rg["bmag"])
    mode = "O" if mode_mult > 0 else "X"
    mu, _ = find_mu_mup(aX, aY, rg["bpsi"], mode)
    # ν resampled onto the per-frequency reflection grid (ν is smooth on
    # the log scale, so linear interp of ν itself on the fine stretched
    # grid is plenty; the grid is fine exactly where κ varies fastest)
    nu_rg = jax.vmap(lambda a: jnp.interp(a, alt, nu))(rg["alt"])
    kappa = absorption_coefficient(rg["den"], nu_rg, rg["freq"],
                                   rg["bmag"], rg["bpsi"], mu, mode)
    one_way = jnp.nansum(jnp.where(jnp.isfinite(kappa),
                                   kappa * rg["dist"], 0.0), axis=1)
    # escaped rays (all-NaN μ row) → NaN, matching find_vh semantics
    valid = jnp.any(jnp.isfinite(kappa) & (rg["dist"] > 0.0), axis=1)
    return jnp.where(valid, 2.0 * one_way, jnp.nan)


def vertical_absorption_operator(freq_MHz, den, bmag, bpsi, alt, mode="O",
                                 n_points=2000, nu=None):
    """Two-way vertical-incidence absorption L(f) [dB] per frequency.

    Same signature family as
    :func:`pyrayhf_tpu.forward.vertical_forward_operator` (ref API at
    ``library.py:459-509``), same per-frequency stretched reflection grid
    (:func:`pyrayhf_tpu.grid.regrid_core`) — the integrand κ ∝ 1/μ is
    singular at reflection exactly like μ′, and the grid's fine-near-
    reflection stretching resolves the (integrable) deviative peak.

    ``nu``: optional ν [s⁻¹] on ``alt`` (defaults to
    :func:`collision_frequency`). Returns [N_freq] dB; NaN above foF2
    (escaped rays), matching the forward operator's NaN semantics.
    """
    alt = jnp.asarray(alt, dtype=float)
    nu = collision_frequency(alt) if nu is None else jnp.asarray(
        nu, dtype=float)
    return _vert_abs_core(jnp.asarray(freq_MHz, dtype=float),
                          jnp.asarray(den, dtype=float),
                          jnp.asarray(bmag, dtype=float),
                          jnp.asarray(bpsi, dtype=float),
                          alt, nu, mode_mult=mode_multiplier(mode),
                          n_points=n_points)
