"""Ground electrical properties and Fresnel reflection (beyond the reference).

Multi-hop HF links lose power at every intermediate ground bounce; the
reference (and the round-3 ``n_hops`` tracers here) model the ground as a
perfect specular reflector. This module supplies the standard flat-ground
Fresnel reflection coefficients for a homogeneous lossy earth,

    ε_c = ε_r − j·σ/(ω ε₀)
    R_h = (sinψ − √(ε_c − cos²ψ)) / (sinψ + √(ε_c − cos²ψ))
    R_v = (ε_c·sinψ − √(ε_c − cos²ψ)) / (ε_c·sinψ + √(ε_c − cos²ψ))

with ψ the grazing angle, and converts them to a per-bounce loss in dB.
Skywave polarisation is quasi-circular after magnetoionic splitting, so
the default ``polarization="circular"`` uses the mean reflected *power*
of the two linear components — the convention of HF prediction methods
(ITU-R P.533-style). Presets follow the ITU-R P.527 ground classes.

The TPU backend has NO complex-number support (complex arrays cannot
even be materialised on device — measured round 4), so all complex
algebra here is carried in split real/imaginary arithmetic:
:func:`fresnel_coefficients_real` is the jittable, differentiable,
TPU-safe device path (returns the four real components), and
:func:`fresnel_coefficients` is a thin host-side convenience that
assembles NumPy complex arrays from it. The link-budget path
(:func:`ground_reflection_loss_db`) only needs |R|² and runs entirely
on device.
"""

import jax.numpy as jnp
import numpy as np

__all__ = ["GROUND_PRESETS", "fresnel_coefficients",
           "fresnel_coefficients_real", "ground_reflection_loss_db",
           "resolve_ground"]

_EPS0 = 8.8541878128e-12          # vacuum permittivity [F/m]

# (relative permittivity ε_r, conductivity σ [S/m]) — ITU-R P.527 classes
GROUND_PRESETS = {
    "sea": (70.0, 5.0),
    "wet": (30.0, 1e-2),          # wet ground
    "medium": (15.0, 1e-3),       # medium dry ground
    "dry": (3.0, 1e-4),           # very dry ground
}


def resolve_ground(ground):
    """Preset name or (ε_r, σ) pair → (ε_r, σ [S/m])."""
    if isinstance(ground, str):
        try:
            return GROUND_PRESETS[ground]
        except KeyError:
            raise ValueError(
                f"unknown ground preset {ground!r}; choose from "
                f"{sorted(GROUND_PRESETS)} or pass (eps_r, sigma)")
    eps_r, sigma = ground
    return float(eps_r), float(sigma)


def _csqrt(a, b):
    """Principal √(a + jb) in split real arithmetic.

    Matches the NumPy branch (Im ≥ 0 on the cut b == 0, a < 0): the
    imaginary sign is −1 only for strictly negative b.
    """
    m = jnp.hypot(a, b)
    re = jnp.sqrt(jnp.maximum(0.5 * (m + a), 0.0))
    im = jnp.where(b < 0, -1.0, 1.0) * jnp.sqrt(
        jnp.maximum(0.5 * (m - a), 0.0))
    return re, im


def _cdiv(nr, ni, dr, di):
    """(nr + j·ni) / (dr + j·di) in split real arithmetic."""
    den = dr * dr + di * di
    return (nr * dr + ni * di) / den, (ni * dr - nr * di) / den


def fresnel_coefficients_real(f_Hz, grazing_deg, eps_r, sigma_S_m):
    """Fresnel coefficients in split real form — the device path.

    Returns ``(rv_re, rv_im, rh_re, rh_im)``: the real and imaginary
    parts of R_v and R_h. Broadcasts over ``f_Hz``/``grazing_deg``;
    jittable, differentiable and TPU-safe (no complex dtype anywhere —
    the TPU backend cannot materialise complex arrays).
    """
    f = jnp.asarray(f_Hz, dtype=float)
    psi = jnp.deg2rad(jnp.asarray(grazing_deg, dtype=float))
    # ε_c = p − j q
    p = eps_r
    q = sigma_S_m / (2.0 * jnp.pi * f * _EPS0)
    s = jnp.sin(psi)
    # root = √(ε_c − cos²ψ) = √((p − cos²ψ) − j q)
    rr, ri = _csqrt(p - jnp.cos(psi) ** 2, -q + 0.0 * s)
    # R_h = (s − root)/(s + root)
    rh_re, rh_im = _cdiv(s - rr, -ri, s + rr, ri)
    # R_v = (ε_c s − root)/(ε_c s + root), ε_c s = p s − j q s
    rv_re, rv_im = _cdiv(p * s - rr, -q * s - ri, p * s + rr, -q * s + ri)
    return rv_re, rv_im, rh_re, rh_im


def fresnel_coefficients(f_Hz, grazing_deg, eps_r, sigma_S_m):
    """Complex Fresnel coefficients (R_v, R_h) at grazing angle ψ [deg].

    Broadcasts over ``f_Hz``/``grazing_deg``. R → −1 (h) / +1-then-
    Brewster-dip (v) structure is the physical one; |R| → 1 for both as
    ψ → 0 (grazing) and for σ → ∞ (perfect conductor).

    Host convenience: computes on device in split real arithmetic
    (see :func:`fresnel_coefficients_real`) and assembles NumPy complex
    arrays, because the TPU backend has no complex dtype. Do not call
    inside ``jit``; use the ``_real`` variant there.
    """
    rv_re, rv_im, rh_re, rh_im = fresnel_coefficients_real(
        f_Hz, grazing_deg, eps_r, sigma_S_m)
    r_v = np.asarray(rv_re) + 1j * np.asarray(rv_im)
    r_h = np.asarray(rh_re) + 1j * np.asarray(rh_im)
    return r_v, r_h


def ground_reflection_loss_db(f_Hz, grazing_deg, ground="medium",
                              polarization="circular"):
    """Power loss [dB, ≥ 0] of one specular ground reflection.

    ``ground``: preset name (see :data:`GROUND_PRESETS`) or an
    ``(eps_r, sigma)`` pair. ``polarization``: ``"circular"`` (mean
    reflected power of the two linear components — the HF skywave
    convention), ``"horizontal"`` or ``"vertical"``.

    Jittable, differentiable and TPU-safe (split-real Fresnel path).
    """
    eps_r, sigma = resolve_ground(ground)
    rv_re, rv_im, rh_re, rh_im = fresnel_coefficients_real(
        f_Hz, grazing_deg, eps_r, sigma)
    pv = rv_re ** 2 + rv_im ** 2
    ph = rh_re ** 2 + rh_im ** 2
    if polarization == "circular":
        p = 0.5 * (pv + ph)
    elif polarization == "vertical":
        p = pv
    elif polarization == "horizontal":
        p = ph
    else:
        raise ValueError(
            "polarization must be 'circular', 'vertical' or 'horizontal'")
    return -10.0 * jnp.log10(p)
