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

Everything is jnp (complex64/128), vectorised over frequency/angle, and
differentiable.
"""

import jax.numpy as jnp

__all__ = ["GROUND_PRESETS", "fresnel_coefficients",
           "ground_reflection_loss_db", "resolve_ground"]

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


def fresnel_coefficients(f_Hz, grazing_deg, eps_r, sigma_S_m):
    """Complex Fresnel coefficients (R_v, R_h) at grazing angle ψ [deg].

    Broadcasts over ``f_Hz``/``grazing_deg``. R → −1 (h) / +1-then-
    Brewster-dip (v) structure is the physical one; |R| → 1 for both as
    ψ → 0 (grazing) and for σ → ∞ (perfect conductor).
    """
    f = jnp.asarray(f_Hz, dtype=float)
    psi = jnp.deg2rad(jnp.asarray(grazing_deg, dtype=float))
    eps_c = eps_r - 1j * sigma_S_m / (2.0 * jnp.pi * f * _EPS0)
    s = jnp.sin(psi)
    root = jnp.sqrt(eps_c - jnp.cos(psi) ** 2)
    r_h = (s - root) / (s + root)
    r_v = (eps_c * s - root) / (eps_c * s + root)
    return r_v, r_h


def ground_reflection_loss_db(f_Hz, grazing_deg, ground="medium",
                              polarization="circular"):
    """Power loss [dB, ≥ 0] of one specular ground reflection.

    ``ground``: preset name (see :data:`GROUND_PRESETS`) or an
    ``(eps_r, sigma)`` pair. ``polarization``: ``"circular"`` (mean
    reflected power of the two linear components — the HF skywave
    convention), ``"horizontal"`` or ``"vertical"``.
    """
    eps_r, sigma = resolve_ground(ground)
    r_v, r_h = fresnel_coefficients(f_Hz, grazing_deg, eps_r, sigma)
    pv = jnp.abs(r_v) ** 2
    ph = jnp.abs(r_h) ** 2
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
