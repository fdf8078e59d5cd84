"""Faraday rotation on transionospheric paths (beyond the reference).

The plane of polarisation of a linearly-polarised wave crossing the
ionosphere rotates by half the accumulated phase difference between the
two magnetoionic modes:

    Ω(f) = (π f / c) ∫ (μ_O − μ_X) ds        [rad, one-way]

Rather than the usual quasi-longitudinal (QL) high-frequency
approximation Ω ≈ (K/f²)∫ N·B·cosθ ds, this module evaluates the *exact*
Appleton–Hartree phase-index difference with the same ``find_mu_mup``
core as the rest of the framework (ref ``library.py:161-256``), so the
result stays correct toward the penetration frequency where the QL
expansion degrades. The QL closed form is recovered to O(X², XY²) —
pinned by ``tests/test_phase.py``.

TPU shape: one broadcast [N_freq, N_alt] Appleton–Hartree evaluation per
mode plus a trapezoid reduce — the same elementwise pattern XLA already
fuses for the forward operator.
"""

import jax
import jax.numpy as jnp

from .constants import C_KM_S
from .magnetoionic import find_X, find_Y, find_mu_mup

__all__ = ["faraday_rotation_vertical"]


@jax.jit
def _faraday_core(freq_hz, den, bmag, bpsi, alt):
    X = find_X(den[None, :], freq_hz[:, None])
    Y = find_Y(freq_hz[:, None], bmag[None, :])
    psi = jnp.broadcast_to(bpsi[None, :], X.shape)
    mu_o, _ = find_mu_mup(X, Y, psi, "O")
    mu_x, _ = find_mu_mup(X, Y, psi, "X")
    dmu = mu_o - mu_x
    dh = jnp.diff(alt)
    # plain trapezoid (NOT nansum): an evanescent sample anywhere on the
    # column means the wave does not penetrate — the whole row is NaN
    integral = jnp.sum(0.5 * (dmu[:, :-1] + dmu[:, 1:]) * dh[None, :],
                       axis=1)
    return jnp.pi * freq_hz / C_KM_S * integral


def faraday_rotation_vertical(freq_Hz, den, bmag, bpsi, alt_km):
    """One-way Faraday rotation [rad] for a vertical transionospheric path.

    Parameters follow the forward operator: ``den`` [m⁻³], ``bmag`` [T],
    ``bpsi`` [deg, angle between the vertical ray and B], ``alt_km`` on a
    monotone grid, ``freq_Hz`` scalar or [N_freq] — every frequency must
    be above the X-mode penetration frequency of the profile, otherwise
    that row is NaN (escape semantics, like the forward operator).

    Fully differentiable: jax.grad w.r.t. ``den`` is the Faraday
    sensitivity kernel (∝ B·cosθ weighting of a TEC perturbation), and
    d/dt through a time-parameterised profile gives the polarisation
    fading rate.
    """
    freq = jnp.atleast_1d(jnp.asarray(freq_Hz, dtype=float))
    out = _faraday_core(freq, jnp.asarray(den, dtype=float),
                        jnp.asarray(bmag, dtype=float),
                        jnp.asarray(bpsi, dtype=float),
                        jnp.asarray(alt_km, dtype=float))
    return out[0] if jnp.ndim(freq_Hz) == 0 else out
