"""Appleton–Hartree magnetoionic core, branch-free for TPU/XLA.

Re-designs the reference magnetoionic layer (``find_X``/``find_Y``/
``find_mu_mup``, ``/root/reference/PyRayHF/library.py:120-256``) as pure,
fused ``jnp`` functions:

* no boolean-index mutation — NaN semantics are expressed with
  ``jnp.where`` so the whole chain stays a single XLA fusion and is
  ``vmap``/``grad``/``jit`` compatible;
* a *masked* variant returns finite values plus a validity mask with all
  dangerous denominators sanitised (double-``where``), so ``jax.grad``
  through the operator
  never produces NaN cotangents for escaped rays;
* the O/X mode switch is a ±1 float (static), not a string comparison per call.

NaN conventions match the reference exactly:
  - ``under_sqrt < 0``  → μ = NaN (evanescent / ray escapes),
  - ``μ > 1``           → NaN (non-physical),
  - unmagnetised branch (max|Y| < y_tol): μ = sqrt(1-X) for X < 1 else NaN,
    μ' = 1/μ where μ > 0 else NaN.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .constants import CP, G_P

__all__ = [
    "den2freq", "freq2den", "find_X", "find_Y",
    "find_mu_mup", "find_mu_mup_masked", "mode_multiplier",
]


def den2freq(density):
    """Plasma density [m^-3] → plasma frequency [Hz]. (ref library.py:75-97)"""
    return jnp.sqrt(density) * CP


def freq2den(frequency):
    """Plasma frequency [Hz] → density [m^-3]. (ref library.py:100-117)"""
    return (frequency / CP) ** 2


def find_X(n_e, f):
    """X = (f_N / f)^2, squared plasma-to-wave ratio. (ref :120-137)"""
    return den2freq(n_e) ** 2 / f ** 2


def find_Y(f, b):
    """Y = f_ce / f, the gyro-to-wave frequency ratio. (ref :140-158)"""
    return G_P * b / f


def mode_multiplier(mode):
    """Map mode string 'O'/'X' to the ±1 Appleton–Hartree branch multiplier."""
    if mode == "O":
        return 1.0
    if mode == "X":
        return -1.0
    raise ValueError("Mode must be O or X")


def _iso_mu_mup(X):
    """Unmagnetised cold-plasma indices: μ = sqrt(1-X), μ' = 1/μ."""
    mu2 = 1.0 - X
    valid = mu2 > 0.0
    mu = jnp.where(valid, jnp.sqrt(jnp.where(valid, mu2, 1.0)), jnp.nan)
    pos = jnp.isfinite(mu) & (mu > 0.0)
    mup = jnp.where(pos, 1.0 / jnp.where(pos, mu, 1.0), jnp.nan)
    return mu, mup


def _magnetized_mu_mup(X, Y, bpsi_deg, mode_mult, sanitize, naive_o=False):
    """Appleton–Hartree μ and analytic group index μ' (magnetised branch).

    Mirrors ref library.py:209-256 but branch-free.

    With ``sanitize=False`` singular denominators produce inf/NaN exactly as
    NumPy would (bit-parity mode). With ``sanitize=True`` every dangerous
    denominator/sqrt input is guarded by double-``where`` so reverse-mode AD
    through valid entries stays finite (gradient mode).

    ``naive_o=True`` evaluates the O-mode branch with the reference's exact
    expression sequence (D = (1−X) − ½YT² + β) instead of the
    cancellation-free rewrite — bit-parity with the reference INCLUDING its
    catastrophic-cancellation error at the backed-off reflection sample
    (its f64 μ' there is ~8% off exact arithmetic; see test_magnetoionic).
    """
    psi = jnp.deg2rad(bpsi_deg)
    sinp = jnp.sin(psi)
    cosp = jnp.cos(psi)
    YT = Y * sinp
    YL = Y * cosp
    Xm1 = 1.0 - X

    alpha = 0.25 * YT ** 4 + YL ** 2 * Xm1 ** 2
    beta = jnp.sqrt(alpha)

    if mode_mult > 0 and not naive_o:
        # O-mode: D = (1-X) - ½YT² + β suffers catastrophic cancellation as
        # X→1 (β → ½YT², D → 0⁺): the naive form loses all significance at
        # the backed-off reflection point and makes μ' there irreproducible
        # (the reference itself is O(1%) off exact arithmetic at 1-X ~ 1e-9).
        # Use the algebraically identical, cancellation-free rewrite
        #   β - ½YT² = YL²(1-X)² / (β + ½YT²)  ≡ s ≥ 0
        #   D = (1-X) + s
        #   under = 1 - X(1-X)/D = ((1-X)² + s) / ((1-X) + s)
        # which is exact-to-ulp for X ≤ 1. (Accuracy improvement over ref.)
        bsum = beta + 0.5 * YT ** 2
        b_ok0 = bsum > 0.0
        bsum_safe = jnp.where(b_ok0, bsum, 1.0)
        # s → 0 in the Y→0 per-element limit (bsum == 0 with Xm1 ≠ 0 means
        # YT = YL = 0, where the reference's D degenerates to Xm1 exactly).
        s = jnp.where(b_ok0, YL ** 2 * Xm1 ** 2 / bsum_safe, 0.0)
        # At Xm1 == 0 exactly the stable D vanishes while the reference's
        # naive form lands on a ±ulp residue of (β - ½YT²) and yields μ = 1;
        # reproduce that path for the measure-zero X == 1 case only.
        D_naive = Xm1 - 0.5 * YT ** 2 + mode_mult * beta
        D = jnp.where(Xm1 == 0.0, D_naive, Xm1 + s)
        d_ok = D != 0.0
        D_safe = jnp.where(d_ok, D, 1.0)
        under = jnp.where(Xm1 == 0.0,
                          1.0 - X * Xm1 / D_safe,
                          (Xm1 ** 2 + s) / D_safe)
        under = jnp.where(d_ok, under, jnp.nan)
    else:
        D = Xm1 - 0.5 * YT ** 2 + mode_mult * beta
        d_ok = D != 0.0
        D_safe = jnp.where(d_ok, D, 1.0) if sanitize else D
        under = 1.0 - X * Xm1 / D_safe

    u_ok = (under >= 0.0) & d_ok
    if sanitize:
        mu = jnp.where(u_ok, jnp.sqrt(jnp.where(u_ok, under, 1.0)), jnp.nan)
    else:
        # replicate: under_sqrt[under_sqrt < 0] = nan; mu = sqrt(under_sqrt)
        mu = jnp.sqrt(jnp.where(under < 0.0, jnp.nan, under))
    mu = jnp.where(mu > 1.0, jnp.nan, mu)

    # Analytic derivatives for μ' = μ - (2X ∂μ/∂X + Y ∂μ/∂Y).
    b_ok = beta > 0.0
    beta_safe = jnp.where(b_ok, beta, 1.0) if sanitize else beta
    dbetadX = -YL ** 2 * Xm1 / beta_safe
    dDdX = -1.0 + mode_mult * dbetadX
    dalphadY = YT ** 3 * sinp + 2.0 * YL * Xm1 ** 2 * cosp
    dbetadY = 0.5 * dalphadY / beta_safe
    dDdY = -YT * sinp + mode_mult * dbetadY

    m_ok = u_ok & b_ok & (mu > 0.0)
    mu_safe = jnp.where(m_ok, mu, 1.0) if sanitize else mu
    dmudY = (X * Xm1 * dDdY) / (2.0 * mu_safe * D_safe ** 2)
    dmudX = (1.0 / (2.0 * mu_safe * D_safe)) * (
        2.0 * X - 1.0 + X * Xm1 / D_safe * dDdX)
    mup = mu - (2.0 * X * dmudX + Y * dmudY)

    valid = m_ok & jnp.isfinite(mup)
    return mu, mup, valid


@partial(jax.jit, static_argnames=("mode", "arithmetic"))
def find_mu_mup(X, Y, bpsi, mode="O", *, y_tol=1e-12, arithmetic="stable"):
    """Phase (μ) and group (μ') refractive indices, reference-parity NaNs.

    Parameters mirror the reference (``library.py:161-256``): ``X``, ``Y``,
    ``bpsi`` [deg] broadcastable arrays; ``mode`` ∈ {'O','X'} (static).
    Returns (μ, μ') with NaN where the wave is evanescent/non-physical.

    ``arithmetic`` (static): ``"stable"`` (default) evaluates the O-mode
    branch with the cancellation-free factorisation (accurate to ~1e-7 at
    the singular backed-off reflection sample where the reference's naive
    form is ~8% off exact arithmetic); ``"reference"`` replicates the
    reference's expression sequence bit-for-bit, rounding error included —
    use it when exact numerical parity with PyRayHF outputs is required.
    """
    if arithmetic not in ("stable", "reference"):
        raise ValueError("arithmetic must be 'stable' or 'reference'")
    mm = mode_multiplier(mode)
    X = jnp.asarray(X, dtype=float)
    Y = jnp.asarray(Y, dtype=float)
    bpsi = jnp.asarray(bpsi, dtype=float)
    X, Y, bpsi = jnp.broadcast_arrays(X, Y, bpsi)

    iso_mu, iso_mup = _iso_mu_mup(X)
    mag_mu, mag_mup, _ = _magnetized_mu_mup(
        X, Y, bpsi, mm, sanitize=False,
        naive_o=(arithmetic == "reference"))

    unmag = jnp.nanmax(jnp.abs(Y)) < y_tol
    mu = jnp.where(unmag, iso_mu, mag_mu)
    mup = jnp.where(unmag, iso_mup, mag_mup)
    return mu, mup


@partial(jax.jit, static_argnames=("mode",))
def find_mu_mup_masked(X, Y, bpsi, mode="O", *, y_tol=1e-12):
    """Gradient-safe variant: (μ, μ', valid) with finite entries everywhere.

    Invalid entries (where the reference would produce NaN/inf) carry
    placeholder finite values and ``valid=False``; downstream code must mask
    with ``jnp.where(valid, ..., 0)``. All singular denominators are sanitised
    before use so ``jax.grad`` through any selection of valid entries is finite.
    """
    mm = mode_multiplier(mode)
    X = jnp.asarray(X, dtype=float)
    Y = jnp.asarray(Y, dtype=float)
    bpsi = jnp.asarray(bpsi, dtype=float)
    X, Y, bpsi = jnp.broadcast_arrays(X, Y, bpsi)

    mag_mu, mag_mup, mag_valid = _magnetized_mu_mup(X, Y, bpsi, mm,
                                                    sanitize=True)

    mu2 = 1.0 - X
    iso_valid = mu2 > 0.0
    iso_mu = jnp.sqrt(jnp.where(iso_valid, mu2, 1.0))
    iso_mup = 1.0 / jnp.where(iso_valid, iso_mu, 1.0)

    unmag = jnp.nanmax(jnp.abs(Y)) < y_tol
    valid = jnp.where(unmag, iso_valid, mag_valid)
    mu = jnp.where(unmag, iso_mu, jnp.where(mag_valid, mag_mu, 1.0))
    mup = jnp.where(unmag, iso_mup, jnp.where(mag_valid, mag_mup, 0.0))
    return mu, mup, valid
