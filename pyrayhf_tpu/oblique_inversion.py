"""Oblique-ionogram inversion: fit the midpoint EDP to link group delays.

New capability beyond the reference. PyRayHF's retrieval
(``minimize_parameters``, ref ``library.py:672-825``) inverts VERTICAL
ionograms only — it needs a sounder at the site. Operational HF networks
mostly record OBLIQUE soundings (a transmitter and a receiver separated
by hundreds–thousands of km), and recovering the midpoint electron-density
profile from the oblique trace is the classical hard inversion: every
observable (low-ray group delay per frequency) depends on the profile
through the full two-point homing problem.

Here the forward model is :func:`pyrayhf_tpu.oblique.synthesize_oblique_ionogram`
— the whole (frequency × elevation) Snell fan traced in one launch with the
landing-range crossings interpolated vectorised — and the fit is
Levenberg–Marquardt on EXACT jacobians: the fan, the crossing interpolation
and the delay channel are all differentiable, so forward-mode AD gives
∂(delay)/∂(NmF2, hmF2, B_bot) through the complete homing problem. This is
the adjoint capability the TPU build adds over the reference (same design
as :func:`pyrayhf_tpu.retrieval.retrieve_gradient`, SURVEY §2
'Inversion / retrieval'), applied to an observable the reference cannot
invert at all.

Parameterisation matches the vertical retrieval: the F2 layer's
(NmF2, hmF2, B_bot) — or (NmF2, hmF2, B0) for ``bottom_type='B0_B1'`` —
log-scaled, with F1/E parameters held at their priors. Unlike the vertical
case, NmF2 is fitted by default (``fit_nm=True``): an oblique trace has no
direct foF2 marker, only the link-MUF nose, which constrains NmF2 jointly
with hmF2 through the secant geometry.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import edp
from .constants import CP
from .oblique import synthesize_oblique_ionogram
from .retrieval import _scalar, _solve_small

__all__ = ["retrieve_from_oblique"]

# rows where the observation is finite but the model fan never reaches the
# link (above the model's MUF) get a penalty residual [ms] — same role as
# residual_VH's NaN-fill (ref library.py:664-665), but SMOOTH in the
# parameters: a constant fill has zero jacobian, so an initial model whose
# MUF sits below the observed band would stall (LM sees no benefit in
# raising NmF2 until a row flips finite). The penalty is scaled by
# f_obs / f_nose(NmF2, hmF2) — a flat-secant MUF proxy — so missing rows
# pull NmF2 up / hmF2 down until the fan covers them.
_PENALTY_MS = 10.0

# soft-clip scale [ms] for the bounded-influence residual rows (see
# `res` in `_oblique_lm_core`)
_HUBER_MS = 1.0


@partial(jax.jit, static_argnames=("mode", "geometry", "bottom_type",
                                   "n_elev", "n_hops", "steps", "fit_nm",
                                   "d_km", "elev_min", "elev_max",
                                   "brute_init"))
def _oblique_lm_core(x0, nm0, B_top, Es, P, B1_fix, f0s, obs_ms, obs_hi_ms,
                     alt_j, bmag_j, bpsi_j, *, mode, geometry, bottom_type,
                     n_elev, n_hops, steps, fit_nm, d_km, elev_min,
                     elev_max, brute_init):
    """One XLA program: `steps` LM iterations on the oblique residuals.

    Mirrors :func:`pyrayhf_tpu.retrieval._lm_batch_core` (fixed step count,
    4 inner damping retries with accept/reject masks, Cramer normal-equation
    solves) for a single link; the forward model is the full Snell homing
    fan instead of the vertical operator. ``obs_hi_ms`` may be all-NaN
    (low-ray-only fit).
    """
    obs_ok = jnp.isfinite(obs_ms) & jnp.isfinite(f0s)
    obs_hi_ok = jnp.isfinite(obs_hi_ms) & jnp.isfinite(f0s)
    hmE = Es["hm"]

    def edp_of(x):
        bb = jnp.exp(x[0])
        hm = jnp.exp(x[1])
        nm = jnp.exp(x[2]) if fit_nm else nm0
        NmF1, _, hmF1, _ = edp.derive_dependent_F1_parameters(
            P, nm, hm, bb, hmE)
        if bottom_type == "B_bot":
            EDP = edp.reconstruct_density_1level(
                {"Nm": nm, "hm": hm, "B_bot": bb, "B_top": B_top},
                {"Nm": NmF1, "hm": hmF1}, Es, alt_j)
        else:
            EDP = edp.reconstruct_density_continuous(
                {"Nm": nm, "hm": hm, "B0": bb, "B1": B1_fix,
                 "B_top": B_top}, {"P": P, "hm": hmF1}, Es, alt_j)
        return EDP

    def delays_ms(x):
        out = synthesize_oblique_ionogram(
            f0s, d_km, alt_j, edp_of(x), bmag_j, bpsi_j, mode=mode,
            geometry=geometry, n_elev=n_elev, elev_min_deg=elev_min,
            elev_max_deg=elev_max, n_hops=n_hops)
        return out["delay_low_sec"] * 1e3, out["delay_high_sec"] * 1e3

    def res(x):
        d_lo, d_hi = delays_ms(x)
        nm = jnp.exp(x[2]) if fit_nm else nm0
        hm = jnp.exp(x[1])
        # flat-secant nose proxy: f_nose = foF2 / cos(phi0), phi0 the
        # zenith angle of the mirror ray at the per-hop midpoint
        fo = CP * jnp.sqrt(nm)                              # Hz
        cosphi = hm / jnp.sqrt(hm * hm + (0.5 * d_km / n_hops) ** 2)
        pen = _PENALTY_MS * jnp.maximum(f0s / (fo / cosphi), 0.3)

        def rows(obs, d, ok):
            r = jnp.where(ok & jnp.isfinite(d), obs - d, 0.0)
            return jnp.where(ok & ~jnp.isfinite(d), pen, r)

        r = jnp.concatenate([rows(obs_ms, d_lo, obs_ok),
                             rows(obs_hi_ms, d_hi, obs_hi_ok)])
        # bounded-influence rows (soft clip at _HUBER_MS): a single row
        # whose crossing identity flips between propagation modes (E-hop ↔
        # F-hop) as the parameters move is piecewise with ~ms jumps; left
        # unbounded it dominates the normal equations and stalls LM in the
        # kink. The clip preserves the exact zero at the global minimum.
        return r / jnp.sqrt(1.0 + (r / _HUBER_MS) ** 2)

    # physical box for the log-parameters (projection after each trial
    # step keeps the fan away from degenerate layers)
    lo = jnp.stack([jnp.log(5.0), jnp.log(hmE + 40.0)]
                   + ([jnp.log(1e10)] if fit_nm else []))
    hi = jnp.stack([jnp.log(200.0), jnp.log(550.0)]
                   + ([jnp.log(5e13)] if fit_nm else []))

    n_par = x0.shape[0]
    eyeP = jnp.eye(n_par, dtype=x0.dtype)

    def jac(x):
        cols = [jax.jvp(res, (x,), (eyeP[k],))[1] for k in range(n_par)]
        return jnp.stack(cols, axis=-1)                     # [F, Pn]

    def lm_step(state, _):
        x, lam, cost = state
        J = jac(x)
        JtJ = J.T @ J
        r = res(x)
        Jtr = J.T @ r
        diag = jnp.maximum(jnp.diagonal(JtJ), 1e-12)

        def try_lam(carry, _):
            x_acc, lam, cost, done = carry
            A = JtJ + lam * diag * eyeP
            delta = _solve_small(A, Jtr)
            x_new = jnp.clip(x - delta, lo, hi)
            cost_new = jnp.sum(res(x_new) ** 2)
            ok = ~done & jnp.isfinite(cost_new) & (cost_new < cost)
            x_acc = jnp.where(ok, x_new, x_acc)
            cost = jnp.where(ok, cost_new, cost)
            lam = jnp.where(done, lam,
                            jnp.where(ok, jnp.maximum(lam / 3.0, 1e-10),
                                      jnp.minimum(lam * 10.0, 1e8)))
            return (x_acc, lam, cost, done | ok), None

        (x, lam, cost, _), _ = jax.lax.scan(
            try_lam, (x, lam, cost, jnp.asarray(False)), None, length=4)
        return (x, lam, cost), cost

    if brute_init:
        # vmapped coarse grid around the prior (the reference's lmfit-brute
        # heritage, ref library.py:781-798, as ONE batched fan launch):
        # the low-ray cost surface is piecewise-smooth in the crossing
        # interpolation and has shallow local minima away from the MUF
        # nose — LM alone can stall in them. The best grid point seeds LM.
        mult_bb = jnp.log(jnp.asarray([0.7, 1.0, 1.45]))
        mult_hm = jnp.log(jnp.asarray([0.82, 0.91, 1.0, 1.1, 1.21]))
        mults = [mult_bb, mult_hm]
        if fit_nm:
            mults.append(jnp.log(
                jnp.asarray([0.5, 0.71, 1.0, 1.41, 2.0, 2.83])))
        grids = jnp.meshgrid(*mults, indexing="ij")
        offs = jnp.stack([g.ravel() for g in grids], axis=-1)   # [G, Pn]
        cand = jnp.clip(x0[None, :] + offs, lo, hi)
        costs = jax.vmap(lambda xx: jnp.sum(res(xx) ** 2))(cand)
        x0 = cand[jnp.argmin(costs)]

    cost0 = jnp.sum(res(x0) ** 2)
    (x, _, _), history = jax.lax.scan(
        lm_step, (x0, jnp.asarray(1e-2, x0.dtype), cost0), None,
        length=steps)
    d_lo, d_hi = delays_ms(x)
    return x, d_lo * 1e-3, d_hi * 1e-3, edp_of(x), history


def retrieve_from_oblique(F2, F1, E, f0s_hz, delay_obs_sec, ground_range_km,
                          alt, b_mag, b_psi, mode="O", geometry="spherical",
                          bottom_type="B_bot", n_elev=192, elev_min_deg=5.0,
                          elev_max_deg=85.0, n_hops=1, steps=12,
                          fit_nm=True, delay_high_obs_sec=None,
                          brute_init=True):
    """Fit F2-layer parameters to observed oblique group delays.

    Parameters
    ----------
    F2, F1, E : dict
        Layer-parameter priors, same keys as :func:`pyrayhf_tpu.model_VH`
        (``F2`` supplies the initial NmF2/hmF2/B_bot or B0/B1 guess and the
        fixed B_top; ``F1``/``E`` are held fixed).
    f0s_hz : [F] array
        Sounding frequencies [Hz].
    delay_obs_sec : [F] array
        Observed low-ray group delays [s]; NaN rows (no echo / above the
        link MUF) are ignored.
    ground_range_km : float
        Great-circle transmitter→receiver distance [km].
    alt, b_mag, b_psi : [N] arrays
        Altitude grid [km] and magnetic field (|B| [T], ψ [deg]) at the
        link midpoint.
    mode, geometry, n_elev, elev_min_deg, elev_max_deg, n_hops
        Forwarded to :func:`pyrayhf_tpu.synthesize_oblique_ionogram`.
    steps : int
        LM iteration budget (each = 1 jacobian + ≤4 damping retries).
    fit_nm : bool
        Fit NmF2 (default). With ``fit_nm=False`` NmF2 stays at its prior —
        use when foF2 is known from a co-located vertical sounder.
    delay_high_obs_sec : [F] array, optional
        Observed HIGH-ray group delays [s] (NaN where not scaled from the
        record). Strongly recommended when available: low-ray delays alone
        leave a shallow (NmF2, hmF2, B_bot) valley away from the MUF nose
        — the classical oblique-inversion degeneracy — while the high ray
        grazes the layer peak and pins NmF2.

    Returns
    -------
    (delay_fit_sec, delay_high_fit_sec, EDP_fit, F2_fit, history)
        Modelled low- and high-ray delays [s] at the fit, the fitted
        profile on ``alt``, the fitted-parameter dict, and the
        squared-residual trace [ms²] per LM iteration.
    """
    f0s = jnp.atleast_1d(jnp.asarray(f0s_hz, dtype=float))
    obs_ms = jnp.atleast_1d(jnp.asarray(delay_obs_sec, dtype=float)) * 1e3
    if delay_high_obs_sec is None:
        obs_hi_ms = jnp.full_like(obs_ms, jnp.nan)
    else:
        obs_hi_ms = jnp.atleast_1d(
            jnp.asarray(delay_high_obs_sec, dtype=float)) * 1e3
    alt_j = jnp.asarray(alt, dtype=float)
    bmag_j = jnp.asarray(b_mag, dtype=float)
    bpsi_j = jnp.asarray(b_psi, dtype=float)

    key2 = "B_bot" if bottom_type == "B_bot" else "B0"
    if bottom_type not in ("B_bot", "B0_B1"):
        raise ValueError("bottom_type must be 'B_bot' or 'B0_B1'")
    bb0 = _scalar(F2[key2])
    hm0 = _scalar(F2["hm"])
    nm0 = _scalar(F2["Nm"])
    x0 = jnp.stack([jnp.log(bb0), jnp.log(hm0)]
                   + ([jnp.log(nm0)] if fit_nm else []))

    B_top = _scalar(F2["B_top"])
    Es = {k: _scalar(E[k]) for k in ("Nm", "hm", "B_bot", "B_top")}
    P = _scalar(F1["P"]) if "P" in F1 else jnp.asarray(0.0)
    B1_fix = (_scalar(F2["B1"]) if bottom_type == "B0_B1"
              else jnp.asarray(0.0))

    x, delay_fit, delay_hi_fit, EDP_fit, history = _oblique_lm_core(
        x0, jnp.asarray(nm0), B_top, Es, P, B1_fix, f0s, obs_ms, obs_hi_ms,
        alt_j, bmag_j, bpsi_j, mode=mode, geometry=geometry,
        bottom_type=bottom_type, n_elev=int(n_elev), n_hops=int(n_hops),
        steps=int(steps), fit_nm=bool(fit_nm),
        d_km=float(ground_range_km), elev_min=float(elev_min_deg),
        elev_max=float(elev_max_deg), brute_init=bool(brute_init))

    F2_fit = dict(F2)
    F2_fit[key2] = float(jnp.exp(x[0]))
    F2_fit["hm"] = float(jnp.exp(x[1]))
    F2_fit["Nm"] = float(jnp.exp(x[2])) if fit_nm else float(nm0)
    return (np.asarray(delay_fit), np.asarray(delay_hi_fit),
            np.asarray(EDP_fit), F2_fit, np.asarray(history))
