"""Model interface & electron-density retrieval (ionogram inversion).

Re-designs the reference L5 layer (``model_VH`` ref ``library.py:512-592``,
``residual_VH`` :595-669, ``minimize_parameters`` :672-825) without lmfit or
PyIRI:

* :func:`model_VH` — parametric EDP (pyrayhf_tpu.edp) → forward operator;
* :func:`residual_VH` — pure function of a parameter dict (no lmfit
  Parameters; objects with ``.value`` attributes are also accepted);
* :func:`minimize_parameters` — lmfit-brute-equivalent grid search, but the
  whole grid is evaluated as ONE vmapped XLA program (hundreds of forward
  operators per launch instead of a Python loop);
* :func:`retrieve_gradient` — the TPU-native headline: exact jacobians
  (``jax.jacobian``) through the full differentiable operator driving a
  Levenberg–Marquardt loop, impossible in the NumPy reference.
"""


from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import edp
from .constants import G_P
from .forward import vertical_forward_operator
from .pallas_vh import ionogram_fast_xla
from .magnetoionic import freq2den, mode_multiplier

__all__ = ["model_VH", "residual_VH", "minimize_parameters",
           "retrieve_gradient", "retrieve_gradient_batch"]


def _scalar(x):
    """Squeeze reference-style (1,1)-shaped parameter arrays to scalars."""
    return jnp.asarray(x, dtype=float).reshape(())


def _param_value(p):
    """Accept plain numbers or lmfit-style objects with a .value attr."""
    return getattr(p, "value", p)


def _build_edp(F2, F1, E, alt, bottom_type):
    """Derive dependent F1 parameters and reconstruct the EDP.

    Mirrors model_VH's PyIRI calls (ref :556-583) using our builders.
    Returns (EDP [N_alt], F1_updated dict).
    """
    hmE = _scalar(E["hm"])
    NmF2 = _scalar(F2["Nm"])
    hmF2 = _scalar(F2["hm"])
    P = _scalar(F1["P"]) if "P" in F1 else jnp.asarray(0.0)

    if bottom_type == "B_bot":
        B_bot = _scalar(F2["B_bot"])
        NmF1, foF1, hmF1, B_F1_bot = edp.derive_dependent_F1_parameters(
            P, NmF2, hmF2, B_bot, hmE)
        F1u = dict(F1)
        F1u.update(Nm=NmF1, fo=foF1, hm=hmF1, B_bot=B_F1_bot)
        F2s = {"Nm": NmF2, "hm": hmF2, "B_bot": B_bot,
               "B_top": _scalar(F2["B_top"])}
        Es = {k: _scalar(E[k]) for k in ("Nm", "hm", "B_bot", "B_top")}
        EDP = edp.reconstruct_density_1level(F2s, {"Nm": NmF1, "hm": hmF1},
                                             Es, alt)
    elif bottom_type == "B0_B1":
        NmF1, foF1, hmF1, B_F1_bot = edp.derive_dependent_F1_parameters(
            P, NmF2, hmF2, _scalar(F2["B0"]), hmE)
        F1u = dict(F1)
        F1u.update(Nm=NmF1, fo=foF1, hm=hmF1, B_bot=B_F1_bot)
        F2s = {"Nm": NmF2, "hm": hmF2, "B0": _scalar(F2["B0"]),
               "B1": _scalar(F2["B1"]), "B_top": _scalar(F2["B_top"])}
        Es = {k: _scalar(E[k]) for k in ("Nm", "hm", "B_bot", "B_top")}
        EDP = edp.reconstruct_density_continuous(
            F2s, {"P": P, "hm": hmF1}, Es, alt)
    else:
        raise ValueError("bottom_type must be 'B_bot' or 'B0_B1'")
    return EDP, F1u


def model_VH(F2, F1, E, f_in, alt, b_mag, b_psi, mode="O", n_points=200,
             bottom_type="B_bot", arithmetic="stable"):
    """Virtual heights from layer parameters (ref :512-592).

    Returns (vh [N_freq], EDP [N_alt]). Unlike the reference, the input
    ``F1`` dict is NOT mutated; the derived F1 parameters are internal.
    ``arithmetic="reference"`` gives bit-parity μ' near the reflection
    point (see :func:`pyrayhf_tpu.forward.vertical_forward_operator`).
    """
    alt = jnp.asarray(alt, dtype=float)
    EDP, _ = _build_edp(F2, F1, E, alt, bottom_type)
    vh = vertical_forward_operator(jnp.asarray(f_in, dtype=float), EDP,
                                   jnp.asarray(b_mag, dtype=float),
                                   jnp.asarray(b_psi, dtype=float),
                                   alt, mode=mode, n_points=n_points,
                                   arithmetic=arithmetic)
    return vh, EDP


def residual_VH(params, F2_init, F1_init, E_init, f_in, vh_obs, alt,
                b_mag, b_psi, mode="O", n_points=200, bottom_type="B_bot"):
    """Observed − modelled virtual heights (ref :595-669).

    ``params``: dict with 'NmF2', 'hmF2' and 'B_bot' (or 'B0'/'B1'); values
    may be numbers or lmfit-style objects with ``.value``. Escaped-ray NaNs
    in the model are replaced by max(nanmean|vh|, 100) like the reference.
    """
    F2 = dict(F2_init)
    F2["Nm"] = _param_value(params["NmF2"])
    F2["hm"] = _param_value(params["hmF2"])
    if bottom_type == "B_bot":
        F2["B_bot"] = _param_value(params["B_bot"])
    elif bottom_type == "B0_B1":
        F2["B0"] = _param_value(params["B0"])
        F2["B1"] = _param_value(params["B1"])
    vh_model, _ = model_VH(F2, F1_init, E_init, f_in, alt, b_mag, b_psi,
                           mode=mode, n_points=n_points,
                           bottom_type=bottom_type)
    fill = jnp.maximum(jnp.nanmean(jnp.abs(vh_model)), 100.0)
    vh_model = jnp.where(jnp.isnan(vh_model), fill, vh_model)
    return (jnp.asarray(vh_obs, dtype=float) - vh_model).ravel()


def _pin_NmF2(f_in, alt, b_mag, old_hmf2, mode):
    """NmF2 from the maximum observed frequency (ref :760-778)."""
    f_max_hz = f_in[-1] * 1e6
    if mode == "O":
        return freq2den(f_max_hz) * 1.0001
    # X-mode: from the X + Y = 1 cutoff using B at hmF2
    ind = jnp.argmin(jnp.abs(jnp.asarray(alt) - old_hmf2))
    f_c = jnp.asarray(b_mag)[ind] * G_P
    foF2 = jnp.sqrt(f_max_hz ** 2 - f_max_hz * f_c)
    return freq2den(foF2) * 1.0001


def minimize_parameters(F2, F1, E, f_in0, vh_obs0, alt, b_mag, b_psi,
                        method=None, percent_sigma=None, step=None,
                        mode=None, n_points=None, bottom_type=None,
                        config=None):
    """Fit hmF2 and B_bot (or B0) to observed VH (ref :672-825).

    ``method='brute'``: lmfit-brute grid semantics (``arange(min, max,
    step)`` per axis) but the entire grid of forward operators runs as one
    vmapped XLA program. ``method='powell'``: scipy Powell line search
    within the (old ± sigma) bounds, like the reference's lmfit
    pass-through (ref :794-798), driving jitted on-device cost
    evaluations. ``method='levenberg-marquardt'`` delegates to
    :func:`retrieve_gradient` (exact-jacobian LM — strictly stronger than
    lmfit's finite-difference version). Returns (vh_fit, EDP_fit, F2_fit).

    Defaults mirror the reference (method='brute', percent_sigma=20,
    step=1, mode='O', n_points=200, bottom_type='B_bot'); a
    :class:`pyrayhf_tpu.config.RetrievalConfig` passed as ``config``
    supplies any knob not given explicitly.
    """
    from .config import resolve
    method = resolve(config, "method", method, "brute")
    percent_sigma = resolve(config, "percent_sigma", percent_sigma, 20.0)
    step = resolve(config, "step", step, 1.0)
    mode = resolve(config, "mode", mode, "O")
    n_points = resolve(config, "n_points", n_points, 200)
    bottom_type = resolve(config, "bottom_type", bottom_type, "B_bot")
    if method in ("levenberg-marquardt", "leastsq"):
        if bottom_type != "B_bot":
            raise ValueError("levenberg-marquardt retrieval supports B_bot")
        vh_fit, EDP_fit, F2_fit, _ = retrieve_gradient(
            F2, F1, E, f_in0, vh_obs0, alt, b_mag, b_psi, mode=mode,
            n_points=n_points, bottom_type=bottom_type)
        return vh_fit, EDP_fit, F2_fit
    if method not in ("brute", "powell"):
        raise ValueError(
            "method must be 'brute', 'powell' or 'levenberg-marquardt'")
    if bottom_type == "B_bot" and F2.get("B_bot") is None:
        raise ValueError("B_bot is not provided in F, but bottom_type is "
                         "B_bot")
    if bottom_type == "B0_B1" and (F2.get("B0") is None
                                   or F2.get("B1") is None):
        raise ValueError("B0 and B1 are not provided in F, but bottom_type "
                         "is B0_B1")

    f_in0 = np.asarray(f_in0, dtype=float)
    vh_obs0 = np.asarray(vh_obs0, dtype=float)
    gi = np.nonzero(np.isfinite(f_in0 + vh_obs0))[0]
    vh_obs, f_in = vh_obs0[gi], f_in0[gi]
    si = np.argsort(f_in)
    vh_obs, f_in = vh_obs[si], f_in[si]

    old_hmf2 = float(np.squeeze(np.asarray(F2["hm"])))
    sigma_hmf2 = old_hmf2 * percent_sigma / 100.0
    key2 = "B_bot" if bottom_type == "B_bot" else "B0"
    old_b = float(np.squeeze(np.asarray(F2[key2])))
    sigma_b = old_b * percent_sigma / 100.0

    Nm_new = _pin_NmF2(jnp.asarray(f_in), alt, b_mag, old_hmf2, mode)

    def cost(hm, b):
        params = {"NmF2": Nm_new, "hmF2": hm, key2: b}
        if bottom_type == "B0_B1":
            params["B1"] = _scalar(F2["B1"])
        r = residual_VH(params, F2, F1, E, jnp.asarray(f_in),
                        jnp.asarray(vh_obs), alt, b_mag, b_psi, mode=mode,
                        n_points=n_points, bottom_type=bottom_type)
        return jnp.sum(r * r)

    if method == "powell":
        # the reference forwards method='powell' to lmfit → scipy Powell
        # line search with (old ± sigma) parameter bounds (ref :781-798);
        # here scipy drives jitted on-device cost evaluations directly
        from scipy.optimize import minimize as _sp_minimize
        cost_j = jax.jit(cost)
        res = _sp_minimize(
            lambda z: float(cost_j(z[0], z[1])),
            x0=np.array([old_hmf2, old_b]), method="Powell",
            bounds=[(old_hmf2 - sigma_hmf2, old_hmf2 + sigma_hmf2),
                    (old_b - sigma_b, old_b + sigma_b)])
        hm_opt, b_opt = float(res.x[0]), float(res.x[1])
    else:
        # lmfit-brute grid semantics: arange(min, max, brute_step) per axis;
        # a sigma smaller than the step would yield an EMPTY grid (tiny
        # percent_sigma or small B_bot) — fall back to the initial value
        hm_grid = np.arange(old_hmf2 - sigma_hmf2, old_hmf2 + sigma_hmf2,
                            step)
        b_grid = np.arange(old_b - sigma_b, old_b + sigma_b, step)
        if hm_grid.size == 0:
            hm_grid = np.array([old_hmf2])
        if b_grid.size == 0:
            b_grid = np.array([old_b])
        HM, BB = np.meshgrid(hm_grid, b_grid, indexing="ij")
        hm_flat = jnp.asarray(HM.ravel())
        b_flat = jnp.asarray(BB.ravel())
        costs = jax.jit(jax.vmap(cost))(hm_flat, b_flat)
        best = int(jnp.argmin(costs))
        hm_opt = float(hm_flat[best])
        b_opt = float(b_flat[best])

    F2_fit = dict(F2)
    F2_fit["Nm"] = np.full_like(np.asarray(F2["Nm"], dtype=float),
                                float(Nm_new))
    F2_fit["hm"] = np.full_like(np.asarray(F2["Nm"], dtype=float), hm_opt)
    F2_fit[key2] = np.full_like(np.asarray(F2["Nm"], dtype=float), b_opt)

    vh_fit, EDP_fit = model_VH(F2_fit, dict(F1), dict(E), f_in0, alt, b_mag,
                               b_psi, mode=mode, n_points=n_points,
                               bottom_type=bottom_type)
    return vh_fit, EDP_fit, F2_fit


def retrieve_gradient(F2, F1, E, f_in, vh_obs, alt, b_mag, b_psi,
                      mode="O", n_points=200, bottom_type="B_bot",
                      steps=25, learning_rate=None, fit_nm=False,
                      crit_margin=0.995):
    """Gradient-based retrieval: exact jacobians through the whole operator.

    Optimises log-scaled (hmF2, B_bot[, NmF2]) — or (hmF2, B0) for
    bottom_type='B0_B1' — with Levenberg–Marquardt on
    the virtual-height residuals, using ``jax.jacobian`` through the masked
    (NaN-free-gradient) operator — the adjoint capability the TPU build adds
    over the reference's brute search (SURVEY §2 'Inversion / retrieval').
    LM handles the stiff near-critical frequencies that defeat first-order
    optimisers (|∂vh/∂hmF2| diverges at the reflection singularity).

    ``steps`` is the LM iteration budget; ``learning_rate`` is accepted for
    backwards compatibility and ignored. Frequencies above
    ``crit_margin``·foF2(model) are excluded from the fit: at the reflection
    singularity |∂vh/∂θ| diverges and a single near-critical row would
    otherwise dominate (and destroy) the normal equations.

    The whole LM loop runs as :func:`_lm_batch_core` with a batch of one —
    a single jitted ``lax.scan`` on the device, no host round-trips per
    damping attempt (the round-2 host-driven loop paid ~2 transfers per
    try). The fixed ``steps``-length scan replaces the host loop's early
    break: a converged sample just keeps rejecting steps at rising λ,
    which costs flops but no accuracy.

    Returns (vh_fit, EDP_fit, F2_fit, history) where history is the
    squared-residual trace per LM iteration.
    """
    del learning_rate
    f = jnp.asarray(f_in, dtype=float)
    obs = jnp.asarray(vh_obs, dtype=float)
    obs_ok = jnp.isfinite(obs) & jnp.isfinite(f)
    alt_j = jnp.asarray(alt, dtype=float)
    bmag_j = jnp.asarray(b_mag, dtype=float)
    bpsi_j = jnp.asarray(b_psi, dtype=float)

    hm0 = _scalar(F2["hm"])
    key2 = "B_bot" if bottom_type == "B_bot" else "B0"
    bb0 = _scalar(F2[key2])
    old_hm = float(hm0)
    nm0 = (_scalar(F2["Nm"]) if fit_nm
           else _pin_NmF2(jnp.sort(f[obs_ok]), alt_j, bmag_j, old_hm, mode))

    B_top = _scalar(F2["B_top"])
    Es = {k: _scalar(E[k]) for k in ("Nm", "hm", "B_bot", "B_top")}
    P = _scalar(F1["P"]) if "P" in F1 else jnp.asarray(0.0)
    B1_fix = (_scalar(F2["B1"]) if bottom_type == "B0_B1"
              else jnp.asarray(0.0))

    _, _, hm_f, bb_f, nm_f, history = _lm_batch_core(
        hm0[None], bb0[None], jnp.asarray(nm0)[None], B_top, Es, P, B1_fix,
        f, obs[None, :], alt_j, bmag_j, bpsi_j, mode=mode,
        n_points=n_points, bottom_type=bottom_type, steps=steps,
        fit_nm=fit_nm, crit_margin=crit_margin)
    hm_opt = float(hm_f[0])
    bb_opt = float(bb_f[0])
    nm_opt = float(nm_f[0]) if fit_nm else float(nm0)
    history = np.asarray(history[:, 0])
    F2_fit = dict(F2)
    F2_fit["Nm"] = np.full_like(np.asarray(F2["Nm"], dtype=float), nm_opt)
    F2_fit["hm"] = np.full_like(np.asarray(F2["Nm"], dtype=float), hm_opt)
    F2_fit[key2] = np.full_like(np.asarray(F2["Nm"], dtype=float), bb_opt)
    vh_fit, EDP_fit = model_VH(F2_fit, dict(F1), dict(E), f_in, alt, b_mag,
                               b_psi, mode=mode, n_points=n_points,
                               bottom_type=bottom_type)
    return vh_fit, EDP_fit, F2_fit, np.asarray(history)


def _solve_small(A, b):
    """Batched solve for the tiny LM normal equations.

    Closed-form Cramer solves for the 2/3-parameter systems — TPU's
    LuDecomposition custom-call has no f64 batched kernel, and an explicit
    determinant solve is cheaper than LU at this size anyway.
    """
    n = A.shape[-1]
    if n == 2:
        det = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
        det = jnp.where(det == 0.0, 1e-300, det)
        x0 = (b[..., 0] * A[..., 1, 1] - b[..., 1] * A[..., 0, 1]) / det
        x1 = (A[..., 0, 0] * b[..., 1] - A[..., 1, 0] * b[..., 0]) / det
        return jnp.stack([x0, x1], axis=-1)
    if n == 3:
        c00 = A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1]
        c01 = A[..., 1, 2] * A[..., 2, 0] - A[..., 1, 0] * A[..., 2, 2]
        c02 = A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0]
        det = (A[..., 0, 0] * c00 + A[..., 0, 1] * c01 + A[..., 0, 2] * c02)
        det = jnp.where(det == 0.0, 1e-300, det)
        c10 = A[..., 0, 2] * A[..., 2, 1] - A[..., 0, 1] * A[..., 2, 2]
        c11 = A[..., 0, 0] * A[..., 2, 2] - A[..., 0, 2] * A[..., 2, 0]
        c12 = A[..., 0, 1] * A[..., 2, 0] - A[..., 0, 0] * A[..., 2, 1]
        c20 = A[..., 0, 1] * A[..., 1, 2] - A[..., 0, 2] * A[..., 1, 1]
        c21 = A[..., 0, 2] * A[..., 1, 0] - A[..., 0, 0] * A[..., 1, 2]
        c22 = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
        x0 = (b[..., 0] * c00 + b[..., 1] * c10 + b[..., 2] * c20) / det
        x1 = (b[..., 0] * c01 + b[..., 1] * c11 + b[..., 2] * c21) / det
        x2 = (b[..., 0] * c02 + b[..., 1] * c12 + b[..., 2] * c22) / det
        return jnp.stack([x0, x1, x2], axis=-1)
    return jnp.linalg.solve(A, b[..., None])[..., 0]


@partial(jax.jit, static_argnames=("mode", "n_points", "bottom_type",
                                   "steps", "fit_nm", "crit_margin"))
def _lm_batch_core(hm0, bb0, nm0, B_top, Es, P, B1_fix, f, obs, alt_j,
                   bmag_j, bpsi_j, *, mode, n_points, bottom_type, steps,
                   fit_nm, crit_margin):
    """One XLA program: `steps` parallel LM iterations over [B] ionograms.

    Per-sample damping (λ) with accept/reject via masks — a rejected sample
    keeps its state and raises λ while its batch-mates proceed. Fixed step
    count (no host round-trips inside the loop).
    """
    mm = mode_multiplier(mode)
    obs_ok = jnp.isfinite(obs) & jnp.isfinite(f)[None, :]
    hmE = Es["hm"]
    B = obs.shape[0]
    bmag_b = jnp.broadcast_to(bmag_j, (B, bmag_j.shape[-1]))
    bpsi_b = jnp.broadcast_to(bpsi_j, (B, bpsi_j.shape[-1]))

    # parameter vector layout matches retrieve_gradient's sorted-key order
    x0 = jnp.stack([jnp.log(bb0), jnp.log(hm0)]
                   + ([jnp.log(nm0)] if fit_nm else []), axis=1)   # [B, Pn]

    def edp_s(x, nm0_s):
        bb = jnp.exp(x[0])
        hm = jnp.exp(x[1])
        nm = jnp.exp(x[2]) if fit_nm else nm0_s
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
        return EDP, nm

    def forward_b(xb):
        """[B, Pn] → (vh [B, F] NaN-for-escaped, nm [B]).

        The whole batch goes through the gather-free sweep forward
        (:func:`pyrayhf_tpu.pallas_vh.ionogram_fast_xla`) — one fused
        program, fast on TPU, and cheap under forward-mode AD (reverse
        mode through the per-sample parity operator materialised ~30 GB
        of activations at B=256).
        """
        dens, nm = jax.vmap(edp_s)(xb, nm0)
        vh = ionogram_fast_xla(f, dens, bmag_b, bpsi_b, alt_j,
                               mode_mult=mm, n_points=n_points)
        return vh, nm

    def res_b(xb):
        vh, nm = forward_b(xb)
        valid = ~jnp.isnan(vh)
        fo_model = jnp.sqrt(nm) * 8.97866275 / 1e6          # MHz
        in_band = obs_ok & (f[None, :] < crit_margin * fo_model[:, None])
        use = valid & in_band
        r = jnp.where(use, obs - vh, 0.0)
        return jnp.where(in_band & ~valid, 1e3, r)

    n_par = x0.shape[1]
    eyeP = jnp.eye(n_par, dtype=x0.dtype)

    def jac_b(xb):
        """[B, F, Pn] via Pn forward-mode JVP sweeps (samples independent,
        so one batched tangent per parameter covers the whole batch)."""
        cols = [jax.jvp(res_b, (xb,),
                        (jnp.broadcast_to(eyeP[k], xb.shape),))[1]
                for k in range(n_par)]
        return jnp.stack(cols, axis=-1)

    def lm_step(state, _):
        x, lam, cost = state
        J = jac_b(x)                                        # [B, F, Pn]
        JtJ = jnp.einsum("bfi,bfj->bij", J, J)
        r = res_b(x)                                        # [B, F]
        Jtr = jnp.einsum("bfi,bf->bi", J, r)
        diag = jnp.maximum(jnp.diagonal(JtJ, axis1=1, axis2=2), 1e-12)

        # inner damping retries (same semantics as retrieve_gradient's
        # 8-try loop, vectorised: samples that accepted stop updating)
        def try_lam(carry, _):
            x_acc, lam, cost, done = carry
            A = JtJ + (lam[:, None] * diag)[:, :, None] * eyeP[None]
            delta = _solve_small(A, Jtr)
            x_new = x - delta
            cost_new = jnp.sum(res_b(x_new) ** 2, axis=1)
            ok = ~done & jnp.isfinite(cost_new) & (cost_new < cost)
            x_acc = jnp.where(ok[:, None], x_new, x_acc)
            cost = jnp.where(ok, cost_new, cost)
            lam = jnp.where(done, lam,
                            jnp.where(ok, jnp.maximum(lam / 3.0, 1e-10),
                                      jnp.minimum(lam * 10.0, 1e8)))
            return (x_acc, lam, cost, done | ok), None

        done0 = jnp.zeros(x.shape[0], dtype=bool)
        (x, lam, cost, _), _ = jax.lax.scan(try_lam, (x, lam, cost, done0),
                                            None, length=4)
        return (x, lam, cost), cost

    cost0 = jnp.sum(res_b(x0) ** 2, axis=1)
    lam0 = jnp.full(x0.shape[0], 1e-2, dtype=x0.dtype)
    (x, _, _), history = jax.lax.scan(lm_step, (x0, lam0, cost0), None,
                                      length=steps)

    EDP_fit, nm_fit = jax.vmap(edp_s)(x, nm0)
    vh_fit, _ = forward_b(x)
    hm_fit = jnp.exp(x[:, 1])
    bb_fit = jnp.exp(x[:, 0])
    return vh_fit, EDP_fit, hm_fit, bb_fit, nm_fit, history


def retrieve_gradient_batch(F2, F1, E, f_in, vh_obs, alt, b_mag, b_psi,
                            mode=None, n_points=None, bottom_type=None,
                            steps=None, fit_nm=False, crit_margin=None,
                            chunk_size=64, dtype=None,
                            checkpoint_path=None, config=None,
                            retries=1, retry_cost=10.0):
    """Batched gradient retrieval: [B, F] ionograms → [B] fits, one launch.

    The serving-scale variant of :func:`retrieve_gradient`: every LM
    iteration (vmapped exact jacobians, batched 3×3 normal-equation solves,
    per-sample damping) runs inside a single jitted ``lax.scan`` — no host
    round-trips, so wall clock is ~independent of how many ionograms share
    the launch up to the chip's compute limit. The reference's lmfit loop
    (ref ``library.py:672-825``) retrieves one ionogram per minimize call.

    ``vh_obs`` is [B, F]; entries of ``F2`` may be scalars (shared initial
    guess) or [B] arrays (per-sample). ``b_mag``/``b_psi`` may be [N]
    (one magnetic environment shared by the batch) or [B, N]
    (per-sample environments — the global-grid case, where every cell
    has its own IGRF field; e.g. from
    :func:`pyrayhf_tpu.envgen.generate_input_3D`). ``F1``/``E``
    parameters and the altitude grid ``alt`` are shared across the
    batch. Returns (vh_fit [B, F], EDP_fit [B, N], F2_fit dict of [B]
    arrays, history [steps, B] squared-residual trace).

    ``chunk_size`` splits the batch across launches (reusing one compiled
    executable) — relayed TPU workers kill single executions that run too
    long (observed: ~45 s fine, ~90 s fatal); ``None`` = one launch.

    ``dtype`` selects the working precision (default: the x64 default
    float). ``jnp.float32`` is much faster on TPU (f64 there is emulated
    double-float); the analytic-margin forward holds ~0.02 km in f32, so
    the attainable cost floor rises from ~1e-18 to roughly
    (0.02 km)²·N_freq — ample for real ionogram noise levels.

    ``checkpoint_path`` enables chunk-granular resume for long batched
    inversions (SURVEY §5 checkpoint row): after each completed chunk the
    fitted state is persisted via :func:`pyrayhf_tpu.io.save_checkpoint`;
    if the file already exists, completed chunks are loaded instead of
    recomputed, reproducing the uninterrupted fit exactly. The file is
    removed on successful completion.

    A :class:`pyrayhf_tpu.config.RetrievalConfig` passed as ``config``
    supplies mode/n_points/bottom_type/steps (``lm_steps``)/``crit_margin``
    when not given explicitly.

    ``retries``: samples whose final squared-residual cost exceeds
    ``retry_cost`` (LM stalled in a local minimum — measured ~1.5% of a
    broad synthetic population; retries=1 recovers most, retries=2 all of
    them) are re-run up to ``retries`` times from a perturbed initial
    guess, keeping whichever fit costs less. Each retry is one extra
    launch over just the stalled samples. For noisy observations set
    ``retry_cost`` ≳ 2 × (noise_km² · N_freq) so the noise floor does not
    trigger pointless retries.
    """
    from .config import resolve
    mode = resolve(config, "mode", mode, "O")
    n_points = resolve(config, "n_points", n_points, 200)
    bottom_type = resolve(config, "bottom_type", bottom_type, "B_bot")
    steps = resolve(config, "lm_steps", steps, 25)
    crit_margin = resolve(config, "crit_margin", crit_margin, 0.995)
    dt = jnp.asarray(0.0, dtype=float).dtype if dtype is None else dtype
    obs = jnp.atleast_2d(jnp.asarray(vh_obs, dtype=dt))
    B = obs.shape[0]
    f = jnp.asarray(f_in, dtype=dt)
    alt_j = jnp.asarray(alt, dtype=dt)

    def _env(v, name):
        a = jnp.asarray(v, dtype=dt)
        if a.ndim == 1:
            return a
        if a.ndim == 2 and a.shape[0] in (1, B):
            return jnp.broadcast_to(a, (B, a.shape[-1]))
        raise ValueError(f"{name} must be [N] or [B, N]; got {a.shape} "
                         f"for B={B}")

    bmag_j = _env(b_mag, "b_mag")
    bpsi_j = _env(b_psi, "b_psi")

    def _env_take(a, sel):
        """Slice/index the batch axis of an environment array (no-op 1-D)."""
        return a if a.ndim == 1 else a[sel]

    def per_sample(v):
        a = jnp.asarray(v, dtype=dt).reshape(-1)
        return jnp.broadcast_to(a, (B,)) if a.shape[0] in (1, B) else a

    hm0 = per_sample(F2["hm"])
    key2 = "B_bot" if bottom_type == "B_bot" else "B0"
    bb0 = per_sample(F2[key2])

    if fit_nm:
        nm0 = per_sample(F2["Nm"])
    else:
        # per-sample NmF2 pin from the highest finite observed frequency
        # (ref :760-778 semantics, vectorised over the batch)
        obs_ok = jnp.isfinite(obs) & jnp.isfinite(f)[None, :]
        fmax_hz = jnp.max(jnp.where(obs_ok, f[None, :], -jnp.inf),
                          axis=1) * 1e6
        if mode == "O":
            nm0 = freq2den(fmax_hz) * 1.0001
        else:
            ind = jax.vmap(lambda h: jnp.argmin(jnp.abs(alt_j - h)))(hm0)
            f_c = (bmag_j[ind] if bmag_j.ndim == 1
                   else bmag_j[jnp.arange(B), ind]) * G_P
            nm0 = freq2den(jnp.sqrt(fmax_hz ** 2 - fmax_hz * f_c)) * 1.0001

    B_top = jnp.asarray(_scalar(F2["B_top"]), dt)
    Es = {k: jnp.asarray(_scalar(E[k]), dt)
          for k in ("Nm", "hm", "B_bot", "B_top")}
    P = jnp.asarray(_scalar(F1["P"]) if "P" in F1 else 0.0, dt)
    B1_fix = jnp.asarray(_scalar(F2["B1"]) if bottom_type == "B0_B1"
                         else 0.0, dt)
    nm0 = jnp.asarray(nm0, dt)

    # chunk the batch axis across launches: one LM program for a large B
    # is a single long device execution, and relayed/tunnelled TPU workers
    # enforce a per-launch wall-time watchdog (observed: B=64 at ~45 s per
    # launch fine, B=128 kills the worker). Chunks reuse the same compiled
    # executable, so the only cost is launch overhead per chunk.
    slices = ([slice(lo, min(lo + chunk_size, B))
               for lo in range(0, B, chunk_size)] if chunk_size
              else [slice(0, B)])

    ckpt = None
    if checkpoint_path is not None:
        import os
        from . import io as _io
        # the FULL configuration must match for chunk reuse to be sound —
        # a resume under different physics would silently mix results
        cfg_now = {"B": B, "steps": steps, "n_chunks": len(slices),
                   "n_points": n_points, "mode_O": int(mode == "O"),
                   "bottom_B_bot": int(bottom_type == "B_bot"),
                   "fit_nm": int(bool(fit_nm)),
                   "crit_margin_e6": int(round(crit_margin * 1e6)),
                   "dtype_itemsize": int(np.dtype(dt).itemsize)}
        if os.path.exists(checkpoint_path):
            ckpt = _io.load_checkpoint(checkpoint_path)
            meta = ckpt["meta"]
            mismatch = [k for k, v in cfg_now.items()
                        if int(meta.get(k, -1)) != int(v)]
            if mismatch:
                raise ValueError(
                    f"checkpoint {checkpoint_path} was written for a "
                    f"different retrieval configuration (mismatched: "
                    f"{mismatch})")
        else:
            ckpt = {"meta": dict(cfg_now, chunks_done=0), "chunks": {}}

    _PART_KEYS = ("vh_fit", "EDP_fit", "hm", "bb", "nm", "history")
    parts = []
    for ci, sl in enumerate(slices):
        if ckpt is not None and ci < int(ckpt["meta"]["chunks_done"]):
            c = ckpt["chunks"][str(ci)]
            parts.append(tuple(jnp.asarray(c[k], dt) for k in _PART_KEYS))
            continue
        out = _lm_batch_core(
            hm0[sl], bb0[sl], nm0[sl], B_top, Es, P, B1_fix, f, obs[sl],
            alt_j, _env_take(bmag_j, sl), _env_take(bpsi_j, sl),
            mode=mode, n_points=n_points,
            bottom_type=bottom_type, steps=steps, fit_nm=fit_nm,
            crit_margin=crit_margin)
        parts.append(out)
        if ckpt is not None:
            ckpt["chunks"][str(ci)] = {
                k: np.asarray(v) for k, v in zip(_PART_KEYS, out)}
            ckpt["meta"]["chunks_done"] = ci + 1
            _io.save_checkpoint(ckpt, checkpoint_path)
    if ckpt is not None:
        import os
        if os.path.exists(checkpoint_path):
            os.remove(checkpoint_path)

    # single assembly path: merge the chunk results, then (optionally)
    # retry stalled samples from a perturbed initial guess, keeping the
    # better of the two fits per sample
    if len(parts) == 1:
        vh_c, edp_c = parts[0][0], parts[0][1]
        hist_c = parts[0][5]
    else:
        vh_c = jnp.concatenate([p[0] for p in parts], axis=0)
        edp_c = jnp.concatenate([p[1] for p in parts], axis=0)
        hist_c = jnp.concatenate([p[5] for p in parts], axis=1)
    hm_c = np.concatenate([np.asarray(p[2]) for p in parts])
    bb_c = np.concatenate([np.asarray(p[3]) for p in parts])
    nm_c = np.concatenate([np.asarray(p[4]) for p in parts])
    cost_f = np.array(hist_c[-1])

    hm0_n, bb0_n = np.asarray(hm0), np.asarray(bb0)
    for attempt in range(int(retries)):
        bad = np.nonzero(cost_f > retry_cost)[0]
        if bad.size == 0:
            break
        # pad the stalled set to a small fixed size (bounds the number
        # of distinct compiled batch shapes)
        pad_to = 1 << max(int(np.ceil(np.log2(bad.size))), 0)
        idx = np.concatenate([bad, np.full(pad_to - bad.size, bad[0],
                                           dtype=bad.dtype)])
        fac = 1.0 + 0.1 * (attempt + 1)
        r = _lm_batch_core(
            jnp.asarray(hm0_n[idx] * fac, dt),
            jnp.asarray(bb0_n[idx] / fac, dt),
            nm0[idx], B_top, Es, P, B1_fix, f, obs[idx],
            alt_j, _env_take(bmag_j, idx), _env_take(bpsi_j, idx),
            mode=mode, n_points=n_points,
            bottom_type=bottom_type, steps=steps, fit_nm=fit_nm,
            crit_margin=crit_margin)
        r_cost = np.asarray(r[5][-1])
        for k, i in enumerate(bad):
            if r_cost[k] < cost_f[i]:
                vh_c = vh_c.at[i].set(r[0][k])
                edp_c = edp_c.at[i].set(r[1][k])
                hm_c[i] = float(r[2][k])
                bb_c[i] = float(r[3][k])
                nm_c[i] = float(r[4][k])
                hist_c = hist_c.at[:, i].set(r[5][:, k])
                cost_f[i] = r_cost[k]

    F2_fit = dict(F2)
    F2_fit["Nm"] = nm_c
    F2_fit["hm"] = hm_c
    F2_fit[key2] = bb_c
    return vh_c, edp_c, F2_fit, np.asarray(hist_c)
