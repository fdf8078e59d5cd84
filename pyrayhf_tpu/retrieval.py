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


import jax
import jax.numpy as jnp
import numpy as np

from . import edp
from .constants import G_P
from .forward import vertical_forward_operator, vh_and_mask
from .magnetoionic import freq2den, mode_multiplier

__all__ = ["model_VH", "residual_VH", "minimize_parameters",
           "retrieve_gradient"]


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
             bottom_type="B_bot"):
    """Virtual heights from layer parameters (ref :512-592).

    Returns (vh [N_freq], EDP [N_alt]). Unlike the reference, the input
    ``F1`` dict is NOT mutated; the derived F1 parameters are internal.
    """
    alt = jnp.asarray(alt, dtype=float)
    EDP, _ = _build_edp(F2, F1, E, alt, bottom_type)
    vh = vertical_forward_operator(jnp.asarray(f_in, dtype=float), EDP,
                                   jnp.asarray(b_mag, dtype=float),
                                   jnp.asarray(b_psi, dtype=float),
                                   alt, mode=mode, n_points=n_points)
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
                        method="brute", percent_sigma=20.0, step=1.0,
                        mode="O", n_points=200, bottom_type="B_bot"):
    """Fit hmF2 and B_bot (or B0) to observed VH (ref :672-825).

    lmfit-brute grid semantics (``arange(min, max, step)`` per axis) but the
    entire grid of forward operators runs as one vmapped XLA program.
    ``method='levenberg-marquardt'`` delegates to :func:`retrieve_gradient`
    (exact-jacobian LM — strictly stronger than lmfit's finite-difference
    version). Returns (vh_fit, EDP_fit, F2_fit).
    """
    if method in ("levenberg-marquardt", "leastsq"):
        if bottom_type != "B_bot":
            raise ValueError("levenberg-marquardt retrieval supports B_bot")
        vh_fit, EDP_fit, F2_fit, _ = retrieve_gradient(
            F2, F1, E, f_in0, vh_obs0, alt, b_mag, b_psi, mode=mode,
            n_points=n_points, bottom_type=bottom_type)
        return vh_fit, EDP_fit, F2_fit
    if method not in ("brute",):
        raise ValueError(
            "method must be 'brute' or 'levenberg-marquardt' (the "
            "reference's 'powell' relied on lmfit; use the vmapped brute "
            "grid or gradient LM instead)")
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

    hm_grid = np.arange(old_hmf2 - sigma_hmf2, old_hmf2 + sigma_hmf2, step)
    b_grid = np.arange(old_b - sigma_b, old_b + sigma_b, step)
    HM, BB = np.meshgrid(hm_grid, b_grid, indexing="ij")
    hm_flat = jnp.asarray(HM.ravel())
    b_flat = jnp.asarray(BB.ravel())

    def cost(hm, b):
        params = {"NmF2": Nm_new, "hmF2": hm, key2: b}
        if bottom_type == "B0_B1":
            params["B1"] = _scalar(F2["B1"])
        r = residual_VH(params, F2, F1, E, jnp.asarray(f_in),
                        jnp.asarray(vh_obs), alt, b_mag, b_psi, mode=mode,
                        n_points=n_points, bottom_type=bottom_type)
        return jnp.sum(r * r)

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

    Returns (vh_fit, EDP_fit, F2_fit, history) where history is the
    mean-squared-residual trace per accepted iteration.
    """
    del learning_rate
    f = jnp.asarray(f_in, dtype=float)
    obs = jnp.asarray(vh_obs, dtype=float)
    obs_ok = jnp.isfinite(obs) & jnp.isfinite(f)
    alt_j = jnp.asarray(alt, dtype=float)
    bmag_j = jnp.asarray(b_mag, dtype=float)
    bpsi_j = jnp.asarray(b_psi, dtype=float)
    mm = mode_multiplier(mode)

    hm0 = _scalar(F2["hm"])
    key2 = "B_bot" if bottom_type == "B_bot" else "B0"
    bb0 = _scalar(F2[key2])
    old_hm = float(hm0)
    nm0 = (_scalar(F2["Nm"]) if fit_nm
           else _pin_NmF2(jnp.sort(f[obs_ok]), alt_j, bmag_j, old_hm, mode))

    theta0 = {"log_hm": jnp.log(hm0), "log_bb": jnp.log(bb0)}
    if fit_nm:
        theta0["log_nm"] = jnp.log(nm0)

    hmE = _scalar(E["hm"])
    B_top = _scalar(F2["B_top"])
    Es = {k: _scalar(E[k]) for k in ("Nm", "hm", "B_bot", "B_top")}
    P = _scalar(F1["P"]) if "P" in F1 else jnp.asarray(0.0)
    B1_fix = _scalar(F2["B1"]) if bottom_type == "B0_B1" else None

    def forward(theta):
        hm = jnp.exp(theta["log_hm"])
        bb = jnp.exp(theta["log_bb"])
        nm = jnp.exp(theta["log_nm"]) if fit_nm else nm0
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
        vh, valid = vh_and_mask(f, EDP, bmag_j, bpsi_j, alt_j,
                                mode_mult=mm, n_points=n_points)
        return vh, valid

    keys = sorted(theta0.keys())

    def theta_vec(theta):
        return jnp.stack([theta[k] for k in keys])

    def vec_theta(x):
        return {k: x[i] for i, k in enumerate(keys)}

    def residuals(x):
        theta = vec_theta(x)
        vh, valid = forward(theta)
        nm = jnp.exp(theta["log_nm"]) if fit_nm else nm0
        fo_model = jnp.sqrt(nm) * 8.97866275 / 1e6      # MHz
        in_band = obs_ok & (f < crit_margin * fo_model)
        use = valid & in_band
        # an observed ray the model fails to reflect costs a large constant
        # residual — otherwise a parameter step that kills every ray would
        # zero the residuals and masquerade as a perfect fit
        r = jnp.where(use, obs - vh, 0.0)
        r = jnp.where(in_band & ~valid, 1e3, r)
        return r, use

    def res_only(x):
        return residuals(x)[0]

    jac_fn = jax.jit(jax.jacobian(res_only))
    res_fn = jax.jit(res_only)

    # Levenberg–Marquardt with multiplicative damping adaptation.
    x = theta_vec(theta0)
    lam = 1e-2
    history = []
    cost = float(jnp.sum(res_fn(x) ** 2))
    n_par = x.shape[0]
    for _ in range(steps):
        J = jac_fn(x)
        r = res_fn(x)
        JtJ = J.T @ J
        Jtr = J.T @ r
        accepted = False
        for _ in range(8):
            delta = jnp.linalg.solve(
                JtJ + lam * jnp.diag(jnp.maximum(jnp.diag(JtJ), 1e-12)),
                Jtr)
            x_new = x - delta
            cost_new = float(jnp.sum(res_fn(x_new) ** 2))
            if np.isfinite(cost_new) and cost_new < cost:
                x, cost = x_new, cost_new
                lam = max(lam / 3.0, 1e-10)
                accepted = True
                break
            lam = min(lam * 10.0, 1e8)
        history.append(cost)
        if not accepted or float(jnp.linalg.norm(delta)) < 1e-12:
            break

    theta = vec_theta(x)
    hm_opt = float(jnp.exp(theta["log_hm"]))
    bb_opt = float(jnp.exp(theta["log_bb"]))
    nm_opt = float(jnp.exp(theta["log_nm"])) if fit_nm else float(nm0)
    F2_fit = dict(F2)
    F2_fit["Nm"] = np.full_like(np.asarray(F2["Nm"], dtype=float), nm_opt)
    F2_fit["hm"] = np.full_like(np.asarray(F2["Nm"], dtype=float), hm_opt)
    F2_fit[key2] = np.full_like(np.asarray(F2["Nm"], dtype=float), bb_opt)
    vh_fit, EDP_fit = model_VH(F2_fit, dict(F1), dict(E), f_in, alt, b_mag,
                               b_psi, mode=mode, n_points=n_points,
                               bottom_type=bottom_type)
    return vh_fit, EDP_fit, F2_fit, np.asarray(history)
