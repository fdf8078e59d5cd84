"""Gradient (ray-ODE) oblique tracers, Cartesian and spherical.

TPU-first re-design of the reference's ``solve_ivp``-based tracers
(``trace_ray_cartesian_gradient`` ref ``library.py:1271-1457``,
``trace_ray_spherical_gradient`` ref :2128-2337, RHS :953-1006 and
:2020-2125):

* SciPy's adaptive RK45 with a Python-callback RHS (~ms per call) becomes a
  fixed-step RK4 integrator inside ``lax.scan`` with a fused bilinear-interp
  RHS — thousands of rays integrate in one XLA launch via ``vmap``;
* terminal events (ground/top/lateral bounds, ref :1009-1031) become
  per-step masks: on the step that crosses a boundary the state is linearly
  backtracked to the crossing and frozen thereafter (static shapes);
* the direction vector is renormalised every step (cheaper than the
  reference's every-50-evals counter and strictly better conditioned).

Ray equations (Haselgrove/Budden):
  Cartesian: dr/ds = v,  dv/ds = (∇μ − (∇μ·v)v)/μ
  Spherical: dr/ds = v_r, dφ/ds = v_φ/r,
             dv_r/ds = (μ_r − (∇μ·v)v_r)/μ + v_φ²/r
             dv_φ/ds = (μ_φ/r − (∇μ·v)v_φ)/μ − v_r v_φ/r
"""

from functools import partial

import jax
import jax.numpy as jnp

from .constants import C_KM_S, R_E

__all__ = ["trace_ray_cartesian_gradient", "trace_ray_spherical_gradient",
           "trace_rays_cartesian_gradient", "trace_rays_spherical_gradient"]

_STATUS = {"length": 0, "ground": 1, "domain": 2}


def _rk4_step(rhs, y, ds):
    k1 = rhs(y)
    k2 = rhs(y + 0.5 * ds * k1)
    k3 = rhs(y + 0.5 * ds * k2)
    k4 = rhs(y + ds * k3)
    return y + (ds / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def _integrate(rhs, y0, n_steps, ds, event_value):
    """Scan a fixed-step RK4 with freeze-on-event semantics.

    ``event_value(y)`` returns a vector of signed boundary distances
    (positive inside the domain, matching the reference's event functions);
    the first nonpositive entry terminates the ray. On the terminating step
    the state is linearly backtracked to the crossing.
    Returns (ys [n_steps+1, dim], alive [n_steps+1], status_code).
    """

    def step(carry, _):
        y, alive, status = carry

        def do_step(y):
            y_new = _rk4_step(rhs, y, ds)
            # renormalise the direction components (slots 2:4)
            v = y_new[2:4]
            vmag = jnp.linalg.norm(v)
            v = jnp.where(vmag > 0, v / jnp.where(vmag > 0, vmag, 1.0), v)
            return y_new.at[2:4].set(v)

        y_new = do_step(y)
        ev_old = event_value(y)
        ev_new = event_value(y_new)
        crossed = (ev_new <= 0.0) & (ev_old > 0.0)
        any_cross = jnp.any(crossed) & alive
        # linear backtrack to the first crossing
        j = jnp.argmax(crossed)
        denom = ev_old[j] - ev_new[j]
        t = jnp.where(denom != 0.0,
                      ev_old[j] / jnp.where(denom != 0.0, denom, 1.0), 1.0)
        t = jnp.clip(t, 0.0, 1.0)
        y_cross = y + t * (y_new - y)
        y_next = jnp.where(alive, jnp.where(any_cross, y_cross, y_new), y)
        ground_hit = any_cross & (j == 0)
        new_status = jnp.where(
            any_cross,
            jnp.where(ground_hit, _STATUS["ground"], _STATUS["domain"]),
            status)
        alive_next = alive & ~any_cross
        # a dead RHS (NaN μ region) also freezes the ray
        bad = ~jnp.all(jnp.isfinite(y_next))
        y_next = jnp.where(bad, y, y_next)
        alive_next = alive_next & ~bad
        return (y_next, alive_next, new_status), (y_next, alive_next)

    init = (y0, jnp.asarray(True), jnp.asarray(_STATUS["length"]))
    (_, _, status), (ys, alive) = jax.lax.scan(step, init, None,
                                               length=n_steps)
    ys = jnp.concatenate([y0[None], ys], axis=0)
    alive = jnp.concatenate([jnp.asarray(True)[None], alive])
    return ys, alive, status


def _path_metrics(x_path, z_path, ds_seg, mup_mid, status):
    group_path = jnp.nansum(ds_seg)
    valid = jnp.isfinite(mup_mid)
    group_delay = jnp.nansum(
        jnp.where(valid, mup_mid / C_KM_S * ds_seg, 0.0))
    apex_idx = jnp.nanargmax(z_path)
    x_apex = x_path[apex_idx]
    z_apex = z_path[apex_idx]
    s_cum = jnp.cumsum(ds_seg)
    mid_idx = jnp.searchsorted(s_cum, 0.5 * group_path)
    x_mid = x_path[mid_idx]
    z_mid = z_path[mid_idx]
    landed = status == _STATUS["ground"]
    ground_range = jnp.where(landed, x_path[-1], jnp.nan)
    return {"group_path_km": group_path, "group_delay_sec": group_delay,
            "x_midpoint": x_mid, "z_midpoint": z_mid,
            "ground_range_km": ground_range,
            "x_apex_km": x_apex, "z_apex_km": z_apex}


@partial(jax.jit, static_argnames=("n_and_grad", "mup_func", "n_steps"))
def _cart_gradient_core(n_and_grad, mup_func, x0, z0, elevation_deg, ds,
                        n_steps, z_ground, z_max, x_min, x_max):
    elev = jnp.deg2rad(elevation_deg)
    v0 = jnp.array([jnp.cos(elev), jnp.sin(elev)])
    v0 = v0 / jnp.linalg.norm(v0)
    y0 = jnp.array([x0, z0, v0[0], v0[1]])

    def rhs(y):
        x, z, vx, vz = y
        n, dndx, dndz = n_and_grad(x, z)
        ok = jnp.isfinite(n) & (n > 0.0)
        n_s = jnp.where(ok, n, 1.0)
        gdv = dndx * vx + dndz * vz
        d = jnp.array([vx, vz, (dndx - gdv * vx) / n_s,
                       (dndz - gdv * vz) / n_s])
        return jnp.where(ok, d, jnp.zeros(4))

    def events(y):
        # ground, top, left, right (ref :1370-1373); positive == inside
        return jnp.array([y[1] - z_ground - 1e-3, z_max - y[1],
                          y[0] - x_min, x_max - y[0]])

    ys, alive, status = _integrate(rhs, y0, n_steps, ds, events)
    x_path, z_path = ys[:, 0], ys[:, 1]
    dx = jnp.diff(x_path)
    dz = jnp.diff(z_path)
    ds_seg = jnp.hypot(dx, dz)
    x_m = 0.5 * (x_path[:-1] + x_path[1:])
    z_m = 0.5 * (z_path[:-1] + z_path[1:])
    mup_mid = mup_func(x_m, z_m)
    out = _path_metrics(x_path, z_path, ds_seg, mup_mid, status)
    out.update({"x": x_path, "z": z_path, "vx": ys[:, 2], "vz": ys[:, 3],
                "status_code": status, "alive": alive})
    return out


def trace_ray_cartesian_gradient(n_and_grad, mup_func, x0_km, z0_km,
                                 elevation_deg, s_max_km=5000.0, *,
                                 step_km=1.0, z_ground_km=0.0,
                                 z_min_km=-1.0, z_max_km=1000.0,
                                 x_min_km=-1e6, x_max_km=1e6,
                                 rtol=None, atol=None, max_step_km=None,
                                 renormalize_every=None):
    """2-D Cartesian ray-ODE trace; API-parity with ref :1271-1457.

    ``rtol``/``atol``/``max_step_km``/``renormalize_every`` are accepted for
    API compatibility; the integrator is fixed-step RK4 of size ``step_km``
    (use a smaller step instead of tolerances).
    """
    del rtol, atol, renormalize_every, z_min_km
    if max_step_km is not None:
        step_km = min(step_km, float(max_step_km))
    if mup_func is None:
        raise ValueError(
            "mup_func must be provided, build it with build_mup_function.")
    n_steps = int(round(float(s_max_km) / float(step_km)))
    out = _cart_gradient_core(n_and_grad, mup_func,
                              jnp.asarray(x0_km, dtype=float),
                              jnp.asarray(z0_km, dtype=float),
                              jnp.asarray(elevation_deg, dtype=float),
                              jnp.asarray(step_km, dtype=float), n_steps,
                              jnp.asarray(z_ground_km, dtype=float),
                              jnp.asarray(z_max_km, dtype=float),
                              jnp.asarray(x_min_km, dtype=float),
                              jnp.asarray(x_max_km, dtype=float))
    code = int(out.pop("status_code"))
    out["status"] = {v: k for k, v in _STATUS.items()}[code]
    out["t"] = None
    return out


def trace_rays_cartesian_gradient(n_and_grad, mup_func, x0_km, z0_km,
                                  elevation_deg, s_max_km=5000.0, *,
                                  step_km=1.0, z_ground_km=0.0,
                                  z_max_km=1000.0, x_min_km=-1e6,
                                  x_max_km=1e6):
    """Batched Cartesian ODE fan over elevations [E] — one XLA launch."""
    n_steps = int(round(float(s_max_km) / float(step_km)))
    fn = partial(_cart_gradient_core, n_and_grad, mup_func, n_steps=n_steps)
    return jax.vmap(lambda el: fn(
        jnp.asarray(x0_km, dtype=float), jnp.asarray(z0_km, dtype=float),
        el, jnp.asarray(step_km, dtype=float),
        z_ground=jnp.asarray(z_ground_km, dtype=float),
        z_max=jnp.asarray(z_max_km, dtype=float),
        x_min=jnp.asarray(x_min_km, dtype=float),
        x_max=jnp.asarray(x_max_km, dtype=float)))(
            jnp.asarray(elevation_deg, dtype=float))


@partial(jax.jit, static_argnames=("n_and_grad_rphi", "mup_func", "n_steps"))
def _sph_gradient_core(n_and_grad_rphi, mup_func, x0, z0, elevation_deg, ds,
                       n_steps, re, z_ground, r_max, phi_min, phi_max):
    r0 = re + z0
    phi0 = x0 / re
    elev = jnp.deg2rad(elevation_deg)
    y0 = jnp.array([r0, phi0, jnp.sin(elev), jnp.cos(elev)])

    def rhs(y):
        r, phi, v_r, v_phi = y
        mu, mu_r, mu_phi = n_and_grad_rphi(phi, r)
        ok = jnp.isfinite(mu) & (mu > 0.0)
        mu_s = jnp.where(ok, mu, 1.0)
        gdv = mu_r * v_r + (mu_phi / r) * v_phi
        d = jnp.array([
            v_r,
            v_phi / r,
            (mu_r - gdv * v_r) / mu_s + v_phi ** 2 / r,
            ((mu_phi / r) - gdv * v_phi) / mu_s - v_r * v_phi / r,
        ])
        return jnp.where(ok, d, jnp.zeros(4))

    def events(y):
        # ground, top, phi bounds (ref :2239-2243); positive == inside
        return jnp.array([y[0] - (re + z_ground) - 1e-3, r_max - y[0],
                          y[1] - phi_min, phi_max - y[1]])

    ys, alive, status = _integrate(rhs, y0, n_steps, ds, events)
    r_path, phi_path = ys[:, 0], ys[:, 1]
    x_path = re * phi_path
    z_path = r_path - re
    dr = jnp.diff(r_path)
    dphi = jnp.diff(phi_path)
    r_mid = 0.5 * (r_path[:-1] + r_path[1:])
    ds_seg = jnp.sqrt(dr ** 2 + (r_mid * dphi) ** 2)
    x_m = 0.5 * (x_path[:-1] + x_path[1:])
    z_m = 0.5 * (z_path[:-1] + z_path[1:])
    mup_mid = mup_func(x_m, z_m)
    out = _path_metrics(x_path, z_path, ds_seg, mup_mid, status)
    out.update({"x": x_path, "z": z_path, "r": r_path, "phi": phi_path,
                "v_r": ys[:, 2], "v_phi": ys[:, 3],
                "status_code": status, "alive": alive})
    return out


def trace_ray_spherical_gradient(n_and_grad_rphi, mup_func, x0_km, z0_km,
                                 elevation_deg, s_max_km=6000.0, *,
                                 R_E=None, z_ground_km=0.0, r_max_km=None,
                                 phi_min=-jnp.pi, phi_max=jnp.pi,
                                 step_km=1.0, rtol=None, atol=None,
                                 max_step_km=2.0, renormalize_every=None):
    """2-D spherical ray-ODE trace; API-parity with ref :2128-2337."""
    del rtol, atol, renormalize_every
    if mup_func is None:
        raise ValueError("mup_func must be provided — build it with "
                         "build_mup_function(..., geometry='spherical').")
    re = globals()["R_E"] if R_E is None else float(R_E)
    if r_max_km is None:
        r_max_km = re + 1200.0
    if max_step_km is not None:
        step_km = min(step_km, float(max_step_km))
    n_steps = int(round(float(s_max_km) / float(step_km)))
    out = _sph_gradient_core(n_and_grad_rphi, mup_func,
                             jnp.asarray(x0_km, dtype=float),
                             jnp.asarray(z0_km, dtype=float),
                             jnp.asarray(elevation_deg, dtype=float),
                             jnp.asarray(step_km, dtype=float), n_steps,
                             jnp.asarray(re, dtype=float),
                             jnp.asarray(z_ground_km, dtype=float),
                             jnp.asarray(r_max_km, dtype=float),
                             jnp.asarray(phi_min, dtype=float),
                             jnp.asarray(phi_max, dtype=float))
    code = int(out.pop("status_code"))
    out["status"] = {v: k for k, v in _STATUS.items()}[code]
    out["t"] = None
    return out


def trace_rays_spherical_gradient(n_and_grad_rphi, mup_func, x0_km, z0_km,
                                  elevation_deg, s_max_km=6000.0, *,
                                  R_E=None, z_ground_km=0.0, r_max_km=None,
                                  phi_min=-jnp.pi, phi_max=jnp.pi,
                                  step_km=1.0):
    """Batched spherical ODE fan over elevations [E] — one XLA launch."""
    re = globals()["R_E"] if R_E is None else float(R_E)
    if r_max_km is None:
        r_max_km = re + 1200.0
    n_steps = int(round(float(s_max_km) / float(step_km)))
    fn = partial(_sph_gradient_core, n_and_grad_rphi, mup_func,
                 n_steps=n_steps)
    return jax.vmap(lambda el: fn(
        jnp.asarray(x0_km, dtype=float), jnp.asarray(z0_km, dtype=float),
        el, jnp.asarray(step_km, dtype=float),
        re=jnp.asarray(re, dtype=float),
        z_ground=jnp.asarray(z_ground_km, dtype=float),
        r_max=jnp.asarray(r_max_km, dtype=float),
        phi_min=jnp.asarray(phi_min, dtype=float),
        phi_max=jnp.asarray(phi_max, dtype=float)))(
            jnp.asarray(elevation_deg, dtype=float))
