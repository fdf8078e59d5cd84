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
import numpy as np

from .config import UNSET
from .constants import C_KM_S, R_E

__all__ = ["trace_ray_cartesian_gradient", "trace_ray_spherical_gradient",
           "trace_rays_cartesian_gradient", "trace_rays_spherical_gradient"]

_STATUS = {"length": 0, "ground": 1, "domain": 2, "attempts": 3}


def _rk4_step(rhs, y, ds):
    k1 = rhs(y)
    k2 = rhs(y + 0.5 * ds * k1)
    k3 = rhs(y + 0.5 * ds * k2)
    k4 = rhs(y + ds * k3)
    return y + (ds / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def _make_step(rhs, ds, event_value, reflect_fn, max_bounces, v_slice,
               renorm_fn):
    """Per-ray step function shared by every fixed-step integrator.

    Factored out of :func:`_integrate` so the batched early-exit
    integrator (:func:`_integrate_fan`) can ``vmap`` the identical step
    math — results must agree bitwise between the scan, while_loop and
    fan paths.
    """

    def step(carry, _):
        y, alive, status, bounces = carry

        def do_step(y):
            y_new = _rk4_step(rhs, y, ds)
            if renorm_fn is not None:
                return renorm_fn(y_new)
            # renormalise the direction components
            v = y_new[v_slice]
            vmag = jnp.linalg.norm(v)
            v = jnp.where(vmag > 0, v / jnp.where(vmag > 0, vmag, 1.0), v)
            return y_new.at[v_slice].set(v)

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
        ground_hit = any_cross & (j == 0)
        if reflect_fn is not None:
            bounce = ground_hit & (bounces < max_bounces)
            y_refl = reflect_fn(y_cross)
            y_cross = jnp.where(bounce, y_refl, y_cross)
            bounces = bounces + jnp.where(bounce, 1, 0)
            # a bounce step lands on the (reflected) crossing state, not
            # the raw full step — but must NOT freeze, so it leaves
            # any_cross and takes y_cross explicitly below
            take_cross = any_cross
            any_cross = any_cross & ~bounce
            ground_hit = ground_hit & ~bounce
        else:
            take_cross = any_cross
        y_next = jnp.where(alive, jnp.where(take_cross, y_cross, y_new), y)
        new_status = jnp.where(
            any_cross,
            jnp.where(ground_hit, _STATUS["ground"], _STATUS["domain"]),
            status)
        alive_next = alive & ~any_cross
        # a dead RHS (NaN μ region) also freezes the ray
        bad = ~jnp.all(jnp.isfinite(y_next))
        y_next = jnp.where(bad, y, y_next)
        alive_next = alive_next & ~bad
        return ((y_next, alive_next, new_status, bounces),
                (y_next, alive_next))

    return step


def _integrate(rhs, y0, n_steps, ds, event_value, reflect_slot=None,
               max_bounces=0, v_slice=slice(2, 4), reflect_fn=None,
               renorm_fn=None, early_exit=False):
    """Scan a fixed-step RK4 with freeze-on-event semantics.

    ``event_value(y)`` returns a vector of signed boundary distances
    (positive inside the domain, matching the reference's event functions);
    the first nonpositive entry terminates the ray. On the terminating step
    the state is linearly backtracked to the crossing.

    Multi-hop: with ``reflect_slot`` given (the index of the vertical
    velocity component — 3 for Cartesian v_z, 2 for spherical v_r), the
    first ``max_bounces`` GROUND crossings (event index 0) reflect
    specularly — backtrack to the crossing, flip that slot — instead of
    freezing; the ray freezes on ground hit ``max_bounces + 1``. The
    reference has no multi-hop anywhere (its ground event is terminal,
    ref ``library.py:1009-1012``). A position-dependent mirror (the 3-D
    tracer's local-vertical reflection) passes ``reflect_fn(y) → y``
    instead of a slot.

    ``v_slice``: the direction components renormalised every step
    (2:4 for the 2-D tracers, 3:6 for the 3-D ECEF state).

    ``renorm_fn``: optional per-step state projection ``y → y`` replacing
    the unit-normalisation of ``v_slice`` — the anisotropic Haselgrove
    state carries a refractive-index VECTOR whose magnitude is physics
    (|u| = n on the dispersion shell), so it re-projects onto the shell
    instead of normalising to 1.

    ``early_exit``: run the step loop as a ``lax.while_loop`` that stops
    once the ray freezes, instead of a fixed-length ``lax.scan``. The
    step math and every output are identical (frozen-tail rows are
    filled after the loop); only the executed trip count changes.
    ONLY for un-vmapped single-ray calls: under ``vmap`` the while_loop
    batching rule re-selects the whole carry — including the path
    buffer — per lane per iteration (measured 3× SLOWER than the scan
    on the 48×9 fan); batched fans use :func:`_integrate_fan`, whose
    while_loop sits OUTSIDE the ray batch. Reverse-mode AD cannot cross
    ``lax.while_loop`` — callers that differentiate through the trace
    (the anisotropic tracer's field-table gradients) keep the scan.

    Returns (ys [n_steps+1, dim], alive [n_steps+1], status_code).
    """
    if reflect_fn is None and reflect_slot is not None:
        def reflect_fn(y):
            return y.at[reflect_slot].set(jnp.abs(y[reflect_slot]))

    step = _make_step(rhs, ds, event_value, reflect_fn, max_bounces,
                      v_slice, renorm_fn)
    init = (y0, jnp.asarray(True), jnp.asarray(_STATUS["length"]),
            jnp.asarray(0))
    if not early_exit:
        (_, _, status, _), (ys, alive) = jax.lax.scan(step, init, None,
                                                      length=n_steps)
        ys = jnp.concatenate([y0[None], ys], axis=0)
        alive = jnp.concatenate([jnp.asarray(True)[None], alive])
        return ys, alive, status

    buf0 = jnp.zeros((n_steps,) + y0.shape, dtype=y0.dtype)
    abuf0 = jnp.zeros((n_steps,), dtype=bool)

    def cond(state):
        i, carry, _, _ = state
        return (i < n_steps) & carry[1]

    def body(state):
        i, carry, buf, abuf = state
        carry, (y_next, alive_next) = step(carry, None)
        buf = jax.lax.dynamic_update_index_in_dim(buf, y_next, i, 0)
        abuf = abuf.at[i].set(alive_next)
        return i + 1, carry, buf, abuf

    i_fin, (y_fin, _, status, _), buf, abuf = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), init, buf0, abuf0))
    # unexecuted tail rows: the scan path would have kept emitting the
    # frozen state with alive=False — reproduce that exactly
    tail = jnp.arange(n_steps) >= i_fin
    ys = jnp.where(tail[:, None], y_fin, buf)
    alive = jnp.where(tail, False, abuf)
    ys = jnp.concatenate([y0[None], ys], axis=0)
    alive = jnp.concatenate([jnp.asarray(True)[None], alive])
    return ys, alive, status


def _integrate_fan(rhs, y0b, n_steps, ds, event_value, reflect_slot=None,
                   max_bounces=0, v_slice=slice(2, 4), reflect_fn=None,
                   renorm_fn=None, chunk=125):
    """Batched early-exit integrator: the whole ray fan in ONE loop.

    Same step math as :func:`_integrate` (bitwise), but structured for
    the TPU: the per-ray step is ``vmap``-ed INSIDE a chunked
    ``lax.while_loop`` whose condition is "any ray still alive", and
    path rows land in the output buffer by whole-chunk
    ``dynamic_update_slice`` (in-place inside the loop). A fan therefore
    pays for ``ceil(longest-lived ray / chunk) · chunk`` steps instead
    of the full ``n_steps`` budget — typical oblique fans freeze in the
    first third of a conservative arc budget. (Naively vmapping
    :func:`_integrate`'s ``early_exit`` is 3× SLOWER than the scan: the
    while_loop batching rule re-selects every lane's whole carry —
    including the path buffer — each iteration.)

    ``y0b``: [R, dim] launch states. Returns
    (ys [R, n_steps+1, dim], alive [R, n_steps+1], status [R]).
    Forward-mode AD only (lax.while_loop); reverse-mode users take the
    scan path (``early_exit=False`` in the callers).
    """
    if reflect_fn is None and reflect_slot is not None:
        def reflect_fn(y):
            return y.at[reflect_slot].set(jnp.abs(y[reflect_slot]))

    step = jax.vmap(_make_step(rhs, ds, event_value, reflect_fn,
                               max_bounces, v_slice, renorm_fn),
                    in_axes=((0, 0, 0, 0), None))
    R, dim = y0b.shape
    chunk = min(int(chunk), int(n_steps))
    n_chunks = -(-int(n_steps) // chunk)
    n_pad = n_chunks * chunk

    def gated(carry, idx):
        # steps past n_steps (the padded tail of the last chunk) must
        # not advance the carry: a ray alive at exactly n_steps keeps
        # its scan-semantics state/status
        carry2, out = step(carry, None)
        valid = idx < n_steps
        carry3 = jax.tree_util.tree_map(
            lambda new, old: jnp.where(valid, new, old), carry2, carry)
        return carry3, out

    def cond(state):
        i, carry, _, _ = state
        return (i < n_chunks) & jnp.any(carry[1])

    def body(state):
        i, carry, buf, abuf = state
        idxs = i * chunk + jnp.arange(chunk)
        carry, (ys_k, al_k) = jax.lax.scan(gated, carry, idxs)
        buf = jax.lax.dynamic_update_slice(buf, ys_k, (i * chunk, 0, 0))
        abuf = jax.lax.dynamic_update_slice(abuf, al_k, (i * chunk, 0))
        return i + 1, carry, buf, abuf

    init = (y0b, jnp.ones((R,), dtype=bool),
            jnp.full((R,), _STATUS["length"]), jnp.zeros((R,), dtype=int))
    buf0 = jnp.zeros((n_pad, R, dim), dtype=y0b.dtype)
    abuf0 = jnp.zeros((n_pad, R), dtype=bool)
    i_fin, carry_fin, buf, abuf = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), init, buf0, abuf0))
    y_fin, _, status, _ = carry_fin
    # chunks the loop never ran: every ray was already frozen — fill
    # with each ray's final state, exactly what the scan would emit
    tail = jnp.arange(n_pad) >= i_fin * chunk
    ys = jnp.where(tail[:, None, None], y_fin[None], buf)[:n_steps]
    alive = jnp.where(tail[:, None], False, abuf)[:n_steps]
    ys = jnp.concatenate([y0b[None], ys], axis=0)
    alive = jnp.concatenate([jnp.ones((1, R), dtype=bool), alive], axis=0)
    return jnp.swapaxes(ys, 0, 1), jnp.swapaxes(alive, 0, 1), status


# Dormand–Prince 5(4) embedded pair (the same tableau scipy's RK45 uses).
_DP_A = (
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_DP_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DP_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
          187 / 2100, 1 / 40)


def _dp45_step(rhs, y, h):
    """One Dormand–Prince attempt: returns (y5, err_vec) for step size h."""
    k = [rhs(y)]
    for row in _DP_A:
        acc = jnp.zeros_like(y)
        for a, kk in zip(row, k):
            acc = acc + a * kk
        k.append(rhs(y + h * acc))
    y5 = y
    err = jnp.zeros_like(y)
    for b5, b4, kk in zip(_DP_B5, _DP_B4, k):
        y5 = y5 + h * b5 * kk
        err = err + h * (b5 - b4) * kk
    return y5, err


def _integrate_adaptive(rhs, y0, n_attempts, s_max, h0, rtol, atol,
                        h_max, event_value, reflect_slot=None,
                        max_bounces=0, v_slice=slice(2, 4),
                        reflect_fn=None, early_exit=False):
    """Error-controlled DP45 with freeze-on-event semantics.

    Same output contract as :func:`_integrate` but each scan iteration is an
    embedded 5(4) ATTEMPT: rejected attempts shrink h and emit an unchanged
    state (a zero-length path segment, harmless to the coordinate-diff
    metrics); accepted attempts advance s and adapt h with the standard
    0.9·err^(−1/5) controller. Integration freezes at s ≥ s_max or on the
    first boundary event (with linear backtrack, like the fixed-step path).
    ``reflect_slot``/``max_bounces``/``v_slice``/``reflect_fn``: see
    :func:`_integrate`.
    """
    if reflect_fn is None and reflect_slot is not None:
        def reflect_fn(y):
            return y.at[reflect_slot].set(jnp.abs(y[reflect_slot]))

    def attempt(carry, _):
        y, h, s, alive, status, bounces = carry
        h_try = jnp.minimum(h, jnp.maximum(s_max - s, 1e-12))
        y5, err = _dp45_step(rhs, y, h_try)
        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y5))
        err_norm = jnp.max(jnp.abs(err) / scale)
        ok_num = jnp.all(jnp.isfinite(y5))
        # a non-finite attempt (NaN μ-gradient region; or atol=0 with a
        # zero state component) must SHRINK the step like scipy's RK45,
        # not take the err==0 growth branch of the controller
        err_norm = jnp.where(jnp.isfinite(err_norm) & ok_num, err_norm,
                             jnp.inf)
        accept = (err_norm <= 1.0) & ok_num

        # PI-free step controller (scipy-style safety/limits);
        # err_norm = inf → fac 0 → clipped to the 0.2 shrink floor
        fac = jnp.where(err_norm > 0.0,
                        0.9 * err_norm ** -0.2, 5.0)
        h_new = jnp.clip(h_try * jnp.clip(fac, 0.2, 5.0), 1e-9, h_max)
        # an attempt that is non-finite even at the minimum step size can
        # never succeed — freeze the ray (matches _integrate's bad-RHS
        # freeze semantics)
        dead = ~ok_num & (h_try <= 2e-9)

        # renormalise direction slots on acceptance
        v = y5[v_slice]
        vmag = jnp.linalg.norm(v)
        v = jnp.where(vmag > 0, v / jnp.where(vmag > 0, vmag, 1.0), v)
        y5 = y5.at[v_slice].set(v)

        ev_old = event_value(y)
        ev_new = event_value(y5)
        crossed = (ev_new <= 0.0) & (ev_old > 0.0)
        any_cross = jnp.any(crossed) & alive & accept
        j = jnp.argmax(crossed)
        denom = ev_old[j] - ev_new[j]
        t = jnp.where(denom != 0.0,
                      ev_old[j] / jnp.where(denom != 0.0, denom, 1.0), 1.0)
        t = jnp.clip(t, 0.0, 1.0)
        y_cross = y + t * (y5 - y)
        ground_hit = any_cross & (j == 0)
        if reflect_fn is not None:
            bounce = ground_hit & (bounces < max_bounces)
            y_refl = reflect_fn(y_cross)
            y_cross = jnp.where(bounce, y_refl, y_cross)
            bounces = bounces + jnp.where(bounce, 1, 0)
            any_cross = any_cross & ~bounce
            ground_hit = ground_hit & ~bounce
            # the reflected segment still advanced arc length t·h_try —
            # handled below because a bounce keeps step_ok & kills
            # any_cross, so s advances by the FULL h_try; shorten to the
            # backtracked fraction instead
            t_adv = jnp.where(bounce, t, jnp.where(any_cross, t, 1.0))
        else:
            t_adv = jnp.where(any_cross, t, 1.0)

        step_ok = alive & accept
        y_next = jnp.where(step_ok,
                           jnp.where(any_cross, y_cross, y5), y)
        if reflect_fn is not None:
            bounce_ok = step_ok & bounce
            y_next = jnp.where(bounce_ok, y_cross, y_next)
        s_next = jnp.where(step_ok, s + h_try * t_adv, s)
        status = jnp.where(any_cross,
                           jnp.where(ground_hit, _STATUS["ground"],
                                     _STATUS["domain"]), status)
        alive_next = alive & ~any_cross & (s_next < s_max) & ~dead
        return ((y_next, jnp.where(alive, h_new, h), s_next, alive_next,
                 status, bounces), (y_next, alive_next))

    init = (y0, jnp.asarray(h0, dtype=y0.dtype),
            jnp.zeros((), dtype=y0.dtype), jnp.asarray(True),
            jnp.asarray(_STATUS["length"]), jnp.asarray(0))
    if early_exit:
        # while_loop over attempts (see _integrate's early_exit contract:
        # identical outputs, trip count stops at the last live lane; no
        # reverse-mode AD)
        buf0 = jnp.zeros((n_attempts,) + y0.shape, dtype=y0.dtype)
        abuf0 = jnp.zeros((n_attempts,), dtype=bool)

        def cond(state):
            i, carry, _, _ = state
            return (i < n_attempts) & carry[3]

        def body(state):
            i, carry, buf, abuf = state
            carry, (y_next, alive_next) = attempt(carry, None)
            buf = jax.lax.dynamic_update_index_in_dim(buf, y_next, i, 0)
            abuf = abuf.at[i].set(alive_next)
            return i + 1, carry, buf, abuf

        i_fin, carry_fin, buf, abuf = jax.lax.while_loop(
            cond, body, (jnp.asarray(0), init, buf0, abuf0))
        y_fin, _, s_final, alive_final, status, _ = carry_fin
        tail = jnp.arange(n_attempts) >= i_fin
        ys = jnp.where(tail[:, None], y_fin, buf)
        alive = jnp.where(tail, False, abuf)
    else:
        (_, _, s_final, alive_final, status, _), (ys, alive) = jax.lax.scan(
            attempt, init, None, length=n_attempts)
    # a ray still alive after all attempts with s < s_max exhausted the
    # attempt budget (many rejections in a stiff region) — report that as a
    # distinct 'attempts' status, not a bogus 'length' arc-budget stop
    exhausted = alive_final & (s_final < s_max)
    status = jnp.where(exhausted, _STATUS["attempts"], status)
    ys = jnp.concatenate([y0[None], ys], axis=0)
    alive = jnp.concatenate([jnp.asarray(True)[None], alive])
    return ys, alive, status


def _path_metrics(x_path, z_path, ds_seg, mup_mid, status, mu_mid=None):
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
    out = {"group_path_km": group_path, "group_delay_sec": group_delay,
           "x_midpoint": x_mid, "z_midpoint": z_mid,
           "ground_range_km": ground_range,
           "x_apex_km": x_apex, "z_apex_km": z_apex}
    if mu_mid is not None:
        # phase path P = ∫ μ ds (beyond the reference; see snell._metrics)
        out["phase_path_km"] = jnp.nansum(
            jnp.where(jnp.isfinite(mu_mid), mu_mid * ds_seg, 0.0))
    return out


@partial(jax.jit, static_argnames=("n_and_grad", "mup_func", "n_steps",
                                   "adaptive", "n_hops", "kappa_func",
                                   "early_exit"))
def _cart_gradient_core(n_and_grad, mup_func, x0, z0, elevation_deg, ds,
                        n_steps, z_ground, z_max, x_min, x_max,
                        adaptive=False, rtol=1e-7, atol=1e-9,
                        s_max=None, h_max=None, n_hops=1, kappa_func=None,
                        early_exit=False):
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

    hop_kw = dict(reflect_slot=3, max_bounces=n_hops - 1) \
        if n_hops > 1 else {}
    if adaptive:
        ys, alive, status = _integrate_adaptive(
            rhs, y0, n_steps, s_max, ds, rtol, atol, h_max, events,
            early_exit=early_exit, **hop_kw)
    else:
        ys, alive, status = _integrate(rhs, y0, n_steps, ds, events,
                                       early_exit=early_exit, **hop_kw)
    x_path, z_path = ys[:, 0], ys[:, 1]
    dx = jnp.diff(x_path)
    dz = jnp.diff(z_path)
    ds_seg = jnp.hypot(dx, dz)
    x_m = 0.5 * (x_path[:-1] + x_path[1:])
    z_m = 0.5 * (z_path[:-1] + z_path[1:])
    mup_mid = mup_func(x_m, z_m)
    # value-only path-metrics eval: the full value_and_grad gathers the
    # two gradient channels too, tripling the post-scan interp bytes on
    # a [E, n_steps] path for values the metrics never use
    fld = getattr(n_and_grad, "field", None)
    mu_mid = (fld.value(z_m, x_m) if fld is not None
              else n_and_grad(x_m, z_m)[0])
    out = _path_metrics(x_path, z_path, ds_seg, mup_mid, status, mu_mid)
    if kappa_func is not None:
        kappa_mid = kappa_func(x_m, z_m)
        out["absorption_db"] = jnp.nansum(
            jnp.where(jnp.isfinite(kappa_mid), kappa_mid * ds_seg, 0.0))
    out.update({"x": x_path, "z": z_path, "vx": ys[:, 2], "vz": ys[:, 3],
                "status_code": status, "alive": alive})
    return out


def trace_ray_cartesian_gradient(n_and_grad, mup_func, x0_km, z0_km,
                                 elevation_deg, s_max_km=None, *,
                                 step_km=None, z_ground_km=None,
                                 z_min_km=-1.0, z_max_km=None,
                                 x_min_km=None, x_max_km=None,
                                 rtol=UNSET, atol=UNSET, max_step_km=None,
                                 renormalize_every=None, n_hops=1,
                                 kappa_func=None, config=None,
                                 early_exit=True):
    """2-D Cartesian ray-ODE trace; API-parity with ref :1271-1457.

    ``n_hops`` (beyond the reference): number of ionospheric hops — the
    first ``n_hops − 1`` ground contacts reflect specularly (perfect
    conductor, 0 dB loss) instead of terminating, so multi-hop links
    trace in the same single launch. ``kappa_func`` (beyond the
    reference): an absorption-coefficient interpolant ``κ(x, z)`` [dB/km]
    (build like ``mup_func`` from an
    :func:`pyrayhf_tpu.absorption.absorption_coefficient` field); when
    given, the result carries ``absorption_db`` integrated along the path.

    With ``rtol``/``atol`` given (the reference's defaults are 1e-7/1e-9),
    the integrator is an error-controlled embedded Dormand–Prince 5(4) —
    the same pair scipy's RK45 uses — with per-attempt accept/reject inside
    one ``lax.scan`` (``step_km`` is the initial step, ``max_step_km`` the
    cap). With both None it is fixed-step RK4 of size ``step_km``
    (default 1 km). ``renormalize_every`` is accepted for API
    compatibility (the direction is renormalised every accepted step,
    strictly better conditioned). A
    :class:`pyrayhf_tpu.config.GradientTracerConfig` passed as ``config``
    supplies any geometry/tolerance knob not given explicitly.
    """
    from .config import resolve
    s_max_km = resolve(config, "s_max_km", s_max_km, 5000.0)
    step_km = resolve(config, "step_km", step_km, 1.0)
    z_ground_km = resolve(config, "z_ground_km", z_ground_km, 0.0)
    z_max_km = resolve(config, "z_max_km", z_max_km, 1000.0)
    x_min_km = resolve(config, "x_min_km", x_min_km, -1e6)
    x_max_km = resolve(config, "x_max_km", x_max_km, 1e6)
    # rtol/atol use the UNSET sentinel: an explicit None forces fixed-step
    # RK4 even when a shared config enables the adaptive integrator
    rtol = resolve(config, "rtol", rtol, UNSET)
    atol = resolve(config, "atol", atol, UNSET)
    del renormalize_every, z_min_km
    if mup_func is None:
        raise ValueError(
            "mup_func must be provided, build it with build_mup_function.")
    adaptive = rtol is not None or atol is not None
    if adaptive:
        n_steps = 2 * int(round(float(s_max_km) / float(step_km)))
        kw = dict(adaptive=True,
                  rtol=jnp.asarray(1e-7 if rtol is None else rtol,
                                   dtype=float),
                  atol=jnp.asarray(1e-9 if atol is None else atol,
                                   dtype=float),
                  s_max=jnp.asarray(s_max_km, dtype=float),
                  h_max=jnp.asarray(np.inf if max_step_km is None
                                    else max_step_km, dtype=float))
    else:
        if max_step_km is not None:
            step_km = min(step_km, float(max_step_km))
        n_steps = int(round(float(s_max_km) / float(step_km)))
        kw = {}
    out = _cart_gradient_core(n_and_grad, mup_func,
                              jnp.asarray(x0_km, dtype=float),
                              jnp.asarray(z0_km, dtype=float),
                              jnp.asarray(elevation_deg, dtype=float),
                              jnp.asarray(step_km, dtype=float), n_steps,
                              jnp.asarray(z_ground_km, dtype=float),
                              jnp.asarray(z_max_km, dtype=float),
                              jnp.asarray(x_min_km, dtype=float),
                              jnp.asarray(x_max_km, dtype=float),
                              n_hops=int(n_hops), kappa_func=kappa_func,
                              early_exit=bool(early_exit), **kw)
    code = int(out.pop("status_code"))
    out["status"] = {v: k for k, v in _STATUS.items()}[code]
    out["t"] = None
    return out


def trace_rays_cartesian_gradient(n_and_grad, mup_func, x0_km, z0_km,
                                  elevation_deg, s_max_km=5000.0, *,
                                  step_km=1.0, z_ground_km=0.0,
                                  z_max_km=1000.0, x_min_km=-1e6,
                                  x_max_km=1e6, n_hops=1):
    """Batched Cartesian ODE fan over elevations [E] — one XLA launch."""
    n_steps = int(round(float(s_max_km) / float(step_km)))
    fn = partial(_cart_gradient_core, n_and_grad, mup_func, n_steps=n_steps,
                 n_hops=int(n_hops))
    return jax.vmap(lambda el: fn(
        jnp.asarray(x0_km, dtype=float), jnp.asarray(z0_km, dtype=float),
        el, jnp.asarray(step_km, dtype=float),
        z_ground=jnp.asarray(z_ground_km, dtype=float),
        z_max=jnp.asarray(z_max_km, dtype=float),
        x_min=jnp.asarray(x_min_km, dtype=float),
        x_max=jnp.asarray(x_max_km, dtype=float)))(
            jnp.asarray(elevation_deg, dtype=float))


@partial(jax.jit, static_argnames=("n_and_grad_rphi", "mup_func", "n_steps",
                                   "adaptive", "n_hops", "kappa_func",
                                   "early_exit"))
def _sph_gradient_core(n_and_grad_rphi, mup_func, x0, z0, elevation_deg, ds,
                       n_steps, re, z_ground, r_max, phi_min, phi_max,
                       adaptive=False, rtol=1e-7, atol=1e-9,
                       s_max=None, h_max=None, n_hops=1, kappa_func=None,
                       early_exit=False):
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

    hop_kw = dict(reflect_slot=2, max_bounces=n_hops - 1) \
        if n_hops > 1 else {}
    if adaptive:
        ys, alive, status = _integrate_adaptive(
            rhs, y0, n_steps, s_max, ds, rtol, atol, h_max, events,
            early_exit=early_exit, **hop_kw)
    else:
        ys, alive, status = _integrate(rhs, y0, n_steps, ds, events,
                                       early_exit=early_exit, **hop_kw)
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
    phi_m = 0.5 * (phi_path[:-1] + phi_path[1:])
    # value-only eval (see the Cartesian core's metrics note)
    fld_s = getattr(n_and_grad_rphi, "field", None)
    mu_mid = (fld_s.value(re + z_m, phi_m) if fld_s is not None
              else n_and_grad_rphi(phi_m, re + z_m)[0])
    out = _path_metrics(x_path, z_path, ds_seg, mup_mid, status, mu_mid)
    if kappa_func is not None:
        kappa_mid = kappa_func(x_m, z_m)
        out["absorption_db"] = jnp.nansum(
            jnp.where(jnp.isfinite(kappa_mid), kappa_mid * ds_seg, 0.0))
    out.update({"x": x_path, "z": z_path, "r": r_path, "phi": phi_path,
                "v_r": ys[:, 2], "v_phi": ys[:, 3],
                "status_code": status, "alive": alive})
    return out


def trace_ray_spherical_gradient(n_and_grad_rphi, mup_func, x0_km, z0_km,
                                 elevation_deg, s_max_km=None, *,
                                 R_E=None, z_ground_km=None, r_max_km=None,
                                 phi_min=-jnp.pi, phi_max=jnp.pi,
                                 step_km=None, rtol=UNSET, atol=UNSET,
                                 max_step_km=2.0, renormalize_every=None,
                                 n_hops=1, kappa_func=None, config=None,
                                 early_exit=True):
    """2-D spherical ray-ODE trace; API-parity with ref :2128-2337.

    ``n_hops``/``kappa_func``: multi-hop ground reflections and path
    absorption — see :func:`trace_ray_cartesian_gradient`.

    ``rtol``/``atol`` select the error-controlled Dormand–Prince 5(4)
    integrator (see :func:`trace_ray_cartesian_gradient`); both None runs
    fixed-step RK4 of size ``step_km`` (default 1 km, capped by
    ``max_step_km``). ``config`` supplies the arc-length budget
    (``s_max_km``), step and ground/tolerance knobs; the Cartesian-plane
    bounds fields (z_max/x_min/x_max) have no spherical analogue — use
    ``r_max_km``/``phi_min``/``phi_max``. Without a config the default
    arc budget is 6000 km (vs 5000 in the dataclass, matching the
    reference's longer spherical default).
    """
    from .config import resolve
    s_max_km = resolve(config, "s_max_km", s_max_km, 6000.0)
    z_ground_km = resolve(config, "z_ground_km", z_ground_km, 0.0)
    step_km = resolve(config, "step_km", step_km, 1.0)
    rtol = resolve(config, "rtol", rtol, UNSET)
    atol = resolve(config, "atol", atol, UNSET)
    del renormalize_every
    if mup_func is None:
        raise ValueError("mup_func must be provided — build it with "
                         "build_mup_function(..., geometry='spherical').")
    re = globals()["R_E"] if R_E is None else float(R_E)
    if r_max_km is None:
        r_max_km = re + 1200.0
    adaptive = rtol is not None or atol is not None
    if adaptive:
        n_steps = 2 * int(round(float(s_max_km) / float(step_km)))
        kw = dict(adaptive=True,
                  rtol=jnp.asarray(1e-7 if rtol is None else rtol,
                                   dtype=float),
                  atol=jnp.asarray(1e-9 if atol is None else atol,
                                   dtype=float),
                  s_max=jnp.asarray(s_max_km, dtype=float),
                  h_max=jnp.asarray(np.inf if max_step_km is None
                                    else max_step_km, dtype=float))
    else:
        if max_step_km is not None:
            step_km = min(step_km, float(max_step_km))
        n_steps = int(round(float(s_max_km) / float(step_km)))
        kw = {}
    out = _sph_gradient_core(n_and_grad_rphi, mup_func,
                             jnp.asarray(x0_km, dtype=float),
                             jnp.asarray(z0_km, dtype=float),
                             jnp.asarray(elevation_deg, dtype=float),
                             jnp.asarray(step_km, dtype=float), n_steps,
                             jnp.asarray(re, dtype=float),
                             jnp.asarray(z_ground_km, dtype=float),
                             jnp.asarray(r_max_km, dtype=float),
                             jnp.asarray(phi_min, dtype=float),
                             jnp.asarray(phi_max, dtype=float),
                             n_hops=int(n_hops), kappa_func=kappa_func,
                             early_exit=bool(early_exit), **kw)
    code = int(out.pop("status_code"))
    out["status"] = {v: k for k, v in _STATUS.items()}[code]
    out["t"] = None
    return out


def trace_rays_spherical_gradient(n_and_grad_rphi, mup_func, x0_km, z0_km,
                                  elevation_deg, s_max_km=6000.0, *,
                                  R_E=None, z_ground_km=0.0, r_max_km=None,
                                  phi_min=-jnp.pi, phi_max=jnp.pi,
                                  step_km=1.0, n_hops=1):
    """Batched spherical ODE fan over elevations [E] — one XLA launch."""
    re = globals()["R_E"] if R_E is None else float(R_E)
    if r_max_km is None:
        r_max_km = re + 1200.0
    n_steps = int(round(float(s_max_km) / float(step_km)))
    fn = partial(_sph_gradient_core, n_and_grad_rphi, mup_func,
                 n_steps=n_steps, n_hops=int(n_hops))
    return jax.vmap(lambda el: fn(
        jnp.asarray(x0_km, dtype=float), jnp.asarray(z0_km, dtype=float),
        el, jnp.asarray(step_km, dtype=float),
        re=jnp.asarray(re, dtype=float),
        z_ground=jnp.asarray(z_ground_km, dtype=float),
        r_max=jnp.asarray(r_max_km, dtype=float),
        phi_min=jnp.asarray(phi_min, dtype=float),
        phi_max=jnp.asarray(phi_max, dtype=float)))(
            jnp.asarray(elevation_deg, dtype=float))
