"""Stratified Snell's-law oblique ray tracers (Cartesian + spherical).

TPU-first re-design of the reference tracers
(``trace_ray_cartesian_snells`` ref ``library.py:1096-1268``,
``trace_ray_spherical_snells`` ref :1460-1713):

* the Python layer loops (turning-point scan :1065-1093, per-layer tanθ list
  comprehension :1229, adaptive apex substeps :1626-1669) become fixed-shape
  vectorised array ops, so a whole (frequency × elevation) fan is one XLA
  program via ``vmap``;
* invalid/evanescent layers are compacted with a stable argsort instead of
  boolean indexing, keeping shapes static;
* beyond the apex, padded nodes repeat the apex coordinates (zero-length
  segments), so cumulative sums and path metrics are exact without masks;
* the spherical apex refinement (1/√ singularity of dφ/dz at μr → p) uses a
  √-substitution on the apex interval — analytically removing the
  singularity — plus uniform midpoint substeps elsewhere, instead of the
  reference's adaptive substep budget (ref :1626-1669). This is *more*
  accurate per flop and keeps shapes static.

Outputs are fixed-size path arrays (padded with repeated apex/landing points)
plus the same scalar metrics as the reference dicts. NaN scalars signal an
invalid ray (no turning point / evanescent launch), matching reference
semantics.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .absorption import absorption_coefficient, collision_frequency
from .constants import C_KM_S, R_E
from .interp import interp_exact
from .magnetoionic import find_X, find_Y, find_mu_mup, mode_multiplier

__all__ = ["trace_ray_cartesian_snells", "trace_ray_spherical_snells",
           "trace_rays_cartesian_snells", "trace_rays_spherical_snells"]

_SPH_SUBSTEPS = 64       # midpoint substeps per regular interval
_APEX_SUBSTEPS = 32      # √-substituted substeps on the apex interval


def _prepend_ground(alt, *channels):
    """Always materialise a z=0 ground node (ref :1174-1182).

    If the profile already starts at 0 the duplicate node creates a
    zero-length first layer, which contributes nothing anywhere. Every
    channel array in ``channels`` is extended by interpolation at the
    ground node.
    """
    z0 = jnp.minimum(alt[0], 0.0)
    cat = lambda v0, v: jnp.concatenate([jnp.asarray(v0)[None], v])
    out = [cat(z0, alt)]
    for ch in channels:
        out.append(cat(jnp.interp(z0, alt, ch), ch))
    return tuple(out)


def _compact_valid(z, mu, mup=None, kappa=None):
    """Stable-sort the valid (finite μ) nodes to the front.

    Returns (z_c, mu_c, mup_c, kappa_c, count): the first ``count`` entries
    are the valid nodes in ascending altitude; the rest are +inf/NaN
    padding. This is the static-shape equivalent of the reference's boolean
    compaction (:1204-1205). ``mup_c``/``kappa_c`` gather μ' and the
    absorption coefficient through the same permutation (path nodes land
    exactly on profile nodes, so the reference's per-path ``np.interp``
    over μ' reduces to this gather plus one apex interp).
    """
    valid = jnp.isfinite(mu)
    order = jnp.argsort(jnp.where(valid, 0, 1), stable=True)
    z_c = jnp.where(valid[order], z[order], jnp.inf)
    mu_c = jnp.where(valid[order], mu[order], jnp.nan)
    mup_c = mup[order] if mup is not None else None
    kappa_c = kappa[order] if kappa is not None else None
    return z_c, mu_c, mup_c, kappa_c, jnp.sum(valid)


def _turning_point(z_c, mu_c, count, p, weight):
    """First crossing of ``weight·μ`` through ``p`` (ref :1065-1093, :1599).

    ``weight`` is 1 (Cartesian) or r(z) (spherical). Linear interpolation in
    the bracketing interval; returns (z_turn, i_cross, found).
    """
    n = z_c.shape[0]
    w = weight(z_c)
    f = mu_c * w
    k = jnp.arange(n - 1)
    pair_ok = (k + 1 < count)
    crossing = pair_ok & (f[:-1] >= p) & (f[1:] <= p)
    found = jnp.any(crossing)
    i = jnp.argmax(crossing)          # first True
    f0, f1 = f[i], f[i + 1]
    t = jnp.where(f0 != f1, (f0 - p) / jnp.where(f0 != f1, f0 - f1, 1.0), 0.0)
    t = jnp.clip(t, 0.0, 1.0)
    z_turn = z_c[i] + t * (z_c[i + 1] - z_c[i])
    return z_turn, i, found


def _mirror(x_up, z_up):
    """Mirror the up-leg about the apex (ref :1233-1237)."""
    x_turn = x_up[-1]
    x_down = 2.0 * x_turn - x_up[::-1]
    x_full = jnp.concatenate([x_up, x_down[1:]])
    z_full = jnp.concatenate([z_up, z_up[::-1][1:]])
    return x_full, z_full


def _metrics(x_full, z_full, ds, mup_seg, ok, kappa_seg=None, mu_seg=None):
    """Path length, group delay, midpoint, ground range (ref :1239-1258).

    The reference finds the midpoint by searchsorted on the cumulative arc;
    for a mirror-symmetric Snell path the half-arc lands *exactly* on the
    apex node, so that lookup is a 1-ulp tie between the apex and the node
    below it. We return the apex itself — the mathematically exact midpoint —
    which agrees with the reference up to its own node quantisation.
    """
    group_path = jnp.nansum(ds)
    group_delay = jnp.nansum(mup_seg / C_KM_S * ds)
    mid_idx = (x_full.shape[0] - 1) // 2      # apex of the mirrored path
    x_mid = x_full[mid_idx]
    z_mid = z_full[mid_idx]
    landed = jnp.abs(z_full[-1]) <= 1e-3
    ground_range = jnp.where(landed, x_full[-1], jnp.nan)
    nan = jnp.nan
    res = {
        "x": jnp.where(ok, x_full, nan),
        "z": jnp.where(ok, z_full, nan),
        "group_path_km": jnp.where(ok, group_path, nan),
        "group_delay_sec": jnp.where(ok, group_delay, nan),
        "x_midpoint": jnp.where(ok, x_mid, nan),
        "z_midpoint": jnp.where(ok, z_mid, nan),
        "ground_range_km": jnp.where(ok, ground_range, nan),
        # the reference returns the path midpoint as the apex (ref :1267,
        # :1711) — replicated for parity
        "x_apex_km": jnp.where(ok, x_mid, nan),
        "z_apex_km": jnp.where(ok, z_mid, nan),
    }
    if kappa_seg is not None:
        # collisional loss along the whole mirrored path (see absorption.py)
        absorb = jnp.nansum(jnp.where(jnp.isfinite(kappa_seg),
                                      kappa_seg * ds, 0.0))
        res["absorption_db"] = jnp.where(ok, absorb, nan)
    if mu_seg is not None:
        # phase path P = ∫ μ ds (beyond the reference, which integrates
        # only μ'). P ≤ geometric length ≤ group path since μ ≤ 1 ≤ μ';
        # the O−X phase-path difference feeds Faraday-rotation estimates
        # (see faraday.py), and ∂P/∂t of a time-parameterised ionosphere
        # gives the Doppler shift −(f/c)·dP/dt via jax.grad.
        phase = jnp.nansum(mu_seg * ds)
        res["phase_path_km"] = jnp.where(ok, phase, nan)
    return res


def _snell_cart_prep(f0_hz, alt, ne, babs, bpsi, nu, mode_mult):
    """Frequency-dependent, elevation-independent precomputation."""
    mode = "O" if mode_mult > 0 else "X"
    X = find_X(ne, f0_hz)
    Y = find_Y(f0_hz, babs)
    mu, mup = find_mu_mup(X, Y, bpsi, mode)
    mu = jnp.where(jnp.isfinite(mu) & (mu > 0.0), mu, jnp.nan)
    mup = jnp.where(jnp.isfinite(mup) & (mup > 0.0), mup, jnp.nan)
    kappa = absorption_coefficient(ne, nu, f0_hz, babs, bpsi, mu, mode)
    z_c, mu_c, mup_c, kappa_c, count = _compact_valid(alt, mu, mup, kappa)
    return z_c, mu_c, mup_c, kappa_c, count, mup, kappa, mu[0]


def _snell_cart_ray(prep, alt, elevation_deg):
    z_c, mu_c, mup_c, kappa_c, count, mup, kappa, mu0 = prep
    theta0 = jnp.deg2rad(90.0 - elevation_deg)
    s0 = jnp.sin(theta0)
    p = mu0 * s0

    z_turn, i_cross, found = _turning_point(z_c, mu_c, count, p,
                                            lambda z: jnp.ones_like(z))
    ok = jnp.isfinite(mu0) & (count >= 2) & found

    n = z_c.shape[0]
    k = jnp.arange(n + 1)
    # nodes 0..i_cross, then the apex repeated — the padded tail carries
    # zero-length segments so no masking is needed downstream
    z_up = jnp.where(k <= i_cross, z_c[jnp.minimum(k, n - 1)], z_turn)
    mu_up = jnp.where(k <= i_cross, mu_c[jnp.minimum(k, n - 1)], p)
    mup_turn = interp_exact(z_turn, alt, mup)
    mup_up = jnp.where(k <= i_cross, mup_c[jnp.minimum(k, n - 1)], mup_turn)
    # κ at the apex: μ(z_turn) = p > 0 for oblique rays, so κ is finite
    # there (the deviative 1/μ enhancement saturates at 1/p); interpolated
    # on the profile grid exactly like μ'
    kappa_turn = interp_exact(z_turn, alt, kappa)
    kappa_up = jnp.where(k <= i_cross, kappa_c[jnp.minimum(k, n - 1)],
                         kappa_turn)

    dz = jnp.diff(z_up)
    mu_mid = 0.5 * (mu_up[:-1] + mu_up[1:])
    # singularity guard on the apex segment (ref :1228)
    apex_seg = jnp.arange(n) == i_cross
    mu_mid = jnp.where(apex_seg, jnp.maximum(mu_mid, p + 1e-8), mu_mid)
    eps = 1e-10
    tan_mid = p / jnp.sqrt(jnp.maximum(mu_mid ** 2 - p * p, eps))
    x_up = jnp.concatenate([jnp.zeros(1), jnp.cumsum(dz * tan_mid)])

    x_full, z_full = _mirror(x_up, z_up)
    dx = jnp.diff(x_full)
    dzf = jnp.diff(z_full)
    ds = jnp.hypot(dx, dzf)
    mup_path = jnp.concatenate([mup_up, mup_up[::-1][1:]])
    mup_seg = 0.5 * (mup_path[1:] + mup_path[:-1])
    kappa_path = jnp.concatenate([kappa_up, kappa_up[::-1][1:]])
    kappa_seg = 0.5 * (kappa_path[1:] + kappa_path[:-1])
    # the prepended ground→alt[0] legs (first/last segment) are free
    # space: the Ne/ν clamp extension exists only for the reference's μ
    # geometry (ref :1174-1182) and would otherwise charge a fictitious
    # constant-density D-region below the profile for tens of km
    kappa_seg = kappa_seg.at[0].set(0.0).at[-1].set(0.0)
    mu_path = jnp.concatenate([mu_up, mu_up[::-1][1:]])
    mu_seg = 0.5 * (mu_path[1:] + mu_path[:-1])
    return _metrics(x_full, z_full, ds, mup_seg, ok, kappa_seg, mu_seg)


@partial(jax.jit, static_argnames=("mode_mult",))
def _snell_cartesian_core(f0_hz, elevation_deg, alt, ne, babs, bpsi, nu,
                          mode_mult):
    alt, ne, babs, bpsi, nu = _prepend_ground(alt, ne, babs, bpsi, nu)
    prep = _snell_cart_prep(f0_hz, alt, ne, babs, bpsi, nu, mode_mult)
    return _snell_cart_ray(prep, alt, elevation_deg)


def _resolve_nu(nu, alt_km):
    if nu is None:
        return collision_frequency(jnp.asarray(alt_km, dtype=float))
    return jnp.asarray(nu, dtype=float)


def trace_ray_cartesian_snells(f0_Hz, elevation_deg, alt_km, Ne, Babs, bpsi,
                               mode, nu=None):
    """Flat-Earth layered Snell trace; API-parity with ref :1096-1268.

    Returns a dict with the reference's keys; ``x``/``z`` are fixed-length
    padded paths (repeated apex/landing nodes carry zero-length segments).
    Beyond the reference, ``absorption_db`` integrates the QL collisional
    loss along the path (``nu``: ν [s⁻¹] on ``alt_km``, defaulting to
    :func:`pyrayhf_tpu.absorption.collision_frequency`); the leg below
    ``alt_km[0]`` is free space (no fictitious loss from the clamped
    ground extension).
    """
    return _snell_cartesian_core(jnp.asarray(f0_Hz, dtype=float),
                                 jnp.asarray(elevation_deg, dtype=float),
                                 jnp.asarray(alt_km, dtype=float),
                                 jnp.asarray(Ne, dtype=float),
                                 jnp.asarray(Babs, dtype=float),
                                 jnp.asarray(bpsi, dtype=float),
                                 _resolve_nu(nu, alt_km),
                                 mode_mult=mode_multiplier(mode))


def _snell_sph_prep(f0_hz, alt, ne, babs, bpsi, nu, mode_mult):
    mode = "O" if mode_mult > 0 else "X"
    X = find_X(ne, f0_hz)
    Y = find_Y(f0_hz, babs)
    mu, mup = find_mu_mup(X, Y, bpsi, mode)
    mu = jnp.where(jnp.isfinite(mu) & (mu > 0.0), mu, jnp.nan)
    mup = jnp.where(jnp.isfinite(mup) & (mup > 0.0), mup, jnp.nan)
    kappa = absorption_coefficient(ne, nu, f0_hz, babs, bpsi, mu, mode)
    z_c, mu_c, mup_c, kappa_c, count = _compact_valid(alt, mu, mup, kappa)
    return z_c, mu_c, mup_c, kappa_c, count, mup, kappa, mu[0]


def _snell_sph_ray(prep, alt, elevation_deg, re):
    z_c, mu_c, mup_c, kappa_c, count, mup, kappa, mu0 = prep
    theta0 = jnp.deg2rad(90.0 - elevation_deg)
    r0 = re + alt[0]
    p = mu0 * r0 * jnp.sin(theta0)

    z_turn, i_cross, found = _turning_point(z_c, mu_c, count, p,
                                            lambda z: re + z)
    ok = jnp.isfinite(mu0) & (count >= 2) & found

    n = z_c.shape[0]
    k = jnp.arange(n + 1)
    z_up = jnp.where(k <= i_cross, z_c[jnp.minimum(k, n - 1)], z_turn)
    mu_up = jnp.where(k <= i_cross, mu_c[jnp.minimum(k, n - 1)],
                      p / (re + z_turn))
    mup_turn = interp_exact(z_turn, alt, mup)
    mup_up = jnp.where(k <= i_cross, mup_c[jnp.minimum(k, n - 1)], mup_turn)
    kappa_turn = interp_exact(z_turn, alt, kappa)
    kappa_up = jnp.where(k <= i_cross, kappa_c[jnp.minimum(k, n - 1)],
                         kappa_turn)

    # dφ/dz = p / (r · sqrt((μ r)² − p²)), μ linear within each interval.
    z_a, z_b = z_up[:-1], z_up[1:]
    mu_a, mu_b = mu_up[:-1], mu_up[1:]
    dz = z_b - z_a
    apex_seg = jnp.arange(n) == i_cross

    def integrand(z_m, mu_m):
        r_m = re + z_m
        mu_r = jnp.maximum(mu_m * r_m, p + 1e-8)
        return p / (r_m * jnp.sqrt(mu_r * mu_r - p * p))

    # Regular intervals: uniform midpoint rule with S substeps.
    S = _SPH_SUBSTEPS
    tmid = (jnp.arange(S) + 0.5) / S                       # [S]
    z_m = z_a[:, None] + tmid[None, :] * dz[:, None]       # [n, S]
    mu_m = mu_a[:, None] + (mu_b - mu_a)[:, None] * tmid[None, :]
    f_m = integrand(z_m, mu_m)
    dphi_reg = jnp.sum(f_m, axis=1) * dz / S

    # Apex interval: substitute z = z_b − u², u ∈ [0, sqrt(dz)];
    # dφ = ∫ f(z) dz = ∫ 2u·f(z_b − u²) du — the 1/√ singularity at z_b
    # cancels analytically, so a short midpoint rule is accurate.
    Sa = _APEX_SUBSTEPS
    dz_safe = jnp.maximum(dz, 0.0)
    umax = jnp.sqrt(dz_safe)
    umid = (jnp.arange(Sa) + 0.5) / Sa                     # [Sa]
    u = umax[:, None] * umid[None, :]
    z_mu = z_b[:, None] - u ** 2
    frac = jnp.where(dz[:, None] != 0.0,
                     (z_mu - z_a[:, None]) / jnp.where(dz[:, None] != 0.0,
                                                       dz[:, None], 1.0), 0.0)
    mu_mu = mu_a[:, None] + (mu_b - mu_a)[:, None] * frac
    f_u = 2.0 * u * integrand(z_mu, mu_mu)
    dphi_apex = jnp.sum(f_u, axis=1) * umax / Sa

    dphi = jnp.where(apex_seg, dphi_apex, dphi_reg)
    dphi = jnp.where(dz > 0.0, dphi, 0.0)
    phi_up = jnp.concatenate([jnp.zeros(1), jnp.cumsum(dphi)])

    phi_full, z_full = _mirror(phi_up, z_up)
    x_full = re * phi_full

    dz_seg = jnp.diff(z_full)
    phi_seg = jnp.diff(phi_full)
    r_mid = re + 0.5 * (z_full[:-1] + z_full[1:])
    ds = jnp.hypot(r_mid * phi_seg, dz_seg)
    mup_path = jnp.concatenate([mup_up, mup_up[::-1][1:]])
    mup_seg = 0.5 * (mup_path[:-1] + mup_path[1:])
    kappa_path = jnp.concatenate([kappa_up, kappa_up[::-1][1:]])
    kappa_seg = 0.5 * (kappa_path[:-1] + kappa_path[1:])
    # free-space ground legs: see the Cartesian ray
    kappa_seg = kappa_seg.at[0].set(0.0).at[-1].set(0.0)
    mu_path = jnp.concatenate([mu_up, mu_up[::-1][1:]])
    mu_seg = 0.5 * (mu_path[:-1] + mu_path[1:])
    return _metrics(x_full, z_full, ds, mup_seg, ok, kappa_seg, mu_seg)


@partial(jax.jit, static_argnames=("mode_mult",))
def _snell_spherical_core(f0_hz, elevation_deg, alt, ne, babs, bpsi, nu,
                          mode_mult, re):
    alt, ne, babs, bpsi, nu = _prepend_ground(alt, ne, babs, bpsi, nu)
    prep = _snell_sph_prep(f0_hz, alt, ne, babs, bpsi, nu, mode_mult)
    return _snell_sph_ray(prep, alt, elevation_deg, re)


def trace_ray_spherical_snells(f0_Hz, elevation_deg, alt_km, Ne, Babs, bpsi,
                               mode=None, *, dz_target_km=1.0,
                               apex_boost=200.0, max_substeps=400, R_E=None,
                               nu=None, config=None):
    """Spherical-Earth layered Snell trace; API-parity with ref :1460-1713.

    ``dz_target_km``/``apex_boost``/``max_substeps`` are accepted for API
    compatibility but unused: the apex interval is integrated with an exact
    √-substitution (see module docstring) instead of adaptive substeps.
    A :class:`pyrayhf_tpu.config.SnellConfig` passed as ``config`` supplies
    ``mode`` (default 'O') and ``R_E_km`` when not given explicitly.
    """
    del dz_target_km, apex_boost, max_substeps
    from .config import resolve
    mode = resolve(config, "mode", mode, "O")
    if R_E is None and config is not None:
        R_E = config.R_E_km
    re = globals()["R_E"] if R_E is None else float(R_E)
    return _snell_spherical_core(jnp.asarray(f0_Hz, dtype=float),
                                 jnp.asarray(elevation_deg, dtype=float),
                                 jnp.asarray(alt_km, dtype=float),
                                 jnp.asarray(Ne, dtype=float),
                                 jnp.asarray(Babs, dtype=float),
                                 jnp.asarray(bpsi, dtype=float),
                                 _resolve_nu(nu, alt_km),
                                 mode_mult=mode_multiplier(mode), re=re)


@partial(jax.jit, static_argnames=("mode_mult",))
def _snell_cart_fan(f0s, els, alt_km, ne0, b0, psi0, nu0, mode_mult):
    alt, ne, b, psi, nu = _prepend_ground(alt_km, ne0, b0, psi0, nu0)

    def per_freq(f0):
        prep = _snell_cart_prep(f0, alt, ne, b, psi, nu, mode_mult)
        return jax.vmap(lambda el: _snell_cart_ray(prep, alt, el))(els)

    return jax.vmap(per_freq)(f0s)


@partial(jax.jit, static_argnames=("mode_mult", "re"))
def _snell_sph_fan(f0s, els, alt_km, ne0, b0, psi0, nu0, mode_mult, re):
    alt, ne, b, psi, nu = _prepend_ground(alt_km, ne0, b0, psi0, nu0)

    def per_freq(f0):
        prep = _snell_sph_prep(f0, alt, ne, b, psi, nu, mode_mult)
        return jax.vmap(lambda el: _snell_sph_ray(prep, alt, el, re))(els)

    return jax.vmap(per_freq)(f0s)


def trace_rays_cartesian_snells(f0_Hz, elevation_deg, alt_km, Ne, Babs, bpsi,
                                mode, nu=None):
    """Batched fan: f0 [F], elevation [E] → dict of [F, E, ...] arrays.

    One XLA launch for the whole (frequency × elevation) fan — this is the
    TPU-native unit of work (the reference traces one ray per call).
    """
    return _snell_cart_fan(jnp.asarray(f0_Hz, dtype=float),
                           jnp.asarray(elevation_deg, dtype=float),
                           jnp.asarray(alt_km, dtype=float),
                           jnp.asarray(Ne, dtype=float),
                           jnp.asarray(Babs, dtype=float),
                           jnp.asarray(bpsi, dtype=float),
                           _resolve_nu(nu, alt_km),
                           mode_mult=mode_multiplier(mode))


def trace_rays_spherical_snells(f0_Hz, elevation_deg, alt_km, Ne, Babs, bpsi,
                                mode="O", R_E=None, nu=None):
    """Batched spherical fan: [F] × [E] → dict of [F, E, ...] arrays."""
    re = globals()["R_E"] if R_E is None else float(R_E)
    return _snell_sph_fan(jnp.asarray(f0_Hz, dtype=float),
                          jnp.asarray(elevation_deg, dtype=float),
                          jnp.asarray(alt_km, dtype=float),
                          jnp.asarray(Ne, dtype=float),
                          jnp.asarray(Babs, dtype=float),
                          jnp.asarray(bpsi, dtype=float),
                          _resolve_nu(nu, alt_km),
                          mode_mult=mode_multiplier(mode), re=re)
