"""Anisotropic 3-D magnetoionic ray tracing (full Haselgrove form).

The fixed-ψ tracers (:mod:`pyrayhf_tpu.trace3d`, and the reference's 2-D
tracers, ref ``library.py:1764-1835``) evaluate the Appleton–Hartree
index with the VERTICAL-incidence wave-normal-to-B angle per column and
then trace rays through that scalar μ field. The real wave-normal angle
ψ varies along a 3-D ray, and in an anisotropic medium the ray (group
velocity) direction is not the wave-normal direction. This module drops
both approximations: it integrates Haselgrove's equations for the full
anisotropic dispersion relation, with ψ evaluated from the instantaneous
wave normal and the local IGRF field vector.

Formulation (TPU-first — one scalar, everything else by autodiff):

* dispersion scalar  ``G(r, u, f) = u·u − n²(r, û, f)`` where ``u`` is
  the refractive-index vector (u = c k / ω; |u| = n on the dispersion
  shell) and n² is the collisionless Appleton–Hartree index at
  cos ψ = û·B̂(r);
* Hamilton's ray equations, parameterised by arc length s along the
  GROUP (ray) direction, follow from one ``jax.value_and_grad`` of G:

      dr/ds =  G_u / |G_u|            (group direction)
      du/ds = −G_r / |G_u|
      dt/ds = (u·G_u − f G_f) / (c |G_u|)   (GROUP DELAY — exact, from
                                             the ω-derivative; no μ′
                                             field or quadrature needed)
      dP/ds = (u·G_u) / |G_u|               (phase path, u·dr)

  In the isotropic limit G_u = 2u, so dr/ds = û, dt/ds = n_g/c and
  dP/ds = n — the classical forms.
* spatial derivatives G_r use a *smoothed interpolant*: trilinear values
  whose JVP is the trilinearly-interpolated 2nd-order grid gradient
  (``jax.custom_jvp``), so the RK4 RHS sees the same smooth gradient
  fields the isotropic tracer interpolates, while the u- and
  f-derivatives stay exact autodiff;
* integration reuses the shared freeze-on-event RK4 integrators
  (:func:`pyrayhf_tpu.gradient._integrate` for single rays,
  :func:`pyrayhf_tpu.gradient._integrate_fan` — the batched chunked
  while_loop that stops at the longest-lived ray — for fans) with a
  ``renorm_fn`` that re-projects |u| onto the dispersion shell
  (|u| ← n(r, û)) each step — the anisotropic analogue of the
  unit-direction renormalisation.

The reference has no anisotropic tracer of any kind (its most general
tracer is the fixed-ψ 2-D spherical gradient form, ref
``library.py:2128-2337``); this module is capability beyond it. Group
delay through the dispersion ω-derivative doubles as an independent
check of the μ′-based fixed-ψ machinery: tests pin the two against each
other in the isotropic limit and measure the fixed-ψ convention's error
on a dipole-field case (see ``tests/test_trace3d_aniso.py`` and
``docs/accuracy.md``).
"""

from functools import partial

import jax
import jax.numpy as jnp

from .constants import C_KM_S, CP, G_P, R_E
from .fields import grad_axis_ord2
from .gradient import _STATUS, _integrate
from .trace3d import (_bearing_frame, _ecef, _geodetic, _local_frame,
                      _trilinear_pack, _validate_grids_3d, trilinear)

__all__ = ["build_field_3d_aniso", "igrf_volume",
           "trace_ray_3d_anisotropic", "trace_rays_3d_anisotropic",
           "home_ray_3d_anisotropic",
           "synthesize_oblique_ionogram_3d_anisotropic"]


def _ah_n2(X, Y, cos2, mode_mult):
    """Collisionless Appleton–Hartree n² at wave-normal angle ψ.

    ``cos2`` = cos²ψ with ψ the angle between the wave normal and B.
    Same algebra as :func:`pyrayhf_tpu.magnetoionic.find_mu_mup`
    (cancellation-free O-branch, ref formula ``library.py:209-256``) but
    as a differentiable scalar n²(X, Y, cos²ψ): every singular
    denominator is double-``where`` guarded so ``jax.grad`` through
    valid entries is finite. Returns (n², valid); n² is a finite
    placeholder where invalid. Elements with a vanishing discriminant
    (Y = 0, or YT = 0 at X = 1) fall back to the unmagnetised 1 − X.
    """
    Xm1 = 1.0 - X
    Y2 = Y * Y
    YT2 = Y2 * (1.0 - cos2)
    YL2 = Y2 * cos2
    alpha = 0.25 * YT2 ** 2 + YL2 * Xm1 ** 2
    mag = alpha > 0.0
    beta = jnp.sqrt(jnp.where(mag, alpha, 1.0))
    if mode_mult > 0:
        # O-mode: cancellation-free factorisation (see magnetoionic.py)
        #   s = YL²(1−X)²/(β + ½YT²),  n² = ((1−X)² + s)/((1−X) + s)
        bsum = beta + 0.5 * YT2
        b_ok = bsum > 0.0
        s = jnp.where(b_ok, YL2 * Xm1 ** 2 / jnp.where(b_ok, bsum, 1.0),
                      0.0)
        D = Xm1 + s
        d_ok = D != 0.0
        # masked lanes: guard the INPUTS too, not just the output select —
        # second-order AD (the tracer's grad-of-grad w.r.t. field tables)
        # differentiates the division's backward pass, and an unguarded
        # numerator there turns the masked lane's 0·∂ into NaN
        Xm1_s = jnp.where(d_ok, Xm1, 1.0)
        s_s = jnp.where(d_ok, s, 0.0)
        n2_mag = (Xm1_s ** 2 + s_s) / jnp.where(d_ok, Xm1_s + s_s, 1.0)
    else:
        D = Xm1 - 0.5 * YT2 - beta
        d_ok = D != 0.0
        X_s = jnp.where(d_ok, X, 0.0)
        Xm1_s = jnp.where(d_ok, Xm1, 1.0)
        n2_mag = 1.0 - X_s * Xm1_s / jnp.where(d_ok, D, 1.0)
    n2_iso = Xm1
    n2 = jnp.where(mag, jnp.where(d_ok, n2_mag, 2.0), n2_iso)
    # physicality filter mirrors the reference's μ > 1 → NaN (library.py
    # :244-246). The headroom above 1 must be ROUNDING-scale for the
    # working dtype, not absolute: at the layer's bottom edge the exact
    # O-branch value is 1 − O(X·(1−n²_iso)) ≈ 1 − 1e-14 and the f32
    # quotient (Xm1²+s)/(Xm1+s) legitimately rounds to 1 + 1 ulp — on
    # TPU (reciprocal-multiply division, ≠ IEEE-rounded CPU divide)
    # this tripped the old 1e-12 gate and permanently froze grazing
    # rays mid-flight (round-5 all-NaN eastward-link ionogram). Accept
    # a few-ulp excursion and clamp it back onto the physical shell.
    tol = max(16.0 * jnp.finfo(jnp.result_type(n2)).eps, 1e-12)
    valid = (jnp.isfinite(n2) & (n2 > 0.0) & (n2 <= 1.0 + tol)
             & jnp.where(mag, d_ok, True))
    return jnp.where(valid, jnp.minimum(n2, 1.0), 1.0), valid


@jax.custom_jvp
def _interp_smooth(aq, bq, cq, pack):
    """Channel-stacked trilinear value with smoothed spatial derivatives.

    ``pack`` = (a_grid, b_grid, c_grid, fieldC, gaC, gbC, gcC) where
    ``fieldC`` is the channel-stacked volume [na, nb, nc, C] and
    gaC/gbC/gcC its precomputed 2nd-order grid-gradient volumes
    (:func:`pyrayhf_tpu.fields.grad_axis_ord2`). Returns the [C] values
    at one query point. The VALUE is plain trilinear interpolation of
    ``fieldC`` — all channels ride ONE [8, C] corner row gather
    (:func:`pyrayhf_tpu.trace3d._trilinear_pack`; per-channel
    interpolation cost the dispersion RHS 16 trilinear fetches = 128
    corner gathers per linearised evaluation, the packed form does it
    in 4). The query-point JVP interpolates the gradient volumes
    instead of differentiating the trilinear weights, so autodiff
    through a query point sees a smooth (trilinear) gradient field
    rather than the cell-piecewise-constant derivative of the
    interpolant — the same regularisation the isotropic 3-D tracer gets
    from its precomputed ``dmu_d*`` volumes. The FIELD-table tangent is
    propagated exactly (trilinear of the tangent volume), so
    ``jax.grad`` of tracer outputs w.r.t. Ne or B tables is supported;
    grid-coordinate tangents raise (differentiating w.r.t. the grid
    axes is not supported). Out-of-domain queries return NaN (→ the RHS
    freezes the ray).
    """
    a_g, b_g, c_g, fieldC, _, _, _ = pack
    vals, inside = _trilinear_pack(aq, bq, cq, a_g, b_g, c_g, fieldC)
    return jnp.where(inside, vals, jnp.nan)


def _interp_smooth_jvp(primals, tangents):
    from jax.custom_derivatives import SymbolicZero

    aq, bq, cq, pack = primals
    da, db, dc, dpack = tangents
    a_g, b_g, c_g, fieldC, gaC, gbC, gcC = pack
    d_ag, d_bg, d_cg, d_field = dpack[0], dpack[1], dpack[2], dpack[3]

    def fetch(vol):
        vals, inside = _trilinear_pack(aq, bq, cq, a_g, b_g, c_g, vol)
        return jnp.where(inside, vals, jnp.nan)

    val = fetch(fieldC)
    tan = jnp.zeros_like(val)

    def _is_zero(t):
        return isinstance(t, SymbolicZero)

    if not all(_is_zero(t) for t in (d_ag, d_bg, d_cg)):
        raise NotImplementedError(
            "_interp_smooth: differentiation w.r.t. the grid coordinate "
            "axes is not supported (field-table and query-point tangents "
            "are).")
    for dq, gvol in ((da, gaC), (db, gbC), (dc, gcC)):
        if not _is_zero(dq):
            tan = tan + fetch(gvol) * dq
    if not _is_zero(d_field):
        # exact value-channel tangent w.r.t. the field table: trilinear
        # is linear in the table, so interpolate the tangent volume.
        # (ga/gb/gc tangents only affect the smoothed derivative channel
        # — irrelevant to the value; ignored.)
        tan = tan + fetch(d_field)
    return val, tan


_interp_smooth.defjvp(_interp_smooth_jvp, symbolic_zeros=True)


def _pack(channels, a_g, b_g, c_g):
    """(grids, fieldC, ∂a, ∂b, ∂c) tuple for :func:`_interp_smooth`.

    ``channels``: list of [na, nb, nc] volumes, stacked onto a trailing
    channel axis so every query is one corner-row gather.
    """
    fieldC = jnp.stack(channels, axis=-1)
    return (a_g, b_g, c_g, fieldC, grad_axis_ord2(fieldC, a_g, 0),
            grad_axis_ord2(fieldC, b_g, 1), grad_axis_ord2(fieldC, c_g, 2))


def igrf_volume(alt_km, lat_deg, lon_deg, coeffs=None):
    """IGRF B vector [Tesla] on an (alt, lat, lon) grid.

    Returns (B_north, B_east, B_down), each [N_alt, N_lat, N_lon] — the
    inputs :func:`build_field_3d_aniso` expects. ``coeffs`` as in
    :func:`pyrayhf_tpu.igrf.igrf_field` (e.g. an epoch-interpolated
    table from :func:`pyrayhf_tpu.igrf.igrf_coefficients`).
    """
    from .igrf import igrf_field

    alt = jnp.asarray(alt_km, dtype=float)
    lat = jnp.asarray(lat_deg, dtype=float)
    lon = jnp.asarray(lon_deg, dtype=float)
    bn, be, bd, _, _ = igrf_field(lat[None, :, None], lon[None, None, :],
                                  alt[:, None, None], coeffs=coeffs)
    return bn * 1e-9, be * 1e-9, bd * 1e-9


def build_field_3d_aniso(alt_km, lat_deg, lon_deg, Ne, B_north, B_east,
                         B_down, nu=None):
    """Precompute the anisotropic tracer's field tables.

    ``Ne`` [m⁻³] and the geomagnetic components ``B_north``/``B_east``/
    ``B_down`` [Tesla, local geodetic frame — :func:`igrf_volume`
    provides them] on the monotone ``alt_km``/``lat_deg``/``lon_deg``
    grids, all [N_alt, N_lat, N_lon]. Unlike the fixed-ψ builder
    (:func:`pyrayhf_tpu.trace3d.build_field_3d`) nothing here depends on
    frequency or mode — one field dict serves every (f, mode) trace; the
    B vector is stored in ECEF components so the wave-normal angle is a
    plain dot product along the ray. The returned tables are
    differentiable inputs: ``jax.grad`` of tracer outputs w.r.t. ``Ne``
    or the B components is supported (tangents flow through the
    smoothed trilinear interpolant's value channel).

    ``nu``: ν(alt) [s⁻¹] for the absorption channel (default model).
    """
    from .absorption import collision_frequency

    alt, lat, lon, Ne = _validate_grids_3d(alt_km, lat_deg, lon_deg, Ne)
    bn = jnp.broadcast_to(jnp.asarray(B_north, dtype=float), Ne.shape)
    be = jnp.broadcast_to(jnp.asarray(B_east, dtype=float), Ne.shape)
    bd = jnp.broadcast_to(jnp.asarray(B_down, dtype=float), Ne.shape)
    # local geodetic (north, east, down) → ECEF per grid node
    lat2, lon2 = jnp.broadcast_arrays(jnp.deg2rad(lat)[:, None],
                                      jnp.deg2rad(lon)[None, :])
    rhat, north, east = _local_frame(lat2, lon2)
    # each frame vector: [N_lat, N_lon, 3]; components broadcast over alt
    b_ecef = (bn[..., None] * north[None] + be[..., None] * east[None]
              - bd[..., None] * rhat[None])
    nu_a = (collision_frequency(alt) if nu is None
            else jnp.asarray(nu, dtype=float))
    # one channel-stacked table [na, nb, nc, 4] = (Ne, Bx, By, Bz): the
    # dispersion RHS fetches all four with a single corner-row gather
    return {
        "alt": alt, "lat": lat, "lon": lon, "nu": nu_a,
        "tables": _pack([Ne, b_ecef[..., 0], b_ecef[..., 1],
                         b_ecef[..., 2]], alt, lat, lon),
    }


def _g_scalar(p, u, f0, field, mode, mode_mult):
    """Dispersion scalar G = u·u − n²(r, û, f) with aux (n², valid, κ)."""
    from .absorption import absorption_coefficient

    alt_g = field["alt"]
    r, lat, lon = _geodetic(p)
    alt = r - R_E
    latd, lond = jnp.rad2deg(lat), jnp.rad2deg(lon)
    # clamp altitude for the table lookups: below the grid bottom is free
    # space (Ne = 0); fractionally above the top (mid-RK4 stage before the
    # event backtracks) uses the top-edge value
    alt_c = jnp.clip(alt, alt_g[0], alt_g[-1])
    below = alt < alt_g[0]
    vals = _interp_smooth(alt_c, latd, lond, field["tables"])
    ne = jnp.where(below, 0.0, vals[0])
    bx, by, bz = vals[1], vals[2], vals[3]
    fin = (jnp.isfinite(ne) & jnp.isfinite(bx) & jnp.isfinite(by)
           & jnp.isfinite(bz))
    ne = jnp.where(fin & (ne > 0.0), ne, jnp.where(fin, 0.0, 1.0))
    b2 = bx * bx + by * by + bz * bz
    b_ok = b2 > 0.0
    babs = jnp.sqrt(jnp.where(b_ok, b2, 1.0))
    # X without the reference's sqrt-then-square (find_X, ref :120-137):
    # d(sqrt)/d(ne) at ne = 0 is inf, so find_X's derivative there is
    # 0·inf = NaN — and ne = 0 is the NORMAL below-layer state along a
    # ray. First-order grads w.r.t. launch/frequency masked it, but the
    # field-table adjoint scatters that NaN onto every Ne cell the ray
    # passes at zero density (round-5). The algebraic form is exact.
    X = ne * ((CP / f0) * (CP / f0))
    Y = jnp.where(b_ok, G_P * babs / f0, 0.0)
    u2 = jnp.dot(u, u)
    u_ok = u2 > 0.0
    umag = jnp.sqrt(jnp.where(u_ok, u2, 1.0))
    cosp = jnp.where(u_ok & b_ok,
                     (u[0] * bx + u[1] * by + u[2] * bz)
                     / (umag * babs), 0.0)
    cos2 = jnp.clip(cosp * cosp, 0.0, 1.0)
    n2, valid = _ah_n2(X, Y, cos2, mode_mult)
    valid = valid & fin & u_ok
    G = u2 - n2

    # absorption channel (value-only aux; QL Davies form with the LOCAL
    # wave-normal angle — the fixed-ψ tracers use the vertical-incidence
    # angle here)
    nu = jnp.interp(alt, alt_g, field["nu"])
    psi_deg = jnp.rad2deg(jnp.arccos(jnp.clip(jnp.abs(cosp), 0.0, 1.0)))
    mu = jnp.sqrt(n2)
    kap = absorption_coefficient(ne, nu, f0, babs, psi_deg, mu, mode)
    kap = jnp.where(valid & jnp.isfinite(kap), kap, 0.0)
    return G, (n2, valid, kap)


# state layout: y = [p(0:3) km ECEF, u(3:6) refractive-index vector,
#                    t(6) group delay s, P(7) phase path km,
#                    A(8) absorption dB]
_NST = 9


def _aniso_funcs(field, mode, z_ground):
    """(rhs, renorm, events, reflect) closures over one aniso field.

    Shared by the per-ray core and the batched fan cores so every path
    integrates the identical Haselgrove step math. ``rhs``/``renorm``
    take the wave frequency as a second argument: the per-ray core
    fixes it by closure, the multi-frequency fan carries it as a frozen
    state channel (so one launch integrates an entire ionogram sweep).
    """
    mode_mult = {"O": 1.0, "X": -1.0}[mode]
    g3 = partial(_g_scalar, field=field, mode=mode, mode_mult=mode_mult)
    g_vag = jax.value_and_grad(lambda p, u, f: g3(p, u, f),
                               argnums=(0, 1, 2), has_aux=True)

    def rhs(y, f0_hz):
        p, u = y[:3], y[3:6]
        (_, (n2, valid, kap)), (G_p, G_u, G_f) = g_vag(p, u, f0_hz)
        sig2 = jnp.dot(G_u, G_u)
        s_ok = sig2 > 1e-24
        sigma = jnp.sqrt(jnp.where(s_ok, sig2, 1.0))
        ok = (valid & s_ok & jnp.all(jnp.isfinite(G_p))
              & jnp.all(jnp.isfinite(G_u)) & jnp.isfinite(G_f))
        udG = jnp.dot(u, G_u)
        dp = G_u / sigma
        du = -G_p / sigma
        dt = (udG - f0_hz * G_f) / (C_KM_S * sigma)
        dP = udG / sigma
        vec = jnp.concatenate([dp, du, jnp.stack([dt, dP, kap])])
        return jnp.where(ok & jnp.all(jnp.isfinite(vec)), vec,
                         jnp.zeros(_NST))

    def renorm(y, f0_hz):
        # project |u| back onto the dispersion shell: |u| ← n(r, û)
        p, u = y[:3], y[3:6]
        umag = jnp.linalg.norm(u)
        u_ok = umag > 0.0
        uhat = u / jnp.where(u_ok, umag, 1.0)
        _, (n2, valid, _) = g3(p, uhat, f0_hz)
        u_new = jnp.where(valid & u_ok, jnp.sqrt(n2) * uhat, u)
        return y.at[3:6].set(u_new)

    alt_g, lat_g, lon_g = field["alt"], field["lat"], field["lon"]

    def events(y):
        r, lat, lon = _geodetic(y[:3])
        latd, lond = jnp.rad2deg(lat), jnp.rad2deg(lon)
        return jnp.array([
            r - (R_E + z_ground) - 1e-3,      # ground (index 0)
            (R_E + alt_g[-1]) - r,            # top
            latd - lat_g[0], lat_g[-1] - latd,
            lond - lon_g[0], lon_g[-1] - lond,
        ])

    def reflect(y):
        # specular ground bounce: tangential u preserved, radial flipped
        p, u = y[:3], y[3:6]
        rhat = p / jnp.linalg.norm(p)
        ur = jnp.dot(u, rhat)
        return y.at[3:6].set(u - 2.0 * jnp.minimum(ur, 0.0) * rhat)

    return rhs, renorm, events, reflect


def _aniso_launch_state(lat0_deg, lon0_deg, elevation_deg, azimuth_deg,
                        z_ground):
    """Initial [p, u, t, P, A] state for one anisotropic fan ray."""
    lat0 = jnp.deg2rad(lat0_deg)
    lon0 = jnp.deg2rad(lon0_deg)
    p0 = _ecef(lat0, lon0, R_E + z_ground + 1e-2)
    rhat0, north0, east0 = _local_frame(lat0, lon0)
    el = jnp.deg2rad(elevation_deg)
    az = jnp.deg2rad(azimuth_deg)
    d0 = (jnp.sin(el) * rhat0
          + jnp.cos(el) * (jnp.cos(az) * north0 + jnp.sin(az) * east0))
    # launch in free space below the grid: |u| = 1; the per-step shell
    # projection takes over once the ray enters the plasma
    return jnp.concatenate([p0, d0, jnp.zeros(3)])


def _aniso_path_products(lat0_deg, lon0_deg, azimuth_deg, ys, alive,
                         status):
    """Path channels, integrals and landing geometry for one traced ray."""
    lat0 = jnp.deg2rad(lat0_deg)
    lon0 = jnp.deg2rad(lon0_deg)
    az = jnp.deg2rad(azimuth_deg)
    rhat0 = _local_frame(lat0, lon0)[0]
    p_path = ys[:, :3]
    r_path, lat_path, lon_path = _geodetic(p_path)
    alt_path = r_path - R_E
    dseg = jnp.linalg.norm(jnp.diff(p_path, axis=0), axis=1)

    rhat_end = p_path[-1] / r_path[-1]
    cosc = jnp.clip(jnp.dot(rhat0, rhat_end), -1.0, 1.0)
    ground_range = R_E * jnp.arccos(cosc)
    _, _, nhat = _bearing_frame(lat0, lon0, az)
    cross_track = R_E * jnp.arcsin(
        jnp.clip(jnp.dot(rhat_end, nhat), -1.0, 1.0))
    landed = status == _STATUS["ground"]
    nan = jnp.nan
    return {
        "lat": jnp.rad2deg(lat_path), "lon": jnp.rad2deg(lon_path),
        "alt": alt_path, "ecef": p_path, "u": ys[:, 3:6], "alive": alive,
        "status_code": status,
        "group_path_km": jnp.nansum(dseg),
        "group_delay_sec": ys[-1, 6],
        "phase_path_km": ys[-1, 7],
        "absorption_db": ys[-1, 8],
        "apex_alt_km": jnp.nanmax(alt_path),
        "ground_range_km": jnp.where(landed, ground_range, nan),
        "cross_track_km": jnp.where(landed, cross_track, nan),
        "landing_lat_deg": jnp.where(landed, jnp.rad2deg(lat_path[-1]),
                                     nan),
        "landing_lon_deg": jnp.where(landed, jnp.rad2deg(lon_path[-1]),
                                     nan),
    }


@partial(jax.jit, static_argnames=("mode", "n_steps", "n_hops",
                                   "early_exit"))
def _aniso_core(field, lat0_deg, lon0_deg, elevation_deg, azimuth_deg,
                f0_hz, mode, ds, n_steps, z_ground, n_hops=1,
                early_exit=False):
    rhs, renorm, events, reflect = _aniso_funcs(field, mode, z_ground)
    y0 = _aniso_launch_state(lat0_deg, lon0_deg, elevation_deg,
                             azimuth_deg, z_ground)
    hop_kw = dict(reflect_fn=reflect, max_bounces=n_hops - 1) \
        if n_hops > 1 else {}
    ys, alive, status = _integrate(lambda y: rhs(y, f0_hz), y0, n_steps,
                                   ds, events,
                                   renorm_fn=lambda y: renorm(y, f0_hz),
                                   early_exit=early_exit, **hop_kw)
    return _aniso_path_products(lat0_deg, lon0_deg, azimuth_deg, ys,
                                alive, status)


def _aniso_fan_flat(field, lat0_deg, lon0_deg, elf, azf, f0f, mode, ds,
                    n_steps, z_ground, n_hops, chunk):
    """Flat [R]-ray anisotropic early-exit fan (shared fan machinery).

    The wave frequency rides as a FROZEN 10th state channel (df0/ds = 0;
    the event backtrack is linear so the channel is exactly preserved),
    which lets one launch integrate rays at DIFFERENT frequencies — the
    whole (frequency × elevation × azimuth) ionogram sweep in a single
    chunked while_loop that stops at the longest-lived ray. The step
    math on the 9 physical channels is identical to the per-ray scan
    core. Forward-only (reverse-mode field-table gradients take the
    scan path, ``early_exit=False`` in the callers).
    """
    from .gradient import _integrate_fan
    rhs, renorm, events, reflect = _aniso_funcs(field, mode, z_ground)

    def rhs10(y):
        return jnp.concatenate([rhs(y, y[_NST]), jnp.zeros(1)])

    def renorm10(y):
        return renorm(y, y[_NST])

    y0b = jax.vmap(lambda e, a: _aniso_launch_state(
        lat0_deg, lon0_deg, e, a, z_ground))(elf, azf)
    y0b = jnp.concatenate([y0b, f0f[:, None]], axis=1)
    hop_kw = dict(reflect_fn=reflect, max_bounces=n_hops - 1) \
        if n_hops > 1 else {}
    ys, alive, status = _integrate_fan(rhs10, y0b, n_steps, ds, events,
                                       renorm_fn=renorm10, chunk=chunk,
                                       **hop_kw)
    return jax.vmap(lambda y_i, a_i, s_i, az_i: _aniso_path_products(
        lat0_deg, lon0_deg, az_i, y_i[:, :_NST], a_i, s_i))(
            ys, alive, status, azf)


@partial(jax.jit, static_argnames=("mode", "n_steps", "n_hops", "chunk"))
def _aniso_fan_core(field, lat0_deg, lon0_deg, els, azs, f0_hz, mode, ds,
                    n_steps, z_ground, n_hops=1, chunk=125):
    """The [E, A] anisotropic fan as ONE batched early-exit integration.

    Same structure as :func:`pyrayhf_tpu.trace3d._trace3d_fan_core`:
    the Haselgrove step is vmapped INSIDE the chunked while_loop of
    :func:`pyrayhf_tpu.gradient._integrate_fan`, so the launch pays for
    the longest-lived ray instead of the full arc budget. ``f0_hz``
    broadcasts against the [E, A] fan.
    """
    el_g, az_g = jnp.meshgrid(els, azs, indexing="ij")
    f0_g = jnp.broadcast_to(jnp.asarray(f0_hz, dtype=float), el_g.shape)
    out = _aniso_fan_flat(field, lat0_deg, lon0_deg, el_g.ravel(),
                          az_g.ravel(), f0_g.ravel(), mode, ds, n_steps,
                          z_ground, n_hops, chunk)
    E, A = el_g.shape
    return {k: v.reshape((E, A) + v.shape[1:]) for k, v in out.items()}


@partial(jax.jit, static_argnames=("mode", "n_steps", "n_hops", "chunk"))
def _aniso_ionogram_fan(field, lat0_deg, lon0_deg, els, azs, f0s, mode,
                        ds, n_steps, z_ground, n_hops=1, chunk=125):
    """[F, E, A] sweep fan: every frequency's rays in ONE early-exit loop.

    The frequency-as-state-channel trick in :func:`_aniso_fan_flat`
    makes the whole oblique-ionogram ray budget one batched launch —
    the anisotropic field tables are frequency-independent, so no
    per-frequency volumes are needed (unlike the fixed-ψ synthesizer).
    """
    f_g, el_g, az_g = jnp.meshgrid(f0s, els, azs, indexing="ij")
    out = _aniso_fan_flat(field, lat0_deg, lon0_deg, el_g.ravel(),
                          az_g.ravel(), f_g.ravel(), mode, ds, n_steps,
                          z_ground, n_hops, chunk)
    # homing consumes only the per-ray scalars — drop the [n_steps]
    # path channels here, INSIDE the jit, so the [F·E·A, n_steps]
    # buffers never materialize in HBM as outputs
    drop = ("lat", "lon", "alt", "ecef", "u", "alive")
    F, E, A = el_g.shape
    return {k: v.reshape((F, E, A) + v.shape[1:])
            for k, v in out.items() if k not in drop}


def trace_ray_3d_anisotropic(field, lat0_deg, lon0_deg, elevation_deg,
                             azimuth_deg, f0_hz, *, mode="O", step_km=1.0,
                             s_max_km=6000.0, z_ground_km=0.0, n_hops=1,
                             early_exit=False):
    """Trace one ray with the full anisotropic dispersion relation.

    ``field`` from :func:`build_field_3d_aniso` (frequency- and
    mode-independent). Launch geometry as
    :func:`pyrayhf_tpu.trace3d.trace_ray_3d`; ``f0_hz``/``mode`` select
    the wave. Returns the same output dict as the fixed-ψ tracer plus
    ``u`` — the refractive-index vector along the path (|u| = n on the
    dispersion shell; its direction is the WAVE NORMAL, which in an
    anisotropic medium is not the ray direction).

    Group delay is exact through the dispersion relation's frequency
    derivative (no μ′ field), phase path is ∫u·dr, and the absorption
    channel evaluates the QL coefficient at the LOCAL wave-normal angle.
    Capability beyond the reference (its tracers are 2-D fixed-ψ, ref
    ``library.py:2128-2337``).

    Differentiable w.r.t. launch geometry, frequency, AND the field
    tables (Ne/B volumes in ``field`` — their tangents propagate through
    the smoothed interpolant), so tracer outputs can drive
    field-retrieval objectives; the grid COORDINATE axes are not
    differentiable (a tangent on them raises).

    ``early_exit=True`` integrates in a while_loop that stops when the
    ray freezes — faster for forward-only single traces, but reverse-
    mode AD cannot cross it, so it is OFF by default here (this tracer's
    field-table gradients are the advertised path; the batched fan
    :func:`trace_rays_3d_anisotropic` defaults ON instead).
    """
    n_steps = int(round(float(s_max_km) / float(step_km)))
    out = _aniso_core(field, jnp.asarray(lat0_deg, dtype=float),
                      jnp.asarray(lon0_deg, dtype=float),
                      jnp.asarray(elevation_deg, dtype=float),
                      jnp.asarray(azimuth_deg, dtype=float),
                      jnp.asarray(f0_hz, dtype=float), mode,
                      jnp.asarray(step_km, dtype=float), n_steps,
                      jnp.asarray(z_ground_km, dtype=float),
                      n_hops=int(n_hops), early_exit=bool(early_exit))
    code = int(out.pop("status_code"))
    out["status"] = {v: k for k, v in _STATUS.items()}[code]
    return out


def trace_rays_3d_anisotropic(field, lat0_deg, lon0_deg, elevation_deg,
                              azimuth_deg, f0_hz, *, mode="O",
                              step_km=1.0, s_max_km=6000.0,
                              z_ground_km=0.0, n_hops=1, early_exit=True):
    """Batched anisotropic fan: elevation [E] × azimuth [A] → [E, A, ...].

    One XLA launch, mirroring :func:`pyrayhf_tpu.trace3d.trace_rays_3d`.
    ``f0_hz`` may also be an array broadcast against the [E, A] fan
    (e.g. per-elevation frequencies for an ionogram sweep — the
    early-exit fan carries frequency as a frozen state channel, so
    mixed-frequency fans still run as one launch).
    ``early_exit=True`` (default) runs the fan's chunked while_loop
    integration — identical results, pays for the longest-lived ray
    instead of the full arc budget. Pass ``False`` when vmapping this
    function yourself or when reverse-mode differentiating through the
    trace.
    """
    n_steps = int(round(float(s_max_km) / float(step_km)))
    els = jnp.asarray(elevation_deg, dtype=float)
    azs = jnp.asarray(azimuth_deg, dtype=float)
    f0 = jnp.asarray(f0_hz, dtype=float)
    if early_exit:
        return _aniso_fan_core(
            field, jnp.asarray(lat0_deg, dtype=float),
            jnp.asarray(lon0_deg, dtype=float), els, azs, f0, mode,
            jnp.asarray(step_km, dtype=float), n_steps,
            jnp.asarray(z_ground_km, dtype=float), n_hops=int(n_hops))
    fn = lambda el, az: _aniso_core(
        field, jnp.asarray(lat0_deg, dtype=float),
        jnp.asarray(lon0_deg, dtype=float), el, az, f0, mode,
        jnp.asarray(step_km, dtype=float), n_steps,
        jnp.asarray(z_ground_km, dtype=float), n_hops=int(n_hops))
    return jax.vmap(lambda el: jax.vmap(lambda az: fn(el, az))(azs))(els)


def home_ray_3d_anisotropic(field, tx_lat, tx_lon, rx_lat, rx_lon, f0_hz,
                            *, mode="O", n_elev=48, n_az=9,
                            az_span_deg=8.0, elev_min_deg=5.0,
                            elev_max_deg=75.0, step_km=2.0,
                            s_max_km=4000.0, n_hops=1,
                            max_range_jump_km=200.0,
                            max_miss_jump_km=None):
    """Point-to-point homing on the full anisotropic dispersion surface.

    The anisotropic member of the homing family
    (:func:`pyrayhf_tpu.trace3d.home_ray_3d`): an (elevation × azimuth)
    fan of :func:`trace_rays_3d_anisotropic` rays around the
    great-circle bearing, per-azimuth elevation homing in range, then
    the signed landing miss interpolated to zero across azimuth — both
    stages reuse the guarded crossing machinery of the fixed-ψ solver.
    Because the fan carries the TRUE wave-normal physics, the homed O
    and X solutions differ not only in delay but in the corrected launch
    bearing (``azimuth_offset_*_deg``): magnetic out-of-plane deflection
    is part of the solve, which no fixed-ψ or 2-D tracer can represent.

    Output dict and NaN semantics as :func:`~pyrayhf_tpu.trace3d.home_ray_3d`.
    """
    from .trace3d import _home_fan_core, _home_setup

    geo = _home_setup(tx_lat, tx_lon, rx_lat, rx_lon, n_elev, n_az,
                      az_span_deg, elev_min_deg, elev_max_deg,
                      max_miss_jump_km)
    az0, D, els, azs, miss_cap = geo

    def fan_fn(fld, tlat, tlon, els_t, azs_t):
        return trace_rays_3d_anisotropic(
            fld, tlat, tlon, els_t, azs_t, f0_hz, mode=mode,
            step_km=step_km, s_max_km=s_max_km, n_hops=n_hops)

    out = _home_fan_core(field, tx_lat, tx_lon, az0, D, els, azs,
                         step_km=step_km, s_max_km=s_max_km,
                         n_hops=n_hops,
                         max_range_jump_km=max_range_jump_km,
                         miss_cap=miss_cap, fan_fn=fan_fn)
    out.update({"bearing_deg": az0, "range_km": D,
                "elevations_deg": els, "azimuths_deg": azs})
    return out


def synthesize_oblique_ionogram_3d_anisotropic(
        f0s_hz, tx_lat, tx_lon, rx_lat, rx_lon, field, *, mode="O",
        n_elev=48, n_az=9, az_span_deg=8.0, elev_min_deg=5.0,
        elev_max_deg=75.0, step_km=2.0, s_max_km=4000.0, n_hops=1,
        max_range_jump_km=200.0, max_miss_jump_km=None):
    """Oblique ionogram on the full anisotropic dispersion surface.

    The anisotropic completion of the oblique-ionogram family
    (:func:`pyrayhf_tpu.synthesize_oblique_ionogram` /
    ``..._2d`` / ``..._3d``): per-frequency two-angle homing with the
    TRUE wave-normal physics. Unlike the fixed-ψ 3-D synthesizer —
    which must stack one μ/μ′/κ volume PER (frequency, mode) — the
    anisotropic ``field`` (:func:`build_field_3d_aniso`) is frequency-
    and mode-independent, so the whole sweep closes over ONE volume and
    the homing vmaps over frequency in a single compiled program (no
    ``freq_chunk`` HBM budgeting needed).

    Returns stacked [N_freq] arrays (``delay_low/high_sec``,
    ``elev_*_deg``, ``azimuth_*_deg``, ``azimuth_offset_*_deg``,
    ``group_path_*``/``phase_path_*``/``absorption_*``) plus the link
    geometry; NaN rows above the (azimuth-resolved) link MUF.

    The ENTIRE [N_freq × E × A] ray budget integrates as one batched
    early-exit launch (frequency rides as a frozen state channel in
    :func:`_aniso_fan_flat`); the two crossing stages then vmap over
    the frequency axis of the traced fan. The sweep therefore pays for
    its single longest-lived ray, not N_freq full arc budgets.
    """
    import numpy as np

    from .trace3d import _home_setup, _homed_sweep

    f0s = np.atleast_1d(np.asarray(f0s_hz, dtype=float))
    az0, D, els, azs, miss_cap = _home_setup(
        tx_lat, tx_lon, rx_lat, rx_lon, n_elev, n_az, az_span_deg,
        elev_min_deg, elev_max_deg, max_miss_jump_km)
    n_steps = int(round(float(s_max_km) / float(step_km)))

    fan_all = _aniso_ionogram_fan(
        field, jnp.asarray(tx_lat, dtype=float),
        jnp.asarray(tx_lon, dtype=float), els, azs,
        jnp.asarray(f0s), mode, jnp.asarray(step_km, dtype=float),
        n_steps, jnp.asarray(0.0), n_hops=int(n_hops))

    out = _homed_sweep(fan_all, float(tx_lat), float(tx_lon), az0, D,
                       els, azs, float(step_km), float(s_max_km),
                       int(n_hops), float(max_range_jump_km), miss_cap)
    out.update({"freq_hz": f0s, "bearing_deg": az0, "range_km": D,
                "elevations_deg": els, "azimuths_deg": azs})
    return out
