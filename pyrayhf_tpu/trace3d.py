"""3-D magnetoionic ray tracing over (alt, lat, lon) fields.

New capability beyond the reference: PyRayHF's most general tracer is
2-D — a great-circle slice with no out-of-plane physics (ref
``library.py:2128-2337``). This module traces rays through a full 3-D
electron-density volume Ne(alt, lat, lon), capturing the horizontal
gradients that deflect rays OFF the launch great circle (cross-track
deviation, azimuth-dependent MUF, skewed propagation near the terminator
or the equatorial-anomaly crests).

Design (TPU-first, same architecture as the 2-D tracers):

* the refractive index μ (and μ', κ) are precomputed once per frequency
  on the (alt, lat, lon) grid — one broadcast Appleton–Hartree
  evaluation — with the same fixed vertical-incidence ψ convention the
  2-D tracers and the reference use (the field is anisotropically
  *computed* but isotropically *traced*);
* the ray state is Cartesian ECEF [x, y, z, vx, vy, vz] (km, unit v):
  no spherical-coordinate singularities, and the RHS is the same
  Haselgrove form as the 2-D Cartesian tracer,
  dv/ds = (∇μ − (∇μ·v)v)/μ, with ∇μ assembled from the (alt, lat, lon)
  grid gradients by the spherical chain rule;
* integration is the shared fixed-step RK4 ``lax.scan``
  (:func:`pyrayhf_tpu.gradient._integrate`) with freeze-on-event
  semantics and specular multi-hop ground bounces about the LOCAL
  vertical (``reflect_fn``);
* a whole (elevation × azimuth) fan traces in one ``vmap`` launch.

Spherical Earth of radius ``R_E`` (consistent with the 2-D spherical
tracer); longitudes must form a contiguous monotone window (no wrap
through ±180° inside the grid).
"""

from functools import partial

import jax
import jax.numpy as jnp

from .constants import C_KM_S, R_E
from .fields import grad_axis_ord2
from .gradient import _STATUS, _integrate
from .magnetoionic import find_X, find_Y, find_mu_mup

__all__ = ["build_field_3d", "build_field_3d_batch", "home_ray_3d",
           "synthesize_oblique_ionogram_3d", "trace_ray_3d",
           "trace_rays_3d", "trilinear"]


def _uniform_locate_params(grid):
    """(origin, inv_spacing) if ``grid`` is a CONCRETE uniform axis.

    Static (host-side) detection, f64 diffs of the raw values with an
    rtol that also accepts f32-quantized linspace axes. Returns None for
    traced or non-uniform grids — callers then keep searchsorted, which
    lowers to an O(log n) WHILE loop per query on TPU (round-5 profile:
    those while loops, not the gathers, dominated the ray-ODE RHS; the
    2-D fields learned the same lesson in
    :class:`pyrayhf_tpu.fields.RefractiveField`).
    """
    import numpy as _np

    from .fields import uniform_axis

    if isinstance(grid, jax.core.Tracer):
        return None
    g = _np.asarray(grid, dtype=_np.float64)
    if not uniform_axis(g):
        return None
    return float(g[0]), float((g.size - 1) / (g[-1] - g[0]))


def _locate(q, grid, n):
    """(cell index, fractional offset) of query ``q`` on ``grid`` [n].

    Concrete uniform grids (the common linspace axes) take a direct
    index-arithmetic path; otherwise searchsorted. Shared by the
    per-channel :func:`trilinear` and the packed block fetch
    :func:`_trilinear_pack` so both locate identically.
    """
    up = _uniform_locate_params(grid)
    if up is not None:
        o, inv_d = up
        f = (q - o) * inv_d
        f = jnp.where(jnp.isnan(f), 0.0, f)
        i = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, n - 2)
        return i, f - i
    i = jnp.clip(jnp.searchsorted(grid, q, side="right") - 1, 0, n - 2)
    return i, (q - grid[i]) / (grid[i + 1] - grid[i])


def trilinear(aq, bq, cq, a_grid, b_grid, c_grid, field, fill_value=jnp.nan):
    """Trilinear interpolation of ``field[na, nb, nc]`` at (aq, bq, cq).

    Out-of-domain queries return ``fill_value``. Query shapes broadcast.
    Concrete uniform grids (the common linspace axes) take a direct
    index-arithmetic path; otherwise searchsorted.
    """
    aq, bq, cq = jnp.broadcast_arrays(jnp.asarray(aq, dtype=float),
                                      jnp.asarray(bq, dtype=float),
                                      jnp.asarray(cq, dtype=float))
    na, nb, nc = field.shape
    ia, ta = _locate(aq, a_grid, na)
    ib, tb = _locate(bq, b_grid, nb)
    ic, tc = _locate(cq, c_grid, nc)
    out = jnp.zeros_like(aq)
    for da, wa in ((0, 1.0 - ta), (1, ta)):
        for db, wb in ((0, 1.0 - tb), (1, tb)):
            for dc, wc in ((0, 1.0 - tc), (1, tc)):
                out = out + wa * wb * wc * field[ia + da, ib + db, ic + dc]
    inside = ((aq >= a_grid[0]) & (aq <= a_grid[-1])
              & (bq >= b_grid[0]) & (bq <= b_grid[-1])
              & (cq >= c_grid[0]) & (cq <= c_grid[-1]))
    return jnp.where(inside, out, fill_value)


def _trilinear_pack(aq, bq, cq, a_grid, b_grid, c_grid, pack):
    """All-channel trilinear fetch at ONE point: a single (2,2,2,C) gather.

    ``pack`` is the channel-stacked volume [na, nb, nc, C]; queries are
    scalars (vmap for batches). Returns ``(vals [C], inside [])`` —
    callers apply their own per-channel out-of-domain fills.

    Why this exists: the per-channel :func:`trilinear` issues 8 corner
    gathers PER CHANNEL, so the ray-ODE RHS (μ + 3 gradient components)
    costs 32 independent HBM gathers per evaluation — 4 RK4 stages ×
    thousands of sequential steps deep, where the loop body's OP COUNT,
    not gather bandwidth, is what the TPU pays for. One row gather of
    the 8 corners × C channels plus one 8-term weight contraction
    replaces all of it. Measured on the v5e (tools/bench_fan_3d.py,
    48×9 fan, 200×40×40 volume): 2641 → 1281 ms from this packing
    alone (2.1×).
    """
    na, nb, nc, C = pack.shape
    rows, w, inside = _corner_rows(aq, bq, cq, a_grid, b_grid, c_grid,
                                   na, nb, nc)
    blk = jnp.take(pack.reshape(-1, C), rows, axis=0)             # [8, C]
    out = jnp.sum(w[:, None] * blk, axis=0)                       # [C]
    return out, inside


def _corner_rows(aq, bq, cq, a_grid, b_grid, c_grid, na, nb, nc):
    """(flat corner rows [8], trilinear weights [8], inside []) at a point.

    The locate + flat-index arithmetic shared by :func:`_trilinear_pack`
    and the frequency-batched fan RHS (which adds a per-ray
    ``f_idx · na·nb·nc`` row offset into a [F, na, nb, nc, C] stack —
    one add, same single row gather). A ``lax.dynamic_slice`` of the
    (2,2,2,C) block is the same data but lowers to a serialized
    multi-dim TPU gather — measured 3.3x SLOWER than even the
    per-channel path; the flat row gather is the shape XLA lowers well.
    """
    ia, ta = _locate(aq, a_grid, na)
    ib, tb = _locate(bq, b_grid, nb)
    ic, tc = _locate(cq, c_grid, nc)
    base = (ia * nb + ib) * nc + ic
    off = jnp.asarray([(da * nb + db) * nc + dc
                       for da in (0, 1) for db in (0, 1) for dc in (0, 1)],
                      dtype=base.dtype)
    wa = jnp.stack([1.0 - ta, ta])
    wb = jnp.stack([1.0 - tb, tb])
    wc = jnp.stack([1.0 - tc, tc])
    w = (wa[:, None, None] * wb[None, :, None]
         * wc[None, None, :]).reshape(8)
    inside = ((aq >= a_grid[0]) & (aq <= a_grid[-1])
              & (bq >= b_grid[0]) & (bq <= b_grid[-1])
              & (cq >= c_grid[0]) & (cq <= c_grid[-1]))
    return base + off, w, inside


def _validate_grids_3d(alt_km, lat_deg, lon_deg, Ne):
    """Shared host-side grid validation for the 3-D field builders."""
    import numpy as _np

    alt = jnp.asarray(alt_km, dtype=float)
    lat = jnp.asarray(lat_deg, dtype=float)
    lon = jnp.asarray(lon_deg, dtype=float)
    Ne = jnp.asarray(Ne, dtype=float)
    if Ne.shape != (alt.size, lat.size, lon.size):
        raise ValueError(
            f"Ne shape {Ne.shape} != (N_alt, N_lat, N_lon) = "
            f"({alt.size}, {lat.size}, {lon.size})")
    for name, g in (("alt_km", alt), ("lat_deg", lat), ("lon_deg", lon)):
        if not bool(_np.all(_np.diff(_np.asarray(g)) > 0)):
            raise ValueError(
                f"{name} must be strictly ascending (searchsorted-based "
                "trilinear interpolation; flip descending datasets with "
                "[::-1] on the grid and the matching field axis)")
    return alt, lat, lon, Ne


def _field_volumes(Ne, Babs, bpsi, f0_Hz, mode, nu_a, alt, lat_r, lon_r):
    """μ/μ'/κ volume + grid gradients for ONE frequency (traceable)."""
    from .absorption import absorption_coefficient

    X = find_X(Ne, f0_Hz)
    Y = find_Y(f0_Hz, Babs)
    mu, mup = find_mu_mup(X, Y, bpsi, mode)
    mu = jnp.where(jnp.isfinite(mu) & (mu > 0.0), mu, jnp.nan)
    mup = jnp.where(jnp.isfinite(mup) & (mup > 0.0), mup, jnp.nan)
    kappa = absorption_coefficient(Ne, nu_a[:, None, None], f0_Hz,
                                   Babs, bpsi, mu, mode)
    kappa = jnp.where(jnp.isfinite(kappa), kappa, 0.0)
    # gradients per km / per RADIAN of lat / per RADIAN of lon
    return {"mu": mu, "mup": mup, "kappa": kappa,
            "dmu_dalt": grad_axis_ord2(mu, alt, 0),
            "dmu_dlat": grad_axis_ord2(mu, lat_r, 1),
            "dmu_dlon": grad_axis_ord2(mu, lon_r, 2)}


def build_field_3d(alt_km, lat_deg, lon_deg, Ne, Babs, bpsi, f0_Hz,
                   mode="O", nu=None):
    """Precompute the μ/μ'/κ volume and its grid gradients for one
    frequency.

    ``Ne``/``Babs``/``bpsi``: [N_alt, N_lat, N_lon] on the monotone grids
    ``alt_km``/``lat_deg``/``lon_deg`` (e.g. stacked
    :func:`pyrayhf_tpu.envgen.generate_input_1D` columns). Returns the
    field dict :func:`trace_ray_3d` consumes. ψ is the vertical-incidence
    magnetic angle per column — the same convention as the 2-D builders
    (ref ``library.py:1764-1835``).

    ``nu``: ν(alt) [s⁻¹] for the absorption channel (default model).
    """
    from .absorption import collision_frequency

    alt, lat, lon, Ne = _validate_grids_3d(alt_km, lat_deg, lon_deg, Ne)
    nu_a = (collision_frequency(alt) if nu is None
            else jnp.asarray(nu, dtype=float))
    out = _field_volumes(Ne, jnp.asarray(Babs, dtype=float),
                         jnp.asarray(bpsi, dtype=float), f0_Hz, mode,
                         nu_a, alt, jnp.deg2rad(lat), jnp.deg2rad(lon))
    out.update(alt=alt, lat=lat, lon=lon)
    return out


def build_field_3d_batch(alt_km, lat_deg, lon_deg, Ne, Babs, bpsi,
                         f0s_hz, mode="O", nu=None,
                         hbm_budget_bytes=8 << 30):
    """Stacked μ/μ'/κ volumes for a FREQUENCY BATCH — one launch.

    The [F, N_alt, N_lat, N_lon] generalisation of
    :func:`build_field_3d`: the Appleton–Hartree evaluation is already a
    broadcast, so the whole frequency axis vmaps into a single XLA
    program. The grids (``alt``/``lat``/``lon``) stay unbatched — vmap
    field consumers with ``in_axes`` ``None`` on those keys (see
    :func:`synthesize_oblique_ionogram_3d`).

    The six stacked volumes cost ``6 · F · N_alt · N_lat · N_lon`` floats
    of HBM; a request beyond ``hbm_budget_bytes`` raises with chunking
    advice instead of OOM-ing mid-launch.
    """
    from .absorption import collision_frequency

    alt, lat, lon, Ne = _validate_grids_3d(alt_km, lat_deg, lon_deg, Ne)
    f0s = jnp.atleast_1d(jnp.asarray(f0s_hz, dtype=float))
    itemsize = jnp.asarray(0.0, dtype=float).dtype.itemsize
    need = 6 * int(f0s.size) * int(Ne.size) * itemsize
    if need > hbm_budget_bytes:
        raise ValueError(
            f"stacked field volumes need {need / 2**30:.1f} GiB "
            f"(> budget {hbm_budget_bytes / 2**30:.1f} GiB); chunk the "
            f"frequency axis (e.g. synthesize_oblique_ionogram_3d("
            f"freq_chunk=...)) or raise hbm_budget_bytes")
    nu_a = (collision_frequency(alt) if nu is None
            else jnp.asarray(nu, dtype=float))
    Babs_j = jnp.asarray(Babs, dtype=float)
    bpsi_j = jnp.asarray(bpsi, dtype=float)
    lat_r, lon_r = jnp.deg2rad(lat), jnp.deg2rad(lon)
    out = jax.jit(jax.vmap(
        lambda f0: _field_volumes(Ne, Babs_j, bpsi_j, f0, mode, nu_a,
                                  alt, lat_r, lon_r)))(f0s)
    out.update(alt=alt, lat=lat, lon=lon)
    return out


def _ecef(lat_rad, lon_rad, r_km):
    cl = jnp.cos(lat_rad)
    return r_km * jnp.stack([cl * jnp.cos(lon_rad), cl * jnp.sin(lon_rad),
                             jnp.sin(lat_rad)], axis=-1)


def _geodetic(p):
    """ECEF [..., 3] → (r, lat_rad, lon_rad); spherical Earth."""
    r = jnp.linalg.norm(p, axis=-1)
    lat = jnp.arcsin(jnp.clip(p[..., 2] / r, -1.0, 1.0))
    lon = jnp.arctan2(p[..., 1], p[..., 0])
    return r, lat, lon


def _local_frame(lat, lon):
    """(r̂, ê_north, ê_east) unit vectors at (lat, lon) [rad]."""
    sl, cl = jnp.sin(lat), jnp.cos(lat)
    so, co = jnp.sin(lon), jnp.cos(lon)
    rhat = jnp.stack([cl * co, cl * so, sl], axis=-1)
    north = jnp.stack([-sl * co, -sl * so, cl], axis=-1)
    east = jnp.stack([-so, co, jnp.zeros_like(so)], axis=-1)
    return rhat, north, east


def _bearing_frame(lat, lon, az):
    """(r̂₀, d̂₀, n̂) at a point for bearing ``az`` [all rad].

    n̂ = d̂₀ × r̂₀ is unit-norm and points to the RIGHT of the bearing
    (east when heading north) — the sign convention of every
    cross-track output in this module.
    """
    rhat, north, east = _local_frame(lat, lon)
    d0 = jnp.cos(az) * north + jnp.sin(az) * east
    nhat = jnp.cross(d0, rhat)
    return rhat, d0, nhat / jnp.linalg.norm(nhat)


def _ray_funcs_3d(field, z_ground):
    """(rhs_with_freespace, events, reflect) closures over one field.

    Shared by the per-ray core and the batched fan core so both paths
    integrate the identical step math (the fan core's chunked
    early-exit loop is bitwise-equal to the scan — see
    :func:`pyrayhf_tpu.gradient._integrate_fan`).
    """
    alt_g = field["alt"]
    lat_g = field["lat"]
    lon_g = field["lon"]

    # RHS channels stacked once per launch: μ + the three grid-gradient
    # components ride ONE 8-corner row gather per evaluation instead
    # of 32 independent per-channel gathers (see _trilinear_pack)
    pack_rhs = jnp.stack([field["mu"], field["dmu_dalt"],
                          field["dmu_dlat"], field["dmu_dlon"]], axis=-1)

    def rhs(y):
        p, v = y[:3], y[3:]
        r, lat, lon = _geodetic(p)
        alt = r - R_E
        latd, lond = jnp.rad2deg(lat), jnp.rad2deg(lon)
        vals, inside = _trilinear_pack(alt, latd, lond, alt_g, lat_g,
                                       lon_g, pack_rhs)
        mu = jnp.where(inside, vals[0], jnp.nan)
        g = jnp.where(inside, vals[1:], 0.0)
        rhat, north, east = _local_frame(lat, lon)
        cl = jnp.maximum(jnp.cos(lat), 1e-9)
        grad = (g[0] * rhat + (g[1] / r) * north
                + (g[2] / (r * cl)) * east)
        ok = jnp.isfinite(mu) & (mu > 0.0) & jnp.all(jnp.isfinite(grad))
        mu_s = jnp.where(ok, mu, 1.0)
        gdv = jnp.dot(grad, v)
        dv = (grad - gdv * v) / mu_s
        return jnp.where(ok, jnp.concatenate([v, dv]), jnp.zeros(6))

    # free space below the field's bottom altitude: rays fly straight
    # (∇μ = 0, μ = 1) until they enter the grid — matching the 2-D
    # homing's free-space ground extension
    alt_bot = alt_g[0]

    def rhs_with_freespace(y):
        r = jnp.linalg.norm(y[:3])
        below = (r - R_E) < alt_bot
        straight = jnp.concatenate([y[3:], jnp.zeros(3)])
        return jnp.where(below, straight, rhs(y))

    def events(y):
        p = y[:3]
        r, lat, lon = _geodetic(p)
        latd, lond = jnp.rad2deg(lat), jnp.rad2deg(lon)
        return jnp.array([
            r - (R_E + z_ground) - 1e-3,      # ground (index 0)
            (R_E + alt_g[-1]) - r,            # top
            latd - lat_g[0], lat_g[-1] - latd,
            lond - lon_g[0], lon_g[-1] - lond,
        ])

    def reflect(y):
        p, v = y[:3], y[3:]
        rhat = p / jnp.linalg.norm(p)
        vr = jnp.dot(v, rhat)
        v_new = v - 2.0 * jnp.minimum(vr, 0.0) * rhat
        return y.at[3:].set(v_new)

    return rhs_with_freespace, events, reflect


def _launch_state_3d(lat0_deg, lon0_deg, elevation_deg, azimuth_deg,
                     z_ground):
    """ECEF [x, y, z, vx, vy, vz] launch state for one fan ray."""
    lat0 = jnp.deg2rad(lat0_deg)
    lon0 = jnp.deg2rad(lon0_deg)
    p0 = _ecef(lat0, lon0, R_E + z_ground + 1e-2)
    rhat0, north0, east0 = _local_frame(lat0, lon0)
    el = jnp.deg2rad(elevation_deg)
    az = jnp.deg2rad(azimuth_deg)
    v0 = (jnp.sin(el) * rhat0
          + jnp.cos(el) * (jnp.cos(az) * north0 + jnp.sin(az) * east0))
    return jnp.concatenate([p0, v0])


def _path_products_3d(field, lat0_deg, lon0_deg, azimuth_deg, ys, alive,
                      status, mid_tables=None, row_offset=0):
    """Path channels, integrals and landing geometry for one traced ray.

    ``mid_tables``/``row_offset``: the frequency-batched fan passes
    three FLAT [F·na·nb·nc] (μ′, μ, κ) tables plus this ray's
    ``f_idx · na·nb·nc`` offset (``field`` then only supplies the
    grids). The quadrature fetch unrolls the 8 trilinear corners as
    separate 1-D gathers (shapes stay [n_steps]; [R, n_steps] under
    the fan's vmap): a packed corner-LAST gather would materialize
    [R, n_steps, 8, C], whose trailing dim tile-pads 8 → 128 lanes —
    16× HBM waste, a 19.9 GiB OOM at full-sweep scale (F·E·A rays).
    """
    alt_g = field["alt"]
    lat_g = field["lat"]
    lon_g = field["lon"]
    alt_bot = alt_g[0]
    lat0 = jnp.deg2rad(lat0_deg)
    lon0 = jnp.deg2rad(lon0_deg)
    az = jnp.deg2rad(azimuth_deg)
    rhat0 = _local_frame(lat0, lon0)[0]

    p_path = ys[:, :3]
    r_path, lat_path, lon_path = _geodetic(p_path)
    alt_path = r_path - R_E

    dseg = jnp.linalg.norm(jnp.diff(p_path, axis=0), axis=1)
    pm = 0.5 * (p_path[:-1] + p_path[1:])
    rm, latm, lonm = _geodetic(pm)
    latd_m, lond_m = jnp.rad2deg(latm), jnp.rad2deg(lonm)
    alt_m = rm - R_E
    # below the grid: free space (μ = μ' = 1, κ = 0); one packed fetch
    # for the three path channels (same trick as the RHS)
    below = alt_m < alt_bot
    if mid_tables is None:
        mid_tables = (field["mup"].reshape(-1), field["mu"].reshape(-1),
                      field["kappa"].reshape(-1))
    na, nb, nc = alt_g.size, lat_g.size, lon_g.size
    ia, ta = _locate(alt_m, alt_g, na)
    ib, tb = _locate(latd_m, lat_g, nb)
    ic, tc = _locate(lond_m, lon_g, nc)
    base = row_offset + (ia * nb + ib) * nc + ic
    acc = [jnp.zeros_like(ta)] * 3
    for da in (0, 1):
        for db in (0, 1):
            for dc in (0, 1):
                rows = base + (da * nb + db) * nc + dc
                w = ((ta if da else 1.0 - ta) * (tb if db else 1.0 - tb)
                     * (tc if dc else 1.0 - tc))
                acc = [a + w * jnp.take(t, rows)
                       for a, t in zip(acc, mid_tables)]
    in_m = ((alt_m >= alt_g[0]) & (alt_m <= alt_g[-1])
            & (latd_m >= lat_g[0]) & (latd_m <= lat_g[-1])
            & (lond_m >= lon_g[0]) & (lond_m <= lon_g[-1]))
    mup_m = jnp.where(below, 1.0, jnp.where(in_m, acc[0], jnp.nan))
    mu_m = jnp.where(below, 1.0, jnp.where(in_m, acc[1], jnp.nan))
    kap_m = jnp.where(below, 0.0, jnp.where(in_m, acc[2], 0.0))
    vfin = jnp.isfinite(mup_m)
    group_path = jnp.nansum(dseg)
    group_delay = jnp.nansum(jnp.where(vfin, mup_m / C_KM_S * dseg, 0.0))
    phase_path = jnp.nansum(
        jnp.where(jnp.isfinite(mu_m), mu_m * dseg, 0.0))
    absorb = jnp.nansum(jnp.where(jnp.isfinite(kap_m), kap_m * dseg, 0.0))

    # landing geometry (spherical): great-circle range + signed cross-track
    # relative to the launch great circle; n̂ = d̂0 × r̂0 points to the
    # RIGHT of the launch azimuth (east when heading north)
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
        "alt": alt_path, "ecef": p_path, "alive": alive,
        "status_code": status,
        "group_path_km": group_path, "group_delay_sec": group_delay,
        "phase_path_km": phase_path, "absorption_db": absorb,
        "apex_alt_km": jnp.nanmax(alt_path),
        "ground_range_km": jnp.where(landed, ground_range, nan),
        "cross_track_km": jnp.where(landed, cross_track, nan),
        "landing_lat_deg": jnp.where(landed, jnp.rad2deg(lat_path[-1]),
                                     nan),
        "landing_lon_deg": jnp.where(landed, jnp.rad2deg(lon_path[-1]),
                                     nan),
    }


@partial(jax.jit, static_argnames=("n_steps", "n_hops", "adaptive",
                                   "early_exit"))
def _trace3d_core(field, lat0_deg, lon0_deg, elevation_deg, azimuth_deg,
                  ds, n_steps, z_ground, n_hops=1, adaptive=False,
                  rtol=1e-7, atol=1e-9, s_max=None, h_max=None,
                  early_exit=False):
    rhs_with_freespace, events, reflect = _ray_funcs_3d(field, z_ground)
    y0 = _launch_state_3d(lat0_deg, lon0_deg, elevation_deg, azimuth_deg,
                          z_ground)
    hop_kw = dict(reflect_fn=reflect, max_bounces=n_hops - 1) \
        if n_hops > 1 else {}
    if adaptive:
        from .gradient import _integrate_adaptive
        ys, alive, status = _integrate_adaptive(
            rhs_with_freespace, y0, n_steps, s_max, ds, rtol, atol,
            h_max, events, v_slice=slice(3, 6), early_exit=early_exit,
            **hop_kw)
    else:
        ys, alive, status = _integrate(rhs_with_freespace, y0, n_steps,
                                       ds, events, v_slice=slice(3, 6),
                                       early_exit=early_exit, **hop_kw)
    return _path_products_3d(field, lat0_deg, lon0_deg, azimuth_deg, ys,
                             alive, status)


@partial(jax.jit, static_argnames=("n_steps", "n_hops", "chunk"))
def _trace3d_fan_core(field, lat0_deg, lon0_deg, els, azs, ds, n_steps,
                      z_ground, n_hops=1, chunk=125):
    """The [E, A] fan as ONE batched early-exit integration.

    The rays ride :func:`pyrayhf_tpu.gradient._integrate_fan` — the
    per-ray step is vmapped INSIDE a chunked while_loop, so the launch
    pays for the longest-lived ray (rounded up to a chunk) instead of
    the full ``n_steps`` arc budget. Identical step math to the vmapped
    scan core (measured bitwise-equal). On the v5e bench fan (48×9,
    2000-step budget, longest ray dead at step 649) this is 1281 →
    305 ms on top of the packed-gather RHS — 2641 → 305 ms (8.7×)
    for the two round-5 changes together (tools/bench_fan_3d.py).
    """
    from .gradient import _integrate_fan
    rhs_with_freespace, events, reflect = _ray_funcs_3d(field, z_ground)
    el_g, az_g = jnp.meshgrid(els, azs, indexing="ij")
    elf, azf = el_g.ravel(), az_g.ravel()
    y0b = jax.vmap(lambda e, a: _launch_state_3d(
        lat0_deg, lon0_deg, e, a, z_ground))(elf, azf)
    hop_kw = dict(reflect_fn=reflect, max_bounces=n_hops - 1) \
        if n_hops > 1 else {}
    ys, alive, status = _integrate_fan(rhs_with_freespace, y0b, n_steps,
                                       ds, events, v_slice=slice(3, 6),
                                       chunk=chunk, **hop_kw)
    out = jax.vmap(lambda y_i, a_i, s_i, az_i: _path_products_3d(
        field, lat0_deg, lon0_deg, az_i, y_i, a_i, s_i))(
            ys, alive, status, azf)
    E, A = el_g.shape
    return {k: v.reshape((E, A) + v.shape[1:]) for k, v in out.items()}


def _ray_funcs_3d_mf(field_b, z_ground):
    """(rhs, events, reflect) over a FREQUENCY-STACKED fixed-ψ field.

    ``field_b`` from :func:`build_field_3d_batch` ([F, …] volumes,
    shared grids). The ray state grows a frozen 7th channel — the
    ray's frequency INDEX into the stack (df_idx/ds = 0; the event
    backtrack is linear so it is exactly preserved, same trick as the
    anisotropic sweep's frequency channel). The RHS adds
    ``f_idx · na·nb·nc`` to the corner rows of ONE flattened
    [F·na·nb·nc, 4] table — one integer add on top of the
    single-frequency packed gather, so rays at DIFFERENT frequencies
    integrate together in one early-exit fan. Step math per ray is
    identical to :func:`_ray_funcs_3d` on the matching field slice.
    """
    alt_g = field_b["alt"]
    lat_g = field_b["lat"]
    lon_g = field_b["lon"]
    na, nb, nc = alt_g.size, lat_g.size, lon_g.size
    vol = na * nb * nc
    flat_rhs = jnp.stack([field_b["mu"], field_b["dmu_dalt"],
                          field_b["dmu_dlat"], field_b["dmu_dlon"]],
                         axis=-1).reshape(-1, 4)

    def rhs(y):
        p, v = y[:3], y[3:6]
        row_off = jnp.round(y[6]).astype(jnp.int32) * vol
        r, lat, lon = _geodetic(p)
        alt = r - R_E
        latd, lond = jnp.rad2deg(lat), jnp.rad2deg(lon)
        rows, w, inside = _corner_rows(alt, latd, lond, alt_g, lat_g,
                                       lon_g, na, nb, nc)
        blk = jnp.take(flat_rhs, row_off + rows, axis=0)
        vals = jnp.sum(w[:, None] * blk, axis=0)
        mu = jnp.where(inside, vals[0], jnp.nan)
        g = jnp.where(inside, vals[1:], 0.0)
        rhat, north, east = _local_frame(lat, lon)
        cl = jnp.maximum(jnp.cos(lat), 1e-9)
        grad = (g[0] * rhat + (g[1] / r) * north
                + (g[2] / (r * cl)) * east)
        ok = jnp.isfinite(mu) & (mu > 0.0) & jnp.all(jnp.isfinite(grad))
        mu_s = jnp.where(ok, mu, 1.0)
        gdv = jnp.dot(grad, v)
        dv = (grad - gdv * v) / mu_s
        out = jnp.concatenate([v, dv, jnp.zeros(1)])
        return jnp.where(ok, out, jnp.zeros(7))

    alt_bot = alt_g[0]

    def rhs_with_freespace(y):
        r = jnp.linalg.norm(y[:3])
        below = (r - R_E) < alt_bot
        straight = jnp.concatenate([y[3:6], jnp.zeros(4)])
        return jnp.where(below, straight, rhs(y))

    def events(y):
        p = y[:3]
        r, lat, lon = _geodetic(p)
        latd, lond = jnp.rad2deg(lat), jnp.rad2deg(lon)
        return jnp.array([
            r - (R_E + z_ground) - 1e-3,      # ground (index 0)
            (R_E + alt_g[-1]) - r,            # top
            latd - lat_g[0], lat_g[-1] - latd,
            lond - lon_g[0], lon_g[-1] - lond,
        ])

    def reflect(y):
        p, v = y[:3], y[3:6]
        rhat = p / jnp.linalg.norm(p)
        vr = jnp.dot(v, rhat)
        return y.at[3:6].set(v - 2.0 * jnp.minimum(vr, 0.0) * rhat)

    return rhs_with_freespace, events, reflect


@partial(jax.jit, static_argnames=("n_steps", "n_hops", "chunk"))
def _ionogram3d_fan_core(field_b, lat0_deg, lon0_deg, els, azs, ds,
                         n_steps, z_ground, n_hops=1, chunk=125):
    """[F, E, A] fixed-ψ sweep fan: every frequency's rays in ONE loop.

    The frequency-INDEX-as-state-channel companion of the anisotropic
    sweep (:func:`pyrayhf_tpu.trace3d_aniso._aniso_ionogram_fan`): the
    fixed-ψ tables are frequency-dependent, so rays carry an index into
    the [F, …] stack instead of the frequency itself. The whole
    ionogram ray budget pays for its single longest-lived ray instead
    of F vmapped full-budget scans. Path channels are dropped inside
    the jit — only per-ray scalars reach HBM as outputs.
    """
    from .gradient import _integrate_fan
    rhs_fs, events, reflect = _ray_funcs_3d_mf(field_b, z_ground)
    F = field_b["mu"].shape[0]
    vol = field_b["mu"].shape[1] * field_b["mu"].shape[2] \
        * field_b["mu"].shape[3]
    f_g, el_g, az_g = jnp.meshgrid(jnp.arange(F, dtype=float), els, azs,
                                   indexing="ij")
    ff, elf, azf = f_g.ravel(), el_g.ravel(), az_g.ravel()
    y0b = jax.vmap(lambda e, a: _launch_state_3d(
        lat0_deg, lon0_deg, e, a, z_ground))(elf, azf)
    y0b = jnp.concatenate([y0b, ff[:, None]], axis=1)
    hop_kw = dict(reflect_fn=reflect, max_bounces=n_hops - 1) \
        if n_hops > 1 else {}
    ys, alive, status = _integrate_fan(rhs_fs, y0b, n_steps, ds, events,
                                       v_slice=slice(3, 6), chunk=chunk,
                                       **hop_kw)
    mid_tables = (field_b["mup"].reshape(-1), field_b["mu"].reshape(-1),
                  field_b["kappa"].reshape(-1))
    out = jax.vmap(
        lambda y_i, a_i, s_i, az_i, f_i: _path_products_3d(
            field_b, lat0_deg, lon0_deg, az_i, y_i[:, :6], a_i, s_i,
            mid_tables=mid_tables,
            row_offset=jnp.round(f_i).astype(jnp.int32) * vol))(
                ys, alive, status, azf, ff)
    drop = ("lat", "lon", "alt", "ecef", "alive")
    E, A = els.size, azs.size
    return {k: v.reshape((F, E, A) + v.shape[1:])
            for k, v in out.items() if k not in drop}


def trace_ray_3d(field, lat0_deg, lon0_deg, elevation_deg, azimuth_deg, *,
                 step_km=1.0, s_max_km=6000.0, z_ground_km=0.0, n_hops=1,
                 rtol=None, atol=None, max_step_km=None, early_exit=True):
    """Trace one ray through a 3-D field (see :func:`build_field_3d`).

    Launches from (``lat0_deg``, ``lon0_deg``) at ``z_ground_km`` toward
    ``azimuth_deg`` (deg east of north) with ``elevation_deg`` above the
    horizon; fixed-step RK4 of ``step_km`` (beyond the reference — its
    tracers are 2-D, ref ``library.py:2128-2337``). Returns the
    (lat, lon, alt) path, ``status`` (ground/top/domain/length),
    group/phase path metrics, absorption, and the landing geometry —
    ``ground_range_km`` (great-circle) plus ``cross_track_km``, the
    signed offset from the launch great circle that only horizontal
    gradients can produce (positive to the right of the launch azimuth).
    ``n_hops``: specular bounces about the local vertical.

    ``rtol``/``atol``: when either is given, integration switches to the
    error-controlled Dormand–Prince 5(4) attempt scan shared with the
    2-D tracers (``step_km`` is then the initial step, ``max_step_km``
    the cap; 'attempts' status when the budget runs out).
    """
    adaptive = rtol is not None or atol is not None
    if adaptive:
        n_steps = 2 * int(round(float(s_max_km) / float(step_km)))
        kw = dict(adaptive=True,
                  rtol=jnp.asarray(1e-7 if rtol is None else rtol,
                                   dtype=float),
                  atol=jnp.asarray(1e-9 if atol is None else atol,
                                   dtype=float),
                  s_max=jnp.asarray(s_max_km, dtype=float),
                  h_max=jnp.asarray(jnp.inf if max_step_km is None
                                    else max_step_km, dtype=float))
    else:
        n_steps = int(round(float(s_max_km) / float(step_km)))
        kw = {}
    out = _trace3d_core(field, jnp.asarray(lat0_deg, dtype=float),
                        jnp.asarray(lon0_deg, dtype=float),
                        jnp.asarray(elevation_deg, dtype=float),
                        jnp.asarray(azimuth_deg, dtype=float),
                        jnp.asarray(step_km, dtype=float), n_steps,
                        jnp.asarray(z_ground_km, dtype=float),
                        n_hops=int(n_hops), early_exit=bool(early_exit),
                        **kw)
    code = int(out.pop("status_code"))
    out["status"] = {v: k for k, v in _STATUS.items()}[code]
    return out


def trace_rays_3d(field, lat0_deg, lon0_deg, elevation_deg, azimuth_deg, *,
                  step_km=1.0, s_max_km=6000.0, z_ground_km=0.0, n_hops=1,
                  early_exit=True):
    """Batched fan: elevation [E] × azimuth [A] → dict of [E, A, ...].

    One XLA launch for the whole solid-angle fan — the 3-D analogue of
    the 2-D (frequency × elevation) fans. ``early_exit=True`` (default)
    integrates the fan in a chunked while_loop that stops once every
    ray has frozen (identical results; pays for the longest-lived ray
    instead of the full arc budget). Pass ``False`` when vmapping this
    function yourself (e.g. over a stacked frequency axis — a
    while_loop under vmap re-selects the whole carry per lane) or when
    differentiating through the trace in reverse mode.
    """
    n_steps = int(round(float(s_max_km) / float(step_km)))
    els = jnp.asarray(elevation_deg, dtype=float)
    azs = jnp.asarray(azimuth_deg, dtype=float)
    if early_exit:
        return _trace3d_fan_core(
            field, jnp.asarray(lat0_deg, dtype=float),
            jnp.asarray(lon0_deg, dtype=float), els, azs,
            jnp.asarray(step_km, dtype=float), n_steps,
            jnp.asarray(z_ground_km, dtype=float), n_hops=int(n_hops))
    fn = lambda el, az: _trace3d_core(
        field, jnp.asarray(lat0_deg, dtype=float),
        jnp.asarray(lon0_deg, dtype=float), el, az,
        jnp.asarray(step_km, dtype=float), n_steps,
        jnp.asarray(z_ground_km, dtype=float), n_hops=int(n_hops),
        early_exit=False)
    return jax.vmap(lambda el: jax.vmap(lambda az: fn(el, az))(azs))(els)


def home_ray_3d(field, tx_lat, tx_lon, rx_lat, rx_lon, *, n_elev=48,
                n_az=9, az_span_deg=8.0, elev_min_deg=5.0,
                elev_max_deg=75.0, step_km=2.0, s_max_km=4000.0,
                n_hops=1, max_range_jump_km=200.0,
                max_miss_jump_km=None):
    """Point-to-point homing THROUGH a 3-D volume, with azimuth correction.

    The 1-D/2-D homing (:mod:`pyrayhf_tpu.oblique`) scans elevation along
    the fixed transmitter→receiver great circle; horizontal gradients
    deflect real rays OFF that circle, so the true solution launches at a
    corrected azimuth. This solves both angles: an (elevation × azimuth)
    fan around the great-circle bearing traces in one launch, each
    azimuth column is homed in range like the 2-D problem (low/high
    rays), and the signed landing miss (cross-track relative to the
    receiver bearing) is interpolated to zero across azimuth.

    Returns a dict with ``delay_low/high_sec``, ``elev_low/high_deg``,
    ``azimuth_low/high_deg`` (absolute launch bearings),
    ``azimuth_offset_low/high_deg`` (correction from the great-circle
    bearing — identically ~0 in a horizontally-uniform ionosphere),
    ``group_path_*/phase_path_*/absorption_*`` at the link, and the
    bearing/distance of the link. NaN when no fan ray closes the link.

    ``max_range_jump_km`` caps the ground-range discontinuity the
    ELEVATION stage may interpolate across; the azimuth-stage miss
    channel lives on a much smaller scale (tens of km), so it gets its
    own cap ``max_miss_jump_km`` — default 3× the smooth-family miss
    spacing between adjacent azimuth columns, D·Δaz (a launch-bearing
    offset moves the landing cross-track by ≈ D·tan Δaz for a smooth
    ray family; a jump well beyond that is a family boundary).
    """
    geo = _home_setup(tx_lat, tx_lon, rx_lat, rx_lon, n_elev, n_az,
                      az_span_deg, elev_min_deg, elev_max_deg,
                      max_miss_jump_km)
    az0, D, els, azs, miss_cap = geo
    out = _home_fan_core(field, tx_lat, tx_lon, az0, D, els, azs,
                         step_km=step_km, s_max_km=s_max_km,
                         n_hops=n_hops,
                         max_range_jump_km=max_range_jump_km,
                         miss_cap=miss_cap)
    out.update({"bearing_deg": az0, "range_km": D,
                "elevations_deg": els, "azimuths_deg": azs})
    return out


@partial(jax.jit, static_argnames=("tx_lat", "tx_lon", "az0", "D",
                                   "miss_cap", "max_range_jump_km",
                                   "step_km", "s_max_km", "n_hops"))
def _homed_sweep(fan_all, tx_lat, tx_lon, az0, D, els, azs, step_km,
                 s_max_km, n_hops, max_range_jump_km, miss_cap):
    """Both homing crossing stages vmapped over a PRE-TRACED [F, …] fan.

    Module-level jit (statics = the link geometry scalars) so repeated
    sweeps over the same link reuse one executable — synthesizers that
    trace the whole multi-frequency fan in one launch
    (:func:`pyrayhf_tpu.trace3d_aniso._aniso_ionogram_fan`) feed it
    here instead of re-homing per frequency.
    """
    return jax.vmap(lambda fan_f: _home_fan_core(
        None, tx_lat, tx_lon, az0, D, els, azs, step_km=step_km,
        s_max_km=s_max_km, n_hops=n_hops,
        max_range_jump_km=max_range_jump_km, miss_cap=miss_cap,
        fan_fn=lambda *_args: fan_f))(fan_all)


def _home_setup(tx_lat, tx_lon, rx_lat, rx_lon, n_elev, n_az, az_span_deg,
                elev_min_deg, elev_max_deg, max_miss_jump_km):
    """Validate the fan request; return (az0, D, els, azs, miss_cap).

    Host-side and frequency-independent — shared between the single-link
    homing and the one-launch ionogram, which closes over these as
    static values in one jitted program.
    """
    from .geodesy import azimuth_between_points, calculate_gcd

    if int(n_az) < 3:
        raise ValueError("n_az must be >= 3 (the azimuth root-find needs "
                         "a bracketing fan; use the 2-D homing for a "
                         "fixed great-circle bearing)")
    if int(n_elev) < 4:
        raise ValueError("n_elev must be >= 4")
    az0 = float(azimuth_between_points(tx_lon, tx_lat, rx_lon, rx_lat))
    D = float(jnp.deg2rad(calculate_gcd(tx_lon, tx_lat, rx_lon, rx_lat))
              * R_E)
    els = jnp.linspace(float(elev_min_deg), float(elev_max_deg),
                       int(n_elev))
    azs = az0 + jnp.linspace(-float(az_span_deg), float(az_span_deg),
                             int(n_az))
    # the azimuth-stage discontinuity cap lives on the miss channel's own
    # scale: 3× the smooth-family miss spacing between adjacent columns
    if max_miss_jump_km is None:
        daz = 2.0 * float(az_span_deg) / (int(n_az) - 1)
        miss_cap = 3.0 * D * float(jnp.deg2rad(daz))
    else:
        miss_cap = float(max_miss_jump_km)
    return az0, D, els, azs, miss_cap


def _home_fan_core(field, tx_lat, tx_lon, az0, D, els, azs, *, step_km,
                   s_max_km, n_hops, max_range_jump_km, miss_cap,
                   fan_fn=None, early_exit=True):
    """Traceable homing body: fan trace + elevation & azimuth stages.

    Geometry arguments are static Python scalars; the ``field`` leaves
    are traced, so a stacked [F, ...] field vmaps the whole solve over
    frequency in one program. Returns per-link jnp scalars.

    ``fan_fn(field, tx_lat, tx_lon, els, azs)`` overrides the fan tracer
    (default: the fixed-ψ :func:`trace_rays_3d`); any tracer returning
    the standard fan dict works — the anisotropic homing passes the
    dispersion-surface fan closed over (f0, mode).
    """
    from .oblique import _crossings

    if fan_fn is None:
        fan = trace_rays_3d(field, tx_lat, tx_lon, els, azs,
                            step_km=step_km, s_max_km=s_max_km,
                            n_hops=n_hops, early_exit=early_exit)
    else:
        fan = fan_fn(field, tx_lat, tx_lon, els, azs)
    # n̂ of the launch fan is per-azimuth; re-reference every landing to
    # the RECEIVER bearing so "miss" means the same thing in all columns:
    # signed offset of the landing from the tx→rx great circle
    _, _, nhat = _bearing_frame(jnp.deg2rad(float(tx_lat)),
                                jnp.deg2rad(float(tx_lon)),
                                jnp.deg2rad(az0))
    land = _ecef(jnp.deg2rad(fan["landing_lat_deg"]),
                 jnp.deg2rad(fan["landing_lon_deg"]), 1.0)     # unit r̂
    miss = R_E * jnp.arcsin(jnp.clip(
        jnp.einsum("eak,k->ea", land, nhat), -1.0, 1.0))        # [E, A]

    # per-azimuth elevation homing at range D (transposed: columns = az)
    chord = 2.0 * R_E * jnp.sin(0.5 * D / R_E)
    delay_floor = jnp.asarray(chord) / C_KM_S
    fn = partial(_crossings, elev=els, target=jnp.asarray(D),
                 max_jump=jnp.asarray(float(max_range_jump_km)),
                 delay_min=delay_floor)
    rng_ae = jnp.asarray(fan["ground_range_km"]).T              # [A, E]
    chans = tuple(jnp.asarray(fan[k]).T for k in
                  ("group_delay_sec", "phase_path_km", "group_path_km",
                   "absorption_db")) + (miss.T,)
    lo, hi = jax.vmap(lambda r, c: fn(r, c))(rng_ae, chans)
    # each: tuple(delay, phase, path, absorb, miss, elev, slope) of [A]

    out = {}
    for leg, vals in (("low", lo), ("high", hi)):
        delay, phase, path, absorb, m, elev, _ = vals
        # azimuth stage: the miss channel crosses zero; reuse the guarded
        # crossing finder (target 0, "range" = miss) so interpolating
        # across a ray-family discontinuity (miss jump > the cap) is
        # rejected instead of fabricating a solution — the azimuth
        # analogue of max_range_jump_km, on the miss channel's own scale
        sol, _ = _crossings(m, (delay, phase, path, absorb, elev),
                            elev=azs, target=jnp.asarray(0.0),
                            max_jump=jnp.asarray(miss_cap),
                            delay_min=delay_floor)
        s_delay, s_phase, s_path, s_absorb, s_elev, s_az, _ = sol
        out.update({f"delay_{leg}_sec": s_delay,
                    f"phase_path_{leg}_km": s_phase,
                    f"group_path_{leg}_km": s_path,
                    f"absorption_{leg}_db": s_absorb,
                    f"elev_{leg}_deg": s_elev,
                    f"azimuth_{leg}_deg": s_az,
                    f"azimuth_offset_{leg}_deg": s_az - az0})
    return out


def synthesize_oblique_ionogram_3d(f0s_hz, tx_lat, tx_lon, rx_lat, rx_lon,
                                   alt_km, lat_deg, lon_deg, Ne, Babs,
                                   bpsi, mode="O", nu=None, n_elev=48,
                                   n_az=9, az_span_deg=8.0,
                                   elev_min_deg=5.0, elev_max_deg=75.0,
                                   step_km=2.0, s_max_km=4000.0, n_hops=1,
                                   max_range_jump_km=200.0,
                                   max_miss_jump_km=None, freq_chunk=None,
                                   hbm_budget_bytes=8 << 30):
    """Oblique ionogram for a link THROUGH a 3-D volume — one launch.

    The 3-D completion of :func:`pyrayhf_tpu.synthesize_oblique_ionogram`
    (1-D profile) and ``synthesize_oblique_ionogram_2d`` (great-circle
    slice): low/high-ray delay, elevation AND gradient-corrected launch
    bearing per frequency. Fan/integration knobs match
    :func:`home_ray_3d`.

    Three compiled programs total (mirroring the 2-D one-launch fan,
    :func:`pyrayhf_tpu.oblique.synthesize_oblique_ionogram_2d`): the μ/μ'/κ
    volumes for EVERY frequency stack to [F, N_alt, N_lat, N_lon] in one
    launch (:func:`build_field_3d_batch`); the ENTIRE [F × E × A] ray
    budget integrates as one batched early-exit fan — each ray carries
    its frequency INDEX as a frozen state channel that offsets the
    packed corner gather into the stacked tables
    (:func:`_ionogram3d_fan_core`), so the sweep pays for its single
    longest-lived ray instead of F full-budget scans; and both homing
    crossing stages vmap over the pre-traced fan (:func:`_homed_sweep`).
    ``freq_chunk`` bounds the HBM held by the stacked volumes:
    frequencies run in fixed-size chunks (last chunk padded, so every
    chunk reuses the same executables). Outputs are stacked [N_freq]
    arrays plus the link geometry; NaN rows above the
    (azimuth-resolved) link MUF.
    """
    import numpy as np

    f0s = np.atleast_1d(np.asarray(f0s_hz, dtype=float))
    az0, D, els, azs, miss_cap = _home_setup(
        tx_lat, tx_lon, rx_lat, rx_lon, n_elev, n_az, az_span_deg,
        elev_min_deg, elev_max_deg, max_miss_jump_km)

    n_steps = int(round(float(s_max_km) / float(step_km)))
    chunk = int(freq_chunk) if freq_chunk else f0s.size
    parts = []
    for lo in range(0, f0s.size, chunk):
        sel = f0s[lo:lo + chunk]
        pad = chunk - sel.size
        if pad:      # pad with the last frequency: same compiled shape
            sel = np.concatenate([sel, np.full(pad, sel[-1])])
        field = build_field_3d_batch(alt_km, lat_deg, lon_deg, Ne, Babs,
                                     bpsi, sel, mode=mode, nu=nu,
                                     hbm_budget_bytes=hbm_budget_bytes)
        # the chunk's whole [F_chunk x E x A] ray budget integrates as
        # ONE batched early-exit launch (frequency INDEX as a frozen
        # state channel into the stacked tables); both crossing stages
        # then vmap over the pre-traced fan — the per-frequency
        # full-budget scans are gone
        fan_all = _ionogram3d_fan_core(
            field, jnp.asarray(tx_lat, dtype=float),
            jnp.asarray(tx_lon, dtype=float), els, azs,
            jnp.asarray(step_km, dtype=float), n_steps,
            jnp.asarray(0.0), n_hops=int(n_hops))
        row = _homed_sweep(fan_all, float(tx_lat), float(tx_lon), az0,
                           D, els, azs, float(step_km), float(s_max_km),
                           int(n_hops), float(max_range_jump_km),
                           miss_cap)
        parts.append({k: np.asarray(v)[:chunk - pad if pad else chunk]
                      for k, v in row.items()})
    out = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
    out.update({"bearing_deg": az0, "range_km": D,
                "elevations_deg": els, "azimuths_deg": azs})
    return out
