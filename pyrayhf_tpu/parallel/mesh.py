"""Device-mesh scaling of the virtual-height engine.

The reference is a single-process NumPy library (SURVEY §2 'Parallelism
inventory': every distributed strategy Absent). The TPU-native equivalents
implemented here:

* **DP (profile batch)** — ionogram synthesis for (lat, lon, time) profile
  stacks sharded over the ``batch`` mesh axis; pure data parallel, output
  gathered by XLA.
* **TP analogue (frequency axis)** — the [N_freq, n_points] work tile is
  sharded over the ``freq`` mesh axis; each device computes its frequency
  slice of the ionogram (no collectives needed — frequencies are
  independent, like heads in tensor-parallel attention).
* **SP analogue (height axis)** — :func:`vh_height_sharded` splits the
  stretched-grid quadrature Σ μ'·dh across devices and combines partial
  integrals with one ``psum`` over ICI (the quadrature analogue of
  blockwise/ring attention, SURVEY §5 'Long-context').
* **Retrieval DP** — :func:`retrieval_step_sharded` takes one gradient step
  of a batched inversion with the loss gradient ``psum``-reduced across the
  profile shards (the training-step analogue).

All functions accept an explicit ``jax.sharding.Mesh`` so they compile
against virtual CPU meshes in tests and against real TPU slices unchanged.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..forward import vh_and_mask
from ..pallas_vh import ionogram_fast_xla
from ..magnetoionic import find_X, find_Y, find_mu_mup_masked, mode_multiplier

__all__ = ["ionogram_mesh", "synthesize_ionograms_sharded",
           "vh_height_sharded", "retrieval_step_sharded",
           "retrieve_gradient_batch_sharded", "trace_fan_3d_sharded",
           "doppler_batch_sharded"]


def ionogram_mesh(devices=None, batch_axis=None):
    """Build a (batch, freq) mesh over the given devices.

    ``batch_axis`` defaults to as many devices as possible on 'batch' with
    the remainder on 'freq' (frequency sharding only helps once the profile
    batch no longer fills the chips).
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if batch_axis is None:
        batch_axis = n
        freq_axis = 1
    else:
        if batch_axis <= 0 or n % batch_axis:
            raise ValueError(
                f"batch_axis={batch_axis} must be a positive divisor of "
                f"the device count ({n}); an uneven split would drop "
                "devices from the mesh")
        freq_axis = n // batch_axis
    import numpy as np
    dev_array = np.asarray(devices).reshape(batch_axis, freq_axis)
    return Mesh(dev_array, axis_names=("batch", "freq"))


def synthesize_ionograms_sharded(freq, den, bmag, bpsi, alt, mesh,
                                 mode="O", n_points=200, engine="xla",
                                 interpret=False):
    """Batched ionogram synthesis sharded over a (batch, freq) mesh.

    ``den``/``bmag``/``bpsi``: [B, N_alt] profile stacks (B divisible by the
    'batch' axis), ``alt``: [N_alt] shared grid, ``freq``: [F] MHz
    (F divisible by the 'freq' axis). Returns [B, F] virtual heights laid
    out (batch, freq) over the mesh.

    ``engine="xla"`` (default) runs the gather-free sweep under GSPMD
    (XLA partitions it; portable to any backend). ``engine="pallas"``
    runs the fused VMEM kernel per shard via ``shard_map`` — the
    TPU-production path (``interpret=True`` for CPU-mesh testing). Both
    are pure data parallelism: zero collectives; the [B, F] output stays
    sharded (batch, freq).
    """
    mm = mode_multiplier(mode)
    freq = jnp.asarray(freq, dtype=float)
    den = jnp.asarray(den, dtype=float)
    bmag = jnp.asarray(bmag, dtype=float)
    bpsi = jnp.asarray(bpsi, dtype=float)
    alt = jnp.asarray(alt, dtype=float)

    prof_sharding = NamedSharding(mesh, P("batch", None))
    freq_sharding = NamedSharding(mesh, P("freq"))
    out_sharding = NamedSharding(mesh, P("batch", "freq"))

    if engine == "pallas":
        from ..pallas_vh import ionogram_pallas

        @jax.jit
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P("freq"), P("batch", None), P("batch", None),
                           P("batch", None), P(None)),
                 out_specs=P("batch", "freq"),
                 # pallas_call does not declare varying-mesh-axes metadata
                 check_vma=False)
        def run(freq, den, bmag, bpsi, alt):
            return ionogram_pallas(freq, den, bmag, bpsi, alt,
                                   mode_mult=mm, n_points=n_points,
                                   interpret=interpret)
    elif engine == "xla":
        @partial(jax.jit, out_shardings=out_sharding)
        def run(freq, den, bmag, bpsi, alt):
            # gather-free fast path (matches the parity operator to
            # ~5e-9 km in f64; see pallas_vh.ionogram_fast_xla)
            return ionogram_fast_xla(freq, den, bmag, bpsi, alt,
                                     mode_mult=mm, n_points=n_points)
    else:
        raise ValueError("engine must be 'xla' or 'pallas'")

    freq = jax.device_put(freq, freq_sharding)
    den = jax.device_put(den, prof_sharding)
    bmag = jax.device_put(bmag, prof_sharding)
    bpsi = jax.device_put(bpsi, prof_sharding)
    return run(freq, den, bmag, bpsi, alt)


def vh_height_sharded(freq_mhz, den, bmag, bpsi, alt, mesh, axis="batch",
                      mode="O", n_points=256):
    """Height(SP)-sharded quadrature: each device integrates a slice of the
    stretched grid and partial sums combine with one psum over ICI.

    Demonstrates the collective layout for n_points too large for one
    chip's VMEM (SURVEY §5). ``n_points`` must be divisible by the axis size.
    """
    from jax import shard_map

    mm = mode_multiplier(mode)
    n_dev = mesh.shape[axis]
    if n_points % n_dev:
        raise ValueError("n_points must be divisible by the mesh axis size")
    from ..grid import regrid_core

    freq_hz = jnp.asarray(freq_mhz, dtype=float) * 1e6
    den = jnp.asarray(den, dtype=float)
    bmag = jnp.asarray(bmag, dtype=float)
    bpsi = jnp.asarray(bpsi, dtype=float)
    alt = jnp.asarray(alt, dtype=float)

    # regrid once (replicated — it is O(N_freq · N_alt), cheap), then shard
    # the [N_freq, n_points] tiles along the height axis
    rg = regrid_core(freq_hz, den, bmag, bpsi, alt, mode_mult=mm,
                     n_points=n_points, masked=True)

    spec_in = P(None, axis)

    def shard_fn(den_t, bmag_t, bpsi_t, dist_t, freq_t):
        aX = find_X(den_t, freq_t)
        aY = find_Y(freq_t, bmag_t)
        mode_str = "O" if mm > 0 else "X"
        _, mup, ok = find_mu_mup_masked(aX, aY, bpsi_t, mode_str)
        partial_ih = jnp.sum(jnp.where(ok, mup * dist_t, 0.0), axis=1)
        return jax.lax.psum(partial_ih, axis_name=axis)

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(spec_in,) * 5,
                   out_specs=P(None))
    ih = fn(rg["den"], rg["bmag"], rg["bpsi"], rg["dist"], rg["freq"])
    vh = jnp.where(rg["row_ok"] & (ih != 0.0), ih + jnp.min(alt), jnp.nan)
    return vh


def retrieval_step_sharded(theta, obs, freq, den_aux, mesh, lr=1e-2,
                           n_points=64):
    """One gradient step of a batched retrieval with psum'd gradients.

    ``theta``: {'hm': [B], 'bb': [B], 'nm': [B]} per-profile layer params;
    ``obs``: [B, F] observed virtual heights; ``den_aux``: dict with
    'alt' [N], 'bmag' [N], 'bpsi' [N], 'E' layer dict and 'B_top' scalar.
    The profile batch is sharded over the 'batch' axis; each device
    computes its shard's loss gradient; the scalar loss is psum-reduced
    (pure DP — the canonical training step for the dryrun harness).
    Returns (theta_next, loss).
    """
    from jax import shard_map
    from .. import edp

    alt = den_aux["alt"]
    bmag = den_aux["bmag"]
    bpsi = den_aux["bpsi"]
    E = den_aux["E"]
    B_top = den_aux["B_top"]

    def one_profile_loss(hm, bb, nm, obs_row):
        NmF1, _, hmF1, _ = edp.derive_dependent_F1_parameters(
            0.8, nm, hm, bb, E["hm"])
        EDP = edp.reconstruct_density_1level(
            {"Nm": nm, "hm": hm, "B_bot": bb, "B_top": B_top},
            {"Nm": NmF1, "hm": hmF1}, E, alt)
        vh, valid = vh_and_mask(freq, EDP, bmag, bpsi, alt,
                                mode_mult=1.0, n_points=n_points)
        use = valid & jnp.isfinite(obs_row)
        r = jnp.where(use, obs_row - vh, 0.0)
        return jnp.sum(r * r)

    def shard_step(hm, bb, nm, obs_shard):
        def loss(hm, bb, nm):
            per = jax.vmap(one_profile_loss)(hm, bb, nm, obs_shard)
            return jax.lax.psum(jnp.sum(per), axis_name="batch")

        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(hm, bb, nm)
        return (hm - lr * grads[0], bb - lr * grads[1],
                nm - lr * grads[2], val)

    fn = shard_map(shard_step, mesh=mesh,
                   in_specs=(P("batch"), P("batch"), P("batch"),
                             P("batch", None)),
                   out_specs=(P("batch"), P("batch"), P("batch"), P()))
    hm, bb, nm, loss = fn(theta["hm"], theta["bb"], theta["nm"], obs)
    return {"hm": hm, "bb": bb, "nm": nm}, loss


def retrieve_gradient_batch_sharded(F2, F1, E, f_in, vh_obs, alt, b_mag,
                                    b_psi, mesh, mode="O", n_points=200,
                                    bottom_type="B_bot", steps=25,
                                    fit_nm=False, crit_margin=0.995,
                                    chunk_size=None):
    """DP-sharded batched LM retrieval: [B, F] ionograms over the 'batch'
    mesh axis.

    The parallel Levenberg–Marquardt loop
    (:func:`pyrayhf_tpu.retrieval.retrieve_gradient_batch`) is
    embarrassingly parallel over the sample axis — per-sample jacobians,
    damping, and 2×2/3×3 normal-equation solves — so placing the
    observations and initial guesses with a ``P('batch', ...)`` sharding
    lets GSPMD partition every LM iteration with zero collectives; the
    chips only exchange data when the fitted results are gathered at the
    end. B must be divisible by the axis size.

    ``chunk_size`` (for very large per-chip B, or to stay under a
    single-launch watchdog) is implemented HERE, not delegated: each
    chunk is re-placed with the batch sharding before its LM loop, so
    per-chunk work stays fully partitioned and results are gathered to
    host once at the end — delegating to the unsharded chunker would
    silently serialise (its per-chunk host assembly drops the sharding).
    Every chunk (including a ragged final one) must be divisible by the
    'batch' axis size.
    """
    from ..retrieval import retrieve_gradient_batch

    obs = jnp.atleast_2d(jnp.asarray(vh_obs, dtype=float))
    B = obs.shape[0]
    ax = mesh.shape["batch"]
    if B % ax:
        raise ValueError("B must be divisible by the 'batch' axis size")

    # per-sample magnetic environments ([B, N] b_mag/b_psi — the global-
    # grid case) ride the same 'batch' sharding as the observations;
    # shared [N] environments are replicated as before
    b_mag = jnp.asarray(b_mag, dtype=float)
    b_psi = jnp.asarray(b_psi, dtype=float)

    def _env_part(a, sel):
        return a if a.ndim == 1 else a[sel]

    F2 = dict(F2)
    keys = ["hm", "B_bot" if bottom_type == "B_bot" else "B0"]
    if fit_nm:
        keys.append("Nm")
    for k in keys:
        F2[k] = jnp.broadcast_to(jnp.asarray(F2[k], dtype=float).reshape(-1),
                                 (B,))

    def run(obs_c, F2_c, bmag_c, bpsi_c):
        obs_s = jax.device_put(obs_c, NamedSharding(mesh, P("batch", None)))
        F2_s = dict(F2_c)
        for k in keys:
            F2_s[k] = jax.device_put(F2_c[k],
                                     NamedSharding(mesh, P("batch")))
        if bmag_c.ndim == 2:
            bmag_c = jax.device_put(bmag_c,
                                    NamedSharding(mesh, P("batch", None)))
        if bpsi_c.ndim == 2:
            bpsi_c = jax.device_put(bpsi_c,
                                    NamedSharding(mesh, P("batch", None)))
        return retrieve_gradient_batch(
            F2_s, F1, E, f_in, obs_s, alt, bmag_c, bpsi_c, mode=mode,
            n_points=n_points, bottom_type=bottom_type, steps=steps,
            fit_nm=fit_nm, crit_margin=crit_margin, chunk_size=None)

    if chunk_size is None or int(chunk_size) >= B:
        return run(obs, F2, b_mag, b_psi)

    cs = int(chunk_size)
    if cs % ax or (B % cs) % ax:
        raise ValueError(
            "chunk_size (and any ragged final chunk) must be divisible "
            f"by the 'batch' axis size {ax} (got chunk_size={cs}, B={B})")
    import numpy as np
    parts = []
    for s in range(0, B, cs):
        sl = slice(s, min(s + cs, B))
        F2_c = dict(F2)
        for k in keys:
            F2_c[k] = F2[k][sl]
        parts.append(run(obs[sl], F2_c, _env_part(b_mag, sl),
                         _env_part(b_psi, sl)))
    vh = jnp.concatenate([p[0] for p in parts], axis=0)
    edp = jnp.concatenate([p[1] for p in parts], axis=0)
    hist = np.concatenate([np.asarray(p[3]) for p in parts], axis=1)
    key2 = "B_bot" if bottom_type == "B_bot" else "B0"
    F2_fit = dict(parts[0][2])
    for k in ("Nm", "hm", key2):
        F2_fit[k] = np.concatenate(
            [np.asarray(p[2][k]).reshape(-1) for p in parts])
    return vh, edp, F2_fit, hist


def trace_fan_3d_sharded(field, lat0_deg, lon0_deg, elevation_deg,
                         azimuth_deg, mesh, axis="batch", *, step_km=2.0,
                         s_max_km=3000.0, z_ground_km=0.0, n_hops=1):
    """3-D (elevation × azimuth) fan with the elevation axis sharded.

    Each device traces its elevation slice against the full azimuth set;
    the μ/μ'/κ volume (closed over, so replicated to every device) is
    read-only — pure DP over rays, no collectives. Output leaves are
    [E, A, ...] arrays sharded on E, bitwise-identical to the unsharded
    :func:`pyrayhf_tpu.trace3d.trace_rays_3d`.
    """
    from jax import shard_map

    from ..trace3d import _trace3d_fan_core

    els = jnp.asarray(elevation_deg, dtype=float)
    azs = jnp.asarray(azimuth_deg, dtype=float)
    n_dev = mesh.shape[axis]
    if els.size % n_dev:
        raise ValueError(
            f"elevation count ({els.size}) must be divisible by the "
            f"'{axis}' mesh axis size ({n_dev})")
    n_steps = int(round(float(s_max_km) / float(step_km)))
    # the same batched early-exit fan core the unsharded trace_rays_3d
    # runs — each device's while_loop trips for ITS slice's longest ray
    # (no collectives inside, so divergent trip counts are fine)
    core = _trace3d_fan_core.__wrapped__
    args = (jnp.asarray(lat0_deg, dtype=float),
            jnp.asarray(lon0_deg, dtype=float))

    def shard_fn(els_t):
        return core(field, *args, els_t, azs,
                    jnp.asarray(step_km, dtype=float), n_steps,
                    jnp.asarray(z_ground_km, dtype=float),
                    n_hops=int(n_hops))

    # check_vma off: the tracer's step loop carries constant-typed init
    # values (alive flag, status code) that become device-varying through
    # y0 — semantically fine for a collective-free pure map, but the
    # varying-manual-axes checker rejects the mixed carry
    fn = jax.jit(shard_map(shard_fn, mesh=mesh, in_specs=(P(axis),),
                           out_specs=P(axis), check_vma=False))
    return fn(els)

def trace_fan_3d_aniso_sharded(field, lat0_deg, lon0_deg, elevation_deg,
                               azimuth_deg, f0_hz, mesh, axis="batch", *,
                               mode="O", step_km=1.0, s_max_km=6000.0,
                               z_ground_km=0.0, n_hops=1):
    """Anisotropic 3-D fan with the elevation axis sharded over the mesh.

    The full-Haselgrove analogue of :func:`trace_fan_3d_sharded`: each
    device traces its elevation slice of the [E, A] fan through the
    shared (frequency- and mode-independent) anisotropic field volume
    from :func:`pyrayhf_tpu.trace3d_aniso.build_field_3d_aniso`. Pure DP
    over rays — the Ne/B tables are closed over (replicated), there are
    no collectives, and every output leaf is [E, A, ...] sharded on E,
    matching the unsharded
    :func:`pyrayhf_tpu.trace3d_aniso.trace_rays_3d_anisotropic` to
    ≤1e-9 relative (not bitwise: the value_and_grad dispersion RHS may
    fuse differently under GSPMD than under plain vmap).
    """
    from jax import shard_map

    from ..trace3d_aniso import _aniso_fan_core

    els = jnp.asarray(elevation_deg, dtype=float)
    azs = jnp.asarray(azimuth_deg, dtype=float)
    n_dev = mesh.shape[axis]
    if els.size % n_dev:
        raise ValueError(
            f"elevation count ({els.size}) must be divisible by the "
            f"'{axis}' mesh axis size ({n_dev})")
    n_steps = int(round(float(s_max_km) / float(step_km)))
    # same batched early-exit fan core as the unsharded fan — each
    # device's while_loop trips for ITS elevation slice's longest ray
    core = _aniso_fan_core.__wrapped__
    args = (jnp.asarray(lat0_deg, dtype=float),
            jnp.asarray(lon0_deg, dtype=float))

    def shard_fn(els_t):
        return core(field, *args, els_t, azs,
                    jnp.asarray(f0_hz, dtype=float), mode,
                    jnp.asarray(step_km, dtype=float), n_steps,
                    jnp.asarray(z_ground_km, dtype=float),
                    n_hops=int(n_hops))

    # check_vma off for the same mixed-carry reason as the fixed-psi fan
    fn = jax.jit(shard_map(shard_fn, mesh=mesh, in_specs=(P(axis),),
                           out_specs=P(axis), check_vma=False))
    return fn(els)


def doppler_batch_sharded(freq, den, dden_dt, bmag, bpsi, alt, mesh,
                          axis="batch", mode="O", n_points=200):
    """Batched vertical-incidence Doppler with the profile batch sharded.

    DP over a [B, N] profile stack (e.g. a global grid with a model
    tendency field): each device runs the phase-operator jvp
    (:func:`pyrayhf_tpu.doppler.doppler_shift_vertical`) for its profile
    shard — pure data parallel, no collectives. ``den``/``dden_dt`` are
    [B, N]; ``bmag``/``bpsi`` may be [N] (shared) or [B, N] (per-cell
    IGRF); ``alt`` is shared. Returns {"doppler_hz", "phase_height_km"}
    as [B, F] arrays sharded on B, equal to the vmapped unsharded call.
    """
    from jax import shard_map

    from ..doppler import _doppler_core

    freq = jnp.asarray(freq, dtype=float)
    den = jnp.atleast_2d(jnp.asarray(den, dtype=float))
    dden = jnp.broadcast_to(jnp.asarray(dden_dt, dtype=float), den.shape)
    bmag = jnp.broadcast_to(jnp.asarray(bmag, dtype=float), den.shape)
    bpsi = jnp.broadcast_to(jnp.asarray(bpsi, dtype=float), den.shape)
    alt = jnp.asarray(alt, dtype=float)
    B = den.shape[0]
    n_dev = mesh.shape[axis]
    if B % n_dev:
        raise ValueError(
            f"batch size ({B}) must be divisible by the '{axis}' mesh "
            f"axis size ({n_dev})")
    mm = mode_multiplier(mode)
    zero = jnp.zeros_like(alt)

    def one(d, dd, bm, bp):
        fd, hp, _ = _doppler_core(freq, d, dd, bm, zero, bp, zero, alt,
                                  mode_mult=mm, n_points=n_points)
        return fd, hp

    def shard_fn(d, dd, bm, bp):
        return jax.vmap(one)(d, dd, bm, bp)

    fn = jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis))))
    fd, hp = fn(den, dden, bmag, bpsi)
    return {"doppler_hz": fd, "phase_height_km": hp}
