"""Pallas TPU kernel for 2-D gradient-tracer ray fans (VMEM-resident).

The XLA ray-ODE fan (``gradient.py::_integrate`` vmapped over rays) pays
an HBM-latency-bound XLA gather for every bilinear RHS evaluation — the
round-4 verdict measured the whole tier at ~550–1,350 rays/s, two orders
below the ionogram kernel's standard. This module moves the ENTIRE
integration loop inside one Pallas kernel:

* the per-frequency field tables (μ and its two grid gradients for the
  RHS; μ, μ', κ for the path metrics) are DMA'd to VMEM once per grid
  program and stay resident for all ``n_steps`` RK4 steps — a 620×800
  f32 field is ~2 MB, far under the ~16 MB v5e VMEM;
* rays ride the 128 hardware lanes (one elevation per lane); the state
  rows (x, z, vx, vz, accumulators, masks) are [1, 128] vregs;
* the bilinear interpolation is two hardware per-lane gathers
  (``tpu.dynamic_gather`` via the batched-1-element ``lax.gather`` form
  that Mosaic lowers to it — same technique as
  ``pallas_vh._block_gather``): the z-axis lives on LANES, gathered in
  128-entry blocks with a block-index select; the x-axis lives on
  SUBLANES (all channels stacked) and is resolved with a two-row
  weight-mask reduction — no searchsorted, no HBM traffic in the loop.

Semantics mirror ``gradient._integrate`` + ``_cart/_sph_gradient_core``
exactly (fixed-step RK4, linear backtrack to the first boundary
crossing, freeze-on-event, specular multi-hop ground bounces, NaN-μ
region zeroing the RHS, per-segment midpoint μ'/μ/κ quadrature) so the
fan-level outputs (landing range, group delay, absorption, group/phase
path) agree with the XLA engine to integration precision.

Replaces (perf-wise) the reference's ``solve_ivp`` tracer loop
(ref ``library.py:1271-1457, 2128-2337``), which runs one ray at a time
at ~2.4 s/ray.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .constants import C_KM_S, R_E

__all__ = ["fan_2d_pallas", "fan_2d_pallas_available"]

_LANES = 128
_GROUND = 1.0   # status codes, as floats (match gradient._STATUS values)
_DOMAIN = 2.0

_GATHER_DNUMS = jax.lax.GatherDimensionNumbers(
    offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
    operand_batching_dims=(0,), start_indices_batching_dims=(0,))


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _gather_zcols(tab_ref, iz, ca, n_blk, dtype):
    """Per-lane gather of z-columns ``tab[:, iz[lane]]`` from VMEM.

    ``tab_ref`` block is [1, ca, NZP]; ``iz`` is [1, 128] int32. The
    hardware per-lane gather reaches one 128-lane vreg, so the NZP-wide
    table is processed in 128-entry blocks: within-block gather on the
    low 7 index bits, then a select on the block index.
    Returns [ca, 128].
    """
    lo = iz & 127
    blk_i = iz >> 7
    lo_b = lo + jnp.zeros((ca, _LANES), jnp.int32)
    acc = jnp.zeros((ca, _LANES), dtype)
    for blk in range(n_blk):
        x_blk = tab_ref[0, :, blk * _LANES:(blk + 1) * _LANES]  # [ca, 128]
        got = jax.lax.gather(
            x_blk, lo_b[..., None], _GATHER_DNUMS, slice_sizes=(1, 1),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        acc = jnp.where(blk_i == blk, got, acc)
    return acc


def _make_bilin3(tab_ref, *, nxp, nz, nx, n_blk, o0, inv_d0, o1, inv_d1,
                 c0_lo, c0_hi, c1_lo, c1_hi, dtype):
    """Build a 3-channel bilinear evaluator over the VMEM table block.

    The table block is [1, 3·nxp, NZP]: channels stacked on sublanes
    (x-major within each channel), z on lanes. Queries are native grid
    coordinates (c0 = z or r on the gathered axis, c1 = x or φ on the
    mask-reduced axis), [1, 128] per row. Returns (ch0, ch1, ch2, inb),
    each [1, 128]; out-of-domain lanes carry the corner arithmetic of
    in-domain clamped cells and must be masked by the caller via
    ``inb`` — exactly the fill contract of ``RefractiveField``.

    NaN corners poison the result for any query whose 2×2 cell touches
    them (0·NaN = NaN), matching the XLA bilinear's weight arithmetic.
    """
    sub = jax.lax.broadcasted_iota(jnp.int32, (nxp, _LANES), 0)

    def bilin3(c0q, c1q):
        f0 = (c0q - o0) * inv_d0
        f1 = (c1q - o1) * inv_d1
        inb = ((c0q >= c0_lo) & (c0q <= c0_hi)
               & (c1q >= c1_lo) & (c1q <= c1_hi))
        f0 = jnp.where(jnp.isnan(f0), 0.0, f0)
        f1 = jnp.where(jnp.isnan(f1), 0.0, f1)
        iz = jnp.clip(jnp.floor(f0).astype(jnp.int32), 0, nz - 2)
        ix = jnp.clip(jnp.floor(f1).astype(jnp.int32), 0, nx - 2)
        tz = (f0 - iz.astype(dtype))
        tx = (f1 - ix.astype(dtype))
        c0 = _gather_zcols(tab_ref, iz, 3 * nxp, n_blk, dtype)
        c1 = _gather_zcols(tab_ref, iz + 1, 3 * nxp, n_blk, dtype)
        col = c0 + tz * (c1 - c0)                       # [3·nxp, 128]
        # x-stage: two-row weight mask, reduced over the sublane axis.
        # Rows outside {ix, ix+1} are hard-masked (not just weight 0) so
        # their NaNs cannot leak; the two selected rows keep the XLA
        # 0·NaN corner semantics.
        sel0 = sub == ix
        sel1 = sub == (ix + 1)
        w = (jnp.where(sel0, 1.0 - tx, 0.0)
             + jnp.where(sel1, tx, 0.0)).astype(dtype)
        sel = sel0 | sel1
        def red(lo_row):
            contrib = jnp.where(sel, w * col[lo_row:lo_row + nxp], 0.0)
            return jnp.sum(contrib, axis=0, keepdims=True)
        return red(0), red(nxp), red(2 * nxp), inb

    return bilin3


def _fan_kernel(scal_ref, elev_ref, ta_ref, tm_ref, out_ref, *,
                geometry, n_steps, max_bounces, nxp, nz, nx, n_blk,
                o0, inv_d0, o1, inv_d1, c0_lo, c0_hi, c1_lo, c1_hi,
                z_ground, z_max, x_min, x_max, re, dtype):
    """One (frequency, elevation-block) program: integrate 128 rays.

    ``ta_ref``: [1, 3·nxp, NZP] RHS channels (μ, ∂μ/∂c0, ∂μ/∂c1);
    ``tm_ref``: [1, 3·nxp, NZP] metric channels (μ, μ', κ);
    ``scal_ref`` (SMEM): [ds, x0, z0, pad]; ``elev_ref``: [1, 128] deg.
    ``out_ref``: [1, 1, 8, 128] → rows (ground_range, group_delay,
    absorption_db, group_path, phase_path, status, x_final, z_final).
    """
    bil_a = _make_bilin3(ta_ref, nxp=nxp, nz=nz, nx=nx, n_blk=n_blk,
                         o0=o0, inv_d0=inv_d0, o1=o1, inv_d1=inv_d1,
                         c0_lo=c0_lo, c0_hi=c0_hi, c1_lo=c1_lo,
                         c1_hi=c1_hi, dtype=dtype)
    bil_m = _make_bilin3(tm_ref, nxp=nxp, nz=nz, nx=nx, n_blk=n_blk,
                         o0=o0, inv_d0=inv_d0, o1=o1, inv_d1=inv_d1,
                         c0_lo=c0_lo, c0_hi=c0_hi, c1_lo=c1_lo,
                         c1_hi=c1_hi, dtype=dtype)
    ds = scal_ref[0, 0]
    x0 = scal_ref[0, 1]
    z0 = scal_ref[0, 2]
    elev = elev_ref[0, :][None, :].astype(dtype)        # [1, 128]
    th = elev * jnp.asarray(np.pi / 180.0, dtype)

    cart = geometry == "cartesian"
    if cart:
        # state rows: a = x, b = z, va = vx, vb = vz
        a = jnp.zeros((1, _LANES), dtype) + x0
        b = jnp.zeros((1, _LANES), dtype) + z0
        va = jnp.cos(th)
        vb = jnp.sin(th)
    else:
        # state rows: a = r, b = phi, va = v_r, vb = v_phi
        a = jnp.zeros((1, _LANES), dtype) + (re + z0)
        b = jnp.zeros((1, _LANES), dtype) + x0 / re
        va = jnp.sin(th)
        vb = jnp.cos(th)

    def rhs(ai, bi, vai, vbi):
        if cart:
            # field coords: c0 = z (= bi), c1 = x (= ai)
            mu, g0, g1, inb = bil_a(bi, ai)
        else:
            # field coords: c0 = r (= ai), c1 = phi (= bi)
            mu, g0, g1, inb = bil_a(ai, bi)
        ok = inb & jnp.isfinite(mu) & (mu > 0.0)
        mu_s = jnp.where(ok, mu, 1.0)
        # out-of-domain grads are fill-0 in the XLA engine; in-domain NaN
        # grads (evanescent-boundary stencils) must PROPAGATE so the ray
        # freezes via the bad-state check, exactly like the XLA path
        d0 = jnp.where(inb, g0, 0.0)                     # ∂μ/∂c0
        d1 = jnp.where(inb, g1, 0.0)                     # ∂μ/∂c1
        if cart:
            dndx, dndz = d1, d0
            gdv = dndx * vai + dndz * vbi
            da = vai
            db = vbi
            dva = (dndx - gdv * vai) / mu_s
            dvb = (dndz - gdv * vbi) / mu_s
        else:
            mu_r, mu_p = d0, d1
            inv_ai = 1.0 / ai
            inv_mu = 1.0 / mu_s
            mup_r = mu_p * inv_ai
            gdv = mu_r * vai + mup_r * vbi
            da = vai
            db = vbi * inv_ai
            dva = (mu_r - gdv * vai) * inv_mu + vbi * vbi * inv_ai
            dvb = (mup_r - gdv * vbi) * inv_mu - vai * vbi * inv_ai
        zero = jnp.zeros((1, _LANES), dtype)
        return (jnp.where(ok, da, zero), jnp.where(ok, db, zero),
                jnp.where(ok, dva, zero), jnp.where(ok, dvb, zero))

    def events(ai, bi):
        # (ground, top, lo, hi); positive == inside — ref :1370-1373
        if cart:
            return (bi - z_ground - 1e-3, z_max - bi,
                    ai - x_min, x_max - ai)
        return (ai - (re + z_ground) - 1e-3, (re + z_max) - ai,
                bi - x_min, x_max - bi)

    inv6 = jnp.asarray(1.0 / 6.0, dtype)
    inv_c = jnp.asarray(1.0 / C_KM_S, dtype)

    def step(_, carry):
        (a, b, va, vb, alive_f, status, bounces,
         acc_delay, acc_absorb, acc_path, acc_phase) = carry
        # the alive mask is carried as f32 (Mosaic cannot legalize an
        # i1-vector loop carry in scf.for) and re-derived as bool here
        alive = alive_f > 0.5

        k1 = rhs(a, b, va, vb)
        h2 = 0.5 * ds
        k2 = rhs(a + h2 * k1[0], b + h2 * k1[1],
                 va + h2 * k1[2], vb + h2 * k1[3])
        k3 = rhs(a + h2 * k2[0], b + h2 * k2[1],
                 va + h2 * k2[2], vb + h2 * k2[3])
        k4 = rhs(a + ds * k3[0], b + ds * k3[1],
                 va + ds * k3[2], vb + ds * k3[3])
        an = a + ds * inv6 * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
        bn = b + ds * inv6 * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
        van = va + ds * inv6 * (k1[2] + 2 * k2[2] + 2 * k3[2] + k4[2])
        vbn = vb + ds * inv6 * (k1[3] + 2 * k2[3] + 2 * k3[3] + k4[3])
        vmag = jnp.sqrt(van * van + vbn * vbn)
        pos = vmag > 0.0
        van = jnp.where(pos, van / jnp.where(pos, vmag, 1.0), van)
        vbn = jnp.where(pos, vbn / jnp.where(pos, vmag, 1.0), vbn)

        evo = events(a, b)
        evn = events(an, bn)
        crossed = tuple((n <= 0.0) & (o > 0.0) for o, n in zip(evo, evn))
        any_cross = (crossed[0] | crossed[1] | crossed[2]
                     | crossed[3]) & alive

        def t_of(o, n):
            den = o - n
            t = jnp.where(den != 0.0, o / jnp.where(den != 0.0, den, 1.0),
                          1.0)
            return jnp.clip(t, 0.0, 1.0)

        # first crossed event wins (matches argmax over the event vector)
        t = t_of(evo[3], evn[3])
        t = jnp.where(crossed[2], t_of(evo[2], evn[2]), t)
        t = jnp.where(crossed[1], t_of(evo[1], evn[1]), t)
        t = jnp.where(crossed[0], t_of(evo[0], evn[0]), t)
        a_c = a + t * (an - a)
        b_c = b + t * (bn - b)
        va_c = va + t * (van - va)
        vb_c = vb + t * (vbn - vb)
        ground_hit = any_cross & crossed[0]
        take_cross = any_cross
        if max_bounces > 0:
            bounce = ground_hit & (bounces < max_bounces)
            if cart:
                vb_c = jnp.where(bounce, jnp.abs(vb_c), vb_c)
            else:
                va_c = jnp.where(bounce, jnp.abs(va_c), va_c)
            bounces = bounces + jnp.where(bounce, 1, 0)
            any_cross = any_cross & ~bounce
            ground_hit = ground_hit & ~bounce

        def pick(cr, full, prev):
            nxt = jnp.where(take_cross, cr, full)
            return jnp.where(alive, nxt, prev)

        a2 = pick(a_c, an, a)
        b2 = pick(b_c, bn, b)
        va2 = pick(va_c, van, va)
        vb2 = pick(vb_c, vbn, vb)
        status = jnp.where(any_cross,
                           jnp.where(ground_hit, _GROUND, _DOMAIN), status)
        alive2 = alive & ~any_cross
        bad = ~(jnp.isfinite(a2) & jnp.isfinite(b2)
                & jnp.isfinite(va2) & jnp.isfinite(vb2))
        a2 = jnp.where(bad, a, a2)
        b2 = jnp.where(bad, b, b2)
        va2 = jnp.where(bad, va, va2)
        vb2 = jnp.where(bad, vb, vb2)
        alive2 = alive2 & ~bad
        alive2_f = jnp.where(alive2, jnp.asarray(1.0, dtype),
                             jnp.asarray(0.0, dtype))

        # per-segment midpoint quadrature (gradient._path_metrics)
        da_s = a2 - a
        db_s = b2 - b
        am = 0.5 * (a + a2)
        bm = 0.5 * (b + b2)
        if cart:
            dseg = jnp.sqrt(da_s * da_s + db_s * db_s)
            mu_m, mup_m, kap_m, inb_m = bil_m(bm, am)
        else:
            dseg = jnp.sqrt(da_s * da_s + (am * db_s) * (am * db_s))
            mu_m, mup_m, kap_m, inb_m = bil_m(am, bm)
        mu_m = jnp.where(inb_m, mu_m, jnp.nan)
        mup_m = jnp.where(inb_m, mup_m, jnp.nan)
        kap_m = jnp.where(inb_m, kap_m, jnp.nan)
        acc_path = acc_path + dseg
        acc_delay = acc_delay + jnp.where(
            jnp.isfinite(mup_m), mup_m * inv_c * dseg, 0.0)
        acc_phase = acc_phase + jnp.where(
            jnp.isfinite(mu_m), mu_m * dseg, 0.0)
        acc_absorb = acc_absorb + jnp.where(
            jnp.isfinite(kap_m), kap_m * dseg, 0.0)
        return (a2, b2, va2, vb2, alive2_f, status, bounces,
                acc_delay, acc_absorb, acc_path, acc_phase)

    zero = jnp.zeros((1, _LANES), dtype)
    init = (a, b, va, vb,
            jnp.ones((1, _LANES), dtype),      # alive mask, f32 carry
            zero,                              # status (float codes)
            jnp.zeros((1, _LANES), jnp.int32),
            zero, zero, zero, zero)
    (a, b, va, vb, alive_f, status, bounces,
     acc_delay, acc_absorb, acc_path, acc_phase) = jax.lax.fori_loop(
        0, n_steps, step, init)

    landed = status == _GROUND
    if cart:
        x_fin = a
        z_fin = b
    else:
        x_fin = re * b
        z_fin = a - re
    nan = jnp.asarray(jnp.nan, dtype)
    out_ref[0, 0, 0, :] = jnp.where(landed, x_fin, nan)[0, :]
    out_ref[0, 0, 1, :] = acc_delay[0, :]
    out_ref[0, 0, 2, :] = acc_absorb[0, :]
    out_ref[0, 0, 3, :] = acc_path[0, :]
    out_ref[0, 0, 4, :] = acc_phase[0, :]
    out_ref[0, 0, 5, :] = status[0, :]
    out_ref[0, 0, 6, :] = x_fin[0, :]
    out_ref[0, 0, 7, :] = z_fin[0, :]


def fan_2d_pallas_available(z_np, x_np, n_elev):
    """True when the Pallas fan engine can run this geometry.

    Requires uniform grids (the direct locate is index arithmetic) and a
    VMEM budget: two 3-channel tables (+ double buffering) must fit well
    under the ~16 MB v5e VMEM.
    """
    from .fields import uniform_axis
    if not (uniform_axis(np.asarray(z_np)) and uniform_axis(np.asarray(x_np))):
        return False
    nz, nx = len(z_np), len(x_np)
    nxp = _round_up(nx, 8)
    nzp = _round_up(nz, _LANES)
    vmem = 2 * 3 * nxp * nzp * 4 * 2        # two tables, double-buffered
    return vmem < 10 * 1024 * 1024


@partial(jax.jit, static_argnames=("geometry", "n_steps", "n_hops",
                                   "statics", "interpret"))
def _fan_2d_pallas_core(mu_f, mup_f, kappa_f, elevs, ds, x0, z0, *,
                        geometry, n_steps, n_hops, statics,
                        interpret=False):
    """statics: (nz, nx, o0, inv_d0, o1, inv_d1, c0_lo, c0_hi, c1_lo,
    c1_hi, z_ground, z_max, x_min, x_max, re) — all Python floats/ints
    derived from the CONCRETE grids by :func:`fan_2d_pallas`."""
    (nz, nx, o0, inv_d0, o1, inv_d1, c0_lo, c0_hi, c1_lo, c1_hi,
     z_ground, z_max, x_min, x_max, re) = statics
    from .fields import gradient_ord2

    dtype = mu_f.dtype
    F = mu_f.shape[0]
    E = elevs.shape[0]
    nxp = _round_up(nx, 8)
    nzp = _round_up(nz, _LANES)
    n_blk = nzp // _LANES
    eb = _round_up(E, _LANES) // _LANES

    # native-coordinate axes for the gradient fields
    c0_ax = jnp.asarray(o0, dtype) + jnp.arange(nz, dtype=dtype) / jnp.asarray(
        inv_d0, dtype)
    c1_ax = jnp.asarray(o1, dtype) + jnp.arange(nx, dtype=dtype) / jnp.asarray(
        inv_d1, dtype)
    g0_f, g1_f = jax.vmap(lambda m: gradient_ord2(m, c0_ax, c1_ax))(mu_f)

    def pack(ch):                      # [F, nz, nx] → [F, nxp, nzp]
        cht = jnp.transpose(ch, (0, 2, 1))
        return jnp.pad(cht, ((0, 0), (0, nxp - nx), (0, nzp - nz)))

    ta = jnp.concatenate([pack(mu_f), pack(g0_f), pack(g1_f)], axis=1)
    tm = jnp.concatenate([pack(mu_f), pack(mup_f), pack(kappa_f)], axis=1)

    elev_p = jnp.full((eb * _LANES,), elevs[-1], dtype)
    elev_p = elev_p.at[:E].set(elevs.astype(dtype))
    elev_p = elev_p.reshape(eb, _LANES)
    scal = jnp.stack([jnp.asarray(ds, dtype), jnp.asarray(x0, dtype),
                      jnp.asarray(z0, dtype),
                      jnp.zeros((), dtype)]).reshape(1, 4)

    kern = partial(
        _fan_kernel, geometry=geometry, n_steps=n_steps,
        max_bounces=n_hops - 1, nxp=nxp, nz=nz, nx=nx, n_blk=n_blk,
        o0=o0, inv_d0=inv_d0, o1=o1, inv_d1=inv_d1,
        c0_lo=c0_lo, c0_hi=c0_hi, c1_lo=c1_lo, c1_hi=c1_hi,
        z_ground=z_ground, z_max=z_max, x_min=x_min, x_max=x_max,
        re=re, dtype=dtype)
    out = pl.pallas_call(
        kern,
        grid=(F, eb),
        in_specs=[
            pl.BlockSpec((1, 4), lambda f, e: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _LANES), lambda f, e: (e, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * nxp, nzp), lambda f, e: (f, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * nxp, nzp), lambda f, e: (f, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, _LANES),
                               lambda f, e: (f, e, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, eb, 8, _LANES), dtype),
        interpret=interpret,
    )(scal, elev_p, ta, tm)
    out = out.transpose(0, 2, 1, 3).reshape(F, 8, eb * _LANES)[:, :, :E]
    return {"ground_range_km": out[:, 0], "group_delay_sec": out[:, 1],
            "absorption_db": out[:, 2], "group_path_km": out[:, 3],
            "phase_path_km": out[:, 4], "status_code": out[:, 5],
            "x_final_km": out[:, 6], "z_final_km": out[:, 7]}


def fan_2d_pallas(z_np, x_np, mu_f, mup_f, kappa_f, elevs, ds, *,
                  geometry="cartesian", n_steps, n_hops=1, x0=0.0,
                  z0=None, interpret=False):
    """Trace an [F, E] gradient-ODE ray fan with the VMEM kernel.

    ``z_np``/``x_np``: CONCRETE uniform grids (km); ``mu_f``/``mup_f``/
    ``kappa_f``: [F, nz, nx] per-frequency fields (may be traced);
    ``elevs``: [E] launch elevations (deg); ``ds``: step (km, may be
    traced). Returns a dict of [F, E] arrays matching the XLA fan's
    per-ray metrics (see ``_fan_kernel``). Domain bounds follow the
    2-D oblique fan's convention: ground at ``z_np[0]``, top at
    ``z_np[-1]``, lateral bounds at ``x_np[0]``/``x_np[-1]``.
    """
    z64 = np.asarray(z_np, dtype=np.float64)
    x64 = np.asarray(x_np, dtype=np.float64)
    nz, nx = len(z64), len(x64)
    if z0 is None:
        z0 = float(z64[0])
    re = float(R_E)
    if geometry == "cartesian":
        c0 = z64
        c1 = x64
        bounds = (float(z64[0]), float(z64[-1]),
                  float(x64[0]), float(x64[-1]))
    else:
        c0 = re + z64
        c1 = x64 / re
        bounds = (float(z64[0]), float(z64[-1]),
                  float(x64[0]) / re, float(x64[-1]) / re)
    statics = (nz, nx,
               float(c0[0]), float((nz - 1) / (c0[-1] - c0[0])),
               float(c1[0]), float((nx - 1) / (c1[-1] - c1[0])),
               float(c0[0]), float(c0[-1]), float(c1[0]), float(c1[-1]),
               *bounds, re)
    return _fan_2d_pallas_core(
        mu_f, mup_f, kappa_f, jnp.asarray(elevs), jnp.asarray(ds),
        jnp.asarray(x0), jnp.asarray(z0), geometry=geometry,
        n_steps=int(n_steps), n_hops=int(n_hops), statics=statics,
        interpret=bool(interpret))
