"""Fused Pallas TPU kernel for ionogram synthesis (the north-star op).

The parity operator (``forward.py``) resamples the profile onto per-frequency
stretched grids with searchsorted+gather — correct, but TPU gathers are slow
(~100 M/s) and the XLA fallback segment-sweep is HBM-bound (the [B, F, P]
accumulators stream to HBM on every of the ~620 sweep steps).

This kernel keeps the whole (frequency-tile × n_points) workspace in VMEM and
fuses, per profile:

    stretched-grid generation → gather-free piecewise-linear resample
    (segment sweep over the 620 profile nodes) → Appleton–Hartree μ' →
    Σ μ'·dh quadrature

so HBM traffic collapses to the packed profile table (620×8 per profile) and
the [B, F] output. The reflection-height solve (cummax + crossing count)
stays in XLA — it is O(B·F·N) elementwise and already fast.

Numerically the fast path evaluates the *same* discretisation as the
reference/parity operator (same stretched grid, same clamped-linear
resample, same AH formulas). The singular μ' tail near the reflection
point — where the interpolated 1−X falls below f32 eps and the naive
evaluation loses all significance — is handled by the *analytic margin*
path: on the reflection-crossing segment the cutoff margin (1−X, resp.
1−X−Y) is linear in altitude with a slope known exactly from the
profile table, so the tail is evaluated from cancellation-free
factorisations of the Appleton–Hartree quotient with that margin
substituted (see ``_mu_mup_stable_tile``). Measured f32 accuracy vs the
f64 oracle: ≤ 0.02 km on the Day/Night reference ionograms (well inside
the 0.1 km budget; f64 remains exact to ~1e-9).

Layout: grid = (B, P-chunks); per cell the [F_pad, P_chunk] workspace lives
in VMEM; P-chunks accumulate into the output block (revisited across the
inner grid dimension).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .constants import CP, G_P
from .magnetoionic import _magnetized_mu_mup

__all__ = ["ionogram_pallas", "ionogram_pallas_mxu",
           "ionogram_pallas_gather", "ionogram_fast_xla",
           "prepare_profile_tables"]

_DH_BACKOFF = 1e-6


def _round_up(x, m):
    return (x + m - 1) // m * m


def uniform_inv_dalt(alt):
    """1/Δalt for a concrete uniformly spaced grid, else None."""
    if isinstance(alt, jax.core.Tracer):
        return None
    a = np.asarray(alt, dtype=np.float64)
    d = np.diff(a)
    if d.size and np.allclose(d, d[0], rtol=1e-9, atol=1e-9):
        return float(1.0 / d[0])
    return None


def _flat_extend(den, bmag, bpsi, alt):
    """Flat-extend each profile at its density peak (ref truncation)."""
    B, N = den.shape
    ind_max = jnp.argmax(den, axis=1)
    idx = jnp.arange(N)
    keep = idx[None, :] < ind_max[:, None]
    last = jnp.maximum(ind_max - 1, 0)[:, None]

    def ext(a):
        return jnp.where(keep, a, jnp.take_along_axis(a, last, axis=1))

    alt_b = jnp.broadcast_to(alt, (B, N))
    return ext(den), ext(bmag), ext(bpsi), ext(alt_b)


def _pack_segment_table(den_t, bmag_t, bpsi_t, alt_t):
    """Pack the per-segment piecewise-linear table [B, N, 8].

    Segment row j: [alt_j, 1/Δalt_j, den_j, Δden_j, bmag_j, Δbmag_j,
    bpsi_j, Δbpsi_j]; altitudes stored relative to alt[0].
    """
    dalt = jnp.diff(alt_t, axis=1)
    inv_dalt = jnp.where(dalt > 0, 1.0 / jnp.where(dalt > 0, dalt, 1.0),
                         0.0)
    pad = lambda a: jnp.concatenate([a, a[:, -1:]], axis=1)
    return jnp.stack([
        alt_t - alt_t[:, 0][:, None],
        pad(inv_dalt),
        den_t, pad(jnp.diff(den_t, axis=1)),
        bmag_t, pad(jnp.diff(bmag_t, axis=1)),
        bpsi_t, pad(jnp.diff(bpsi_t, axis=1)),
    ], axis=2)


def prepare_profile_tables(freq_hz, den, bmag, bpsi, alt, mode_mult):
    """XLA-side preprocessing shared by the fast paths.

    Flat-extends each profile at its density peak (== the reference's
    truncation, grid.py), runs the monotone cutoff (cummax) and the
    crossing-count reflection-height solve, and packs the per-segment
    piecewise-linear table.

    Returns (seg [B, N, 8], crit [B, F] finite, valid [B, F] bool,
    slope [B, F]): ``slope`` is d(fcrit)/dh on the crossing segment — the
    analytic rate at which the cutoff function approaches 1, used by the
    stable near-reflection evaluation (the "analytic Xm1" path).
    Segment row j: [alt_j, 1/Δalt_j, den_j, Δden_j, bmag_j, Δbmag_j,
    bpsi_j, Δbpsi_j].
    """
    B, N = den.shape
    dtype = den.dtype
    cp2 = jnp.asarray(CP * CP, dtype)
    gp = jnp.asarray(G_P, dtype)

    den_t, bmag_t, bpsi_t, alt_t = _flat_extend(den, bmag, bpsi, alt)

    inv_f2 = (1.0 / (freq_hz * freq_hz)).astype(dtype)
    take2 = lambda a, kk: jnp.take_along_axis(a, kk, axis=1)
    if mode_mult > 0:
        # O-mode: the cutoff function is X = (den·cp²)·(1/f²) with a
        # positive f-independent scale, and float multiplication by a
        # positive constant is monotone — so cummax over altitude commutes
        # with the frequency scaling EXACTLY:
        #     cummax_j X[b,f,j] == cummax_j(den)[b,j] · cp² · inv_f2[f]
        # (each cummax entry IS some den[j'] bit-for-bit). This collapses
        # the reflection-height solve from O(B·F·N) HBM-bound tensors to
        # one [B, N] cummax + per-frequency O(1) lookups: the crossing
        # index comes from a density-space count, then a ±1 correction
        # evaluated in X-space (same op order as the dense path) restores
        # bit-exact agreement at rounding-razor samples.
        dmax = jax.lax.cummax(den_t, axis=1)                  # [B, N]
        Xval = lambda kk: take2(dmax, kk) * cp2 * inv_f2[None, :]
        thr = (freq_hz * freq_hz) / cp2                       # den units
        # vectorized binary search: lo converges to #{j: dmax[j] < thr}
        B_, F_ = den_t.shape[0], freq_hz.shape[0]
        lo = jnp.zeros((B_, F_), jnp.int32)
        hi = jnp.full((B_, F_), N, jnp.int32)
        for _ in range(max(1, int(np.ceil(np.log2(N + 1))))):
            mid = (lo + hi) // 2
            right = take2(dmax, jnp.clip(mid, 0, N - 1)) < thr[None, :]
            active = lo < hi
            lo = jnp.where(active & right, mid + 1, lo)
            hi = jnp.where(active & ~right, mid, hi)
        k = jnp.clip(lo, 1, N - 1)                            # [B, F]
        # X-space ±1 correction (2 steps each way cover razor plateaus)
        for _ in range(2):
            k = jnp.where((Xval(k - 1) >= 1.0) & (k > 1), k - 1, k)
        for _ in range(2):
            k = jnp.where((Xval(k) < 1.0) & (k < N - 1), k + 1, k)
        valid = Xval(jnp.full_like(k, N - 1)) >= 1.0
        f0 = Xval(k - 1)
        f1 = Xval(k)
        alt_b2 = alt_t
        a0 = take2(alt_b2, k - 1)
        a1 = take2(alt_b2, k)
        r0 = take2(den_t, k - 1) * cp2 * inv_f2[None, :]
        first_exceeds = (den_t[:, 0:1] * cp2) * inv_f2[None, :] >= 1.0
    else:
        X = den_t[:, None, :] * cp2 * inv_f2[None, :, None]
        Y = bmag_t[:, None, :] * gp / freq_hz[None, :, None]
        fcrit = jax.lax.cummax(X + Y, axis=2)
        valid = fcrit[:, :, -1] >= 1.0
        # crossing index by counting nodes below the cutoff (monotone rows)
        k = jnp.clip(jnp.sum(fcrit < 1.0, axis=2), 1, N - 1)
        take = lambda a, kk: jnp.take_along_axis(
            a, kk[:, :, None], axis=2)[..., 0]
        f0 = take(fcrit, k - 1)
        f1 = take(fcrit, k)
        alt_bf = jnp.broadcast_to(alt_t[:, None, :], fcrit.shape)
        a0 = take(alt_bf, k - 1)
        a1 = take(alt_bf, k)
        r0 = take(X + Y, k - 1)
        first_exceeds = 1.0 <= fcrit[:, :, 0]
    t = jnp.where(f1 != f0, (1.0 - f0) / jnp.where(f1 != f0, f1 - f0, 1.0),
                  0.0)
    crit = a0 + jnp.clip(t, 0.0, 1.0) * (a1 - a0)
    da = a1 - a0
    slope = jnp.where((da > 0) & (f1 > f0),
                      (f1 - f0) / jnp.where(da > 0, da, 1.0), 0.0)
    # The analytic near-reflection margin is exact linear-interpolation
    # algebra ONLY on the crossing segment itself, and only when the cutoff
    # function equals the local (non-cummax) value there — i.e. X(crit)==1.
    # When the lower crossing node is cummax-shadowed (an E-peak above a
    # valley) the interpolated X at ``crit`` never reaches 1 and the
    # computed 1-X (which is then comfortably far from cancellation) must
    # be used. ``emax`` = cutoff margin at the segment's lower node bounds
    # where the analytic form may be substituted.
    genuine = r0 == f0
    emax = jnp.where(genuine, jnp.maximum(slope * (crit - a0), 0.0), 0.0)
    # np.interp edge semantics: cutoff already exceeded at the first node
    crit = jnp.where(first_exceeds, alt_t[:, 0][:, None], crit)
    # masked-finite: escaped rows collapse to a zero-span grid (zero dh ⇒
    # zero contribution, and they never inflate the sweep bounds)
    crit = jnp.where(valid, crit, alt_t[:, 0][:, None]) - _DH_BACKOFF
    slope = jnp.where(valid, slope, 0.0)
    emax = jnp.where(valid, emax, 0.0)

    # altitudes are stored relative to alt[0] so the kernel needs no scalar
    # offset input (the stretched grid is generated in the same frame)
    seg = _pack_segment_table(den_t, bmag_t, bpsi_t, alt_t)
    return seg, crit, valid, slope, emax


def _mu_mup_masked_tile(X, Y, psi, mode_mult):
    """Per-element μ' with validity mask (iso fallback for Y≈0)."""
    mu, mup, ok = _magnetized_mu_mup(X, Y, psi, mode_mult, sanitize=True)
    iso_ok = (1.0 - X) > 0.0
    iso_mup = jax.lax.rsqrt(jnp.where(iso_ok, 1.0 - X, 1.0))
    unmag = jnp.abs(Y) < 1e-12
    mup = jnp.where(unmag, jnp.where(iso_ok, iso_mup, 0.0),
                    jnp.where(ok, mup, 0.0))
    # boolean select via logic ops (Mosaic lacks i1 truncation for where)
    ok = (unmag & iso_ok) | (~unmag & ok)
    # μ' ceiling: f32 denormal 1-X at the backed-off sample would otherwise
    # contribute 2^31-scale garbage (see forward.find_vh)
    ok = ok & (mup > 0.0) & (mup <= 1e7)
    return mup, ok


def _mu_mup_stable_tile(X, Y, psi_deg, mode_mult, eps_crit, eps_max):
    """μ' with the near-reflection small quantity supplied analytically.

    ``eps_crit`` is the cutoff margin from the crossing-segment geometry:
    1−X for O-mode, 1−X−Y for X-mode — computed as slope·(distance below the
    reflection height), which is exact linear-interpolation algebra with no
    catastrophic cancellation, so the singular μ' tail is accurate even in
    f32 (where the interpolated X rounds to 1 at the last samples). It is
    substituted only where the sample lies on the crossing segment itself
    (``eps_crit ≤ eps_max``, the margin at the segment's lower node) —
    beyond that node the linear model has the wrong slope. Elsewhere the
    committed-parity computed forms are used unchanged.

    Analytic-path factorisations (cancellation-free):
      O:  under = (Xm1² + s)/(Xm1 + s),            s = YL²Xm1²/(β + ½YT²)
      X:  under = Xm1²·ε·(Xm1+Y) / ((Xm1² + s)·D), D = Xm1 − ½YT² − β
    (the X-mode numerator N = D − X·Xm1 = Xm1² − ½YT² − β factors exactly
    as N·(Xm1² − ½YT² + β) = Xm1²(Xm1−Y)(Xm1+Y) with ε = Xm1 − Y).
    """
    TH = 1e-3
    use_an = (eps_crit < TH) & (eps_crit <= eps_max)
    psi = jnp.deg2rad(psi_deg)
    sinp = jnp.sin(psi)
    cosp = jnp.cos(psi)
    YT = Y * sinp
    YL = Y * cosp

    if mode_mult > 0:
        Xm1 = jnp.where(use_an, eps_crit, 1.0 - X)
    else:
        eps_u = jnp.where(use_an, eps_crit, 1.0 - X - Y)
        Xm1 = jnp.where(use_an, Y + eps_u, 1.0 - X)

    beta = jnp.sqrt(0.25 * YT ** 4 + YL ** 2 * Xm1 ** 2)
    bsum = beta + 0.5 * YT ** 2
    b_ok = bsum > 0.0
    bsum_safe = jnp.where(b_ok, bsum, 1.0)
    s_term = jnp.where(b_ok, YL ** 2 * Xm1 ** 2 / bsum_safe, 0.0)
    conj = Xm1 ** 2 + s_term                     # = Xm1² − ½YT² + β exactly

    if mode_mult > 0:
        D = Xm1 + s_term
        d_ok = D != 0.0
        D_safe = jnp.where(d_ok, D, 1.0)
        under = conj / D_safe
    else:
        D = Xm1 - 0.5 * YT ** 2 - beta
        d_ok = D != 0.0
        D_safe = jnp.where(d_ok, D, 1.0)
        conj_safe = jnp.where(conj > 0.0, conj, 1.0)
        under_an = Xm1 ** 2 * eps_u * (Xm1 + Y) / (conj_safe * D_safe)
        under = jnp.where(use_an, under_an, 1.0 - X * Xm1 / D_safe)
        d_ok = d_ok & (~use_an | (conj > 0.0))

    u_ok = (under >= 0.0) & d_ok
    mu = jnp.where(u_ok, jnp.sqrt(jnp.where(u_ok, under, 1.0)), 1.0)
    mu_le1 = mu <= 1.0

    bb_ok = beta > 0.0
    beta_safe = jnp.where(bb_ok, beta, 1.0)

    m_ok = u_ok & bb_ok & (mu > 0.0) & mu_le1
    mu_safe = jnp.where(m_ok, mu, 1.0)
    if mode_mult > 0:
        # On O-mode analytic lanes the naive derivative forms below are
        # REPLACED by the cancellation-free expansions — but reverse-mode
        # AD still backpropagates through the non-selected branch, whose
        # cotangents carry 1/D⁴-scale factors (D ≈ Xm1 ~ 1e-10 near the
        # backed-off sample) that overflow f32 into inf·0 = NaN. Feed the
        # naive branch harmless inputs on those lanes (double-where on
        # inputs, the standard 0·NaN-cotangent guard).
        Xm1_nv = jnp.where(use_an, 1.0, Xm1)
        D_nv = jnp.where(use_an, 1.0, D_safe)
        mu_nv = jnp.where(use_an, 1.0, mu_safe)
    else:
        Xm1_nv, D_nv, mu_nv = Xm1, D_safe, mu_safe
    dbetadX = -YL ** 2 * Xm1_nv / beta_safe
    dDdX = -1.0 + mode_mult * dbetadX
    dalphadY = YT ** 3 * sinp + 2.0 * YL * Xm1_nv ** 2 * cosp
    dbetadY = 0.5 * dalphadY / beta_safe
    dDdY = -YT * sinp + mode_mult * dbetadY
    dmudY = (X * Xm1_nv * dDdY) / (2.0 * mu_nv * D_nv ** 2)
    dmudX = (1.0 / (2.0 * mu_nv * D_nv)) * (
        2.0 * X - 1.0 + X * Xm1_nv / D_nv * dDdX)
    if mode_mult > 0:
        # On the analytic path the naive derivative terms are inconsistent
        # with the substituted Xm1 (the computed 2X−1 carries the *rounded*
        # distance from 1, e.g. −1.2e-7 where eps = 3e-9, which dominates μ'
        # through 1/(2μD)). Use the exact cancellation-free expansions with
        # X ≡ 1 − Xm1:
        #   2X−1 + X·(Xm1/D)·dDdX
        #     = Xm1·(−1 + c(1−2Xm1) − (YL²/β)(1−Xm1)) / (1+cXm1),
        #       c = YL²/(β+½YT²)  (so s = c·Xm1², D = Xm1(1+cXm1))
        #   dDdY = (YL·Xm1²·(cosψ − YT·sinψ·YL/(β+½YT²))) / β
        # (derived from β−½YT² = s; both are O(Xm1) resp. O(Xm1²) with no
        # subtraction of near-equal quantities).
        # Every Xm1 power is cancelled analytically (D = Xm1·(1+c·Xm1)
        # exactly), leaving O(μβ)-scale denominators: quotient-rule AD
        # squares the denominator, and (2μD²)² ~ 1e-39 underflows the TPU
        # double-float (f32 exponent) range — finite μ' with NaN tangents,
        # observed as every LM step silently rejected on TPU.
        cfac = jnp.where(b_ok, YL ** 2 / bsum_safe, 0.0)
        onepr = 1.0 + cfac * Xm1
        T_st = (-1.0 + cfac * (1.0 - 2.0 * Xm1)
                - YL ** 2 / beta_safe * (1.0 - Xm1))
        dmudX_st = T_st / (2.0 * mu_safe * onepr ** 2)
        q_st = cosp - YT * sinp * YL / bsum_safe
        dmudY_st = X * YL * Xm1 * q_st / (2.0 * mu_safe * beta_safe
                                          * onepr ** 2)
        dmudX = jnp.where(use_an, dmudX_st, dmudX)
        dmudY = jnp.where(use_an, dmudY_st, dmudY)
    mup = mu - (2.0 * X * dmudX + Y * dmudY)
    ok = m_ok & jnp.isfinite(mup)

    # per-element isotropic fallback for unmagnetised samples
    iso_ok = Xm1 > 0.0
    iso_mup = jax.lax.rsqrt(jnp.where(iso_ok, Xm1, 1.0))
    unmag = jnp.abs(Y) < 1e-12
    mup = jnp.where(unmag, jnp.where(iso_ok, iso_mup, 0.0),
                    jnp.where(ok, mup, 0.0))
    ok = (unmag & iso_ok) | (~unmag & ok)
    ok = ok & (mup > 0.0) & (mup <= 1e7)
    return mup, ok


def _kernel(jlo_ref, jhi_ref, mult_ref, dmult_ref, omm_ref, seg_ref,
            span_ref, slope_ref, emax_ref, freq_ref, out_ref, *, mode_mult,
            n_seg, last_chunk, last_idx, n_ftiles, n_chunks, b_tile,
            inv_dalt=None):
    b = pl.program_id(0)
    ft = pl.program_id(1)
    pc = pl.program_id(2)
    mult = mult_ref[0, :]                       # [P_chunk]
    dmult = dmult_ref[0, :]
    omm = omm_ref[0, :]                         # 1 − mult, formed in f64
    f = freq_ref[0, 0, 0, :][:, None]           # [f_tile, 1]

    # ``b_tile`` profiles share one grid cell: the per-cell fixed cost
    # (grid scheduling, block bookkeeping) is ~half the cell time at the
    # O-200 workload, so amortising it across profiles buys real latency.
    for bi in range(b_tile):
        span = span_ref[bi, 0, 0, :]            # [f_tile], = crit - alt0

        # altitudes relative to alt0 (segment table in the same frame)
        new_alt = span[:, None] * mult[None, :]          # [F_pad, P_chunk]
        dh = span[:, None] * dmult[None, :]
        # trailing backoff cell carries dh = 1e-6 (reference quirk)
        p_ids = jax.lax.broadcasted_iota(jnp.int32, new_alt.shape, 1)
        is_last = (pc == last_chunk) & (p_ids == last_idx)
        dh = jnp.where(is_last, jnp.asarray(_DH_BACKOFF, dh.dtype), dh)

        f_pad = span.shape[0]
        shape = (f_pad, mult.shape[0])
        # Per-(profile, f-tile, point-chunk) sweep bounds. The stretched
        # grid is sorted, so a chunk's points span a narrow altitude band:
        # segments fully below it are saturated (tt == 1) and are folded
        # into the accumulator INIT (the profile value at node j_lo),
        # segments above j_hi contribute nothing. Total sweep work
        # collapses from P_pad × j_hi to ~p_chunk × j_hi across all
        # chunks — the win grows with n_chunks (the X-mode 20k grid has
        # 40 of them).
        cell = ((b * b_tile + bi) * n_ftiles + ft) * n_chunks + pc
        j_lo = jlo_ref[cell]
        j_hi = jnp.minimum(jhi_ref[cell], n_seg - 1)
        d_acc = jnp.full(shape, seg_ref[bi, j_lo, 2], dtype=new_alt.dtype)
        bm_acc = jnp.full(shape, seg_ref[bi, j_lo, 4], dtype=new_alt.dtype)
        bp_acc = jnp.full(shape, seg_ref[bi, j_lo, 6], dtype=new_alt.dtype)

        if inv_dalt is not None:
            # uniform altitude grid: segment edges are j·Δ, so the hat
            # argument is pos − j with pos precomputed once — no
            # per-segment scalar loads for the edge coordinates; 16x
            # unrolled to amortise loop overhead
            pos = new_alt * jnp.asarray(inv_dalt, new_alt.dtype)

            def body(q, carry, j_lo=j_lo, bi=bi, pos=pos):
                d, bm, bp = carry
                j0 = j_lo + q * 16
                for u in range(16):
                    j = j0 + u
                    tt = jnp.clip(pos - j.astype(pos.dtype), 0.0, 1.0)
                    d = d + tt * seg_ref[bi, j, 3]
                    bm = bm + tt * seg_ref[bi, j, 5]
                    bp = bp + tt * seg_ref[bi, j, 7]
                return d, bm, bp

            # padded to a multiple of 16 for the unrolled body; extra
            # segments beyond the table land in the zero padding (seg is
            # padded 16 rows and j_hi <= n_seg-1)
            trips = jnp.maximum(j_hi - j_lo + 15, 0) // 16
            d_acc, bm_acc, bp_acc = jax.lax.fori_loop(
                0, trips, body, (d_acc, bm_acc, bp_acc))
        else:
            def body(q, carry, j_lo=j_lo, bi=bi, new_alt=new_alt):
                d, bm, bp = carry
                j0 = j_lo + q * 4
                for u in range(4):
                    j = j0 + u
                    a_j = seg_ref[bi, j, 0]
                    inv = seg_ref[bi, j, 1]
                    tt = jnp.clip((new_alt - a_j) * inv, 0.0, 1.0)
                    d = d + tt * seg_ref[bi, j, 3]
                    bm = bm + tt * seg_ref[bi, j, 5]
                    bp = bp + tt * seg_ref[bi, j, 7]
                return d, bm, bp

            # 4x unroll; overrun rows land in the zero padding (tt * 0)
            trips = jnp.maximum(j_hi - j_lo + 3, 0) // 4
            d_acc, bm_acc, bp_acc = jax.lax.fori_loop(
                0, trips, body, (d_acc, bm_acc, bp_acc))

        X = d_acc * (CP * CP) / (f * f)
        Y = bm_acc * G_P / f
        # analytic cutoff margin: slope × distance below reflection height
        slope_t = slope_ref[bi, 0, 0, :][:, None]
        emax_t = emax_ref[bi, 0, 0, :][:, None]
        eps = slope_t * (span[:, None] * omm[None, :] + _DH_BACKOFF)
        mup, ok = _mu_mup_stable_tile(X, Y, bp_acc, mode_mult, eps, emax_t)
        partial_ih = jnp.sum(jnp.where(ok, mup * dh, 0.0), axis=1)

        @pl.when(pc == 0)
        def _(bi=bi, partial_ih=partial_ih):
            out_ref[bi, 0, 0, :] = jnp.zeros_like(partial_ih)

        out_ref[bi, 0, 0, :] = out_ref[bi, 0, 0, :] + partial_ih


def _kernel_mxu(mult_ref, dmult_ref, omm_ref, seg_ref, span_ref, slope_ref,
                emax_ref, freq_ref, out_ref, d_scr, bm_scr, bp_scr, *,
                mode_mult, n_seg, last_chunk, last_idx, b_tile, f_tile,
                inv_dalt, K1, K2):
    """MXU-reformulated resample: one-hot gather matmuls replace the sweep.

    For a uniform altitude grid the resample index is arithmetic
    (``i = floor(span·mult/Δalt)``, no search), so the piecewise-linear
    resample is a GATHER of row ``i`` from the [N_seg, 8] segment table —
    and a gather is a one-hot matmul, which the MXU executes exactly (each
    output row sums a single 1·T[j] product; the f32 operand splits into
    bf16 triplets losslessly under ``Precision.HIGHEST``). Factorising
    ``i = a·K2 + b`` splits the [P, N] one-hot into [P, K1]·[K1, K2·8]
    (MXU) followed by a K2-masked combine (VPU) + a [K2·8, 8] fold (MXU):
    VPU work per resampled point drops from O(N_seg) hat-weight FMAs to
    O(K1 + K2·8) ≈ 170 lane-ops — the sweep kernel's dominant cost.

    Numerically this matches the PARITY gather semantics (value + frac·Δ
    on the containing segment, no O(N) summation error); the μ'/quadrature
    tail is byte-identical to :func:`_kernel`.
    """
    pc = pl.program_id(2)
    dtype = span_ref.dtype
    mult = mult_ref[0, :]                       # [P_chunk]
    dmult = dmult_ref[0, :]
    omm = omm_ref[0, :]
    f = freq_ref[0, 0, 0, :][:, None]           # [f_tile, 1]
    P = mult.shape[0]
    mi = mult * jnp.asarray(inv_dalt, dtype)    # resample positions / span

    # Everything in the gather is laid out [·, P] — channels/one-hot rows
    # on sublanes, resample points on lanes — so no lane↔sublane relayout
    # is ever needed (column extraction from a [P, 8] array would be one).
    iotaA = jax.lax.broadcasted_iota(jnp.int32, (K1, P), 0)
    row_b = jax.lax.broadcasted_iota(jnp.int32, (K2 * 8, P), 0) // 8
    # static [8, K2·8] fold matrix: table column q folds to channel q%8
    # (built from iotas — pallas kernels cannot capture array constants)
    fold = (jax.lax.broadcasted_iota(jnp.int32, (8, K2 * 8), 1) % 8
            == jax.lax.broadcasted_iota(jnp.int32, (8, K2 * 8), 0)
            ).astype(dtype)

    for bi in range(b_tile):
        Tt = seg_ref[bi, :, :]                  # [K2·8, K1] (pre-transposed)
        for fi in range(f_tile):
            pos = span_ref[bi, 0, 0, fi] * mi                    # [P]
            i0 = jnp.minimum(jnp.maximum(jnp.floor(pos).astype(jnp.int32),
                                     jnp.int32(0)), jnp.int32(n_seg - 2))
            # saturate like the sweep's clip (np.interp edge values)
            frac = jnp.clip(pos - i0.astype(dtype), 0.0, 1.0)
            a_idx = i0 // K2
            b_idx = i0 - a_idx * K2
            ohA = (iotaA == a_idx[None, :]).astype(dtype)        # [K1, P]
            U = jnp.dot(Tt, ohA, preferred_element_type=dtype,
                        precision=jax.lax.Precision.HIGHEST)     # [K2·8, P]
            w = (row_b == b_idx[None, :]).astype(dtype)
            out8 = jnp.dot(fold, w * U,
                           preferred_element_type=dtype,
                           precision=jax.lax.Precision.HIGHEST)  # [8, P]
            d_scr[fi, :] = out8[2, :] + frac * out8[3, :]
            bm_scr[fi, :] = out8[4, :] + frac * out8[5, :]
            bp_scr[fi, :] = out8[6, :] + frac * out8[7, :]

        # ---- μ' + quadrature tail (identical to _kernel) ----
        span = span_ref[bi, 0, 0, :]            # [f_tile]
        dh = span[:, None] * dmult[None, :]
        p_ids = jax.lax.broadcasted_iota(jnp.int32, dh.shape, 1)
        is_last = (pc == last_chunk) & (p_ids == last_idx)
        dh = jnp.where(is_last, jnp.asarray(_DH_BACKOFF, dh.dtype), dh)

        X = d_scr[:] * (CP * CP) / (f * f)
        Y = bm_scr[:] * G_P / f
        slope_t = slope_ref[bi, 0, 0, :][:, None]
        emax_t = emax_ref[bi, 0, 0, :][:, None]
        eps = slope_t * (span[:, None] * omm[None, :] + _DH_BACKOFF)
        mup, ok = _mu_mup_stable_tile(X, Y, bp_scr[:], mode_mult, eps,
                                      emax_t)
        partial_ih = jnp.sum(jnp.where(ok, mup * dh, 0.0), axis=1)

        @pl.when(pc == 0)
        def _(bi=bi, partial_ih=partial_ih):
            out_ref[bi, 0, 0, :] = jnp.zeros_like(partial_ih)

        out_ref[bi, 0, 0, :] = out_ref[bi, 0, 0, :] + partial_ih


def _block_gather(segt_ref, bi, c, ilo, iblk, n_blk, dtype):
    """Within-vreg block-decomposed gather of channel ``c`` at ``i0``.

    ``ilo``/``iblk`` are i0 & 127 and i0 >> 7 with any same 2-D shape whose
    lane dim is a multiple of 128; returns the gathered values in that
    shape. The hardware per-lane gather (tpu.dynamic_gather) reaches one
    128-lane vreg, so each 128-entry block of the table row is gathered
    separately and combined with a block-index select.
    """
    S, L = ilo.shape
    out_groups = []
    for g in range(L // 128):
        idx_g = ilo[:, g * 128:(g + 1) * 128]
        blk_g = iblk[:, g * 128:(g + 1) * 128]
        acc = jnp.zeros((S, 128), dtype)
        for blk in range(n_blk):
            # slice the block straight off the ref (a load, not a lax
            # gather) and materialise the sublane broadcast with an add —
            # jnp.broadcast_to would be folded INTO take_along_axis,
            # whose operand then becomes 1-D and Mosaic rejects it
            blk_row = segt_ref[bi, c, blk * 128:(blk + 1) * 128]  # [128]
            xb = blk_row[None, :] + jnp.zeros((S, 128), dtype)
            # direct lax.gather in the exact batched-1-element form the
            # Mosaic lowering maps to tpu.dynamic_gather;
            # jnp.take_along_axis would convert the indices to int64
            # under jax_enable_x64 (it feeds the whole shape tuple to
            # int_dtype_for_dim), which Mosaic cannot lower
            got = jax.lax.gather(
                xb, idx_g[..., None],
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(), collapsed_slice_dims=(1,),
                    start_index_map=(1,), operand_batching_dims=(0,),
                    start_indices_batching_dims=(0,)),
                slice_sizes=(1, 1),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            acc = jnp.where(blk_g == blk, got, acc)
        out_groups.append(acc)
    if len(out_groups) == 1:
        return out_groups[0]
    return jnp.concatenate(out_groups, axis=1)


def _kernel_gather(mult_ref, dmult_ref, omm_ref, segt_ref,
                   span_ref, slope_ref, emax_ref, freq_ref, out_ref, *,
                   mode_mult, n_seg, last_chunk, last_idx, b_tile, f_tile,
                   p_chunk, inv_dalt, G):
    """Dynamic-gather resample: ``tpu.dynamic_gather`` replaces the sweep.

    Mosaic lowers a same-shape 2-D ``jnp.take_along_axis(x, idx, axis=1)``
    to the hardware per-lane gather, so on a uniform altitude grid the
    piecewise-linear resample (index = ``floor(span·mult/Δalt)``, no
    search) costs O(1) per point instead of the sweep's O(N_seg) hat
    FMAs or the one-hot matmuls' padded MXU passes. The hardware gather
    reaches only one 128-lane vreg, so the [G]-entry channel tables are
    processed in 128-entry blocks: within-vreg gather on the low 7 index
    bits, then a select on the block index — G/128 gathers+selects per
    128-lane output group instead of O(N_seg) FMAs. Values match the
    parity gather semantics exactly; the μ'/quadrature tail is identical
    to :func:`_kernel`.
    """
    pc = pl.program_id(2)
    dtype = span_ref.dtype
    mult = mult_ref[0, :]                       # [p_chunk]
    dmult = dmult_ref[0, :]
    omm = omm_ref[0, :]
    f = freq_ref[0, 0, 0, :][:, None]           # [f_tile, 1]
    mi = mult * jnp.asarray(inv_dalt, dtype)
    n_blk = G // 128
    n_grp = p_chunk // 128

    for bi in range(b_tile):
        span = span_ref[bi, 0, 0, :]            # [f_tile]
        pos = span[:, None] * mi[None, :]                    # [f_tile, P]
        i0 = jnp.minimum(jnp.maximum(jnp.floor(pos).astype(jnp.int32),
                                     jnp.int32(0)), jnp.int32(n_seg - 2))
        frac = jnp.clip(pos - i0.astype(dtype), 0.0, 1.0)
        ilo = i0 & 127                                       # within-vreg
        iblk = i0 >> 7                                       # table block

        gat = lambda c: _block_gather(segt_ref, bi, c, ilo, iblk, n_blk,
                                      dtype)
        d_acc = gat(2) + frac * gat(3)
        bm_acc = gat(4) + frac * gat(5)
        bp_acc = gat(6) + frac * gat(7)

        # ---- μ' + quadrature tail (identical to _kernel) ----
        dh = span[:, None] * dmult[None, :]
        p_ids = jax.lax.broadcasted_iota(jnp.int32, dh.shape, 1)
        is_last = (pc == last_chunk) & (p_ids == last_idx)
        dh = jnp.where(is_last, jnp.asarray(_DH_BACKOFF, dh.dtype), dh)

        X = d_acc * (CP * CP) / (f * f)
        Y = bm_acc * G_P / f
        slope_t = slope_ref[bi, 0, 0, :][:, None]
        emax_t = emax_ref[bi, 0, 0, :][:, None]
        eps = slope_t * (span[:, None] * omm[None, :] + _DH_BACKOFF)
        mup, ok = _mu_mup_stable_tile(X, Y, bp_acc, mode_mult, eps, emax_t)
        partial_ih = jnp.sum(jnp.where(ok, mup * dh, 0.0), axis=1)

        @pl.when(pc == 0)
        def _(bi=bi, partial_ih=partial_ih):
            out_ref[bi, 0, 0, :] = jnp.zeros_like(partial_ih)

        out_ref[bi, 0, 0, :] = out_ref[bi, 0, 0, :] + partial_ih


def _osolve_tile(segt_ref, bi, thr, cp2, inv_f2, n_seg, f_tile, n_blk,
                 dtype):
    """The O-mode in-kernel reflection solve for one b-row.

    Returns ([f_tile, 1] span, slope, emax) in the relative-altitude
    frame (shared by :func:`_kernel_gather_osolve`'s inline and hoisted
    paths).
    """
    dmax_row = segt_ref[bi, 8, :]               # [G], +inf beyond N-1
    # crossing count: dense VMEM compare, monotone rows
    below = (dmax_row[None, :] < thr).astype(jnp.int32)      # [f_tile, G]
    # dtype pinned: under jax_enable_x64 an int32 sum promotes to
    # int64, which Mosaic cannot lower
    k = jnp.minimum(jnp.maximum(
        jnp.sum(below, axis=1, keepdims=True, dtype=jnp.int32),
        jnp.int32(1)), jnp.int32(n_seg - 1))

    def chan_at(c, kk):
        kk_b = jnp.broadcast_to(kk, (f_tile, 128))
        return _block_gather(segt_ref, bi, c, kk_b & 127, kk_b >> 7,
                             n_blk, dtype)[:, :1]            # [f_tile, 1]

    Xval = lambda kk: chan_at(8, kk) * cp2 * inv_f2
    # X-space ±1 correction at rounding-razor samples (match the
    # dense path's fcrit < 1 comparisons bit-for-bit)
    for _ in range(2):
        k = jnp.where((Xval(k - 1) >= 1.0) & (k > 1), k - 1, k)
    for _ in range(2):
        k = jnp.where((Xval(k) < 1.0) & (k < n_seg - 1), k + 1, k)

    f0 = Xval(k - 1)
    f1 = Xval(k)
    a0 = chan_at(0, k - 1)                      # altitudes relative alt0
    a1 = chan_at(0, k)
    r0 = chan_at(2, k - 1) * cp2 * inv_f2       # un-cummaxed X at k-1
    t = jnp.where(f1 != f0,
                  (1.0 - f0) / jnp.where(f1 != f0, f1 - f0, 1.0), 0.0)
    crit = a0 + jnp.clip(t, 0.0, 1.0) * (a1 - a0)
    da = a1 - a0
    slope = jnp.where((da > 0) & (f1 > f0),
                      (f1 - f0) / jnp.where(da > 0, da, 1.0), 0.0)
    genuine = r0 == f0
    emax = jnp.where(genuine, jnp.maximum(slope * (crit - a0), 0.0), 0.0)
    d0 = segt_ref[bi, 8, 0]                     # first-node cummax == den0
    first_exceeds = (d0 * cp2) * inv_f2 >= 1.0
    crit = jnp.where(first_exceeds, 0.0, crit)
    dN = segt_ref[bi, 8, n_seg - 1]
    valid = dN * cp2 * inv_f2 >= 1.0
    crit = jnp.where(valid, crit, 0.0) - _DH_BACKOFF
    slope = jnp.where(valid, slope, 0.0)
    emax = jnp.where(valid, emax, 0.0)
    return crit, slope, emax


def _kernel_gather_osolve(mult_ref, dmult_ref, omm_ref, segt_ref, freq_ref,
                          out_ref, span_s, slope_s, emax_s, *, n_seg,
                          last_chunk, last_idx, b_tile, f_tile, p_chunk,
                          inv_dalt, G, hoist):
    """O-mode gather kernel with the reflection-height solve IN-kernel.

    For O-mode the cutoff cummax is frequency-separable
    (cummax_j X = cummax_j(den)·cp²/f², exactly — see
    :func:`prepare_profile_tables`), so the [B, F, N] XLA solve — which
    round-3 profiling showed costing 3× the kernel itself in HBM traffic —
    reduces to: a dense [f_tile, G] count of dmax < f²/cp² (VMEM compare),
    an X-space ±1 razor correction, and a handful of block-gathers at the
    crossing index. Channel 8 of ``segt`` carries cummax(den) padded with
    +inf so padded lanes never count.

    ``hoist`` (static; set when n_chunks > 1): the solve runs ONCE per
    (b, f) tile — on the first P-chunk — and its results ride VMEM
    scratch (``span_s``/``slope_s``/``emax_s``) across the revisited
    chunk dimension (the innermost grid axis, so scratch persists; the
    same ordering assumption the accumulating ``out_ref`` already
    makes). Round-4 VERDICT: re-running the dense [f_tile, G] solve in
    all ``n_chunks`` grid steps was 40× redundant at X-20k. For a
    single-chunk launch (the O-200 headline) the solve stays INLINE:
    round-5 on-chip measurement put the scratch round-trip at +2.5 ms
    on the 16.7 ms launch, so hoisting pays only when it actually
    deduplicates work.
    """
    pc = pl.program_id(2)
    dtype = mult_ref.dtype
    mult = mult_ref[0, :]                       # [p_chunk]
    dmult = dmult_ref[0, :]
    omm = omm_ref[0, :]
    f = freq_ref[0, 0, 0, :][:, None]           # [f_tile, 1]
    mi = mult * jnp.asarray(inv_dalt, dtype)
    n_blk = G // 128
    cp2 = jnp.asarray(CP * CP, dtype)
    inv_f2 = 1.0 / (f * f)                      # [f_tile, 1]
    thr = (f * f) / cp2                         # density-space cutoff

    for bi in range(b_tile):
        if hoist:
            @pl.when(pc == 0)
            def _(bi=bi):
                sp, sl, em = _osolve_tile(segt_ref, bi, thr, cp2, inv_f2,
                                          n_seg, f_tile, n_blk, dtype)
                span_s[bi, :] = sp[:, 0]
                slope_s[bi, :] = sl[:, 0]
                emax_s[bi, :] = em[:, 0]
            span = span_s[bi, :][:, None]       # relative frame: alt0 == 0
            slope = slope_s[bi, :][:, None]
            emax = emax_s[bi, :][:, None]
        else:
            span, slope, emax = _osolve_tile(segt_ref, bi, thr, cp2,
                                             inv_f2, n_seg, f_tile,
                                             n_blk, dtype)

        # ---- resample + μ' + quadrature (as _kernel_gather) ----
        pos = span * mi[None, :]                             # [f_tile, P]
        i0 = jnp.minimum(jnp.maximum(jnp.floor(pos).astype(jnp.int32),
                                     jnp.int32(0)), jnp.int32(n_seg - 2))
        frac = jnp.clip(pos - i0.astype(dtype), 0.0, 1.0)
        ilo = i0 & 127
        iblk = i0 >> 7
        gat = lambda c: _block_gather(segt_ref, bi, c, ilo, iblk, n_blk,
                                      dtype)
        d_acc = gat(2) + frac * gat(3)
        bm_acc = gat(4) + frac * gat(5)
        bp_acc = gat(6) + frac * gat(7)

        dh = span * dmult[None, :]
        p_ids = jax.lax.broadcasted_iota(jnp.int32, dh.shape, 1)
        is_last = (pc == last_chunk) & (p_ids == last_idx)
        dh = jnp.where(is_last, jnp.asarray(_DH_BACKOFF, dh.dtype), dh)

        X = d_acc * (CP * CP) / (f * f)
        Y = bm_acc * G_P / f
        eps = slope * (span * omm[None, :] + _DH_BACKOFF)
        mup, ok = _mu_mup_stable_tile(X, Y, bp_acc, 1.0, eps, emax)
        partial_ih = jnp.sum(jnp.where(ok, mup * dh, 0.0), axis=1)

        @pl.when(pc == 0)
        def _(bi=bi, partial_ih=partial_ih):
            out_ref[bi, 0, 0, :] = jnp.zeros_like(partial_ih)

        out_ref[bi, 0, 0, :] = out_ref[bi, 0, 0, :] + partial_ih


def _xsolve_tile(segt_ref, bi, f, cp2, gp, inv_f2, n_seg, dtype):
    """The X-mode in-kernel reflection solve for one b-row.

    Returns ([f_tile, 1] span, slope, emax, valid) in the relative-
    altitude frame (shared by :func:`_kernel_gather_xsolve`'s inline and
    hoisted paths).
    """
    G = segt_ref.shape[-1]
    neginf = jnp.asarray(-jnp.inf, dtype)
    drow = segt_ref[bi, 2, :]                   # [G] raw den, 0-padded
    bmrow = segt_ref[bi, 4, :]                  # [G] raw |B|
    arow = segt_ref[bi, 0, :]                   # [G] altitude rel alt0
    # same op ORDER as the dense path (bit-parity): X = (den·cp²)/f²,
    # Y = (|B|·g_p)/f; padding rows are 0 ⇒ s = 0 < 1, never exceed
    s = (drow[None, :] * cp2 * inv_f2
         + bmrow[None, :] * gp / f)                          # [f_tile, G]
    jidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    exceed = s >= 1.0
    k_first = jnp.min(jnp.where(exceed, jidx, jnp.int32(G)),
                      axis=1, keepdims=True)                 # [f_tile, 1]
    valid = k_first < n_seg
    k = jnp.minimum(jnp.maximum(k_first, jnp.int32(1)),
                    jnp.int32(n_seg - 1))
    f0 = jnp.max(jnp.where(jidx <= k - 1, s, neginf), axis=1,
                 keepdims=True)                 # cummax(s)[k-1], selected
    s_k = jnp.max(jnp.where(jidx == k, s, neginf), axis=1,
                  keepdims=True)
    f1 = jnp.maximum(f0, s_k)                   # cummax(s)[k]
    r0 = jnp.max(jnp.where(jidx == k - 1, s, neginf), axis=1,
                 keepdims=True)                 # raw s at k-1
    arow_b = arow[None, :] + jnp.zeros(s.shape, dtype)
    a0 = jnp.sum(jnp.where(jidx == k - 1, arow_b, 0.0), axis=1,
                 keepdims=True)                 # one-hot: exact select
    a1 = jnp.sum(jnp.where(jidx == k, arow_b, 0.0), axis=1,
                 keepdims=True)
    t = jnp.where(f1 != f0,
                  (1.0 - f0) / jnp.where(f1 != f0, f1 - f0, 1.0), 0.0)
    crit = a0 + jnp.clip(t, 0.0, 1.0) * (a1 - a0)
    da = a1 - a0
    slope = jnp.where((da > 0) & (f1 > f0),
                      (f1 - f0) / jnp.where(da > 0, da, 1.0), 0.0)
    genuine = r0 == f0
    emax = jnp.where(genuine, jnp.maximum(slope * (crit - a0), 0.0), 0.0)
    first_exceeds = exceed[:, 0:1]
    crit = jnp.where(first_exceeds, 0.0, crit)
    crit = jnp.where(valid, crit, 0.0) - _DH_BACKOFF
    slope = jnp.where(valid, slope, 0.0)
    emax = jnp.where(valid, emax, 0.0)
    return crit, slope, emax, valid


def _kernel_gather_xsolve(mult_ref, dmult_ref, omm_ref, segt_ref, freq_ref,
                          out_ref, valid_ref, span_s, slope_s, emax_s, *,
                          n_seg, last_chunk, last_idx, b_tile, f_tile,
                          p_chunk, inv_dalt, G, hoist):
    """X-mode gather kernel with the reflection-height solve IN-kernel.

    The X-mode cutoff cummax(X+Y) is not frequency-separable like
    O-mode's, but the solve never needed the cummax TENSOR: the crossing
    index is the FIRST exceedance of the raw s_j = X_j + Y_j (after the
    first sample ≥ 1 every later cummax entry is ≥ 1), and the two
    interpolation ordinates are prefix maxima of those same raw values —
    f0 = max_{i≤k−1} s_i, f1 = max(f0, s_k). So the whole [B, F, N]
    HBM-bound XLA prep (ref X cutoff ``library.py:391-396``;
    :func:`prepare_profile_tables` else-branch) collapses to a dense
    [f_tile, G] VMEM evaluation of s plus a handful of lane reductions —
    min-index for k, masked max for f0/r0/s_k, one-hot sums for a0/a1.
    Every ordinate is SELECTED from the same raw s values the dense path's
    cummax selects; the critical height is assembled in the relative-
    altitude frame (one extra rounding, like the O in-kernel solve), so
    f64 agreement with the XLA-prep path is ~1e-12 km — ≲3e-7 km on
    near-critical rows where |∂vh/∂h_crit| amplifies the last-ulp crit
    rounding — with identical NaN structure (tested).

    ``valid_ref`` is a second [b_tile, 1, 1, f_tile] output (1.0 where the
    profile reflects the frequency) written on the first P-chunk —
    X-mode validity is not separable, so it is cheapest here where s is
    already in VMEM.

    Like :func:`_kernel_gather_osolve`, ``hoist`` (static; set when
    n_chunks > 1) runs the solve once per (b, f) tile on the first
    P-chunk, with span/slope/emax carried in VMEM scratch across the
    (innermost) chunk axis; single-chunk launches keep the solve inline
    (the scratch round-trip costs ~1 ms when there is nothing to
    deduplicate — round-5 on-chip measurement).
    """
    pc = pl.program_id(2)
    dtype = mult_ref.dtype
    mult = mult_ref[0, :]                       # [p_chunk]
    dmult = dmult_ref[0, :]
    omm = omm_ref[0, :]
    f = freq_ref[0, 0, 0, :][:, None]           # [f_tile, 1]
    mi = mult * jnp.asarray(inv_dalt, dtype)
    n_blk = G // 128
    cp2 = jnp.asarray(CP * CP, dtype)
    gp = jnp.asarray(G_P, dtype)
    inv_f2 = 1.0 / (f * f)                      # [f_tile, 1]

    for bi in range(b_tile):
        if hoist:
            @pl.when(pc == 0)
            def _(bi=bi):
                sp, sl, em, valid = _xsolve_tile(segt_ref, bi, f, cp2, gp,
                                                 inv_f2, n_seg, dtype)
                span_s[bi, :] = sp[:, 0]
                slope_s[bi, :] = sl[:, 0]
                emax_s[bi, :] = em[:, 0]
                valid_ref[bi, 0, 0, :] = valid[:, 0].astype(dtype)
            span = span_s[bi, :][:, None]       # relative frame: alt0 == 0
            slope = slope_s[bi, :][:, None]
            emax = emax_s[bi, :][:, None]
        else:
            span, slope, emax, valid = _xsolve_tile(segt_ref, bi, f, cp2,
                                                    gp, inv_f2, n_seg,
                                                    dtype)

            @pl.when(pc == 0)
            def _(bi=bi, valid=valid):
                valid_ref[bi, 0, 0, :] = valid[:, 0].astype(dtype)

        # ---- resample + μ' + quadrature (as _kernel_gather) ----
        pos = span * mi[None, :]                             # [f_tile, P]
        i0 = jnp.minimum(jnp.maximum(jnp.floor(pos).astype(jnp.int32),
                                     jnp.int32(0)), jnp.int32(n_seg - 2))
        frac = jnp.clip(pos - i0.astype(dtype), 0.0, 1.0)
        ilo = i0 & 127
        iblk = i0 >> 7
        gat = lambda c: _block_gather(segt_ref, bi, c, ilo, iblk, n_blk,
                                      dtype)
        d_acc = gat(2) + frac * gat(3)
        bm_acc = gat(4) + frac * gat(5)
        bp_acc = gat(6) + frac * gat(7)

        dh = span * dmult[None, :]
        p_ids = jax.lax.broadcasted_iota(jnp.int32, dh.shape, 1)
        is_last = (pc == last_chunk) & (p_ids == last_idx)
        dh = jnp.where(is_last, jnp.asarray(_DH_BACKOFF, dh.dtype), dh)

        X = d_acc * (CP * CP) / (f * f)
        Y = bm_acc * G_P / f
        eps = slope * (span * omm[None, :] + _DH_BACKOFF)
        mup, ok = _mu_mup_stable_tile(X, Y, bp_acc, -1.0, eps, emax)
        partial_ih = jnp.sum(jnp.where(ok, mup * dh, 0.0), axis=1)

        @pl.when(pc == 0)
        def _(bi=bi, partial_ih=partial_ih):
            out_ref[bi, 0, 0, :] = jnp.zeros_like(partial_ih)

        out_ref[bi, 0, 0, :] = out_ref[bi, 0, 0, :] + partial_ih


@partial(jax.jit, static_argnames=("mode_mult", "n_points", "p_chunk",
                                   "interpret", "f_tile", "b_tile",
                                   "inv_dalt", "x_in_kernel_solve"))
def _ionogram_pallas_gather(freq_mhz, den, bmag, bpsi, alt, mode_mult=1.0,
                            n_points=200, p_chunk=512, interpret=False,
                            f_tile=32, b_tile=4, inv_dalt=None,
                            x_in_kernel_solve=True):
    """Dynamic-gather variant of the fused kernel (uniform grid only)."""
    if inv_dalt is None:
        raise ValueError("the gather engine requires a uniformly spaced "
                         "shared altitude grid (use engine='pallas')")
    freq_hz = (jnp.asarray(freq_mhz, dtype=den.dtype) * 1e6)
    den = jnp.asarray(den)
    B, N = den.shape
    F = freq_hz.shape[0]
    dtype = den.dtype

    F_pad = _round_up(F, f_tile)
    P = n_points
    p_chunk = min(p_chunk, _round_up(P, 128))
    n_chunks = -(-P // p_chunk)
    P_pad = n_chunks * p_chunk

    mult, omm, dmult = _stretched_grid_tables(P)
    mult_p = np.zeros(P_pad)
    mult_p[:P] = mult
    omm_p = np.zeros(P_pad)
    omm_p[:P] = omm
    dmult_p = np.zeros(P_pad)
    dmult_p[:P] = dmult
    mult_j = jnp.asarray(mult_p, dtype)[None, :]
    omm_j = jnp.asarray(omm_p, dtype)[None, :]
    dmult_j = jnp.asarray(dmult_p, dtype)[None, :]

    # gather width: lane-padded table length
    G = _round_up(N, 128)
    n_ftiles = F_pad // f_tile
    freq_p = jnp.ones((1, 1, F_pad), dtype).at[0, 0, :F].set(freq_hz)
    freq_b = freq_p.reshape(1, n_ftiles, 1, f_tile)
    ftile_spec = pl.BlockSpec((b_tile, 1, 1, f_tile),
                              lambda b, f, c: (b, f, 0, 0),
                              memory_space=pltpu.VMEM)
    chunk_spec = pl.BlockSpec((1, p_chunk), lambda b, f, c: (0, c),
                              memory_space=pltpu.VMEM)
    common = dict(grid=(B // b_tile, n_ftiles, n_chunks))
    out_spec = pl.BlockSpec((b_tile, 1, 1, f_tile),
                            lambda b, f, c: (b, f, 0, 0),
                            memory_space=pltpu.VMEM)
    kern_kw = dict(n_seg=N, last_chunk=(P - 1) // p_chunk,
                   last_idx=(P - 1) % p_chunk, b_tile=b_tile,
                   f_tile=f_tile, p_chunk=p_chunk, inv_dalt=inv_dalt, G=G)
    # per-(b,f)-tile reflection-solve results, persisted across the
    # innermost chunk axis (solve runs only on the first chunk)
    solve_scratch = [pltpu.VMEM((b_tile, f_tile), dtype) for _ in range(3)]

    if mode_mult > 0:
        # O-mode: the reflection-height solve happens IN-kernel (the
        # cutoff cummax is frequency-separable) — XLA only flat-extends,
        # packs the segment table and appends the cummax(den) channel
        den_t, bmag_t, bpsi_t, alt_t = _flat_extend(
            den, jnp.asarray(bmag, dtype), jnp.asarray(bpsi, dtype),
            jnp.asarray(alt, dtype))
        seg = _pack_segment_table(den_t, bmag_t, bpsi_t, alt_t)
        dmax = jax.lax.cummax(den_t, axis=1)
        cp2 = jnp.asarray(CP * CP, dtype)
        inv_f2 = (1.0 / (freq_hz * freq_hz)).astype(dtype)
        valid = (dmax[:, -1:] * cp2) * inv_f2[None, :] >= 1.0    # [B, F]
        seg9 = jnp.concatenate([seg, dmax[:, :, None]], axis=2)
        padrows = jnp.zeros((B, G - N, 9), dtype)
        padrows = padrows.at[:, :, 8].set(jnp.inf)   # never below cutoff
        segt = jnp.concatenate([seg9, padrows], axis=1).transpose(0, 2, 1)
        out = pl.pallas_call(
            partial(_kernel_gather_osolve, hoist=n_chunks > 1, **kern_kw),
            in_specs=[
                chunk_spec, chunk_spec, chunk_spec,
                pl.BlockSpec((b_tile, 9, G), lambda b, f, c: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, f_tile),
                             lambda b, f, c: (0, f, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B, n_ftiles, 1, f_tile),
                                           dtype),
            scratch_shapes=solve_scratch,
            interpret=interpret, **common,
        )(mult_j, dmult_j, omm_j, segt, freq_b)
    elif x_in_kernel_solve:
        # X-mode with the reflection solve IN-kernel: XLA only
        # flat-extends and packs, exactly like the O-mode branch — the
        # [B, F, N] HBM-bound prep disappears (round-4; see
        # _kernel_gather_xsolve)
        den_t, bmag_t, bpsi_t, alt_t = _flat_extend(
            den, jnp.asarray(bmag, dtype), jnp.asarray(bpsi, dtype),
            jnp.asarray(alt, dtype))
        seg = _pack_segment_table(den_t, bmag_t, bpsi_t, alt_t)
        segt = jnp.concatenate(
            [seg, jnp.zeros((B, G - N, 8), seg.dtype)], axis=1)
        segt = segt.transpose(0, 2, 1)
        out, validf = pl.pallas_call(
            partial(_kernel_gather_xsolve, hoist=n_chunks > 1, **kern_kw),
            in_specs=[
                chunk_spec, chunk_spec, chunk_spec,
                pl.BlockSpec((b_tile, 8, G), lambda b, f, c: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, f_tile),
                             lambda b, f, c: (0, f, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[out_spec, out_spec],
            out_shape=[jax.ShapeDtypeStruct((B, n_ftiles, 1, f_tile),
                                            dtype),
                       jax.ShapeDtypeStruct((B, n_ftiles, 1, f_tile),
                                            dtype)],
            scratch_shapes=solve_scratch,
            interpret=interpret, **common,
        )(mult_j, dmult_j, omm_j, segt, freq_b)
        valid = validf.reshape(B, F_pad)[:, :F] > 0.5
    else:
        seg, crit, valid, slope, emax = prepare_profile_tables(
            freq_hz, den, jnp.asarray(bmag, dtype),
            jnp.asarray(bpsi, dtype), jnp.asarray(alt, dtype), mode_mult)
        segt = jnp.concatenate(
            [seg, jnp.zeros((B, G - N, 8), seg.dtype)], axis=1)
        segt = segt.transpose(0, 2, 1)
        alt0 = jnp.asarray(alt, dtype)[0]
        span = crit - alt0
        span_p = jnp.zeros((B, 1, F_pad), dtype).at[:, 0, :F].set(span)
        slope_p = jnp.zeros((B, 1, F_pad), dtype).at[:, 0, :F].set(slope)
        emax_p = jnp.zeros((B, 1, F_pad), dtype).at[:, 0, :F].set(emax)
        span_b = span_p.reshape(B, n_ftiles, 1, f_tile)
        slope_b = slope_p.reshape(B, n_ftiles, 1, f_tile)
        emax_b = emax_p.reshape(B, n_ftiles, 1, f_tile)
        out = pl.pallas_call(
            partial(_kernel_gather, mode_mult=mode_mult, **kern_kw),
            in_specs=[
                chunk_spec, chunk_spec, chunk_spec,
                pl.BlockSpec((b_tile, 8, G), lambda b, f, c: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                ftile_spec, ftile_spec, ftile_spec,
                pl.BlockSpec((1, 1, 1, f_tile),
                             lambda b, f, c: (0, f, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B, n_ftiles, 1, f_tile),
                                           dtype),
            interpret=interpret, **common,
        )(mult_j, dmult_j, omm_j, segt, span_b, slope_b, emax_b, freq_b)

    ih = out.reshape(B, F_pad)[:, :F]
    min_alt = jnp.min(jnp.asarray(alt, dtype))
    return jnp.where(valid & (ih != 0.0), ih + min_alt, jnp.nan)


def ionogram_pallas_gather(freq_mhz, den, bmag, bpsi, alt, mode_mult=None,
                           n_points=None, p_chunk=None, interpret=False,
                           f_tile=None, b_tile=4, config=None,
                           x_in_kernel_solve=True):
    """Dynamic-gather ionogram synthesis: [B, N_alt] profiles → [B, F] vh.

    Same discretisation and API as :func:`ionogram_pallas`, with the
    resample as hardware per-lane gathers (see :func:`_kernel_gather`) —
    and the reflection-height solve fused into the kernel for BOTH modes
    (O: :func:`_kernel_gather_osolve`, round 3; X:
    :func:`_kernel_gather_xsolve`, round 4), which removes the
    [B, F, N_alt] HBM-bound XLA preprocessing entirely. Measured on one
    v5e chip at the README O-200 workload (B=1024): 17.0 ms/launch =
    1.05e7 vh evals/s — 3.4× the sweep kernel (round-3 BENCHMARKS.md).
    Requires a uniformly spaced shared altitude grid (raises otherwise).
    Differentiable like :func:`ionogram_pallas` (same AD wrapper).
    ``f_tile`` defaults to 8 for O-mode (best measured) and 32 for
    X-mode. ``x_in_kernel_solve=False`` keeps the round-3 X path (solve
    in XLA via :func:`prepare_profile_tables`) for comparison.
    """
    from .config import resolve
    if mode_mult is None:
        mode_mult = (1.0 if resolve(config, "mode", None, "O") == "O"
                     else -1.0)
    if f_tile is None:
        f_tile = 8 if mode_mult > 0 else 32
    n_points = resolve(config, "n_points", n_points, 200)
    p_chunk = resolve(config, "p_chunk", p_chunk, 512)
    b_tile = max(int(b_tile), 1)
    B = np.shape(den)[0]
    while B % b_tile:
        b_tile -= 1
    inv_dalt = uniform_inv_dalt(alt)
    if inv_dalt is None:
        raise ValueError("ionogram_pallas_gather requires a uniformly "
                         "spaced concrete altitude grid (use "
                         "ionogram_pallas)")
    cfg = (("mode_mult", mode_mult), ("n_points", n_points),
           ("p_chunk", p_chunk), ("interpret", interpret),
           ("f_tile", f_tile), ("b_tile", b_tile),
           ("inv_dalt", inv_dalt),
           ("x_in_kernel_solve", bool(x_in_kernel_solve)),
           ("gather", True))
    return _pallas_ad(cfg, freq_mhz, den, bmag, bpsi, alt)


@partial(jax.jit, static_argnames=("mode_mult", "n_points", "p_chunk",
                                   "interpret", "f_tile", "b_tile",
                                   "inv_dalt"))
def _ionogram_pallas_mxu(freq_mhz, den, bmag, bpsi, alt, mode_mult=1.0,
                         n_points=200, p_chunk=512, interpret=False,
                         f_tile=32, b_tile=4, inv_dalt=None):
    """MXU-gather variant of the fused kernel (uniform shared grid only)."""
    if inv_dalt is None:
        raise ValueError("the MXU engine requires a uniformly spaced "
                         "shared altitude grid (use engine='pallas')")
    freq_hz = (jnp.asarray(freq_mhz, dtype=den.dtype) * 1e6)
    den = jnp.asarray(den)
    B, N = den.shape
    F = freq_hz.shape[0]
    dtype = den.dtype

    seg, crit, valid, slope, emax = prepare_profile_tables(
        freq_hz, den, jnp.asarray(bmag, dtype), jnp.asarray(bpsi, dtype),
        jnp.asarray(alt, dtype), mode_mult)

    F_pad = _round_up(F, f_tile)
    P = n_points
    p_chunk = min(p_chunk, _round_up(P, 128))
    n_chunks = -(-P // p_chunk)
    P_pad = n_chunks * p_chunk

    mult, omm, dmult = _stretched_grid_tables(P)
    mult_p = np.zeros(P_pad)
    mult_p[:P] = mult
    omm_p = np.zeros(P_pad)
    omm_p[:P] = omm
    dmult_p = np.zeros(P_pad)
    dmult_p[:P] = dmult
    mult_j = jnp.asarray(mult_p, dtype)[None, :]
    omm_j = jnp.asarray(omm_p, dtype)[None, :]
    dmult_j = jnp.asarray(dmult_p, dtype)[None, :]

    alt0 = jnp.asarray(alt, dtype)[0]
    span = crit - alt0
    span_p = jnp.zeros((B, 1, F_pad), dtype).at[:, 0, :F].set(span)
    slope_p = jnp.zeros((B, 1, F_pad), dtype).at[:, 0, :F].set(slope)
    emax_p = jnp.zeros((B, 1, F_pad), dtype).at[:, 0, :F].set(emax)
    freq_p = jnp.ones((1, 1, F_pad), dtype).at[0, 0, :F].set(freq_hz)

    # segment table reshaped for the factorised gather: rows padded to
    # K1·K2, then transposed to [K2·8 = 128, K1] so every in-kernel array
    # keeps resample points on the lane dimension
    K2 = 16
    K1 = -(-N // K2)
    seg_m = jnp.concatenate(
        [seg, jnp.zeros((B, K1 * K2 - N, 8), seg.dtype)], axis=1)
    seg_m = seg_m.reshape(B, K1, K2 * 8).transpose(0, 2, 1)

    n_ftiles = F_pad // f_tile
    span_b = span_p.reshape(B, n_ftiles, 1, f_tile)
    slope_b = slope_p.reshape(B, n_ftiles, 1, f_tile)
    emax_b = emax_p.reshape(B, n_ftiles, 1, f_tile)
    freq_b = freq_p.reshape(1, n_ftiles, 1, f_tile)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B // b_tile, n_ftiles, n_chunks),
        scratch_shapes=[pltpu.VMEM((f_tile, p_chunk), dtype),
                        pltpu.VMEM((f_tile, p_chunk), dtype),
                        pltpu.VMEM((f_tile, p_chunk), dtype)],
        in_specs=[
            pl.BlockSpec((1, p_chunk), lambda b, f, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_chunk), lambda b, f, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_chunk), lambda b, f, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, K2 * 8, K1),
                         lambda b, f, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 1, 1, f_tile),
                         lambda b, f, c: (b, f, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 1, 1, f_tile),
                         lambda b, f, c: (b, f, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 1, 1, f_tile),
                         lambda b, f, c: (b, f, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, f_tile),
                         lambda b, f, c: (0, f, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_tile, 1, 1, f_tile),
                               lambda b, f, c: (b, f, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        partial(_kernel_mxu, mode_mult=mode_mult, n_seg=N,
                last_chunk=(P - 1) // p_chunk, last_idx=(P - 1) % p_chunk,
                b_tile=b_tile, f_tile=f_tile, inv_dalt=inv_dalt,
                K1=K1, K2=K2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_ftiles, 1, f_tile), dtype),
        interpret=interpret,
    )(mult_j, dmult_j, omm_j, seg_m, span_b, slope_b, emax_b, freq_b)

    ih = out.reshape(B, F_pad)[:, :F]
    min_alt = jnp.min(jnp.asarray(alt, dtype))
    return jnp.where(valid & (ih != 0.0), ih + min_alt, jnp.nan)


def ionogram_pallas_mxu(freq_mhz, den, bmag, bpsi, alt, mode_mult=None,
                        n_points=None, p_chunk=None, interpret=False,
                        f_tile=32, b_tile=4, config=None):
    """MXU one-hot-matmul ionogram synthesis: [B, N_alt] → [B, F] vh.

    Same discretisation and API as :func:`ionogram_pallas`, but the
    piecewise-linear resample runs as factorised one-hot gather matmuls on
    the MXU instead of the O(N_seg) hat-weight sweep on the VPU (see
    :func:`_kernel_mxu`). Requires a uniformly spaced shared altitude
    grid (raises otherwise). Resample values match the parity gather
    semantics exactly (no O(N) accumulation error) and the f64 output is
    bit-identical to the sweep kernel's.

    **Measured outcome (round 3, v5e, README O-200 B=1024): 129 ms vs the
    sweep's 58 ms — 2.2× SLOWER.** The op's shape defeats the systolic
    array: a gather is O(1) useful MACs per element, but the MXU
    quantises to 128-deep contractions and 128-wide outputs (the
    [P, K1≈40]·[K1, 128] stages use ≲1/3 of the contraction depth and
    8/128 of the output rows), and the 2 small matmuls per (profile,
    f-row) — ~400k per launch — drown in issue overhead. Kept as the
    documented MXU data point; use :func:`ionogram_pallas_gather` (the
    hardware per-lane gather path, 3.4× FASTER than the sweep) instead —
    full numbers in BENCHMARKS.md round 3.
    """
    from .config import resolve
    if mode_mult is None:
        mode_mult = (1.0 if resolve(config, "mode", None, "O") == "O"
                     else -1.0)
    n_points = resolve(config, "n_points", n_points, 200)
    p_chunk = resolve(config, "p_chunk", p_chunk, 512)
    b_tile = max(int(b_tile), 1)
    B = np.shape(den)[0]
    while B % b_tile:
        b_tile -= 1
    inv_dalt = uniform_inv_dalt(alt)
    if inv_dalt is None:
        raise ValueError("ionogram_pallas_mxu requires a uniformly spaced "
                         "concrete altitude grid (use ionogram_pallas)")
    cfg = (("mode_mult", mode_mult), ("n_points", n_points),
           ("p_chunk", p_chunk), ("interpret", interpret),
           ("f_tile", f_tile), ("b_tile", b_tile),
           ("inv_dalt", inv_dalt), ("mxu", True))
    return _pallas_ad(cfg, freq_mhz, den, bmag, bpsi, alt)


def ionogram_pallas(freq_mhz, den, bmag, bpsi, alt, mode_mult=None,
                    n_points=None, p_chunk=None, interpret=False, f_tile=32,
                    b_tile=4, config=None):
    """Fused TPU ionogram synthesis: [B, N_alt] profiles → [B, F] vh.

    Same discretisation as :func:`pyrayhf_tpu.forward
    .vertical_forward_operator_batch` (docstring caveats re f32 tails).
    When ``alt`` is a concrete uniformly spaced grid the kernel takes a
    cheaper sweep path (no per-segment edge loads). ``b_tile`` profiles
    share one grid cell (amortises per-cell overhead; falls back to the
    largest divisor of the batch).
    ``config`` (an :class:`pyrayhf_tpu.config.OperatorConfig`) supplies
    mode (as ±1 mode_mult), n_points and p_chunk when not explicit.

    Fully differentiable (forward AND reverse mode): ``pallas_call`` has
    no autodiff rule, so a custom JVP routes tangents through the
    numerically-identical XLA sweep (:func:`ionogram_fast_xla`) — the
    forward pass keeps kernel speed; jacfwd uses the rule directly and
    grad/jacrev transpose its linearisation (see :func:`_pallas_ad_jvp`).
    """
    from .config import resolve
    if mode_mult is None:
        mode_mult = (1.0 if resolve(config, "mode", None, "O") == "O"
                     else -1.0)
    n_points = resolve(config, "n_points", n_points, 200)
    p_chunk = resolve(config, "p_chunk", p_chunk, 512)
    b_tile = max(int(b_tile), 1)
    B = np.shape(den)[0]
    while B % b_tile:
        b_tile -= 1
    inv_dalt = uniform_inv_dalt(alt)
    cfg = (("mode_mult", mode_mult), ("n_points", n_points),
           ("p_chunk", p_chunk), ("interpret", interpret),
           ("f_tile", f_tile), ("b_tile", b_tile),
           ("inv_dalt", inv_dalt))
    return _pallas_ad(cfg, freq_mhz, den, bmag, bpsi, alt)


@partial(jax.custom_jvp, nondiff_argnums=(0,))
def _pallas_ad(cfg, freq_mhz, den, bmag, bpsi, alt):
    d = dict(cfg)
    if d.pop("gather", False):
        return _ionogram_pallas_gather(freq_mhz, den, bmag, bpsi, alt, **d)
    if d.pop("mxu", False):
        return _ionogram_pallas_mxu(freq_mhz, den, bmag, bpsi, alt, **d)
    return _ionogram_pallas(freq_mhz, den, bmag, bpsi, alt, **d)


@_pallas_ad.defjvp
def _pallas_ad_jvp(cfg, primals, tangents):
    """Tangents through the numerically-identical XLA sweep.

    ``pallas_call`` has no autodiff rule; the sweep
    (:func:`ionogram_fast_xla`) evaluates the same discretisation, so its
    tangents are the kernel's to their ~1e-13 forward agreement. A
    ``custom_jvp`` (rather than the round-2 ``custom_vjp``) supports BOTH
    differentiation modes: jvp/jacfwd directly, and grad/jacrev because
    JAX linearises through this rule and transposes the (transposable)
    sweep tangent program — at the same cost the explicit VJP had.
    """
    d = dict(cfg)

    def f(*p):
        return ionogram_fast_xla(*p, mode_mult=d["mode_mult"],
                                 n_points=d["n_points"])

    primal_out = _pallas_ad(cfg, *primals)
    _, tangent_out = jax.jvp(f, primals, tangents)
    return primal_out, tangent_out


@partial(jax.jit, static_argnames=("mode_mult", "n_points", "p_chunk",
                                   "interpret", "f_tile", "b_tile",
                                   "inv_dalt"))
def _ionogram_pallas(freq_mhz, den, bmag, bpsi, alt, mode_mult=1.0,
                     n_points=200, p_chunk=512, interpret=False, f_tile=32,
                     b_tile=1, inv_dalt=None):
    freq_hz = (jnp.asarray(freq_mhz, dtype=den.dtype) * 1e6)
    den = jnp.asarray(den)
    B, N = den.shape
    F = freq_hz.shape[0]
    dtype = den.dtype

    seg, crit, valid, slope, emax = prepare_profile_tables(
        freq_hz, den, jnp.asarray(bmag, dtype), jnp.asarray(bpsi, dtype),
        jnp.asarray(alt, dtype), mode_mult)

    F_pad = _round_up(F, f_tile)
    P = n_points
    p_chunk = min(p_chunk, _round_up(P, 128))
    n_chunks = -(-P // p_chunk)
    P_pad = n_chunks * p_chunk

    # static stretched-grid tables (f64 numpy so the f32 cast keeps full
    # relative precision on 1−mult and Δmult — see _stretched_grid_tables)
    mult, omm, dmult = _stretched_grid_tables(P)
    # pad the point axis with zero-weight cells
    mult_p = np.zeros(P_pad)
    mult_p[:P] = mult
    omm_p = np.zeros(P_pad)
    omm_p[:P] = omm
    dmult_p = np.zeros(P_pad)
    dmult_p[:P] = dmult
    mult_j = jnp.asarray(mult_p, dtype)[None, :]
    omm_j = jnp.asarray(omm_p, dtype)[None, :]
    dmult_j = jnp.asarray(dmult_p, dtype)[None, :]

    alt0 = jnp.asarray(alt, dtype)[0]
    span = crit - alt0
    # unit middle axis so each block equals the trailing dims
    span_p = jnp.zeros((B, 1, F_pad), dtype).at[:, 0, :F].set(span)
    slope_p = jnp.zeros((B, 1, F_pad), dtype).at[:, 0, :F].set(slope)
    emax_p = jnp.zeros((B, 1, F_pad), dtype).at[:, 0, :F].set(emax)
    freq_p = jnp.ones((1, 1, F_pad), dtype).at[0, 0, :F].set(freq_hz)

    # pad the segment table with zero rows so the 16x-unrolled sweep may
    # read (harmlessly) up to 15 rows past its bound
    seg = jnp.concatenate(
        [seg, jnp.zeros((B, 16, 8), seg.dtype)], axis=1)
    N_tab = N + 16

    # Per-(profile, f-tile, point-chunk) sweep bounds. The stretched-grid
    # points are sorted, so chunk c spans altitudes
    # [span·mult[c·pc], span·mult[(c+1)·pc−1]]: segments fully below are
    # saturated (folded into the accumulator init at node j_lo inside the
    # kernel), segments above contribute nothing (j_hi).
    n_ftiles = F_pad // f_tile
    alt_rel = seg[:, :N, 0]
    span_t = span_p[:, 0, :].reshape(B, n_ftiles, f_tile)
    max_span = jnp.max(span_t, axis=2)                     # [B, n_ftiles]
    # min span over VALID rows only (escaped rows carry span ≈ 0 and would
    # destroy the lower bound; their sweep output is masked downstream)
    valid_p = jnp.zeros((B, F_pad), bool).at[:, :F].set(valid)
    valid_t = valid_p.reshape(B, n_ftiles, f_tile)
    span_big = jnp.where(valid_t, span_t, jnp.inf)
    min_span = jnp.min(span_big, axis=2)                   # [B, n_ftiles]

    c_ids = np.arange(n_chunks)
    mult_lo = mult_p[c_ids * p_chunk]                      # first real point
    mult_hi = mult_p[np.minimum((c_ids + 1) * p_chunk, P) - 1]
    pos_min = min_span[:, :, None] * jnp.asarray(mult_lo, dtype)[None, None]
    pos_max = max_span[:, :, None] * jnp.asarray(mult_hi, dtype)[None, None]
    # (all-invalid tiles: inf·0 = nan → comparisons False → j_lo = 0)
    j_lo = jnp.sum(alt_rel[:, None, None, 1:] <= pos_min[..., None],
                   axis=3).astype(jnp.int32)
    j_lo = jnp.minimum(j_lo, N - 1).reshape(B * n_ftiles * n_chunks)
    j_hi = jnp.sum(alt_rel[:, None, None, :] < pos_max[..., None],
                   axis=3).astype(jnp.int32).reshape(B * n_ftiles * n_chunks)

    span_b = span_p.reshape(B, n_ftiles, 1, f_tile)
    slope_b = slope_p.reshape(B, n_ftiles, 1, f_tile)
    emax_b = emax_p.reshape(B, n_ftiles, 1, f_tile)
    freq_b = freq_p.reshape(1, n_ftiles, 1, f_tile)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // b_tile, n_ftiles, n_chunks),
        in_specs=[
            pl.BlockSpec((1, p_chunk), lambda b, f, c, jl, jh: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_chunk), lambda b, f, c, jl, jh: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_chunk), lambda b, f, c, jl, jh: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, N_tab, 8),
                         lambda b, f, c, jl, jh: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 1, 1, f_tile),
                         lambda b, f, c, jl, jh: (b, f, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 1, 1, f_tile),
                         lambda b, f, c, jl, jh: (b, f, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 1, 1, f_tile),
                         lambda b, f, c, jl, jh: (b, f, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, f_tile),
                         lambda b, f, c, jl, jh: (0, f, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_tile, 1, 1, f_tile),
                               lambda b, f, c, jl, jh: (b, f, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        partial(_kernel, mode_mult=mode_mult, n_seg=N,
                last_chunk=(P - 1) // p_chunk, last_idx=(P - 1) % p_chunk,
                n_ftiles=n_ftiles, n_chunks=n_chunks, b_tile=b_tile,
                inv_dalt=inv_dalt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_ftiles, 1, f_tile), dtype),
        interpret=interpret,
    )(j_lo, j_hi, mult_j, dmult_j, omm_j, seg.reshape(B, N_tab, 8), span_b,
      slope_b, emax_b, freq_b)

    ih = out.reshape(B, F_pad)[:, :F]
    min_alt = jnp.min(jnp.asarray(alt, dtype))
    return jnp.where(valid & (ih != 0.0), ih + min_alt, jnp.nan)


def _stretched_grid_tables(n_points):
    """Static stretched-grid vectors in f64: (mult, 1−mult, Δmult).

    The multiplier and its complement/differences MUST be formed in f64
    before any cast to the working dtype: near the reflection point the
    grid spacing is ~6e-6·span out of mult≈1, i.e. ≲2e-8 relative — below
    f32 eps — so diff/one-minus on an f32 ``mult`` collapses (dh rows of
    alternating 0 / double-width, quantized cutoff margins) and the
    singular μ′ tail integrates ~0.09 km wrong on the X-mode 20k workload.
    ``1−mult`` and ``Δmult`` themselves are perfectly representable in f32
    (small magnitudes, full relative precision).
    """
    u = np.linspace(0.0, 1.0, n_points)
    factor = (np.exp(10.0 * (1.0 - u)) - 1.0) / (np.exp(10.0) - 1.0)
    mult = 1.0 - factor
    dmult = np.concatenate([np.diff(mult), [0.0]])
    return mult, factor, dmult


@partial(jax.jit, static_argnames=("mode_mult", "n_points"))
def ionogram_fast_xla(freq_mhz, den, bmag, bpsi, alt, mode_mult=1.0,
                      n_points=200):
    """Gather-free XLA fallback of the fused kernel (runs on CPU too).

    Identical math to :func:`ionogram_pallas`; HBM-bound on TPU (the sweep
    accumulators stream each step) but ~12× faster than the gather-based
    parity path there, and exactly matches the parity operator in f64.
    """
    freq_hz = jnp.asarray(freq_mhz, dtype=den.dtype) * 1e6
    den = jnp.asarray(den)
    B, N = den.shape
    F = freq_hz.shape[0]
    dtype = den.dtype
    bmag = jnp.asarray(bmag, dtype)
    bpsi = jnp.asarray(bpsi, dtype)
    alt_j = jnp.asarray(alt, dtype)

    seg, crit, valid, slope, emax = prepare_profile_tables(
        freq_hz, den, bmag, bpsi, alt_j, mode_mult)
    mult_np, omm_np, dmult_np = _stretched_grid_tables(n_points)
    mult = jnp.asarray(mult_np, dtype)
    omm = jnp.asarray(omm_np, dtype)
    dmult = jnp.asarray(dmult_np, dtype)
    alt0 = alt_j[0]
    span = crit - alt0                                # [B, F]
    # work in altitudes relative to alt0, matching the packed table
    new_alt = span[:, :, None] * mult[None, None, :]
    dh = span[:, :, None] * dmult[None, None, :]
    dh = dh.at[:, :, -1].set(_DH_BACKOFF)

    def body(j, carry):
        d, bm, bp = carry
        a_j = seg[:, j, 0][:, None, None]
        inv = seg[:, j, 1][:, None, None]
        tt = jnp.clip((new_alt - a_j) * inv, 0.0, 1.0)
        d = d + tt * seg[:, j, 3][:, None, None]
        bm = bm + tt * seg[:, j, 5][:, None, None]
        bp = bp + tt * seg[:, j, 7][:, None, None]
        return d, bm, bp

    shape = (B, F, n_points)
    init = (jnp.broadcast_to(seg[:, 0, 2][:, None, None], shape),
            jnp.broadcast_to(seg[:, 0, 4][:, None, None], shape),
            jnp.broadcast_to(seg[:, 0, 6][:, None, None], shape))
    d_acc, bm_acc, bp_acc = jax.lax.fori_loop(0, N - 1, body, init)

    f = freq_hz[None, :, None]
    X = d_acc * (CP * CP) / (f * f)
    Y = bm_acc * G_P / f
    eps = slope[:, :, None] * (span[:, :, None] * omm[None, None, :]
                               + _DH_BACKOFF)
    mup, ok = _mu_mup_stable_tile(X, Y, bp_acc, mode_mult, eps,
                                  emax[:, :, None])
    ih = jnp.sum(jnp.where(ok, mup * dh, 0.0), axis=2)
    min_alt = jnp.min(alt_j)
    return jnp.where(valid & (ih != 0.0), ih + min_alt, jnp.nan)
