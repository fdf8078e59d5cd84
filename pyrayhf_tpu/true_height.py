"""Non-parametric true-height inversion: ionogram vh(f) → Ne(h) profile.

Capability beyond the reference: PyRayHF's inversion is parametric-only —
``minimize_parameters`` fits two scalars (hmF2, B_bot) of an IRI-shaped
layer (ref ``/root/reference/PyRayHF/library.py:672-825``). Real ionosonde
processing also needs the classic *true-height* problem (POLAN, Titheridge
1985; ARTIST): recover the electron-density profile itself from the trace,
without assuming an IRI shape.

Method — lamination, the classical recursion, built on this package's full
magnetoionic operator instead of the historical field-simplified kernels:

* the unknowns are the reflection (true) heights ``h_j`` of the observed
  frequencies ``f_1 < … < f_K``; the densities there are known from
  theory (O-mode: ``Ne_j = freq2den(f_j)``; X-mode: ``X + Y = 1`` gives
  ``fN² = f(f − f_H(h_j))`` with the gyrofrequency at the knot height);
* ``vh(f_i)`` depends only on the profile **below** ``h_i`` — the system
  is triangular, so the knots solve bottom-up, one at a time;
* for fixed lower knots, ``vh(f_i)`` is strictly increasing in ``h_i``
  (raising the reflection point both lengthens the path and shallows the
  density slope, and the group index exceeds 1 everywhere), so each
  1-D solve is a guaranteed bisection — no Jacobian, no step control, no
  local minima. A fixed bisection budget keeps every shape static: the
  whole inversion is one ``lax.scan`` over frequencies with a
  ``fori``-bisection per knot, each iteration evaluating the
  single-frequency forward operator on its stretched reflection grid.

A joint Levenberg–Marquardt on all K heights through ``jax.jacobian`` was
tried first and crawls: the near-peak rows make the least-squares
landscape violently nonlinear (|∂vh/∂h| explodes as f → foF2), shrinking
the trust region to nothing. The triangular structure is the fix, not
damping — the same insight behind every production true-height method.

The classical caveats apply unchanged: underlying ionization below the
first reflection is not sensed (the *starting problem* — a linear ramp
from a small seed density is assumed, and its retardation is absorbed by
the lowest knots), and E-valleys are invisible to a monotone
single-trace profile. :func:`retrieve_profile_joint` addresses both
POLAN-style — candidate start gaps and a parameterised valley insert
(``valley_f_mhz``/``valley_width_km``/``valley_depth``) selected by the
joint O+X rms.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .constants import G_P
from .forward import vh_and_mask
from .magnetoionic import freq2den, mode_multiplier

__all__ = ["retrieve_profile", "retrieve_profile_batch",
           "retrieve_profile_joint"]

# The lid above a trial knot must keep RISING: the regrid truncates the
# profile PEAK-EXCLUSIVE (ref :371-375), so a flat lid's single argmax node
# gets cut and the cutoff crossing vanishes — a rising wedge leaves many
# super-cutoff nodes in place.
_SEED_FRAC = 0.05       # floor plasma frequency = this × f_1 (start model)


def _check_inputs(f_sorted_hz, b_mag, mode_mult, n_passes, n_bisect):
    """Host-side validation shared by both entry points.

    Returns the effective ``n_bisect`` (capped at 24 under f32, where
    the midpoint update stalls at float resolution — see docstrings).
    """
    if n_passes < 1:
        raise ValueError("n_passes must be >= 1")
    if mode_mult < 0:
        # the X-mode knot relation fN² = f(f − fH) is only meaningful
        # above the gyrofrequency; sub-gyro samples would silently get
        # zero knot density and corrupt every knot above
        f_gyro_max = float(G_P * np.max(np.asarray(b_mag)))
        f_min = float(f_sorted_hz[0])
        if f_min <= f_gyro_max:
            raise ValueError(
                f"X-mode true-height inversion needs every frequency "
                f"above the gyrofrequency (min f = {f_min / 1e6:.3f} MHz "
                f"<= max fH = {f_gyro_max / 1e6:.3f} MHz) — drop the "
                f"sub-gyro samples")
    if jnp.asarray(1.0).dtype != jnp.float64:
        n_bisect = min(n_bisect, 24)
    return n_bisect


def _knot_density(f_hz, h, alt, b_mag, mode_mult):
    """Reflection density for one frequency (O: X=1; X: X+Y=1 at h)."""
    if mode_mult > 0:
        return freq2den(f_hz)
    f_gyro = G_P * jnp.interp(h, alt, b_mag)
    return freq2den(jnp.sqrt(jnp.maximum(f_hz * (f_hz - f_gyro), 0.0)))


@partial(jax.jit,
         static_argnames=("mode_mult", "n_points", "n_bisect", "n_passes",
                          "per_knot_mode", "valley_iv"))
def _retrieve_profile_core(f_sorted_hz, obs_sorted, alt, b_mag, b_psi,
                           mode_mult, n_points, n_bisect, n_passes,
                           start_gap, mm_seq=None, per_knot_mode=False,
                           valley_iv=None, valley_w=0.0, valley_d=0.0,
                           valley_ne=0.0):
    freq_mhz = f_sorted_hz / 1e6
    alt0, alt_top = alt[0], alt[-1]
    k = f_sorted_hz.shape[0]
    ne_floor = freq2den(_SEED_FRAC * f_sorted_hz[0])
    dmax = jnp.max(jnp.diff(alt))
    # knot ceiling: keep >= 2 grid nodes above any trial knot so the
    # peak-exclusive flat-extension cannot erase the cutoff crossing on
    # coarse grids; w is the final peak-wedge width for the same reason
    h_ceil = alt_top - 2.0 * dmax
    w = 3.0 * dmax
    if mm_seq is None:
        mm_seq = jnp.full((k,), float(mode_mult))

    # E-valley insert (round 5; POLAN-style): above the last E-region
    # echo (knot ``valley_iv``) the profile rises to the E-PEAK density
    # ``valley_ne`` (from the user's foE — strictly above every E echo's
    # cutoff, so no sounded frequency ever meets a flat shelf at its own
    # reflection density), dips by the fraction ``valley_d`` of it, and
    # returns over a total width ``valley_w`` km; the first F knot
    # anchors at the valley exit (h + valley_w, valley_ne) and every
    # later lamination inherits the frozen dip — its group retardation
    # is what the data actually senses. valley_iv is STATIC
    # (host-chosen from the echo densities); valley_w/valley_d are
    # traced so a candidate grid vmaps.
    valley_w = jnp.asarray(valley_w, float)
    valley_d = jnp.asarray(valley_d, float)
    valley_ne = jnp.asarray(valley_ne, float)
    if valley_iv is None:
        after_valley = jnp.zeros((k,))
    else:
        after_valley = jnp.zeros((k,)).at[int(valley_iv) + 1].set(1.0)

    if per_knot_mode:
        # joint O+X lamination: the mode multiplier is a per-knot datum
        # (scan xs), so the forward evaluation inside the bisection picks
        # its branch with lax.cond and the knot density uses the traced
        # multiplier. Each echo still maps to a KNOWN density at its
        # reflection height, so the triangular structure is unchanged.
        def vh_one(f_mhz_i, den, mm_i):
            def run(mm_static):
                vh, valid = vh_and_mask(f_mhz_i[None], den, b_mag, b_psi,
                                        alt, mode_mult=mm_static,
                                        n_points=n_points)
                return jnp.where(valid[0], vh[0], jnp.inf)
            return jax.lax.cond(mm_i > 0, lambda: run(1.0),
                                lambda: run(-1.0))

        def knot_density(f_hz_i, h, mm_i):
            f_gyro = G_P * jnp.interp(h, alt, b_mag)
            ne_x = freq2den(jnp.sqrt(jnp.maximum(
                f_hz_i * (f_hz_i - f_gyro), 0.0)))
            return jnp.where(mm_i > 0, freq2den(f_hz_i), ne_x)
    else:
        def vh_one(f_mhz_i, den, mm_i):
            del mm_i
            vh, valid = vh_and_mask(f_mhz_i[None], den, b_mag, b_psi, alt,
                                    mode_mult=mode_mult, n_points=n_points)
            return jnp.where(valid[0], vh[0], jnp.inf)

        def knot_density(f_hz_i, h, mm_i):
            del mm_i
            return _knot_density(f_hz_i, h, alt, b_mag, mode_mult)

    def place_knot(carry, xs):
        den_below, h_prev, ne_prev = carry
        f_hz_i, f_mhz_i, obs_i, gap, lid_prev, mm_i, av_i = xs
        first_above = av_i > 0.5          # first knot above the E-valley
        w_eff = jnp.where(first_above, valley_w, 0.0)

        def candidate(h):
            """Profile with the trial knot (h, ne_i) on top of den_below.

            The first knot's segment rises from the floor over ``gap`` km
            (the start model); later knots anchor at the previous knot
            (``gap`` is +inf for them). The first knot ABOVE the E-valley
            anchors at the valley exit (h_prev + valley_w, ne_prev) with
            the triangular dip filling the span — later knots inherit it
            through the frozen den_below. The lid above the trial knot
            uses the previous pass's slope toward the NEXT knot when
            available (NaN on the first pass), else continues the
            segment's slope — the lid slope sets where the regrid's
            interpolated cutoff crossing lands, i.e. the μ' tail just
            above the reflection point, so matching the final assembled
            profile matters.
            """
            ne_i = knot_density(f_hz_i, h, mm_i)
            anchor_h0 = jnp.maximum(h_prev, h - gap)
            anchor_ne0 = jnp.where(anchor_h0 > h_prev, ne_floor, ne_prev)
            anchor_h = jnp.where(first_above,
                                 jnp.minimum(h_prev + w_eff, h - 1e-3),
                                 anchor_h0)
            anchor_ne = jnp.where(first_above, valley_ne, anchor_ne0)
            slope = (ne_i - anchor_ne) / jnp.maximum(h - anchor_h, 1e-9)
            seg = anchor_ne + (alt - anchor_h) * slope
            # floor the lid slope so degenerate (near-duplicate-frequency)
            # knots still produce a rising wedge above the cutoff
            lid_slope = jnp.maximum(
                jnp.where(jnp.isfinite(lid_prev), lid_prev, slope),
                ne_i * 1e-6)
            lid = ne_i + lid_slope * (alt - h)
            # valley span: rise to the E peak over the first 15% of the
            # width, dip to (1 − D)·ne_V at the midpoint of the
            # remainder, return to ne_V at the exit
            ws = jnp.maximum(w_eff, 1e-9)
            h_pk = h_prev + 0.15 * ws
            h_bot = h_prev + 0.575 * ws
            u = alt - h_prev
            rise = ne_prev + (valley_ne - ne_prev) * u / (0.15 * ws)
            down = valley_ne * (1.0 - valley_d * (alt - h_pk)
                                / (h_bot - h_pk))
            up = valley_ne * (1.0 - valley_d
                              * jnp.clip((h_prev + ws - alt)
                                         / (ws - 0.575 * ws), 0.0, 1.0))
            vprof = jnp.where(alt <= h_pk, rise,
                              jnp.where(alt <= h_bot, down, up))
            mid = jnp.where(first_above, vprof, ne_floor)
            den = jnp.where(alt <= h_prev, den_below,
                            jnp.where(alt <= anchor_h, mid,
                                      jnp.where(alt <= h, seg, lid)))
            return den, ne_i

        # vh(h) is monotone increasing; vh >= h always (mu' >= 1), so the
        # observed virtual height bounds the true height from above. The
        # ceiling leaves >= 2 grid nodes above the knot (the regrid's
        # peak-exclusive truncation needs super-cutoff nodes to survive);
        # the hi >= lo floor keeps the bracket proper even when a
        # saturated predecessor sits at the ceiling — knots then stack
        # 1e-2 apart instead of inverting the bracket (which would feed
        # unsorted xp into the final jnp.interp).
        lo0 = h_prev + w_eff + 1e-2
        hi0 = jnp.maximum(jnp.clip(obs_i, lo0 + 1e-2, h_ceil),
                          lo0 + 1e-2)

        def bisect(_, bounds):
            lo, hi = bounds
            mid = 0.5 * (lo + hi)
            vh_mid = vh_one(f_mhz_i, candidate(mid)[0], mm_i)
            go_down = vh_mid > obs_i
            return (jnp.where(go_down, lo, mid),
                    jnp.where(go_down, mid, hi))

        lo, hi = jax.lax.fori_loop(0, n_bisect, bisect, (lo0, hi0))
        h_i = 0.5 * (lo + hi)
        den_i, ne_i = candidate(h_i)
        # freeze the profile below the new knot for the next laminations
        den_next = jnp.where(alt <= h_i, den_i, 0.0)
        return (den_next, h_i, ne_i), (h_i, ne_i)

    den0 = jnp.where(alt <= alt0, ne_floor, 0.0)
    gaps = jnp.full((k,), jnp.inf).at[0].set(start_gap)
    lid_slopes = jnp.full((k,), jnp.nan)
    for _ in range(n_passes):
        (_, _, _), (h, ne) = jax.lax.scan(
            place_knot, (den0, alt0, ne_floor),
            (f_sorted_hz, freq_mhz, obs_sorted, gaps, lid_slopes, mm_seq,
             after_valley))
        # refinement passes replace the continuation lid above knot i with
        # this pass's actual slope toward knot i+1 (last knot keeps NaN →
        # continuation)
        lid_slopes = jnp.concatenate(
            [jnp.diff(ne) / jnp.maximum(jnp.diff(h), 1e-9),
             jnp.full((1,), jnp.nan)])
        if valley_iv is not None:
            # the lid above the LAST E knot is the valley's rise to the
            # E peak, not the inter-knot slope across the whole valley —
            # the μ' tail above that echo's reflection lives in the rise
            iv = int(valley_iv)
            rise_slope = ((valley_ne - ne[iv])
                          / jnp.maximum(0.15 * valley_w, 1e-9))
            lid_slopes = lid_slopes.at[iv].set(jnp.where(
                valley_w > 1e-6,
                jnp.maximum(rise_slope, ne[iv] * 1e-6),
                lid_slopes[iv]))

    # final profile: start ramp + all knots + a peak wedge wide enough to
    # survive the peak-exclusive truncation on the caller's grid, then a
    # descending (unsensed, purely cosmetic) topside. Each assembled node
    # is forced above its predecessor so jnp.interp always sees sorted xp
    # even when saturated knots stacked at the ceiling.
    h_peak = jnp.maximum(jnp.minimum(h[-1] + w, alt_top - 1e-3),
                         h[-1] + 1e-3)
    slope_top = jnp.maximum((ne[-1] - ne[-2])
                            / jnp.maximum(h[-1] - h[-2], 1e-9),
                            ne[-1] * 1e-6)
    anchor0 = jnp.clip(h[0] - start_gap, alt0 + 1e-3, h[0] - 1e-3)
    if valley_iv is None:
        h_mid, ne_mid = h, ne
    else:
        # splice the valley nodes (E peak, dip bottom, exit) between the
        # last E knot and the first F knot; nodes are clipped just below
        # the next knot so xp stays sorted for any candidate width
        iv = int(valley_iv)
        lim = h[iv + 1]
        v_pk = jnp.clip(h[iv] + 0.15 * valley_w, h[iv] + 1e-3, lim - 3e-3)
        v_bot = jnp.clip(h[iv] + 0.575 * valley_w, v_pk + 1e-3, lim - 2e-3)
        v_exit = jnp.clip(h[iv] + valley_w, v_bot + 1e-3, lim - 1e-3)
        ne_v = jnp.asarray(valley_ne, float)
        h_mid = jnp.concatenate([h[:iv + 1], v_pk[None], v_bot[None],
                                 v_exit[None], h[iv + 1:]])
        ne_mid = jnp.concatenate([ne[:iv + 1], ne_v[None],
                                  (ne_v * (1.0 - valley_d))[None],
                                  ne_v[None], ne[iv + 1:]])
    h_all = jnp.concatenate([alt[:1] - 1e-6, anchor0[None], h_mid,
                             h_peak[None],
                             jnp.maximum(alt[-1:] + 1e-3,
                                         h_peak[None] + 1e-3)])
    ne_all = jnp.concatenate([ne_floor[None], ne_floor[None], ne_mid,
                              (ne[-1] + slope_top * (h_peak - h[-1]))[None],
                              ne[-1:] * 0.5])
    den_fit = jnp.interp(alt, h_all, ne_all)
    if per_knot_mode:
        vh_o, val_o = vh_and_mask(freq_mhz, den_fit, b_mag, b_psi, alt,
                                  mode_mult=1.0, n_points=n_points)
        vh_x, val_x = vh_and_mask(freq_mhz, den_fit, b_mag, b_psi, alt,
                                  mode_mult=-1.0, n_points=n_points)
        vh_fit = jnp.where(mm_seq > 0,
                           jnp.where(val_o, vh_o, jnp.nan),
                           jnp.where(val_x, vh_x, jnp.nan))
    else:
        vh_fit, valid = vh_and_mask(freq_mhz, den_fit, b_mag, b_psi, alt,
                                    mode_mult=mode_mult, n_points=n_points)
        vh_fit = jnp.where(valid, vh_fit, jnp.nan)
    return h, ne, den_fit, vh_fit


def retrieve_profile(f_in, vh_obs, alt, b_mag, b_psi, mode="O",
                     n_points=200, n_bisect=36, n_passes=2,
                     start_gap_km=20.0):
    """Invert an ionogram into a monotone Ne(h) profile (true height).

    Args mirror :func:`pyrayhf_tpu.retrieval.minimize_parameters`
    (``f_in`` in MHz like the retrieval module, ``vh_obs`` in km;
    non-finite pairs are dropped). Returns a dict:

    * ``h_knots_km`` [K] — retrieved reflection (true) height of each
      observed frequency, the lamination unknowns;
    * ``ne_knots_m3`` [K] — plasma density at each knot (from theory);
    * ``den_fit`` [N_alt] — the fitted profile on ``alt``;
    * ``vh_fit`` [K] — the model ionogram at the solution;
    * ``rms_km`` — final RMS vh misfit;
    * ``f_sorted_hz`` [K] — the frequencies actually fitted (ascending).

    ``n_bisect`` bisection steps resolve each height to
    ``(vh_obs − h_prev) / 2**n_bisect`` km (36 ⇒ sub-micrometre under
    f64 — the residual misfit measures model-class error, not solver
    error). Under default-f32 JAX the midpoint update stalls at float32
    resolution after ~24 steps, so ``n_bisect`` is capped at 24 there
    (every step past the stall would re-run the full single-frequency
    forward for zero refinement).
    ``n_passes`` lamination sweeps: passes beyond the first replace the
    slope-continuation lid above each trial knot with the previous pass's
    actual inter-knot slope, tightening the μ' tail geometry at each
    reflection (in-model-class ionograms refit to ≲0.1 km rms with 2).

    ``start_gap_km`` is the start model: ionization is assumed to rise
    from a negligible floor over this many km below the first reflection
    height. Vertical ionograms cannot sense underlying/valley ionization
    (the classical starting problem), so this assumption — not the solver
    — sets the absolute height accuracy of the lowest knots; E-valleys
    bias the heights above the valley upward, exactly as in every
    true-height method since POLAN. Pass an ARRAY of candidate gaps to
    laminate every candidate in one vmapped launch and keep the smallest-
    rms fit (the result then also carries ``start_gap_km`` chosen and
    ``rms_by_gap_km``) — note a single-mode trace constrains the gap only
    weakly (the knots absorb it); see :func:`retrieve_profile_joint`.
    """
    f = jnp.asarray(f_in, dtype=float) * 1e6
    obs = jnp.asarray(vh_obs, dtype=float)
    ok = jnp.isfinite(f) & jnp.isfinite(obs)
    order = jnp.argsort(jnp.where(ok, f, jnp.inf))
    k = int(jnp.sum(ok))
    if k < 2:
        raise ValueError("retrieve_profile needs at least 2 finite "
                         "(frequency, virtual height) samples")
    f_sorted = f[order][:k]
    obs_sorted = obs[order][:k]
    alt = jnp.asarray(alt, dtype=float)
    mode_mult = mode_multiplier(mode)
    n_bisect = _check_inputs(f_sorted, b_mag, mode_mult, n_passes,
                             n_bisect)
    core = partial(_retrieve_profile_core,
                   mode_mult=mode_mult, n_points=n_points,
                   n_bisect=n_bisect, n_passes=n_passes)
    run = lambda g: core(f_sorted, obs_sorted, alt,
                         jnp.asarray(b_mag, dtype=float),
                         jnp.asarray(b_psi, dtype=float), start_gap=g)
    sel = _run_gap_candidates(run, start_gap_km, obs_sorted)
    h, ne, den_fit, vh_fit, extra = sel
    rms = jnp.sqrt(jnp.nanmean((vh_fit - obs_sorted) ** 2))
    out = {"h_knots_km": h, "ne_knots_m3": ne, "den_fit": den_fit,
           "vh_fit": vh_fit, "rms_km": rms, "f_sorted_hz": f_sorted}
    out.update(extra)
    return out


def _run_gap_candidates(run, start_gap_km, obs_sorted):
    """Run the lamination for one start gap or a candidate grid.

    A scalar gap is a single core call; an array laminates every
    candidate in one ``vmap`` and keeps the smallest-rms fit. Returns
    (h, ne, den_fit, vh_fit, extra-dict).
    """
    if np.ndim(start_gap_km) == 0:
        out = run(jnp.asarray(start_gap_km, float))
        return (*out, {"start_gap_km": float(start_gap_km)})
    gaps = jnp.asarray(start_gap_km, dtype=float)
    h_g, ne_g, den_g, vh_g = jax.vmap(run)(gaps)
    rms_g = jnp.sqrt(jnp.nanmean((vh_g - obs_sorted[None, :]) ** 2,
                                 axis=1))
    best = int(jnp.nanargmin(rms_g))
    return (h_g[best], ne_g[best], den_g[best], vh_g[best],
            {"start_gap_km": float(gaps[best]),
             "rms_by_gap_km": np.asarray(rms_g)})


def _run_joint_candidates(run, gaps, widths, depths, obs_sorted):
    """Grid-search (start gap × valley width × valley depth).

    Each argument may be a scalar or a 1-D candidate array; the full
    product laminates in ONE vmapped launch and the smallest-rms
    combination wins. Returns (h, ne, den_fit, vh_fit, extra-dict) like
    :func:`_run_gap_candidates`.
    """
    g, w, d = (np.atleast_1d(np.asarray(a, dtype=float))
               for a in (gaps, widths, depths))
    G, W, D = np.meshgrid(g, w, d, indexing="ij")
    cand = jnp.asarray(np.stack([G.ravel(), W.ravel(), D.ravel()], axis=1))
    h_g, ne_g, den_g, vh_g = jax.vmap(
        lambda c: run(c[0], c[1], c[2]))(cand)
    rms_g = jnp.sqrt(jnp.nanmean((vh_g - obs_sorted[None, :]) ** 2,
                                 axis=1))
    best = int(jnp.nanargmin(rms_g))
    return (h_g[best], ne_g[best], den_g[best], vh_g[best],
            {"start_gap_km": float(cand[best, 0]),
             "valley_width_km": float(cand[best, 1]),
             "valley_depth": float(cand[best, 2]),
             "rms_by_candidate_km": np.asarray(rms_g),
             "candidates": np.asarray(cand)})


def retrieve_profile_joint(f_o_in, vh_o, f_x_in, vh_x, alt, b_mag, b_psi,
                           n_points=200, n_bisect=36, n_passes=2,
                           start_gap_km=20.0, valley_f_mhz=None,
                           valley_width_km=0.0, valley_depth=0.0):
    """Joint O+X true-height inversion (round 4; beyond the reference).

    Real ionogram reduction uses both magnetoionic traces at once: each
    echo — O or X — maps to a KNOWN plasma density at its reflection
    height (O: X = 1 ⇒ Ne = freq2den(f); X: X + Y = 1 ⇒
    fN² = f(f − f_H(h))), so interleaving the two traces **by knot
    density** preserves the triangular lamination structure; the
    per-knot mode switches the forward evaluation inside each bisection
    (``lax.cond`` — see ``_retrieve_profile_core(per_knot_mode=True)``).
    The X echoes are ORDERED with f_H evaluated at the observed virtual
    height (an upper bound of the true height; f_H varies slowly over
    that span), while the solve itself uses f_H at the trial knot.

    Because the two traces sample the same underlying ionization with
    different group retardation, the joint solve constrains what a
    single trace cannot: the **start model**. Pass an array of candidate
    ``start_gap_km`` values — every candidate laminates in one vmapped
    launch, and the gap with the smallest joint rms wins. With a single
    trace the knots absorb almost any assumed gap (rms(gap) is nearly
    flat — tested); the O−X disagreement gives the joint rms a minimum
    near the true gap.

    **E-valley (round 5; POLAN-style).** A monotone lamination cannot
    represent the valley above the E peak, so its group retardation
    biases every F-region height upward. Pass ``valley_f_mhz`` (≈ foE —
    in practice read off the trace cusp) to anchor a triangular valley
    insert immediately above the last echo reflecting at or below that
    plasma frequency: the profile dips to ``(1 − valley_depth)`` of the
    E-peak density over ``valley_width_km`` km and returns, and the
    first F knot anchors at the valley exit. Width and depth accept
    candidate ARRAYS like ``start_gap_km``: every (gap, width, depth)
    combination laminates in one vmapped launch and the smallest joint
    rms wins (the result then carries the chosen values plus
    ``rms_by_candidate_km``/``candidates``).

    Ambiguity limits (classical, Titheridge 1985/POLAN): a vertical
    ionogram senses mainly the valley's integrated density *deficit*
    (≈ width × depth × ne_E / 2), so width and depth are individually
    soft — the joint O−X tension resolves the deficit, not the shape.
    Recovery of the deficit is tested to ~35% and of the post-valley
    knot heights to ~2 km in ``tests/test_true_height.py``; treat the
    reported width/depth split as a convention, not a measurement.

    Args as :func:`retrieve_profile` with the trace split into
    ``(f_o_in [MHz], vh_o)`` and ``(f_x_in [MHz], vh_x)``; either may be
    empty. Returns the :func:`retrieve_profile` dict plus
    ``mode_knots`` (+1 = O, −1 = X per fitted echo), ``start_gap_km``
    (chosen), and ``rms_by_gap_km`` when a candidate array was given.
    """
    f_o = np.atleast_1d(np.asarray(f_o_in, dtype=float)) * 1e6
    o_o = np.atleast_1d(np.asarray(vh_o, dtype=float))
    f_x = np.atleast_1d(np.asarray(f_x_in, dtype=float)) * 1e6
    o_x = np.atleast_1d(np.asarray(vh_x, dtype=float))
    ok_o = np.isfinite(f_o) & np.isfinite(o_o)
    ok_x = np.isfinite(f_x) & np.isfinite(o_x)
    f_o, o_o = f_o[ok_o], o_o[ok_o]
    f_x, o_x = f_x[ok_x], o_x[ok_x]
    if f_o.size + f_x.size < 2:
        raise ValueError("retrieve_profile_joint needs at least 2 finite "
                         "(frequency, virtual height) samples across the "
                         "two traces")
    alt_j = jnp.asarray(alt, dtype=float)
    bm = np.asarray(b_mag, dtype=float)
    if f_x.size:
        n_bisect = _check_inputs(np.sort(f_x), b_mag, -1.0, n_passes,
                                 n_bisect)
    else:
        n_bisect = _check_inputs(np.sort(f_o), b_mag, 1.0, n_passes,
                                 n_bisect)

    # interleave by (approximate) knot density — O exact, X with f_H at
    # the observed virtual height (ordering only; the solve re-evaluates
    # f_H at the trial knot)
    ne_o = np.asarray(freq2den(f_o))
    fH_x = G_P * np.interp(np.clip(o_x, float(alt_j[0]), float(alt_j[-1])),
                           np.asarray(alt_j), bm)
    ne_x = np.asarray(freq2den(np.sqrt(np.maximum(
        f_x * (f_x - fH_x), 0.0))))
    order = np.argsort(np.concatenate([ne_o, ne_x]))
    f_s = jnp.asarray(np.concatenate([f_o, f_x])[order])
    obs_s = jnp.asarray(np.concatenate([o_o, o_x])[order])
    mm_s = jnp.asarray(np.concatenate([np.ones(f_o.size),
                                       -np.ones(f_x.size)])[order])

    valley_iv = None
    if valley_f_mhz is not None:
        # last interleaved echo whose (approximate) knot density is at or
        # below the valley-anchor plasma frequency; static by the time
        # the core traces
        ne_anchor = float(freq2den(float(valley_f_mhz) * 1e6))
        ne_interleaved = np.concatenate([ne_o, ne_x])[order]
        valley_iv = int(np.searchsorted(ne_interleaved,
                                        ne_anchor * (1 + 1e-9)) - 1)
        if valley_iv < 0 or valley_iv >= ne_interleaved.size - 1:
            raise ValueError(
                "valley_f_mhz must sit strictly between the lowest and "
                "highest echo plasma frequencies (no E echo below it, or "
                "no F echo above it)")
        if ne_interleaved[valley_iv] > 0.995 * ne_anchor:
            # a shelf at (nearly) a sounded cutoff density gives that
            # echo unbounded group retardation — degenerate by physics,
            # not by implementation
            raise ValueError(
                "valley_f_mhz must exceed the highest E-region echo's "
                "plasma frequency by a finite margin (>~0.25%); got an "
                "echo within 0.5% of the valley anchor density")

    def run(g, vw, vd):
        return _retrieve_profile_core(
            f_s, obs_s, alt_j, jnp.asarray(b_mag, dtype=float),
            jnp.asarray(b_psi, dtype=float), mode_mult=0.0,
            n_points=n_points, n_bisect=n_bisect, n_passes=n_passes,
            start_gap=g, mm_seq=mm_s, per_knot_mode=True,
            valley_iv=valley_iv, valley_w=vw, valley_d=vd,
            valley_ne=0.0 if valley_iv is None else ne_anchor)

    if valley_iv is None:
        h, ne, den_fit, vh_fit, extra = _run_gap_candidates(
            lambda g: run(g, 0.0, 0.0), start_gap_km, obs_s)
    else:
        h, ne, den_fit, vh_fit, extra = _run_joint_candidates(
            run, start_gap_km, valley_width_km, valley_depth, obs_s)
    rms = jnp.sqrt(jnp.nanmean((vh_fit - obs_s) ** 2))
    out = {"h_knots_km": h, "ne_knots_m3": ne, "den_fit": den_fit,
           "vh_fit": vh_fit, "rms_km": rms, "f_sorted_hz": f_s,
           "mode_knots": mm_s}
    out.update(extra)
    return out


def retrieve_profile_batch(f_in, vh_obs_batch, alt, b_mag, b_psi, mode="O",
                           n_points=200, n_bisect=36, n_passes=2,
                           start_gap_km=20.0):
    """Batched true-height inversion: ``vh_obs_batch`` [B, K] → stacked
    results (one ``vmap``ped lamination scan, single XLA launch).

    All B ionograms share the frequency grid ``f_in`` [MHz] (the usual
    campaign layout) and must be all-finite — pre-filter with the
    single-ionogram entry point if traces have gaps.
    """
    f = jnp.asarray(f_in, dtype=float) * 1e6
    obs = jnp.asarray(vh_obs_batch, dtype=float)
    if f.shape[0] < 2:
        raise ValueError("retrieve_profile_batch needs at least 2 "
                         "(frequency, virtual height) samples")
    if not (np.all(np.isfinite(np.asarray(f)))
            and np.all(np.isfinite(np.asarray(obs)))):
        raise ValueError("retrieve_profile_batch requires all-finite "
                         "frequencies and traces (pre-filter gapped "
                         "traces with retrieve_profile)")
    order = jnp.argsort(f)
    f_sorted = f[order]
    obs_sorted = obs[:, order]
    alt = jnp.asarray(alt, dtype=float)
    mode_mult = mode_multiplier(mode)
    n_bisect = _check_inputs(f_sorted, b_mag, mode_mult, n_passes,
                             n_bisect)
    core = partial(_retrieve_profile_core,
                   mode_mult=mode_mult, n_points=n_points,
                   n_bisect=n_bisect, n_passes=n_passes,
                   start_gap=jnp.asarray(start_gap_km, float))
    h, ne, den_fit, vh_fit = jax.vmap(
        lambda o: core(f_sorted, o, alt,
                       jnp.asarray(b_mag, dtype=float),
                       jnp.asarray(b_psi, dtype=float)))(obs_sorted)
    rms = jnp.sqrt(jnp.nanmean((vh_fit - obs_sorted) ** 2, axis=1))
    return {"h_knots_km": h, "ne_knots_m3": ne, "den_fit": den_fit,
            "vh_fit": vh_fit, "rms_km": rms, "f_sorted_hz": f_sorted}
