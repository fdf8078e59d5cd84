"""Per-frequency stretched vertical grid and profile regridding.

TPU-first re-design of the reference regridder
(``regrid_to_nonuniform_grid``, ``/root/reference/PyRayHF/library.py:324-438``):

* the data-dependent profile truncation at ``argmax(n_e)`` (ref :371-375) is
  replaced by *flat extension* — entries at/above the peak index are clamped to
  the last pre-peak value, which leaves every interpolation result identical
  while keeping shapes static for XLA;
* the per-row ``np.apply_along_axis(np.interp, ...)`` reflection-height root
  solve (ref :403-404) becomes one vectorised ``vmap`` of ``jnp.interp`` over
  the frequency axis;
* ``np.maximum.accumulate`` → ``jax.lax.cummax``;
* the three 1-D resampling interps (ref :424-426) become batched
  ``jnp.interp`` gathers.

Reference quirks replicated on purpose:
* the ``dh`` kwarg is shadowed — the effective reflection-height backoff is
  always 1e-6 km (ref :378);
* the returned grid distance row ends with a trailing ``dh`` entry
  (ref :415-416).
"""

from functools import partial

import jax
import jax.numpy as jnp

from .magnetoionic import find_X, find_Y, mode_multiplier

__all__ = ["smooth_nonuniform_grid", "regrid_to_nonuniform_grid", "regrid_core"]

# Effective backoff below the reflection height [km] (ref library.py:378).
_DH_BACKOFF = 1e-6


def smooth_nonuniform_grid(start, end, n_points, sharpness):
    """Exp-stretched grid multiplier in [start, end], fine near ``end``.

    Parity with ref library.py:296-321.
    """
    u = jnp.linspace(0.0, 1.0, n_points)
    flipped = 1.0 - u
    factor = (jnp.exp(sharpness * flipped) - 1.0) / (jnp.exp(sharpness) - 1.0)
    return 1.0 - (start + (end - start) * factor)


def _flat_extend(arr, ind_max):
    """Clamp ``arr[j]`` for j >= ind_max to ``arr[ind_max-1]`` (static shape).

    Equivalent to the reference's physical truncation of the profile at the
    F2-peak index, without a dynamic slice.
    """
    idx = jnp.arange(arr.shape[-1])
    last = arr[..., jnp.maximum(ind_max - 1, 0), None]  # keepdims gather
    return jnp.where(idx < ind_max, arr, last)


@partial(jax.jit, static_argnames=("mode_mult", "n_points", "masked"))
def regrid_core(f, n_e, b, bpsi, aalt, mode_mult, n_points, masked=False):
    """Regrid a profile onto per-frequency stretched grids.

    Parameters
    ----------
    f : [N_freq] wave frequencies [Hz]
    n_e, b, bpsi, aalt : [N_alt] profile arrays
    mode_mult : static float, +1 (O) / -1 (X)
    n_points : static int, points per stretched grid

    Returns
    -------
    dict of [N_freq, n_points] arrays: freq, den, bmag, bpsi, dist, alt,
    crit_height, ind — same keys/shapes as the reference (ref :430-438).
    """
    f = jnp.asarray(f, dtype=float)
    n_e = jnp.asarray(n_e, dtype=float)
    b = jnp.asarray(b, dtype=float)
    bpsi = jnp.asarray(bpsi, dtype=float)
    aalt = jnp.asarray(aalt, dtype=float)

    multiplier = smooth_nonuniform_grid(0.0, 1.0, n_points, 10.0)

    # Flat-extend the profile at the density peak (== ref truncation :371-375).
    ind_max = jnp.argmax(n_e)
    n_e_t = _flat_extend(n_e, ind_max)
    b_t = _flat_extend(b, ind_max)
    bpsi_t = _flat_extend(bpsi, ind_max)
    aalt_t = _flat_extend(aalt, ind_max)

    # X, X+Y on the [N_freq, N_alt] tile; monotonic cutoff functions.
    f2 = f[:, None]
    aX = find_X(n_e_t[None, :], f2)
    aY = find_Y(f2, b_t[None, :])
    if mode_mult > 0:
        fcrit = jax.lax.cummax(aX, axis=1)
    else:
        fcrit = jax.lax.cummax(aX + aY, axis=1)
    # Flat-extend the cutoff too, so trailing ties do not create a spurious
    # crossing beyond the peak (prefix cummax is unaffected).
    fcrit = _flat_extend(fcrit, ind_max)

    # Rows that actually reach the cutoff (fcrit monotone ⇒ check last entry).
    valid = fcrit[:, -1] >= 1.0

    # Reflection-height root solve: one interp per frequency row (ref :403-404).
    crit = jax.vmap(lambda row: jnp.interp(1.0, row, aalt_t))(fcrit)
    if masked:
        # gradient-safe: escaped rows get a finite placeholder height so no
        # NaN ever enters the interp jacobians (0·NaN poisoning); callers
        # mask with the returned 'row_ok'.
        crit = jnp.where(valid, crit, aalt_t[-1]) - _DH_BACKOFF
    else:
        crit = jnp.where(valid, crit - _DH_BACKOFF, jnp.nan)

    # Stretched altitude grid per frequency and its spacing.
    new_alt = multiplier[None, :] * (crit[:, None] - aalt[0]) + aalt[0]
    dist = jnp.concatenate(
        [jnp.diff(new_alt, axis=1),
         jnp.full((f.shape[0], 1), _DH_BACKOFF, dtype=new_alt.dtype)], axis=1)

    # Resample the (flat-extended) profile onto the stretched grids.
    # np.interp propagates NaN queries; jnp.interp clamps them — restore the
    # reference NaN semantics explicitly (invalid rows must stay NaN).
    alt_ok = jnp.isfinite(new_alt)
    def _interp(fp):
        return jnp.where(alt_ok, jnp.interp(new_alt, aalt_t, fp), jnp.nan)
    den_mod = _interp(n_e_t)
    bmag_mod = _interp(b_t)
    bpsi_mod = _interp(bpsi_t)

    freq_mod = jnp.broadcast_to(f[:, None], new_alt.shape)
    ind = jnp.broadcast_to(jnp.arange(n_points)[None, :], new_alt.shape)
    crit2d = jnp.broadcast_to(crit[:, None], new_alt.shape)

    out = {"freq": freq_mod, "den": den_mod, "bmag": bmag_mod,
           "bpsi": bpsi_mod, "dist": dist, "alt": new_alt,
           "crit_height": crit2d, "ind": ind}
    if masked:
        out["row_ok"] = valid
    return out


def regrid_to_nonuniform_grid(f, n_e, b, bpsi, aalt, mode="O",
                              n_points=200, dh=1e-6):
    """Reference-compatible wrapper (ref library.py:324-438).

    ``dh`` is accepted but ignored — the reference shadows it to 1e-6 (:378).
    """
    del dh
    return regrid_core(jnp.asarray(f), n_e, b, bpsi, aalt,
                       mode_mult=mode_multiplier(mode), n_points=n_points)
