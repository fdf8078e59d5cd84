"""MUF estimation by transmission-curve scaling (beyond the reference).

The reference ships the oblique→vertical secant-law transform
(``oblique_to_vertical``, ref ``library.py:2697-2742``) but not its
inverse — the classic ionogram-scaling workflow: take a measured (or
synthesised) VERTICAL ionogram h'(f_v), map every point onto the oblique
frequency that the same reflection supports over a link of length D
(the "transmission curve" construction), and read the maximum usable
frequency MUF(D) as the largest such frequency. This module provides

* :func:`vertical_to_oblique` — the exact algebraic inverse of the
  reference's curvature-corrected secant law, and
* :func:`muf_from_vertical_ionogram` / :func:`muf_from_profile` — the
  scaling product, vectorised over the whole trace (and batchable over
  profile stacks with ``jax.vmap``).

Cross-validated against the full ray-traced link MUF from
:func:`pyrayhf_tpu.oblique.synthesize_oblique_ionogram` in
``tests/test_muf.py``.
"""

import jax
import jax.numpy as jnp

from .constants import R_E

__all__ = ["vertical_to_oblique", "muf_from_vertical_ionogram",
           "muf_from_profile", "muf_map"]


def vertical_to_oblique(freq_vertical_mhz, height_virtual_km, range_km,
                        R_E_km=R_E):
    """Equivalent oblique frequency and group path for a vertical echo.

    Exact inverse of :func:`pyrayhf_tpu.geodesy.oblique_to_vertical`
    (curvature-corrected secant law, ref ``library.py:2697-2742``): the
    equivalent-triangle geometry with the mirror at
    h_eff = h'_v + R_E(1 − cos(D/2R_E)) gives

        tanφ = (D/2) / h_eff,   f_ob = f_v / cosφ,   p' = D / sinφ.

    Returns ``(freq_oblique_mhz, group_path_km)``; NaN inputs (escaped
    vertical echoes) propagate to NaN outputs.
    """
    hv = jnp.asarray(height_virtual_km, dtype=float)
    fv = jnp.asarray(freq_vertical_mhz, dtype=float)
    D = jnp.asarray(range_km, dtype=float)
    theta = (D / 2.0) / R_E_km
    h_eff = hv + R_E_km * (1.0 - jnp.cos(theta))
    phi = jnp.arctan2(D / 2.0, h_eff)
    freq_oblique_mhz = fv / jnp.cos(phi)
    group_path_km = D / jnp.sin(phi)
    return freq_oblique_mhz, group_path_km


def muf_from_vertical_ionogram(freq_mhz, vh_km, range_km, R_E_km=R_E):
    """MUF(D) [MHz] by transmission-curve scaling of a vertical ionogram.

    ``freq_mhz``/``vh_km``: the vertical trace (NaN above foF2, as the
    forward operator emits). Every finite point maps to its equivalent
    oblique frequency over the ``range_km`` link; the MUF is the maximum.
    Low virtual heights support larger secants, so the MUF point
    typically sits just below the critical frequency where h'(f) has not
    yet ballooned — the classic nose geometry.
    """
    f_ob, _ = vertical_to_oblique(freq_mhz, vh_km, range_km, R_E_km=R_E_km)
    ok = jnp.isfinite(f_ob)
    return jnp.where(jnp.any(ok), jnp.nanmax(jnp.where(ok, f_ob, -jnp.inf)),
                     jnp.nan)


def _default_freq_grid(den, bmag, mode):
    """0.1 MHz grid whose TOP clears the profile's own critical frequency.

    A fixed 25 MHz ceiling silently truncates the vertical trace (and so
    underestimates the MUF) for solar-max profiles with foF2 near or
    above it; derive the top from 1.1× the mode's cutoff instead
    (O: foF2; X: foF2 + f_ce/2), never below the old 25 MHz so ordinary
    profiles keep one compiled shape.
    """
    import numpy as np
    fo = float(np.sqrt(max(float(np.nanmax(np.asarray(den))), 0.0))
               * 8.97866275 / 1e6)                      # foF2 [MHz]
    top = 1.1 * fo
    if mode != "O":
        from .constants import G_P
        top += 0.55 * float(np.nanmax(np.asarray(bmag))) * G_P / 1e6
    return jnp.arange(0.1, max(25.0, top), 0.1)


def muf_from_profile(range_km, den, bmag, bpsi, alt_km, mode="O",
                     n_points=200, freq_mhz=None, R_E_km=R_E):
    """MUF(D) directly from an electron-density profile.

    Synthesises the vertical ionogram with
    :func:`pyrayhf_tpu.vertical_forward_operator` on ``freq_mhz``
    (default: 0.1 MHz steps up to max(25 MHz, 1.1× the profile's own
    critical frequency) — see :func:`_default_freq_grid`) and scales it.
    ``range_km`` may be an array — the scan over link distances is one
    broadcast.
    """
    from .forward import vertical_forward_operator

    if freq_mhz is None:
        freq_mhz = _default_freq_grid(den, bmag, mode)
    freq_mhz = jnp.asarray(freq_mhz, dtype=float)
    vh = vertical_forward_operator(freq_mhz, den, bmag, bpsi, alt_km,
                                   mode=mode, n_points=n_points)
    D = jnp.atleast_1d(jnp.asarray(range_km, dtype=float))
    muf = jax.vmap(lambda d: muf_from_vertical_ionogram(
        freq_mhz, vh, d, R_E_km=R_E_km))(D)
    return muf[0] if jnp.ndim(range_km) == 0 else muf


def muf_map(range_km, den, bmag, bpsi, alt_km, mode="O", n_points=200,
            freq_mhz=None, R_E_km=R_E, engine="auto"):
    """MUF(D) over a PROFILE BATCH — e.g. a global grid → a MUF map.

    ``den``/``bmag``/``bpsi``: [B, N_alt] profile stacks (flatten a
    lat×lon grid, or the columns of a
    :func:`pyrayhf_tpu.envgen.generate_input_3D` volume); ``alt_km``
    a shared grid. ``range_km`` scalar or [D]. Returns [B] or [D, B]
    MUFs. The whole map is two launches: one batched forward operator
    (``engine`` forwarded — the Pallas kernel on TPU) and one broadcast
    transmission-curve scaling.
    """
    from .forward import vertical_forward_operator_batch

    if freq_mhz is None:
        freq_mhz = _default_freq_grid(den, bmag, mode)
    freq_mhz = jnp.asarray(freq_mhz, dtype=float)
    vh = vertical_forward_operator_batch(freq_mhz, den, bmag, bpsi,
                                         alt_km, mode=mode,
                                         n_points=n_points, engine=engine)
    D = jnp.atleast_1d(jnp.asarray(range_km, dtype=float))
    muf = jax.vmap(lambda d: jax.vmap(
        lambda v: muf_from_vertical_ionogram(freq_mhz, v, d,
                                             R_E_km=R_E_km))(vh))(D)
    return muf[0] if jnp.ndim(range_km) == 0 else muf
