"""Oblique-ionogram synthesis: the T→R homing problem, batched.

New capability beyond the reference: PyRayHF users reconstruct oblique
ionograms by hand-scanning elevations with single-ray tracer calls (its
tutorials trace individual rays; `oblique_to_vertical`, ref
``library.py:2697-2742``, converts the result). Here the whole
(frequency × elevation) fan runs as ONE batched launch
(:func:`pyrayhf_tpu.snell.trace_rays_cartesian_snells` /
``..._spherical_snells``) and the landing-range crossings of the target
ground range are found vectorised — low and high rays per frequency, with
group delays interpolated at the crossing elevations.

Conventions:
* the LOW ray is the first elevation (scanning upward) whose landing
  range crosses the target from above (ranges shrink as elevation grows
  below the MUF nose); the HIGH ray is the last such crossing;
* frequencies whose fan never reaches the target range (above the MUF
  for that range) return NaN — the nose of the oblique ionogram.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .snell import trace_rays_cartesian_snells, trace_rays_spherical_snells

__all__ = ["synthesize_oblique_ionogram"]


def _crossings(range_e, delay_e, elev, target, max_jump, delay_min):
    """Low/high-ray delays+elevations from one frequency's elevation fan.

    ``range_e``/``delay_e``: [E] landing range / group delay per elevation
    (NaN where the ray escapes); finds sign changes of (range − target)
    between consecutive valid elevations and linearly interpolates the
    delay. Two spurious-crossing filters:

    * pairs whose landing range JUMPS by more than ``max_jump`` are
      layer-transition discontinuities (e.g. E-hop → F-hop), not real
      crossings — interpolating across them would invent a ray;
    * the interpolated delay must be ≥ ``delay_min`` (the straight-line
      light time of the link; μ' ≥ 1, so every physical ray is slower) —
      this catches transitions the elevation sampling smears into
      several sub-``max_jump`` steps.

    Returns (delay_low, delay_high, elev_low, elev_high).
    """
    d = range_e - target
    ok = jnp.isfinite(d)
    okpair = ok[:-1] & ok[1:]
    continuous = jnp.abs(range_e[1:] - range_e[:-1]) <= max_jump
    cross = okpair & continuous \
        & (jnp.sign(d[:-1]) * jnp.sign(d[1:]) <= 0.0) \
        & ((d[:-1] != 0.0) | (d[1:] != 0.0))

    # interpolate every pair, then filter on physicality
    d0, d1 = d[:-1], d[1:]
    t = jnp.where(d1 != d0, d0 / jnp.where(d1 != d0, d0 - d1, 1.0), 0.0)
    t = jnp.clip(t, 0.0, 1.0)
    dl_pair = delay_e[:-1] + t * (delay_e[1:] - delay_e[:-1])
    el_pair = elev[:-1] + t * (elev[1:] - elev[:-1])
    valid = cross & (dl_pair >= delay_min)
    any_cross = jnp.any(valid)

    first = jnp.argmax(valid)
    last = d.shape[0] - 2 - jnp.argmax(valid[::-1])
    nan = jnp.nan
    return (jnp.where(any_cross, dl_pair[first], nan),
            jnp.where(any_cross, dl_pair[last], nan),
            jnp.where(any_cross, el_pair[first], nan),
            jnp.where(any_cross, el_pair[last], nan))


def synthesize_oblique_ionogram(f0s_hz, ground_range_km, alt_km, Ne, Babs,
                                bpsi, mode="O", geometry="cartesian",
                                n_elev=512, elev_min_deg=5.0,
                                elev_max_deg=85.0,
                                max_range_jump_km=200.0):
    """Oblique ionogram for a link of length ``ground_range_km``.

    Traces the full (frequency × elevation) Snell fan in one launch and
    returns, per frequency, the low- and high-ray group delays [s] and
    launch elevations [deg] that land at the target range (NaN above the
    link MUF). Keys: ``delay_low_sec``, ``delay_high_sec``,
    ``elev_low_deg``, ``elev_high_deg``, plus the raw fan
    (``fan_range_km``, ``fan_delay_sec``, ``elevations_deg``).

    ``geometry``: 'cartesian' (flat Earth) or 'spherical'.
    ``max_range_jump_km`` rejects crossings interpolated across
    layer-transition discontinuities of the fan (consecutive elevations
    whose landing ranges differ by more than this are different hops).
    """
    f0s = jnp.atleast_1d(jnp.asarray(f0s_hz, dtype=float))
    elevs = jnp.linspace(float(elev_min_deg), float(elev_max_deg),
                         int(n_elev))
    tracer = (trace_rays_cartesian_snells if geometry == "cartesian"
              else trace_rays_spherical_snells)
    if geometry not in ("cartesian", "spherical"):
        raise ValueError("geometry must be 'cartesian' or 'spherical'")
    fan = tracer(f0s, elevs, jnp.asarray(alt_km, dtype=float),
                 jnp.asarray(Ne, dtype=float),
                 jnp.asarray(Babs, dtype=float),
                 jnp.asarray(bpsi, dtype=float), mode)
    range_fe = jnp.asarray(fan["ground_range_km"])        # [F, E]
    delay_fe = jnp.asarray(fan["group_delay_sec"])

    # physical floor: chord distance / c (μ' ≥ 1 ⇒ no ray is faster)
    from .constants import C_KM_S, R_E
    D = float(ground_range_km)
    chord = (D if geometry == "cartesian"
             else 2.0 * R_E * jnp.sin(0.5 * D / R_E))
    fn = partial(_crossings, elev=elevs,
                 target=jnp.asarray(ground_range_km, dtype=float),
                 max_jump=jnp.asarray(max_range_jump_km, dtype=float),
                 delay_min=jnp.asarray(chord, dtype=float) / C_KM_S)
    dl_lo, dl_hi, el_lo, el_hi = jax.vmap(
        lambda r, d: fn(r, d))(range_fe, delay_fe)
    return {"delay_low_sec": dl_lo, "delay_high_sec": dl_hi,
            "elev_low_deg": el_lo, "elev_high_deg": el_hi,
            "fan_range_km": range_fe, "fan_delay_sec": delay_fe,
            "elevations_deg": elevs}
