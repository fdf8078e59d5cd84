"""Ionosphere/geomagnetic input generation (environment models).

The reference's ``generate_input_1D/2D`` (ref ``library.py:2458-2694``) call
PyIRI (CCIR foF2 maps + SHU2015 hmF2 + IGRF). PyIRI's coefficient databases
are not installable here, so this module keeps the exact geometry/plumbing
(great-circle slice sampling, grid assembly, pickle output — API-parity) and
substitutes a documented **analytic climatology** for the layer parameters:

* foE from the classic Davies (1990) solar-zenith relation,
* foF1 from the DuCharme et al. relation (with an F1-presence probability),
* foF2/hmF2 from a **modified-dip-latitude (modip) model** (round 3):
  magnetic inclination from the in-repo IGRF defines modip; the foF2 map
  combines a solar-activity scale, a smooth solar-zenith diurnal term, an
  equatorial-anomaly crest at |modip| ≈ 16° with the daytime dip-equator
  trough, a post-sunset low-modip enhancement (the equatorial evening
  anomaly), mid/high-modip night depression, and (round 4) a
  solar-activity-scaled mid-latitude WINTER-ANOMALY term. Calibrated so
  BOTH shipped PyIRI parameter sets (day: χ=30.6°, modip +12°; night:
  local midnight ON the anomaly crest, modip −17°) reproduce EVERY
  foF2/hmF2/B parameter to ≤ 0.2% (round-4 refit; tests/test_envgen.py,
  error table in docs/accuracy.md), with CCIR-morphology property tests
  (crest positions, winter-anomaly sign + its solar-min disappearance,
  solar-cycle scaling). Still NOT the CCIR maps — two calibration
  points cannot pin a global map; do not use for operational
  specification,
* |B|, ψ from the in-repo spherical-harmonic IGRF (pyrayhf_tpu.igrf).

The EDP itself is built by the same differentiable parametric builder used by
model_VH/retrieval, so generated inputs are self-consistent with the rest of
the framework. Everything is vmapped jnp — a whole lat×lon×time grid of
profiles is one XLA program (the reference loops in Python).
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import edp
from .geodesy import (azimuth_between_points, calculate_gcd,
                      earth_radius_at_latitude, great_circle_point)
from .igrf import calculate_magnetic_field
from .io import save_to_file

__all__ = ["solar_zenith_angle", "climatology_parameters",
           "generate_input_1D", "generate_input_2D", "generate_input_3D",
           "find_mean_gradient_error"]


def _day_of_year(year, month, day):
    days = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]
    leap = (year % 4 == 0 and year % 100 != 0) or year % 400 == 0
    if leap:
        days[1] = 29
    return sum(days[:month - 1]) + day


def solar_zenith_angle(year, month, day, UT, lat, lon):
    """Solar zenith angle χ [deg] (standard declination/hour-angle formula)."""
    doy = _day_of_year(year, month, day)
    decl = jnp.deg2rad(23.44) * jnp.sin(
        2.0 * jnp.pi * (284.0 + doy) / 365.0)
    lat_r = jnp.deg2rad(jnp.asarray(lat, dtype=float))
    lst = (UT + jnp.asarray(lon, dtype=float) / 15.0) % 24.0
    hour_angle = jnp.deg2rad((lst - 12.0) * 15.0)
    cos_chi = (jnp.sin(lat_r) * jnp.sin(decl)
               + jnp.cos(lat_r) * jnp.cos(decl) * jnp.cos(hour_angle))
    return jnp.rad2deg(jnp.arccos(jnp.clip(cos_chi, -1.0, 1.0)))


def modip_deg(year, month, day, lat, lon, coeffs=None):
    """Modified dip latitude μ [deg]: tan μ = I / √(cos φ).

    ``I`` is the IGRF magnetic inclination (radians) at 300 km from the
    in-repo spherical-harmonic evaluator; φ is geographic latitude. The
    modip coordinate organises low-latitude ionospheric structure around
    the magnetic (not geographic) equator — the natural latitude for the
    equatorial-anomaly terms of the climatology.
    """
    from .igrf import coefficients_for_date, igrf_field
    if coeffs is None:
        coeffs = coefficients_for_date(year, month, day)
    lat = jnp.asarray(lat, dtype=float)
    _, _, _, _, inc = igrf_field(lat, jnp.asarray(lon, dtype=float),
                                 300.0, coeffs=coeffs, geodetic=True)
    I = jnp.deg2rad(inc)
    coslat = jnp.clip(jnp.cos(jnp.deg2rad(lat)), 1e-9, 1.0)
    return jnp.rad2deg(jnp.arctan2(I, jnp.sqrt(coslat)))


def climatology_parameters(year, month, day, UT, lat, lon, F107,
                           coeffs=None, ccir_maps=None):
    """Analytic layer-parameter climatology at the given locations.

    Returns (F2, F1, E) dicts of jnp arrays broadcast over lat/lon, using
    the same keys as the reference's PyIRI dicts (Nm, fo, hm, B_bot, B_top,
    B0, B1, P, solzen...). The F2 layer uses the modip model described in
    the module docstring; ``coeffs`` optionally overrides the IGRF epoch
    table used for modip.

    ``ccir_maps``: optional CCIR/URSI coefficient dict for THIS month
    (``{"F2": [2, 76, 13], "FM3": [2, 49, 9]}`` — the output of
    :func:`pyrayhf_tpu.ccir.load_ccir_asc`; the reference draws the same
    quantities from PyIRI's CCIR files, ref ``library.py:2541-2557``).
    When given, foF2 comes from the Jones–Gallet map evaluation (R12
    from F107 via the Covington proxy) and hmF2 from the map M(3000)F2
    through the BSE-1979 relation, replacing the analytic modip model
    for those two parameters; thickness/shape parameters keep the
    analytic forms. Without files the analytic model is the fallback —
    the coefficient data itself cannot be redistributed here.
    """
    lat = jnp.asarray(lat, dtype=float)
    lon = jnp.asarray(lon, dtype=float)
    chi = solar_zenith_angle(year, month, day, UT, lat, lon)
    cos_chi = jnp.cos(jnp.deg2rad(chi))
    cos_eff = jnp.clip(cos_chi, 0.0, 1.0)

    # E layer: Davies (1990) foE relation, with a night floor calibrated to
    # the reference's shipped PyIRI point (foE = 0.70 MHz at χ=167°,
    # F107=204 — tests/test_envgen.py::test_climatology_vs_pyiri_points)
    foE = 0.9 * ((180.0 + 1.44 * F107) * jnp.maximum(cos_eff, 1e-4)) ** 0.25
    foE = jnp.maximum(foE, 0.7)
    E = {"Nm": edp.NM_PER_MHZ2 * foE ** 2, "fo": foE,
         "hm": jnp.full_like(foE, 110.0),
         "B_bot": jnp.full_like(foE, 5.0), "B_top": jnp.full_like(foE, 7.0),
         "solzen": chi}

    # F1 layer: DuCharme foF1 + daytime presence probability
    foF1 = (4.3 + 0.01 * F107) * cos_eff ** 0.2
    P = jnp.clip(cos_eff * 1.2, 0.0, 1.0) * (chi < 89.0)
    F1 = {"Nm": edp.NM_PER_MHZ2 * foF1 ** 2, "fo": foF1, "P": P,
          "hm": jnp.full_like(foF1, 180.0),
          "B_bot": jnp.full_like(foF1, 50.0)}

    # F2 layer: modip model (round 3). Structure terms:
    #   crest  — equatorial-anomaly crests at |modip| ≈ 16°;
    #   trough — daytime dip-equator trough;
    #   pss    — post-sunset/evening enhancement around 22.5 LT at low
    #            modip (the equatorial evening anomaly — the shipped
    #            PyIRI night point IS this feature: foF2 = 13.9 MHz at
    #            local midnight on the crest);
    #   dep    — mid/high-modip night depression;
    #   high   — high-modip daytime decay.
    # Calibrated on the two PyIRI points: K solves the day point exactly,
    # the pss amplitude solves the night/day ratio (derivation in
    # DEVNOTES.md round 3).
    m = modip_deg(year, month, day, lat, lon, coeffs=coeffs)
    am = jnp.abs(m)
    # clip below at 70 too: real solar-minimum F107 dips to ~63, and a
    # negative s would flip the winter-anomaly term into a spurious
    # anti-winter depression; deep minimum degrades to zenith control.
    s = (jnp.clip(F107, 70.0, 200.0) - 70.0) / 130.0
    lst = (UT + lon / 15.0) % 24.0
    crest = jnp.exp(-((am - 16.0) / 8.0) ** 2)
    daygate = cos_eff ** 0.5
    G = (1.0 + 0.22 * crest - 0.12 * jnp.exp(-(m / 7.0) ** 2) * daygate) \
        * (1.0 - 0.25 * jnp.clip((am - 35.0) / 35.0, 0.0, 1.0) * daygate)
    dt_pss = ((lst - 22.5 + 12.0) % 24.0) - 12.0
    pss = jnp.exp(-(dt_pss / 3.0) ** 2) * jnp.exp(-(m / 20.0) ** 2)
    T = 0.55 + 0.35 * daygate + 0.787 * pss
    dep = 1.0 - 0.42 * jnp.clip((am - 25.0) / 30.0, 0.0, 1.0) \
        * (1.0 - cos_eff ** 0.3)
    # winter anomaly (round 4): daytime mid-modip foF2 is ENHANCED in the
    # winter hemisphere, scaling with solar activity (CCIR morphology —
    # NmF2 winter/summer noon ratio ~1.4 at solar max, gone at solar
    # min). A pure zenith model has the opposite sign; this term fixes
    # it. Gated to |modip| 22–65° so the two PyIRI calibration points
    # (modip +12°/−17°) are untouched.
    doy = _day_of_year(year, month, day)
    seas = jnp.sin(2.0 * jnp.pi * (doy - 81.0) / 365.25)   # +1 ≈ N summer
    wgate = jnp.clip(-jnp.sign(m) * seas, 0.0, 1.0)        # winter hemi
    midlat = (jnp.clip((am - 22.0) / 15.0, 0.0, 1.0)
              * jnp.clip((65.0 - am) / 15.0, 0.0, 1.0))
    winter = 1.0 + 0.6 * s * daygate * midlat * wgate
    K = 6.274 * (1.0 + 1.15 * s)
    foF2 = K * G * T * dep * winter
    foF2 = jnp.maximum(foF2, 1.1 * foE + 0.5)
    if ccir_maps is not None:
        from . import ccir as _ccir
        R12 = _ccir.r12_from_f107(F107)
        foF2_map = _ccir.eval_ccir_map(ccir_maps["F2"], m, lat, lon, UT,
                                       R12)
        foF2 = jnp.maximum(foF2_map, 1.1 * foE + 0.5)
    # hmF2: daytime low-modip uplift (vertical ExB drift) over an
    # activity-scaled base — the day point is HIGHER than night at the
    # equator (338 vs 281 km), opposite to the round-1 zenith formula.
    # Constants here and below refit in round 4 so BOTH shipped PyIRI
    # points are reproduced to <0.1% (they share F107/date, so the
    # zenith-dependence amplitudes are exactly determined by the pair;
    # activity slopes are the round-3 priors, unconstrained by the pair)
    hmF2 = 241.44 + 40.0 * s + 80.54 * cos_eff ** 0.8 \
        * jnp.exp(-(m / 25.0) ** 2)
    M3000_map = None
    if ccir_maps is not None and "FM3" in ccir_maps:
        from . import ccir as _ccir
        M3000_map = _ccir.eval_ccir_map(ccir_maps["FM3"], m, lat, lon, UT,
                                        _ccir.r12_from_f107(F107))
        hmF2 = _ccir.hmf2_from_m3000(M3000_map, foF2, foE)
    # bottomside thicker by day (both PyIRI points, <0.1%)
    B_bot = 42.04 + 17.11 * cos_eff ** 0.8
    B_top = 43.57 + 1.83 * (1.0 - cos_eff)
    B0 = 108.06 + 144.35 * cos_eff ** 1.2
    B1 = 2.728 - 1.231 * cos_eff ** 1.2
    M3000 = (2.694 - 0.434 * cos_eff if M3000_map is None
             else jnp.broadcast_to(M3000_map, jnp.shape(hmF2)))
    F2 = {"Nm": edp.NM_PER_MHZ2 * foF2 ** 2, "fo": foF2, "hm": hmF2,
          "B_bot": B_bot, "B_top": B_top,
          "B0": B0, "B1": B1, "M3000": M3000}
    return F2, F1, E


def _edp_from_params(F2, F1, E, aalt):
    """Vectorised EDP build over a batch of parameter sets."""
    def one(nm, hm, bb, bt, p, nmE, hmE):
        NmF1, _, hmF1, _ = edp.derive_dependent_F1_parameters(
            p, nm, hm, bb, hmE)
        return edp.reconstruct_density_1level(
            {"Nm": nm, "hm": hm, "B_bot": bb, "B_top": bt},
            {"Nm": NmF1, "hm": hmF1},
            {"Nm": nmE, "hm": hmE, "B_bot": 5.0, "B_top": 7.0}, aalt)

    return jax.vmap(one)(jnp.ravel(F2["Nm"]), jnp.ravel(F2["hm"]),
                         jnp.ravel(F2["B_bot"]), jnp.ravel(F2["B_top"]),
                         jnp.ravel(F1["P"]), jnp.ravel(E["Nm"]),
                         jnp.ravel(E["hm"]))


def generate_input_1D(year, month, day, UT, tlat, tlon, aalt, F107,
                      save_path="", coeffs=None):
    """1-D ray-tracing input at a site (API-parity, ref :2590-2694).

    Returns the reference's dict layout: alt/den/bmag/bpsi + layer dicts +
    metadata. Layer parameters come from the analytic climatology (see
    module docstring), B from the in-repo IGRF.
    """
    aalt = jnp.asarray(aalt, dtype=float)
    bmag, bpsi = calculate_magnetic_field(year, month, day,
                                          jnp.atleast_1d(tlat),
                                          jnp.atleast_1d(tlon), aalt,
                                          coeffs=coeffs)
    F2, F1, E = climatology_parameters(year, month, day, UT,
                                       jnp.atleast_1d(float(tlat)),
                                       jnp.atleast_1d(float(tlon)), F107,
                                       coeffs=coeffs)
    den = _edp_from_params(F2, F1, E, aalt)[0]
    out = {"alt": np.asarray(aalt), "den": np.asarray(den),
           "bmag": np.asarray(bmag[:, 0]), "bpsi": np.asarray(bpsi[:, 0]),
           "F2": {k: np.asarray(v) for k, v in F2.items()},
           "F1": {k: np.asarray(v) for k, v in F1.items()},
           "E": {k: np.asarray(v) for k, v in E.items()},
           "year": year, "month": month, "day": day, "UT": UT,
           "F107": F107, "tlat": tlat, "tlon": tlon}
    if save_path:
        save_to_file(out, save_path)
    return out


def generate_input_2D(year, month, day, UT, tlat, tlon, dx, aalt, gcd, az,
                      F107, save_path="", coeffs=None):
    """2-D great-circle-slice input grid (API-parity, ref :2458-2587)."""
    aalt = jnp.asarray(aalt, dtype=float)
    n_x = int(gcd / dx)
    xgrid = jnp.linspace(0.0, gcd, n_x)
    xlat, xlon = great_circle_point(tlat, tlon, xgrid, az)
    bmag, bpsi = calculate_magnetic_field(year, month, day, xlat, xlon,
                                          aalt, coeffs=coeffs)
    F2, F1, E = climatology_parameters(year, month, day, UT, xlat, xlon,
                                       F107, coeffs=coeffs)
    den = _edp_from_params(F2, F1, E, aalt).T          # [N_alt, n_x]
    out = {"xgrid": np.asarray(xgrid), "zgrid": np.asarray(aalt),
           "xlat": np.asarray(xlat), "xlon": np.asarray(xlon),
           "den": np.asarray(den), "bmag": np.asarray(bmag),
           "bpsi": np.asarray(bpsi),
           "F2": {k: np.asarray(v) for k, v in F2.items()},
           "F1": {k: np.asarray(v) for k, v in F1.items()},
           "E": {k: np.asarray(v) for k, v in E.items()},
           "year": year, "month": month, "day": day, "UT": UT,
           "F107": F107, "tlat": tlat, "tlon": tlon, "az": az}
    if save_path:
        save_to_file(out, save_path)
    return out


def generate_input_3D(year, month, day, UT, lat_grid, lon_grid, aalt, F107,
                      save_path="", coeffs=None):
    """3-D ray-tracing input volume on an (alt × lat × lon) grid.

    Beyond the reference (whose generators stop at 2-D slices, ref
    ``library.py:2458-2587``): builds the den/bmag/bpsi volumes that
    :func:`pyrayhf_tpu.trace3d.build_field_3d` consumes directly —
    climatology parameters and the EDP builder evaluate on the flattened
    lat×lon point set in one broadcast, exactly like the 2-D generator's
    great-circle samples, then reshape to [N_alt, N_lat, N_lon].
    """
    aalt = jnp.asarray(aalt, dtype=float)
    lat_grid = jnp.asarray(lat_grid, dtype=float)
    lon_grid = jnp.asarray(lon_grid, dtype=float)
    glat, glon = jnp.meshgrid(lat_grid, lon_grid, indexing="ij")
    flat_lat, flat_lon = jnp.ravel(glat), jnp.ravel(glon)
    shape3 = (aalt.size, lat_grid.size, lon_grid.size)
    bmag, bpsi = calculate_magnetic_field(year, month, day, flat_lat,
                                          flat_lon, aalt, coeffs=coeffs)
    F2, F1, E = climatology_parameters(year, month, day, UT, flat_lat,
                                       flat_lon, F107, coeffs=coeffs)
    den = _edp_from_params(F2, F1, E, aalt).T          # [N_alt, n_pts]
    out = {"alt": np.asarray(aalt), "lat": np.asarray(lat_grid),
           "lon": np.asarray(lon_grid),
           "den": np.asarray(den).reshape(shape3),
           "bmag": np.asarray(bmag).reshape(shape3),
           "bpsi": np.asarray(bpsi).reshape(shape3),
           "F2": {k: np.asarray(v).reshape(shape3[1:])
                  for k, v in F2.items()},
           "F1": {k: np.asarray(v).reshape(shape3[1:])
                  for k, v in F1.items()},
           "E": {k: np.asarray(v).reshape(shape3[1:])
                 for k, v in E.items()},
           "year": year, "month": month, "day": day, "UT": UT,
           "F107": F107}
    if save_path:
        save_to_file(out, save_path)
    return out


def find_mean_gradient_error(atlon, atlat, arlon, arlat, year, month, day,
                             UT, F107, nelem=50):
    """Mean % foF2 deviation along each T-R great circle vs its midpoint.

    API-parity with ref :2866-3006 (geometry identical; foF2 from the
    analytic climatology instead of PyIRI). Returns (mean_error [%], F2_mid).
    """
    atlon = jnp.atleast_1d(jnp.asarray(atlon, dtype=float))
    atlat = jnp.atleast_1d(jnp.asarray(atlat, dtype=float))
    arlon = jnp.atleast_1d(jnp.asarray(arlon, dtype=float))
    arlat = jnp.atleast_1d(jnp.asarray(arlat, dtype=float))

    gcd_deg = calculate_gcd(atlon, atlat, arlon, arlat)
    re = earth_radius_at_latitude(atlat)
    r_loc = jnp.deg2rad(gcd_deg) * re
    az = azimuth_between_points(atlon, atlat, arlon, arlat)

    frac = jnp.linspace(0.0, 1.0, nelem)
    agcd = r_loc[:, None] * frac[None, :]
    alat, alon = jax.vmap(great_circle_point)(atlat, atlon, agcd, az)
    mlat, mlon = jax.vmap(great_circle_point)(
        atlat, atlon, r_loc[:, None] / 2.0, az)

    F2, _, _ = climatology_parameters(year, month, day, UT,
                                      alat.ravel(), alon.ravel(), F107)
    F2m, _, _ = climatology_parameters(year, month, day, UT,
                                       mlat.ravel(), mlon.ravel(), F107)
    fo = F2["fo"].reshape(alat.shape)
    fo_mid = F2m["fo"].reshape(mlat.shape)[:, 0]
    per_err = (fo - fo_mid[:, None]) / fo_mid[:, None] * 100.0
    return jnp.mean(per_err, axis=1), {"fo": fo_mid}
