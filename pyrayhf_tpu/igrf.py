"""Geomagnetic field models for ray-tracing inputs.

The reference obtains |B| and inclination from PyIRI's IGRF-13 wrapper
(``calculate_magnetic_field``, ref ``library.py:2390-2439``), looping over
altitudes in Python. PyIRI is not installable here, so this module provides:

* :func:`schmidt_legendre` + :func:`igrf_field` — a full spherical-harmonic
  geomagnetic field evaluation in pure jnp (any degree), vectorised over
  (lat, lon, alt) and differentiable, with optional geodetic (WGS84) input
  coordinates. The default coefficient set is the full vendored IGRF-13
  epoch-2020 degree-13 table (:mod:`pyrayhf_tpu.igrf13_table`); other
  sources: a standard ``igrf13coeffs.txt``-format file via
  :func:`load_igrf_coefficients`, or the degree-3 subset
  :data:`IGRF13_2020_N3`.
* :func:`calculate_magnetic_field` — API-parity wrapper returning
  (|B| [nT→T like the reference], ψ = 90 − |inclination| [deg]) on an
  (alt × location) grid, evaluated as ONE vmapped program instead of the
  reference's per-altitude Python loop; the date arguments select the
  coefficient epoch via the vendored secular variation.

Validation: the degree-13 default reproduces the reference's shipped
PyIRI-IGRF arrays (Day/Night pickles, epoch 2025.67) to ≤ 0.35° in ψ and
≤ 2% in |B| — the |B| residual is a location-dependent constant offset on
PyIRI's side (altitude- and epoch-independent); spot values at well-known
locations land within ~0.3% of published IGRF-13 values (tests/test_igrf.py).
"""


import jax.numpy as jnp
import numpy as np

from . import igrf13_table
from .constants import R_E

__all__ = ["IGRF13_2020_N3", "load_igrf_coefficients", "igrf_field",
           "calculate_magnetic_field", "coefficients_for_date",
           "dipole_field"]


def coefficients_for_date(year, month, day):
    """Coefficient table at the decimal epoch of a calendar date.

    The single source of the date→epoch→table resolution shared by
    :func:`calculate_magnetic_field` and the climatology's modip
    evaluation (envgen.modip_deg), so both always use the same field
    epoch within one ``generate_input_*`` call.
    """
    import datetime
    d = datetime.date(int(year), int(month), int(day))
    ystart = datetime.date(d.year, 1, 1)
    ylen = (datetime.date(d.year + 1, 1, 1) - ystart).days
    return igrf13_table.coefficients_at_epoch(
        d.year + (d - ystart).days / ylen)

# IGRF-13 main-field coefficients, epoch 2020.0, degrees 1..3 [nT]
# (g[n][m], h[n][m]); the dominant dipole + quadrupole + octupole terms.
IGRF13_2020_N3 = {
    "g": np.array([
        [0.0, 0.0, 0.0, 0.0],
        [-29404.8, -1450.9, 0.0, 0.0],
        [-2499.6, 2982.0, 1677.0, 0.0],
        [1363.2, -2381.2, 1236.2, 525.7],
    ]),
    "h": np.array([
        [0.0, 0.0, 0.0, 0.0],
        [0.0, 4652.5, 0.0, 0.0],
        [0.0, -2991.6, -734.6, 0.0],
        [0.0, -82.1, 241.9, -543.4],
    ]),
}


def load_igrf_coefficients(path, epoch=2020.0):
    """Parse a standard ``igrf13coeffs.txt`` table into {g, h} arrays.

    Linear interpolation between the two nearest epochs (or secular
    variation extrapolation past the last epoch column). Epochs before the
    first table year are rejected.
    """
    rows = []
    header = None
    with open(path) as f:
        for line in f:
            if line.startswith(("#", "c/s")) or not line.strip():
                continue
            parts = line.split()
            if parts[0] in ("g", "h"):
                rows.append(parts)
            elif parts[0] == "g/h":
                header = parts
    if header is None:
        raise ValueError(
            f"{path}: no 'g/h' header row — not an igrf13coeffs.txt-format "
            "file")
    years = [float(y) for y in header[3:-1]]
    if epoch < years[0]:
        raise ValueError(
            f"epoch {epoch} precedes the table's first year {years[0]}")
    nmax = max(int(r[1]) for r in rows)
    g = np.zeros((nmax + 1, nmax + 1))
    h = np.zeros((nmax + 1, nmax + 1))
    for r in rows:
        n, m = int(r[1]), int(r[2])
        vals = [float(v) for v in r[3:-1]]
        sv = float(r[-1])
        if epoch >= years[-1]:
            val = vals[-1] + sv * (epoch - years[-1])
        else:
            val = np.interp(epoch, years, vals)
        if r[0] == "g":
            g[n, m] = val
        else:
            h[n, m] = val
    return {"g": g, "h": h}


def schmidt_legendre(nmax, theta):
    """Schmidt semi-normalised associated Legendre P_n^m(cosθ) and dP/dθ.

    Returns (P, dP) of shape [..., nmax+1, nmax+1] via the standard
    recursion, implemented with static python loops (nmax is small) so the
    whole thing stays one fused XLA program.
    """
    ct = jnp.cos(theta)
    st = jnp.maximum(jnp.sin(theta), 1e-12)
    shape = jnp.shape(theta)
    P = [[None] * (nmax + 1) for _ in range(nmax + 1)]
    dP = [[None] * (nmax + 1) for _ in range(nmax + 1)]
    P[0][0] = jnp.ones(shape)
    dP[0][0] = jnp.zeros(shape)
    # Schmidt semi-normalised recursions:
    #   P_n^n = sqrt((2n-1)/(2n)) st P_{n-1}^{n-1}            (n > 1)
    #   P_n^m = ((2n-1) ct P_{n-1}^m
    #            - sqrt((n-1)^2 - m^2) P_{n-2}^m) / sqrt(n^2 - m^2)
    # (the off-diagonal three-term recursion MUST carry the sqrt
    # normalisation factors — the plain Gauss recursion ct·P − k·P with
    # Schmidt diagonal seeds silently under-weights every m<n term, e.g.
    # P_2^1 = ct·st instead of √3·ct·st, an ~11% |B| error at some
    # longitudes; caught against the reference's PyIRI-IGRF arrays).
    for n in range(1, nmax + 1):
        for m in range(0, n + 1):
            if n == m:
                fac = np.sqrt(1.0 - 1.0 / (2.0 * m)) if m > 1 else 1.0
                P[n][m] = fac * st * P[n - 1][m - 1]
                dP[n][m] = fac * (st * dP[n - 1][m - 1]
                                  + ct * P[n - 1][m - 1])
            else:
                norm = np.sqrt(float(n * n - m * m))
                a = (2.0 * n - 1.0) / norm
                b = np.sqrt(float((n - 1) ** 2 - m * m)) / norm
                prev2 = P[n - 2][m] if n >= 2 and m <= n - 2 else 0.0
                dprev2 = dP[n - 2][m] if n >= 2 and m <= n - 2 else 0.0
                P[n][m] = a * ct * P[n - 1][m] - b * prev2
                dP[n][m] = (a * (ct * dP[n - 1][m] - st * P[n - 1][m])
                            - b * dprev2)
    Pm = jnp.stack([jnp.stack([P[n][m] if P[n][m] is not None
                               else jnp.zeros(shape)
                               for m in range(nmax + 1)], -1)
                    for n in range(nmax + 1)], -2)
    dPm = jnp.stack([jnp.stack([dP[n][m] if dP[n][m] is not None
                                else jnp.zeros(shape)
                                for m in range(nmax + 1)], -1)
                     for n in range(nmax + 1)], -2)
    return Pm, dPm


def igrf_field(lat_deg, lon_deg, alt_km, coeffs=None, geodetic=False):
    """Geomagnetic field at (lat, lon, alt).

    Returns (B_north, B_east, B_down, |B|, inclination_deg), all in nT /
    degrees, broadcast over the inputs. Pure jnp; vmap/grad-compatible.

    ``coeffs`` defaults to the vendored full IGRF-13 epoch-2020 degree-13
    table. With ``geodetic=True`` the inputs are WGS84 geodetic latitude /
    altitude above the spheroid (the convention of the standard
    ``igrf13syn`` synthesis and of the reference's PyIRI inputs) and the
    returned components are in the local geodetic frame; the default treats
    (lat, alt) as geocentric with r = R_E + alt.
    """
    if coeffs is None:
        coeffs = {"g": igrf13_table.G2020, "h": igrf13_table.H2020}
    g = jnp.asarray(coeffs["g"], dtype=float)
    h = jnp.asarray(coeffs["h"], dtype=float)
    nmax = g.shape[0] - 1

    lat = jnp.deg2rad(jnp.asarray(lat_deg, dtype=float))
    lon = jnp.deg2rad(jnp.asarray(lon_deg, dtype=float))
    lat, lon, alt_km = jnp.broadcast_arrays(lat, lon,
                                            jnp.asarray(alt_km, dtype=float))
    if geodetic:
        # igrf13syn WGS84 geodetic -> geocentric conversion:
        # (st0, ct0) = (sin, cos) of the geodetic colatitude
        a2, b2 = 40680631.6, 40408296.0
        st0 = jnp.cos(lat)
        ct0 = jnp.sin(lat)
        one = a2 * st0 * st0
        two = b2 * ct0 * ct0
        three = one + two
        rho = jnp.sqrt(three)
        r = jnp.sqrt(alt_km * (alt_km + 2.0 * rho)
                     + (a2 * one + b2 * two) / three)
        cd = (alt_km + rho) / r
        sd = (a2 - b2) / rho * ct0 * st0 / r
        theta = jnp.arccos(jnp.clip(ct0 * cd - st0 * sd, -1.0, 1.0))
    else:
        theta = jnp.pi / 2.0 - lat        # geocentric colatitude
        r = R_E + alt_km
        cd = None
    a_over_r = 6371.2 / r                 # IGRF reference radius

    P, dP = schmidt_legendre(nmax, theta)
    Br = jnp.zeros_like(theta)
    Bt = jnp.zeros_like(theta)
    Bp = jnp.zeros_like(theta)
    st = jnp.maximum(jnp.sin(theta), 1e-12)
    for n in range(1, nmax + 1):
        rad = a_over_r ** (n + 2)
        for m in range(0, n + 1):
            cml = jnp.cos(m * lon)
            sml = jnp.sin(m * lon)
            gh_c = g[n, m] * cml + h[n, m] * sml
            gh_s = g[n, m] * sml - h[n, m] * cml
            Br = Br + (n + 1) * rad * gh_c * P[..., n, m]
            Bt = Bt - rad * gh_c * dP[..., n, m]
            Bp = Bp + m * rad * gh_s * P[..., n, m] / st
    B_north = -Bt
    B_east = Bp
    B_down = -Br
    if geodetic and cd is not None:
        # rotate (north, down) from the geocentric to the geodetic frame
        bn = B_north * cd + B_down * sd
        B_down = B_down * cd - B_north * sd
        B_north = bn
    Bmag = jnp.sqrt(B_north ** 2 + B_east ** 2 + B_down ** 2)
    Bh = jnp.sqrt(B_north ** 2 + B_east ** 2)
    inc = jnp.rad2deg(jnp.arctan2(B_down, Bh))
    return B_north, B_east, B_down, Bmag, inc


def dipole_field(lat_deg, lon_deg, alt_km):
    """Centered tilted dipole only (degree-1 truncation of IGRF-13 2020)."""
    c = {"g": IGRF13_2020_N3["g"][:2, :2], "h": IGRF13_2020_N3["h"][:2, :2]}
    return igrf_field(lat_deg, lon_deg, alt_km, coeffs=c)


def calculate_magnetic_field(year, month, day, lat, lon, aalt, coeffs=None):
    """API-parity with the reference (ref library.py:2390-2439).

    Returns (mag [N_alt, N_loc] in **Tesla**, psi [N_alt, N_loc] in degrees
    from vertical). One vmapped evaluation instead of the reference's
    per-altitude Python loop. ``year/month/day`` select the coefficient
    epoch: >= 2020 via the vendored IGRF-13 secular variation, 1900-2020
    via the DGRF back-catalogue (:mod:`pyrayhf_tpu.igrf_history`; tiered
    fidelity — exact low-degree history, frozen high-degree tail before
    2000). Any date from 1900 on works, matching the reference's
    PyIRI-IGRF behaviour (ref library.py:2425-2432); pass ``coeffs`` from
    :func:`load_igrf_coefficients` to use an external coefficient file
    instead. Inputs are geodetic like the reference's PyIRI call.
    """
    if coeffs is None:
        coeffs = coefficients_for_date(year, month, day)
    lat = jnp.atleast_1d(jnp.asarray(lat, dtype=float))
    lon = jnp.atleast_1d(jnp.asarray(lon, dtype=float))
    aalt = jnp.atleast_1d(jnp.asarray(aalt, dtype=float))
    _, _, _, Bmag, inc = igrf_field(lat[None, :], lon[None, :],
                                    aalt[:, None], coeffs=coeffs,
                                    geodetic=True)
    psi = 90.0 - jnp.abs(inc)
    return Bmag / 1e9, psi
