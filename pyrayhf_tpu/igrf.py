"""Geomagnetic field models for ray-tracing inputs.

The reference obtains |B| and inclination from PyIRI's IGRF-13 wrapper
(``calculate_magnetic_field``, ref ``library.py:2390-2439``), looping over
altitudes in Python. PyIRI is not installable here, so this module provides:

* :func:`schmidt_legendre` + :func:`igrf_field` — a full spherical-harmonic
  geomagnetic field evaluation in pure jnp (any degree), vectorised over
  (lat, lon, alt) and differentiable. Coefficients are supplied by the
  caller, either from a standard ``igrf13coeffs.txt``-format file via
  :func:`load_igrf_coefficients`, or the built-in low-degree IGRF-13
  epoch-2020 set (:data:`IGRF13_2020_N3`).
* :func:`calculate_magnetic_field` — API-parity wrapper returning
  (|B| [nT→T like the reference], ψ = 90 − |inclination| [deg]) on an
  (alt × location) grid, evaluated as ONE vmapped program instead of the
  reference's per-altitude Python loop.

The built-in truncation (degree 3) reproduces the large-scale field to a few
percent — adequate for Y = f_ce/f in HF work; load the full 13th-generation
table for production accuracy.
"""


import jax.numpy as jnp
import numpy as np

from .constants import R_E

__all__ = ["IGRF13_2020_N3", "load_igrf_coefficients", "igrf_field",
           "calculate_magnetic_field", "dipole_field"]

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
    variation extrapolation past the last epoch column).
    """
    rows = []
    with open(path) as f:
        for line in f:
            if line.startswith(("#", "c/s")) or not line.strip():
                continue
            parts = line.split()
            if parts[0] in ("g", "h"):
                rows.append(parts)
            elif parts[0] == "g/h":
                header = parts
    years = [float(y) for y in header[3:-1]]
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
    for n in range(1, nmax + 1):
        for m in range(0, n + 1):
            if n == m:
                fac = np.sqrt(1.0 - 1.0 / (2.0 * m)) if m > 1 else 1.0
                P[n][m] = fac * st * P[n - 1][m - 1]
                dP[n][m] = fac * (st * dP[n - 1][m - 1]
                                  + ct * P[n - 1][m - 1])
            else:
                k = ((n - 1) ** 2 - m ** 2) / ((2 * n - 1) * (2 * n - 3)) \
                    if n > 1 else 0.0
                prev2 = P[n - 2][m] if n >= 2 and m <= n - 2 else 0.0
                dprev2 = dP[n - 2][m] if n >= 2 and m <= n - 2 else 0.0
                P[n][m] = ct * P[n - 1][m] - k * prev2
                dP[n][m] = ct * dP[n - 1][m] - st * P[n - 1][m] - k * dprev2
    Pm = jnp.stack([jnp.stack([P[n][m] if P[n][m] is not None
                               else jnp.zeros(shape)
                               for m in range(nmax + 1)], -1)
                    for n in range(nmax + 1)], -2)
    dPm = jnp.stack([jnp.stack([dP[n][m] if dP[n][m] is not None
                                else jnp.zeros(shape)
                                for m in range(nmax + 1)], -1)
                     for n in range(nmax + 1)], -2)
    return Pm, dPm


def igrf_field(lat_deg, lon_deg, alt_km, coeffs=None):
    """Geomagnetic field at geocentric (lat, lon, alt).

    Returns (B_north, B_east, B_down, |B|, inclination_deg), all in nT /
    degrees, broadcast over the inputs. Pure jnp; vmap/grad-compatible.
    """
    c = IGRF13_2020_N3 if coeffs is None else coeffs
    g = jnp.asarray(c["g"], dtype=float)
    h = jnp.asarray(c["h"], dtype=float)
    nmax = g.shape[0] - 1

    lat = jnp.deg2rad(jnp.asarray(lat_deg, dtype=float))
    lon = jnp.deg2rad(jnp.asarray(lon_deg, dtype=float))
    lat, lon, alt_km = jnp.broadcast_arrays(lat, lon,
                                            jnp.asarray(alt_km, dtype=float))
    theta = jnp.pi / 2.0 - lat            # geocentric colatitude
    r = R_E + alt_km
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
    per-altitude Python loop. ``year/month/day`` are accepted for signature
    parity; the built-in coefficient set is epoch-2020 (pass ``coeffs`` from
    :func:`load_igrf_coefficients` for other epochs).
    """
    del year, month, day
    lat = jnp.atleast_1d(jnp.asarray(lat, dtype=float))
    lon = jnp.atleast_1d(jnp.asarray(lon, dtype=float))
    aalt = jnp.atleast_1d(jnp.asarray(aalt, dtype=float))
    _, _, _, Bmag, inc = igrf_field(lat[None, :], lon[None, :],
                                    aalt[:, None], coeffs=coeffs)
    psi = 90.0 - jnp.abs(inc)
    return Bmag / 1e9, psi
