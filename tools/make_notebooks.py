#!/usr/bin/env python
"""Author the executable tutorial notebooks (docs/tutorials/*.ipynb).

Mirrors the reference's tutorial set (``/root/reference/docs/tutorials/
Example_*.ipynb``) with runnable, output-recorded equivalents. Notebooks
are generated from the cell sources below (plain JSON — no jupyter
dependency) and executed with ``tools/nbexec.py``; the docs CI rebuilds
and re-executes them so outputs never drift from the code.
"""

import json
import pathlib
import sys

OUT = pathlib.Path(__file__).resolve().parents[1] / "docs" / "tutorials"

SETUP = '''\
import pathlib, sys
root = pathlib.Path.cwd()
while not (root / "pyrayhf_tpu").exists():
    root = root.parent
sys.path.insert(0, str(root))
import jax
jax.config.update("jax_platforms", "cpu")       # force host CPU (see docs)
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_nb")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import numpy as np
import matplotlib.pyplot as plt
import pyrayhf_tpu as prt

REF = pathlib.Path("/root/reference/docs/tutorials/Example_Input_Day.p")
def day_profile():
    """Reference Day pickle when mounted, else the built-in climatology."""
    if REF.exists():
        d = prt.load_input(REF)
        return d["alt"], d["den"], d["bmag"], d["bpsi"]
    out = prt.generate_input_1D(2025, 9, 1, 0.0, 4.5, -150.0,
                                np.linspace(80.0, 699.0, 620), 204.0)
    return out["alt"], out["den"], out["bmag"], out["bpsi"]
'''


def nb(cells):
    return {
        "cells": [
            {"cell_type": "markdown", "metadata": {},
             "source": src.splitlines(keepends=True)}
            if kind == "md" else
            {"cell_type": "code", "metadata": {}, "execution_count": None,
             "outputs": [], "source": src.splitlines(keepends=True)}
            for kind, src in cells
        ],
        "metadata": {
            "kernelspec": {"display_name": "Python 3",
                           "language": "python", "name": "python3"},
            "language_info": {"name": "python", "version": "3.12"},
        },
        "nbformat": 4, "nbformat_minor": 5,
    }


NOTEBOOKS = {}

# ---------------------------------------------------------------- 01
NOTEBOOKS["01_vertical_forward_operator.ipynb"] = [
    ("md", """\
# Vertical forward operator

TPU-native equivalent of the reference's
`Example_Vertical_Forward_Operator.ipynb`: an electron-density /
geomagnetic profile goes in, the full ionogram (virtual height per
sounding frequency, O and X modes) comes out — one fused XLA program.
"""),
    ("code", SETUP),
    ("code", """\
alt, den, bmag, bpsi = day_profile()
freqs = np.arange(0.5, 17.5, 0.1)
vh_O = np.asarray(prt.vertical_forward_operator(freqs, den, bmag, bpsi,
                                                alt, mode="O"))
vh_X = np.asarray(prt.vertical_forward_operator(freqs, den, bmag, bpsi,
                                                alt, mode="X",
                                                n_points=2000))
foF2 = freqs[np.isfinite(vh_O)][-1]
print(f"profile: {alt.size} points, {alt[0]:.0f}-{alt[-1]:.0f} km")
print(f"critical frequency (last finite O-mode return): {foF2:.1f} MHz")
print(f"vh_O at 5 MHz: {vh_O[np.argmin(np.abs(freqs-5.0))]:.2f} km")
"""),
    ("code", """\
fig, ax = plt.subplots(1, 2, figsize=(10, 4))
ax[0].plot(den, alt)
ax[0].set_xlabel("electron density [m$^{-3}$]")
ax[0].set_ylabel("altitude [km]")
ax[0].set_title("input profile")
ax[1].plot(freqs, vh_O, ".", ms=3, label="O mode")
ax[1].plot(freqs, vh_X, ".", ms=3, label="X mode")
ax[1].set_xlabel("frequency [MHz]")
ax[1].set_ylabel("virtual height [km]")
ax[1].set_title("synthesised ionogram")
ax[1].legend()
fig.tight_layout()
"""),
    ("md", """\
Above the critical frequency the ray escapes and the virtual height is
NaN, exactly like the reference. On TPU the same call batches over
thousands of profiles through the fused Pallas kernel
(`engine="auto"` in `vertical_forward_operator_batch`); see
`BENCHMARKS.md` for the measured 1.07e7 (frequency, profile)
evaluations/s on one v5e chip.
"""),
]

# ---------------------------------------------------------------- 02
NOTEBOOKS["02_snell_raytracing.ipynb"] = [
    ("md", """\
# Layered Snell's-law ray tracing (Cartesian and spherical)

Equivalent of `Example_PyRayHF_Cartesian_Snells.ipynb` and
`Example_PyRayHF_Spherical_Snells.ipynb`: single-ray O/X traces through
the layered ionosphere, plus the batched (frequency x elevation) fan
that replaces the reference's per-ray Python loop with one launch.
"""),
    ("code", SETUP),
    ("code", """\
alt, den, bmag, bpsi = day_profile()
f0, elev = 14e6, 50.0
for mode in "OX":
    rc = prt.trace_ray_cartesian_snells(f0, elev, alt, den, bmag, bpsi,
                                        mode)
    rs = prt.trace_ray_spherical_snells(f0, elev, alt, den, bmag, bpsi,
                                        mode)
    print(f"{mode}-mode cartesian: path {float(rc['group_path_km']):7.2f}"
          f" km  delay {float(rc['group_delay_sec'])*1e3:6.4f} ms"
          f"  range {float(rc['ground_range_km']):7.2f} km")
    print(f"{mode}-mode spherical: path {float(rs['group_path_km']):7.2f}"
          f" km  delay {float(rs['group_delay_sec'])*1e3:6.4f} ms"
          f"  range {float(rs['ground_range_km']):7.2f} km")
"""),
    ("code", """\
ro = prt.trace_ray_cartesian_snells(f0, elev, alt, den, bmag, bpsi, "O")
rx = prt.trace_ray_cartesian_snells(f0, elev, alt, den, bmag, bpsi, "X")
fig, ax = plt.subplots(figsize=(7, 4))
ax.plot(np.asarray(ro["x"]), np.asarray(ro["z"]), label="O mode")
ax.plot(np.asarray(rx["x"]), np.asarray(rx["z"]), label="X mode")
ax.set_xlabel("ground range [km]")
ax.set_ylabel("altitude [km]")
ax.set_title(f"Cartesian Snell traces, {f0/1e6:.0f} MHz, elev {elev}°")
ax.legend()
fig.tight_layout()
"""),
    ("code", """\
# the batched fan: every (frequency, elevation) pair in ONE launch
fan = prt.trace_rays_cartesian_snells(
    np.array([6e6, 10e6, 14e6]),
    np.linspace(15.0, 75.0, 5), alt, den, bmag, bpsi, "O")
print("ground range [km] (rows = frequency, cols = elevation):")
print(np.round(np.asarray(fan["ground_range_km"]), 1))
"""),
]

# ---------------------------------------------------------------- 03
NOTEBOOKS["03_gradient_raytracing.ipynb"] = [
    ("md", """\
# Gradient (ray-ODE) tracing through a 2-D refractive-index field

Equivalent of `Example_PyRayHF_Cartesian_Gradient.ipynb`: the
Haselgrove ray equations integrated through a bilinear (altitude x
range) μ field. scipy's `solve_ivp` becomes an error-controlled
Dormand-Prince 5(4) integrator inside `lax.scan`, so a whole elevation
fan is one XLA launch.
"""),
    ("code", SETUP),
    ("code", """\
alt, den, bmag, bpsi = day_profile()
f0 = 14e6
x_grid = np.linspace(0.0, 1000.0, 200)
z_grid = np.concatenate([[0.0], alt]) if alt[0] > 0 else alt
prof = lambda a: np.interp(z_grid, alt, a, left=0.0)
Ne2 = np.tile(prof(den)[:, None], (1, x_grid.size))
X = np.asarray(prt.find_X(Ne2, f0))
Y = np.asarray(prt.find_Y(f0, np.tile(
    np.interp(z_grid, alt, bmag)[:, None], (1, x_grid.size))))
psi2 = np.tile(np.interp(z_grid, alt, bpsi)[:, None], (1, x_grid.size))
mu, mup = (np.asarray(a) for a in prt.find_mu_mup(X, Y, psi2, "O"))
nag = prt.build_refractive_index_interpolator_cartesian(z_grid, x_grid,
                                                        mu)
mupf = prt.build_mup_function(mup_field=mup, x_grid=x_grid,
                              z_grid=z_grid, geometry="cartesian")
ray = prt.trace_ray_cartesian_gradient(
    nag, mupf, 0.0, 0.0, 50.0, 4000.0, step_km=1.0,
    z_max_km=float(z_grid[-1] - 1), x_min_km=0.0, x_max_km=1000.0,
    rtol=1e-7, atol=1e-9, max_step_km=2.0)
print(f"status {ray['status']}: path {float(ray['group_path_km']):.2f} km,"
      f" delay {float(ray['group_delay_sec'])*1e3:.4f} ms,"
      f" range {float(ray['ground_range_km']):.2f} km")
"""),
    ("code", """\
fan = prt.trace_rays_cartesian_gradient(
    nag, mupf, 0.0, 0.0, np.linspace(25.0, 70.0, 10), 3000.0,
    step_km=2.0, z_max_km=float(z_grid[-1] - 1), x_min_km=0.0,
    x_max_km=1000.0)
fig, ax = plt.subplots(figsize=(7, 4))
for i in range(10):
    ax.plot(np.asarray(fan["x"])[i], np.asarray(fan["z"])[i], lw=0.8)
ax.set_xlim(0, 1000); ax.set_ylim(0, 450)
ax.set_xlabel("ground range [km]"); ax.set_ylabel("altitude [km]")
ax.set_title("gradient-ODE elevation fan (one launch)")
fig.tight_layout()
"""),
]

# ---------------------------------------------------------------- 04
NOTEBOOKS["04_raytracing_verification.ipynb"] = [
    ("md", """\
# Four-tracer verification (and an exact spherical oracle)

Equivalent of `Example_PyRayHF_Raytracing_Verification.ipynb`: the same
X-mode 14 MHz, 50°-elevation ray traced by all four tracers. The
reference's published table spans group path 724.67-732.14 km across
its four tracers; this notebook reproduces the **Cartesian** pair to
4-5 significant digits and then checks the **spherical** pair against
the exact Bouguer-invariant quadrature for a spherically stratified
medium — which shows the spherical ray genuinely reflects ~5 km higher
and flies ~1.3% farther than the reference's spherical tracers report
(they reuse the Cartesian turning point; see the analysis cell).
"""),
    ("code", SETUP),
    ("code", """\
alt, den, bmag, bpsi = day_profile()
f0, elev, mode = 14e6, 50.0, "X"
rows = {}
rows["cartesian Snell"] = prt.trace_ray_cartesian_snells(
    f0, elev, alt, den, bmag, bpsi, mode)
rows["spherical Snell"] = prt.trace_ray_spherical_snells(
    f0, elev, alt, den, bmag, bpsi, mode)

x_grid = np.linspace(0.0, 1000.0, 200)
z_grid = np.concatenate([[0.0], alt]) if alt[0] > 0 else alt
tile = lambda a, fill: np.tile(
    np.interp(z_grid, alt, a, left=fill)[:, None], (1, x_grid.size))
X = np.asarray(prt.find_X(tile(den, 0.0), f0))
Y = np.asarray(prt.find_Y(f0, tile(bmag, bmag[0])))
mu, mup = (np.asarray(a) for a in
           prt.find_mu_mup(X, Y, tile(bpsi, bpsi[0]), mode))
nag = prt.build_refractive_index_interpolator_cartesian(z_grid, x_grid,
                                                        mu)
mupf = prt.build_mup_function(mup_field=mup, x_grid=x_grid,
                              z_grid=z_grid, geometry="cartesian")
rows["cartesian gradient"] = prt.trace_ray_cartesian_gradient(
    nag, mupf, 0.0, 0.0, elev, 4000.0, step_km=1.0,
    z_max_km=float(z_grid[-1] - 1), x_min_km=0.0, x_max_km=1000.0,
    rtol=1e-7, atol=1e-9, max_step_km=2.0)
nag_s = prt.build_refractive_index_interpolator_spherical(z_grid, x_grid,
                                                          mu)
mupf_s = prt.build_mup_function(mup_field=mup, x_grid=x_grid,
                                z_grid=z_grid, geometry="spherical")
rows["spherical gradient"] = prt.trace_ray_spherical_gradient(
    nag_s, mupf_s, 0.0, 0.0, elev, 4000.0, z_ground_km=0.0,
    r_max_km=6371.0 + float(z_grid[-1] - 1), phi_min=-0.01,
    phi_max=1000.0 / 6371.0, step_km=1.0, rtol=1e-7, atol=1e-9,
    max_step_km=2.0)

print(f"{'tracer':>20} {'path [km]':>10} {'delay [ms]':>11} "
      f"{'range [km]':>11}")
for k, r in rows.items():
    print(f"{k:>20} {float(r['group_path_km']):10.2f} "
          f"{float(r['group_delay_sec'])*1e3:11.4f} "
          f"{float(r['ground_range_km']):11.2f}")
print("reference notebook:  cartesian 724.67 / 2.8841 / 553.48 (Snell)")
print("                     cartesian 732.03 / 2.9229 / 560.77 (grad)")
print("                     spherical 730.61 / 2.9152 / 559.43 (Snell)")
print("                     spherical 732.14 / 2.9234 (grad)")
"""),
    ("code", """\
# pairwise consistency: same-geometry tracers must agree tightly
def spread(a, b, key):
    va, vb = float(rows[a][key]), float(rows[b][key])
    return abs(va - vb) / (0.5 * (va + vb)) * 100.0

for key in ("group_path_km", "group_delay_sec", "ground_range_km"):
    sc = spread("cartesian Snell", "cartesian gradient", key)
    ss = spread("spherical Snell", "spherical gradient", key)
    print(f"{key:>18}: cartesian pair {sc:.2f}%  spherical pair {ss:.3f}%")
assert spread("spherical Snell", "spherical gradient",
              "group_path_km") < 0.1
"""),
    ("code", """\
# exact oracle for the spherical pair: in a spherically stratified
# medium, Bouguer's invariant mu*r*sin(zenith) = const gives the path
# in closed quadrature: ds = mu r dr / sqrt((mu r)^2 - p^2)
R = 6371.0
zf = np.linspace(0.0, 500.0, 200001)
X1 = np.asarray(prt.find_X(np.interp(zf, alt, den, left=0.0), f0))
Y1 = np.asarray(prt.find_Y(f0, np.interp(zf, alt, bmag, left=bmag[0])))
mu1 = np.asarray(prt.find_mu_mup(
    X1, Y1, np.interp(zf, alt, bpsi, left=bpsi[0]), mode)[0])
r = R + zf
g = mu1 * r
p = mu1[0] * R * np.cos(np.deg2rad(elev))
k = np.argmax((g <= p) & np.isfinite(g))
dr = zf[1] - zf[0]
s_main = np.trapezoid(g[:k] / np.sqrt(g[:k]**2 - p*p), dx=dr)
slope = (g[k] - g[k-1]) / dr
s_tail = np.sqrt(g[k-1]**2 - p*p) / (-slope)
s_exact = 2 * (s_main + s_tail)
print(f"spherical apex (exact):   {zf[k]:.2f} km  "
      f"(reference notebooks report ~216.3 = the CARTESIAN apex)")
print(f"group path (exact):       {s_exact:.2f} km")
print(f"group path (our tracers): "
      f"{float(rows['spherical Snell']['group_path_km']):.2f} / "
      f"{float(rows['spherical gradient']['group_path_km']):.2f} km")
err = abs(float(rows['spherical Snell']['group_path_km'])
          - s_exact) / s_exact
print(f"our spherical Snell vs exact: {err*100:.3f}%")
assert err < 0.002
"""),
    ("md", """\
**Conclusion.** Our Cartesian tracers reproduce the reference's
published values to 4-5 significant digits. Our spherical pair agrees
internally to <0.1% *and* with the exact Bouguer quadrature to <0.2%,
reflecting at the correct r-weighted turning point (μr = p), ~5.5 km
above the Cartesian one — spherical geometry lets the ray penetrate
deeper before the invariant saturates. The reference's spherical
tracers report the Cartesian apex (z ≈ 216.3 km in their printed
midpoints) and correspondingly shorter paths; the ~1.3% gap between our
spherical results and theirs is that physical difference, not
integration error.
"""),
]

# ---------------------------------------------------------------- 05
NOTEBOOKS["05_minimization.ipynb"] = [
    ("md", """\
# Ionogram inversion (minimization)

Equivalent of `Example_Minimization.ipynb`: fit hmF2 and B_bot so the
modelled ionogram matches observed virtual heights. The lmfit brute
grid becomes one vmapped XLA program; the headline capability is the
gradient retrieval (`retrieve_gradient`) with exact jacobians through
the whole differentiable operator.
"""),
    ("code", SETUP),
    ("code", """\
alt = np.arange(80.0, 700.0, 0.5)
bmag = np.full(alt.size, 3e-5)
bpsi = np.full(alt.size, 70.0)
E = {"Nm": 1.2e11, "hm": 110.0, "B_bot": 5.0, "B_top": 7.0}
F1 = {"P": 0.6}
freq = np.arange(2.0, 13.51, 0.25)
truth = {"Nm": float(prt.freq2den(13.5e6)) * 1.0001, "hm": 305.0,
         "B_bot": 46.0, "B_top": 40.0}
vh_obs, edp_true = prt.model_VH(truth, F1, E, freq, alt, bmag, bpsi,
                                n_points=150)
vh_obs = np.asarray(vh_obs)
guess = dict(truth, hm=truth["hm"] * 0.93, B_bot=truth["B_bot"] * 1.15)
print(f"truth  hmF2 {truth['hm']:.1f} km  B_bot {truth['B_bot']:.1f} km")
print(f"guess  hmF2 {guess['hm']:.1f} km  B_bot {guess['B_bot']:.1f} km")
"""),
    ("code", """\
vh_fit, edp_fit, F2_fit = prt.minimize_parameters(
    guess, F1, E, freq, vh_obs, alt, bmag, bpsi, method="brute",
    percent_sigma=20.0, step=1.0, n_points=150)
print(f"brute  hmF2 {float(F2_fit['hm']):.2f} km  "
      f"B_bot {float(F2_fit['B_bot']):.2f} km")
vh_g, edp_g, F2_g, hist = prt.retrieve_gradient(
    guess, F1, E, freq, vh_obs, alt, bmag, bpsi, n_points=150, steps=12)
print(f"LM     hmF2 {float(F2_g['hm']):.2f} km  "
      f"B_bot {float(F2_g['B_bot']):.2f} km  "
      f"(cost {hist[0]:.1e} -> {hist[-1]:.1e} in {len(hist)-1} steps)")
"""),
    ("code", """\
fig, ax = plt.subplots(1, 2, figsize=(10, 4))
ax[0].plot(freq, vh_obs, "k.", label="observed")
ax[0].plot(freq, np.asarray(vh_g), "-", label="LM fit")
ax[0].set_xlabel("frequency [MHz]"); ax[0].set_ylabel("vh [km]")
ax[0].legend(); ax[0].set_title("ionogram fit")
ax[1].plot(np.asarray(edp_true), alt, "k", label="truth")
ax[1].plot(np.asarray(edp_g), alt, "--", label="retrieved")
ax[1].set_xlabel("Ne [m$^{-3}$]"); ax[1].set_ylabel("altitude [km]")
ax[1].legend(); ax[1].set_title("electron density")
fig.tight_layout()
"""),
]

# ---------------------------------------------------------------- 06
NOTEBOOKS["06_input_generation.ipynb"] = [
    ("md", """\
# Input generation: climatology + IGRF

Equivalent of `Example_Generate_Input_Arrays.ipynb` and
`Example_Generate_2D_Input.ipynb`: 1-D site profiles and 2-D
great-circle slices from the built-in modip climatology (equatorial
anomaly, post-sunset enhancement — calibrated against the shipped PyIRI
parameter sets, see `docs/accuracy.md`) and the vendored IGRF-13
geomagnetic field (any epoch from 1900).
"""),
    ("code", SETUP),
    ("code", """\
alt = np.linspace(80.0, 700.0, 250)
site = prt.generate_input_1D(2025, 9, 1, 20.0, 30.0, -100.0, alt, 150.0)
print(f"foF2 {float(site['F2']['fo'][0]):.2f} MHz  "
      f"hmF2 {float(site['F2']['hm'][0]):.1f} km  "
      f"|B|(300 km) {site['bmag'][np.argmin(np.abs(alt-300))]*1e9:.0f} nT")
sl = prt.generate_input_2D(2025, 9, 1, 20.0, 30.0, -100.0, 100.0, alt,
                           3000.0, 135.0, 150.0)
print(f"2-D slice: den {sl['den'].shape} over {sl['xgrid'][-1]:.0f} km")
"""),
    ("code", """\
fig, ax = plt.subplots(1, 2, figsize=(11, 4))
ax[0].plot(site["den"], alt)
ax[0].set_xlabel("Ne [m$^{-3}$]"); ax[0].set_ylabel("altitude [km]")
ax[0].set_title("1-D site profile")
pc = ax[1].pcolormesh(sl["xgrid"], sl["zgrid"], sl["den"],
                      shading="auto")
fig.colorbar(pc, ax=ax[1], label="Ne [m$^{-3}$]")
ax[1].set_xlabel("ground range [km]"); ax[1].set_ylabel("altitude [km]")
ax[1].set_title("2-D great-circle slice")
fig.tight_layout()
"""),
    ("code", """\
# the equatorial anomaly in the modip frame (round-3 climatology)
lats = np.linspace(-40.0, 40.0, 81)
lons = np.full_like(lats, -150.0)
m = np.asarray(prt.envgen.modip_deg(2025, 9, 1, lats, lons))
F2d, _, _ = prt.envgen.climatology_parameters(2025, 9, 1, 0.0, lats,
                                              lons, 204.0)
F2n, _, _ = prt.envgen.climatology_parameters(2025, 9, 1, 8.5, lats,
                                              lons, 204.0)
fig, ax = plt.subplots(figsize=(7, 4))
ax.plot(m, np.asarray(F2d["fo"]), label="14 LT (day)")
ax.plot(m, np.asarray(F2n["fo"]), label="22.5 LT (post-sunset)")
ax.axvline(16, color="grey", lw=0.5); ax.axvline(-16, color="grey",
                                                 lw=0.5)
ax.set_xlabel("modip [deg]"); ax.set_ylabel("foF2 [MHz]")
ax.set_title("equatorial-anomaly crests at |modip| ≈ 16°")
ax.legend()
fig.tight_layout()
"""),
]

# ---------------------------------------------------------------- 07
NOTEBOOKS["07_true_height.ipynb"] = [
    ("md", """\
# True-height inversion: ionogram → Ne(h)

Capability beyond the reference: PyRayHF's `minimize_parameters` fits two
scalars (hmF2, B_bot) of an IRI-shaped layer (ref `library.py:672-825`) —
it cannot recover the profile itself. `pyrayhf_tpu.retrieve_profile` solves
the classical *true-height* problem (POLAN, Titheridge 1985) by lamination
on the full magnetoionic operator: reflection-height knots are placed
bottom-up, each by a guaranteed bisection on the monotone single-frequency
forward operator, all inside one `lax.scan`.

Classical caveats apply: ionization below the first echo is not sensed
(the *starting problem* — a `start_gap_km` ramp is assumed) and E-valleys
are invisible to a monotone profile.
"""),
    ("code", SETUP),
    ("code", """\
alt, den, bmag, bpsi = day_profile()
alt, den = np.asarray(alt, float), np.asarray(den, float)

# synthesize the "observed" O-mode ionogram from the known profile
freq = np.arange(1.6, 17.4, 0.2)
vh = np.asarray(prt.vertical_forward_operator(freq, den, bmag, bpsi,
                                              alt, mode="O"))
ok = np.isfinite(vh)
print(f"{ok.sum()} finite echoes, {freq[ok][0]:.1f}-{freq[ok][-1]:.1f} MHz")

out = prt.retrieve_profile(freq[ok], vh[ok], alt, bmag, bpsi, mode="O")
h = np.asarray(out["h_knots_km"]); ne = np.asarray(out["ne_knots_m3"])
print(f"K={h.size} knots, ionogram refit rms {float(out['rms_km']):.3f} km")

ipk = int(np.argmax(den))
h_true = np.interp(ne, den[:ipk + 1], alt[:ipk + 1])
err = h - h_true
print(f"true-height error: lowest {err[0]:+.2f} km (start-model bias), "
      f"median {np.median(err):+.2f} km, near-peak {err[-1]:+.2f} km")
"""),
    ("code", """\
fig, ax = plt.subplots(1, 2, figsize=(10, 4))
ax[0].plot(den / 1e12, alt, "k-", lw=2, label="true profile")
ax[0].plot(np.asarray(out["den_fit"]) / 1e12, alt, "--", color="tab:red",
           label="retrieved (lamination)")
ax[0].plot(ne / 1e12, h, ".", ms=4, color="tab:blue", label="knots")
ax[0].set_xlabel(r"$N_e$ [$10^{12}\\,$m$^{-3}$]")
ax[0].set_ylabel("altitude [km]")
ax[0].set_ylim(80, 450); ax[0].legend()
ax[1].plot(freq[ok], vh[ok], "k.", label="observed vh(f)")
ax[1].plot(freq[ok], np.asarray(out["vh_fit"]), "-", color="tab:red",
           lw=1, label="refit")
ax[1].plot(np.asarray(out["f_sorted_hz"]) / 1e6, h, "-",
           color="tab:blue", label="retrieved true height h(f)")
ax[1].set_xlabel("frequency [MHz]"); ax[1].set_ylabel("height [km]")
ax[1].legend(); fig.tight_layout()
"""),
    ("md", """\
The batched entry point `retrieve_profile_batch` vmaps the whole
lamination scan — a noisy-campaign batch inverts in a single launch.
"""),
    ("code", """\
# a campaign batch: 8 noisy traces (sigma = 1 km), one XLA launch
rng = np.random.default_rng(0)
traces = vh[ok][None, :] + rng.normal(0.0, 1.0, (8, int(ok.sum())))
outb = prt.retrieve_profile_batch(freq[ok], traces, alt, bmag, bpsi,
                                  mode="O")
rms = np.asarray(outb["rms_km"]); htop = np.asarray(outb["h_knots_km"])[:, -1]
print("refit rms [km]:", np.array2string(rms, precision=2))
print(f"top-knot height spread {htop.std():.2f} km (mean {htop.mean():.1f})")
"""),
]


# ---------------------------------------------------------------- 08
NOTEBOOKS["08_link_budget_muf.ipynb"] = [
    ("md", """\
# HF link budget, MUF and phase observables

Capabilities beyond the reference: the oblique homing fan
(`synthesize_oblique_ionogram`) assembles a full one-way link budget —
free-space spreading over the group path, D-region absorption, Fresnel
ground-bounce loss (`ground.py`) and ionospheric focusing gain — and
`muf.py` scales the vertical ionogram onto any link distance with the
exact inverse of the reference's curvature-corrected secant law
(`oblique_to_vertical`, ref `library.py:2697-2742`). Phase observables
(`vertical_phase_operator`, `faraday.py`) come from the same
Appleton–Hartree core.
"""),
    ("code", SETUP),
    ("code", """\
alt, den, bmag, bpsi = day_profile()
D = 2000.0
f0s = np.arange(8e6, 30e6, 1e6)
o = prt.synthesize_oblique_ionogram(f0s, D, alt, den, bmag, bpsi,
                                    geometry="spherical", n_elev=256,
                                    n_hops=2, ground="medium")
m = np.isfinite(np.asarray(o["delay_low_sec"]))
print(f"2-hop link MUF ~ {f0s[m][-1]/1e6:.0f} MHz; at "
      f"{f0s[m][0]/1e6:.0f} MHz the budget is "
      f"{float(np.asarray(o['link_loss_low_db'])[m][0]):.1f} dB "
      f"(abs {float(np.asarray(o['absorption_low_db'])[m][0]):.1f}, "
      f"ground {float(np.asarray(o['ground_loss_low_db'])[m][0]):.1f}, "
      f"focus {float(np.asarray(o['focusing_gain_low_db'])[m][0]):+.1f})")
"""),
    ("code", """\
fig, ax = plt.subplots(1, 2, figsize=(11, 4))
for leg, c in (("low", "tab:blue"), ("high", "tab:red")):
    ax[0].plot(f0s / 1e6, np.asarray(o[f"delay_{leg}_sec"]) * 1e3,
               ".-", color=c, label=f"{leg} ray")
    ax[1].plot(f0s / 1e6, np.asarray(o[f"link_loss_{leg}_db"]),
               ".-", color=c, label=f"{leg} ray")
ax[0].set_xlabel("frequency [MHz]"); ax[0].set_ylabel("delay [ms]")
ax[0].set_title(f"2-hop oblique ionogram, {D:.0f} km"); ax[0].legend()
ax[1].set_xlabel("frequency [MHz]")
ax[1].set_ylabel("one-way link loss [dB]")
ax[1].set_title("assembled budget (medium ground)"); ax[1].legend()
fig.tight_layout()
"""),
    ("md", """\
MUF(D) by transmission-curve scaling — the whole distance scan is one
broadcast, and the suite pins it within 5% of the ray-traced link MUF.
"""),
    ("code", """\
Ds = np.arange(500.0, 4001.0, 250.0)
muf = np.asarray(prt.muf_from_profile(Ds, den, bmag, bpsi, alt))
foF2 = float(prt.den2freq(np.max(den))) / 1e6
fig, ax = plt.subplots(figsize=(6.5, 4))
ax.plot(Ds, muf, "o-")
ax.axhline(foF2, color="grey", lw=0.8)
ax.annotate(f"foF2 = {foF2:.1f} MHz", (Ds[0], foF2 + 0.4))
ax.set_xlabel("link distance D [km]"); ax.set_ylabel("MUF(D) [MHz]")
ax.set_title("transmission-curve MUF")
fig.tight_layout()
m3000 = float(prt.muf_from_profile(3000.0, den, bmag, bpsi, alt))
print(f"M(3000)F2 = {m3000/foF2:.2f}")
"""),
    ("code", """\
# Faraday rotation through the whole ionosphere (exact O-X AH phase
# difference; the QL closed form is its high-frequency limit)
f = np.array([40e6, 100e6, 400e6, 1575.42e6])
om = np.asarray(prt.faraday_rotation_vertical(f, den, bmag, bpsi, alt))
for fi, oi in zip(f, om):
    print(f"{fi/1e6:8.1f} MHz: {oi:9.3f} rad ({np.degrees(oi):8.1f} deg)")
"""),
]


# ---------------------------------------------------------------- 09
NOTEBOOKS["09_trace3d.ipynb"] = [
    ("md", """\
# 3-D ray tracing through (alt, lat, lon) volumes

Capability beyond the reference (its most general tracer is a 2-D
great-circle slice, ref `library.py:2128-2337`): `trace3d.py` traces
rays through full 3-D electron-density volumes in Cartesian ECEF
coordinates, capturing the **cross-track deflection** that horizontal
gradients produce — rays leave the launch great circle, an effect no
slice tracer can represent. `generate_input_3D` builds matching
climatology + IGRF volumes.
"""),
    ("code", SETUP),
    ("code", """\
# climatology volume over the Caribbean sector, 20 UT
aalt = np.linspace(80.0, 600.0, 100)
lat = np.linspace(5.0, 45.0, 33)
lon = np.linspace(-90.0, -50.0, 33)
vol = prt.generate_input_3D(2025, 9, 1, 20.0, lat, lon, aalt, 150.0)
print("den volume", vol["den"].shape,
      f"foF2 range {np.sqrt(vol['F2']['Nm'].min()/1.24e10):.1f}-"
      f"{np.sqrt(vol['F2']['Nm'].max()/1.24e10):.1f} MHz")
field = prt.build_field_3d(aalt, lat, lon, vol["den"], vol["bmag"],
                           vol["bpsi"], 9e6, "O")
"""),
    ("code", """\
# one launch: a 3 x 5 (elevation x azimuth) fan from (35N, 75W)
els = np.array([15.0, 25.0, 35.0])
azs = np.array([150.0, 165.0, 180.0, 195.0, 210.0])
out = prt.trace_rays_3d(field, 35.0, -75.0, els, azs, step_km=2.0,
                        s_max_km=3000.0)
rng = np.asarray(out["ground_range_km"])
ct = np.asarray(out["cross_track_km"])
print("range [km] (el x az):"); print(np.round(rng, 0))
print("cross-track [km] — the out-of-plane physics:")
print(np.round(ct, 1))
"""),
    ("code", """\
fig, ax = plt.subplots(1, 2, figsize=(11, 4.2))
pc = ax[0].pcolormesh(lon, lat, np.sqrt(
    vol["F2"]["Nm"] / 1.24e10), shading="auto")
fig.colorbar(pc, ax=ax[0], label="foF2 [MHz]")
for i in range(els.size):
    for j in range(azs.size):
        ax[0].plot(np.asarray(out["lon"])[i, j],
                   np.asarray(out["lat"])[i, j], "w-", lw=0.7)
ax[0].plot(-75.0, 35.0, "r^", ms=8)
ax[0].set_xlabel("lon [deg]"); ax[0].set_ylabel("lat [deg]")
ax[0].set_title("ray ground tracks over the foF2 map")
for j, a in enumerate(azs):
    ax[1].plot(np.asarray(out["lat"])[1, j],
               np.asarray(out["alt"])[1, j], label=f"az {a:.0f}")
ax[1].set_ylim(0, 500)
ax[1].set_xlabel("lat [deg]"); ax[1].set_ylabel("alt [km]")
ax[1].set_title("el=25 ray altitude profiles"); ax[1].legend(fontsize=8)
fig.tight_layout()
"""),
]


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    names = sys.argv[1:] or sorted(NOTEBOOKS)
    for name in names:
        path = OUT / name
        with open(path, "w") as f:
            json.dump(nb(NOTEBOOKS[name]), f, indent=1)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
