#!/usr/bin/env python
"""All four oblique tracers on one ray — the reference's verification setup.

Mirrors Example_PyRayHF_Raytracing_Verification: trace the O+X pair at
14 MHz / 50 deg elevation with the Cartesian/spherical Snell tracers and the
gradient-ODE tracers, and print the cross-solver comparison table.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import os
import jax
if os.environ.get("PYRAYHF_EXAMPLES_TPU") != "1":
    # examples default to host CPU (the tunnelled TPU's remote compile is
    # slow for one-shot scripts); set PYRAYHF_EXAMPLES_TPU=1 to opt in
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import pyrayhf_tpu as prt

REF = pathlib.Path("/root/reference/docs/tutorials/Example_Input_Day.p")


def main():
    if REF.exists():
        inp = prt.load_input(REF)
        alt, Ne, Babs, bpsi = (inp[k] for k in ("alt", "den", "bmag", "bpsi"))
    else:
        alt = np.linspace(0.0, 600.0, 200)
        Ne = 1e12 * np.exp(-(alt - 250.0) ** 2 / (2 * 60.0 ** 2))
        Babs = np.full_like(alt, 4e-5)
        bpsi = np.full_like(alt, 45.0)

    f0, elev = 14e6, 50.0
    rows = []
    for mode in "OX":
        rc = prt.trace_ray_cartesian_snells(f0, elev, alt, Ne, Babs, bpsi,
                                            mode)
        rs = prt.trace_ray_spherical_snells(f0, elev, alt, Ne, Babs, bpsi,
                                            mode)
        rows += [(f"cart-snell/{mode}", rc), (f"sph-snell/{mode}", rs)]

    # gradient tracers need a 2-D field; replicate the profile horizontally
    x_grid = np.linspace(0, 1000, 200)
    z_grid = alt if alt[0] == 0 else np.concatenate([[0.0], alt])
    NeG = np.interp(z_grid, alt, Ne)
    Xf = np.asarray(prt.find_X(np.tile(NeG[:, None], (1, 200)), f0))
    Yf = np.asarray(prt.find_Y(f0, np.tile(
        np.interp(z_grid, alt, Babs)[:, None], (1, 200))))
    psiG = np.tile(np.interp(z_grid, alt, bpsi)[:, None], (1, 200))
    mu, mup = prt.find_mu_mup(Xf, Yf, psiG, "O")
    nag = prt.build_refractive_index_interpolator_cartesian(
        z_grid, x_grid, np.asarray(mu))
    mupf = prt.build_mup_function(mup_field=np.asarray(mup), x_grid=x_grid,
                                  z_grid=z_grid, geometry="cartesian")
    rg = prt.trace_ray_cartesian_gradient(nag, mupf, 0.0, 0.0, elev, 4000.0,
                                          step_km=1.0, z_max_km=float(
                                              z_grid[-1] - 1),
                                          x_min_km=0.0, x_max_km=1000.0)
    rows.append(("cart-grad/O", rg))

    print(f"{'tracer':>14} {'path [km]':>10} {'delay [ms]':>11} "
          f"{'range [km]':>11}")
    for name, r in rows:
        print(f"{name:>14} {float(r['group_path_km']):10.2f} "
              f"{float(r['group_delay_sec'])*1e3:11.4f} "
              f"{float(r['ground_range_km']):11.2f}")

    # batched fan: every (freq, elevation) combination in ONE launch
    fan = prt.trace_rays_cartesian_snells(
        np.array([6e6, 10e6, 14e6]), np.array([20.0, 35.0, 50.0, 65.0]),
        alt, Ne, Babs, bpsi, "O")
    rng = np.asarray(fan["ground_range_km"])
    print("\nbatched fan ground ranges [km] (rows=freq, cols=elev):")
    print(np.round(rng, 1))


if __name__ == "__main__":
    main()
