#!/usr/bin/env python
"""Generate behavioral golden outputs by RUNNING the reference implementation.

The reference library (`/root/reference/PyRayHF/library.py`) imports lmfit and
PyIRI at module scope but only *uses* them inside the model/retrieval/input-gen
functions. We install import stubs so the module loads, then exercise the
pure-NumPy/SciPy code paths (forward operator, magnetoionic core, all four ray
tracers, geodesy) on fixed workloads and record the outputs to
``tests/goldens/reference_goldens.npz``.

This records *behavior* only — no reference code is copied. The goldens pin
bit-level parity targets for the TPU-native reimplementation.

Run from the repo root:  python tools/gen_reference_goldens.py
"""

import pickle
import sys
import types
import pathlib

import numpy as np

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"
REF = pathlib.Path("/root/reference")


def _install_stubs():
    """Satisfy `import lmfit` / `import PyIRI` / `PyIRI.sh_library`."""
    lmfit = types.ModuleType("lmfit")
    lmfit.Parameters = object
    lmfit.minimize = None
    sys.modules.setdefault("lmfit", lmfit)

    pyiri = types.ModuleType("PyIRI")
    sh = types.ModuleType("PyIRI.sh_library")
    pyiri.sh_library = sh
    pyiri.main_library = types.ModuleType("PyIRI.main_library")
    pyiri.edp_update = types.ModuleType("PyIRI.edp_update")
    pyiri.igrf_library = types.ModuleType("PyIRI.igrf_library")
    pyiri.coeff_dir = ""
    sys.modules.setdefault("PyIRI", pyiri)
    sys.modules.setdefault("PyIRI.sh_library", sh)
    sys.modules.setdefault("PyIRI.main_library", pyiri.main_library)
    sys.modules.setdefault("PyIRI.edp_update", pyiri.edp_update)
    sys.modules.setdefault("PyIRI.igrf_library", pyiri.igrf_library)

    pkg = types.ModuleType("PyRayHF")
    import logging
    pkg.logger = logging.getLogger("PyRayHF_logger")
    pkg.__path__ = [str(REF / "PyRayHF")]
    sys.modules.setdefault("PyRayHF", pkg)


def _load_reference():
    _install_stubs()
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "PyRayHF.library", REF / "PyRayHF" / "library.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["PyRayHF.library"] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    ref = _load_reference()
    OUT.mkdir(parents=True, exist_ok=True)
    g = {}

    day = pickle.load(open(REF / "docs/tutorials/Example_Input_Day.p", "rb"))
    night = pickle.load(
        open(REF / "docs/tutorials/Example_Input_Night.p", "rb"))

    # ---- magnetoionic core on a dense (X, Y, psi) lattice, both modes ----
    Xs = np.linspace(0.0, 1.3, 53)
    Ys = np.array([0.0, 1e-13, 1e-3, 0.05, 0.17, 0.4, 0.9])
    psis = np.array([0.0, 13.0, 45.0, 61.5, 90.0])
    XX, YY, PP = np.meshgrid(Xs, Ys, psis, indexing="ij")
    for mode in "OX":
        mu, mup = ref.find_mu_mup(XX.ravel(), YY.ravel(), PP.ravel(), mode)
        g[f"mu_lattice_{mode}"] = mu
        g[f"mup_lattice_{mode}"] = mup
    g["mu_lattice_X_in"] = XX.ravel()
    g["mu_lattice_Y_in"] = YY.ravel()
    g["mu_lattice_psi_in"] = PP.ravel()

    # ---- vertical forward operator: README workloads on Day/Night ----
    freqs = np.arange(0.1, 17.5, 0.1)
    g["vfo_freqs"] = freqs
    for name, prof in [("day", day), ("night", night)]:
        for mode, npts in [("O", 200), ("X", 200), ("X", 20000), ("O", 50)]:
            vh = ref.vertical_forward_operator(
                freqs, prof["den"], prof["bmag"], prof["bpsi"], prof["alt"],
                mode=mode, n_points=npts)
            g[f"vfo_{name}_{mode}_{npts}"] = vh

    # ---- regridder internals on Day (O-mode, 200 pts) ----
    rg = ref.regrid_to_nonuniform_grid(
        freqs * 1e6, day["den"], day["bmag"], day["bpsi"], day["alt"],
        mode="O", n_points=200)
    for k in ["den", "bmag", "bpsi", "dist", "alt", "crit_height"]:
        g[f"regrid_day_O_{k}"] = rg[k]

    # ---- Snell tracers: fan over elevations × freqs on Day profile ----
    elevs = np.array([20.0, 35.0, 50.0, 65.0, 80.0])
    tfreqs = np.array([6e6, 10e6, 14e6])
    for mode in "OX":
        for tag, fn in [("cart", ref.trace_ray_cartesian_snells),
                        ("sph", ref.trace_ray_spherical_snells)]:
            res = np.zeros((len(tfreqs), len(elevs), 5))
            for i, f0 in enumerate(tfreqs):
                for j, el in enumerate(elevs):
                    r = fn(f0, el, day["alt"], day["den"], day["bmag"],
                           day["bpsi"], mode)
                    res[i, j] = [r["group_path_km"], r["group_delay_sec"],
                                 r["ground_range_km"], r["x_midpoint"],
                                 r["z_midpoint"]]
            g[f"snell_{tag}_{mode}"] = res
    g["snell_elevs"] = elevs
    g["snell_freqs"] = tfreqs

    # ---- gradient tracers on the synthetic Gaussian-layer ionosphere ----
    alt_km = np.linspace(0, 600, 200)
    Ne = 1e12 * np.exp(-(alt_km - 250.0) ** 2 / (2 * 60.0 ** 2))
    Babs = np.full_like(alt_km, 4e-5)
    bpsi = np.full_like(alt_km, 45.0)
    g["gauss_alt"] = alt_km
    g["gauss_Ne"] = Ne

    x_grid = np.linspace(0, 1000, 200)
    Ne_grid = np.tile(Ne[:, None], (1, x_grid.size))
    B_grid = np.tile(Babs[:, None], (1, x_grid.size))
    psi_grid = np.tile(bpsi[:, None], (1, x_grid.size))
    X2 = ref.find_X(Ne_grid, 10e6)
    Y2 = ref.find_Y(10e6, B_grid)
    mu2, mup2 = ref.find_mu_mup(X2, Y2, psi_grid, "O")
    g["gauss_mu_field"] = mu2
    g["gauss_mup_field"] = mup2
    g["gauss_x_grid"] = x_grid

    nag = ref.build_refractive_index_interpolator_cartesian(
        alt_km, x_grid, mu2)
    mupf = ref.build_mup_function(mup_field=mup2, x_grid=x_grid,
                                  z_grid=alt_km, geometry="cartesian")
    res = np.zeros((len(elevs), 5))
    for j, el in enumerate(elevs):
        r = ref.trace_ray_cartesian_gradient(
            n_and_grad=nag, mup_func=mupf, x0_km=0.0, z0_km=0.0,
            elevation_deg=el, s_max_km=4000.0, max_step_km=5.0,
            z_max_km=600.0, x_min_km=0.0, x_max_km=1000.0)
        res[j] = [r["group_path_km"], r["group_delay_sec"],
                  r["ground_range_km"], r["x_apex_km"], r["z_apex_km"]]
    g["grad_cart_O"] = res

    nag_s = ref.build_refractive_index_interpolator_spherical(
        z_grid=alt_km, x_grid=x_grid, n_field=mu2)
    mupf_s = ref.build_mup_function(mup_field=mup2, x_grid=x_grid,
                                    z_grid=alt_km, geometry="spherical")
    res = np.zeros((len(elevs), 5))
    for j, el in enumerate(elevs):
        r = ref.trace_ray_spherical_gradient(
            n_and_grad_rphi=nag_s, mup_func=mupf_s, x0_km=0.0, z0_km=0.0,
            elevation_deg=el, s_max_km=4000.0, max_step_km=2.0,
            r_max_km=6371.0 + 600.0, phi_min=-0.1, phi_max=1000.0 / 6371.0)
        res[j] = [r["group_path_km"], r["group_delay_sec"],
                  r["ground_range_km"], r["x_apex_km"], r["z_apex_km"]]
    g["grad_sph_O"] = res

    # ---- night-profile Snell tracers (evanescent-gap coverage) ----
    for mode in "OX":
        for tag, fn in [("cart", ref.trace_ray_cartesian_snells),
                        ("sph", ref.trace_ray_spherical_snells)]:
            res = np.zeros((len(tfreqs), len(elevs), 5))
            for i, f0 in enumerate(tfreqs):
                for j, el in enumerate(elevs):
                    r = fn(f0, el, night["alt"], night["den"],
                           night["bmag"], night["bpsi"], mode)
                    res[i, j] = [r["group_path_km"], r["group_delay_sec"],
                                 r["ground_range_km"], r["x_midpoint"],
                                 r["z_midpoint"]]
            g[f"snell_night_{tag}_{mode}"] = res

    # ---- X-mode gradient traces on the Gaussian-layer field ----
    Xx = ref.find_X(Ne_grid, 10e6)
    Yx = ref.find_Y(10e6, B_grid)
    mux, mupx = ref.find_mu_mup(Xx, Yx, psi_grid, "X")
    nag_x = ref.build_refractive_index_interpolator_cartesian(
        alt_km, x_grid, mux)
    mupf_x = ref.build_mup_function(mup_field=mupx, x_grid=x_grid,
                                    z_grid=alt_km, geometry="cartesian")
    res = np.zeros((len(elevs), 5))
    for j, el in enumerate(elevs):
        r = ref.trace_ray_cartesian_gradient(
            n_and_grad=nag_x, mup_func=mupf_x, x0_km=0.0, z0_km=0.0,
            elevation_deg=el, s_max_km=4000.0, max_step_km=5.0,
            z_max_km=600.0, x_min_km=0.0, x_max_km=1000.0)
        res[j] = [r["group_path_km"], r["group_delay_sec"],
                  r["ground_range_km"], r["x_apex_km"], r["z_apex_km"]]
    g["grad_cart_X"] = res
    g["gauss_mu_field_X"] = mux
    g["gauss_mup_field_X"] = mupx

    # ---- geodesy & oblique/vertical ----
    D = 600.0
    p = np.array([900.0, 1100.0, 1500.0])
    fo = np.array([5.0, 10.0, 15.0])
    fv, hv = ref.oblique_to_vertical(D, p, fo)
    g["obl2vert_fv"] = fv
    g["obl2vert_hv"] = hv
    lats = np.array([-75.0, -30.0, 0.0, 15.0, 89.0])
    g["earth_radius"] = ref.earth_radius_at_latitude(lats)
    g["earth_radius_lats"] = lats
    g["gcd"] = ref.calculate_gcd(np.array([10.0, -150.0]),
                                 np.array([45.0, 4.5]),
                                 np.array([30.0, -140.0]),
                                 np.array([50.0, 10.0]))
    g["azimuth"] = ref.azimuth_between_points(np.array([10.0, -150.0]),
                                              np.array([45.0, 4.5]),
                                              np.array([30.0, -140.0]),
                                              np.array([50.0, 10.0]))

    np.savez_compressed(OUT / "reference_goldens.npz", **g)
    print(f"wrote {OUT/'reference_goldens.npz'} with {len(g)} arrays")
    for k in sorted(g):
        a = np.asarray(g[k])
        print(f"  {k:28s} {a.shape} {a.dtype}")


if __name__ == "__main__":
    main()
