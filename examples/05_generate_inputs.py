#!/usr/bin/env python
"""Input generation: 1-D site profile and 2-D great-circle slice.

Mirrors the reference's Example_Generate_Input_Arrays /
Example_Generate_2D_Input notebooks (ref library.py:2458-2694): build
ray-tracing inputs from date/location/F10.7 — |B| and ψ from the vendored
full IGRF-13 (degree 13), layer parameters from the documented analytic
climatology (PyIRI's CCIR/SHU2015 databases are not installable here; see
pyrayhf_tpu/envgen.py and tests/test_envgen.py for how the climatology is
validated against the reference's shipped PyIRI points).
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


def main():
    year, month, day, UT = 2025, 9, 1, 20.0
    tlat, tlon, f107 = 38.0, -77.0, 140.0
    aalt = np.arange(80.0, 700.0, 2.0)

    # ---- 1-D input at the transmitter site ----
    inp = prt.generate_input_1D(year, month, day, UT, tlat, tlon, aalt,
                                f107)
    print(f"1-D input at ({tlat}, {tlon}) {year}-{month:02d}-{day:02d} "
          f"UT{UT:.0f} F10.7={f107}")
    print(f"  foF2 = {float(np.ravel(inp['F2']['fo'])[0]):6.2f} MHz   "
          f"hmF2 = {float(np.ravel(inp['F2']['hm'])[0]):6.1f} km")
    print(f"  foE  = {float(np.ravel(inp['E']['fo'])[0]):6.2f} MHz   "
          f"|B|(110 km) = {inp['bmag'][15]*1e9:8.1f} nT   "
          f"psi = {inp['bpsi'][15]:5.1f} deg")
    print(f"  peak Ne = {inp['den'].max():.3e} m^-3 at "
          f"{aalt[int(np.argmax(inp['den']))]:.0f} km")

    # run the generated profile straight through the forward operator
    freqs = np.arange(1.0, 12.01, 0.5)
    vh = np.asarray(prt.vertical_forward_operator(
        freqs, inp["den"], inp["bmag"], inp["bpsi"], inp["alt"]))
    nfin = int(np.isfinite(vh).sum())
    print(f"  O-mode ionogram: {nfin}/{freqs.size} frequencies reflect; "
          f"vh({freqs[0]:.1f} MHz) = {vh[0]:.1f} km")

    # ---- 2-D great-circle slice (transmitter -> 1000 km at azimuth 45) ----
    out2 = prt.generate_input_2D(year, month, day, UT, tlat, tlon,
                                 dx=50.0, aalt=aalt, gcd=1000.0, az=45.0,
                                 F107=f107)
    den2 = out2["den"]
    print(f"2-D slice: den grid {den2.shape} (alt x range), "
          f"x in [0, {out2['xgrid'][-1]:.0f}] km, "
          f"endpoint ({out2['xlat'][-1]:.2f}, {out2['xlon'][-1]:.2f})")
    print(f"  peak Ne along slice: {den2.max():.3e} m^-3; "
          f"|B| range [{out2['bmag'].min()*1e9:.0f}, "
          f"{out2['bmag'].max()*1e9:.0f}] nT")


if __name__ == "__main__":
    main()
