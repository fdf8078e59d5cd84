#!/usr/bin/env python
"""Vertical forward operator: profile in, O+X ionogram out.

Mirrors the reference's Example_Vertical_Forward_Operator notebook: load the
day-side profile, synthesise the O-mode (200-point) and X-mode (20k-point)
ionograms, print a small table. Runs on CPU or TPU.
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


def load_profile():
    if REF.exists():
        return prt.load_input(REF)
    aalt = np.arange(80.0, 700.0, 1.0)
    return prt.generate_input_1D(2020, 6, 15, 17.0, 38.0, -77.0, aalt, 140.0)


def main():
    inp = load_profile()
    freqs = np.arange(1.0, 16.0, 0.1)
    vh_O = np.asarray(prt.vertical_forward_operator(
        freqs, inp["den"], inp["bmag"], inp["bpsi"], inp["alt"], mode="O"))
    vh_X = np.asarray(prt.vertical_forward_operator(
        freqs, inp["den"], inp["bmag"], inp["bpsi"], inp["alt"], mode="X",
        n_points=20000))
    print(f"{'f [MHz]':>8} {'vh_O [km]':>10} {'vh_X [km]':>10}")
    for i in range(0, len(freqs), 15):
        print(f"{freqs[i]:8.1f} {vh_O[i]:10.2f} {vh_X[i]:10.2f}")
    print(f"foF2 ≈ {freqs[np.isfinite(vh_O)][-1]:.1f} MHz "
          f"(last reflected O-mode frequency)")


if __name__ == "__main__":
    main()
