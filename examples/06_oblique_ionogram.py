#!/usr/bin/env python
"""Oblique ionogram for an HF link — batched T→R homing.

New capability beyond the reference: one launch traces the whole
(frequency × elevation) fan and returns the low/high (Pedersen) ray
delays landing at the target ground range, i.e. the oblique ionogram a
chirp sounder would record over the link, including the MUF nose.
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
    return prt.generate_input_1D(2020, 6, 15, 17.0, 38.0, -77.0, aalt,
                                 140.0)


def main():
    inp = load_profile()
    D = 1000.0                               # link ground range [km]
    f0s = np.arange(5e6, 26e6, 0.5e6)
    out = prt.synthesize_oblique_ionogram(
        f0s, D, inp["alt"], inp["den"], inp["bmag"], inp["bpsi"],
        geometry="spherical")
    dl = np.asarray(out["delay_low_sec"])
    dh = np.asarray(out["delay_high_sec"])
    el = np.asarray(out["elev_low_deg"])
    eh = np.asarray(out["elev_high_deg"])

    fin = np.isfinite(dl)
    muf = f0s[fin][-1] if fin.any() else np.nan
    print(f"oblique ionogram, {D:.0f} km link (spherical Earth):")
    print(f"{'f [MHz]':>8} {'low ms':>8} {'el low':>7} "
          f"{'high ms':>8} {'el high':>8}")
    for i in range(0, f0s.size, 4):
        row = [f0s[i] / 1e6, dl[i] * 1e3, el[i], dh[i] * 1e3, eh[i]]
        print(f"{row[0]:8.1f} {row[1]:8.3f} {row[2]:7.2f} "
              f"{row[3]:8.3f} {row[4]:8.2f}")
    print(f"link MUF ≈ {muf/1e6:.1f} MHz "
          f"(foF2 = {float(np.ravel(inp['F2']['fo'])[0]):.1f} MHz, "
          f"secant gain {muf/1e6/float(np.ravel(inp['F2']['fo'])[0]):.2f})")


if __name__ == "__main__":
    main()
