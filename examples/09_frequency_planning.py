#!/usr/bin/env python
"""Frequency planning: MUF(D), phase observables and Faraday rotation.

Beyond-the-reference workflow on the shipped day profile:

* MUF(D) scan by transmission-curve scaling of the synthetic vertical
  ionogram (muf.py — the classical inverse of the reference's
  ``oblique_to_vertical`` secant law), cross-checked at one distance
  against the full ray-traced link MUF;
* phase height vs virtual height (``vertical_phase_operator``);
* transionospheric Faraday rotation from the exact O−X Appleton–Hartree
  phase difference (``faraday.py``).
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import os
import jax
if os.environ.get("PYRAYHF_EXAMPLES_TPU") != "1":
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
    alt, den = inp["alt"], inp["den"]
    bmag, bpsi = inp["bmag"], inp["bpsi"]
    foF2 = float(prt.den2freq(den.max())) / 1e6
    print(f"profile foF2 = {foF2:.2f} MHz")

    # --- MUF(D) scan (one broadcast launch over all distances) ---
    D = np.arange(500.0, 4001.0, 500.0)
    muf = np.asarray(prt.muf_from_profile(D, den, bmag, bpsi, alt))
    print("\nMUF(D) by transmission-curve scaling:")
    print("  D [km] :", "  ".join(f"{d:6.0f}" for d in D))
    print("  MUF/MHz:", "  ".join(f"{m:6.2f}" for m in muf))
    m3000 = float(prt.muf_from_profile(3000.0, den, bmag, bpsi, alt))
    print("  M(3000)F2 factor:", f"{m3000/foF2:.3f}")

    # cross-check vs the ray-traced link MUF at 2000 km
    f0s = np.arange(10e6, 40e6, 0.5e6)
    o = prt.synthesize_oblique_ionogram(f0s, 2000.0, alt, den, bmag, bpsi,
                                        geometry="spherical", n_elev=256)
    fin = np.isfinite(np.asarray(o["delay_low_sec"]))
    link = f0s[fin][-1] / 1e6
    m2000 = float(prt.muf_from_profile(2000.0, den, bmag, bpsi, alt))
    print(f"  2000 km: secant-law {m2000:.2f} MHz vs ray-traced "
          f"{link:.2f} MHz ({100*(m2000/link-1):+.1f}%)")

    # --- phase height vs virtual height ---
    freqs = np.array([3.0, 5.0, 7.0, 9.0])
    vh = np.asarray(prt.vertical_forward_operator(freqs, den, bmag, bpsi,
                                                  alt))
    hp = np.asarray(prt.vertical_phase_operator(freqs, den, bmag, bpsi,
                                                alt))
    print("\nphase height h_p <= virtual height h' (both [km]):")
    print("  f [MHz]:", "  ".join(f"{f:6.1f}" for f in freqs))
    print("  h_p    :", "  ".join(f"{v:6.1f}" for v in hp))
    print("  h'     :", "  ".join(f"{v:6.1f}" for v in vh))

    # --- Faraday rotation through the whole ionosphere ---
    f = np.array([40e6, 100e6, 400e6, 1575.42e6])   # HF .. GPS L1
    om = np.asarray(prt.faraday_rotation_vertical(f, den, bmag, bpsi, alt))
    print("\none-way vertical Faraday rotation (exact Appleton-Hartree):")
    for fi, oi in zip(f, om):
        print(f"  {fi/1e6:8.2f} MHz: {oi:10.4f} rad = "
              f"{np.degrees(oi):9.2f} deg")


if __name__ == "__main__":
    main()
