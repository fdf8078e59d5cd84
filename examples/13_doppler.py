#!/usr/bin/env python
"""HF Doppler sounding: the ionogram's time derivative, exactly.

Beyond-the-reference workflow (PyRayHF has no Doppler product): given the
electron-density tendency dNe/dt, the vertical-incidence Doppler shift of
every sounding frequency is the `jax.jvp` of the phase-height operator —
one linearised forward pass, no finite-difference step to tune, and the
motion of the reflection height is differentiated exactly through the
per-frequency regrid.

Two scenarios on the shipped day profile:
  * uniform uplift at 20 m/s (post-sunset ExB-like): every frequency
    red-shifts, f_D → -2 f v / c in the mirror limit;
  * a TID passing through (sinusoidal dNe/dt): the Doppler sweep changes
    sign with the phase of the perturbation at each reflection height —
    exactly what a Doppler ionosonde (e.g. a Digisonde drift mode) sees.
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
from pyrayhf_tpu.constants import C_KM_S

REF = pathlib.Path("/root/reference/docs/tutorials/Example_Input_Day.p")


def load_profile():
    if REF.exists():
        import pickle
        with open(REF, "rb") as f:
            d = pickle.load(f)
        return (np.asarray(d["alt"], float), np.asarray(d["den"], float),
                np.asarray(d["bmag"], float), np.asarray(d["bpsi"], float))
    alt = np.linspace(80.0, 700.0, 620)
    den = 2.5e12 * np.exp(-((alt - 320.0) / 80.0) ** 2)
    return alt, den, np.full_like(alt, 4.5e-5), np.full_like(alt, 35.0)


def main():
    alt, den, bmag, bpsi = load_profile()
    freqs = np.arange(2.0, 13.0, 1.0)

    # --- scenario 1: uniform uplift at v = 20 m/s ---------------------
    v = 0.02                                   # km/s
    dden_dt = -v * np.gradient(den, alt)
    print("== uniform uplift, v = 20 m/s ==")
    print(f"{'f [MHz]':>8} {'h_p [km]':>9} {'f_D [Hz]':>9} {'-2fv/c [Hz]':>12}")
    for mode in ("O", "X"):
        out = prt.doppler_shift_vertical(freqs, den, dden_dt, bmag, bpsi,
                                         alt, mode=mode)
        fd = np.asarray(out["doppler_hz"])
        hp = np.asarray(out["phase_height_km"])
        print(f"-- mode {mode}")
        for i, f in enumerate(freqs):
            mirror = -2.0 * f * 1e6 * v / C_KM_S
            print(f"{f:8.1f} {hp[i]:9.2f} {fd[i]:9.3f} {mirror:12.3f}")

    # --- scenario 2: a TID (150-km vertical wavelength) ----------------
    dden_tid = den * 2e-3 * np.sin(2 * np.pi * (alt - alt[0]) / 150.0)
    out = prt.doppler_shift_vertical(freqs, den, dden_tid, bmag, bpsi,
                                     alt, mode="O")
    fd = np.asarray(out["doppler_hz"])
    print("\n== TID dNe/dt (0.2%/s amplitude, 150-km wavelength), O mode ==")
    print("f [MHz]:", " ".join(f"{f:6.1f}" for f in freqs))
    print("f_D [Hz]:", " ".join(f"{x:6.2f}" for x in fd))
    signs = np.sign(fd[np.isfinite(fd)])
    print(f"sign changes across the sweep: {int((np.diff(signs) != 0).sum())}"
          " (the TID phase sampled at each reflection height)")


if __name__ == "__main__":
    main()
