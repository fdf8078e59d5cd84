#!/usr/bin/env python
"""Oblique-ionogram inversion: recover the midpoint profile from a link.

No reference equivalent: PyRayHF inverts vertical ionograms only
(minimize_parameters, ref library.py:672-825). Here a 900-km oblique
sounding (low + high-ray group delays vs frequency) is inverted for the
midpoint F2 layer by Levenberg-Marquardt on exact AD jacobians through
the whole Snell homing fan (pyrayhf_tpu.retrieve_from_oblique).
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
from pyrayhf_tpu.retrieval import _build_edp


def main():
    alt = np.linspace(80.0, 600.0, 261)
    bmag = np.full(alt.size, 4.5e-5)
    bpsi = np.full(alt.size, 40.0)
    F1 = {"P": 0.0}
    E = {"Nm": 5e10, "hm": 110.0, "B_bot": 5.0, "B_top": 7.0}
    D_km = 900.0
    f0s = np.linspace(5e6, 14e6, 12)

    # ---- "truth" ionosphere and the observed oblique trace --------------
    truth = {"Nm": 9e11, "hm": 310.0, "B_bot": 48.0, "B_top": 60.0}
    EDP_t, _ = _build_edp(truth, F1, E, alt, "B_bot")
    obs = prt.synthesize_oblique_ionogram(
        f0s, D_km, alt, np.asarray(EDP_t), bmag, bpsi, mode="O",
        geometry="spherical", n_elev=256)
    d_lo = np.asarray(obs["delay_low_sec"])
    d_hi = np.asarray(obs["delay_high_sec"])
    print(f"link D = {D_km} km, {np.isfinite(d_lo).sum()} echoes "
          f"below the link MUF")

    # ---- invert from a perturbed prior ----------------------------------
    prior = {"Nm": 6e11, "hm": 270.0, "B_bot": 38.0, "B_top": 60.0}
    d_fit, d_hi_fit, EDP_f, F2_fit, hist = prt.retrieve_from_oblique(
        prior, F1, E, f0s, d_lo, D_km, alt, bmag, bpsi, mode="O",
        geometry="spherical", n_elev=256, steps=14,
        delay_high_obs_sec=d_hi)

    print("\n  param     truth      prior      fitted     rel err")
    for k, t in (("NmF2", truth["Nm"]), ("hmF2", truth["hm"]),
                 ("B_bot", truth["B_bot"])):
        kk = {"NmF2": "Nm", "hmF2": "hm", "B_bot": "B_bot"}[k]
        f = F2_fit[kk]
        print(f"  {k:<8}{t:>10.4g} {prior[kk]:>10.4g} {f:>10.4g}"
              f"  {abs(f / t - 1):.2e}")
    m = np.isfinite(d_lo) & np.isfinite(d_fit)
    rms = np.sqrt(np.mean((d_fit[m] - d_lo[m]) ** 2))
    print(f"\n  low-ray delay rms misfit: {rms * 1e6:.3f} us over "
          f"{m.sum()} frequencies")
    print(f"  LM cost trace [ms^2]: {np.array2string(hist, precision=3)}")

    print("\n  f [MHz]   obs low [ms]   fit low [ms]   obs high [ms]  "
          "fit high [ms]")
    for i, f in enumerate(f0s):
        print(f"  {f / 1e6:6.2f}   {d_lo[i] * 1e3:>10.4f}   "
              f"{d_fit[i] * 1e3:>10.4f}   {d_hi[i] * 1e3:>11.4f}   "
              f"{d_hi_fit[i] * 1e3:>10.4f}")


if __name__ == "__main__":
    main()
