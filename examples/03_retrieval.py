#!/usr/bin/env python
"""Ionogram inversion: brute grid vs gradient (Levenberg-Marquardt).

Mirrors Example_Minimization: build a background, perturb it into a 'truth',
synthesise observations, then recover the truth parameters two ways.
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
from pyrayhf_tpu.magnetoionic import freq2den

REF = pathlib.Path("/root/reference/docs/tutorials/Example_Input_Day.p")


def main():
    inp = prt.load_input(REF) if REF.exists() else prt.generate_input_1D(
        2020, 6, 15, 17.0, 38.0, -77.0, np.arange(80.0, 700.0, 1.0), 140.0)
    sc = lambda d: {k: float(np.ravel(v)[0]) for k, v in d.items()}
    F2, F1, E = sc(inp["F2"]), sc(inp["F1"]), sc(inp["E"])

    freqs = np.arange(2.0, 13.51, 0.25)
    alt = np.arange(80.0, 700.0, 0.25)
    bmag = np.full(alt.size, 3e-5)
    bpsi = np.full(alt.size, 70.0)
    F2_truth = dict(F2, Nm=float(freq2den(13.5e6)) * 1.0001,
                    hm=F2["hm"] - 12.0, B_bot=F2["B_bot"] + 4.0)
    vh_obs, _ = prt.model_VH({k: np.array([[v]]) for k, v in
                              F2_truth.items()}, F1, E, freqs, alt, bmag,
                             bpsi)
    vh_obs = np.asarray(vh_obs)
    F2_in = {k: np.array([[v]]) for k, v in F2.items()}

    _, _, F2_b = prt.minimize_parameters(F2_in, F1, E, freqs, vh_obs, alt,
                                         bmag, bpsi, percent_sigma=10.0,
                                         step=2.0)
    _, _, F2_p = prt.minimize_parameters(F2_in, F1, E, freqs, vh_obs, alt,
                                         bmag, bpsi, method="powell",
                                         percent_sigma=10.0)
    _, _, F2_g, hist = prt.retrieve_gradient(F2_in, F1, E, freqs, vh_obs,
                                             alt, bmag, bpsi)
    print(f"{'param':>6} {'truth':>10} {'brute':>10} {'powell':>10} "
          f"{'gradient-LM':>12}")
    for k in ("hm", "B_bot"):
        print(f"{k:>6} {F2_truth[k]:10.3f} "
              f"{float(np.ravel(F2_b[k])[0]):10.3f} "
              f"{float(np.ravel(F2_p[k])[0]):10.3f} "
              f"{float(np.ravel(F2_g[k])[0]):12.3f}")
    print(f"LM converged in {len(hist)} iterations "
          f"(cost {hist[0]:.2e} -> {hist[-1]:.2e})")


if __name__ == "__main__":
    main()
