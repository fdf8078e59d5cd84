#!/usr/bin/env python
"""Collisional absorption and multi-hop HF links.

New capability beyond the reference (PyRayHF is lossless and single-hop):

* vertical-incidence absorption L(f) — the dB an ionosonde echo loses
  in the D region, on the same stretched reflection grid as the
  virtual-height operator;
* an oblique link budget: low/high-ray path absorption for a 1-hop and
  a 2-hop circuit over the same ground range, with the ionogram's
  delay/MUF structure.
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
    alt, den = inp["alt"], inp["den"]
    bmag, bpsi = inp["bmag"], inp["bpsi"]

    # --- vertical-incidence absorption (what an ionosonde echo loses) ---
    f = np.arange(2.0, 10.1, 1.0)
    for mode in ("O", "X"):
        L = np.asarray(prt.vertical_absorption_operator(
            f, den, bmag, bpsi, alt, mode=mode))
        row = "  ".join(f"{v:6.2f}" if np.isfinite(v) else "   nan"
                        for v in L)
        print(f"vertical two-way absorption {mode}-mode [dB] "
              f"at {f[0]:.0f}..{f[-1]:.0f} MHz:")
        print(f"  {row}")
    nu = np.asarray(prt.collision_frequency(np.array([70.0, 90.0, 110.0])))
    print(f"collision-frequency model: nu(70km)={nu[0]:.2e} "
          f"nu(90km)={nu[1]:.2e} nu(110km)={nu[2]:.2e} 1/s")

    # --- oblique link budget: 1 hop vs 2 hops over the same range ---
    # (2-hop bounces off medium dry ground — Fresnel loss, ground.py)
    D = 2400.0
    f0s = np.arange(6e6, 30e6, 2e6)
    print(f"\noblique link budget, {D:.0f} km (spherical Earth; total =")
    print("free-space over the group path + absorption + ground - focusing;")
    print("2-hop mid-bounce on 'medium' ground, gnd = its Fresnel dB):")
    print(f"{'f [MHz]':>8} | {'1-hop ms':>9} {'abs dB':>7} {'foc dB':>7} "
          f"{'tot dB':>7} | {'2-hop ms':>9} {'gnd dB':>7} {'tot dB':>7}")
    outs = {n: prt.synthesize_oblique_ionogram(
        f0s, D, alt, den, bmag, bpsi, geometry="spherical",
        n_elev=512, n_hops=n, ground="medium") for n in (1, 2)}
    for i in range(f0s.size):
        o1 = outs[1]
        dl = float(np.asarray(o1["delay_low_sec"])[i])
        if np.isfinite(dl):
            cols = [f"{f0s[i]/1e6:8.1f}",
                    f"{dl*1e3:9.3f} "
                    f"{float(np.asarray(o1['absorption_low_db'])[i]):7.2f} "
                    f"{float(np.asarray(o1['focusing_gain_low_db'])[i]):+7.2f} "
                    f"{float(np.asarray(o1['link_loss_low_db'])[i]):7.1f}"]
        else:
            cols = [f"{f0s[i]/1e6:8.1f}",
                    f"{'--':>9} {'--':>7} {'--':>7} {'--':>7}"]
        dl2 = float(np.asarray(outs[2]["delay_low_sec"])[i])
        cols.append(
            f"{dl2*1e3:9.3f} "
            f"{float(np.asarray(outs[2]['ground_loss_low_db'])[i]):7.2f} "
            f"{float(np.asarray(outs[2]['link_loss_low_db'])[i]):7.1f}"
            if np.isfinite(dl2) else f"{'--':>9} {'--':>7} {'--':>7}")
        print(" | ".join(cols))
    for n in (1, 2):
        dl = np.asarray(outs[n]["delay_low_sec"])
        fin = np.isfinite(dl)
        muf = f0s[fin][-1] / 1e6 if fin.any() else np.nan
        print(f"{n}-hop link MUF ≈ {muf:.0f} MHz")


if __name__ == "__main__":
    main()
