#!/usr/bin/env python
"""Non-parametric true-height inversion: ionogram → Ne(h).

New capability beyond the reference (PyRayHF's ``minimize_parameters``
fits two scalars of an IRI-shaped layer; it cannot recover the profile
itself). This example inverts an O-mode ionogram synthesized from the
reference's shipped day profile back into Ne(h) by POLAN-style
lamination on the full magnetoionic operator, then does the same for a
batch of perturbed ionograms in a single XLA launch.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import os
import time

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
    alt = np.asarray(inp["alt"], float)
    den = np.asarray(inp["den"], float)
    bmag, bpsi = inp["bmag"], inp["bpsi"]

    # synthesize the "observed" ionogram from the true profile
    freq = np.arange(1.6, 17.4, 0.2)
    vh = np.asarray(prt.vertical_forward_operator(freq, den, bmag, bpsi,
                                                  alt, mode="O"))
    ok = np.isfinite(vh)
    print(f"observed ionogram: {ok.sum()} finite of {freq.size} "
          f"frequencies ({freq[ok][0]:.1f}..{freq[ok][-1]:.1f} MHz)")

    t0 = time.time()
    out = prt.retrieve_profile(freq[ok], vh[ok], alt, bmag, bpsi,
                               mode="O")
    t1 = time.time()
    h = np.asarray(out["h_knots_km"])
    ne = np.asarray(out["ne_knots_m3"])
    print(f"inversion: K={h.size} knots, vh refit rms "
          f"{float(out['rms_km']):.3f} km, {t1 - t0:.1f} s "
          f"(compile included)")

    # compare retrieved reflection heights with the truth
    ipk = int(np.argmax(den))
    h_true = np.interp(ne, den[:ipk + 1], alt[:ipk + 1])
    err = h - h_true
    print("true-height error vs the known profile [km]:")
    print(f"  lowest knot {err[0]:+.2f} (start-model bias, classical), "
          f"median {np.median(err):+.2f}, near-peak {err[-1]:+.2f}")

    sel = np.linspace(0, h.size - 1, 7).astype(int)
    print("   f [MHz]   h_retr [km]  h_true [km]   Ne [m^-3]")
    for i in sel:
        print(f"   {np.asarray(out['f_sorted_hz'])[i] / 1e6:7.2f}   "
              f"{h[i]:9.2f}    {h_true[i]:9.2f}    {ne[i]:.3e}")

    # batched campaign: 8 perturbed traces, one launch
    rng = np.random.default_rng(0)
    batch = vh[ok][None, :] + rng.normal(0.0, 1.0, (8, ok.sum()))
    t0 = time.time()
    outb = prt.retrieve_profile_batch(freq[ok], batch, alt, bmag, bpsi,
                                      mode="O")
    t1 = time.time()
    rms = np.asarray(outb["rms_km"])
    hm = np.asarray(outb["h_knots_km"])[:, -1]
    print(f"\nbatched inversion of 8 noisy traces (sigma=1 km): "
          f"{t1 - t0:.1f} s")
    print(f"  refit rms [km]: {np.array2string(rms, precision=2)}")
    print(f"  top-knot height spread: {hm.std():.2f} km "
          f"(mean {hm.mean():.1f})")


if __name__ == "__main__":
    main()
