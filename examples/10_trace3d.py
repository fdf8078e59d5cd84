#!/usr/bin/env python
"""3-D magnetoionic ray tracing (beyond the reference's 2-D tracers).

Builds a 3-D electron-density volume — the shipped day profile modulated
by a horizontal gradient shaped like an equatorial-anomaly crest — and
traces an (elevation × azimuth) fan through it in ONE launch, showing
the cross-track deflection that only 3-D tracing can capture.
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
    alt, den = np.asarray(inp["alt"]), np.asarray(inp["den"])
    bmag, bpsi = np.asarray(inp["bmag"]), np.asarray(inp["bpsi"])

    lat = np.linspace(10.0, 45.0, 36)
    lon = np.linspace(-90.0, -50.0, 41)
    shape = (alt.size, lat.size, lon.size)
    # a +40% density ridge centred at lon 65W (terminator-like EAST-WEST
    # gradient): for a north-south ray this gradient is CROSS-track — the
    # out-of-plane physics the 2-D tracers cannot represent
    ridge = 1.0 + 0.4 * np.exp(-((lon + 65.0) / 8.0) ** 2)
    Ne = np.broadcast_to(den[:, None, None], shape) * ridge[None, None, :]
    field = prt.build_field_3d(alt, lat, lon, Ne,
                               np.broadcast_to(bmag[:, None, None], shape),
                               np.broadcast_to(bpsi[:, None, None], shape),
                               9e6, "O")

    # one launch: 3 elevations x 5 azimuths from (38N, 72W) — west flank
    # of the ridge, so southbound rays feel a westward-pointing ∇μ
    els = np.array([20.0, 30.0, 40.0])
    azs = np.array([150.0, 165.0, 180.0, 195.0, 210.0])  # around south
    out = prt.trace_rays_3d(field, 38.0, -72.0, els, azs, step_km=2.0,
                            s_max_km=3000.0)
    rng = np.asarray(out["ground_range_km"])
    ct = np.asarray(out["cross_track_km"])
    ab = np.asarray(out["absorption_db"])
    print("ground range [km] / cross-track [km] (rows: elev, cols: az):")
    print("        " + "  ".join(f"az={a:5.0f}" for a in azs))
    for i, el in enumerate(els):
        cells = [f"{rng[i, j]:5.0f}/{ct[i, j]:+5.1f}"
                 if np.isfinite(rng[i, j]) else "   --  "
                 for j in range(azs.size)]
        print(f"el={el:4.0f} " + "  ".join(cells))
    print("\nthe east-west density ridge bends every southbound ray WEST")
    print("(positive cross-track = right of the launch azimuth, toward")
    print("lower density / higher mu) — invisible to any 2-D slice tracer.")
    print("absorption at el=20: "
          + "  ".join(f"{a:.1f}" for a in ab[0]) + " dB")

    # point-to-point homing THROUGH the ridge: solves elevation AND the
    # gradient-corrected launch bearing
    rx = (33.0, -72.0)
    h = prt.home_ray_3d(field, 38.0, -72.0, *rx, n_elev=64, n_az=11,
                        az_span_deg=6.0, step_km=2.0)
    print(f"\nhoming (38N,72W) -> ({rx[0]:.0f}N,{-rx[1]:.0f}W), "
          f"D = {float(h['range_km']):.0f} km:")
    print(f"  low ray : elev {float(h['elev_low_deg']):6.2f} deg, "
          f"azimuth offset {float(h['azimuth_offset_low_deg']):+.3f} deg, "
          f"delay {float(h['delay_low_sec'])*1e3:.3f} ms")
    o = prt.trace_ray_3d(field, 38.0, -72.0, float(h["elev_low_deg"]),
                         float(h["azimuth_low_deg"]), step_km=2.0)
    miss = np.deg2rad(float(prt.calculate_gcd(
        float(o["landing_lon_deg"]), float(o["landing_lat_deg"]),
        rx[1], rx[0]))) * 6371.0
    print(f"  re-traced landing miss from the receiver: {miss:.2f} km")

    # uniform-field control: cross-track collapses to machine zero
    f0 = prt.build_field_3d(alt, lat, lon,
                            np.broadcast_to(den[:, None, None], shape),
                            np.broadcast_to(bmag[:, None, None], shape),
                            np.broadcast_to(bpsi[:, None, None], shape),
                            9e6, "O")
    o = prt.trace_ray_3d(f0, 38.0, -72.0, 30.0, 210.0, step_km=2.0)
    print(f"\nuniform-field control: cross-track = "
          f"{float(o['cross_track_km']):.2e} km (machine zero)")


if __name__ == "__main__":
    main()
