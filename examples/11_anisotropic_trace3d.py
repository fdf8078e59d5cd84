#!/usr/bin/env python
"""Anisotropic 3-D ray tracing: the full Haselgrove dispersion surface.

Every other tracer in this package (and every tracer in the reference,
ref ``library.py:1764-2337``) evaluates the Appleton–Hartree index at
the VERTICAL-incidence wave-normal-to-B angle per column and follows
∇μ of that scalar field. This example drives `trace3d_aniso`, which
drops that convention: ψ comes from the instantaneous wave normal and
the local IGRF vector, the ray follows the GROUP direction of the
anisotropic dispersion relation, and the group delay is the exact
ω-derivative. It shows the two physical effects only this tracer
carries — O/X cross-track splitting on an eastward link, and the
measured (small) error of the fixed-ψ convention.
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

F0 = 8e6


def main():
    # parabolic F layer + a daytime D-region ledge (~2e9 m^-3 at 80 km,
    # where nu ~ 1e6-1e7 s^-1 — this is what the absorption channel
    # actually integrates; without it every loss column prints 0.00)
    # on a regional grid; B from the in-repo IGRF
    alt = np.linspace(60.0, 600.0, 109)
    lat = np.linspace(20.0, 60.0, 21)
    lon = np.linspace(-20.0, 20.0, 21)
    ne1 = (1.0e12 * np.maximum(0.0, 1.0 - ((alt - 300.0) / 120.0) ** 2)
           + 2.0e9 * np.exp(-((alt - 80.0) / 9.0) ** 2))
    Ne = np.broadcast_to(ne1[:, None, None],
                         (alt.size, lat.size, lon.size)).copy()
    bn, be, bd = prt.igrf_volume(alt, lat, lon)
    field = prt.build_field_3d_aniso(alt, lat, lon, Ne, bn, be, bd)
    # ONE field dict serves every frequency and mode (the fixed-psi
    # builder would need one volume per (f, mode))

    print(f"eastward link at {F0/1e6:.0f} MHz from (30N, 0E), el=25:")
    print(f"{'mode':>6} {'range km':>9} {'delay ms':>9} {'cross km':>9} "
          f"{'phase km':>9} {'loss dB':>8}")
    res = {}
    for mode in ("O", "X"):
        r = prt.trace_ray_3d_anisotropic(field, 30.0, 0.0, 25.0, 90.0,
                                         F0, mode=mode, step_km=2.0,
                                         s_max_km=2600.0)
        res[mode] = r
        print(f"{mode:>6} {float(r['ground_range_km']):9.1f} "
              f"{float(r['group_delay_sec'])*1e3:9.4f} "
              f"{float(r['cross_track_km']):+9.2f} "
              f"{float(r['phase_path_km']):9.1f} "
              f"{float(r['absorption_db']):8.2f}")
    print("\nX absorbs more than O through the same D region (the omega")
    print("- omega_L denominator, Davies 7.20) — the loss column above is")
    print("the anisotropic path's own kappa integral, nonzero and")
    print("mode-ordered. O and X also deflect OUT OF PLANE in opposite")
    print("senses (the sign of the u x B coupling) — a mode split no")
    print("fixed-psi tracer or 2-D slice can produce. |u| rides the")
    print("dispersion shell (<= 1):")
    for mode in ("O", "X"):
        u = np.asarray(res[mode]["u"])[np.asarray(res[mode]["alive"])]
        um = np.linalg.norm(u, axis=1)
        print(f"  {mode}: |u| in [{um.min():.3f}, {um.max():.3f}]")

    # fixed-psi error: same medium through the fixed-psi tracer
    babs = np.sqrt(np.asarray(bn)**2 + np.asarray(be)**2
                   + np.asarray(bd)**2)
    psi = np.rad2deg(np.arccos(np.clip(-np.asarray(bd) / babs, -1, 1)))
    f_fp = prt.build_field_3d(alt, lat, lon, Ne, babs, psi, F0, mode="X")
    rf = prt.trace_ray_3d(f_fp, 30.0, 0.0, 25.0, 0.0, step_km=2.0,
                          s_max_km=2600.0)
    ra = prt.trace_ray_3d_anisotropic(field, 30.0, 0.0, 25.0, 0.0, F0,
                                      mode="X", step_km=2.0,
                                      s_max_km=2600.0)
    dr = float(ra["ground_range_km"]) - float(rf["ground_range_km"])
    dt = (float(ra["group_delay_sec"])
          - float(rf["group_delay_sec"])) * 1e3
    print(f"\nfixed-psi convention error (northward X-mode link):")
    print(f"  exact-psi range {float(ra['ground_range_km']):.1f} km vs "
          f"fixed-psi {float(rf['ground_range_km']):.1f} km "
          f"(d = {dr:+.1f} km)")
    print(f"  delay difference {dt:+.4f} ms "
          f"({abs(dt)/(float(ra['group_delay_sec'])*1e3)*100:.2f}%)")
    print("  -> the convention every 2-D tracer inherits is accurate to")
    print("     ~1% here; tests/test_trace3d_aniso.py pins the <2% bound.")

    # anisotropic oblique ionogram: per-frequency two-angle homing over
    # the SAME single volume (frequency- and mode-independent tables)
    freqs = np.array([5e6, 6.5e6, 8e6])
    iono = prt.synthesize_oblique_ionogram_3d_anisotropic(
        freqs, 30.0, 0.0, 36.5, 0.0, field, mode="O", n_elev=12, n_az=3,
        az_span_deg=3.0, elev_min_deg=12.0, elev_max_deg=50.0,
        step_km=4.0, s_max_km=1800.0)
    print(f"\nanisotropic oblique ionogram, 722-km northward O-mode link"
          f" (one volume, one vmapped homing program):")
    print(f"{'f MHz':>6} {'delay_lo ms':>11} {'elev_lo':>8} "
          f"{'az_off deg':>10}")
    for i, f in enumerate(freqs):
        print(f"{f/1e6:6.1f} "
              f"{float(iono['delay_low_sec'][i])*1e3:11.4f} "
              f"{float(iono['elev_low_deg'][i]):8.2f} "
              f"{float(iono['azimuth_offset_low_deg'][i]):+10.4f}")


if __name__ == "__main__":
    main()
