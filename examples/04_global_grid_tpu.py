#!/usr/bin/env python
"""Global ionosonde-network simulation: 73x144 lat-lon grid, O+X modes.

The BASELINE 'global grid' config: climatology profiles on a 2.5 x 2.5 deg
world grid, full O+X ionograms for every cell via the fused kernel (TPU) or
the XLA fast path (CPU). Also runs the 24 h diurnal O+X sweep config.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import os
import jax
if os.environ.get("PYRAYHF_EXAMPLES_TPU") != "1":
    # examples default to host CPU (the tunnelled TPU's remote compile is
    # slow for one-shot scripts); set PYRAYHF_EXAMPLES_TPU=1 to opt in
    jax.config.update("jax_platforms", "cpu")
    # f64 for CPU parity; the TPU path stays f32 end-to-end (x64 would
    # inject f64 scalars the Mosaic kernels cannot lower, and f32 is the
    # production serving dtype anyway)
    jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
import pyrayhf_tpu as prt
from pyrayhf_tpu.envgen import climatology_parameters
from pyrayhf_tpu.envgen import _edp_from_params
from pyrayhf_tpu.igrf import calculate_magnetic_field


def synth(freqs, den, bmag, bpsi, alt, mode_mult):
    # engine='auto': the dynamic-gather kernel on TPU (uniform f32 shared
    # grid), the XLA sweep elsewhere — the round-3 routing policy
    return prt.vertical_forward_operator_batch(
        jnp.asarray(freqs, den.dtype), den, bmag, bpsi,
        jnp.asarray(alt, den.dtype), mode="O" if mode_mult > 0 else "X",
        engine="auto")


def main():
    lat = np.linspace(-90.0, 90.0, 73)
    lon = np.linspace(-180.0, 177.5, 144)
    LAT, LON = np.meshgrid(lat, lon, indexing="ij")
    alt = np.arange(80.0, 700.0, 2.0)
    dtype = jnp.float32

    t0 = time.perf_counter()
    # chunk the build: the IGRF spherical-harmonic broadcast and the f64
    # EDP assembly over all 10512x310 points at once exhausts single-chip
    # HBM; 8 chunks bound the transient tensors and stream results to host
    lat_f, lon_f = LAT.ravel(), LON.ravel()
    dens, bms, bps = [], [], []
    chunk = 1314
    for s in range(0, lat_f.size, chunk):
        sl = slice(s, s + chunk)
        F2, F1, E = climatology_parameters(2020, 6, 15, 12.0, lat_f[sl],
                                           lon_f[sl], 140.0)
        dens.append(np.asarray(_edp_from_params(F2, F1, E,
                                                jnp.asarray(alt)),
                               np.float32))
        bm, bp = calculate_magnetic_field(2020, 6, 15, lat_f[sl],
                                          lon_f[sl], alt)
        bms.append(np.asarray(bm.T, np.float32))
        bps.append(np.asarray(bp.T, np.float32))
    den = jnp.asarray(np.concatenate(dens), dtype)
    bmag = jnp.asarray(np.concatenate(bms), dtype)
    bpsi = jnp.asarray(np.concatenate(bps), dtype)
    print(f"built {den.shape[0]} profiles ({LAT.shape} grid) in "
          f"{time.perf_counter()-t0:.1f} s")

    freqs = np.arange(1.0, 16.0, 0.5)
    t0 = time.perf_counter()
    vh_O = synth(freqs, den, bmag, bpsi, alt, 1.0)
    vh_X = synth(freqs, den, bmag, bpsi, alt, -1.0)
    vo = np.asarray(vh_O)
    vx = np.asarray(vh_X)
    dt = time.perf_counter() - t0
    n_eval = 2 * den.shape[0] * len(freqs)
    print(f"global O+X synthesis: {n_eval} vh evals in {dt:.2f} s "
          f"({n_eval/dt:.2e}/s incl. first-compile)")
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        o = synth(freqs, den, bmag, bpsi, alt, 1.0)
        x = synth(freqs, den, bmag, bpsi, alt, -1.0)
    _ = np.asarray(jnp.ravel(o)[0])
    _ = np.asarray(jnp.ravel(x)[0])
    dt_w = (time.perf_counter() - t0) / iters
    print(f"  warm relaunch: {dt_w*1e3:.0f} ms/(O+X pair) -> "
          f"{n_eval/dt_w:.2e} vh evals/s steady-state")
    foF2_map = np.array([freqs[np.isfinite(row)][-1] if
                         np.isfinite(row).any() else np.nan
                         for row in vo]).reshape(LAT.shape)
    print(f"foF2 map: day max {np.nanmax(foF2_map):.1f} MHz, "
          f"night min {np.nanmin(foF2_map):.1f} MHz")

    # 24 h diurnal sweep at one site
    hours = np.arange(0.0, 24.0, 1.0)
    F2h, F1h, Eh = zip(*(climatology_parameters(2020, 6, 15, h,
                                                np.array([38.0]),
                                                np.array([-77.0]), 140.0)
                         for h in hours))
    den_h = jnp.concatenate([_edp_from_params(a, b, c, jnp.asarray(alt))
                             for a, b, c in zip(F2h, F1h, Eh)]).astype(dtype)
    bm = jnp.broadcast_to(bmag[0], den_h.shape)
    bp = jnp.broadcast_to(bpsi[0], den_h.shape)
    vo_h = np.asarray(synth(freqs, den_h, bm, bp, alt, 1.0))
    foF2_h = [freqs[np.isfinite(r)][-1] if np.isfinite(r).any() else np.nan
              for r in vo_h]
    print("diurnal foF2 [MHz] @38N/77W:",
          " ".join(f"{v:.0f}" for v in foF2_h))


if __name__ == "__main__":
    main()
