"""On-chip benchmark: the 3-D (elevation x azimuth) ray fan.

Measures ``trace_rays_3d`` (fixed-psi XLA scan tracer, trilinear RHS
with the round-5 uniform-grid direct locate) on a typical homing-scale
volume, to put a number on the 3-D tier the way
``tools/bench_fan_pallas.py`` does for the 2-D tier.

Why there is no Pallas engine here (the 2-D fan kernel's arithmetic,
applied to 3-D): the VMEM kernel's per-eval cost is O(resident-table
sublane rows) - the lane-axis gather covers ONE grid axis and every
other axis must be resolved by a weight-mask reduction over sublanes.
A 3-D table puts nlat*nlon rows behind the gather axis (e.g. 40x40 =
1,600 rows vs 32..384 for the 2-D scenes); scaling the measured 2-D
per-eval costs (41k rays/s at 96 resident rows, 5.4k at 1,152) to
4,800 rows lands at or below the XLA scan rate. Per-lane 2-D
(sublane, lane) indexed gathers - the primitive that would fix both
this and the ionogram kernel's block-select chains - is not exposed
by Mosaic (BENCHMARKS.md round-5 ceiling section), so the XLA path IS
the 3-D design, and this script records what it delivers.

Timing discipline: device->host copy as the execution fence (the
tunnel's block_until_ready is lazy), pipelined launches, best-of-3.

Run on the real chip: ``python tools/bench_fan_3d.py``.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from pyrayhf_tpu.trace3d import build_field_3d, trace_rays_3d
from pyrayhf_tpu.trace3d_aniso import (build_field_3d_aniso, igrf_volume,
                                       trace_rays_3d_anisotropic)

E, A, NSTEP = 48, 9, 2000        # the home_ray_3d default fan, s_max 4000/2 km


def volume(n_alt=200, n_lat=40, n_lon=40):
    alt = np.linspace(60.0, 500.0, n_alt)
    lat = np.linspace(30.0, 50.0, n_lat)
    lon = np.linspace(-10.0, 10.0, n_lon)
    h = (alt[:, None, None] - 250.0) / 45.0
    nmf2 = 6.0e11 * (1.0 + 0.2 * (lat[None, :, None] - 40.0) / 20.0
                     + 0.1 * lon[None, None, :] / 10.0)
    ne = nmf2 * np.exp(0.5 * (1.0 - h - np.exp(-h)))
    babs = np.full(ne.shape, 4.8e-5)
    bpsi = np.full(ne.shape, 25.0)
    return alt, lat, lon, ne, babs, bpsi


def main():
    print("device:", jax.devices()[0])
    alt, lat, lon, ne, babs, bpsi = volume()
    f32 = jnp.float32
    field = build_field_3d(alt, lat, lon, jnp.asarray(ne, f32),
                           jnp.asarray(babs, f32), jnp.asarray(bpsi, f32),
                           8.0e6, mode="O")
    field = {k: (jnp.asarray(v, f32) if hasattr(v, "dtype") else v)
             for k, v in field.items()}
    els = jnp.linspace(5.0, 75.0, E)
    azs = jnp.linspace(-4.0, 4.0, A) + 20.0

    fan = jax.jit(lambda: trace_rays_3d(field, 40.0, 0.0, els, azs,
                                        step_km=2.0, s_max_km=4000.0))
    out = fan()
    _ = np.asarray(jnp.ravel(out["ground_range_km"])[0])    # fence
    iters = 3
    best = np.inf
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fan()
        _ = np.asarray(jnp.ravel(out["ground_range_km"])[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    landed = int(np.isfinite(np.asarray(out["ground_range_km"])).sum())
    rays = E * A
    print(f"3-D fan [{E}x{A}, {NSTEP} steps, 200x40x40 volume]: "
          f"{best*1e3:8.1f} ms  ({rays/best:,.0f} rays/s)  "
          f"landed={landed}/{rays}")

    # the full-Haselgrove anisotropic fan on the same volume (each RHS
    # eval linearises the dispersion scalar: ~4x the fixed-psi work
    # plus the shell re-projection each step)
    bn, be, bd = igrf_volume(alt, lat, lon)
    fld_a = build_field_3d_aniso(alt, lat, lon, jnp.asarray(ne, f32),
                                 jnp.asarray(bn, f32),
                                 jnp.asarray(be, f32),
                                 jnp.asarray(bd, f32))
    fld_a = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, f32) if hasattr(v, "dtype") else v,
        fld_a)
    fan_a = jax.jit(lambda: trace_rays_3d_anisotropic(
        fld_a, 40.0, 0.0, els, azs, 8.0e6, mode="O", step_km=2.0,
        s_max_km=4000.0))
    out = fan_a()
    _ = np.asarray(jnp.ravel(out["ground_range_km"])[0])    # fence
    best = np.inf
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fan_a()
        _ = np.asarray(jnp.ravel(out["ground_range_km"])[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    landed = int(np.isfinite(np.asarray(out["ground_range_km"])).sum())
    print(f"aniso fan [{E}x{A}, {NSTEP} steps, 200x40x40 volume]: "
          f"{best*1e3:8.1f} ms  ({rays/best:,.0f} rays/s)  "
          f"landed={landed}/{rays}")


if __name__ == "__main__":
    main()
