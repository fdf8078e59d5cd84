"""On-chip benchmark: Pallas VMEM ray-fan vs the XLA scan fan.

Measures the flagship [F=64, E=128, n_steps=2000] 2-D oblique fan
(the round-3/4 BENCHMARKS row: 14.8 s at round 3, 5.4 s after the
uniform-grid locate fix) through both engines of ``_fan_2d_fn``, on
two scenes:

* ``big``     — 512×384 uniform grid, the largest telemetry-realistic
  slice whose 6-channel double-buffered tables fit the ~16 MB v5e VMEM
  (see ``fan_2d_pallas_available``). Worst case for the kernel: every
  bilinear eval's per-lane z-gather + sublane weight-mask reduction
  touches the whole resident table, so cost/eval is O(nx·nz/128).
* ``typical`` — 512×32, the shape of real range-dependent ionograms
  (fine altitude grid × coarse range nodes), where the resident table
  is small and the kernel is gather-latency-free.

Timing discipline: the tunnel's ``block_until_ready`` is LAZY — a
device→host copy (``np.asarray``) is the only reliable execution
fence (same idiom as bench.py). Launches are pipelined in batches of
``iters`` and the fence amortised, like the headline bench.

Run on the real chip: ``python tools/bench_fan_pallas.py``.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from pyrayhf_tpu.oblique import _fan_2d_fn

F, E, NSTEP = 64, 128, 2000


def scene(nz, nx):
    z = np.linspace(0.0, 638.75, nz)
    x = np.linspace(0.0, 3995.0, nx)
    zz = z[:, None]
    xx = x[None, :]
    h = (zz - 250.0) / 45.0
    nmf2 = 8.0e11 * (1.0 + 0.15 * (xx / x[-1] - 0.5))
    ne = nmf2 * np.exp(0.5 * (1.0 - h - np.exp(-h)))
    babs = np.full(ne.shape, 4.5e-5)
    bpsi = np.full(ne.shape, np.deg2rad(30.0))
    nu_z = 1e7 * np.exp(-(z - 70.0) / 8.0)
    return z, x, ne, babs, bpsi, nu_z


def run(engine, geometry, nz, nx, iters):
    z, x, ne, babs, bpsi, nu_z = scene(nz, nx)
    fan = _fan_2d_fn(z, x, "O", geometry, E, NSTEP, 1, engine=engine)
    args = (jnp.asarray(np.linspace(4e6, 30e6, F)),
            jnp.asarray([5.0, 85.0]), jnp.asarray(ne, jnp.float32),
            jnp.asarray(babs, jnp.float32), jnp.asarray(bpsi, jnp.float32),
            jnp.asarray(nu_z, jnp.float32), jnp.asarray(2.0, jnp.float32))
    out = fan(*args)
    _ = np.asarray(jnp.ravel(out[0])[0])     # force (lazy tunnel fence)
    best = np.inf
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fan(*args)
        _ = np.asarray(jnp.ravel(out[0])[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    lands = int(np.isfinite(np.asarray(out[0])).sum())
    print(f"  {engine:7s} {geometry:10s}: {best*1e3:8.1f} ms "
          f"({F*E/best:,.0f} rays/s)  landed={lands}/{F*E}")
    return best, np.asarray(out[0])


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    for label, nz, nx in (("typical 512x32", 512, 32),
                          ("big 512x384", 512, 384)):
        print(f"scene {label}  [F={F} E={E} steps={NSTEP}]")
        for geom in ("cartesian", "spherical"):
            t_pl, r_pl = run("pallas", geom, nz, nx, iters=3)
            t_xla, r_xla = run("xla", geom, nz, nx, iters=1)
            both = np.isfinite(r_pl) & np.isfinite(r_xla)
            dr = (np.abs(r_pl - r_xla)[both].max() if both.any() else np.nan)
            agree = (np.isfinite(r_pl) == np.isfinite(r_xla)).mean()
            print(f"    speedup {t_xla/t_pl:6.1f}x | landing-mask agree "
                  f"{agree*100:.2f}% | max|drange| {dr:.3f} km (f32)")
