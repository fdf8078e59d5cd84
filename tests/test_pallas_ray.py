"""Parity tests for the VMEM-resident Pallas 2-D ray-fan integrator.

``pyrayhf_tpu.pallas_ray.fan_2d_pallas`` re-implements the ENTIRE
gradient-ODE fan (``gradient._cart/_sph_gradient_core`` + the bilinear
``RefractiveField`` RHS) inside one Pallas kernel; these tests pin it
against the XLA ``lax.scan`` fan through the same ``_fan_2d_fn``
builder on CPU (interpret mode, f64). Semantics that must agree:
landing ranges (NaN for non-landing rays), group delay / absorption /
group+phase path accumulators, freeze-on-event, and specular multi-hop
bounces.

Perf context (round 5, real v5e, tools/bench_fan_pallas.py): the
kernel runs the [64×128×2000] Cartesian fan in 199 ms vs 5.5 s for
the XLA engine (27×) on a 512×32 grid, and 1.50 s vs 7.7 s (5×) on
the VMEM-limit 512×384 grid; the reference's ``solve_ivp`` tracer
(ref library.py:2128-2337) runs one ray at a time at ~2.4 s/ray.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pyrayhf_tpu.oblique import _fan_2d_fn, synthesize_oblique_ionogram_2d


def _scene(nz=101, nx=17, tilt=0.15):
    """Uniform-grid Chapman-layer slice with a linear x-tilt."""
    z = np.linspace(0.0, 400.0, nz)
    x = np.linspace(0.0, 2000.0, nx)
    zz = z[:, None]
    xx = x[None, :]
    h = (zz - 250.0) / 45.0
    nmf2 = 8.0e11 * (1.0 + tilt * (xx / x[-1] - 0.5))
    ne = nmf2 * np.exp(0.5 * (1.0 - h - np.exp(-h)))
    babs = np.full((nz, nx), 4.5e-5)
    bpsi = np.full((nz, nx), np.deg2rad(30.0))
    nu_z = 1e7 * np.exp(-(z - 70.0) / 8.0)
    return z, x, ne, babs, bpsi, nu_z


def _run_fan(engine, geometry, mode="O", n_hops=1, n_elev=24,
             f0s=(5.0e6, 9.0e6), n_steps=250):
    z, x, ne, babs, bpsi, nu_z = _scene()
    fan = _fan_2d_fn(z, x, mode, geometry, n_elev, n_steps, n_hops,
                     engine=engine)
    out = fan(jnp.asarray(np.asarray(f0s)), jnp.asarray([8.0, 60.0]),
              jnp.asarray(ne), jnp.asarray(babs), jnp.asarray(bpsi),
              jnp.asarray(nu_z), jnp.asarray(10.0))
    return [np.asarray(o) for o in out]


@pytest.mark.parametrize("geometry", ["cartesian", "spherical"])
def test_fan_parity_xla_vs_pallas(geometry):
    ref = _run_fan("xla", geometry)
    got = _run_fan("pallas", geometry)
    names = ["range", "delay", "absorb", "path", "phase", "elevs"]
    for name, r, g in zip(names, ref, got):
        assert np.allclose(r, g, rtol=1e-8, atol=1e-10, equal_nan=True), (
            name, r, g)
    # the scene must actually exercise both branches: some rays land,
    # some escape (NaN range)
    assert np.isfinite(ref[0]).any() and np.isnan(ref[0]).any()


def test_fan_parity_multihop_xmode():
    ref = _run_fan("xla", "cartesian", mode="X", n_hops=2, n_steps=400)
    got = _run_fan("pallas", "cartesian", mode="X", n_hops=2, n_steps=400)
    for r, g in zip(ref, got):
        assert np.allclose(r, g, rtol=1e-8, atol=1e-10, equal_nan=True)
    # the bounce branch must actually fire: the 2-hop fan's landing
    # table differs from the 1-hop fan's (same scene, same steps)
    ref1 = _run_fan("xla", "cartesian", mode="X", n_hops=1, n_steps=400)
    assert not np.allclose(ref[0], ref1[0], equal_nan=True)


def test_engine_validation():
    z = np.concatenate([np.linspace(0, 100, 20),
                        np.geomspace(110, 400, 30)])  # non-uniform
    x = np.linspace(0.0, 1000.0, 9)
    with pytest.raises(ValueError, match="uniform"):
        _fan_2d_fn(z, x, "O", "cartesian", 8, 50, 1, engine="pallas")
    with pytest.raises(ValueError, match="engine"):
        _fan_2d_fn(x, x, "O", "cartesian", 8, 50, 1, engine="mosaic")


def test_synthesize_2d_pallas_end_to_end():
    z, x, ne, babs, bpsi, nu_z = _scene()
    kw = dict(f0s_hz=np.array([6.0e6, 8.0e6]), ground_range_km=800.0,
              x_grid_km=x, z_grid_km=z, Ne2d=ne, Babs2d=babs,
              bpsi2d=bpsi, n_elev=24, elev_min_deg=8.0,
              elev_max_deg=60.0, step_km=10.0, s_max_km=2500.0,
              nu=nu_z)
    ref = synthesize_oblique_ionogram_2d(engine="xla", **kw)
    got = synthesize_oblique_ionogram_2d(engine="pallas", **kw)
    for k in ref:
        assert np.allclose(np.asarray(ref[k]), np.asarray(got[k]),
                           rtol=1e-8, atol=1e-10, equal_nan=True), k
