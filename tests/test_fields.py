"""Field-interpolator tests: analytic linear fields, exact gradients.

Mirrors reference categories (test_core.py:367-610): linear fields where
values/gradients are known exactly, including the spherical chain rule
∂μ/∂φ = b·R_E.
"""

import numpy as np
from numpy.testing import assert_allclose

from pyrayhf_tpu.constants import constants
from pyrayhf_tpu.fields import (build_mup_function,
                                build_refractive_index_interpolator_cartesian,
                                build_refractive_index_interpolator_spherical,
                                gradient_ord2)


def test_cartesian_linear_field():
    z_grid = np.linspace(0, 10, 6)
    x_grid = np.linspace(0, 10, 6)
    Z, X = np.meshgrid(z_grid, x_grid, indexing="ij")
    n_field = 2 * X + 3 * Z
    nag = build_refractive_index_interpolator_cartesian(z_grid, x_grid,
                                                        n_field)
    x_t = np.array([0.0, 5.0, 9.9])
    z_t = np.array([0.0, 5.0, 9.9])
    n, dndx, dndz = (np.asarray(a) for a in nag(x_t, z_t))
    assert_allclose(n, 2 * x_t + 3 * z_t, rtol=1e-12)
    assert_allclose(dndx, np.full_like(x_t, 2.0), rtol=1e-12)
    assert_allclose(dndz, np.full_like(z_t, 3.0), rtol=1e-12)


def test_cartesian_broadcasting():
    z_grid = np.linspace(0, 2, 3)
    x_grid = np.linspace(0, 2, 3)
    Z, X = np.meshgrid(z_grid, x_grid, indexing="ij")
    nag = build_refractive_index_interpolator_cartesian(z_grid, x_grid, X - Z)
    x_t, z_t = np.meshgrid([0.5, 1.5], [0.5, 1.5])
    n, dndx, dndz = (np.asarray(a) for a in nag(x_t, z_t))
    assert n.shape == x_t.shape
    assert_allclose(n, x_t - z_t, rtol=1e-12)
    assert_allclose(dndx, np.ones_like(x_t), rtol=1e-12)
    assert_allclose(dndz, -np.ones_like(z_t), rtol=1e-12)


def test_out_of_bounds_fill():
    z_grid = np.linspace(0, 10, 6)
    x_grid = np.linspace(0, 10, 6)
    Z, X = np.meshgrid(z_grid, x_grid, indexing="ij")
    nag = build_refractive_index_interpolator_cartesian(z_grid, x_grid, X + Z)
    n, gx, gz = (np.asarray(a) for a in nag(np.array([11.0]),
                                            np.array([5.0])))
    assert np.isnan(n).all()
    assert gx[0] == 0.0 and gz[0] == 0.0


def test_spherical_linear_field_chain_rule():
    """∂μ/∂φ must equal b·R_E for μ = 1 + a z + b x (ref :538-610)."""
    _, _, R_E, _ = constants()
    a, b = 1e-4, 2e-4
    z_grid = np.linspace(0, 400, 80)
    x_grid = np.linspace(0, 1000, 120)
    Z, X = np.meshgrid(z_grid, x_grid, indexing="ij")
    n_field = 1.0 + a * Z + b * X
    nag = build_refractive_index_interpolator_spherical(
        z_grid, x_grid, n_field, R_E=R_E)
    x_t = np.array([0.0, 250.0, 750.0])
    z_t = np.array([0.0, 200.0, 400.0])
    mu, mu_r, mu_phi = (np.asarray(v) for v in nag(x_t / R_E, R_E + z_t))
    assert_allclose(mu, 1.0 + a * z_t + b * x_t, rtol=1e-6)
    assert_allclose(mu_r, np.full_like(mu, a), rtol=1e-6)
    assert_allclose(mu_phi, np.full_like(mu, b * R_E), rtol=1e-6)


def test_build_mup_function_both_geometries():
    _, _, R_E, _ = constants()
    z_grid = np.linspace(0, 500, 50)
    x_grid = np.linspace(0, 1000, 100)
    Z, X = np.meshgrid(z_grid, x_grid, indexing="ij")
    fld = 1.0 + 1e-4 * (Z + X)
    for geom in ["cartesian", "spherical"]:
        mupf = build_mup_function(mup_field=fld, x_grid=x_grid, z_grid=z_grid,
                                  geometry=geom)
        x_t = np.array([100.0, 400.0])
        z_t = np.array([50.0, 250.0])
        out = np.asarray(mupf(x_t, z_t))
        assert_allclose(out, 1.0 + 1e-4 * (z_t + x_t), rtol=1e-6,
                        err_msg=geom)


def test_gradient_ord2_matches_numpy():
    rng = np.random.default_rng(1)
    z = np.sort(rng.uniform(0, 10, 17))
    x = np.sort(rng.uniform(0, 5, 13))
    f = rng.normal(size=(17, 13))
    gz_np, gx_np = np.gradient(f, z, x, edge_order=2)
    gz, gx = gradient_ord2(f, z, x)
    assert_allclose(np.asarray(gz), gz_np, rtol=1e-10, atol=1e-12)
    assert_allclose(np.asarray(gx), gx_np, rtol=1e-10, atol=1e-12)
