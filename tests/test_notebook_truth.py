"""Pins against the reference repo's COMMITTED notebook outputs.

The tutorials under ``/root/reference/docs/tutorials/`` were executed by
the reference's author on their own machine, and the printed per-ray
metrics are stored in the committed ``.ipynb`` cells. They are therefore
truth values INDEPENDENT of our in-process reference oracle
(``tools/gen_reference_goldens.py``): agreeing with them validates the
oracle pipeline itself, not just our port of it (round-5 verdict item 8).

Each test rebuilds the notebook's exact scene from the shipped
``Example_Input_Day.p`` and pins our tracers against the notebook's
printed numbers (cited by notebook + cell below).

Tolerances: the Snell tracers are closed-form layer algebra, so the
Cartesian one must agree to f64 round-off (1e-9) and the spherical one
to the documented apex-convention bound (5e-3, see
``test_tracers.py::test_snell_oracle_parity``). The gradient tracers
compare an embedded DP5(4) against the author's scipy-RK45 run — both
rtol 1e-7 — so integration paths differ at the error-control level; 1%
matches the cross-integrator bound already established in
``test_tracers.py::test_gradient_vs_scipy``.
"""

import numpy as np
import pytest

from pyrayhf_tpu.fields import (build_mup_function,
                                build_refractive_index_interpolator_cartesian,
                                build_refractive_index_interpolator_spherical)
from pyrayhf_tpu.gradient import (trace_ray_cartesian_gradient,
                                  trace_ray_spherical_gradient)
from pyrayhf_tpu.magnetoionic import find_X, find_Y, find_mu_mup
from pyrayhf_tpu.snell import (trace_ray_cartesian_snells,
                               trace_ray_spherical_snells)

F0_HZ = 14e6
ELEV_DEG = 50.0


@pytest.fixture(scope="module")
def day_with_ground(day_profile):
    """The notebooks' common preamble: prepend a ground (z=0) node by
    linear interpolation (all four tutorials, identical code)."""
    d = day_profile
    alt, Ne = np.asarray(d["alt"]), np.asarray(d["den"])
    Babs, bpsi = np.asarray(d["bmag"]), np.asarray(d["bpsi"])
    assert alt[0] > 0
    out = {}
    for name, arr in (("den", Ne), ("bmag", Babs), ("bpsi", bpsi)):
        out[name] = np.insert(arr, 0, np.interp(0.0, alt, arr))
    out["alt"] = np.insert(alt, 0, 0.0)
    return out


def _pin(r, path_km, delay_sec, range_km, rtol):
    for key, want in (("group_path_km", path_km),
                      ("group_delay_sec", delay_sec),
                      ("ground_range_km", range_km)):
        got = float(np.asarray(r[key]))
        assert abs(got - want) <= rtol * abs(want), (key, got, want)


def test_cartesian_snells_notebook_values(day_with_ground):
    """Example_PyRayHF_Cartesian_Snells.ipynb cell 1 printed output."""
    d = day_with_ground
    cases = {  # mode -> (path km, delay sec, range km)
        "O": (737.5772252624189, 2.9285632671884323e-3, 564.3250111819804),
        "X": (724.6654849148263, 2.884054838539745e-3, 553.4815156583822),
    }
    for mode, (p, t, g) in cases.items():
        r = trace_ray_cartesian_snells(F0_HZ, ELEV_DEG, d["alt"], d["den"],
                                       d["bmag"], d["bpsi"], mode)
        _pin(r, p, t, g, rtol=1e-9)


def test_spherical_snells_notebook_values(day_with_ground):
    """Example_PyRayHF_Spherical_Snells.ipynb cell 1 printed output."""
    d = day_with_ground
    cases = {
        "O": (755.7412096763478, 3.0550456159953833e-3, 562.852077830777),
        "X": (741.0394742000531, 3.0015926095714315e-3, 550.9626918460008),
    }
    for mode, (p, t, g) in cases.items():
        r = trace_ray_spherical_snells(F0_HZ, ELEV_DEG, d["alt"], d["den"],
                                       d["bmag"], d["bpsi"], mode)
        _pin(r, p, t, g, rtol=5e-3)


def _tilted_fields(d, mode):
    """The gradient tutorials' shared scene: 800-node x-grid to 800 km,
    Ne tilted by (1 − 0.5·x/x_max), B uniform in x, and the notebooks'
    exact μ′ masking (μ′ < 1e-3 → NaN)."""
    x_grid = np.linspace(0.0, 800.0, 800)
    z_grid = d["alt"]
    Xg = np.tile(x_grid[None, :], (z_grid.size, 1))
    Ne_g = np.tile(d["den"][:, None], (1, 800)) * (1.0 - 0.5 * Xg / 800.0)
    B_g = np.tile(d["bmag"][:, None], (1, 800))
    psi_g = np.tile(d["bpsi"][:, None], (1, 800))
    X = find_X(Ne_g, F0_HZ)
    Y = find_Y(F0_HZ, B_g)
    mu, mup = find_mu_mup(X, Y, psi_g, mode)
    mu, mup = np.asarray(mu), np.asarray(mup)
    mup = np.where((mup < 1e-3) | np.isnan(mup), np.nan, mup)
    return z_grid, x_grid, mu, mup


def test_cartesian_gradient_notebook_values(day_with_ground):
    """Example_PyRayHF_Cartesian_Gradient.ipynb cell 1 printed output."""
    cases = {
        "O": (890.7690572682309, 3.4748504230775125e-3, 726.1481015278138),
        "X": (868.4736371922766, 3.3976921749333676e-3, 705.4295977972612),
    }
    for mode, (p, t, g) in cases.items():
        z_grid, x_grid, mu, mup = _tilted_fields(day_with_ground, mode)
        nag = build_refractive_index_interpolator_cartesian(z_grid, x_grid,
                                                            mu)
        mupf = build_mup_function(mup_field=mup, x_grid=x_grid,
                                  z_grid=z_grid, geometry="cartesian")
        r = trace_ray_cartesian_gradient(
            nag, mupf, 0.0, 0.0, ELEV_DEG, s_max_km=4000.0,
            max_step_km=5.0, z_max_km=600.0, x_min_km=0.0,
            x_max_km=1000.0, rtol=1e-7, atol=1e-9)
        _pin(r, p, t, g, rtol=0.01)


def test_spherical_gradient_notebook_values(day_with_ground):
    """Example_PyRayHF_Spherical_Gradient.ipynb cell 1 printed output."""
    cases = {
        "O": (915.3865354238924, 3.620305887390757e-3, 727.4321572007032),
        "X": (890.2553141484245, 3.5310650867725023e-3, 704.8771461799897),
    }
    for mode, (p, t, g) in cases.items():
        z_grid, x_grid, mu, mup = _tilted_fields(day_with_ground, mode)
        nag = build_refractive_index_interpolator_spherical(z_grid, x_grid,
                                                            mu)
        mupf = build_mup_function(mup_field=mup, x_grid=x_grid,
                                  z_grid=z_grid, geometry="spherical")
        r = trace_ray_spherical_gradient(
            nag, mupf, 0.0, 0.0, ELEV_DEG, s_max_km=4000.0,
            rtol=1e-7, atol=1e-9)
        _pin(r, p, t, g, rtol=0.01)
