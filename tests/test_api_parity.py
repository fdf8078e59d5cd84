"""API-surface parity: every reference component has a public counterpart."""

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

import pyrayhf_tpu as prt


REFERENCE_API = [
    # SURVEY §2 component inventory, public interface column
    "constants", "den2freq", "freq2den", "find_X", "find_Y", "find_mu_mup",
    "find_vh", "smooth_nonuniform_grid", "regrid_to_nonuniform_grid",
    "vertical_to_magnetic_angle", "vertical_forward_operator",
    "model_VH", "residual_VH", "minimize_parameters",
    "n_and_grad", "eval_refractive_index_and_grad", "make_n_and_grad",
    "ray_rhs_cartesian", "event_ground", "event_z_top", "event_z_bottom",
    "event_x_left", "event_x_right", "tan_from_mu_scalar",
    "find_turning_point", "trace_ray_cartesian_snells",
    "trace_ray_cartesian_gradient", "trace_ray_spherical_snells",
    "n_and_grad_rphi", "build_refractive_index_interpolator_cartesian",
    "build_refractive_index_interpolator_spherical", "build_mup_function",
    "rhs_spherical", "trace_ray_spherical_gradient", "great_circle_point",
    "calculate_magnetic_field", "save_to_file", "generate_input_2D",
    "generate_input_1D", "oblique_to_vertical", "earth_radius_at_latitude",
    "calculate_gcd", "azimuth_between_points", "find_mean_gradient_error",
]


def test_every_reference_symbol_is_exported():
    missing = [name for name in REFERENCE_API if not hasattr(prt, name)]
    assert not missing, missing


def test_tan_from_mu_scalar_values():
    """ref test_core.py:613-635."""
    assert_allclose(float(prt.tan_from_mu_scalar(2.0, 1.0)),
                    1.0 / np.sqrt(3.0), rtol=1e-12)
    v = float(prt.tan_from_mu_scalar(1.0000001, 1.0))
    assert np.isfinite(v) and v > 0
    v2 = float(prt.tan_from_mu_scalar(1e-6, 1e-7))
    assert np.isfinite(v2) and v2 >= 0


def test_find_turning_point_linear():
    z = np.array([0.0, 100.0, 200.0, 300.0])
    mu = np.array([1.0, 0.9, 0.5, 0.2])
    zt = float(prt.find_turning_point(z, mu, 0.7))
    assert_allclose(zt, 150.0)
    assert np.isnan(float(prt.find_turning_point(z, mu, 0.1)))


def test_ray_rhs_and_events():
    import jax.numpy as jnp
    nag = lambda x, z: (jnp.asarray(1.0), jnp.asarray(0.0),
                        jnp.asarray(-1e-4))
    y = jnp.array([0.0, 100.0, 0.7, 0.7])
    d = np.asarray(prt.ray_rhs_cartesian(0.0, y, nag))
    assert d.shape == (4,)
    assert_allclose(d[:2], [0.7, 0.7])
    assert float(prt.event_ground(0.0, y)) > 0
    assert float(prt.event_z_top(0.0, y, 600.0)) == 500.0
    assert float(prt.event_z_bottom(0.0, y, -1.0)) == 101.0
    assert float(prt.event_x_left(0.0, y, -10.0)) == 10.0
    assert float(prt.event_x_right(0.0, y, 10.0)) == 10.0


def test_standalone_field_eval_functions():
    z = np.linspace(0, 10, 6)
    x = np.linspace(0, 10, 6)
    Z, X = np.meshgrid(z, x, indexing="ij")
    from pyrayhf_tpu.fields import RefractiveField
    f = RefractiveField(z, x, 2 * X + 3 * Z)
    gx = RefractiveField(z, x, np.full_like(Z, 2.0))
    gz = RefractiveField(z, x, np.full_like(Z, 3.0))
    n, dndx, dndz = prt.n_and_grad(np.array([1.0, 5.0]),
                                   np.array([2.0, 4.0]), f, gx, gz)
    assert_allclose(np.asarray(n), [8.0, 22.0], rtol=1e-12)
    assert_allclose(np.asarray(dndx), [2.0, 2.0])
    fn = prt.make_n_and_grad(f, gx, gz)
    n2, _, _ = fn(np.array([1.0]), np.array([2.0]))
    assert_allclose(np.asarray(n2), [8.0], rtol=1e-12)


def test_configs_are_hashable_static():
    cfg = prt.OperatorConfig(mode="X", n_points=400)
    assert hash(cfg)
    assert cfg.n_points == 400
    with pytest.raises(Exception):
        cfg.n_points = 5          # frozen


def test_operator_config_wiring(day_profile):
    """config= supplies mode/n_points; explicit kwargs win over it."""
    d = day_profile
    freqs = np.arange(2.0, 14.0, 1.0)
    args = (freqs, d["den"], d["bmag"], d["bpsi"], d["alt"])
    cfg = prt.OperatorConfig(mode="X", n_points=300)
    via_cfg = np.asarray(prt.vertical_forward_operator(*args, config=cfg))
    explicit = np.asarray(prt.vertical_forward_operator(
        *args, mode="X", n_points=300))
    np.testing.assert_array_equal(via_cfg, explicit)
    # explicit kwarg overrides the config field
    override = np.asarray(prt.vertical_forward_operator(
        *args, mode="O", config=cfg))
    o_mode = np.asarray(prt.vertical_forward_operator(
        *args, mode="O", n_points=300))
    np.testing.assert_array_equal(override, o_mode)
    m = np.isfinite(via_cfg) & np.isfinite(override)
    assert np.abs(via_cfg[m] - override[m]).max() > 0.1   # X differs from O

    # batch + pallas paths accept the same config
    b = np.asarray(prt.vertical_forward_operator_batch(
        freqs, d["den"][None, :], d["bmag"][None, :], d["bpsi"][None, :],
        d["alt"], config=cfg))[0]
    np.testing.assert_array_equal(b, via_cfg)
    from pyrayhf_tpu.pallas_vh import ionogram_pallas
    p = np.asarray(ionogram_pallas(
        jnp.asarray(freqs), jnp.asarray(d["den"])[None, :],
        jnp.asarray(d["bmag"])[None, :], jnp.asarray(d["bpsi"])[None, :],
        jnp.asarray(d["alt"]), interpret=True, config=cfg))[0]
    assert np.array_equal(np.isnan(p), np.isnan(via_cfg))
    mm = np.isfinite(via_cfg)
    assert np.abs(p[mm] - via_cfg[mm]).max() < 1e-6


def test_minimize_parameters_lm_method(day_profile):
    d = day_profile
    sc = lambda dd: {k: float(np.ravel(v)[0]) for k, v in dd.items()}
    F2, F1, E = sc(d["F2"]), sc(d["F1"]), sc(d["E"])
    freq = np.arange(2.0, 13.51, 0.25)
    alt = np.arange(80.0, 700.0, 0.5)
    from pyrayhf_tpu.magnetoionic import freq2den
    nm_truth = float(freq2den(13.5e6)) * 1.0001
    F2_truth = dict(F2, Nm=nm_truth, hm=F2["hm"] - 10.0)
    bmag = np.full(alt.size, 3e-5)
    bpsi = np.full(alt.size, 70.0)
    vh_obs, _ = prt.model_VH({k: np.array([[v]]) for k, v in
                              F2_truth.items()}, F1, E, freq, alt, bmag,
                             bpsi)
    vh_fit, edp_fit, F2_fit = prt.minimize_parameters(
        {k: np.array([[v]]) for k, v in F2.items()}, F1, E, freq,
        np.asarray(vh_obs), alt, bmag, bpsi, method="levenberg-marquardt")
    assert abs(float(np.ravel(F2_fit["hm"])[0]) - F2_truth["hm"]) < 1.0


def test_shape_mismatch_logs_not_raises(caplog):
    import logging
    with caplog.at_level(logging.ERROR, logger="pyrayhf_tpu"):
        vh = prt.vertical_forward_operator(
            np.array([2.0]), np.array([0.0, 1e12, 2e12]),
            np.array([5e-5, 5e-5, 5e-5]), np.array([60.0, 60.0, 60.0]),
            np.array([100.0, 200.0, 300.0, 400.0])[:3])
    assert np.asarray(vh).shape == (1,)


BEYOND_REFERENCE_API = [
    # round-2/3 additions the docs/CHANGELOG promise at package level
    "vertical_forward_operator_batch", "vh_and_mask",
    "vertical_phase_operator", "faraday_rotation_vertical",
    "synthesize_oblique_ionogram", "synthesize_oblique_ionogram_2d",
    "synthesize_oblique_ionogram_3d",
    "absorption_coefficient", "collision_frequency",
    "vertical_absorption_operator",
    "fresnel_coefficients", "fresnel_coefficients_real",
    "ground_reflection_loss_db",
    "vertical_to_oblique", "muf_from_vertical_ionogram",
    "muf_from_profile", "muf_map",
    "build_field_3d", "trace_ray_3d", "trace_rays_3d", "home_ray_3d",
    # round-4 additions
    "build_field_3d_aniso", "igrf_volume", "trace_ray_3d_anisotropic",
    "trace_rays_3d_anisotropic", "home_ray_3d_anisotropic",
    "synthesize_oblique_ionogram_3d_anisotropic",
    "retrieve_profile_joint",
    "retrieve_profile", "retrieve_profile_batch",
    "retrieve_gradient", "retrieve_gradient_batch",
    "generate_input_3D",
    "ionogram_pallas", "ionogram_pallas_gather", "ionogram_fast_xla",
]


def test_beyond_reference_surface_is_exported():
    """Everything the CHANGELOG/COVERAGE advertises resolves at package
    level (guards the export-gap class of review finding)."""
    missing = [n for n in BEYOND_REFERENCE_API if not hasattr(prt, n)]
    assert not missing, missing
