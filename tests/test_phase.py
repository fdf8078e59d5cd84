"""Phase-path channel, phase-height operator and Faraday rotation.

These are beyond-the-reference observables built on the same
Appleton–Hartree core: P = ∫ μ ds along oblique rays, h_p(f) = ∫ μ dh at
vertical incidence, and the O−X phase difference as Faraday rotation.
"""

import numpy as np
import pytest

import pyrayhf_tpu as prt
from pyrayhf_tpu.constants import C_KM_S
from pyrayhf_tpu.magnetoionic import find_X, find_Y, find_mu_mup


@pytest.fixture(scope="module")
def day(day_profile):
    d = day_profile
    return d["alt"], d["den"], d["bmag"], d["bpsi"]


@pytest.fixture(scope="module")
def day_grounded(day):
    """Day profile extended to z=0 with free space (for the ODE tracers)."""
    alt, den, bmag, bpsi = day
    pre = np.arange(0.0, alt[0], 2.0)
    ext = lambda v, v0: np.concatenate([np.full(pre.size, v0), v])
    return (np.concatenate([pre, alt]), ext(den, 1e6),
            ext(bmag, bmag[0]), ext(bpsi, bpsi[0]))


def test_snell_phase_ordering(day):
    """μ ≤ 1 ≤ μ' implies phase path ≤ geometric path ≤ c·group delay,
    in both geometries, over a whole fan."""
    alt, den, bmag, bpsi = day
    f0s = np.array([5e6, 8e6, 11e6])
    els = np.array([25.0, 40.0, 60.0])
    for tracer in (prt.trace_rays_cartesian_snells,
                   prt.trace_rays_spherical_snells):
        o = tracer(f0s, els, alt, den, bmag, bpsi, "O")
        pp = np.asarray(o["phase_path_km"])
        gp = np.asarray(o["group_path_km"])
        gd = np.asarray(o["group_delay_sec"]) * C_KM_S
        m = np.isfinite(pp)
        assert m.any()
        assert (pp[m] < gp[m]).all() and (gp[m] < gd[m]).all()
        # invalid rays carry NaN phase like every other metric
        assert np.isnan(pp[~m]).all() == np.isnan(gp[~m]).all()


def test_free_space_phase_equals_group(day):
    """With no plasma all three path measures coincide (μ = μ' = 1)."""
    alt = np.arange(0.0, 500.0, 2.0)
    # vacuum below 400 km, then a density ramp so μ crosses the Snell
    # invariant smoothly (a hard step is evanescent with no crossing)
    den = np.clip((alt - 400.0) / 40.0, 0.0, 1.0) * prt.freq2den(12e6) + 1.0
    bmag = np.full_like(alt, 1e-9)
    bpsi = np.full_like(alt, 45.0)
    o = prt.trace_ray_cartesian_snells(8e6, 35.0, alt, den, bmag, bpsi, "O")
    pp, gp = float(o["phase_path_km"]), float(o["group_path_km"])
    gd = float(o["group_delay_sec"]) * C_KM_S
    assert np.isfinite(pp)
    # the ray is in plasma only for the last few km of the ramp; the
    # ~950 km below is vacuum where all three measures coincide
    np.testing.assert_allclose([pp, gd], gp, rtol=6e-3)
    assert pp <= gp <= gd


def test_gradient_phase_matches_snell(day_grounded):
    """Cartesian ODE tracer phase path agrees with the layered Snell
    solution on the same horizontally-uniform ionosphere (< 2%)."""
    alt, den, bmag, bpsi = day_grounded
    f0 = 8e6
    X = find_X(den, f0)
    Y = find_Y(f0, bmag)
    mu, mup = find_mu_mup(X, Y, bpsi, "O")
    x = np.linspace(0.0, 1500.0, 64)
    mu2 = np.broadcast_to(np.asarray(mu)[:, None], (alt.size, x.size))
    mup2 = np.broadcast_to(np.asarray(mup)[:, None], (alt.size, x.size))
    nag = prt.build_refractive_index_interpolator_cartesian(alt, x, mu2)
    mupf = prt.build_mup_function(mup2, x, alt)
    g = prt.trace_ray_cartesian_gradient(nag, mupf, 0.0, 0.0, 40.0,
                                         step_km=1.0)
    s = prt.trace_ray_cartesian_snells(f0, 40.0, alt, den, bmag, bpsi, "O")
    assert g["status"] == "ground"
    assert abs(float(g["phase_path_km"]) / float(s["phase_path_km"]) - 1) \
        < 0.02


def test_spherical_gradient_phase(day_grounded):
    """Spherical ODE tracer reports a phase path with the same ordering."""
    alt, den, bmag, bpsi = day_grounded
    f0 = 8e6
    X = find_X(den, f0)
    Y = find_Y(f0, bmag)
    mu, mup = find_mu_mup(X, Y, bpsi, "O")
    x = np.linspace(0.0, 2000.0, 64)
    mu2 = np.broadcast_to(np.asarray(mu)[:, None], (alt.size, x.size))
    mup2 = np.broadcast_to(np.asarray(mup)[:, None], (alt.size, x.size))
    nag = prt.build_refractive_index_interpolator_spherical(alt, x, mu2)
    mupf = prt.build_mup_function(mup2, x, alt, geometry="spherical")
    g = prt.trace_ray_spherical_gradient(nag, mupf, 0.0, 0.0, 40.0,
                                         step_km=1.0)
    pp = float(g["phase_path_km"])
    gp = float(g["group_path_km"])
    gd = float(g["group_delay_sec"]) * C_KM_S
    assert g["status"] == "ground"
    assert pp < gp < gd


def test_vertical_phase_operator(day):
    """h_p shares the operator's grid/NaN semantics and h_p ≤ h' always;
    at the lowest frequencies both approach the reflection height."""
    alt, den, bmag, bpsi = day
    freqs = np.arange(0.5, 17.5, 0.5)
    vh = np.asarray(prt.vertical_forward_operator(freqs, den, bmag, bpsi,
                                                  alt, mode="O"))
    hp = np.asarray(prt.vertical_phase_operator(freqs, den, bmag, bpsi,
                                                alt, mode="O"))
    m = np.isfinite(vh)
    assert np.array_equal(np.isfinite(hp), m)
    assert (hp[m] <= vh[m]).all()
    assert (hp[m] >= alt.min()).all()
    # X mode too
    hpx = np.asarray(prt.vertical_phase_operator(freqs, den, bmag, bpsi,
                                                 alt, mode="X"))
    vhx = np.asarray(prt.vertical_forward_operator(freqs, den, bmag, bpsi,
                                                   alt, mode="X"))
    mx = np.isfinite(vhx)
    assert (hpx[mx] <= vhx[mx]).all()


def test_phase_height_free_space_slab():
    """Below any ionisation h_p(f) equals the geometric height exactly:
    a profile that is vacuum up to 200 km then reflects gives
    h_p ≈ slightly less than the reflection height, and for a sharp
    mirror h_p → h_mirror."""
    alt = np.arange(0.0, 400.0, 0.25)
    # steep RISING ramp above 200 km (the regrid truncates peak-exclusive
    # at argmax, so a flat lid would lose its cutoff crossing)
    den = np.clip((alt - 200.0) / 10.0, 0.0, None) * prt.freq2den(30e6) + 1.0
    bmag = np.full_like(alt, 1e-9)
    bpsi = np.full_like(alt, 45.0)
    hp = float(np.asarray(prt.vertical_phase_operator(
        np.array([5.0]), den, bmag, bpsi, alt, mode="O"))[0])
    # vacuum below the mirror: phase height = mirror height (±grid step)
    assert abs(hp - 200.0) < 1.0


def test_faraday_ql_limit(day):
    """Exact AH Faraday rotation converges to the QL closed form
    (π f/c)∫X·Y·cosψ dh at high frequency, from above (O(X²) terms add)."""
    alt, den, bmag, bpsi = day
    f = np.array([40e6, 80e6, 150e6, 300e6])
    om = np.asarray(prt.faraday_rotation_vertical(f, den, bmag, bpsi, alt))
    X = np.asarray(find_X(den[None, :], f[:, None]))
    Y = np.asarray(find_Y(f[:, None], bmag[None, :]))
    integ = np.trapezoid(X * Y * np.cos(np.deg2rad(bpsi))[None, :],
                         alt, axis=1)
    om_ql = np.pi * f / C_KM_S * integ
    ratio = om / om_ql
    assert (ratio > 1.0).all()                  # exact ≥ QL
    assert abs(ratio[0] - 1) < 0.05             # 40 MHz: ~4%
    assert abs(ratio[-1] - 1) < 0.002           # 300 MHz: <0.2%
    # rotation falls ~f⁻² (one power in the prefactor, f⁻³ in X·Y)
    assert 3.7 < om[0] / om[1] < 4.5


def test_faraday_escape_and_grad(day):
    """Below penetration → NaN; above → differentiable w.r.t. density
    with the B·cosψ-weighted positive sensitivity."""
    import jax
    import jax.numpy as jnp

    alt, den, bmag, bpsi = day
    assert np.isnan(float(prt.faraday_rotation_vertical(
        5e6, den, bmag, bpsi, alt)))

    f = 100e6
    g = jax.grad(lambda d: prt.faraday_rotation_vertical(
        f, d, bmag, bpsi, alt))(jnp.asarray(den, float))
    g = np.asarray(g)
    assert np.isfinite(g).all()
    # interior sensitivity positive (more plasma -> more rotation)
    assert (g[1:-1] > 0).all()
    # doubling a thin slab of density doubles its contribution (linearity
    # in N at high f): grad ratio between two altitudes tracks B·cosψ/f²
    i, j = 100, 400
    pred = (bmag[i] * np.cos(np.deg2rad(bpsi[i]))) / \
        (bmag[j] * np.cos(np.deg2rad(bpsi[j])))
    got = g[i] / g[j]
    # same trapezoid weights on a uniform grid away from edges
    dw_i = (alt[i + 1] - alt[i - 1])
    dw_j = (alt[j + 1] - alt[j - 1])
    assert abs((got / (pred * dw_i / dw_j)) - 1) < 0.02


def test_oblique_phase_keys(day):
    """Homed oblique outputs carry the phase path with the group-path
    NaN structure and ordering."""
    alt, den, bmag, bpsi = day
    f0s = np.arange(5e6, 13e6, 2e6)
    o = prt.synthesize_oblique_ionogram(f0s, 1000.0, alt, den, bmag, bpsi,
                                        geometry="cartesian", n_elev=181)
    for leg in ("low", "high"):
        ph = np.asarray(o[f"phase_path_{leg}_km"])
        gp = np.asarray(o[f"group_path_{leg}_km"])
        m = np.isfinite(gp)
        assert m.any()
        assert np.array_equal(np.isfinite(ph), m)
        assert (ph[m] < gp[m]).all()
        assert (ph[m] > 1000.0).all()   # exceeds the straight-line link


def test_doppler_via_autodiff(day):
    """The vertical-incidence Doppler shift −(2f/c)·d h_p/dt of a
    time-parameterised ionosphere via jax.grad matches finite
    differences, with the physical sign (rising density → falling phase
    height → positive Doppler)."""
    import jax
    import jax.numpy as jnp

    alt, den, bmag, bpsi = day
    f_mhz = jnp.asarray([5.0])
    rate = 0.02          # fractional density growth per second

    def phase_height(t):
        den_t = jnp.asarray(den) * (1.0 + rate * t)
        return prt.vertical_phase_operator(f_mhz, den_t, bmag, bpsi,
                                           alt)[0]

    dh_dt = float(jax.grad(phase_height)(0.0))
    eps = 1e-3
    fd = (float(phase_height(eps)) - float(phase_height(-eps))) / (2 * eps)
    np.testing.assert_allclose(dh_dt, fd, rtol=1e-4)
    assert dh_dt < 0.0                       # phase height drops
    f_hz = 5e6
    doppler = -2.0 * f_hz / (C_KM_S) * dh_dt
    assert 0.0 < doppler < 100.0             # physical Hz-scale shift
