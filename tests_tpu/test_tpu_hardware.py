"""Real-TPU regression tests for the Mosaic-compiled fused kernels.

These re-run, as red/green tests, the three on-device checks that
``bench.py`` prints every round (round-3 verdict item 7):

* the f32 parity table vs the f64 reference-oracle goldens
  (Day/Night x O/X x 200/20k x all three kernel engines);
* the f32 X-mode 20k accuracy budget;
* the kernel reverse- AND forward-mode gradients on hardware (the f32
  cotangent-overflow guard in ``_mu_mup_stable_tile`` only matters on
  real TPU — interpret mode never exercised it).

Bounds are ~2x the round-3 measured values (recorded in BENCHMARKS.md)
so tunnel-session noise never flakes them while a real numeric
regression (e.g. a ``pl.when`` accumulator-init break) goes red.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyrayhf_tpu.pallas_vh import (ionogram_fast_xla, ionogram_pallas,
                                   ionogram_pallas_gather)

pytestmark = pytest.mark.tpu

# measured round-3 maxima (BENCHMARKS.md): <= 0.021 km across the table;
# X-20k f32 0.0045 km. Budget from the driver: 0.1 km.
_TABLE_BOUND_KM = 0.05
_X20K_BOUND_KM = 0.01

_ENGINES = (("gather", ionogram_pallas_gather),
            ("pallas", ionogram_pallas),
            ("fast_xla", ionogram_fast_xla))


def _run(impl, prof, freqs, mode_mult, n_points):
    args = tuple(jnp.asarray(a, jnp.float32) for a in
                 (freqs, prof["den"][None, :], prof["bmag"][None, :],
                  prof["bpsi"][None, :], prof["alt"]))
    return np.asarray(impl(*args, mode_mult=mode_mult,
                           n_points=n_points))[0]


def test_f32_parity_table_on_device(goldens, day_profile, night_profile):
    freqs = goldens["vfo_freqs"]
    for pname, prof in (("day", day_profile), ("night", night_profile)):
        for mode, mm in (("O", 1.0), ("X", -1.0)):
            for npts in (200, 20000):
                key = f"vfo_{pname}_{mode}_{npts}"
                if key not in goldens:
                    continue
                ref = goldens[key]
                for iname, impl in _ENGINES:
                    vh = _run(impl, prof, freqs, mm, npts)
                    assert np.array_equal(np.isnan(vh), np.isnan(ref)), \
                        (key, iname)
                    m = np.isfinite(ref)
                    d = float(np.abs(vh[m] - ref[m]).max())
                    assert d < _TABLE_BOUND_KM, (key, iname, d)


def test_f32_xmode_20k_budget_on_device(goldens, day_profile):
    ref = goldens["vfo_day_X_20000"]
    m = np.isfinite(ref)
    for iname, impl in _ENGINES[:2]:
        vh = _run(impl, day_profile, goldens["vfo_freqs"], -1.0, 20000)
        d = float(np.abs(vh[m] - ref[m]).max())
        assert d < _X20K_BOUND_KM, (iname, d)


def test_kernel_gradients_both_modes_on_device(day_profile, goldens):
    """grad + jacfwd through the compiled kernels are finite and agree
    with the XLA sweep (the custom-JVP tangent path) on hardware."""
    freqs = goldens["vfo_freqs"]
    den = jnp.asarray(day_profile["den"][None, :], jnp.float32)
    bmag = jnp.asarray(day_profile["bmag"][None, :], jnp.float32)
    bpsi = jnp.asarray(day_profile["bpsi"][None, :], jnp.float32)
    alt = jnp.asarray(day_profile["alt"], jnp.float32)
    fq = jnp.asarray(freqs, jnp.float32)

    def loss(impl):
        def f(scale):
            vh = impl(fq, scale * den, bmag, bpsi, alt,
                      mode_mult=1.0, n_points=200)
            return jnp.sum(jnp.where(jnp.isfinite(vh), vh, 0.0))
        return f

    g_ref = float(jax.grad(loss(ionogram_fast_xla))(jnp.float32(1.0)))
    assert np.isfinite(g_ref)
    for iname, impl in _ENGINES[:2]:
        g_rev = float(jax.grad(loss(impl))(jnp.float32(1.0)))
        g_fwd = float(jax.jacfwd(loss(impl))(jnp.float32(1.0)))
        assert np.isfinite(g_rev) and np.isfinite(g_fwd), iname
        np.testing.assert_allclose(g_rev, g_ref, rtol=1e-4, err_msg=iname)
        np.testing.assert_allclose(g_fwd, g_ref, rtol=1e-4, err_msg=iname)


def test_new_surfaces_smoke_on_device(day_profile):
    """Round-3 additions run on the real chip: oblique link budget with
    ground loss, MUF scaling, phase operator, Faraday, and a 3-D fan."""
    import pyrayhf_tpu as prt

    d = day_profile
    alt, den = np.asarray(d["alt"]), np.asarray(d["den"])
    bmag, bpsi = np.asarray(d["bmag"]), np.asarray(d["bpsi"])

    o = prt.synthesize_oblique_ionogram(
        np.array([8e6, 10e6]), 1500.0, alt, den, bmag, bpsi,
        geometry="spherical", n_elev=181, n_hops=2, ground="medium")
    dl = np.asarray(o["delay_low_sec"])
    assert np.isfinite(dl).any()
    m = np.isfinite(dl)
    assert np.isfinite(np.asarray(o["link_loss_low_db"])[m]).all()
    assert (np.asarray(o["ground_loss_low_db"])[m] > 0).all()
    assert (np.asarray(o["phase_path_low_km"])[m]
            < np.asarray(o["group_path_low_km"])[m]).all()

    muf = float(prt.muf_from_profile(2000.0, den, bmag, bpsi, alt))
    foF2 = float(prt.den2freq(den.max())) / 1e6
    assert foF2 < muf < 3.5 * foF2

    hp = np.asarray(prt.vertical_phase_operator(
        np.array([5.0, 8.0]), den, bmag, bpsi, alt))
    assert np.isfinite(hp).all()

    om = float(prt.faraday_rotation_vertical(100e6, den, bmag, bpsi, alt))
    assert 1.0 < om < 100.0

    lat = np.linspace(20.0, 50.0, 16)
    lon = np.linspace(-85.0, -55.0, 16)
    shape = (alt.size, lat.size, lon.size)
    field = prt.build_field_3d(alt, lat, lon,
                               np.broadcast_to(den[:, None, None], shape),
                               np.broadcast_to(bmag[:, None, None], shape),
                               np.broadcast_to(bpsi[:, None, None], shape),
                               8e6, "O")
    out = prt.trace_rays_3d(field, 32.0, -70.0, np.array([30.0, 45.0]),
                            np.array([180.0]), step_km=2.0,
                            s_max_km=2000.0)
    assert np.isfinite(np.asarray(out["ground_range_km"])).all()


def test_round4_surfaces_smoke_on_device(day_profile):
    """Round-4 additions run on the real chip: the anisotropic
    dispersion-surface tracer (value_and_grad RHS through the Mosaic-
    free XLA path) and the joint O+X true-height lamination (per-knot
    lax.cond mode switch inside the bisection scan)."""
    import pyrayhf_tpu as prt

    d = day_profile
    alt, den = np.asarray(d["alt"]), np.asarray(d["den"])
    bmag, bpsi = np.asarray(d["bmag"]), np.asarray(d["bpsi"])

    # anisotropic 3-D trace: O/X pair through a uniform-B volume
    lat = np.linspace(20.0, 45.0, 9)
    lon = np.linspace(-80.0, -60.0, 9)
    shape = (alt.size, lat.size, lon.size)
    U = lambda v: np.broadcast_to(np.asarray(v)[:, None, None], shape)
    bn = U(np.full_like(alt, 2.2e-5))
    be = U(np.zeros_like(alt))
    bd = U(np.full_like(alt, -3.8e-5))
    field = prt.build_field_3d_aniso(alt, lat, lon, U(den), bn, be, bd)
    res = {}
    # elevation 25: a mid-fan launch both modes land in f32 (round 5:
    # steeper launches land too since the _ah_n2 ulp-gate fix — the
    # "f32 group-velocity underflow" freeze was actually the n2<=1+1e-12
    # validity gate tripping on the TPU's reciprocal-multiply division)
    for mode in ("O", "X"):
        r = prt.trace_ray_3d_anisotropic(field, 30.0, -70.0, 25.0, 90.0,
                                         8e6, mode=mode, step_km=4.0,
                                         s_max_km=1600.0)
        assert r["status"] == "ground"
        assert np.isfinite(float(r["group_delay_sec"]))
        res[mode] = r
    # O and X split out of plane in opposite senses on an eastward link
    co = float(res["O"]["cross_track_km"])
    cx = float(res["X"]["cross_track_km"])
    assert co * cx < 0.0
    # |u| rides the dispersion shell
    u = np.asarray(res["O"]["u"])[np.asarray(res["O"]["alive"])]
    um = np.linalg.norm(u, axis=1)
    assert um.max() < 1.0 + 1e-6

    # joint O+X true-height inversion (f32 on-chip lamination)
    f_o = np.arange(2.0, 7.0, 0.25)
    vh_o = np.asarray(prt.vertical_forward_operator(
        f_o, den, bmag, bpsi, alt, mode="O"))
    f_x = f_o + 0.63
    vh_x = np.asarray(prt.vertical_forward_operator(
        f_x, den, bmag, bpsi, alt, mode="X"))
    assert np.isfinite(vh_o).all() and np.isfinite(vh_x).all()
    out = prt.retrieve_profile_joint(
        f_o, vh_o, f_x, vh_x, alt, bmag, bpsi,
        start_gap_km=np.array([10.0, 20.0, 35.0]))
    # f32 lamination floor is ~0.08 km rms (DEVNOTES); give 6x headroom
    assert float(out["rms_km"]) < 0.5
    mode_knots = np.asarray(out["mode_knots"])
    assert np.sum(mode_knots > 0) == f_o.size
    assert np.sum(mode_knots < 0) == f_x.size


def test_gather_kernel_perf_floor_on_device(day_profile, goldens):
    """The headline kernel must deliver >=8e6 vh evals/s (round-5
    verdict item 9). The driver-recorded record is 1.07e7 (BENCH_r04);
    the floor leaves ~25% headroom for tunnel-session drift (the
    largest cross-session swing observed on this path is +-15%,
    BENCHMARKS.md round 5) while a Mosaic regression that halves
    throughput goes red. Timing discipline mirrors bench.py: pipelined
    launches fenced by a device->host copy (the tunnel's
    block_until_ready is lazy — it does NOT force execution)."""
    import time

    d = day_profile
    B = 1024
    freqs = goldens["vfo_freqs"]
    F = freqs.size
    args = (jnp.asarray(freqs, jnp.float32),
            jnp.asarray(np.linspace(0.7, 1.3, B)[:, None]
                        * np.asarray(d["den"])[None, :], jnp.float32),
            jnp.asarray(np.broadcast_to(d["bmag"], (B, d["alt"].size)),
                        jnp.float32),
            jnp.asarray(np.broadcast_to(d["bpsi"], (B, d["alt"].size)),
                        jnp.float32),
            jnp.asarray(d["alt"], jnp.float32))
    fn = lambda: ionogram_pallas_gather(*args, mode_mult=1.0, n_points=200)
    for _ in range(3):
        out = fn()
    _ = np.asarray(jnp.ravel(out)[0])
    best = np.inf
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn()
        _ = np.asarray(jnp.ravel(out)[0])
        best = min(best, (time.perf_counter() - t0) / 10)
    rate = B * F / best
    assert rate >= 8e6, f"gather kernel regressed: {rate:.3e} evals/s"


def test_fan_kernel_perf_floor_and_parity_on_device():
    """Round-5 Pallas ray-fan kernel on the real chip: the typical-
    scene [64x128x2000] fan must run >=2e4 rays/s (measured 4.1e4,
    BENCHMARKS.md round 5 — 2x margin), and its landing table must
    match the XLA scan fan exactly on finiteness with sub-km range
    agreement."""
    import time

    from pyrayhf_tpu.oblique import _fan_2d_fn

    F, E, NSTEP = 64, 128, 2000
    z = np.linspace(0.0, 638.75, 512)
    x = np.linspace(0.0, 3995.0, 32)
    h = (z[:, None] - 250.0) / 45.0
    ne = (8.0e11 * (1.0 + 0.15 * (x[None, :] / x[-1] - 0.5))
          * np.exp(0.5 * (1.0 - h - np.exp(-h))))
    babs = np.full(ne.shape, 4.5e-5)
    bpsi = np.full(ne.shape, np.deg2rad(30.0))
    nu_z = 1e7 * np.exp(-(z - 70.0) / 8.0)
    args = (jnp.asarray(np.linspace(4e6, 30e6, F)),
            jnp.asarray([5.0, 85.0]), jnp.asarray(ne, jnp.float32),
            jnp.asarray(babs, jnp.float32), jnp.asarray(bpsi, jnp.float32),
            jnp.asarray(nu_z, jnp.float32), jnp.asarray(2.0, jnp.float32))

    fan_pl = _fan_2d_fn(z, x, "O", "cartesian", E, NSTEP, 1,
                        engine="pallas")
    fan_xla = _fan_2d_fn(z, x, "O", "cartesian", E, NSTEP, 1,
                         engine="xla")
    r_pl = fan_pl(*args)
    r_xla = np.asarray(fan_xla(*args)[0])
    rng = np.asarray(r_pl[0])
    assert np.array_equal(np.isfinite(rng), np.isfinite(r_xla))
    m = np.isfinite(rng)
    assert m.any() and (~m).any()
    assert float(np.abs(rng[m] - r_xla[m]).max()) < 1.0  # f32, 2000 steps

    best = np.inf
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            out = fan_pl(*args)
        _ = np.asarray(jnp.ravel(out[0])[0])
        best = min(best, (time.perf_counter() - t0) / 3)
    rate = F * E / best
    assert rate >= 2e4, f"fan kernel regressed: {rate:.3e} rays/s"


def test_aniso_homing_smoke_on_device():
    """Round-5 addition: anisotropic two-angle homing (dispersion-
    surface fan + crossing solve) runs on the real chip and closes a
    northward link, with a D region producing nonzero absorption
    through the homed ray's own kappa integral."""
    import pyrayhf_tpu as prt

    alt = np.linspace(60.0, 600.0, 109)
    lat = np.linspace(20.0, 60.0, 17)
    lon = np.linspace(-10.0, 10.0, 9)
    ne1 = (1.0e12 * np.maximum(0.0, 1.0 - ((alt - 300.0) / 120.0) ** 2)
           + 2.0e9 * np.exp(-((alt - 80.0) / 9.0) ** 2))
    Ne = np.broadcast_to(ne1[:, None, None],
                         (alt.size, lat.size, lon.size)).copy()
    bn, be, bd = prt.igrf_volume(alt, lat, lon)
    field = prt.build_field_3d_aniso(alt, lat, lon, Ne, bn, be, bd)
    # 900-km link, elevations 14-34 deg: round 4 had to clamp the band
    # at 26 deg because steeper f32 fan rays froze mid-flight — cured by
    # the round-5 _ah_n2 ulp-gate fix (the freeze was the n2<=1+1e-12
    # validity gate tripping on TPU's reciprocal-multiply division, not
    # a group-velocity underflow); the widened band is the regression
    # net for that fix on the homing surface
    out = prt.home_ray_3d_anisotropic(field, 30.0, 0.0, 38.1, 0.0, 8e6,
                                      mode="O", n_elev=12, n_az=3,
                                      az_span_deg=3.0, elev_min_deg=14.0,
                                      elev_max_deg=34.0, step_km=4.0,
                                      s_max_km=1800.0)
    d = float(out["delay_low_sec"])
    assert np.isfinite(d)
    # 900-km link: delay between the free-space chord and 2x it
    assert 900.0 / 3e5 < d < 2 * 900.0 / 3e5
    assert float(out["absorption_low_db"]) > 0.5
    assert abs(float(out["azimuth_offset_low_deg"])) < 1.0


def test_aniso_one_launch_ionogram_on_device():
    """Round-5 regression net: the one-launch multi-frequency
    anisotropic oblique ionogram (frequency as a frozen state channel
    in the early-exit fan) produces finite, MUF-ordered rows on the
    real chip for an EASTWARD f32 link — the exact surface that came
    back all-NaN before the _ah_n2 ulp-gate fix (grazing rays froze
    where the O-branch f32 quotient rounded to 1 + 1 ulp on the TPU's
    non-IEEE division and the 1e-12 physicality headroom invalidated
    the point)."""
    import jax
    import jax.numpy as jnp

    import pyrayhf_tpu as prt

    alt = np.linspace(60.0, 500.0, 100)
    lat = np.linspace(30.0, 50.0, 21)
    lon = np.linspace(-10.0, 10.0, 21)
    h = (alt[:, None, None] - 250.0) / 45.0
    nmf2 = 6.0e11 * (1.0 + 0.2 * (lat[None, :, None] - 40.0) / 20.0
                     + 0.1 * lon[None, None, :] / 10.0)
    Ne = nmf2 * np.exp(0.5 * (1.0 - h - np.exp(-h)))
    bn, be, bd = prt.igrf_volume(alt, lat, lon)
    field = prt.build_field_3d_aniso(alt, lat, lon, Ne, bn, be, bd)
    f32 = jnp.float32
    field = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, f32) if hasattr(v, "dtype") else v,
        field)
    f0s = np.array([5.0e6, 6.0e6, 7.0e6, 20.0e6])
    out = prt.synthesize_oblique_ionogram_3d_anisotropic(
        f0s, 40.0, -2.0, 40.5, 6.0, field, mode="O", n_elev=24, n_az=5,
        az_span_deg=6.0, elev_min_deg=10.0, elev_max_deg=60.0,
        step_km=4.0, s_max_km=3000.0)
    d = np.asarray(out["delay_low_sec"])
    # the three in-band rows close the 681-km link; 20 MHz >> MUF is NaN
    assert np.isfinite(d[:3]).all()
    assert not np.isfinite(d[3])
    chord_delay = 681.0 / 3.0e5
    assert (d[:3] > chord_delay).all()
    # low-ray delay grows toward the MUF
    assert d[0] < d[1] < d[2]


def test_doppler_smoke_on_device(day_profile):
    """Round-5 Doppler product runs on the real chip (f32): uplift
    red-shifts every reflected frequency and the 5 MHz shift lands
    within 10% of the moving-mirror value -2fv/c."""
    import pyrayhf_tpu as prt
    from pyrayhf_tpu.constants import C_KM_S

    d = day_profile
    alt = np.asarray(d["alt"], dtype=np.float32)
    den = np.asarray(d["den"], dtype=np.float32)
    v = 0.02
    dden_dt = (-v * np.gradient(den.astype(np.float64), alt.astype(
        np.float64))).astype(np.float32)
    freqs = np.arange(2.0, 12.0, 1.0, dtype=np.float32)
    out = prt.doppler_shift_vertical(
        freqs, den, dden_dt, np.asarray(d["bmag"], np.float32),
        np.asarray(d["bpsi"], np.float32), alt, mode="O")
    fd = np.asarray(out["doppler_hz"])
    m = np.isfinite(fd)
    assert m.sum() >= 8
    assert (fd[m] < 0.0).all()
    mirror = -2.0 * 5e6 * v / C_KM_S
    assert abs(fd[3] / mirror - 1.0) < 0.10
