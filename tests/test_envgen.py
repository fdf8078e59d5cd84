"""IGRF, climatology input generation, IO, and profiling-utility tests."""

import numpy as np
from numpy.testing import assert_allclose

from pyrayhf_tpu import igrf
from pyrayhf_tpu.envgen import (climatology_parameters,
                                find_mean_gradient_error,
                                generate_input_1D, generate_input_2D,
                                solar_zenith_angle)
from pyrayhf_tpu.io import load_checkpoint, load_input, save_checkpoint


def test_igrf_dipole_magnitudes():
    """Field strength and inclination in physically correct ranges."""
    _, _, _, Bmag, inc = igrf.igrf_field(0.0, 0.0, 0.0)
    assert 25000 < float(Bmag) < 40000          # equatorial surface field nT
    _, _, _, Bp, incp = igrf.igrf_field(85.0, 0.0, 0.0)
    assert 50000 < float(Bp) < 65000            # polar field stronger
    assert abs(float(incp)) > 75.0              # near-vertical at high lat
    # field decays ~ (a/r)^3
    _, _, _, Bhi, _ = igrf.igrf_field(0.0, 0.0, 6371.0)
    assert float(Bhi) < float(Bmag) / 6


def test_igrf_vs_known_2020_values():
    """Sanity vs published IGRF-13 2020 values (low-degree truncation ⇒ a
    few-percent tolerance)."""
    # London (51.5N, 0E): |B| ≈ 49,000 nT, inclination ≈ +66°
    _, _, _, B, inc = igrf.igrf_field(51.5, 0.0, 0.0)
    assert abs(float(B) - 49000) / 49000 < 0.10
    assert 55 < float(inc) < 75


def test_calculate_magnetic_field_api():
    aalt = np.linspace(90.0, 500.0, 40)
    mag, psi = igrf.calculate_magnetic_field(2020, 6, 1, np.array([45.0]),
                                             np.array([-75.0]), aalt)
    mag, psi = np.asarray(mag), np.asarray(psi)
    assert mag.shape == (40, 1) and psi.shape == (40, 1)
    assert np.all((mag > 1e-5) & (mag < 1e-4))      # Tesla
    assert np.all((psi >= 0) & (psi <= 90))
    assert np.all(np.diff(mag[:, 0]) < 0)            # decays with altitude


def test_solar_zenith_angle():
    # local noon at equator near equinox → χ small; midnight → χ large
    chi_noon = float(solar_zenith_angle(2020, 3, 21, 12.0, 0.0, 0.0))
    chi_mid = float(solar_zenith_angle(2020, 3, 21, 0.0, 0.0, 0.0))
    assert chi_noon < 10.0
    assert chi_mid > 150.0


def test_climatology_day_night_contrast():
    F2d, F1d, Ed = climatology_parameters(2020, 6, 1, 12.0, 0.0, 0.0, 150.0)
    F2n, F1n, En = climatology_parameters(2020, 6, 1, 0.0, 0.0, 0.0, 150.0)
    assert float(Ed["fo"]) > 2.5                 # daytime E layer
    assert float(En["fo"]) < 1.0                 # night E collapses
    assert float(F1d["P"]) > 0.5                 # F1 present by day
    assert float(F1n["P"]) == 0.0
    assert float(F2d["fo"]) > float(F2n["fo"])


def test_generate_input_1d_runs_forward(tmp_path):
    aalt = np.arange(80.0, 700.0, 2.0)
    out = generate_input_1D(2020, 6, 1, 17.0, 30.0, -85.0, aalt, 140.0,
                            save_path=str(tmp_path / "in.p"))
    assert out["den"].shape == aalt.shape
    assert out["bmag"].shape == aalt.shape
    assert np.all(out["den"] > 0)
    # generated input feeds the forward operator end-to-end
    from pyrayhf_tpu import vertical_forward_operator
    vh = np.asarray(vertical_forward_operator(
        np.arange(1.0, 10.0, 0.5), out["den"], out["bmag"], out["bpsi"],
        out["alt"]))
    assert np.isfinite(vh).sum() > 5
    reloaded = load_input(str(tmp_path / "in.p"))
    assert_allclose(reloaded["den"], out["den"])


def test_generate_input_2d_shapes():
    aalt = np.arange(90.0, 500.0, 5.0)
    out = generate_input_2D(2020, 6, 1, 17.0, 40.0, -100.0, dx=100.0,
                            aalt=aalt, gcd=2000.0, az=90.0, F107=120.0)
    n_x = int(2000.0 / 100.0)
    assert out["xgrid"].shape == (n_x,)
    assert out["den"].shape == (aalt.size, n_x)
    assert out["bmag"].shape == (aalt.size, n_x)
    # eastward slice at constant-ish latitude: lat varies slowly
    assert np.abs(out["xlat"] - 40.0).max() < 15.0


def test_find_mean_gradient_error_shapes():
    err, F2_mid = find_mean_gradient_error(
        np.array([-100.0, 10.0]), np.array([40.0, 50.0]),
        np.array([-90.0, 20.0]), np.array([45.0, 45.0]),
        2020, 6, 1, 17.0, 120.0)
    err = np.asarray(err)
    assert err.shape == (2,)
    assert np.all(np.isfinite(err))


def test_checkpoint_roundtrip(tmp_path):
    state = {"theta": {"hm": np.array([300.0, 310.0]),
                       "bb": np.array([40.0, 50.0])},
             "step": np.array(7)}
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(state, p)
    back = load_checkpoint(p)
    assert_allclose(back["theta"]["hm"], state["theta"]["hm"])
    assert int(back["step"]) == 7


def test_time_launch_and_cost():
    import jax.numpy as jnp
    from pyrayhf_tpu.profiling import operator_cost, time_launch
    import jax
    f = jax.jit(lambda x: jnp.sum(x * x))
    dt = time_launch(f, jnp.ones(1000), iters=2, warmup=1)
    assert dt > 0
    c = operator_cost(4, 175, 200, 620)
    assert c["points"] == 4 * 175 * 200


def test_climatology_vs_pyiri_points(day_profile, night_profile):
    """Validate the modip climatology against real PyIRI output.

    The reference's shipped pickles carry the PyIRI layer-parameter dicts
    at two (location, local-time) points — the only external climatology
    ground truth available without PyIRI's coefficient databases. The
    round-3 modip model (equatorial-anomaly crest + post-sunset
    enhancement + night depression, calibrated on these two points —
    envgen.py module docstring), with the round-4 amplitude refit,
    reproduces EVERY F2 parameter at BOTH points within 0.5% (measured
    ≤0.19% — docs/accuracy.md error table), including the night foF2
    that the round-1 zenith formula could not represent at all (13.9 MHz
    at local midnight — the equatorial evening anomaly; the night site
    sits on the crest, modip −17°).
    """
    from pyrayhf_tpu.envgen import climatology_parameters

    def at(prof):
        F2, F1, E = climatology_parameters(
            prof["year"], prof["month"], prof["day"], prof["UT"],
            prof["tlat"], prof["tlon"], prof["F107"])
        sc = lambda v: float(np.ravel(v)[0])
        return ({k: sc(v) for k, v in F2.items()},
                {k: sc(v) for k, v in F1.items()},
                {k: sc(v) for k, v in E.items()})

    ref = lambda d: {k: float(np.ravel(v)[0]) for k, v in d.items()}

    # round 4: the zenith-dependence amplitudes are refit so the pair is
    # reproduced to <0.2% on every parameter (envgen.py); the bound is
    # 0.5% — anything looser would hide a regression of the refit
    bounds = {"fo": 0.005, "hm": 0.005, "B_bot": 0.005, "B_top": 0.005,
              "B0": 0.005, "B1": 0.005, "M3000": 0.005}

    F2d, F1d, Ed = at(day_profile)
    rF2d, rF1d, rEd = (ref(day_profile[k]) for k in ("F2", "F1", "E"))
    assert abs(Ed["fo"] / rEd["fo"] - 1) < 0.02          # Davies foE, day
    assert abs(Ed["solzen"] - rEd["solzen"]) < 1.0       # zenith angle
    for k, b in bounds.items():
        assert abs(F2d[k] / rF2d[k] - 1) < b, ("day", k, F2d[k], rF2d[k])
    assert 0.5 < F1d["P"] <= 1.0 and rF1d["P"] > 0.5     # F1 present by day

    F2n, F1n, En = at(night_profile)
    rF2n, rF1n, rEn = (ref(night_profile[k]) for k in ("F2", "F1", "E"))
    assert abs(En["fo"] - rEn["fo"]) < 0.2               # night foE floor
    assert F1n["P"] == 0.0 and rF1n["P"] < 0.01          # no F1 at night
    for k, b in bounds.items():
        assert abs(F2n[k] / rF2n[k] - 1) < b, ("night", k, F2n[k], rF2n[k])


def test_climatology_anomaly_crests():
    """Latitude scan shows the equatorial-anomaly structure.

    Daytime: foF2 crests near |modip| ≈ 16° exceed the dip-equator
    trough value. Post-sunset: the low-modip evening enhancement keeps
    equatorial foF2 near its daytime level while mid-latitudes drop.
    """
    from pyrayhf_tpu.envgen import climatology_parameters, modip_deg

    lats = np.linspace(-40.0, 40.0, 81)
    lons = np.full_like(lats, -150.0)
    m = np.asarray(modip_deg(2025, 9, 1, lats, lons))

    def fo_at(UT):
        F2, _, _ = climatology_parameters(2025, 9, 1, UT, lats, lons,
                                          204.0)
        return np.asarray(F2["fo"])

    fo_day = fo_at(0.0)          # LT 14 at lon -150
    i_eq = np.argmin(np.abs(m))
    i_cn = np.argmin(np.abs(m + 16.0))      # south crest
    i_cp = np.argmin(np.abs(m - 16.0))      # north crest
    assert fo_day[i_cn] > 1.08 * fo_day[i_eq]
    assert fo_day[i_cp] > 1.08 * fo_day[i_eq]
    # high-modip daytime values fall below the crests
    assert fo_day[i_cp] > fo_day[np.argmax(m)]
    assert fo_day[i_cn] > fo_day[np.argmin(m)]

    # post-sunset (LT 22.5 -> UT 8.5 at lon -150): equatorial evening
    # anomaly keeps low-modip foF2 within ~15% of its daytime value,
    # while a mid-latitude night point (via modip > 25 region at these
    # lons it stays < 25 — use the depression factor indirectly) drops
    fo_pss = fo_at(8.5)
    assert fo_pss[i_cp] > 0.85 * fo_day[i_cp]
    # pre-dawn (LT 4.5): enhancement gone, clearly below the evening value
    fo_dawn = fo_at(14.5)
    assert fo_dawn[i_cp] < 0.75 * fo_pss[i_cp]


def test_climatology_winter_anomaly():
    """Winter-anomaly sign and solar-activity dependence (CCIR
    morphology): at solar MAX the daytime mid-latitude foF2 is HIGHER in
    the local winter than in summer despite the larger zenith angle —
    in BOTH hemispheres — and the anomaly vanishes (reverses to plain
    zenith control) at solar MIN. A purely zenith-driven model gets the
    solar-max sign wrong; this pins the round-4 winter term."""
    def noon_fo(month, lat, F107):
        F2, _, _ = climatology_parameters(2020, month, 21, 12.0, lat,
                                          0.0, F107)
        return float(np.ravel(F2["fo"])[0])

    # solar max: winter noon beats summer noon at modip ~±52°
    assert noon_fo(12, 45.0, 200.0) > 1.05 * noon_fo(6, 45.0, 200.0)
    assert noon_fo(6, -45.0, 200.0) > 1.05 * noon_fo(12, -45.0, 200.0)
    # solar min: plain zenith control (summer clearly higher)
    assert noon_fo(12, 45.0, 70.0) < 0.95 * noon_fo(6, 45.0, 70.0)
    assert noon_fo(6, -45.0, 70.0) < 0.95 * noon_fo(12, -45.0, 70.0)
    # the term is a DAYTIME feature: winter/summer midnight unaffected
    def mid_fo(month, lat):
        F2, _, _ = climatology_parameters(2020, month, 21, 0.0, lat,
                                          0.0, 200.0)
        return float(np.ravel(F2["fo"])[0])
    assert abs(mid_fo(12, 45.0) / mid_fo(6, 45.0) - 1.0) < 0.35


def test_climatology_solar_cycle_scaling():
    """Noon foF2 roughly doubles from solar minimum to maximum (CCIR
    behavior) and saturates above F107 ≈ 200; hmF2 rises with activity."""
    def at(F107):
        F2, _, _ = climatology_parameters(2020, 3, 21, 12.0, 0.0, 0.0,
                                          F107)
        return (float(np.ravel(F2["fo"])[0]), float(np.ravel(F2["hm"])[0]))

    fo_min, hm_min = at(70.0)
    fo_max, hm_max = at(200.0)
    fo_sat, _ = at(280.0)
    assert 1.8 < fo_max / fo_min < 2.5
    assert fo_sat == fo_max                      # clamp above 200 sfu
    assert hm_max > hm_min + 20.0                # activity uplift
    # monotone in between
    fo_mid, _ = at(135.0)
    assert fo_min < fo_mid < fo_max


def test_checkpoint_atomic_and_legacy(tmp_path):
    """Atomic overwrite leaves no temp files; legacy '.'-keyed files load."""
    import os
    p = str(tmp_path / "state.npz")
    save_checkpoint({"a": {"b": np.arange(3)}}, p)
    save_checkpoint({"a": {"b": np.arange(5)}}, p)   # overwrite in place
    back = load_checkpoint(p)
    assert_allclose(back["a"]["b"], np.arange(5))
    assert [f for f in os.listdir(tmp_path) if "tmp" in f] == []
    # legacy format: keys flattened with '.' (pre-U+001F separator)
    pleg = str(tmp_path / "legacy.npz")
    np.savez_compressed(pleg, **{"F2.hm": np.array([300.0]),
                                 "step": np.array(3)})
    leg = load_checkpoint(pleg)
    assert_allclose(leg["F2"]["hm"], [300.0])
    assert int(leg["step"]) == 3


def test_checkpoint_dotted_keys_roundtrip(tmp_path):
    """New-format files with dotted keys must NOT be mis-read as legacy.

    Regression for the round-2 advisor finding: a flat dict whose only key
    contains a dot (e.g. a frequency label '2.5') used to be detected as the
    legacy '.'-separated format and split, corrupting the round-trip. The
    explicit __fmt_v2__ marker decides the format now.
    """
    p = str(tmp_path / "dotted.npz")
    state = {"2.5": np.array([1.0, 2.0]), "a.b.c": np.array(9)}
    save_checkpoint(state, p)
    back = load_checkpoint(p)
    assert set(back.keys()) == {"2.5", "a.b.c"}
    assert_allclose(back["2.5"], [1.0, 2.0])
    assert int(back["a.b.c"]) == 9


def test_generate_input_3d_columns_match_1d():
    """Every column of the 3-D volume equals the 1-D generator at that
    (lat, lon); the volume plugs straight into the 3-D field builder."""
    import pyrayhf_tpu as prt

    aalt = np.linspace(90.0, 500.0, 60)
    lat = np.array([10.0, 25.0, 40.0])
    lon = np.array([-80.0, -60.0])
    vol = prt.generate_input_3D(2025, 9, 1, 20.0, lat, lon, aalt, 150.0)
    assert vol["den"].shape == (aalt.size, lat.size, lon.size)
    for i, j in ((0, 0), (2, 1)):
        col = prt.generate_input_1D(2025, 9, 1, 20.0, float(lat[i]),
                                    float(lon[j]), aalt, 150.0)
        assert_allclose(vol["den"][:, i, j], col["den"], rtol=1e-10)
        assert_allclose(vol["bmag"][:, i, j], col["bmag"], rtol=1e-10)
        assert_allclose(vol["bpsi"][:, i, j], col["bpsi"], rtol=1e-10)
    # end-to-end: volume -> 3-D field -> one ray lands
    field = prt.build_field_3d(aalt, lat, lon, vol["den"], vol["bmag"],
                               vol["bpsi"], 6e6, "O")
    o = prt.trace_ray_3d(field, 25.0, -70.0, 35.0, 180.0, step_km=2.0,
                         s_max_km=2000.0)
    assert o["status"] == "ground"
    assert np.isfinite(float(o["ground_range_km"]))


def test_checkpoint_unmarked_sep_generation(tmp_path):
    """Files from the marker-less U+001F release load correctly: the
    separator is detected from the keys when the __fmt_v2__ marker is
    absent (code-review regression)."""
    p = str(tmp_path / "mid.npz")
    np.savez_compressed(p, **{"meta\x1fn_points": np.array(200),
                              "best": np.array([1.0, 2.0])})
    back = load_checkpoint(p)
    assert int(back["meta"]["n_points"]) == 200
    assert_allclose(back["best"], [1.0, 2.0])

def test_climatology_deep_minimum_no_antiwinter():
    """F107 below 70 (real solar minimum dips to ~63) must degrade to
    plain zenith control, not flip the winter term's sign into an
    anti-winter depression (round-4 ADVICE): the activity scale clips to
    [70, 200], so F107=63 behaves exactly like F107=70."""
    def noon_fo(month, lat, F107):
        F2, _, _ = climatology_parameters(2020, month, 21, 12.0, lat,
                                          0.0, F107)
        return float(np.ravel(F2["fo"])[0])

    for month, lat in ((12, 45.0), (6, -45.0)):
        assert noon_fo(month, lat, 63.0) == noon_fo(month, lat, 70.0)
    # zenith control intact at deep minimum: summer noon > winter noon
    assert noon_fo(12, 45.0, 63.0) < 0.95 * noon_fo(6, 45.0, 63.0)


def test_climatology_diurnal_periodicity_and_smoothness():
    """foF2/hmF2 are 24-h periodic in UT and free of step discontinuities
    (CCIR maps are truncated Fourier series in UT — any parameterisation
    standing in for them must be smooth and periodic too)."""
    UTs = np.arange(0.0, 24.01, 0.25)
    lat, lon = 30.0, 120.0

    def at(UT):
        F2, _, _ = climatology_parameters(2022, 4, 10, UT, lat, lon, 150.0)
        return float(np.ravel(F2["fo"])[0]), float(np.ravel(F2["hm"])[0])

    fo = np.array([at(u)[0] for u in UTs])
    hm = np.array([at(u)[1] for u in UTs])
    assert abs(fo[0] - fo[-1]) < 1e-9 and abs(hm[0] - hm[-1]) < 1e-9
    # the steepest 15-min step is the sunrise/sunset transition (the
    # cos^0.3 depression-recovery term has unbounded slope at the
    # terminator) and stays bounded; away from the terminator
    # (|chi - 90| > 15 deg) the diurnal curve is genuinely smooth
    from pyrayhf_tpu.envgen import solar_zenith_angle
    chi = np.array([float(np.ravel(np.asarray(
        solar_zenith_angle(2022, 4, 10, u, lat, lon)))) for u in UTs])
    rel = np.abs(np.diff(fo)) / fo[:-1]
    assert np.max(rel) < 0.20
    away = np.abs(chi[:-1] - 90.0) > 15.0
    assert np.max(rel[away]) < 0.04
    assert np.max(np.abs(np.diff(hm))) < 8.0


def test_climatology_longitude_wrap_continuity():
    """The antimeridian is not special: lon = -180 and lon = +180 give the
    same parameters, and a fine scan across the wrap is smooth."""
    lats = np.full(7, 25.0)
    lons = np.array([-181.0, -180.0, -179.5, 179.5, 180.0, 181.0, 540.5])
    F2, F1, E = climatology_parameters(2023, 7, 4, 6.0, lats, lons, 120.0)
    fo = np.asarray(F2["fo"])
    assert abs(fo[1] - fo[4]) < 1e-9                   # -180 == +180
    assert abs(fo[0] - np.ravel(
        np.asarray(climatology_parameters(2023, 7, 4, 6.0, 25.0, 179.0,
                                          120.0)[0]["fo"]))[0]) < 1e-9
    assert abs(fo[2] - fo[3]) < 0.05 * fo[2]           # smooth across wrap
    assert abs(fo[6] - fo[2]) < 1e-9                   # 540.5 == 180.5 == -179.5


def test_climatology_global_plausibility_bounds():
    """Everywhere on a coarse global grid, at solar min/mid/max and four
    UTs, the layer parameters stay inside the climatological envelope
    (CCIR-map global extrema: foF2 ~2-18 MHz, hmF2 ~200-450 km,
    foE 0.5-5 MHz) and the layers are physically ordered."""
    lat = np.linspace(-80.0, 80.0, 17)
    lon = np.linspace(-180.0, 165.0, 24)
    LAT, LON = np.meshgrid(lat, lon, indexing="ij")
    for F107 in (70.0, 150.0, 200.0):
        for UT in (0.0, 6.0, 12.0, 18.0):
            F2, F1, E = climatology_parameters(2021, 10, 15, UT,
                                               LAT.ravel(), LON.ravel(),
                                               F107)
            fo2 = np.asarray(F2["fo"])
            hm2 = np.asarray(F2["hm"])
            foe = np.asarray(E["fo"])
            assert np.all((fo2 > 1.5) & (fo2 < 18.0))
            assert np.all((hm2 > 200.0) & (hm2 < 450.0))
            assert np.all((foe >= 0.5) & (foe < 5.5))
            # F2 above E in both density and height, everywhere, always
            assert np.all(fo2 > foe)
            assert np.all(hm2 > np.asarray(E["hm"]))


def test_climatology_midlat_diurnal_ordering():
    """Mid-latitude diurnal cycle: noon foF2 clearly exceeds pre-dawn
    foF2 (the classical ~2x day/night contrast at modip ~45-55), at both
    solar min and max, in both hemispheres."""
    for lat in (45.0, -45.0):
        for F107 in (70.0, 200.0):
            def fo_lt(lt_hours):
                UT = (lt_hours - 0.0 / 15.0) % 24.0    # lon=0: LT == UT
                F2, _, _ = climatology_parameters(2020, 3, 21, UT, lat,
                                                  0.0, F107)
                return float(np.ravel(F2["fo"])[0])
            assert fo_lt(12.0) > 1.3 * fo_lt(4.0)


def test_climatology_foe_zenith_exponent():
    """Daytime foE follows the Chapman/Davies quarter-power law: the
    regression slope of log foE vs log cos(chi) over the sunlit day is
    0.25 (the E layer is the best-pinned CCIR morphology there is)."""
    from pyrayhf_tpu.envgen import solar_zenith_angle
    UTs = np.arange(8.0, 16.1, 0.5)
    lat, lon = 10.0, 0.0
    chi = np.array([float(np.ravel(np.asarray(
        solar_zenith_angle(2022, 3, 21, u, lat, lon))))
        for u in UTs])
    foe = np.array([float(np.ravel(np.asarray(
        climatology_parameters(2022, 3, 21, u, lat, lon, 150.0)[2]["fo"])))
        for u in UTs])
    mask = chi < 75.0
    x = np.log(np.cos(np.deg2rad(chi[mask])))
    y = np.log(foe[mask])
    slope = np.polyfit(x, y, 1)[0]
    assert abs(slope - 0.25) < 0.02
