"""CCIR/URSI map evaluator: basis exactness, loader format, envgen hook.

The coefficient FILES cannot be vendored (PyIRI is uninstallable here),
so the contract tested is the published Jones–Gallet evaluation itself
(IRI's GAMMA1 routine; ref ``library.py:2541-2557`` consumes the same
maps through PyIRI): the evaluator must be EXACT against an independent
plain-Python double-loop implementation on synthetic coefficient
tables, and the ``ccirXX.asc`` loader must reproduce the standard
Fortran layout (time index fastest, activity level slowest).
"""

import math

import numpy as np
import pytest
from numpy.testing import assert_allclose

from pyrayhf_tpu import ccir


def _oracle_eval(U, modip, lat, lon, UT, blocks):
    """Independent scalar double-loop GAMMA1 (plain math module only)."""
    n_harm = (U.shape[1] - 1) // 2
    T = math.radians(15.0 * UT - 180.0)
    xsin = []
    for i in range(U.shape[0]):
        s = U[i, 0]
        for k in range(1, n_harm + 1):
            s += U[i, 2 * k - 1] * math.sin(k * T)
            s += U[i, 2 * k] * math.cos(k * T)
        xsin.append(s)
    mu = math.radians(modip)
    la = math.radians(lat)
    lo = math.radians(lon)
    total = 0.0
    idx = 0
    for j in range(blocks[0]):
        total += xsin[idx] * math.sin(mu) ** j
        idx += 1
    for m in range(1, len(blocks)):
        for j in range(blocks[m]):
            base = math.cos(la) ** m * math.sin(mu) ** j
            total += xsin[idx] * base * math.cos(m * lo)
            idx += 1
            total += xsin[idx] * base * math.sin(m * lo)
            idx += 1
    assert idx == U.shape[0]
    return total


@pytest.mark.parametrize("blocks,K,MM", [(ccir.QF, 76, 13),
                                         (ccir.QM, 49, 9)])
def test_eval_matches_independent_oracle(blocks, K, MM):
    rng = np.random.default_rng(3)
    coeffs = rng.normal(size=(2, K, MM))
    for R12 in (0.0, 37.5, 100.0):
        U = coeffs[0] * (1 - R12 / 100) + coeffs[1] * (R12 / 100)
        for modip, lat, lon, UT in [(23.0, 40.0, 15.0, 7.5),
                                    (-41.0, -33.0, -120.0, 0.0),
                                    (5.0, 2.0, 179.0, 23.9)]:
            want = _oracle_eval(U, modip, lat, lon, UT, blocks)
            got = float(ccir.eval_ccir_map(coeffs, modip, lat, lon, UT,
                                           R12))
            assert_allclose(got, want, rtol=1e-12)


def test_eval_broadcasts_and_differentiates():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    coeffs = rng.normal(size=(2, 76, 13))
    lat = np.linspace(-60, 60, 7)
    lon = np.linspace(-180, 150, 5)
    out = ccir.eval_ccir_map(coeffs, lat[:, None] * 0.8, lat[:, None],
                             lon[None, :], 12.0, 80.0)
    assert out.shape == (7, 5)
    g = jax.grad(lambda ut: ccir.eval_ccir_map(coeffs, 30.0, 40.0, 10.0,
                                               ut, 80.0))(jnp.asarray(6.0))
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_single_basis_function_isolation():
    """A lone coefficient must reproduce exactly its basis product —
    pins the ordering contract (cos term before sin, modip powers
    innermost) independently of the oracle."""
    coeffs = np.zeros((2, 76, 13))
    # block m=2 starts at 12 + 2*12 = 36; j=3 → cos entry index 36+2*3=42
    coeffs[:, 42, 4] = 1.0          # time slot 4 = cos(2T)
    modip, lat, lon, UT = 37.0, 25.0, 40.0, 9.0
    T = math.radians(15 * UT - 180)
    want = (math.cos(math.radians(lat)) ** 2
            * math.sin(math.radians(modip)) ** 3
            * math.cos(2 * math.radians(lon)) * math.cos(2 * T))
    got = float(ccir.eval_ccir_map(coeffs, modip, lat, lon, UT, 50.0))
    assert_allclose(got, want, rtol=1e-12)


def test_loader_roundtrip(tmp_path):
    """Write a synthetic ccirXX.asc in the standard Fortran layout and
    check the loader reassembles [level, function, time] correctly."""
    rng = np.random.default_rng(7)
    f2 = rng.normal(size=ccir.F2_SHAPE)          # [2, 76, 13]
    fm3 = rng.normal(size=ccir.FM3_SHAPE)        # [2, 49, 9]
    # Fortran file order: time fastest, then function, then level
    flat = np.concatenate([
        f2.transpose(2, 1, 0).ravel(order="F"),
        fm3.transpose(2, 1, 0).ravel(order="F")])
    p = tmp_path / "ccir11.asc"
    # IRI files wrap several values per line; mimic that
    with open(p, "w") as fh:
        for i in range(0, flat.size, 4):
            fh.write(" ".join(f"{v: .10E}" for v in flat[i:i + 4]) + "\n")
    maps = ccir.load_ccir_asc(p)
    assert_allclose(np.asarray(maps["F2"]), f2, rtol=1e-9)
    assert_allclose(np.asarray(maps["FM3"]), fm3, rtol=1e-9)

    bad = tmp_path / "short.asc"
    bad.write_text("1.0 2.0 3.0\n")
    with pytest.raises(ValueError):
        ccir.load_ccir_asc(bad)


def test_r12_f107_roundtrip_and_hmf2():
    R = np.array([0.0, 25.0, 100.0, 180.0])
    assert_allclose(np.asarray(ccir.r12_from_f107(ccir.f107_from_r12(R))),
                    R, atol=1e-9)
    # F107 below the quiet-sun floor clips to R12 = 0
    assert float(ccir.r12_from_f107(58.0)) == 0.0
    # Shimazaki: M3000 = 3 → 320.67 km; BSE correction lowers a daytime
    # (large foF2/foE ratio) hmF2 only slightly and stays bounded at night
    assert_allclose(float(ccir.hmf2_from_m3000(3.0)), 1490.0 / 3 - 176)
    day = float(ccir.hmf2_from_m3000(3.0, foF2=10.0, foE=3.0))
    night = float(ccir.hmf2_from_m3000(3.0, foF2=5.0, foE=0.7))
    assert abs(day - (1490.0 / 3 - 176)) < 25.0
    assert np.isfinite(night) and 100.0 < night < 500.0


def test_envgen_ccir_hook():
    """climatology_parameters(ccir_maps=) must route foF2/hmF2 through
    the map evaluation: constant-only coefficients give a uniform foF2
    (above the foE floor) and the M3000-derived hmF2."""
    from pyrayhf_tpu.envgen import climatology_parameters

    f2 = np.zeros(ccir.F2_SHAPE)
    f2[:, 0, 0] = 9.0                            # foF2 ≡ 9 MHz
    fm3 = np.zeros(ccir.FM3_SHAPE)
    fm3[:, 0, 0] = 3.0                           # M3000 ≡ 3
    maps = {"F2": f2, "FM3": fm3}
    lat = np.array([-40.0, 0.0, 40.0])
    F2d, F1d, Ed = climatology_parameters(2020, 6, 1, 12.0, lat, 0.0,
                                          150.0, ccir_maps=maps)
    assert_allclose(np.asarray(F2d["fo"]), 9.0, rtol=1e-12)
    want_hm = np.asarray(ccir.hmf2_from_m3000(3.0, 9.0,
                                              np.asarray(Ed["fo"])))
    assert_allclose(np.asarray(F2d["hm"]), want_hm, rtol=1e-12)
    assert_allclose(np.asarray(F2d["M3000"]), 3.0)
    # analytic fallback unchanged without maps
    F2a, _, _ = climatology_parameters(2020, 6, 1, 12.0, lat, 0.0, 150.0)
    assert not np.allclose(np.asarray(F2a["fo"]), 9.0)
