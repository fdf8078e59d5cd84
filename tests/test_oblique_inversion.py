"""Oblique-ionogram inversion tests (no reference equivalent).

The reference inverts vertical ionograms only (minimize_parameters, ref
library.py:672-825); ``retrieve_from_oblique`` fits the midpoint F2 layer
to oblique group delays by LM on exact AD jacobians through the whole
Snell homing fan. Round-trip recovery on synthetic truth is the
correctness contract (same strategy as the vertical retrieval tests).

Configuration notes: spherical geometry with n_elev=256 is the
recommended (and tested) operating point — the crossing interpolation is
piecewise in the fan, and rows near E↔F mode transitions make the
low-ray-only cost surface rugged; the fit uses the high-ray trace and
brute-grid seeding for conditioning (see the module docstring).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pyrayhf_tpu.oblique import synthesize_oblique_ionogram
from pyrayhf_tpu.oblique_inversion import retrieve_from_oblique
from pyrayhf_tpu.retrieval import _build_edp

ALT = np.linspace(80.0, 600.0, 261)
F1 = {"P": 0.0}
E = {"Nm": 5e10, "hm": 110.0, "B_bot": 5.0, "B_top": 7.0}
BABS = np.full_like(ALT, 4.5e-5)
BPSI = np.full_like(ALT, 40.0)
D_KM = 900.0
F0S = np.linspace(5e6, 14e6, 10)
TRUTH = {"Nm": 9e11, "hm": 310.0, "B_bot": 48.0, "B_top": 60.0}
_KW = dict(mode="O", geometry="spherical", n_elev=256)


@pytest.fixture(scope="module")
def obs_delays():
    EDPt, _ = _build_edp(TRUTH, F1, E, jnp.asarray(ALT), "B_bot")
    out = synthesize_oblique_ionogram(
        F0S, D_KM, ALT, np.asarray(EDPt), BABS, BPSI, **_KW)
    lo = np.asarray(out["delay_low_sec"])
    hi = np.asarray(out["delay_high_sec"])
    assert np.isfinite(lo).sum() >= 6    # enough echoes below the link MUF
    assert np.isfinite(lo).sum() < len(F0S)   # and a MUF nose in the band
    return lo, hi


def test_oblique_roundtrip_recovers_f2(obs_delays):
    """Perturbed prior → LM recovers (NmF2, hmF2, B_bot) from delays alone.

    The observation set deliberately includes NaN rows (above the link
    MUF) — they must be ignored, and the smooth MUF-proxy penalty must
    let the fit escape an initial model whose MUF is too low.
    """
    lo, hi = obs_delays
    init = {"Nm": 6e11, "hm": 270.0, "B_bot": 38.0, "B_top": 60.0}
    dfit, dhif, EDPf, F2f, hist = retrieve_from_oblique(
        init, F1, E, F0S, lo, D_KM, ALT, BABS, BPSI,
        steps=14, delay_high_obs_sec=hi, **_KW)
    assert abs(F2f["Nm"] / TRUTH["Nm"] - 1) < 1e-3
    assert abs(F2f["hm"] / TRUTH["hm"] - 1) < 1e-3
    assert abs(F2f["B_bot"] / TRUTH["B_bot"] - 1) < 1e-3
    m = np.isfinite(lo) & np.isfinite(dfit)
    assert m.sum() >= 6
    # refit delays at sub-microsecond rms
    assert np.sqrt(np.mean((dfit[m] - lo[m]) ** 2)) < 1e-6
    # LM made progress and the history is the squared-residual trace
    assert hist.shape == (14,)
    assert hist[-1] < hist[0] or hist[-1] < 1e-10
    # fitted EDP peaks at the fitted NmF2
    assert np.nanmax(EDPf) == pytest.approx(F2f["Nm"], rel=1e-6)


def test_oblique_fixed_nm_two_param(obs_delays):
    """fit_nm=False holds NmF2 at the prior and still recovers hm/B_bot."""
    lo, hi = obs_delays
    init = {"Nm": TRUTH["Nm"], "hm": 280.0, "B_bot": 40.0, "B_top": 60.0}
    _, _, _, F2f, _ = retrieve_from_oblique(
        init, F1, E, F0S, lo, D_KM, ALT, BABS, BPSI,
        steps=14, fit_nm=False, delay_high_obs_sec=hi, **_KW)
    assert F2f["Nm"] == TRUTH["Nm"]
    assert abs(F2f["hm"] / TRUTH["hm"] - 1) < 1e-3
    assert abs(F2f["B_bot"] / TRUTH["B_bot"] - 1) < 1e-3


def test_oblique_noise_robustness(obs_delays):
    """5 µs Gaussian delay noise → parameters still land within a few %."""
    lo, hi = obs_delays
    rng = np.random.default_rng(7)
    noisy_lo = lo + 5e-6 * rng.standard_normal(lo.shape)
    noisy_hi = hi + 5e-6 * rng.standard_normal(hi.shape)
    init = {"Nm": 7e11, "hm": 280.0, "B_bot": 40.0, "B_top": 60.0}
    _, _, _, F2f, _ = retrieve_from_oblique(
        init, F1, E, F0S, noisy_lo, D_KM, ALT, BABS, BPSI, steps=14,
        delay_high_obs_sec=noisy_hi, **_KW)
    assert abs(F2f["Nm"] / TRUTH["Nm"] - 1) < 0.05
    assert abs(F2f["hm"] / TRUTH["hm"] - 1) < 0.05
    assert abs(F2f["B_bot"] / TRUTH["B_bot"] - 1) < 0.15
