"""EDP model + retrieval tests.

Pins: the reference model_VH golden (test_core.py:239-276) at the accuracy
our reconstructed PyIRI-equivalent builder supports (see edp.py docstring /
DEVNOTES.md), the PyIRI-shipped Day/Night profiles, zero-residual sanity
(ref :279-320), brute minimization recovery, and gradient retrieval.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from numpy.testing import assert_allclose

from pyrayhf_tpu import edp
from pyrayhf_tpu.retrieval import (minimize_parameters, model_VH,
                                   residual_VH, retrieve_gradient)

GOLDEN_F2 = {"Nm": np.array([[1.17848165e+12]]),
             "fo": np.array([[9.64625394]]),
             "M3000": np.array([[2.64168819]]),
             "hm": np.array([[365.13828931]]),
             "B_top": np.array([[32.52487907]]),
             "B_bot": np.array([[41.26005561]])}
GOLDEN_F1 = {"Nm": np.array([[7.80902301e+11]]),
             "fo": np.array([[7.93574143]]),
             "P": np.array([[0.91422852]]),
             "hm": np.array([[219.26637887]]),
             "B_bot": np.array([[54.63318944]])}
GOLDEN_E = {"Nm": np.array([[1.2846662e+11]]),
            "fo": np.array([[3.2096443]]),
            "hm": np.array([[110.]]),
            "B_bot": np.array([[5.]]),
            "B_top": np.array([[7.]]),
            "solzen": np.array([[22.26668451]]),
            "solzen_eff": np.array([[22.26668451]])}


def _layer_scalars(d):
    return {k: float(np.ravel(v)[0]) for k, v in d.items()}


def test_topside_exact_parity(day_profile, night_profile):
    """NeQuick topside matches PyIRI output to machine precision."""
    for prof in (day_profile, night_profile):
        F2 = _layer_scalars(prof["F2"])
        alt, den = prof["alt"], prof["den"]
        m = alt >= F2["hm"]
        out = np.asarray(edp.f2_topside(F2["Nm"], F2["hm"], F2["B_top"],
                                        alt[m]))
        assert_allclose(out, den[m], rtol=1e-13)


def test_e_bottom_exact_parity(day_profile, night_profile):
    """E-layer bottomside matches PyIRI output below hmE."""
    for prof in (day_profile, night_profile):
        E = _layer_scalars(prof["E"])
        alt, den = prof["alt"], prof["den"]
        m = alt < E["hm"] - 1
        out = np.asarray(edp.epstein_layer(E["Nm"], E["hm"], E["B_bot"],
                                           alt[m]))
        assert_allclose(out, den[m], rtol=1e-10)


def test_continuous_builder_vs_pyiri_profiles(day_profile, night_profile):
    """Full continuous builder vs the shipped PyIRI profiles.

    Night (no F1): ≤2e-5 of peak. Day (Chebyshev-fit F1 ledge): ≤5e-4 of
    peak (measured 2.5e-4; was 1.5% with the 4-parameter bump).
    """
    for prof, tol in ((night_profile, 2e-5), (day_profile, 5e-4)):
        F2 = _layer_scalars(prof["F2"])
        F1 = _layer_scalars(prof["F1"])
        E = _layer_scalars(prof["E"])
        out = np.asarray(edp.reconstruct_density_continuous(
            F2, F1, E, prof["alt"]))
        err = np.abs(out - prof["den"]) / prof["den"].max()
        assert err.max() < tol, err.max()


def test_derive_dependent_f1_golden():
    """Exact on the reference golden point (test_core.py:239-276 inputs)."""
    NmF1, foF1, hmF1, BF1 = edp.derive_dependent_F1_parameters(
        0.91422852, 1.17848165e+12, 365.13828931, 41.26005561, 110.0)
    assert_allclose(float(NmF1), 7.80902301e+11, rtol=1e-8)
    assert_allclose(float(foF1), 7.93574143, rtol=1e-7)
    assert_allclose(float(hmF1), 219.26637887, rtol=1e-8)
    assert_allclose(float(BF1), 54.63318944, rtol=1e-8)


def test_model_vh_golden():
    """Reference model_VH golden at the reference's own contract (rtol 1e-6,
    test_core.py:275).

    The EDP golden holds at ~1e-9 on the default path. The vh golden holds
    at ~3e-9 with ``arithmetic="reference"`` (bit-parity μ' expression
    sequence); the default "stable" path deviates by ≤ 4e-6 — entirely at
    the singular backed-off reflection sample, where the reference's naive
    f64 arithmetic is ~8% off exact (mpmath) and ours is within ~1e-7
    (see test_magnetoionic.test_singular_sample_exact_arithmetic).
    """
    freq = np.array([3.0, 3.5, 3.7])
    alt = np.array([100.0, 200.0, 300.0])
    bmag = np.full(3, 5e-5)
    bpsi = np.full(3, 60.0)
    vh_golden = [236.22215658, 304.53151596, 334.34853791]
    edp_golden = [5.39526842e+10, 1.77861786e+11, 6.66833260e+11]
    vh, edp_out = model_VH(GOLDEN_F2, GOLDEN_F1, GOLDEN_E, freq, alt, bmag,
                           bpsi, arithmetic="reference")
    assert_allclose(np.asarray(vh), vh_golden, rtol=1e-6)
    assert_allclose(np.asarray(edp_out), edp_golden, rtol=1e-6)
    vh_s, edp_s = model_VH(GOLDEN_F2, GOLDEN_F1, GOLDEN_E, freq, alt, bmag,
                           bpsi)
    assert_allclose(np.asarray(vh_s), vh_golden, rtol=1e-5)
    assert_allclose(np.asarray(edp_s), edp_golden, rtol=1e-6)


def test_zero_residual_when_parameters_match():
    """residual_VH == 0 when params equal truth (ref :279-320)."""
    freq = np.array([3.0, 3.5, 3.7])
    alt = np.array([100.0, 200.0, 300.0])
    bmag = np.full(3, 5e-5)
    bpsi = np.full(3, 60.0)
    vh_obs, _ = model_VH(GOLDEN_F2, GOLDEN_F1, GOLDEN_E, freq, alt, bmag,
                         bpsi)
    params = {"NmF2": 1.17848165e+12, "hmF2": 365.13828931,
              "B_bot": 41.26005561}
    r = residual_VH(params, GOLDEN_F2, GOLDEN_F1, GOLDEN_E, freq,
                    np.asarray(vh_obs), alt, bmag, bpsi)
    assert_allclose(np.asarray(r), np.zeros(3), atol=1e-9)


def test_residual_nan_fill():
    """Escaped rays are filled with max(nanmean|vh|, 100) (ref :660-665)."""
    freq = np.array([3.0, 20.0])          # 20 MHz escapes
    alt = np.array([100.0, 200.0, 300.0])
    bmag = np.full(3, 5e-5)
    bpsi = np.full(3, 60.0)
    r = residual_VH({"NmF2": 1.17848165e+12, "hmF2": 365.13828931,
                     "B_bot": 41.26005561},
                    GOLDEN_F2, GOLDEN_F1, GOLDEN_E, freq,
                    np.array([250.0, 400.0]), alt, bmag, bpsi)
    assert np.isfinite(np.asarray(r)).all()


def test_minimize_parameters_recovers_truth(day_profile):
    """Brute grid search recovers perturbed parameters (synthetic twin)."""
    d = day_profile
    F2 = _layer_scalars(d["F2"])
    F1 = _layer_scalars(d["F1"])
    E = _layer_scalars(d["E"])
    # Make the truth's NmF2 exactly consistent with the reference's pinning
    # rule Nm = freq2den(f_max)*1.0001 (ref :760-768) so the model family is
    # closed over the search space. A 0.25-km altitude grid keeps the
    # peak-exclusive regrid truncation deficit below the 1.0001 margin so
    # the top observed frequency still reflects.
    freq = np.arange(2.0, 13.51, 0.25)
    alt = np.arange(80.0, 700.0, 0.25)
    from pyrayhf_tpu.magnetoionic import freq2den
    nm_truth = float(freq2den(13.5e6)) * 1.0001

    # truth: shifted hmF2 / B_bot
    F2_truth = dict(F2, Nm=nm_truth, hm=F2["hm"] - 12.0,
                    B_bot=F2["B_bot"] + 4.0)
    bmag = np.full(alt.size, 3e-5)
    bpsi = np.full(alt.size, 70.0)
    vh_obs, _ = model_VH({k: np.array([[v]]) for k, v in F2_truth.items()},
                         F1, E, freq, alt, bmag, bpsi)
    vh_obs = np.asarray(vh_obs)
    assert np.isfinite(vh_obs[-1])      # pin frequency must reflect

    F2_in = {k: np.array([[v]]) for k, v in F2.items()}
    vh_fit, edp_fit, F2_fit = minimize_parameters(
        F2_in, F1, E, freq, vh_obs, alt, bmag, bpsi,
        percent_sigma=10.0, step=2.0)
    # within 2 grid steps (the always-escaping pin frequency adds a
    # small NaN-fill noise floor, ref :660-665)
    assert abs(float(np.ravel(F2_fit["hm"])[0]) - F2_truth["hm"]) <= 4.0
    assert abs(float(np.ravel(F2_fit["B_bot"])[0])
               - F2_truth["B_bot"]) <= 2.5


def test_minimize_validates_bottom_type():
    with pytest.raises(ValueError):
        minimize_parameters({"Nm": np.array([[1e12]]),
                             "hm": np.array([[300.0]])}, {}, {},
                            np.array([5.0]), np.array([200.0]),
                            np.array([100.0, 200.0]), np.zeros(2),
                            np.zeros(2), bottom_type="B_bot")


def test_gradient_retrieval_converges(day_profile):
    """jax.grad retrieval recovers perturbed parameters (headline feature)."""
    d = day_profile
    F2 = _layer_scalars(d["F2"])
    F1 = _layer_scalars(d["F1"])
    E = _layer_scalars(d["E"])
    freq = np.arange(2.0, 13.51, 0.25)
    alt = np.arange(80.0, 700.0, 0.25)
    from pyrayhf_tpu.magnetoionic import freq2den
    nm_truth = float(freq2den(13.5e6)) * 1.0001
    F2_truth = dict(F2, Nm=nm_truth, hm=F2["hm"] * 0.95,
                    B_bot=F2["B_bot"] * 1.1)
    bmag = np.full(alt.size, 3e-5)
    bpsi = np.full(alt.size, 70.0)
    vh_obs, _ = model_VH({k: np.array([[v]]) for k, v in F2_truth.items()},
                         F1, E, freq, alt, bmag, bpsi)
    vh_obs = np.asarray(vh_obs)
    assert np.isfinite(vh_obs[-1])

    F2_in = {k: np.array([[v]]) for k, v in F2.items()}
    vh_fit, edp_fit, F2_fit, hist = retrieve_gradient(
        F2_in, F1, E, freq, vh_obs, alt, bmag, bpsi, steps=300,
        learning_rate=0.01)
    assert hist[-1] < hist[0] * 1e-2, (hist[0], hist[-1])
    assert abs(float(np.ravel(F2_fit["hm"])[0]) / F2_truth["hm"] - 1) < 0.02
    assert abs(float(np.ravel(F2_fit["B_bot"])[0])
               / F2_truth["B_bot"] - 1) < 0.05
    ok = np.isfinite(vh_obs)
    assert np.nanmax(np.abs(np.asarray(vh_fit)[ok] - vh_obs[ok])) < 5.0


def test_edp_builders_are_differentiable():
    """grad of EDP w.r.t. every layer parameter is finite."""
    alt = jnp.linspace(80.0, 600.0, 100)

    def f(nm, hm, bb, bt):
        F2 = {"Nm": nm, "hm": hm, "B_bot": bb, "B_top": bt}
        NmF1, _, hmF1, _ = edp.derive_dependent_F1_parameters(
            0.9, nm, hm, bb, 110.0)
        E = {"Nm": 1.2e11, "hm": 110.0, "B_bot": 5.0, "B_top": 7.0}
        return jnp.sum(edp.reconstruct_density_1level(
            F2, {"Nm": NmF1, "hm": hmF1}, E, alt))

    g = jax.grad(f, argnums=(0, 1, 2, 3))(1.2e12, 350.0, 40.0, 33.0)
    assert all(np.isfinite(float(x)) for x in g)


def test_gradient_retrieval_b0b1(day_profile):
    """LM retrieval through the continuous (B0/B1) builder."""
    d = day_profile
    F2 = _layer_scalars(d["F2"])
    F1 = _layer_scalars(d["F1"])
    E = _layer_scalars(d["E"])
    freq = np.arange(2.0, 13.51, 0.25)
    alt = np.arange(80.0, 700.0, 0.25)
    from pyrayhf_tpu.magnetoionic import freq2den
    nm_truth = float(freq2den(13.5e6)) * 1.0001
    F2_truth = dict(F2, Nm=nm_truth, hm=F2["hm"] * 0.96, B0=F2["B0"] * 1.1)
    bmag = np.full(alt.size, 3e-5)
    bpsi = np.full(alt.size, 70.0)
    vh_obs, _ = model_VH({k: np.array([[v]]) for k, v in F2_truth.items()},
                         F1, E, freq, alt, bmag, bpsi, bottom_type="B0_B1")
    vh_obs = np.asarray(vh_obs)
    F2_in = {k: np.array([[v]]) for k, v in F2.items()}
    _, _, F2_fit, hist = retrieve_gradient(
        F2_in, F1, E, freq, vh_obs, alt, bmag, bpsi, bottom_type="B0_B1",
        steps=25)
    # may converge to exactly zero in the first accepted iteration
    assert hist[-1] <= max(hist[0] * 1e-2, 1e-6)
    assert abs(float(np.ravel(F2_fit["hm"])[0]) / F2_truth["hm"] - 1) < 0.02
    assert abs(float(np.ravel(F2_fit["B0"])[0]) / F2_truth["B0"] - 1) < 0.05


def test_retrieve_gradient_batch_kill_and_resume(day_profile, tmp_path,
                                                 monkeypatch):
    """A killed batched retrieval resumes from its chunk checkpoint and
    reproduces the uninterrupted fit exactly (SURVEY §5 checkpoint row)."""
    import jax.numpy as jnp
    from pyrayhf_tpu import retrieval as rt
    from pyrayhf_tpu.magnetoionic import freq2den

    d = day_profile
    F1 = _layer_scalars(d["F1"])
    E = _layer_scalars(d["E"])
    freq = np.arange(2.0, 13.51, 0.5)
    alt = np.arange(80.0, 700.0, 2.0)
    bmag = np.full(alt.size, 3e-5)
    bpsi = np.full(alt.size, 70.0)
    nm_truth = float(freq2den(13.5e6)) * 1.0001
    rng = np.random.default_rng(3)
    B = 4
    hms = rng.uniform(290.0, 340.0, B)
    bbs = rng.uniform(40.0, 50.0, B)
    obs = np.stack([np.asarray(model_VH(
        {"Nm": nm_truth, "hm": hms[b], "B_bot": bbs[b], "B_top": 40.0},
        F1, E, freq, alt, bmag, bpsi)[0]) for b in range(B)])
    F2_guess = {"Nm": nm_truth, "hm": hms * 0.97, "B_bot": bbs * 1.05,
                "B_top": 40.0}
    kw = dict(steps=5, chunk_size=2, dtype=jnp.float32)
    ckpt = tmp_path / "lm_state.npz"

    # uninterrupted run (no checkpoint file)
    ref = rt.retrieve_gradient_batch(F2_guess, F1, E, freq, obs, alt,
                                     bmag, bpsi, **kw)

    # "kill" the process after the first chunk: the second core launch dies
    real_core = rt._lm_batch_core
    calls = {"n": 0}

    def dying_core(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated kill")
        return real_core(*a, **k)

    monkeypatch.setattr(rt, "_lm_batch_core", dying_core)
    with pytest.raises(RuntimeError, match="simulated kill"):
        rt.retrieve_gradient_batch(F2_guess, F1, E, freq, obs, alt, bmag,
                                   bpsi, checkpoint_path=str(ckpt), **kw)
    monkeypatch.setattr(rt, "_lm_batch_core", real_core)
    assert ckpt.exists()

    # resume: chunk 0 loads from the checkpoint, chunk 1 computes fresh
    res = rt.retrieve_gradient_batch(F2_guess, F1, E, freq, obs, alt, bmag,
                                     bpsi, checkpoint_path=str(ckpt), **kw)
    assert not ckpt.exists()     # removed on success
    for a, b in zip(ref[:2], res[:2]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in ("hm", "B_bot", "Nm"):
        np.testing.assert_array_equal(ref[2][k], res[2][k])
    np.testing.assert_array_equal(ref[3], res[3])

    # config-mismatch guard
    ckpt2 = tmp_path / "lm_state2.npz"
    monkeypatch.setattr(rt, "_lm_batch_core", dying_core)
    calls["n"] = 0  # first chunk completes (checkpoint written), second dies
    with pytest.raises(RuntimeError):
        rt.retrieve_gradient_batch(F2_guess, F1, E, freq, obs, alt, bmag,
                                   bpsi, checkpoint_path=str(ckpt2), **kw)
    monkeypatch.setattr(rt, "_lm_batch_core", real_core)
    with pytest.raises(ValueError, match="different retrieval"):
        rt.retrieve_gradient_batch(
            F2_guess, F1, E, freq, obs, alt, bmag, bpsi,
            checkpoint_path=str(ckpt2), steps=7, chunk_size=2,
            dtype=jnp.float32)


def test_retrieve_gradient_batch_f32(day_profile):
    """The f32 fast path recovers the same fits as f64 (serving dtype).

    TPU f64 is emulated double-float (~64× slower for this compute-bound
    loop); the f32 path is the production serving mode. The analytic-margin
    forward holds ~0.02 km in f32, so parameter recovery degrades only to
    ~0.4% (measured ≤ 3.7e-3 rel on B_bot, ≤ 7.2e-4 on hmF2).
    """
    import jax.numpy as jnp
    from pyrayhf_tpu.magnetoionic import freq2den
    from pyrayhf_tpu.retrieval import retrieve_gradient_batch

    d = day_profile
    F1 = _layer_scalars(d["F1"])
    E = _layer_scalars(d["E"])
    freq = np.arange(2.0, 13.51, 0.25)
    alt = np.arange(80.0, 700.0, 0.5)
    bmag = np.full(alt.size, 3e-5)
    bpsi = np.full(alt.size, 70.0)
    nm_truth = float(freq2den(13.5e6)) * 1.0001

    rng = np.random.default_rng(7)
    B = 6
    hms = rng.uniform(280.0, 360.0, B)
    bbs = rng.uniform(38.0, 55.0, B)
    obs = np.stack([np.asarray(model_VH(
        {"Nm": nm_truth, "hm": hms[b], "B_bot": bbs[b], "B_top": 40.0},
        F1, E, freq, alt, bmag, bpsi)[0]) for b in range(B)])

    F2_guess = {"Nm": nm_truth, "hm": hms * 0.95, "B_bot": bbs * 1.1,
                "B_top": 40.0}
    vh_fit, edp_fit, F2_fit, hist = retrieve_gradient_batch(
        F2_guess, F1, E, freq, obs, alt, bmag, bpsi, steps=15,
        dtype=jnp.float32)
    assert np.asarray(vh_fit).dtype == np.float32
    assert np.all(np.abs(F2_fit["hm"] / hms - 1) < 0.01), F2_fit["hm"] - hms
    assert np.all(np.abs(F2_fit["B_bot"] / bbs - 1) < 0.02)
    m = np.isfinite(obs)
    assert np.nanmax(np.abs(np.asarray(vh_fit)[m] - obs[m])) < 5.0
    # per-sample cost history never increases (LM accept/reject semantics)
    assert np.all(np.diff(hist, axis=0) <= 1e-6 * np.maximum(hist[:-1], 1.0))


def test_retrieve_gradient_routes_through_batch_core(day_profile):
    """Single-sample retrieve_gradient == batched core with B=1.

    Round-4 re-route (VERDICT item 7): the reference-parity entry point
    now inherits the on-device LM scan, so its fitted parameters must be
    bit-identical to retrieve_gradient_batch on the same one-ionogram
    batch (same core, same step count, same damping trajectory).
    """
    from pyrayhf_tpu.retrieval import retrieve_gradient_batch

    d = day_profile
    F2 = _layer_scalars(d["F2"])
    F1 = _layer_scalars(d["F1"])
    E = _layer_scalars(d["E"])
    freq = np.arange(2.0, 13.51, 0.25)
    alt = np.arange(80.0, 700.0, 0.5)
    from pyrayhf_tpu.magnetoionic import freq2den
    nm_truth = float(freq2den(13.5e6)) * 1.0001
    bmag = np.full(alt.size, 3e-5)
    bpsi = np.full(alt.size, 70.0)
    obs, _ = model_VH({"Nm": nm_truth, "hm": F2["hm"] * 0.95,
                       "B_bot": F2["B_bot"] * 1.1, "B_top": F2["B_top"]},
                      F1, E, freq, alt, bmag, bpsi)
    obs = np.asarray(obs)

    F2_in = {k: np.array([[v]]) for k, v in F2.items()}
    _, _, fit_s, hist_s = retrieve_gradient(
        F2_in, F1, E, freq, obs, alt, bmag, bpsi, steps=12)
    _, _, fit_b, hist_b = retrieve_gradient_batch(
        F2_in, F1, E, freq, obs[None, :], alt, bmag, bpsi, steps=12,
        retries=0)
    assert float(np.ravel(fit_s["hm"])[0]) == float(fit_b["hm"][0])
    assert float(np.ravel(fit_s["B_bot"])[0]) == float(fit_b["B_bot"][0])
    assert np.array_equal(hist_s, np.asarray(hist_b)[:, 0])


def test_retrieve_gradient_batch_recovers(day_profile):
    """Batched on-device LM recovers [B] perturbed parameter sets at once."""
    from pyrayhf_tpu.magnetoionic import freq2den
    from pyrayhf_tpu.retrieval import retrieve_gradient_batch

    d = day_profile
    F1 = _layer_scalars(d["F1"])
    E = _layer_scalars(d["E"])
    freq = np.arange(2.0, 13.51, 0.25)
    alt = np.arange(80.0, 700.0, 0.5)
    bmag = np.full(alt.size, 3e-5)
    bpsi = np.full(alt.size, 70.0)
    nm_truth = float(freq2den(13.5e6)) * 1.0001

    rng = np.random.default_rng(7)
    B = 6
    hms = rng.uniform(280.0, 360.0, B)
    bbs = rng.uniform(38.0, 55.0, B)
    obs = np.stack([np.asarray(model_VH(
        {"Nm": nm_truth, "hm": hms[b], "B_bot": bbs[b], "B_top": 40.0},
        F1, E, freq, alt, bmag, bpsi)[0]) for b in range(B)])

    F2_guess = {"Nm": nm_truth, "hm": hms * 0.95, "B_bot": bbs * 1.1,
                "B_top": 40.0}
    vh_fit, edp_fit, F2_fit, hist = retrieve_gradient_batch(
        F2_guess, F1, E, freq, obs, alt, bmag, bpsi, steps=15)
    assert np.all(np.abs(F2_fit["hm"] / hms - 1) < 0.02), F2_fit["hm"] - hms
    assert np.all(np.abs(F2_fit["B_bot"] / bbs - 1) < 0.05)
    m = np.isfinite(obs)
    assert np.nanmax(np.abs(np.asarray(vh_fit)[m] - obs[m])) < 5.0
    # cost history is per-sample and monotone non-increasing
    assert hist.shape == (15, B)
    assert np.all(np.diff(hist, axis=0) <= 1e-9)


def test_minimize_parameters_powell(day_profile):
    """method='powell' (scipy Powell over jitted costs) recovers truth.

    API parity: the reference forwards any lmfit method through
    (ref library.py:794-798); 'powell' was the one non-brute method its
    tutorials use.
    """
    d = day_profile
    F2 = _layer_scalars(d["F2"])
    F1 = _layer_scalars(d["F1"])
    E = _layer_scalars(d["E"])
    freq = np.arange(2.0, 13.51, 0.25)
    alt = np.arange(80.0, 700.0, 0.5)
    from pyrayhf_tpu.magnetoionic import freq2den
    nm_truth = float(freq2den(13.5e6)) * 1.0001
    F2_truth = dict(F2, Nm=nm_truth, hm=F2["hm"] - 12.0,
                    B_bot=F2["B_bot"] + 4.0)
    bmag = np.full(alt.size, 3e-5)
    bpsi = np.full(alt.size, 70.0)
    vh_obs, _ = model_VH(F2_truth, F1, E, freq, alt, bmag, bpsi)
    vh_fit, edp_fit, F2_fit = minimize_parameters(
        F2, F1, E, freq, np.asarray(vh_obs), alt, bmag, bpsi,
        method="powell", percent_sigma=10.0)
    # continuous optimizer: tighter than the 2-km brute grid
    assert abs(float(np.ravel(F2_fit["hm"])[0]) - F2_truth["hm"]) <= 2.0
    assert abs(float(np.ravel(F2_fit["B_bot"])[0])
               - F2_truth["B_bot"]) <= 2.0


def test_minimize_parameters_empty_grid_falls_back(day_profile):
    """A sigma smaller than the brute step yields a 1-point grid, not an
    opaque argmin error (ADVICE retrieval.py:180)."""
    d = day_profile
    F2 = _layer_scalars(d["F2"])
    F1 = _layer_scalars(d["F1"])
    E = _layer_scalars(d["E"])
    freq = np.arange(3.0, 10.01, 0.5)
    alt = np.arange(80.0, 700.0, 2.0)
    bmag = np.full(alt.size, 3e-5)
    bpsi = np.full(alt.size, 70.0)
    vh_obs, _ = model_VH(F2, F1, E, freq, alt, bmag, bpsi)
    # percent_sigma tiny: old*percent/100 << step -> empty arange
    vh_fit, edp_fit, F2_fit = minimize_parameters(
        F2, F1, E, freq, np.asarray(vh_obs), alt, bmag, bpsi,
        percent_sigma=0.001, step=5.0)
    assert np.isclose(float(np.ravel(F2_fit["hm"])[0]), F2["hm"])
    assert np.isclose(float(np.ravel(F2_fit["B_bot"])[0]), F2["B_bot"])


def test_retrieve_gradient_batch_retry_keeps_better(day_profile):
    """retry pass: forcing retries (retry_cost=0) never worsens any fit."""
    import jax.numpy as jnp
    from pyrayhf_tpu.magnetoionic import freq2den
    from pyrayhf_tpu.retrieval import retrieve_gradient_batch

    d = day_profile
    F1 = _layer_scalars(d["F1"])
    E = _layer_scalars(d["E"])
    freq = np.arange(2.0, 13.51, 0.5)
    alt = np.arange(80.0, 700.0, 2.0)
    bmag = np.full(alt.size, 3e-5)
    bpsi = np.full(alt.size, 70.0)
    nm_truth = float(freq2den(13.5e6)) * 1.0001
    rng = np.random.default_rng(9)
    B = 3
    hms = rng.uniform(290.0, 340.0, B)
    bbs = rng.uniform(40.0, 50.0, B)
    obs = np.stack([np.asarray(model_VH(
        {"Nm": nm_truth, "hm": hms[b], "B_bot": bbs[b], "B_top": 40.0},
        F1, E, freq, alt, bmag, bpsi)[0]) for b in range(B)])
    F2_guess = {"Nm": nm_truth, "hm": hms * 0.97, "B_bot": bbs * 1.05,
                "B_top": 40.0}
    kw = dict(steps=5, chunk_size=None, dtype=jnp.float32)
    base = retrieve_gradient_batch(F2_guess, F1, E, freq, obs, alt, bmag,
                                   bpsi, retries=0, **kw)
    forced = retrieve_gradient_batch(F2_guess, F1, E, freq, obs, alt, bmag,
                                     bpsi, retries=1, retry_cost=0.0, **kw)
    # every sample's final cost is <= the no-retry fit's
    assert np.all(np.asarray(forced[3])[-1]
                  <= np.asarray(base[3])[-1] + 1e-6)
    assert np.asarray(forced[0]).shape == obs.shape
    assert np.asarray(forced[1]).shape == (B, alt.size)
    for k in ("hm", "B_bot", "Nm"):
        assert np.asarray(forced[2][k]).shape == (B,)


def test_retrieval_x_mode_pinning_and_recovery(day_profile):
    """X-mode retrieval: NmF2 pinned from the X+Y=1 cutoff (ref :770-778).

    Truth is constructed so the pinning rule inverts exactly: with
    foF2 = sqrt(f_max^2 - f_max*f_c), the X-mode cutoff equals f_max, so
    the top observed frequency reflects marginally and the pin recovers
    the true NmF2. Brute then recovers the perturbed hmF2/B_bot.
    """
    from pyrayhf_tpu.constants import G_P
    from pyrayhf_tpu.magnetoionic import freq2den

    d = day_profile
    F1 = _layer_scalars(d["F1"])
    E = _layer_scalars(d["E"])
    freq = np.arange(3.0, 12.01, 0.25)
    alt = np.arange(80.0, 700.0, 0.25)
    bmag_v = 4e-5
    bmag = np.full(alt.size, bmag_v)
    bpsi = np.full(alt.size, 60.0)
    f_max = freq[-1] * 1e6
    f_c = bmag_v * G_P
    nm_truth = float(freq2den(np.sqrt(f_max ** 2 - f_max * f_c))) * 1.0001

    hm_t, bb_t = 320.0, 46.0
    F2_truth = {"Nm": nm_truth, "hm": hm_t, "B_bot": bb_t, "B_top": 40.0}
    vh_obs, _ = model_VH(F2_truth, F1, E, freq, alt, bmag, bpsi, mode="X")
    vh_obs = np.asarray(vh_obs)
    assert np.isfinite(vh_obs[-1])       # the pin frequency reflects

    F2_guess = dict(F2_truth, hm=hm_t - 10.0, B_bot=bb_t + 4.0)
    vh_fit, edp_fit, F2_fit = minimize_parameters(
        F2_guess, F1, E, freq, vh_obs, alt, bmag, bpsi, mode="X",
        percent_sigma=8.0, step=2.0)
    # the pin reproduced the true NmF2 (within the 1.0001 margin algebra)
    assert abs(float(np.ravel(F2_fit["Nm"])[0]) / nm_truth - 1) < 1e-3
    assert abs(float(np.ravel(F2_fit["hm"])[0]) - hm_t) <= 4.0
    assert abs(float(np.ravel(F2_fit["B_bot"])[0]) - bb_t) <= 2.5


def test_retrieve_gradient_batch_per_sample_environments(day_profile):
    """[B, N] b_mag/b_psi (per-sample magnetic environments — the global-
    grid case where every cell has its own IGRF column) recover per-sample
    truths and agree with B=1 fits run one at a time on each environment.
    Exercises the chunked path so environment slicing is covered too."""
    from pyrayhf_tpu.magnetoionic import freq2den
    from pyrayhf_tpu.retrieval import retrieve_gradient_batch

    d = day_profile
    F1 = _layer_scalars(d["F1"])
    E = _layer_scalars(d["E"])
    freq = np.arange(2.0, 13.51, 0.25)
    alt = np.arange(80.0, 700.0, 0.5)
    nm_truth = float(freq2den(13.5e6)) * 1.0001

    rng = np.random.default_rng(11)
    B = 4
    hms = rng.uniform(290.0, 350.0, B)
    bbs = rng.uniform(40.0, 52.0, B)
    # heterogeneous environments: per-sample field strength AND dip angle
    bmag = np.linspace(2.4e-5, 4.4e-5, B)[:, None] * np.ones(alt.size)
    bpsi = np.linspace(35.0, 80.0, B)[:, None] * np.ones(alt.size)
    obs = np.stack([np.asarray(model_VH(
        {"Nm": nm_truth, "hm": hms[b], "B_bot": bbs[b], "B_top": 40.0},
        F1, E, freq, alt, bmag[b], bpsi[b])[0]) for b in range(B)])

    F2_guess = {"Nm": nm_truth, "hm": hms * 0.95, "B_bot": bbs * 1.08,
                "B_top": 40.0}
    _, _, F2_fit, _ = retrieve_gradient_batch(
        F2_guess, F1, E, freq, obs, alt, bmag, bpsi, steps=15,
        chunk_size=2)
    assert np.all(np.abs(F2_fit["hm"] / hms - 1) < 0.02)
    assert np.all(np.abs(F2_fit["B_bot"] / bbs - 1) < 0.05)

    # per-sample single fits on each sample's own environment agree
    for b in range(B):
        F2_g1 = {"Nm": nm_truth, "hm": hms[b] * 0.95,
                 "B_bot": bbs[b] * 1.08, "B_top": 40.0}
        _, _, f1_fit, _ = retrieve_gradient_batch(
            F2_g1, F1, E, freq, obs[b][None], alt, bmag[b], bpsi[b],
            steps=15)
        np.testing.assert_allclose(F2_fit["hm"][b], f1_fit["hm"][0],
                                   rtol=1e-6)
        np.testing.assert_allclose(F2_fit["B_bot"][b], f1_fit["B_bot"][0],
                                   rtol=1e-6)

    # a wrong-shaped environment raises
    with np.testing.assert_raises(ValueError):
        retrieve_gradient_batch(F2_guess, F1, E, freq, obs, alt,
                                bmag[:3], bpsi, steps=2)


def test_retrieve_batch_per_sample_env_x_mode(day_profile):
    """X-mode NmF2 pinning uses each sample's OWN B at hmF2 when the
    environment is per-sample ([B, N]): pins must match the single-sample
    pin computed from that row's field."""
    from pyrayhf_tpu.retrieval import retrieve_gradient_batch

    d = day_profile
    F1 = _layer_scalars(d["F1"])
    E = _layer_scalars(d["E"])
    freq = np.arange(2.0, 12.01, 0.5)
    alt = np.arange(80.0, 700.0, 0.5)
    B = 3
    bmag = np.linspace(2.5e-5, 5.0e-5, B)[:, None] * np.ones(alt.size)
    bpsi = np.full((B, alt.size), 60.0)
    hms = np.array([300.0, 320.0, 340.0])
    bbs = np.array([45.0, 48.0, 42.0])
    obs = np.stack([np.asarray(model_VH(
        {"Nm": 1.5e12, "hm": hms[b], "B_bot": bbs[b], "B_top": 40.0},
        F1, E, freq, alt, bmag[b], bpsi[b], mode="X")[0])
        for b in range(B)])
    F2_guess = {"Nm": 1.5e12, "hm": hms, "B_bot": bbs, "B_top": 40.0}
    _, _, fit_b, _ = retrieve_gradient_batch(
        F2_guess, F1, E, freq, obs, alt, bmag, bpsi, mode="X",
        n_points=400, steps=2)
    for b in range(B):
        _, _, fit_1, _ = retrieve_gradient_batch(
            {"Nm": 1.5e12, "hm": hms[b], "B_bot": bbs[b], "B_top": 40.0},
            F1, E, freq, obs[b][None], alt, bmag[b], bpsi[b], mode="X",
            n_points=400, steps=2)
        np.testing.assert_allclose(fit_b["Nm"][b], fit_1["Nm"][0],
                                   rtol=1e-12)
