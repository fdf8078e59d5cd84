"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pyrayhf_tpu.forward import vertical_forward_operator
from pyrayhf_tpu.parallel import (ionogram_mesh, retrieval_step_sharded,
                                  synthesize_ionograms_sharded,
                                  vh_height_sharded)


@pytest.fixture(scope="module")
def mesh8():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    return ionogram_mesh(jax.devices()[:8], batch_axis=4)


def _batch_profiles(B, N=120):
    alt = np.linspace(90.0, 500.0, N)
    rng = np.random.default_rng(0)
    peaks = rng.uniform(1.5e12, 3e12, B)
    hms = rng.uniform(250.0, 350.0, B)
    den = peaks[:, None] * np.exp(-(alt[None, :] - hms[:, None]) ** 2
                                  / (2 * 60.0 ** 2))
    bmag = np.full((B, N), 4e-5)
    bpsi = np.full((B, N), 50.0)
    return alt, den, bmag, bpsi


def test_sharded_synthesis_matches_single_device(mesh8):
    alt, den, bmag, bpsi = _batch_profiles(8)
    freqs = np.arange(2.0, 10.0, 0.5)          # 16 freqs / 2 freq-shards
    out = np.asarray(synthesize_ionograms_sharded(
        freqs, den, bmag, bpsi, alt, mesh8, mode="O", n_points=100))
    assert out.shape == (8, 16)
    for i in range(8):
        single = np.asarray(vertical_forward_operator(
            freqs, den[i], bmag[i], bpsi[i], alt, mode="O", n_points=100))
        assert_allclose(out[i], single, rtol=1e-12, equal_nan=True)


def test_height_sharded_quadrature_matches(mesh8):
    alt, den, bmag, bpsi = _batch_profiles(1)
    freqs = np.arange(2.0, 10.0, 0.5)
    vh_ref = np.asarray(vertical_forward_operator(
        freqs, den[0], bmag[0], bpsi[0], alt, mode="O", n_points=256))
    vh_sh = np.asarray(vh_height_sharded(
        freqs, den[0], bmag[0], bpsi[0], alt, mesh8, axis="batch",
        mode="O", n_points=256))
    assert np.array_equal(np.isnan(vh_sh), np.isnan(vh_ref))
    m = np.isfinite(vh_ref)
    assert_allclose(vh_sh[m], vh_ref[m], rtol=1e-10)


def test_retrieval_step_sharded_descends(mesh8):
    B = 8
    alt = jnp.linspace(90.0, 500.0, 80)
    bmag = jnp.full(80, 4e-5)
    bpsi = jnp.full(80, 50.0)
    E = {"Nm": 5e10, "hm": 110.0, "B_bot": 5.0, "B_top": 7.0}
    aux = {"alt": alt, "bmag": bmag, "bpsi": bpsi, "E": E, "B_top": 40.0}
    freq = jnp.arange(2.0, 8.0, 0.5)

    from pyrayhf_tpu import edp
    from pyrayhf_tpu.forward import vh_and_mask
    hm_true = jnp.full(B, 300.0)
    bb_true = jnp.full(B, 50.0)
    nm_true = jnp.full(B, 2e12)

    def vh_of(hm, bb, nm):
        NmF1, _, hmF1, _ = edp.derive_dependent_F1_parameters(
            0.8, nm, hm, bb, E["hm"])
        EDP = edp.reconstruct_density_1level(
            {"Nm": nm, "hm": hm, "B_bot": bb, "B_top": 40.0},
            {"Nm": NmF1, "hm": hmF1}, E, alt)
        vh, valid = vh_and_mask(freq, EDP, bmag, bpsi, alt,
                                mode_mult=1.0, n_points=64)
        return jnp.where(valid, vh, jnp.nan)

    obs = jax.vmap(vh_of)(hm_true, bb_true, nm_true)
    theta = {"hm": hm_true + 10.0, "bb": bb_true + 4.0, "nm": nm_true}

    _, loss0 = retrieval_step_sharded(theta, obs, freq, aux, mesh8, lr=0.0)
    theta1, _ = retrieval_step_sharded(theta, obs, freq, aux, mesh8,
                                       lr=1e-9)
    _, loss1 = retrieval_step_sharded(theta1, obs, freq, aux, mesh8, lr=0.0)
    assert float(loss1) < float(loss0)
