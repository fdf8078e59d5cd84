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


def test_batched_lm_sharded_matches_unsharded(mesh8):
    """DP-sharded parallel-LM retrieval == unsharded (GSPMD, no collectives)."""
    from pyrayhf_tpu.magnetoionic import freq2den
    from pyrayhf_tpu.parallel import retrieve_gradient_batch_sharded
    from pyrayhf_tpu.retrieval import model_VH, retrieve_gradient_batch

    alt = np.arange(80.0, 700.0, 1.0)
    bmag = np.full(alt.size, 3e-5)
    bpsi = np.full(alt.size, 70.0)
    E = {"Nm": 1.2e11, "hm": 110.0, "B_bot": 5.0, "B_top": 7.0}
    F1 = {"P": 0.6}
    freq = np.arange(2.0, 13.51, 0.5)
    nm_truth = float(freq2den(13.5e6)) * 1.0001
    rng = np.random.default_rng(11)
    B = 8
    hms = rng.uniform(280.0, 350.0, B)
    bbs = rng.uniform(38.0, 55.0, B)
    obs = np.stack([np.asarray(model_VH(
        {"Nm": nm_truth, "hm": hms[b], "B_bot": bbs[b], "B_top": 40.0},
        F1, E, freq, alt, bmag, bpsi, n_points=100)[0]) for b in range(B)])
    F2g = {"Nm": nm_truth, "hm": hms * 0.97, "B_bot": bbs * 1.05,
           "B_top": 40.0}

    vh_s, edp_s, F2_s, hist_s = retrieve_gradient_batch_sharded(
        F2g, F1, E, freq, obs, alt, bmag, bpsi, mesh8, steps=8,
        n_points=100)
    vh_u, edp_u, F2_u, hist_u = retrieve_gradient_batch(
        F2g, F1, E, freq, obs, alt, bmag, bpsi, steps=8, n_points=100)

    assert_allclose(np.asarray(F2_s["hm"]), np.asarray(F2_u["hm"]),
                    rtol=1e-9)
    assert_allclose(np.asarray(F2_s["B_bot"]), np.asarray(F2_u["B_bot"]),
                    rtol=1e-9)
    m = np.isfinite(np.asarray(vh_u))
    assert_allclose(np.asarray(vh_s)[m], np.asarray(vh_u)[m], rtol=1e-8)
    # the optimisation makes real progress on most samples (deep
    # convergence is pinned by test_edp_retrieval's batch-recovery test on
    # a finer discretisation; this coarse workload has a quadrature-noise
    # cost floor)
    assert np.all(hist_s[-1] <= hist_s[0])
    assert np.mean(hist_s[-1] < 0.9 * hist_s[0]) >= 0.5


def test_sharded_lm_chunking_composes(mesh8):
    """chunk_size × sharding: per-chunk work stays batch-sharded and the
    merged result equals the single-launch sharded run (verdict item 8)."""
    import pytest
    from pyrayhf_tpu.magnetoionic import freq2den
    from pyrayhf_tpu.parallel import retrieve_gradient_batch_sharded
    from pyrayhf_tpu.retrieval import model_VH

    alt = np.arange(80.0, 700.0, 1.0)
    bmag = np.full(alt.size, 3e-5)
    bpsi = np.full(alt.size, 70.0)
    E = {"Nm": 1.2e11, "hm": 110.0, "B_bot": 5.0, "B_top": 7.0}
    F1 = {"P": 0.6}
    freq = np.arange(2.0, 13.51, 0.5)
    nm_truth = float(freq2den(13.5e6)) * 1.0001
    rng = np.random.default_rng(7)
    B = 16
    hms = rng.uniform(280.0, 350.0, B)
    bbs = rng.uniform(38.0, 55.0, B)
    obs = np.stack([np.asarray(model_VH(
        {"Nm": nm_truth, "hm": hms[b], "B_bot": bbs[b], "B_top": 40.0},
        F1, E, freq, alt, bmag, bpsi, n_points=100)[0]) for b in range(B)])
    F2g = {"Nm": nm_truth, "hm": hms * 0.97, "B_bot": bbs * 1.05,
           "B_top": 40.0}

    one = retrieve_gradient_batch_sharded(
        F2g, F1, E, freq, obs, alt, bmag, bpsi, mesh8, steps=4,
        n_points=100)
    two = retrieve_gradient_batch_sharded(
        F2g, F1, E, freq, obs, alt, bmag, bpsi, mesh8, steps=4,
        n_points=100, chunk_size=8)    # 2 chunks of 8 (== axis size)
    assert_allclose(np.asarray(two[2]["hm"]), np.asarray(one[2]["hm"]),
                    rtol=1e-9)
    assert_allclose(np.asarray(two[2]["B_bot"]),
                    np.asarray(one[2]["B_bot"]), rtol=1e-9)
    m = np.isfinite(np.asarray(one[0]))
    assert_allclose(np.asarray(two[0])[m], np.asarray(one[0])[m],
                    rtol=1e-8)
    assert np.asarray(two[3]).shape == np.asarray(one[3]).shape
    # invalid chunk: not divisible by the batch axis size
    with pytest.raises(ValueError, match="divisible"):
        retrieve_gradient_batch_sharded(
            F2g, F1, E, freq, obs, alt, bmag, bpsi, mesh8, steps=2,
            n_points=100, chunk_size=5)


def test_ionogram_mesh_validates_batch_axis():
    """Non-divisor batch_axis raises a descriptive error, not a numpy
    reshape failure (ADVICE mesh.py:54)."""
    import jax
    import pytest
    from pyrayhf_tpu.parallel import ionogram_mesh
    devices = jax.devices()[:8]
    with pytest.raises(ValueError, match="divisor"):
        ionogram_mesh(devices, batch_axis=3)
    with pytest.raises(ValueError, match="divisor"):
        ionogram_mesh(devices, batch_axis=0)
    mesh = ionogram_mesh(devices, batch_axis=4)
    assert dict(mesh.shape) == {"batch": 4, "freq": 2}


def test_sharded_pallas_engine_matches_xla(mesh8):
    """engine='pallas' (fused kernel per shard via shard_map) == 'xla'.

    Validates the TPU-production composition pallas_call-inside-shard_map
    on the 8-virtual-device mesh (interpret mode on CPU).
    """
    import numpy as np
    from pyrayhf_tpu.parallel import synthesize_ionograms_sharded

    B, F, N = 8, 8, 96
    alt = np.linspace(90.0, 550.0, N)
    rng = np.random.default_rng(5)
    hms = rng.uniform(250.0, 330.0, B)
    den = 2e12 * np.exp(-(alt[None, :] - hms[:, None]) ** 2 / (2 * 55.0 ** 2))
    bmag = np.full((B, N), 3.2e-5)
    bpsi = np.full((B, N), 65.0)
    freqs = np.arange(2.0, 10.0, 1.0)

    xla = np.asarray(synthesize_ionograms_sharded(
        freqs, den, bmag, bpsi, alt, mesh8, n_points=64, engine="xla"))
    pal = np.asarray(synthesize_ionograms_sharded(
        freqs, den, bmag, bpsi, alt, mesh8, n_points=64, engine="pallas",
        interpret=True))
    assert np.array_equal(np.isnan(pal), np.isnan(xla))
    m = np.isfinite(xla)
    assert np.abs(pal[m] - xla[m]).max() < 1e-9


def test_trace_fan_3d_sharded_matches_unsharded(day_profile):
    """Elevation-sharded 3-D fan over the 8-device mesh equals the
    unsharded trace (pure DP over rays, replicated volume)."""
    import numpy as np

    from pyrayhf_tpu.parallel.mesh import ionogram_mesh, \
        trace_fan_3d_sharded
    from pyrayhf_tpu.trace3d import build_field_3d, trace_rays_3d

    d = day_profile
    alt, den = np.asarray(d["alt"]), np.asarray(d["den"])
    bmag, bpsi = np.asarray(d["bmag"]), np.asarray(d["bpsi"])
    lat = np.linspace(20.0, 50.0, 11)
    lon = np.linspace(-85.0, -55.0, 11)
    shape = (alt.size, lat.size, lon.size)
    U = lambda v: np.broadcast_to(v[:, None, None], shape)
    field = build_field_3d(alt, lat, lon, U(den), U(bmag), U(bpsi),
                           8e6, "O")
    els = np.linspace(20.0, 55.0, 8)
    azs = np.array([170.0, 190.0])
    mesh = ionogram_mesh()
    sh = trace_fan_3d_sharded(field, 35.0, -70.0, els, azs, mesh,
                              step_km=4.0, s_max_km=1500.0)
    un = trace_rays_3d(field, 35.0, -70.0, els, azs, step_km=4.0,
                       s_max_km=1500.0)
    for k in ("ground_range_km", "group_delay_sec", "phase_path_km",
              "cross_track_km"):
        np.testing.assert_allclose(np.asarray(sh[k]), np.asarray(un[k]),
                                   rtol=1e-12, atol=1e-12)


def test_trace_fan_3d_aniso_sharded_matches_unsharded(day_profile):
    """Elevation-sharded anisotropic fan over the 8-device mesh equals
    the unsharded trace (pure DP, replicated Ne/B volume)."""
    import numpy as np

    from pyrayhf_tpu.parallel.mesh import ionogram_mesh, \
        trace_fan_3d_aniso_sharded
    from pyrayhf_tpu.trace3d_aniso import (build_field_3d_aniso,
                                           trace_rays_3d_anisotropic)

    d = day_profile
    alt, den = np.asarray(d["alt"]), np.asarray(d["den"])
    lat = np.linspace(20.0, 50.0, 9)
    lon = np.linspace(-85.0, -55.0, 9)
    shape = (alt.size, lat.size, lon.size)
    U = lambda v: np.broadcast_to(v[:, None, None], shape)
    bn = U(np.full_like(alt, 2.5e-5))
    be = U(np.full_like(alt, 3.0e-6))
    bd = U(np.full_like(alt, -3.5e-5))
    field = build_field_3d_aniso(alt, lat, lon, U(den), bn, be, bd)
    els = np.linspace(22.0, 50.0, 8)
    azs = np.array([170.0, 195.0])
    mesh = ionogram_mesh()
    sh = trace_fan_3d_aniso_sharded(field, 35.0, -70.0, els, azs, 8e6,
                                    mesh, mode="O", step_km=4.0,
                                    s_max_km=1500.0)
    un = trace_rays_3d_anisotropic(field, 35.0, -70.0, els, azs, 8e6,
                                   mode="O", step_km=4.0,
                                   s_max_km=1500.0)
    assert np.asarray(sh["ground_range_km"]).shape == (8, 2)
    # not bitwise: the value_and_grad dispersion RHS may fuse differently
    # under GSPMD/shard_map than under plain vmap (observed 6e-11 rel)
    for k in ("ground_range_km", "group_delay_sec", "phase_path_km",
              "cross_track_km", "absorption_db"):
        np.testing.assert_allclose(np.asarray(sh[k]), np.asarray(un[k]),
                                   rtol=1e-9, atol=1e-9)


def test_doppler_batch_sharded_matches_unsharded(mesh8):
    """DP-sharded batched Doppler equals the per-profile unsharded jvp
    (pure data parallel — bitwise path, rtol only for the vmap fusion)."""
    from pyrayhf_tpu.doppler import doppler_shift_vertical
    from pyrayhf_tpu.parallel import doppler_batch_sharded

    alt, den, bmag, bpsi = _batch_profiles(8)
    v = 0.02
    dden = np.stack([-v * np.gradient(d, alt) for d in den])
    freqs = np.arange(2.0, 10.0, 0.5)
    out = doppler_batch_sharded(freqs, den, dden, bmag, bpsi, alt, mesh8,
                                mode="O", n_points=120)
    fd = np.asarray(out["doppler_hz"])
    assert fd.shape == (8, freqs.size)
    for i in (0, 3, 7):
        single = np.asarray(doppler_shift_vertical(
            freqs, den[i], dden[i], bmag[i], bpsi[i], alt, mode="O",
            n_points=120)["doppler_hz"])
        m = np.isfinite(single)
        np.testing.assert_allclose(fd[i][m], single[m], rtol=1e-10)
        assert np.isnan(fd[i][~m]).all()
    # uplift red-shifts every reflected frequency across the whole batch
    assert (fd[np.isfinite(fd)] < 0).all()
