"""Fused-kernel tests (interpret mode on CPU; real-TPU numbers in bench.py)."""

import numpy as np
import jax.numpy as jnp
from numpy.testing import assert_allclose

from pyrayhf_tpu.forward import vertical_forward_operator_batch
from pyrayhf_tpu.pallas_vh import (ionogram_fast_xla, ionogram_pallas,
                                   ionogram_pallas_gather,
                                   ionogram_pallas_mxu)


def _workload(B=4, n_alt=180):
    alt = np.linspace(90.0, 550.0, n_alt)
    rng = np.random.default_rng(3)
    hms = rng.uniform(250.0, 330.0, B)
    peaks = rng.uniform(1e12, 3e12, B)
    den = peaks[:, None] * np.exp(-(alt[None, :] - hms[:, None]) ** 2
                                  / (2 * 55.0 ** 2))
    bmag = np.full((B, n_alt), 3.2e-5)
    bpsi = np.full((B, n_alt), 65.0)
    freqs = np.arange(1.0, 16.0, 0.5)
    return freqs, den, bmag, bpsi, alt


def test_fast_xla_matches_parity_operator():
    freqs, den, bmag, bpsi, alt = _workload()
    for mm, mode in [(1.0, "O"), (-1.0, "X")]:
        ref = np.asarray(vertical_forward_operator_batch(
            freqs, den, bmag, bpsi, alt, mode=mode, n_points=200))
        fast = np.asarray(ionogram_fast_xla(
            jnp.asarray(freqs), jnp.asarray(den), jnp.asarray(bmag),
            jnp.asarray(bpsi), jnp.asarray(alt), mode_mult=mm, n_points=200))
        assert np.array_equal(np.isnan(fast), np.isnan(ref)), mode
        m = np.isfinite(ref)
        assert np.abs(fast[m] - ref[m]).max() < 1e-6, mode


def test_pallas_kernel_interpret_matches_parity():
    freqs, den, bmag, bpsi, alt = _workload(B=2)
    for mm, mode in [(1.0, "O"), (-1.0, "X")]:
        ref = np.asarray(vertical_forward_operator_batch(
            freqs, den, bmag, bpsi, alt, mode=mode, n_points=200))
        pal = np.asarray(ionogram_pallas(
            jnp.asarray(freqs), jnp.asarray(den), jnp.asarray(bmag),
            jnp.asarray(bpsi), jnp.asarray(alt), mode_mult=mm,
            n_points=200, interpret=True))
        assert np.array_equal(np.isnan(pal), np.isnan(ref)), mode
        m = np.isfinite(ref)
        assert np.abs(pal[m] - ref[m]).max() < 1e-6, mode


def test_pallas_kernel_point_chunking():
    """Multiple P-chunks accumulate correctly into the output block."""
    freqs, den, bmag, bpsi, alt = _workload(B=2)
    one = np.asarray(ionogram_pallas(
        jnp.asarray(freqs), jnp.asarray(den), jnp.asarray(bmag),
        jnp.asarray(bpsi), jnp.asarray(alt), mode_mult=1.0,
        n_points=512, p_chunk=512, interpret=True))
    four = np.asarray(ionogram_pallas(
        jnp.asarray(freqs), jnp.asarray(den), jnp.asarray(bmag),
        jnp.asarray(bpsi), jnp.asarray(alt), mode_mult=1.0,
        n_points=512, p_chunk=128, interpret=True))
    assert_allclose(one, four, rtol=1e-10, equal_nan=True)


def test_fast_xla_unmagnetized_profile():
    """B == 0 exercises the per-element isotropic fallback."""
    freqs, den, _, _, alt = _workload(B=2)
    bmag = np.zeros_like(den)
    bpsi = np.zeros_like(den)
    ref = np.asarray(vertical_forward_operator_batch(
        freqs, den, bmag, bpsi, alt, mode="O", n_points=200))
    fast = np.asarray(ionogram_fast_xla(
        jnp.asarray(freqs), jnp.asarray(den), jnp.asarray(bmag),
        jnp.asarray(bpsi), jnp.asarray(alt), mode_mult=1.0, n_points=200))
    assert np.array_equal(np.isnan(fast), np.isnan(ref))
    m = np.isfinite(ref)
    assert np.abs(fast[m] - ref[m]).max() < 1e-6


def test_pallas_nonuniform_grid_interpret():
    """The generic (non-uniform grid) sweep path matches parity."""
    rng = np.random.default_rng(7)
    alt = np.sort(rng.uniform(90.0, 550.0, 150))
    alt[0], alt[-1] = 90.0, 550.0
    den = 2e12 * np.exp(-(alt - 300.0) ** 2 / (2 * 60.0 ** 2))[None, :]
    bmag = np.full_like(den, 3e-5)
    bpsi = np.full_like(den, 60.0)
    freqs = np.arange(2.0, 14.0, 1.0)
    ref = np.asarray(vertical_forward_operator_batch(
        freqs, den, bmag, bpsi, alt, mode="O", n_points=200))
    pal = np.asarray(ionogram_pallas(
        jnp.asarray(freqs), jnp.asarray(den), jnp.asarray(bmag),
        jnp.asarray(bpsi), jnp.asarray(alt), mode_mult=1.0,
        n_points=200, interpret=True))
    assert np.array_equal(np.isnan(pal), np.isnan(ref))
    m = np.isfinite(ref)
    assert np.abs(pal[m] - ref[m]).max() < 1e-6


def test_f32_vs_f64_tolerance():
    """f32 operator stays within the 0.1 km budget INCLUDING near-critical.

    (SURVEY §4 implication: add f32-vs-f64 tolerance tests.) The
    analytic-margin tail (``_mu_mup_stable_tile``) evaluates the singular
    reflection tail from the crossing-segment slope, so no frequencies
    need excluding.
    """
    freqs, den, bmag, bpsi, alt = _workload(B=2)
    for mm in (1.0, -1.0):
        v64 = np.asarray(ionogram_fast_xla(
            jnp.asarray(freqs), jnp.asarray(den), jnp.asarray(bmag),
            jnp.asarray(bpsi), jnp.asarray(alt), mode_mult=mm,
            n_points=200))
        f32 = jnp.float32
        v32 = np.asarray(ionogram_fast_xla(
            jnp.asarray(freqs, f32), jnp.asarray(den, f32),
            jnp.asarray(bmag, f32), jnp.asarray(bpsi, f32),
            jnp.asarray(alt, f32), mode_mult=mm, n_points=200))
        m = np.isfinite(v64) & np.isfinite(v32)
        assert np.abs(v32[m] - v64[m]).max() < 0.05, mm


def test_f32_xmode_20k_accuracy_budget(goldens, day_profile, night_profile):
    """f32 X-mode 20k-point run inside the 0.1 km driver budget.

    BASELINE.md accuracy pin, evaluated in the kernel's fast dtype. The
    stretched-grid tables (mult, 1−mult, Δmult) must be formed in f64
    before the f32 cast — with f32-diffed tables the near-reflection dh
    collapses (grid spacing ≲ 2e-8 relative is below f32 eps) and this
    workload lands at ~0.09 km; with the f64-formed tables it holds
    ≤ 0.02 km (measured: 0.0045 day / 0.0011 night).
    """
    freqs = goldens["vfo_freqs"]
    f32 = jnp.float32
    for name, prof in [("day", day_profile), ("night", night_profile)]:
        ref = goldens[f"vfo_{name}_X_20000"]
        vh = np.asarray(ionogram_fast_xla(
            jnp.asarray(freqs, f32),
            jnp.asarray(prof["den"], f32)[None, :],
            jnp.asarray(prof["bmag"], f32)[None, :],
            jnp.asarray(prof["bpsi"], f32)[None, :],
            jnp.asarray(prof["alt"], f32), mode_mult=-1.0,
            n_points=20000))[0]
        m = np.isfinite(ref) & np.isfinite(vh)
        assert m.sum() > 100, name
        assert np.abs(vh[m] - ref[m]).max() < 0.02, name


def test_f32_analytic_tail_day_night(goldens, day_profile, night_profile):
    """f32 fast path vs the f64 reference oracle on the real ionograms.

    Regression pin for the analytic-margin reflection tail: with the
    guard-only kernel these were 0.05–0.66 km; the analytic path holds
    ≤ ~0.03 km on Day/Night × O/X, near-critical frequencies included.
    The two gates under test: crossing-segment-only substitution
    (eps ≤ emax) and the cummax-shadowed (E-peak plateau) exclusion.
    """
    freqs = goldens["vfo_freqs"]
    f32 = jnp.float32
    for name, prof in [("day", day_profile), ("night", night_profile)]:
        for mm, mode in [(1.0, "O"), (-1.0, "X")]:
            ref = goldens[f"vfo_{name}_{mode}_200"]
            vh = np.asarray(ionogram_fast_xla(
                jnp.asarray(freqs, f32),
                jnp.asarray(prof["den"], f32)[None, :],
                jnp.asarray(prof["bmag"], f32)[None, :],
                jnp.asarray(prof["bpsi"], f32)[None, :],
                jnp.asarray(prof["alt"], f32), mode_mult=mm,
                n_points=200))[0]
            assert np.array_equal(np.isnan(vh), np.isnan(ref)), (name, mode)
            m = np.isfinite(ref)
            assert np.abs(vh[m] - ref[m]).max() < 0.03, (name, mode)


def test_pallas_reverse_mode_gradients_match_xla():
    """jax.grad through ionogram_pallas equals grad through the XLA sweep.

    pallas_call has no autodiff rule; the custom VJP routes the backward
    pass through ionogram_fast_xla (identical discretisation). Escaped
    rays are masked with where(isfinite, ., 0) as in the retrieval path.
    """
    import jax

    freqs, den, bmag, bpsi, alt = _workload(B=2)

    def loss(impl, scale):
        vh = impl(jnp.asarray(freqs), scale * jnp.asarray(den),
                  jnp.asarray(bmag), jnp.asarray(bpsi), jnp.asarray(alt),
                  mode_mult=1.0, n_points=200)
        return jnp.sum(jnp.where(jnp.isfinite(vh), vh, 0.0))

    def pal(f, d, bm, bp, a, **kw):
        return ionogram_pallas(f, d, bm, bp, a, interpret=True, **kw)

    g_pal = float(jax.grad(lambda s: loss(pal, s))(1.0))
    g_xla = float(jax.grad(lambda s: loss(ionogram_fast_xla, s))(1.0))
    assert np.isfinite(g_pal)
    np.testing.assert_allclose(g_pal, g_xla, rtol=1e-10)

    # per-element gradient w.r.t. the density profile
    gd_pal = np.asarray(jax.grad(
        lambda d: loss(pal, 1.0) * 0.0 + jnp.sum(jnp.where(
            jnp.isfinite(pal(jnp.asarray(freqs), d, jnp.asarray(bmag),
                             jnp.asarray(bpsi), jnp.asarray(alt),
                             mode_mult=1.0, n_points=200)),
            pal(jnp.asarray(freqs), d, jnp.asarray(bmag),
                jnp.asarray(bpsi), jnp.asarray(alt),
                mode_mult=1.0, n_points=200), 0.0)))(jnp.asarray(den)))
    gd_xla = np.asarray(jax.grad(
        lambda d: jnp.sum(jnp.where(
            jnp.isfinite(ionogram_fast_xla(
                jnp.asarray(freqs), d, jnp.asarray(bmag),
                jnp.asarray(bpsi), jnp.asarray(alt),
                mode_mult=1.0, n_points=200)),
            ionogram_fast_xla(jnp.asarray(freqs), d, jnp.asarray(bmag),
                              jnp.asarray(bpsi), jnp.asarray(alt),
                              mode_mult=1.0, n_points=200),
            0.0)))(jnp.asarray(den)))
    assert np.isfinite(gd_pal).all()
    np.testing.assert_allclose(gd_pal, gd_xla, rtol=1e-9, atol=1e-30)


def test_mxu_and_gather_kernels_match_sweep_kernel():
    """MXU one-hot and dynamic-gather kernels ≡ sweep kernel in f64.

    All three evaluate the same piecewise-linear resample; the gather
    formulations carry no O(N) summation so on a uniform grid they agree
    with the sweep to ~1e-12 km (the O-mode in-kernel solve reassociates
    a few products, hence not bitwise).
    """
    freqs, den, bmag, bpsi, alt = _workload(B=4)
    for impl in (ionogram_pallas_mxu, ionogram_pallas_gather):
        for mm, mode in [(1.0, "O"), (-1.0, "X")]:
            ref = np.asarray(ionogram_pallas(
                jnp.asarray(freqs), jnp.asarray(den), jnp.asarray(bmag),
                jnp.asarray(bpsi), jnp.asarray(alt), mode_mult=mm,
                n_points=200, interpret=True))
            out = np.asarray(impl(
                jnp.asarray(freqs), jnp.asarray(den), jnp.asarray(bmag),
                jnp.asarray(bpsi), jnp.asarray(alt), mode_mult=mm,
                n_points=200, interpret=True))
            assert np.array_equal(np.isnan(out), np.isnan(ref)), \
                (impl.__name__, mode)
            m = np.isfinite(ref)
            assert np.abs(out[m] - ref[m]).max() < 1e-9, \
                (impl.__name__, mode)


def test_gather_xsolve_bit_matches_xla_prep():
    """X-mode in-kernel reflection solve ≡ the XLA [B,F,N] prep.

    Round-4: _kernel_gather_xsolve selects every interpolation ordinate
    (k, f0, f1, r0) from the same raw X+Y samples the dense path's
    cummax selects; the only difference is the relative-altitude frame
    of the critical height (one extra rounding, same as the O in-kernel
    solve) so f64 agreement is ~1e-12 km away from the critical
    frequency and ≲3e-7 km on near-critical rows (|∂vh/∂h_crit| diverges
    there, amplifying the last-ulp crit rounding; still 5 orders inside
    the 0.1 km budget) — verified on a two-peak profile (cummax-shadowed
    valley ⇒ the ``genuine`` guard), above-MUF rows (NaN), and a
    sub-gyro row whose cutoff is exceeded at the very first node
    (non-propagating; NaN-structure equality only).
    """
    n_alt = 180
    alt = np.linspace(90.0, 550.0, n_alt)
    # profile 0: plain Gaussian; profile 1: E-peak over a valley, so the
    # cutoff cummax shadows part of the F-layer bottomside
    f2 = 2.5e12 * np.exp(-(alt - 300.0) ** 2 / (2 * 55.0 ** 2))
    e_layer = 9e11 * np.exp(-(alt - 110.0) ** 2 / (2 * 10.0 ** 2))
    den = np.stack([f2, f2 + e_layer])
    bmag = np.full((2, n_alt), 3.2e-5)
    bpsi = np.full((2, n_alt), 65.0)
    # 0.3 MHz: first-node exceedance; 25–30 MHz: above the X MUF (NaN)
    freqs = np.concatenate([[0.3], np.arange(1.0, 16.0, 0.5), [25.0, 30.0]])
    args = (jnp.asarray(freqs), jnp.asarray(den), jnp.asarray(bmag),
            jnp.asarray(bpsi), jnp.asarray(alt))
    new = np.asarray(ionogram_pallas_gather(
        *args, mode_mult=-1.0, n_points=200, interpret=True))
    old = np.asarray(ionogram_pallas_gather(
        *args, mode_mult=-1.0, n_points=200, interpret=True,
        x_in_kernel_solve=False))
    assert np.array_equal(np.isnan(new), np.isnan(old))
    m = np.isfinite(old)
    m[:, 0] = False                              # sub-gyro degenerate row
    assert np.abs(new[m] - old[m]).max() < 1e-6
    assert np.isnan(new[:, -1]).all()            # above-MUF rows escape


def test_mxu_and_gather_point_chunking():
    """Fast kernels accumulate correctly across multiple P-chunks."""
    freqs, den, bmag, bpsi, alt = _workload(B=2)
    for impl in (ionogram_pallas_mxu, ionogram_pallas_gather):
        one = np.asarray(impl(
            jnp.asarray(freqs), jnp.asarray(den), jnp.asarray(bmag),
            jnp.asarray(bpsi), jnp.asarray(alt), mode_mult=1.0,
            n_points=512, p_chunk=512, interpret=True))
        four = np.asarray(impl(
            jnp.asarray(freqs), jnp.asarray(den), jnp.asarray(bmag),
            jnp.asarray(bpsi), jnp.asarray(alt), mode_mult=1.0,
            n_points=512, p_chunk=128, interpret=True))
        assert_allclose(one, four, rtol=1e-10, equal_nan=True,
                        err_msg=impl.__name__)


def test_mxu_requires_uniform_grid():
    import pytest
    freqs, den, bmag, bpsi, alt = _workload(B=2)
    alt_nu = alt.copy()
    alt_nu[1:] += np.linspace(0.0, 5.0, alt.size - 1) ** 2 * 0.01
    for impl in (ionogram_pallas_mxu, ionogram_pallas_gather):
        with pytest.raises(ValueError, match="uniform"):
            impl(jnp.asarray(freqs), jnp.asarray(den),
                 jnp.asarray(bmag), jnp.asarray(bpsi),
                 jnp.asarray(alt_nu), mode_mult=1.0,
                 n_points=200, interpret=True)


def test_pallas_forward_mode_jacfwd_matches_jacrev():
    """jvp/jacfwd now work through the kernels (custom JVP, round-3).

    The tangent rule routes through the XLA sweep, so jacfwd == jacrev ==
    jacfwd(ionogram_fast_xla) — both differentiation modes through BOTH
    kernel entry points agree with the sweep's jacobian.
    """
    import jax

    freqs, den, bmag, bpsi, alt = _workload(B=2)

    def out_sum(impl, interpret):
        def f(scale):
            kw = {"interpret": True} if interpret else {}
            vh = impl(jnp.asarray(freqs), scale * jnp.asarray(den),
                      jnp.asarray(bmag), jnp.asarray(bpsi),
                      jnp.asarray(alt), mode_mult=1.0, n_points=200, **kw)
            return jnp.sum(jnp.where(jnp.isfinite(vh), vh, 0.0))
        return f

    d_ref = float(jax.jacfwd(out_sum(ionogram_fast_xla, False))(1.0))
    for impl in (ionogram_pallas, ionogram_pallas_mxu,
                 ionogram_pallas_gather):
        d_fwd = float(jax.jacfwd(out_sum(impl, True))(1.0))
        d_rev = float(jax.jacrev(out_sum(impl, True))(1.0))
        np.testing.assert_allclose(d_fwd, d_ref, rtol=1e-10)
        np.testing.assert_allclose(d_rev, d_ref, rtol=1e-10)


def test_engine_pallas_mxu_routing():
    """vertical_forward_operator_batch(engine='pallas_mxu') reaches the
    MXU kernel (interpret off-TPU would fail to lower, so validate the
    routing by the uniform-grid contract error on a non-uniform grid)."""
    import pytest
    freqs, den, bmag, bpsi, alt = _workload(B=2)
    alt_nu = alt.copy()
    alt_nu[5] += 0.5
    with pytest.raises(ValueError, match="uniform"):
        vertical_forward_operator_batch(freqs, den, bmag, bpsi, alt_nu,
                                        engine="pallas_mxu")
