"""Vertical forward operator: ionosonde frequencies → virtual heights.

This is the hot path of the framework (ref ``vertical_forward_operator``,
``/root/reference/PyRayHF/library.py:459-509`` and ``find_vh`` :259-293),
re-designed as one fused XLA program:

    regrid (cummax + batched interp) → X,Y → Appleton–Hartree μ' → Σ μ'·dh

Three entry points:

* :func:`vertical_forward_operator` — reference-parity API (NaN for escaped
  rays), one profile, [N_freq] out.
* :func:`vertical_forward_operator_batch` — vmapped over a profile batch
  [B, N_alt] → [B, N_freq]; the unit of work for pjit/shard_map scaling.
* :func:`vh_and_mask` — gradient-safe masked variant used by retrieval:
  returns finite vh plus a validity mask, with zero (not NaN) gradients for
  escaped rays.
"""

import logging
from functools import partial

import jax
import jax.numpy as jnp

from .grid import regrid_core

# Physical ceiling for the group index at the backed-off reflection sample
# (see find_vh); generous vs the f64 bound ~3e5.
_MUP_CEILING = 1e7

from .magnetoionic import (find_X, find_Y, find_mu_mup, find_mu_mup_masked,
                           mode_multiplier)

__all__ = ["find_vh", "vertical_forward_operator",
           "vertical_forward_operator_batch", "vh_and_mask",
           "vertical_phase_operator"]


def find_vh(X, Y, bpsi, dh, alt_min, mode, arithmetic="stable"):
    """Virtual height as the μ'-weighted vertical quadrature (ref :259-293).

    NaN rows (escaped rays) sum to 0 under ``nansum`` and are mapped back to
    NaN, exactly like the reference. ``arithmetic="reference"`` selects
    bit-parity μ' evaluation (see :func:`find_mu_mup`).
    """
    _, mup = find_mu_mup(X, Y, bpsi, mode, arithmetic=arithmetic)
    # μ' ceiling: the 1e-6 km reflection backoff bounds the true μ' at the
    # last sample to ~3e5; in f32, 1-X underflows to 0 (μ'=inf) or to a
    # denormal (μ' = 2^31-ish) and a single such sample poisons the row by
    # thousands of km. Values beyond the ceiling are unphysical artifacts —
    # treat them like the NaN escape samples. (f64 results are unaffected.)
    # DEVIATION from the reference: the μ' ≤ 0 guard below also differs —
    # the reference nansums whatever μ' it computed, so a profile yielding
    # a (pathological) nonpositive μ' sample would diverge from bit parity
    # even in f64. A physical group index is ≥ 1; nonpositive values only
    # arise from the same rounding pathologies as the ceiling, so both
    # guards share the escape-sample treatment.
    mup = jnp.where((mup > 0.0) & (mup <= _MUP_CEILING), mup, jnp.nan)
    ih = jnp.nansum(mup * dh, axis=1)
    ih = jnp.where(ih == 0.0, jnp.nan, ih)
    return ih + alt_min


@partial(jax.jit, static_argnames=("mode_mult", "n_points", "arithmetic"))
def _forward_core(freq_mhz, den, bmag, bpsi, alt, mode_mult, n_points,
                  arithmetic="stable"):
    """Fused single-profile forward operator ([N_freq] → [N_freq])."""
    freq_hz = jnp.asarray(freq_mhz, dtype=float) * 1e6
    rg = regrid_core(freq_hz, den, bmag, bpsi, alt,
                     mode_mult=mode_mult, n_points=n_points)
    aX = find_X(rg["den"], rg["freq"])
    aY = find_Y(rg["freq"], rg["bmag"])
    mode = "O" if mode_mult > 0 else "X"
    return find_vh(aX, aY, rg["bpsi"], rg["dist"], jnp.min(alt), mode,
                   arithmetic=arithmetic)


logger = logging.getLogger("pyrayhf_tpu")

# engine='auto' resolutions already logged (one DEBUG line per choice)
_auto_logged = set()


def vertical_forward_operator(freq, den, bmag, bpsi, alt,
                              mode=None, n_points=None, arithmetic="stable",
                              config=None):
    """Reference-parity API: virtual height [km] per frequency [MHz].

    Parameters match ref library.py:459-509 (freq in MHz, den in m^-3,
    bmag in T, bpsi in deg, alt in km; mode 'O'/'X' default 'O'; n_points
    grid size default 200). Mismatched profile-array shapes are logged
    (not raised), like the reference's logger.error at ref :486-488.

    ``arithmetic="reference"`` reproduces the reference's μ' rounding
    behaviour bit-for-bit near the reflection point (the default "stable"
    path is closer to exact arithmetic there — see :func:`find_mu_mup`).
    ``config`` (an :class:`pyrayhf_tpu.config.OperatorConfig`) supplies
    mode/n_points when they are not passed explicitly.
    """
    from .config import resolve
    mode = resolve(config, "mode", mode, "O")
    n_points = resolve(config, "n_points", n_points, 200)
    import numpy as _np
    shapes = {_np.shape(a) for a in (den, bmag, bpsi, alt)}
    if len(shapes) > 1:
        logger.error(
            "Error: freq, den, bmag, bpsi, alt should have same size")
    return _forward_core(jnp.asarray(freq), jnp.asarray(den),
                         jnp.asarray(bmag), jnp.asarray(bpsi),
                         jnp.asarray(alt),
                         mode_mult=mode_multiplier(mode), n_points=n_points,
                         arithmetic=arithmetic)


@partial(jax.jit, static_argnames=("mode_mult", "n_points"))
def _forward_batch_core(freq_mhz, den, bmag, bpsi, alt, mode_mult, n_points):
    fn = partial(_forward_core, mode_mult=mode_mult, n_points=n_points)
    return jax.vmap(lambda d, b, p, a: fn(freq_mhz, d, b, p, a))(
        den, bmag, bpsi, alt)


def vertical_forward_operator_batch(freq, den, bmag, bpsi, alt,
                                    mode=None, n_points=None, config=None,
                                    engine="auto"):
    """Batched operator: profiles [B, N_alt] → ionograms [B, N_freq].

    ``alt`` may be [N_alt] (shared grid) or [B, N_alt].
    This is the unit that `pyrayhf_tpu.parallel` shards over device meshes.
    ``config``: see :func:`vertical_forward_operator`.

    ``engine`` selects the implementation:

    * ``"parity"`` — the searchsorted/gather regrid path, numerically
      closest to the reference (slow on TPU: gathers);
    * ``"pallas"`` — the fused VMEM sweep kernel (TPU only; requires a
      shared [N_alt] grid);
    * ``"pallas_gather"`` — the fastest engine: hardware per-lane gathers
      replace the segment sweep, and for O-mode the reflection-height
      solve is fused into the kernel (TPU only; additionally requires
      the shared grid to be uniformly spaced). 3.4× the sweep kernel on
      the README O-200 workload (BENCHMARKS.md round 3);
    * ``"pallas_mxu"`` — the MXU one-hot-matmul experiment (measured
      SLOWER than the sweep — kept for the roofline record, see
      BENCHMARKS.md);
    * ``"xla"`` — the gather-free segment-sweep fallback of the kernel
      (any backend; requires a shared grid);
    * ``"auto"`` (default) — on TPU: ``"pallas_gather"`` when the grid is
      shared, uniform and f32, else ``"xla"`` when shared; ``"parity"``
      otherwise. Every engine supports forward- AND reverse-mode autodiff
      (the kernels via a custom JVP through the XLA sweep), so the
      default never breaks a differentiation mode. Fast engines agree
      with parity to < 1e-6 km in f64 (same discretisation; the
      near-reflection tail uses the analytic-margin factorisation, which
      is *closer* to exact arithmetic — tests/test_pallas.py).

    Reproducibility caveat for ``"auto"``: because the selection depends
    on the backend, identical calls on different platforms take different
    numeric paths (~0.02 km f32 tail differences near reflection). The
    resolved engine is logged (DEBUG, once per distinct choice); pin
    ``engine=`` explicitly for cross-platform bit stability.
    """
    from .config import resolve
    mode = resolve(config, "mode", mode, "O")
    n_points = resolve(config, "n_points", n_points, 200)
    den = jnp.asarray(den)
    alt = jnp.asarray(alt)
    mm = mode_multiplier(mode)
    shared_grid = alt.ndim == 1
    if engine == "auto":
        on_tpu = jax.devices()[0].platform == "tpu"
        if on_tpu and shared_grid:
            from .pallas_vh import uniform_inv_dalt
            uniform = uniform_inv_dalt(alt) is not None
            # Mosaic cannot lower the f64 scalar literals that
            # jax_enable_x64 injects into the traced kernel body, so the
            # kernel route needs both f32 inputs AND x64 globally off
            f32 = (den.dtype == jnp.float32
                   and not jax.config.jax_enable_x64)
            engine = "pallas_gather" if (uniform and f32) else "xla"
        else:
            engine = "parity"
        if engine not in _auto_logged:
            _auto_logged.add(engine)
            logger.debug("engine='auto' resolved to %r (platform=%s, "
                         "shared_grid=%s)", engine,
                         jax.devices()[0].platform, shared_grid)
    if engine in ("pallas", "pallas_gather", "pallas_mxu", "xla"):
        if not shared_grid:
            raise ValueError(
                f"engine={engine!r} requires a shared 1-D altitude grid "
                "(per-profile [B, N_alt] grids need engine='parity')")
        from .pallas_vh import (ionogram_fast_xla, ionogram_pallas,
                                ionogram_pallas_gather, ionogram_pallas_mxu)
        impl = {"pallas": ionogram_pallas,
                "pallas_gather": ionogram_pallas_gather,
                "pallas_mxu": ionogram_pallas_mxu,
                "xla": ionogram_fast_xla}[engine]
        return impl(jnp.asarray(freq), den, jnp.asarray(bmag),
                    jnp.asarray(bpsi), alt, mode_mult=mm,
                    n_points=n_points)
    if engine != "parity":
        raise ValueError("engine must be 'auto', 'parity', 'pallas', "
                         "'pallas_gather', 'pallas_mxu' or 'xla'")
    if shared_grid:
        alt = jnp.broadcast_to(alt, den.shape)
    return _forward_batch_core(jnp.asarray(freq), den, jnp.asarray(bmag),
                               jnp.asarray(bpsi), alt,
                               mode_mult=mm, n_points=n_points)


@partial(jax.jit, static_argnames=("mode_mult", "n_points"))
def _phase_core(freq_mhz, den, bmag, bpsi, alt, mode_mult, n_points):
    freq_hz = jnp.asarray(freq_mhz, dtype=float) * 1e6
    rg = regrid_core(freq_hz, den, bmag, bpsi, alt,
                     mode_mult=mode_mult, n_points=n_points)
    aX = find_X(rg["den"], rg["freq"])
    aY = find_Y(rg["freq"], rg["bmag"])
    mode = "O" if mode_mult > 0 else "X"
    mu, _ = find_mu_mup(aX, aY, rg["bpsi"], mode)
    # μ → 0 at the reflection height, so the integrand is bounded (no
    # ceiling needed, unlike μ' in find_vh); NaN rows are escaped rays
    mu = jnp.where(jnp.isfinite(mu) & (mu >= 0.0), mu, jnp.nan)
    ph = jnp.nansum(mu * rg["dist"], axis=1)
    ph = jnp.where(ph == 0.0, jnp.nan, ph)
    return ph + jnp.min(alt)


def vertical_phase_operator(freq, den, bmag, bpsi, alt, mode=None,
                            n_points=None, config=None):
    """Phase height h_p(f) = alt_min + ∫ μ dh [km] per frequency [MHz].

    Companion to :func:`vertical_forward_operator` (which integrates the
    group index μ'); same regrid discretisation, arguments and NaN-escape
    semantics. Beyond the reference: since μ ≤ 1 ≤ μ', always
    h_p(f) ≤ true reflection height ≤ virtual height h'(f). The O−X phase
    difference at a common frequency feeds Faraday-rotation estimates
    (see :mod:`pyrayhf_tpu.faraday`), and ∂h_p/∂t of a time-parameterised
    profile gives the vertical-incidence Doppler shift −(f/c)·2·dh_p/dt
    via ``jax.grad``.
    """
    from .config import resolve
    mode = resolve(config, "mode", mode, "O")
    n_points = resolve(config, "n_points", n_points, 200)
    return _phase_core(jnp.asarray(freq), jnp.asarray(den),
                       jnp.asarray(bmag), jnp.asarray(bpsi),
                       jnp.asarray(alt),
                       mode_mult=mode_multiplier(mode), n_points=n_points)


@partial(jax.jit, static_argnames=("mode_mult", "n_points"))
def vh_and_mask(freq_mhz, den, bmag, bpsi, alt, mode_mult=1.0, n_points=200):
    """Gradient-safe forward operator: (vh, valid) with finite vh everywhere.

    ``vh`` equals the parity operator where ``valid``; escaped rays carry
    ``valid=False`` and vh = alt_min (a finite placeholder). ``jax.grad``
    through ``jnp.where(valid, vh, 0)`` is finite — this is the retrieval
    adjoint path (SURVEY §7 step 4).
    """
    freq_hz = jnp.asarray(freq_mhz, dtype=float) * 1e6
    # masked regrid: escaped rows resolve on a finite placeholder grid so no
    # NaN enters any jacobian (see regrid_core(masked=True))
    rg = regrid_core(freq_hz, den, bmag, bpsi, alt,
                     mode_mult=mode_mult, n_points=n_points, masked=True)
    row_ok = rg["row_ok"]
    den_m = rg["den"]
    bmag_m = rg["bmag"]
    bpsi_m = rg["bpsi"]
    dist_m = rg["dist"]
    freq_m = rg["freq"]

    aX = find_X(den_m, freq_m)
    aY = find_Y(freq_m, bmag_m)
    mode = "O" if mode_mult > 0 else "X"
    _, mup, pt_ok = find_mu_mup_masked(aX, aY, bpsi_m, mode)
    pt_ok = pt_ok & (mup > 0.0) & (mup <= _MUP_CEILING)
    contrib = jnp.where(pt_ok, mup * dist_m, 0.0)
    ih = jnp.sum(contrib, axis=1)
    valid = row_ok & (ih != 0.0)
    vh = jnp.where(valid, ih, 0.0) + jnp.min(alt)
    return vh, valid
