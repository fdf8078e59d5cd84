#!/usr/bin/env python
"""Benchmark: virtual-height evaluations/sec on one TPU chip.

Headline metric (BASELINE.json): (frequency, profile) virtual-height
evaluations per second for full ionogram synthesis, target >= 1e6/s/chip,
with max |Δvh| < 0.1 km vs the reference X-mode 20k-point run.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from functools import partial

    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")
    on_tpu = dev.platform == "tpu"

    from pyrayhf_tpu.forward import _forward_batch_core, _forward_core
    from pyrayhf_tpu.pallas_vh import ionogram_fast_xla, ionogram_pallas

    # ---- workload: README O-mode config batched over a profile stack ----
    # 175 freqs x n_points=200, B profiles (global-grid synthesis slice)
    import pickle
    import pathlib
    ref_dir = pathlib.Path("/root/reference/docs/tutorials")
    gold_path = pathlib.Path(__file__).parent / "tests/goldens/reference_goldens.npz"
    day = None
    if (ref_dir / "Example_Input_Day.p").exists():
        day = pickle.load(open(ref_dir / "Example_Input_Day.p", "rb"))

    dtype = jnp.float32 if on_tpu else jnp.float64
    B = 1024
    F = 175
    freqs = np.arange(0.1, 17.6, 0.1)[:F]
    if day is not None:
        alt = day["alt"]
        base = day["den"]
        bmag0 = day["bmag"]
        bpsi0 = day["bpsi"]
    else:
        alt = np.linspace(80.0, 699.0, 620)
        base = 2e12 * np.exp(-(alt - 330.0) ** 2 / (2 * 60.0 ** 2))
        bmag0 = np.full_like(alt, 3e-5)
        bpsi0 = np.full_like(alt, 70.0)
    scale = np.linspace(0.7, 1.3, B)
    den = scale[:, None] * base[None, :]
    bmag = np.broadcast_to(bmag0, (B, alt.size))
    bpsi = np.broadcast_to(bpsi0, (B, alt.size))
    alt_b = np.broadcast_to(alt, (B, alt.size))

    if on_tpu:
        fn = partial(ionogram_pallas, mode_mult=1.0, n_points=200)
        args = (jnp.asarray(freqs, dtype), jnp.asarray(den, dtype),
                jnp.asarray(bmag, dtype), jnp.asarray(bpsi, dtype),
                jnp.asarray(alt, dtype))
    else:
        fn = jax.jit(partial(_forward_batch_core, mode_mult=1.0,
                             n_points=200))
        args = tuple(jnp.asarray(a, dtype=dtype)
                     for a in (freqs, den, bmag, bpsi, alt_b))

    out = fn(*args)
    _ = np.asarray(jnp.ravel(out)[0])     # force full execution (the axon
    iters = 10                            # tunnel's block_until_ready is lazy)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jnp.ravel(out)[0])
    dt = (time.perf_counter() - t0) / iters
    evals_per_sec = B * F / dt
    log(f"O-mode 200pt fused kernel: B={B} F={F} time/launch={dt*1e3:.2f} ms"
        f" -> {evals_per_sec:.3e} vh evals/s")

    # ---- accuracy: X-mode 20k-point run vs f64 reference goldens ----
    acc_line = ""
    if gold_path.exists() and day is not None:
        # BASELINE accuracy pin: X-mode, 20k-point stretched grid, f64
        # (f64 is emulated on TPU but this workload is bandwidth-bound, so
        # it costs almost nothing and lands machine-exact vs the oracle)
        jax.config.update("jax_enable_x64", True)
        g = np.load(gold_path)
        argsx = tuple(jnp.asarray(a, jnp.float64)
                      for a in (g["vfo_freqs"], day["den"][None, :],
                                day["bmag"][None, :], day["bpsi"][None, :]))
        argsx = argsx[:1] + tuple(a for a in argsx[1:]) + (
            jnp.asarray(day["alt"], jnp.float64),)
        vhx = np.asarray(ionogram_fast_xla(*argsx, mode_mult=-1.0,
                                           n_points=20000))[0]
        ref = g["vfo_day_X_20000"]
        m = np.isfinite(ref) & np.isfinite(vhx)
        dvh = float(np.abs(vhx[m] - ref[m]).max()) if m.any() else np.inf
        log(f"X-mode 20k accuracy (float64): max|dvh| = {dvh:.6f} km"
            f" over {m.sum()} freqs (budget 0.1 km)")
        acc_line = f"; X-20k max|dvh|={dvh:.6f} km"

    print(json.dumps({
        "metric": "vh_evals_per_sec_per_chip",
        "value": float(evals_per_sec),
        "unit": "(freq,profile) virtual-height evals/s" + acc_line,
        "vs_baseline": float(evals_per_sec / 1e6),
    }))


if __name__ == "__main__":
    main()
