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


def _tunnel_alive(timeout_s=150):
    """Probe the accelerator in a SUBPROCESS with a timeout.

    The axon TPU tunnel occasionally dies in a way that makes
    jax.devices() hang forever (not error); probing in-process would
    hang the whole bench. A dead probe → fall back to host CPU so the
    driver still records a JSON line.
    """
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s)
        return r.returncode == 0 and "tpu" in r.stdout
    except Exception:
        # TimeoutExpired, spawn failures, anything — the watchdog's one
        # job is to guarantee a JSON line, so fall back to CPU
        return False


def main():
    import jax
    if not _tunnel_alive():
        log("accelerator probe dead/hung -> forcing host-CPU fallback")
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from functools import partial

    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")
    on_tpu = dev.platform == "tpu"

    from pyrayhf_tpu.forward import _forward_batch_core
    from pyrayhf_tpu.pallas_vh import (ionogram_fast_xla, ionogram_pallas,
                                       ionogram_pallas_gather)

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
        # headline: the dynamic-gather kernel with in-kernel O-mode
        # reflection solve (round 3); sweep kernel timed as diagnostic
        fn = partial(ionogram_pallas_gather, mode_mult=1.0, n_points=200)
        fn_sweep = partial(ionogram_pallas, mode_mult=1.0, n_points=200)
        args = (jnp.asarray(freqs, dtype), jnp.asarray(den, dtype),
                jnp.asarray(bmag, dtype), jnp.asarray(bpsi, dtype),
                jnp.asarray(alt, dtype))
    else:
        fn = jax.jit(partial(_forward_batch_core, mode_mult=1.0,
                             n_points=200))
        fn_sweep = None
        args = tuple(jnp.asarray(a, dtype=dtype)
                     for a in (freqs, den, bmag, bpsi, alt_b))

    for _ in range(3):                    # warmup: first launches pay tunnel/
        out = fn(*args)                   # allocator transients (~2 ms extra
    _ = np.asarray(jnp.ravel(out)[0])     # per launch on the first rep);
    iters = 10                            # np.asarray forces full execution
    dt = np.inf                           # (the tunnel's block_until_ready is
    for _rep in range(3):                 # lazy). Best-of-3 timing loops
        t0 = time.perf_counter()          # estimates the noise floor.
        for _ in range(iters):
            out = fn(*args)
        _ = np.asarray(jnp.ravel(out)[0])
        dt_rep = (time.perf_counter() - t0) / iters
        log(f"  timing rep: {dt_rep*1e3:.2f} ms/launch")
        dt = min(dt, dt_rep)
    evals_per_sec = B * F / dt
    log(f"O-mode 200pt gather kernel: B={B} F={F} time/launch={dt*1e3:.2f} ms"
        f" -> {evals_per_sec:.3e} vh evals/s")
    if fn_sweep is not None:
        out = fn_sweep(*args)
        _ = np.asarray(jnp.ravel(out)[0])
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn_sweep(*args)
        _ = np.asarray(jnp.ravel(out)[0])
        dts = (time.perf_counter() - t0) / 5
        log(f"  (sweep kernel diagnostic: {dts*1e3:.2f} ms/launch = "
            f"{B*F/dts:.3e} evals/s)")

    if on_tpu and day is not None:
        # X-mode 20k-point stretched grid, batched (the README's heavy
        # config; per-chunk sweep bounds make the dense near-reflection
        # chunks nearly free)
        Bx = 32
        argsx32 = (jnp.asarray(freqs, dtype),
                   jnp.asarray(np.broadcast_to(day["den"],
                                               (Bx, alt.size)), dtype),
                   jnp.asarray(np.broadcast_to(day["bmag"],
                                               (Bx, alt.size)), dtype),
                   jnp.asarray(np.broadcast_to(day["bpsi"],
                                               (Bx, alt.size)), dtype),
                   jnp.asarray(alt, dtype))
        fnx = partial(ionogram_pallas, mode_mult=-1.0, n_points=20000)
        out = fnx(*argsx32)
        _ = np.asarray(jnp.ravel(out)[0])
        t0 = time.perf_counter()
        for _ in range(5):
            out = fnx(*argsx32)
        _ = np.asarray(jnp.ravel(out)[0])
        dtx = (time.perf_counter() - t0) / 5
        log(f"X-mode 20000pt fused kernel (f32): B={Bx} F={F} "
            f"time/launch={dtx*1e3:.2f} ms -> {dtx/Bx*1e3:.2f} ms/profile"
            f" ({Bx*F/dtx:.3e} vh evals/s)")

    if on_tpu:
        # round-5 diagnostic: the VMEM-resident Pallas ray-fan kernel
        # (pallas_ray.py) on the typical oblique-sounding scene — the
        # tier that ran at ~550-1,350 rays/s through round 4
        try:
            from pyrayhf_tpu.oblique import _fan_2d_fn
            Ff, Ef, NS = 64, 128, 2000
            zf = np.linspace(0.0, 638.75, 512)
            xf = np.linspace(0.0, 3995.0, 32)
            hh = (zf[:, None] - 250.0) / 45.0
            nef = (8.0e11 * (1.0 + 0.15 * (xf[None, :] / xf[-1] - 0.5))
                   * np.exp(0.5 * (1.0 - hh - np.exp(-hh))))
            fan = _fan_2d_fn(zf, xf, "O", "cartesian", Ef, NS, 1,
                             engine="pallas")
            fargs = (jnp.asarray(np.linspace(4e6, 30e6, Ff)),
                     jnp.asarray([5.0, 85.0]),
                     jnp.asarray(nef, jnp.float32),
                     jnp.asarray(np.full(nef.shape, 4.5e-5), jnp.float32),
                     jnp.asarray(np.full(nef.shape, 0.5), jnp.float32),
                     jnp.asarray(1e7 * np.exp(-(zf - 70.0) / 8.0),
                                 jnp.float32),
                     jnp.asarray(2.0, jnp.float32))
            fout = fan(*fargs)
            _ = np.asarray(jnp.ravel(fout[0])[0])
            t0 = time.perf_counter()
            for _ in range(3):
                fout = fan(*fargs)
            _ = np.asarray(jnp.ravel(fout[0])[0])
            dtf = (time.perf_counter() - t0) / 3
            log(f"  (ray-fan kernel diagnostic: [{Ff}x{Ef}x{NS}] fan in "
                f"{dtf*1e3:.1f} ms = {Ff*Ef/dtf:,.0f} rays/s)")
        except Exception as e:                      # never sink the bench
            log(f"  (ray-fan kernel diagnostic failed: {e!r})")

    # ---- accuracy: on-device parity table vs f64 reference goldens ----
    # Day+Night × O+X × {200, 20k} × {pallas, fast_xla} in the fast dtype
    # (f32), plus the BASELINE f64 X-20k pin. On real TPU this validates
    # the Mosaic-compiled kernel (X-mode, Night profile, p_chunk
    # revisiting) — interpret-mode CPU coverage lives in tests/.
    acc_line = ""
    if gold_path.exists() and day is not None:
        night = None
        if (ref_dir / "Example_Input_Night.p").exists():
            night = pickle.load(
                open(ref_dir / "Example_Input_Night.p", "rb"))
        g = np.load(gold_path)
        freqs_g = g["vfo_freqs"]

        def run_case(prof, mode_mult, npts, impl, dt):
            args = tuple(jnp.asarray(a, dt) for a in
                         (freqs_g, prof["den"][None, :],
                          prof["bmag"][None, :], prof["bpsi"][None, :],
                          prof["alt"]))
            return np.asarray(impl(*args, mode_mult=mode_mult,
                                   n_points=npts))[0]

        def max_dvh(vh, ref):
            m = np.isfinite(ref) & np.isfinite(vh)
            return (float(np.abs(vh[m] - ref[m]).max()) if m.any()
                    else np.inf), int(m.sum())

        dvh_f32_x20k = np.inf
        if on_tpu:
            log("on-device f32 parity vs f64 oracle goldens "
                "(budget: 0.1 km):")
            for pname, prof in [("day", day)] + (
                    [("night", night)] if night is not None else []):
                for mode, mm in (("O", 1.0), ("X", -1.0)):
                    for npts in (200, 20000):
                        key = f"vfo_{pname}_{mode}_{npts}"
                        if key not in g.files:
                            continue
                        row = []
                        for iname, impl in (("gather",
                                             ionogram_pallas_gather),
                                            ("pallas", ionogram_pallas),
                                            ("fast_xla",
                                             ionogram_fast_xla)):
                            vh = run_case(prof, mm, npts, impl,
                                          jnp.float32)
                            d, n = max_dvh(vh, g[key])
                            row.append(f"{iname} {d:.6f} km/{n}f")
                            if (pname, mode, npts,
                                    iname) == ("day", "X", 20000,
                                               "pallas"):
                                dvh_f32_x20k = d
                        log(f"  {key:22s}: " + "  ".join(row))

        # BASELINE accuracy pin: X-mode, 20k-point stretched grid, f64
        # (f64 is emulated on TPU but this workload is bandwidth-bound, so
        # it costs almost nothing and lands machine-exact vs the oracle)
        jax.config.update("jax_enable_x64", True)
        argsx = tuple(jnp.asarray(a, jnp.float64)
                      for a in (freqs_g, day["den"][None, :],
                                day["bmag"][None, :], day["bpsi"][None, :],
                                day["alt"]))
        vhx = np.asarray(ionogram_fast_xla(*argsx, mode_mult=-1.0,
                                           n_points=20000))[0]
        dvh, nfin = max_dvh(vhx, g["vfo_day_X_20000"])
        log(f"X-mode 20k accuracy (float64): max|dvh| = {dvh:.6f} km"
            f" over {nfin} freqs (budget 0.1 km)")
        acc_line = f"; X-20k max|dvh|={dvh:.6f} km (f64)"
        if np.isfinite(dvh_f32_x20k):
            acc_line += f", {dvh_f32_x20k:.6f} km (f32 pallas)"

    if not on_tpu:
        # the number is a HOST-CPU measurement, not a chip regression —
        # either this container has no TPU or the tunnel was unresponsive
        # (see _tunnel_alive); the last on-chip record is BENCHMARKS.md
        acc_line += "; HOST-CPU FALLBACK (no responsive TPU), not a chip rate"
    # record the timed dtype: the TPU headline runs f32, the CPU fallback
    # f64 — the two populations are not comparable without this label
    timed_dtype = np.dtype(dtype).name
    print(json.dumps({
        "metric": "vh_evals_per_sec_per_chip",
        "value": float(evals_per_sec),
        "unit": f"(freq,profile) virtual-height evals/s [{timed_dtype}, "
                f"platform={dev.platform}]" + acc_line,
        "vs_baseline": float(evals_per_sec / 1e6),
    }))


if __name__ == "__main__":
    main()
