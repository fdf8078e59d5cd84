"""Profiling & observability utilities (SURVEY §5 'Tracing/profiling').

The reference has no built-in instrumentation beyond notebook
``perf_counter`` cells and a mutable RHS-eval counter (ref
``library.py:996, 1367``). Here:

* :func:`time_launch` — steady-state wall time of a jitted function with
  the tunnel-safe synchronisation discovered in DEVNOTES (a tiny host fetch;
  ``block_until_ready`` is lazy on relayed TPU backends);
* :func:`operator_cost` — analytic flop/byte model of the forward operator
  (for roofline sanity checks);
* :func:`trace` — thin wrapper over ``jax.profiler.trace`` for capturing
  device traces into TensorBoard format.
"""

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["time_launch", "operator_cost", "trace"]


def time_launch(fn, *args, iters=10, warmup=1):
    """Mean steady-state seconds per launch of ``fn(*args)``.

    Forces completion with a single tiny host transfer after the pipelined
    launches (correct even on relayed backends where block_until_ready
    returns early).
    """
    for _ in range(warmup):
        out = fn(*args)
    _ = np.asarray(jnp.ravel(jax.tree.leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jnp.ravel(jax.tree.leaves(out)[0])[0])
    return (time.perf_counter() - t0) / iters


def operator_cost(B, F, n_points, n_alt, flops_per_point=70):
    """Analytic cost model of the fused ionogram operator.

    Returns a dict with flops, sweep element-visits, and minimal HBM bytes —
    the roofline inputs for one [B, F, n_points] launch over [B, n_alt]
    profiles.
    """
    points = B * F * n_points
    return {
        "ah_flops": points * flops_per_point,
        "sweep_visits": points * n_alt,
        "hbm_bytes_min": 4 * (B * n_alt * 8 + B * F * 2),
        "points": points,
    }


@contextlib.contextmanager
def trace(log_dir="/tmp/pyrayhf_trace"):
    """Capture a jax.profiler device trace (view with TensorBoard)."""
    with jax.profiler.trace(log_dir):
        yield log_dir
