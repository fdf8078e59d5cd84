"""1-D linear interpolation with np.interp-exact node semantics.

``jnp.interp`` evaluates ``fp[i] + t·(fp[i+1]-fp[i])`` even at t == 0, so a
query landing exactly on a grid node adjacent to a NaN neighbour returns NaN
(0·NaN). ``np.interp`` short-circuits exact hits and returns ``fp[i]``. The
reference's tracers lean on that behaviour (path nodes land exactly on
profile altitudes while μ' carries NaN evanescent gaps, ref
``library.py:1244, 1686``), so we provide a branch-free variant that matches.
"""

import jax.numpy as jnp

__all__ = ["interp_exact"]


def interp_exact(x, xp, fp):
    """np.interp-compatible linear interpolation (exact-node hits, edge clamp).

    ``x``: any shape; ``xp`` ascending 1-D; ``fp`` 1-D same length.
    NaN queries return NaN.
    """
    x = jnp.asarray(x, dtype=float)
    n = xp.shape[0]
    i = jnp.clip(jnp.searchsorted(xp, x, side="right") - 1, 0, n - 2)
    x0 = xp[i]
    x1 = xp[i + 1]
    f0 = fp[i]
    f1 = fp[i + 1]
    dx = x1 - x0
    t = (x - x0) / jnp.where(dx != 0.0, dx, 1.0)
    y = f0 + t * (f1 - f0)
    y = jnp.where(x == x1, f1, y)
    y = jnp.where(x == x0, f0, y)
    y = jnp.where(x <= xp[0], fp[0], y)
    y = jnp.where(x >= xp[-1], fp[-1], y)
    y = jnp.where(jnp.isnan(x), jnp.nan, y)
    return y
