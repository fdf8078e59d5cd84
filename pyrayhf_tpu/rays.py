"""Ray-equation building blocks exposed as public API (inventory parity).

The reference exports its ODE right-hand sides, terminal-event functions and
Snell helpers as module-level functions (ref ``library.py:953-1093,
2020-2125``); this module provides the jnp counterparts on top of the
framework's field objects. The batched tracers in ``gradient.py``/``snell.py``
inline equivalent logic for fusion; these standalone forms are for users
composing their own integrators.
"""

import jax.numpy as jnp

__all__ = ["ray_rhs_cartesian", "rhs_spherical", "event_ground",
           "event_z_top", "event_z_bottom", "event_x_left", "event_x_right",
           "tan_from_mu_scalar", "find_turning_point"]


def ray_rhs_cartesian(s, y, n_and_grad):
    """d/ds [x, z, vx, vz] for the 2-D Cartesian ray ODE (ref :953-1006).

    dr/ds = v, dv/ds = (∇μ − (∇μ·v)v)/μ; zero derivative where μ is invalid
    (halts the ray, matching the reference's NaN policy).
    """
    x, z, vx, vz = y[0], y[1], y[2], y[3]
    n, dndx, dndz = n_and_grad(x, z)
    ok = jnp.isfinite(n) & (n > 0.0)
    n_s = jnp.where(ok, n, 1.0)
    gdv = dndx * vx + dndz * vz
    d = jnp.stack([vx, vz, (dndx - gdv * vx) / n_s,
                   (dndz - gdv * vz) / n_s])
    return jnp.where(ok, d, jnp.zeros_like(d))


def rhs_spherical(s, y, n_and_grad_rphi):
    """d/ds [r, φ, v_r, v_φ] for the spherical ray ODE (ref :2020-2125)."""
    r, phi, v_r, v_phi = y[0], y[1], y[2], y[3]
    mu, mu_r, mu_phi = n_and_grad_rphi(phi, r)
    ok = jnp.isfinite(mu) & (mu > 0.0)
    mu_s = jnp.where(ok, mu, 1.0)
    gdv = mu_r * v_r + (mu_phi / r) * v_phi
    d = jnp.stack([v_r, v_phi / r,
                   (mu_r - gdv * v_r) / mu_s + v_phi ** 2 / r,
                   ((mu_phi / r) - gdv * v_phi) / mu_s - v_r * v_phi / r])
    return jnp.where(ok, d, jnp.zeros_like(d))


def event_ground(s, y, z_ground_km=0.0):
    """Signed distance above ground (terminal when ≤ 0; ref :1009-1011)."""
    return y[1] - z_ground_km - 1e-3


def event_z_top(s, y, z_max_km):
    """Distance below the domain top (ref :1014-1016)."""
    return z_max_km - y[1]


def event_z_bottom(s, y, z_min_km):
    """Distance above the domain bottom (ref :1019-1021)."""
    return y[1] - z_min_km


def event_x_left(s, y, x_min_km):
    """Distance right of the left boundary (ref :1024-1026)."""
    return y[0] - x_min_km


def event_x_right(s, y, x_max_km):
    """Distance left of the right boundary (ref :1029-1031)."""
    return x_max_km - y[0]


def tan_from_mu_scalar(mu_val, p, eps=1e-10):
    """tanθ = p / sqrt(μ² − p²) with singularity floor (ref :1034-1062)."""
    arg = jnp.maximum(jnp.square(jnp.asarray(mu_val, dtype=float)) - p * p,
                      eps)
    return p / jnp.sqrt(arg)


def find_turning_point(z, mu, p):
    """Altitude where μ first crosses the Snell invariant p (ref :1065-1093).

    Vectorised first-crossing search + linear interpolation; NaN when no
    crossing exists. (The reference uses a Python for-loop.)
    """
    z = jnp.asarray(z, dtype=float)
    mu = jnp.asarray(mu, dtype=float)
    crossing = (mu[:-1] >= p) & (mu[1:] <= p)
    found = jnp.any(crossing)
    i = jnp.argmax(crossing)
    mu0, mu1 = mu[i], mu[i + 1]
    t = jnp.where(mu0 != mu1,
                  (mu0 - p) / jnp.where(mu0 != mu1, mu0 - mu1, 1.0), 0.0)
    z_turn = z[i] + jnp.clip(t, 0.0, 1.0) * (z[i + 1] - z[i])
    return jnp.where(found, z_turn, jnp.nan)
