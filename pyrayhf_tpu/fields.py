"""2-D refractive-index fields: bilinear interpolation + gradient builders.

TPU-native replacement for the reference's SciPy ``RegularGridInterpolator``
machinery (``build_refractive_index_interpolator_{cartesian,spherical}``,
``build_mup_function``, ``n_and_grad*``; ref ``library.py:828-950, 1716-2017``).

Design: fields are precomputed jnp arrays; evaluation is a fused
searchsorted+gather bilinear interp that is jit/vmap/grad friendly and runs on
TPU. Gradient fields use second-order ``np.gradient``-equivalent finite
differences on the grid (edge_order=2), evaluated through the same bilinear
interpolant — matching the reference's construction.

Out-of-domain queries return ``fill_value`` (NaN for n, 0.0 for gradients by
default), like the reference's ``bounds_error=False`` fills.
"""


import jax.numpy as jnp

from .constants import R_E

__all__ = ["bilinear", "gradient_ord2", "grad_axis_ord2", "uniform_axis",
           "RefractiveField",
           "n_and_grad", "eval_refractive_index_and_grad", "make_n_and_grad",
           "n_and_grad_rphi",
           "build_refractive_index_interpolator_cartesian",
           "build_refractive_index_interpolator_spherical",
           "build_mup_function"]


def uniform_axis(c_np):
    """True if the CONCRETE 1-D axis ``c_np`` is uniformly spaced.

    Host-side (numpy) detection used to pick the direct
    ``floor((q - o) / d)`` cell locate over ``searchsorted``, which lowers
    to an O(log n)-depth while-structure per query on TPU and dominated
    the ray-ODE RHS cost (round-5 fan profile).

    The tolerance has two terms: a 1e-6 relative band on the mean
    spacing, plus an absolute band of 4 ulp-of-f32 at the axis' largest
    magnitude. The second term accepts linspace axes that were quantized
    to f32 upstream (x64 off — every compute array is f32 there anyway,
    so cell-locate precision is f32 regardless of which locate runs): a
    one-ulp cell-edge wobble moves a query's bin by at most one cell and
    the interpolation weight then extrapolates from the neighbour cell,
    continuous to O(ulp). Genuinely stretched grids (e.g. the reference's
    tanh-stretched altitude grid) vary their spacing by orders more and
    are never misclassified.
    """
    import numpy as _np

    c = _np.asarray(c_np, dtype=_np.float64)
    if c.ndim != 1 or c.size < 2:
        return False
    dbar = (c[-1] - c[0]) / (c.size - 1)
    # NODE deviation from the affine fit, not spacing deviation: it is
    # the node offsets that bound how far the direct locate's cell
    # assignment can drift, and spacing jitter that cancels (like
    # quantization noise) never accumulates into a misassignment.
    dev = _np.abs(c - (c[0] + dbar * _np.arange(c.size)))
    tol = max(1e-6 * abs(dbar),
              4.0 * float(_np.finfo(_np.float32).eps) * float(
                  _np.max(_np.abs(c))))
    return bool(_np.all(dev <= tol))


def grad_axis_ord2(f, c, axis):
    """np.gradient(f, c, axis=axis, edge_order=2) for any-rank ``f``.

    Non-uniform 2nd-order central differences in the interior, one-sided
    2nd-order at the edges (the reference builds its interpolated gradient
    fields the same way, ref ``library.py:1805-1812``).
    """
    f = jnp.moveaxis(f, axis, 0)
    h = jnp.diff(c)
    hs, hd = h[:-1], h[1:]
    # interior: non-uniform central differences (2nd order)
    num = (hs ** 2 * f[2:].T - (hs ** 2 - hd ** 2) * f[1:-1].T
           - hd ** 2 * f[:-2].T).T
    interior = (num.T / (hs * hd * (hs + hd))).T
    # edges: one-sided 2nd order
    h0, h1 = h[0], h[1]
    a0 = -(2 * h0 + h1) / (h0 * (h0 + h1))
    b0 = (h0 + h1) / (h0 * h1)
    c0 = -h0 / (h1 * (h0 + h1))
    first = a0 * f[0] + b0 * f[1] + c0 * f[2]
    hm1, hm2 = h[-1], h[-2]
    am = (2 * hm1 + hm2) / (hm1 * (hm1 + hm2))
    bm = -(hm1 + hm2) / (hm1 * hm2)
    cm = hm1 / (hm2 * (hm1 + hm2))
    last = am * f[-1] + bm * f[-2] + cm * f[-3]
    out = jnp.concatenate([first[None], interior, last[None]], axis=0)
    return jnp.moveaxis(out, 0, axis)


def gradient_ord2(f, z, x):
    """np.gradient(f, z, x, edge_order=2) equivalent in jnp.

    ``f``: [nz, nx]; ``z``/``x``: 1-D coords (non-uniform allowed).
    Returns (df/dz, df/dx).
    """
    return grad_axis_ord2(f, z, 0), grad_axis_ord2(f, x, 1)


def bilinear(zq, xq, z_grid, x_grid, field, fill_value=jnp.nan):
    """Bilinear interpolation of ``field[nz, nx]`` at points (zq, xq).

    Out-of-bounds → ``fill_value``. Shapes of zq/xq broadcast; output matches.
    """
    zq, xq = jnp.broadcast_arrays(jnp.asarray(zq, dtype=float),
                                  jnp.asarray(xq, dtype=float))
    nz, nx = field.shape
    iz = jnp.clip(jnp.searchsorted(z_grid, zq, side="right") - 1, 0, nz - 2)
    ix = jnp.clip(jnp.searchsorted(x_grid, xq, side="right") - 1, 0, nx - 2)
    z0 = z_grid[iz]
    z1 = z_grid[iz + 1]
    x0 = x_grid[ix]
    x1 = x_grid[ix + 1]
    tz = (zq - z0) / (z1 - z0)
    tx = (xq - x0) / (x1 - x0)
    f00 = field[iz, ix]
    f01 = field[iz, ix + 1]
    f10 = field[iz + 1, ix]
    f11 = field[iz + 1, ix + 1]
    val = ((1 - tz) * (1 - tx) * f00 + (1 - tz) * tx * f01
           + tz * (1 - tx) * f10 + tz * tx * f11)
    inb = ((zq >= z_grid[0]) & (zq <= z_grid[-1])
           & (xq >= x_grid[0]) & (xq <= x_grid[-1]))
    return jnp.where(inb, val, fill_value)


class RefractiveField:
    """Precomputed μ (or μ') field with gradients on a regular 2-D grid.

    ``geometry='cartesian'``: coords are (z [km], x [km]) and gradients are
    (∂/∂x, ∂/∂z). ``geometry='spherical'``: the (z, x) grid is mapped to
    (r = R_E + z, φ = x/R_E) and gradients are (∂/∂r, ∂/∂φ), matching the
    reference spherical builder (ref :1838-1927).

    The object is a pytree-free container of jnp arrays; its methods are pure
    and can be closed over by jitted functions.
    """

    def __init__(self, z_grid, x_grid, field, *, geometry="cartesian",
                 R_E_km=None, fill_value_n=jnp.nan, fill_value_grad=0.0):
        import numpy as _np
        # keep full-precision copies of the grids BEFORE the jnp cast: in
        # f32 sessions (x64 off) the cast quantizes linspace spacings at
        # ~1e-7 relative, which used to fail the uniform-grid detection
        # below and silently route every query through searchsorted — an
        # O(log n) while-loop per query on TPU that made the ray-ODE RHS
        # ~12× slower (round-5 fan profile: 8 searchsorted whiles at
        # ~435 µs each per RK4 step vs ~0.4 ms for ALL the gathers).
        z64 = _np.asarray(z_grid, dtype=_np.float64)
        x64 = _np.asarray(x_grid, dtype=_np.float64)
        z_grid = jnp.asarray(z_grid, dtype=float)
        x_grid = jnp.asarray(x_grid, dtype=float)
        field = jnp.asarray(field, dtype=float)
        if field.shape != (z_grid.size, x_grid.size):
            raise ValueError(
                f"field must have shape (len(z_grid)={z_grid.size}, "
                f"len(x_grid)={x_grid.size}), got {field.shape}.")
        if not (_np.all(_np.diff(z64) > 0) and _np.all(_np.diff(x64) > 0)):
            raise ValueError("grids must be strictly increasing")
        if geometry not in ("cartesian", "spherical"):
            raise ValueError("geometry must be 'cartesian' or 'spherical'")
        self.geometry = geometry
        re = R_E if R_E_km is None else R_E_km
        self.R_E_km = re
        # grid transforms and checks in NUMPY: grids must be concrete (the
        # checks above already require it) and host-side arithmetic keeps
        # the ctor usable under jit/vmap over a TRACED field (the batched
        # 2-D oblique fan) — any jnp op on the grids inside a trace would
        # produce tracers and break the uniform-spacing detection. The jnp
        # views are built once at the end, for compute only.
        if geometry == "spherical":
            c0_np = re + z64                                     # r
            c1_np = x64 / re                                     # phi
        else:
            c0_np = z64
            c1_np = x64
        self.c0 = jnp.asarray(c0_np)
        self.c1 = jnp.asarray(c1_np)
        self.field = field
        g0, g1 = gradient_ord2(field, self.c0, self.c1)
        self.grad0 = g0                  # d/dz or d/dr
        self.grad1 = g1                  # d/dx or d/dphi
        self.fill_value_n = fill_value_n
        self.fill_value_grad = fill_value_grad
        # Uniform grids (the overwhelmingly common case: linspace altitude /
        # range axes) admit direct index arithmetic — floor((q-o)/d) — in
        # place of searchsorted, which lowers to an O(log n)-depth
        # while-structure per query on TPU and dominates the ray-ODE RHS
        # cost. Detected statically at build time.
        # diffs in f64 of the ORIGINAL grids; the tolerance additionally
        # accepts grids that were quantized to f32 upstream (a one-ulp
        # cell-edge wobble moves a query's bin by at most one cell, and
        # the clipped interpolation weights keep the value continuous
        # there)
        self._uniform = bool(uniform_axis(c0_np) and uniform_axis(c1_np))
        self._o0 = float(c0_np[0])
        self._o1 = float(c1_np[0])
        self._inv_d0 = float((len(c0_np) - 1) / (c0_np[-1] - c0_np[0]))
        self._inv_d1 = float((len(c1_np) - 1) / (c1_np[-1] - c1_np[0]))
        # one stacked tensor so value_and_grad gathers all three fields per
        # corner in a single gather op
        self._stacked = jnp.stack([field, g0, g1]).reshape(3, -1)

    def _locate(self, c0q, c1q):
        """Shared cell locate: (iz, ix, tz, tx, inb) for query points."""
        c0q, c1q = jnp.broadcast_arrays(jnp.asarray(c0q, dtype=float),
                                        jnp.asarray(c1q, dtype=float))
        nz, nx = self.field.shape
        if self._uniform:
            f0 = (c0q - self._o0) * self._inv_d0
            f1 = (c1q - self._o1) * self._inv_d1
            # NaN queries: park in cell 0 (masked by inb afterwards)
            f0 = jnp.where(jnp.isnan(f0), 0.0, f0)
            f1 = jnp.where(jnp.isnan(f1), 0.0, f1)
            iz = jnp.clip(jnp.floor(f0).astype(jnp.int32), 0, nz - 2)
            ix = jnp.clip(jnp.floor(f1).astype(jnp.int32), 0, nx - 2)
            tz = f0 - iz
            tx = f1 - ix
        else:
            iz = jnp.clip(jnp.searchsorted(self.c0, c0q, side="right") - 1,
                          0, nz - 2)
            ix = jnp.clip(jnp.searchsorted(self.c1, c1q, side="right") - 1,
                          0, nx - 2)
            tz = (c0q - self.c0[iz]) / (self.c0[iz + 1] - self.c0[iz])
            tx = (c1q - self.c1[ix]) / (self.c1[ix + 1] - self.c1[ix])
        inb = ((c0q >= self.c0[0]) & (c0q <= self.c0[-1])
               & (c1q >= self.c1[0]) & (c1q <= self.c1[-1]))
        return iz, ix, tz, tx, inb

    def _corners(self, c0q, c1q):
        """Locate + one batched 4-corner index set and weight set."""
        iz, ix, tz, tx, inb = self._locate(c0q, c1q)
        nx = self.field.shape[1]
        idx = iz * nx + ix
        idxs = jnp.stack([idx, idx + 1, idx + nx, idx + nx + 1])
        w = jnp.stack([(1 - tz) * (1 - tx), (1 - tz) * tx,
                       tz * (1 - tx), tz * tx])
        return idxs, w, inb

    def value(self, c0q, c1q):
        idxs, w, inb = self._corners(c0q, c1q)
        corners = jnp.take(self.field.ravel(), idxs)     # [4, ...]
        val = jnp.sum(w * corners, axis=0)
        return jnp.where(inb, val, self.fill_value_n)

    def value_and_grad(self, c0q, c1q):
        """(n, dn/dc0, dn/dc1) at native coordinates (z,x) or (r,φ)."""
        idxs, w, inb = self._corners(c0q, c1q)
        # one gather covering all 3 fields x 4 corners
        corners = jnp.take(self._stacked, idxs, axis=1)  # [3, 4, ...]
        val = jnp.sum(w[None] * corners, axis=1)         # [3, ...]
        n = jnp.where(inb, val[0], self.fill_value_n)
        g0 = jnp.where(inb, val[1], self.fill_value_grad)
        g1 = jnp.where(inb, val[2], self.fill_value_grad)
        return n, g0, g1


def build_refractive_index_interpolator_cartesian(
        z_grid, x_grid, n_field, *, fill_value_n=jnp.nan,
        fill_value_grad=0.0, bounds_error=False, edge_order=2):
    """Return callable (x, z) → (n, ∂n/∂x, ∂n/∂z). (ref :1764-1835)

    ``bounds_error``/``edge_order`` accepted for API parity; out-of-domain
    queries always use fill values and gradients are always 2nd order.
    """
    del bounds_error, edge_order
    fld = RefractiveField(z_grid, x_grid, n_field, geometry="cartesian",
                          fill_value_n=fill_value_n,
                          fill_value_grad=fill_value_grad)

    def n_and_grad(x, z):
        n, dndz, dndx = fld.value_and_grad(z, x)
        return n, dndx, dndz

    n_and_grad.field = fld
    return n_and_grad


def build_refractive_index_interpolator_spherical(
        z_grid, x_grid, n_field, *, fill_value_n=jnp.nan,
        fill_value_grad=0.0, bounds_error=False, R_E=None, edge_order=2):
    """Return callable (φ, r) → (μ, ∂μ/∂r, ∂μ/∂φ). (ref :1838-1927)"""
    del bounds_error, edge_order
    fld = RefractiveField(z_grid, x_grid, n_field, geometry="spherical",
                          R_E_km=R_E, fill_value_n=fill_value_n,
                          fill_value_grad=fill_value_grad)

    def n_and_grad_rphi(phi, r):
        n, dndr, dndphi = fld.value_and_grad(r, phi)
        return n, dndr, dndphi

    n_and_grad_rphi.field = fld
    return n_and_grad_rphi


def build_mup_function(mup_field, x_grid, z_grid, *, geometry="cartesian",
                       R_E=None, bounds_error=False, fill_value=jnp.nan):
    """Return callable (x, z) → μ'(x, z) for group-delay integration.

    (ref :1930-2017) For spherical geometry (x, z) are converted to (φ, r)
    internally, like the reference.
    """
    del bounds_error
    fld = RefractiveField(z_grid, x_grid, mup_field, geometry=geometry,
                          R_E_km=R_E, fill_value_n=fill_value)
    re = fld.R_E_km

    if geometry == "cartesian":
        def mup_func(x, z):
            return fld.value(z, x)
    else:
        def mup_func(x, z):
            return fld.value(re + jnp.asarray(z, dtype=float),
                             jnp.asarray(x, dtype=float) / re)
    mup_func.field = fld
    return mup_func


def eval_refractive_index_and_grad(x, z, n_interp, dn_dx_interp,
                                   dn_dz_interp):
    """(x, z) → (n, ∂n/∂x, ∂n/∂z) from three interpolants (ref :883-936).

    Each interpolant may be a :class:`RefractiveField` (its value is used) or
    any callable ``f(z, x)``; inputs broadcast like the reference.
    """
    def _ev(itp, zq, xq):
        if isinstance(itp, RefractiveField):
            return itp.value(zq, xq)
        return itp(zq, xq)

    x = jnp.asarray(x, dtype=float)
    z = jnp.asarray(z, dtype=float)
    x, z = jnp.broadcast_arrays(x, z)
    return _ev(n_interp, z, x), _ev(dn_dx_interp, z, x), \
        _ev(dn_dz_interp, z, x)


def n_and_grad(x, z, n_interp, dn_dx_interp, dn_dz_interp):
    """Alias of :func:`eval_refractive_index_and_grad` (ref :828-880)."""
    return eval_refractive_index_and_grad(x, z, n_interp, dn_dx_interp,
                                          dn_dz_interp)


def make_n_and_grad(n_interp, dn_dx_interp, dn_dz_interp):
    """Bind interpolants into an (x, z) → (n, dndx, dndz) callable
    (ref :939-950)."""
    def fn(x, z):
        return eval_refractive_index_and_grad(x, z, n_interp, dn_dx_interp,
                                              dn_dz_interp)
    return fn


def n_and_grad_rphi(phi, r, n_interp, dn_dr_interp, dn_dphi_interp):
    """(φ, r) → (μ, ∂μ/∂r, ∂μ/∂φ) from three interpolants (ref :1716-1761).

    Interpolants are called with native spherical coordinates (r, φ)."""
    def _ev(itp, rq, pq):
        if isinstance(itp, RefractiveField):
            return itp.value(rq, pq)
        return itp(rq, pq)

    phi = jnp.asarray(phi, dtype=float)
    r = jnp.asarray(r, dtype=float)
    phi, r = jnp.broadcast_arrays(phi, r)
    return _ev(n_interp, r, phi), _ev(dn_dr_interp, r, phi), \
        _ev(dn_dphi_interp, r, phi)
