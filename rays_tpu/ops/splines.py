"""Differentiable uniform-grid cubic splines (1-D and 2-D tensor product).

TPU-native replacement for the reference's pspline extraction
(reference RAYS_project/splines_lib/quick_cube_splines_m.f90): uniform
grid, not-a-knot boundary conditions (the reference's fixed choice,
quick_cube_splines_m.f90:88-93), C2 continuity.

Design: the second-derivative (M) arrays are precomputed at build time by a
dense linear solve M = T @ f (T = A^{-1} B for the not-a-knot tridiagonal
system) — an O(n^2) one-time cost that makes evaluation a pure
4-point-gather + cubic polynomial, branch-free and trivially vmappable.
Because M is LINEAR in the knot values, gradients w.r.t. the knot values
(spline-parameter adjoints, e.g. fitting ne(psi) profiles) flow exactly
through both build and eval.  2-D evaluation composes the same 1-D formula
along each axis from four precomputed grids (F, Mx, My, Mxy) — 16 gathers
per point.

Evaluation derivatives come from the closed-form polynomial (and from AD,
which agrees exactly since the whole thing is polynomial in x).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
import numpy as np


class Spline1D(NamedTuple):
    x0: Any   # grid origin
    dx: Any   # grid spacing
    f: Any    # (n,) knot values
    m: Any    # (n,) second derivatives at knots


class Spline2D(NamedTuple):
    x0: Any
    dx: Any
    y0: Any
    dy: Any
    f: Any     # (nx, ny)
    mx: Any    # d2/dx2
    my: Any    # d2/dy2
    mxy: Any   # d4/dx2dy2


def _second_deriv_matrix(n: int, h: float) -> np.ndarray:
    """T with M = T @ f for the uniform-grid not-a-knot cubic spline.

    Interior: M[i-1] + 4 M[i] + M[i+1] = 6 (f[i-1] - 2 f[i] + f[i+1]) / h^2.
    Not-a-knot (third derivative continuous at x1, x_{n-2}):
    M0 - 2 M1 + M2 = 0 and M_{n-3} - 2 M_{n-2} + M_{n-1} = 0.
    """
    if n < 4:
        raise ValueError("cubic spline needs at least 4 points")
    A = np.zeros((n, n))
    B = np.zeros((n, n))
    for i in range(1, n - 1):
        A[i, i - 1] = 1.0
        A[i, i] = 4.0
        A[i, i + 1] = 1.0
        B[i, i - 1] = 6.0 / h**2
        B[i, i] = -12.0 / h**2
        B[i, i + 1] = 6.0 / h**2
    A[0, 0], A[0, 1], A[0, 2] = 1.0, -2.0, 1.0
    A[n - 1, n - 3], A[n - 1, n - 2], A[n - 1, n - 1] = 1.0, -2.0, 1.0
    return np.linalg.solve(A, B)


def build_spline_1d(x0, dx, f) -> Spline1D:
    """Build from knot values.  T is computed in numpy (host, exact f64) but
    applied to ``f`` with jnp so knot-value gradients flow."""
    n = int(np.shape(f)[-1])
    T = jnp.asarray(_second_deriv_matrix(n, float(dx)))
    f = jnp.asarray(f)
    return Spline1D(x0=jnp.asarray(x0), dx=jnp.asarray(dx), f=f, m=f @ T.T)


def _local(fi, fi1, mi, mi1, u, h):
    """1-D cubic segment value from endpoint values/second derivs."""
    w = 1.0 - u
    return (fi * w + fi1 * u
            + (h * h / 6.0) * ((w**3 - w) * mi + (u**3 - u) * mi1))


def _local_du(fi, fi1, mi, mi1, u, h):
    w = 1.0 - u
    return (fi1 - fi
            + (h * h / 6.0) * ((-3.0 * w**2 + 1.0) * mi + (3.0 * u**2 - 1.0) * mi1))


def _cell(sp_x0, sp_dx, n, x):
    t = (x - sp_x0) / sp_dx
    i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2)
    return i, t - i.astype(t.dtype)


def eval_1d(sp: Spline1D, x):
    """Spline value at x (clamped-cell extrapolation outside the grid,
    matching pspline's behavior of evaluating the edge polynomial)."""
    n = sp.f.shape[-1]
    i, u = _cell(sp.x0, sp.dx, n, x)
    return _local(sp.f[i], sp.f[i + 1], sp.m[i], sp.m[i + 1], u, sp.dx)


def eval_1d_fp(sp: Spline1D, x):
    """(f, df/dx)."""
    n = sp.f.shape[-1]
    i, u = _cell(sp.x0, sp.dx, n, x)
    f = _local(sp.f[i], sp.f[i + 1], sp.m[i], sp.m[i + 1], u, sp.dx)
    fp = _local_du(sp.f[i], sp.f[i + 1], sp.m[i], sp.m[i + 1], u, sp.dx) / sp.dx
    return f, fp


def build_spline_2d(x0, dx, y0, dy, f) -> Spline2D:
    """f: (nx, ny) knot values; spline-of-splines tensor product."""
    f = jnp.asarray(f)
    nx, ny = int(f.shape[0]), int(f.shape[1])
    Tx = jnp.asarray(_second_deriv_matrix(nx, float(dx)))
    Ty = jnp.asarray(_second_deriv_matrix(ny, float(dy)))
    mx = Tx @ f          # d2f/dx2 at knots
    my = f @ Ty.T        # d2f/dy2 at knots
    mxy = Tx @ my        # d4f/dx2dy2
    return Spline2D(x0=jnp.asarray(x0), dx=jnp.asarray(dx),
                    y0=jnp.asarray(y0), dy=jnp.asarray(dy),
                    f=f, mx=mx, my=my, mxy=mxy)


def _gather4(a, i, j):
    return (a[i, j], a[i, j + 1], a[i + 1, j], a[i + 1, j + 1])


def eval_2d(sp: Spline2D, x, y):
    """Bicubic spline value at (x, y): apply the 1-D formula in y to
    (F, My) and (Mx, Mxy), then in x to the results."""
    nx, ny = sp.f.shape
    i, u = _cell(sp.x0, sp.dx, nx, x)
    j, v = _cell(sp.y0, sp.dy, ny, y)

    f00, f01, f10, f11 = _gather4(sp.f, i, j)
    my00, my01, my10, my11 = _gather4(sp.my, i, j)
    mx00, mx01, mx10, mx11 = _gather4(sp.mx, i, j)
    mxy00, mxy01, mxy10, mxy11 = _gather4(sp.mxy, i, j)

    g0 = _local(f00, f01, my00, my01, v, sp.dy)     # f(x_i, y)
    g1 = _local(f10, f11, my10, my11, v, sp.dy)     # f(x_{i+1}, y)
    h0 = _local(mx00, mx01, mxy00, mxy01, v, sp.dy) # fxx(x_i, y)
    h1 = _local(mx10, mx11, mxy10, mxy11, v, sp.dy)
    return _local(g0, g1, h0, h1, u, sp.dx)


def eval_2d_fp(sp: Spline2D, x, y):
    """(f, df/dx, df/dy)."""
    nx, ny = sp.f.shape
    i, u = _cell(sp.x0, sp.dx, nx, x)
    j, v = _cell(sp.y0, sp.dy, ny, y)

    f00, f01, f10, f11 = _gather4(sp.f, i, j)
    my00, my01, my10, my11 = _gather4(sp.my, i, j)
    mx00, mx01, mx10, mx11 = _gather4(sp.mx, i, j)
    mxy00, mxy01, mxy10, mxy11 = _gather4(sp.mxy, i, j)

    g0 = _local(f00, f01, my00, my01, v, sp.dy)
    g1 = _local(f10, f11, my10, my11, v, sp.dy)
    h0 = _local(mx00, mx01, mxy00, mxy01, v, sp.dy)
    h1 = _local(mx10, mx11, mxy10, mxy11, v, sp.dy)
    f = _local(g0, g1, h0, h1, u, sp.dx)
    fx = _local_du(g0, g1, h0, h1, u, sp.dx) / sp.dx

    g0v = _local_du(f00, f01, my00, my01, v, sp.dy) / sp.dy
    g1v = _local_du(f10, f11, my10, my11, v, sp.dy) / sp.dy
    h0v = _local_du(mx00, mx01, mxy00, mxy01, v, sp.dy) / sp.dy
    h1v = _local_du(mx10, mx11, mxy10, mxy11, v, sp.dy) / sp.dy
    fy = _local(g0v, g1v, h0v, h1v, u, sp.dx)
    return f, fx, fy
