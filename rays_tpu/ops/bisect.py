"""Bisection solve of f(x) = y on [xmin, xmax] — reference
RAYS_project/math_functions_lib/bisect_m.f90.

Fixed-iteration bisection (60 halvings reach ~1e-18 relative width): a
branch-free ``fori_loop`` instead of the reference's tolerance-driven while
loop, so it vmaps/jits cleanly.  Used for plasma-boundary finding and
rho <-> psi inversion in post-processing.
"""

import jax
import jax.numpy as jnp


def solve_bisection(f, y, xmin, xmax, iters: int = 60):
    """Returns (x, ok): ok False if f(xmin)-y and f(xmax)-y have the same
    sign (no bracketing)."""
    fa = f(xmin) - y
    fb = f(xmax) - y
    ok = fa * fb <= 0.0

    def body(_, ab):
        a, b = ab
        m = 0.5 * (a + b)
        fm = f(m) - y
        go_left = (f(a) - y) * fm <= 0.0
        return jnp.where(go_left, a, m), jnp.where(go_left, m, b)

    a, b = jax.lax.fori_loop(0, iters, body, (jnp.asarray(xmin), jnp.asarray(xmax)))
    return 0.5 * (a + b), ok
