"""Monotonic function inversion y(x) -> x(y) — reference
RAYS_project/math_functions_lib/monotonic_function_inversion.f90.

Given samples (x, y) with y monotonic, returns x values on a uniform y
grid by monotone interpolation (jnp.interp; handles both orientations).
"""

import jax.numpy as jnp


def invert_monotonic(x, y, n_out: int = None, y_out=None):
    if y_out is None:
        n_out = n_out or x.shape[-1]
        y_out = jnp.linspace(y[0], y[-1], n_out)
    increasing = y[-1] >= y[0]
    ys = jnp.where(increasing, y, -y)
    yq = jnp.where(increasing, y_out, -y_out)
    return y_out, jnp.interp(yq, ys, x)
