"""Trapezoid quadrature (plain + cumulative) — reference
RAYS_project/math_functions_lib/quad_trapezoid_m.f90."""

import jax.numpy as jnp


def trapezoid(y, x):
    return jnp.trapezoid(y, x)


def cumulative_trapezoid(y, x, initial=0.0):
    """Cumulative integral on the same grid; result[0] = initial."""
    dx = x[1:] - x[:-1]
    incr = 0.5 * (y[1:] + y[:-1]) * dx
    return jnp.concatenate([
        jnp.asarray([initial], dtype=y.dtype),
        initial + jnp.cumsum(incr),
    ])
