"""3-vector helpers — reference RAYS_project/math_functions_lib/vectors3_m.f90."""

import jax.numpy as jnp


def cross(a, b):
    return jnp.cross(a, b)


def triple_product(a, b, c):
    return jnp.dot(a, jnp.cross(b, c))


def unit(a, eps=1e-30):
    return a / jnp.maximum(jnp.sqrt(jnp.sum(a**2)), eps)
