"""Shared 1-D profile shapes, NaN-safe and differentiable.

Mirrors the reference profile helpers (parabolic: reference
RAYS_project/RAYS_lib/slab_eq_m.f90:354-381; solovev parabolic-in-psiN:
solovev_eq_m.f90:214-225).  All branches are computed with clipped
arguments and combined with ``jnp.where`` so no NaN can leak into either
branch of the select (standard JAX double-where discipline); everything here
is safe to differentiate.
"""

import jax.numpy as jnp

from rays_tpu import constants


def parabolic(rho, f_min, alpha1, alpha2):
    """(1 - rho^alpha2)^alpha1 clipped below at f_min, 0 outside rho>=1.

    Returns (f, df/drho).  The reference evaluates rho**alpha2 with a real
    exponent; we use |rho| as the base (the physical intent — rho is a
    normalized radius) so negative arguments don't NaN.
    """
    r = jnp.abs(rho)
    tiny = constants.SAFE_TINY
    r_safe = jnp.clip(r, tiny, 1.0)
    ra2 = r_safe**alpha2
    base = jnp.clip(1.0 - ra2, tiny, None)
    f_in = base**alpha1
    fp_in = -alpha1 * alpha2 * r_safe ** (alpha2 - 1.0) * base ** (alpha1 - 1.0)
    fp_in = jnp.sign(rho) * fp_in  # chain rule through |rho|

    inside = r < 1.0
    f = jnp.where(inside, f_in, 0.0)
    fp = jnp.where(inside, fp_in, 0.0)

    clipped = f < f_min
    f = jnp.where(clipped, f_min, f)
    fp = jnp.where(clipped, 0.0, fp)
    return f, fp


def parabolic_psi(psiN, alpha1, alpha2):
    """Parabolic-in-psiN profile used by the toroidal equilibria:
    f = (1 - psiN^alpha2)^alpha1 for psiN < 1 else 0, plus df/dpsiN
    (reference solovev_eq_m.f90:218-225)."""
    tiny = constants.SAFE_TINY
    p = jnp.clip(psiN, tiny, 1.0)
    pa2 = p**alpha2
    base = jnp.clip(1.0 - pa2, tiny, None)
    f_in = base**alpha1
    dd = -alpha1 * alpha2 * p ** (alpha2 - 1.0) * base ** (alpha1 - 1.0)
    inside = psiN < 1.0
    return jnp.where(inside, f_in, 0.0), jnp.where(inside, dd, 0.0)
