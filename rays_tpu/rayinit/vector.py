"""Initial ODE vectors from launch positions and refractive indices.

Mirrors reference RAYS_project/RAYS_lib/initialize_ode_vector.f90:23-54:
v[0:3] = x0, v[3:6] = k0*n0, v[6] = 0, damping slots zeroed, and — when
gradient-consistency diagnostics are on — the trailing slots seeded with the
local B, ne, Te so the integrated gradients can be compared pointwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rays_tpu.models import base


def initial_ode_vectors(cfg, params, rvec0, rindex_vec0):
    """(B,3),(B,3) -> (B, nv)."""
    B = rvec0.shape[0]
    dt = rvec0.dtype
    v0 = jnp.zeros((B, cfg.nv), dtype=dt)
    v0 = v0.at[:, 0:3].set(rvec0)
    v0 = v0.at[:, 3:6].set(params.rf.k0 * rindex_vec0)
    if cfg.integrate_eq_gradients:
        g = cfg.grad_diag_slot
        eqs = jax.vmap(lambda x: base.equilibrium(cfg, params, x))(rvec0)
        v0 = v0.at[:, g:g + 3].set(eqs.bvec)
        v0 = v0.at[:, g + 3].set(eqs.ns[:, 0])
        v0 = v0.at[:, g + 4].set(eqs.ts[:, 0])
    return v0
