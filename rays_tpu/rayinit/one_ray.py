"""Single-ray initialization from a launch point and direction.

Re-design of reference RAYS_project/RAYS_lib/one_ray_init_XYZ_k_direction_m
.f90: normalize the requested direction, find the angle to B, solve the
Appleton-Hartree form for |n|, and rescale the direction
(one_ray_init_XYZ_k_direction_m.f90:131-180).  With ``use_this_n_vec`` the
given refractive-index vector is used verbatim (no dispersion solve).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from rays_tpu.models import base
from rays_tpu.wave import dispersion


@dataclasses.dataclass(frozen=True)
class OneRayInit:
    x: float = 0.0
    y: float = 0.0
    z: float = 0.0
    nx: float = 0.0
    ny: float = 0.0
    nz: float = 0.0
    use_this_n_vec: bool = False


def one_ray_init_xyz_k_direction(cfg, params, ri: OneRayInit):
    rvec = jnp.asarray([ri.x, ri.y, ri.z], jnp.float64)
    nvec = jnp.asarray([ri.nx, ri.ny, ri.nz], jnp.float64)
    pwr = jnp.ones((1,), jnp.float64)

    if ri.use_this_n_vec:
        return rvec[None, :], nvec[None, :], pwr

    err = int(base.eq_err(cfg, params, rvec))
    if err != 0:
        raise RuntimeError(f"one_ray_init: equilibrium error code {err} at launch")

    alpha, gamma, bunit, _ = dispersion.alpha_gamma(cfg, params, rvec, params.rf.omgrf)
    nunit = nvec / jnp.sqrt(jnp.dot(nvec, nvec))
    theta = jnp.arccos(jnp.clip(jnp.dot(bunit, nunit), -1.0, 1.0))
    n, valid = dispersion.solve_n_vs_theta(alpha, gamma, cfg.wave_mode,
                                           cfg.k0_sign, theta)
    if not bool(valid):
        raise RuntimeError("one_ray_init: evanescent — no successful ray "
                           "initializations")
    rindex = n * nunit
    return rvec[None, :], np.asarray(rindex)[None, :] * jnp.ones((1, 1)), pwr
