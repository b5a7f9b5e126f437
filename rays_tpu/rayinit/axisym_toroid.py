"""Axisymmetric-toroid ray initialization from (R, Z) launch points.

Re-design of reference RAYS_project/RAYS_lib/
axisym_toroid_ray_init_R_Z_nphi_ntheta_m.f90: same flux-surface frame and
inward-psi dispersion solve as the Solovev initializer, but launch points
given directly as (R, Z) lists against the generic axisym_toroid psi.
Note the reference supports only single R_launch0/Z_launch0 values despite
n_R_launch/n_Z_launch counts ("For now there is only one launch position",
ibid.:9); we launch the full grid when counts > 1 using dR/dZ = 0 so single
points behave identically.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rays_tpu.models import axisym_toroid as at_mod
from rays_tpu.models import base
from rays_tpu.wave import dispersion


@dataclasses.dataclass(frozen=True)
class AxisymToroidInit:
    n_r_launch: int = 1
    r_launch0: float = 0.0
    dr_launch: float = 0.0
    n_z_launch: int = 1
    z_launch0: float = 0.0
    dz_launch: float = 0.0
    n_rindex_theta: int = 1
    rindex_theta0: float = 0.0
    delta_rindex_theta: float = 0.0
    n_rindex_phi: int = 1
    rindex_phi0: float = 0.0
    delta_rindex_phi: float = 0.0


def axisym_toroid_ray_init(cfg, params, ri: AxisymToroidInit):
    rs = ri.r_launch0 + ri.dr_launch * np.arange(ri.n_r_launch)
    zs = ri.z_launch0 + ri.dz_launch * np.arange(ri.n_z_launch)
    nthetas = ri.rindex_theta0 + ri.delta_rindex_theta * np.arange(ri.n_rindex_theta)
    nphis = ri.rindex_phi0 + ri.delta_rindex_phi * np.arange(ri.n_rindex_phi)

    cand = []
    for R in rs:
        for Z in zs:
            for nth in nthetas:
                for nph in nphis:
                    cand.append((R, 0.0, Z, nth, nph))
    cand = np.asarray(cand, dtype=np.float64)
    if cand.shape[0] > cfg.nray_max:
        raise ValueError("axisym_toroid_ray_init: ray count exceeds nray_max")

    def solve_one(c):
        rvec = c[0:3]
        nth, nph = c[3], c[4]
        err = base.eq_err(cfg, params, rvec)
        alpha, gamma, bunit, _ = dispersion.alpha_gamma(
            cfg, params, rvec, params.rf.omgrf)
        _, gradpsi, _, _ = at_mod.psi_and_grad(cfg.eq_static, params.eq, rvec)

        psi_unit = gradpsi / jnp.sqrt(jnp.dot(gradpsi, gradpsi))
        phi_unit = jnp.asarray([0.0, 1.0, 0.0], rvec.dtype)
        theta_unit = jnp.asarray([-gradpsi[2], 0.0, gradpsi[0]])
        theta_unit = theta_unit / jnp.sqrt(jnp.dot(theta_unit, theta_unit))
        trans_unit = jnp.cross(bunit, psi_unit)

        rindex_vec = nph * phi_unit + nth * theta_unit
        n3 = jnp.dot(bunit, rindex_vec)
        n2 = jnp.dot(trans_unit, rindex_vec)

        npsi, propagating = dispersion.solve_n1_vs_n2_n3(
            alpha, gamma, cfg.wave_mode, cfg.k0_sign, n2, n3)
        rindex0 = rindex_vec - npsi * psi_unit  # inward: -grad(psi)
        return rindex0, (err == 0) & propagating

    rindex0, valid = jax.jit(jax.vmap(solve_one))(jnp.asarray(cand))
    rindex0 = np.asarray(rindex0)
    valid = np.asarray(valid)
    nray = int(valid.sum())
    if nray == 0:
        raise RuntimeError("axisym_toroid_ray_init: no successful ray "
                           "initializations")
    rvec0 = cand[valid, 0:3]
    pwr = np.full((nray,), 1.0 / nray)
    return jnp.asarray(rvec0), jnp.asarray(rindex0[valid]), jnp.asarray(pwr)
