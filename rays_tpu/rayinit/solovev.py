"""Solovev flux-surface ray initialization.

Re-design of reference RAYS_project/RAYS_lib/
solovev_ray_init_nphi_ntheta_m.f90: launch points on a (r, theta) fan in the
phi = 0 plane, a (psi, theta, phi) unit-vector frame built from grad(psi),
the requested (n_phi, n_theta) projected onto the flux surface, and the
inward psi-component solved from the cold dispersion relation
(solovev_ray_init_nphi_ntheta_m.f90:124-198).

Divergence from the reference: power weights are a uniform 1/nray for every
surviving ray; the reference only assigns a weight to the last ray of each
r-shell before normalizing (an upstream indexing bug,
solovev_ray_init_nphi_ntheta_m.f90:197).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rays_tpu.models import base, solovev as solovev_mod
from rays_tpu.wave import dispersion


@dataclasses.dataclass(frozen=True)
class SolovevInit:
    n_r_launch: int = 1
    r_launch0: float = 0.0
    dr_launch: float = 0.0
    n_theta_launch: int = 1
    theta_launch0: float = 0.0
    dtheta_launch: float = 0.0
    n_rindex_theta: int = 1
    rindex_theta0: float = 0.0
    delta_rindex_theta: float = 0.0
    n_rindex_phi: int = 1
    rindex_phi0: float = 0.0
    delta_rindex_phi: float = 0.0


def solovev_ray_init_nphi_ntheta(cfg, params, ri: SolovevInit):
    rmaj = float(params.eq.rmaj)
    rs = ri.r_launch0 + ri.dr_launch * np.arange(ri.n_r_launch)
    thetas = ri.theta_launch0 + ri.dtheta_launch * np.arange(ri.n_theta_launch)
    nthetas = ri.rindex_theta0 + ri.delta_rindex_theta * np.arange(ri.n_rindex_theta)
    nphis = ri.rindex_phi0 + ri.delta_rindex_phi * np.arange(ri.n_rindex_phi)

    cand = []
    for r in rs:
        for th in thetas:
            x = rmaj + r * np.cos(th)
            z = r * np.sin(th)
            for nth in nthetas:
                for nph in nphis:
                    cand.append((x, 0.0, z, nth, nph))
    cand = np.asarray(cand, dtype=np.float64)
    if cand.shape[0] > cfg.nray_max:
        raise ValueError("solovev_ray_init: ray count exceeds nray_max")

    def solve_one(c):
        rvec = c[0:3]
        nth, nph = c[3], c[4]
        err = base.eq_err(cfg, params, rvec)
        alpha, gamma, bunit, _ = dispersion.alpha_gamma(
            cfg, params, rvec, params.rf.omgrf)
        _, gradpsi, _, _ = solovev_mod.psi(params.eq, rvec)

        psi_unit = gradpsi / jnp.sqrt(jnp.dot(gradpsi, gradpsi))
        phi_unit = jnp.asarray([0.0, 1.0, 0.0], rvec.dtype)
        theta_unit = jnp.asarray([-gradpsi[2], 0.0, gradpsi[0]])
        theta_unit = theta_unit / jnp.sqrt(jnp.dot(theta_unit, theta_unit))
        trans_unit = jnp.cross(bunit, psi_unit)

        # refractive index projected onto the flux surface
        rindex_vec = nph * phi_unit + nth * theta_unit
        n3 = jnp.dot(bunit, rindex_vec)
        n2 = jnp.dot(trans_unit, rindex_vec)

        npsi, propagating = dispersion.solve_n1_vs_n2_n3(
            alpha, gamma, cfg.wave_mode, cfg.k0_sign, n2, n3)
        # psi-component points inward: -grad(psi) direction
        rindex0 = rindex_vec - npsi * psi_unit
        return rindex0, (err == 0) & propagating

    rindex0, valid = jax.jit(jax.vmap(solve_one))(jnp.asarray(cand))
    rindex0 = np.asarray(rindex0)
    valid = np.asarray(valid)

    nray = int(valid.sum())
    if nray == 0:
        raise RuntimeError("solovev_ray_init: no successful ray initializations")
    rvec0 = cand[valid, 0:3]
    pwr = np.full((nray,), 1.0 / nray)
    return jnp.asarray(rvec0), jnp.asarray(rindex0[valid]), jnp.asarray(pwr)
