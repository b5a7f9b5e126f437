"""Simple-slab ray initialization.

Re-design of reference RAYS_project/RAYS_lib/simple_slab_ray_init_m.f90:
a launch grid in (z, y, x) crossed with fans in (ny, nz); at each candidate
the local dispersion relation is solved for nx and candidates that are out
of plasma or evanescent (Im nx != 0) are dropped
(simple_slab_ray_init_m.f90:119-169).

The candidate evaluation is a single vmapped dispersion solve; the pack to
the surviving nray runs eagerly on host (ray init happens once per run,
outside the hot loop).

Divergences from the reference (both look like upstream bugs):
  * the z-launch grid uses dz_launch (the reference reuses dy_launch for z,
    simple_slab_ray_init_m.f90:122);
  * ray power weights are 1/nray (the reference divides by nray twice,
    simple_slab_ray_init_m.f90:179-182).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rays_tpu.wave import dispersion


@dataclasses.dataclass(frozen=True)
class SlabInit:
    n_x_launch: int = 1
    x_launch0: float = 0.0
    dx_launch: float = 0.0
    n_y_launch: int = 1
    y_launch0: float = 0.0
    dy_launch: float = 0.0
    n_z_launch: int = 1
    z_launch0: float = 0.0
    dz_launch: float = 0.0
    n_ky_launch: int = 1
    rindex_y0: float = 0.0
    delta_rindex_y0: float = 0.0
    n_kz_launch: int = 1
    rindex_z0: float = 0.0
    delta_rindex_z0: float = 0.0


def simple_slab_ray_init(cfg, params, ri: SlabInit):
    """Returns (rvec0 (B,3), rindex_vec0 (B,3), pwr_wt (B,)) with B = nray."""
    xs = ri.x_launch0 + ri.dx_launch * np.arange(ri.n_x_launch)
    ys = ri.y_launch0 + ri.dy_launch * np.arange(ri.n_y_launch)
    zs = ri.z_launch0 + ri.dz_launch * np.arange(ri.n_z_launch)
    nys = ri.rindex_y0 + ri.delta_rindex_y0 * np.arange(ri.n_ky_launch)
    nzs = ri.rindex_z0 + ri.delta_rindex_z0 * np.arange(ri.n_kz_launch)

    # reference loop nesting: z, y, x outer; ky, kz inner
    cand = []
    for z in zs:
        for y in ys:
            for x in xs:
                for ny in nys:
                    for nz in nzs:
                        cand.append((x, y, z, ny, nz))
    cand = np.asarray(cand, dtype=np.float64)
    if cand.shape[0] > cfg.nray_max:
        raise ValueError(
            f"simple_slab_ray_init: ray count {cand.shape[0]} exceeds "
            f"nray_max {cfg.nray_max}"
        )

    def solve_one(c):
        rvec = c[0:3]
        ny, nz = c[3], c[4]
        alpha, gamma, bunit, _ = dispersion.alpha_gamma(
            cfg, params, rvec, params.rf.omgrf
        )
        from rays_tpu.models import base

        err = base.eq_err(cfg, params, rvec)
        # evanescent (complex nx) candidates are dropped, like the
        # reference's aimag(rindex_x) /= 0 skip
        nx, propagating = dispersion.solve_nx_vs_ny_nz_by_bz(
            alpha, gamma, bunit, cfg.wave_mode, cfg.k0_sign, ny, nz
        )
        return nx, (err == 0) & propagating

    nx, valid = jax.jit(jax.vmap(solve_one))(jnp.asarray(cand))
    nx = np.asarray(nx)
    valid = np.asarray(valid)

    nray = int(valid.sum())
    if nray == 0:
        raise RuntimeError("simple_slab_ray_init: no successful ray initializations")

    rvec0 = cand[valid, 0:3]
    rindex0 = np.stack([nx[valid], cand[valid, 3], cand[valid, 4]], axis=-1)
    pwr = np.full((nray,), 1.0 / nray)
    return jnp.asarray(rvec0), jnp.asarray(rindex0), jnp.asarray(pwr)
