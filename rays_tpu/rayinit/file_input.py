"""Ray initialization from a namelist file of launch points + directions.

Re-design of reference RAYS_project/RAYS_lib/file_input_ray_init_m.f90:
reads ``ray_init_<run_label>.in`` containing /file_input_ray_init_list/
(n_rays_in, rvec_in, rindex_vec_in, ray_pwr_wt_in), then re-solves the
dispersion relation along each given direction exactly like the one-ray
initializer (file_input_ray_init_m.f90:62-120).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rays_tpu.models import base
from rays_tpu.wave import dispersion


@dataclasses.dataclass(frozen=True)
class FileInputInit:
    filename: str = ""   # defaults to ray_init_<run_label>.in


def _as_matrix(val, n):
    """Namelist array (flat list or {index: value} dict, Fortran
    column-major 3 x n) -> (n, 3)."""
    flat = np.zeros(3 * n)
    if isinstance(val, dict):
        for i, v in val.items():
            flat[i - 1] = v
    else:
        arr = np.asarray(val, dtype=float).ravel()
        flat[: len(arr)] = arr
    return flat[: 3 * n].reshape(n, 3)


def file_input_ray_init(cfg, params, ri: FileInputInit):
    from rays_tpu.config.namelist import read_namelist_file

    fname = ri.filename or f"ray_init_{cfg.run_label}.in"
    nml = read_namelist_file(fname)
    g = nml["file_input_ray_init_list"]
    n = int(g["n_rays_in"])
    rvecs = _as_matrix(g.get("rvec_in", []), n)
    ndirs = _as_matrix(g.get("rindex_vec_in", []), n)
    pwr_in = np.ones(n)
    if "ray_pwr_wt_in" in g:
        w = g["ray_pwr_wt_in"]
        if isinstance(w, dict):
            for i, v in w.items():
                pwr_in[i - 1] = v
        else:
            arr = np.asarray(w, dtype=float).ravel()
            pwr_in[: len(arr)] = arr

    def solve_one(rvec, nvec):
        err = base.eq_err(cfg, params, rvec)
        alpha, gamma, bunit, _ = dispersion.alpha_gamma(
            cfg, params, rvec, params.rf.omgrf)
        nunit = nvec / jnp.sqrt(jnp.dot(nvec, nvec))
        theta = jnp.arccos(jnp.clip(jnp.dot(bunit, nunit), -1.0, 1.0))
        nmag, valid = dispersion.solve_n_vs_theta(
            alpha, gamma, cfg.wave_mode, cfg.k0_sign, theta)
        return nmag * nunit, (err == 0) & valid

    rindex, valid = jax.jit(jax.vmap(solve_one))(
        jnp.asarray(rvecs), jnp.asarray(ndirs))
    valid = np.asarray(valid)
    nray = int(valid.sum())
    if nray == 0:
        raise RuntimeError("file_input_ray_init: no successful ray "
                           "initializations")
    # weights kept from the file, normalized by surviving count (reference
    # divides the temp weights by nray, file_input_ray_init_m.f90)
    pwr = pwr_in[valid] / nray
    return (jnp.asarray(rvecs[valid]), jnp.asarray(np.asarray(rindex)[valid]),
            jnp.asarray(pwr))
