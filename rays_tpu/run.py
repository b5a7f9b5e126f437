"""Run orchestration: initialize -> trace -> results.

The functional analog of the reference's RAYS main program
(reference RAYS_project/RAYS_code/RAYS.f90: initialize / trace_rays /
finalize_run).  ``setup`` resolves config + params + initial rays;
``run`` traces (jitted) and assembles results; ``main`` adds file output.
"""

from __future__ import annotations

import time

import jax

from rays_tpu.config import schema
from rays_tpu.models import slab as _slab  # noqa: F401  (register models)
from rays_tpu.models import solovev as _solovev  # noqa: F401
from rays_tpu.rayinit import vector as init_vector
from rays_tpu.tracing import trace as trace_mod


def init_rays(cfg, params):
    """Dispatch ray initialization (reference ray_init_m.f90:101-124)."""
    if cfg.ray_init_model == "simple_slab":
        from rays_tpu.rayinit.slab import simple_slab_ray_init

        return simple_slab_ray_init(cfg, params, cfg.rayinit_static)
    if cfg.ray_init_model == "solovev_ray_init_nphi_ntheta":
        from rays_tpu.rayinit.solovev import solovev_ray_init_nphi_ntheta

        return solovev_ray_init_nphi_ntheta(cfg, params, cfg.rayinit_static)
    if cfg.ray_init_model == "one_ray_init_XYZ_k_direction":
        from rays_tpu.rayinit.one_ray import one_ray_init_xyz_k_direction

        return one_ray_init_xyz_k_direction(cfg, params, cfg.rayinit_static)
    if cfg.ray_init_model == "axisym_toroid_ray_init_R_Z_nphi_ntheta":
        from rays_tpu.rayinit.axisym_toroid import axisym_toroid_ray_init

        return axisym_toroid_ray_init(cfg, params, cfg.rayinit_static)
    if cfg.ray_init_model == "file_input_ray_init":
        from rays_tpu.rayinit.file_input import file_input_ray_init

        return file_input_ray_init(cfg, params, cfg.rayinit_static)
    raise NotImplementedError(f"ray_init_model {cfg.ray_init_model}")


def setup(path):
    """Namelist file -> (cfg, params, v0, status0, pwr_wt)."""
    import jax.numpy as jnp

    cfg, params = schema.from_file(path)
    rvec0, rindex0, pwr = init_rays(cfg, params)
    v0 = init_vector.initial_ode_vectors(cfg, params, rvec0, rindex0)
    status0 = jnp.zeros((v0.shape[0],), jnp.int32)
    return cfg, params, v0, status0, pwr


def run(path):
    """Full run from a rays.in-style file.  Returns (cfg, RayResults,
    wall_time_seconds)."""
    cfg, params, v0, status0, pwr = setup(path)
    tracer = jax.jit(lambda p, v, st, w: trace_mod.trace_batch(cfg, p, v, st, w))
    t0 = time.perf_counter()
    results = tracer(params, v0, status0, pwr)
    jax.block_until_ready(results)
    wall = time.perf_counter() - t0
    return cfg, results, wall


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="rays_tpu ray-tracing run")
    ap.add_argument("input", help="namelist input file (rays.in format)")
    ap.add_argument("--netcdf", action="store_true",
                    help="write run_results.<run_label>.nc")
    args = ap.parse_args(argv)

    cfg, results, wall = run(args.input)
    import numpy as np

    print(f"run_label: {cfg.run_label}")
    print(f"rays: {results.npoints.shape[0]}  wall: {wall:.3f}s")
    print(f"npoints: {np.asarray(results.npoints).tolist()}")
    print(f"max residuals: {np.asarray(results.max_residuals)}")
    if args.netcdf:
        from rays_tpu.results.netcdf import write_results_nc

        fn = write_results_nc(cfg, results, total_trace_time=wall)
        print(f"wrote {fn}")


if __name__ == "__main__":
    main()
