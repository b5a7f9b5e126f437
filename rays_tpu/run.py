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


def make_diagnostics(path):
    """Run log from the input file's diagnostics_list (reference
    diagnostics_m.f90:48-103): opens the message file, echoes every parsed
    namelist group for config provenance, returns the Diagnostics handle.
    Call ``finalize()`` on it to produce log.RAYS.<run_label>
    (finalize_run.f90:50)."""
    from rays_tpu.config.namelist import read_namelist_file
    from rays_tpu.utils.diagnostics import Diagnostics

    nml = read_namelist_file(path)
    d = nml.get("diagnostics_list", {})

    def _get(grp, key, default):
        for k, v in grp.items():
            if k.lower() == key:
                return v
        return default

    diag = Diagnostics(
        run_label=str(_get(d, "run_label", "run")),
        verbosity=int(_get(d, "verbosity", 0)),
        messages_to_stdout=bool(_get(d, "messages_to_stdout", False)),
    )
    diag.echo_namelists(nml)
    return diag


def ray_trace_times(results, wall):
    """Per-ray trace-time attribution (reference ray_trace_time(iray),
    ray_tracing.f90:74-75,254).  Rays run in lockstep on the TPU, so the
    honest per-ray analog is the batch wall time attributed by each ray's
    share of live steps."""
    import numpy as np

    npts = np.asarray(results.npoints, np.float64)
    total = max(npts.sum(), 1.0)
    return wall * npts / total


def run(path, diag=None):
    """Full run from a rays.in-style file.  Returns (cfg, RayResults,
    wall_time_seconds)."""
    cfg, params, v0, status0, pwr = setup(path)
    if diag is not None:
        diag.message("rays_tpu run", cfg.run_label, threshold=0)
        diag.message("number of rays", int(v0.shape[0]), threshold=0)
        diag.message("nv", cfg.nv, threshold=0)
    t0 = time.perf_counter()
    results = trace_mod.trace_rays(cfg, params, v0, status0, pwr)
    jax.block_until_ready(results)
    wall = time.perf_counter() - t0
    if diag is not None:
        import numpy as np

        from rays_tpu.tracing.stop import flag_string

        diag.message("Wall time ray tracing (s)", round(wall, 4), threshold=0)
        npts = np.asarray(results.npoints)
        flags = np.asarray(results.stop_flag)
        times = ray_trace_times(results, wall)
        for i in range(npts.shape[0]):
            diag.message(
                f"ray {i + 1}: npoints", int(npts[i]), threshold=1)
            diag.message(
                f"ray {i + 1}: stop flag", flag_string(flags[i]), threshold=1)
            diag.message(
                f"ray {i + 1}: trace time (s)", round(float(times[i]), 6),
                threshold=1)
        diag.message("max dispersion residual",
                     float(np.asarray(results.max_residuals).max()),
                     threshold=0)
    if cfg.write_formatted_ray_files:
        if not cfg.save_trajectory:
            msg = ("write_formatted_ray_files=True requires "
                   "save_trajectory=True; skipping formatted ray files")
            if diag is not None:
                diag.message("WARNING", msg, threshold=0)
            else:
                import warnings

                warnings.warn(msg, stacklevel=2)
        else:
            from rays_tpu.results.ascii import write_formatted_ray_files

            out_p, list_p = write_formatted_ray_files(
                cfg, results, ds=float(params.ode.ds))
            if diag is not None:
                diag.message("wrote formatted ray files",
                             f"{out_p} {list_p}", threshold=0)
    return cfg, results, wall


def finalize_outputs(cfg, results, wall, diag=None, force_netcdf=False):
    """Write the results files the ``&ray_results_list`` namelist asks for
    (reference ray_results_m.f90:98-101 read; finalize_run.f90:21-28 honors
    ``write_results_list_directed`` -> run_results.<label> and
    ``write_results_netCDF`` -> run_results.<label>.nc).  ``force_netcdf``
    is the CLI override on top of the namelist.  Returns written paths."""
    written = []
    times = ray_trace_times(results, wall)
    if cfg.write_results_list_directed:
        from rays_tpu.results.ascii import write_results_ld

        fn = write_results_ld(cfg, results, total_trace_time=wall,
                              ray_trace_time=times)
        written.append(fn or f"run_results.{cfg.run_label}")
    if cfg.write_results_netcdf or force_netcdf:
        from rays_tpu.results.netcdf import write_results_nc

        fn = write_results_nc(cfg, results, total_trace_time=wall,
                              ray_trace_time=times)
        written.append(fn)
    if diag is not None:
        for fn in written:
            diag.message("wrote results", fn, threshold=0)
    return written


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="rays_tpu ray-tracing run")
    ap.add_argument("input", help="namelist input file (rays.in format)")
    ap.add_argument("--netcdf", action="store_true",
                    help="write run_results.<run_label>.nc even when the "
                         "input's &ray_results_list does not ask for it")
    ap.add_argument("--no-log", action="store_true",
                    help="skip writing log.RAYS.<run_label>")
    args = ap.parse_args(argv)

    diag = None if args.no_log else make_diagnostics(args.input)
    cfg, results, wall = run(args.input, diag=diag)
    import numpy as np

    print(f"run_label: {cfg.run_label}")
    print(f"rays: {results.npoints.shape[0]}  wall: {wall:.3f}s")
    print(f"npoints: {np.asarray(results.npoints).tolist()}")
    print(f"max residuals: {np.asarray(results.max_residuals)}")
    for fn in finalize_outputs(cfg, results, wall, diag=diag,
                               force_netcdf=args.netcdf):
        print(f"wrote {fn}")
    if diag is not None:
        print(f"wrote {diag.finalize()}")


if __name__ == "__main__":
    main()
