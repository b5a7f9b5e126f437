"""Post-processing orchestration.

The functional analog of reference RAYS_project/post_process_lib/
post_processing_m.f90 + the standalone post_process_RAYS executable: rebuild
the run configuration from rays.in, load ray results (from memory — the
RAYS_P in-process mode — or back from run_results.<label>.nc, the
decoupled file-based mode, post_processing_m.f90:132-187), select the
geometry processor from post_process_rays.in, and run deposition profiles.
"""

from __future__ import annotations

import numpy as np


def load_results_nc(path):
    """run_results.<label>.nc -> RayResults-like namespace (the reference's
    read_results_instance_NC, ray_results_m.f90:253)."""
    import jax.numpy as jnp

    from rays_tpu.results.netcdf import read_results_nc
    from rays_tpu.tracing.stop import flag_code
    from rays_tpu.tracing.trace import RayResults

    d = read_results_nc(path)

    def f64(name):
        return jnp.asarray(np.array(d[name], dtype=np.float64))

    # restore the stop taxonomy from the stored flag strings (the reference
    # round-trips ray_stop_flag through its files, ray_results_m.f90:56,
    # 253-363) so file-based post-processing keyed on stop reason sees the
    # same codes as in-process
    if "ray_stop_flag" in d:
        raw = np.asarray(d["ray_stop_flag"])  # (nray, 60) of S1
        strings = [b"".join(row).decode("ascii", "replace") for row in raw]
        stop_flag = jnp.asarray(
            np.array([flag_code(s) for s in strings], np.int32))
    else:
        stop_flag = jnp.zeros(d["npoints"].shape, jnp.int32)

    return RayResults(
        ray_vec=f64("ray_vec"),
        residual=f64("residual"),
        npoints=jnp.asarray(np.array(d["npoints"], dtype=np.int32)),
        stop_flag=stop_flag,
        initial_ray_power=f64("initial_ray_power"),
        end_residuals=f64("end_residuals"),
        max_residuals=f64("max_residuals"),
        end_ray_parameter=f64("end_ray_parameter"),
        start_ray_vec=f64("start_ray_vec"),
        end_ray_vec=f64("end_ray_vec"),
    )


def load_results_ld(path):
    """run_results.<label> (list-directed ASCII) -> RayResults-like
    namespace (the reference's read_results_LD, ray_results_m.f90:424)."""
    import jax.numpy as jnp

    from rays_tpu.results.ascii import read_results_ld
    from rays_tpu.tracing.stop import flag_code
    from rays_tpu.tracing.trace import RayResults

    d = read_results_ld(path)
    f64 = lambda name: jnp.asarray(np.asarray(d[name], dtype=np.float64))
    return RayResults(
        ray_vec=f64("ray_vec"),
        residual=f64("residual"),
        npoints=jnp.asarray(np.asarray(d["npoints"], np.int32)),
        stop_flag=jnp.asarray(
            np.array([flag_code(s) for s in d["ray_stop_flag"]], np.int32)),
        initial_ray_power=f64("initial_ray_power"),
        end_residuals=f64("end_residuals"),
        max_residuals=f64("max_residuals"),
        end_ray_parameter=f64("end_ray_parameter"),
        start_ray_vec=f64("start_ray_vec"),
        end_ray_vec=f64("end_ray_vec"),
    )


def load_results_ascii(run_label, directory="."):
    """Legacy per-step stream (ray_out.<label> + ray_list.<label>) ->
    RayResults-like namespace (the reference's ASCII input mode,
    post_processing_m.f90:292-361).  Per-step residuals are not in this
    stream; summary fields are reconstructed from the trajectory."""
    import jax.numpy as jnp

    from rays_tpu.results.ascii import read_ray_data
    from rays_tpu.tracing.stop import flag_code
    from rays_tpu.tracing.trace import RayResults

    d = read_ray_data(run_label, directory)
    v = np.asarray(d["v_vec"], np.float64)
    npts = np.asarray(d["npoints"], np.int32)
    nray = v.shape[0]
    last = np.maximum(npts - 1, 0)
    end_vec = v[np.arange(nray), last]
    end_res = np.asarray(d["end_residuals"], np.float64)
    return RayResults(
        ray_vec=jnp.asarray(v),
        residual=jnp.zeros(v.shape[:2]),
        npoints=jnp.asarray(npts),
        stop_flag=jnp.asarray(
            np.array([flag_code(s) for s in d["ray_stop_flag"]], np.int32)),
        initial_ray_power=jnp.full((nray,), 1.0 / max(nray, 1)),
        end_residuals=jnp.asarray(end_res),
        max_residuals=jnp.asarray(end_res),
        end_ray_parameter=jnp.asarray(end_vec[:, 6]),
        start_ray_vec=jnp.asarray(v[:, 0, :]),
        end_ray_vec=jnp.asarray(end_vec),
    )


# namelist group feeding each geometry processor (each *_processor_m.f90
# reads its own group from post_process_rays.in)
PROCESSOR_GROUP = {
    "slab": "slab_processor_list",
    "solovev": "solovev_processor_list",
    "axisym_toroid": "axisym_toroid_processor_list",
    "multiple_mirror": "mirror_processor_list",
}


def post_process(cfg, params, results, rindex_vec0=None, pp_config=None):
    """Dispatch the geometry processor (post_processing_m.f90:194-226).

    ``pp_config['processor_knobs']`` carries the processor-specific
    namelist group (slab_processor_m.f90:56-59,
    axisym_toroid_processor_m.f90:59-64, mirror_processor_m.f90:95-101,
    solovev_processor_m.f90:32), read by ``main`` from
    post_process_rays.in; its calculate_dep_profiles /
    write_dep_profiles / calculate_ray_diag gates are honored here."""
    pp_config = pp_config or {}
    processor = pp_config.get("processor", cfg.equilib_model)
    knobs = {str(a).lower(): b
             for a, b in (pp_config.get("processor_knobs") or {}).items()}

    out = {}
    if processor in ("slab",):
        from rays_tpu.post import slab_processor

        if rindex_vec0 is None:
            rindex_vec0 = np.asarray(results.start_ray_vec[:, 3:6]) / float(
                params.rf.k0)
        out.update(slab_processor.process(cfg, params, results, rindex_vec0,
                                          knobs=knobs))
    elif processor in ("solovev", "axisym_toroid"):
        from rays_tpu.post import toroid_processor

        out.update(toroid_processor.process(cfg, params, results,
                                            knobs=knobs))
    elif processor in ("multiple_mirror",):
        from rays_tpu.post import mirror_processor

        out.update(mirror_processor.process(
            cfg, params, results,
            z_reference=pp_config.get("z_reference"),
            do_ox_analysis=bool(pp_config.get("do_ox_conv_analysis", True)),
            knobs=knobs))
    else:
        raise ValueError(f"post_process: unknown processor {processor}")

    # per-ray detailed diagnostics netCDF (the reference's
    # calculate_ray_diag flag, slab_processor_m.f90:109 et al.)
    if bool(knobs.get("calculate_ray_diag",
                      pp_config.get("calculate_ray_diag", False))) \
            and "ray_diags_nc" not in out:
        from rays_tpu.post import ray_diags

        out["ray_diags_nc"] = ray_diags.write_ray_diagnostics_nc(
            cfg, params, results)

    # deposition profiles when a damping model ran (namelist gate
    # calculate_dep_profiles, reference default .true.)
    if cfg.damping_slot >= 0 and bool(
            knobs.get("calculate_dep_profiles", True)):
        from rays_tpu.post import deposition

        n_bins = int(pp_config.get("n_bins", 50))
        for name in deposition.profile_names_for_geometry(
                cfg.equilib_model, cfg, params):
            if name == "Ptotal_x":
                xmin, xmax = float(params.eq.xmin), float(params.eq.xmax)
            else:
                xmin, xmax = 0.0, 1.0
            out[name] = deposition.calculate_deposition_profile(
                cfg, params, results, name, n_bins=n_bins, xmin=xmin, xmax=xmax)
        # file outputs: netCDF on write_dep_profiles (reference default
        # .true.; the RAYS_P product consumed by P_profiles/plot_profiles),
        # LD on the reference's namelist flag
        # (deposition_profiles_m.f90:83,296)
        if bool(knobs.get("write_dep_profiles", True)):
            out["deposition_nc"] = deposition.write_deposition_profiles_nc(
                cfg, params, results, n_bins=n_bins)
        if pp_config.get("write_results_list_directed"):
            out["deposition_ld"] = deposition.write_deposition_profiles_ld(
                cfg, params, results, n_bins=n_bins)
    return out


def main(argv=None):
    import argparse

    import jax

    from rays_tpu.config import schema
    from rays_tpu.config.namelist import read_namelist_file

    ap = argparse.ArgumentParser(
        description="standalone post-processor (post_process_RAYS analog)")
    ap.add_argument("rays_in", help="the run's rays.in file")
    ap.add_argument("--pp", default="post_process_rays.in",
                    help="post-process config namelist")
    ap.add_argument("--results", default=None,
                    help="run_results file (default per input mode)")
    args = ap.parse_args(argv)

    cfg, params = schema.from_file(args.rays_in)
    import os

    pp_cfg = {}
    if os.path.exists(args.pp):
        nml = read_namelist_file(args.pp)
        pp_cfg.update(nml.get("post_process_list", {}))
        pp_cfg.update(nml.get("deposition_profiles_list", {}))
        # the processor-specific namelist group (each *_processor_m.f90
        # reads its own group); file-driven runs get the reference's
        # .true. defaults for the calculate/write gates
        processor = str(pp_cfg.get("processor", cfg.equilib_model))
        group = PROCESSOR_GROUP.get(processor)
        knobs = {str(a).lower(): b
                 for a, b in nml.get(group, {}).items()} if group else {}
        knobs.setdefault("calculate_dep_profiles", True)
        knobs.setdefault("write_dep_profiles", True)
        knobs.setdefault("calculate_ray_diag", True)
        pp_cfg["processor_knobs"] = knobs
    # ray_data_input_mode = NC | LD | ASCII, filenames constructed from the
    # run label exactly as the reference (post_processing_m.f90:159-187)
    mode = str(pp_cfg.get("ray_data_input_mode", "NC")).strip().upper()
    if mode == "NC":
        results = load_results_nc(
            args.results or f"run_results.{cfg.run_label}.nc")
    elif mode == "LD":
        results = load_results_ld(
            args.results or f"run_results.{cfg.run_label}")
    elif mode == "ASCII":
        results = load_results_ascii(cfg.run_label)
    else:
        raise ValueError(
            f"post_process: unimplemented ray_data_input_mode = {mode}")
    out = post_process(cfg, params, results, pp_config=pp_cfg)
    for k, v in out.items():
        print(f"{k}: {v if isinstance(v, str) else type(v).__name__}")


if __name__ == "__main__":
    main()
