"""End-to-end driver: trace -> post-process -> plots.

Re-design of reference RAYS_project/python_utilities/eRAYS.py (run RAYS ->
post_process_RAYS -> plot scripts via subprocess, eRAYS.py:38-75) as an
in-process pipeline.  Plotting interoperates with the reference's committed
matplotlib scripts: our run_results.<label>.nc uses the same netCDF schema,
so graphics_RAYS/plot_RAYS_*.py consume it unchanged; use
``plot_with_reference_scripts`` to invoke them, or the built-in minimal
trajectory plot.
"""

from __future__ import annotations

import os
import subprocess
import sys

REFERENCE_GRAPHICS = "/root/reference/graphics_RAYS"


def run_pipeline(rays_in, post=True, netcdf=True, plots=False, log=True):
    from rays_tpu import run as runner
    from rays_tpu.post.process import post_process
    from rays_tpu.results.netcdf import write_results_nc

    diag = runner.make_diagnostics(rays_in) if log else None
    cfg, results, wall = runner.run(rays_in, diag=diag)
    out = {"cfg": cfg, "results": results, "wall": wall}
    if netcdf:
        out["nc"] = write_results_nc(
            cfg, results, total_trace_time=wall,
            ray_trace_time=runner.ray_trace_times(results, wall))
    if post:
        cfg2, params = __import__(
            "rays_tpu.config.schema", fromlist=["from_file"]).from_file(rays_in)
        out["post"] = post_process(cfg, params, results)
    if plots:
        out["plot"] = plot_trajectories(cfg, results)
    if diag is not None:
        out["log"] = diag.finalize()
    return out


def plot_trajectories(cfg, results, path=None):
    """Minimal built-in trajectory plot (x-z plane + residuals)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    rv = np.asarray(results.ray_vec)
    npts = np.asarray(results.npoints)
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
    for i in range(rv.shape[0]):
        n = npts[i]
        ax1.plot(rv[i, :n, 0], rv[i, :n, 2], lw=1)
        ax2.semilogy(np.maximum(np.asarray(results.residual)[i, :n], 1e-16), lw=1)
    ax1.set_xlabel("x [m]")
    ax1.set_ylabel("z [m]")
    ax1.set_title(f"ray trajectories ({cfg.run_label})")
    ax2.set_xlabel("step")
    ax2.set_ylabel("dispersion residual")
    fig.tight_layout()
    out = path or f"rays_{cfg.run_label}.png"
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def run_reference_script(script, args=(), workdir="."):
    """Run one of the reference's committed graphics_RAYS scripts
    unmodified in ``workdir`` (interop check: same file schemas).  The
    rays_tpu/compat netCDF4 shim over scipy backs their ``import netCDF4``
    in environments without netCDF4-python."""
    env = dict(os.environ)
    compat = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "compat")
    env["PYTHONPATH"] = compat + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("MPLBACKEND", "Agg")
    return subprocess.run(
        [sys.executable, os.path.join(REFERENCE_GRAPHICS, script),
         *map(str, args)],
        cwd=workdir, capture_output=True, text=True, env=env)


def plot_with_reference_scripts(cfg, workdir="."):
    """Invoke the reference's committed geometry plotter against our
    netCDF output."""
    script = {
        "slab": "plot_RAYS_slab.py",
        "solovev": "plot_RAYS_solovev.py",
        "axisym_toroid": "plot_RAYS_axisym_toroid.py",
        "multiple_mirror": "plot_RAYS_mirror.py",
    }[cfg.equilib_model]
    return run_reference_script(script, workdir=workdir)
