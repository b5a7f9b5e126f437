"""Reference-plotter interop for every geometry (VERDICT r2 item 7).

The slab plotter already runs in CI (test_run_io.py).  Here the other three
committed reference plotters — plot_RAYS_solovev.py (reads the formatted
ray_out.<label> stream), plot_RAYS_axisym_toroid.py and plot_RAYS_mirror.py
(read run_results.<label>.nc + eq_contours.<label>.nc) — each run
unmodified against this package's output files and must produce their PDF.
"""

import dataclasses
import os

import jax
import numpy as np
import pytest

import rays_tpu  # noqa: F401
from rays_tpu import examples
from rays_tpu.post.process import post_process
from rays_tpu.results.ascii import write_formatted_ray_files
from rays_tpu.results.netcdf import write_results_nc
from rays_tpu.tracing import trace as trace_mod
from rays_tpu.utils import erays

REFERENCE_GRAPHICS = erays.REFERENCE_GRAPHICS
MPEX_DIR = ("/root/reference/examples_RAYS/MPEX_examples/"
            "MPX_2nd_harm_11_rays_nz_delta_d_0.05_psiP_0.05")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_GRAPHICS),
    reason="reference graphics scripts not available")


def _run_and_write(cfg, params, v0, st, pwr, wd):
    tracer = jax.jit(lambda p, v, s, w: trace_mod.trace_batch(cfg, p, v, s, w))
    res = tracer(params, v0, st, pwr)
    jax.block_until_ready(res)
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        write_results_nc(cfg, res, total_trace_time=0.0)
        write_formatted_ray_files(cfg, res, ds=float(params.ode.ds))
        post_process(cfg, params, res)
    finally:
        os.chdir(cwd)
    return res


def _assert_plot(cfg, wd):
    proc = erays.plot_with_reference_scripts(cfg, workdir=str(wd))
    assert proc.returncode == 0, (
        f"{cfg.equilib_model} plotter failed:\nstdout:\n{proc.stdout[-2000:]}"
        f"\nstderr:\n{proc.stderr[-2000:]}")
    pdf = wd / f"ray_plots.{cfg.run_label}.pdf"
    assert pdf.exists() and pdf.stat().st_size > 1000


def test_solovev_plotter(tmp_path):
    """plot_RAYS_solovev.py parses ray_out.<label> (the formatted stream)
    plus graphics_description_solovev.dat (plot_RAYS_solovev.py:76-81)."""
    cfg, params, v0, st, pwr = examples.setup_example(
        examples.SOLOVEV_ECH_90GHZ)
    cfg = dataclasses.replace(cfg, ode_solver_name="RK4_ODE", nstep_max=60)
    _run_and_write(cfg, params, v0, st, pwr, tmp_path)
    assert (tmp_path / f"ray_out.{cfg.run_label}").exists()
    assert (tmp_path / "graphics_description_solovev.dat").exists()
    _assert_plot(cfg, tmp_path)


def test_axisym_toroid_plotter(tmp_path):
    """plot_RAYS_axisym_toroid.py reads run_results.<label>.nc and the
    processor's eq_contours.<label>.nc (:158,311-349)."""
    from rays_tpu.config import schema
    from rays_tpu.config.namelist import parse_namelist
    from rays_tpu import run as runner
    from rays_tpu.rayinit import vector as init_vector
    from test_axisym import AXISYM_TMPL

    import jax.numpy as jnp

    cfg, params = schema.from_namelist(parse_namelist(
        AXISYM_TMPL.format(MAG="solovev_magnetics", EQDSK="unused")))
    rvec0, rindex0, pwr = runner.init_rays(cfg, params)
    v0 = init_vector.initial_ode_vectors(cfg, params, rvec0, rindex0)
    st = jnp.zeros((v0.shape[0],), jnp.int32)
    _run_and_write(cfg, params, v0, st, pwr, tmp_path)
    assert (tmp_path / f"eq_contours.{cfg.run_label}.nc").exists()
    _assert_plot(cfg, tmp_path)


def test_mirror_plotter(tmp_path):
    """plot_RAYS_mirror.py reads run_results.<label>.nc, eq_contours +
    graphics_description_mirror.dat with the O-mode cutoff radius
    (plot_RAYS_mirror.py:74-101,144-163,300-349)."""
    from rays_tpu import run as runner

    if not os.path.isdir(MPEX_DIR):
        pytest.skip("MPEX example not available")
    cwd = os.getcwd()
    os.chdir(MPEX_DIR)
    try:
        cfg, params, v0, st, pwr = runner.setup("rays.in")
    finally:
        os.chdir(cwd)
    cfg = dataclasses.replace(cfg, nstep_max=150)
    keep = slice(0, 4)
    res = _run_and_write(cfg, params, v0[keep], st[keep], pwr[keep], tmp_path)
    assert int(np.asarray(res.npoints).min()) >= 2
    gd = (tmp_path / "graphics_description_mirror.dat").read_text()
    assert "r_Omode_cut_at_z_ref" in gd and "z_reference" in gd
    _assert_plot(cfg, tmp_path)
