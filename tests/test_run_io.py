"""End-to-end run I/O: diagnostics log, per-ray trace times, and the
reference-plotter interop regression (VERDICT items 6 and 8).

One slab example run (module-scoped) feeds every assertion:
  * log.RAYS.<run_label> exists with echoed namelists and per-ray timings
    (reference diagnostics_m.f90:48-103, finalize_run.f90:50);
  * run_results.<label>.nc carries nonzero ray_trace_time
    (ray_results_m.f90:50);
  * the reference's committed plotter graphics_RAYS/plot_RAYS_slab.py runs
    unmodified against our netCDF (through the compat netCDF4 shim) and
    writes its PDF (plot_RAYS_slab.py:254).
"""

import os

import numpy as np
import pytest

import rays_tpu  # noqa: F401
from rays_tpu import examples

REFERENCE_GRAPHICS = "/root/reference/graphics_RAYS"


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    from rays_tpu.utils import erays

    wd = tmp_path_factory.mktemp("run_io")
    rays_in = wd / "rays.in"
    rays_in.write_text(examples.SLAB_ECH_90GHZ)
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        out = erays.run_pipeline(str(rays_in), post=True, netcdf=True,
                                 plots=False, log=True)
    finally:
        os.chdir(cwd)
    return wd, out


def test_run_leaves_log_file(pipeline):
    wd, out = pipeline
    log = wd / f"log.RAYS.{out['cfg'].run_label}"
    assert log.exists()
    text = log.read_text()
    # config provenance: every namelist group echoed
    for group in ("species_list", "rf_list", "ode_list", "slab_eq_list"):
        assert f"&{group}" in text
    # run metrics
    assert "Wall time ray tracing" in text
    assert "Wall time total" in text
    assert "max dispersion residual" in text


def test_results_nc_has_ray_trace_times(pipeline):
    from rays_tpu.results.netcdf import read_results_nc

    wd, out = pipeline
    d = read_results_nc(str(wd / out["nc"].split(os.sep)[-1])
                        if os.sep in out["nc"] else str(wd / out["nc"]))
    rtt = np.asarray(d["ray_trace_time"], float)
    assert rtt.shape == (3,)
    assert (rtt > 0).all()
    # attribution sums to the measured batch wall time
    assert rtt.sum() == pytest.approx(out["wall"], rel=1e-3)
    assert float(d["total_trace_time"]) == pytest.approx(out["wall"], rel=1e-3)


def test_reference_plotter_runs_on_our_netcdf(pipeline):
    from rays_tpu.utils import erays

    wd, out = pipeline
    if not os.path.isdir(REFERENCE_GRAPHICS):
        pytest.skip("reference graphics scripts not available")
    proc = erays.plot_with_reference_scripts(out["cfg"], workdir=str(wd))
    assert proc.returncode == 0, (
        f"reference plotter failed:\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-2000:]}")
    pdf = wd / f"ray_plots.{out['cfg'].run_label}.pdf"
    assert pdf.exists() and pdf.stat().st_size > 1000


def test_deposition_registry_covers_geometries():
    from rays_tpu.post import deposition

    assert deposition.profile_names_for_geometry("slab") == ("Ptotal_x",)
    assert deposition.profile_names_for_geometry("solovev") == ("Ptotal_psi",)
    assert deposition.profile_names_for_geometry("multiple_mirror") == (
        "Ptotal_AphiN",)
