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
    # write_formatted_ray_files on: the same run also exercises the
    # per-step formatted stream (check_save.f90:152-154)
    rays_in.write_text(examples.SLAB_ECH_90GHZ.replace(
        " verbosity=0,", " verbosity=0,\n write_formatted_ray_files=.true.,"))
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


def test_results_ld_roundtrip_with_trace_times(pipeline):
    """The LD (list-directed ASCII) format carries the same fields as the
    netCDF — including per-ray trace times (ray_results_m.f90:50,365-420)
    and stop flags that parse back to codes (VERDICT r3 items 4, 7)."""
    from rays_tpu import run as runner
    from rays_tpu.results.ascii import read_results_ld, write_results_ld
    from rays_tpu.tracing.stop import flag_code

    wd, out = pipeline
    cfg, res, wall = out["cfg"], out["results"], out["wall"]
    times = runner.ray_trace_times(res, wall)
    path = str(wd / "ld_roundtrip")
    write_results_ld(cfg, res, total_trace_time=wall, path=path,
                     ray_trace_time=times)
    back = read_results_ld(path)
    np.testing.assert_allclose(back["ray_trace_time"], times, rtol=1e-12)
    assert back["total_trace_time"] == pytest.approx(wall, rel=1e-6)
    np.testing.assert_array_equal(back["npoints"], np.asarray(res.npoints))
    np.testing.assert_allclose(
        back["end_ray_vec"], np.asarray(res.end_ray_vec), rtol=1e-15)
    # the serialized underscore-folded flags map back to the same codes
    codes = [flag_code(s) for s in back["ray_stop_flag"]]
    np.testing.assert_array_equal(codes, np.asarray(res.stop_flag))


def test_standalone_post_process_ld_and_ascii_modes(pipeline):
    """The standalone post-processor honors the reference's
    ray_data_input_mode namelist (LD / ASCII alongside NC,
    post_processing_m.f90:159-187): ray data reloaded from either ASCII
    format drives the same processor outputs."""
    from rays_tpu import run as runner
    from rays_tpu.post import process as pp
    from rays_tpu.results.ascii import write_results_ld

    wd, out = pipeline
    cfg, res, wall = out["cfg"], out["results"], out["wall"]
    write_results_ld(cfg, res, total_trace_time=wall,
                     path=str(wd / f"run_results.{cfg.run_label}"),
                     ray_trace_time=runner.ray_trace_times(res, wall))
    (wd / "post_process_rays.in").write_text(
        "&post_process_list\n processor='slab', "
        "ray_data_input_mode='LD'\n/\n")
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        pp.main(["rays.in"])
        back = pp.load_results_ld(f"run_results.{cfg.run_label}")
        np.testing.assert_allclose(np.asarray(back.end_ray_vec),
                                   np.asarray(res.end_ray_vec), rtol=1e-15)
        # legacy stream mode (ray_out/ray_list written by the pipeline run)
        (wd / "post_process_rays.in").write_text(
            "&post_process_list\n processor='slab', "
            "ray_data_input_mode='ASCII'\n/\n")
        pp.main(["rays.in"])
        stream = pp.load_results_ascii(cfg.run_label)
        np.testing.assert_array_equal(np.asarray(stream.npoints),
                                      np.asarray(res.npoints))
        np.testing.assert_allclose(
            np.asarray(stream.end_ray_vec),
            np.asarray(res.end_ray_vec), rtol=1e-12)
    finally:
        os.chdir(cwd)


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


def test_formatted_ray_files_roundtrip(pipeline):
    """write_formatted_ray_files=.true. -> ray_out/ray_list.<label> in the
    reference's list-directed layout (check_save.f90:152-154,
    ray_tracing.f90:280-286), readable by the legacy stream reader analog
    (post_processing_m.f90:292-361)."""
    import numpy as np

    from rays_tpu.results.ascii import read_ray_data

    wd, out = pipeline
    label = out["cfg"].run_label
    assert (wd / f"ray_out.{label}").exists()
    assert (wd / f"ray_list.{label}").exists()

    d = read_ray_data(label, directory=str(wd))
    res = out["results"]
    np.testing.assert_array_equal(d["npoints"], np.asarray(res.npoints))
    nray = d["npoints"].shape[0]
    rv = np.asarray(res.ray_vec)
    for ir in range(nray):
        n = int(d["npoints"][ir])
        np.testing.assert_allclose(d["v_vec"][ir, :n], rv[ir, :n], rtol=1e-15)
        # s column is the outer integration grid j*ds
        np.testing.assert_allclose(
            d["s_vec"][ir, :n], np.arange(n) * 5.0e-11, rtol=1e-12)
    np.testing.assert_allclose(d["end_residuals"],
                               np.asarray(res.end_residuals, np.float64),
                               rtol=1e-6)
    assert d["ray_stop_flag"][0] == "nstep_>_nstep_max"


def test_truncated_ray_out_survives(pipeline, tmp_path):
    """Crash forensics: a ray_out truncated mid-stream (as a crashed run
    leaves it) still reads, with npoints clamped to what exists."""
    import shutil

    from rays_tpu.results.ascii import read_ray_data

    wd, out = pipeline
    label = out["cfg"].run_label
    shutil.copy(wd / f"ray_list.{label}", tmp_path / f"ray_list.{label}")
    lines = (wd / f"ray_out.{label}").read_text().splitlines(keepends=True)
    (tmp_path / f"ray_out.{label}").write_text("".join(lines[: len(lines) // 2]))
    d = read_ray_data(label, directory=str(tmp_path))
    assert d["npoints"].sum() == len(lines) // 2
    assert (d["npoints"] <= d["npoints_declared"]).all()


def test_ray_results_list_flags_honored(pipeline, tmp_path):
    """&ray_results_list drives the run path's file outputs (VERDICT r4
    missing #2): write_results_list_directed -> run_results.<label>,
    write_results_netCDF -> run_results.<label>.nc, with no CLI flags
    (reference ray_results_m.f90:98-101, finalize_run.f90:21-28)."""
    import dataclasses

    from rays_tpu import run as runner

    wd, out = pipeline
    cfg, res, wall = out["cfg"], out["results"], out["wall"]
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        # both off (the parsed default): nothing written
        written = runner.finalize_outputs(cfg, res, wall)
        assert written == []
        # namelist flags on: both formats appear without any CLI override
        cfg_on = dataclasses.replace(cfg, write_results_list_directed=True,
                                     write_results_netcdf=True)
        written = runner.finalize_outputs(cfg_on, res, wall)
        assert sorted(written) == [f"run_results.{cfg.run_label}",
                                   f"run_results.{cfg.run_label}.nc"]
        for fn in written:
            assert (tmp_path / fn).exists()
        # CLI --netcdf overrides a namelist that says no
        (tmp_path / f"run_results.{cfg.run_label}.nc").unlink()
        written = runner.finalize_outputs(cfg, res, wall, force_netcdf=True)
        assert written == [f"run_results.{cfg.run_label}.nc"]
    finally:
        os.chdir(cwd)


def test_ray_results_list_parsed_from_mpex_input():
    """The MPEX example input's &ray_results_list flags land in Config
    (rays.in:67-69 sets write_results_netCDF=.true.) — so running that
    example unmodified produces the netCDF the reference would."""
    from rays_tpu.config import schema

    rays_in = ("/root/reference/examples_RAYS/MPEX_examples/"
               "MPX_2nd_harm_11_rays_nz_delta_d_0.05_psiP_0.05/rays.in")
    if not os.path.isfile(rays_in):
        pytest.skip("MPEX example unavailable")
    cfg, _ = schema.from_file(rays_in)
    assert cfg.write_results_netcdf is True
    assert cfg.write_results_list_directed is False


def test_namelist_catalog_cannot_drift():
    """The docs catalog's group set equals the set of groups the importers
    actually accept, extracted from their source AST (VERDICT r4 weak #5:
    the hand-maintained catalog had already dropped
    eqdsk_magnetics_lin_interp_list)."""
    from rays_tpu.utils.doc_modules import (NAMELIST_CATALOG,
                                            accepted_namelist_groups)

    accepted = accepted_namelist_groups()
    catalog = {g.lower() for g in NAMELIST_CATALOG}
    assert accepted - catalog == set(), (
        f"groups the code accepts but the catalog omits: "
        f"{sorted(accepted - catalog)}")
    assert catalog - accepted == set(), (
        f"groups the catalog documents but no importer reads: "
        f"{sorted(catalog - accepted)}")


def test_deposition_registry_covers_geometries():
    from rays_tpu.post import deposition

    assert deposition.profile_names_for_geometry("slab") == ("Ptotal_x",)
    assert deposition.profile_names_for_geometry("solovev") == ("Ptotal_psi",)
    assert deposition.profile_names_for_geometry("multiple_mirror") == (
        "Ptotal_AphiN",)
