"""Multiple-mirror post-processor.

Re-design of reference RAYS_project/post_process_lib/mirror_processor_m.f90
(895 LoC): equilibrium X-Z grid data to netCDF, AphiN radial profiles,
graphics description for the mirror plotter, and the O-X conversion
analysis hookup (the reference's do_OX_conv_analysis option).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rays_tpu.post.xy_curves import XYCurve, write_xy_curves_nc
from rays_tpu.wave import dispersion


def write_eq_xz_grids(cfg, params, n_x=51, n_z=101, out_prefix=None):
    """AphiN/|B|/ne on an (x, z) plane (y = 0) -> netCDF
    (mirror_processor_m.f90 eq XZ grid option)."""
    from scipy.io import netcdf_file

    from rays_tpu.models import base, multiple_mirror as mm

    rmax = float(params.eq.box_rmax)
    zmin, zmax = float(params.eq.box_zmin), float(params.eq.box_zmax)
    xs = np.linspace(-rmax, rmax, n_x)
    zs = np.linspace(zmin, zmax, n_z)

    def one(x, z):
        rvec = jnp.stack([x, jnp.zeros_like(x), z])
        _, _, aphin = mm.magnetics(params.eq, rvec)
        alpha, gamma, bunit, ns, ts, err = base.eq_point_light(cfg, params, rvec)
        return aphin, ns[0] * params.species.n_ref, gamma[0]

    X, Z = np.meshgrid(xs, zs, indexing="ij")
    aphin, ne, ge = (np.asarray(o).reshape(n_x, n_z) for o in jax.jit(
        jax.vmap(one))(jnp.asarray(X.ravel()), jnp.asarray(Z.ravel())))

    fname = (out_prefix or f"eq_XZ_grids.{cfg.run_label}") + ".nc"
    f = netcdf_file(fname, "w")
    try:
        f.createDimension("n_X", n_x)
        f.createDimension("n_Z", n_z)
        v = f.createVariable("X_grid", np.float64, ("n_X",)); v[:] = xs
        v = f.createVariable("Z_grid", np.float64, ("n_Z",)); v[:] = zs
        for name, data in [("AphiN", aphin), ("ne", ne), ("gamma_e", ge)]:
            v = f.createVariable(name, np.float64, ("n_X", "n_Z"))
            v[:] = data
    finally:
        f.close()
    return fname


def write_aphin_profiles(cfg, params, z_reference, n_points=51, out_prefix=None):
    """Radial profiles vs AphiN at the reference z plane
    (mirror_processor_m n_AphiN profiles)."""
    from rays_tpu.models import base, multiple_mirror as mm

    rmax = float(params.eq.box_rmax)
    rs = np.linspace(0.0, rmax, n_points)

    def one(r):
        rvec = jnp.stack([r, jnp.zeros_like(r), jnp.asarray(float(z_reference))])
        _, _, aphin = mm.magnetics(params.eq, rvec)
        alpha, gamma, bunit, ns, ts, err = base.eq_point_light(cfg, params, rvec)
        return aphin, ns[0] * params.species.n_ref, ts[0], alpha[0], gamma[0]

    aphin, ne, te, ae, ge = (np.asarray(o) for o in
                             jax.jit(jax.vmap(one))(jnp.asarray(rs)))
    curves = [
        XYCurve("r", "AphiN", rs, aphin),
        XYCurve("AphiN", "ne", aphin, ne),
        XYCurve("AphiN", "Te", aphin, te),
        XYCurve("AphiN", "alpha_e", aphin, ae),
        XYCurve("AphiN", "gamma_e", aphin, ge),
    ]
    prefix = out_prefix or f"eq_AphiN_profiles.{cfg.run_label}"
    return write_xy_curves_nc(curves, prefix)


def write_graphics_description(cfg, params,
                               path="graphics_description_mirror.dat",
                               num_plot_k_vectors=0, scale_k_vec="True",
                               k_vec_base_length=0.02, set_xy_lim="True"):
    with open(path, "w") as f:
        f.write(f" run_description = {cfg.run_description}\n")
        f.write(f" run_label = {cfg.run_label}\n")
        f.write(f" box_rmax = {float(params.eq.box_rmax)}\n")
        f.write(f" box_zmin = {float(params.eq.box_zmin)}\n")
        f.write(f" box_zmax = {float(params.eq.box_zmax)}\n")
        f.write(f" num_plot_k_vectors = {num_plot_k_vectors}\n")
        f.write(f" scale_k_vec = {scale_k_vec}\n")
        f.write(f" k_vec_base_length = {k_vec_base_length}\n")
        f.write(f" set_XY_lim = {set_xy_lim}\n")
    return path


def process(cfg, params, results, z_reference=None, do_ox_analysis=True):
    out = {}
    out["eq_XZ_grids"] = write_eq_xz_grids(cfg, params)
    zr = z_reference if z_reference is not None else \
        0.5 * (float(params.eq.box_zmin) + float(params.eq.box_zmax))
    out["aphin_profiles"] = write_aphin_profiles(cfg, params, zr)
    out["graphics_description"] = write_graphics_description(cfg, params)
    if do_ox_analysis:
        from rays_tpu.post import ox_conversion

        conv = ox_conversion.ox_conv_analysis(cfg, params, results)
        out["ox_conversion"] = ox_conversion.write_ox_conversion_data(
            conv, cfg.run_label)
        out["n_converted"] = len(conv)
    return out
