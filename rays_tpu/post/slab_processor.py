"""Slab-geometry post-processor.

Re-design of reference RAYS_project/post_process_lib/slab_processor_m.f90:

* resonance/cutoff scan over x (omega_ce, 2*omega_ce, hybrid S = 0,
  P-cutoff, H-cutoff, determinant zeros; slab_processor_m.f90:354-430) —
  vectorized over the 1000-point x grid with sign-change detection +
  linear-interpolated crossing locations instead of the reference's scalar
  scan loop;
* equilibrium x-profiles to XY-curves netCDF ('eq_X_profiles.<label>.nc',
  :607-722);
* kx(x) dispersion-root profiles for each ray's (ny, nz)
  ('kx_profiles_slab.<label>', :729-769) as XY curves;
* graphics description file 'graphics_description_slab.dat' (:840-866).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rays_tpu.post.xy_curves import XYCurve, write_xy_curves_nc
from rays_tpu.wave import dispersion, stix

N_XPOINTS = 1000  # reference scan resolution (slab_processor_m.f90:381)


def _sign_change_locations(x, v):
    """x locations where v crosses zero (linear interpolation)."""
    s = np.sign(v)
    idx = np.nonzero(s[:-1] * s[1:] < 0)[0]
    x0, x1 = x[idx], x[idx + 1]
    v0, v1 = v[idx], v[idx + 1]
    return x0 - v0 * (x1 - x0) / (v1 - v0)


def scan_quantities(cfg, params, xs, nz):
    """Per-x scan values used for resonance/cutoff detection."""

    def one(x):
        rvec = jnp.stack([x, jnp.zeros_like(x), jnp.zeros_like(x)])
        alpha, gamma, bunit, _ = dispersion.alpha_gamma(
            cfg, params, rvec, params.rf.omgrf)
        S, D, P, R, L = stix.rlsdp(alpha, gamma)
        n3 = nz  # slab restriction: B has no shear, ky = 0 (:361-364)
        v_ce = gamma[0] + 1.0
        v_2ce = gamma[0] + 0.5
        v_hybrid = S
        v_p_cut = P
        # H cutoff: S^2 - D^2 - 2 S nz^2 + nz^4  (= (nz^2-R)(nz^2-L))
        v_h_cut = S**2 - D**2 - 2.0 * S * n3**2 + n3**4
        a = S
        b = -R * L - P * S + n3**2 * (P + S)
        c = P * (n3**2 - R) * (n3**2 - L)
        v_det = b**2 - 4.0 * a * c
        return jnp.stack([v_ce, v_2ce, v_hybrid, v_p_cut, v_h_cut, v_det])

    return jax.jit(jax.vmap(one))(xs)


def find_res_and_cuts(cfg, params, rindex_vec0, write_file=True):
    """Per-ray resonance/cutoff x locations.  Returns a list of dicts;
    optionally writes 'res_and_cut.<run_label>'."""
    xmin, xmax = float(params.eq.xmin), float(params.eq.xmax)
    xs = np.linspace(xmin, xmax, N_XPOINTS)
    names = ["ce_res", "2ce_res", "hybrid_res", "P_cut", "H_cut", "det"]

    results = []
    for iray in range(rindex_vec0.shape[0]):
        nz = float(np.dot(np.asarray(rindex_vec0[iray]), [0.0, 0.0, 1.0]))
        vals = np.asarray(scan_quantities(cfg, params, jnp.asarray(xs),
                                          jnp.float64(nz)))
        entry = {}
        for k, name in enumerate(names):
            entry[name] = _sign_change_locations(xs, vals[:, k])
        results.append(entry)

    if write_file:
        fname = f"res_and_cut.{cfg.run_label}"
        with open(fname, "w") as f:
            for iray, entry in enumerate(results):
                f.write(f"\n ray {iray + 1}\n")
                for name in names:
                    locs = entry[name]
                    f.write(f" {name}: n = {len(locs)}  x = "
                            + " ".join(f"{v:.6f}" for v in locs) + "\n")
    return results


def write_eq_profiles(cfg, params, n_points=101, out_prefix=None):
    """Equilibrium x-profiles as XY curves ('eq_X_profiles.<label>.nc')."""
    from rays_tpu.models import base

    xmin, xmax = float(params.eq.xmin), float(params.eq.xmax)
    xs = np.linspace(xmin, xmax, n_points)

    def one(x):
        rvec = jnp.stack([x, jnp.zeros_like(x), jnp.zeros_like(x)])
        eq = base.equilibrium(cfg, params, rvec)
        alpha, gamma, _, _ = dispersion.alpha_gamma(
            cfg, params, rvec, params.rf.omgrf)
        return eq.ns[0] * params.species.n_ref, eq.bmag, eq.ts[0], alpha[0], gamma[0]

    ne, bmag, te, ae, ge = (np.asarray(o) for o in
                            jax.jit(jax.vmap(one))(jnp.asarray(xs)))
    curves = [
        XYCurve("x", "ne", xs, ne),
        XYCurve("x", "Bmag", xs, bmag),
        XYCurve("x", "Te", xs, te),
        XYCurve("x", "alpha_e", xs, ae),
        XYCurve("x", "gamma_e", xs, ge),
    ]
    prefix = out_prefix or f"eq_X_profiles.{cfg.run_label}"
    return write_xy_curves_nc(curves, prefix)


def write_kx_profiles(cfg, params, rindex_vec0, n_points=201, out_prefix=None):
    """kx(x) for the four cold roots at each ray's (ny, nz)
    ('kx_profiles_slab.<label>.nc' as XY curves)."""
    xmin, xmax = float(params.eq.xmin), float(params.eq.xmax)
    xs = np.linspace(xmin, xmax, n_points)
    k0 = float(params.rf.k0)

    def roots_at(x, ny, nz):
        rvec = jnp.stack([x, jnp.zeros_like(x), jnp.zeros_like(x)])
        alpha, gamma, bunit, _ = dispersion.alpha_gamma(
            cfg, params, rvec, params.rf.omgrf)
        n2 = ny * bunit[2] - nz * bunit[1]
        n3 = ny * bunit[1] + nz * bunit[2]
        roots, evan = dispersion.solve_cold_n1sq_vs_n3(alpha, gamma, n3)
        nxsq = roots - n2**2
        # real kx where propagating; 0 where evanescent
        kx = jnp.where((nxsq >= 0.0) & (~evan), jnp.sqrt(jnp.abs(nxsq)), 0.0) * k0
        return kx

    curves = []
    for iray in range(rindex_vec0.shape[0]):
        ny = float(rindex_vec0[iray, 1])
        nz = float(rindex_vec0[iray, 2])
        kx = np.asarray(jax.jit(jax.vmap(
            lambda x: roots_at(x, jnp.float64(ny), jnp.float64(nz))))(
            jnp.asarray(xs)))
        for k, mode in enumerate(["plus", "minus", "fast", "slow"]):
            curves.append(XYCurve("x", f"kx_{mode}_ray{iray + 1}", xs, kx[:, k]))
    prefix = out_prefix or f"kx_profiles_slab.{cfg.run_label}"
    return write_xy_curves_nc(curves, prefix)


def write_kx_profiles_text(cfg, params, rindex_vec0, n_points=101, path=None):
    """'kx_profiles_slab.<run_label>' in the reference's TEXT layout
    (write_kx_profiles, slab_processor_m.f90:729-827): per ray a
    'ray <i> ny <ny> nz <nz>' line, a column-heading line starting with
    'x', then rows of x and (re, im) kx for the plus/minus/fast/slow
    roots — the file graphics_RAYS/plot_kx_profiles_slab.py parses."""
    xmin, xmax = float(params.eq.xmin), float(params.eq.xmax)
    xs = np.linspace(xmin, xmax, n_points)
    k0 = float(params.rf.k0)

    def roots_at(x, ny, nz):
        rvec = jnp.stack([x, jnp.zeros_like(x), jnp.zeros_like(x)])
        alpha, gamma, bunit, _ = dispersion.alpha_gamma(
            cfg, params, rvec, params.rf.omgrf)
        n2 = ny * bunit[2] - nz * bunit[1]
        n3 = ny * bunit[1] + nz * bunit[2]
        roots, evan = dispersion.solve_cold_n1sq_vs_n3(alpha, gamma, n3)
        nxsq = roots - n2**2
        re = jnp.sqrt(jnp.maximum(nxsq, 0.0)) * k0
        im = jnp.sqrt(jnp.maximum(-nxsq, 0.0)) * k0
        return re, im

    names = ("x", "kx_real_plus", "kx_im_plus", "kx_real_minus",
             "kx_im_minus", "kx_real_fast", "kx_im_fast", "kx_real_slow",
             "kx_im_slow")
    fname = path or f"kx_profiles_slab.{cfg.run_label}"
    with open(fname, "w") as f:
        for iray in range(rindex_vec0.shape[0]):
            ny = float(rindex_vec0[iray, 1])
            nz = float(rindex_vec0[iray, 2])
            re, im = (np.asarray(o) for o in jax.jit(jax.vmap(
                lambda x: roots_at(x, jnp.float64(ny), jnp.float64(nz))))(
                jnp.asarray(xs)))
            f.write(f" ray {iray + 1} ny {ny:.6g} nz {nz:.6g}\n")
            f.write(" " + " ".join(names) + "\n")
            for i, x in enumerate(xs):
                row = [x]
                for k in range(4):  # plus, minus, fast, slow
                    row.extend([re[i, k], im[i, k]])
                f.write(" " + " ".join(f"{v:.9g}" for v in row) + "\n")
    return fname


def write_graphics_description(cfg, params, path="graphics_description_slab.dat",
                               num_plot_k_vectors=5, scale_k_vec="max_len",
                               k_vec_base_length=0.05, set_xy_lim="true"):
    """Plotter hand-off file (slab_processor_m.f90:840-866)."""
    with open(path, "w") as f:
        f.write(f" run_description = {cfg.run_description}\n")
        f.write(f" run_label = {cfg.run_label}\n")
        f.write(f" xmin = {float(params.eq.xmin)}\n")
        f.write(f" xmax = {float(params.eq.xmax)}\n")
        f.write(f" ymin = {float(params.eq.ymin)}\n")
        f.write(f" ymax = {float(params.eq.ymax)}\n")
        f.write(f" zmin = {float(params.eq.zmin)}\n")
        f.write(f" zmax = {float(params.eq.zmax)}\n")
        f.write(f" num_plot_k_vectors = {num_plot_k_vectors}\n")
        f.write(f" scale_k_vec = {scale_k_vec}\n")
        f.write(f" k_vec_base_length = {k_vec_base_length}\n")
        f.write(f" set_XY_lim = {set_xy_lim}\n")
    return path


def process(cfg, params, results, rindex_vec0, knobs=None):
    """Full slab post-processing pass (the RAYS_P / post_process_RAYS
    equivalent for slab geometry).  ``knobs`` carries the
    &slab_processor_list namelist group (slab_processor_m.f90:56-59):
    plot-vector controls into the graphics description, ``n_X`` as the
    equilibrium-profile grid size, ``write_eq_X_profile_data`` as the
    profile-file gate."""
    k = {str(a).lower(): b for a, b in (knobs or {}).items()}
    out = {}
    out["res_and_cuts"] = find_res_and_cuts(cfg, params, rindex_vec0)
    if bool(k.get("write_eq_x_profile_data", True)):
        out["eq_profiles"] = write_eq_profiles(
            cfg, params, n_points=int(k.get("n_x", 101)))
    out["kx_profiles"] = write_kx_profiles(cfg, params, rindex_vec0)
    out["kx_profiles_text"] = write_kx_profiles_text(cfg, params, rindex_vec0)
    out["graphics_description"] = write_graphics_description(
        cfg, params,
        num_plot_k_vectors=int(k.get("num_plot_k_vectors", 5)),
        scale_k_vec=str(k.get("scale_k_vec", "max_len")),
        k_vec_base_length=float(k.get("k_vec_base_length", 0.05)),
        set_xy_lim=str(k.get("set_xy_lim", "true")),
    )
    return out
