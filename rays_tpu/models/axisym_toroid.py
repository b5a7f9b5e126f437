"""Generic axisymmetric toroidal (tokamak) equilibrium.

Re-design of reference RAYS_project/RAYS_lib/axisym_toroid_eq_m.f90: a
magnetics backend (analytic Solovev or splined EQDSK) provides B and the
poloidal flux; density/temperature profiles are functions of normalized
flux psiN with scrape-off floors outside psiN = 1
(axisym_toroid_eq_m.f90:215-363).

Magnetics backends:
  * 'solovev_magnetics' — the same closed-form field as models/solovev,
    factored behind the magnetics interface
    (reference solovev_magnetics_m.f90).
  * 'eqdsk_magnetics_spline_interp' — 2-D cubic spline of psi(R, Z) and a
    1-D spline of R*Bphi(R) built from a G-EQDSK file, with
    B = (psi_Z/R, -psi_R/R, RBphi/R) in cylindrical components
    (reference eqdsk_magnetics_spline_interp_m.f90:206-283).  Psi is
    shifted to zero on axis at load (ibid.:176-179).

All field derivatives (gradbtensor etc.) come from autodiff of `fields` in
models/base.py — for the spline backend this differentiates the bicubic
polynomial exactly, reproducing the reference's eval_2D_fpp second
derivatives.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Any, NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from rays_tpu.models import base, profiles, solovev as solovev_mod
from rays_tpu.ops import splines
from rays_tpu.tracing.stop import StopCode


@dataclasses.dataclass(frozen=True)
class AxisymToroidStatic:
    magnetics_model: str = "solovev_magnetics"
    density_prof_model: str = "parabolic"
    temperature_prof_model: Tuple[str, ...] = ("zero",)


class SolovevMagParams(NamedTuple):
    rmaj: Any
    kappa: Any
    bphi0: Any
    iota0: Any
    outer_bound: Any


class EqdskMagParams(NamedTuple):
    psi_spline: Any    # Spline2D of psi(R, Z), shifted to 0 on axis
    rbphi_spline: Any  # Spline1D of R*Bphi on the R grid
    psib: Any          # PSIBOUND - PSIAXIS
    # flux-coordinate profile splines (reference
    # eqdsk_magnetics_spline_interp_m.f90:183-199): Q and rho = sqrt of
    # normalized toroidal flux on the uniform psiN grid, plus the inverse
    # map psiN(rho) on the matching uniform rho grid
    q_spline: Any = None        # Spline1D of Q(psiN)
    rho_spline: Any = None      # Spline1D of rho(psiN)
    tflux_spline: Any = None    # Spline1D of toroidal flux(psiN), unnormalized
    psin_rho_spline: Any = None  # Spline1D of psiN(rho)
    # per-cell coefficient form of psi (ops/splines.CellSpline2D): value +
    # first derivatives from ONE gather instead of 16 per table — the
    # production eval path; None falls back to eval_2d_fp
    psi_cells: Any = None


class EqdskLinMagParams(NamedTuple):
    """Linear/finite-difference EQDSK magnetics — the reference's accuracy
    A/B for the spline backend (eqdsk_magnetics_lin_interp_m.f90:2-6):
    bilinear psi interpolation (eqdsk_utilities_m.f90:144-162) with central
    finite differences at half-grid offsets dR = h_R/2, dZ = h_Z/2
    (:190-306, offsets set at lin_interp init :125-126).

    Two deliberate divergences from the reference, both documented upstream
    inconsistencies:
      * B sign convention follows the spline backend (br = psi_z/R,
        bz = -psi_R/R, eqdsk_magnetics_spline_interp_m.f90:238-240); the
        reference's lin backend flips both signs
        (eqdsk_magnetics_lin_interp_m.f90:172-173) so its two backends
        disagree on the same file.
      * gradbtensor comes from autodiff of the FD-built B (the natural
        3-point second-difference); the reference's GetPsiRR/ZZ divide the
        +-2dR stencil by dR^2 instead of (2dR)^2 — a 4x overestimate
        (eqdsk_utilities_m.f90:229-265).
    """

    r0: Any
    dr: Any
    z0: Any
    dz: Any
    psi: Any    # (nr, nz), shifted to 0 on axis
    T: Any      # (nr,) R*Bphi on the R grid
    psib: Any
    rho_spline: Any = None  # rho machinery is spline-backend-only


class AxisymToroidParams(NamedTuple):
    mag: Any                 # SolovevMagParams | EqdskMagParams
    plasma_psi_limit: Any
    # density
    alphan1: Any
    alphan2: Any
    d_scrape_off: Any
    ne_knots: Any            # (K,) normalized ne(psiN) values or None
    # temperature
    alphat1: Any             # (S,)
    alphat2: Any             # (S,)
    t_scrape_off: Any
    te_knots: Any            # (K,) normalized Te(psiN) or None
    ti_knots: Any            # (K,) normalized Ti(psiN) or None
    # bounding box
    box_rmin: Any
    box_rmax: Any
    box_zmin: Any
    box_zmax: Any


def _solovev_view(mag: SolovevMagParams):
    """Adapt the magnetics params to the models/solovev helpers."""
    return solovev_mod.SolovevParams(
        rmaj=mag.rmaj, kappa=mag.kappa, bphi0=mag.bphi0, iota0=mag.iota0,
        outer_bound=mag.outer_bound,
        alphan1=0.0, alphan2=0.0, alphat1=0.0, alphat2=0.0,
        box_rmin=0.0, box_rmax=0.0, box_zmin=0.0, box_zmax=0.0,
    )


def _bilinear(x0, dx, y0, dy, F, x, y):
    """Bilinear interpolation on a uniform grid (eqdsk_utilities_m.f90:
    144-162), cell-clamped for safe extrapolation outside the box."""
    nx, ny = F.shape
    tx = (x - x0) / dx
    ty = (y - y0) / dy
    i = jnp.clip(jnp.floor(tx).astype(jnp.int32), 0, nx - 2)
    j = jnp.clip(jnp.floor(ty).astype(jnp.int32), 0, ny - 2)
    u = tx - i.astype(tx.dtype)
    v = ty - j.astype(ty.dtype)
    return (F[i, j] * (1.0 - u) * (1.0 - v) + F[i + 1, j] * u * (1.0 - v)
            + F[i, j + 1] * (1.0 - u) * v + F[i + 1, j + 1] * u * v)


def _linear_1d(x0, dx, f, x):
    """Linear interpolation (GetRBphi, eqdsk_utilities_m.f90:168-184)."""
    n = f.shape[0]
    t = (x - x0) / dx
    i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2)
    u = t - i.astype(t.dtype)
    return f[i] * (1.0 - u) + f[i + 1] * u


def magnetics(static: AxisymToroidStatic, p: AxisymToroidParams, rvec):
    """(bvec_xyz, psi, psiN) at rvec."""
    x, y, z = rvec[0], rvec[1], rvec[2]
    r = jnp.maximum(jnp.sqrt(x**2 + y**2), 1e-12)

    if static.magnetics_model == "solovev_magnetics":
        sv = _solovev_view(p.mag)
        br, bz, bphi = solovev_mod.b_cylindrical(sv, rvec)
        psi, _, psiN, _ = solovev_mod.psi(sv, rvec)
    elif static.magnetics_model == "eqdsk_magnetics_spline_interp":
        if p.mag.psi_cells is not None:
            # channel 0: psi(R,Z); channel 1: RBphi(R) folded into the
            # same cell fetch (build_cell_spline_2d x_splines)
            fv, fr, fz = splines.eval_cell_2d(p.mag.psi_cells, r, z)
            psi, psi_r, psi_z = fv[0], fr[0], fz[0]
            rbphi = fv[1]
        else:
            psi, psi_r, psi_z = splines.eval_2d_fp(p.mag.psi_spline, r, z)
            rbphi = splines.eval_1d(p.mag.rbphi_spline, r)
        br = psi_z / r
        bz = -psi_r / r
        bphi = rbphi / r
        psiN = psi / p.mag.psib
    elif static.magnetics_model == "eqdsk_magnetics_lin_interp":
        # bilinear + central FD: the independent accuracy A/B
        # (see EqdskLinMagParams docstring)
        m = p.mag
        dR, dZ = m.dr / 2.0, m.dz / 2.0
        getpsi = lambda rr, zz: _bilinear(m.r0, m.dr, m.z0, m.dz, m.psi, rr, zz)
        psi = getpsi(r, z)
        psi_r = (getpsi(r + dR, z) - getpsi(r - dR, z)) / (2.0 * dR)
        psi_z = (getpsi(r, z + dZ) - getpsi(r, z - dZ)) / (2.0 * dZ)
        rbphi = _linear_1d(m.r0, m.dr, m.T, r)
        br = psi_z / r
        bz = -psi_r / r
        bphi = rbphi / r
        psiN = psi / m.psib
    else:
        raise ValueError(f"unknown magnetics model {static.magnetics_model}")

    bvec = jnp.stack([
        br * x / r - bphi * y / r,
        br * y / r + bphi * x / r,
        bz,
    ])
    return bvec, psi, psiN


def psi_and_grad(static, p: AxisymToroidParams, rvec):
    """(psi, gradpsi, psiN, gradpsiN) — reference axisym_toroid_psi
    (axisym_toroid_eq_m.f90:366+)."""
    import jax

    f = lambda xx: magnetics(static, p, xx)[1]
    psi, gradpsi = jax.value_and_grad(f)(rvec)
    if static.magnetics_model == "solovev_magnetics":
        psib = solovev_mod.psi_boundary(_solovev_view(p.mag))
    else:
        psib = p.mag.psib
    return psi, gradpsi, psi / psib, gradpsi / psib


def q_of_psiN(p: AxisymToroidParams, psiN):
    """(Q, dQ/dpsiN) from the EQDSK Q spline (reference
    eqdsk_magnetics_spline_interp_Q_psiN, eqdsk_magnetics_spline_interp_m
    .f90:355-365)."""
    return splines.eval_1d_fp(p.mag.q_spline, psiN)


def _require_rho(p: AxisymToroidParams):
    if getattr(p.mag, "rho_spline", None) is None:
        raise ValueError(
            "rho coordinate maps unavailable: the EQDSK file carries no "
            "usable Q profile (e.g. Solovev-generated files write Q=0, "
            "matching reference solovev_2_eqdsk.f90:90)")


def rho_of_psiN(p: AxisymToroidParams, psiN):
    """(rho, drho/dpsiN), rho = sqrt(normalized toroidal flux) (reference
    …_rho_PsiN, eqdsk_magnetics_spline_interp_m.f90:368-378)."""
    _require_rho(p)
    return splines.eval_1d_fp(p.mag.rho_spline, psiN)


def psiN_of_rho(p: AxisymToroidParams, rho):
    """(psiN, dpsiN/drho) inverse coordinate map (reference …_PsiN_rho,
    eqdsk_magnetics_spline_interp_m.f90:380-390)."""
    _require_rho(p)
    return splines.eval_1d_fp(p.mag.psin_rho_spline, rho)


def rho_and_grad(static, p: AxisymToroidParams, rvec):
    """(rho, gradrho) at a spatial point — reference axisym_toroid_rho
    (axisym_toroid_eq_m.f90:399-437) / eqdsk_magnetics_spline_interp_rho
    (:325-352).  Only defined for the EQDSK spline magnetics backend (the
    reference's solovev/lin-interp branches are commented out and fatal)."""
    if p.mag.__class__ is not EqdskMagParams or p.mag.rho_spline is None:
        raise ValueError(
            "axisym_toroid_rho: only available for eqdsk_magnetics_"
            "spline_interp (as in the reference)")
    _, _, psiN, gradpsiN = psi_and_grad(static, p, rvec)
    rho, drho_dpsiN = rho_of_psiN(p, psiN)
    return rho, gradpsiN * drho_dpsiN


def _spline_profile(knots, psiN, floor):
    """Normalized spline profile of psiN on a uniform [0, 1] knot grid with
    constant scrape-off outside psiN > 1
    (density_spline_interp_m.f90:2-15)."""
    sp = splines.Spline1D(
        x0=jnp.asarray(0.0), dx=jnp.asarray(1.0 / (knots.shape[-1] - 1)),
        f=knots[0], m=knots[1])
    inside = psiN <= 1.0
    val = splines.eval_1d(sp, jnp.clip(psiN, 0.0, 1.0))
    return jnp.where(inside, val, floor)


def fields(static: AxisymToroidStatic, p: AxisymToroidParams, species, rvec):
    bvec, psi, psiN = magnetics(static, p, rvec)

    n0s, t0s = species.n0s, species.t0s
    m = static.density_prof_model
    if m == "constant":
        ns = n0s
    elif m == "parabolic":
        f, _ = profiles.parabolic(psiN, p.d_scrape_off, p.alphan1, p.alphan2)
        ns = n0s * f
    elif m == "density_spline_interp":
        ns = n0s * _spline_profile(p.ne_knots, psiN, p.d_scrape_off)
    else:
        raise ValueError(f"axisym_toroid: invalid density_prof_model {m}")

    ts_list = []
    for i, tm in enumerate(static.temperature_prof_model):
        if tm == "zero":
            ts_list.append(jnp.zeros_like(psiN))
        elif tm == "constant":
            ts_list.append(t0s[i] * jnp.ones_like(psiN))
        elif tm == "parabolic":
            f, _ = profiles.parabolic(psiN, p.t_scrape_off, p.alphat1[i],
                                      p.alphat2[i])
            ts_list.append(t0s[i] * f)
        elif tm == "temperature_spline_interp":
            knots = p.te_knots if i == 0 else p.ti_knots
            ts_list.append(t0s[i] * _spline_profile(knots, psiN, p.t_scrape_off))
        else:
            raise ValueError(f"axisym_toroid: invalid temperature_prof_model {tm}")
    ts = jnp.stack(ts_list)
    return bvec, ns, ts


def _spline_profile_fp(knots, psiN, floor):
    """(f, df/dpsiN) of _spline_profile — derivative zero in the clipped
    scrape-off region, matching what AD produces through the clip/where."""
    sp = splines.Spline1D(
        x0=jnp.asarray(0.0), dx=jnp.asarray(1.0 / (knots.shape[-1] - 1)),
        f=knots[0], m=knots[1])
    inside = psiN <= 1.0
    in_clip = (psiN >= 0.0) & inside
    val, der = splines.eval_1d_fp(sp, jnp.clip(psiN, 0.0, 1.0))
    return (jnp.where(inside, val, floor),
            jnp.where(in_clip, der, 0.0))


def _profile_fp(model, knots, psiN, floor, alpha1, alpha2):
    if model == "constant":
        return jnp.ones_like(psiN), jnp.zeros_like(psiN)
    if model == "zero":
        return jnp.zeros_like(psiN), jnp.zeros_like(psiN)
    if model == "parabolic":
        return profiles.parabolic(psiN, floor, alpha1, alpha2)
    if model in ("density_spline_interp", "temperature_spline_interp"):
        return _spline_profile_fp(knots, psiN, floor)
    raise ValueError(f"axisym_toroid: no analytic derivative for {model}")


_ANALYTIC_PROFILES = ("constant", "zero", "parabolic",
                      "density_spline_interp", "temperature_spline_interp")


def supports_analytic_jac(static: AxisymToroidStatic,
                          p: AxisymToroidParams) -> bool:
    return (static.magnetics_model == "eqdsk_magnetics_spline_interp"
            and getattr(p.mag, "psi_cells", None) is not None
            and static.density_prof_model in _ANALYTIC_PROFILES
            and all(t in _ANALYTIC_PROFILES
                    for t in static.temperature_prof_model))


def fields_and_jac(static: AxisymToroidStatic, p: AxisymToroidParams,
                   species, rvec):
    """Values AND spatial jacobians of (bvec, ns, ts) for the EQDSK-spline
    backend from ONE psi-coefficient gather (incl. second derivatives) —
    the analytic fast path used by base.equilibrium.  B = (grad psi x
    phihat)/R + (R Bphi) phihat / R; gradB needs psi_rr/psi_rz/psi_zz,
    which come from the same gathered cell coefficients
    (ops/splines.eval_cell_2d_second).  Layout matches value_and_jacfwd:
    jb[j, i] = dB_j/dx_i.  Equality with the AD path is rounding-level
    (unit-tested in tests/test_ops.py)."""
    assert supports_analytic_jac(static, p)
    x, y, z = rvec[0], rvec[1], rvec[2]
    r = jnp.maximum(jnp.sqrt(x**2 + y**2), 1e-12)
    cx, cy = x / r, y / r

    fv, fr_, fz_, frr, frz, fzz = splines.eval_cell_2d_second(
        p.mag.psi_cells, r, z)
    psi, psi_r, psi_z = fv[0], fr_[0], fz_[0]
    psi_rr, psi_rz, psi_zz = frr[0], frz[0], fzz[0]
    rbphi, rbphi_r = fv[1], fr_[1]  # RBphi channel of the same cell fetch

    br = psi_z / r
    bz = -psi_r / r
    bphi = rbphi / r
    dbr_dr = psi_rz / r - psi_z / (r * r)
    dbr_dz = psi_zz / r
    dbz_dr = -psi_rr / r + psi_r / (r * r)
    dbz_dz = -psi_rz / r
    dbphi_dr = rbphi_r / r - rbphi / (r * r)

    zero = jnp.zeros_like(r)
    drv = jnp.stack([cx, cy, zero])               # dr/dx_i
    dcx = jnp.stack([(1.0 - cx * cx) / r, -cx * cy / r, zero])
    dcy = jnp.stack([-cx * cy / r, (1.0 - cy * cy) / r, zero])
    dbr = dbr_dr * drv + jnp.stack([zero, zero, dbr_dz])
    dbz = dbz_dr * drv + jnp.stack([zero, zero, dbz_dz])
    dbphi = dbphi_dr * drv                        # dBphi/dz = 0

    bvec = jnp.stack([br * cx - bphi * cy, br * cy + bphi * cx, bz])
    jb = jnp.stack([
        br * dcx + cx * dbr - bphi * dcy - cy * dbphi,
        br * dcy + cy * dbr + bphi * dcx + cx * dbphi,
        dbz,
    ])

    psiN = psi / p.mag.psib
    dpsin = (psi_r * drv + jnp.stack([zero, zero, psi_z])) / p.mag.psib

    n0s, t0s = species.n0s, species.t0s
    f, fp = _profile_fp(static.density_prof_model, p.ne_knots, psiN,
                        p.d_scrape_off, p.alphan1, p.alphan2)
    ns = n0s * f
    jn = n0s[:, None] * fp * dpsin[None, :]

    ts_list, jt_list = [], []
    for i, tm in enumerate(static.temperature_prof_model):
        ft, ftp = _profile_fp(tm, p.te_knots if i == 0 else p.ti_knots,
                              psiN, p.t_scrape_off,
                              p.alphat1[i], p.alphat2[i])
        ts_list.append(t0s[i] * ft)
        jt_list.append(t0s[i] * ftp * dpsin)
    ts = jnp.stack(ts_list)
    jt = jnp.stack(jt_list)
    return (bvec, ns, ts), (jb, jn, jt)


def geom_err(static: AxisymToroidStatic, p: AxisymToroidParams, rvec):
    """Box + plasma-boundary checks
    (axisym_toroid_eq_m.f90:258-270,291)."""
    x, y, z = rvec[0], rvec[1], rvec[2]
    r = jnp.sqrt(x**2 + y**2)
    _, _, psiN = magnetics(static, p, rvec)
    code = jnp.int32(StopCode.OK)
    code = jnp.where(psiN > p.plasma_psi_limit, jnp.int32(StopCode.OUT_OF_PLASMA), code)
    code = jnp.where((z < p.box_zmin) | (z > p.box_zmax), jnp.int32(StopCode.Z_OUT_OF_BOX), code)
    code = jnp.where((r < p.box_rmin) | (r > p.box_rmax), jnp.int32(StopCode.R_OUT_OF_BOX), code)
    return code


def err(static: AxisymToroidStatic, p: AxisymToroidParams, species, rvec):
    """Full standalone check (geometry + positivity,
    axisym_toroid_eq_m.f90:360-362)."""
    _, ns, ts = fields(static, p, species, rvec)
    from rays_tpu.models.base import _combine_err

    return _combine_err(geom_err(static, p, rvec), ns, ts)


def build_spline_knots(values):
    """Pack a normalized profile knot array as (f, m) rows so the profile is
    a pytree leaf pair usable inside jit (Spline1D rebuilt per eval)."""
    values = np.asarray(values, dtype=np.float64)
    values = values / values[0]
    sp = splines.build_spline_1d(0.0, 1.0 / (len(values) - 1), values)
    return jnp.stack([sp.f, sp.m])


def build_eqdsk_lin_mag_params(path) -> tuple:
    """Load a G-EQDSK file into the bilinear/FD magnetics params (the
    reference's second, lower-order path — eqdsk_magnetics_lin_interp_m
    .f90:101-133).  Returns (EqdskLinMagParams, geqdsk)."""
    from rays_tpu.utils import eqdsk_io

    g = eqdsk_io.read_geqdsk(path)
    rg, zg = g.r_grid, g.z_grid
    return EqdskLinMagParams(
        r0=jnp.asarray(rg[0]), dr=jnp.asarray(rg[1] - rg[0]),
        z0=jnp.asarray(zg[0]), dz=jnp.asarray(zg[1] - zg[0]),
        psi=jnp.asarray(g.psi - g.psiaxis),
        T=jnp.asarray(g.T),
        psib=jnp.asarray(g.psibound - g.psiaxis),
    ), g


def build_eqdsk_mag_params(path) -> tuple:
    """Load a G-EQDSK file into spline magnetics params (host-side).
    Returns (EqdskMagParams, geqdsk) — the raw file object carries the
    bounds/axis info the config layer needs."""
    from rays_tpu.utils import eqdsk_io

    g = eqdsk_io.read_geqdsk(path)
    rg, zg = g.r_grid, g.z_grid
    psi = g.psi - g.psiaxis  # shift psi to 0 on axis (reference :176-179)
    psib = g.psibound - g.psiaxis
    psi_spline = splines.build_spline_2d(rg[0], rg[1] - rg[0],
                                         zg[0], zg[1] - zg[0], psi)
    rbphi_spline = splines.build_spline_1d(rg[0], rg[1] - rg[0], g.T)

    # flux-coordinate splines on the uniform psiN grid (reference
    # eqdsk_magnetics_spline_interp_m.f90:169-199 + calculate_rho_on_psiNgrid
    # :409-439): toroidal flux by cumulative trapezoid of Q over psiN,
    # rho = sqrt(Tflux/Tflux_total); inverse psiN(rho) on the same uniform
    # [0, 1] grid by bisection on the rho spline (:444-470, eps 1e-5).
    #
    # Files that carry no usable Q profile (e.g. the Solovev generator
    # writes Q = 0 exactly, matching reference solovev_2_eqdsk.f90:90) get
    # no rho machinery — reference behavior is that axisym_toroid_rho is
    # unavailable on such backends (axisym_toroid_eq_m.f90:399-437);
    # rho_and_grad / Ptotal_rho refuse cleanly.
    n = len(g.Q)
    dpsiN = 1.0 / (n - 1)
    psiN_grid = np.linspace(0.0, 1.0, n)
    q_spline = splines.build_spline_1d(0.0, dpsiN, g.Q)
    tflux = np.concatenate(
        [[0.0], np.cumsum((g.Q[1:] + g.Q[:-1]) * 0.5 * dpsiN)])
    if tflux[-1] > 0.0 and np.all(np.diff(tflux) > 0.0):
        rho = np.sqrt(tflux / tflux[-1])
        rho_spline = splines.build_spline_1d(0.0, dpsiN, rho)
        tflux_spline = splines.build_spline_1d(0.0, dpsiN, tflux)

        rho_f = lambda pn: np.asarray(
            splines.eval_1d(rho_spline, jnp.asarray(pn)))
        lo, hi = np.zeros(n), np.ones(n)
        for _ in range(40):  # bisection ~1e-12, exceeding the reference's 1e-5
            mid = 0.5 * (lo + hi)
            below = rho_f(mid) < psiN_grid  # target rho values = uniform grid
            lo, hi = np.where(below, mid, lo), np.where(below, hi, mid)
        psin_on_rho = 0.5 * (lo + hi)
        psin_on_rho[0], psin_on_rho[-1] = 0.0, 1.0
        psin_rho_spline = splines.build_spline_1d(0.0, dpsiN, psin_on_rho)
    else:
        rho_spline = tflux_spline = psin_rho_spline = None

    return EqdskMagParams(psi_spline=psi_spline, rbphi_spline=rbphi_spline,
                          psib=jnp.asarray(psib), q_spline=q_spline,
                          rho_spline=rho_spline, tflux_spline=tflux_spline,
                          psin_rho_spline=psin_rho_spline,
                          psi_cells=splines.build_cell_spline_2d(
                              [psi_spline], x_splines=[rbphi_spline])), g


base.register_eq_model("axisym_toroid", sys.modules[__name__])
