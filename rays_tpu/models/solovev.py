"""Analytic Solovev tokamak equilibrium.

Re-design of reference RAYS_project/RAYS_lib/solovev_eq_m.f90.  The flux
function in (x, y, z):

    psi = 0.5*bp0 * [ (R z / (rmaj kappa))^2 + (R^2 - rmaj^2)^2 / (4 rmaj^2) ]

with bp0 = bphi0*iota0 (solovev_eq_m.f90:304-318), B from the closed forms
(solovev_eq_m.f90:170-189), and parabolic-in-psiN profiles.  Only the field
values are written here; gradients (gradbtensor etc., solovev_eq_m.f90:
191-204) come from autodiff in models/base.py.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Any, NamedTuple, Tuple

import jax.numpy as jnp

from rays_tpu.models import base, profiles
from rays_tpu.tracing.stop import StopCode


@dataclasses.dataclass(frozen=True)
class SolovevStatic:
    dens_prof_model: str = "parabolic"  # constant | parabolic
    t_prof_model: Tuple[str, ...] = ("zero",)


class SolovevParams(NamedTuple):
    rmaj: Any
    kappa: Any
    bphi0: Any
    iota0: Any
    outer_bound: Any
    # profiles
    alphan1: Any
    alphan2: Any
    alphat1: Any  # (S,)
    alphat2: Any  # (S,)
    # bounding box (R, z)
    box_rmin: Any
    box_rmax: Any
    box_zmin: Any
    box_zmax: Any


def default_params(ns: int) -> SolovevParams:
    return SolovevParams(
        rmaj=1.0, kappa=1.0, bphi0=1.0, iota0=0.5, outer_bound=1.3,
        alphan1=1.0, alphan2=2.0,
        alphat1=jnp.ones((ns,)), alphat2=2 * jnp.ones((ns,)),
        box_rmin=0.05, box_rmax=2.5, box_zmin=-2.0, box_zmax=2.0,
    )


def psi_boundary(p: SolovevParams):
    """Flux at the plasma boundary (solovev_eq_m.f90:89-92)."""
    bp0 = p.bphi0 * p.iota0
    return 0.5 * bp0 * (p.outer_bound**2 - p.rmaj**2) ** 2 / p.rmaj**2 / 4.0


def boundaries(p: SolovevParams):
    """(inner_bound, vert_bound, r_zmax) — solovev_eq_m.f90:94-100."""
    inner = jnp.sqrt(2.0 * p.rmaj**2 - p.outer_bound**2)
    r_zmax = (2.0 * p.outer_bound**2 * p.rmaj**2 - p.outer_bound**4) ** 0.25
    vert = (
        p.kappa / (2.0 * r_zmax)
        * jnp.sqrt(
            p.outer_bound**4
            + 2.0 * (r_zmax**2 - p.outer_bound**2) * p.rmaj**2
            - r_zmax**4
        )
    )
    return inner, vert, r_zmax


def _cyl(rvec, dtype=None):
    x, y, z = rvec[0], rvec[1], rvec[2]
    r = jnp.sqrt(x**2 + y**2)
    r = jnp.maximum(r, jnp.asarray(1e-12, dtype=r.dtype))  # axis guard
    return x, y, z, r


def b_cylindrical(p: SolovevParams, rvec):
    """(br, bz, bphi) at rvec (solovev_eq_m.f90:170-172)."""
    _, _, z, r = _cyl(rvec)
    bp0 = p.bphi0 * p.iota0
    br = -bp0 * r * z / (p.rmaj * p.kappa) ** 2
    bz = bp0 * ((z / (p.rmaj * p.kappa)) ** 2 + 0.5 * ((r / p.rmaj) ** 2 - 1.0))
    bphi = p.bphi0 * p.rmaj / r
    return br, bz, bphi


def psi(p: SolovevParams, rvec):
    """(psi, gradpsi, psiN, gradpsiN) — reference solovev_psi
    (solovev_eq_m.f90:280-322).  gradpsi = (x*bz, y*bz, -R*br)."""
    x, y, z, r = _cyl(rvec)
    bp0 = p.bphi0 * p.iota0
    ps = 0.5 * bp0 * (
        (r * z / (p.rmaj * p.kappa)) ** 2
        + ((r**2 - p.rmaj**2) ** 2) / p.rmaj**2 / 4.0
    )
    br, bz, _ = b_cylindrical(p, rvec)
    gradpsi = jnp.stack([x * bz, y * bz, -r * br])
    psib = psi_boundary(p)
    return ps, gradpsi, ps / psib, gradpsi / psib


def fields(static: SolovevStatic, p: SolovevParams, species, rvec):
    x, y, z, r = _cyl(rvec)
    br, bz, bphi = b_cylindrical(p, rvec)
    # B in fixed (x, y, z) coordinates (solovev_eq_m.f90:187-189)
    bvec = jnp.stack([
        br * x / r - bphi * y / r,
        br * y / r + bphi * x / r,
        bz,
    ])

    _, _, psiN, _ = psi(p, rvec)

    n0s, t0s = species.n0s, species.t0s
    m = static.dens_prof_model
    if m == "constant":
        ns = n0s
    elif m == "parabolic":
        f, _ = profiles.parabolic_psi(psiN, p.alphan1, p.alphan2)
        ns = n0s * f
    else:
        raise ValueError(f"solovev: invalid dens_prof_model {m}")

    ts_list = []
    for i, tm in enumerate(static.t_prof_model):
        if tm == "zero":
            ts_list.append(jnp.zeros_like(psiN))
        elif tm == "constant":
            ts_list.append(t0s[i] * jnp.ones_like(psiN))
        elif tm == "parabolic":
            f, _ = profiles.parabolic_psi(psiN, p.alphat1[i], p.alphat2[i])
            ts_list.append(t0s[i] * f)
        else:
            raise ValueError(f"solovev: invalid t_prof_model {tm}")
    ts = jnp.stack(ts_list)

    return bvec, ns, ts


def geom_err(static: SolovevStatic, p: SolovevParams, rvec):
    """R/z box checks (solovev_eq_m.f90:155-156)."""
    x, y, z = rvec[0], rvec[1], rvec[2]
    r = jnp.sqrt(x**2 + y**2)
    code = jnp.int32(StopCode.OK)
    code = jnp.where((z < p.box_zmin) | (z > p.box_zmax), jnp.int32(StopCode.Z_OUT_OF_BOX), code)
    code = jnp.where((r < p.box_rmin) | (r > p.box_rmax), jnp.int32(StopCode.R_OUT_OF_BOX), code)
    return code


def err(static: SolovevStatic, p: SolovevParams, species, rvec):
    """Full standalone validity check (geometry + positivity)."""
    _, ns, ts = fields(static, p, species, rvec)
    from rays_tpu.models.base import _combine_err

    return _combine_err(geom_err(static, p, rvec), ns, ts)


base.register_eq_model("solovev", sys.modules[__name__])
