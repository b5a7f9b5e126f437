"""1-D slab equilibrium: plasma stratified in x, uniform in y, z.

Re-design of reference RAYS_project/RAYS_lib/slab_eq_m.f90.  Profile-model
choices are static (trace-time) config; numbers are traced params.  Field
gradients are NOT hand-coded — they come from autodiff of `fields` (see
models/base.py) which reproduces the reference's analytic gradbtensor /
gradns / gradts for every model below (and fixes two inconsistencies in the
reference, where the linear_2 density/temperature slopes disagree with their
stated gradients, slab_eq_m.f90:247-250,285-288).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Tuple

import jax.numpy as jnp

from rays_tpu.models import base, profiles
from rays_tpu.tracing.stop import StopCode


@dataclasses.dataclass(frozen=True)
class SlabStatic:
    bx_prof_model: str = "zero"
    by_prof_model: str = "zero"
    bz_prof_model: str = "constant"
    dens_prof_model: str = "constant"
    t_prof_model: Tuple[str, ...] = ("zero",)  # per species, len S


class SlabParams(NamedTuple):
    # bounding box [m] (slab_eq_m.f90:35)
    xmin: Any
    xmax: Any
    ymin: Any
    ymax: Any
    zmin: Any
    zmax: Any
    # geometry scales
    rmaj: Any
    rmin: Any
    x0: Any
    # magnetics
    bx0: Any
    by0: Any
    bz0: Any
    lby_shear_scale: Any
    lbz_scale: Any
    dbzdx: Any
    # density
    ln_scale: Any
    dndx: Any
    alphan1: Any
    alphan2: Any
    n_min: Any
    # temperature
    lt_scale: Any
    dtdx: Any
    alphat1: Any  # (S,)
    alphat2: Any  # (S,)
    t_min: Any    # (S,)


def default_params(ns: int) -> SlabParams:
    z = 0.0
    zs = jnp.zeros((ns,))
    return SlabParams(
        xmin=-1.0, xmax=1.0, ymin=-1.0, ymax=1.0, zmin=-1.0, zmax=1.0,
        rmaj=1.0, rmin=0.5, x0=z,
        bx0=z, by0=z, bz0=1.0, lby_shear_scale=1.0, lbz_scale=1.0, dbzdx=z,
        ln_scale=1.0, dndx=z, alphan1=1.0, alphan2=2.0, n_min=z,
        lt_scale=1.0, dtdx=z, alphat1=jnp.ones((ns,)), alphat2=2 * jnp.ones((ns,)),
        t_min=zs,
    )


def fields(static: SlabStatic, p: SlabParams, species, rvec):
    """B, n_s, T_s at rvec (reference slab_eq_m.f90:125-309)."""
    x = rvec[0]

    # --- Bx (slab_eq_m.f90:172-181): only 'zero' is implemented upstream.
    if static.bx_prof_model == "zero":
        bx = jnp.zeros_like(x)
    else:
        raise ValueError(f"slab: invalid bx_prof_model {static.bx_prof_model}")

    # --- By (slab_eq_m.f90:184-206)
    m = static.by_prof_model
    if m == "zero":
        by = jnp.zeros_like(x)
    elif m == "constant":
        by = p.by0 * jnp.ones_like(x)
    elif m == "toroid":
        by = p.by0 / (1.0 + x / p.rmaj)
    elif m == "linear_shear":
        by = p.by0 * x / p.lby_shear_scale
    else:
        raise ValueError(f"slab: invalid by_prof_model {m}")

    # --- Bz (slab_eq_m.f90:209-233)
    m = static.bz_prof_model
    if m == "zero":
        bz = jnp.zeros_like(x)
    elif m == "constant":
        bz = p.bz0 * jnp.ones_like(x)
    elif m == "toroid":
        bz = p.bz0 / (1.0 + x / p.rmaj)
    elif m == "linear":
        bz = p.bz0 * (1.0 + x / p.lbz_scale)
    elif m == "linear_2":
        bz = p.bz0 + p.dbzdx * (x - p.x0)
    else:
        raise ValueError(f"slab: invalid bz_prof_model {m}")

    bvec = jnp.stack([bx, by, bz])

    # --- density (slab_eq_m.f90:237-267)
    n0s = species.n0s
    m = static.dens_prof_model
    if m == "constant":
        ns = n0s
    elif m == "linear":
        ns = n0s * (1.0 + x / p.ln_scale)
    elif m == "linear_2":
        # dndx is a physical slope [m^-3/m]; densities are normalized
        ns = n0s + (p.dndx / species.n_ref) * species.eta * (x - p.x0)
    elif m == "parabolic":
        f, _ = profiles.parabolic(x / p.rmin, p.n_min, p.alphan1, p.alphan2)
        ns = n0s * f
    elif m == "Gaussian":
        ns = n0s * jnp.exp(-3.0 * p.alphan1 * (x / p.rmin) ** 2)
    else:
        raise ValueError(f"slab: invalid dens_prof_model {m}")

    # --- temperature, per species (slab_eq_m.f90:270-301); the model list is
    # static so this unrolls at trace time.
    t0s = species.t0s
    ts_list = []
    for i, tm in enumerate(static.t_prof_model):
        if tm == "zero":
            ts_list.append(jnp.zeros_like(x))
        elif tm == "constant":
            ts_list.append(t0s[i] * jnp.ones_like(x))
        elif tm == "linear":
            ts_list.append(t0s[i] * (1.0 + x / p.lt_scale))
        elif tm == "linear_2":
            ts_list.append(t0s[i] + p.dtdx * (x - p.x0))
        elif tm == "parabolic":
            f, _ = profiles.parabolic(
                (x - p.x0) / p.rmin, p.t_min[i], p.alphat1[i], p.alphat2[i]
            )
            ts_list.append(t0s[i] * f)
        else:
            raise ValueError(f"slab: invalid t_prof_model {tm}")
    ts = jnp.stack(ts_list)

    return bvec, ns, ts


def geom_err(static: SlabStatic, p: SlabParams, rvec):
    """Bounding-box checks (slab_eq_m.f90:162-169); first match wins."""
    x, y, z = rvec[0], rvec[1], rvec[2]
    code = jnp.int32(StopCode.OK)
    # reverse priority order: later assignments are overridden by earlier checks
    code = jnp.where((z < p.zmin) | (z > p.zmax), jnp.int32(StopCode.Z_OUT_OF_BOUNDS), code)
    code = jnp.where((y < p.ymin) | (y > p.ymax), jnp.int32(StopCode.Y_OUT_OF_BOUNDS), code)
    code = jnp.where((x < p.xmin) | (x > p.xmax), jnp.int32(StopCode.X_OUT_OF_BOUNDS), code)
    return code


def err(static: SlabStatic, p: SlabParams, species, rvec):
    """Full standalone validity check (geometry + positivity,
    slab_eq_m.f90:162-169,303-306)."""
    _, ns, ts = fields(static, p, species, rvec)
    from rays_tpu.models.base import _combine_err

    return _combine_err(geom_err(static, p, rvec), ns, ts)


import sys

base.register_eq_model("slab", sys.modules[__name__])
