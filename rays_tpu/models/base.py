"""Generic equilibrium layer.

The reference dispatches equilibrium models by string at every call
(reference RAYS_project/RAYS_lib/equilibrium_m.f90:177-195).  Here each
model registers two pure functions and dispatch happens once, at trace time:

  fields(eq_static, eq_params, species, x) -> (bvec(3,), ns(S,), ts(S,))
      Smooth, NaN-free everywhere (clipped), differentiable.  This is the
      single source of truth: all spatial gradients — both the eq_point
      gradients and the dD/dx of the ray Hamiltonian — are derived from it
      by autodiff, which replaces the reference's hand-coded gradbtensor /
      gradns / gradts blocks and guarantees the gradient-consistency
      invariant the reference checks numerically (eqn_ray.f90:217-229).

  geom_err(eq_static, eq_params, x) -> int32 StopCode
      Geometry validity checks only (bounding box, outside-plasma) —
      deliberately cheap; the negative-density/temperature checks are
      applied generically from the ns/ts the fields call already produced,
      so the hot path evaluates the equilibrium exactly once.

  err(eq_static, eq_params, species, x) -> int32 StopCode
      Full standalone check (geometry + positivity); used by setup-time
      code (ray init), not the hot loop.
"""

from __future__ import annotations

import jax.numpy as jnp

from rays_tpu.core.eq_point import EqPoint, RawEq, derive_eq_point, value_and_jacfwd
from rays_tpu.tracing.stop import StopCode

EQ_MODELS: dict[str, object] = {}


def register_eq_model(name: str, module) -> None:
    EQ_MODELS[name] = module


def get_eq_model(name: str):
    try:
        return EQ_MODELS[name]
    except KeyError:
        raise KeyError(
            f"unknown equilib_model '{name}'; registered: {sorted(EQ_MODELS)}"
        ) from None


def eq_fields(cfg, params, x):
    """(bvec, ns, ts) at x — the smooth core used inside autodiff."""
    model = get_eq_model(cfg.equilib_model)
    return model.fields(cfg.eq_static, params.eq, params.species, x)


def eq_err(cfg, params, x):
    model = get_eq_model(cfg.equilib_model)
    return model.err(cfg.eq_static, params.eq, params.species, x)


def _combine_err(geom_code, ns, ts):
    """Generic positivity checks layered under the geometry code
    (slab_eq_m.f90:303-306 et al.)."""
    code = jnp.int32(StopCode.OK)
    code = jnp.where(jnp.min(ts) < 0.0, jnp.int32(StopCode.NEGATIVE_TEMP), code)
    code = jnp.where(jnp.min(ns) < 0.0, jnp.int32(StopCode.NEGATIVE_DENS), code)
    return jnp.where(geom_code != 0, geom_code, code)


def eq_point_light(cfg, params, x):
    """Gradient-free plasma state: (alpha, gamma, bunit, ns, ts, err).
    For consumers that don't need spatial gradients (check_save residual,
    ray init) — about 4x less graph than the full equilibrium."""
    model = get_eq_model(cfg.equilib_model)
    bvec, ns, ts = model.fields(cfg.eq_static, params.eq, params.species, x)
    err = _combine_err(model.geom_err(cfg.eq_static, params.eq, x), ns, ts)
    bmag = jnp.sqrt(jnp.sum(bvec**2))
    bunit = bvec / jnp.maximum(bmag, 1e-30)
    sp = params.species
    wratio = params.rf.omgrf_ref / params.rf.omgrf
    alpha = sp.alpha_coef * ns * wratio**2
    gamma = sp.gamma_coef * bmag * wratio
    return alpha, gamma, bunit, ns, ts, err


def equilibrium(cfg, params, x) -> EqPoint:
    """Full equilibrium point with gradients (reference equilibrium_m.f90:135).

    ONE vmapped-jvp evaluation of the model fields provides values and all
    spatial gradients; validity combines the model's cheap geometry check
    with positivity of the already-computed ns/ts.
    """
    model = get_eq_model(cfg.equilib_model)

    if (hasattr(model, "fields_and_jac")
            and model.supports_analytic_jac(cfg.eq_static, params.eq)):
        # model-provided closed-form jacobian (e.g. spline geometries: one
        # coefficient gather yields values + derivatives; the generic
        # jacfwd below replays the gathers once per tangent)
        (bvec, ns, ts), (jb, jn, jt) = model.fields_and_jac(
            cfg.eq_static, params.eq, params.species, x)
    else:
        def f(xx):
            return model.fields(cfg.eq_static, params.eq, params.species, xx)

        (bvec, ns, ts), (jb, jn, jt) = value_and_jacfwd(f, x)
    err = _combine_err(model.geom_err(cfg.eq_static, params.eq, x), ns, ts)
    # jb[j, i] = dB_j/dx_i  ->  gradb[i, j] convention of the reference
    raw = RawEq(bvec=bvec, gradb=jb.T, ns=ns, gradns=jn, ts=ts, gradts=jt, err=err)
    return derive_eq_point(raw, params.species, params.rf)
