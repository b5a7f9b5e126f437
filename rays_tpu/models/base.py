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

  err(eq_static, eq_params, species, x) -> int32 StopCode
      Validity checks (bounding box, negative density/temperature),
      evaluated outside the differentiable path.
"""

from __future__ import annotations

from rays_tpu.core.eq_point import EqPoint, RawEq, derive_eq_point, value_and_jacfwd

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


def equilibrium(cfg, params, x) -> EqPoint:
    """Full equilibrium point with gradients (reference equilibrium_m.f90:135)."""
    model = get_eq_model(cfg.equilib_model)

    def f(xx):
        return model.fields(cfg.eq_static, params.eq, params.species, xx)

    (bvec, ns, ts), (jb, jn, jt) = value_and_jacfwd(f, x)
    err = model.err(cfg.eq_static, params.eq, params.species, x)
    # jb[j, i] = dB_j/dx_i  ->  gradb[i, j] convention of the reference
    raw = RawEq(bvec=bvec, gradb=jb.T, ns=ns, gradns=jn, ts=ts, gradts=jt, err=err)
    return derive_eq_point(raw, params.species, params.rf)
