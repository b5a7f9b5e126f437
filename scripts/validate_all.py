"""Sequential end-to-end validation sweep across geometries and physics
options.  Run: python -u scripts/validate_all.py [stage ...]

Stages: slab, damped, solovev, axisym, mpex.  Each stage prints a PASS/FAIL
line; compiles are cached persistently so re-runs are fast.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import rays_tpu  # noqa: F401
from rays_tpu import examples
from rays_tpu.tracing import trace as trace_mod
from rays_tpu.tracing.stop import StopCode


def trace_example(text=None, path=None, **cfg_overrides):
    import dataclasses

    t0 = time.time()
    if path:
        from rays_tpu import run as runner

        cfg, params, v0, st, pwr = runner.setup(path)
    else:
        cfg, params, v0, st, pwr = examples.setup_example(
            text if text is not None else examples.SLAB_ECH_90GHZ)
    if cfg_overrides:
        cfg = dataclasses.replace(cfg, **cfg_overrides)
    tracer = jax.jit(lambda p, v, s, w: trace_mod.trace_batch(cfg, p, v, s, w))
    res = tracer(params, v0, st, pwr)
    jax.block_until_ready(res)
    print(f"  [{time.time()-t0:7.1f}s] nray={v0.shape[0]} nv={cfg.nv} "
          f"npoints={np.asarray(res.npoints)} "
          f"maxres={np.asarray(res.max_residuals).max():.3e} "
          f"flags={sorted(set(np.asarray(res.stop_flag).tolist()))}",
          flush=True)
    return cfg, params, res


def stage_slab():
    print("== slab (RK4, time param) ==", flush=True)
    cfg, params, res = trace_example()
    ok = (np.asarray(res.npoints) == cfg.nstep_max + 1).all() and \
        np.asarray(res.max_residuals).max() < 1e-6
    print("  PASS" if ok else "  FAIL", flush=True)
    return ok


def stage_damped():
    print("== slab damped (fund ECH, multi-spec, deposition) ==", flush=True)
    cfg, params, res = trace_example(examples.SLAB_ECH_DAMPED)
    absorbed = np.asarray(res.end_ray_vec)[:, 7]
    print(f"  total absorption per ray: {absorbed}", flush=True)
    from rays_tpu.post import deposition

    prof = deposition.calculate_deposition_profile(
        cfg, params, res, "Ptotal_x", n_bins=40,
        xmin=float(params.eq.xmin), xmax=float(params.eq.xmax))
    p = np.asarray(prof.profile)
    total_dep = p.sum()
    expected = float(np.sum(np.asarray(res.initial_ray_power) * absorbed))
    print(f"  deposition sum={total_dep:.6f} expected={expected:.6f} "
          f"peak bin={p.argmax()}", flush=True)
    ok = absorbed.max() > 0.5 and abs(total_dep - expected) < 1e-6 * max(1, expected)
    print("  PASS" if ok else "  FAIL", flush=True)
    return ok


def stage_solovev():
    print("== solovev (SG adaptive, arcl) ==", flush=True)
    cfg, params, res = trace_example(examples.SOLOVEV_ECH_90GHZ)
    ok = np.asarray(res.npoints).min() > 10 and \
        np.asarray(res.max_residuals).max() < 1e-5
    print("  PASS" if ok else "  FAIL", flush=True)
    return ok


def stage_axisym():
    print("== axisym toroid (eqdsk spline magnetics) ==", flush=True)
    import tempfile

    from rays_tpu.utils import solovev_2_eqdsk
    from rays_tpu.utils.eqdsk_io import write_geqdsk
    from rays_tpu.config import schema
    from rays_tpu.config.namelist import parse_namelist
    from rays_tpu import run as runner
    from rays_tpu.rayinit import vector as init_vector
    import jax.numpy as jnp

    path = tempfile.mktemp(suffix=".geqdsk")
    write_geqdsk(path, solovev_2_eqdsk.solovev_geqdsk())
    sys.path.insert(0, "tests")
    from test_axisym import AXISYM_TMPL

    cfg, params = schema.from_namelist(parse_namelist(
        AXISYM_TMPL.format(MAG="eqdsk_magnetics_spline_interp", EQDSK=path)))
    rvec0, rindex0, pwr = runner.init_rays(cfg, params)
    v0 = init_vector.initial_ode_vectors(cfg, params, rvec0, rindex0)
    st = jnp.zeros((v0.shape[0],), jnp.int32)
    t0 = time.time()
    res = jax.jit(lambda p, v, s, w: trace_mod.trace_batch(cfg, p, v, s, w))(
        params, v0, st, pwr)
    jax.block_until_ready(res)
    print(f"  [{time.time()-t0:7.1f}s] npoints={np.asarray(res.npoints)} "
          f"maxres={np.asarray(res.max_residuals).max():.3e}", flush=True)
    ok = np.asarray(res.npoints).min() > 5 and \
        np.asarray(res.max_residuals).max() < 1e-4
    print("  PASS" if ok else "  FAIL", flush=True)
    return ok


def stage_mpex():
    print("== MPEX mirror (spline fields, file-input init, eq-grad diag) ==",
          flush=True)
    import os

    d = ("/root/reference/examples_RAYS/MPEX_examples/"
         "MPX_2nd_harm_11_rays_nz_delta_d_0.05_psiP_0.05")
    cwd = os.getcwd()
    os.chdir(d)
    try:
        cfg, params, res = trace_example(path="rays.in")
    finally:
        os.chdir(cwd)
    ok = np.asarray(res.npoints).min() > 5 and \
        np.asarray(res.max_residuals).max() < 1e-2
    print("  PASS" if ok else "  FAIL", flush=True)
    return ok


STAGES = {
    "slab": stage_slab,
    "damped": stage_damped,
    "solovev": stage_solovev,
    "axisym": stage_axisym,
    "mpex": stage_mpex,
}


def main():
    names = sys.argv[1:] or list(STAGES)
    results = {}
    for n in names:
        try:
            results[n] = STAGES[n]()
        except Exception as e:  # noqa: BLE001
            import traceback

            traceback.print_exc()
            results[n] = False
    print("\n=== SUMMARY ===", flush=True)
    for n, ok in results.items():
        print(f"  {n}: {'PASS' if ok else 'FAIL'}", flush=True)
    sys.exit(0 if all(results.values()) else 1)


if __name__ == "__main__":
    main()
