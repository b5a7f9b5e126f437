"""Round-4 profiling: where does the mirror-spline trace spend its time?

Breaks the MPEX trace into components and times each on the real chip:
  * full production trace (baseline)
  * trace with damping disabled
  * bare RHS (vmapped eqn_ray) per-eval cost
  * bare check_save per-eval cost
  * bare cell-gather (eval_cell_2d) per-eval cost
  * damping-only per-eval cost
"""
import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import rays_tpu  # noqa: F401
from rays_tpu import examples
from rays_tpu import run as runner
from rays_tpu.tracing import trace as trace_mod
from rays_tpu.tracing import rhs as rhs_mod
from rays_tpu.ops import splines

MPEX_DIR = ("/root/reference/examples_RAYS/MPEX_examples/"
            "MPX_2nd_harm_11_rays_nz_delta_d_0.05_psiP_0.05")
N_RAYS = 8192
N_STEPS = 500


def _cast(tree, dt):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dt)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def _time(fn, *args, n_rep=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_rep


def main():
    cwd = os.getcwd()
    os.chdir(MPEX_DIR)
    try:
        cfg, params, v0, status0, pwr = runner.setup("rays.in")
    finally:
        os.chdir(cwd)
    cfg = dataclasses.replace(cfg, nstep_max=N_STEPS, save_trajectory=False)
    v0, status0, pwr = examples.replicate_rays(v0, status0, pwr, N_RAYS)
    p32, v32, w32 = (_cast(params, jnp.float32), _cast(v0, jnp.float32),
                     _cast(pwr, jnp.float32))

    cells = params.eq.field_cells
    print("field_cells shape:", cells.cells.shape,
          "bytes f32:", cells.cells.size * 4)
    print("cfg damping:", cfg.damping_model, "multi_spec:",
          cfg.multi_spec_damping, "nv:", cfg.nv,
          "solver:", cfg.ode_solver_name)

    # full trace
    tracer = jax.jit(lambda p, v, st, w: trace_mod.trace_batch(cfg, p, v, st, w))
    sec = _time(tracer, p32, v32, status0, w32)
    print(f"full trace f32:          {sec*1e3:8.1f} ms  "
          f"{N_RAYS/sec:10.0f} rays/s")

    # no gradient diagnostics (nv=7)
    cfg_nd = dataclasses.replace(cfg, damping_model="no_damp",
                                 multi_spec_damping=False,
                                 integrate_eq_gradients=False)
    v0_nd = v32[:, :7]
    tracer_nd = jax.jit(
        lambda p, v, st, w: trace_mod.trace_batch(cfg_nd, p, v, st, w))
    sec_nd = _time(tracer_nd, p32, v0_nd, status0, w32)
    print(f"trace nv=7 f32:          {sec_nd*1e3:8.1f} ms  "
          f"{N_RAYS/sec_nd:10.0f} rays/s")

    # bare vmapped RHS: cost of ONE eqn_ray eval per ray
    rhsv = jax.jit(jax.vmap(lambda v: rhs_mod.eqn_ray(cfg, p32, 0.0, v)))
    sec_rhs = _time(rhsv, v32)
    print(f"one eqn_ray (B rays):    {sec_rhs*1e3:8.3f} ms  "
          f"-> x5 evals x {N_STEPS} steps = {sec_rhs*5*N_STEPS*1e3:8.1f} ms")

    rhsv_nd = jax.jit(jax.vmap(lambda v: rhs_mod.eqn_ray(cfg_nd, p32, 0.0, v)))
    sec_rhs_nd = _time(rhsv_nd, v0_nd)
    print(f"one eqn_ray no-damp:     {sec_rhs_nd*1e3:8.3f} ms")

    # bare check_save
    chkv = jax.jit(jax.vmap(lambda v: rhs_mod.check_save(cfg, p32, v)))
    sec_chk = _time(chkv, v32)
    print(f"one check_save (B rays): {sec_chk*1e3:8.3f} ms")

    # bare cell gather
    cells32 = _cast(cells, jnp.float32)
    r = v32[:, 0]
    z = v32[:, 2]
    gat = jax.jit(jax.vmap(lambda rr, zz: splines.eval_cell_2d(cells32, rr, zz)))
    sec_gat = _time(gat, r, z)
    print(f"one eval_cell_2d:        {sec_gat*1e3:8.3f} ms  "
          f"(x10/step = {sec_gat*10*N_STEPS*1e3:8.1f} ms)")

    sec_gat2 = _time(jax.jit(jax.vmap(
        lambda rr, zz: splines.eval_cell_2d_second(cells32, rr, zz))), r, z)
    print(f"one eval_cell_2d_second: {sec_gat2*1e3:8.3f} ms")

    # damping alone
    from rays_tpu.wave import damping as damping_mod
    from rays_tpu.models import base as base_mod

    def damp_one(v):
        eq = base_mod.equilibrium(cfg, p32, v[0:3])
        return damping_mod.damping(cfg, p32, eq, v[0:6], v[3:6])

    sec_damp = _time(jax.jit(jax.vmap(damp_one)), v32)
    print(f"equilibrium+damping:     {sec_damp*1e3:8.3f} ms")

    def eq_only(v):
        return base_mod.equilibrium(cfg, p32, v[0:3])

    sec_eq = _time(jax.jit(jax.vmap(eq_only)), v32)
    print(f"equilibrium alone:       {sec_eq*1e3:8.3f} ms")

    def eql(v):
        return base_mod.eq_point_light(cfg, p32, v[0:3])

    sec_eql = _time(jax.jit(jax.vmap(eql)), v32)
    print(f"eq_point_light alone:    {sec_eql*1e3:8.3f} ms")

    # slab comparison for context
    scfg, sparams, sv0, sst0, spwr = examples.setup_example()
    scfg = dataclasses.replace(scfg, nstep_max=N_STEPS, save_trajectory=False)
    sv0, sst0, spwr = examples.replicate_rays(sv0, sst0, spwr, N_RAYS)
    sp32, sv32, sw32 = (_cast(sparams, jnp.float32), _cast(sv0, jnp.float32),
                       _cast(spwr, jnp.float32))
    stracer = jax.jit(
        lambda p, v, st, w: trace_mod.trace_batch(scfg, p, v, st, w))
    ssec = _time(stracer, sp32, sv32, sst0, sw32)
    print(f"slab trace f32:          {ssec*1e3:8.1f} ms  "
          f"{N_RAYS/ssec:10.0f} rays/s")


if __name__ == "__main__":
    main()
