"""In-scan microbenchmarks: loop each component 500x inside lax.scan so the
tunnel round-trip amortizes; subtract a null-scan baseline."""
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


def scan_bench(name, per_iter, init, null_sec=0.0):
    """Time a 500-iteration scan whose body applies per_iter to the carry."""
    def body(c, _):
        return per_iter(c), None

    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=N_STEPS)[0])
    sec = _time(f, init)
    print(f"{name:34s} {sec*1e3:9.1f} ms  "
          f"({(sec-null_sec)*1e3/N_STEPS:7.4f} ms/iter net)")
    return sec


def main():
    cwd = os.getcwd()
    os.chdir(MPEX_DIR)
    try:
        cfg, params, v0, status0, pwr = runner.setup("rays.in")
    finally:
        os.chdir(cwd)
    cfg = dataclasses.replace(cfg, nstep_max=N_STEPS, save_trajectory=False)
    v0, status0, pwr = examples.replicate_rays(v0, status0, pwr, N_RAYS)
    p32, v32 = _cast(params, jnp.float32), _cast(v0, jnp.float32)
    cells32 = p32.eq.field_cells

    # null scan: carry passes through with one add
    null = scan_bench("null scan (+1)", lambda v: v + 1e-12, v32)

    vg = jax.vmap(lambda rr, zz: splines.eval_cell_2d(cells32, rr, zz),
                  in_axes=(0, 0))

    def g1v(v):
        f, fx, fy = vg(v[:, 0], v[:, 2])
        return v + 1e-12 * (f.sum(-1) + fx.sum(-1) + fy.sum(-1))[:, None]

    scan_bench("1x eval_cell_2d (vmap)", g1v, v32, null)

    def g10(v):
        out = 0.0
        for i in range(10):
            f, fx, fy = vg(v[:, 0] + i * 1e-9, v[:, 2])
            out = out + f.sum(-1) + fx.sum(-1) + fy.sum(-1)
        return v + 1e-12 * out[:, None]

    scan_bench("10x eval_cell_2d (vmap)", g10, v32, null)

    # one vmapped eqn_ray per iteration
    def r1(v):
        dvds, st = jax.vmap(lambda vv: rhs_mod.eqn_ray(cfg, p32, 0.0, vv))(v)
        return v + 1e-12 * dvds

    scan_bench("1x eqn_ray", r1, v32, null)

    # one vmapped check_save per iteration
    def c1(v):
        resid, st = jax.vmap(lambda vv: rhs_mod.check_save(cfg, p32, vv))(v)
        return v + 1e-12 * resid[:, None]

    scan_bench("1x check_save", c1, v32, null)

    # raw gather only (indexing, no polynomial): cells[i, j]
    def graw(v):
        tx = (v[:, 0] - cells32.x0) / cells32.dx
        ty = (v[:, 2] - cells32.y0) / cells32.dy
        i = jnp.clip(tx.astype(jnp.int32), 0, cells32.cells.shape[0] - 1)
        j = jnp.clip(ty.astype(jnp.int32), 0, cells32.cells.shape[1] - 1)
        c = cells32.cells[i, j]          # (B, 3, 4, 4)
        return v + 1e-12 * c.sum((1, 2, 3))[:, None]

    scan_bench("raw 2d-index gather (B,3,4,4)", graw, v32, null)

    # flattened 1-D gather
    flat = cells32.cells.reshape(-1, 48)

    def gflat(v):
        tx = (v[:, 0] - cells32.x0) / cells32.dx
        ty = (v[:, 2] - cells32.y0) / cells32.dy
        i = jnp.clip(tx.astype(jnp.int32), 0, cells32.cells.shape[0] - 1)
        j = jnp.clip(ty.astype(jnp.int32), 0, cells32.cells.shape[1] - 1)
        lin = i * cells32.cells.shape[1] + j
        c = flat[lin]                     # (B, 48)
        return v + 1e-12 * c.sum(-1)[:, None]

    scan_bench("flat 1d-index gather (B,48)", gflat, v32, null)

    # take_along_axis variant
    def gtake(v):
        tx = (v[:, 0] - cells32.x0) / cells32.dx
        ty = (v[:, 2] - cells32.y0) / cells32.dy
        i = jnp.clip(tx.astype(jnp.int32), 0, cells32.cells.shape[0] - 1)
        j = jnp.clip(ty.astype(jnp.int32), 0, cells32.cells.shape[1] - 1)
        lin = i * cells32.cells.shape[1] + j
        c = jnp.take(flat, lin, axis=0)
        return v + 1e-12 * c.sum(-1)[:, None]

    scan_bench("jnp.take gather (B,48)", gtake, v32, null)

    # arithmetic-only: same op count as the slab RHS roughly
    def arith(v):
        x = v
        for _ in range(50):
            x = x * 1.0000001 + 1e-9
        return x

    scan_bench("50 fma on (B,12)", arith, v32, null)


if __name__ == "__main__":
    main()
