"""Measure per-op-class VPU throughput and price the production scan body.

VERDICT r4 weak #2: the claim "the 5.5x single-chip gap is dependency-chain
limited" was evidence-free.  This script replaces it with measurement:

1. microbenchmark each op class (mul/add fma chains, divide, sqrt, rsqrt,
   exp/log, batched tiny dot_general vs broadcast multiply-reduce) at the
   production batch width, inside a lax.scan so the ~25-30 ms tunnel
   dispatch amortizes (the round-4 microbenchmark rule);
2. census the production RK4 scan-body jaxpr by op class;
3. price the body: sum(count_c / rate_c) = predicted step time, compared
   with the measured step time — naming the limiter and giving the honest
   multi-resource roofline (a plain "2055 flops at 1.9 TFLOP/s" treats a
   divide as one flop, which the VPU does not).

Writes artifacts/vpu_roofline.txt.  Run on the TPU chip, alone (shared-chip
contention adds 2-5x noise).
"""

import collections
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

N = 32768          # production bench batch
W = 8              # elements per ray-ish row; N*W lanes per op
ITERS = 300

# each case: (name, n_ops_per_iter_per_elem, body)
# bodies keep a data dependency so nothing hoists/folds


def _chain(op, k=8):
    def body(x, _):
        y = x
        for _ in range(k):
            y = op(y)
        return y, None
    return body, k


def measure(body, n_ops, shape=(N, W), dtype=jnp.float32, iters=ITERS):
    x0 = (jnp.linspace(1.1, 2.3, num=shape[0] * shape[1], dtype=dtype)
          .reshape(shape))
    run = jax.jit(lambda x: jax.lax.scan(body, x, None, length=iters)[0])
    out = run(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(x0)
    jax.block_until_ready(out)
    sec = time.perf_counter() - t0
    total_ops = shape[0] * shape[1] * n_ops * iters
    return total_ops / sec


def main():
    rates = {}

    body, k = _chain(lambda y: y * 1.0000001 + 1e-9)          # fma chain
    rates["fma"] = measure(body, k)
    body, k = _chain(lambda y: y * 1.0000001)
    rates["mul"] = measure(body, k)
    body, k = _chain(lambda y: 2.5 / (y + 1.0))
    rates["div"] = measure(body, k)
    body, k = _chain(lambda y: jnp.sqrt(y + 1.0))
    rates["sqrt"] = measure(body, k)
    body, k = _chain(lambda y: jax.lax.rsqrt(y + 1.0) + 1.0)
    rates["rsqrt"] = measure(body, k)
    body, k = _chain(lambda y: jnp.exp(-y) + 1.0)
    rates["exp"] = measure(body, k)
    body, k = _chain(lambda y: jnp.log(y + 1.0) + 1.2)
    rates["log"] = measure(body, k)
    body, k = _chain(lambda y: y ** 3 * 1e-3 + 1.0)           # integer_pow
    rates["integer_pow3"] = measure(body, k)

    # --- ILP sweep: the production body is vmapped over 32768 rays, so
    # every HLO op is a (32768,) vector = 32 vregs, and ops are chained
    # through the physics dependency DAG.  The class rates above run at
    # N*W = 256 vregs/op with an 8-op chain; re-measure the fma chain at
    # narrower widths and DEEPER serial chains to expose the
    # latency-bound regime the scan body actually lives in ---
    ilp = {}
    for w, k_chain in [(8, 8), (1, 8), (1, 64)]:
        body, k = _chain(lambda y: y * 1.0000001 + 1e-9, k=k_chain)
        ilp[f"fma_w{w}_chain{k_chain}"] = measure(body, k, shape=(N, w))
    rates.update(ilp)

    # batched tiny matvec: (3,3) @ (3,) per ray — dot_general under vmap
    M = jnp.linspace(0.5, 1.5, num=N * 9, dtype=jnp.float32).reshape(N, 3, 3)

    def dot_body(x, _):
        y = jax.vmap(jnp.matmul)(M, x)          # (N,3)
        return y * 0.37 + 0.1, None

    x0 = jnp.ones((N, 3), jnp.float32)
    run = jax.jit(lambda x: jax.lax.scan(dot_body, x, None, length=ITERS)[0])
    jax.block_until_ready(run(x0))
    t0 = time.perf_counter()
    jax.block_until_ready(run(x0))
    sec = time.perf_counter() - t0
    # 9 mul + 6 add = 15 flops per ray per iter
    rates["tiny_matvec_dot_general"] = N * 15 * ITERS / sec

    def mr_body(x, _):
        y = jnp.sum(M * x[:, None, :], axis=-1)  # same matvec, mul+reduce
        return y * 0.37 + 0.1, None

    run = jax.jit(lambda x: jax.lax.scan(mr_body, x, None, length=ITERS)[0])
    jax.block_until_ready(run(x0))
    t0 = time.perf_counter()
    jax.block_until_ready(run(x0))
    sec = time.perf_counter() - t0
    rates["tiny_matvec_mul_reduce"] = N * 15 * ITERS / sec

    lines = ["# Measured VPU op-class throughput (ops/s), v5e via axon",
             f"# batch {N}x{W}, {ITERS}-iter scan, f32", ""]
    for k_, v in rates.items():
        lines.append(f"{k_:28s} {v:.4g} ops/s "
                     f"({rates['fma'] / v:.1f}x slower than fma)"
                     if v else f"{k_}: n/a")

    # --- census the production body and price it ---
    from rays_tpu import examples
    from rays_tpu.tracing import rhs as rhs_mod, rk4
    from rays_tpu.tracing import trace as trace_mod

    cfg, params, v0, st, pwr = examples.setup_example()
    cfg = dataclasses.replace(cfg, nstep_max=500, save_trajectory=False)
    p32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    v = v0[0].astype(jnp.float32)
    s = jnp.zeros((), jnp.float32)
    h = jnp.zeros((), jnp.float32)
    f1, _st = rhs_mod.eqn_ray(cfg, p32, s, v)

    def census(jaxpr, counts, mult=1.0):
        import numpy as np
        for eqn in jaxpr.eqns:
            m = mult
            sub = []
            for vv in eqn.params.values():
                if hasattr(vv, "jaxpr"):
                    sub.append(vv.jaxpr if hasattr(vv.jaxpr, "eqns") else vv)
                elif isinstance(vv, (list, tuple)):
                    sub.extend(x.jaxpr for x in vv if hasattr(x, "jaxpr"))
            if eqn.primitive.name == "scan":
                m *= float(eqn.params.get("length", 1))
            for s_ in sub:
                census(s_, counts, m)
            out = eqn.outvars[0].aval
            n = float(np.prod(out.shape)) if out.shape else 1.0
            counts[eqn.primitive.name] += m * n
        return counts

    counts = collections.Counter()
    census(jax.make_jaxpr(
        lambda vv, ff: rk4.rk4_step_carried(cfg, p32, s, vv, h, ff, _st))(
            v, f1).jaxpr, counts)
    census(jax.make_jaxpr(
        lambda vv: rhs_mod.eqn_ray_and_check(cfg, p32, s, vv))(v).jaxpr,
        counts)

    # price each class with its measured rate (per element-op)
    price_map = {
        "mul": "mul", "add": "fma", "sub": "fma", "max": "fma", "min": "fma",
        "neg": "fma", "abs": "fma", "select_n": "fma", "and": "fma",
        "or": "fma", "eq": "fma", "ne": "fma", "lt": "fma", "gt": "fma",
        "ge": "fma", "le": "fma",
        "div": "div", "sqrt": "sqrt", "rsqrt": "rsqrt", "exp": "exp",
        "log": "log", "integer_pow": "integer_pow3",
        "dot_general": "tiny_matvec_dot_general",
        "reduce_sum": "fma", "reduce_prod": "fma", "reduce_max": "fma",
        "reduce_min": "fma",
    }
    lines += ["", "# Production body census (elem-ops per ray per step) "
              "and predicted cost", ""]
    pred = 0.0
    for prim, n in counts.most_common():
        key = price_map.get(prim)
        if key is None:
            continue
        cost = n / rates[key]
        pred += cost
        lines.append(f"{prim:20s} n={n:6.0f}  priced at {key:24s} "
                     f"-> {cost * 1e9:8.3f} ns/ray/step")
    lines.append(f"\npredicted step time (sum of classes, no overlap): "
                 f"{pred * 1e9:.1f} ns/ray/step")
    lines.append(f"predicted rays/s at 500 steps: {1.0 / (pred * 500):.0f}")

    # measured production rate for comparison
    v32, st2, w32 = (jnp.tile(v0.astype(jnp.float32), (N // 3 + 1, 1))[:N],
                     jnp.zeros((N,), jnp.int32),
                     jnp.ones((N,), jnp.float32))
    tracer = jax.jit(
        lambda p, vv, ss, ww: trace_mod.trace_batch(cfg, p, vv, ss, ww))
    jax.block_until_ready(tracer(p32, v32, st2, w32))
    t0 = time.perf_counter()
    jax.block_until_ready(tracer(p32, v32, st2, w32))
    sec = time.perf_counter() - t0
    lines.append(f"measured production rays/s: {N / sec:.0f} "
                 f"({sec / N / 500 * 1e9:.1f} ns/ray/step)")

    text = "\n".join(lines) + "\n"
    print(text)
    with open("artifacts/vpu_roofline.txt", "w") as f:
        f.write(text)


if __name__ == "__main__":
    main()
