"""Benchmark: rays/s/chip for batched RK4 ray tracing of the ECH slab case
at production batch size, in both precisions, forward and forward+adjoint.

Prints ONE JSON line.  The headline metric is the f32 forward trace (the
production precision — tests/test_precision.py bounds its trajectory error
against f64 at ~1e-5 relative over 500 steps); the same line carries the
f64 forward, f64 forward+adjoint (rematerialized scan, SURVEY.md §5.7), and
an XLA-cost-analysis FLOP estimate with the implied hardware utilization.

Baseline note: the reference (ORNL-Fusion/RAYS, Fortran/OpenMP) publishes no
benchmark numbers (BASELINE.md).  ``vs_baseline`` is measured against a
pinned single-core Fortran throughput estimate for the same problem
(500-step ray, ~2 RHS evals/step Adams or 4 RK4, ~1-2 us per equilibrium+
deriv eval on a modern x86 core -> ~1e3 rays/s); this stand-in is recorded
here explicitly so the ratio is reproducible and honest.
"""

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp

import rays_tpu  # noqa: F401
from rays_tpu import examples
from rays_tpu.tracing import trace as trace_mod

BASELINE_RAYS_PER_S = 1.0e3  # pinned single-core Fortran estimate, see above
N_RAYS = int(os.environ.get("RAYS_TPU_BENCH_RAYS", 32768))
N_STEPS = 500
# TPU v5e peak: 197 TFLOP/s bf16 (the MXU number everyone quotes); this
# workload is VPU elementwise math, so "MFU" here is a utilization lower
# bound against the headline peak, reported for honesty not for glory.
PEAK_FLOPS_BF16 = 197e12


def _cast(tree, dt):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dt)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def _time(fn, *args, n_rep=3):
    out = fn(*args)
    jax.block_until_ready(out)  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_rep, out


def main():
    cfg, params, v0, status0, pwr = examples.setup_example()
    cfg = dataclasses.replace(cfg, nstep_max=N_STEPS, save_trajectory=False)
    v0, status0, pwr = examples.replicate_rays(v0, status0, pwr, N_RAYS)

    extra = {}

    # --- forward, f64 and f32 ---
    fwd_times = {}
    for dt, tag in ((jnp.float64, "f64"), (jnp.float32, "f32")):
        p, v, w = _cast(params, dt), _cast(v0, dt), _cast(pwr, dt)
        tracer = jax.jit(
            lambda p, v, st, w: trace_mod.trace_batch(cfg, p, v, st, w))
        sec, _ = _time(tracer, p, v, status0, w)
        fwd_times[tag] = sec
        extra[f"rays_per_s_forward_{tag}"] = round(N_RAYS / sec, 1)

        if tag == "f32":
            # XLA's own FLOP estimate for the compiled forward executable
            try:
                cost = tracer.lower(p, v, status0, w).compile().cost_analysis()
                flops = float(cost.get("flops", 0.0))
                extra["xla_flops_per_batch"] = flops
                extra["flops_per_sec_f32"] = round(flops / sec, 1)
                extra["utilization_vs_bf16_peak"] = round(
                    flops / sec / PEAK_FLOPS_BF16, 6)
            except Exception:  # noqa: BLE001  (cost analysis is best-effort)
                pass

    # --- forward + adjoint (f64, rematerialized scan) ---
    def loss_fn(p, v, st, w):
        res = trace_mod.trace_batch(cfg, p, v, st, w)
        return jnp.sum(res.end_ray_vec[:, 0:3] ** 2 * w[:, None])

    grad_step = jax.jit(jax.value_and_grad(loss_fn))
    sec_adj, (_, grads) = _time(grad_step, params, v0, status0, pwr)
    extra["rays_per_s_adjoint_f64"] = round(N_RAYS / sec_adj, 1)
    extra["adjoint_over_forward_f64"] = round(sec_adj / fwd_times["f64"], 2)

    rays_per_s = N_RAYS / fwd_times["f32"]
    print(json.dumps({
        "metric": "rays_per_s_per_chip_rk4_forward_f32",
        "value": round(rays_per_s, 1),
        "unit": (f"rays/s ({N_RAYS} rays x {N_STEPS} RK4 steps, f32 "
                 f"production precision, slab ECH, "
                 f"{fwd_times['f32']:.3f}s/batch)"),
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
