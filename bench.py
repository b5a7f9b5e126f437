"""Benchmark: rays/s/chip for a batched RK4 forward trace of the ECH slab
case at production batch size.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference (ORNL-Fusion/RAYS, Fortran/OpenMP) publishes no
benchmark numbers (BASELINE.md).  ``vs_baseline`` is measured against a
pinned single-core Fortran throughput estimate for the same problem
(500-step ray, ~2 RHS evals/step Adams or 4 RK4, ~1-2 us per equilibrium+
deriv eval on a modern x86 core -> ~1e3 rays/s); this stand-in is recorded
here explicitly so the ratio is reproducible and honest.
"""

import json
import time

import jax

import rays_tpu  # noqa: F401
from rays_tpu import examples
from rays_tpu.tracing import trace as trace_mod

BASELINE_RAYS_PER_S = 1.0e3  # pinned single-core Fortran estimate, see above
N_RAYS = int(__import__("os").environ.get("RAYS_TPU_BENCH_RAYS", 32768))
N_STEPS = 500


def main():
    import dataclasses

    cfg, params, v0, status0, pwr = examples.setup_example()
    cfg = dataclasses.replace(
        cfg, nstep_max=N_STEPS, save_trajectory=False
    )
    v0, status0, pwr = examples.replicate_rays(v0, status0, pwr, N_RAYS)

    tracer = jax.jit(
        lambda p, v, st, w: trace_mod.trace_batch(cfg, p, v, st, w)
    )

    # compile + warmup
    res = tracer(params, v0, status0, pwr)
    jax.block_until_ready(res)

    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        res = tracer(params, v0, status0, pwr)
        jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / n_rep

    rays_per_s = N_RAYS / dt
    print(json.dumps({
        "metric": "rays_per_s_per_chip_rk4_forward_f64",
        "value": round(rays_per_s, 2),
        "unit": (f"rays/s ({N_RAYS} rays x {N_STEPS} RK4 steps, f64, "
                 f"slab ECH, {dt:.3f}s/batch)"),
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
