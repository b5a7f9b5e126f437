"""Where does f32 tracing error actually come from?  (VERDICT r4 next #3)

Three measurements on the slab ECH example (500 RK4 steps) against the
f64 scan, written to artifacts/precision_probe.txt:

1. amplification: trace with v0 perturbed by 1e-7 relative, in f64 — if
   the ODE amplified perturbations strongly (chaotic rays), no finite-
   precision trick could help;
2. compensated summation (cfg.compensated_sum): does TwoSumming the
   carry shrink the end error?  (It would if accumulation rounding
   v += dv dominated);
3. bisection: re-run the f32 trace with the equilibrium evaluation and
   the D-derivative chain (deriv_cold) computed internally in f64 — what
   error remains is injected by the f32 *integration arithmetic* itself
   (stage-state quantization), the irreducible floor short of a full
   double-word state.

Round-5 findings (recorded in BASELINE.md): amplification ~3x (not
chaos); compensation changes nothing (1.00x); full-f64 RHS still leaves
~1e-5 — so the floor is stage-state quantization at ulp(f32), and the
1e-9-parity tier rightly stays on the (now cheaper) f64 path.
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from rays_tpu import examples  # noqa: E402
from rays_tpu.models import base as base_mod  # noqa: E402
from rays_tpu.tracing import rhs as rhs_mod  # noqa: E402,F401
from rays_tpu.tracing import trace as trace_mod  # noqa: E402
from rays_tpu.wave import deriv_cold as dc_mod  # noqa: E402

cast32 = lambda t: jax.tree_util.tree_map(
    lambda x: x.astype(jnp.float32)
    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x, t)
cast64 = lambda t: jax.tree_util.tree_map(
    lambda x: x.astype(jnp.float64)
    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x, t)


def main():
    lines = []

    def say(msg):
        print(msg)
        lines.append(msg)

    cfg, params, v0, st, pwr = examples.setup_example()
    cfg = dataclasses.replace(cfg, nstep_max=500, save_trajectory=False)
    tr = lambda c: jax.jit(
        lambda p, v, s, w: trace_mod.trace_batch(c, p, v, s, w))
    ref = np.asarray(tr(cfg)(params, v0, st, pwr).end_ray_vec, np.float64)

    # 1. amplification
    v0p = v0 * (1.0 + 1e-7 * jax.random.normal(jax.random.PRNGKey(0),
                                               v0.shape))
    pert = np.asarray(tr(cfg)(params, v0p, st, pwr).end_ray_vec, np.float64)
    amp = np.abs(pert[:, :6] - ref[:, :6]).max() / np.abs(ref[:, :6]).max()
    say(f"f64 end divergence from 1e-7 v0 perturbation: {amp:.3e} "
        f"(amplification {amp / 1e-7:.1f}x)")

    p32, v32, w32 = cast32(params), v0.astype(jnp.float32), \
        pwr.astype(jnp.float32)

    def err(c, tag):
        end = np.asarray(tr(c)(p32, v32, st, w32).end_ray_vec, np.float64)
        e = np.abs(end[:, :6] - ref[:, :6]).max() / np.abs(ref[:, :6]).max()
        say(f"{tag:34s} rel_end_err={e:.3e}")
        return e

    e0 = err(cfg, "f32 plain")
    # 2. compensated carry
    err(dataclasses.replace(cfg, compensated_sum=True), "f32 compensated")

    # 3. bisection: f64 internals behind f32 interfaces
    orig_dc, orig_eq = dc_mod.deriv_cold, base_mod.equilibrium

    def dc64(eq, nvec, omgrf, k0):
        out = orig_dc(cast64(eq), nvec.astype(jnp.float64),
                      jnp.float64(omgrf), jnp.float64(k0))
        return tuple(o.astype(jnp.float32) for o in out)

    def eq64(cfg_, params_, rvec):
        return cast32(orig_eq(cfg_, cast64(params_),
                              rvec.astype(jnp.float64)))

    try:
        dc_mod.deriv_cold = dc64
        err(cfg, "f32, deriv_cold internally f64")
        dc_mod.deriv_cold = orig_dc
        base_mod.equilibrium = eq64
        err(cfg, "f32, equilibrium internally f64")
        dc_mod.deriv_cold = dc64
        e3 = err(cfg, "f32, eq + deriv_cold f64")
    finally:
        dc_mod.deriv_cold = orig_dc
        base_mod.equilibrium = orig_eq

    say(f"\nresidual with the whole RHS pipeline in f64: {e3:.2e} of "
        f"{e0:.2e} -> the floor is f32 stage-state quantization, not any "
        "single cancellation site.")
    with open("artifacts/precision_probe.txt", "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
