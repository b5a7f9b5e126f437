"""Adjoint inverse-problem demo: fit Solovev equilibrium parameters from
ray trajectory data.

The capability the reference cannot express (SURVEY.md §7.2 item 11 /
BASELINE.md config 5): gradients of ray endpoints w.r.t. equilibrium
parameters flow through the whole integration scan, so equilibrium
reconstruction becomes gradient descent.

Protocol: trace a fan of rays in a "true" Solovev equilibrium, perturb
(kappa, iota0), and recover them by Adam on the endpoint misfit.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

import rays_tpu  # noqa: F401
from rays_tpu import examples
from rays_tpu.tracing import trace as trace_mod


def main():
    t0 = time.time()
    cfg, params, v0, st, pwr = examples.setup_example(examples.SOLOVEV_ECH_90GHZ)
    cfg = dataclasses.replace(cfg, nstep_max=80, save_trajectory=False)

    def endpoints(eq_params):
        p = params._replace(eq=eq_params)
        res = trace_mod.trace_batch(cfg, p, v0, st, pwr)
        return res.end_ray_vec[:, 0:3]

    target = jax.jit(endpoints)(params.eq)
    jax.block_until_ready(target)
    print(f"[{time.time()-t0:.1f}s] target endpoints traced", flush=True)

    true_kappa = float(params.eq.kappa)
    true_iota0 = float(params.eq.iota0)

    def loss_fn(theta):
        kappa, iota0 = theta
        eq = params.eq._replace(kappa=kappa, iota0=iota0)
        return jnp.sum((endpoints(eq) - target) ** 2)

    value_and_grad = jax.jit(jax.value_and_grad(loss_fn))

    theta = jnp.asarray([true_kappa * 1.15, true_iota0 * 0.85])
    opt = optax.adam(3e-2)
    opt_state = opt.init(theta)

    print(f"true:  kappa={true_kappa:.6f} iota0={true_iota0:.6f}")
    print(f"start: kappa={float(theta[0]):.6f} iota0={float(theta[1]):.6f}")

    for it in range(60):
        loss, g = value_and_grad(theta)
        updates, opt_state = opt.update(g, opt_state)
        theta = optax.apply_updates(theta, updates)
        if it % 10 == 0 or it == 59:
            print(f"  iter {it:3d}: loss={float(loss):.3e} "
                  f"kappa={float(theta[0]):.6f} iota0={float(theta[1]):.6f}",
                  flush=True)

    k_err = abs(float(theta[0]) - true_kappa) / true_kappa
    i_err = abs(float(theta[1]) - true_iota0) / true_iota0
    print(f"[{time.time()-t0:.1f}s] recovered kappa rel-err={k_err:.2e}, "
          f"iota0 rel-err={i_err:.2e}")
    ok = k_err < 1e-3 and i_err < 1e-3
    print("PASS" if ok else "FAIL (fit did not converge to <1e-3)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
