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


def run_demo(n_iters=60, nstep_max=80, lr=3e-2, log=print):
    """Returns a dict with the loss/parameter history; CI runs a bounded
    configuration (tests/test_inverse.py), the committed artifact is the
    full run (artifacts/inverse_demo.txt)."""
    t0 = time.time()
    cfg, params, v0, st, pwr = examples.setup_example(examples.SOLOVEV_ECH_90GHZ)
    # fixed-step integration for the fit: the adaptive substep while_loop
    # has no reverse-mode rule (tracing/rk45.py offers sg_scan_substeps for
    # adaptive adjoints; RK4 is the cheaper production adjoint path).
    # The misfit uses the WHOLE saved trajectory, not just endpoints:
    # endpoint-only data leaves iota0 nearly unidentifiable for this
    # equatorial-plane fan (its gradient vanishes at a plateau ~1e-7).
    cfg = dataclasses.replace(cfg, nstep_max=nstep_max, save_trajectory=True,
                              ode_solver_name="RK4_ODE")

    def trajectories(eq_params):
        p = params._replace(eq=eq_params)
        res = trace_mod.trace_batch(cfg, p, v0, st, pwr)
        return res.ray_vec[:, :, 0:3]

    target = jax.jit(trajectories)(params.eq)
    jax.block_until_ready(target)
    log(f"[{time.time()-t0:.1f}s] target trajectories traced")

    true_kappa = float(params.eq.kappa)
    true_iota0 = float(params.eq.iota0)

    def loss_fn(theta):
        kappa, iota0 = theta
        eq = params.eq._replace(kappa=kappa, iota0=iota0)
        return jnp.sum((trajectories(eq) - target) ** 2)

    value_and_grad = jax.jit(jax.value_and_grad(loss_fn))

    theta = jnp.asarray([true_kappa * 1.15, true_iota0 * 0.85])
    # cosine decay: Adam's per-coordinate normalization makes the weakly
    # identified iota0 axis oscillate at constant lr once near the optimum
    opt = optax.adam(optax.cosine_decay_schedule(lr, n_iters))
    opt_state = opt.init(theta)

    log(f"true:  kappa={true_kappa:.6f} iota0={true_iota0:.6f}")
    log(f"start: kappa={float(theta[0]):.6f} iota0={float(theta[1]):.6f}")

    history = []
    for it in range(n_iters):
        loss, g = value_and_grad(theta)
        history.append((float(loss), float(theta[0]), float(theta[1])))
        updates, opt_state = opt.update(g, opt_state)
        theta = optax.apply_updates(theta, updates)
        if it % 10 == 0 or it == n_iters - 1:
            log(f"  iter {it:3d}: loss={float(loss):.3e} "
                f"kappa={float(theta[0]):.6f} iota0={float(theta[1]):.6f}")

    k_err = abs(float(theta[0]) - true_kappa) / true_kappa
    i_err = abs(float(theta[1]) - true_iota0) / true_iota0
    log(f"[{time.time()-t0:.1f}s] recovered kappa rel-err={k_err:.2e}, "
        f"iota0 rel-err={i_err:.2e}")
    return {
        "history": history,
        "true": (true_kappa, true_iota0),
        "start": (true_kappa * 1.15, true_iota0 * 0.85),
        "final": (float(theta[0]), float(theta[1])),
        "k_err": k_err, "i_err": i_err,
        "wall_s": time.time() - t0,
    }


def main():
    lines = []

    def log(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    out = run_demo(n_iters=80, lr=1e-2, log=log)
    # identifiability, measured: for this 8-ray equatorial fan the misfit
    # valley is nearly flat in iota0 — at 2% iota0 error the trajectories
    # differ by only ~5e-6 RMS — so kappa recovers to <5e-3 while iota0
    # plateaus at the few-percent level.  The thresholds encode that.
    ok = out["k_err"] < 5e-3 and out["i_err"] < 5e-2
    log("PASS" if ok else "FAIL (fit did not converge: "
        f"k_err={out['k_err']:.2e} i_err={out['i_err']:.2e})")
    art_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts")
    os.makedirs(art_dir, exist_ok=True)
    with open(os.path.join(art_dir, "inverse_demo.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
