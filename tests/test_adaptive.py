"""Adaptive-stepper (SG_ODE -> DP5(4), tracing/rk45.py) validation.

The reference's daily-driver integration path is the Shampine-Gordon suite:
every flagship input selects ode_solver_name='SG_ODE'
(examples_RAYS/ECH_90GHz_slab/slab_ECH_90GHz_case_1.in:73; the Solovev
example at tol 1e-9; SG_ode_m.f90:89-159).  The TPU equivalence contract
(SURVEY.md §7.1): the adaptive stepper agrees with the exact solution at
the tolerance level — validated here against the independent NumPy oracle
run at much smaller fixed RK4 steps, for both the slab (time
parameterization) and Solovev (arclength) examples.

Also covered: per-ray h carry across outer steps, lockstep-masked substeps
under vmap (batched == per-ray solo), and the ODE_TOTAL_ERROR semantics of
SG_ode_m.f90:140-147 on both failure branches (h-underflow and substep
exhaustion).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rays_tpu  # noqa: F401
from rays_tpu import examples
from rays_tpu.tracing import rk45, trace as trace_mod
from rays_tpu.tracing.stop import StopCode

import _oracle as oracle
from test_parity import _oracle_cfg, _slab_eq_fn, _solovev_eq_fn

# tolerance-level agreement: the adaptive answer must sit within a small
# multiple of the requested tolerance of the fine-step truth
TOL = 1.0e-7
REFINE = 20          # oracle runs at ds/REFINE fixed RK4


def _sg_text(base, rel=TOL, nstep="80"):
    out = base.replace("rel_err0=1.e-4, abs_err0=1.e-4",
                       f"rel_err0={rel}, abs_err0={rel}")
    out = out.replace("rel_err0=1.e-7, abs_err0=1.e-7",
                      f"rel_err0={rel}, abs_err0={rel}")
    out = out.replace("nstep_max=500", f"nstep_max={nstep}")
    out = out.replace("nstep_max=200", f"nstep_max={nstep}")
    out = out.replace("ode_solver_name='RK4_ODE'", "ode_solver_name='SG_ODE'")
    return out


def _trace(cfg, params, v0, st, pwr):
    tracer = jax.jit(lambda p, v, s, w: trace_mod.trace_batch(cfg, p, v, s, w))
    res = tracer(params, v0, st, pwr)
    jax.block_until_ready(res)
    return res


def _assert_tolerance_agreement(cfg, params, res, oc, tol_mult=200.0):
    # tol_mult: per-step error control at TOL accumulates over ~n outer
    # steps (n <= 80 here), so tolerance-LEVEL agreement means a small
    # multiple of n * TOL, not TOL itself
    """Each saved point of the adaptive trajectory must match the oracle's
    fine-step solution at the same s to ~tolerance level."""
    ds, s_max = float(params.ode.ds), float(params.ode.s_max)
    v0 = np.asarray(res.start_ray_vec, float)
    vrepo = np.asarray(res.ray_vec, float)
    npts = np.asarray(res.npoints)
    checked = 0
    for ir in range(v0.shape[0]):
        n = int(npts[ir])
        traj, _, _ = oracle.trace_ray(
            oc, v0[ir], (n - 1) * REFINE, ds / REFINE, s_max)
        n_common = min(n, (len(traj) - 1) // REFINE + 1)
        assert n_common >= 2, f"ray {ir}: oracle stopped immediately"
        fine = traj[::REFINE][:n_common]
        got = vrepo[ir, :n_common, :]
        scale_x = max(np.abs(fine[:, 0:3]).max(), 1e-12)
        scale_k = max(np.abs(fine[:, 3:6]).max(), 1e-12)
        np.testing.assert_allclose(
            got[:, 0:3], fine[:, 0:3], rtol=0, atol=tol_mult * TOL * scale_x,
            err_msg=f"ray {ir} positions beyond tolerance")
        np.testing.assert_allclose(
            got[:, 3:6], fine[:, 3:6], rtol=0, atol=tol_mult * TOL * scale_k,
            err_msg=f"ray {ir} wavevector beyond tolerance")
        checked += 1
    assert checked == v0.shape[0]


def test_sg_slab_matches_fine_oracle():
    """Slab ECH with SG_ODE exactly as the reference's flagship input
    (slab_ECH_90GHz_case_1.in runs the SG suite, not RK4)."""
    cfg, params, v0, st, pwr = examples.setup_example(
        _sg_text(examples.SLAB_ECH_90GHZ))
    assert cfg.ode_solver_name == "SG_ODE"
    res = _trace(cfg, params, v0, st, pwr)
    assert int(np.asarray(res.npoints).min()) >= 2
    oc = _oracle_cfg(cfg, params, _slab_eq_fn(cfg, params))
    _assert_tolerance_agreement(cfg, params, res, oc)


def test_sg_solovev_matches_fine_oracle():
    """Solovev fan with SG_ODE (the reference example runs tol 1e-7..1e-9,
    solovev_ECH_90GHz_minus_root.in)."""
    cfg, params, v0, st, pwr = examples.setup_example(
        _sg_text(examples.SOLOVEV_ECH_90GHZ, nstep="60"))
    assert cfg.ode_solver_name == "SG_ODE"
    res = _trace(cfg, params, v0, st, pwr)
    assert int(np.asarray(res.npoints).min()) >= 2
    oc = _oracle_cfg(cfg, params, _solovev_eq_fn(cfg, params))
    # wider multiple than the slab: |k| ~ k0 ~ 1.9e3 makes the mixed error
    # test's rel term ~2e-4 absolute per substep, and the tokamak's
    # gradient structure amplifies accumulated error faster
    _assert_tolerance_agreement(cfg, params, res, oc, tol_mult=4000.0)


def test_sg_solovev_tolerance_ladder():
    """The quantitative SG-equivalence contract (VERDICT r3 item 6): the
    controller actually delivers its requested tolerance, shown by a
    tolerance LADDER — tightening TOL by 100x must shrink the end-point
    error vs a fixed fine-step oracle by well over an order of magnitude.
    This replaces trusting any single flat tol_mult bound: a curve-fit
    bound passes at one tolerance, a working controller passes the ladder.
    """
    refine = 160  # oracle floor well below the loose-TOL error
    errs = {}
    for rel in ("1.e-5", "1.e-7"):
        # 8x the example ds: at the example's own ds a single full-ds DP5
        # substep already lands ~1e-10 local error, below BOTH tolerances,
        # and the ladder cannot distinguish them — the controller must be
        # forced to actually subdivide
        text = _sg_text(examples.SOLOVEV_ECH_90GHZ, rel=rel, nstep="20"
                        ).replace("ds=2.e-3", "ds=1.6e-2")
        cfg, params, v0, st, pwr = examples.setup_example(text)
        res = _trace(cfg, params, v0, st, pwr)
        oc = _oracle_cfg(cfg, params, _solovev_eq_fn(cfg, params))
        ds = float(params.ode.ds)
        v0n = np.asarray(v0, float)
        worst = 0.0
        for ir in range(v0n.shape[0]):
            n = int(np.asarray(res.npoints)[ir])
            traj, _, _ = oracle.trace_ray(
                oc, v0n[ir], (n - 1) * refine, ds / refine,
                float(params.ode.s_max))
            n_common = min(n, (len(traj) - 1) // refine + 1)
            assert n_common >= 2
            fine = traj[::refine][n_common - 1]
            got = np.asarray(res.ray_vec)[ir, n_common - 1]
            scale = max(np.abs(fine[0:3]).max(), 1e-12)
            worst = max(worst, np.abs(got[0:3] - fine[0:3]).max() / scale)
        errs[rel] = worst
    # 100x tighter tolerance -> at least 5x less end error (measured ~9x:
    # global error grows sublinearly in TOL since tighter steps also
    # change the accepted-step sequence; the bar guards the contract that
    # TOL actually controls the answer, with slop for that sublinearity)
    assert errs["1.e-7"] < errs["1.e-5"] / 5.0, errs
    # and the tight run is genuinely accurate in absolute terms
    assert errs["1.e-7"] < 1e-5, errs


def test_sg_scan_substeps_equals_while_loop():
    """cfg.sg_scan_substeps > 0 (the reverse-differentiable fixed-length
    substep form used for adaptive adjoints) reproduces the while_loop
    path exactly when the budget suffices."""
    cfg, params, v0, st, pwr = examples.setup_example(
        _sg_text(examples.SLAB_ECH_90GHZ, rel="1.e-5", nstep="30"))
    res_while = _trace(cfg, params, v0, st, pwr)
    cfg_scan = dataclasses.replace(cfg, sg_scan_substeps=6)
    res_scan = _trace(cfg_scan, params, v0, st, pwr)
    np.testing.assert_array_equal(np.asarray(res_while.npoints),
                                  np.asarray(res_scan.npoints))
    np.testing.assert_array_equal(np.asarray(res_while.stop_flag),
                                  np.asarray(res_scan.stop_flag))
    np.testing.assert_allclose(np.asarray(res_while.end_ray_vec),
                               np.asarray(res_scan.end_ray_vec),
                               rtol=0, atol=1e-13)
    # and it differentiates in reverse mode (the while_loop cannot)
    import jax.numpy as jnp

    def loss(p):
        r = trace_mod.trace_batch(cfg_scan, p, v0, st, pwr)
        return jnp.sum(r.end_ray_vec[:, 0:3] ** 2)

    g = jax.jit(jax.grad(loss))(params)
    gn = np.asarray(g.ode.ds)
    assert np.isfinite(gn).all()


def test_sg_adjoint_matches_finite_differences():
    """The SG adjoint is the discrete adjoint of the FROZEN accepted-
    substep sequence (rk45.py stop_gradients the step-size controller,
    the standard adaptive-integrator adjoint).  Against central finite
    differences of the full primal — which DOES include the controller's
    response — the gradients must still agree to ~sqrt(eps) FD accuracy,
    because the suppressed terms are O(local error) (VERDICT r4 next #1
    done-criterion)."""
    # substep budget 2 and 20 outer steps: the grad of the unrolled
    # substep body is the dominant COMPILE cost of this test (13 min at
    # budget 4 / 30 steps; ~4 min at this size)
    text = _sg_text(examples.SLAB_ECH_90GHZ, rel="1.e-6", nstep="20")
    cfg, params, v0, st, pwr = examples.setup_example(text)
    cfg = dataclasses.replace(cfg, sg_scan_substeps=2,
                              save_trajectory=False)

    def loss(p):
        r = trace_mod.trace_batch(cfg, p, v0, st, pwr)
        return jnp.sum(r.end_ray_vec[:, 0:3] ** 2)

    g = jax.jit(jax.grad(loss))(params)
    lo = jax.jit(loss)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    paths = jax.tree_util.tree_flatten_with_path(params)[0]
    g_leaves = jax.tree_util.tree_flatten(g)[0]
    checked = 0
    for idx, (path, leaf) in enumerate(paths):
        name = jax.tree_util.keystr(path)
        if leaf.ndim != 0:
            continue
        # physics parameters with O(1)-meaningful gradients on this case
        if not any(s in name for s in ("omgrf'", "bz0", "n_ref")):
            continue
        base = float(leaf)
        eps = max(abs(base), 1.0) * 1e-6

        def with_val(v, idx=idx, leaf=leaf):
            ls = list(leaves)
            ls[idx] = jnp.asarray(v, leaf.dtype)
            return jax.tree_util.tree_unflatten(treedef, ls)

        fd = (float(lo(with_val(base + eps)))
              - float(lo(with_val(base - eps)))) / (2 * eps)
        ad = float(g_leaves[idx])
        assert ad == pytest.approx(fd, rel=2e-5, abs=1e-12), (
            f"{name}: ad={ad:.10e} fd={fd:.10e}")
        checked += 1
    assert checked >= 2, "no scalar physics leaves found to check"


def test_adaptive_beats_fixed_rk4_at_equal_outer_steps():
    """The point of the adaptive path: at the same outer grid the SG-analog
    tracks the fine solution better than single-sweep RK4 when the outer ds
    is coarse.  Run the slab at 4x the example ds."""
    coarse = _sg_text(examples.SLAB_ECH_90GHZ).replace(
        "ds=5.e-11", "ds=4.e-10")
    cfg, params, v0, st, pwr = examples.setup_example(coarse)
    cfg_rk4 = dataclasses.replace(cfg, ode_solver_name="RK4_ODE")
    res_sg = _trace(cfg, params, v0, st, pwr)
    res_rk4 = _trace(cfg_rk4, params, v0, st, pwr)

    oc = _oracle_cfg(cfg, params, _slab_eq_fn(cfg, params))
    ds = float(params.ode.ds)
    v0n = np.asarray(v0, float)
    err_sg = err_rk4 = 0.0
    for ir in range(v0n.shape[0]):
        n = min(int(res_sg.npoints[ir]), int(res_rk4.npoints[ir]))
        traj, _, _ = oracle.trace_ray(
            oc, v0n[ir], (n - 1) * REFINE, ds / REFINE, float(params.ode.s_max))
        fine_end = traj[::REFINE][n - 1]
        err_sg += np.abs(
            np.asarray(res_sg.ray_vec)[ir, n - 1, 0:3] - fine_end[0:3]).max()
        err_rk4 += np.abs(
            np.asarray(res_rk4.ray_vec)[ir, n - 1, 0:3] - fine_end[0:3]).max()
    assert err_sg < err_rk4, (err_sg, err_rk4)


def test_h_carries_across_outer_steps():
    """The converged substep h persists to the next outer step
    (SG_ode_m.f90:73-85 resets tolerances only at ray start)."""
    cfg, params, v0, st, pwr = examples.setup_example(
        _sg_text(examples.SLAB_ECH_90GHZ, rel="1.e-10"))
    ds = params.ode.ds
    v = v0[0]
    s0 = jnp.zeros((), v.dtype)
    step = jax.jit(lambda s, v, h: rk45.rk45_step(cfg, params, s, v, h))
    v1, st1, h1 = step(s0, v, ds)
    assert int(st1) == 0
    # the controller moved h away from the seed (here the step is easy at
    # 1e-10, so h grows toward the 5x cap) — the carried value is the
    # controller's converged state, not the outer ds
    assert abs(float(h1) - float(ds)) > 0.5 * float(ds)
    # carrying h into the next outer step reproduces the fresh-h result to
    # integration accuracy but starts from the converged step size
    v2_carry, st2, h2 = step(s0 + ds, v1, h1)
    v2_fresh, _, _ = step(s0 + ds, v1, ds)
    assert int(st2) == 0
    np.testing.assert_allclose(np.asarray(v2_carry)[:6],
                               np.asarray(v2_fresh)[:6], rtol=1e-9)
    # and an unachievable tolerance forces subdivision: h shrinks below ds
    cfg2, params2, *_ = examples.setup_example(
        _sg_text(examples.SLAB_ECH_90GHZ, rel="1.e-16"))
    step2 = jax.jit(lambda s, v, h: rk45.rk45_step(cfg2, params2, s, v, h))
    _, _, h_tight = step2(s0, v, params2.ode.ds)
    assert float(h_tight) < float(params2.ode.ds)


def test_vmap_lockstep_equals_solo():
    """Masked substep acceptance under vmap: every ray of a heterogeneous
    batch gets exactly the result it gets when traced alone."""
    cfg, params, v0, st, pwr = examples.setup_example(
        _sg_text(examples.SLAB_ECH_90GHZ, nstep="40"))
    res_batch = _trace(cfg, params, v0, st, pwr)
    for ir in range(v0.shape[0]):
        res_solo = _trace(cfg, params, v0[ir:ir + 1], st[ir:ir + 1],
                          pwr[ir:ir + 1])
        np.testing.assert_array_equal(
            np.asarray(res_solo.npoints)[0], np.asarray(res_batch.npoints)[ir])
        np.testing.assert_allclose(
            np.asarray(res_solo.ray_vec)[0], np.asarray(res_batch.ray_vec)[ir],
            rtol=0, atol=1e-13)


def test_ode_total_error_on_h_underflow():
    """Unachievable tolerance -> h shrinks to the floor -> ODE_TOTAL_ERROR
    (the SG_ode_m.f90:140-147 abort analog)."""
    cfg, params, v0, st, pwr = examples.setup_example(
        _sg_text(examples.SLAB_ECH_90GHZ, rel="1.e-30", nstep="10"))
    res = _trace(cfg, params, v0, st, pwr)
    flags = np.asarray(res.stop_flag)
    assert (flags == int(StopCode.ODE_TOTAL_ERROR)).all(), flags
    # the failed step is not recorded: rays freeze at the launch point
    np.testing.assert_array_equal(np.asarray(res.npoints), 1)


def test_ode_total_error_on_substep_exhaustion():
    """Substep budget exhausted before reaching sout -> ODE_TOTAL_ERROR.
    rel 1e-18 is below the f64 rounding floor so every substep rejects and
    h decays 0.2x per try; 4 tries cannot reach h_min (1e-12 ds), so the
    loop dies on the budget, not on underflow — the other abort branch."""
    cfg, params, v0, st, pwr = examples.setup_example(
        _sg_text(examples.SLAB_ECH_90GHZ, rel="1.e-18", nstep="10"))
    cfg = dataclasses.replace(cfg, max_substeps=4)
    res = _trace(cfg, params, v0, st, pwr)
    flags = np.asarray(res.stop_flag)
    assert (flags == int(StopCode.ODE_TOTAL_ERROR)).all(), flags
