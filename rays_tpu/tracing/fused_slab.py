"""Fused Pallas trace kernel: the ENTIRE ray trace in one TPU kernel.

Design: the whole trajectory runs in ONE kernel — ray state lives in VMEM
scratch for all nstep_max steps (the step axis is the second grid
dimension, which TPU executes sequentially), zero HBM traffic between
steps.

Measured reality (v5e, BENCH_r03): the XLA scan is ~16x FASTER on the 32k
ray batch (~400k vs ~26k rays/s).  The scan's while-loop body is fused and
pipelined by XLA at ~3.4 cycles/VREG-op; Mosaic schedules this ~1.4k-op
sequential body far less efficiently, and widening the block (more rays
per grid step) does not recover it.  HBM traffic was never the scan's
bottleneck (state round-trip is ~1 GB per 500-step batch, ~1 ms of
bandwidth).  The kernel therefore ships as a NON-DEFAULT path
(cfg.fused_kernel='on'): it is the more accurate f32 engine — its fully
fused arithmetic lands ~7x closer to the f64 truth than the f32 scan
(tests/test_fused.py) — and a ready vehicle for toolchains where the
Mosaic scheduling balance flips.

Scope (deliberate): the slab geometry with the analytic profile models,
cold dispersion, no damping — exactly the reference's headline benchmark
configuration (slab ECH, RK4).  Everything else — spline geometries,
damping, adjoints, trajectory storage — stays on the XLA scan path, which
remains the single source of truth; tests/test_fused.py asserts the kernel
reproduces trace_batch's summaries on the same rays.

Physics formulas are the same chain rule as wave/deriv_cold.py
(reference deriv_cold.f90:40-171) and the RHS of tracing/rhs.py
(eqn_ray.f90:86-213), specialized to the slab's d/dx-only gradients and
unrolled over the (small, static) species count.  Run parameters are baked
into the kernel as compile-time constants (this is a forward throughput
engine; parameter differentiation uses the XLA path).

STATUS: FROZEN (round 4).  The kill criterion of VERDICT r3 item 9 was
met: round 3 exhausted the winning-configuration space (wider ray blocks,
f32 index math, per-segment grid splits) without closing the 16x gap, and
round 4's spline-path wins came from XLA-level layout fixes, not kernels —
the Pallas budget is better spent elsewhere.  The file stays as the
accuracy A/B and the vehicle for future Mosaic toolchains; no further
performance work is planned on it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rays_tpu.tracing.stop import StopCode
from rays_tpu.tracing.trace import RayResults

LANES = 128
SUBS = 8           # f32 tile: (8, 128)
BLOCK = SUBS * LANES


def _slab_profile_consts(cfg, params):
    """Pull the (static) slab model config + float constants."""
    st = cfg.eq_static
    e = params.eq
    g = lambda name: float(getattr(e, name))
    consts = dict(
        xmin=g("xmin"), xmax=g("xmax"), ymin=g("ymin"), ymax=g("ymax"),
        zmin=g("zmin"), zmax=g("zmax"), rmaj=g("rmaj"), rmin=g("rmin"),
        x0=g("x0"), by0=g("by0"), bz0=g("bz0"),
        lby=g("lby_shear_scale"), lbz=g("lbz_scale"), dbzdx=g("dbzdx"),
        ln=g("ln_scale"), alphan1=g("alphan1"),
    )
    return st, consts


def supported(cfg) -> bool:
    """Whether this run can ride the fused kernel."""
    if cfg.equilib_model != "slab" or cfg.damping_model != "no_damp":
        return False
    if cfg.integrate_eq_gradients or cfg.save_trajectory:
        return False
    if cfg.ode_solver_name != "RK4_ODE":
        return False
    st = cfg.eq_static
    return (st.bx_prof_model == "zero"
            and st.by_prof_model in ("zero", "constant", "toroid",
                                     "linear_shear")
            and st.bz_prof_model in ("zero", "constant", "toroid", "linear",
                                     "linear_2")
            and st.dens_prof_model in ("constant", "linear", "Gaussian"))


def make_slab_physics(cfg, params):
    """Build the batched (SUBS, LANES)-lane physics closures used by the
    kernel body: returns (rhs, check, run_consts).  Module-level so the
    pieces are independently compilable/testable."""
    st, C = _slab_profile_consts(cfg, params)

    sp = params.species
    S = cfg.ns
    alpha_coef = [float(np.asarray(sp.alpha_coef)[s]) for s in range(S)]
    gamma_coef = [float(np.asarray(sp.gamma_coef)[s]) for s in range(S)]
    n0s = [float(np.asarray(sp.n0s)[s]) for s in range(S)]
    omgrf = float(np.asarray(params.rf.omgrf))
    omgrf_ref = float(np.asarray(params.rf.omgrf_ref))
    k0 = float(np.asarray(params.rf.k0))
    wratio = omgrf_ref / omgrf
    ds = float(np.asarray(params.ode.ds))
    s_max = float(np.asarray(params.ode.s_max))
    resid_limit = float(np.asarray(params.limits.dispersion_resid_limit))
    nstep_max = cfg.nstep_max
    time_param = cfg.ray_param == "time"

    # ---- batched slab equilibrium on (SUBS, LANES) lane arrays ----

    def eq_fields(x):
        """(by, dbydx, bz, dbzdx, shape, dshapedx).  ns_s = n0s_s * shape."""
        zero = jnp.zeros_like(x)
        m = st.by_prof_model
        if m == "zero":
            by, dby = zero, zero
        elif m == "constant":
            by, dby = jnp.full_like(x, C["by0"]), zero
        elif m == "toroid":
            by = C["by0"] / (1.0 + x / C["rmaj"])
            dby = -by / (C["rmaj"] + x)
        else:  # linear_shear
            by = C["by0"] * x / C["lby"]
            dby = jnp.full_like(x, C["by0"] / C["lby"])
        m = st.bz_prof_model
        if m == "zero":
            bz, dbz = zero, zero
        elif m == "constant":
            bz, dbz = jnp.full_like(x, C["bz0"]), zero
        elif m == "toroid":
            bz = C["bz0"] / (1.0 + x / C["rmaj"])
            dbz = -bz / (C["rmaj"] + x)
        elif m == "linear":
            bz = C["bz0"] * (1.0 + x / C["lbz"])
            dbz = jnp.full_like(x, C["bz0"] / C["lbz"])
        else:  # linear_2
            bz = C["bz0"] + C["dbzdx"] * (x - C["x0"])
            dbz = jnp.full_like(x, C["dbzdx"])
        m = st.dens_prof_model
        if m == "constant":
            shape, dshape = jnp.ones_like(x), zero
        elif m == "linear":
            shape = 1.0 + x / C["ln"]
            dshape = jnp.full_like(x, 1.0 / C["ln"])
        else:  # Gaussian
            shape = jnp.exp(-3.0 * C["alphan1"] * (x / C["rmin"]) ** 2)
            dshape = shape * (-6.0 * C["alphan1"] * x / C["rmin"] ** 2)
        return by, dby, bz, dbz, shape, dshape

    def geom_status(x, y, z, shape):
        code = jnp.zeros(x.shape, jnp.int32)
        # priority (slab_eq_m.f90:162-169 + _combine_err): x > y > z > negdens
        neg = jnp.full_like(code, int(StopCode.NEGATIVE_DENS))
        code = jnp.where(shape < 0.0, neg, code)
        code = jnp.where((z < C["zmin"]) | (z > C["zmax"]),
                         jnp.full_like(code, int(StopCode.Z_OUT_OF_BOUNDS)), code)
        code = jnp.where((y < C["ymin"]) | (y > C["ymax"]),
                         jnp.full_like(code, int(StopCode.Y_OUT_OF_BOUNDS)), code)
        code = jnp.where((x < C["xmin"]) | (x > C["xmax"]),
                         jnp.full_like(code, int(StopCode.X_OUT_OF_BOUNDS)), code)
        return code

    tiny = 1e-30

    def rhs(x, y, z, kx, ky, kz):
        """Batched eqn_ray (slab, cold, no damping).
        Returns (dx, dy, dz, dkx, dky, dkz, ds7, status)."""
        by, dby, bz, dbz, shape, dshape = eq_fields(x)
        err = geom_status(x, y, z, shape)

        bmag = jnp.sqrt(by * by + bz * bz)
        inv_b = 1.0 / jnp.maximum(bmag, tiny)
        buy, buz = by * inv_b, bz * inv_b
        gradbmag_x = (by * dby + bz * dbz) * inv_b
        # gradbunit[0][j] = (dB_j/dx - gradbmag_x * bunit_j)/bmag
        gbu_y = (dby - gradbmag_x * buy) * inv_b
        gbu_z = (dbz - gradbmag_x * buz) * inv_b

        # species alpha/gamma and their x-derivatives
        alpha = [alpha_coef[s] * (n0s[s] * shape) * wratio**2 for s in range(S)]
        dadx = [alpha_coef[s] * (n0s[s] * dshape) * wratio**2 for s in range(S)]
        gamma = [gamma_coef[s] * bmag * wratio for s in range(S)]
        dgdx = [gamma_coef[s] * gradbmag_x * wratio for s in range(S)]

        nx, ny, nz = kx / k0, ky / k0, kz / k0
        n3 = ny * buy + nz * buz     # bux = 0
        n1sq = nx * nx + (ny - n3 * buy) ** 2 + (nz - n3 * buz) ** 2
        dn3dx = gbu_y * ny + gbu_z * nz
        dn12dx = -2.0 * n3 * dn3dx

        # species polynomial pieces (deriv_cold.f90:77-158), unrolled
        p = 1.0 - sum(alpha)
        t = jnp.ones_like(x)
        for s in range(S):
            t = t * (1.0 - gamma[s] * gamma[s])
        dq1da = []
        dq2da = []
        for s1 in range(S):
            m1 = jnp.ones_like(x)
            m2 = jnp.ones_like(x)
            for s in range(S):
                if s != s1:
                    m1 = m1 * (1.0 + gamma[s])
                    m2 = m2 * (1.0 - gamma[s])
            dq1da.append(m1)
            dq2da.append(m2)
        q1 = sum(alpha[s] * dq1da[s] for s in range(S))
        q2 = sum(alpha[s] * dq2da[s] for s in range(S))
        u = t - sum(alpha[s] * dq1da[s] * dq2da[s] for s in range(S))
        q = 2.0 * u - t + q1 * q2
        duda = [-dq1da[s] * dq2da[s] for s in range(S)]
        dqda = [2.0 * duda[s] + dq1da[s] * q2 + q1 * dq2da[s]
                for s in range(S)]
        n3sq = n3 * n3
        ddda = [(-t * n3sq * n3sq
                 + (2.0 * (u - p * duda[s]) + (-t + duda[s]) * n1sq) * n3sq
                 - q + p * dqda[s] - (dqda[s] - u + p * duda[s]) * n1sq
                 + duda[s] * n1sq * n1sq) for s in range(S)]

        # leave-two-out kernels
        gp = [[None] * S for _ in range(S)]
        gm = [[None] * S for _ in range(S)]
        for s1 in range(S):
            for s2 in range(S):
                m1 = jnp.ones_like(x)
                m2 = jnp.ones_like(x)
                for s in range(S):
                    if s != s1 and s != s2:
                        m1 = m1 * (1.0 + gamma[s])
                        m2 = m2 * (1.0 - gamma[s])
                gp[s1][s2] = m1
                gm[s1][s2] = m2
        dtdg = [2.0 * gamma[s] * duda[s] for s in range(S)]
        dudg = []
        dq1dg = []
        dq2dg = []
        for s in range(S):
            acc = sum(alpha[s1] * gp[s1][s] * gm[s1][s] for s1 in range(S))
            dudg.append(dtdg[s] + 2.0 * gamma[s] * (acc + alpha[s] * duda[s]))
            dq1dg.append(sum(alpha[s1] * gp[s1][s] for s1 in range(S))
                         - alpha[s] * dq1da[s])
            dq2dg.append(-sum(alpha[s1] * gm[s1][s] for s1 in range(S))
                         + alpha[s] * dq2da[s])
        dqdg = [2.0 * dudg[s] - dtdg[s] + dq1dg[s] * q2 + q1 * dq2dg[s]
                for s in range(S)]
        dddg = [(dtdg[s] * p * n3sq * n3sq
                 + (-2.0 * p * dudg[s] + (dtdg[s] * p + dudg[s]) * n1sq) * n3sq
                 + p * dqdg[s] - (dqdg[s] + p * dudg[s]) * n1sq
                 + dudg[s] * n1sq * n1sq) for s in range(S)]

        dddn3 = (4.0 * t * p * n3sq
                 + 2.0 * (-2.0 * p * u + (t * p + u) * n1sq)) * n3
        dddn12 = (t * p + u) * n3sq - (q + p * u) + 2.0 * u * n1sq

        # assemble dD/dk, dD/dx (x only), dD/domega
        dddk_x = dddn12 * (2.0 / k0) * nx
        dddk_y = dddn3 * buy / k0 + dddn12 * (2.0 / k0) * (ny - n3 * buy)
        dddk_z = dddn3 * buz / k0 + dddn12 * (2.0 / k0) * (nz - n3 * buz)
        dddx_x = (sum(ddda[s] * dadx[s] + dddg[s] * dgdx[s] for s in range(S))
                  + dddn3 * dn3dx + dddn12 * dn12dx)
        dadw = [-2.0 / omgrf * alpha[s] for s in range(S)]
        dgdw = [-1.0 / omgrf * gamma[s] for s in range(S)]
        dddw = (sum(ddda[s] * dadw[s] + dddg[s] * dgdw[s] for s in range(S))
                + dddn3 * (-n3 / omgrf) + dddn12 * (-2.0 / omgrf) * n1sq)

        dk_mag = jnp.sqrt(dddk_x**2 + dddk_y**2 + dddk_z**2)
        safe_w = jnp.where(dddw == 0.0, jnp.ones_like(dddw), dddw)
        safe_k = jnp.maximum(dk_mag, tiny)

        if time_param:
            dx = -dddk_x / safe_w
            dy = -dddk_y / safe_w
            dz = -dddk_z / safe_w
            dkx = dddx_x / safe_w
            ds7 = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        else:
            sgn = jnp.where(dddw >= 0.0, 1.0, -1.0).astype(x.dtype)
            dx = -sgn * dddk_x / safe_k
            dy = -sgn * dddk_y / safe_k
            dz = -sgn * dddk_z / safe_k
            dkx = sgn * dddx_x / safe_k
            ds7 = jnp.ones_like(x)

        status = jnp.zeros(x.shape, jnp.int32)
        if not time_param:
            status = jnp.where(dk_mag == 0.0,
                               jnp.full_like(status, int(StopCode.RAY_STALLED)),
                               status)
        status = jnp.where(dddw == 0.0,
                           jnp.full_like(status, int(StopCode.INFINITE_VG)),
                           status)
        status = jnp.where(err != 0, err, status)
        zero = jnp.zeros_like(x)
        return dx, dy, dz, dkx, zero, zero, ds7, status

    def check(x, y, z, kx, ky, kz):
        """check_save: residual + stop at the new point."""
        by, _, bz, _, shape, _ = eq_fields(x)
        err = geom_status(x, y, z, shape)
        bmag = jnp.sqrt(by * by + bz * bz)
        inv_b = 1.0 / jnp.maximum(bmag, tiny)
        buy, buz = by * inv_b, bz * inv_b
        alpha = [alpha_coef[s] * (n0s[s] * shape) * wratio**2 for s in range(S)]
        gamma = [gamma_coef[s] * bmag * wratio for s in range(S)]
        k3 = ky * buy + kz * buz
        k1 = jnp.sqrt(jnp.maximum(
            kx * kx + (ky - k3 * buy) ** 2 + (kz - k3 * buz) ** 2, 0.0))
        n1, n3 = k1 / k0, k3 / k0
        # Stix S, D, P (suscep_m.f90:180-216 via R, L)
        R = jnp.ones_like(x)
        L = jnp.ones_like(x)
        P = jnp.ones_like(x)
        for s in range(S):
            R = R - alpha[s] / (1.0 + gamma[s])
            L = L - alpha[s] / (1.0 - gamma[s])
            P = P - alpha[s]
        Sst = 0.5 * (R + L)
        Dst = 0.5 * (R - L)
        nsq = n1 * n1 + n3 * n3
        m11 = Sst + n1 * n1 - nsq
        m22 = Sst - nsq
        m33 = P + n3 * n3 - nsq
        m13 = n1 * n3
        det = m33 * (m11 * m22 - Dst * Dst) - m13 * m13 * m22
        en11 = jnp.abs(Sst) + n1 * n1
        en22 = jnp.abs(Sst)
        en33 = jnp.abs(P) + n3 * n3
        en12 = jnp.abs(Dst)
        en13 = jnp.abs(m13)
        denom = en33 * (en11 * en22) + en33 * (en12 * en12) + en13 * (en22 * en13)
        resid = jnp.abs(det) / denom
        status = jnp.zeros(x.shape, jnp.int32)
        status = jnp.where(
            resid > resid_limit,
            jnp.full_like(status, int(StopCode.DISPERSION_RESIDUAL)), status)
        status = jnp.where(err != 0, err, status)
        return resid, status

    return rhs, check, dict(ds=ds, s_max=s_max, nstep_max=nstep_max,
                            time_param=time_param)


def trace_batch_fused(cfg, params, v0, status0, pwr_wt) -> RayResults:
    """Drop-in fused version of trace_batch for supported slab configs.
    v0: (B, nv>=7) — only the first 7 slots are integrated (no damping)."""
    assert supported(cfg), "config not supported by the fused slab kernel"
    rhs, check, rc = make_slab_physics(cfg, params)
    ds, s_max, nstep_max = rc["ds"], rc["s_max"], rc["nstep_max"]

    dt = jnp.float32 if v0.dtype == jnp.float32 else v0.dtype

    # ---- the kernel ----
    #
    # The trajectory loop is the SECOND GRID DIMENSION, not an in-kernel
    # fori_loop: TPU grid iterations execute sequentially on the core, so
    # per-block ray state carried in VMEM scratch across grid steps is the
    # whole-trajectory-in-VMEM design — and Mosaic compiles the step body
    # once as the kernel body.  (An in-kernel fori_loop/scf.for wrapped
    # around this ~1.5k-op body sends the Mosaic backend into a >19-minute
    # compile on this toolchain; the grid form compiles in seconds.)
    # Scratch lives per-core and the grid runs (block, step) row-major, so
    # each block's trajectory completes before the next block starts.

    def kernel(v_ref, st_ref, out_v_ref, out_st_ref, out_np_ref,
               out_endres_ref, out_maxres_ref, vs, ss, ns, es, ms):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _init():
            # initial validity check (ray_tracing.f90:100-112)
            x = v_ref[0]
            y = v_ref[1]
            z = v_ref[2]
            kx = v_ref[3]
            ky = v_ref[4]
            kz = v_ref[5]
            _, st0 = check(x, y, z, kx, ky, kz)
            status0 = st_ref[:]
            ss[:] = jnp.where(status0 != 0, status0, st0)
            for i in range(7):
                vs[i] = v_ref[i]
            ns[:] = jnp.zeros(x.shape, jnp.int32)
            es[:] = jnp.zeros_like(x)
            ms[:] = jnp.zeros_like(x)

        x, y, z = vs[0], vs[1], vs[2]
        kx, ky, kz, s7 = vs[3], vs[4], vs[5], vs[6]
        status = ss[:]

        # NB: float index arithmetic — integer `k + 1` under x64 promotes
        # to i64, which Mosaic rejects
        sout = (k.astype(x.dtype) + 1.0) * ds
        active = status == 0
        status = jnp.where(
            active & (sout > s_max),
            jnp.full_like(status, int(StopCode.SOUT_GT_SMAX)), status)
        active = status == 0

        # RK4 stages (RK4_ode_m.f90:81-92); first-flagged-stage status
        d1 = rhs(x, y, z, kx, ky, kz)
        h = ds / 2.0
        d2 = rhs(x + h * d1[0], y + h * d1[1], z + h * d1[2],
                 kx + h * d1[3], ky + h * d1[4], kz + h * d1[5])
        d3 = rhs(x + h * d2[0], y + h * d2[1], z + h * d2[2],
                 kx + h * d2[3], ky + h * d2[4], kz + h * d2[5])
        d4 = rhs(x + ds * d3[0], y + ds * d3[1], z + ds * d3[2],
                 kx + ds * d3[3], ky + ds * d3[4], kz + ds * d3[5])
        solver_st = d1[7]
        for d in (d2, d3, d4):
            solver_st = jnp.where(solver_st != 0, solver_st, d[7])

        w = ds / 6.0
        xn = x + w * (d1[0] + 2 * d2[0] + 2 * d3[0] + d4[0])
        yn = y + w * (d1[1] + 2 * d2[1] + 2 * d3[1] + d4[1])
        zn = z + w * (d1[2] + 2 * d2[2] + 2 * d3[2] + d4[2])
        kxn = kx + w * (d1[3] + 2 * d2[3] + 2 * d3[3] + d4[3])
        kyn = ky + w * (d1[4] + 2 * d2[4] + 2 * d3[4] + d4[4])
        kzn = kz + w * (d1[5] + 2 * d2[5] + 2 * d3[5] + d4[5])
        s7n = s7 + w * (d1[6] + 2 * d2[6] + 2 * d3[6] + d4[6])

        status = jnp.where(active & (solver_st != 0), solver_st, status)
        accepted = active & (solver_st == 0)

        resid, check_st = check(xn, yn, zn, kxn, kyn, kzn)
        status = jnp.where(accepted & (check_st != 0), check_st, status)
        ok = accepted & (check_st == 0)

        vs[0] = jnp.where(ok, xn, x)
        vs[1] = jnp.where(ok, yn, y)
        vs[2] = jnp.where(ok, zn, z)
        vs[3] = jnp.where(ok, kxn, kx)
        vs[4] = jnp.where(ok, kyn, ky)
        vs[5] = jnp.where(ok, kzn, kz)
        vs[6] = jnp.where(ok, s7n, s7)
        ss[:] = status
        ns[:] = ns[:] + ok.astype(jnp.int32)
        es[:] = jnp.where(ok, resid, es[:])
        ms[:] = jnp.where(ok, jnp.maximum(ms[:], resid), ms[:])

        @pl.when(k == nstep_max - 1)
        def _finalize():
            st_f = ss[:]
            # still-live rays exhausted the step budget
            st_f = jnp.where(
                st_f == 0, jnp.full_like(st_f, int(StopCode.NSTEP_MAX)), st_f)
            for i in range(7):
                out_v_ref[i] = vs[i]
            out_st_ref[:] = st_f
            out_np_ref[:] = 1 + ns[:]
            out_endres_ref[:] = es[:]
            out_maxres_ref[:] = ms[:]

    @jax.jit
    def run(v0, status0):
        B = v0.shape[0]
        pad = (-B) % BLOCK
        nv = v0.shape[1]
        vp = jnp.pad(v0[:, :7], ((0, pad), (0, 0)))
        stp = jnp.pad(status0, (0, pad),
                      constant_values=int(StopCode.DID_NOT_START))
        n_total = B + pad
        rows = n_total // LANES
        # (7, rows, 128) with ray blocks along rows
        v_in = jnp.moveaxis(vp.astype(dt).reshape(rows, LANES, 7), -1, 0)
        st_in = stp.reshape(rows, LANES)
        nblocks = rows // SUBS

        # index maps return i32 literals: under jax_enable_x64 a bare `0`
        # lowers as an i64 constant, which Mosaic cannot legalize in the
        # index-map function signature (NumPy scalars, not jnp — index maps
        # must not capture traced constants).  The step axis k never moves
        # the blocks: each ray block stays resident in VMEM for its whole
        # trajectory; outputs are written at the last step only.
        vmap3 = lambda i, k: (np.int32(0), i, np.int32(0))
        vmap2 = lambda i, k: (i, np.int32(0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nblocks, nstep_max),
            in_specs=[
                pl.BlockSpec((7, SUBS, LANES), vmap3,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUBS, LANES), vmap2,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((7, SUBS, LANES), vmap3,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUBS, LANES), vmap2,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUBS, LANES), vmap2,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUBS, LANES), vmap2,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUBS, LANES), vmap2,
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((7, SUBS, LANES), dt),   # ray state
                pltpu.VMEM((SUBS, LANES), jnp.int32),  # status
                pltpu.VMEM((SUBS, LANES), jnp.int32),  # accepted steps
                pltpu.VMEM((SUBS, LANES), dt),      # end residual
                pltpu.VMEM((SUBS, LANES), dt),      # max residual
            ],
        )
        out_shape = [
            jax.ShapeDtypeStruct((7, rows, LANES), dt),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), dt),
            jax.ShapeDtypeStruct((rows, LANES), dt),
        ]
        v_f, st_f, np_f, er_f, mr_f = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape)(v_in, st_in)

        v_out = jnp.moveaxis(v_f, 0, -1).reshape(n_total, 7)[:B]
        if nv > 7:
            v_out = jnp.concatenate(
                [v_out, jnp.zeros((B, nv - 7), v_out.dtype)], axis=1)
        return (v_out, st_f.reshape(-1)[:B], np_f.reshape(-1)[:B],
                er_f.reshape(-1)[:B], mr_f.reshape(-1)[:B])

    v_f, status_f, npoints, end_res, max_res = run(v0, status0)
    B = v0.shape[0]
    return RayResults(
        ray_vec=jnp.zeros((B, 1, v0.shape[1]), v_f.dtype),
        residual=jnp.zeros((B, 1), v_f.dtype),
        npoints=npoints,
        stop_flag=status_f,
        initial_ray_power=pwr_wt,
        end_residuals=end_res,
        max_residuals=max_res,
        end_ray_parameter=v_f[:, 6],
        start_ray_vec=v0,
        end_ray_vec=v_f,
    )
