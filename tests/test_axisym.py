"""Axisymmetric-toroid equilibrium tests: the analytic <-> EQDSK <-> spline
fidelity loop (re-creating the reference's solovev_2_eqdsk +
compare_analyt_2_interp strategy, SURVEY.md §4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rays_tpu  # noqa: F401
from rays_tpu.config import schema
from rays_tpu.config.namelist import parse_namelist
from rays_tpu.models import base
from rays_tpu.utils import solovev_2_eqdsk
from rays_tpu.utils.eqdsk_io import read_geqdsk, write_geqdsk

AXISYM_TMPL = """
&diagnostics_list
 run_label='ax', integrate_eq_gradients=.false.
/
&species_list
 n0=8.0e19, spec_name(0)='electron', t0s(0)=1.0e3,
 spec_name(1)='deuterium', t0s(1)=1.0e2, eta(1)=1.
/
&rf_list
 frf=90.e9, k0_sign=1, wave_mode='minus', ray_dispersion_model='cold',
 ray_param='arcl', dispersion_resid_limit=0.1
/
&damping_list
 damping_model='no_damp'
/
&equilibrium_list
 equilib_model='axisym_toroid'
/
&axisym_toroid_eq_list
 magnetics_model='{MAG}',
 plasma_psi_limit=1.0,
 density_prof_model='parabolic', alphan1=1.0, alphan2=2.0, d_scrape_off=0.05,
 temperature_prof_model=2*'zero'
/
&solovev_magnetics_list
 rmaj=1.2, outer_boundary=1.55, kappa=1.5, bphi0=2.2, iota0=0.3,
 box_rmin=0.2, box_rmax=2.5, box_zmin=-2.0, box_zmax=2.0
/
&eqdsk_magnetics_spline_interp_list
 eqdsk_file_name='{EQDSK}'
/
&ray_init_list
 ray_init_model='axisym_toroid_ray_init_R_Z_nphi_ntheta', nray_max=20
/
&axisym_toroid_ray_init_R_Z_nphi_ntheta_list
 n_R_launch=1, R_launch0=1.5, n_Z_launch=1, Z_launch0=0.0,
 n_rindex_theta=2, rindex_theta0=0.0, delta_rindex_theta=0.2,
 n_rindex_phi=1, rindex_phi0=0.3
/
&ode_list
 ode_solver_name='RK4_ODE', nstep_max=60, ds=2.e-3, s_max=4.0
/
"""


@pytest.fixture(scope="module")
def eqdsk_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("eqdsk") / "solovev.geqdsk")
    eq = solovev_2_eqdsk.solovev_geqdsk(rmaj=1.2, kappa=1.5, bphi0=2.2,
                                        iota0=0.3, outer_bound=1.55,
                                        nrbox=129, nzbox=129)
    write_geqdsk(path, eq)
    return path


def test_geqdsk_roundtrip(eqdsk_file):
    g = read_geqdsk(eqdsk_file)
    assert g.nrbox == 129 and g.nzbox == 129
    eq = solovev_2_eqdsk.solovev_geqdsk(nrbox=129, nzbox=129)
    np.testing.assert_allclose(g.psi, eq.psi, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(g.psibound, eq.psibound, rtol=1e-8)


def test_spline_magnetics_matches_analytic(eqdsk_file):
    """compare_analyt_2_interp: B from the splined EQDSK must match the
    closed-form Solovev field to spline accuracy (reference
    solovev_2_eqdsk/compare_analyt_2_interp.f90)."""
    cfg_a, p_a = schema.from_namelist(parse_namelist(
        AXISYM_TMPL.format(MAG="solovev_magnetics", EQDSK=eqdsk_file)))
    cfg_s, p_s = schema.from_namelist(parse_namelist(
        AXISYM_TMPL.format(MAG="eqdsk_magnetics_spline_interp", EQDSK=eqdsk_file)))

    pts = jnp.asarray([
        [1.45, 0.0, 0.1], [1.2, 0.3, -0.2], [0.9, 0.2, 0.4], [1.5, 0.0, 0.0],
    ])

    @jax.jit
    def eval_both(p_a, p_s, pts):
        def one(x):
            ea = base.equilibrium(cfg_a, p_a._replace(eq=p_a.eq), x)
            es = base.equilibrium(cfg_s, p_s.__class__(**p_s._asdict()), x)
            return ea.bvec, es.bvec, ea.gradb, es.gradb, ea.ns, es.ns
        return jax.vmap(one)(pts)

    ba, bs, ga, gs, na, nss = (np.asarray(o) for o in eval_both(p_a, p_s, pts))
    # spline-accuracy class: B from psi first derivatives ~ O(h^3),
    # gradb from second derivatives ~ O(h^2), h = 1.35/128
    np.testing.assert_allclose(bs, ba, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(gs, ga, rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(nss, na, rtol=1e-4, atol=1e-6)


def test_axisym_ray_trace_runs(eqdsk_file):
    """End-to-end: ray init on the EQDSK equilibrium + short trace keeps
    the dispersion residual small."""
    from rays_tpu import run as runner
    from rays_tpu.rayinit import vector as init_vector
    from rays_tpu.tracing import trace as trace_mod

    cfg, params = schema.from_namelist(parse_namelist(
        AXISYM_TMPL.format(MAG="eqdsk_magnetics_spline_interp", EQDSK=eqdsk_file)))
    rvec0, rindex0, pwr = runner.init_rays(cfg, params)
    assert rvec0.shape[0] >= 1
    v0 = init_vector.initial_ode_vectors(cfg, params, rvec0, rindex0)
    st = jnp.zeros((v0.shape[0],), jnp.int32)
    res = jax.jit(lambda p, v, s, w: trace_mod.trace_batch(cfg, p, v, s, w))(
        params, v0, st, pwr)
    assert np.asarray(res.npoints).min() > 5
    assert np.asarray(res.max_residuals).max() < 1e-4


def test_lin_interp_accuracy_ab(eqdsk_file):
    """The linear FD backend is a true second path: its B field must agree
    with the analytic Solovev field at bilinear+FD accuracy — strictly
    worse than the spline backend but convergent (the reference keeps the
    lin backend exactly for this A/B, eqdsk_magnetics_lin_interp_m.f90:2-6).
    """
    cfg_a, p_a = schema.from_namelist(parse_namelist(
        AXISYM_TMPL.format(MAG="solovev_magnetics", EQDSK=eqdsk_file)))
    cfg_s, p_s = schema.from_namelist(parse_namelist(
        AXISYM_TMPL.format(MAG="eqdsk_magnetics_spline_interp", EQDSK=eqdsk_file)))
    cfg_l, p_l = schema.from_namelist(parse_namelist(
        AXISYM_TMPL.format(MAG="eqdsk_magnetics_lin_interp", EQDSK=eqdsk_file)))
    from rays_tpu.models import axisym_toroid as at

    pts = jnp.asarray([
        [1.45, 0.0, 0.1], [1.2, 0.3, -0.2], [0.9, 0.2, 0.4], [1.5, 0.0, 0.0],
    ])

    @jax.jit
    def eval_all(p_a, p_s, p_l, pts):
        def one(x):
            ba = base.equilibrium(cfg_a, p_a, x).bvec
            bs = base.equilibrium(cfg_s, p_s, x).bvec
            bl = base.equilibrium(cfg_l, p_l, x).bvec
            return ba, bs, bl
        return jax.vmap(one)(pts)

    ba, bs, bl = (np.asarray(o) for o in eval_all(p_a, p_s, p_l, pts))
    err_spline = np.abs(bs - ba).max()
    err_lin = np.abs(bl - ba).max()
    # bilinear first derivatives: O(h) at generic points, h = 1.35/128
    assert err_lin < 0.05
    # the spline is the higher-order path: the A/B must show it
    assert err_spline < err_lin
    # and the lin backend refuses the rho machinery, as in the reference
    with pytest.raises(ValueError):
        at.rho_of_psiN(p_l.eq, jnp.asarray(0.5))


@pytest.fixture(scope="module")
def eqdsk_file_with_q(tmp_path_factory, eqdsk_file):
    """The Solovev generator writes Q = 0 exactly (matching reference
    solovev_2_eqdsk.f90:90), which carries no rho information.  Graft a
    smooth physical safety-factor profile onto the same equilibrium so the
    rho coordinate machinery has something real to interpolate."""
    import dataclasses as _dc

    g = read_geqdsk(eqdsk_file)
    psiN = np.linspace(0.0, 1.0, len(g.Q))
    g2 = _dc.replace(g, Q=1.1 + 2.4 * psiN**2)
    path = str(tmp_path_factory.mktemp("eqdsk_q") / "solovev_q.geqdsk")
    write_geqdsk(path, g2)
    return path


def test_rho_unavailable_on_q_zero_files(eqdsk_file):
    """Solovev-generated EQDSK files carry Q = 0: the rho machinery must
    refuse cleanly (reference behavior: axisym_toroid_rho is unavailable on
    such backends, axisym_toroid_eq_m.f90:399-437), and Ptotal_rho must not
    be offered."""
    from rays_tpu.models import axisym_toroid as at
    from rays_tpu.post import deposition

    cfg, params = schema.from_namelist(parse_namelist(
        AXISYM_TMPL.format(MAG="eqdsk_magnetics_spline_interp", EQDSK=eqdsk_file)))
    assert params.eq.mag.rho_spline is None
    with pytest.raises(ValueError, match="rho coordinate maps unavailable"):
        at.rho_of_psiN(params.eq, jnp.asarray(0.5))
    with pytest.raises(ValueError):
        at.rho_and_grad(cfg.eq_static, params.eq, jnp.asarray([1.4, 0.0, 0.1]))
    names = deposition.profile_names_for_geometry("axisym_toroid", cfg, params)
    assert "Ptotal_rho" not in names
    assert "Ptotal_psi" in names


def test_rho_coordinate_splines(eqdsk_file_with_q):
    """Q(psiN) / rho(psiN) / psiN(rho) coordinate maps (reference
    eqdsk_magnetics_spline_interp_m.f90:183-199,325-390) on an EQDSK with a
    physical Q profile: rho is monotonic, rho(0)=0, rho(1)=1,
    psiN(rho(psiN)) is the identity, and gradrho is parallel to gradpsiN."""
    from rays_tpu.models import axisym_toroid as at

    eqdsk_file = eqdsk_file_with_q
    cfg, params = schema.from_namelist(parse_namelist(
        AXISYM_TMPL.format(MAG="eqdsk_magnetics_spline_interp", EQDSK=eqdsk_file)))

    psiN = jnp.linspace(0.0, 1.0, 41)
    rho, drho = jax.vmap(lambda x: at.rho_of_psiN(params.eq, x))(psiN)
    rho = np.asarray(rho)
    assert rho[0] == pytest.approx(0.0, abs=1e-12)
    assert rho[-1] == pytest.approx(1.0, abs=1e-10)
    assert np.all(np.diff(rho) > 0)
    # inverse map round trip
    psiN_back, _ = jax.vmap(lambda r: at.psiN_of_rho(params.eq, r))(
        jnp.asarray(rho))
    np.testing.assert_allclose(np.asarray(psiN_back), np.asarray(psiN),
                               atol=5e-5)
    # Q spline reproduces the file values at knots
    g = read_geqdsk(eqdsk_file)
    qv, _ = jax.vmap(lambda x: at.q_of_psiN(params.eq, x))(
        jnp.linspace(0.0, 1.0, len(g.Q)))
    np.testing.assert_allclose(np.asarray(qv), g.Q, rtol=1e-10)
    # pointwise rho + grad: parallel to gradpsiN, chain-rule magnitude
    rvec = jnp.asarray([1.4, 0.05, 0.1])
    r, gradr = at.rho_and_grad(cfg.eq_static, params.eq, rvec)
    _, _, psiN_pt, gradpsiN = at.psi_and_grad(cfg.eq_static, params.eq, rvec)
    rho_pt, drho_pt = at.rho_of_psiN(params.eq, psiN_pt)
    assert float(r) == pytest.approx(float(rho_pt), rel=1e-12)
    np.testing.assert_allclose(np.asarray(gradr),
                               np.asarray(gradpsiN) * float(drho_pt),
                               rtol=1e-12)
