"""Wave-physics core tests: Stix parameters, pole-free polynomial identity,
dispersion roots, AD-vs-closed-form derivative oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rays_tpu import constants
from rays_tpu.config import schema
from rays_tpu.config.namelist import parse_namelist
from rays_tpu.models import base
from rays_tpu.wave import deriv_cold, dispersion, stix

SLAB_IN = """
&diagnostics_list
 run_label='t', integrate_eq_gradients=.false.
/
&species_list
 n0=1.0e20,
 spec_name(0)='electron', t0s(0)=5.0e3,
 spec_name(1)='deuterium', t0s(1)=1.0e2, eta(1)=1.
/
&rf_list
 frf=90.e9, k0_sign=1, wave_mode='minus', ray_dispersion_model='cold',
 ray_param='time', dispersion_resid_limit=0.1
/
&damping_list
 damping_model='no_damp'
/
&equilibrium_list
 equilib_model='slab'
/
&slab_eq_list
 bx_prof_model='zero', by_prof_model='constant', by0=0.0,
 bz_prof_model='constant', bz0=1.286,
 dens_prof_model='linear', Ln_scale=0.714286,
 rmaj=1., rmin=.5, t_prof_model=2*'zero',
 xmin=-0.5, xmax=0.5, ymin=-0.5, ymax=0.5, zmin=-1., zmax=1.
/
&ode_list
 ode_solver_name='RK4_ODE', nstep_max=100, ds=5.e-11, s_max=1.0
/
"""


@pytest.fixture(scope="module")
def slab_setup():
    return schema.from_namelist(parse_namelist(SLAB_IN))


def _alpha_gamma(cfg, params, x):
    return dispersion.alpha_gamma(cfg, params, x, params.rf.omgrf)


def test_poly_equals_t_times_stix(slab_setup):
    """D_poly == prod(1-gamma^2) * (S n1s^2 + B n1s + C) — the identity that
    makes the traced Hamiltonian pole-free (cf. deriv_cold.f90 /
    suscep_m.f90:244-247)."""
    cfg, params = slab_setup
    x = jnp.array([-0.1, 0.0, 0.0])
    alpha, gamma, _, _ = _alpha_gamma(cfg, params, x)
    S, D, P, R, L = stix.rlsdp(alpha, gamma)
    t = np.prod(1.0 - np.asarray(gamma) ** 2)
    for n1sq, n3 in [(0.3, 0.4), (2.0, -0.7), (-0.5, 0.9)]:
        a, b, c = S, -R * L - P * S + n3**2 * (P + S), P * (n3**2 - R) * (n3**2 - L)
        stix_D = a * n1sq**2 + b * n1sq + c
        poly = dispersion.poly_D_of_n(alpha, gamma, jnp.float64(n1sq), jnp.float64(n3))
        np.testing.assert_allclose(float(poly), float(t * stix_D), rtol=1e-12)


def test_dispersion_roots_satisfy_D(slab_setup):
    """Each root of the cold biquadratic must zero the dispersion function."""
    cfg, params = slab_setup
    x = jnp.array([-0.08, 0.0, 0.0])
    alpha, gamma, _, _ = _alpha_gamma(cfg, params, x)
    n3 = jnp.float64(0.5)
    roots, evan = dispersion.solve_cold_n1sq_vs_n3(alpha, gamma, n3)
    assert not bool(evan)
    S, D, P, R, L = stix.rlsdp(alpha, gamma)
    for r in np.asarray(roots):
        res = S * r**2 + (-R * L - P * S + float(n3) ** 2 * (P + S)) * r \
            + P * (float(n3) ** 2 - R) * (float(n3) ** 2 - L)
        scale = abs(S * r**2) + abs(P * R * L) + 1.0
        assert abs(res) / scale < 1e-10


def test_fast_slow_labeling(slab_setup):
    cfg, params = slab_setup
    x = jnp.array([-0.08, 0.0, 0.0])
    alpha, gamma, _, _ = _alpha_gamma(cfg, params, x)
    roots, _ = dispersion.solve_cold_n1sq_vs_n3(alpha, gamma, jnp.float64(0.5))
    roots = np.asarray(roots)
    assert abs(roots[2]) <= abs(roots[3])  # fast has smaller |n1sq|
    assert {roots[2], roots[3]} == {roots[0], roots[1]}


def test_nsq_vs_theta_matches_n1sq_at_angles(slab_setup):
    """Appleton-Hartree solver: each root zeros a*n^4 + b*n^2 + c."""
    cfg, params = slab_setup
    x = jnp.array([-0.08, 0.0, 0.0])
    alpha, gamma, _, _ = _alpha_gamma(cfg, params, x)
    theta = jnp.float64(0.7)
    nsq = np.asarray(dispersion.solve_cold_nsq_vs_theta(alpha, gamma, theta))
    S, D, P, R, L = stix.rlsdp(alpha, gamma)
    c2 = np.cos(0.7) ** 2
    s2 = 1 - c2
    a = S * s2 + P * c2
    b = -R * L * s2 - P * S * (1 + c2)
    c = P * R * L
    for r in nsq[:2]:
        assert abs(a * r**2 + b * r + c) / (abs(a * r**2) + abs(c) + 1) < 1e-10


def test_ad_matches_closed_form_deriv_cold(slab_setup):
    """jax.grad of the scalar D must equal the independently coded
    closed-form chain rule (the deriv_cold.f90 oracle) to near machine
    precision — the framework's replacement for the reference's
    cold-vs-numerical A/B (eqn_ray.f90:106-123)."""
    cfg, params = slab_setup
    omgrf, k0 = params.rf.omgrf, params.rf.k0
    for xv, nv in [
        ([-0.08, 0.0, 0.0], [0.3, 0.0, 0.4]),
        ([0.1, 0.02, -0.1], [0.5, 0.1, 0.6]),
    ]:
        x = jnp.asarray(xv)
        nvec = jnp.asarray(nv)
        kvec = k0 * nvec

        D = lambda xx, kk, ww: dispersion.dispersion_D(cfg, params, xx, kk, ww)
        dddx_ad, dddk_ad, dddw_ad = jax.grad(D, argnums=(0, 1, 2))(x, kvec, omgrf)

        eq = base.equilibrium(cfg, params, x)
        dddx_o, dddk_o, dddw_o = deriv_cold.deriv_cold(eq, nvec, omgrf, k0)

        np.testing.assert_allclose(np.asarray(dddx_ad), np.asarray(dddx_o),
                                   rtol=1e-8, atol=1e-20)
        np.testing.assert_allclose(np.asarray(dddk_ad), np.asarray(dddk_o),
                                   rtol=1e-10)
        np.testing.assert_allclose(float(dddw_ad), float(dddw_o), rtol=1e-10)


def test_ad_matches_finite_differences(slab_setup):
    """Second oracle: central finite differences of D (reproduces the
    reference's deriv_num check, deriv_num.f90:36-84)."""
    cfg, params = slab_setup
    omgrf, k0 = params.rf.omgrf, float(params.rf.k0)
    x = np.array([-0.08, 0.0, 0.0])
    kvec = k0 * np.array([0.3, 0.0, 0.4])

    D = lambda xx, kk, ww: float(
        dispersion.dispersion_D(cfg, params, jnp.asarray(xx), jnp.asarray(kk), ww))
    dddx_ad, dddk_ad, dddw_ad = jax.grad(
        lambda xx, kk, ww: dispersion.dispersion_D(cfg, params, xx, kk, ww),
        argnums=(0, 1, 2))(jnp.asarray(x), jnp.asarray(kvec), jnp.float64(omgrf))

    for i in range(3):
        hx = 1e-6
        dx = np.zeros(3); dx[i] = hx
        fd = (D(x + dx, kvec, omgrf) - D(x - dx, kvec, omgrf)) / (2 * hx)
        np.testing.assert_allclose(float(dddx_ad[i]), fd, rtol=1e-5, atol=1e-12)
        hk = 1e-6 * k0
        dk = np.zeros(3); dk[i] = hk
        fd = (D(x, kvec + dk, omgrf) - D(x, kvec - dk, omgrf)) / (2 * hk)
        np.testing.assert_allclose(float(dddk_ad[i]), fd, rtol=1e-5)
    hw = 1e-4 * omgrf * 1e-3
    fd = (D(x, kvec, omgrf + hw) - D(x, kvec, omgrf - hw)) / (2 * hw)
    np.testing.assert_allclose(float(dddw_ad), fd, rtol=1e-4)


def test_residual_zero_on_shell(slab_setup):
    """The check_save residual vanishes when (n1, n3) solves the dispersion
    relation and is O(1) otherwise."""
    cfg, params = slab_setup
    x = jnp.array([-0.08, 0.0, 0.0])
    alpha, gamma, _, _ = _alpha_gamma(cfg, params, x)
    n3 = jnp.float64(0.5)
    roots, _ = dispersion.solve_cold_n1sq_vs_n3(alpha, gamma, n3)
    n1 = jnp.sqrt(roots[1])  # minus root
    res_on = float(dispersion.residual(alpha, gamma, n1, n3))
    res_off = float(dispersion.residual(alpha, gamma, n1 * 1.5, n3))
    assert res_on < 1e-12
    assert res_off > 1e-3
