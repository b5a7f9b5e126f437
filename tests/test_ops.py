"""Numeric-library tests: Z function, namelist parser, profiles."""

import jax
import jax.numpy as jnp
import numpy as np

import rays_tpu  # noqa: F401
from rays_tpu.config.namelist import parse_namelist
from rays_tpu.ops import zfun

# Golden values for the Dawson function F(x) (Abramowitz & Stegun 7.1.16).
DAWSN_GOLD = {
    0.0: 0.0,
    0.5: 0.4244363835020223,
    1.0: 0.5380795069127684,
    2.0: 0.3013403889237920,
    5.0: 0.1021340744242768,
}


def test_dawsn_golden():
    xs = jnp.asarray(sorted(DAWSN_GOLD))
    vals = np.asarray(jax.jit(zfun.dawsn)(xs))
    for x, v in zip(sorted(DAWSN_GOLD), vals):
        np.testing.assert_allclose(v, DAWSN_GOLD[x], rtol=1e-12, atol=1e-14)
    # odd function
    neg = np.asarray(jax.jit(zfun.dawsn)(-xs))
    np.testing.assert_allclose(neg, -vals, rtol=1e-13)


def test_dawsn_ode_identity():
    """F'(x) = 1 - 2 x F(x) — the defining ODE of the Dawson function,
    checked at large |x| where no tabulated golden value is reliable."""
    for xv in (3.3, 7.7, 9.5):
        x = jnp.float64(xv)
        fp = float(jax.jit(jax.grad(zfun.dawsn))(x))
        f = float(jax.jit(zfun.dawsn)(x))
        np.testing.assert_allclose(fp, 1.0 - 2.0 * xv * f, rtol=1e-9, atol=1e-12)


def test_zfun_properties():
    """Z(0) = i*sqrt(pi); Z'(x) = -2(1+xZ) matches AD of our Z — and the
    Landau-sign convention of zfun0 (zfunctions_m.f90:57-75)."""
    re0, im0 = jax.jit(zfun.zfun_real_parts)(jnp.float64(0.0))
    assert abs(float(re0)) < 1e-14
    np.testing.assert_allclose(float(im0), np.sqrt(np.pi), rtol=1e-13)

    x = jnp.float64(1.3)
    dre = jax.jit(jax.grad(lambda x: zfun.zfun_real_parts(x)[0]))(x)
    re, _ = jax.jit(zfun.zfun_real_parts)(x)
    # Re Z'(x) = -2(1 + x * Re Z(x))
    np.testing.assert_allclose(float(dre), -2.0 * (1.0 + 1.3 * float(re)),
                               rtol=1e-10)

    # kz < 0 flips via -Z(-x)
    rp, ip = jax.jit(zfun.zfun0_real_parts)(x, jnp.float64(-1.0))
    rm, im = jax.jit(zfun.zfun_real_parts)(x)
    np.testing.assert_allclose(float(rp), float(rm), rtol=1e-13)
    np.testing.assert_allclose(float(ip), -float(im), rtol=1e-13)


def test_namelist_parser_quirks():
    text = """
 &grp_a
  n = 3, x = 1.5e2, flag = .true.
  names = 2*'zero', arr(0) = 5.0e3,
  arr(2) = 7.
  s = 'has space'
/
 &grp_b
  y = -1.d-3
 /
 trailing junk
"""
    g = parse_namelist(text)
    a = g["grp_a"]
    assert a["n"] == 3 and a["x"] == 150.0 and a["flag"] is True
    assert a["names"] == ["zero", "zero"]
    assert a["arr"] == {0: 5000.0, 2: 7.0}
    assert a["s"] == "has space"
    assert g["grp_b"]["y"] == -1e-3


def test_reference_example_inputs_parse():
    """Every committed reference example input must parse."""
    import glob

    files = glob.glob("/root/reference/examples_RAYS/**/*.in", recursive=True)
    assert files, "reference examples not found"
    for f in files:
        with open(f) as fh:
            groups = parse_namelist(fh.read())
        assert groups, f


def test_cell_spline_matches_eval_2d_fp():
    """CellSpline2D (per-cell coefficient form, one gather) is algebraically
    identical to the 16-gather eval_2d_fp — values and both derivatives."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rays_tpu.ops import splines

    rng = np.random.default_rng(3)
    nx, ny = 17, 23
    f1 = rng.standard_normal((nx, ny))
    f2 = rng.standard_normal((nx, ny))
    sp1 = splines.build_spline_2d(0.3, 0.11, -1.0, 0.07, f1)
    sp2 = splines.build_spline_2d(0.3, 0.11, -1.0, 0.07, f2)
    cs = splines.build_cell_spline_2d([sp1, sp2])

    xs = rng.uniform(0.3, 0.3 + 0.11 * (nx - 1), 200)
    ys = rng.uniform(-1.0, -1.0 + 0.07 * (ny - 1), 200)

    @jax.jit
    def both(xs, ys):
        old1 = jax.vmap(lambda a, b: splines.eval_2d_fp(sp1, a, b))(xs, ys)
        old2 = jax.vmap(lambda a, b: splines.eval_2d_fp(sp2, a, b))(xs, ys)
        new = jax.vmap(lambda a, b: splines.eval_cell_2d(cs, a, b))(xs, ys)
        return old1, old2, new

    (o1, o1x, o1y), (o2, o2x, o2y), (nf, nfx, nfy) = both(
        jnp.asarray(xs), jnp.asarray(ys))
    np.testing.assert_allclose(np.asarray(nf[:, 0]), np.asarray(o1),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(nfx[:, 0]), np.asarray(o1x),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(nfy[:, 0]), np.asarray(o1y),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(nf[:, 1]), np.asarray(o2),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(nfx[:, 1]), np.asarray(o2x),
                               rtol=1e-10, atol=1e-10)


def test_mirror_analytic_jacobian_matches_ad():
    """fields_and_jac (one-gather closed-form chain rule) equals the
    generic value_and_jacfwd of fields to rounding, on the real MPEX
    equilibrium."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest as _pytest

    from rays_tpu import run as runner
    from rays_tpu.core.eq_point import value_and_jacfwd
    from rays_tpu.models import multiple_mirror as mm

    mpex = ("/root/reference/examples_RAYS/MPEX_examples/"
            "MPX_2nd_harm_11_rays_nz_delta_d_0.05_psiP_0.05")
    if not os.path.isdir(mpex):
        _pytest.skip("MPEX example not available")
    cwd = os.getcwd()
    os.chdir(mpex)
    try:
        cfg, params, v0, st, pwr = runner.setup("rays.in")
    finally:
        os.chdir(cwd)
    assert mm.supports_analytic_jac(cfg.eq_static, params.eq)

    pts = jnp.asarray(np.asarray(v0[:, 0:3]) + np.array([0.003, 0.001, 0.01]))

    @jax.jit
    def both(xs):
        def one(x):
            an = mm.fields_and_jac(cfg.eq_static, params.eq, params.species, x)
            ad = value_and_jacfwd(
                lambda xx: mm.fields(cfg.eq_static, params.eq,
                                     params.species, xx), x)
            return an, ad

        return jax.vmap(one)(xs)

    (an_v, an_j), (ad_v, ad_j) = both(pts)
    for a, b in zip(jax.tree_util.tree_leaves((an_v, an_j)),
                    jax.tree_util.tree_leaves((ad_v, ad_j))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-11)


def test_axisym_analytic_jacobian_matches_ad():
    """EQDSK-toroid fields_and_jac (psi second derivatives from the single
    coefficient gather) equals value_and_jacfwd of fields to rounding."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rays_tpu.config import schema
    from rays_tpu.config.namelist import parse_namelist
    from rays_tpu.core.eq_point import value_and_jacfwd
    from rays_tpu.models import axisym_toroid as at
    from rays_tpu.utils import solovev_2_eqdsk
    from rays_tpu.utils.eqdsk_io import write_geqdsk
    from test_axisym import AXISYM_TMPL
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "s.geqdsk")
        write_geqdsk(path, solovev_2_eqdsk.solovev_geqdsk(
            rmaj=1.2, kappa=1.5, bphi0=2.2, iota0=0.3, outer_bound=1.55,
            nrbox=65, nzbox=65))
        cfg, params = schema.from_namelist(parse_namelist(AXISYM_TMPL.format(
            MAG="eqdsk_magnetics_spline_interp", EQDSK=path)))
    assert at.supports_analytic_jac(cfg.eq_static, params.eq)

    rng = np.random.default_rng(5)
    pts = jnp.asarray(np.stack([
        rng.uniform(0.9, 1.5, 40), rng.uniform(-0.5, 0.5, 40),
        rng.uniform(-0.4, 0.4, 40)], axis=-1))

    @jax.jit
    def both(xs):
        def one(x):
            an = at.fields_and_jac(cfg.eq_static, params.eq,
                                   params.species, x)
            ad = value_and_jacfwd(
                lambda xx: at.fields(cfg.eq_static, params.eq,
                                     params.species, xx), x)
            return an, ad

        return jax.vmap(one)(xs)

    an, ad = both(pts)
    for a, b in zip(jax.tree_util.tree_leaves(an),
                    jax.tree_util.tree_leaves(ad)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)
