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
