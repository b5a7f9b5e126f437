"""O-X mode-conversion analysis (Mjolhus 1984 model).

Re-design of reference RAYS_project/post_process_lib/OX_conv_analysis_m.f90:
for each O-mode ray approaching cutoff from low density,
1) find the trajectory point of maximum alpha = (omega_pe/omega)^2,
2) Newton-iterate from there to the nearest point of the cutoff surface
   alpha = 1 along grad(alpha),
3) evaluate the Mjolhus Eq. 19 conversion coefficient in the
   (grad ne, B) frame (OX_conv_analysis_m.f90:318-394):

   n_crit = sin(theta) sqrt(gamma/(1+gamma))
   F = (1+gamma) sqrt(gamma) / 2 / ((1+gamma) cos^2 + sin^2/2)^{3/2}
   G = sqrt(gamma) / 2 / sqrt((1+gamma) cos^2 + sin^2/2)
   T = exp(-pi k0 L (F (|nz| - n_crit)^2 + G |ny|^2)),  L = ne/|grad ne|

4) rays with T <= 1e-4 (conversion_threshold) are considered
   non-converting.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rays_tpu.models import base
from rays_tpu.wave import dispersion

CONVERSION_THRESHOLD = 1.0e-4  # OX_conv_analysis_m.f90:32
_NEWTON_ITERS = 20


class OXConv(NamedTuple):
    ray_number: int
    step_number: int
    alpha_max: float
    x_max: np.ndarray
    k_max: np.ndarray
    x_cut: np.ndarray
    conv_coeff: float


def _alpha_e(cfg, params, x):
    alpha, _, _, _ = dispersion.alpha_gamma(cfg, params, x, params.rf.omgrf)
    return alpha[0]


def _find_cutoff_point(cfg, params, x0):
    """Newton toward alpha(x) = 1 along grad(alpha)."""
    f = lambda x: _alpha_e(cfg, params, x)

    def body(_, x):
        a, g = jax.value_and_grad(f)(x)
        g2 = jnp.maximum(jnp.sum(g**2), 1e-30)
        return x + (1.0 - a) * g / g2

    x_cut = jax.lax.fori_loop(0, _NEWTON_ITERS, body, x0)
    return x_cut, jnp.abs(f(x_cut) - 1.0) < 1e-6


def _conv_coeff(cfg, params, x_max, k_max, x_cut):
    """Mjolhus Eq. 19 in the reference's (xc, yc, zc) frame."""
    k0 = params.rf.k0
    eq = base.equilibrium(cfg, params, x_cut)
    gradne = eq.gradns[0]
    xc = gradne / jnp.maximum(jnp.linalg.norm(gradne), 1e-30)
    yc = jnp.cross(eq.bunit, xc)
    yc = yc / jnp.maximum(jnp.linalg.norm(yc), 1e-30)
    zc = jnp.cross(xc, yc)
    theta = jnp.arccos(jnp.clip(jnp.dot(xc, eq.bunit), -1.0, 1.0))
    gam = jnp.abs(eq.gamma[0])
    L = eq.ns[0] / jnp.maximum(jnp.linalg.norm(gradne), 1e-30)

    nz_c = jnp.dot(k_max, zc) / k0
    ny_c = jnp.dot(k_max, yc) / k0

    c2, s2 = jnp.cos(theta) ** 2, jnp.sin(theta) ** 2
    n_crit = jnp.sin(theta) * jnp.sqrt(gam / (1.0 + gam))
    F = 0.5 * (1.0 + gam) * jnp.sqrt(gam) / ((1.0 + gam) * c2 + s2 / 2.0) ** 1.5
    G = 0.5 * jnp.sqrt(gam) / jnp.sqrt((1.0 + gam) * c2 + s2 / 2.0)
    return jnp.exp(-jnp.pi * k0 * L
                   * (F * (jnp.abs(nz_c) - n_crit) ** 2 + G * ny_c**2))


def ox_conv_analysis(cfg, params, results):
    """Returns the list of converting rays (OX_conv records)."""
    ray_vec = np.asarray(results.ray_vec)
    npoints = np.asarray(results.npoints)
    nray = ray_vec.shape[0]

    @jax.jit
    def alpha_along(rv):
        return jax.vmap(lambda x: _alpha_e(cfg, params, x))(rv[:, 0:3])

    @jax.jit
    def cut_and_coeff(x_max, k_max):
        x_cut, ok = _find_cutoff_point(cfg, params, x_max)
        coeff = _conv_coeff(cfg, params, x_max, k_max, x_cut)
        return x_cut, ok, coeff

    converted = []
    for i in range(nray):
        n = int(npoints[i])
        alphas = np.asarray(alpha_along(jnp.asarray(ray_vec[i])))[:n]
        step = int(np.argmax(alphas))
        alpha_max = float(alphas[step])
        # interior maximum below cutoff (found_max semantics)
        if step == 0 or step == n - 1 or alpha_max >= 1.0:
            continue
        x_max = ray_vec[i, step, 0:3]
        k_max = ray_vec[i, step, 3:6]
        x_cut, ok, coeff = cut_and_coeff(jnp.asarray(x_max), jnp.asarray(k_max))
        if not bool(ok):
            continue
        coeff = float(coeff)
        if coeff > CONVERSION_THRESHOLD:
            converted.append(OXConv(
                ray_number=i + 1, step_number=step, alpha_max=alpha_max,
                x_max=x_max, k_max=k_max, x_cut=np.asarray(x_cut),
                conv_coeff=coeff))
    return converted


def write_ox_conversion_data(converted, run_label, path=None):
    """List-directed output (OX_conv_analysis_m.f90:411+)."""
    fname = path or f"OX_conversion.{run_label}"
    with open(fname, "w") as f:
        f.write(f" number_of_rays_converted = {len(converted)}\n")
        for c in converted:
            f.write(f"\n ray {c.ray_number}  step {c.step_number}\n")
            f.write(f" alpha_max = {c.alpha_max:.8g}\n")
            f.write(f" x_max = {' '.join(f'{v:.8g}' for v in c.x_max)}\n")
            f.write(f" x_cut = {' '.join(f'{v:.8g}' for v in c.x_cut)}\n")
            f.write(f" conv_coeff = {c.conv_coeff:.8g}\n")
    return fname
