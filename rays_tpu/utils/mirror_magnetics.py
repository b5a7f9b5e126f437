"""Mirror coil-field generator: Br, Bz, Aphi of circular current loops.

Re-design of reference RAYS_project/mirror_magnetics_lib (B_loop_m.f90 +
mirror_magnetics_m.f90 + the mirror_magnetics preprocessing executable):
unit-loop fields via complete elliptic integrals with a near-axis series,
multi-coil superposition (each coil optionally a filament array), evaluated
on a uniform (r, z) grid and written to the Brz netCDF consumed by
mirror_magnetics_spline_interp (schema matching the committed MPEX field
files: r_grid, z_grid, Br/Bz/Aphi on (n_z, n_r), LUFS scalars).

Loop formulas (loop radius a at height z0, current I, field point (r, z),
zp = z - z0, m = k^2 = 4 a r / ((a+r)^2 + zp^2)):

    Aphi = mu0 I / (pi sqrt(m)) * sqrt(a/r) * [(1 - m/2) K(m) - E(m)]
    Br   = mu0 I zp / (2 pi r S) * [-K(m) + (a^2+r^2+zp^2)/D * E(m)]
    Bz   = mu0 I / (2 pi S) * [ K(m) + (a^2-r^2-zp^2)/D * E(m)]
    S = sqrt((a+r)^2 + zp^2),  D = (a-r)^2 + zp^2

with the r -> 0 limits Bz = mu0 I a^2/(2 (a^2+zp^2)^{3/2}), Br ~ O(r),
Aphi ~ mu0 I a^2 r / (4 (a^2+zp^2)^{3/2}) (B_loop_m.f90:40-99 near-axis
series).  Everything is jnp and differentiable (coil-current adjoints).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rays_tpu import constants
from rays_tpu.ops import elliptic

_R_AXIS_EPS = 1e-9


def b_loop(a, current, r, z):
    """(Br, Bz, Aphi) of one loop of radius a at z=0 carrying `current`."""
    r = jnp.asarray(r)
    mu0_i = constants.MU0 * current
    r_safe = jnp.maximum(r, _R_AXIS_EPS)
    s2 = (a + r_safe) ** 2 + z**2
    s = jnp.sqrt(s2)
    d = (a - r_safe) ** 2 + z**2
    m = jnp.clip(4.0 * a * r_safe / s2, 1e-14, 1.0 - 1e-12)
    K, E = elliptic.ellipk_ellipe(m)

    br = mu0_i * z / (2.0 * jnp.pi * r_safe * s) * (
        -K + (a**2 + r_safe**2 + z**2) / d * E)
    bz = mu0_i / (2.0 * jnp.pi * s) * (K + (a**2 - r_safe**2 - z**2) / d * E)
    aphi = (mu0_i / (jnp.pi * jnp.sqrt(m)) * jnp.sqrt(a / r_safe)
            * ((1.0 - m / 2.0) * K - E))

    # near-axis limits
    on_axis = r < 1e-6
    denom = (a**2 + z**2) ** 1.5
    bz_axis = mu0_i * a**2 / (2.0 * denom)
    br_axis = 3.0 * mu0_i * a**2 * r * z / (4.0 * (a**2 + z**2) ** 2.5)
    aphi_axis = mu0_i * a**2 * r / (4.0 * denom)
    br = jnp.where(on_axis, br_axis, br)
    bz = jnp.where(on_axis, bz_axis, bz)
    aphi = jnp.where(on_axis, aphi_axis, aphi)
    return br, bz, aphi


def coil_set_fields(coil_r, coil_z, coil_current, r, z, n_filaments=3,
                    filament_dr=0.01, filament_dz=0.01):
    """Superpose coils; each coil is an n x n filament array around its
    center (mirror_magnetics_m.f90 3x3 filament arrays per coil)."""
    offs = (jnp.arange(n_filaments) - (n_filaments - 1) / 2.0)
    dr = offs * filament_dr
    dz = offs * filament_dz

    def one_coil(a, z0, cur):
        def one_filament(da, dzz):
            return b_loop(a + da, cur / n_filaments**2, r, z - (z0 + dzz))

        br, bz, aphi = jax.vmap(
            lambda da: jax.vmap(lambda dzz: one_filament(da, dzz))(dz))(dr)
        return br.sum(axis=(0, 1)), bz.sum(axis=(0, 1)), aphi.sum(axis=(0, 1))

    br, bz, aphi = jax.vmap(one_coil)(coil_r, coil_z, coil_current)
    return br.sum(axis=0), bz.sum(axis=0), aphi.sum(axis=0)


def generate_field_file(path, coil_r, coil_z, coil_current,
                        r_max=0.2, z_min=0.0, z_max=4.0, n_r=51, n_z=201,
                        r_lufs=None, z_lufs=None, n_filaments=3):
    """Evaluate the coil set on the uniform grid and write the Brz netCDF
    (the mirror_magnetics executable's product, mirror_magnetics_m.f90:377).
    """
    from scipy.io import netcdf_file

    rg = np.linspace(0.0, r_max, n_r)
    zg = np.linspace(z_min, z_max, n_z)
    R, Z = np.meshgrid(rg, zg, indexing="ij")

    coil_r = jnp.asarray(coil_r)
    coil_z = jnp.asarray(coil_z)
    coil_current = jnp.asarray(coil_current)

    br, bz, aphi = jax.jit(lambda rr, zz: coil_set_fields(
        coil_r, coil_z, coil_current, rr, zz, n_filaments))(
        jnp.asarray(R.ravel()), jnp.asarray(Z.ravel()))
    br = np.asarray(br).reshape(n_r, n_z)
    bz = np.asarray(bz).reshape(n_r, n_z)
    aphi = np.asarray(aphi).reshape(n_r, n_z)

    if r_lufs is None:
        r_lufs = 0.9 * r_max
    if z_lufs is None:
        z_lufs = zg[len(zg) // 2]

    f = netcdf_file(path, "w")
    try:
        f.createDimension("n_r", n_r)
        f.createDimension("n_z", n_z)
        for name, val in [("r_min", 0.0), ("r_max", r_max),
                          ("z_min", z_min), ("z_max", z_max),
                          ("r_LUFS", r_lufs), ("z_LUFS", z_lufs)]:
            v = f.createVariable(name, np.float64, ())
            v.data[()] = val
        v = f.createVariable("r_grid", np.float64, ("n_r",)); v[:] = rg
        v = f.createVariable("z_grid", np.float64, ("n_z",)); v[:] = zg
        # match the committed files' (n_z, n_r) C-order layout
        for name, arr in [("Br", br), ("Bz", bz), ("Aphi", aphi)]:
            v = f.createVariable(name, np.float64, ("n_z", "n_r"))
            v[:] = arr.T
    finally:
        f.close()
    return path
