"""Fused Pallas slab tracer vs the XLA scan path (tracing/fused_slab.py).

The kernel must reproduce trace_batch's summaries (endpoints, npoints,
stop flags, residual statistics) on identical rays — the scan path is the
source of truth, the kernel is the throughput engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rays_tpu  # noqa: F401
from rays_tpu import examples
from rays_tpu.tracing import fused_slab, trace as trace_mod


def _cast(tree, dt):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dt)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


@pytest.mark.parametrize("text,name", [
    (examples.SLAB_ECH_90GHZ, "slab_time"),
])
def test_fused_matches_scan(text, name):
    cfg, params, v0, st, pwr = examples.setup_example(text)
    import dataclasses

    cfg = dataclasses.replace(cfg, save_trajectory=False)
    assert fused_slab.supported(cfg)

    params32 = _cast(params, jnp.float32)
    v032 = v0.astype(jnp.float32)
    pwr32 = pwr.astype(jnp.float32)

    # truth = the f64 scan.  Comparing two f32 paths against each other is
    # the wrong test: each accumulates its own rounding walk over 500
    # steps (measured here: scan-f32 drifts up to ~1.7e-3 of trajectory
    # scale from f64, the kernel ~2.3e-4 — the kernel is the MORE accurate
    # f32 path, its ops staying fused in VMEM), so f32-vs-f32 disagreement
    # is dominated by the scan's own error.
    ref = jax.jit(lambda p, v, s, w: trace_mod.trace_batch(cfg, p, v, s, w))(
        params, v0, st, pwr)
    jax.block_until_ready(ref)

    got = fused_slab.trace_batch_fused(cfg, params32, v032, st, pwr32)
    jax.block_until_ready(got)

    np.testing.assert_array_equal(np.asarray(got.npoints),
                                  np.asarray(ref.npoints))
    np.testing.assert_array_equal(np.asarray(got.stop_flag),
                                  np.asarray(ref.stop_flag))
    ev_ref = np.asarray(ref.end_ray_vec, np.float64)[:, :7]
    ev_got = np.asarray(got.end_ray_vec, np.float64)[:, :7]
    for ir in range(ev_ref.shape[0]):
        sx = max(np.abs(ev_ref[ir, 0:3]).max(), 1e-12)
        sk = max(np.abs(ev_ref[ir, 3:6]).max(), 1e-12)
        np.testing.assert_allclose(ev_got[ir, 0:3], ev_ref[ir, 0:3],
                                   atol=5e-4 * sx, rtol=0,
                                   err_msg=f"ray {ir} end position")
        np.testing.assert_allclose(ev_got[ir, 3:6], ev_ref[ir, 3:6],
                                   atol=5e-4 * sk, rtol=0,
                                   err_msg=f"ray {ir} end k")
    # residuals: an f32 trajectory's dispersion residual sits at the f32
    # rounding floor (~1e-4, same as the f32 scan's — test_precision.py),
    # far above the f64 scan's ~1e-8; assert the floor, not f64 equality
    mr = np.asarray(got.max_residuals, np.float64)
    assert np.isfinite(mr).all() and (mr > 0).all()
    assert mr.max() < 5e-3, mr


def test_trace_rays_dispatch_validates():
    """trace_rays (the driver-level dispatcher) refuses fused_kernel='on'
    for a non-qualifying run instead of silently falling back."""
    import dataclasses

    import pytest as _pytest

    cfg, params, v0, st, pwr = examples.setup_example(examples.SLAB_ECH_90GHZ)
    cfg_on = dataclasses.replace(cfg, fused_kernel="on")  # save_trajectory on
    with _pytest.raises(ValueError, match="does not qualify"):
        trace_mod.trace_rays(cfg_on, params, v0, st, pwr)
    with _pytest.raises(ValueError, match="invalid fused_kernel"):
        trace_mod.trace_rays(
            dataclasses.replace(cfg, fused_kernel="maybe"),
            params, v0, st, pwr)


def test_fused_rejects_unsupported_configs():
    import dataclasses

    cfg, params, v0, st, pwr = examples.setup_example(examples.SLAB_ECH_DAMPED)
    assert not fused_slab.supported(
        dataclasses.replace(cfg, save_trajectory=False))  # damping on
    cfg2, *_ = examples.setup_example(examples.SOLOVEV_ECH_90GHZ)
    assert not fused_slab.supported(
        dataclasses.replace(cfg2, save_trajectory=False))  # not slab
