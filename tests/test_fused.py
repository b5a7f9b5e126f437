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

    ref = jax.jit(lambda p, v, s, w: trace_mod.trace_batch(cfg, p, v, s, w))(
        params32, v032, st, pwr32)
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
                                   atol=2e-4 * sx, rtol=0,
                                   err_msg=f"ray {ir} end position")
        np.testing.assert_allclose(ev_got[ir, 3:6], ev_ref[ir, 3:6],
                                   atol=2e-4 * sk, rtol=0,
                                   err_msg=f"ray {ir} end k")
    np.testing.assert_allclose(np.asarray(got.max_residuals),
                               np.asarray(ref.max_residuals),
                               atol=1e-6, rtol=0.3)


def test_fused_rejects_unsupported_configs():
    import dataclasses

    cfg, params, v0, st, pwr = examples.setup_example(examples.SLAB_ECH_DAMPED)
    assert not fused_slab.supported(
        dataclasses.replace(cfg, save_trajectory=False))  # damping on
    cfg2, *_ = examples.setup_example(examples.SOLOVEV_ECH_90GHZ)
    assert not fused_slab.supported(
        dataclasses.replace(cfg2, save_trajectory=False))  # not slab
