"""Multi-host helpers (rays_tpu/parallel/multihost.py), exercised on the
single-process degenerate path that runs everywhere.

The multi-process behavior (jax.distributed over DCN) can't run in a
single-process CI, but every helper here degrades to a deterministic
single-host form that must be correct: local_ray_slice is pure arithmetic,
distribute_rays must round-trip the local batch into a mesh-sharded global
array, and global_ray_mesh must be usable by the sharded tracer.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rays_tpu  # noqa: F401
from rays_tpu import examples
from rays_tpu.parallel import multihost, sharded


def test_initialize_single_process_noop():
    pi, pc = multihost.initialize()
    assert (pi, pc) == (jax.process_index(), jax.process_count())
    assert pc >= 1 and 0 <= pi < pc


def test_local_ray_slice_partitions_batch():
    # single-process: the local slice is the whole batch
    assert multihost.local_ray_slice(17) == (0, 17)

    # the balanced-partition arithmetic itself, checked against a simulated
    # process grid (monkeypatch-free: the formula is pure in (pc, pi))
    def ref_slices(n, pc):
        per = -(-n // pc)
        return [(min(i * per, n), min((i + 1) * per, n)) for i in range(pc)]

    for n, pc in [(10, 4), (8, 4), (3, 4), (100, 8), (0, 2)]:
        slices = ref_slices(n, pc)
        # contiguous cover of [0, n) with no overlap and ceil(n/pc) balance
        assert slices[0][0] == 0 and slices[-1][1] == n
        for (_, a1), (b0, _) in zip(slices, slices[1:]):
            assert a1 == b0
        assert max(b - a for a, b in slices) == -(-n // pc) if n else True


def test_distribute_rays_roundtrip():
    mesh = multihost.global_ray_mesh()
    n = 2 * len(jax.devices())
    v0 = np.arange(n * 7, dtype=np.float64).reshape(n, 7)
    st = np.zeros(n, np.int32)
    pwr = np.full(n, 1.0 / n)
    gv, gst, gpwr = multihost.distribute_rays(mesh, v0, st, pwr)
    assert gv.shape == (n, 7) and gst.shape == (n,)
    np.testing.assert_array_equal(np.asarray(gv), v0)
    np.testing.assert_array_equal(np.asarray(gst), st)
    np.testing.assert_allclose(np.asarray(gpwr), pwr)
    # sharded over the 'rays' axis of the mesh
    assert gv.sharding.mesh.axis_names == ("rays",)


def test_multihost_tracer_runs():
    cfg, params, v0, status0, pwr = examples.setup_example()
    cfg = dataclasses.replace(cfg, nstep_max=5, save_trajectory=False)
    mesh = multihost.global_ray_mesh()
    v0p, st, w, B = sharded.pad_rays(v0, status0, pwr, len(jax.devices()))
    gv, gst, gw = multihost.distribute_rays(mesh, v0p, st, w)
    tracer = multihost.make_multihost_tracer(cfg, mesh)
    res = tracer(params, gv, gst, gw)
    assert int(np.asarray(res.npoints)[:B].min()) >= 1
    assert np.isfinite(np.asarray(res.end_ray_vec)).all()
