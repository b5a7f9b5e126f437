"""Throughput-vs-batch-size scan artifact (the reference's num_threads
thread-scaling scan analog, scanner_m.f90:1-20 / openmp_m.f90).

Sweeps the slab ECH forward trace (f32, production precision) over ray
batch sizes and records rays/s — the saturation curve that sets the
production batch.  Writes artifacts/batch_scan_slab.txt.
"""

import dataclasses
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import rays_tpu  # noqa: F401,E402
from rays_tpu import examples  # noqa: E402
from rays_tpu.utils import ray_scan  # noqa: E402


def main():
    cfg, params, v0, st, pwr = examples.setup_example()
    cfg = dataclasses.replace(cfg, nstep_max=500, save_trajectory=False)
    cast = lambda t, d: jax.tree_util.tree_map(
        lambda x: x.astype(d)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, t)
    p32 = cast(params, jnp.float32)
    rows = ray_scan.batch_scan(
        cfg, p32, v0.astype(jnp.float32), st, pwr.astype(jnp.float32),
        [256, 1024, 4096, 16384, 65536, 262144])
    os.makedirs("artifacts", exist_ok=True)
    path = ray_scan.write_scan_summary(rows, "artifacts/batch_scan_slab.txt")
    for r in rows:
        print(f"batch {r['batch']:>7}: {r['rays_per_s']:>12,.0f} rays/s")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
