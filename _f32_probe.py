import dataclasses, time, json
import jax, jax.numpy as jnp
import rays_tpu
from rays_tpu import examples
from rays_tpu.tracing import trace as trace_mod

def cast(tree, dt):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dt) if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

cfg, params, v0, status0, pwr = examples.setup_example()
cfg = dataclasses.replace(cfg, nstep_max=500, save_trajectory=False)
N = 32768
v0, status0, pwr = examples.replicate_rays(v0, status0, pwr, N)

for dt in (jnp.float64, jnp.float32):
    p, v, w = cast(params, dt), cast(v0, dt), cast(pwr, dt)
    tracer = jax.jit(lambda p, v, st, w: trace_mod.trace_batch(cfg, p, v, st, w))
    res = tracer(p, v, status0, w); jax.block_until_ready(res)
    t0 = time.perf_counter()
    for _ in range(3):
        res = tracer(p, v, status0, w); jax.block_until_ready(res)
    dtm = (time.perf_counter()-t0)/3
    print(dt.__name__, f"{N/dtm:.0f} rays/s", f"{dtm:.3f}s",
          "endpos[0]=", res.end_ray_vec[0,:3], "flag:", res.stop_flag[0], "npts:", res.npoints[0])
