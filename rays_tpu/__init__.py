"""rays_tpu — TPU-native differentiable plasma ray-tracing framework.

A ground-up JAX/XLA re-design with the capabilities of ORNL-Fusion/RAYS
(cold-plasma RF geometrical-optics ray tracing; reference layout surveyed in
SURVEY.md).  Not a port: the dispersion relation D(x, k, omega) is a pure
scalar JAX function and the Hamiltonian ray equations are obtained by
autodiff; rays are a vmapped batch integrated by `lax.scan` steppers and
sharded over a `jax.sharding.Mesh`.

Ray trajectories demand float64 (the reference integrates with tolerances
down to 1e-9, cf. reference RAYS_project/RAYS_lib/SG_ode_m.f90); we enable
x64 globally at import.  Benchmarks may still trace in f32 by building f32
params.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the big scan/while_loop tracer graphs take
# minutes to AOT-compile; cache executables across processes.
_cache_dir = os.environ.get("RAYS_TPU_CACHE", os.path.expanduser("~/.rays_tpu_jax_cache"))
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001 - cache is best-effort
    pass

from rays_tpu import constants  # noqa: E402
from rays_tpu.version import __version__  # noqa: E402,F401
