"""Test environment setup.

On a machine with a CPU backend the suite runs on a virtual 8-device CPU
mesh (so multi-chip sharding paths are exercised without hardware).  In the
axon-tunneled TPU environment there is no CPU backend — JAX_PLATFORMS=cpu is
ignored and everything compiles for the single TPU chip — so we only force
x64 and leave the platform alone.  Multi-device sharding tests skip
themselves when fewer than 2 devices are visible (the driver separately
validates the multi-chip path via __graft_entry__.dryrun_multichip).
"""

import jax

jax.config.update("jax_enable_x64", True)
