"""Tiny TPU liveness probe: prints device list + one matmul timing.

Used to check the axon tunnel's health before queueing long benchmarks
(a wedged claim leg makes jax.devices() hang forever).
"""

import time

import jax
import jax.numpy as jnp

t0 = time.time()
print("devices:", jax.devices(), flush=True)
x = jnp.ones((2048, 2048), jnp.bfloat16)
y = jax.jit(lambda a: (a @ a).sum())(x)
jax.block_until_ready(y)
print(f"alive: matmul ok in {time.time() - t0:.1f}s", flush=True)
