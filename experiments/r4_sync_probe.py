"""Probe the axon tunnel's synchronization semantics (r4).

r4_bench_full1 recorded interactive rounds at ~0.5 ms each — physically
impossible for the 480p T=60 interact program (~300 ms of device work) —
while r3's identical code recorded plausible 50-100 ms rounds.  Hypothesis:
``jax.block_until_ready`` on DONATED outputs through the tunnel can return
before execution completes (aliased output buffers inherit the input
buffer's already-signalled readiness event), so per-round wall timing
collapses to dispatch cost.

This probe measures, on a deliberately slow chained matmul (fori_loop with
a real data dependency, the verify-skill-recommended pattern):
  1. scalar device_get RTT on an already-ready buffer,
  2. non-donated: block_until_ready vs device_get timing,
  3. donated chain: per-call block_until_ready timing vs a single
     end-of-chain device_get,
and prints one JSON line for experiments/r4_sync_probe.json.
"""

import json
import time

import jax
import jax.numpy as jnp

N = 4096
LOOPS = 64  # ~2*64*4096^3 = 8.8 TFLOP -> ~50-90 ms on a v5e


def chain(x):
    def body(_, y):
        return y @ y * (1.0 / N)  # keep magnitudes bounded

    return jax.lax.fori_loop(0, LOOPS, body, x)


f_plain = jax.jit(chain)
f_donated = jax.jit(chain, donate_argnums=(0,))

out = {"device": jax.devices()[0].device_kind}

x0 = jnp.ones((N, N), jnp.bfloat16) * 0.5
jax.block_until_ready(x0)

# 1. scalar RTT on a ready buffer
small = jnp.zeros((), jnp.int32) + 1
jax.block_until_ready(small)
ts = []
for _ in range(20):
    t0 = time.perf_counter()
    jax.device_get(small)
    ts.append(time.perf_counter() - t0)
ts.sort()
out["scalar_device_get_rtt_ms"] = round(ts[len(ts) // 2] * 1e3, 3)

# 2. non-donated
y = f_plain(x0)  # compile
jax.block_until_ready(y)
t0 = time.perf_counter()
for _ in range(3):
    y = f_plain(x0)
    jax.block_until_ready(y)
out["plain_block_ms_per_call"] = round(
    (time.perf_counter() - t0) / 3 * 1e3, 2)
t0 = time.perf_counter()
for _ in range(3):
    y = f_plain(x0)
    jax.device_get(y[0, 0])
out["plain_device_get_ms_per_call"] = round(
    (time.perf_counter() - t0) / 3 * 1e3, 2)

# 3. donated chain
x = f_plain(x0)  # fresh buffer we own
jax.block_until_ready(x)
x = f_donated(x)  # compile donated variant
jax.block_until_ready(x)
per_call = []
for _ in range(6):
    t0 = time.perf_counter()
    x = f_donated(x)
    jax.block_until_ready(x)
    per_call.append((time.perf_counter() - t0) * 1e3)
out["donated_block_ms_per_call"] = [round(v, 2) for v in per_call]

jax.device_get(x[0, 0])  # drain
t0 = time.perf_counter()
for _ in range(6):
    x = f_donated(x)
jax.device_get(x[0, 0])
out["donated_chain6_end_sync_ms_per_call"] = round(
    (time.perf_counter() - t0) / 6 * 1e3, 2)

print(json.dumps(out))
