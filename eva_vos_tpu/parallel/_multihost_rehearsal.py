"""Child process of the 2-process multihost rehearsal (VERDICT r4 #7).

Runs the REAL multi-host code path — ``init_distributed`` ->
``jax.distributed`` rendezvous -> global mesh -> one cross-process
collective -> ``host_shard_range`` — on the CPU backend (gloo collectives),
so eval ``--multihost`` is exercised end-to-end in CI without TPU pods.
Mirrors the reference's NCCL rendezvous smoke (``util/dist.py:18-45``).

Usage (spawned by ``__graft_entry__.dryrun_multihost``):
    XLA_FLAGS=--xla_force_host_platform_device_count=2 \
    python -m eva_vos_tpu.parallel._multihost_rehearsal <pid> <nproc> <port>
"""

import sys


def main(process_id: int, num_processes: int, port: str):
    import jax

    jax.config.update("jax_platforms", "cpu")

    from eva_vos_tpu.parallel.mesh import (init_distributed,
                                           host_shard_range, make_mesh,
                                           data_sharding)

    assert init_distributed(coordinator_address=f"localhost:{port}",
                            num_processes=num_processes,
                            process_id=process_id)
    assert jax.process_count() == num_processes, jax.process_count()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    ndev = len(jax.devices())
    nloc = len(jax.local_devices())
    assert ndev == nloc * num_processes, (ndev, nloc)

    # the eval CLI's per-host video sharding (cli --multihost)
    lo, hi = host_shard_range(10)
    exp_per = -(-10 // num_processes)
    assert (lo, hi) == (min(process_id * exp_per, 10),
                        min(process_id * exp_per + exp_per, 10)), (lo, hi)

    # one cross-process mesh collective: psum of per-device values
    mesh = make_mesh()
    f = jax.jit(jax.shard_map(lambda x: jax.lax.psum(x, "data"),
                              mesh=mesh, in_specs=P("data"),
                              out_specs=P()))
    x = jnp.arange(ndev, dtype=jnp.float32)
    xs = jax.device_put(x, data_sharding(mesh))
    out = np.asarray(f(xs).addressable_data(0)).ravel()
    expect = float(np.arange(ndev).sum())
    assert float(out[0]) == expect, (out, expect)
    print(f"[multihost-rehearsal] proc {process_id}/{num_processes}: "
          f"{ndev} global devices, shard [{lo},{hi}), psum {out[0]} OK",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
