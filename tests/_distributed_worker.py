"""Worker for tests/test_distributed.py::test_two_process_data_parallel.

Run as one rank of a 2-process jax.distributed job on CPU (4 virtual
devices per process, 8 global).  Proves the reference's multi-process
DDP capability (nav_dic_pretrain.py:765, 250-256: NCCL init +
DistributedDataParallel) the TPU-native way: coordinator service init
via dasa_tpu.parallel.distributed.initialize, ONE global mesh spanning
both processes, a grad whose data axis is sharded across the process
boundary (GSPMD inserts the cross-process reduction), and the rank-0
gate + global barrier the reference uses around checkpointing.

Not collected by pytest (leading underscore); spawned with
COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID env vars — the same
spellings a production launcher would set.
"""

import os
import sys

# Backend config must land before the first jax backend use: 4 virtual
# CPU devices per process, CPU forced over the container's axon
# sitecustomize (env alone is not enough — CLAUDE.md).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from dasa_tpu.parallel.distributed import (  # noqa: E402
    barrier,
    initialize,
    is_primary,
)
from dasa_tpu.parallel.mesh import make_mesh  # noqa: E402


def main() -> None:
    initialize()  # env-driven: COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 4

    mesh = make_mesh()  # data axis spans both processes
    pid = jax.process_index()

    # Global batch of 16 rows; each process owns its contiguous half —
    # the DistributedSampler-style split (nav_dic_pretrain.py:22-24).
    rows = (np.arange(16, dtype=np.float32).reshape(16, 1) + 1.0)
    local = rows[pid * 8:(pid + 1) * 8]
    batch_sharding = NamedSharding(mesh, P("data", None))
    global_batch = jax.make_array_from_process_local_data(
        batch_sharding, local, global_shape=(16, 1))

    w = jax.device_put(jnp.full((1, 1), 3.0), NamedSharding(mesh, P()))

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    grad = jax.jit(
        jax.grad(loss),
        in_shardings=(NamedSharding(mesh, P()), batch_sharding),
        out_shardings=NamedSharding(mesh, P()),
    )(w, global_batch)

    # d/dw mean((x w)^2) = 2 w mean(x^2) over the GLOBAL batch: only
    # correct if the backward's mean reduced across the process
    # boundary (both halves contribute).
    expected = 2.0 * 3.0 * float(np.mean(rows ** 2))
    got = float(np.asarray(grad)[0, 0])
    np.testing.assert_allclose(got, expected, rtol=1e-5)

    # a deliberately process-skewed psum: rank r contributes (r+1)
    def summed(x):
        return jax.lax.psum(x, "data")

    from jax.experimental.shard_map import shard_map

    ones = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")),
        np.full((4,), float(pid + 1), np.float32), global_shape=(8,))
    tot = jax.jit(shard_map(
        summed, mesh=mesh, in_specs=P("data"), out_specs=P("data")))(ones)
    # every local shard holds the cross-process total: 4*1 + 4*2
    np.testing.assert_allclose(
        np.asarray(tot.addressable_shards[0].data), 12.0)

    barrier("test-done")
    if is_primary():
        print(f"MULTIPROC_OK grad={got}")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
