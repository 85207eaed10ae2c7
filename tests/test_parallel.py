"""Multi-device sharding tests on the virtual CPU mesh."""

import jax
import numpy as np
import pytest

from dasa_tpu.parallel import make_mesh, replicate, shard_batch


def test_mesh_and_sharding_helpers():
    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    assert mesh.shape == {"data": 4, "model": 1}
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    xs = shard_batch(x, mesh)
    assert xs.sharding.spec[0] == "data"
    y = replicate({"w": np.ones(5)}, mesh)
    assert y["w"].sharding.is_fully_replicated


@pytest.mark.heavy
def test_dryrun_multichip_two_devices():
    """The driver's dryrun contract at n=2 (n=8 runs via __main__).

    programs="full" adds the split-teacher grad and the fused device
    eval over the mesh — coverage the driver's slim n=8 artifact
    deliberately drops (compile budget on the 1-core host)."""
    import __graft_entry__ as g

    g.dryrun_multichip(2, programs="full")
