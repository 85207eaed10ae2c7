"""Multi-PROCESS data parallelism (the reference's DDP analog).

The in-suite mesh tests (test_parallel.py) and the driver's
dryrun_multichip(8) prove multi-DEVICE sharding inside one process;
this test proves the multi-process layer the reference implements with
torch.distributed NCCL DDP (nav_dic_pretrain.py:765, 250-256) and the
OMPI env plumbing (tasks/R2R/distributed.py:7-32): two OS processes,
each owning 4 virtual CPU devices, join one jax.distributed job
through dasa_tpu.parallel.distributed.initialize's env-var discovery,
build a single global mesh, and compute a gradient whose data axis is
sharded ACROSS the process boundary.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("n_proc", [2])
def test_two_process_data_parallel(n_proc):
    port = _free_port()
    procs = []
    for rank in range(n_proc):
        env = dict(os.environ)
        env.update({
            "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "NUM_PROCESSES": str(n_proc),
            "PROCESS_ID": str(rank),
            "JAX_PLATFORMS": "cpu",
            # keep workers off any persistent/AOT cache surprises
            "DASA_AOT_CACHE": "0",
            # `python tests/_worker.py` puts tests/ (not the repo) on
            # sys.path; prepend the repo, preserving any existing path
            # (e.g. the axon site dir)
            "PYTHONPATH": REPO + (
                os.pathsep + env["PYTHONPATH"]
                if env.get("PYTHONPATH") else ""),
        })
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n"
                    + "\n---\n".join(o or "" for o in outs))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"rank {rank} failed (rc={p.returncode}):\n{out[-4000:]}"
    # rank-0 gate: exactly the primary printed the marker
    assert "MULTIPROC_OK" in outs[0], outs[0][-4000:]
    assert "MULTIPROC_OK" not in outs[1]
