"""Multi-host (DCN) execution test: two OS processes joined via
jax.distributed.initialize on the CPU backend, running ONE sharded phase-2
train step and ONE psum'd eval confusion histogram across processes.

This turns parallel/mesh.py's claim — "multi-host DCN runs use the same
program via jax.distributed.initialize, the shardings don't change" — into a
demonstrated fact (the reference never initializes torch.distributed at all;
its all_reduce is dormant, /root/reference evaluation.py:134-135).

Each process holds 2 local virtual CPU devices (4 global); the worker script
asserts the cross-process psum'd histogram equals the single-process result
and that the train step produces identical parameters on both processes.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_train_and_eval(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    procs = []
    for pid in range(2):
        procs.append(
            subprocess.Popen(
                [sys.executable, _WORKER, f"127.0.0.1:{port}", str(pid), str(tmp_path)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert "MULTIHOST_OK" in out, f"process {i} missing OK marker:\n{out}"

    def grab(out, key):
        return [l for l in out.splitlines() if l.startswith(key)]

    # both processes observe the identical global loss and histogram mass
    assert grab(outs[0], "LOSS") == grab(outs[1], "LOSS")
    assert grab(outs[0], "HIST") == grab(outs[1], "HIST")
