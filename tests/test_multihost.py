"""Multi-host story: 2 processes x 4 virtual CPU devices, DCN-simulated
collectives through jax.distributed (SURVEY milestone 4 / §5.8)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_collectives():
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "_multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=root) for pid in range(2)]
    outs = []
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=280)
        outs.append(out.decode())
        assert p.returncode == 0, f"worker {pid} failed:\n{outs[-1]}"
    assert "WORKER0 OK" in outs[0]
    assert "WORKER1 OK" in outs[1]
