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


def test_two_process_dd_scale(tmp_path):
    """Round-5 scale tier (VERDICT r4 item 6): 100k skewed particles,
    overflow + host-side recovery across the process boundary, and the
    cross-process comm-stat digest must EXACTLY equal the
    single-process 8-device run's."""
    import json

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import _dd_scale_scenario as sc
    from zpc_tpu.parallel.mesh import make_mesh
    from zpc_tpu.sim.domain_decomp import gather_dd_particles

    # single-process comparator on this process's 8 virtual devices
    sim, st = sc.build()
    ref_x, ref_v = sc.oracle(sim, st)
    dds, n_rec, stats_all = sc.run_dd(sim, st, make_mesh(8))
    assert n_rec >= 1, "scenario no longer overflows NB_SMALL"
    digest = sc.stats_digest(stats_all)
    got = gather_dd_particles(dds, sc.N)
    np.testing.assert_allclose(got["x"], ref_x, atol=1e-5)
    np.testing.assert_allclose(got["v"], ref_v, atol=5e-4)

    ref_path = str(tmp_path / "dd_scale_ref.npz")
    np.savez(ref_path, x=ref_x, v=ref_v)

    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "_multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), "scale", ref_path],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=root) for pid in range(2)]
    outs = []
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        outs.append(out.decode())
        assert p.returncode == 0, f"worker {pid} failed:\n{outs[-1]}"
    for pid, out in enumerate(outs):
        assert f"WORKER{pid} OK" in out
        rec = [ln for ln in out.splitlines() if ln.startswith("RECOVERED ")]
        assert rec and int(rec[0].split()[1]) == n_rec, (n_rec, rec)
        dig = [ln for ln in out.splitlines() if ln.startswith("DIGEST ")]
        assert dig, out
        assert json.loads(dig[0][len("DIGEST "):]) == digest, \
            f"worker {pid} comm-stat digest differs from single-process"
