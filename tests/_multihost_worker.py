"""Worker for the 2-process multi-host test (spawned by
tests/test_multihost.py).  Each process hosts 4 virtual CPU devices; the
global mesh spans 8 devices over the simulated DCN."""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")   # axon hook overrides the env
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from zpc_tpu.parallel.mesh import (global_array, initialize_distributed,
                                   make_global_mesh, process_info)


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
    me, nproc, nlocal = process_info()
    assert nproc == 2, nproc
    assert nlocal == 4, nlocal
    assert jax.device_count() == 8, jax.device_count()
    mesh = make_global_mesh()

    # psum across the whole (cross-process) mesh
    local = np.full((4, 8), 1.0 + me, np.float32)     # proc0: 1s, proc1: 2s
    ga = global_array(mesh, local)

    @jax.jit
    def total(x):
        return shard_map(
            lambda s: jax.lax.psum(jnp.sum(s), "d"),
            mesh=mesh, in_specs=P("d"), out_specs=P())(x)
    t = float(total(ga))
    # 4 shards of 1*8 from proc 0 + 4 shards of 2*8 from proc 1 = 96
    assert abs(t - 96.0) < 1e-5, t

    # ppermute ring across the process boundary (the dd halo pattern)
    @jax.jit
    def ring(x):
        def f(s):
            nd = jax.lax.axis_size("d")
            src_dst = [(i, (i + 1) % nd) for i in range(nd)]
            return jax.lax.ppermute(s, "d", src_dst)
        return shard_map(f, mesh=mesh, in_specs=P("d"), out_specs=P("d"))(x)
    r = ring(ga)
    mine = np.asarray(
        [s.data for s in r.addressable_shards])        # [4, 1, 8]
    # device k receives device k-1's payload; devices 4..7 live on proc 1,
    # device 4 receives from device 3 (proc 0)
    want_first = 1.0 if me == 1 else 2.0               # wrap for device 0
    assert abs(float(mine[0, 0, 0]) - want_first) < 1e-6, mine[0, 0, 0]

    print(f"WORKER{pid} OK", flush=True)


if __name__ == "__main__":
    main()
