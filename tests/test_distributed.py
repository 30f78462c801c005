"""Multi-chip sharded MPM vs single-chip oracle on the 8-device CPU mesh
(reference per-backend smoke -> per-topology tests, SURVEY §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zpc_tpu.models.constitutive import FixedCorotated
from zpc_tpu.parallel.mesh import make_mesh
from zpc_tpu.sim.mpm import MPMSim, make_mpm_state, explicit_step
from zpc_tpu.sim.distributed import explicit_step_sharded, shard_state


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestShardedMPM:
    def test_matches_single_chip(self, rng):
        n = 256  # divisible by 8
        x = jnp.asarray(rng.uniform(0.3, 0.7, (n, 3)), jnp.float32)
        st = make_mpm_state(x, dx=0.05, block_capacity=256)
        sim = MPMSim(model=FixedCorotated.from_young_poisson(1e4, 0.3),
                     gravity=jnp.asarray([0.0, -9.8, 0.0]))
        dt = jnp.float32(1e-4)

        ref = explicit_step(sim, st, dt)

        mesh = make_mesh(8)
        sst = shard_state(st, mesh)
        step = jax.jit(lambda s: explicit_step_sharded(sim, s, dt, mesh))
        out = step(sst)

        np.testing.assert_allclose(np.asarray(out.particles["x"]),
                                   np.asarray(ref.particles["x"]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.particles["v"]),
                                   np.asarray(ref.particles["v"]),
                                   atol=1e-5)
        assert int(out.grid.table.count) == int(ref.grid.table.count)
        # grid mass distributions agree
        np.testing.assert_allclose(float(jnp.sum(out.grid.data["m"])),
                                   float(jnp.sum(ref.grid.data["m"])),
                                   rtol=1e-5)

    def test_multi_step_stable(self, rng):
        n = 1024
        x = jnp.asarray(rng.uniform(0.3, 0.7, (n, 3)), jnp.float32)
        st = make_mpm_state(x, dx=0.05, block_capacity=256)
        sim = MPMSim(model=FixedCorotated.from_young_poisson(1e4, 0.3),
                     gravity=jnp.asarray([0.0, -9.8, 0.0]))
        mesh = make_mesh(8)
        sst = shard_state(st, mesh)
        step = jax.jit(lambda s: explicit_step_sharded(
            sim, s, jnp.float32(1e-4), mesh))
        for _ in range(3):
            sst = step(sst)
        assert np.isfinite(np.asarray(sst.particles["v"])).all()
