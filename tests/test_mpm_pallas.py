"""Pallas MPM path vs baseline oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zpc_tpu.geometry.collider import Collider, ColliderType
from zpc_tpu.geometry.levelset import HalfSpace
from zpc_tpu.models.constitutive import FixedCorotated
from zpc_tpu.models.plasticity import SnowPlasticity
from zpc_tpu.sim.mpm import MPMSim, make_mpm_state, explicit_step
from zpc_tpu.sim.mpm_binned import BinnedConfig
from zpc_tpu.sim.mpm_pallas import explicit_step_pallas


def _sim(colliders=(), plasticity=None):
    return MPMSim(model=FixedCorotated.from_young_poisson(1e4, 0.3),
                  gravity=jnp.asarray([0.0, -9.8, 0.0]),
                  colliders=colliders, plasticity=plasticity)


class TestPallasMatchesBaseline:
    def _compare(self, sim, st, dt, cfg):
        ref = explicit_step(sim, st, dt)
        out, overflow = explicit_step_pallas(sim, st, dt, cfg,
                                             interpret=True)
        assert not bool(overflow)
        np.testing.assert_allclose(np.asarray(out.particles["x"]),
                                   np.asarray(ref.particles["x"]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.particles["v"]),
                                   np.asarray(ref.particles["v"]),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(out.particles["F"]),
                                   np.asarray(ref.particles["F"]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.grid.data["m"]),
                                   np.asarray(ref.grid.data["m"]),
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out.grid.data["v"]),
                                   np.asarray(ref.grid.data["v"]),
                                   atol=1e-4)
        return out

    def test_uniform_block(self, rng):
        x = jnp.asarray(rng.uniform(0.3, 0.7, (768, 3)), jnp.float32)
        st = make_mpm_state(x, dx=0.05, block_capacity=256)
        F0 = jnp.broadcast_to(jnp.diag(jnp.asarray([1.05, 0.97, 1.0])),
                              (768, 3, 3))
        st = type(st)(st.particles.update(
            F=F0, C=jnp.asarray(rng.standard_normal((768, 3, 3)) * 0.1,
                                jnp.float32)), st.grid, st.max_vel)
        self._compare(_sim(), st, jnp.float32(1e-4),
                      BinnedConfig(bins_capacity=64))

    def test_collider_and_padding(self, rng):
        x = jnp.asarray(rng.uniform(0.1, 0.4, (500, 3)), jnp.float32)
        st = make_mpm_state(x, dx=0.02, block_capacity=1024, capacity=640)
        ground = Collider(HalfSpace(jnp.asarray([0.0, 0.12, 0.0]),
                                    jnp.asarray([0.0, 1.0, 0.0])),
                          ColliderType.slip)
        self._compare(_sim((ground,)), st, jnp.float32(2e-4),
                      BinnedConfig(bins_capacity=128))

    def test_translated_grid_origin(self, rng):
        # regression: kernel stencils + APIC lever arm must honor the grid
        # transform translation (origin_w rides the scalar param vector)
        x = jnp.asarray(rng.uniform(10.3, 10.7, (512, 3)), jnp.float32)
        x = x.at[:, 1:].add(-10.0)
        st = make_mpm_state(x, dx=0.05, block_capacity=512,
                            origin=jnp.asarray([10.0, 0.0, 0.0]))
        F0 = jnp.broadcast_to(jnp.diag(jnp.asarray([1.05, 0.97, 1.0])),
                              (512, 3, 3))
        st = type(st)(st.particles.update(
            F=F0, C=jnp.asarray(rng.standard_normal((512, 3, 3)) * 0.1,
                                jnp.float32)), st.grid, st.max_vel)
        self._compare(_sim(), st, jnp.float32(1e-4),
                      BinnedConfig(bins_capacity=64))

    def test_plasticity(self, rng):
        x = jnp.asarray(rng.uniform(0.3, 0.6, (256, 3)), jnp.float32)
        st = make_mpm_state(x, dx=0.05, block_capacity=256, with_Jp=True,
                            Jp0=1.0)
        F0 = jnp.broadcast_to(jnp.diag(jnp.asarray([1.2, 0.8, 1.0])),
                              (256, 3, 3))
        st = type(st)(st.particles.update(F=F0), st.grid, st.max_vel)
        sim = _sim(plasticity=SnowPlasticity())
        ref = explicit_step(sim, st, jnp.float32(1e-4))
        out, _ = explicit_step_pallas(sim, st, jnp.float32(1e-4),
                                      BinnedConfig(bins_capacity=64),
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(out.particles["F"]),
                                   np.asarray(ref.particles["F"]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.particles["Jp"]),
                                   np.asarray(ref.particles["Jp"]),
                                   atol=1e-5)
