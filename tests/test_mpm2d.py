"""2-D MPM pipeline tests (the reference templates dim=2/3;
simulation kernels must be dimension-generic)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zpc_tpu.geometry.collider import Collider, ColliderType
from zpc_tpu.geometry.levelset import HalfSpace
from zpc_tpu.models.constitutive import FixedCorotated
from zpc_tpu.sim.mpm import MPMSim, make_mpm_state, explicit_step


@pytest.fixture
def sim2d():
    return MPMSim(model=FixedCorotated.from_young_poisson(1e4, 0.3),
                  gravity=jnp.asarray([0.0, -9.8]))


class TestMPM2D:
    def test_mass_conservation(self, sim2d, rng):
        x = jnp.asarray(rng.uniform(0.3, 0.7, (256, 2)), jnp.float32)
        st = make_mpm_state(x, dx=0.05, block_capacity=256)
        assert st.grid.dim == 2
        out = explicit_step(sim2d, st, jnp.float32(1e-4))
        np.testing.assert_allclose(
            float(jnp.sum(out.grid.data["m"])),
            float(jnp.sum(st.particles["m"])), rtol=1e-5)

    def test_free_fall(self, sim2d, rng):
        x = jnp.asarray(rng.uniform(0.3, 0.7, (128, 2)), jnp.float32)
        st = make_mpm_state(x, dx=0.05, block_capacity=256)
        dt = 1e-3
        step = jax.jit(lambda s: explicit_step(sim2d, s, jnp.float32(dt)))
        for _ in range(5):
            st = step(st)
        v = np.asarray(st.particles["v"])
        np.testing.assert_allclose(v[:, 1], -9.8 * 5 * dt, rtol=1e-3)
        F = np.asarray(st.particles["F"])
        np.testing.assert_allclose(F, np.broadcast_to(np.eye(2), F.shape),
                                   atol=1e-4)

    def test_ground_collision(self, rng):
        ground = Collider(HalfSpace(jnp.asarray([0.0, 0.1]),
                                    jnp.asarray([0.0, 1.0])),
                          ColliderType.sticky)
        sim = MPMSim(model=FixedCorotated.from_young_poisson(1e4, 0.3),
                     gravity=jnp.asarray([0.0, -9.8]),
                     colliders=(ground,))
        x = jnp.asarray(rng.uniform(0.12, 0.3, (256, 2)), jnp.float32)
        st = make_mpm_state(
            x, dx=0.02, block_capacity=512,
            velocity=jnp.tile(jnp.asarray([[0.0, -1.0]]), (256, 1)))
        step = jax.jit(lambda s: explicit_step(sim, s, jnp.float32(5e-4)))
        for _ in range(30):
            st = step(st)
        y = np.asarray(st.particles["x"])[:, 1]
        assert np.isfinite(y).all()
        assert y.min() > 0.1 - 0.02 - 1e-3
