"""Scene builder + sampling tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from zpc_tpu.geometry.collider import Collider, ColliderType
from zpc_tpu.geometry.levelset import HalfSpace, Sphere
from zpc_tpu.geometry.sampling import poisson_disk, sample_lattice
from zpc_tpu.sim.mpm import explicit_step
from zpc_tpu.sim.scene import Scene


class TestSampling:
    def test_lattice_density(self):
        pts = sample_lattice([0, 0, 0], [1, 1, 1], dx=0.1, ppc=8.0)
        # ~8 per cell * 1000 cells
        assert 6000 <= len(pts) <= 10000
        assert (pts >= 0).all() and (pts <= 1).all()

    def test_poisson_disk_spacing(self):
        pts = poisson_disk([0, 0], [1, 1], radius=0.05, seed=1)
        assert len(pts) > 100
        d = np.linalg.norm(pts[None] - pts[:, None], axis=-1)
        np.fill_diagonal(d, np.inf)
        assert d.min() >= 0.05 * 0.999

    def test_poisson_disk_3d(self):
        pts = poisson_disk([0, 0, 0], [0.5, 0.5, 0.5], radius=0.08)
        assert len(pts) > 20
        d = np.linalg.norm(pts[None] - pts[:, None], axis=-1)
        np.fill_diagonal(d, np.inf)
        assert d.min() >= 0.08 * 0.999


class TestScene:
    def test_build_and_step(self):
        ground = Collider(HalfSpace(jnp.asarray([0., 0.05, 0.]),
                                    jnp.asarray([0., 1., 0.])),
                          ColliderType.sticky)
        sim, st, dt = (Scene(dx=0.05)
                       .add_cube([0.5, 0.5, 0.5], 0.2, E=1e4)
                       .add_boundary(ground)
                       .build(block_capacity=512))
        assert st.particles.size > 0
        assert dt > 0
        out = explicit_step(sim, st, jnp.float32(dt))
        assert np.isfinite(np.asarray(out.particles["v"])).all()

    def test_heterogeneous_objects(self):
        sim, st, dt = (Scene(dx=0.05)
                       .add_cube([0.3, 0.5, 0.5], 0.15, E=1e4, rho=1e3)
                       .add_cube([0.7, 0.5, 0.5], 0.15, E=1e6, rho=2e3)
                       .build(block_capacity=512))
        n = st.particles.size
        m = np.asarray(sim.model.mu)[:n]
        assert len(np.unique(np.round(m, 3))) == 2  # two stiffness groups
        masses = np.asarray(st.particles["m"])[:n]
        assert len(np.unique(np.round(masses, 12))) == 2
        # dt governed by the stiffer object
        from zpc_tpu.models.cfl import timestep_linear_elasticity
        assert abs(dt - float(timestep_linear_elasticity(
            1e6, 0.3, 2e3, 0.05, 0.4))) < 1e-9
        out = explicit_step(sim, st, jnp.float32(dt))
        assert np.isfinite(np.asarray(out.particles["v"])).all()

    def test_sphere_object(self):
        sim, st, _ = (Scene(dx=0.04)
                      .add_sphere([0.5, 0.5, 0.5], 0.15)
                      .build(block_capacity=512))
        x = np.asarray(st.particles["x"])[:st.particles.size]
        r = np.linalg.norm(x - 0.5, axis=1)
        assert (r <= 0.15 + 1e-6).all()
