"""Implicit MPM tests: consistency with explicit at small dt, stability at
large dt (where explicit blows up)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zpc_tpu.models.constitutive import FixedCorotated
from zpc_tpu.sim.mpm import MPMSim, make_mpm_state, explicit_step
from zpc_tpu.sim.implicit import implicit_step


@pytest.fixture
def setup(rng):
    x = jnp.asarray(rng.uniform(0.3, 0.7, (512, 3)), jnp.float32)
    st = make_mpm_state(x, dx=0.05, block_capacity=512)
    sim = MPMSim(model=FixedCorotated.from_young_poisson(1e4, 0.3),
                 gravity=jnp.asarray([0.0, -9.8, 0.0]))
    return sim, st


class TestImplicit:
    def test_matches_explicit_small_dt(self, setup):
        sim, st = setup
        # stretch so there are internal forces
        F0 = jnp.broadcast_to(jnp.diag(jnp.asarray([1.02, 0.98, 1.0])),
                              (512, 3, 3))
        st = type(st)(st.particles.update(F=F0), st.grid, st.max_vel)
        dt = jnp.float32(1e-5)
        ex = explicit_step(sim, st, dt)
        im = implicit_step(sim, st, dt, cg_iters=100, cg_tol=1e-6)
        np.testing.assert_allclose(np.asarray(im.particles["v"]),
                                   np.asarray(ex.particles["v"]),
                                   atol=1e-4)

    def test_stable_at_large_dt(self, setup):
        sim, st = setup
        F0 = jnp.broadcast_to(jnp.diag(jnp.asarray([1.1, 0.9, 1.0])),
                              (512, 3, 3))
        st = type(st)(st.particles.update(F=F0), st.grid, st.max_vel)
        # dt far beyond the explicit CFL for E=1e4
        dt = jnp.float32(5e-3)
        step = jax.jit(lambda s: implicit_step(sim, s, dt, cg_iters=60))
        for _ in range(5):
            st = step(st)
        v = np.asarray(st.particles["v"])
        assert np.isfinite(v).all()
        assert np.abs(v).max() < 10.0

    def test_momentum_gravity(self, setup):
        sim, st = setup
        dt = 1e-4
        im = implicit_step(sim, st, jnp.float32(dt), cg_iters=100,
                           cg_tol=1e-6)
        m = np.asarray(st.particles["m"])
        p1 = (m[:, None] * np.asarray(im.particles["v"])).sum(0)
        expected = m.sum() * np.array([0.0, -9.8, 0.0]) * dt
        np.testing.assert_allclose(p1, expected, rtol=1e-3, atol=1e-8)


class TestImplicitBinned:
    def test_matches_scatter_implicit(self, setup):
        from zpc_tpu.sim.mpm_binned import BinnedConfig
        from zpc_tpu.sim.implicit_binned import implicit_step_binned
        sim, st = setup
        F0 = jnp.broadcast_to(jnp.diag(jnp.asarray([1.03, 0.97, 1.0])),
                              (512, 3, 3))
        st = type(st)(st.particles.update(F=F0), st.grid, st.max_vel)
        dt = jnp.float32(5e-4)
        ref = implicit_step(sim, st, dt, cg_iters=80, cg_tol=1e-6)
        out, ov = implicit_step_binned(sim, st, dt,
                                       BinnedConfig(bins_capacity=64),
                                       cg_iters=80, cg_tol=1e-6)
        assert not bool(ov)
        np.testing.assert_allclose(np.asarray(out.particles["v"]),
                                   np.asarray(ref.particles["v"]),
                                   atol=5e-4)
        np.testing.assert_allclose(np.asarray(out.particles["x"]),
                                   np.asarray(ref.particles["x"]),
                                   atol=1e-6)

    def test_stable_large_dt(self, setup):
        from zpc_tpu.sim.mpm_binned import BinnedConfig
        from zpc_tpu.sim.implicit_binned import implicit_step_binned
        sim, st = setup
        F0 = jnp.broadcast_to(jnp.diag(jnp.asarray([1.1, 0.9, 1.0])),
                              (512, 3, 3))
        st = type(st)(st.particles.update(F=F0), st.grid, st.max_vel)
        step = jax.jit(lambda s: implicit_step_binned(
            sim, s, jnp.float32(5e-3), BinnedConfig(bins_capacity=64),
            cg_iters=60)[0])
        for _ in range(5):
            st = step(st)
        v = np.asarray(st.particles["v"])
        assert np.isfinite(v).all() and np.abs(v).max() < 10.0


class TestNewtonRefinement:
    def test_default_unchanged(self, setup):
        """newton_iters=1 must be bit-identical to the original path."""
        sim, st = setup
        F0 = jnp.broadcast_to(jnp.diag(jnp.asarray([1.05, 0.95, 1.0])),
                              (512, 3, 3))
        st = type(st)(st.particles.update(F=F0), st.grid, st.max_vel)
        dt = jnp.float32(2e-3)
        a = implicit_step(sim, st, dt, cg_iters=40)
        b = implicit_step(sim, st, dt, cg_iters=40, newton_iters=1)
        np.testing.assert_array_equal(np.asarray(a.particles["v"]),
                                      np.asarray(b.particles["v"]))

    def test_newton_reduces_residual(self, setup):
        """Extra Newton iterations with line search must not blow up and
        should track the explicit solution at least as well at stiff dt."""
        sim, st = setup
        F0 = jnp.broadcast_to(jnp.diag(jnp.asarray([1.2, 0.85, 1.0])),
                              (512, 3, 3))
        st = type(st)(st.particles.update(F=F0), st.grid, st.max_vel)
        dt = jnp.float32(5e-3)     # far beyond explicit CFL
        one = implicit_step(sim, st, dt, cg_iters=60)
        three = implicit_step(sim, st, dt, cg_iters=60, newton_iters=3)
        v1 = np.asarray(one.particles["v"])
        v3 = np.asarray(three.particles["v"])
        assert np.isfinite(v1).all() and np.isfinite(v3).all()
        # the refined solve stays bounded
        assert np.abs(v3).max() <= np.abs(v1).max() * 1.5 + 1.0

    def test_hessian_clamp_near_inversion(self, setup):
        """Near-inverted F: the clamped-Hessian solve stays finite."""
        sim, st = setup
        F0 = jnp.broadcast_to(jnp.diag(jnp.asarray([0.05, 1.0, 1.0])),
                              (512, 3, 3))
        st = type(st)(st.particles.update(F=F0), st.grid, st.max_vel)
        dt = jnp.float32(2e-3)
        out = implicit_step(sim, st, dt, cg_iters=60, newton_iters=2,
                            hessian_clamp=0.2)
        v = np.asarray(out.particles["v"])
        assert np.isfinite(v).all()
        assert np.isfinite(float(out.max_vel))

    def test_jit_newton(self, setup):
        sim, st = setup
        dt = jnp.float32(1e-3)
        f = jax.jit(lambda s: implicit_step(sim, s, dt, cg_iters=20,
                                            newton_iters=2,
                                            hessian_clamp=0.1))
        out = f(st)
        assert np.isfinite(np.asarray(out.particles["v"])).all()


class TestImplicitBinned2:
    def test_matches_scatter_implicit(self, setup):
        from zpc_tpu.sim.mpm_binned2 import BinnedConfig2
        from zpc_tpu.sim.implicit_binned2 import implicit_step_binned2
        sim, st = setup
        F0 = jnp.broadcast_to(jnp.diag(jnp.asarray([1.03, 0.97, 1.0])),
                              (512, 3, 3))
        st = type(st)(st.particles.update(F=F0), st.grid, st.max_vel)
        dt = jnp.float32(5e-4)
        ref = implicit_step(sim, st, dt, cg_iters=80, cg_tol=1e-6)
        out, ov = implicit_step_binned2(sim, st, dt,
                                        BinnedConfig2(bins_capacity=64),
                                        cg_iters=80, cg_tol=1e-6)
        assert not bool(ov)
        np.testing.assert_allclose(np.asarray(out.particles["v"]),
                                   np.asarray(ref.particles["v"]),
                                   atol=5e-4)
        np.testing.assert_allclose(np.asarray(out.particles["x"]),
                                   np.asarray(ref.particles["x"]),
                                   atol=1e-6)

    def test_rollout_stable_large_dt(self, setup):
        from zpc_tpu.sim.mpm_binned2 import BinnedConfig2
        from zpc_tpu.sim.implicit_binned2 import implicit_rollout_binned2
        sim, st = setup
        F0 = jnp.broadcast_to(jnp.diag(jnp.asarray([1.1, 0.9, 1.0])),
                              (512, 3, 3))
        st = type(st)(st.particles.update(F=F0), st.grid, st.max_vel)
        out, ov = jax.jit(lambda s: implicit_rollout_binned2(
            sim, s, jnp.float32(5e-3), BinnedConfig2(bins_capacity=64),
            5, cg_iters=60))(st)
        assert not bool(ov)
        v = np.asarray(out.particles["v"])
        assert np.isfinite(v).all() and np.abs(v).max() < 10.0
