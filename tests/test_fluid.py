"""J-only fluid MPM pipeline tests (sim/fluid.py).

Oracle: the F-based explicit_step with the same EquationOfState model —
for small steps det(F) tracks the scalar J, so both pipelines must agree
closely over a short rollout.  Plus conservation and 2-D coverage.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zpc_tpu.geometry.collider import Collider, ColliderType
from zpc_tpu.geometry.levelset import HalfSpace
from zpc_tpu.models.constitutive import EquationOfState
from zpc_tpu.sim.mpm import MPMSim, make_mpm_state, explicit_step
from zpc_tpu.sim.fluid import make_fluid_state, explicit_fluid_step


def _sim(dim=3, flip=0.0):
    model = EquationOfState(mu=jnp.float32(0.0), lam=jnp.float32(1e4),
                            gamma=jnp.float32(7.15))
    g = [0.0, -9.8, 0.0][:dim] if dim == 3 else [0.0, -9.8]
    return MPMSim(model=model, gravity=jnp.asarray(g), flip=flip)


def _block(rng, n=512, dim=3):
    return jnp.asarray(rng.uniform(0.3, 0.7, (n, dim)), jnp.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_mass_conservation(rng):
    sim = _sim()
    x = _block(rng)
    st = make_fluid_state(x, dx=0.05, block_capacity=512)
    st2 = explicit_fluid_step(sim, st, jnp.float32(1e-4))
    np.testing.assert_allclose(float(jnp.sum(st2.grid.data["m"])),
                               float(jnp.sum(st.particles["m"])),
                               rtol=1e-5)


def test_momentum_gravity(rng):
    sim = _sim()
    x = _block(rng, 256)
    st = make_fluid_state(x, dx=0.05, block_capacity=512)
    dt = 2e-4
    st2 = explicit_fluid_step(sim, st, jnp.float32(dt))
    m = np.asarray(st.particles["m"])
    p0 = (m[:, None] * np.asarray(st.particles["v"])).sum(0)
    p1 = (m[:, None] * np.asarray(st2.particles["v"])).sum(0)
    expected = p0 + m.sum() * np.array([0.0, -9.8, 0.0]) * dt
    np.testing.assert_allclose(p1, expected, rtol=1e-4, atol=1e-8)


def test_matches_F_based_eos(rng):
    """J pipeline vs det(F) pipeline over a short rollout."""
    sim = _sim()
    x = _block(rng, 384)
    dt = jnp.float32(1e-4)
    stF = make_mpm_state(x, dx=0.05, block_capacity=512)
    stJ = make_fluid_state(x, dx=0.05, block_capacity=512)
    for _ in range(5):
        stF = explicit_step(sim, stF, dt)
        stJ = explicit_fluid_step(sim, stJ, dt)
    np.testing.assert_allclose(np.asarray(stJ.particles["x"]),
                               np.asarray(stF.particles["x"]),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stJ.particles["v"]),
                               np.asarray(stF.particles["v"]),
                               rtol=0, atol=2e-4)
    detF = np.linalg.det(np.asarray(stF.particles["F"]))
    np.testing.assert_allclose(np.asarray(stJ.particles["J"]), detF,
                               rtol=0, atol=1e-4)


def test_hydrostatic_compression(rng):
    """A fluid column under gravity on a floor: J compresses below 1 at
    the bottom and total mass never changes over a rollout."""
    floor = Collider(HalfSpace(origin=jnp.asarray([0.0, 0.25, 0.0]),
                               direction=jnp.asarray([0.0, 1.0, 0.0])),
                     kind=ColliderType.sticky)
    model = EquationOfState(mu=jnp.float32(0.0), lam=jnp.float32(1e4),
                            gamma=jnp.float32(7.15))
    sim = MPMSim(model=model, gravity=jnp.asarray([0.0, -9.8, 0.0]),
                 colliders=(floor,))
    x = _block(rng, 512)
    v0 = jnp.broadcast_to(jnp.asarray([0.0, -0.8, 0.0]), x.shape)
    st = make_fluid_state(x, dx=0.05, block_capacity=512, velocity=v0)
    dt = jnp.float32(2e-4)

    def body(_, s):
        return explicit_fluid_step(sim, s, dt)

    st2 = jax.jit(lambda s: jax.lax.fori_loop(0, 400, body, s))(st)
    J = np.asarray(st2.particles["J"])
    assert np.all(J > 0.1) and np.all(np.isfinite(J))
    assert float(J.min()) < 1.0          # compression happened
    x2 = np.asarray(st2.particles["x"])
    assert np.all(np.isfinite(x2))
    assert x2[:, 1].min() > 0.2          # floor held


def test_2d(rng):
    sim = _sim(dim=2)
    x = _block(rng, 256, dim=2)
    st = make_fluid_state(x, dx=0.05, block_capacity=256)
    st2 = explicit_fluid_step(sim, st, jnp.float32(1e-4))
    np.testing.assert_allclose(float(jnp.sum(st2.grid.data["m"])),
                               float(jnp.sum(st.particles["m"])),
                               rtol=1e-5)
    assert np.all(np.isfinite(np.asarray(st2.particles["x"])))


def test_flip_fluid(rng):
    sim = _sim(flip=0.95)
    x = _block(rng, 256)
    st = make_fluid_state(x, dx=0.05, block_capacity=512)
    dt = 2e-4
    st2 = explicit_fluid_step(sim, st, jnp.float32(dt))
    m = np.asarray(st.particles["m"])
    p1 = (m[:, None] * np.asarray(st2.particles["v"])).sum(0)
    expected = m.sum() * np.array([0.0, -9.8, 0.0]) * dt
    np.testing.assert_allclose(p1, expected, rtol=1e-3, atol=1e-8)


class TestFluidBinned2:
    def _compare(self, sim, st, dt, cfg, steps, atol_v=2e-4):
        from zpc_tpu.sim.fluid_binned2 import rollout_fluid_binned2
        ref = st
        for _ in range(steps):
            ref = explicit_fluid_step(sim, ref, dt)
        out, overflow = jax.jit(
            lambda s: rollout_fluid_binned2(sim, s, dt, cfg, steps))(st)
        assert not bool(overflow)
        np.testing.assert_allclose(np.asarray(out.particles["x"]),
                                   np.asarray(ref.particles["x"]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.particles["v"]),
                                   np.asarray(ref.particles["v"]),
                                   atol=atol_v)
        np.testing.assert_allclose(np.asarray(out.particles["J"]),
                                   np.asarray(ref.particles["J"]),
                                   atol=1e-5)

    def test_matches_scatter_fluid(self, rng):
        from zpc_tpu.sim.mpm_binned2 import BinnedConfig2
        sim = _sim()
        x = _block(rng, 768)
        v0 = jnp.broadcast_to(jnp.asarray([0.2, -0.5, 0.1]), (768, 3))
        st = make_fluid_state(x, dx=0.05, block_capacity=256, velocity=v0)
        self._compare(sim, st, jnp.float32(1e-4),
                      BinnedConfig2(bins_capacity=64), steps=5)

    def test_slack0(self, rng):
        from zpc_tpu.sim.mpm_binned2 import BinnedConfig2
        sim = _sim()
        x = _block(rng, 512)
        st = make_fluid_state(x, dx=0.05, block_capacity=256)
        self._compare(sim, st, jnp.float32(1e-4),
                      BinnedConfig2(bins_capacity=64, slack=0), steps=2)

    def test_chunked_matches(self, rng):
        # cfg.chunk_bins on the FLUID path (round-5: the fluid pipeline
        # rides the shared chunked-scan transfer helpers)
        from zpc_tpu.sim.mpm_binned2 import BinnedConfig2
        sim = _sim()
        x = _block(rng, 768)
        v0 = jnp.broadcast_to(jnp.asarray([0.2, -0.5, 0.1]), (768, 3))
        st = make_fluid_state(x, dx=0.05, block_capacity=256, velocity=v0)
        self._compare(sim, st, jnp.float32(1e-4),
                      BinnedConfig2(bins_capacity=64, use_segments=True,
                                    chunk_bins=16), steps=5)

    def test_collider(self, rng):
        from zpc_tpu.sim.mpm_binned2 import BinnedConfig2
        floor = Collider(HalfSpace(origin=jnp.asarray([0.0, 0.28, 0.0]),
                                   direction=jnp.asarray([0.0, 1.0, 0.0])),
                         kind=ColliderType.slip)
        model = EquationOfState(mu=jnp.float32(0.0), lam=jnp.float32(1e4),
                                gamma=jnp.float32(7.15))
        sim = MPMSim(model=model, gravity=jnp.asarray([0.0, -9.8, 0.0]),
                     colliders=(floor,))
        x = _block(rng, 512)
        v0 = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (512, 3))
        st = make_fluid_state(x, dx=0.05, block_capacity=256, velocity=v0)
        self._compare(sim, st, jnp.float32(2e-4),
                      BinnedConfig2(bins_capacity=64), steps=8,
                      atol_v=5e-4)

    def test_2d_binned(self, rng):
        from zpc_tpu.sim.mpm_binned2 import BinnedConfig2
        from zpc_tpu.sim.fluid_binned2 import rollout_fluid_binned2
        sim = _sim(dim=2)
        x = _block(rng, 384, dim=2)
        v0 = jnp.broadcast_to(jnp.asarray([0.1, -0.4]), (384, 2))
        st = make_fluid_state(x, dx=0.05, block_capacity=256, velocity=v0)
        ref = st
        dt = jnp.float32(1e-4)
        for _ in range(4):
            ref = explicit_fluid_step(sim, ref, dt)
        out, overflow = jax.jit(lambda s: rollout_fluid_binned2(
            sim, s, dt, BinnedConfig2(bins_capacity=64), 4))(st)
        assert not bool(overflow)
        np.testing.assert_allclose(np.asarray(out.particles["x"]),
                                   np.asarray(ref.particles["x"]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.particles["v"]),
                                   np.asarray(ref.particles["v"]),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(out.particles["J"]),
                                   np.asarray(ref.particles["J"]),
                                   atol=1e-5)


def test_bins_capacity_too_small_raises(rng):
    # bins_capacity * 128 lanes < particle count must be a clear static
    # error (the 1M bench crashed with an opaque negative-shape
    # broadcast through bin_fluid_state, which bypasses bin_state's
    # assert; round 5)
    from zpc_tpu.sim.mpm_binned2 import BinnedConfig2
    from zpc_tpu.sim.fluid_binned2 import bin_fluid_state
    sim = _sim()
    x = _block(rng, 384)
    st = make_fluid_state(x, dx=0.05, block_capacity=256)
    with pytest.raises(ValueError, match="bins_capacity"):
        jax.eval_shape(lambda s: bin_fluid_state(
            sim, s, BinnedConfig2(bins_capacity=2)), st)
