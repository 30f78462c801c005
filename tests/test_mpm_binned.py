"""Binned (fast) MPM path vs the baseline step — exact-physics oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zpc_tpu.geometry.collider import Collider, ColliderType
from zpc_tpu.geometry.levelset import HalfSpace
from zpc_tpu.models.constitutive import FixedCorotated
from zpc_tpu.models.plasticity import SnowPlasticity
from zpc_tpu.sim.mpm import MPMSim, make_mpm_state, explicit_step
from zpc_tpu.sim.mpm_binned import BinnedConfig, explicit_step_binned


def _sim(colliders=()):
    return MPMSim(model=FixedCorotated.from_young_poisson(1e4, 0.3),
                  gravity=jnp.asarray([0.0, -9.8, 0.0]),
                  colliders=colliders)


class TestBinnedMatchesBaseline:
    def _compare(self, sim, st, dt, cfg, atol_x=1e-6, atol_v=2e-4):
        ref = explicit_step(sim, st, dt)
        out, overflow = jax.jit(
            lambda s: explicit_step_binned(sim, s, dt, cfg))(st)
        assert not bool(overflow)
        np.testing.assert_allclose(np.asarray(out.particles["x"]),
                                   np.asarray(ref.particles["x"]),
                                   atol=atol_x)
        np.testing.assert_allclose(np.asarray(out.particles["v"]),
                                   np.asarray(ref.particles["v"]),
                                   atol=atol_v)
        np.testing.assert_allclose(np.asarray(out.particles["F"]),
                                   np.asarray(ref.particles["F"]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.grid.data["m"]),
                                   np.asarray(ref.grid.data["m"]),
                                   atol=1e-5, rtol=1e-4)
        return out, ref

    def test_uniform_block(self, rng):
        x = jnp.asarray(rng.uniform(0.3, 0.7, (768, 3)), jnp.float32)
        st = make_mpm_state(x, dx=0.05, block_capacity=256)
        # stretch to exercise stress terms
        F0 = jnp.broadcast_to(jnp.diag(jnp.asarray([1.05, 0.97, 1.0])),
                              (768, 3, 3))
        st = type(st)(st.particles.update(
            F=F0, C=jnp.asarray(rng.standard_normal((768, 3, 3)) * 0.1,
                                jnp.float32)), st.grid, st.max_vel)
        self._compare(_sim(), st, jnp.float32(1e-4),
                      BinnedConfig(bins_capacity=64))

    def test_with_collider_and_padding(self, rng):
        x = jnp.asarray(rng.uniform(0.1, 0.4, (500, 3)), jnp.float32)
        st = make_mpm_state(x, dx=0.02, block_capacity=1024, capacity=640)
        ground = Collider(HalfSpace(jnp.asarray([0.0, 0.12, 0.0]),
                                    jnp.asarray([0.0, 1.0, 0.0])),
                          ColliderType.slip)
        self._compare(_sim((ground,)), st, jnp.float32(2e-4),
                      BinnedConfig(bins_capacity=128))

    def test_skewed_density(self, rng):
        # most particles crowded in one block, a few spread out
        a = rng.uniform(0.30, 0.34, (900, 3))
        b = rng.uniform(0.1, 0.9, (100, 3))
        x = jnp.asarray(np.concatenate([a, b]), jnp.float32)
        st = make_mpm_state(x, dx=0.02, block_capacity=2048)
        self._compare(_sim(), st, jnp.float32(1e-4),
                      BinnedConfig(bins_capacity=256))

    def test_translated_grid_origin(self, rng):
        # regression: the APIC lever arm must include the grid transform
        # translation (rel0 = dx*(borigin - xib), not borigin*dx - x)
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

    def test_overflow_detected(self, rng):
        x = jnp.asarray(rng.uniform(0.3, 0.32, (600, 3)), jnp.float32)
        st = make_mpm_state(x, dx=0.05, block_capacity=128)
        _, overflow = explicit_step_binned(
            _sim(), st, jnp.float32(1e-4), BinnedConfig(bins_capacity=2))
        assert bool(overflow)

    def test_plasticity_path(self, rng):
        x = jnp.asarray(rng.uniform(0.3, 0.6, (256, 3)), jnp.float32)
        st = make_mpm_state(x, dx=0.05, block_capacity=256, with_Jp=True,
                            Jp0=1.0)
        F0 = jnp.broadcast_to(jnp.diag(jnp.asarray([1.2, 0.8, 1.0])),
                              (256, 3, 3))
        st = type(st)(st.particles.update(F=F0), st.grid, st.max_vel)
        sim = MPMSim(model=FixedCorotated.from_young_poisson(1e4, 0.3),
                     gravity=jnp.asarray([0.0, -9.8, 0.0]),
                     plasticity=SnowPlasticity())
        ref = explicit_step(sim, st, jnp.float32(1e-4))
        out, _ = explicit_step_binned(sim, st, jnp.float32(1e-4),
                                      BinnedConfig(bins_capacity=64))
        np.testing.assert_allclose(np.asarray(out.particles["F"]),
                                   np.asarray(ref.particles["F"]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.particles["Jp"]),
                                   np.asarray(ref.particles["Jp"]),
                                   atol=1e-5)

    def test_multi_step_consistency(self, rng):
        x = jnp.asarray(rng.uniform(0.3, 0.7, (512, 3)), jnp.float32)
        st_a = make_mpm_state(x, dx=0.05, block_capacity=512)
        st_b = st_a
        sim = _sim()
        cfg = BinnedConfig(bins_capacity=64)
        dt = jnp.float32(1e-4)
        for _ in range(5):
            st_a = explicit_step(sim, st_a, dt)
            st_b, ov = explicit_step_binned(sim, st_b, dt, cfg)
        np.testing.assert_allclose(np.asarray(st_b.particles["x"]),
                                   np.asarray(st_a.particles["x"]),
                                   atol=1e-5)


def test_segment_path_matches_selection(rng):
    """Large-scale formulation (segment/gather) == one-hot matmul path."""
    import dataclasses
    from zpc_tpu.sim.mpm_binned import prepare_bins
    x = jnp.asarray(rng.uniform(0.3, 0.7, (768, 3)), jnp.float32)
    st = make_mpm_state(x, dx=0.05, block_capacity=256)
    sim = _sim()
    ws = prepare_bins(sim, st, BinnedConfig(bins_capacity=64))
    assert not ws.use_segments
    ws_seg = dataclasses.replace(ws, use_segments=True)
    Q0 = jnp.asarray(rng.standard_normal(
        (ws.nbins, 128, 4)), jnp.float32) * ws.lane_ok[..., None]
    QA = [jnp.asarray(rng.standard_normal(
        (ws.nbins, 128, 4)), jnp.float32) * ws.lane_ok[..., None]
        for _ in range(3)]
    a = np.asarray(ws.p2g(Q0, QA))
    b = np.asarray(ws_seg.p2g(Q0, QA))
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-4)
    nv = jnp.asarray(rng.standard_normal((ws.nb, 64, 3)), jnp.float32)
    s0a, sa = ws.g2p(nv)
    s0b, sb = ws_seg.g2p(nv)
    np.testing.assert_allclose(np.asarray(s0a), np.asarray(s0b),
                               atol=2e-4, rtol=1e-4)
    for u, v in zip(sa, sb):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   atol=2e-4, rtol=1e-4)
