"""Binned-v2 (gather-free rebinning) vs baseline oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zpc_tpu.geometry.collider import Collider, ColliderType
from zpc_tpu.geometry.levelset import HalfSpace
from zpc_tpu.models.constitutive import FixedCorotated
from zpc_tpu.models.plasticity import SnowPlasticity
from zpc_tpu.sim.mpm import MPMSim, make_mpm_state, explicit_step
from zpc_tpu.sim.mpm_binned2 import BinnedConfig2, rollout_binned2


def _sim(colliders=(), plasticity=None):
    return MPMSim(model=FixedCorotated.from_young_poisson(1e4, 0.3),
                  gravity=jnp.asarray([0.0, -9.8, 0.0]),
                  colliders=colliders, plasticity=plasticity)


def _compare(sim, st, dt, cfg, steps=1, atol_v=2e-4):
    ref = st
    for _ in range(steps):
        ref = explicit_step(sim, ref, dt)
    out, overflow = jax.jit(
        lambda s: rollout_binned2(sim, s, dt, cfg, steps))(st)
    assert not bool(overflow)
    np.testing.assert_allclose(np.asarray(out.particles["x"]),
                               np.asarray(ref.particles["x"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.particles["v"]),
                               np.asarray(ref.particles["v"]), atol=atol_v)
    np.testing.assert_allclose(np.asarray(out.particles["F"]),
                               np.asarray(ref.particles["F"]), atol=1e-5)
    return out, ref


class TestBinned2MatchesBaseline:
    def test_uniform_block(self, rng):
        x = jnp.asarray(rng.uniform(0.3, 0.7, (768, 3)), jnp.float32)
        st = make_mpm_state(x, dx=0.05, block_capacity=256)
        F0 = jnp.broadcast_to(jnp.diag(jnp.asarray([1.05, 0.97, 1.0])),
                              (768, 3, 3))
        st = type(st)(st.particles.update(
            F=F0, C=jnp.asarray(rng.standard_normal((768, 3, 3)) * 0.1,
                                jnp.float32)), st.grid, st.max_vel)
        _compare(_sim(), st, jnp.float32(1e-4),
                 BinnedConfig2(bins_capacity=64))

    def test_multi_step_collider_padding(self, rng):
        x = jnp.asarray(rng.uniform(0.1, 0.4, (500, 3)), jnp.float32)
        st = make_mpm_state(x, dx=0.02, block_capacity=1024, capacity=640)
        ground = Collider(HalfSpace(jnp.asarray([0.0, 0.12, 0.0]),
                                    jnp.asarray([0.0, 1.0, 0.0])),
                          ColliderType.slip)
        _compare(_sim((ground,)), st, jnp.float32(2e-4),
                 BinnedConfig2(bins_capacity=128), steps=5)

    def test_skewed_density(self, rng):
        a = rng.uniform(0.30, 0.34, (900, 3))
        b = rng.uniform(0.1, 0.9, (100, 3))
        x = jnp.asarray(np.concatenate([a, b]), jnp.float32)
        st = make_mpm_state(x, dx=0.02, block_capacity=2048)
        _compare(_sim(), st, jnp.float32(1e-4),
                 BinnedConfig2(bins_capacity=256))

    def test_translated_origin(self, rng):
        x = jnp.asarray(rng.uniform(10.3, 10.7, (512, 3)), jnp.float32)
        x = x.at[:, 1:].add(-10.0)
        st = make_mpm_state(x, dx=0.05, block_capacity=512,
                            origin=jnp.asarray([10.0, 0.0, 0.0]))
        F0 = jnp.broadcast_to(jnp.diag(jnp.asarray([1.05, 0.97, 1.0])),
                              (512, 3, 3))
        st = type(st)(st.particles.update(F=F0), st.grid, st.max_vel)
        _compare(_sim(), st, jnp.float32(1e-4),
                 BinnedConfig2(bins_capacity=64), steps=3)

    def test_plasticity(self, rng):
        x = jnp.asarray(rng.uniform(0.3, 0.6, (256, 3)), jnp.float32)
        st = make_mpm_state(x, dx=0.05, block_capacity=256, with_Jp=True,
                            Jp0=1.0)
        F0 = jnp.broadcast_to(jnp.diag(jnp.asarray([1.2, 0.8, 1.0])),
                              (256, 3, 3))
        st = type(st)(st.particles.update(F=F0), st.grid, st.max_vel)
        sim = _sim(plasticity=SnowPlasticity())
        ref = explicit_step(sim, st, jnp.float32(1e-4))
        out, _ = rollout_binned2(sim, st, jnp.float32(1e-4),
                                 BinnedConfig2(bins_capacity=64), 1)
        np.testing.assert_allclose(np.asarray(out.particles["F"]),
                                   np.asarray(ref.particles["F"]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.particles["Jp"]),
                                   np.asarray(ref.particles["Jp"]),
                                   atol=1e-5)

    def test_overflow_detected(self, rng):
        # 600 particles over ~64 blocks: K-padding needs ~64 bins >> 5
        x = jnp.asarray(rng.uniform(0.1, 0.9, (600, 3)), jnp.float32)
        st = make_mpm_state(x, dx=0.05, block_capacity=512)
        _, overflow = rollout_binned2(
            _sim(), st, jnp.float32(1e-4), BinnedConfig2(bins_capacity=5), 1)
        assert bool(overflow)

    def test_overflow_padding_budget_exhausted(self):
        # Advisor round-2 repro: with dead lanes (capacity > size) the
        # lane total fits in L while the padding dummies needed exceed
        # npad = L - N; truncated dummies would silently mix two blocks
        # in one bin.  counts 100/1/100/99 over 4 blocks, N=400, L=512:
        # npad=112 but pads sum to 212 -> must flag overflow.
        from zpc_tpu.containers.block_table import KEY_SENTINEL, pack_coords
        from zpc_tpu.sim.mpm_binned2 import _sort_into_bins

        counts = [100, 1, 100, 99]
        blocks = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
                             jnp.int32)
        keys = jnp.concatenate(
            [jnp.full((c,), pack_coords(blocks[i:i + 1])[0])
             for i, c in enumerate(counts)] +
            [jnp.full((100,), KEY_SENTINEL, jnp.int32)])
        n = keys.shape[0]
        cols = jnp.zeros((n, 26), jnp.float32)
        pid = jnp.where(keys != KEY_SENTINEL,
                        jnp.arange(n, dtype=jnp.int32), -1)
        st = _sort_into_bins(keys, cols, pid,
                             BinnedConfig2(bins_capacity=4), nb=64)
        assert bool(st.overflow)

    def test_segment_path(self, rng):
        x = jnp.asarray(rng.uniform(0.3, 0.7, (768, 3)), jnp.float32)
        st = make_mpm_state(x, dx=0.05, block_capacity=256)
        _compare(_sim(), st, jnp.float32(1e-4),
                 BinnedConfig2(bins_capacity=64, use_segments=True))

    def test_chunked_path(self, rng):
        # chunk_bins is the bench-critical round-4 working-set fix: the
        # chunked scan pipeline must match the oracle (fp32 sums are
        # chunk-major reassociated — roundoff, not bitwise)
        x = jnp.asarray(rng.uniform(0.3, 0.7, (768, 3)), jnp.float32)
        st = make_mpm_state(x, dx=0.05, block_capacity=256)
        _compare(_sim(), st, jnp.float32(1e-4),
                 BinnedConfig2(bins_capacity=64, use_segments=True,
                               chunk_bins=16), steps=3)

    def test_chunked_collider_plasticity(self, rng):
        x = jnp.asarray(rng.uniform(0.1, 0.4, (500, 3)), jnp.float32)
        st = make_mpm_state(x, dx=0.02, block_capacity=1024, capacity=640,
                            with_Jp=True, Jp0=1.0)
        ground = Collider(HalfSpace(jnp.asarray([0.0, 0.12, 0.0]),
                                    jnp.asarray([0.0, 1.0, 0.0])),
                          ColliderType.slip)
        _compare(_sim((ground,), plasticity=SnowPlasticity()), st,
                 jnp.float32(2e-4),
                 BinnedConfig2(bins_capacity=128, use_segments=True,
                               chunk_bins=32), steps=4)


def test_2d_matches_baseline(rng):
    """2-D fast path vs explicit_step oracle (drops the dim==3 limit)."""
    x = jnp.asarray(rng.uniform(0.2, 0.8, (600, 2)), jnp.float32)
    st = make_mpm_state(x, dx=0.05, block_capacity=256)
    F0 = jnp.broadcast_to(jnp.diag(jnp.asarray([1.08, 0.94])), (600, 2, 2))
    st = type(st)(st.particles.update(
        F=F0, C=jnp.asarray(rng.standard_normal((600, 2, 2)) * 0.1,
                            jnp.float32)), st.grid, st.max_vel)
    sim = MPMSim(model=FixedCorotated.from_young_poisson(1e4, 0.3),
                 gravity=jnp.asarray([0.0, -9.8]))
    cfg = BinnedConfig2(bins_capacity=64)
    ref = st
    for _ in range(3):
        ref = explicit_step(sim, ref, jnp.float32(1e-4))
    out, overflow = jax.jit(
        lambda s: rollout_binned2(sim, s, jnp.float32(1e-4), cfg, 3))(st)
    assert not bool(overflow)
    np.testing.assert_allclose(np.asarray(out.particles["x"]),
                               np.asarray(ref.particles["x"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.particles["v"]),
                               np.asarray(ref.particles["v"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.particles["F"]),
                               np.asarray(ref.particles["F"]), atol=1e-5)


class TestDriftSlack:
    def test_rebins_actually_skipped(self, rng):
        """With slack=1 and a small dt, multi-step rollouts must run
        mostly rebin-free AND stay oracle-accurate."""
        from zpc_tpu.sim.mpm_binned2 import (bin_state, _rebin,
                                             explicit_step_binned2)
        x = jnp.asarray(rng.uniform(0.3, 0.7, (768, 3)), jnp.float32)
        st = make_mpm_state(x, dx=0.05, block_capacity=256,
                            velocity=jnp.broadcast_to(
                                jnp.asarray([0.05, 0.0, 0.0]), (768, 3)))
        sim = _sim()
        cfg = BinnedConfig2(bins_capacity=64, slack=1)
        bst = bin_state(sim, st, cfg)
        dt = jnp.float32(1e-4)
        rebins = 0
        for _ in range(10):
            if bool(bst.needs_rebin):
                bst = _rebin(sim, bst, cfg)
                rebins += 1
            bst = explicit_step_binned2(sim, bst, dt, cfg, rebin=False)
        # drift per step ~ v dt / dx = 1e-4 * 0.05/0.05 -> far below one
        # cell: the whole rollout should need no rebin at all
        assert rebins == 0
        assert not bool(bst.overflow)

    def test_slack0_equals_slack1(self, rng):
        """Same physics regardless of slack (rollout vs oracle)."""
        x = jnp.asarray(rng.uniform(0.3, 0.7, (512, 3)), jnp.float32)
        st = make_mpm_state(x, dx=0.05, block_capacity=256)
        F0 = jnp.broadcast_to(jnp.diag(jnp.asarray([1.05, 0.97, 1.0])),
                              (512, 3, 3))
        st = type(st)(st.particles.update(F=F0), st.grid, st.max_vel)
        for slack in (0, 1):
            _compare(_sim(), st, jnp.float32(1e-4),
                     BinnedConfig2(bins_capacity=64, slack=slack),
                     steps=3)


class TestIncrementalRebin:
    """rebin_adaptive: escapee migration into free lanes (no resort)."""

    def _shifted(self, rng, shift_cells, migrate=512, reserve=1):
        """Displace the binned cloud so particles leave their windows.

        A *contraction* toward the cloud center keeps every destination
        block populated (a bulk translation pushes the leading face into
        fresh blocks — the structural case that must fall back).
        """
        import dataclasses
        from zpc_tpu.sim.mpm_binned2 import bin_state
        x = jnp.asarray(rng.uniform(0.3, 0.7, (768, 3)), jnp.float32)
        st = make_mpm_state(x, dx=0.05, block_capacity=256)
        sim = _sim()
        cfg = BinnedConfig2(bins_capacity=96, migrate_capacity=migrate,
                            reserve_bins=reserve)
        bst = bin_state(sim, st, cfg)
        alive = bst.pid >= 0
        if shift_cells < 4:
            # contract axis 0 so the edges (±4 cells out) move inward by
            # shift_cells while the center stays put
            factor = 1.0 - shift_cells / 4.0
            x0 = bst.cols[:, 0]
            newx0 = jnp.where(alive, 0.5 + factor * (x0 - 0.5), x0)
            cols = bst.cols.at[:, 0].set(newx0)
        else:
            cols = bst.cols.at[:, 0].add(
                jnp.where(alive, shift_cells * 0.05, 0.0))
        return sim, st, cfg, dataclasses.replace(bst, cols=cols)

    def test_migration_matches_full_rebin(self, rng):
        from zpc_tpu.sim.mpm_binned2 import (_rebin, _rebin_incremental,
                                             explicit_step_binned2,
                                             unbin_state)
        sim, st, cfg, bst = self._shifted(rng, 1.2)
        mig, ok = _rebin_incremental(sim, bst, cfg, cfg.migrate_capacity)
        assert bool(ok)
        # live rows preserved: pid -> row content identical
        for s_ in (bst, mig):
            assert int(jnp.sum((s_.pid >= 0))) == 768
        order_a = np.argsort(np.asarray(bst.pid))
        order_b = np.argsort(np.asarray(mig.pid))
        np.testing.assert_array_equal(
            np.asarray(bst.pid)[order_a], np.asarray(mig.pid)[order_b])
        np.testing.assert_allclose(
            np.asarray(bst.cols)[order_a][-768:],
            np.asarray(mig.cols)[order_b][-768:], atol=0)
        # guard restored: a second incremental pass moves nothing
        mig2, ok2 = _rebin_incremental(sim, mig, cfg, cfg.migrate_capacity)
        assert bool(ok2)
        np.testing.assert_array_equal(np.asarray(mig.pid),
                                      np.asarray(mig2.pid))
        # physics after migration == physics after a full rebin
        dt = jnp.float32(1e-4)
        a = explicit_step_binned2(sim, mig, dt, cfg, rebin=False)
        b = explicit_step_binned2(sim, _rebin(sim, bst, cfg), dt, cfg,
                                  rebin=False)
        ua, ub = unbin_state(a, st), unbin_state(b, st)
        assert not bool(a.overflow) and not bool(b.overflow)
        for prop in ("x", "v", "F"):
            np.testing.assert_allclose(np.asarray(ua.particles[prop]),
                                       np.asarray(ub.particles[prop]),
                                       atol=2e-5)

    def test_fallback_on_capacity(self, rng):
        from zpc_tpu.sim.mpm_binned2 import _rebin_incremental
        sim, st, cfg, bst = self._shifted(rng, 1.2)
        _, ok = _rebin_incremental(sim, bst, cfg, 4)   # m_cap too small
        assert not bool(ok)

    def test_fallback_on_missing_block(self, rng):
        from zpc_tpu.sim.mpm_binned2 import _rebin_incremental
        # 6-cell shift jumps past the dilated (+-1 block) table
        sim, st, cfg, bst = self._shifted(rng, 6.0)
        _, ok = _rebin_incremental(sim, bst, cfg, cfg.migrate_capacity)
        assert not bool(ok)

    def test_rollout_with_migration_matches_oracle(self, rng):
        x = jnp.asarray(rng.uniform(0.3, 0.7, (768, 3)), jnp.float32)
        st = make_mpm_state(x, dx=0.05, block_capacity=256)
        _compare(_sim(), st, jnp.float32(1e-4),
                 BinnedConfig2(bins_capacity=96, migrate_capacity=512,
                               reserve_bins=1), steps=3)

    def test_reserve_bins_inventory(self, rng):
        from zpc_tpu.sim.mpm_binned2 import K, bin_state
        x = jnp.asarray(rng.uniform(0.3, 0.7, (768, 3)), jnp.float32)
        st = make_mpm_state(x, dx=0.05, block_capacity=256)
        sim = _sim()
        bst = bin_state(sim, st, BinnedConfig2(bins_capacity=96,
                                               reserve_bins=1))
        # every active block must own >= K free (dummy) lanes
        slots = np.asarray(bst.bin_block)
        dead = np.asarray(bst.pid < 0).reshape(-1, K)
        free_per_block = {}
        for b, s in enumerate(slots):
            if s >= 0:
                free_per_block[s] = free_per_block.get(s, 0) + dead[b].sum()
        assert free_per_block and all(v >= K for v in free_per_block.values())


class TestGalileanRecenter:
    def test_translation_needs_no_rebin(self, rng):
        """Bulk translation: the origin follows the drift, so no window
        is ever escaped — and the physics stays exact."""
        from zpc_tpu.sim.mpm_binned2 import bin_state, explicit_step_binned2
        x = jnp.asarray(rng.uniform(0.3, 0.7, (512, 3)), jnp.float32)
        v0 = jnp.broadcast_to(jnp.asarray([2.0, 0.0, 0.0]), (512, 3))
        st = make_mpm_state(x, dx=0.05, block_capacity=256, velocity=v0)
        sim = MPMSim(model=FixedCorotated.from_young_poisson(1e4, 0.3),
                     gravity=jnp.zeros((3,)))
        cfg = BinnedConfig2(bins_capacity=64, recenter=True)
        bst = bin_state(sim, st, cfg)
        dt = jnp.float32(1e-3)
        step = jax.jit(lambda s: explicit_step_binned2(
            sim, s, dt, cfg, rebin=False))
        rebins = 0
        for _ in range(60):                  # 2.4 cells of bulk drift
            assert not bool(bst.needs_rebin) or rebins == 0
            rebins += int(bool(bst.needs_rebin))
            bst = step(bst)
        assert rebins == 0
        assert not bool(bst.overflow)
        # frame followed the bulk: origin moved ~ 2.4 cells in x
        ox = float(bst.grid.transform.matrix[0, 3])
        assert 1.5 * 0.05 < ox < 3.5 * 0.05
        # uniform-velocity translation is exact in MPM: x = x0 + v t
        from zpc_tpu.sim.mpm_binned2 import unbin_state
        out = unbin_state(bst, st)
        np.testing.assert_allclose(np.asarray(out.particles["x"]),
                                   np.asarray(x) +
                                   np.asarray([2.0, 0, 0]) * 60e-3,
                                   atol=5e-4)

    def test_recenter_off_forces_rebin(self, rng):
        from zpc_tpu.sim.mpm_binned2 import bin_state, explicit_step_binned2
        x = jnp.asarray(rng.uniform(0.3, 0.7, (512, 3)), jnp.float32)
        v0 = jnp.broadcast_to(jnp.asarray([2.0, 0.0, 0.0]), (512, 3))
        st = make_mpm_state(x, dx=0.05, block_capacity=256, velocity=v0)
        sim = MPMSim(model=FixedCorotated.from_young_poisson(1e4, 0.3),
                     gravity=jnp.zeros((3,)))
        cfg = BinnedConfig2(bins_capacity=64, recenter=False)
        bst = bin_state(sim, st, cfg)
        dt = jnp.float32(1e-3)
        step = jax.jit(lambda s: explicit_step_binned2(
            sim, s, dt, cfg, rebin=False))
        fired = False
        for _ in range(60):
            bst = step(bst)
            fired = fired or bool(bst.needs_rebin)
            if fired:
                break
        assert fired
