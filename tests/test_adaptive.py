"""AdaptiveGrid tests: hierarchical probe semantics + sampling."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zpc_tpu.geometry.adaptive_grid import adaptive_grid_from_leaves


class TestAdaptiveGrid:
    def _grid(self, rng, n=200, dx=0.1):
        cells = rng.integers(-20, 20, (n, 3)).astype(np.int32)
        cells = np.unique(cells, axis=0)
        vals = rng.standard_normal(len(cells)).astype(np.float32)
        g = adaptive_grid_from_leaves(
            jnp.asarray(cells), jnp.asarray(vals), dx=dx,
            capacities=[512, 256, 64], background=-7.0)
        return g, cells, vals, dx

    def test_probe_leaf_values(self, rng):
        g, cells, vals, dx = self._grid(rng)
        # probe at leaf cell centers returns the stored value
        x = (cells + 0.5) * dx
        got = np.asarray(g.probe(jnp.asarray(x, jnp.float32)))
        np.testing.assert_allclose(got, vals, atol=1e-6)

    def test_probe_background(self, rng):
        g, cells, vals, dx = self._grid(rng)
        far = jnp.asarray([[100.0, 100.0, 100.0]], jnp.float32) * dx
        assert float(g.probe(far)[0]) == -7.0

    def test_probe_inside_leaf_block_unset_cell(self, rng):
        # a cell inside an allocated leaf block but not explicitly set reads
        # the leaf-level default (background), per allocated-node semantics
        cells = jnp.asarray([[0, 0, 0]], jnp.int32)
        vals = jnp.asarray([5.0], jnp.float32)
        g = adaptive_grid_from_leaves(cells, vals, dx=1.0,
                                      capacities=[16, 16, 16],
                                      background=0.0)
        x = jnp.asarray([[1.5, 0.5, 0.5]], jnp.float32)  # same leaf block
        assert float(g.probe(x)[0]) == 0.0

    def test_probe_under_jit(self, rng):
        g, cells, vals, dx = self._grid(rng)
        x = jnp.asarray((cells[:16] + 0.5) * dx, jnp.float32)
        got = jax.jit(g.probe)(x)
        np.testing.assert_allclose(np.asarray(got), vals[:16], atol=1e-6)

    def test_sample_constant_field(self, rng):
        # constant leaf values -> trilinear sample is that constant inside
        cells = np.stack(np.meshgrid(*([np.arange(8)] * 3),
                                     indexing="ij"), -1).reshape(-1, 3)
        vals = np.full(len(cells), 3.0, np.float32)
        g = adaptive_grid_from_leaves(
            jnp.asarray(cells, jnp.int32), jnp.asarray(vals), dx=0.5,
            capacities=[64, 32, 16], background=0.0)
        x = jnp.asarray(rng.uniform(1.0, 3.0, (32, 3)), jnp.float32)
        got = np.asarray(g.sample(x))
        np.testing.assert_allclose(got, 3.0, atol=1e-5)


class TestAdaptiveWrites:
    def _grid(self, rng, n=200, dx=0.1):
        cells = np.unique(rng.integers(-20, 20, (n, 3)).astype(np.int32),
                          axis=0)
        vals = rng.standard_normal(len(cells)).astype(np.float32)
        g = adaptive_grid_from_leaves(
            jnp.asarray(cells), jnp.asarray(vals), dx=dx,
            capacities=[512, 256, 64], background=-7.0)
        return g, cells, vals, dx

    def test_update_leaf_values(self, rng):
        g, cells, vals, dx = self._grid(rng)
        new_vals = vals * 3.0 + 1.0
        g2, ovf = g.update_leaf_values(jnp.asarray(cells),
                                       jnp.asarray(new_vals))
        assert not bool(ovf)
        x = jnp.asarray((cells + 0.5) * dx, jnp.float32)
        np.testing.assert_allclose(np.asarray(g2.probe(x)), new_vals,
                                   atol=1e-6)
        # original untouched (functional update)
        np.testing.assert_allclose(np.asarray(g.probe(x)), vals, atol=1e-6)

    def test_update_inactive_cell_flags_overflow(self, rng):
        g, cells, vals, dx = self._grid(rng)
        _, ovf = g.update_leaf_values(jnp.asarray([[500, 500, 500]],
                                                  jnp.int32),
                                      jnp.asarray([1.0], jnp.float32))
        assert bool(ovf)

    def test_activate_extends_topology(self, rng):
        g, cells, vals, dx = self._grid(rng, n=60)
        new_cells = np.asarray([[100, 100, 100], [101, 100, 100]],
                               np.int32)
        g2, ovf = g.activate_leaves(jnp.asarray(new_cells))
        assert not bool(ovf)
        # old values preserved
        x_old = jnp.asarray((cells + 0.5) * dx, jnp.float32)
        np.testing.assert_allclose(np.asarray(g2.probe(x_old)), vals,
                                   atol=1e-6)
        # new region now writable (was overflow before)
        nv = jnp.asarray([2.5, -3.5], jnp.float32)
        _, ovf_pre = g.update_leaf_values(jnp.asarray(new_cells), nv)
        assert bool(ovf_pre)
        g3, ovf_post = g2.update_leaf_values(jnp.asarray(new_cells), nv)
        assert not bool(ovf_post)
        x_new = jnp.asarray((new_cells + 0.5) * dx, jnp.float32)
        np.testing.assert_allclose(np.asarray(g3.probe(x_new)),
                                   np.asarray(nv), atol=1e-6)

    def test_activate_capacity_overflow(self, rng):
        cells = jnp.asarray([[0, 0, 0]], jnp.int32)
        g = adaptive_grid_from_leaves(cells, jnp.asarray([1.0]), dx=1.0,
                                      capacities=[2, 16, 16])
        many = jnp.asarray(rng.integers(0, 400, (64, 3)) * 8, jnp.int32)
        _, ovf = g.activate_leaves(many)
        assert bool(ovf)


class TestAdaptiveSampling:
    def test_gradient_of_linear_field(self, rng):
        # fill a solid region with f(c) = 2x + 3y - z (cell centers)
        ax = np.arange(0, 16)
        cells = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"),
                         -1).reshape(-1, 3).astype(np.int32)
        dx = 0.5
        ctr = (cells + 0.5) * dx
        vals = (2 * ctr[:, 0] + 3 * ctr[:, 1] - ctr[:, 2]).astype(
            np.float32)
        g = adaptive_grid_from_leaves(jnp.asarray(cells),
                                      jnp.asarray(vals), dx=dx,
                                      capacities=[64, 32, 16])
        x = jnp.asarray(rng.uniform(2 * dx, 13 * dx, (40, 3)), jnp.float32)
        grad = np.asarray(g.sample_gradient(x))
        np.testing.assert_allclose(grad,
                                   np.tile([2.0, 3.0, -1.0], (40, 1)),
                                   atol=1e-3)

    def test_staggered_shifted_sample(self, rng):
        ax = np.arange(0, 16)
        cells = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"),
                         -1).reshape(-1, 3).astype(np.int32)
        dx = 0.5
        vals = rng.standard_normal(len(cells)).astype(np.float32)
        g = adaptive_grid_from_leaves(jnp.asarray(cells),
                                      jnp.asarray(vals), dx=dx,
                                      capacities=[64, 32, 16])
        x = jnp.asarray(rng.uniform(3 * dx, 12 * dx, (10, 3)), jnp.float32)
        got = np.asarray(g.sample_staggered(x))
        for d in range(3):
            shift = np.zeros(3, np.float32)
            shift[d] = 0.5 * dx
            want = np.asarray(g.sample(x + shift))
            np.testing.assert_allclose(got[:, d], want, atol=1e-6)


class TestAdaptiveConsumers:
    def test_sdf_collider_in_mpm(self, rng):
        """The coarse-fine collision SDF consumer: adaptive narrow-band
        SDF of a half-space drives an MPM collider; results match the
        analytic level set."""
        from zpc_tpu.geometry.adaptive_grid import (AdaptiveGridLevelSet,
                                                    adaptive_from_sdf)
        from zpc_tpu.geometry.collider import Collider, ColliderType
        from zpc_tpu.geometry.levelset import HalfSpace
        from zpc_tpu.models.constitutive import FixedCorotated
        from zpc_tpu.sim.mpm import MPMSim, make_mpm_state, explicit_step

        floor = HalfSpace(jnp.asarray([0.0, 0.3, 0.0]),
                          jnp.asarray([0.0, 1.0, 0.0]))
        ag = adaptive_from_sdf(floor, dx=0.025, lo=(0.0, 0.0, 0.0),
                               hi=(1.0, 1.0, 1.0), band=0.2)
        ls = AdaptiveGridLevelSet(ag)
        # sdf matches analytic inside the band
        pts = jnp.asarray(rng.uniform(0.1, 0.9, (50, 3)), jnp.float32)
        pts = pts.at[:, 1].set(jnp.asarray(
            rng.uniform(0.2, 0.42, 50), jnp.float32))
        np.testing.assert_allclose(np.asarray(ls.sdf(pts)),
                                   np.asarray(floor.sdf(pts)), atol=0.01)
        x = jnp.asarray(np.stack([rng.uniform(0.4, 0.6, 400),
                                  rng.uniform(0.33, 0.45, 400),
                                  rng.uniform(0.4, 0.6, 400)], -1),
                        jnp.float32)
        st = make_mpm_state(x, dx=0.025, block_capacity=512)
        dt = jnp.float32(2e-4)
        sim_a = MPMSim(model=FixedCorotated.from_young_poisson(1e4, 0.3),
                       gravity=jnp.asarray([0.0, -9.8, 0.0]),
                       colliders=(Collider(ls, ColliderType.sticky),))
        sim_b = MPMSim(model=FixedCorotated.from_young_poisson(1e4, 0.3),
                       gravity=jnp.asarray([0.0, -9.8, 0.0]),
                       colliders=(Collider(floor, ColliderType.sticky),))
        sa, sb = st, st
        for _ in range(3):
            sa = explicit_step(sim_a, sa, dt)
            sb = explicit_step(sim_b, sb, dt)
        np.testing.assert_allclose(np.asarray(sa.particles["x"]),
                                   np.asarray(sb.particles["x"]),
                                   atol=5e-4)

    def test_vdb_roundtrip(self, rng, tmp_path):
        from zpc_tpu.geometry.vdb_bridge import (adaptive_to_vdb_grid,
                                                 vdb_grid_to_adaptive)
        from zpc_tpu.utils.vdb import read_vdb, write_vdb
        cells = np.unique(rng.integers(0, 40, (300, 3)).astype(np.int32),
                          axis=0)
        vals = rng.standard_normal(len(cells)).astype(np.float32)
        g = adaptive_grid_from_leaves(jnp.asarray(cells),
                                      jnp.asarray(vals), dx=0.1,
                                      capacities=[128, 64, 16],
                                      background=0.0)
        vg = adaptive_to_vdb_grid(g, name="sdf")
        path = str(tmp_path / "adaptive.vdb")
        write_vdb(path, [vg])
        back = vdb_grid_to_adaptive(read_vdb(path)[0])
        x = jnp.asarray((cells + 0.5) * 0.1, jnp.float32)
        np.testing.assert_allclose(np.asarray(back.probe(x)), vals,
                                   atol=1e-6)
