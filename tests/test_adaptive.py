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
