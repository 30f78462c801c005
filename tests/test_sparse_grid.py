"""SparseGrid container tests (valueOr/sample/staggered/activation)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zpc_tpu.core.config import prop
from zpc_tpu.geometry.sparse_grid import sparse_grid


class TestSparseGrid:
    def _grid(self, dx=0.1, cap=256):
        return sparse_grid([prop("rho"), prop("vel", 3)], dx=dx,
                           block_capacity=cap)

    def test_activate_and_value_or(self, rng):
        g = self._grid()
        blocks = jnp.asarray(rng.integers(-4, 4, (50, 3)), jnp.int32)
        g = g.activate(blocks)
        assert int(g.table.count) == len(np.unique(np.asarray(blocks),
                                                   axis=0))
        # write a recognizable field: rho(cell) = sum of coords
        node_cells = (g.table.active_coords[:, None, :] * 4 +
                      jnp.asarray(np.stack(np.meshgrid(
                          *[np.arange(4)] * 3, indexing="ij"),
                          -1).reshape(-1, 3)))
        rho = jnp.sum(node_cells, -1).astype(jnp.float32)
        g = g.with_data(rho=rho)
        c = np.asarray(blocks)[0] * 4
        got = float(g.value_or("rho", jnp.asarray(c[None], jnp.int32))[0])
        assert got == float(c.sum())
        # inactive cell -> default
        assert float(g.value_or("rho", jnp.asarray([[999, 0, 0]],
                                                   jnp.int32),
                                default=-3.0)[0]) == -3.0

    def test_sample_linear_field(self, rng):
        # rho = x-coordinate of the cell -> trilinear sample reproduces
        # a linear ramp exactly in the interior
        g = self._grid(dx=1.0)
        blocks = jnp.asarray(np.stack(np.meshgrid(
            *[np.arange(3)] * 3, indexing="ij"), -1).reshape(-1, 3),
            jnp.int32)
        g = g.activate(blocks)
        corners = np.stack(np.meshgrid(*[np.arange(4)] * 3,
                                       indexing="ij"), -1).reshape(-1, 3)
        cells = (np.asarray(g.table.active_coords)[:, None, :] * 4 +
                 corners[None])
        g = g.with_data(rho=jnp.asarray(cells[..., 0], jnp.float32))
        pts = jnp.asarray(rng.uniform(2.0, 8.0, (40, 3)), jnp.float32)
        got = np.asarray(g.sample("rho", pts))
        np.testing.assert_allclose(got, np.asarray(pts)[:, 0], atol=1e-4)

    def test_staggered_sample_shapes(self, rng):
        g = self._grid(dx=0.5)
        blocks = jnp.asarray(rng.integers(0, 3, (30, 3)), jnp.int32)
        g = g.activate(blocks)
        g = g.with_data(vel=jnp.ones((g.block_capacity,
                                      g.cells_per_block, 3)))
        pts = jnp.asarray(rng.uniform(0.5, 1.0, (10, 3)), jnp.float32)
        v = np.asarray(g.sample_staggered("vel", pts))
        assert v.shape == (10, 3)

    def test_dilation_covers_neighbors(self):
        g = self._grid()
        g = g.activate(jnp.asarray([[0, 0, 0]], jnp.int32), dilation=1)
        assert int(g.table.count) == 8  # 2^3 neighborhood
        for d in ([0, 0, 1], [1, 1, 1]):
            assert int(g.table.query(jnp.asarray([d], jnp.int32))[0]) >= 0

    def test_world_index_roundtrip(self, rng):
        g = sparse_grid([prop("a")], dx=0.25, block_capacity=8,
                        origin=[1.0, 2.0, 3.0])
        x = jnp.asarray(rng.uniform(-5, 5, (20, 3)), jnp.float32)
        xi = g.world_to_index(x)
        back = g.index_to_world(xi)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                                   atol=1e-5)


def test_wide_key_grid_far_domain(rng):
    """sparse_grid(wide_keys=True): activation + queries beyond the
    +-512-block packed-int32 cap."""
    from zpc_tpu.core.config import prop
    from zpc_tpu.geometry.sparse_grid import sparse_grid
    from zpc_tpu.containers.block_table import WideBlockTable
    g = sparse_grid([prop("m")], dx=1.0, block_capacity=64, wide_keys=True)
    assert isinstance(g.table, WideBlockTable)
    blocks = jnp.asarray([[100000, 9000, -20000], [100001, 9000, -20000],
                          [-5000, -9000, 30000]], jnp.int32)
    g2, slots = g.activate_with_slots(blocks, dilation=1)
    assert (np.asarray(slots) >= 0).all()
    # cell queries inside the far blocks resolve
    cells = blocks * 4 + 1
    cs = np.asarray(g2.cell_slot(cells))
    assert (cs >= 0).all()
    # a write/read roundtrip through value_or
    data = g2.data["m"].reshape(-1).at[cs].set(jnp.asarray([1., 2., 3.]))
    import dataclasses
    g3 = dataclasses.replace(g2, data={"m": data.reshape(
        g2.block_capacity, g2.cells_per_block)})
    vals = np.asarray(g3.value_or("m", cells, -1.0))
    np.testing.assert_allclose(vals, [1., 2., 3.])
