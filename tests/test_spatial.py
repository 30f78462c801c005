"""IndexBuckets neighbor-list oracle tests (reference IndexBuckets.hpp
semantics: per-cell binning + neighborhood iteration)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zpc_tpu.containers.index_buckets import (build_index_buckets,
                                              neighbor_candidates)


class TestIndexBuckets:
    def test_cell_ranges_cover_all(self, rng):
        n = 1000
        x = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
        ib = build_index_buckets(x, 0.1, cell_capacity=4096)
        cells = np.asarray(ib.cell_of(x))
        start, end = ib.cell_range(jnp.asarray(cells))
        start, end = np.asarray(start), np.asarray(end)
        idx = np.asarray(ib.indices)
        for i in range(0, n, 97):
            members = idx[start[i]:end[i]]
            ref = np.nonzero((cells == cells[i]).all(1))[0]
            assert set(members.tolist()) == set(ref.tolist())

    def test_neighbor_candidates_radius(self, rng):
        n, nq = 2000, 50
        dx = 0.15
        x = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
        q = jnp.asarray(rng.uniform(0, 1, (nq, 3)), jnp.float32)
        ib = build_index_buckets(x, dx, cell_capacity=2048)
        ids, mask = jax.jit(
            lambda q: neighbor_candidates(ib, q, k_per_cell=64))(q)
        ids, mask = np.asarray(ids), np.asarray(mask)
        xn, qn = np.asarray(x), np.asarray(q)
        # every particle within dx of a query must appear among candidates
        for i in range(nq):
            d = np.linalg.norm(xn - qn[i], axis=1)
            required = set(np.nonzero(d < dx)[0].tolist())
            got = set(ids[i][mask[i]].tolist())
            assert required <= got

    def test_invalid_particles_excluded(self, rng):
        n = 200
        x = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
        valid = jnp.asarray(np.arange(n) < 150)
        ib = build_index_buckets(x, 0.2, cell_capacity=512, valid=valid)
        assert int(ib.count) == 150
        ids, mask = neighbor_candidates(ib, x[:10], k_per_cell=200)
        present = set(np.asarray(ids)[np.asarray(mask)].tolist())
        assert all(p < 150 for p in present)

    def test_empty_cells_empty_range(self, rng):
        x = jnp.asarray(rng.uniform(0, 0.1, (50, 3)), jnp.float32)
        ib = build_index_buckets(x, 0.05, cell_capacity=128)
        far = jnp.asarray([[100, 100, 100]], jnp.int32)
        s, e = ib.cell_range(far)
        assert int(s[0]) == int(e[0])
