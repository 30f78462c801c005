"""VDB-lite codec + SparseGrid bridge round-trip oracles
(reference surface: geometry/VdbLevelSet.h:26-99, SparseGrid_Conversion.cpp)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from zpc_tpu.utils.vdb import (VdbGrid, VdbFormatError, dense_to_leaves,
                               leaves_to_dense, read_vdb, write_vdb)
from zpc_tpu.geometry.sparse_grid import (sparse_grid_from_dense,
                                          sparse_grid_to_dense)
from zpc_tpu.geometry.vdb_bridge import (load_vdb_grids, save_vdb,
                                         sparse_grid_to_vdb_grid,
                                         vdb_grid_to_sparse_grid)


@pytest.fixture
def dense(rng):
    a = np.zeros((24, 16, 40), np.float32)
    a[3:9, 2:11, 5:30] = rng.standard_normal((6, 9, 25)).astype(np.float32)
    return a


class TestCodec:
    @pytest.mark.parametrize("compress", [False, True])
    def test_roundtrip(self, tmp_path, dense, compress):
        leaves = dense_to_leaves(dense)
        g = VdbGrid("density", leaves, voxel_size=0.1,
                    translation=(1.0, -2.0, 0.5), background=0.0,
                    grid_class="fog volume")
        path = os.path.join(tmp_path, "t.vdb")
        write_vdb(path, [g], compress=compress)
        (g2,) = read_vdb(path)
        assert g2.name == "density"
        assert g2.grid_class == "fog volume"
        assert g2.voxel_size == pytest.approx(0.1)
        assert g2.translation == pytest.approx((1.0, -2.0, 0.5))
        assert set(g2.leaves) == set(leaves)
        for k in leaves:
            np.testing.assert_array_equal(g2.leaves[k], leaves[k])
            np.testing.assert_array_equal(g2.masks[k], leaves[k] != 0.0)

    def test_negative_and_far_coords(self, tmp_path, rng):
        leaves = {(-4096, -128, 8): rng.standard_normal(
                      (8, 8, 8)).astype(np.float32),
                  (5000 // 8 * 8, 0, -8): rng.standard_normal(
                      (8, 8, 8)).astype(np.float32)}
        path = os.path.join(tmp_path, "far.vdb")
        write_vdb(path, [VdbGrid("g", leaves)])
        (g2,) = read_vdb(path)
        assert set(g2.leaves) == set(leaves)
        for k in leaves:
            np.testing.assert_array_equal(g2.leaves[k], leaves[k])

    def test_multiple_grids_and_int32(self, tmp_path, rng):
        gf = VdbGrid("f", {(0, 0, 0): np.arange(512, dtype=np.float32)
                           .reshape(8, 8, 8)})
        gi = VdbGrid("i", {(8, 0, 0): np.arange(512, dtype=np.int32)
                           .reshape(8, 8, 8)}, dtype=np.int32)
        path = os.path.join(tmp_path, "multi.vdb")
        write_vdb(path, [gf, gi])
        out = read_vdb(path)
        assert [g.name for g in out] == ["f", "i"]
        assert out[1].leaves[(8, 0, 0)].dtype == np.int32

    def test_dense_leaf_helpers(self, dense):
        leaves = dense_to_leaves(dense)
        back, origin = leaves_to_dense(leaves)
        ox, oy, oz = origin
        sub = back[3 - ox:9 - ox, 2 - oy:11 - oy, 5 - oz:30 - oz]
        np.testing.assert_array_equal(sub, dense[3:9, 2:11, 5:30])

    def test_rejects_garbage(self, tmp_path):
        path = os.path.join(tmp_path, "bad.vdb")
        with open(path, "wb") as f:
            f.write(b"not a vdb file at all........")
        with pytest.raises(VdbFormatError):
            read_vdb(path)


class TestSparseGridBridge:
    def test_grid_roundtrip(self, tmp_path, dense):
        g = sparse_grid_from_dense(jnp.asarray(dense), dx=0.05,
                                   prop_name="sdf", threshold=0.0)
        vg = sparse_grid_to_vdb_grid(g, "sdf")
        g2 = vdb_grid_to_sparse_grid(vg, "sdf")
        d2 = np.asarray(sparse_grid_to_dense(g2, "sdf", (0, 0, 0),
                                             dense.shape))
        np.testing.assert_array_equal(d2, dense)

    def test_file_roundtrip_with_origin(self, tmp_path, dense):
        g = sparse_grid_from_dense(jnp.asarray(dense), dx=0.1,
                                   prop_name="phi", threshold=0.0,
                                   origin=jnp.asarray([2.0, 0.0, -1.0]))
        path = os.path.join(tmp_path, "grid.vdb")
        save_vdb(path, g, ["phi"], grid_class="level set")
        loaded = load_vdb_grids(path)
        g2 = loaded["phi"]
        assert float(g2.dx) == pytest.approx(0.1)
        np.testing.assert_allclose(
            np.asarray(g2.transform.matrix[:3, 3]), [2.0, 0.0, -1.0])
        d2 = np.asarray(sparse_grid_to_dense(g2, "phi", (0, 0, 0),
                                             dense.shape))
        np.testing.assert_array_equal(d2, dense)

    def test_vector_prop_export(self, tmp_path, rng):
        from zpc_tpu.core.config import prop
        from zpc_tpu.geometry.sparse_grid import sparse_grid
        import dataclasses
        from zpc_tpu.containers.block_table import build_block_table
        coords = jnp.asarray([[0, 0, 0], [1, 2, 3]], jnp.int32)
        table, inv = build_block_table(coords, 8)
        g = sparse_grid([prop("v", 3)], dx=1.0, block_capacity=8)
        v = jnp.zeros((8, 64, 3)).at[inv].set(
            jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32))
        g = dataclasses.replace(g, table=table, data={"v": v})
        path = os.path.join(tmp_path, "vec.vdb")
        save_vdb(path, g, ["v"])
        out = read_vdb(path)
        assert sorted(o.name for o in out) == ["v.0", "v.1", "v.2"]
