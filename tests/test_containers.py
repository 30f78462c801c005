"""Container tests (reference ``test/cuda/basic.cu:48-161`` smoke pattern:
init, cross-space clone equality, named-property access)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import zpc_tpu as z
from zpc_tpu.containers import block_table as bt


class TestField:
    def test_construct_and_access(self):
        f = z.field(np.arange(10, dtype=np.float32), capacity=16)
        assert f.size == 10 and f.capacity == 16
        np.testing.assert_array_equal(f.to_host(), np.arange(10))
        assert int(np.sum(np.asarray(f.mask))) == 10

    def test_resize_append(self):
        f = z.field(capacity=4, dtype=jnp.int32)
        f = f.append(jnp.array([1, 2, 3], jnp.int32))
        f = f.append(jnp.array([4, 5, 6], jnp.int32))  # forces growth
        np.testing.assert_array_equal(f.to_host(), [1, 2, 3, 4, 5, 6])
        assert f.capacity >= 6

    def test_set_fill(self):
        f = z.field(np.zeros(8, np.float32))
        f = f.set(3, 7.0).fill(2.0)
        assert float(f[3]) == 2.0

    def test_pytree(self):
        f = z.field(np.arange(8, dtype=np.float32))
        doubled = jax.jit(lambda x: jax.tree.map(lambda a: a * 2, x))(f)
        np.testing.assert_array_equal(doubled.to_host(), np.arange(8) * 2.0)
        assert doubled.size == 8  # static field survives jit

    def test_device_roundtrip(self):
        f = z.field(np.arange(8, dtype=np.float32))
        f2 = f.to_device(jax.devices()[0])
        np.testing.assert_array_equal(f2.to_host(), f.to_host())


class TestStructuredField:
    def test_props(self):
        sf = z.structured_field(
            [z.prop("m"), z.prop("v", 3), z.prop("F", (3, 3))], capacity=32)
        assert sf["m"].shape == (32,)
        assert sf["v"].shape == (32, 3)
        assert sf["F"].shape == (32, 3, 3)
        assert sf.has_prop("v") and not sf.has_prop("x")

    def test_update_permute(self, rng):
        x = rng.standard_normal((8, 3)).astype(np.float32)
        sf = z.structured_field([z.prop("x", 3)], capacity=8,
                                data={"x": x})
        assert sf.size == 8
        perm = jnp.array([7, 6, 5, 4, 3, 2, 1, 0])
        sp = sf.permute(perm)
        np.testing.assert_array_equal(np.asarray(sp["x"]), x[::-1])

    def test_with_props(self):
        sf = z.structured_field([z.prop("x", 3)], capacity=4)
        sf = sf.with_props([z.prop("x", 3), z.prop("C", (3, 3))])
        assert sf["C"].shape == (4, 3, 3)

    def test_pytree_jit(self):
        sf = z.structured_field([z.prop("x", 3)], capacity=4,
                                data={"x": np.ones((4, 3), np.float32)})

        @jax.jit
        def step(s):
            return s.set("x", s["x"] + 1.0)

        out = step(sf)
        np.testing.assert_array_equal(np.asarray(out["x"]),
                                      np.full((4, 3), 2.0))


class TestBlockTable:
    def test_pack_unpack_roundtrip(self, rng):
        c = rng.integers(-500, 500, size=(100, 3)).astype(np.int32)
        back = np.asarray(bt.unpack_key(bt.pack_coords(jnp.asarray(c)), 3))
        np.testing.assert_array_equal(back, c)

    def test_pack_orders_lexicographically(self, rng):
        c = rng.integers(-10, 10, size=(50, 3)).astype(np.int32)
        keys = np.asarray(bt.pack_coords(jnp.asarray(c)))
        order_k = np.argsort(keys, kind="stable")
        order_lex = np.lexsort((c[:, 2], c[:, 1], c[:, 0]))
        np.testing.assert_array_equal(c[order_k], c[order_lex])

    def test_build_query(self, rng):
        c = rng.integers(-20, 20, size=(500, 3)).astype(np.int32)
        table, inverse = bt.build_block_table(jnp.asarray(c), capacity=1024)
        uniq = np.unique(c, axis=0)
        assert int(table.count) == len(uniq)
        # every original coord maps to a slot holding its key
        inv = np.asarray(inverse)
        keys = np.asarray(bt.pack_coords(jnp.asarray(c)))
        tkeys = np.asarray(table.keys)
        assert (inv >= 0).all()
        np.testing.assert_array_equal(tkeys[inv], keys)
        # queries agree with the build inverse
        q = np.asarray(table.query(jnp.asarray(c)))
        np.testing.assert_array_equal(q, inv)
        # absent coords give -1
        absent = jnp.asarray([[100, 100, 100]], jnp.int32)
        assert int(table.query(absent)[0]) == -1

    def test_build_with_invalid_lanes(self, rng):
        c = rng.integers(-5, 5, size=(64, 3)).astype(np.int32)
        valid = np.arange(64) < 40
        table, inverse = bt.build_block_table(
            jnp.asarray(c), capacity=256, valid=jnp.asarray(valid))
        uniq = np.unique(c[:40], axis=0)
        assert int(table.count) == len(uniq)
        assert (np.asarray(inverse)[40:] == -1).all()

    def test_build_under_jit(self, rng):
        c = jnp.asarray(rng.integers(-8, 8, size=(128, 3)).astype(np.int32))

        @jax.jit
        def go(c):
            t, inv = bt.build_block_table(c, capacity=512)
            return t.count, t.query(c), inv

        n, q, inv = go(c)
        assert int(n) == len(np.unique(np.asarray(c), axis=0))
        np.testing.assert_array_equal(np.asarray(q), np.asarray(inv))

    def test_2d(self, rng):
        c = rng.integers(-100, 100, size=(200, 2)).astype(np.int32)
        table, inv = bt.build_block_table(jnp.asarray(c), capacity=512)
        assert int(table.count) == len(np.unique(c, axis=0))
        back = np.asarray(bt.unpack_key(bt.pack_coords(jnp.asarray(c)), 2))
        np.testing.assert_array_equal(back, c)


class TestWideBlockTable:
    """Dual-int32 keys: domains beyond the 1024^3-block single-key cap
    (reference 64-bit-key bht, Bht.hpp)."""

    def test_far_coords_roundtrip(self, rng):
        from zpc_tpu.containers.block_table import (build_wide_block_table,
                                                    pack_coords_wide,
                                                    unpack_key_wide)
        # well beyond +-512 blocks in every axis
        coords = jnp.asarray(np.stack([
            rng.integers(-200_000, 200_000, 64),
            rng.integers(-16_000, 16_000, 64),
            rng.integers(-32_000, 32_000, 64)], -1), jnp.int32)
        kx, kyz = pack_coords_wide(coords)
        back = unpack_key_wide(kx, kyz)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(coords))

        table, inverse = build_wide_block_table(coords, 128)
        inv = np.asarray(inverse)
        slots = np.asarray(table.query(coords))
        np.testing.assert_array_equal(slots, inv)
        assert (slots >= 0).all()
        # coords round-trip through the table
        ac = np.asarray(table.active_coords)
        for i, c in enumerate(np.asarray(coords)):
            np.testing.assert_array_equal(ac[slots[i]], c)

    def test_miss_and_duplicates(self, rng):
        from zpc_tpu.containers.block_table import build_wide_block_table
        base = np.asarray([[100000, 9000, -20000]] * 5 +
                          [[-99999, -9000, 20000]] * 3, np.int64)
        table, inverse = build_wide_block_table(
            jnp.asarray(base, jnp.int32), 8)
        assert int(table.count) == 2
        inv = np.asarray(inverse)
        assert len(set(inv[:5])) == 1 and len(set(inv[5:])) == 1
        miss = table.query(jnp.asarray([[1, 2, 3]], jnp.int32))
        assert int(miss[0]) == -1

    def test_lexicographic_order_preserved(self, rng):
        from zpc_tpu.containers.block_table import (WideBlockTable,
                                                    build_wide_block_table)
        coords = jnp.asarray(np.stack([
            rng.integers(-500_000, 500_000, 256),
            rng.integers(-16_000, 16_000, 256),
            rng.integers(-32_000, 32_000, 256)], -1), jnp.int32)
        table, _ = build_wide_block_table(coords, 256)
        n = int(table.count)
        kx = np.asarray(table.kx)[:n].astype(np.int64)
        kyz = np.asarray(table.kyz)[:n].astype(np.uint32)
        comb = (kx << 32) | kyz
        assert (np.diff(comb) > 0).all()
