"""Native host-runtime tests (C ABI library vs numpy oracles)."""

import numpy as np
import pytest

from zpc_tpu.utils import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


class TestNative:
    def test_morton_matches_device_impl(self, rng):
        import jax.numpy as jnp

        from zpc_tpu.math.bits import morton3d

        c = rng.integers(0, 1024, (1000, 3)).astype(np.int32)
        host = native.morton3d_host(c)
        dev = np.asarray(morton3d(jnp.asarray(c)))
        np.testing.assert_array_equal(host, dev)

    def test_radix_sort_pairs(self, rng):
        k = rng.integers(0, 1 << 20, 10000).astype(np.int32)
        v = np.arange(10000, dtype=np.int32)
        ks, vs = native.radix_sort_pairs_host(k.copy(), v.copy())
        order = np.argsort(k, kind="stable")
        np.testing.assert_array_equal(ks, k[order])
        np.testing.assert_array_equal(vs, v[order])

    def test_radix_sort_bit_window(self, rng):
        k = rng.integers(0, 1 << 16, 5000).astype(np.int32)
        v = np.arange(5000, dtype=np.int32)
        ks, vs = native.radix_sort_pairs_host(k.copy(), v.copy(),
                                              sbit=4, ebit=12)
        w = (k >> 4) & 0xFF
        order = np.argsort(w, kind="stable")
        np.testing.assert_array_equal(vs, v[order])

    def test_pack_unpack_roundtrip(self, rng):
        pos = rng.standard_normal((500, 3)).astype(np.float32)
        vel = rng.standard_normal((500, 3)).astype(np.float32)
        m = rng.standard_normal((500, 1)).astype(np.float32)
        rec = native.pack_be_records([pos, vel, m], [3, 3, 1])
        assert rec is not None and rec.shape == (500, 7)
        # big-endian check: reinterpret matches byteswap
        np.testing.assert_array_equal(
            rec[:, :3].view(np.float32),
            pos.astype(">f4").view(np.float32))
        cols = native.unpack_be_records(rec, [3, 3, 1])
        np.testing.assert_array_equal(cols[0], pos)
        np.testing.assert_array_equal(cols[1], vel)
        np.testing.assert_array_equal(cols[2], m)

    def test_arena(self):
        import ctypes

        lib = native.load()
        a = lib.zpc_arena_create(ctypes.c_int64(1024))
        lib.zpc_arena_alloc.restype = ctypes.c_void_p
        lib.zpc_arena_create.restype = ctypes.c_void_p
        a = lib.zpc_arena_create(ctypes.c_int64(1024))
        p1 = lib.zpc_arena_alloc(ctypes.c_void_p(a), ctypes.c_int64(100),
                                 ctypes.c_int64(64))
        p2 = lib.zpc_arena_alloc(ctypes.c_void_p(a), ctypes.c_int64(100),
                                 ctypes.c_int64(64))
        assert p1 and p2 and p2 - p1 == 128
        # overflow returns NULL
        p3 = lib.zpc_arena_alloc(ctypes.c_void_p(a), ctypes.c_int64(2000),
                                 ctypes.c_int64(8))
        assert not p3
        lib.zpc_arena_reset(ctypes.c_void_p(a))
        p4 = lib.zpc_arena_alloc(ctypes.c_void_p(a), ctypes.c_int64(100),
                                 ctypes.c_int64(64))
        assert p4 == p1
        lib.zpc_arena_destroy(ctypes.c_void_p(a))
