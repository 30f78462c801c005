"""OrderedMap, RingBuffer, Rational, hashing tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zpc_tpu.containers.ordered_map import ordered_map, ring_buffer
from zpc_tpu.math.rational import rational, gcd
from zpc_tpu.math import random as zr


class TestOrderedMap:
    def test_insert_find_get(self, rng):
        m = ordered_map(64)
        k = jnp.asarray([5, 3, 9, 1], jnp.int32)
        v = jnp.asarray([50.0, 30, 90, 10], jnp.float32)
        m = m.insert(k, v)
        assert int(m.count) == 4
        np.testing.assert_array_equal(
            np.asarray(m.keys[:4]), [1, 3, 5, 9])  # ordered iteration
        got = np.asarray(m.get(jnp.asarray([9, 1, 7], jnp.int32),
                               default=-1.0))
        np.testing.assert_allclose(got, [90.0, 10.0, -1.0])

    def test_upsert_overwrites(self):
        m = ordered_map(16)
        m = m.insert(jnp.asarray([2, 4], jnp.int32),
                     jnp.asarray([1.0, 2.0], jnp.float32))
        m = m.insert(jnp.asarray([4, 4], jnp.int32),
                     jnp.asarray([7.0, 8.0], jnp.float32))
        assert int(m.count) == 2
        assert float(m.get(jnp.asarray([4], jnp.int32))[0]) == 8.0  # last wins

    def test_erase(self):
        m = ordered_map(16)
        m = m.insert(jnp.asarray([1, 2, 3], jnp.int32),
                     jnp.asarray([1.0, 2, 3], jnp.float32))
        m = m.erase(jnp.asarray([2], jnp.int32))
        assert int(m.count) == 2
        assert int(m.find(jnp.asarray([2], jnp.int32))[0]) == -1
        assert int(m.find(jnp.asarray([3], jnp.int32))[0]) >= 0

    def test_random_oracle(self, rng):
        m = ordered_map(256)
        ref = {}
        for _ in range(5):
            k = rng.integers(0, 100, 40).astype(np.int32)
            v = rng.standard_normal(40).astype(np.float32)
            m = m.insert(jnp.asarray(k), jnp.asarray(v))
            for kk, vv in zip(k, v):
                ref[int(kk)] = float(vv)
            dels = rng.integers(0, 100, 10).astype(np.int32)
            m = m.erase(jnp.asarray(dels))
            for d in dels:
                ref.pop(int(d), None)
        assert int(m.count) == len(ref)
        qs = np.asarray(sorted(ref.keys()), np.int32)
        got = np.asarray(m.get(jnp.asarray(qs)))
        np.testing.assert_allclose(got, [ref[int(q)] for q in qs],
                                   rtol=1e-6)


class TestRingBuffer:
    def test_fifo(self):
        rb = ring_buffer(4)
        for i in range(3):
            rb = rb.push(float(i))
        rb, v = rb.pop()
        assert float(v) == 0.0
        rb = rb.push(3.0).push(4.0)   # size back to 4 (full)
        rb = rb.push(5.0)             # overwrites oldest (1.0)
        rb, v = rb.pop()
        assert float(v) == 2.0
        assert int(rb.size) == 3


class TestRational:
    def test_arithmetic(self):
        a = rational(1, 3)
        b = rational(1, 6)
        c = a + b
        assert int(c.num) == 1 and int(c.den) == 2
        d = a - b
        assert int(d.num) == 1 and int(d.den) == 6
        e = a * b
        assert int(e.num) == 1 and int(e.den) == 18
        f = a / b
        assert int(f.num) == 2 and int(f.den) == 1

    def test_compare_exact(self):
        # 1/3 vs 0.3333: exact comparison
        a = rational(1, 3)
        b = rational(3333, 10000)
        assert int(a.compare(b)) == 1
        assert int(b.compare(a)) == -1
        assert int(a.compare(rational(2, 6))) == 0

    def test_batched(self, rng):
        n = rng.integers(-50, 50, 32).astype(np.int32)
        d = rng.integers(1, 50, 32).astype(np.int32)
        r = rational(jnp.asarray(n), jnp.asarray(d))
        from fractions import Fraction
        fr = [Fraction(int(a), int(b)) for a, b in zip(n, d)]
        got = r.to_fractions()
        assert got == fr

    def test_gcd(self):
        g = gcd(jnp.asarray([12, 18, 7, 0]), jnp.asarray([8, 24, 13, 5]))
        np.testing.assert_array_equal(np.asarray(g), [4, 6, 1, 5])


class TestHashing:
    def test_int_hash_roundtrip(self, rng):
        x = jnp.asarray(rng.integers(-2**31, 2**31 - 1, 1000, dtype=np.int64)
                        .astype(np.int32))
        h = zr.int_hash(x)
        back = zr.int_unhash(h)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_hash_distribution(self, rng):
        x = jnp.arange(10000, dtype=jnp.int32)
        h = np.asarray(zr.int_hash(x)).astype(np.uint32)
        buckets = np.bincount(h % 64, minlength=64)
        assert buckets.min() > 10000 / 64 * 0.7

    def test_sphere_sampling(self):
        key = jax.random.PRNGKey(0)
        v = zr.sample_uniform_sphere(key, (500,))
        np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=1),
                                   1.0, atol=1e-5)
        assert abs(float(jnp.mean(v[:, 0]))) < 0.1

    def test_categorical(self):
        key = jax.random.PRNGKey(1)
        s = zr.sample_categorical(key, jnp.asarray([0.0, 0.0, 1.0]), (100,))
        assert (np.asarray(s) == 2).all()
