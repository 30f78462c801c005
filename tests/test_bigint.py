"""Oracle tests for BigInt/RationalW against Python's unbounded ints.

Reference capability: ``include/zensim/math/Rational.hpp:86-360`` (exact
i64 fraction).  BigInt's default 192-bit width must be exact on the full
int64 range including products."""

import math
from fractions import Fraction

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from zpc_tpu.math.bigint import (BigInt, RationalW, bigint, bigint_gcd,
                                 rational_w, _bigint_div_exact)

RNG = np.random.default_rng(7)


def rand_ints(n, bits):
    out = []
    for _ in range(n):
        v = int.from_bytes(RNG.bytes((bits + 7) // 8)) & ((1 << bits) - 1)
        out.append(v if RNG.integers(0, 2) else -v)
    return out


def as_big(vals, limbs=16):
    return bigint(list(vals), limbs=limbs)


@pytest.mark.parametrize("bits", [8, 31, 62])
def test_roundtrip(bits):
    vals = rand_ints(64, bits) + [0, 1, -1]
    assert as_big(vals).to_pyints() == vals


@pytest.mark.parametrize("op", ["add", "sub", "mul"])
@pytest.mark.parametrize("bits", [16, 62, 90])
def test_arith_oracle(op, bits):
    a = rand_ints(128, bits) + [0, 0, 1, -1]
    b = rand_ints(128, bits) + [0, 5, -1, 0]
    A, B = as_big(a), as_big(b)
    got = {"add": lambda: A + B, "sub": lambda: A - B,
           "mul": lambda: A * B}[op]()
    want = {"add": lambda x, y: x + y, "sub": lambda x, y: x - y,
            "mul": lambda x, y: x * y}[op]
    assert got.to_pyints() == [want(x, y) for x, y in zip(a, b)]


def test_compare_oracle():
    a = rand_ints(200, 62) + [0, 3, -3]
    b = rand_ints(200, 62) + [0, 3, 3]
    c = np.asarray(as_big(a).compare(as_big(b)))
    want = [(x > y) - (x < y) for x, y in zip(a, b)]
    assert c.tolist() == want


def test_mul_int64_products_exact():
    # products of two full-range int64 values: needs >127 bits
    a = rand_ints(64, 62)
    b = rand_ints(64, 62)
    got = (as_big(a) * as_big(b)).to_pyints()
    assert got == [x * y for x, y in zip(a, b)]


def test_shifts():
    vals = rand_ints(64, 80) + [0, 1, -1, 2]
    half = as_big(vals).shift_right1().to_pyints()
    assert half == [(1 if v > 0 else -1) * (abs(v) >> 1) if abs(v) > 1
                    else 0 for v in vals]
    vals2 = rand_ints(32, 80) + [0, 1, -1]
    assert as_big(vals2).shift_left1().to_pyints() == [2 * v for v in vals2]


def test_gcd_oracle():
    base = rand_ints(40, 40)
    mult = rand_ints(40, 20)
    a = [abs(x) for x in base]
    b = [abs(x * m) % (1 << 60) for x, m in zip(base, mult)]
    g = bigint_gcd(as_big(a), as_big(b)).to_pyints()
    assert g == [math.gcd(x, y) if (x or y) else 1 for x, y in zip(a, b)]


def test_gcd_zero_cases():
    a = [0, 8, 0, 12]
    b = [8, 0, 0, 18]
    g = bigint_gcd(as_big(a), as_big(b)).to_pyints()
    assert g == [8, 8, 1, 6]


def test_div_exact():
    q = rand_ints(48, 50)
    d = [abs(v) + 1 for v in rand_ints(48, 30)]
    a = [x * y for x, y in zip(q, d)]
    got = _bigint_div_exact(as_big(a), as_big(d)).to_pyints()
    assert got == q


def test_rational_ops_oracle():
    n1, d1 = rand_ints(64, 40), [abs(v) + 1 for v in rand_ints(64, 30)]
    n2, d2 = rand_ints(64, 40), [abs(v) + 1 for v in rand_ints(64, 30)]
    r1 = rational_w(as_big(n1), as_big(d1))
    r2 = rational_w(as_big(n2), as_big(d2))
    f1 = [Fraction(a, b) for a, b in zip(n1, d1)]
    f2 = [Fraction(a, b) for a, b in zip(n2, d2)]
    assert (r1 + r2).to_fractions() == [a + b for a, b in zip(f1, f2)]
    assert (r1 - r2).to_fractions() == [a - b for a, b in zip(f1, f2)]
    assert (r1 * r2).to_fractions() == [a * b for a, b in zip(f1, f2)]
    cmp = np.asarray(r1.compare(r2)).tolist()
    assert cmp == [(a > b) - (a < b) for a, b in zip(f1, f2)]


def test_rational_div_and_sign():
    n1 = [3, -3, 0, 7]
    n2 = [2, -5, 4, -7]
    r = rational_w(as_big(n1)) / rational_w(as_big(n2))
    assert r.to_fractions() == [Fraction(a, b) for a, b in zip(n1, n2)]
    assert np.asarray(r.sign()).tolist() == [1, 1, 0, -1]


def test_rational_normalized():
    n = [6, -6, 0, 35]
    d = [4, 9, 5, 7]
    r = rational_w(as_big(n), as_big(d)).normalized()
    assert r.to_fractions() == [Fraction(a, b) for a, b in zip(n, d)]
    # denominators actually reduced
    assert r.den.to_pyints() == [2, 3, 1, 1]


def test_jit_safe():
    a = as_big(rand_ints(16, 60))
    b = as_big(rand_ints(16, 60))

    @jax.jit
    def f(a, b):
        return (a * b + a - b).compare(a)

    out = f(a, b)
    assert out.shape == (16,)


def test_to_float_huge_magnitudes():
    # advisor round-2: plain float32 accumulation overflowed to inf above
    # ~2^128 (well inside the 192-bit width); exponent-tracked conversion
    # keeps finite values finite and ratios representable
    vals = [1 << 140, -(3 << 150), 7]
    b = as_big(vals)
    got = np.asarray(b.to_float())
    for g, v in zip(got, vals):
        if abs(v) < 3.4e38:
            assert np.isfinite(g)
        with np.errstate(over="ignore"):        # expected: |v| > f32 max
            want = np.float32(v)
        np.testing.assert_allclose(g, want, rtol=1e-6)


def test_rational_to_float_huge_ratio():
    n = [5 << 140, -(1 << 150)]
    d = [1 << 139, 1 << 150]
    r = rational_w(as_big(n), as_big(d))
    got = np.asarray(r.to_float())
    want = [float(Fraction(a, b)) for a, b in zip(n, d)]
    np.testing.assert_allclose(got, want, rtol=1e-6)
