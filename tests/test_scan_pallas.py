"""Pallas chunked-carry scan vs numpy oracle (interpret mode on CPU).

The kernel is the TPU fast path behind primitives.inclusive_scan /
exclusive_scan for large additive scans (reference cub::DeviceScan
delegation, cuda/execution/ExecutionPolicy.cuh:560-650)."""

import numpy as np
import jax.numpy as jnp
import pytest

from zpc_tpu.ops.scan_pallas import CHUNK, scan_pallas, scan_supported


@pytest.mark.parametrize("dtype", [np.int32, np.uint32, np.float32])
@pytest.mark.parametrize("n", [CHUNK, CHUNK + 777, 3 * CHUNK])
def test_inclusive_matches_numpy(dtype, n):
    rng = np.random.default_rng(42)
    if dtype == np.float32:
        x = rng.standard_normal(n).astype(np.float32)
    else:
        x = rng.integers(0, 1000, n).astype(dtype)
    out = np.asarray(scan_pallas(jnp.asarray(x), interpret=True))
    if dtype == np.float32:
        ref = np.cumsum(x.astype(np.float64))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=1e-3)
    else:
        ref = np.cumsum(x.astype(np.int64)).astype(np.int64)
        assert np.array_equal(out.astype(np.int64) & 0xFFFFFFFF,
                              ref & 0xFFFFFFFF)


def test_exclusive_int_exact():
    rng = np.random.default_rng(7)
    x = rng.integers(-50, 50, 2 * CHUNK + 13).astype(np.int32)
    out = np.asarray(scan_pallas(jnp.asarray(x), exclusive=True,
                                 interpret=True))
    ref = np.cumsum(x.astype(np.int64)) - x
    assert np.array_equal(out.astype(np.int64), ref)


def test_supported_gate():
    assert scan_supported(jnp.zeros((CHUNK,), jnp.int32))
    assert not scan_supported(jnp.zeros((CHUNK // 2,), jnp.int32))
    assert not scan_supported(jnp.zeros((4, CHUNK), jnp.int32))


@pytest.mark.parametrize("op,npop", [("max", np.maximum), ("min", np.minimum)])
def test_max_min_scan(op, npop):
    rng = np.random.default_rng(3)
    x = rng.integers(-10000, 10000, CHUNK + 513).astype(np.int32)
    out = np.asarray(scan_pallas(jnp.asarray(x), interpret=True, op=op))
    np.testing.assert_array_equal(out, npop.accumulate(x))


def test_max_scan_float():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(2 * CHUNK).astype(np.float32)
    out = np.asarray(scan_pallas(jnp.asarray(x), interpret=True, op="max"))
    np.testing.assert_array_equal(out, np.maximum.accumulate(x))
