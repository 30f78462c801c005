"""Bisect which Mosaic construct crashes the TPU worker in the
merge-path sort kernel (run one variant per process: --v NAME).

Variants:
  dma    ranged 2-D manual DMA from an ANY ref at a dynamic row offset
  roll   dynamic-shift pltpu.roll (lane axis) inside a BlockSpec kernel
  smem   SMEM scalar carry + jnp.max full reduction to scalar
  align  the _align helper (two dynamic rolls + select)
  merge  full in-VMEM merge math on BlockSpec inputs (no DMA, no SMEM)
"""

import argparse
import functools
import sys

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--v", required=True)
args = parser.parse_args()

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])

LANES = 128


def _hi_mask(j, shape):
    if j < LANES:
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        return (lane & j) != 0
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return (row & (j // LANES)) != 0


def _partner(x, j, hi):
    if j < LANES:
        return jnp.where(hi, pltpu.roll(x, j, 1),
                         pltpu.roll(x, LANES - j, 1))
    jr = j // LANES
    return jnp.where(hi, pltpu.roll(x, jr, 0),
                     pltpu.roll(x, x.shape[0] - jr, 0))


def _rev(x):
    j, size = 1, x.shape[0] * LANES
    while j < size:
        x = _partner(x, j, _hi_mask(j, x.shape))
        j *= 2
    return x


def _bitonic_merge_asc(x):
    j = x.shape[0] * LANES // 2
    while j >= 1:
        hi = _hi_mask(j, x.shape)
        px = _partner(x, j, hi)
        x = jnp.where((x <= px) != hi, x, px)
        j //= 2
    return x


def _align(x, s):
    """Drop the first s (<128) elements of row-major x ([R+1,128])."""
    sh = (LANES - s) % LANES
    y = pltpu.roll(x, sh, 1)
    z = pltpu.roll(y, x.shape[0] - 1, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < LANES - s, y, z)[: x.shape[0] - 1]

TR = 16
T = TR * LANES
N = 1 << 20


def v_dma():
    x = jnp.arange(N, dtype=jnp.int32).reshape(-1, LANES)

    def kern(off_ref, src, out, win, sem):
        i = pl.program_id(0)
        row = off_ref[0] + i * TR
        cp = pltpu.make_async_copy(src.at[pl.ds(row, TR + 1)], win, sem)
        cp.start()
        cp.wait()
        out[...] = win[:TR]

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N // LANES, LANES), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N // T,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((TR, LANES), lambda i, s: (i, 0)),
            scratch_shapes=[pltpu.VMEM((TR + 1, LANES), jnp.int32),
                            pltpu.SemaphoreType.DMA],
        ),
    )(jnp.asarray([3], jnp.int32),
      jnp.concatenate([x, jnp.zeros(((TR + 1), LANES), jnp.int32)]))
    got = np.asarray(out).reshape(-1)
    exp = np.arange(N) + 3 * LANES
    exp = exp.reshape(-1, T)  # per tile: rows shifted by +3 rows each tile?
    # row = 3 + i*TR -> tile i reads elements [3*128 + i*T, ...)
    expf = (np.arange(T)[None, :] + 3 * LANES
            + np.arange(N // T)[:, None] * T)
    assert (got.reshape(-1, T) == expf).all(), "dma values wrong"
    print("dma OK")


def v_roll():
    x = jnp.arange(N, dtype=jnp.int32).reshape(-1, LANES)

    def kern(s_ref, xin, out):
        sh = s_ref[0]
        out[...] = pltpu.roll(xin[...], sh, 1)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N // T,),
            in_specs=[pl.BlockSpec((TR, LANES), lambda i, s: (i, 0))],
            out_specs=pl.BlockSpec((TR, LANES), lambda i, s: (i, 0)),
        ),
    )(jnp.asarray([5], jnp.int32), x)
    got = np.asarray(out)
    exp = np.roll(np.asarray(x), 5, axis=1)
    assert (got == exp).all(), "roll values wrong"
    print("roll OK")


def v_smem():
    x = jnp.ones((N,), jnp.int32).reshape(-1, LANES)

    def kern(xin, out, cur):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            cur[0] = 0

        v = jnp.max(xin[...] + cur[0])
        cur[0] = cur[0] + v
        out[...] = xin[...] * 0 + cur[0]

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
        grid=(N // T,),
        in_specs=[pl.BlockSpec((TR, LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((TR, LANES), lambda i: (i, 0)),
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
    )(x)
    got = np.asarray(out).reshape(-1, T)[:, 0].astype(np.int64)
    # cur' = cur + max(1 + cur) = 2*cur + 1  ->  2^(i+1) - 1
    exp = (1 << (np.arange(N // T, dtype=np.int64) + 1)) - 1
    exp = (exp & 0xFFFFFFFF).astype(np.int64)
    exp = np.where(exp >= 1 << 31, exp - (1 << 32), exp)  # i32 wrap
    assert (got == exp).all(), f"smem values wrong {got[:5]}"
    print("smem OK")


def v_align():
    x = jnp.arange((TR + 1) * LANES, dtype=jnp.int32)
    xs = jnp.tile(x.reshape(1, -1), (N // ((TR + 1) * LANES) + 1, 1))[
        : N // ((TR + 1) * LANES)].reshape(-1)

    def kern(s_ref, xin, out):
        out[...] = _align(xin[...], s_ref[0])

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((TR, LANES), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec((TR + 1, LANES), lambda i, s: (0, 0))],
            out_specs=pl.BlockSpec((TR, LANES), lambda i, s: (0, 0)),
        ),
    )(jnp.asarray([37], jnp.int32), x.reshape(TR + 1, LANES))
    got = np.asarray(out).reshape(-1)
    exp = np.arange(37, 37 + T)
    assert (got == exp).all(), "align values wrong"
    print("align OK")


def v_merge():
    rng = np.random.default_rng(0)
    a = np.sort(rng.integers(0, 1 << 30, (N // T, T)).astype(np.int32), 1)
    b = np.sort(rng.integers(0, 1 << 30, (N // T, T)).astype(np.int32), 1)

    def kern(aref, bref, out):
        av = aref[...]
        bv = bref[...]
        mn = jnp.minimum(av, _rev(bv))
        out[...] = _bitonic_merge_asc(mn)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N // LANES, LANES), jnp.int32),
        grid=(N // T,),
        in_specs=[pl.BlockSpec((TR, LANES), lambda i: (i, 0)),
                  pl.BlockSpec((TR, LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((TR, LANES), lambda i: (i, 0)),
    )(jnp.asarray(a).reshape(-1, LANES), jnp.asarray(b).reshape(-1, LANES))
    got = np.asarray(out).reshape(-1, T)
    exp = np.sort(np.concatenate([a, b], 1), 1)[:, :T]
    assert (got == exp).all(), "merge values wrong"
    print("merge OK")


dict(dma=v_dma, roll=v_roll, smem=v_smem, align=v_align,
     merge=v_merge)[args.v]()
