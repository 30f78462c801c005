"""Pallas TPU kernel for the fused Karras NSE sweep (round 5).

Nearest-smaller-element by VALUE over a 64-value alphabet: for each
position ``i`` of ``d`` (values in [1, 63]), the nearest ``j < i`` with
``d[j] <= d[i]`` (non-strict) or ``d[j] < d[i]`` (strict), returned as
packed ``(j << 6) | d[j]`` (negative sentinel when none).  This is the
whole Karras-topology sweep in ONE streaming pass per direction.

Why Pallas: the 126-scan loop pays 126 HBM passes (29.3 ms at 1M even
on the Pallas chunked-carry scan); the fused XLA ``lax.scan`` form
(:func:`zpc_tpu.containers.bvh._nse_dir_chunked`) keeps the [64, C]
state logically chunked but XLA's axis-wise ``cummax`` inside the scan
body is log-depth multi-pass and measured SLOWER than the loop
(benchmarks/probe_karras.py round 5).  Here the [64, 128] per-subrow
state never leaves VMEM: masked packed positions, a 7-step lane scan,
a 6-step value-prefix scan down sublanes, one select row, and a
[64, 1] carry in VMEM scratch across the sequential grid — the same
chunked-carry structure as :mod:`zpc_tpu.ops.scan_pallas`.

Reference lineage: ``container/Bvh.hpp:176-338`` (per-thread binary
searches); the NSE formulation is the TPU-first replacement
(docs/design.md rounds 3-5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nse_pallas", "nse_supported"]

LANES = 128
ROWS = 32             # block = 4096 elements (d block: 16 KB int32)
CHUNK = ROWS * LANES
VALS = 64
NONE = -(1 << 30)


def _nse_kernel(d_ref, o_ref, carry_ref, *, strict: bool, g: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[...] = jnp.full((VALS, 1), NONE, jnp.int32)

    viota = jax.lax.broadcasted_iota(jnp.int32, (VALS, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (VALS, LANES), 1)
    base = i * CHUNK
    for k in range(ROWS):
        dk = d_ref[k:k + 1, :]                      # [1, LANES]
        pos = base + k * LANES + lane               # [VALS, LANES]
        mask = (viota == dk) & (pos < g)
        packed = jnp.where(mask, (pos << 6) | dk,
                           jnp.full_like(pos, NONE))
        # inclusive lane scan (max by position), then exclusive shift
        x = packed
        for sh in (1, 2, 4, 8, 16, 32, 64):
            sht = pltpu.roll(x, shift=sh, axis=1)
            x = jnp.maximum(x, jnp.where(lane >= sh, sht,
                                         jnp.full_like(x, NONE)))
        x_excl = jnp.where(lane >= 1, pltpu.roll(x, 1, 1),
                           jnp.full_like(x, NONE))
        full = jnp.maximum(x_excl, carry_ref[...])  # [VALS,1] broadcasts
        # prefix over the VALUE axis (sublanes): f[w] = max_{v<=w} full[v]
        f = full
        sh = 1
        while sh < VALS:
            sht = pltpu.roll(f, shift=sh, axis=0)
            f = jnp.maximum(f, jnp.where(viota >= sh, sht,
                                         jnp.full_like(f, NONE)))
            sh *= 2
        w = dk - (1 if strict else 0)               # d >= 1 always
        sel = jnp.max(jnp.where(viota == w, f,
                                jnp.full_like(f, NONE)),
                      axis=0, keepdims=True)        # [1, LANES]
        o_ref[k:k + 1, :] = sel
        carry_ref[...] = jnp.maximum(carry_ref[...],
                                     x[:, LANES - 1:LANES])


def nse_supported(d) -> bool:
    return (d.ndim == 1 and d.dtype == jnp.int32
            and CHUNK <= d.shape[0] < (1 << 24))


@functools.partial(jax.jit,
                   static_argnames=("strict", "interpret"))
def nse_pallas(d, strict: bool = False, interpret: bool = False):
    """Packed nearest-smaller-element of a 1-D int32 array with values
    in [1, 63]; see module docstring."""
    g = d.shape[0]
    npad = -g % CHUNK
    dp = jnp.concatenate([d, jnp.zeros((npad,), d.dtype)]) if npad else d
    grid = dp.shape[0] // CHUNK
    dp = dp.reshape(grid * ROWS, LANES)
    out = pl.pallas_call(
        functools.partial(_nse_kernel, strict=strict, g=g),
        out_shape=jax.ShapeDtypeStruct(dp.shape, jnp.int32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((VALS, 1), jnp.int32)],
        interpret=interpret,
    )(dp)
    return out.reshape(-1)[:g]
