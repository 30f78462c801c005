"""Hybrid bitonic sort for TPU — RETIRED NEGATIVE RESULT (round 3).

Kept as a bench-only reproducer (driven by bench_sort_pallas.py), NOT a
package module: measured on v5e it LOSES to flat ``lax.sort`` at every
size once both are timed with properly long dependent chains —
0.28 vs 0.21 ms at 512k, 0.59 vs 0.45 at 1M, 3.6 vs 2.2 at 4M,
32.6 vs 18.2 at 16M.  The earlier "lax.sort is slow" rows (221 Mkeys at
1M, 427 at 16M) were dispatch/chain-noise artifacts; re-measured,
XLA's sort runs 2.3 Gkeys/s at 1M and 0.92 at 16M.  See
docs/design.md "Pallas sort settled".

Original design notes follow.

Hybrid bitonic: batched ``lax.sort`` runs + XLA
cross-chunk passes + one Pallas in-chunk stage kernel.

Reference lineage: ``zs::sort / radix_sort`` delegate to CUB on CUDA
(cuda/execution/ExecutionPolicy.cuh:560-870).  TPU has no scatter
primitive, so a radix sort's permutation pass has no fast form; all the
fast movement primitives are strided slices, rolls and compare-selects —
i.e. comparator networks.  Design facts measured on v5e
(benchmarks/probe_sort2.py + probe_mosaic_bisect.py):

* ``lax.sort`` is strongly shape-dependent: flat 16M i32 runs at
  925 Mkeys/s, flat 1M at only 221 Mkeys/s, but batched ``[2048, 8192]``
  at 3.1 Gkeys/s.  Short independent sorts are where XLA is good.
* A Pallas compare-exchange substage over a VMEM-resident chunk costs
  ~30 us per 16M elements; an XLA cross-chunk compare-exchange pass
  streams at HBM speed.
* Ranged manual DMAs at dynamic offsets crash the TPU worker
  (probe_mosaic_bisect: the `dma` variant; same failure as the round-3
  banded-join kernel), which rules out merge-path cursor kernels.
  Dynamic-shift rolls, SMEM carries and reductions all work.

Structure (classic bitonic, run-granular):

1. pad to a power of two (+INF), sort runs of ``RUN = 8192`` with ONE
   batched ``lax.sort``, reverse odd runs (bitonic direction),
2. for each stage ``k = 2*RUN .. n``: substages with stride >= CHUNK are
   XLA reshape+min/max passes (pure elementwise, fused); substages with
   stride < CHUNK are ONE Pallas pass per stage — the kernel unrolls
   all log2(CHUNK) strides, masks substages with ``j >= k`` (no-ops),
   and takes the direction bit from the stage value ``k`` carried as a
   scalar-prefetch argument, so every stage and every level reuses the
   SAME compiled kernel.

Won zone (measured, BENCHMARKS.md): ~5x at 1M (the size class of the
framework's own sorts: bin rebuilds, BVH morton orders), ~1.1x at 16M
(the flat shape is where lax.sort is already near its best).  The
public entry :func:`zpc_tpu.parallel.primitives.sort` routes here on
TPU within the winning size band.

Contract: unstable ascending sort of int32/uint32/float32 (no NaNs).
Stability is layered by callers that pack ranks into the key.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sort_pallas", "sort_pallas_wins"]

LANES = 128
RUN = 8192          # initial run length: lax.sort's fast batched shape
ROWS = 1024         # Pallas chunk = ROWS*LANES = 131072 elements


def _pad_value(dtype):
    """Python scalar +INF for the dtype (Mosaic kernels cannot capture
    array constants)."""
    if jnp.issubdtype(jnp.dtype(dtype), jnp.floating):
        return float(np.inf)
    return int(np.iinfo(np.dtype(dtype)).max)


def _hi_mask(j, shape):
    """True where the flat row-major index has bit j set."""
    if j < LANES:
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        return (lane & j) != 0
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return (row & (j // LANES)) != 0


def _partner(x, j, hi):
    """x at flat-index XOR j (j a power of two < chunk size)."""
    if j < LANES:
        return jnp.where(hi, pltpu.roll(x, j, 1),
                         pltpu.roll(x, LANES - j, 1))
    jr = j // LANES
    return jnp.where(hi, pltpu.roll(x, jr, 0),
                     pltpu.roll(x, x.shape[0] - jr, 0))


def _stage_kernel(k_ref, x_ref, o_ref, *, rows):
    """All substages of bitonic stage k with stride < rows*128.

    Substages with j >= k are masked to no-ops, and the direction comes
    from the stage value, so one compiled kernel serves every stage.
    """
    k = k_ref[0]
    chunk = rows * LANES
    base = pl.program_id(0) * chunk
    x = x_ref[...]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    flat = base + row * LANES + lane
    up = (flat & k) == 0
    j = chunk // 2
    while j >= 1:
        hi = _hi_mask(j, x.shape)
        px = _partner(x, j, hi)
        take_min = jnp.logical_xor(up, hi)
        nx = jnp.where((x <= px) == take_min, x, px)
        x = jnp.where(j < k, nx, x)
        j //= 2
    o_ref[...] = x


def _local_stage(x, k, rows, interpret):
    n = x.shape[0]
    xr = x.reshape(n // LANES, LANES)
    out = pl.pallas_call(
        functools.partial(_stage_kernel, rows=rows),
        out_shape=jax.ShapeDtypeStruct(xr.shape, x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // (rows * LANES),),
            in_specs=[pl.BlockSpec((rows, LANES), lambda i, s: (i, 0))],
            out_specs=pl.BlockSpec((rows, LANES), lambda i, s: (i, 0)),
        ),
        interpret=interpret,
    )(jnp.asarray([k], jnp.int32), xr)
    return out.reshape(-1)


def _cross_substage(x, j, k):
    """One bitonic substage at stride j >= chunk: pure XLA elementwise."""
    n = x.shape[0]
    y = x.reshape(n // (2 * j), 2, j)
    a, b = y[:, 0], y[:, 1]
    idx = jnp.arange(n // (2 * j), dtype=jnp.int32) * (2 * j)
    up = ((idx & k) == 0)[:, None]
    mn = jnp.minimum(a, b)
    mx = jnp.maximum(a, b)
    return jnp.stack([jnp.where(up, mn, mx),
                      jnp.where(up, mx, mn)], axis=1).reshape(n)


def sort_pallas_wins(n: int, dtype) -> bool:
    """Size/dtype band where the hybrid beats flat ``lax.sort``
    (measured: benchmarks/bench_sort_pallas.py)."""
    if dtype not in (jnp.int32, jnp.uint32, jnp.float32):
        return False
    npad = 1 << int(np.ceil(np.log2(max(n, 2))))
    # below ~RUN lax.sort is fine; above ~4M the flat shape catches up;
    # heavy pow2 padding (> 1.75x) erases the margin
    return RUN < n and npad <= (1 << 22) and npad <= int(1.75 * n)


@functools.partial(jax.jit, static_argnames=("run", "rows", "interpret"))
def sort_pallas(keys, run: int = RUN, rows: int = ROWS,
                interpret: bool = False):
    """Unstable ascending sort (int32/uint32/float32, no NaNs)."""
    n0 = keys.shape[0]
    if n0 <= 2 * run:
        return jax.lax.sort(keys, is_stable=False)
    n = 1 << int(np.ceil(np.log2(n0)))
    pad = _pad_value(keys.dtype)
    x = jnp.concatenate([keys, jnp.full((n - n0,), pad, keys.dtype)]) \
        if n > n0 else keys
    chunk = min(rows * LANES, n)
    rows_eff = chunk // LANES

    # initial runs: one batched lax.sort, odd runs reversed (bitonic)
    y = jax.lax.sort(x.reshape(n // run, run), is_stable=False,
                     dimension=1)
    y = jnp.where((jnp.arange(n // run, dtype=jnp.int32) % 2 == 0)[:, None],
                  y, y[:, ::-1])
    x = y.reshape(-1)

    # stage k = n is the final ascending merge: flat < n = k, so
    # (flat & k) == 0 holds everywhere — no special casing needed
    k = 2 * run
    while k <= n:
        j = k // 2
        while j >= chunk:
            x = _cross_substage(x, j, k)
            j //= 2
        x = _local_stage(x, k, rows_eff, interpret)
        k *= 2
    return x[:n0]
