"""Pallas TPU kernel for 1-D prefix sums (cub::DeviceScan analog).

Why: XLA's ``associative_scan`` on TPU materializes the log-depth
up/down-sweep tree through HBM — measured 26 GB/s effective at 16M f32 on
v5e, ~30x below memory speed-of-light.  A scan is one read + one write of
the array; the TPU Pallas grid executes **sequentially** on a core, so a
single-pass chunked scan with a carry in VMEM scratch needs no decoupled
lookback (the GPU trick cub uses — cuda/execution/ExecutionPolicy.cuh:
560-650 reference lineage): each grid step scans its chunk in-register and
adds the running carry.

Within a chunk ``[R, 128]`` (row-major flat order) the scan is:

* 7 roll-and-masked-add steps along lanes (Hillis-Steele in-register),
* a row-totals column scanned down sublanes the same way (log2(R) steps),
* carry add + carry update (one scalar, VMEM scratch persists across the
  sequential grid).

All steps are full-width VPU ops: no gathers, no scatters, no HBM
round-trips beyond the streaming block pipeline.

Reference: ``zs::inclusive_scan/exclusive_scan`` (ExecutionPolicy.hpp:
247-266); this kernel backs the TPU fast path in
:mod:`zpc_tpu.parallel.primitives`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["scan_pallas", "scan_supported"]

LANES = 128
ROWS = 1024           # chunk = ROWS*LANES = 131072 elements (512 KB f32)
CHUNK = ROWS * LANES


_OPS = {
    "add": jnp.add,
    "max": jnp.maximum,
    "min": jnp.minimum,
}


def _identity(op: str, dtype):
    """Monoid identity as a PYTHON scalar (no captured array constants)."""
    if op == "add":
        return 0
    flt = jnp.issubdtype(jnp.dtype(dtype), jnp.floating)
    info = jnp.finfo(jnp.dtype(dtype)) if flt else jnp.iinfo(jnp.dtype(dtype))
    v = info.min if op == "max" else info.max
    return float(v) if flt else int(v)


def _lane_scan(x, op: str):
    """Inclusive Hillis-Steele scan along the lane (minor) axis."""
    f = _OPS[op]
    ident = _identity(op, x.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    for sh in (1, 2, 4, 8, 16, 32, 64):
        shifted = pltpu.roll(x, shift=sh, axis=x.ndim - 1)
        x = f(x, jnp.where(lane >= sh, shifted,
                           jnp.full_like(x, ident)))
    return x


def _row_scan(col, op: str):
    """Inclusive scan down the sublane axis of a ``[R, 1]`` column."""
    f = _OPS[op]
    ident = _identity(op, col.dtype)
    row = jax.lax.broadcasted_iota(jnp.int32, col.shape, 0)
    sh = 1
    while sh < col.shape[0]:
        shifted = pltpu.roll(col, shift=sh, axis=0)
        col = f(col, jnp.where(row >= sh, shifted,
                               jnp.full_like(col, ident)))
        sh *= 2
    return col


def _scan_kernel(x_ref, o_ref, carry_ref, *, exclusive: bool, op: str):
    # the carry lives as a [1, 1] VMEM vector: Mosaic forbids scalar
    # stores to VMEM, and a [1,1] broadcasts cleanly over the block
    i = pl.program_id(0)
    f = _OPS[op]
    ident = _identity(op, x_ref.dtype)

    @pl.when(i == 0)
    def _():
        carry_ref[...] = jnp.full((1, 1), ident, x_ref.dtype)

    x = x_ref[...]
    lanes_inc = _lane_scan(x, op)                   # [R, 128] per-row inclusive
    totals = lanes_inc[:, LANES - 1:LANES]          # [R, 1] row totals
    rows_inc = _row_scan(totals, op)                # [R, 1]
    if op == "add":
        row_off = rows_inc - totals                 # exclusive row offsets
    else:
        # idempotent ops: exclusive row offsets by a one-row shift
        rowi = jax.lax.broadcasted_iota(jnp.int32, rows_inc.shape, 0)
        row_off = jnp.where(rowi == 0, jnp.full_like(rows_inc, ident),
                            pltpu.roll(rows_inc, 1, 0))
    carry = carry_ref[...]                          # [1, 1]
    if exclusive:
        body = lanes_inc - x                        # exact for ints; fp ok
    else:
        body = lanes_inc
    o_ref[...] = f(f(body, row_off), carry)
    carry_ref[...] = f(carry, rows_inc[ROWS - 1:ROWS, :])


def scan_supported(x, op: str = "add") -> bool:
    return (x.ndim == 1 and x.dtype in (jnp.float32, jnp.int32, jnp.uint32)
            and x.shape[0] >= CHUNK and op in _OPS)


@functools.partial(jax.jit, static_argnames=("exclusive", "interpret", "op"))
def scan_pallas(x, exclusive: bool = False, interpret: bool = False,
                op: str = "add"):
    """Inclusive prefix scan of a 1-D array for op in add/max/min
    (exclusive additionally supported for add, zero-init)."""
    assert op in _OPS and not (exclusive and op != "add")
    n = x.shape[0]
    npad = -n % CHUNK
    ident = _identity(op, x.dtype)
    xp = jnp.concatenate([x, jnp.full((npad,), ident, x.dtype)]) \
        if npad else x
    grid = xp.shape[0] // CHUNK
    xp = xp.reshape(grid * ROWS, LANES)
    out = pl.pallas_call(
        functools.partial(_scan_kernel, exclusive=exclusive, op=op),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        grid=(grid,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, 1), x.dtype)],
        interpret=interpret,
    )(xp)
    return out.reshape(-1)[:n]
