"""Pallas TPU kernels for the MPM transfer pipeline.

Why these exist: XLA row-gathers measured ~6 GB/s effective on v5e (100x
below HBM bandwidth), and the binned MPM step is gather-bound (bin pickup,
halo slab pickup, per-bin cube selection).  These kernels replace every
remaining gather with **explicit DMA of contiguous slices**:

* particles are permuted to block-sorted order once (one XLA gather);
  after that every bin's particles are a contiguous ``[start, start+K)``
  slice of HBM — `p2g_bins` DMAs the slice to VMEM, builds separable
  B-spline stencils, and contracts them on the MXU into the bin's 6^3
  halo-padded node cube;
* `halo_merge` assembles block node values: each block program DMAs its own
  cube + the 7 negative-neighbor cubes (indices scalar-prefetched) and
  combines the overlapping slabs with **static 0/1 selection matmuls**
  (Mosaic has no cheap >2-D vector shuffles; a [64,216] one-hot dot is
  exactly the slab permutation);
* `g2p_bins` DMAs the 8 relevant block velocity rows, assembles the 6^3
  halo'd cube with the transposed selection matrices, and contracts back to
  per-particle velocity/affine updates.

Mosaic constraints honored throughout: all vectors are rank<=2, small-matrix
state is carried in column form (no [K,3,3] shape casts), iota is 2-D.

Reference counterpart: the fused single-kernel transfers of the reference's
GPU lineage (simulation/transfer/P2G.hpp, G2P2G.hpp) — redesigned around
DMA + MXU instead of shared-memory atomics.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["p2g_bins", "halo_merge", "g2p_bins"]

K = 128          # bin size (particles)
SIDE = 6         # 4-cell block + 2 halo
CUBE = SIDE ** 3
C4 = 4           # mass + momentum

_DIRS = [d for d in
         [(i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)]
         if any(d)]


def _spill_matrix(d) -> np.ndarray:
    """[64, 216] one-hot: target block node <- spiller (-d neighbor) cube."""
    M = np.zeros((64, CUBE), np.float32)
    for i in range(4):
        for j in range(4):
            for k in range(4):
                si, sj, sk = i + 4 * d[0], j + 4 * d[1], k + 4 * d[2]
                if si < SIDE and sj < SIDE and sk < SIDE:
                    M[(i * 4 + j) * 4 + k, (si * SIDE + sj) * SIDE + sk] = 1.0
    return M


def _pull_matrix(d) -> np.ndarray:
    """[216, 64] one-hot: halo cube node <- +d neighbor block node."""
    P = np.zeros((CUBE, 64), np.float32)
    for a in range(SIDE):
        for b in range(SIDE):
            for c in range(SIDE):
                da, db, dc = a >= 4, b >= 4, c >= 4
                if (da, db, dc) != tuple(bool(x) for x in d):
                    continue
                i, j, k = a - 4 * da, b - 4 * db, c - 4 * dc
                P[(a * SIDE + b) * SIDE + c, (i * 4 + j) * 4 + k] = 1.0
    return P


_SPILL = [_spill_matrix(d) for d in _DIRS]
_PULL = [_pull_matrix(d) for d in [(0, 0, 0)] + _DIRS]


def _axis_weights(xloc_d):
    """Quadratic B-spline: base offset [K] int32 + 3 tap weights [K]."""
    base = jnp.floor(xloc_d - 0.5).astype(jnp.int32)
    fx = xloc_d - base.astype(xloc_d.dtype)
    w0 = 0.5 * (1.5 - fx) ** 2
    w1 = 0.75 - (fx - 1.0) ** 2
    w2 = 0.5 * (fx - 0.5) ** 2
    return base, (w0, w1, w2)


def _axis_stencil(off_d, taps, dtype):
    """[K, SIDE] halo-cube weights for one axis."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (K, SIDE), 1)
    w_axis = jnp.zeros((K, SIDE), dtype)
    for j in range(3):
        hit = lane == (off_d + j)[:, None]
        w_axis = w_axis + jnp.where(hit, taps[j][:, None], 0.0)
    return w_axis


def _outer36(wy, wz):
    """[K, 36] = per-particle outer product of two [K, 6] stencils
    (j-major), built without 3-D intermediates."""
    return jnp.concatenate([wy[:, j:j + 1] * wz for j in range(SIDE)],
                           axis=1)


def _full_stencils(x, orig, dx, ok):
    """Shared stencil construction: returns wx, wx_i, S0, S1, S2, rel0."""
    dtype = x.dtype
    offs = []
    tapss = []
    for d in range(3):
        xloc_d = x[:, d] / dx - orig[d] * 4.0
        base, taps = _axis_weights(xloc_d)
        offs.append(jnp.clip(base, 0, 3))
        tapss.append(taps)
    wx = _axis_stencil(offs[0], tapss[0], dtype)
    wy = _axis_stencil(offs[1], tapss[1], dtype)
    wz = _axis_stencil(offs[2], tapss[2], dtype)
    if ok is not None:
        wx = wx * ok.astype(dtype)[:, None]
    idxf = jax.lax.broadcasted_iota(jnp.int32, (K, SIDE), 1).astype(dtype)
    wx_i = wx * idxf
    S0 = _outer36(wy, wz)
    S1 = _outer36(wy * idxf, wz)
    S2 = _outer36(wy, wz * idxf)
    rel0 = [orig[d] * (4.0 * dx) - x[:, d] for d in range(3)]
    return wx, wx_i, S0, S1, S2, rel0


# ---------------------------------------------------------------------------
# P2G
# ---------------------------------------------------------------------------

def _p2g_kernel(starts_ref, counts_ref, origins_ref, params_ref,  # scalar
                sorted_ref,                             # HBM [N, W]
                out_ref,                                # VMEM [1, CUBE, C4]
                scratch, sem):
    b = pl.program_id(0)
    start = starts_ref[b]
    count = counts_ref[b]
    dx = params_ref[1]

    cp = pltpu.make_async_copy(
        sorted_ref.at[pl.ds(start, K), :], scratch, sem)
    cp.start()
    cp.wait()

    data = scratch[...]                                 # [K, W]
    lane = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)[:, 0]
    ok = lane < count
    x = data[:, 0:3]
    v = data[:, 3:6]
    Acol = [[data[:, 6 + 3 * i + j] for j in range(3)] for i in range(3)]
    m = jnp.where(ok, data[:, 15], 0.0)
    orig = [origins_ref[b, d].astype(x.dtype) for d in range(3)]

    wx, wx_i, S0, S1, S2, rel0 = _full_stencils(x, orig, dx, ok)

    u0 = [m * v[:, i] +
          Acol[i][0] * rel0[0] + Acol[i][1] * rel0[1] + Acol[i][2] * rel0[2]
          for i in range(3)]
    Q0 = jnp.stack([m, u0[0], u0[1], u0[2]], axis=1)    # [K, 4]
    zeros = jnp.zeros((K,), x.dtype)
    QA = [jnp.stack([zeros, dx * Acol[0][d], dx * Acol[1][d],
                     dx * Acol[2][d]], axis=1) for d in range(3)]

    for a in range(SIDE):
        qa = wx[:, a:a + 1] * Q0 + wx_i[:, a:a + 1] * QA[0]
        cube_a = jnp.dot(S0.T, qa, preferred_element_type=jnp.float32)
        cube_a += jnp.dot(S1.T, wx[:, a:a + 1] * QA[1],
                          preferred_element_type=jnp.float32)
        cube_a += jnp.dot(S2.T, wx[:, a:a + 1] * QA[2],
                          preferred_element_type=jnp.float32)
        out_ref[0, a * 36:(a + 1) * 36, :] = cube_a


def p2g_bins(sorted_packed: jax.Array, starts: jax.Array, counts: jax.Array,
             origins: jax.Array, dt, dx, *, nbins: int,
             interpret: bool = False) -> jax.Array:
    """Per-bin P2G cubes ``[nbins, 216, 4]`` from block-sorted particles.

    ``sorted_packed``: [N, W>=16] with cols x(3) | v(3) | A(9) | m(1),
    block-sorted, padded so every ``starts[i] + K`` stays in range.
    ``dt``/``dx`` may be traced (they ride the scalar-prefetch channel).
    """
    W = sorted_packed.shape[1]
    params = jnp.stack([jnp.asarray(dt, jnp.float32),
                        jnp.asarray(dx, jnp.float32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nbins,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, CUBE, C4), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K, W), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _p2g_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbins, CUBE, C4), jnp.float32),
        interpret=interpret,
    )(starts, counts, origins, params, sorted_packed)


# ---------------------------------------------------------------------------
# halo merge
# ---------------------------------------------------------------------------

def _halo_kernel(nbr_ref,                 # scalar prefetch [nb, 7]
                 sel_ref,                 # VMEM [8, 64, CUBE] selection mats
                 cubes_ref,               # HBM [nb, CUBE, C4]
                 out_ref,                 # VMEM [1, 64, C4]
                 own, nbrs, sem):
    b = pl.program_id(0)
    cp = pltpu.make_async_copy(cubes_ref.at[b], own, sem)
    cp.start()
    cp.wait()
    acc = jnp.dot(sel_ref[0], own[...], preferred_element_type=jnp.float32)
    for d_i in range(len(_DIRS)):
        nb_idx = nbr_ref[b, d_i]
        valid = (nb_idx >= 0).astype(jnp.float32)
        safe = jnp.maximum(nb_idx, 0)
        cp = pltpu.make_async_copy(cubes_ref.at[safe], nbrs, sem)
        cp.start()
        cp.wait()
        acc = acc + valid * jnp.dot(sel_ref[d_i + 1], nbrs[...],
                                    preferred_element_type=jnp.float32)
    out_ref[0] = acc


def halo_merge(block_cubes: jax.Array, nbr_idx: jax.Array,
               interpret: bool = False) -> jax.Array:
    """Merge 6^3 halo cubes into 4^3 block node values ``[nb, 64, C4]``.

    ``nbr_idx[b, i]`` = slot of the block at ``coord(b) - DIRS[i]`` (the
    spiller), -1 when absent.
    """
    nb = block_cubes.shape[0]
    sel = jnp.asarray(np.stack([_spill_matrix((0, 0, 0))] + _SPILL))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec((8, 64, CUBE), lambda b, *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 64, C4), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((CUBE, C4), jnp.float32),
                        pltpu.VMEM((CUBE, C4), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _halo_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 64, C4), jnp.float32),
        interpret=interpret,
    )(nbr_idx, sel, block_cubes)


# ---------------------------------------------------------------------------
# G2P
# ---------------------------------------------------------------------------

def _g2p_kernel(starts_ref, counts_ref, origins_ref, nbr8_ref,
                params_ref,               # scalar prefetch
                pull_ref,                 # VMEM [8, CUBE, 64] pull mats
                sorted_ref,               # HBM [N, W]: x(3)|...|F(9) @ 16
                gv_ref,                   # HBM [nb, 64, 3]
                out_ref,                  # VMEM [1, K, 24]
                pscratch, vscratch, sem):
    b = pl.program_id(0)
    start = starts_ref[b]
    count = counts_ref[b]
    dt = params_ref[0]
    dx = params_ref[1]
    cp = pltpu.make_async_copy(sorted_ref.at[pl.ds(start, K), :],
                               pscratch, sem)
    cp.start()
    cp.wait()
    # assemble halo'd node velocities Vflat [216, 3] via pull matmuls
    Vflat = jnp.zeros((CUBE, 3), jnp.float32)
    for i in range(8):
        nb_idx = nbr8_ref[b, i]
        valid = (nb_idx >= 0).astype(jnp.float32)
        safe = jnp.maximum(nb_idx, 0)
        cp = pltpu.make_async_copy(gv_ref.at[safe], vscratch, sem)
        cp.start()
        cp.wait()
        Vflat = Vflat + valid * jnp.dot(pull_ref[i], vscratch[...],
                                        preferred_element_type=jnp.float32)

    data = pscratch[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)[:, 0]
    ok = lane < count
    x = data[:, 0:3]
    Fcol = [[data[:, 16 + 3 * i + j] for j in range(3)] for i in range(3)]
    orig = [origins_ref[b, d].astype(x.dtype) for d in range(3)]

    wx, wx_i, S0, S1, S2, rel0 = _full_stencils(x, orig, dx, None)

    vsum = jnp.zeros((K, 3), jnp.float32)
    bx = jnp.zeros((K, 3), jnp.float32)
    by = jnp.zeros((K, 3), jnp.float32)
    bz = jnp.zeros((K, 3), jnp.float32)
    for a in range(SIDE):
        Va = Vflat[a * 36:(a + 1) * 36, :]
        m0 = jnp.dot(S0, Va, preferred_element_type=jnp.float32)
        m1 = jnp.dot(S1, Va, preferred_element_type=jnp.float32)
        m2 = jnp.dot(S2, Va, preferred_element_type=jnp.float32)
        wa = wx[:, a:a + 1]
        wai = wx_i[:, a:a + 1]
        vsum = vsum + wa * m0
        bx = bx + wai * m0
        by = by + wa * m1
        bz = bz + wa * m2

    Dinv = 4.0 / (dx * dx)
    bb = [bx, by, bz]   # bb[j][:, i] pairs with axis j
    # C_ij = Dinv * (vsum_i * rel0_j + dx * bb[j]_i)
    Ccol = [[Dinv * (vsum[:, i] * rel0[j] + dx * bb[j][:, i])
             for j in range(3)] for i in range(3)]
    # F_new = (I + dt C) F in column form
    Fn = [[sum((float(i == k) + dt * Ccol[i][k]) * Fcol[k][j]
               for k in range(3)) for j in range(3)] for i in range(3)]
    okf = ok.astype(x.dtype)
    cols = []
    for d in range(3):
        cols.append((x[:, d] + dt * vsum[:, d]) * okf)   # x_new
    for d in range(3):
        cols.append(vsum[:, d] * okf)                    # v_new
    for i in range(3):
        for j in range(3):
            cols.append(Fn[i][j] * okf)                  # F_new
    for i in range(3):
        for j in range(3):
            cols.append(Ccol[i][j] * okf)                # C_new
    out_ref[0] = jnp.stack(cols, axis=1)


def g2p_bins(sorted_packed: jax.Array, gv: jax.Array, starts: jax.Array,
             counts: jax.Array, origins: jax.Array, nbr8: jax.Array,
             dt, dx, *, nbins: int, interpret: bool = False) -> jax.Array:
    """Per-bin G2P: returns ``[nbins, K, 24]`` = x(3)|v(3)|F(9)|C(9).

    ``sorted_packed``: the same [N, W] pack as P2G (cols 0:3 = x,
    16:25 = F); ``gv``: [nb, 64, 3] grid velocities; ``nbr8[b]``: slots of
    block b's (0,0,0)+7 positive neighbors, -1 when absent.
    """
    W = sorted_packed.shape[1]
    params = jnp.stack([jnp.asarray(dt, jnp.float32),
                        jnp.asarray(dx, jnp.float32)])
    pull = jnp.asarray(np.stack(_PULL))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nbins,),
        in_specs=[pl.BlockSpec((8, CUBE, 64), lambda b, *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, K, 24), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K, W), jnp.float32),
                        pltpu.VMEM((64, 3), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _g2p_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbins, K, 24), jnp.float32),
        interpret=interpret,
    )(starts, counts, origins, nbr8, params, pull, sorted_packed, gv)
