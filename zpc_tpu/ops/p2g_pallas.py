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
  cube + the 7 negative-neighbor cubes (indices scalar-prefetched) and adds
  the overlapping slabs in VMEM;
* `g2p_bins` DMAs the 8 relevant block velocity rows, assembles the 6^3
  halo'd cube in VMEM, and contracts back to per-particle velocity/affine
  updates.

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


def _stencil_weights(xloc):
    """Quadratic B-spline weights per axis for local positions (cell units
    relative to block origin).  Returns (off [K,3] int32 base offset in
    [0,4), w [K,3,3])."""
    base = jnp.floor(xloc - 0.5).astype(jnp.int32)
    fx = xloc - base.astype(xloc.dtype)
    w0 = 0.5 * (1.5 - fx) ** 2
    w1 = 0.75 - (fx - 1.0) ** 2
    w2 = 0.5 * (fx - 0.5) ** 2
    return base, jnp.stack([w0, w1, w2], axis=-1)


def _axis_stencil(off_d, w_d, dtype):
    """[K, 6] per-axis halo-cube weights from offsets/3-tap weights."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (K, SIDE), 1)
    w_axis = jnp.zeros((K, SIDE), dtype)
    for j in range(3):
        hit = lane == (off_d + j)[:, None]
        w_axis = w_axis + jnp.where(hit, w_d[:, j:j + 1], 0.0)
    return w_axis


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
    A = data[:, 6:15].reshape(K, 3, 3)
    m = jnp.where(ok, data[:, 15], 0.0)

    ox = origins_ref[b, 0]
    oy = origins_ref[b, 1]
    oz = origins_ref[b, 2]
    origin = jnp.stack([ox, oy, oz]).astype(x.dtype)    # block cell coords
    xloc = x / dx - origin[None, :] * 4.0               # local cell units
    base, w = _stencil_weights(xloc)
    off = jnp.clip(base, 0, 3)

    wx = _axis_stencil(off[:, 0], w[:, 0], x.dtype)
    wy = _axis_stencil(off[:, 1], w[:, 1], x.dtype)
    wz = _axis_stencil(off[:, 2], w[:, 2], x.dtype)
    okf = ok.astype(x.dtype)[:, None]
    wx = wx * okf                                       # dead lanes off
    idxf = jax.lax.broadcasted_iota(jnp.int32, (K, SIDE), 1).astype(x.dtype)
    wx_i = wx * idxf
    wy_i = wy * idxf
    wz_i = wz * idxf

    # rel0 = origin*4*dx - x ; u0 = m v + A rel0
    rel0 = origin[None, :] * (4.0 * dx) - x
    u0 = m[:, None] * v + jnp.einsum(
        "kij,kj->ki", A, rel0, preferred_element_type=jnp.float32)
    Q0 = jnp.concatenate([m[:, None], u0], axis=1)      # [K, 4]
    QA = [jnp.concatenate([jnp.zeros((K, 1), x.dtype), dx * A[:, :, d]],
                          axis=1) for d in range(3)]

    S0 = (wy[:, :, None] * wz[:, None, :]).reshape(K, 36)
    S1 = (wy_i[:, :, None] * wz[:, None, :]).reshape(K, 36)
    S2 = (wy[:, :, None] * wz_i[:, None, :]).reshape(K, 36)

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
    ``dt``/``dx`` may be traced (ride the scalar-prefetch channel).
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

_DIRS = [d for d in
         [(i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)]
         if any(d)]


def _halo_kernel(nbr_ref,                 # scalar prefetch [nb, 7]
                 cubes_ref,               # HBM [nb, CUBE, C4]
                 out_ref,                 # VMEM [1, 64, C4]
                 own, nbrs, sem):
    b = pl.program_id(0)
    cp = pltpu.make_async_copy(cubes_ref.at[b], own, sem)
    cp.start()
    cp.wait()
    acc = own[...].reshape(SIDE, SIDE, SIDE, C4)[:4, :4, :4, :]
    for d_i, d in enumerate(_DIRS):
        nb_idx = nbr_ref[b, d_i]
        valid = nb_idx >= 0
        safe = jnp.maximum(nb_idx, 0)
        cp = pltpu.make_async_copy(cubes_ref.at[safe], nbrs, sem)
        cp.start()
        cp.wait()
        cube = nbrs[...].reshape(SIDE, SIDE, SIDE, C4)
        sl = tuple(slice(4, 6) if dd else slice(0, 4) for dd in d)
        contrib = cube[sl]
        pad = [(0, 4 - (6 - 4)) if dd else (0, 0) for dd in d] + [(0, 0)]
        contrib = jnp.pad(contrib, pad)
        acc = acc + jnp.where(valid, contrib, 0.0)
    out_ref[0] = acc.reshape(64, C4)


def halo_merge(block_cubes: jax.Array, nbr_idx: jax.Array,
               interpret: bool = False) -> jax.Array:
    """Merge 6^3 halo cubes into 4^3 block node values ``[nb, 64, C4]``.

    ``nbr_idx[b, i]`` = slot of the block at ``coord(b) - DIRS[i]`` (the
    spiller), -1 when absent.
    """
    nb = block_cubes.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
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
    )(nbr_idx, block_cubes)


# ---------------------------------------------------------------------------
# G2P
# ---------------------------------------------------------------------------

def _g2p_kernel(starts_ref, counts_ref, origins_ref, nbr8_ref,
                params_ref,               # scalar prefetch
                sorted_ref,               # HBM [N, W]: x(3) | ... | F(9)
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
    # assemble halo'd V [6,6,6,3] from 8 block rows
    V = jnp.zeros((SIDE, SIDE, SIDE, 3), jnp.float32)
    for i, d in enumerate([(0, 0, 0)] + _DIRS):
        nb_idx = nbr8_ref[b, i]
        valid = nb_idx >= 0
        safe = jnp.maximum(nb_idx, 0)
        cp = pltpu.make_async_copy(gv_ref.at[safe], vscratch, sem)
        cp.start()
        cp.wait()
        blockv = vscratch[...].reshape(4, 4, 4, 3)
        take = tuple(slice(0, SIDE - 4) if dd else slice(0, 4) for dd in d)
        slab = blockv[take]
        pads = [(4, 0) if dd else (0, SIDE - 4) for dd in d] + [(0, 0)]
        placed = jnp.pad(slab, pads)
        V = V + jnp.where(valid, placed, 0.0)

    data = pscratch[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)[:, 0]
    ok = lane < count
    x = data[:, 0:3]
    F = data[:, 16:25].reshape(K, 3, 3)

    ox = origins_ref[b, 0]
    oy = origins_ref[b, 1]
    oz = origins_ref[b, 2]
    origin = jnp.stack([ox, oy, oz]).astype(x.dtype)
    xloc = x / dx - origin[None, :] * 4.0
    base, w = _stencil_weights(xloc)
    off = jnp.clip(base, 0, 3)
    wx = _axis_stencil(off[:, 0], w[:, 0], x.dtype)
    wy = _axis_stencil(off[:, 1], w[:, 1], x.dtype)
    wz = _axis_stencil(off[:, 2], w[:, 2], x.dtype)
    idxf = jax.lax.broadcasted_iota(jnp.int32, (K, SIDE), 1).astype(x.dtype)
    wx_i = wx * idxf
    wy_i = wy * idxf
    wz_i = wz * idxf
    S0 = (wy[:, :, None] * wz[:, None, :]).reshape(K, 36)
    S1 = (wy_i[:, :, None] * wz[:, None, :]).reshape(K, 36)
    S2 = (wy[:, :, None] * wz_i[:, None, :]).reshape(K, 36)
    Vr = V.reshape(SIDE, 36, 3)

    vsum = jnp.zeros((K, 3), jnp.float32)
    bx = jnp.zeros((K, 3), jnp.float32)
    by = jnp.zeros((K, 3), jnp.float32)
    bz = jnp.zeros((K, 3), jnp.float32)
    for a in range(SIDE):
        Va = Vr[a]
        m0 = jnp.dot(S0, Va, preferred_element_type=jnp.float32)
        m1 = jnp.dot(S1, Va, preferred_element_type=jnp.float32)
        m2 = jnp.dot(S2, Va, preferred_element_type=jnp.float32)
        wa = wx[:, a:a + 1]
        wai = wx_i[:, a:a + 1]
        vsum = vsum + wa * m0
        bx = bx + wai * m0
        by = by + wa * m1
        bz = bz + wa * m2

    rel0 = origin[None, :] * (4.0 * dx) - x
    Dinv = 4.0 / (dx * dx)
    B = vsum[:, :, None] * rel0[:, None, :] + \
        dx * jnp.stack([bx, by, bz], axis=-1)
    C_new = Dinv * B
    # F_new = (I + dt C) F, unrolled 3x3
    G = dt * C_new
    G = G + jnp.eye(3, dtype=G.dtype)[None]
    rows = []
    for i in range(3):
        rows.append(jnp.stack(
            [G[:, i, 0] * F[:, 0, j] + G[:, i, 1] * F[:, 1, j] +
             G[:, i, 2] * F[:, 2, j] for j in range(3)], axis=-1))
    F_new = jnp.stack(rows, axis=-2)
    x_new = x + dt * vsum
    okf = ok.astype(x.dtype)[:, None]
    out = jnp.concatenate([
        x_new * okf, vsum * okf, F_new.reshape(K, 9) * okf,
        C_new.reshape(K, 9) * okf], axis=1)
    out_ref[0] = out


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
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nbins,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
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
    )(starts, counts, origins, nbr8, params, sorted_packed, gv)
