"""``AdaptiveGrid`` — multi-level VDB-like sparse tree, TPU-native.

Reference: ``geometry/AdaptiveGrid.hpp:9-19`` — per-level ``bht`` +
``TileVector`` node pools with OpenVDB's 5-4-3-style branching
(``TileBits``), child masks, hierarchical ``probeValue`` descending levels
(:1035-1090), and a caching accessor (:1090-1130); conversion to/from
OpenVDB (AdaptiveGrid_Conversion.cpp).

TPU re-design: static level count, each level a sorted-key
:class:`BlockTable` + dense node payload ``[cap_l, bs_l^d]`` + boolean child
mask.  ``probe`` descends all levels **unrolled and branch-free**: every
level's lookup runs for every query lane, ``where`` selects the value from
the finest level whose child-mask says "leaf here" — no data-dependent
control flow, so 1M probes are a handful of fused gathers.  The reference's
per-thread node-caching accessor is unnecessary: XLA already amortizes the
table lookups across the vectorized batch.

Level convention: level 0 = finest (leaf), level L-1 = coarsest.  Block size
``bs[l]`` cells per axis, each cell of level l spans ``span[l] =
prod(bs[:l])`` leaf cells.  A level-l cell is *interior* (has children) if
the child mask is set; otherwise its payload value covers the whole span
(constant tile, VDB semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..containers.block_table import BlockTable, build_block_table
from ..math.transform import Transform, scaling, translation

__all__ = ["AdaptiveGrid", "adaptive_grid_from_leaves"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AdaptiveLevel:
    table: BlockTable
    value: jax.Array        # [cap, bs^d] payload
    child: jax.Array        # [cap, bs^d] bool — cell refined at finer level?

    @property
    def capacity(self) -> int:
        return self.value.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AdaptiveGrid:
    levels: Tuple[AdaptiveLevel, ...]       # finest .. coarsest
    transform: Transform                    # leaf-cell index -> world
    block_sizes: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True), default=(8, 4, 4))
    dim: int = dataclasses.field(metadata=dict(static=True), default=3)
    background: float = dataclasses.field(metadata=dict(static=True),
                                          default=0.0)

    # span of one cell of level l, in leaf cells
    def cell_span(self, l: int) -> int:
        s = 1
        for b in self.block_sizes[:l]:
            s *= b
        return s

    def _level_lookup(self, l: int, leaf_cell: jax.Array):
        """(found, value, is_leaf_here) for level-l lookup of leaf cells."""
        lev = self.levels[l]
        bs = self.block_sizes[l]
        span = self.cell_span(l)
        cell_l = jnp.floor_divide(leaf_cell, span)       # level-l cell coord
        block_l = jnp.floor_divide(cell_l, bs)
        local = cell_l - block_l * bs
        lin = jnp.zeros(local.shape[:-1], jnp.int32)
        for d in range(self.dim):
            lin = lin * bs + local[..., d]
        slot = lev.table.query(block_l)
        ok = slot >= 0
        safe = jnp.maximum(slot, 0)
        flat = lev.value.reshape(-1)
        cmask = lev.child.reshape(-1)
        idx = safe * (bs ** self.dim) + lin
        val = flat[idx]
        has_child = cmask[idx] & ok
        return ok, val, has_child

    def probe(self, x_world: jax.Array) -> jax.Array:
        """Hierarchical value lookup (probeValue, AdaptiveGrid.hpp:1035-1090):
        the value of the finest node covering each query point; background
        where nothing covers it.  Branch-free over the whole batch."""
        xi = self.transform.inverse().apply(x_world)
        leaf_cell = jnp.floor(xi).astype(jnp.int32)
        out = jnp.full(x_world.shape[:-1], self.background,
                       self.levels[0].value.dtype)
        covered = jnp.zeros(x_world.shape[:-1], bool)
        # descend coarse -> fine: finer levels overwrite where they exist
        for l in reversed(range(len(self.levels))):
            ok, val, has_child = self._level_lookup(l, leaf_cell)
            # a level-l value applies where the node exists and is not
            # refined further (or it IS the finest level)
            applies = ok & (~has_child if l > 0 else jnp.ones_like(ok))
            out = jnp.where(applies, val, out)
            covered = covered | ok
        return out

    def sample(self, x_world: jax.Array) -> jax.Array:
        """Trilinear sampling of the hierarchical field via 2^d probes
        (iSample-with-accessor analog)."""
        xi = self.transform.inverse().apply(x_world) - 0.5
        base = jnp.floor(xi)
        frac = xi - base
        out = None
        from .sparse_grid import neighbor_offsets

        dxw = self.transform.matrix[0, 0]
        for c in neighbor_offsets(self.dim, 0, 1):
            corner_ix = base + jnp.asarray(c, xi.dtype) + 0.5
            p = self.transform.apply(corner_ix)
            w = jnp.ones(xi.shape[:-1], xi.dtype)
            for d in range(self.dim):
                w = w * (frac[..., d] if c[d] else 1.0 - frac[..., d])
            v = self.probe(p)
            out = w * v if out is None else out + w * v
        return out


def adaptive_grid_from_leaves(leaf_cells: jax.Array, leaf_values: jax.Array,
                              *, dx: float,
                              block_sizes: Sequence[int] = (8, 4, 4),
                              capacities: Optional[Sequence[int]] = None,
                              background: float = 0.0,
                              coarse_values: Optional[Sequence] = None,
                              origin=None) -> AdaptiveGrid:
    """Build from active leaf cells (coords [n, d] + values [n]).

    Coarser levels get child masks where finer blocks exist; their values
    default to ``background`` (or per-level constants via
    ``coarse_values``) — matching VDB's interior-tile semantics.
    """
    dim = leaf_cells.shape[-1]
    nlev = len(block_sizes)
    capacities = capacities or [max(64, leaf_cells.shape[0]), 512, 64]
    levels = []
    span = 1
    cur_cells = leaf_cells
    for l, bs in enumerate(block_sizes):
        cap = capacities[l]
        cell_l = jnp.floor_divide(leaf_cells, span)
        block_l = jnp.floor_divide(cell_l, bs)
        table, inv = build_block_table(block_l, cap, dim=dim)
        value = jnp.full((cap, bs ** dim), background,
                         leaf_values.dtype)
        child = jnp.zeros((cap, bs ** dim), bool)
        local = cell_l - jnp.floor_divide(cell_l, bs) * bs
        lin = jnp.zeros(local.shape[:-1], jnp.int32)
        for d in range(dim):
            lin = lin * bs + local[..., d]
        flat_idx = jnp.where(inv >= 0, inv * (bs ** dim) + lin,
                             cap * (bs ** dim))
        if l == 0:
            buf = jnp.full((cap * (bs ** dim) + 1,), background,
                           leaf_values.dtype)
            value = buf.at[flat_idx].set(leaf_values)[:-1].reshape(
                cap, bs ** dim)
        else:
            cbuf = jnp.zeros((cap * (bs ** dim) + 1,), bool)
            child = cbuf.at[flat_idx].set(True)[:-1].reshape(cap, bs ** dim)
            if coarse_values is not None and coarse_values[l] is not None:
                value = jnp.full_like(value, coarse_values[l])
        levels.append(AdaptiveLevel(table, value, child))
        span *= bs
    tr = scaling(dx)
    if origin is not None:
        tr = translation(origin).compose(tr)
    return AdaptiveGrid(tuple(levels), tr, tuple(block_sizes), dim,
                        background)
