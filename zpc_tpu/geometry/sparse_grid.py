"""``SparseGrid`` — VDB-style one-level sparse block grid, TPU-native.

Reference: ``geometry/SparseGrid.hpp:16-43`` — a ``bht`` table of block
origins + a ``TileVector`` of block payloads, a world<->index affine
``_transform`` (:66-183), ``valueOr`` queries (:340-363), trilinear /
staggered sampling (:418-498); also the legacy MPM ``Grids``
(geometry/Structure.hpp:34-155).

TPU re-design:

* block table  -> :class:`~zpc_tpu.containers.block_table.BlockTable`
  (sorted keys + searchsorted; built by sort-compaction, not atomic insert)
* payloads     -> dict of dense arrays ``[block_capacity, bs^d, *prop]`` —
  one contiguous buffer per named property; every grid op is a dense
  vectorized op over ``[cap, bs^d]``, padding blocks masked.
* ``_transform`` -> :class:`~zpc_tpu.math.transform.Transform` (index->world)
* activation   -> functional rebuild (sort/unique of block keys) +
  :func:`dilate` for stencil aprons — replaces on-demand hash insertion.

The cell->(block, offset) math uses floor-division so negative coordinates
work (the reference uses the same two-level decomposition, SparseGrid.hpp).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..containers.block_table import (BlockTable, WideBlockTable,
                                      build_block_table,
                                      build_wide_block_table, pack_coords)
from ..core.config import PropertyTag
from ..containers.structured import _as_tags, PropsSpec
from ..math.transform import Transform, translation, scaling

__all__ = ["SparseGrid", "sparse_grid", "neighbor_offsets",
           "sparse_grid_from_dense", "sparse_grid_to_dense"]


def neighbor_offsets(dim: int, lo: int = -1, hi: int = 1) -> np.ndarray:
    """All integer offsets in [lo, hi]^dim (static numpy)."""
    rng = np.arange(lo, hi + 1)
    grids = np.meshgrid(*([rng] * dim), indexing="ij")
    return np.stack([g.ravel() for g in grids], -1).astype(np.int32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SparseGrid:
    table: BlockTable
    data: Dict[str, jax.Array]     # each [cap, bs^d, *prop_shape]
    transform: Transform           # index (cell units) -> world
    block_size: int = dataclasses.field(metadata=dict(static=True), default=4)
    dim: int = dataclasses.field(metadata=dict(static=True), default=3)

    # -- shape info -----------------------------------------------------------
    @property
    def block_capacity(self) -> int:
        return self.table.capacity

    @property
    def cells_per_block(self) -> int:
        return self.block_size ** self.dim

    @property
    def dx(self) -> jax.Array:
        """Cell size (isotropic scale of the transform)."""
        return jnp.linalg.norm(self.transform.matrix[:self.dim, 0])

    # -- coordinate maps (SparseGrid.hpp:66-183) ------------------------------
    def world_to_index(self, x: jax.Array) -> jax.Array:
        return self.transform.inverse().apply(x)

    def index_to_world(self, i: jax.Array) -> jax.Array:
        return self.transform.apply(i.astype(self.transform.matrix.dtype))

    def decompose_cell(self, cell: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """cell coord -> (block coord, linear in-block offset)."""
        bs = self.block_size
        block = jnp.floor_divide(cell, bs)
        local = cell - block * bs
        lin = jnp.zeros(cell.shape[:-1], jnp.int32)
        for d in range(self.dim):
            lin = lin * bs + local[..., d]
        return block, lin

    def cell_slot(self, cell: jax.Array) -> jax.Array:
        """Flat payload index of a cell, -1 if its block is inactive."""
        block, lin = self.decompose_cell(cell)
        slot = self.table.query(block)
        return jnp.where(slot >= 0, slot * self.cells_per_block + lin, -1)

    def node_world_positions(self) -> jax.Array:
        """World position of every payload cell ``[cap, bs^d, dim]``."""
        bs, d = self.block_size, self.dim
        corners = neighbor_offsets(d, 0, bs - 1)  # [bs^d, d] in ij order
        # neighbor_offsets enumerates ij-order which matches decompose lin
        cells = (self.table.active_coords[:, None, :] * bs +
                 jnp.asarray(corners)[None, :, :])
        return self.index_to_world(cells)

    # -- queries (valueOr, SparseGrid.hpp:340-363) ----------------------------
    def value_or(self, prop: str, cell: jax.Array, default=0.0) -> jax.Array:
        arr = self.data[prop]
        flat = arr.reshape((-1,) + arr.shape[2:])
        idx = self.cell_slot(cell)
        safe = jnp.maximum(idx, 0)
        val = flat[safe]
        miss_shape = (1,) * (val.ndim - idx.ndim)
        miss = (idx < 0).reshape(idx.shape + miss_shape)
        return jnp.where(miss, jnp.asarray(default, val.dtype), val)

    def sample(self, prop: str, x_world: jax.Array,
               default=0.0) -> jax.Array:
        """Trilinear world-space sampling (wSample, SparseGrid.hpp:460-498)."""
        xi = self.world_to_index(x_world)
        base = jnp.floor(xi).astype(jnp.int32)
        frac = xi - base
        corners = neighbor_offsets(self.dim, 0, 1)   # [2^d, d]
        out = None
        for c in corners:
            cell = base + jnp.asarray(c)
            w = jnp.ones(xi.shape[:-1], xi.dtype)
            for d in range(self.dim):
                w = w * (frac[..., d] if c[d] else 1.0 - frac[..., d])
            v = self.value_or(prop, cell, default)
            wexp = w.reshape(w.shape + (1,) * (v.ndim - w.ndim))
            out = wexp * v if out is None else out + wexp * v
        return out

    def sample_staggered(self, prop: str, x_world: jax.Array,
                         default=0.0) -> jax.Array:
        """MAC-grid sampling (SparseGrid.hpp:418-498 staggered paths): the
        d-th component of ``prop`` lives on faces offset by -dx/2 along d;
        each component is sampled with its own shifted trilinear stencil."""
        comps = []
        for d in range(self.dim):
            shift = jnp.zeros((self.dim,), x_world.dtype).at[d].set(
                0.5 * self.dx)
            comp = self.sample(prop, x_world + shift, default)
            comps.append(comp[..., d] if comp.ndim > x_world.ndim - 1
                         else comp)
        return jnp.stack(comps, axis=-1)

    def sample_gradient(self, prop: str, x_world: jax.Array) -> jax.Array:
        """Gradient of the trilinear field via autodiff (replaces the
        hand-derived gradient stencils in the reference)."""
        def f(p):
            return jnp.sum(self.sample(prop, p[None]))

        return jax.vmap(jax.grad(f))(
            x_world.reshape(-1, self.dim)).reshape(x_world.shape)

    # -- functional updates ---------------------------------------------------
    def with_data(self, **named) -> "SparseGrid":
        d = dict(self.data)
        d.update(named)
        return dataclasses.replace(self, data=d)

    def zeroed(self) -> "SparseGrid":
        """Clear all payloads (CleanGridBlocks, GridOp.hpp:54)."""
        return dataclasses.replace(
            self, data={k: jnp.zeros_like(v) for k, v in self.data.items()})

    def activate(self, block_coords: jax.Array,
                 valid: Optional[jax.Array] = None,
                 dilation: int = 0) -> "SparseGrid":
        """Rebuild the block table from candidate block coords, optionally
        dilated by the ``[0, dilation]^d`` positive neighborhood (the
        stencil apron), zeroing payloads (partition-per-step idiom,
        simulation/sparsity/SparsityCompute.tpp:5-25)."""
        grid, _ = self.activate_with_slots(block_coords, valid=valid,
                                           dilation=dilation)
        return grid

    def activate_with_slots(self, block_coords: jax.Array,
                            valid: Optional[jax.Array] = None,
                            dilation: int = 0):
        """Like :meth:`activate` but also returns each candidate's slot in
        the final (dilated) table — derived from the build's own sort
        instead of a per-candidate binary search (a 262k-lane searchsorted
        measured ~25 ms on v5e; the remap below queries only ``capacity``
        keys)."""
        cap = self.block_capacity
        if isinstance(self.table, WideBlockTable):
            build = lambda c, k, v: build_wide_block_table(c, k, valid=v)
        else:
            build = lambda c, k, v: build_block_table(c, k, valid=v,
                                                      dim=self.dim)
        table, inverse = build(block_coords, cap, valid)
        if dilation:
            offs = neighbor_offsets(self.dim, 0, dilation)
            cand = (table.active_coords[:, None, :] +
                    jnp.asarray(offs)[None, :, :]).reshape(-1, self.dim)
            vmask = jnp.repeat(table.mask, offs.shape[0])
            table2, inv_cand = build(cand, cap, vmask)
            # offset (0,..,0) is the first neighbor: candidate i*noffs maps
            # table slot i -> dilated slot
            remap = inv_cand[jnp.arange(cap) * offs.shape[0]]
            slots = jnp.where(inverse >= 0,
                              remap[jnp.maximum(inverse, 0)], -1)
            table = table2
        else:
            slots = inverse
        return dataclasses.replace(self, table=table).zeroed(), slots


def sparse_grid(props: PropsSpec, *, dx: float, block_capacity: int,
                block_size: int = 4, dim: int = 3, origin=None,
                dtype=jnp.float32, wide_keys: bool = False) -> SparseGrid:
    """Construct an empty SparseGrid with named cell properties.

    ``wide_keys=True`` switches to dual-int32 block keys
    (:class:`WideBlockTable`), lifting the 1024^3-block domain cap.
    """
    tags = _as_tags(props)
    cap = block_capacity
    data = {t.name: jnp.zeros((cap, block_size ** dim) + t.shape, dtype)
            for t in tags}
    keys = jnp.full((cap,), np.iinfo(np.int32).max, jnp.int32)
    if wide_keys:
        assert dim == 3, "wide keys are 3-D"
        table = WideBlockTable(keys, jnp.full_like(keys, keys[0]),
                               jnp.int32(0), dim)
    else:
        table = BlockTable(keys, jnp.int32(0), dim)
    tr = scaling(dx)
    if origin is not None:
        tr = translation(origin).compose(tr)
    return SparseGrid(table, data, tr, block_size, dim)


def sparse_grid_from_dense(arr: jax.Array, *, dx: float, prop_name: str,
                           block_size: int = 4, origin=None,
                           threshold: Optional[float] = None,
                           block_capacity: Optional[int] = None
                           ) -> SparseGrid:
    """Dense array -> SparseGrid (the reference's dense/VDB conversion
    surface, SparseGrid_Conversion.cpp): activates blocks where any cell
    passes ``|value| > threshold`` (or all blocks when None)."""
    dim = arr.ndim
    bs = block_size
    shape = arr.shape
    nb_axes = [int(np.ceil(s / bs)) for s in shape]
    padded = jnp.pad(arr, [(0, a * bs - s) for a, s in zip(nb_axes, shape)])
    # blockify: [nbx, bs, nby, bs, (nbz, bs)] -> [nblocks, bs^d]
    resh = padded.reshape(sum(([a, bs] for a in nb_axes), []))
    perm = list(range(0, 2 * dim, 2)) + list(range(1, 2 * dim, 2))
    blocks = resh.transpose(perm).reshape(-1, bs ** dim)
    coords = jnp.asarray(np.stack(np.meshgrid(
        *[np.arange(a) for a in nb_axes], indexing="ij"),
        -1).reshape(-1, dim), jnp.int32)
    if threshold is not None:
        keep = jnp.any(jnp.abs(blocks) > threshold, axis=1)
    else:
        keep = jnp.ones((blocks.shape[0],), bool)
    cap = block_capacity or blocks.shape[0]
    g = sparse_grid([PropertyTag(prop_name)], dx=dx, block_capacity=cap,
                    block_size=bs, dim=dim, origin=origin)
    table, inv = build_block_table(coords, cap, valid=keep, dim=dim)
    data = jnp.zeros((cap + 1, bs ** dim), arr.dtype)
    dst = jnp.where(inv >= 0, inv, cap)
    data = data.at[dst].set(blocks)[:cap]
    return dataclasses.replace(g, table=table,
                               data={prop_name: data})


def sparse_grid_to_dense(grid: SparseGrid, prop_name: str, lo, hi,
                         default=0.0) -> jax.Array:
    """SparseGrid -> dense array over cell range [lo, hi) (conversion
    surface; host-side sized)."""
    lo = np.asarray(lo, np.int64)
    hi = np.asarray(hi, np.int64)
    shape = tuple((hi - lo).tolist())
    grids = np.meshgrid(*[np.arange(l, h) for l, h in zip(lo, hi)],
                        indexing="ij")
    cells = jnp.asarray(np.stack([g.ravel() for g in grids], -1), jnp.int32)
    vals = grid.value_or(prop_name, cells, default)
    return vals.reshape(shape)
