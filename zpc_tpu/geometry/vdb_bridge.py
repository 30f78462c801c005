"""SparseGrid / SparseLevelSet <-> ``.vdb`` conversion.

The reference's OpenVDB bridge surface (``geometry/VdbLevelSet.h:26-99``:
``load_floatgrid_from_vdb_file`` / ``convert_floatgrid_to_sparse_levelset``
/ ``convert_sparse_levelset_to_floatgrid``, impls in
``VdbLevelSet_Conversion.cpp`` and ``SparseGrid_Conversion.cpp``), rebuilt
over the dependency-free codec in :mod:`zpc_tpu.utils.vdb`.

Block math: a VDB leaf (8^3 voxels) covers exactly 2^dim SparseGrid blocks
(4^3 cells); conversion is pure reshapes on the host — no per-voxel loops.
3-D grids only.  Scalar props map to FloatGrid/Int32Grid; 3-vector props
(velocity fields, the ``readVelVdb`` surface) map to one Vec3SGrid
(``save_vdb(vec3=True)``) or per-component scalar grids.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..containers.block_table import build_block_table
from ..core.config import prop as _prop
from ..utils.vdb import LEAF_DIM, VdbGrid, read_vdb, write_vdb
from .sparse_grid import SparseGrid, sparse_grid

__all__ = ["sparse_grid_to_vdb_grid", "vdb_grid_to_sparse_grid",
           "save_vdb", "load_vdb_grids"]

_BS = 4                      # SparseGrid block side; leaf = 2x2x2 blocks


def _require_3d_bs4(grid: SparseGrid):
    if grid.dim != 3 or grid.block_size != _BS:
        raise ValueError("vdb bridge supports dim=3, block_size=4 grids")


def sparse_grid_to_vdb_grid(grid: SparseGrid, prop_name: str, *,
                            name: Optional[str] = None,
                            background=0.0,
                            grid_class: str = "unknown",
                            component: Optional[int] = None) -> VdbGrid:
    """Extract one property into a :class:`VdbGrid` (host-side).

    Scalar properties become FloatGrid/Int32Grid leaves; a 3-vector
    property (e.g. a velocity field — ``readVelVdb``'s Vec3fGrid
    surface) becomes a ``Tree_vec3s_5_4_3`` grid unless ``component``
    picks one channel."""
    _require_3d_bs4(grid)
    count = int(grid.table.count)
    coords = np.asarray(grid.table.active_coords[:count])       # [nb, 3]
    data = np.asarray(grid.data[prop_name][:count])
    if component is not None:
        data = data[..., component]
    if data.ndim == 2:
        vec = 1
        blocks = data.reshape(count, _BS, _BS, _BS)             # x-major
        leaf_shape = (LEAF_DIM,) * 3
    elif data.ndim == 3 and data.shape[-1] == 3:
        vec = 3
        blocks = data.reshape(count, _BS, _BS, _BS, 3)
        leaf_shape = (LEAF_DIM,) * 3 + (3,)
        if np.asarray(background).ndim == 0:
            background = (float(background),) * 3
    else:
        raise ValueError(f"{prop_name!r} is neither scalar nor 3-vector; "
                         "pass component=")
    leaf_of = coords // 2                                       # leaf coord/2
    sub = coords - leaf_of * 2                                  # [nb,3] 0/1
    leaves = {}
    uniq, inv = np.unique(leaf_of, axis=0, return_inverse=True)
    for li, lc in enumerate(uniq):
        leaf = np.full(leaf_shape, background, blocks.dtype)
        for b in np.flatnonzero(inv == li):
            s = sub[b] * _BS
            leaf[s[0]:s[0] + _BS, s[1]:s[1] + _BS,
                 s[2]:s[2] + _BS] = blocks[b]
        leaves[tuple(int(c) * LEAF_DIM for c in lc)] = leaf
    tr = np.asarray(grid.transform.matrix)
    return VdbGrid(name or prop_name, leaves,
                   voxel_size=float(np.linalg.norm(tr[:3, 0])),
                   translation=tuple(float(t) for t in tr[:3, 3]),
                   background=background, grid_class=grid_class, vec=vec)


def vdb_grid_to_sparse_grid(vg: VdbGrid, prop_name: str = "v", *,
                            block_capacity: Optional[int] = None,
                            extra_props: Sequence = ()) -> SparseGrid:
    """Build a SparseGrid holding ``prop_name`` from a VdbGrid (scalar
    grids -> scalar prop, Vec3s grids -> 3-channel prop)."""
    origins = np.asarray(sorted(vg.leaves), np.int64)           # [nl, 3]
    nl = len(origins)
    sub = np.stack(np.meshgrid(*([np.arange(2)] * 3), indexing="ij"),
                   -1).reshape(8, 3)                            # [8, 3]
    bcoords = (origins[:, None, :] // _BS + sub[None, :, :]).reshape(-1, 3)
    vals = np.stack([vg.leaves[tuple(o)] for o in origins])  # [nl,8,8,8(,c)]
    ch = vals.shape[4:]                                       # () or (3,)
    # leaf -> 8 blocks of 4^3: split each axis into (2, 4)
    blocks = vals.reshape((nl, 2, _BS, 2, _BS, 2, _BS) + ch) \
        .transpose((0, 1, 3, 5, 2, 4, 6) + tuple(range(7, 7 + len(ch)))) \
        .reshape((nl * 8, _BS ** 3) + ch)
    cap = block_capacity or max(64, 1 << int(np.ceil(np.log2(nl * 8))))
    table, inverse = build_block_table(jnp.asarray(bcoords, jnp.int32), cap)
    if bool(table.count > table.capacity):
        raise ValueError(f"block_capacity {cap} < {int(table.count)} blocks")
    p0 = _prop(prop_name, ch[0]) if ch else _prop(prop_name)
    g = sparse_grid([p0] + list(extra_props),
                    dx=vg.voxel_size, block_capacity=cap, dim=3,
                    origin=jnp.asarray(vg.translation, jnp.float32),
                    dtype=jnp.asarray(blocks).dtype)
    data = dict(g.data)
    arr = jnp.zeros_like(data[prop_name])
    arr = arr.at[inverse].set(jnp.asarray(blocks))
    data[prop_name] = arr
    import dataclasses
    return dataclasses.replace(g, table=table, data=data)


def save_vdb(path: str, grid: SparseGrid, props: Sequence[str], *,
             background: float = 0.0, grid_class: str = "unknown",
             compress: bool = False, vec3: bool = False):
    """Export named scalar/vector properties of a SparseGrid to ``path``.

    3-vector properties become one ``Vec3SGrid`` when ``vec3=True``
    (the reference's velocity-grid interchange form, readVelVdb), else
    one scalar grid per component (``"v.0"``, ...).
    """
    out: List[VdbGrid] = []
    for p in props:
        a = grid.data[p]
        if a.ndim == 2 or (vec3 and a.shape[-1] == 3):
            out.append(sparse_grid_to_vdb_grid(
                grid, p, background=background, grid_class=grid_class))
        else:
            for c in range(a.shape[-1]):
                out.append(sparse_grid_to_vdb_grid(
                    grid, p, name=f"{p}.{c}", background=background,
                    grid_class=grid_class, component=c))
    write_vdb(path, out, compress=compress)


def load_vdb_grids(path: str, *, block_capacity: Optional[int] = None):
    """Read every grid in ``path`` as ``{name: SparseGrid}``."""
    return {vg.name: vdb_grid_to_sparse_grid(
        vg, vg.name.split(".")[0] or "v", block_capacity=block_capacity)
        for vg in read_vdb(path)}


# -- AdaptiveGrid <-> VDB (AdaptiveGrid_Conversion.cpp:173-231 analog) -----

def adaptive_to_vdb_grid(ag, *, name: str = "adaptive",
                         grid_class: str = "unknown") -> VdbGrid:
    """AdaptiveGrid -> VdbGrid (leaf level; requires leaf bs=8 = VDB leaf).

    Coarse constant tiles are NOT emitted: the vdb-lite writer has no
    tile stream (utils/vdb.py writes `tiles 0`), so the round trip
    preserves leaf topology/values and rebuilds coarse child masks on
    read — documented deviation from AdaptiveGrid_Conversion.cpp, which
    emits interior tiles.
    """
    if ag.block_sizes[0] != 8 or ag.dim != 3:
        raise ValueError("adaptive_to_vdb_grid needs dim=3, leaf bs=8")
    from ..geometry.adaptive_grid import AdaptiveGrid  # noqa: F401
    lev = ag.levels[0]
    count = int(lev.table.count)
    coords = np.asarray(lev.table.active_coords[:count])
    vals = np.asarray(lev.value[:count]).reshape(count, 8, 8, 8)
    leaves = {tuple(int(c) * 8 for c in coords[i]): vals[i]
              for i in range(count)}
    tr = np.asarray(ag.transform.matrix)
    return VdbGrid(name, leaves,
                   voxel_size=float(np.linalg.norm(tr[:3, 0])),
                   translation=tuple(float(t) for t in tr[:3, 3]),
                   background=ag.background, grid_class=grid_class)


def vdb_grid_to_adaptive(vg: VdbGrid, *, block_sizes=(8, 4, 4),
                         capacities=None):
    """VdbGrid -> AdaptiveGrid: leaves become level-0 blocks; coarser
    levels get child masks (values = background constant tiles)."""
    from ..geometry.adaptive_grid import adaptive_grid_from_leaves
    origins = np.asarray(sorted(vg.leaves), np.int64)
    nl = len(origins)
    off = np.stack(np.meshgrid(*([np.arange(8)] * 3), indexing="ij"),
                   -1).reshape(-1, 3)
    cells = (origins[:, None, :] + off[None]).reshape(-1, 3)
    vals = np.stack([vg.leaves[tuple(o)] for o in origins]).reshape(-1)
    if capacities is None:
        cap0 = max(64, 1 << int(np.ceil(np.log2(max(nl, 1)))))
        capacities = [cap0, max(64, cap0 // 4), 64]
    return adaptive_grid_from_leaves(
        jnp.asarray(cells, jnp.int32), jnp.asarray(vals, jnp.float32),
        dx=vg.voxel_size, block_sizes=block_sizes, capacities=capacities,
        background=vg.background,
        origin=jnp.asarray(vg.translation, jnp.float32))
