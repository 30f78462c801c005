"""``BlockTable`` — the TPU-native spatial hash table.

The reference uses concurrent GPU hash tables for block partitioning:
``HashTable`` open addressing with ``atomicKeyCAS`` spin insert
(container/HashTable.hpp:356-427) and ``bht`` bucketed cuckoo hashing with
warp-cooperative inserts (container/Bht.hpp:489-560).  TPUs have no device
atomics or per-thread divergent probing, so concurrent insertion is replaced
by the **sort-based build** (SURVEY §7 hard-part 2):

    pack block coords -> stable sort -> unique-compact -> sorted key table

Queries are binary searches (``searchsorted``) over the sorted keys — O(log n)
gathers, fully vectorized, no divergence.  The ``_activeKeys`` compaction of
the reference comes for free: the table *is* the compacted active-key list.

Overflow semantics: the reference ``bht`` sets ``_buildSuccess=false`` on
overflow for host-side rebuild (Bht.hpp:163-175).  Here the analog is
``count > capacity`` after a build — the count is exact, so the host can
re-enter with a larger capacity (re-trace), and :func:`build_overflowed`
exposes the flag.

Coordinate packing: block coords in ``[-2^(b-1), 2^(b-1))`` per axis are
offset-shifted and bit-packed into one int32 key (dim=3: 10 bits/axis ->
1024^3 blocks; dim=2: 15 bits/axis).  With 4^3-cell blocks that addresses a
4096^3-cell domain — widen to dual-int32 keys when needed.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "KEY_SENTINEL",
    "pack_coords",
    "unpack_key",
    "BlockTable",
    "build_block_table",
]

KEY_SENTINEL = np.int32(np.iinfo(np.int32).max)

_BITS = {2: 15, 3: 10}


def _offset(dim: int) -> int:
    return 1 << (_BITS[dim] - 1)


def pack_coords(coords: jax.Array) -> jax.Array:
    """Pack integer block coords ``[..., dim]`` into sortable int32 keys."""
    dim = coords.shape[-1]
    bits, off = _BITS[dim], _offset(dim)
    key = jnp.zeros(coords.shape[:-1], jnp.int32)
    for d in range(dim):
        key = (key << bits) | (coords[..., d].astype(jnp.int32) + off)
    return key


def unpack_key(key: jax.Array, dim: int) -> jax.Array:
    bits, off = _BITS[dim], _offset(dim)
    mask = (1 << bits) - 1
    comps = []
    for d in range(dim):
        shift = bits * (dim - 1 - d)
        comps.append(((key >> shift) & mask) - off)
    return jnp.stack(comps, axis=-1).astype(jnp.int32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockTable:
    """Sorted-unique key table over packed block coordinates.

    ``keys`` is capacity-padded with ``KEY_SENTINEL`` (sorts last); ``count``
    is the *traced* number of active entries (active-block count varies per
    step under jit — SURVEY §7 hard-part 3).
    """

    keys: jax.Array   # [capacity] int32, sorted ascending, sentinel-padded
    count: jax.Array  # scalar int32
    dim: int = dataclasses.field(metadata=dict(static=True), default=3)

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    @property
    def active_coords(self) -> jax.Array:
        """Unpacked block coords per table slot ``[capacity, dim]``
        (reference ``_activeKeys``); sentinel slots give garbage coords —
        mask with :meth:`mask`."""
        return unpack_key(self.keys, self.dim)

    @property
    def mask(self) -> jax.Array:
        return jnp.arange(self.capacity) < self.count

    # -- queries (bht::query analog) -----------------------------------------
    def query_keys(self, qkeys: jax.Array) -> jax.Array:
        """Return slot index per packed query key, -1 if absent."""
        idx = jnp.searchsorted(self.keys, qkeys).astype(jnp.int32)
        idx = jnp.minimum(idx, self.capacity - 1)
        hit = (self.keys[idx] == qkeys) & (qkeys != KEY_SENTINEL)
        return jnp.where(hit, idx, -1)

    def query(self, coords: jax.Array) -> jax.Array:
        """Return slot index per block coord ``[..., dim]``, -1 if absent."""
        return self.query_keys(pack_coords(coords))


def build_block_table(coords: jax.Array, capacity: int,
                      valid: Optional[jax.Array] = None,
                      dim: Optional[int] = None) -> Tuple[BlockTable, jax.Array]:
    """Build a BlockTable from (possibly duplicated) candidate block coords.

    Sort-based replacement for concurrent hash insert (HashTable.hpp:356-427).
    Returns ``(table, inverse)`` where ``inverse[i]`` is the table slot of
    ``coords[i]`` (or -1 for invalid lanes) — so callers immediately know each
    candidate's block index without a second query.

    jit-safe: all shapes static; ``capacity`` bounds the active block count.
    """
    dim = dim if dim is not None else coords.shape[-1]
    n = coords.shape[0]
    keys = pack_coords(coords)
    if valid is not None:
        keys = jnp.where(valid, keys, KEY_SENTINEL)
    order = jnp.argsort(keys)                     # stable
    skeys = keys[order]
    neq = jnp.concatenate([jnp.ones((1,), bool), skeys[1:] != skeys[:-1]])
    neq = neq & (skeys != KEY_SENTINEL)
    rank = jnp.cumsum(neq.astype(jnp.int32)) - 1  # unique slot of sorted lane
    count = rank[-1] + 1 if n else jnp.int32(0)
    dst = jnp.where(neq, rank, capacity)          # overflow lanes dropped
    table_keys = jnp.full((capacity + 1,), KEY_SENTINEL, jnp.int32)
    table_keys = table_keys.at[jnp.clip(dst, 0, capacity)].set(skeys)[:capacity]
    # scatter sorted-lane ranks back to the original order
    inverse = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.where(skeys != KEY_SENTINEL, rank, -1))
    inverse = jnp.where(inverse >= capacity, -1, inverse)
    return BlockTable(table_keys, count.astype(jnp.int32), dim), inverse


def build_overflowed(table: BlockTable) -> jax.Array:
    """True when the last build exceeded capacity (bht ``_buildSuccess``
    analog, Bht.hpp:163-175); host should rebuild with a larger capacity."""
    return table.count > table.capacity
