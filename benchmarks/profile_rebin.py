"""Stage breakdown of the v2 rebin (41.7 ms at 327k lanes): keys/sort/
bookkeeping/dummy-keying/perm-sort/payload-gather/table-build."""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms, dep_scalar
from examples.mpm_block import build
from zpc_tpu.sim.mpm_binned2 import (BinnedConfig2, K, _rebin, bin_state)
from zpc_tpu.containers.block_table import (KEY_SENTINEL, build_block_table,
                                            pack_coords, unpack_key)
from zpc_tpu.geometry.sparse_grid import neighbor_offsets
from zpc_tpu.math.interpolation import bspline_weights


def main():
    n = 262144
    sim, st0, dt = build(n, dx=1.0 / 128)
    cfg = BinnedConfig2(bins_capacity=2560, block_capacity=2048)
    bst = jax.block_until_ready(
        jax.jit(lambda s: bin_state(sim, s, cfg))(st0))
    nbq = cfg.bins_capacity
    L = nbq * K
    nb = cfg.block_capacity

    def upto(stage):
        def body(i, st):
            grid = st.grid
            dim = grid.dim
            origin_w = grid.transform.matrix[:dim, dim]
            x = st.cols[:, 0:dim]
            alive = st.pid >= 0
            xi = (x - origin_w) / grid.dx
            base, _, _ = bspline_weights(xi, 2)
            keys = jnp.where(alive,
                             pack_coords(jnp.floor_divide(
                                 base - cfg.slack, 4)), KEY_SENTINEL)
            if stage == "keys":
                return _fold(st, dep_scalar(keys))
            skey = jax.lax.sort((keys,), num_keys=1)[0]
            if stage == "keysort":
                return _fold(st, dep_scalar(skey))
            neq = jnp.concatenate(
                [jnp.ones((1,), bool), skey[1:] != skey[:-1]])
            live = skey != KEY_SENTINEL
            neq = neq & live
            rank = jnp.cumsum(neq.astype(jnp.int32)) - 1
            n_groups = jnp.maximum(rank[-1] + 1, 0)
            lane = jnp.arange(L, dtype=jnp.int32)
            dst = jnp.clip(jnp.where(neq, rank, nbq), 0, nbq)
            gstart = jnp.zeros((nbq + 1,), jnp.int32).at[dst].set(
                lane)[:nbq]
            nlive = jnp.sum(live.astype(jnp.int32))
            gend = jnp.concatenate(
                [jnp.where(jnp.arange(1, nbq) < n_groups, gstart[1:],
                           nlive), nlive[None]])
            gid = jnp.arange(nbq, dtype=jnp.int32)
            gvalid = gid < n_groups
            counts = jnp.where(gvalid, gend - gstart, 0)
            gkeys = jnp.full((nbq + 1,), KEY_SENTINEL, jnp.int32).at[
                dst].set(skey)[:nbq]
            gkeys = jnp.where(gvalid, gkeys, KEY_SENTINEL)
            pads = jnp.where(gvalid, (-counts) % K, 0)
            if stage == "groups":
                return _fold(st, dep_scalar(gkeys) + dep_scalar(pads))
            from zpc_tpu.sim.mpm_binned2 import _dummy_keys_by_rank
            dead = keys == KEY_SENTINEL
            dead_rank = jnp.cumsum(dead.astype(jnp.int32)) - 1
            padcum = jnp.cumsum(pads)
            dense = _dummy_keys_by_rank(gkeys, gvalid, pads, padcum, L)
            in_budget = dead & (dead_rank < padcum[-1])
            keys2 = jnp.where(in_budget,
                              dense[jnp.clip(dead_rank, 0, L - 1)], keys)
            ckey = jnp.where(keys2 == KEY_SENTINEL, KEY_SENTINEL,
                             keys2 * 2 + dead.astype(jnp.int32))
            if stage == "dummykeys":
                return _fold(st, dep_scalar(ckey))
            lane_i = jnp.arange(L, dtype=jnp.int32)
            sck, spid, perm = jax.lax.sort((ckey, st.pid, lane_i),
                                           num_keys=1, is_stable=True)
            if stage == "permsort":
                return _fold(st, dep_scalar(perm) + dep_scalar(sck))
            scols = st.cols[perm]
            if stage == "gather":
                return _fold(st, dep_scalar(scols))
            offs = jnp.asarray(neighbor_offsets(dim, 0, 1))
            gcoords = unpack_key(gkeys, dim)
            cand = (gcoords[:, None, :] + offs[None, :, :]).reshape(-1,
                                                                    dim)
            vmask = jnp.repeat(gvalid, offs.shape[0])
            table, _ = build_block_table(cand, nb, valid=vmask, dim=dim)
            first_ck = sck.reshape(nbq, K)[:, 0]
            first_key = jnp.where(first_ck == KEY_SENTINEL, KEY_SENTINEL,
                                  first_ck >> 1)
            bin_block = jnp.where(first_key == KEY_SENTINEL, -1,
                                  table.query_keys(first_key))
            if stage == "table":
                return _fold(st, dep_scalar(bin_block) + dep_scalar(scols))
            raise ValueError(stage)
        return body

    def _fold(st, eps):
        import dataclasses
        return dataclasses.replace(st, cols=st.cols + eps)

    ms_full = chained_ms(lambda i, s: _rebin(sim, s, cfg), bst, iters=10,
                         label="full _rebin")
    prev = 0.0
    for stage in ["keys", "keysort", "groups", "dummykeys", "permsort",
                  "gather", "table"]:
        ms = chained_ms(upto(stage), bst, iters=10, label=f"upto {stage}")
        print(f"    delta {stage}: {ms - prev:+.2f} ms", flush=True)
        prev = ms
    print(f"full rebin {ms_full:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
