"""Rebin economics: how often does the adaptive chain actually rebin,
and where do the rebin milliseconds go?

Stages inside _rebin/_sort_into_bins_from_lanes:
  key recompute (elementwise) -> key-only sort -> group counts/dummy keys
  -> 3-op stable sort (perm) -> [L, W] row gather -> table build + query.
"""

import dataclasses
import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms
from examples.mpm_block import build
from zpc_tpu.containers.block_table import KEY_SENTINEL, pack_coords
from zpc_tpu.math.interpolation import bspline_weights
from zpc_tpu.sim.mpm_binned2 import (BinnedConfig2, K, _rebin, bin_state,
                                     explicit_step_binned2)


def main():
    n = 262144
    sim, st0, dt = build(n, dx=1.0 / 128)
    dtj = jnp.float32(dt)
    cfg = BinnedConfig2(bins_capacity=2560, block_capacity=2048)
    bst = jax.block_until_ready(
        jax.jit(lambda s: bin_state(sim, s, cfg))(st0))

    # -- rebin frequency over a long chain ---------------------------------
    def body(carry):
        s, nreb = carry
        nreb = nreb + s.needs_rebin.astype(jnp.int32)
        s = jax.lax.cond(s.needs_rebin,
                         lambda t: _rebin(sim, t, cfg), lambda t: t, s)
        return explicit_step_binned2(sim, s, dtj, cfg, rebin=False), nreb

    @jax.jit
    def chain(s):
        out, nreb = jax.lax.fori_loop(
            0, 120, lambda i, c: body(c), (s, jnp.int32(0)))
        return out, nreb

    out, nreb = chain(bst)
    print(f"rebins in 120 steps: {int(nreb)}", flush=True)

    # -- rebin stage costs ---------------------------------------------------
    L = cfg.bins_capacity * K

    def keys_of(s):
        grid = s.grid
        origin_w = grid.transform.matrix[:3, 3]
        x = s.cols[:, 0:3]
        alive = s.pid >= 0
        xi = (x - origin_w) / grid.dx
        base, _, _ = bspline_weights(xi, 2)
        return jnp.where(alive,
                         pack_coords(jnp.floor_divide(base - cfg.slack, 4)),
                         KEY_SENTINEL)

    def full_rebin(i, s):
        return _rebin(sim, s, cfg)
    chained_ms(full_rebin, bst, iters=6, reps=3, marginal=True,
               label="rebin full")

    def just_sortperm(i, s):
        k = keys_of(s)
        lane = jnp.arange(L, dtype=jnp.int32)
        sk, spid, perm = jax.lax.sort((k, s.pid, lane), num_keys=1,
                                      is_stable=True)
        return dataclasses.replace(s, pid=spid,
                                   max_vel=s.max_vel + 1e-30 * sk[0])
    chained_ms(just_sortperm, bst, iters=6, reps=3, marginal=True,
               label="keys + 3-op stable sort")

    def sort_and_gather(i, s):
        k = keys_of(s)
        lane = jnp.arange(L, dtype=jnp.int32)
        sk, spid, perm = jax.lax.sort((k, s.pid, lane), num_keys=1,
                                      is_stable=True)
        return dataclasses.replace(s, pid=spid, cols=s.cols[perm])
    chained_ms(sort_and_gather, bst, iters=6, reps=3, marginal=True,
               label="... + [L,27] row gather")

    def sort_carry_payload(i, s):
        # payload carried THROUGH one wide stable sort (no gather)
        k = keys_of(s)
        ops = (k, s.pid) + tuple(s.cols[:, i] for i in range(27))
        res = jax.lax.sort(ops, num_keys=1, is_stable=True)
        return dataclasses.replace(s, pid=res[1],
                                   cols=jnp.stack(res[2:], axis=1))
    chained_ms(sort_carry_payload, bst, iters=6, reps=3, marginal=True,
               label="29-operand payload sort")


if __name__ == "__main__":
    main()
