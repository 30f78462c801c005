"""Decompose the adaptive_chain overhead: bare fori chain (no flag check at
all) vs per-step while cond vs chunked flag checks.

probe_r3_chain.py: adaptive_chain = 3.77 ms/step wall (240 chain) while the
bare step measures 2.89 ms marginal.  Suspects: per-iteration while-cond
scalar sync, lost cross-iteration pipelining, or the marginal-mode number
being optimistic.  Variant A (bare fori, physics invalid after an escape
but timing-equivalent) isolates the loop-structure cost.
"""

import sys
import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples.mpm_block import build
from zpc_tpu.sim.mpm_binned2 import (BinnedConfig2, _rebin, bin_state,
                                     explicit_step_binned2)


def run(label, chain_fn, bst, chain):
    step = jax.jit(chain_fn)
    out = step(bst)
    np.asarray(jax.device_get(out.cols.reshape(-1)[0]))
    best = float("inf")
    s = out
    for _ in range(3):
        t0 = time.perf_counter()
        s = step(s)
        np.asarray(jax.device_get(s.cols.reshape(-1)[0]))
        best = min(best, time.perf_counter() - t0)
    n = 262144
    print(f"{label}: {best * 1e3 / chain:.3f} ms/step  "
          f"{n * chain / best / 1e6:.1f} M pps", flush=True)


def main():
    n = 262144
    sim, st0, dt = build(n, dx=1.0 / 128)
    dtj = jnp.float32(dt)
    cfg = BinnedConfig2(bins_capacity=2560, block_capacity=2048)
    bst = jax.block_until_ready(jax.jit(lambda s: bin_state(sim, s, cfg))(st0))
    chain = 240

    def stepf(t):
        return explicit_step_binned2(sim, t, dtj, cfg, rebin=False)

    # A: bare fori, no flag handling at all (timing floor; physics invalid
    # once a particle escapes its window — fine for a timing probe)
    def bare(s):
        return jax.lax.fori_loop(0, chain, lambda _, t: stepf(t), s)

    # C: chunked — inner fori of 16 cond-free steps, flag checked per chunk
    # (rebins fire late; timing structure of a rollback scheme)
    def chunked(s):
        def outer_body(c):
            t, i = c
            t = jax.lax.fori_loop(0, 16, lambda _, u: stepf(u), t)
            t = jax.lax.cond(t.needs_rebin,
                             lambda u: _rebin(sim, u, cfg), lambda u: u, t)
            return t, i + 16

        t, _ = jax.lax.while_loop(lambda c: c[1] < chain, outer_body,
                                  (s, jnp.int32(0)))
        return t

    run("A bare fori (floor)", bare, bst, chain)
    run("C chunked-16 while", chunked, bst, chain)


if __name__ == "__main__":
    main()
