"""Measure the adaptive_chain (two-level while loop) rollout rate vs the
old cond-in-body fori_loop chain, at bench.py's exact configuration.

Context (probe_r3_cond.py): a live lax.cond(rebin) inside the step body
costs +2.4 ms/step even when the branch never executes; rebins fire
~once per 120 steps, so hoisting the cond into an outer while loop
should recover the bare-step rate (~2.9 ms -> ~90 M pps at 256k).
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
from zpc_tpu.sim.mpm_binned2 import (BinnedConfig2, _rebin, adaptive_chain,
                                     bin_state, explicit_step_binned2)


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
          f"{n * chain / best / 1e6:.1f} M pps  overflow={bool(s.overflow)}",
          flush=True)


def main():
    n = 262144
    sim, st0, dt = build(n, dx=1.0 / 128)
    dtj = jnp.float32(dt)
    cfg = BinnedConfig2(bins_capacity=2560, block_capacity=2048)
    bst = jax.block_until_ready(jax.jit(lambda s: bin_state(sim, s, cfg))(st0))
    chain = 240

    def old(s):
        def body(_, t):
            t = jax.lax.cond(t.needs_rebin,
                             lambda u: _rebin(sim, u, cfg), lambda u: u, t)
            return explicit_step_binned2(sim, t, dtj, cfg, rebin=False)
        return jax.lax.fori_loop(0, chain, body, s)

    def new(s):
        return adaptive_chain(
            lambda t: explicit_step_binned2(sim, t, dtj, cfg, rebin=False),
            lambda t: _rebin(sim, t, cfg), s, chain)

    run("adaptive_chain (two-level while)", new, bst, chain)
    run("old cond-in-body fori", old, bst, chain)


if __name__ == "__main__":
    main()
