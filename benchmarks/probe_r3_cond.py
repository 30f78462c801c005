"""Isolate the bench-chain discrepancy: the bare seg-step measures
~2.4 ms but the bench chain (cond(rebin) + step) sustains ~4.8 ms/step
with only one rebin in 120 steps.  Suspect: lax.cond carry copies."""

import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms
from examples.mpm_block import build
from zpc_tpu.sim.mpm_binned2 import (BinnedConfig2, _rebin, bin_state,
                                     explicit_step_binned2)


def main():
    n = 262144
    sim, st0, dt = build(n, dx=1.0 / 128)
    dtj = jnp.float32(dt)
    cfg = BinnedConfig2(bins_capacity=2560, block_capacity=2048)
    bst = jax.block_until_ready(
        jax.jit(lambda s: bin_state(sim, s, cfg))(st0))

    def plain(i, s):
        return explicit_step_binned2(sim, s, dtj, cfg, rebin=False)
    chained_ms(plain, bst, iters=30, reps=3, marginal=True,
               label="step (no cond)")

    def with_cond(i, s):
        s = jax.lax.cond(s.needs_rebin,
                         lambda t: _rebin(sim, t, cfg), lambda t: t, s)
        return explicit_step_binned2(sim, s, dtj, cfg, rebin=False)
    chained_ms(with_cond, bst, iters=30, reps=3, marginal=True,
               label="cond(rebin) + step")

    def with_false_cond(i, s):
        s = jax.lax.cond(jnp.bool_(False) & s.needs_rebin,
                         lambda t: _rebin(sim, t, cfg), lambda t: t, s)
        return explicit_step_binned2(sim, s, dtj, cfg, rebin=False)
    chained_ms(with_false_cond, bst, iters=30, reps=3, marginal=True,
               label="cond(never) + step")

    def cond_only(i, s):
        return jax.lax.cond(s.needs_rebin,
                            lambda t: _rebin(sim, t, cfg), lambda t: t, s)
    chained_ms(cond_only, bst, iters=30, reps=3, marginal=True,
               label="cond alone (pred False)")


if __name__ == "__main__":
    main()
