"""Why is the 1M MPM step 1.6x worse per particle than 256k?

256k: 2.3 ms bare / 2.8 adaptive (8.8 / 10.7 ns per particle-step).
1M:   17.9 ms adaptive (17.1 ns).  This probe splits: bare step at 1M,
rebin cost and cadence, and pure-stream calibration at both scales.
"""

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
                                     explicit_step_binned2, rebin_adaptive)


def main():
    rng = np.random.default_rng(0)
    for n, bins, blocks in ((262144, 2560, 2048), (1048576, 9216, 8192)):
        tag = f"{n >> 10}k"
        sim, st0, dt = build(n, dx=1.0 / 128, block_capacity=blocks) \
            if blocks != 2048 else build(n, dx=1.0 / 128)
        dtj = jnp.float32(dt)
        cfg = BinnedConfig2(bins_capacity=bins, block_capacity=blocks)
        bst = jax.block_until_ready(
            jax.jit(lambda s: bin_state(sim, s, cfg))(st0))

        def bare(_, s):
            return explicit_step_binned2(sim, s, dtj, cfg, rebin=False)
        ms = chained_ms(bare, bst, iters=10, marginal=True)
        print(f"{tag} bare step        {ms:8.2f} ms  "
              f"{1e6 * ms / n * 1e3:6.1f} ns/p", flush=True)

        def adap(_, s):
            s = jax.lax.cond(s.needs_rebin,
                             lambda t: rebin_adaptive(sim, t, cfg),
                             lambda t: t, s)
            return explicit_step_binned2(sim, s, dtj, cfg, rebin=False)
        ms = chained_ms(adap, bst, iters=10, marginal=True)
        print(f"{tag} adaptive step    {ms:8.2f} ms  "
              f"{1e6 * ms / n * 1e3:6.1f} ns/p", flush=True)

        def reb(_, s):
            s2 = _rebin(sim, s, cfg)
            return s2
        ms = chained_ms(reb, bst, iters=4, marginal=True)
        print(f"{tag} full rebin       {ms:8.2f} ms", flush=True)

        # rebin cadence over a real rollout: count needs_rebin fires
        def roll(carry, _):
            s, cnt = carry
            fire = s.needs_rebin
            s = jax.lax.cond(fire, lambda t: rebin_adaptive(sim, t, cfg),
                             lambda t: t, s)
            s = explicit_step_binned2(sim, s, dtj, cfg, rebin=False)
            return (s, cnt + fire.astype(jnp.int32)), 0.0

        (s_end, cnt), _ = jax.jit(
            lambda s: jax.lax.scan(roll, (s, jnp.int32(0)), None,
                                   length=100))(bst)
        print(f"{tag} rebins in 100 steps: {int(cnt)}  "
              f"overflow={bool(s_end.overflow)}", flush=True)

        # stream calibration at this state size
        lanes = bins * 128
        big = jnp.asarray(
            rng.standard_normal((lanes // 128 * 24, 128)).astype(np.float32))

        def stream(i, c):
            return (c[0] * 1.0000001,)
        ms = chained_ms(stream, (big,), iters=20, marginal=True)
        print(f"{tag} pure stream {big.size * 4 >> 20}MB   {ms:8.2f} ms  "
              f"{2 * big.size * 4 / (ms / 1e3) / 1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
