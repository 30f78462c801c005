"""Final chain decomposition: is E's +0.69 ms/step the cond machinery or
real rebins firing every chunk?

I: fori(15) x [fori(16) + cond(flag, identity, identity)]  -> pure cond cost
R: fori(15) x [fori(16) + cond(flag, rebin)] with a counter -> rebin count
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


def main():
    n = 262144
    sim, st0, dt = build(n, dx=1.0 / 128)
    dtj = jnp.float32(dt)
    cfg = BinnedConfig2(bins_capacity=2560, block_capacity=2048)
    bst = jax.block_until_ready(jax.jit(lambda s: bin_state(sim, s, cfg))(st0))
    chain = 240

    def stepf(t):
        return explicit_step_binned2(sim, t, dtj, cfg, rebin=False)

    def timed(label, fn, s0):
        f = jax.jit(fn)
        out = f(s0)
        jax.block_until_ready(jax.device_get(out[0].cols.reshape(-1)[0]))
        best, s = float("inf"), out
        for _ in range(3):
            t0 = time.perf_counter()
            s = f((s[0], s[1]))
            got = jax.device_get((s[0].cols.reshape(-1)[0], s[1]))
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best*1e3/chain:.3f} ms/step  "
              f"{n*chain/best/1e6:.1f} M pps  count={int(got[1])}",
              flush=True)

    def I(c):
        def chunk(_, ck):
            t, cnt = ck
            t = jax.lax.fori_loop(0, 16, lambda __, u: stepf(u), t)
            cnt = cnt + t.needs_rebin.astype(jnp.int32)
            t = jax.lax.cond(t.needs_rebin, lambda u: u, lambda u: u, t)
            return t, cnt
        return jax.lax.fori_loop(0, 15, chunk, c)

    def R(c):
        def chunk(_, ck):
            t, cnt = ck
            t = jax.lax.fori_loop(0, 16, lambda __, u: stepf(u), t)
            cnt = cnt + t.needs_rebin.astype(jnp.int32)
            t = jax.lax.cond(t.needs_rebin,
                             lambda u: _rebin(sim, u, cfg), lambda u: u, t)
            return t, cnt
        return jax.lax.fori_loop(0, 15, chunk, c)

    timed("I cond-identity", I, (bst, jnp.int32(0)))
    timed("R cond-rebin + count", R, (bst, jnp.int32(0)))


if __name__ == "__main__":
    main()
