"""Stage the v2 binned-MPM program through the remote TPU compiler to
isolate which construct blows compile time (>30 min for the full chained
program vs 9 s on CPU).  Each stage compiles one increment and prints a
timestamped line; run in background and poll."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples.mpm_block import build
from zpc_tpu.sim.mpm_binned2 import (BinnedConfig2, _rebin, bin_state,
                                     explicit_step_binned2)


def stamp(msg, t0):
    print(f"[{time.time() - t0:8.1f}s] {msg}", flush=True)


def main():
    t0 = time.time()
    n = 262144
    sim, st, dt = build(n, dx=1.0 / 128)
    dtj = jnp.float32(dt)
    cfg2 = BinnedConfig2(bins_capacity=2560, block_capacity=2048)
    stamp("built inputs", t0)

    bst = jax.jit(lambda s: bin_state(sim, s, cfg2))(st)
    jax.block_until_ready(bst.x)
    stamp("A: bin_state compiled+ran", t0)

    f1 = jax.jit(lambda s: explicit_step_binned2(sim, s, dtj, cfg2,
                                                 rebin=False))
    s1 = f1(bst)
    jax.block_until_ready(s1.x)
    stamp("B: single step (rebin=False) compiled+ran", t0)

    f2 = jax.jit(lambda s: explicit_step_binned2(sim, s, dtj, cfg2,
                                                 rebin=True))
    s2 = f2(bst)
    jax.block_until_ready(s2.x)
    stamp("C: single step (rebin=True) compiled+ran", t0)

    def body_norebin(_, s):
        return explicit_step_binned2(sim, s, dtj, cfg2, rebin=False)

    f3 = jax.jit(lambda s: jax.lax.fori_loop(0, 10, body_norebin, s))
    s3 = f3(bst)
    jax.block_until_ready(s3.x)
    stamp("D: fori_loop(10) no-cond compiled+ran", t0)

    def body_cond(_, s):
        s = jax.lax.cond(s.needs_rebin, lambda u: _rebin(sim, u, cfg2),
                         lambda u: u, s)
        return explicit_step_binned2(sim, s, dtj, cfg2, rebin=False)

    f4 = jax.jit(lambda s: jax.lax.fori_loop(0, 10, body_cond, s))
    s4 = f4(bst)
    jax.block_until_ready(s4.x)
    stamp("E: fori_loop(10) + cond(_rebin) compiled+ran", t0)

    # timing once everything is warm
    for name, f, x in [("D", f3, s3), ("E", f4, s4)]:
        import numpy as np
        t1 = time.time()
        y = f(x)
        np.asarray(jax.device_get(y.x.reshape(-1)[0]))
        ms = (time.time() - t1) / 10 * 1e3
        stamp(f"{name}: {ms:.2f} ms/step -> {n / (ms / 1e3) / 1e6:.1f} Mpps",
              t0)


if __name__ == "__main__":
    main()
