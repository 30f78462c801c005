"""v1 vs v2 binned MPM step time at 256k on the real chip."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms
from examples.mpm_block import build
from zpc_tpu.sim.mpm_binned import BinnedConfig, explicit_step_binned
from zpc_tpu.sim.mpm_binned2 import (BinnedConfig2, _rebin, bin_state,
                                     explicit_step_binned2)


def main():
    n = 262144
    sim, st, dt = build(n, dx=1.0 / 128)
    dtj = jnp.float32(dt)

    cfg1 = BinnedConfig(bins_capacity=4096)

    def v1(_, c):
        s, ov = c
        s2, ov2 = explicit_step_binned(sim, s, dtj, cfg1)
        return s2, ov | ov2
    ms1 = chained_ms(v1, (st, jnp.bool_(False)), iters=10,
                     label="v1 binned step")
    print(f"    v1 -> {n / (ms1 / 1e3) / 1e6:.1f} M pps", flush=True)

    for nbins, nb in [(2560, 2048), (4096, 4096)]:
        cfg2 = BinnedConfig2(bins_capacity=nbins, block_capacity=nb)
        bst = jax.block_until_ready(
            jax.jit(lambda s: bin_state(sim, s, cfg2))(st))

        def v2(_, s):
            s = jax.lax.cond(s.needs_rebin,
                             lambda t: _rebin(sim, t, cfg2), lambda t: t, s)
            return explicit_step_binned2(sim, s, dtj, cfg2, rebin=False)
        ms2 = chained_ms(v2, bst, iters=10,
                         label=f"v2 adaptive (bins={nbins}, nb={nb})")
        print(f"    v2 -> {n / (ms2 / 1e3) / 1e6:.1f} M pps", flush=True)

        def v2f(_, s):
            return explicit_step_binned2(sim, s, dtj, cfg2, rebin=True)
        ms3 = chained_ms(v2f, bst, iters=10,
                         label=f"v2 rebin-every-step")
        print(f"    v2f -> {n / (ms3 / 1e3) / 1e6:.1f} M pps", flush=True)


if __name__ == "__main__":
    main()
