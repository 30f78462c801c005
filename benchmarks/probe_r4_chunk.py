"""Round 4: measure the chunked transfer pipeline (BinnedConfig2.chunk_bins)
at 1M and 256k — the S(1)-spill fix identified by probe_r4_hlo.py."""

import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms
from examples.mpm_block import build
from zpc_tpu.sim.mpm_binned2 import (BinnedConfig2, bin_state,
                                     explicit_step_binned2)


def run(n, bins, blocks, chunks):
    tag = f"{n >> 10}k"
    sim, st0, dt = build(n, dx=1.0 / 128, block_capacity=blocks) \
        if blocks != 2048 else build(n, dx=1.0 / 128)
    dtj = jnp.float32(dt)
    for ch in chunks:
        cfg = BinnedConfig2(bins_capacity=bins, block_capacity=blocks,
                            chunk_bins=ch)
        bst = jax.block_until_ready(
            jax.jit(lambda s: bin_state(sim, s, cfg))(st0))

        def bare(_, s):
            return explicit_step_binned2(sim, s, dtj, cfg, rebin=False)
        ms = chained_ms(bare, bst, iters=10, marginal=True,
                        label=f"{tag} chunk={ch or 'off':>5}")
        print(f"    -> {1e6 * ms / n * 1e3:6.1f} ns/p "
              f"({n / (ms / 1e3) / 1e6:.1f} M pps)", flush=True)


def main():
    run(1048576, 9216, 8192, (512, 256, 128))
    run(262144, 2560, 2048, (512, 256, 128))


if __name__ == "__main__":
    main()
