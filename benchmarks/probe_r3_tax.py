"""Characterize the ~1.6 ms fixed per-iteration cost seen in every
chained fori_loop measurement (probe_r3_ablate): is it per while-loop
iteration?  Does unrolling the body amortize it?  Does use_segments beat
the one-hot spill reduction?"""

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


def main():
    rng = np.random.default_rng(0)
    tiny = jnp.asarray(rng.standard_normal((128, 128)).astype(np.float32))

    def stream1(i, c):
        x, = c
        return (x * 1.0000001,)

    ms = chained_ms(stream1, (tiny,), iters=20, label="tiny stream x1")
    ms = chained_ms(stream1, (tiny,), iters=40, label="tiny stream x1 i40")

    def stream4(i, c):
        x, = c
        for _ in range(4):
            x = x * 1.0000001
        return (x,)
    ms = chained_ms(stream4, (tiny,), iters=5,
                    label="tiny stream x4-unrolled (per-iter)")
    print(f"    -> per logical op: {ms / 4:.3f} ms", flush=True)

    n = 262144
    sim, st0, dt = build(n, dx=1.0 / 128)
    dtj = jnp.float32(dt)
    cfg = BinnedConfig2(bins_capacity=2560, block_capacity=2048)
    bst = jax.block_until_ready(
        jax.jit(lambda s: bin_state(sim, s, cfg))(st0))

    def one(i, s):
        return explicit_step_binned2(sim, s, dtj, cfg, rebin=False)
    ms1 = chained_ms(one, bst, iters=10, label="step x1")

    def four(i, s):
        for _ in range(4):
            s = explicit_step_binned2(sim, s, dtj, cfg, rebin=False)
        return s
    ms4 = chained_ms(four, bst, iters=3, reps=3,
                     label="step x4-unrolled (per-iter)")
    print(f"    -> per step: {ms4 / 4:.2f} ms", flush=True)

    cfg_seg = BinnedConfig2(bins_capacity=2560, block_capacity=2048,
                            use_segments=True)
    bst2 = jax.block_until_ready(
        jax.jit(lambda s: bin_state(sim, s, cfg_seg))(st0))

    def one_seg(i, s):
        return explicit_step_binned2(sim, s, dtj, cfg_seg, rebin=False)
    chained_ms(one_seg, bst2, iters=10, label="step x1 use_segments")


if __name__ == "__main__":
    main()
