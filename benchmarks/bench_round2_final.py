"""Round-2 closing measurements in one process: banded-join extraction
variants at 1M, kminor MPM step, 16M primitives."""

import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms, dep_scalar


def bvh_rows():
    from zpc_tpu.containers.bvh import (build_lbvh_complete,
                                        query_overlaps_sorted)
    n = 1 << 20
    rng = np.random.default_rng(0)
    c = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    h = np.full((n, 3), 0.002, np.float32)
    lo = jnp.asarray(c - h)
    hi = jnp.asarray(c + h)
    bvh = jax.block_until_ready(jax.jit(build_lbvh_complete)(lo, hi))
    qlo = lo - 0.004
    qhi = hi + 0.004

    for mode in ("scan", "none"):
        def q(i, qq, consts):
            b, = consts
            ql, qh = qq
            qid, hits, cnt, ok = query_overlaps_sorted(
                b, ql, qh, 16, tile=256, group=32, extract=mode)
            eps = dep_scalar(cnt)
            if mode != "none":
                eps = eps + dep_scalar(hits[:, 0])
            return ql + eps, qh + eps
        ms = chained_ms(q, (qlo, qhi), iters=3, const=(bvh,),
                        label=f"banded join 1M extract={mode}")
        print(f"    -> {n / (ms / 1e3) / 1e6:.2f} Mq/s", flush=True)


def mpm_row():
    from examples.mpm_block import build
    from zpc_tpu.sim.mpm_binned2 import (BinnedConfig2, _rebin, bin_state,
                                         explicit_step_binned2)
    n = 262144
    sim, st, dt = build(n, dx=1.0 / 128)
    dtj = jnp.float32(dt)
    # (kminor layout option removed in round 3 after measuring slower;
    # docs/design.md "negative result")
    cfg = BinnedConfig2(bins_capacity=2560, block_capacity=2048)
    bst = jax.block_until_ready(
        jax.jit(lambda s: bin_state(sim, s, cfg))(st))

    def v2(_, s):
        s = jax.lax.cond(s.needs_rebin,
                         lambda t: _rebin(sim, t, cfg), lambda t: t, s)
        return explicit_step_binned2(sim, s, dtj, cfg, rebin=False)
    ms = chained_ms(v2, bst, iters=10, label="v2 adaptive")
    print(f"    -> {n / (ms / 1e3) / 1e6:.1f} M pps", flush=True)


def primitives_16m():
    from benchmarks.bench_primitives import run
    run(1 << 24, "16M")


def main():
    mpm_row()
    bvh_rows()
    primitives_16m()


if __name__ == "__main__":
    main()
