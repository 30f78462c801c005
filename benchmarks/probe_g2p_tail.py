"""Probe: G2P a-contraction tail variants.

The optimized HLO shows the production tail (Pv = Pcat.reshape 5-D +
"bka,bkvac->bkvc") costs a 94 MB layout copy of Pcat plus [B,K,3,8,3]
broadcast-multiply traffic.  Variant: four einsums on contiguous 24-lane
slices of Pcat (no 5-D reshape) — same math, different lowering.
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
from zpc_tpu.sim import mpm_binned2 as m2
from zpc_tpu.sim.mpm_binned2 import (BinnedConfig2, K, bin_state,
                                     explicit_step_binned2)

_PREC = jax.lax.Precision.HIGH


def g2p_sliced(ctx, gv):
    from zpc_tpu.ops.spill_tables import _PULL_ALL

    B = ctx.cfg.bins_capacity
    side, sq = ctx.side, ctx.side * ctx.side
    nb = ctx.table.capacity
    if ctx.use_seg:
        safe = jnp.clip(ctx.tgt8, 0, nb - 1)
        Vd = jnp.where((ctx.tgt8 >= 0)[..., None, None], gv[safe], 0.0)
    else:
        Vd = jax.lax.dot_general(
            ctx.sel, gv.reshape(nb, 64 * 3),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PREC,
        ).reshape(8, B, 64, 3)
    if side == 8:
        Vbin = Vd.reshape(2, 2, 2, B, 4, 4, 4, 3).transpose(
            3, 0, 4, 1, 5, 2, 6, 7).reshape(B, 512, 3)
    else:
        pull = jnp.asarray(_PULL_ALL[:, :, :64])
        Vbin = jnp.einsum("dst,dnte->nse", pull, Vd, precision=_PREC,
                          preferred_element_type=jnp.float32)
    Vac = jnp.moveaxis(Vbin.reshape(B, side, sq, 3), 1, 2
                       ).reshape(B, sq, 3 * side)
    A3 = 3 * side
    Vcat = jnp.concatenate([Vac, ctx.fy_m[None, :, None] * Vac,
                            ctx.fz_m[None, :, None] * Vac], axis=-1)
    Pcat = jnp.einsum("bkm,bmA->bkA", ctx.S0, Vcat, precision=_PREC,
                      preferred_element_type=jnp.float32)   # [B,K,9side]

    def ac(w, P24):
        return jnp.einsum("bka,bkac->bkc", w,
                          P24.reshape(B, K, side, 3))
    s0 = ac(ctx.wx, Pcat[..., 0:A3])
    sy = ac(ctx.wx, Pcat[..., A3:2 * A3])
    sz = ac(ctx.wx, Pcat[..., 2 * A3:])
    sx = ac(ctx.wx_i, Pcat[..., 0:A3])
    return s0, sx, sy, sz


def main():
    n = 262144
    sim, st0, dt = build(n, dx=1.0 / 128)
    dtj = jnp.float32(dt)
    cfg = BinnedConfig2(bins_capacity=2560, block_capacity=2048)
    bst = jax.block_until_ready(
        jax.jit(lambda s: bin_state(sim, s, cfg))(st0))
    prod = m2._ctx_g2p

    def run(label):
        def body(i, s):
            return explicit_step_binned2(sim, s, dtj, cfg, rebin=False)
        ms = chained_ms(body, bst, iters=10, marginal=True, label=label)
        print(f"  -> {n / (ms / 1e3) / 1e6:.2f} M pps", flush=True)

    ref = jax.jit(lambda s: explicit_step_binned2(sim, s, dtj, cfg,
                                                  rebin=False))(bst)
    run("step production")
    m2._ctx_g2p = g2p_sliced
    got = jax.jit(lambda s: explicit_step_binned2(sim, s, dtj, cfg,
                                                  rebin=False))(bst)
    print(f"sliced tail: max|cols diff| = "
          f"{float(jnp.max(jnp.abs(got.cols - ref.cols))):.3e}", flush=True)
    run("step g2p sliced tail")
    m2._ctx_g2p = prod


if __name__ == "__main__":
    main()
