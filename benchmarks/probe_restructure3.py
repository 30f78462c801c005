"""Probe: split-plane transfer einsums vs the production stacked forms.

The optimized HLO of the production step shows a 94 MB layout copy of
Pcat ({1,2,0} -> {1,0,2}) feeding the [B,K,3,8,3] a-contraction, plus
outf/Pcat slicing.  Variants here split the stacked contractions into
per-plane einsums (3 reads of S0 instead of 1, but no channel concat on
the [B,K,*] side, no output slicing, and a plain [B,K,8,C] reshape for
the a-contraction).  Monkeypatches mpm_binned2._ctx_p2g/_ctx_g2p so the
production _step3d body is measured unchanged around them.
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
from zpc_tpu.sim.mpm_binned2 import (BinnedConfig2, K, _spill_reduce,
                                     bin_state, explicit_step_binned2)

_PREC = jax.lax.Precision.HIGH


def p2g_split(ctx, Q0, QA=None, squared=False):
    B, Kk, C = Q0.shape
    side, sq = ctx.side, ctx.side * ctx.side
    S0 = ctx.S0
    wx = ctx.wx
    if squared:
        S0 = S0 * S0
        wx = wx * wx

    def plane(w6, q):
        return (w6[..., :, None] * q[..., None, :]).reshape(
            B, Kk, q.shape[-1] * side)

    def dot(R):
        return jnp.einsum("bkm,bkA->bmA", S0, R, precision=_PREC,
                          preferred_element_type=jnp.float32)

    R1 = plane(wx, Q0)
    if QA is not None:
        qa0 = QA[0]
        if qa0.shape[-1] < C:
            qa0 = jnp.pad(qa0, [(0, 0)] * 2 + [(C - qa0.shape[-1], 0)])
        R1 = R1 + plane(ctx.wx_i, qa0)
    out = dot(R1).reshape(B, sq, side, C)
    if QA is not None:
        C1, C2 = QA[1].shape[-1], QA[2].shape[-1]
        o1 = dot(plane(wx, QA[1])).reshape(B, sq, side, C1)
        o2 = dot(plane(wx, QA[2])).reshape(B, sq, side, C2)
        pady = [(0, 0)] * 3 + [(C - C1, 0)]
        padz = [(0, 0)] * 3 + [(C - C2, 0)]
        out = (out + ctx.fy_m[None, :, None, None] * jnp.pad(o1, pady)
               + ctx.fz_m[None, :, None, None] * jnp.pad(o2, padz))
    cube = jnp.moveaxis(out, 2, 1).reshape(B, side ** 3, C)
    return _spill_reduce(ctx, cube, C)


def g2p_split(ctx, gv):
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

    def pc(V):
        p = jnp.einsum("bkm,bmA->bkA", ctx.S0, V, precision=_PREC,
                       preferred_element_type=jnp.float32)
        return p.reshape(B, K, side, 3)

    P0 = pc(Vac)
    Py = pc(ctx.fy_m[None, :, None] * Vac)
    Pz = pc(ctx.fz_m[None, :, None] * Vac)
    s0 = jnp.einsum("bka,bkac->bkc", ctx.wx, P0)
    sy = jnp.einsum("bka,bkac->bkc", ctx.wx, Py)
    sz = jnp.einsum("bka,bkac->bkc", ctx.wx, Pz)
    sx = jnp.einsum("bka,bkac->bkc", ctx.wx_i, P0)
    return s0, sx, sy, sz


def main():
    n = 262144
    sim, st0, dt = build(n, dx=1.0 / 128)
    dtj = jnp.float32(dt)
    cfg = BinnedConfig2(bins_capacity=2560, block_capacity=2048)
    bst = jax.block_until_ready(
        jax.jit(lambda s: bin_state(sim, s, cfg))(st0))

    prod_p2g, prod_g2p = m2._ctx_p2g, m2._ctx_g2p

    def run(label):
        def body(i, s):
            return explicit_step_binned2(sim, s, dtj, cfg, rebin=False)
        ms = chained_ms(body, bst, iters=10, marginal=True, label=label)
        print(f"  -> {n / (ms / 1e3) / 1e6:.2f} M pps", flush=True)
        return ms

    ref = jax.jit(lambda s: explicit_step_binned2(sim, s, dtj, cfg,
                                                  rebin=False))(bst)
    run("step production")

    for name, fp, fg in [("split_g2p", prod_p2g, g2p_split),
                        ("split_p2g", p2g_split, prod_g2p),
                        ("split_both", p2g_split, g2p_split)]:
        m2._ctx_p2g, m2._ctx_g2p = fp, fg
        got = jax.jit(lambda s: explicit_step_binned2(
            sim, s, dtj, cfg, rebin=False))(bst)
        dv = float(jnp.max(jnp.abs(got.cols - ref.cols)))
        print(f"{name}: max|cols diff| = {dv:.3e}", flush=True)
        run(f"step {name}")
    m2._ctx_p2g, m2._ctx_g2p = prod_p2g, prod_g2p


if __name__ == "__main__":
    main()
