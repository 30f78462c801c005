"""Round 4: attribute the 256k -> 1M per-particle falloff (11.2 -> 17.8
ns/particle-step measured by probe_1m.py; rebins fire ZERO times at both
scales, so the bare step itself scales badly).

Method = round-3 ablation (probe_r3_ablate.py): replace one stage with a
traced-scalar broadcast of the same shape and attribute by subtraction,
run at BOTH scales.  Adds two isolated microbenches for the only indexed
ops in the step — the spill segment_sum ([8B] rows -> [nb] blocks) and
the G2P row gather (gv[tgt8]) — since indexed memory ops are the usual
TPU suspect and both scale with B*nb pattern entropy, not FLOPs.
"""

import dataclasses
import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms, dep_scalar
from examples.mpm_block import build
from zpc_tpu.geometry.collider import resolve_boundaries
from zpc_tpu.math.vecmat import mm
from zpc_tpu.sim import mpm_binned2 as m2
from zpc_tpu.sim.mpm_binned2 import (BinnedConfig2, K, _ctx_g2p, _ctx_p2g,
                                     _make_ctx3, _node_positions,
                                     _spill_reduce, bin_state)


def run_scale(n, bins, blocks):
    tag = f"{n >> 10}k"
    sim, st0, dt = build(n, dx=1.0 / 128, block_capacity=blocks) \
        if blocks != 2048 else build(n, dx=1.0 / 128)
    dtj = jnp.float32(dt)
    cfg = BinnedConfig2(bins_capacity=bins, block_capacity=blocks)
    B = cfg.bins_capacity
    nb = blocks
    bst = jax.block_until_ready(
        jax.jit(lambda s: bin_state(sim, s, cfg))(st0))

    def step_variant(mode):
        def body(i, st):
            dx = st.grid.dx
            cols = st.cols.reshape(B, K, -1)
            xb = cols[..., 0:3]
            vb = cols[..., 3:6]
            Fb = cols[..., 6:15].reshape(B, K, 3, 3)
            Cb = cols[..., 15:24].reshape(B, K, 3, 3)
            lane_alive = (st.pid >= 0).reshape(B, K)
            mban = jnp.where(lane_alive, cols[..., 24], 0.0)
            volb = jnp.where(lane_alive, cols[..., 25], 0.0)
            ctx = _make_ctx3(st, cfg)
            tr = 1.0 + 1e-30 * st.max_vel      # traced, ~1.0, blocks DCE
            if mode == "const_stencils":
                sq = cfg.side * cfg.side
                ctx = dataclasses.replace(
                    ctx,
                    S0=jnp.full((B, K, sq), 0.015625) * tr,
                    wx=jnp.full((B, K, cfg.side), 0.125) * tr,
                    wx_i=jnp.full((B, K, cfg.side), 0.125) * tr)
            Dinv = 4.0 / (dx * dx)
            if mode == "no_tau":
                tau = Fb * tr
            else:
                tau = sim.model.kirchhoff(Fb)
            A = mban[..., None, None] * Cb - \
                (dtj * Dinv * volb)[..., None, None] * tau
            u0 = mban[..., None] * vb + jnp.einsum("bkij,bkj->bki", A,
                                                   ctx.rel0)
            Q0 = jnp.concatenate([mban[..., None], u0], -1)
            zero = jnp.zeros_like(mban)[..., None]
            QA = [dx * A[..., :, d] for d in range(3)]
            if mode == "no_p2g":
                acc = tr * 1e-30 * jnp.ones((nb, 64, 4), jnp.float32)
            elif mode == "p2g_nospill":
                # full plane einsums, spill replaced by a slice: isolates
                # the _spill_reduce cost (transpose + segment_sum)
                C = 4
                side, sq = cfg.side, cfg.side * cfg.side

                def plane_scale(w6, q):
                    return (w6[..., :, None] * q[..., None, :]).reshape(
                        B, K, q.shape[-1] * side)

                def dot(R):
                    return jnp.einsum("bkm,bkA->bmA", ctx.S0, R,
                                      precision=jax.lax.Precision.HIGHEST,
                                      preferred_element_type=jnp.float32)
                qa0 = jnp.pad(QA[0], [(0, 0)] * 2 + [(1, 0)])
                R1 = plane_scale(ctx.wx, Q0) + plane_scale(ctx.wx_i, qa0)
                out = dot(R1).reshape(B, sq, side, C)
                o1 = dot(plane_scale(ctx.wx, QA[1])).reshape(
                    B, sq, side, 3)
                o2 = dot(plane_scale(ctx.wx, QA[2])).reshape(
                    B, sq, side, 3)
                pad = [(0, 0)] * 3 + [(1, 0)]
                out = (out + ctx.fy_m[None, :, None, None] * jnp.pad(o1, pad)
                       + ctx.fz_m[None, :, None, None] * jnp.pad(o2, pad))
                cube = jnp.moveaxis(out, 2, 1).reshape(B, side ** 3, C)
                acc = cube[:nb, :64] * tr
            else:
                acc = _ctx_p2g(ctx, Q0, QA)
            gm = acc[..., 0]
            gmv = acc[..., 1:]
            has_mass = gm > 0.0
            gv = jnp.where(has_mass[..., None],
                           gmv / jnp.maximum(gm, 1e-30)[..., None], 0.0)
            gv = gv + dtj * sim.gravity[None, None, :]
            if mode != "no_collider":
                gv = resolve_boundaries(sim.colliders,
                                        _node_positions(ctx), gv)
            gv = jnp.where(has_mass[..., None], gv, 0.0)
            max_vel = jnp.sqrt(jnp.max(jnp.sum(gv * gv, -1)))
            if mode == "no_g2p":
                z = tr * 1e-30 * jnp.ones((B, K, 3), jnp.float32) + \
                    1e-30 * gv[0, 0, 0]
                s0, sx, sy, sz = z, z, z, z
            elif mode == "g2p_nogather":
                # replace the [8,B] row gather gv[tgt8] with a broadcast
                # of one row: isolates the gather cost inside _ctx_g2p
                ctx2 = dataclasses.replace(
                    ctx, use_seg=True,
                    tgt8=jnp.zeros_like(ctx.tgt8))
                s0, sx, sy, sz = _ctx_g2p(ctx2, gv)
            else:
                s0, sx, sy, sz = _ctx_g2p(ctx, gv)
            v_new = s0
            Bmat = v_new[..., :, None] * ctx.rel0[..., None, :] + \
                dx * jnp.stack([sx, sy, sz], axis=-1)
            C_new = Dinv * Bmat
            eye = jnp.eye(3, dtype=Fb.dtype)
            if mode == "no_fupdate":
                F_new = Fb * tr
            else:
                F_new = mm(eye + dtj * C_new, Fb)
            x_new = xb + dtj * v_new
            base_new = jnp.floor((x_new - ctx.origin_w) / dx - 0.5
                                 ).astype(jnp.int32)
            off_new = base_new - ctx.borigin[:, None, :]
            escaped = jnp.any(lane_alive[..., None] &
                              ((off_new < 0) | (off_new > cfg.side - 3)))
            ok3 = lane_alive[..., None]
            newcols = [jnp.where(ok3, x_new, xb),
                       jnp.where(ok3, v_new, vb),
                       jnp.where(ok3[..., None], F_new, Fb).reshape(
                           B, K, 9),
                       jnp.where(ok3[..., None], C_new, Cb).reshape(
                           B, K, 9),
                       mban[..., None], volb[..., None]]
            ncols = jnp.concatenate(newcols, axis=-1).reshape(B * K, -1)
            grid = dataclasses.replace(st.grid, data={"m": gm, "v": gv})
            return dataclasses.replace(st, cols=ncols, grid=grid,
                                       max_vel=max_vel,
                                       overflow=st.overflow,
                                       needs_rebin=jnp.bool_(False))
        return body

    full = chained_ms(step_variant("full"), bst, iters=10,
                      label=f"{tag} step full", marginal=True)
    print(f"    -> {1e6 * full / n * 1e3:6.1f} ns/p", flush=True)
    for mode in ["no_p2g", "p2g_nospill", "no_g2p", "g2p_nogather",
                 "const_stencils", "no_collider", "no_tau", "no_fupdate"]:
        ms = chained_ms(step_variant(mode), bst, iters=10,
                        label=f"{tag} step {mode}", marginal=True)
        print(f"    -> {mode} saves {full - ms:+.2f} ms", flush=True)

    # ---- isolated microbenches of the indexed ops -----------------------
    rng = np.random.default_rng(0)
    # the real per-step seg pattern: tgt8 from the binned state
    ctx = jax.jit(lambda s: _make_ctx3(s, cfg).tgt8)(bst)
    tgt8 = jax.block_until_ready(ctx)
    pay = jnp.asarray(rng.standard_normal((8 * B, 256)).astype(np.float32))

    def segb(i, c, consts):
        t8, = consts
        p, = c
        seg = jnp.where(t8 >= 0, t8, nb).reshape(-1)
        acc = jax.ops.segment_sum(p, seg, num_segments=nb + 1)[:nb]
        return (p + dep_scalar(acc),)
    ms = chained_ms(segb, (pay,), iters=10, const=(tgt8,),
                    label=f"{tag} segment_sum [8B,256]->[nb]",
                    marginal=True)
    print(f"    -> {pay.size * 4 / (ms / 1e3) / 1e9:.1f} GB/s payload",
          flush=True)

    gvv = jnp.asarray(rng.standard_normal((nb, 64, 3)).astype(np.float32))

    def gath(i, c, consts):
        t8, gvx = consts
        p, = c
        safe = jnp.clip(t8, 0, nb - 1)
        Vd = jnp.where((t8 >= 0)[..., None, None], gvx[safe], 0.0)
        return (p + dep_scalar(Vd),)
    ms = chained_ms(gath, (pay[:, :1],), iters=10, const=(tgt8, gvv),
                    label=f"{tag} row gather gv[tgt8] [8B,64,3]",
                    marginal=True)
    print(f"    -> {8 * B * 64 * 3 * 4 / (ms / 1e3) / 1e9:.1f} GB/s "
          "gathered", flush=True)


def main():
    for n, bins, blocks in ((262144, 2560, 2048), (1048576, 9216, 8192)):
        run_scale(n, bins, blocks)


if __name__ == "__main__":
    main()
