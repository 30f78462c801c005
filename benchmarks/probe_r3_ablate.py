"""Ablation profile of the v2 step: replace one stage at a time with a
traced-scalar broadcast (same shapes, no DCE, no dep_scalar reductions)
and attribute cost by subtraction from the full-chain time.

Also calibrates true achievable stream bandwidth (carry-the-array chains
with no reductions).
"""

import dataclasses
import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms
from examples.mpm_block import build
from zpc_tpu.geometry.collider import resolve_boundaries
from zpc_tpu.sim import mpm_binned2 as m2
from zpc_tpu.sim.mpm_binned2 import (BinnedConfig2, K, _ctx_g2p, _ctx_p2g,
                                     _make_ctx3, _node_positions,
                                     bin_state, explicit_step_binned2)


def main():
    rng = np.random.default_rng(0)

    # -- calibration: pure stream, no reductions --------------------------
    big = jnp.asarray(rng.standard_normal((327680, 128)).astype(np.float32))

    def stream(i, c):
        x, = c
        return (x * 1.0000001,)
    ms = chained_ms(stream, (big,), iters=20, label="pure stream 168MB")
    print(f"    -> {2 * big.size * 4 / (ms / 1e3) / 1e9:.0f} GB/s",
          flush=True)

    w8 = jnp.asarray(rng.standard_normal((2560, 128, 8)).astype(np.float32))
    ms = chained_ms(stream, (w8,), iters=20, label="pure stream [B,K,8]")
    print(f"    -> logical {2 * w8.size * 4 / (ms / 1e3) / 1e9:.0f} GB/s",
          flush=True)

    # -- ablations ----------------------------------------------------------
    n = 262144
    sim, st0, dt = build(n, dx=1.0 / 128)
    dtj = jnp.float32(dt)
    cfg = BinnedConfig2(bins_capacity=2560, block_capacity=2048)
    B = cfg.bins_capacity
    bst = jax.block_until_ready(
        jax.jit(lambda s: bin_state(sim, s, cfg))(st0))

    def step_variant(mode):
        def body(i, st):
            dx = st.grid.dx
            nb = st.grid.table.capacity
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
            elif mode == "polar_tau":
                from benchmarks.probe_polar import kirchhoff_polar
                tau = kirchhoff_polar(sim.model, Fb, 4)
            else:
                tau = sim.model.kirchhoff(Fb)
            A = mban[..., None, None] * Cb - \
                (dtj * Dinv * volb)[..., None, None] * tau
            u0 = mban[..., None] * vb + jnp.einsum("bkij,bkj->bki", A,
                                                   ctx.rel0)
            Q0 = jnp.concatenate([mban[..., None], u0], -1)
            zero = jnp.zeros_like(mban)[..., None]
            QA = [jnp.concatenate([zero, dx * A[..., :, d]], -1)
                  for d in range(3)]
            if mode == "no_p2g":
                acc = tr * 1e-30 * jnp.ones((nb, 64, 4), jnp.float32)
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
            else:
                s0, sx, sy, sz = _ctx_g2p(ctx, gv)
            v_new = s0
            Bmat = v_new[..., :, None] * ctx.rel0[..., None, :] + \
                dx * jnp.stack([sx, sy, sz], axis=-1)
            C_new = Dinv * Bmat
            eye = jnp.eye(3, dtype=Fb.dtype)
            from zpc_tpu.math.vecmat import mm
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
                      label="step full (ablation copy)", marginal=True)
    for mode in ["no_p2g", "no_g2p", "const_stencils", "no_collider",
                 "no_fupdate", "no_tau", "polar_tau"]:
        ms = chained_ms(step_variant(mode), bst, iters=10,
                        label=f"step {mode}", marginal=True)
        print(f"    -> {mode} saves {full - ms:+.2f} ms", flush=True)


if __name__ == "__main__":
    main()
