"""Round-3 stage breakdown of the current v2 step (direct-eval stencils,
single-S0-read einsums) at 256k, plus a rebin breakdown.

Stages reuse the production helpers (_make_ctx3/_ctx_p2g/_ctx_g2p) so the
profile measures exactly what ships.
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
from zpc_tpu.sim.mpm_binned2 import (BinnedConfig2, K, _ctx_g2p, _ctx_p2g,
                                     _make_ctx3, _node_positions, _rebin,
                                     bin_state, explicit_step_binned2)
from zpc_tpu.geometry.collider import resolve_boundaries


def _fold(st, eps):
    return dataclasses.replace(st, cols=st.cols + eps)


def main():
    n = 262144
    sim, st0, dt = build(n, dx=1.0 / 128)
    dtj = jnp.float32(dt)
    cfg = BinnedConfig2(bins_capacity=2560, block_capacity=2048)
    B = cfg.bins_capacity
    bst = jax.block_until_ready(
        jax.jit(lambda s: bin_state(sim, s, cfg))(st0))

    def upto(stage):
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
            if stage == "ctx":
                return _fold(st, dep_scalar(ctx.S0) + dep_scalar(ctx.wx_i))
            Dinv = 4.0 / (dx * dx)
            tau = sim.model.kirchhoff(Fb)
            A = mban[..., None, None] * Cb - \
                (dtj * Dinv * volb)[..., None, None] * tau
            u0 = mban[..., None] * vb + jnp.einsum("bkij,bkj->bki", A,
                                                   ctx.rel0)
            Q0 = jnp.concatenate([mban[..., None], u0], -1)
            zero = jnp.zeros_like(mban)[..., None]
            QA = [jnp.concatenate([zero, dx * A[..., :, d]], -1)
                  for d in range(3)]
            acc = _ctx_p2g(ctx, Q0, QA)
            if stage == "p2g":
                return _fold(st, dep_scalar(acc))
            gm = acc[..., 0]
            gmv = acc[..., 1:]
            has_mass = gm > 0.0
            gv = jnp.where(has_mass[..., None],
                           gmv / jnp.maximum(gm, 1e-30)[..., None], 0.0)
            gv = gv + dtj * sim.gravity[None, None, :]
            gv = resolve_boundaries(sim.colliders, _node_positions(ctx), gv)
            gv = jnp.where(has_mass[..., None], gv, 0.0)
            if stage == "grid":
                return _fold(st, dep_scalar(gv))
            s0, sx, sy, sz = _ctx_g2p(ctx, gv)
            if stage == "g2p":
                return _fold(st, dep_scalar(s0) + dep_scalar(sx) +
                             dep_scalar(sy) + dep_scalar(sz))
            raise ValueError(stage)
        return body

    ms_full = chained_ms(
        lambda i, s: explicit_step_binned2(sim, s, dtj, cfg, rebin=False),
        bst, iters=10, label="full step (r3)")
    prev = 0.0
    for stage in ["ctx", "p2g", "grid", "g2p"]:
        ms = chained_ms(upto(stage), bst, iters=10, label=f"upto {stage}")
        print(f"    delta {stage}: {ms - prev:+.2f} ms", flush=True)
        prev = ms
    print(f"full {ms_full:.2f} ms (tail = {ms_full - prev:+.2f})",
          flush=True)

    ms_rebin = chained_ms(lambda i, s: _rebin(sim, s, cfg), bst, iters=6,
                          label="rebin (sort+table)")
    print(f"rebin {ms_rebin:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
