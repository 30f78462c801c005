"""Stage breakdown of the CURRENT v2 step (slack=1, side=8, reshape
spill/pull) at 256k: where do the 7.9 ms go?"""

import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms, dep_scalar
from examples.mpm_block import build
from zpc_tpu.sim.mpm_binned2 import (BinnedConfig2, K, _axis_stencils,
                                     _spill_sel, bin_state,
                                     explicit_step_binned2)
from zpc_tpu.geometry.sparse_grid import neighbor_offsets
from zpc_tpu.geometry.collider import resolve_boundaries

_PREC = jax.lax.Precision.HIGH


def main():
    n = 262144
    sim, st0, dt = build(n, dx=1.0 / 128)
    cfg = BinnedConfig2(bins_capacity=2560, block_capacity=2048)
    side = cfg.side
    sq = side * side
    bst = jax.block_until_ready(
        jax.jit(lambda s: bin_state(sim, s, cfg))(st0))

    def upto(stage):
        def body(i, st):
            grid = st.grid
            table = grid.table
            nb = table.capacity
            dx = grid.dx
            origin_w = grid.transform.matrix[:3, 3]
            B = cfg.bins_capacity
            cols = st.cols.reshape(B, K, -1)
            xb = cols[..., 0:3]
            vb = cols[..., 3:6]
            Fb = cols[..., 6:15].reshape(B, K, 3, 3)
            Cb = cols[..., 15:24].reshape(B, K, 3, 3)
            mban = cols[..., 24]
            volb = cols[..., 25]
            lane_alive = (st.pid >= 0).reshape(B, K)
            mban = jnp.where(lane_alive, mban, 0.0)
            volb = jnp.where(lane_alive, volb, 0.0)
            bin_live = jnp.any(lane_alive, axis=1)
            bin_block = jnp.where(bin_live, st.bin_block, -1)
            bin_block_safe = jnp.clip(bin_block, 0, nb - 1)
            borigin = table.active_coords[bin_block_safe] * 4
            xib = (xb - origin_w) / dx
            ws, wis, rel0i = _axis_stencils(xib, borigin, side)
            wx, wy, wz = ws
            wx_i, wy_i, wz_i = wis
            rel0 = rel0i * dx
            wx = wx * lane_alive[..., None]
            wx_i = wx_i * lane_alive[..., None]
            if stage == "stencil":
                return _fold(st, dep_scalar(wx) + dep_scalar(wz_i))
            Dinv = 4.0 / (dx * dx)
            tau = sim.model.kirchhoff(Fb)
            A = mban[..., None, None] * Cb - \
                (dt * Dinv * volb)[..., None, None] * tau
            u0 = mban[..., None] * vb + jnp.einsum("bkij,bkj->bki", A,
                                                   rel0)
            Q0 = jnp.concatenate([mban[..., None], u0], -1)
            zero = jnp.zeros_like(mban)[..., None]
            QA = [jnp.concatenate([zero, dx * A[..., :, d]], -1)
                  for d in range(3)]

            def plane_scale(w6, q):
                return (w6[..., :, None] * q[..., None, :]).reshape(
                    B, K, 4 * side)

            R1 = plane_scale(wx, Q0) + plane_scale(wx_i, QA[0])
            R2 = plane_scale(wx, QA[1])
            R3 = plane_scale(wx, QA[2])
            S0 = (wy[:, :, :, None] * wz[:, :, None, :]).reshape(B, K, sq)
            S1 = (wy_i[:, :, :, None] * wz[:, :, None, :]).reshape(
                B, K, sq)
            S2 = (wy[:, :, :, None] * wz_i[:, :, None, :]).reshape(
                B, K, sq)
            if stage == "pack":
                return _fold(st, dep_scalar(R1) + dep_scalar(S0))
            Sstack = jnp.concatenate([S0, S1, S2], axis=1)
            Rstack = jnp.concatenate([R1, R2, R3], axis=1)
            out = jnp.einsum("bkm,bkA->bmA", Sstack, Rstack,
                             precision=_PREC,
                             preferred_element_type=jnp.float32)
            cube = jnp.moveaxis(out.reshape(B, sq, side, 4), 2, 1
                                ).reshape(B, side ** 3, 4)
            if stage == "p2g":
                return _fold(st, dep_scalar(cube))
            sel, tgt8, use_seg = _spill_sel(table, bin_block_safe,
                                            bin_live, nb, cfg)
            spilled = cube.reshape(B, 2, 4, 2, 4, 2, 4, 4).transpose(
                1, 3, 5, 0, 2, 4, 6, 7).reshape(8, B, 64, 4)
            if use_seg:
                seg = jnp.where(tgt8 >= 0, tgt8, nb).reshape(-1)
                acc = jax.ops.segment_sum(
                    spilled.reshape(8 * B, 64 * 4), seg,
                    num_segments=nb + 1)[:nb].reshape(nb, 64, 4)
            else:
                acc = jax.lax.dot_general(
                    sel, spilled.reshape(8 * B, 64 * 4),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_PREC).reshape(nb, 64, 4)
            gm = acc[..., 0]
            gmv = acc[..., 1:]
            if stage == "spill":
                return _fold(st, dep_scalar(gm))
            has_mass = gm > 0.0
            gv = jnp.where(has_mass[..., None],
                           gmv / jnp.maximum(gm, 1e-30)[..., None], 0.0)
            gv = gv + dt * sim.gravity[None, None, :]
            corners = jnp.asarray(neighbor_offsets(3, 0, 3))
            node_x = (table.active_coords[:, None, :] * 4 +
                      corners[None]).astype(gv.dtype) * dx + origin_w
            gv = resolve_boundaries(sim.colliders, node_x, gv)
            gv = jnp.where(has_mass[..., None], gv, 0.0)
            if stage == "grid":
                return _fold(st, dep_scalar(gv))
            if use_seg:
                safe = jnp.clip(tgt8, 0, nb - 1)
                Vd = jnp.where((tgt8 >= 0)[..., None, None], gv[safe],
                               0.0)
            else:
                Vd = jax.lax.dot_general(
                    sel, gv.reshape(nb, 64 * 3),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_PREC).reshape(8, B, 64, 3)
            Vbin = Vd.reshape(2, 2, 2, B, 4, 4, 4, 3).transpose(
                3, 0, 4, 1, 5, 2, 6, 7).reshape(B, 512, 3)
            Vac = jnp.moveaxis(Vbin.reshape(B, side, sq, 3), 1, 2
                               ).reshape(B, sq, 3 * side)
            P0 = jnp.einsum("bkm,bmA->bkA", S0, Vac, precision=_PREC,
                            preferred_element_type=jnp.float32)
            P1 = jnp.einsum("bkm,bmA->bkA", S1, Vac, precision=_PREC,
                            preferred_element_type=jnp.float32)
            P2 = jnp.einsum("bkm,bmA->bkA", S2, Vac, precision=_PREC,
                            preferred_element_type=jnp.float32)
            if stage == "g2p":
                return _fold(st, dep_scalar(P0) + dep_scalar(P2) +
                             dep_scalar(P1))
            raise ValueError(stage)
        return body

    def _fold(st, eps):
        import dataclasses
        return dataclasses.replace(st, cols=st.cols + eps)

    ms_full = chained_ms(
        lambda i, s: explicit_step_binned2(sim, s, jnp.float32(dt), cfg,
                                           rebin=False),
        bst, iters=10, label="full step (slack=1)")
    prev = 0.0
    for stage in ["stencil", "pack", "p2g", "spill", "grid", "g2p"]:
        ms = chained_ms(upto(stage), bst, iters=10, label=f"upto {stage}")
        print(f"    delta {stage}: {ms - prev:+.2f} ms", flush=True)
        prev = ms
    print(f"full {ms_full:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
