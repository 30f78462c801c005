"""Stage breakdown of the v2 binned step (256k, bins=2560): where do the
~46 ms go?  Mirrors _step3d's stages as successive chained programs and
reports the deltas.  Run on the chip."""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms, dep_scalar
from examples.mpm_block import build
from zpc_tpu.sim.mpm_binned2 import (BinnedConfig2, SIDE, K, _axis_stencils,
                                     _rebin, _spill_sel, bin_state,
                                     explicit_step_binned2)
from zpc_tpu.sim.mpm_binned import BIN_SIZE
from zpc_tpu.geometry.sparse_grid import neighbor_offsets
from zpc_tpu.geometry.collider import resolve_boundaries

_PREC = jax.lax.Precision.HIGHEST


def main():
    n = 262144
    sim, st0, dt = build(n, dx=1.0 / 128)
    dtj = jnp.float32(dt)
    # slack=0: the stage replica below mirrors the 6-node-window math
    cfg = BinnedConfig2(bins_capacity=2560, block_capacity=2048, slack=0)
    bst = jax.block_until_ready(
        jax.jit(lambda s: bin_state(sim, s, cfg))(st0))

    def upto(stage):
        """Build a chained body computing the step UP TO `stage`, with a
        dep-scalar folded back into the carried cols."""
        def body(i, st):
            grid = st.grid
            table = grid.table
            nbq = cfg.bins_capacity
            nb = table.capacity
            dx = grid.dx
            origin_w = grid.transform.matrix[:3, 3]
            B, L = nbq, nbq * K
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
            bin_block = jnp.where(bin_live, table.query(
                jnp.floor_divide(jnp.floor(
                    (xb[:, 0, :] - origin_w) / dx - 0.5).astype(jnp.int32),
                    4)), -1)
            bin_block_safe = jnp.clip(bin_block, 0, nb - 1)
            borigin = table.active_coords[bin_block_safe] * 4
            xib = (xb - origin_w) / dx
            ws, wis, rel0i = _axis_stencils(xib, borigin)
            wx, wy, wz = ws
            wx_i, wy_i, wz_i = wis
            rel0 = rel0i * dx
            wx = wx * lane_alive[..., None]
            wx_i = wx_i * lane_alive[..., None]
            if stage == "stencil":
                return _fold(st, dep_scalar(wx) + dep_scalar(rel0))
            Dinv = 4.0 / (dx * dx)
            tau = sim.model.kirchhoff(Fb)
            A = mban[..., None, None] * Cb - \
                (dt * Dinv * volb)[..., None, None] * tau
            u0 = mban[..., None] * vb + jnp.einsum("bkij,bkj->bki", A, rel0)
            Q0 = jnp.concatenate([mban[..., None], u0], -1)
            zero = jnp.zeros_like(mban)[..., None]
            QA = [jnp.concatenate([zero, dx * A[..., :, d]], -1)
                  for d in range(3)]

            def plane_scale(w6, q):
                return (w6[..., :, None] * q[..., None, :]).reshape(
                    B, K, 24)

            R1 = plane_scale(wx, Q0) + plane_scale(wx_i, QA[0])
            R2 = plane_scale(wx, QA[1])
            R3 = plane_scale(wx, QA[2])
            S0 = (wy[:, :, :, None] * wz[:, :, None, :]).reshape(B, K, 36)
            S1 = (wy_i[:, :, :, None] * wz[:, :, None, :]).reshape(B, K, 36)
            S2 = (wy[:, :, :, None] * wz_i[:, :, None, :]).reshape(B, K, 36)
            if stage == "pack":
                eps = dep_scalar(R1) + dep_scalar(S0)
                return _fold(st, eps)
            Sstack = jnp.concatenate([S0, S1, S2], axis=1)
            Rstack = jnp.concatenate([R1, R2, R3], axis=1)
            out = jnp.einsum("bkm,bkA->bmA", Sstack, Rstack,
                             precision=_PREC,
                             preferred_element_type=jnp.float32)
            cube = jnp.moveaxis(out.reshape(B, 36, SIDE, 4), 2, 1
                                ).reshape(B, SIDE ** 3, 4)
            if stage == "p2g":
                return _fold(st, dep_scalar(cube))
            from zpc_tpu.ops.spill_tables import _PULL_ALL, _SPILL_ALL
            sel, tgt8, use_seg = _spill_sel(table, bin_block_safe,
                                            bin_live, nb, cfg)
            spill = jnp.asarray(_SPILL_ALL[:, :, :216])
            spilled = jnp.einsum("dts,nsc->dntc", spill, cube,
                                 precision=_PREC,
                                 preferred_element_type=jnp.float32)
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
            raise ValueError(stage)

        return body

    def _fold(st, eps):
        import dataclasses
        return dataclasses.replace(st, cols=st.cols + eps)

    ms_full = chained_ms(
        lambda i, s: explicit_step_binned2(sim, s, dtj, cfg, rebin=False),
        bst, iters=10, label="full step (no rebin)")

    def reb(i, s):
        return _rebin(sim, s, cfg)
    ms_rebin = chained_ms(reb, bst, iters=10, label="rebin alone")

    prev = 0.0
    for stage in ["stencil", "pack", "p2g", "spill", "grid"]:
        ms = chained_ms(upto(stage), bst, iters=10, label=f"upto {stage}")
        print(f"    delta {stage}: {ms - prev:+.2f} ms", flush=True)
        prev = ms
    print(f"full {ms_full:.2f} ms, rebin {ms_rebin:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
