"""Channel-major (colsT [W,B,K]) prototype of the v2 explicit step.

Hypothesis (from the optimized-HLO dump, probe_hlo): ~300 MB/step of the
production step's temps are layout copies shuffling [B,K,C] channel-minor
slices into the K-minor layouts every contraction wants.  This variant
unpacks the particle state ONCE into [W,B,K] channel planes (each [B,K],
K minor by construction), runs all elementwise physics on planes, builds
the transfer operands c-major, and re-packs once.  If it wins by >0.25 ms
at 256k, the layout becomes the production one.
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
from zpc_tpu.geometry.sparse_grid import neighbor_offsets
from zpc_tpu.sim.mpm_binned2 import (BinnedConfig2, K, _spill_sel,
                                     bin_state, explicit_step_binned2)

_PREC = jax.lax.Precision.DEFAULT
SIDE = 8
SQ = 64


def step_colsT(sim, st, dtj, cfg):
    B = cfg.bins_capacity
    side, sq = SIDE, SQ
    grid = st.grid
    nb = grid.table.capacity
    dx = grid.dx
    origin_w = grid.transform.matrix[:3, 3]
    W = st.cols.shape[1]
    assert W == 26

    colsT = st.cols.reshape(B, K, W).transpose(2, 0, 1)     # [W,B,K]
    x = [colsT[d] for d in range(3)]
    v = [colsT[3 + d] for d in range(3)]
    Fc = [[colsT[6 + 3 * i + j] for j in range(3)] for i in range(3)]
    Cc = [[colsT[15 + 3 * i + j] for j in range(3)] for i in range(3)]
    alive = (st.pid >= 0).reshape(B, K)
    af = alive.astype(jnp.float32)
    m = colsT[24] * af
    vol = colsT[25] * af

    bin_live = jnp.any(alive, axis=1)
    bin_block = jnp.where(bin_live, st.bin_block, -1)
    bad_bin = bin_live & (bin_block < 0)
    overflow = st.overflow | jnp.any(bad_bin)
    bbs = jnp.clip(bin_block, 0, nb - 1)
    borigin = grid.table.active_coords[bbs] * 4             # [B,3]

    # per-axis direct-eval stencils on planes
    sidx = jnp.arange(side, dtype=jnp.float32)
    ws = []
    for d in range(3):
        xib = (x[d] - origin_w[d]) / dx                     # [B,K]
        t = xib[..., None] - (borigin[:, None, d:d + 1].astype(jnp.float32)
                              + sidx)
        at = jnp.abs(t)
        c1 = jnp.maximum(1.5 - at, 0.0)
        c2 = jnp.maximum(0.5 - at, 0.0)
        ws.append(0.5 * c1 * c1 - 1.5 * c2 * c2)            # [B,K,8]
    # rel0 = (borigin - xib) * dx, per axis (world units)
    rel0 = [(borigin[:, None, d].astype(jnp.float32)
             - (x[d] - origin_w[d]) / dx) * dx for d in range(3)]
    wx = ws[0] * af[..., None]
    wx_i = wx * sidx
    S0 = (ws[1][:, :, :, None] * ws[2][:, :, None, :]).reshape(B, K, sq)
    fidx = jnp.arange(side, dtype=jnp.float32)
    fy_m = jnp.repeat(fidx, side)
    fz_m = jnp.tile(fidx, side)
    sel, tgt8, use_seg = _spill_sel(st.nbr8, bbs, bin_live & ~bad_bin,
                                    nb, cfg)

    # ---- constitutive on stacked form (scalar-form SVD inside) ----------
    Fst = jnp.stack([jnp.stack(Fc[i], -1) for i in range(3)], -2)
    Cst = jnp.stack([jnp.stack(Cc[i], -1) for i in range(3)], -2)
    tau = sim.model.kirchhoff(Fst)                          # [B,K,3,3]
    Dinv = 4.0 / (dx * dx)
    A = [[m * Cst[..., i, j] - (dtj * Dinv) * vol * tau[..., i, j]
          for j in range(3)] for i in range(3)]
    u0 = [m * v[i] + A[i][0] * rel0[0] + A[i][1] * rel0[1]
          + A[i][2] * rel0[2] for i in range(3)]

    # ---- P2G: c-major Rcat blocks of width `side` -----------------------
    blocks = [wx * m[..., None]]
    for c in range(3):
        blocks.append(wx * u0[c][..., None]
                      + wx_i * (dx * A[c][0])[..., None])
    for c in range(3):
        blocks.append(wx * (dx * A[c][1])[..., None])
    for c in range(3):
        blocks.append(wx * (dx * A[c][2])[..., None])
    Rcat = jnp.concatenate(blocks, axis=-1)                 # [B,K,80]
    outf = jnp.einsum("bkm,bkA->bmA", S0, Rcat, precision=_PREC,
                      preferred_element_type=jnp.float32)   # [B,sq,80]

    def blk(i):
        return outf[..., i * side:(i + 1) * side]

    chan = [blk(0)]
    for c in range(3):
        chan.append(blk(1 + c) + fy_m[None, :, None] * blk(4 + c)
                    + fz_m[None, :, None] * blk(7 + c))     # [B,sq,side]

    def spill(ch):                                          # [B,sq,side]
        cube = ch.transpose(0, 2, 1).reshape(B, 2, 4, 2, 4, 2, 4)
        return cube.transpose(1, 3, 5, 0, 2, 4, 6).reshape(8 * B, 64)

    spilled = jnp.stack([spill(c) for c in chan], axis=-1)  # [8B,64,4]
    seg = jnp.where(tgt8 >= 0, tgt8, nb).reshape(-1)
    acc = jax.ops.segment_sum(
        spilled.reshape(8 * B, 64 * 4), seg,
        num_segments=nb + 1)[:nb].reshape(nb, 64, 4)
    gm = acc[..., 0]
    gmv = acc[..., 1:]

    # ---- grid update ----------------------------------------------------
    has_mass = gm > 0.0
    gv = jnp.where(has_mass[..., None],
                   gmv / jnp.maximum(gm, 1e-30)[..., None], 0.0)
    gv = gv + dtj * sim.gravity[None, None, :]
    corners = jnp.asarray(neighbor_offsets(3, 0, 3))
    node_x = (grid.table.active_coords[:, None, :] * 4 +
              corners[None]).astype(jnp.float32) * dx + origin_w
    gv = resolve_boundaries(sim.colliders, node_x, gv)
    gv = jnp.where(has_mass[..., None], gv, 0.0)
    max_vel = jnp.sqrt(jnp.max(jnp.sum(gv * gv, -1)))

    # ---- G2P ------------------------------------------------------------
    safe = jnp.clip(tgt8, 0, nb - 1)
    Vd = jnp.where((tgt8 >= 0)[..., None, None], gv[safe], 0.0)

    def pull(c):                                            # [8,B,64]
        vb = Vd[..., c].reshape(2, 2, 2, B, 4, 4, 4).transpose(
            3, 0, 4, 1, 5, 2, 6).reshape(B, side, sq)
        return vb.transpose(0, 2, 1)                        # [B,sq,side]

    Vac = [pull(c) for c in range(3)]
    vblocks = list(Vac)
    vblocks += [fy_m[None, :, None] * Vac[c] for c in range(3)]
    vblocks += [fz_m[None, :, None] * Vac[c] for c in range(3)]
    Vcat = jnp.concatenate(vblocks, axis=-1)                # [B,sq,72]
    Pcat = jnp.einsum("bkm,bmA->bkA", S0, Vcat, precision=_PREC,
                      preferred_element_type=jnp.float32)   # [B,K,72]
    Pv = Pcat.reshape(B, K, 9, side)
    svc = jnp.einsum("bka,bkva->bkv", wx, Pv)               # [B,K,9]
    s0 = [svc[..., c] for c in range(3)]
    sy = [svc[..., 3 + c] for c in range(3)]
    sz = [svc[..., 6 + c] for c in range(3)]
    sx = [jnp.einsum("bka,bka->bk", wx_i, Pv[..., c, :]) for c in range(3)]

    v_new = s0
    sidx3 = [sx, sy, sz]
    Cn = [[Dinv * (v_new[i] * rel0[j] + dx * sidx3[j][i])
           for j in range(3)] for i in range(3)]
    Fn = [[Fc[i][j] + dtj * (Cn[i][0] * Fc[0][j] + Cn[i][1] * Fc[1][j]
                             + Cn[i][2] * Fc[2][j])
           for j in range(3)] for i in range(3)]
    x_new = [x[d] + dtj * v_new[d] for d in range(3)]

    # escape check + recentering
    offs = []
    for d in range(3):
        base_new = jnp.floor((x_new[d] - origin_w[d]) / dx - 0.5
                             ).astype(jnp.int32)
        offs.append(base_new - borigin[:, None, d])
    if cfg.recenter:
        asum = jnp.maximum(jnp.sum(alive.astype(jnp.int32)), 1)
        shift = []
        for d in range(3):
            mo = jnp.sum(jnp.where(alive, offs[d], 0)).astype(jnp.float32) \
                / asum
            sh = jnp.clip(jnp.round(mo - 0.5 * (SIDE - 3)), -1.0, 1.0
                          ).astype(jnp.int32)
            offs[d] = offs[d] - sh
            shift.append(sh)
        shift = jnp.stack(shift)
        tm = grid.transform.matrix.at[:3, 3].add(
            shift.astype(jnp.float32) * dx)
        grid = dataclasses.replace(
            grid, transform=dataclasses.replace(grid.transform, matrix=tm))
    escaped = jnp.zeros((), jnp.bool_)
    for d in range(3):
        escaped |= jnp.any(alive & ((offs[d] < 0) | (offs[d] > SIDE - 3)))

    # ---- repack ---------------------------------------------------------
    newT = []
    for d in range(3):
        newT.append(jnp.where(alive, x_new[d], x[d]))
    for d in range(3):
        newT.append(jnp.where(alive, v_new[d], v[d]))
    for i in range(3):
        for j in range(3):
            newT.append(jnp.where(alive, Fn[i][j], Fc[i][j]))
    for i in range(3):
        for j in range(3):
            newT.append(jnp.where(alive, Cn[i][j], Cc[i][j]))
    newT.append(m)
    newT.append(vol)
    ncols = jnp.stack(newT, axis=0).transpose(1, 2, 0).reshape(B * K, W)

    grid = dataclasses.replace(grid, data={"m": gm, "v": gv})
    return dataclasses.replace(st, cols=ncols, grid=grid, max_vel=max_vel,
                               overflow=overflow, needs_rebin=escaped)


def main():
    n = 262144
    sim, st0, dt = build(n, dx=1.0 / 128)
    dtj = jnp.float32(dt)
    cfg = BinnedConfig2(bins_capacity=2560, block_capacity=2048)
    bst = jax.block_until_ready(
        jax.jit(lambda s: bin_state(sim, s, cfg))(st0))

    # correctness vs production step (one step, same state)
    ref = jax.jit(lambda s: explicit_step_binned2(sim, s, dtj, cfg,
                                                  rebin=False))(bst)
    got = jax.jit(lambda s: step_colsT(sim, s, dtj, cfg))(bst)
    dv = float(jnp.max(jnp.abs(got.cols - ref.cols)))
    print(f"max |cols diff| vs production: {dv:.3e}", flush=True)

    def vc(_, s):
        return step_colsT(sim, s, dtj, cfg)
    ms = chained_ms(vc, bst, iters=10, marginal=True,
                    label="bare step colsT")
    print(f"  -> {n / (ms / 1e3) / 1e6:.2f} M pps", flush=True)

    def vp(_, s):
        return explicit_step_binned2(sim, s, dtj, cfg, rebin=False)
    ms = chained_ms(vp, bst, iters=10, marginal=True,
                    label="bare step production")
    print(f"  -> {n / (ms / 1e3) / 1e6:.2f} M pps", flush=True)


if __name__ == "__main__":
    main()
