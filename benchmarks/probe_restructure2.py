"""Probe batch 2: bandwidth ceiling, SIDE8 einsum, cell-bucket VPU P2G,
prepare_bins sub-stages, wide sorts.  Big operands ride as jit args."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

PREC = jax.lax.Precision.HIGH


def chained_ms(body, x0, iters=20, reps=3, label="", const=None):
    if const is None:
        f = jax.jit(lambda x: jax.lax.fori_loop(0, iters, body, x))
        call = lambda x: f(x)
    else:
        f = jax.jit(lambda c, x: jax.lax.fori_loop(
            0, iters, lambda i, xx: body(i, xx, c), x))
        call = lambda x: f(const, x)
    x = jax.block_until_ready(call(x0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        x = jax.block_until_ready(call(x))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{label:46s} {best * 1e3:8.2f} ms", flush=True)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)

    # 0. streaming ceiling: elementwise over 256 MB
    big = jnp.asarray(rng.standard_normal(64 * 1024 * 1024), jnp.float32)

    def stream(_, c):
        # roll = real read+write of the whole buffer, non-foldable
        x, = c
        return (jnp.roll(x, 1),)
    ms = chained_ms(stream, (big,), iters=20, label="stream 256MB rw")
    print(f"    -> {2 * big.nbytes / (ms / 1e3) / 1e9:.0f} GB/s", flush=True)

    # 1. fused SIDE8 einsum, operands as args
    B, K = 4096, 128
    S8 = jnp.asarray(rng.standard_normal((B, 3 * K, 64)), jnp.float32)

    def fused8(_, c, S):
        r, = c
        out = jnp.einsum("bkm,bkc->bmc", S, r, precision=PREC,
                         preferred_element_type=jnp.float32)
        # abs blocks bilinear-factorization; sum needs the full result
        return (r + 1e-30 * jnp.sum(jnp.abs(out)),)
    R8 = jnp.asarray(rng.standard_normal((B, 3 * K, 32)), jnp.float32)
    chained_ms(fused8, (R8,), label="fused SIDE8 [B,384,64]x[B,384,32]",
               const=S8)

    # 2. cell-bucket VPU shifted-add P2G (claymore-style, pure XLA)
    NB, P, C = 1280, 8, 4
    q = jnp.asarray(rng.standard_normal((NB, 4, 4, 4, P, C)), jnp.float32)
    w4 = jnp.asarray(rng.standard_normal((NB, 4, 4, 4, P, 3, 4)),
                     jnp.float32)  # per-axis 4-tap weights

    def cellp2g(_, c, ops):
        qq, ww = ops
        x, = c
        qq = qq + 1e-30 * x
        acc = jnp.zeros((NB, 8, 8, 8, C), jnp.float32)
        for ox in range(4):
            wx = ww[..., 0, ox]
            for oy in range(4):
                wxy = wx * ww[..., 1, oy]
                for oz in range(4):
                    w = wxy * ww[..., 2, oz]                 # [NB,4,4,4,P]
                    contr = jnp.einsum("bxyzp,bxyzpc->bxyzc", w, qq)
                    acc = jax.lax.dynamic_update_slice(
                        acc, jax.lax.dynamic_slice(
                            acc, (0, ox, oy, oz, 0),
                            (NB, 4, 4, 4, C)) + contr,
                        (0, ox, oy, oz, 0))
        return (x + 1e-30 * jnp.sum(jnp.abs(acc)),)
    chained_ms(cellp2g, (jnp.float32(0),), iters=10,
               label="cell-bucket VPU p2g 64 shifts", const=(q, w4))

    # 2b. G2P direction: 64 shifted window reads
    gv = jnp.asarray(rng.standard_normal((NB, 8, 8, 8, C)), jnp.float32)

    def cellg2p(_, c, ops):
        gg, ww = ops
        x, = c
        out = jnp.zeros((NB, 4, 4, 4, P, C), jnp.float32)
        for ox in range(4):
            wx = ww[..., 0, ox]
            for oy in range(4):
                wxy = wx * ww[..., 1, oy]
                for oz in range(4):
                    w = wxy * ww[..., 2, oz]
                    win = jax.lax.dynamic_slice(
                        gg, (0, ox, oy, oz, 0), (NB, 4, 4, 4, C))
                    out = out + w[..., None] * win[..., None, :]
        return (x + 1e-30 * jnp.sum(jnp.abs(out)),)
    chained_ms(cellg2p, (jnp.float32(0),), iters=10,
               label="cell-bucket VPU g2p 64 shifts", const=(gv, w4))

    # 3. prepare_bins sub-stages
    from examples.mpm_block import build
    from zpc_tpu.containers.block_table import (KEY_SENTINEL,
                                                build_block_table,
                                                pack_coords, unpack_key)
    from zpc_tpu.geometry.sparse_grid import neighbor_offsets
    from zpc_tpu.math.interpolation import bspline_weights

    n = 262144
    sim, st, dt = build(n, dx=1.0 / 128)
    x0j = st.particles["x"]
    nb = 4096

    def keys_sort(_, c):
        x, = c
        base0, _, _ = bspline_weights(x * 128.0, 2)
        keys = pack_coords(jnp.floor_divide(base0, 4))
        pid = jnp.arange(n, dtype=jnp.int32)
        skey, sid = jax.lax.sort((keys, pid), num_keys=1, is_stable=True)
        return (x + 1e-30 * skey[0],)
    chained_ms(keys_sort, (x0j,), label="keys+sort")

    def table_build(_, c):
        x, = c
        base0, _, _ = bspline_weights(x * 128.0, 2)
        keys = pack_coords(jnp.floor_divide(base0, 4))
        pid = jnp.arange(n, dtype=jnp.int32)
        skey, sid = jax.lax.sort((keys, pid), num_keys=1, is_stable=True)
        neq = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
        neq = neq & (skey != KEY_SENTINEL)
        rank = jnp.cumsum(neq.astype(jnp.int32)) - 1
        n_groups = rank[-1] + 1
        dst = jnp.clip(jnp.where(neq, rank, nb), 0, nb)
        t1_keys = jnp.full((nb + 1,), KEY_SENTINEL, jnp.int32).at[dst].set(
            skey)[:nb]
        offs = jnp.asarray(neighbor_offsets(3, 0, 1))
        t1_coords = unpack_key(t1_keys, 3)
        cand = (t1_coords[:, None, :] + offs[None, :, :]).reshape(-1, 3)
        vmask = jnp.repeat(jnp.arange(nb) < n_groups, offs.shape[0])
        table, inv_cand = build_block_table(cand, nb, valid=vmask, dim=3)
        return (x + 1e-30 * table.keys[0],)
    chained_ms(table_build, (x0j,), label="keys+sort+compact+dilate-table")

    # 4. stencil build on binned layout
    B2 = 4096
    xb = jnp.asarray(rng.uniform(0.3, 0.7, (B2, K, 3)), jnp.float32)

    def stencils(_, c):
        xbv, = c
        xib = xbv * 128.0
        baseb, wb, _ = bspline_weights(xib, 2)
        off = jnp.clip(baseb - (baseb[:, :1, :] // 4) * 4, 0, 3)
        sidx = jnp.arange(6, dtype=jnp.int32)
        outs = []
        for d in range(3):
            w_axis = jnp.zeros((B2, K, 6), wb.dtype)
            for j in range(3):
                hit = (sidx[None, None, :] == (off[..., d] + j)[..., None])
                w_axis = w_axis + jnp.where(hit, wb[..., d, j:j + 1], 0.0)
            outs.append(w_axis)
        wx, wy, wz = outs
        fidx = sidx.astype(wx.dtype)
        S0 = (wy[:, :, :, None] * wz[:, :, None, :]).reshape(B2, K, 36)
        S1_ = ((wy * fidx)[:, :, :, None] * wz[:, :, None, :]).reshape(
            B2, K, 36)
        S2_ = (wy[:, :, :, None] * (wz * fidx)[:, :, None, :]).reshape(
            B2, K, 36)
        return (xbv + 1e-30 * (jnp.sum(jnp.abs(S0)) + jnp.sum(jnp.abs(S1_))
                               + jnp.sum(jnp.abs(S2_))
                               + jnp.sum(jnp.abs(wx))),)
    chained_ms(stencils, (xb,), label="stencil build (SIDE=6)")

    # 5. wide sort: key + 6 payloads
    keys = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
    cols = [jnp.asarray(rng.standard_normal(n), jnp.float32)
            for _ in range(6)]

    def sort_wide(_, c):
        k, *vs = c
        return jax.lax.sort((jnp.roll(k, 1) ^ 1, *vs), num_keys=1,
                            is_stable=True)
    chained_ms(sort_wide, (keys, *cols), label="sort 256k + 6 f32 payloads")


if __name__ == "__main__":
    main()
