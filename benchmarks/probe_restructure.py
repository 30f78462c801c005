"""Targeted TPU probes for the binned-path restructure hypotheses.

1. K-stacked fused transfer einsum vs 3 per-plane einsums
2. SIDE=8 variants (epoch rebinning window)
3. prepare_bins sub-stages (what is the unaccounted ~9 ms?)
4. wide-payload sort vs sort+gather
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

B, K = 4096, 128
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
    S3 = jnp.asarray(rng.standard_normal((B, 3 * K, 36)), jnp.float32)
    R3 = jnp.asarray(rng.standard_normal((B, 3 * K, 24)), jnp.float32)

    # 1a. fused K-stacked p2g-style einsum (all 6 planes in channel dim)
    def fused(_, c):
        r, = c
        out = jnp.einsum("bkm,bkc->bmc", S3, r, precision=PREC,
                         preferred_element_type=jnp.float32)
        return (r + 1e-30 * out[0, 0, 0],)
    chained_ms(fused, (R3,), label="fused [B,384,36]x[B,384,24]")

    # 1b. the current shape: 6 planes x 3 einsums of [B,K,36]x[B,K,4]
    S1 = S3[:, :K, :]
    R1 = R3[:, :K, :4]

    def perplane(_, c):
        r, = c
        acc = 0.0
        for a in range(6):
            for g in range(3):
                out = jnp.einsum("bkm,bkc->bmc", S1, r, precision=PREC,
                                 preferred_element_type=jnp.float32)
                acc = acc + out[0, 0, 0]
        return (r + 1e-30 * acc,)
    chained_ms(perplane, (R1,), label="18x [B,128,36]x[B,128,4]")

    # 1c. g2p-style: [B,K,36]x[B,36,18] x3
    V = jnp.asarray(rng.standard_normal((B, 36, 18)), jnp.float32)

    def g2p_style(_, c):
        v, = c
        acc = 0.0
        for g in range(3):
            out = jnp.einsum("bkm,bmc->bkc", S1, v, precision=PREC,
                             preferred_element_type=jnp.float32)
            acc = acc + out[0, 0, 0]
        return (v + 1e-30 * acc,)
    chained_ms(g2p_style, (V,), label="3x [B,128,36]x[B,36,18]")

    # 2. SIDE=8 fused variant
    S8 = jnp.asarray(rng.standard_normal((B, 3 * K, 64)), jnp.float32)
    R8 = jnp.asarray(rng.standard_normal((B, 3 * K, 32)), jnp.float32)

    def fused8(_, c):
        r, = c
        out = jnp.einsum("bkm,bkc->bmc", S8, r, precision=PREC,
                         preferred_element_type=jnp.float32)
        return (r + 1e-30 * out[0, 0, 0],)
    chained_ms(fused8, (R8,), label="fused SIDE8 [B,384,64]x[B,384,32]")

    # 3. prepare_bins sub-stages
    from examples.mpm_block import build
    from zpc_tpu.sim.mpm_binned import BinnedConfig
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
        xi0 = x * 128.0
        base0, _, _ = bspline_weights(xi0, 2)
        pblock0 = jnp.floor_divide(base0, 4)
        keys = pack_coords(pblock0)
        pid = jnp.arange(n, dtype=jnp.int32)
        skey, sid = jax.lax.sort((keys, pid), num_keys=1, is_stable=True)
        return (x + 1e-30 * skey[0],)
    chained_ms(keys_sort, (x0j,), label="keys+sort")

    def table_build(_, c):
        x, = c
        xi0 = x * 128.0
        base0, _, _ = bspline_weights(xi0, 2)
        pblock0 = jnp.floor_divide(base0, 4)
        keys = pack_coords(pblock0)
        pid = jnp.arange(n, dtype=jnp.int32)
        skey, sid = jax.lax.sort((keys, pid), num_keys=1, is_stable=True)
        neq = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
        neq = neq & (skey != KEY_SENTINEL)
        rank = jnp.cumsum(neq.astype(jnp.int32)) - 1
        n_groups = rank[-1] + 1
        lane_i = jnp.arange(n, dtype=jnp.int32)
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

    # stencil construction on binned positions
    xb = jnp.asarray(rng.uniform(0.3, 0.7, (B, K, 3)), jnp.float32)

    def stencils(_, c):
        xbv, = c
        xib = xbv * 128.0
        baseb, wb, _ = bspline_weights(xib, 2)
        off = jnp.clip(baseb - (baseb[:, :1, :] // 4) * 4, 0, 3)
        sidx = jnp.arange(6, dtype=jnp.int32)
        outs = []
        for d in range(3):
            w_axis = jnp.zeros((B, K, 6), wb.dtype)
            for j in range(3):
                hit = (sidx[None, None, :] == (off[..., d] + j)[..., None])
                w_axis = w_axis + jnp.where(hit, wb[..., d, j:j + 1], 0.0)
            outs.append(w_axis)
        wx, wy, wz = outs
        fidx = sidx.astype(wx.dtype)
        S0 = (wy[:, :, :, None] * wz[:, :, None, :]).reshape(B, K, 36)
        S1_ = ((wy * fidx)[:, :, :, None] * wz[:, :, None, :]).reshape(
            B, K, 36)
        S2_ = (wy[:, :, :, None] * (wz * fidx)[:, :, None, :]).reshape(
            B, K, 36)
        return (xbv + 1e-30 * (S0[0, 0, 0] + S1_[0, 0, 0] + S2_[0, 0, 0] +
                               wx[0, 0, 0]),)
    chained_ms(stencils, (xb,), label="stencil build (SIDE=6)")

    # 4. wide sort: 6 payload columns vs 1
    keys = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
    cols = [jnp.asarray(rng.standard_normal(n), jnp.float32)
            for _ in range(6)]

    def sort_wide(_, c):
        k, *vs = c
        out = jax.lax.sort((jnp.roll(k, 1) ^ 1, *vs), num_keys=1,
                           is_stable=True)
        return out
    chained_ms(sort_wide, (keys, *cols), label="sort 256k + 6 f32 payloads")


if __name__ == "__main__":
    main()
