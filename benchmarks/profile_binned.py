"""Stage breakdown of the binned MPM step (256k) — where do the ms go?

Each stage is timed with the chained-loop discipline (data-dependent
iterations inside one jitted fori_loop; see run_all.py docstring).
Run on the target chip:  python benchmarks/profile_binned.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples.mpm_block import build
from zpc_tpu.sim.mpm_binned import (BIN_SIZE, BinnedConfig, BinWorkspace,
                                    explicit_step_binned, prepare_bins)


def chained_ms(body, x0, iters=20, reps=3, label="", const=None):
    """`const` rides as a jit argument (NOT a closure constant) so big
    workspaces don't get baked into the HLO (tunnel 413s on >100MB)."""
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
    print(f"{label:42s} {best * 1e3:8.2f} ms")
    return best * 1e3


def main():
    n = 262144
    sim, st, dt = build(n, dx=1.0 / 128)
    dtj = jnp.float32(dt)
    cfg = BinnedConfig(bins_capacity=4096)

    # full step
    def full(_i, c):
        s, ov = c
        s2, ov2 = explicit_step_binned(sim, s, dtj, cfg)
        return s2, ov | ov2
    chained_ms(full, (st, jnp.bool_(False)), label="full binned step")

    # prepare_bins only (perturb x through the carry for dependence)
    def prep(_i, c):
        s, acc = c
        ws = prepare_bins(sim, s, cfg)
        eps = 1e-30 * ws.rel0[0, 0, 0]
        import dataclasses
        p2 = s.particles.update(x=s.particles["x"] + eps)
        return dataclasses.replace(s, particles=p2), acc + eps
    chained_ms(prep, (st, jnp.float32(0)), label="prepare_bins")

    # transfers with a FIXED workspace (p2g + grid + g2p, no unbin)
    ws = jax.jit(lambda s: prepare_bins(sim, s, cfg))(st)
    ws = jax.block_until_ready(ws)

    def xfer(_i, carry, ws):
        vb, = carry
        Dinv = 4.0 / (ws.grid.dx * ws.grid.dx)
        tau = ws.bin_leaves(sim.model).kirchhoff(ws.Fb)
        A = ws.mban[..., None, None] * ws.Cb - \
            (dtj * Dinv * ws.volb)[..., None, None] * tau
        u0 = ws.mban[..., None] * vb + \
            jnp.einsum("bkij,bkj->bki", A, ws.rel0)
        Q0 = jnp.concatenate([ws.mban[..., None], u0], -1)
        zero = jnp.zeros_like(ws.mban)[..., None]
        QA = [jnp.concatenate(
            [zero, ws.grid.dx * A[..., :, d]], -1) for d in range(3)]
        acc = ws.p2g(Q0, QA)
        gm = acc[..., 0]
        gv = jnp.where((gm > 0)[..., None],
                       acc[..., 1:] / jnp.maximum(gm, 1e-30)[..., None], 0.0)
        s0, _ = ws.g2p(gv)
        return (vb + 1e-30 * s0,)
    chained_ms(xfer, (ws.vb,), label="p2g+grid+g2p (fixed ws)", const=ws)

    # p2g alone
    def p2g_only(_i, carry, ws):
        vb, = carry
        Q0 = jnp.concatenate([ws.mban[..., None],
                              ws.mban[..., None] * vb], -1)
        zero = jnp.zeros((ws.nbins, BIN_SIZE, 4), jnp.float32)
        acc = ws.p2g(Q0, [zero, zero, zero])
        return (vb + 1e-30 * acc[0, 0, 0],)
    chained_ms(p2g_only, (ws.vb,), label="p2g only (Q0, zero QA)", const=ws)

    # g2p alone
    def g2p_only(_i, carry, ws):
        gv, = carry
        s0, sidx = ws.g2p(gv)
        return (gv + 1e-30 * s0[0, 0, 0],)
    gv0 = jnp.zeros((ws.nb, 64, 3), jnp.float32)
    chained_ms(g2p_only, (gv0,), label="g2p only", const=ws)

    # the particle sort
    keys = jnp.asarray(np.random.default_rng(0).integers(
        0, 1 << 30, n).astype(np.int32))
    pid = jnp.arange(n, dtype=jnp.int32)

    def sort_only(_i, carry):
        k, v = carry
        ko, vo = jax.lax.sort((jnp.roll(k, 1) ^ 1, v), num_keys=1,
                              is_stable=True)
        return ko, vo
    chained_ms(sort_only, (keys, pid), label="stable sort 256k pairs")

    # the [N, 26] particle pack gather
    packed = jnp.asarray(np.random.default_rng(1).standard_normal(
        (n, 26)).astype(np.float32))
    idx0 = jnp.asarray(np.random.default_rng(2).permutation(n)
                       .astype(np.int32)[:cfg.bins_capacity * BIN_SIZE])

    def gather_only(_i, carry):
        i, acc = carry
        g = packed[i]
        return (jnp.roll(i, 1), acc + 1e-30 * g[0, 0])
    chained_ms(gather_only, (idx0, jnp.float32(0)),
               label="row gather [524k,26]")

    # unbin-style gather [N] rows from [B*K, 24]
    res = jnp.asarray(np.random.default_rng(3).standard_normal(
        (cfg.bins_capacity * BIN_SIZE, 24)).astype(np.float32))
    idx1 = jnp.asarray(np.random.default_rng(4).permutation(
        cfg.bins_capacity * BIN_SIZE).astype(np.int32)[:n])

    def unbin_only(_i, carry):
        i, acc = carry
        g = res[i]
        return (jnp.roll(i, 1), acc + 1e-30 * g[0, 0])
    chained_ms(unbin_only, (idx1, jnp.float32(0)),
               label="row gather [262k,24]")

    # one-hot sel_cat construction + the two selection matmuls
    def sel_only(_i, carry, ws):
        tgt, acc = carry
        sel = (tgt.reshape(-1)[None, :] ==
               jnp.arange(ws.nb, dtype=jnp.int32)[:, None]
               ).astype(jnp.float32)
        spilled = jnp.broadcast_to(acc, (8 * ws.nbins, 64 * 4))
        out = jax.lax.dot_general(
            sel, spilled, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGH)
        return (tgt + (out[0, 0] * 1e-30).astype(jnp.int32), acc + 1e-30)
    chained_ms(sel_only, (ws.tgt8, jnp.zeros((1, 256), jnp.float32)),
               label="sel_cat build + [nb,8B]x[8B,256]", const=ws)


if __name__ == "__main__":
    main()
