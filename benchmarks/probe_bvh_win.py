"""Attribute the banded-join slowdown (round 3): 53 -> 377 ms at 1M.

Components timed in isolation on the same scene: the 9-op entry sort,
searchsorted, the w0/window build (block-take gather vs the old static
3-shift concat), and the mask+count join core with/without the [s,e)
clamp, on static vs gathered windows.
"""

import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms


def dep_scalar(x):
    # REAL above-ulp perturbation: 1e-30 eps underflows vs ql~0.5
    # (ql + eps == ql bitwise) and XLA elides chain iterations
    return 1e-7 * jnp.tanh(jnp.sum(jnp.abs(x)))
from zpc_tpu.containers.bvh import build_lbvh
from zpc_tpu.math.bits import morton3d


def main(n=1 << 20):
    rng = np.random.default_rng(0)
    c = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    h = np.full((n, 3), 0.002, np.float32)
    lo = jnp.asarray(c - h)
    hi = jnp.asarray(c + h)
    bvh = jax.block_until_ready(jax.jit(build_lbvh)(lo, hi))
    qlo = lo - 0.004
    qhi = hi + 0.004
    T, G = 256, 32
    nq = n
    ntiles = nq // T
    TL = -(-n // ntiles)
    dim = 3
    leaf_lo = bvh.lo[n - 1:]
    leaf_hi = bvh.hi[n - 1:]
    leaf_prim = bvh.leaf_prim[n - 1:]

    def row(name, ms):
        print(f"{name:44s} {ms:9.2f} ms", flush=True)

    def quant(x):
        return jnp.clip((x - bvh.scene_lo) / bvh.scene_extent * 1024.0,
                        0, 1023).astype(jnp.int32)

    def front(ql, qh):
        m_lo = morton3d(quant(ql - bvh.half_max))
        m_hi = morton3d(quant(qh + bvh.half_max))
        qid0 = jnp.arange(nq, dtype=jnp.int32)
        ops = jax.lax.sort(
            (m_lo, m_hi, qid0, *[ql[:, d] for d in range(dim)],
             *[qh[:, d] for d in range(dim)]), num_keys=1, is_stable=True)
        sq_lo = jnp.stack(ops[3:6], axis=1)
        sq_hi = jnp.stack(ops[6:9], axis=1)
        s = jnp.searchsorted(bvh.codes, ops[0], side="left").astype(
            jnp.int32)
        e = jnp.searchsorted(bvh.codes, ops[1], side="right").astype(
            jnp.int32)
        return sq_lo, sq_hi, s, e

    # 1. front end alone (sort + searchsorted)
    def t_front(i, cq):
        ql, qh = cq
        a, b, s, e = front(ql, qh)
        eps = dep_scalar(a) + dep_scalar(s.astype(jnp.float32))
        return (ql + eps, qh + eps)
    row("front: 9-op sort + 2x searchsorted",
        chained_ms(t_front, (qlo, qhi), iters=4, marginal=True))

    big = jnp.asarray(3.4e38, jnp.float32)

    def win_static(a, fill):
        pad = ntiles * TL - n
        t = jnp.concatenate([a, jnp.full((pad,) + a.shape[1:], fill,
                                         a.dtype)]).reshape(
            ntiles, TL, *a.shape[1:])
        prev = jnp.concatenate([jnp.full_like(t[:1], fill), t[:-1]], 0)
        nxt = jnp.concatenate([t[1:], jnp.full_like(t[:1], fill)], 0)
        return jnp.concatenate([prev, t, nxt], axis=1)

    nlt = -(-n // TL) + 3

    def win_take(a, fill, w0):
        ap = jnp.concatenate(
            [a, jnp.full((nlt * TL - n,) + a.shape[1:], fill, a.dtype)])
        tiles = ap.reshape(nlt, TL, *a.shape[1:])
        blk = w0[:, None] // TL + jnp.arange(3, dtype=jnp.int32)[None]
        return jnp.take(tiles, blk, axis=0).reshape(
            (ntiles, 3 * TL) + a.shape[1:])

    def join_core(wlo, whi, wprim, sq_lo, sq_hi, qs=None, qe=None,
                  w0=None):
        qlo_t = sq_lo.reshape(ntiles, T, dim)
        qhi_t = sq_hi.reshape(ntiles, T, dim)

        def per_group(carry, tg):
            if qs is None:
                wl, wh, wp, ql, qh = tg
            else:
                wl, wh, wp, ql, qh, ss, ee, ww = tg
            ov = wp[:, None, :] >= 0
            if qs is not None:
                lg = ww[:, None] + jnp.arange(3 * TL, dtype=jnp.int32)[
                    None]
                ov = ov & (lg[:, None, :] >= ss[:, :, None])
                ov = ov & (lg[:, None, :] < ee[:, :, None])
            for d in range(dim):
                ov = ov & (ql[:, :, None, d] <= wh[:, None, :, d])
                ov = ov & (wl[:, None, :, d] <= qh[:, :, None, d])
            cnt = jnp.sum(ov, axis=-1).astype(jnp.int32)
            return carry, cnt

        xs = [wlo.reshape(ntiles // G, G, 3 * TL, dim),
              whi.reshape(ntiles // G, G, 3 * TL, dim),
              wprim.reshape(ntiles // G, G, 3 * TL),
              qlo_t.reshape(ntiles // G, G, T, dim),
              qhi_t.reshape(ntiles // G, G, T, dim)]
        if qs is not None:
            xs += [qs.reshape(ntiles // G, G, T),
                   qe.reshape(ntiles // G, G, T),
                   w0.reshape(ntiles // G, G)]
        _, cnt = jax.lax.scan(per_group, 0, tuple(xs))
        return cnt

    # 2. round-2 form: static windows, no clamp
    def t_old(i, cq):
        ql, qh = cq
        sq_lo, sq_hi, s, e = front(ql, qh)
        wlo = win_static(leaf_lo, big)
        whi = win_static(leaf_hi, -big)
        wprim = win_static(leaf_prim, jnp.int32(-1))
        cnt = join_core(wlo, whi, wprim, sq_lo, sq_hi)
        eps = dep_scalar(cnt.astype(jnp.float32))
        return (ql + eps, qh + eps)
    row("round-2 form: static windows, no clamp",
        chained_ms(t_old, (qlo, qhi), iters=4, marginal=True))

    # 3. static windows + clamp (w0 = positional base)
    def t_clamp(i, cq):
        ql, qh = cq
        sq_lo, sq_hi, s, e = front(ql, qh)
        wlo = win_static(leaf_lo, big)
        whi = win_static(leaf_hi, -big)
        wprim = win_static(leaf_prim, jnp.int32(-1))
        w0 = (jnp.arange(ntiles, dtype=jnp.int32) - 1) * TL
        cnt = join_core(wlo, whi, wprim, sq_lo, sq_hi, s, e, w0)
        eps = dep_scalar(cnt.astype(jnp.float32))
        return (ql + eps, qh + eps)
    row("static windows + [s,e) clamp",
        chained_ms(t_clamp, (qlo, qhi), iters=4, marginal=True))

    # 4. take windows + clamp (current library form)
    def t_take(i, cq):
        ql, qh = cq
        sq_lo, sq_hi, s, e = front(ql, qh)
        w0 = jnp.min(jnp.where(s < e, s, n).reshape(ntiles, T), axis=1)
        w0 = jnp.clip(w0 // TL, 0, nlt - 3) * TL
        wlo = win_take(leaf_lo, big, w0)
        whi = win_take(leaf_hi, -big, w0)
        wprim = win_take(leaf_prim, jnp.int32(-1), w0)
        cnt = join_core(wlo, whi, wprim, sq_lo, sq_hi, s, e, w0)
        eps = dep_scalar(cnt.astype(jnp.float32))
        return (ql + eps, qh + eps)
    row("take windows + clamp (current)",
        chained_ms(t_take, (qlo, qhi), iters=4, marginal=True))

    # 5. take windows WITHOUT clamp
    def t_take_nc(i, cq):
        ql, qh = cq
        sq_lo, sq_hi, s, e = front(ql, qh)
        w0 = jnp.min(jnp.where(s < e, s, n).reshape(ntiles, T), axis=1)
        w0 = jnp.clip(w0 // TL, 0, nlt - 3) * TL
        wlo = win_take(leaf_lo, big, w0)
        whi = win_take(leaf_hi, -big, w0)
        wprim = win_take(leaf_prim, jnp.int32(-1), w0)
        cnt = join_core(wlo, whi, wprim, sq_lo, sq_hi)
        eps = dep_scalar(cnt.astype(jnp.float32))
        return (ql + eps, qh + eps)
    row("take windows, no clamp",
        chained_ms(t_take_nc, (qlo, qhi), iters=4, marginal=True))


def extra(n=1 << 20):
    """Variants: merge-rank front (searchsorted replacement) and an
    f32-cast clamp (fusion hypothesis)."""
    rng = np.random.default_rng(0)
    c = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    h = np.full((n, 3), 0.002, np.float32)
    lo = jnp.asarray(c - h)
    hi = jnp.asarray(c + h)
    bvh = jax.block_until_ready(jax.jit(build_lbvh)(lo, hi))
    qlo = lo - 0.004
    qhi = hi + 0.004
    T, G = 256, 32
    nq = n
    ntiles = nq // T
    TL = -(-n // ntiles)
    dim = 3
    leaf_lo = bvh.lo[n - 1:]
    leaf_hi = bvh.hi[n - 1:]
    leaf_prim = bvh.leaf_prim[n - 1:]

    def row(name, ms):
        print(f"{name:44s} {ms:9.2f} ms", flush=True)

    def quant(x):
        return jnp.clip((x - bvh.scene_lo) / bvh.scene_extent * 1024.0,
                        0, 1023).astype(jnp.int32)

    def rank_sorted(codes, vals, side):
        """searchsorted(codes, vals) for SORTED vals: packed merge sort
        + cumsum + compaction scatter (codes/vals < 2^30)."""
        m = vals.shape[0]
        tq = jnp.int32(0 if side == "left" else 1)
        packed = jnp.concatenate([
            (codes << 1) | (1 - tq), (vals << 1) | tq])
        sp = jax.lax.sort(packed, is_stable=False)
        isq = (sp & 1) == tq
        iscode = (~isq).astype(jnp.int32)
        before = jnp.cumsum(iscode) - iscode       # codes strictly before
        qrank = jnp.cumsum(isq.astype(jnp.int32)) - 1
        return jnp.zeros((m,), jnp.int32).at[
            jnp.where(isq, qrank, m)].set(before, mode="drop")

    def front_mr(ql, qh):
        m_lo = morton3d(quant(ql - bvh.half_max))
        m_hi = morton3d(quant(qh + bvh.half_max))
        qid0 = jnp.arange(nq, dtype=jnp.int32)
        ops = jax.lax.sort(
            (m_lo, m_hi, qid0, *[ql[:, d] for d in range(dim)],
             *[qh[:, d] for d in range(dim)]), num_keys=1, is_stable=True)
        sq_lo = jnp.stack(ops[3:6], axis=1)
        sq_hi = jnp.stack(ops[6:9], axis=1)
        s = rank_sorted(bvh.codes, ops[0], "left")
        e = rank_sorted(bvh.codes, ops[1], "right")
        return sq_lo, sq_hi, s, e

    def t_front_mr(i, cq):
        ql, qh = cq
        a, b, s, e = front_mr(ql, qh)
        eps = dep_scalar(a) + dep_scalar(s.astype(jnp.float32))
        return (ql + eps, qh + eps)
    row("front via merge-ranks",
        chained_ms(t_front_mr, (qlo, qhi), iters=4, marginal=True))

    # correctness of merge-ranks vs searchsorted
    ml = jnp.sort(morton3d(quant(qlo - bvh.half_max)))
    s1 = rank_sorted(bvh.codes, ml, "left")
    s2 = jnp.searchsorted(bvh.codes, ml, side="left").astype(jnp.int32)
    assert (np.asarray(s1) == np.asarray(s2)).all(), "rank left wrong"
    e1 = rank_sorted(bvh.codes, ml, "right")
    e2 = jnp.searchsorted(bvh.codes, ml, side="right").astype(jnp.int32)
    assert (np.asarray(e1) == np.asarray(e2)).all(), "rank right wrong"
    print("merge-ranks == searchsorted OK", flush=True)

    big = jnp.asarray(3.4e38, jnp.float32)

    def win_static(a, fill):
        pad = ntiles * TL - n
        t = jnp.concatenate([a, jnp.full((pad,) + a.shape[1:], fill,
                                         a.dtype)]).reshape(
            ntiles, TL, *a.shape[1:])
        prev = jnp.concatenate([jnp.full_like(t[:1], fill), t[:-1]], 0)
        nxt = jnp.concatenate([t[1:], jnp.full_like(t[:1], fill)], 0)
        return jnp.concatenate([prev, t, nxt], axis=1)

    def join_f32clamp(wlo, whi, wprim, sq_lo, sq_hi, s, e, w0):
        qlo_t = sq_lo.reshape(ntiles, T, dim)
        qhi_t = sq_hi.reshape(ntiles, T, dim)
        ksf = (s - jnp.repeat(w0, T)).astype(jnp.float32)
        kef = (e - jnp.repeat(w0, T)).astype(jnp.float32)
        lanef = jnp.arange(3 * TL, dtype=jnp.int32).astype(jnp.float32)

        def per_group(carry, tg):
            wl, wh, wp, ql, qh, ss, ee = tg
            ov = wp[:, None, :] >= 0
            ov = ov & (lanef[None, None, :] >= ss[:, :, None])
            ov = ov & (lanef[None, None, :] < ee[:, :, None])
            for d in range(dim):
                ov = ov & (ql[:, :, None, d] <= wh[:, None, :, d])
                ov = ov & (wl[:, None, :, d] <= qh[:, :, None, d])
            cnt = jnp.sum(ov, axis=-1).astype(jnp.int32)
            return carry, cnt

        xs = (wlo.reshape(ntiles // G, G, 3 * TL, dim),
              whi.reshape(ntiles // G, G, 3 * TL, dim),
              wprim.reshape(ntiles // G, G, 3 * TL),
              qlo_t.reshape(ntiles // G, G, T, dim),
              qhi_t.reshape(ntiles // G, G, T, dim),
              ksf.reshape(ntiles // G, G, T),
              kef.reshape(ntiles // G, G, T))
        _, cnt = jax.lax.scan(per_group, 0, xs)
        return cnt

    def t_f32(i, cq):
        ql, qh = cq
        sq_lo, sq_hi, s, e = front_mr(ql, qh)
        wlo = win_static(leaf_lo, big)
        whi = win_static(leaf_hi, -big)
        wprim = win_static(leaf_prim, jnp.int32(-1))
        w0 = (jnp.arange(ntiles, dtype=jnp.int32) - 1) * TL
        cnt = join_f32clamp(wlo, whi, wprim, sq_lo, sq_hi, s, e, w0)
        eps = dep_scalar(cnt.astype(jnp.float32))
        return (ql + eps, qh + eps)
    row("mr-front + static + f32 clamp",
        chained_ms(t_f32, (qlo, qhi), iters=4, marginal=True))


if __name__ == "__main__":
    extra()
