"""Attribute the decomposed banded join's 261-312 ms at 1M (round 3).

The join core's compare volume is invariant under decomposition
(8x entries x 1/8 window), and the old non-decomposed counts-only row
ran 20 ms — so the extra ~240 ms lives in the entry machinery: the
9-operand stable sort of 8M entries, the two rank lookups (packed
merge rank + searchsorted), or the window gather at 65536 tiles.
Times each in isolation on the config-4 scene.
"""

import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms, dep_scalar
from zpc_tpu.containers.bvh import (build_lbvh, _rank_any, _rank_sorted,
                                    query_overlaps_sorted)
from zpc_tpu.math.bits import clz32, morton3d


def main(n=1 << 20):
    rng = np.random.default_rng(0)
    c = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    h = np.full((n, 3), 0.002, np.float32)
    lo = jnp.asarray(c - h)
    hi = jnp.asarray(c + h)
    bvh = jax.block_until_ready(jax.jit(build_lbvh)(lo, hi))
    qlo = lo - 0.004
    qhi = hi + 0.004

    def row(name, ms):
        print(f"{name:52s} {ms:9.2f} ms", flush=True)

    def quant(x):
        return jnp.clip((x - bvh.scene_lo) / bvh.scene_extent * 1024.0,
                        0, 1023).astype(jnp.int32)

    big = jnp.asarray(3.4e38, jnp.float32)

    def decomp(ql, qh):
        lo_c = quant(ql - bvh.half_max)
        hi_c = quant(qh + bvh.half_max)
        ext = jnp.max(hi_c - lo_c, axis=-1)
        k = jnp.maximum(
            32 - clz32(jnp.maximum(ext - 1, 0).astype(jnp.uint32)), 0)
        k = jnp.minimum(k, 10).astype(jnp.int32)
        c0 = lo_c >> k[:, None]
        c1 = hi_c >> k[:, None]
        offs = jnp.asarray(
            [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
             [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]], jnp.int32)
        cells = c0[:, None, :] + offs[None]
        valid = jnp.all(cells <= c1[:, None, :], -1)
        base = morton3d(cells) << (3 * k)[:, None]
        span = jnp.left_shift(jnp.int32(1), 3 * k)
        m_lo = jnp.where(valid, base, base[:, :1]).reshape(-1)
        m_hi = jnp.where(valid, base + span[:, None] - 1,
                         base[:, :1] - 1).reshape(-1)
        el = jnp.where(valid.reshape(-1)[:, None],
                       jnp.repeat(ql, 8, axis=0), big)
        eh = jnp.where(valid.reshape(-1)[:, None],
                       jnp.repeat(qh, 8, axis=0), -big)
        qid0 = jnp.repeat(jnp.arange(n, dtype=jnp.int32), 8)
        return m_lo, m_hi, qid0, el, eh

    m_lo, m_hi, qid0, el, eh = jax.jit(decomp)(qlo, qhi)
    m_lo, m_hi, qid0, el, eh = jax.block_until_ready(
        (m_lo, m_hi, qid0, el, eh))

    # 1. entry construction alone
    def t_decomp(i, cq):
        ql, qh = cq
        a, b, q, l2, h2 = decomp(ql, qh)
        eps = dep_scalar(l2) + dep_scalar(a.astype(jnp.float32)) * 1e-30
        return (ql + eps, qh + eps)
    row("entry construction (decompose)",
        chained_ms(t_decomp, (qlo, qhi), iters=4, marginal=True))

    # 2. the 9-op stable sort of 8M entries
    def t_sort9(i, c9):
        a, b, q, l2, h2 = c9
        ops = jax.lax.sort(
            (a, b, q, *[l2[:, d] for d in range(3)],
             *[h2[:, d] for d in range(3)]), num_keys=1, is_stable=True)
        eps = dep_scalar(ops[3]) * 1e-30
        return (ops[0] ^ 0, b + dep_scalar(ops[3]).astype(jnp.int32) * 0,
                q, l2 + eps, h2 + eps)
    row("9-op stable sort, 8M entries",
        chained_ms(t_sort9, (m_lo, m_hi, qid0, el, eh), iters=4,
                   marginal=True))

    # 3. 3-op sort + 6-column post-gather
    def t_sort3(i, c9):
        a, b, q, l2, h2 = c9
        eid = jnp.arange(a.shape[0], dtype=jnp.int32)
        sa, sb, seid = jax.lax.sort((a, b, eid), num_keys=1,
                                    is_stable=True)
        sl = jnp.take(l2, seid, axis=0)
        sh = jnp.take(h2, seid, axis=0)
        eps = dep_scalar(sl) * 1e-30
        return (sa ^ 0, sb, q, l2 + eps, h2 + eps)
    row("3-op sort + 6-col gather, 8M entries",
        chained_ms(t_sort3, (m_lo, m_hi, qid0, el, eh), iters=4,
                   marginal=True))

    sm_lo = jax.block_until_ready(jax.lax.sort((m_lo,))[0])

    # 4. rank lookups over 8M against 1M codes
    def t_rs(i, c1):
        v, = c1
        s = _rank_sorted(bvh.codes, v, "left")
        return (v + (dep_scalar(s.astype(jnp.float32)) * 0).astype(
            v.dtype),)
    row("_rank_sorted (packed merge), 8M vals",
        chained_ms(t_rs, (sm_lo,), iters=4, marginal=True))

    def t_ra(i, c1):
        v, = c1
        s = _rank_any(bvh.codes, v, "right")
        return (v + (dep_scalar(s.astype(jnp.float32)) * 0).astype(
            v.dtype),)
    row("_rank_any (searchsorted), 8M vals",
        chained_ms(t_ra, (m_hi,), iters=4, marginal=True))

    # 5. full decomposed query, counts only / peel
    def t_full(extract, tile, group):
        def f(i, cq):
            ql, qh = cq
            qid, hits, cnt, ok = query_overlaps_sorted(
                bvh, ql, qh, 16, tile=tile, group=group,
                extract=extract, decompose=True)
            eps = dep_scalar(cnt)
            if extract != "none":
                eps = eps + dep_scalar(hits[:, 0])
            return ql + eps, qh + eps
        return chained_ms(f, (qlo, qhi), iters=3, marginal=True)
    row("full decomposed counts T=256 G=32", t_full("none", 256, 32))
    row("full decomposed peel T=128 G=64", t_full("peel", 128, 64))


if __name__ == "__main__":
    main()
