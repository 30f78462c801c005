"""Round 4 LBVH levers, measured in isolation at the cells=4 shapes
(4M entries over 1M leaves):

1. the entry sort: 9-op stable (current) vs unstable vs 8-op (k packed
   into qid, m_hi recomputed) vs 2-op (m_lo, qidk) + row-gather of the
   box columns from a [nq0, 8] f32 matrix
2. the row gather rate at 32-byte rows (the MPM probe's 189 GB/s was
   768-byte rows — row size is the open variable)
3. the join's per-step floor: full query at cells=4 with G in
   {32, 128, 256} and T in {256, 128} (join volume is 3nT — invariant
   in entries, linear in T — but steps = nq/(GT) each pay a fixed cost)
"""

import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms, dep_scalar
from zpc_tpu.containers.bvh import build_lbvh, query_overlaps_sorted
from zpc_tpu.math.bits import clz32


def main():
    rng = np.random.default_rng(0)
    n = 1 << 20
    c = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    h = np.full((n, 3), 0.0005, np.float32)
    lo = jnp.asarray(c - h)
    hi = jnp.asarray(c + h)
    bvh = jax.block_until_ready(jax.jit(build_lbvh)(lo, hi))
    qlo, qhi = lo - 0.004, hi + 0.004
    R = 4
    nq = n * R

    # build the decomposed entry operands once (host of the sort)
    def entries(ql, qh):
        def quant(x):
            return jnp.clip((x - bvh.scene_lo) / bvh.scene_extent
                            * 1024.0, 0, 1023).astype(jnp.int32)
        lo_c = quant(ql - bvh.half_max)
        hi_c = quant(qh + bvh.half_max)
        ext = jnp.max(hi_c - lo_c, axis=-1)
        k = jnp.maximum(32 - clz32(jnp.maximum(ext - 1, 0).astype(
            jnp.uint32)), 0)
        hh = 32 - clz32((lo_c ^ hi_c).astype(jnp.uint32))
        k = jnp.maximum(k, jnp.min(hh, axis=-1))
        k = jnp.minimum(k, 10).astype(jnp.int32)
        c0 = lo_c >> k[:, None]
        c1 = hi_c >> k[:, None]
        s = c1 > c0
        sidx = jnp.cumsum(s.astype(jnp.int32), -1) - s
        ii = jnp.arange(R, dtype=jnp.int32)
        off = (jnp.right_shift(ii[None, :, None], sidx[:, None, :])
               & 1) * s[:, None, :]
        cell = c0[:, None, :] + off
        nstr = jnp.sum(s.astype(jnp.int32), -1)
        valid = ii[None, :] < jnp.left_shift(1, nstr)[:, None]
        from zpc_tpu.containers.bvh import morton3d
        base = morton3d(cell) << (3 * k)[:, None]
        m_lo = jnp.where(valid, base, base[:, :1]).reshape(-1)
        m_hi = jnp.where(valid, base + (jnp.left_shift(
            jnp.int32(1), 3 * k))[:, None] - 1,
            base[:, :1] - 1).reshape(-1)
        big = jnp.float32(3.4e38)
        qle = jnp.where(valid.reshape(-1)[:, None],
                        jnp.repeat(ql, R, axis=0), big)
        qhe = jnp.where(valid.reshape(-1)[:, None],
                        jnp.repeat(qh, R, axis=0), -big)
        qid = jnp.repeat(jnp.arange(n, dtype=jnp.int32), R)
        kk = jnp.repeat(k, R)
        vv = valid.reshape(-1)
        qidk = (qid << 5) | (kk << 1) | vv.astype(jnp.int32)
        return m_lo, m_hi, qid, qle, qhe, qidk

    ent = jax.block_until_ready(jax.jit(entries)(qlo, qhi))
    m_lo, m_hi, qid, qle, qhe, qidk = ent

    def sortbench(label, nops, stable):
        def body(i, cs, consts):
            ml, mh, qi, qa, qb, qk = consts
            x, = cs
            ml = ml + x.astype(jnp.int32)
            if nops == 9:
                ops = (ml, mh, qi, *[qa[:, d] for d in range(3)],
                       *[qb[:, d] for d in range(3)])
            elif nops == 8:
                ops = (ml, qk, *[qa[:, d] for d in range(3)],
                       *[qb[:, d] for d in range(3)])
            else:
                ops = (ml, qk)
            out = jax.lax.sort(ops, num_keys=1, is_stable=stable)
            eps = sum(dep_scalar(o) for o in out)
            return (x + eps,)
        ms = chained_ms(body, (jnp.zeros((nq,), jnp.float32),), iters=3,
                        const=ent, marginal=True, label=label)
        print(f"    -> {nq / (ms / 1e3) / 1e6:.0f} Mentries/s",
              flush=True)

    sortbench("sort 9-op stable (current)", 9, True)
    sortbench("sort 9-op unstable        ", 9, False)
    sortbench("sort 8-op unstable        ", 8, False)
    sortbench("sort 2-op unstable        ", 2, False)

    # row gather: [1M, 8] f32 rows by the sorted qid (32-byte rows)
    qbox = jnp.concatenate([qlo, qhi, jnp.zeros((n, 2), jnp.float32)], 1)
    sqid = jax.block_until_ready(jax.jit(
        lambda a, b: jax.lax.sort((a, b), num_keys=1,
                                  is_stable=False)[1])(m_lo, qidk)) >> 5

    def gath(i, cs, consts):
        qb, si = consts
        x, = cs
        rows = qb[jnp.clip(si + x.astype(jnp.int32)[:1], 0, n - 1)]
        return (x + dep_scalar(rows),)
    ms = chained_ms(gath, (jnp.zeros((nq,), jnp.float32),), iters=6,
                    const=(qbox, sqid), marginal=True,
                    label="row gather [1M,8]f32 x 4M idx")
    print(f"    -> {nq * 32 / (ms / 1e3) / 1e9:.1f} GB/s", flush=True)

    # 1-D column gather for comparison
    col = qbox[:, 0]

    def gath1(i, cs, consts):
        cb, si = consts
        x, = cs
        v = jnp.take(cb, jnp.clip(si + x.astype(jnp.int32)[:1],
                                  0, n - 1))
        return (x + dep_scalar(v),)
    ms = chained_ms(gath1, (jnp.zeros((nq,), jnp.float32),), iters=6,
                    const=(col, sqid), marginal=True,
                    label="1-D gather [1M]f32 x 4M idx")
    print(f"    -> {nq * 4 / (ms / 1e3) / 1e9:.1f} GB/s", flush=True)

    # join G/T sweep (full query, counts)
    for tile, group in ((256, 32), (256, 128), (256, 256), (128, 256),
                        (128, 512)):
        def q(i, qq, consts):
            b, = consts
            ql, qh = qq
            out = query_overlaps_sorted(b, ql, qh, 16, tile=tile,
                                        group=group, extract="none",
                                        decompose=True, cells=4)
            eps = sum(dep_scalar(o) for o in out)
            return ql + eps, qh + eps
        ms = chained_ms(q, (qlo, qhi), iters=3, const=(bvh,),
                        marginal=True,
                        label=f"counts cells=4 T={tile} G={group}")
        print(f"    -> {n / (ms / 1e3) / 1e6:.1f} Mq/s", flush=True)


if __name__ == "__main__":
    main()
