"""LBVH build + query at 1M prims (BASELINE config 4), hardened timing."""

import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms, dep_scalar
from zpc_tpu.containers.bvh import (build_lbvh, build_lbvh_complete,
                                    query_overlaps, query_overlaps_sorted)


def main(n=1 << 20):
    rng = np.random.default_rng(0)
    c = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    h = np.full((n, 3), 0.002, np.float32)
    lo = jnp.asarray(c - h)
    hi = jnp.asarray(c + h)

    for name, builder in (("Karras/NSE", build_lbvh),
                          ("complete tree", build_lbvh_complete)):
        def build_body(i, lohi, _b=builder):
            l, h2 = lohi
            bvh = _b(l, h2)
            eps = dep_scalar(bvh.lo[0])
            return l + eps, h2 + eps

        ms = chained_ms(build_body, (lo, hi), iters=5, marginal=True,
                        label=f"LBVH build ({name}) {n//1000}k")
        print(f"    -> {n / (ms / 1e3) / 1e6:.1f} Mprims/s", flush=True)

    bvh = jax.block_until_ready(jax.jit(build_lbvh)(lo, hi))
    nq = n
    qlo = lo - 0.004
    qhi = hi + 0.004

    def q_sorted(i, q, consts):
        bvh, = consts
        ql, qh = q
        qid, hits, cnt, ok = query_overlaps_sorted(bvh, ql, qh, 16,
                                                   tile=256, group=32)
        eps = dep_scalar(cnt) + dep_scalar(hits[:, 0])
        return ql + eps, qh + eps

    ms = chained_ms(q_sorted, (qlo, qhi), iters=3, const=(bvh,),
                    label=f"sorted banded join {nq//1000}k queries")
    print(f"    -> {nq / (ms / 1e3) / 1e6:.2f} Mq/s", flush=True)

    # extraction strategy x (tile, hits) sweep
    for extract, mh, tile, grp in (("bitpeel", 16, 256, 32),
                                   ("bitpeel", 8, 256, 32),
                                   ("bitpeel", 16, 128, 64),
                                   ("bitpeel", 8, 128, 64),
                                   ("peel", 8, 256, 32),
                                   ("none", 0, 128, 64)):
        def q_ex(i, q, consts):
            b, = consts
            ql, qh = q
            qid, hits, cnt, ok = query_overlaps_sorted(
                b, ql, qh, max(mh, 1), tile=tile, group=grp,
                extract=extract)
            eps = dep_scalar(cnt)
            if extract != "none":
                eps = eps + dep_scalar(hits)
            return ql + eps, qh + eps

        ms = chained_ms(q_ex, (qlo, qhi), iters=3, const=(bvh,),
                        marginal=True,
                        label=f"join {extract}-{mh} tile={tile}")
        print(f"    -> {nq / (ms / 1e3) / 1e6:.2f} Mq/s", flush=True)

    # in-band fraction + hit sanity on a jitted run
    qid, hits, cnt, ok = jax.jit(
        lambda b, a, z: query_overlaps_sorted(b, a, z, 16, tile=256,
                                              group=32))(bvh, qlo, qhi)
    print(f"    in-band {float(jnp.mean(ok.astype(jnp.float32))):.4f}, "
          f"mean hits {float(jnp.mean(cnt.astype(jnp.float32))):.2f}",
          flush=True)

    # aligned-cell decomposed join: the variant that actually answers at
    # scale (plain band in-band ~0.002 at 1M); throughput counted per
    # QUERY (nq, not the 8x entries)
    for extr, mh in (("peel", 8), ("bitpeel", 8), ("none", 1)):
        def q_dec(i, q, consts):
            b, = consts
            ql, qh = q
            qid, hits, cnt, ok = query_overlaps_sorted(
                b, ql, qh, mh, tile=256, group=32, extract=extr,
                decompose=True)
            eps = dep_scalar(cnt)
            if extr != "none":
                eps = eps + dep_scalar(hits)
            return ql + eps, qh + eps

        ms = chained_ms(q_dec, (qlo, qhi), iters=3, const=(bvh,),
                        marginal=True,
                        label=f"decomposed join {extr}-{mh}")
        print(f"    -> {nq / (ms / 1e3) / 1e6:.2f} Mq/s", flush=True)
    qid, hits, cnt, ok = jax.jit(
        lambda b, a, z: query_overlaps_sorted(b, a, z, 8, tile=256,
                                              group=32, decompose=True)
    )(bvh, qlo, qhi)
    okq = jnp.ones((nq,), bool).at[qid].min(ok)
    cq = jnp.zeros((nq,), jnp.int32).at[qid].add(cnt)
    print(f"    decomposed per-query in-band "
          f"{float(jnp.mean(okq.astype(jnp.float32))):.4f}, "
          f"mean hits {float(jnp.mean(cq.astype(jnp.float32))):.2f}",
          flush=True)

    # banded nearest (point prims): exact-with-certificate fast path
    from zpc_tpu.containers.bvh import query_nearest_sorted
    cpts = jnp.asarray(c)

    def q_near(i, q, consts):
        b, pp = consts
        qid, prim, d2, ok = query_nearest_sorted(b, q, pp, tile=256,
                                                 group=32)
        eps = dep_scalar(d2) + dep_scalar(ok.astype(jnp.float32))
        return q + eps

    ms = chained_ms(q_near, cpts + 0.001, iters=3, const=(bvh, cpts),
                    label=f"banded nearest {nq//1000}k queries")
    print(f"    -> {nq / (ms / 1e3) / 1e6:.2f} Mq/s", flush=True)
    _, _, _, okb = jax.jit(lambda b, q, p: query_nearest_sorted(
        b, q, p, tile=256, group=32))(bvh, cpts + 0.001, cpts)
    print(f"    in-band {float(jnp.mean(okb.astype(jnp.float32))):.4f}",
          flush=True)

    # rope-walk for reference at a smaller query count
    nq2 = 8192
    def q_rope(i, q, consts):
        bvh, = consts
        ql, qh = q
        hits, cnt = query_overlaps(bvh, ql, qh, 16)
        eps = dep_scalar(cnt)
        return ql + eps, qh + eps

    ms = chained_ms(q_rope, (qlo[:nq2], qhi[:nq2]), iters=2, reps=2,
                    const=(bvh,), label=f"rope walk {nq2//1000}k queries")
    print(f"    -> {nq2 / (ms / 1e3) / 1e6:.3f} Mq/s", flush=True)


if __name__ == "__main__":
    main()
