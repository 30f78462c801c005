"""When does the Karras build pay vs the complete tree? (verdict item)

The complete-tree LBVH builds 18x faster (one sort + pairwise reductions)
but its topology is blind to the leaf distribution: internal boxes are
unions of morton-adjacent runs of fixed size.  Karras adapts subtree
ranges to code splits, so on *clustered* scenes its internal boxes are
tighter and queries visit fewer leaf windows.  This probe measures query
throughput with both trees on (a) uniform leaves, (b) 64 tight gaussian
clusters — the broad-phase regime of multi-body scenes (one BVH over
many separated objects, container/Bvh.hpp use in zeno).
"""

import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms, dep_scalar
from zpc_tpu.containers.bvh import (build_lbvh, build_lbvh_complete,
                                    query_overlaps_sorted)


def scenes(n, rng):
    u = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    k = 64
    centers = rng.uniform(0.1, 0.9, (k, 3))
    idx = rng.integers(0, k, n)
    c = (centers[idx] + 0.01 * rng.standard_normal((n, 3))
         ).astype(np.float32)
    return {"uniform": u, "clustered": c}


def main():
    n = 1 << 20
    nq = 1 << 20
    rng = np.random.default_rng(0)
    for name, c in scenes(n, rng).items():
        h = np.full((n, 3), 0.002, np.float32)
        lo = jnp.asarray(c - h)
        hi = jnp.asarray(c + h)
        qc = c[rng.permutation(n)[:nq]]
        qlo = jnp.asarray(qc - 0.004)
        qhi = jnp.asarray(qc + 0.004)
        for bname, bf in (("complete", build_lbvh_complete),
                          ("karras", build_lbvh)):
            print(f"[{name}/{bname}] building...", flush=True)
            bvh = jax.block_until_ready(jax.jit(bf)(lo, hi))
            print(f"[{name}/{bname}] built", flush=True)

            def q_counts(i, q, consts):
                b, = consts
                ql, qh = q
                _, _, cnt, _ = query_overlaps_sorted(
                    b, ql, qh, 16, tile=256, group=32, extract="none")
                eps = dep_scalar(cnt)
                return ql + eps, qh + eps

            ms = chained_ms(q_counts, (qlo, qhi), iters=3, const=(bvh,),
                            marginal=True,
                            label=f"{name}/{bname} counts 1M")
            print(f"  -> {nq / (ms / 1e3) / 1e6:.2f} Mq/s", flush=True)

            def q_peel(i, q, consts):
                b, = consts
                ql, qh = q
                _, hits, cnt, _ = query_overlaps_sorted(
                    b, ql, qh, 8, tile=256, group=32)
                eps = dep_scalar(cnt) + dep_scalar(hits)
                return ql + eps, qh + eps

            ms = chained_ms(q_peel, (qlo, qhi), iters=3, const=(bvh,),
                            marginal=True,
                            label=f"{name}/{bname} peel-8 1M")
            print(f"  -> {nq / (ms / 1e3) / 1e6:.2f} Mq/s", flush=True)


if __name__ == "__main__":
    main()
