"""Measure the decomposed banded join's cells=8/4/2 variants at 1M.

The decomposed join is ENTRY-bound (~13 ns/entry, docs/design.md), so
halving/quartering the entries per query via per-query lifted cell
levels should move the total near-linearly; the cost is a wider morton
interval for lifted queries -> possibly lower in-band fraction.  This
probe reports both sides of the tradeoff on the config-4 adversarial
scene (1M uniform tiny boxes).
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


def main(n=1 << 20):
    rng = np.random.default_rng(0)
    c = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    h = np.full((n, 3), 0.002, np.float32)
    lo = jnp.asarray(c - h)
    hi = jnp.asarray(c + h)
    bvh = jax.block_until_ready(jax.jit(build_lbvh)(lo, hi))
    qlo = lo - 0.004
    qhi = hi + 0.004

    for cells in (8, 4, 2):
        for extr, mh in (("none", 1), ("peel", 8)):
            def q_dec(i, q, consts):
                b, = consts
                ql, qh = q
                qid, hits, cnt, ok = query_overlaps_sorted(
                    b, ql, qh, mh, tile=256, group=32, extract=extr,
                    decompose=True, cells=cells)
                eps = dep_scalar(cnt)
                if extr != "none":
                    eps = eps + dep_scalar(hits)
                return ql + eps, qh + eps

            ms = chained_ms(q_dec, (qlo, qhi), iters=3, const=(bvh,),
                            marginal=True,
                            label=f"decomposed cells={cells} {extr}-{mh}")
            print(f"    -> {n / (ms / 1e3) / 1e6:.2f} Mq/s", flush=True)
        qid, hits, cnt, ok = jax.jit(
            lambda b, a, z: query_overlaps_sorted(
                b, a, z, 8, tile=256, group=32, decompose=True,
                cells=cells))(bvh, qlo, qhi)
        okq = jnp.ones((n,), bool).at[qid].min(ok)
        cq = jnp.zeros((n,), jnp.int32).at[qid].add(cnt)
        print(f"    cells={cells} per-query in-band "
              f"{float(jnp.mean(okq.astype(jnp.float32))):.4f}, "
              f"mean hits {float(jnp.mean(cq.astype(jnp.float32))):.2f}",
              flush=True)


if __name__ == "__main__":
    main()
