"""Round 4 restructured decomposed join, measured end-to-end at the 1M
adversarial scene (uniform tiny boxes straddling high morton planes):

- packed 8-op unstable entry sort (qid/k/valid in one operand, m_hi
  reconstructed post-sort) vs the old 9-op stable
- uniform_extent fast path (5-op sort: centers only)
- transposed [G, 3TL, T] counts/peel orientation (T minor = full lanes)

Expected from probe_r4_bvh3 component data: sort 30.3 -> 22.8 (8-op) /
~14 (5-op), join ~40 -> ~10-13 ms (4x below roofline -> at it).
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


def main():
    rng = np.random.default_rng(0)
    n = 1 << 20
    c = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    h = np.full((n, 3), 0.0005, np.float32)
    lo = jnp.asarray(c - h)
    hi = jnp.asarray(c + h)
    bvh = jax.block_until_ready(jax.jit(build_lbvh)(lo, hi))
    qlo, qhi = lo - 0.004, hi + 0.004
    pts = jnp.asarray(c)                # same boxes as centers +- r
    r = jnp.float32(0.0045)

    def bench(label, fn, args, iters=3):
        def body(i, qq, consts):
            b, = consts
            out = fn(b, *qq)
            eps = sum(dep_scalar(o) for o in out)
            return tuple(q + eps for q in qq)
        ms = chained_ms(body, args, iters=iters, const=(bvh,),
                        marginal=True, label=label)
        print(f"    -> {n / (ms / 1e3) / 1e6:.1f} Mq/s", flush=True)
        return ms

    cases = [
        ("counts c4 T128 G512 boxes (8-op+transposed)",
         lambda b, ql, qh: query_overlaps_sorted(
             b, ql, qh, 16, tile=128, group=512, extract="none",
             decompose=True, cells=4), (qlo, qhi)),
        ("counts c4 T128 G512 uniform_extent (5-op)",
         lambda b, p, p2: query_overlaps_sorted(
             b, p, p2, 16, tile=128, group=512, extract="none",
             decompose=True, cells=4, uniform_extent=r), (pts, pts)),
        ("counts c4 T256 G256 uniform_extent",
         lambda b, p, p2: query_overlaps_sorted(
             b, p, p2, 16, tile=256, group=256, extract="none",
             decompose=True, cells=4, uniform_extent=r), (pts, pts)),
        ("counts c2 T128 G512 uniform_extent",
         lambda b, p, p2: query_overlaps_sorted(
             b, p, p2, 16, tile=128, group=512, extract="none",
             decompose=True, cells=2, uniform_extent=r), (pts, pts)),
        ("counts c8 T128 G512 uniform_extent",
         lambda b, p, p2: query_overlaps_sorted(
             b, p, p2, 16, tile=128, group=512, extract="none",
             decompose=True, cells=8, uniform_extent=r), (pts, pts)),
        ("peel-8 c4 T128 G512 uniform_extent",
         lambda b, p, p2: query_overlaps_sorted(
             b, p, p2, 8, tile=128, group=512, extract="peel",
             decompose=True, cells=4, uniform_extent=r), (pts, pts)),
        ("peel-16 c4 T128 G512 uniform_extent",
         lambda b, p, p2: query_overlaps_sorted(
             b, p, p2, 16, tile=128, group=512, extract="peel",
             decompose=True, cells=4, uniform_extent=r), (pts, pts)),
        ("counts plain T128 uniform_extent (sanity)",
         lambda b, p, p2: query_overlaps_sorted(
             b, p, p2, 16, tile=128, extract="none",
             uniform_extent=r), (pts, pts)),
    ]
    for label, fn, args in cases:
        bench(label, fn, args)


if __name__ == "__main__":
    main()
