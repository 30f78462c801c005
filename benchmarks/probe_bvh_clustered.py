"""When does the Karras build pay vs the complete tree? (verdict item)

The complete-tree LBVH builds 18x faster (one sort + pairwise reductions)
but its topology is blind to the leaf distribution: internal boxes are
unions of morton-adjacent runs of fixed size.  Karras adapts subtree
ranges to code splits, so on *clustered* scenes its internal boxes are
tighter and traversal visits fewer nodes.

NOTE the banded join (`query_overlaps_sorted`) never touches internal
nodes — leaf order is the same morton sort in both builds, so broad-phase
AABB throughput is build-independent by construction.  Topology only
matters for the *traversal* queries: `query_nearest`, `query_ray`, and
the rope-walk `query_overlaps`.  This probe therefore measures traversal
queries on (a) uniform leaves, (b) 64 tight gaussian clusters — the
regime of multi-body scenes (one BVH over many separated objects,
reference container/Bvh.hpp use in zeno).
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
                                    query_nearest, query_overlaps,
                                    query_ray)


def scenes(n, rng):
    u = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    k = 64
    centers = rng.uniform(0.1, 0.9, (k, 3))
    idx = rng.integers(0, k, n)
    c = (centers[idx] + 0.01 * rng.standard_normal((n, 3))
         ).astype(np.float32)
    return {"uniform": u, "clustered": c}


def make_prim_hit(lo, hi):
    """Ray-AABB slab test against the primitive's own box."""
    def prim_hit(j, o, d):
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        t0 = (lo[j] - o) * inv
        t1 = (hi[j] - o) * inv
        tn = jnp.max(jnp.minimum(t0, t1))
        tf = jnp.min(jnp.maximum(t0, t1))
        ok = (tf >= tn) & (tf >= 0)
        return jnp.where(ok, jnp.maximum(tn, 0.0), jnp.inf)
    return prim_hit


def main():
    n = 1 << 18
    rng = np.random.default_rng(0)
    for name, c in scenes(n, rng).items():
        h = np.full((n, 3), 0.002, np.float32)
        lo = jnp.asarray(c - h)
        hi = jnp.asarray(c + h)
        pts = jnp.asarray(c)
        for bname, bf in (("complete", build_lbvh_complete),
                          ("karras", build_lbvh)):
            bvh = jax.block_until_ready(jax.jit(bf)(lo, hi))

            nq = 1 << 14
            qp = pts[rng.permutation(n)[:nq]] + 0.003

            def q_near(i, q, consts):
                b, pr = consts
                ids, dist = query_nearest(
                    b, q, lambda j, p: jnp.linalg.norm(p - pr[j]))
                eps = dep_scalar(dist)
                return q + eps

            ms = chained_ms(q_near, qp, iters=2, reps=2,
                            const=(bvh, pts), marginal=True,
                            label=f"{name}/{bname} nearest 16k")
            print(f"  -> {nq / (ms / 1e3) / 1e3:.1f} Kq/s", flush=True)

            nq2 = 1 << 13
            o = np.full((nq2, 3), 0.5, np.float32) + \
                0.4 * rng.standard_normal((nq2, 3)).astype(np.float32)
            d = rng.standard_normal((nq2, 3)).astype(np.float32)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            o_j, d_j = jnp.asarray(o), jnp.asarray(d)

            def q_ray(i, q, consts):
                b, blo, bhi = consts
                oo, dd = q
                pid, t = query_ray(b, oo, dd, make_prim_hit(blo, bhi))
                eps = dep_scalar(jnp.where(jnp.isfinite(t), t, 0.0))
                return oo + eps, dd + eps

            ms = chained_ms(q_ray, (o_j, d_j), iters=2, reps=2,
                            const=(bvh, lo, hi), marginal=True,
                            label=f"{name}/{bname} ray 8k")
            print(f"  -> {nq2 / (ms / 1e3) / 1e3:.1f} Kq/s", flush=True)

            nq3 = 1 << 13
            ql = lo[:nq3] - 0.004
            qh = hi[:nq3] + 0.004

            def q_rope(i, q, consts):
                b, = consts
                a, z = q
                hits, cnt = query_overlaps(b, a, z, 16)
                eps = dep_scalar(cnt)
                return a + eps, z + eps

            ms = chained_ms(q_rope, (ql, qh), iters=2, reps=2,
                            const=(bvh,), marginal=True,
                            label=f"{name}/{bname} rope-walk overlap 8k")
            print(f"  -> {nq3 / (ms / 1e3) / 1e3:.1f} Kq/s", flush=True)


if __name__ == "__main__":
    main()
