"""Round 3: decomposed-join (T, G) sweep.

After the rank-free front (probe_bvh_decomp) the decomposed counts
query still runs 109 ms vs 20 ms for the same compare volume
non-decomposed.  Decomposition multiplied scan steps 8x (8x entries,
same G): per-step shapes shrank 8x while per-step fixed cost stayed,
so the loop overhead dominates.  Sweep group (and tile) to restore
per-step volume.
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
        try:
            ms = chained_ms(f, (qlo, qhi), iters=3, marginal=True)
            print(f"{extract:8s} T={tile:4d} G={group:4d} {ms:9.2f} ms "
                  f"{n / (ms / 1e3) / 1e6:7.2f} Mq/s", flush=True)
        except Exception as e:
            print(f"{extract:8s} T={tile:4d} G={group:4d} FAILED "
                  f"{str(e)[:90]}", flush=True)

    for g in (32, 128, 512, 2048):
        t_full("none", 256, g)
    t_full("none", 512, 1024)
    for g in (64, 256, 1024):
        t_full("peel", 128, g)
    t_full("bitpeel", 128, 512)


if __name__ == "__main__":
    main()
