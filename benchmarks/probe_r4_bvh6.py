"""Round 4: in-context stage split of the decomposed uniform-extent
counts query (c4, T=128, G=512) at 1M — the isolated join loop runs
8.5 ms (probe_r4_bvh5) but the full query is 44 ms; find the other
~20 ms.  Stages are cumulative: sort -> front (+cert) -> win (window
gathers) -> full (join + epilogue).
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
    pts = jnp.asarray(c)
    r = jnp.float32(0.0045)

    for upto in ("gen", "sort", "front", "win", "", "plain"):
        if upto == "plain":
            def q(i, qq, consts):
                b, = consts
                out = query_overlaps_sorted(
                    b, qq[0], qq[0], 16, tile=128, extract="none",
                    uniform_extent=r, _upto="win")
                eps = sum(dep_scalar(o) for o in out)
                return (qq[0] + eps,)
            label = "plain upto=win"
        else:
            def q(i, qq, consts, _u=upto):
                b, = consts
                out = query_overlaps_sorted(
                    b, qq[0], qq[0], 16, tile=128, group=512,
                    extract="none", decompose=True, cells=4,
                    uniform_extent=r, _upto=_u)
                eps = sum(dep_scalar(o) for o in out)
                return (qq[0] + eps,)
            label = f"c4 uniform upto={upto or 'FULL'}"
        ms = chained_ms(q, (pts,), iters=3, const=(bvh,),
                        marginal=True, label=label)
        print(f"    -> {n / (ms / 1e3) / 1e6:.1f} Mq/s", flush=True)


if __name__ == "__main__":
    main()
