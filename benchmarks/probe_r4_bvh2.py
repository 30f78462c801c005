"""Round 4 LBVH bisection: where does the decomposed banded join's time
go, stage by stage?  Uses the _upto hooks (sort / front / full) at 1M
adversarial queries for: non-decomposed, cells=4, cells=4 + compact,
cells=8 + compact (budgets sized from the measured live-entry counts:
4.55M at cells=8, 3.15M at cells=4 — probe_r4_bvh.py)."""

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

    def run(label, **kw):
        for upto in ("sort", "front", ""):
            def q(i, qq, consts):
                b, = consts
                ql, qh = qq
                out = query_overlaps_sorted(b, ql, qh, 16, _upto=upto,
                                            **kw)
                # force EVERY output: with extract="none" hits is a
                # constant and XLA dead-codes the whole join if cnt and
                # in_band are not consumed (first version of this probe
                # measured exactly that)
                eps = sum(dep_scalar(o) for o in out)
                return ql + eps, qh + eps
            ms = chained_ms(q, (qlo, qhi), iters=3, const=(bvh,),
                            marginal=True,
                            label=f"{label} upto={upto or 'full':5}")

    run("plain     ", tile=256, group=32, extract="none")
    run("cells=4   ", tile=256, group=32, extract="none",
        decompose=True, cells=4)
    run("cells=4 cp", tile=256, group=32, extract="none",
        decompose=True, cells=4, compact=3328 * 1024)
    run("cells=8 cp", tile=256, group=32, extract="none",
        decompose=True, cells=8, compact=4864 * 1024)


if __name__ == "__main__":
    main()
