"""Stage breakdown of the Karras/NSE LBVH build at 1M (round 3).

The NSE rewrite took the build 457 -> ~105 ms; this probe attributes the
remainder: morton+sort, the 65-value NSE sweep (XLA cummax/cummin are
log-depth multi-pass — the suspected dominator), children scatters, the
box sparse tables, the box gathers, and the escape scatter-max.
"""

import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms, dep_scalar
from zpc_tpu.containers.bvh import _karras_topology
from zpc_tpu.math.bits import morton3d, common_prefix_length


def main(n=1 << 20):
    rng = np.random.default_rng(0)
    c = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    codes = jnp.sort(morton3d(jnp.asarray(
        np.clip(c * 1024, 0, 1023).astype(np.int32))))
    g = n - 1

    def row(name, ms):
        print(f"{name:38s} {ms:9.3f} ms", flush=True)

    # full topology
    def t_topo(i, cc):
        l, r, lo, hi = _karras_topology(cc[0] ^ (i & 0))
        eps = (dep_scalar(l) + dep_scalar(r) + dep_scalar(lo)
               + dep_scalar(hi)).astype(jnp.int32)
        return (cc[0] + eps,)
    row("topology (full)", chained_ms(t_topo, (codes,), iters=4,
                                      marginal=True))

    # NSE sweep alone (the 65-value loop, both directions)
    def nse_only(cc):
        gi = jnp.arange(g, dtype=jnp.int32)
        d = common_prefix_length(cc[:-1], cc[1:]).astype(jnp.int32)
        BIG = jnp.int32(1 << 30)
        none_l = jnp.full((g,), -1, jnp.int32)
        none_r = jnp.full((g,), BIG, jnp.int32)
        nsel, nser = none_l, none_r
        run_l, run_r = none_l, none_r
        for v in range(65):
            eq = d == v
            nser = jnp.where(eq, run_r, nser)
            fp = jax.lax.cummin(jnp.where(eq, gi, BIG), reverse=True)
            run_r = jnp.minimum(run_r, jnp.concatenate([fp[1:],
                                                        none_r[:1]]))
            lp = jax.lax.cummax(jnp.where(eq, gi, -1))
            run_l = jnp.maximum(run_l, jnp.concatenate([none_l[:1],
                                                        lp[:-1]]))
            nsel = jnp.where(eq, run_l, nsel)
        return nsel, nser

    def t_nse(i, cc):
        a, b = nse_only(cc[0] ^ (i & 0))
        eps = (dep_scalar(a) + dep_scalar(b)).astype(jnp.int32)
        return (cc[0] + eps,)
    row("NSE sweep (65 x cummax+cummin)", chained_ms(t_nse, (codes,),
                                                     iters=4,
                                                     marginal=True))

    # single cummax at [g] for scale
    def t_cmax(i, cc):
        s = jax.lax.cummax(cc[0])
        return (cc[0] + dep_scalar(s).astype(jnp.int32),)
    row("one cummax [1M] i32", chained_ms(t_cmax, (codes,), iters=8,
                                          marginal=True))

    # children scatters
    gi = jnp.arange(g, dtype=jnp.int32)
    par = jnp.asarray(rng.integers(0, g, 2 * n - 1).astype(np.int32))
    ids = jnp.arange(2 * n - 1, dtype=jnp.int32)

    def t_scat(i, cc):
        tgt = (par + i) % g
        out = jnp.full((g,), -1, jnp.int32).at[tgt].set(ids, mode="drop")
        return (cc[0] + dep_scalar(out).astype(jnp.int32),)
    row("children scatter [2n-1]->[g]",
        chained_ms(t_scat, (codes,), iters=4, marginal=True))

    # sparse tables + box gathers (as in build_lbvh)
    lo = jnp.asarray(c - 0.002)
    hi = jnp.asarray(c + 0.002)
    levels = int(np.ceil(np.log2(n))) + 1

    def tables(leaf_lo, leaf_hi):
        def sparse_table(base, combine, pad):
            tabs = [base]
            for k in range(1, levels):
                h = 1 << (k - 1)
                prev = tabs[-1]
                shifted = jnp.concatenate(
                    [prev[h:], jnp.full((min(h, n),) + prev.shape[1:],
                                        pad, prev.dtype)])[:n]
                tabs.append(combine(prev, shifted))
            return jnp.stack(tabs)
        tmin = sparse_table(leaf_lo, jnp.minimum, 3.4e38)
        tmax = sparse_table(leaf_hi, jnp.maximum, -3.4e38)
        return tmin, tmax

    def t_tab(i, cc):
        tmn, tmx = tables(cc[0], cc[1])
        eps = dep_scalar(tmn[-1]) + dep_scalar(tmx[-1])
        return (cc[0] + eps, cc[1] + eps)
    row("box sparse tables (21 levels)",
        chained_ms(t_tab, (lo, hi), iters=3, marginal=True))

    tmn, tmx = jax.jit(tables)(lo, hi)
    flat_min = tmn.reshape(levels * n, 3)
    a_idx = jnp.asarray(rng.integers(0, n, g).astype(np.int32))
    kkn = jnp.asarray(rng.integers(0, levels, g).astype(np.int32)) * n

    def t_gath(i, cc):
        ix = (kkn + (a_idx + i) % n)
        v = flat_min[ix]
        return (cc[0] + dep_scalar(v),)
    row("box row gather [g] from [21n,3] x1",
        chained_ms(t_gath, (lo,), iters=4, marginal=True))


if __name__ == "__main__":
    main()
