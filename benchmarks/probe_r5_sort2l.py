"""Round-5 probe: is a BATCHED minor-dim lax.sort much faster than the
flat sort at the entry-sort shapes?  (Feasibility gate for a columnsort
two-level entry sort — VERDICT r5 item 2.)

The 5-op flat sort at 4M entries is 10.6 ms (the c4 exact join's
biggest term).  A batched [s, n/s] sort runs log^2(n/s) compare rounds
instead of log^2(n) AND each row's working set fits VMEM; columnsort
(Leighton '85) turns 4 such batched sorts + 2 transposes into a full
sort when n/s >= 2(s-1)^2.  This probe measures the primitive costs.

Run on TPU:  python benchmarks/probe_r5_sort2l.py
"""

import sys
import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms


def main():
    n = 1 << 22                                  # 4M (c4 at 1M queries)
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
    pay_i = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
    pays = [jnp.asarray(rng.standard_normal(n), jnp.float32)
            for _ in range(3)]
    print(f"n={n} dev={jax.devices()[0].device_kind}", flush=True)

    def mk_flat(nops):
        def f(i, c):
            k = c[0] ^ i                          # data-dependent chain
            out = jax.lax.sort((k, *c[1:nops]), num_keys=1,
                               is_stable=False)
            return out + tuple(c[nops:])
        return f

    def mk_batched(nops, s):
        r = n // s
        def f(i, c):
            k = (c[0] ^ i).reshape(s, r)
            ops = tuple(o.reshape(s, r) for o in c[1:nops])
            out = jax.lax.sort((k, *ops), num_keys=1, is_stable=False)
            return tuple(o.reshape(-1) for o in out) + tuple(c[nops:])
        return f

    c0 = (key, pay_i, *pays)
    for nops in (2, 5):
        ms = chained_ms(mk_flat(nops), c0, iters=8, reps=3,
                        marginal=True)
        print(f"flat    {nops}-op          : {ms:7.2f} ms", flush=True)
        for s in (32, 64, 128, 256):
            ms = chained_ms(mk_batched(nops, s), c0, iters=8, reps=3,
                            marginal=True)
            print(f"batched {nops}-op [{s:3d},{n // s:6d}]: {ms:7.2f} ms",
                  flush=True)

    # transpose cost (columnsort steps 2/4): [r, s] <-> [s, r]
    for s in (64, 128):
        r = n // s
        def tp(i, c):
            m = (c[0] ^ i).reshape(r, s).T.reshape(-1)
            return (m,) + c[1:]
        ms = chained_ms(tp, c0, iters=8, reps=3, marginal=True)
        print(f"transpose 1-op [{n // s:6d},{s:3d}]->T: {ms:7.2f} ms",
              flush=True)
        def tp5(i, c):
            outs = tuple((o ^ i if j == 0 else o).reshape(r, s)
                         .T.reshape(-1) for j, o in enumerate(c[:5]))
            return outs + c[5:]
        ms = chained_ms(tp5, c0, iters=8, reps=3, marginal=True)
        print(f"transpose 5-op [{n // s:6d},{s:3d}]->T: {ms:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
