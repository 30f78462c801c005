"""Merge-path Pallas sort vs lax.sort on real TPU (config-1 flagship)."""

import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms
from benchmarks.sort_hybrid import sort_pallas

M = 0x7FFFFFFF


def main():
    rng = np.random.default_rng(0)
    for n in (1 << 19, 1 << 20, 1 << 21, 1 << 22, 1 << 24):
        xi = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))

        # correctness on hardware first
        got = np.asarray(jax.jit(sort_pallas)(xi))
        exp = np.sort(np.asarray(xi))
        assert (got == exp).all(), f"sort_pallas WRONG at n={n}"

        # chains long enough that marginal mode subtracts signal, not
        # tunnel noise: >= ~100 ms of on-chip work per chain
        iters = max(8, (1 << 25) // n)

        def evolve(k, i):
            return (k * jnp.int32(1664525) + i) & M

        def body_p(i, c):
            return (sort_pallas(evolve(c[0], i)),)

        ms = chained_ms(body_p, (xi,), iters=iters, marginal=True)
        print(f"sort_pallas {n >> 20:2d}M i32: {ms:8.3f} ms  "
              f"{n / (ms / 1e3) / 1e6:7.0f} Mkeys/s  (iters={iters})",
              flush=True)

        def body_l(i, c):
            return (jax.lax.sort(evolve(c[0], i), is_stable=False),)

        ms = chained_ms(body_l, (xi,), iters=iters, marginal=True)
        print(f"lax.sort    {n >> 20:2d}M i32: {ms:8.3f} ms  "
              f"{n / (ms / 1e3) / 1e6:7.0f} Mkeys/s", flush=True)


if __name__ == "__main__":
    main()
