"""Pallas scan vs XLA associative_scan on real TPU (config-1 scan row)."""

import sys
import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms
from zpc_tpu.ops.scan_pallas import scan_pallas


def main():
    for n in (1 << 20, 1 << 24):
        x = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                        jnp.float32)

        def pallas_body(i, a):
            return scan_pallas(a * 1.0000001)

        def xla_body(i, a):
            return jax.lax.associative_scan(jnp.add, a * 1.0000001)

        for label, body in (("pallas", pallas_body), ("xla", xla_body)):
            ms = chained_ms(body, x, iters=20, reps=3, marginal=True,
                            label=f"scan {label} {n>>20}M f32")
            gbs = 2 * 4 * n / (ms * 1e-3) / 1e9
            print(f"  -> {gbs:.0f} GB/s", flush=True)

        xi = jnp.asarray(np.random.default_rng(1).integers(0, 100, n),
                         jnp.int32)

        def pallas_i(i, a):
            return scan_pallas(a ^ 1)

        ms = chained_ms(pallas_i, xi, iters=20, reps=3, marginal=True,
                        label=f"scan pallas {n>>20}M i32")
        print(f"  -> {2 * 4 * n / (ms * 1e-3) / 1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
