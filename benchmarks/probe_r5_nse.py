"""Round-5: fused NSE sweep timings at 1M (VERDICT item 7).

Compares the three sweep forms at the production shape and the full
topology build that routes the winner.

Run on TPU:  python benchmarks/probe_r5_nse.py
"""

import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms, dep_scalar
from zpc_tpu.containers.bvh import _karras_topology, _nse_dir_chunked
from zpc_tpu.math.bits import morton3d
from zpc_tpu.ops.nse_pallas import nse_pallas


def main(n=1 << 20):
    rng = np.random.default_rng(0)
    c = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    codes = jnp.sort(morton3d(jnp.asarray(
        np.clip(c * 1024, 0, 1023).astype(np.int32))))
    g = n - 1
    d = jnp.asarray(rng.integers(1, 64, g, dtype=np.int32))
    print(f"n={n >> 10}k dev={jax.devices()[0].device_kind}", flush=True)

    def row(name, ms):
        print(f"{name:40s} {ms:9.3f} ms", flush=True)

    def t_pallas(i, cc):
        dd = jnp.maximum(cc[0] ^ (i & 0), 1)
        a = nse_pallas(dd, strict=False)
        b = nse_pallas(dd[::-1], strict=True)
        eps = (dep_scalar(a) + dep_scalar(b)).astype(jnp.int32)
        return (cc[0] + eps,)
    row("NSE fused Pallas (both dirs)",
        chained_ms(t_pallas, (d,), iters=8, marginal=True))

    def t_xla(i, cc):
        dd = jnp.maximum(cc[0] ^ (i & 0), 1)
        a = _nse_dir_chunked(dd, strict=False)
        b = _nse_dir_chunked(dd[::-1], strict=True)
        eps = (dep_scalar(a) + dep_scalar(b)).astype(jnp.int32)
        return (cc[0] + eps,)
    row("NSE fused XLA chunk-scan (both dirs)",
        chained_ms(t_xla, (d,), iters=4, marginal=True))

    def t_topo(i, cc):
        l, r, lo, hi = _karras_topology(cc[0] ^ (i & 0))
        eps = (dep_scalar(l) + dep_scalar(r) + dep_scalar(lo)
               + dep_scalar(hi)).astype(jnp.int32)
        return (cc[0] + eps,)
    row("topology (full, routed)",
        chained_ms(t_topo, (codes,), iters=4, marginal=True))


if __name__ == "__main__":
    main()
