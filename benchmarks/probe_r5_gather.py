"""Round-5: XLA row-gather rate vs table size and row width on v5e.

The Karras box stage pays ~18 ms per 1M-row gather from a [22M, 3]
table (probe_r5_boxes).  Is that per-row cost, per-byte cost, or
table-size-dependent?  Gathers measured: 1M random rows from tables of
varying (rows, width), plus a clamped-index variant.

Run on TPU:  python benchmarks/probe_r5_gather.py
"""

import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms, dep_scalar

NQ = 1 << 20


def main():
    rng = np.random.default_rng(0)
    print(f"dev={jax.devices()[0].device_kind} queries={NQ >> 10}k",
          flush=True)
    cases = [
        (22 << 20, 3),   # the current box-stage shape
        (1 << 20, 3),
        (1 << 20, 6),
        (1 << 20, 48),
        (1 << 20, 128),
        (8192, 3),
        (8192, 128),
        (131072, 6),
    ]
    for rows, width in cases:
        tab = jnp.asarray(rng.uniform(0, 1, (rows, width)).astype(
            np.float32))
        idx0 = jnp.asarray(rng.integers(0, rows, NQ, dtype=np.int32))

        def body(i, q, consts, _rows=rows):
            tab_, = consts
            ix, = q
            out = tab_[ix]
            eps = dep_scalar(out).astype(jnp.int32)
            return (jnp.clip(ix + eps, 0, _rows - 1),)

        ms = chained_ms(body, (idx0,), iters=6, reps=3, const=(tab,),
                        marginal=True)
        useful = NQ * width * 4 / 1e9
        print(f"gather [{NQ >> 20}M,{width:3d}] from [{rows:>9},{width:3d}]"
              f" : {ms:7.2f} ms  ({useful / (ms / 1e3):6.1f} GB/s useful)",
              flush=True)

    # sorted-index variant at the box shape (locality effect)
    rows, width = 22 << 20, 3
    tab = jnp.asarray(rng.uniform(0, 1, (rows, width)).astype(np.float32))
    idx0 = jnp.sort(jnp.asarray(
        rng.integers(0, rows, NQ, dtype=np.int32)))

    def body2(i, q, consts):
        tab_, = consts
        ix, = q
        out = tab_[ix]
        eps = dep_scalar(out).astype(jnp.int32)
        return (jnp.clip(ix + eps, 0, rows - 1),)

    ms = chained_ms(body2, (idx0,), iters=6, reps=3, const=(tab,),
                    marginal=True)
    print(f"gather [1M,3] from [22M,3] SORTED idx : {ms:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
