"""Config-1 primitive throughput with hardened tunnel timing.

Measures reduce / inclusive-scan / sort / radix-window sort at 1M and
16M elements, plus a fused-context reduce (the reduction consumed inside
a larger fused program — the honest "inside a real program" number the
round-1 review asked for).  CUB anchors (A100, published): reduce
~1.3 TB/s-class, DeviceRadixSort ~10-25 Gkeys/s.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms, dep_scalar


def run(n, label):
    rng = np.random.default_rng(0)
    xf = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    xi = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
    gb = n * 4 / 1e9

    # reduce: the dependence rides through abs-sum (unfoldable)
    def red(i, c):
        s, = c
        return (s + jnp.sum(jnp.abs(xf + s * 1e-37)),)
    ms = chained_ms(red, (jnp.float32(0),), iters=40)
    print(f"reduce {label:5s}  {ms:7.3f} ms  {gb/(ms/1e3):7.1f} GB/s",
          flush=True)

    # fused-context reduce: reduction of a computed (fused) elementwise
    # expression — what a real program does; bandwidth = 1 read
    def redf(i, c):
        s, = c
        y = xf * 1.0001 + s * 1e-37
        z = y * y - 0.5 * y
        return (s + jnp.sum(jnp.abs(z)),)
    ms = chained_ms(redf, (jnp.float32(0),), iters=40)
    print(f"fused elementwise+reduce {label:5s}  {ms:7.3f} ms  "
          f"{gb/(ms/1e3):7.1f} GB/s", flush=True)

    # inclusive scan (read + write)
    def scan(i, c):
        x, = c
        y = jnp.cumsum(x)
        return (x + y * 1e-37,)
    ms = chained_ms(scan, (xf,), iters=20)
    print(f"scan   {label:5s}  {ms:7.3f} ms  {2*gb/(ms/1e3):7.1f} GB/s",
          flush=True)

    # sort (keys only)
    def srt(i, c):
        k, = c
        return (jax.lax.sort(jnp.roll(k, 1) ^ i),)
    ms = chained_ms(srt, (xi,), iters=8)
    print(f"sort   {label:5s}  {ms:7.3f} ms  "
          f"{n/(ms/1e3)/1e6:7.0f} Mkeys/s", flush=True)

    # sort pairs
    pid = jnp.arange(n, dtype=jnp.int32)

    def srtp(i, c):
        k, v = c
        return jax.lax.sort((jnp.roll(k, 1) ^ i, v), num_keys=1)
    ms = chained_ms(srtp, (xi, pid), iters=8)
    print(f"sortkv {label:5s}  {ms:7.3f} ms  "
          f"{n/(ms/1e3)/1e6:7.0f} Mpairs/s", flush=True)

    # bit-windowed radix sort (8-bit window): mask + sort the window only
    from zpc_tpu.core.executor import Executor
    from zpc_tpu.parallel.primitives import radix_sort_pair
    pol = Executor()

    def srtw(i, c):
        k, v = c
        ko, vo = radix_sort_pair(pol, jnp.roll(k, 1) ^ i, v, sbit=8,
                                 ebit=16)
        return ko, vo
    ms = chained_ms(srtw, (xi, pid), iters=8)
    print(f"radix window [8,16) {label:5s}  {ms:7.3f} ms  "
          f"{n/(ms/1e3)/1e6:7.0f} Mpairs/s", flush=True)


def main():
    run(1_000_000, "1M")
    run(16_777_216, "16M")


if __name__ == "__main__":
    main()
