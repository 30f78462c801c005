"""Round-5: stage ablation of build_lbvh at 1M.

_karras_topology alone is 25.5 ms (Pallas NSE), yet the full build
measures 74.5 — vs the complete-tree build's 20.2.  Cumulative-prefix
timings (later stages DCE'd away) attribute the remaining ~50 ms:

  s0  quantize + morton + argsort + code gather
  s1  + _karras_topology
  s2  + leaf box gathers (prim_lo[order], prim_hi[order])
  s3  + sparse min/max tables (levels x [n,3]) + internal-box gathers
  s4  + escape pointers + full LBvh assembly (== build_lbvh)

Run on TPU:  python benchmarks/probe_r5_build.py
"""

import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms, dep_scalar
from zpc_tpu.containers.bvh import _karras_topology, build_lbvh
from zpc_tpu.math.bits import clz32, morton3d


def stage(prim_lo, prim_hi, upto):
    n = prim_lo.shape[0]
    dim = prim_lo.shape[-1]
    big = jnp.asarray(3.4e38, prim_lo.dtype)
    centers = 0.5 * (prim_lo + prim_hi)
    scene_lo = jnp.min(prim_lo, 0)
    scene_hi = jnp.max(prim_hi, 0)
    extent = jnp.broadcast_to(
        jnp.max(jnp.maximum(scene_hi - scene_lo, 1e-12)), scene_lo.shape)
    q = jnp.clip(((centers - scene_lo) / extent * 1024.0), 0,
                 1023).astype(jnp.int32)
    codes = morton3d(q)
    order = jnp.argsort(codes)
    codes_s = codes[order]
    if upto == 0:
        return dep_scalar(codes_s) + dep_scalar(order)
    left, right, rlo, rhi = _karras_topology(codes_s)
    if upto == 1:
        return (dep_scalar(left) + dep_scalar(right) + dep_scalar(rlo)
                + dep_scalar(rhi))
    leaf_lo = prim_lo[order]
    leaf_hi = prim_hi[order]
    if upto == 2:
        return (dep_scalar(leaf_lo) + dep_scalar(leaf_hi)
                + dep_scalar(left) + dep_scalar(rhi))
    levels = int(np.ceil(np.log2(n))) + 1

    def sparse_table(base, combine, pad):
        tabs = [base]
        for k in range(1, levels):
            h = 1 << (k - 1)
            prev = tabs[-1]
            shifted = jnp.concatenate(
                [prev[h:], jnp.full((min(h, n),) + prev.shape[1:], pad,
                                    prev.dtype)])[:n]
            tabs.append(combine(prev, shifted))
        return jnp.stack(tabs)

    tmin = sparse_table(leaf_lo, jnp.minimum, big)
    tmax = sparse_table(leaf_hi, jnp.maximum, -big)
    length = (rhi - rlo + 1).astype(jnp.int32)
    kk = 31 - clz32(length)
    pow2 = (jnp.int32(1) << kk)
    a = rlo
    b = rhi - pow2 + 1
    flat_min = tmin.reshape(levels * n, dim)
    flat_max = tmax.reshape(levels * n, dim)
    int_lo = jnp.minimum(flat_min[kk * n + a], flat_min[kk * n + b])
    int_hi = jnp.maximum(flat_max[kk * n + a], flat_max[kk * n + b])
    return (dep_scalar(int_lo) + dep_scalar(int_hi)
            + dep_scalar(left) + dep_scalar(leaf_lo))


def main(n=1 << 20):
    rng = np.random.default_rng(0)
    c = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    h = np.full((n, 3), 0.002, np.float32)
    lo = jnp.asarray(c - h)
    hi = jnp.asarray(c + h)
    print(f"n={n >> 10}k dev={jax.devices()[0].device_kind}", flush=True)

    names = ["s0 sort+codes", "s1 +topology", "s2 +leaf boxes",
             "s3 +tables+int boxes"]
    for upto in range(4):
        def body(i, q, _upto=upto):
            l, h2 = q
            eps = stage(l, h2, _upto)
            return l + eps, h2 + eps
        ms = chained_ms(body, (lo, hi), iters=4, reps=3, marginal=True)
        print(f"{names[upto]:24s} {ms:8.2f} ms", flush=True)

    def body_full(i, q):
        l, h2 = q
        bvh = build_lbvh(l, h2)
        eps = dep_scalar(bvh.lo)
        return l + eps, h2 + eps
    ms = chained_ms(body_full, (lo, hi), iters=4, reps=3, marginal=True)
    print(f"{'s4 full build_lbvh':24s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
