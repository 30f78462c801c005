"""Round-5: where the Karras build's ~32 ms box stage goes, and two
cheaper RMQ formulations.

build_lbvh at 1M: sort/codes 8.75 + topology 25.3 + leaf gathers 8.3 +
box tables/gathers/escape ~= 32 (probe_r5_build).  Here the box stage
is isolated: tables-only, tables+query-gathers, escape-only — then
variants: bf16 tables (halve bytes; conservative boxes need directed
rounding, timed here with plain casts) and a blocked hybrid (fine
dyadic levels 0..6 for ranges < 128 + a 128-block table above, so the
materialized bytes drop 2.3x at +2 gathers).

Run on TPU:  python benchmarks/probe_r5_boxes.py
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

BIGF = 3.4e38


def make_tables(leaf_lo, leaf_hi, levels, dtype=None):
    n = leaf_lo.shape[0]

    def sparse_table(base, combine, pad):
        if dtype is not None:
            base = base.astype(dtype)
        tabs = [base]
        for k in range(1, levels):
            h = 1 << (k - 1)
            prev = tabs[-1]
            shifted = jnp.concatenate(
                [prev[h:], jnp.full((min(h, n),) + prev.shape[1:], pad,
                                    prev.dtype)])[:n]
            tabs.append(combine(prev, shifted))
        return jnp.stack(tabs)

    big = jnp.asarray(BIGF, leaf_lo.dtype if dtype is None else dtype)
    tmin = sparse_table(leaf_lo, jnp.minimum, big)
    tmax = sparse_table(leaf_hi, jnp.maximum, -big)
    return tmin, tmax


def query_tables(tmin, tmax, rlo, rhi, n, dim):
    levels = tmin.shape[0]
    length = (rhi - rlo + 1).astype(jnp.int32)
    kk = 31 - clz32(length)
    pow2 = (jnp.int32(1) << kk)
    a = rlo
    b = rhi - pow2 + 1
    flat_min = tmin.reshape(levels * n, dim)
    flat_max = tmax.reshape(levels * n, dim)
    int_lo = jnp.minimum(flat_min[kk * n + a], flat_min[kk * n + b])
    int_hi = jnp.maximum(flat_max[kk * n + a], flat_max[kk * n + b])
    return int_lo, int_hi


def blocked_boxes(leaf_lo, leaf_hi, rlo, rhi, B=128, fine_levels=7):
    """Hybrid RMQ: fine dyadic tables for ranges < B; block-granular
    sparse table + in-block prefix/suffix for ranges >= B."""
    n, dim = leaf_lo.shape
    nb = n // B
    # fine levels 0..fine_levels-1 (range lengths < 2^fine_levels = B)
    ftmin, ftmax = make_tables(leaf_lo, leaf_hi, fine_levels)
    # in-block prefix/suffix (axis-1 cummin over [nb, B, dim])
    l3 = leaf_lo.reshape(nb, B, dim)
    h3 = leaf_hi.reshape(nb, B, dim)
    pref_min = jax.lax.cummin(l3, axis=1).reshape(n, dim)
    pref_max = jax.lax.cummax(h3, axis=1).reshape(n, dim)
    suf_min = jax.lax.cummin(l3, axis=1, reverse=True).reshape(n, dim)
    suf_max = jax.lax.cummax(h3, axis=1, reverse=True).reshape(n, dim)
    # block-level sparse tables over block mins [nb, dim]
    bmin = jnp.min(l3, axis=1)
    bmax = jnp.max(h3, axis=1)
    blevels = int(np.ceil(np.log2(max(nb, 2)))) + 1
    btmin, btmax = make_tables(bmin, bmax, blevels)

    length = (rhi - rlo + 1).astype(jnp.int32)
    short = length < (1 << (fine_levels - 1)) * 2  # fits fine tables
    # --- fine path
    f_lo, f_hi = query_tables(ftmin, ftmax, rlo,
                              jnp.minimum(rhi, rlo + (1 << fine_levels)
                                          - 1), n, dim)
    # --- blocked path (only valid when ba < bb)
    ba = rlo // B
    bb = rhi // B
    big = jnp.asarray(BIGF, leaf_lo.dtype)
    s_lo = suf_min[rlo]
    s_hi = suf_max[rlo]
    p_lo = pref_min[rhi]
    p_hi = pref_max[rhi]
    # full blocks strictly between ba and bb
    has_mid = bb - ba >= 2
    mlo = jnp.where(has_mid, ba + 1, 0)
    mhi = jnp.where(has_mid, bb - 1, 0)
    blen = (mhi - mlo + 1).astype(jnp.int32)
    bk = 31 - clz32(jnp.maximum(blen, 1))
    bpow = (jnp.int32(1) << bk)
    m_lo, m_hi = query_tables(btmin, btmax, mlo, mhi, nb, dim)
    m_lo = jnp.where(has_mid[:, None], m_lo, big)
    m_hi = jnp.where(has_mid[:, None], m_hi, -big)
    b_lo = jnp.minimum(jnp.minimum(s_lo, p_lo), m_lo)
    b_hi = jnp.maximum(jnp.maximum(s_hi, p_hi), m_hi)
    int_lo = jnp.where(short[:, None], f_lo, b_lo)
    int_hi = jnp.where(short[:, None], f_hi, b_hi)
    return int_lo, int_hi


def main(n=1 << 20):
    rng = np.random.default_rng(0)
    c = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    h = np.full((n, 3), 0.002, np.float32)
    lo = jnp.asarray(c - h)
    hi = jnp.asarray(c + h)
    dim = 3
    print(f"n={n >> 10}k dev={jax.devices()[0].device_kind}", flush=True)

    # fixed topology/leaf inputs (precomputed outside the chain)
    q = jnp.clip((c - c.min(0)) / (c.max(0).max() - c.min(0).min())
                 * 1024.0, 0, 1023).astype(jnp.int32)
    codes = jnp.sort(morton3d(q))
    left, right, rlo, rhi = jax.block_until_ready(
        jax.jit(_karras_topology)(codes))
    levels = int(np.ceil(np.log2(n))) + 1

    def t_tables(i, qq):
        l, h2 = qq
        tmin, tmax = make_tables(l, h2, levels)
        eps = dep_scalar(tmin[-1]) + dep_scalar(tmax[-1])
        return l + eps, h2 + eps
    ms = chained_ms(t_tables, (lo, hi), iters=4, reps=3, marginal=True)
    print(f"{'tables only (21 lvls)':28s} {ms:8.2f} ms", flush=True)

    def t_full(i, qq):
        l, h2 = qq
        tmin, tmax = make_tables(l, h2, levels)
        int_lo, int_hi = query_tables(tmin, tmax, rlo, rhi, n, dim)
        eps = dep_scalar(int_lo) + dep_scalar(int_hi)
        return l + eps, h2 + eps
    ms = chained_ms(t_full, (lo, hi), iters=4, reps=3, marginal=True)
    print(f"{'tables + query gathers':28s} {ms:8.2f} ms", flush=True)

    def t_bf16(i, qq):
        l, h2 = qq
        tmin, tmax = make_tables(l, h2, levels, dtype=jnp.bfloat16)
        int_lo, int_hi = query_tables(tmin, tmax, rlo, rhi, n, dim)
        eps = (dep_scalar(int_lo.astype(jnp.float32))
               + dep_scalar(int_hi.astype(jnp.float32)))
        return l + eps, h2 + eps
    ms = chained_ms(t_bf16, (lo, hi), iters=4, reps=3, marginal=True)
    print(f"{'bf16 tables + gathers':28s} {ms:8.2f} ms", flush=True)

    def t_blocked(i, qq):
        l, h2 = qq
        int_lo, int_hi = blocked_boxes(l, h2, rlo, rhi)
        eps = dep_scalar(int_lo) + dep_scalar(int_hi)
        return l + eps, h2 + eps
    ms = chained_ms(t_blocked, (lo, hi), iters=4, reps=3, marginal=True)
    print(f"{'blocked hybrid (B=128)':28s} {ms:8.2f} ms", flush=True)

    # correctness spot-check of the hybrid vs the flat table
    tmin, tmax = jax.jit(lambda l, h2: make_tables(l, h2, levels))(lo, hi)
    ref_lo, ref_hi = jax.jit(
        lambda: query_tables(tmin, tmax, rlo, rhi, n, dim))()
    got_lo, got_hi = jax.jit(
        lambda l, h2: blocked_boxes(l, h2, rlo, rhi))(lo, hi)
    ok = (bool(jnp.all(ref_lo == got_lo))
          and bool(jnp.all(ref_hi == got_hi)))
    print(f"hybrid == flat table: {ok}", flush=True)


if __name__ == "__main__":
    main()
