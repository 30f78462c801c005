"""Ground-truth bandwidth/layout probes for the v2 step's array shapes.

Questions (v5e, 256k particles => B=2560, K=128):
1. What elementwise GB/s does this harness actually achieve on a large
   well-shaped array?  (calibrates every other number)
2. Does a [B,K,8] minor-dim-8 elementwise output pay the 128-lane
   padding tax when materialized?
3. What does the S0 = wy (x) wz outer product cost in [B,K,64] vs
   [B,64,K] layouts?
4. What does the ctx stencil chain cost when every output is minor-K?
"""

import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms, dep_scalar

B, K, S = 2560, 128, 8


def gbs(nbytes, ms):
    return nbytes / (ms / 1e3) / 1e9


def main():
    rng = np.random.default_rng(0)
    big = jnp.asarray(rng.standard_normal((B * K, 128)).astype(np.float32))
    w8 = jnp.asarray(rng.standard_normal((B, K, S)).astype(np.float32))
    w8b = jnp.asarray(rng.standard_normal((B, K, S)).astype(np.float32))
    w8t = jnp.asarray(np.moveaxis(np.asarray(w8), 2, 1))   # [B,S,K]
    w8bt = jnp.asarray(np.moveaxis(np.asarray(w8b), 2, 1))
    xb = jnp.asarray(rng.uniform(0, 1, (B, K, 3)).astype(np.float32))
    borigin = jnp.asarray(rng.integers(0, 100, (B, 3)).astype(np.int32))

    # 1. calibration: elementwise on [327680, 128] f32 (168 MB)
    def ew(i, c):
        x, = c
        return (x * 1.0001 + 1e-9,)
    ms = chained_ms(ew, (big,), iters=20, label="elementwise 168MB")
    print(f"    -> {gbs(2 * big.size * 4, ms):.0f} GB/s", flush=True)

    # 2. elementwise on [B,K,8] (10.5 MB logical)
    def ew8(i, c):
        x, = c
        return (x * 1.0001 + 1e-9,)
    ms = chained_ms(ew8, (w8,), iters=20, label="elementwise [B,K,8]")
    print(f"    -> logical {gbs(2 * w8.size * 4, ms):.0f} GB/s"
          f" (x16 if padded: {gbs(32 * w8.size * 4, ms):.0f})", flush=True)

    # 2b. same logical work, minor-K layout [B,8,K]
    ms = chained_ms(ew8, (w8t,), iters=20, label="elementwise [B,8,K]")
    print(f"    -> logical {gbs(2 * w8.size * 4, ms):.0f} GB/s", flush=True)

    # 3. S0 outer product, [B,K,64] output
    def outer_kminor(i, c):
        a, b = c
        s0 = (a[:, :, :, None] * b[:, :, None, :]).reshape(B, K, 64)
        eps = dep_scalar(s0)
        return a + eps, b + eps
    ms = chained_ms(outer_kminor, (w8, w8b), iters=20,
                    label="S0 outer [B,K,64]")
    print(f"    -> write {gbs(B * K * 64 * 4, ms):.0f} GB/s logical",
          flush=True)

    # 3b. S0 outer product, [B,64,K] output (minor = K = 128 lanes)
    def outer_kmajor(i, c):
        a, b = c                      # [B,S,K]
        s0 = (a[:, :, None, :] * b[:, None, :, :]).reshape(B, 64, K)
        eps = dep_scalar(s0)
        return a + eps, b + eps
    ms = chained_ms(outer_kmajor, (w8t, w8bt), iters=20,
                    label="S0 outer [B,64,K]")
    print(f"    -> write {gbs(B * K * 64 * 4, ms):.0f} GB/s logical",
          flush=True)

    # 4. the direct-eval stencil chain as in _make_ctx3 (K-minor)
    def stencils_kminor(i, c):
        x, = c
        sidx = jnp.arange(S, dtype=jnp.float32)
        ws = []
        for d in range(3):
            t = x[..., d:d + 1] - (borigin[:, None, d:d + 1].astype(
                jnp.float32) + sidx)
            at = jnp.abs(t)
            c1 = jnp.maximum(1.5 - at, 0.0)
            c2 = jnp.maximum(0.5 - at, 0.0)
            ws.append(0.5 * c1 * c1 - 1.5 * c2 * c2)
        s0 = (ws[1][:, :, :, None] * ws[2][:, :, None, :]).reshape(B, K, 64)
        eps = dep_scalar(s0) + dep_scalar(ws[0] * sidx)
        return (x + eps,)
    ms = chained_ms(stencils_kminor, (xb,), iters=20,
                    label="stencil chain [B,K,*]")
    print(f"    -> {ms:.2f} ms", flush=True)

    # 4b. same chain, minor-K everywhere ([B,S,K] axis stencils)
    xbt = jnp.asarray(np.moveaxis(np.asarray(xb), 2, 1))   # [B,3,K]

    def stencils_kmajor(i, c):
        x, = c                        # [B,3,K]
        sidx = jnp.arange(S, dtype=jnp.float32)[None, :, None]
        ws = []
        for d in range(3):
            t = x[:, d:d + 1, :] - (borigin[:, d:d + 1, None].astype(
                jnp.float32) + sidx)
            at = jnp.abs(t)
            c1 = jnp.maximum(1.5 - at, 0.0)
            c2 = jnp.maximum(0.5 - at, 0.0)
            ws.append(0.5 * c1 * c1 - 1.5 * c2 * c2)     # [B,S,K]
        s0 = (ws[1][:, :, None, :] * ws[2][:, None, :, :]).reshape(
            B, 64, K)
        eps = dep_scalar(s0) + dep_scalar(ws[0] * sidx)
        return (x + eps,)
    ms = chained_ms(stencils_kmajor, (xbt,), iters=20,
                    label="stencil chain [B,*,K]")
    print(f"    -> {ms:.2f} ms", flush=True)

    # 5. the P2G einsum alone with prebuilt operands (isolates MXU cost)
    s0k = jnp.asarray(rng.standard_normal((B, K, 64)).astype(np.float32))
    rck = jnp.asarray(rng.standard_normal((B, K, 96)).astype(np.float32))

    def p2g_dot(i, c):
        a, r = c
        out = jnp.einsum("bkm,bkA->bmA", a, r,
                         precision=jax.lax.Precision.HIGH,
                         preferred_element_type=jnp.float32)
        eps = dep_scalar(out)
        return a + eps, r + eps
    ms = chained_ms(p2g_dot, (s0k, rck), iters=10,
                    label="p2g einsum [B,64,96] HIGH")
    print(f"    -> {ms:.2f} ms", flush=True)

    def p2g_dot_bf16(i, c):
        a, r = c
        out = jnp.einsum("bkm,bkA->bmA", a.astype(jnp.bfloat16),
                         r.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        eps = dep_scalar(out)
        return a + eps, r + eps
    ms = chained_ms(p2g_dot_bf16, (s0k, rck), iters=10,
                    label="p2g einsum bf16-in f32-acc")
    print(f"    -> {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
