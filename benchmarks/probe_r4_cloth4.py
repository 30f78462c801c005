"""Round 4: attribute apply_operator's 3.8 ms (8k verts) — scatters vs
gathers vs arithmetic.  Variants (timing-only; b/c/d compute WRONG
results by replacing scatter-adds with shape-preserving sums):
  a  apply as shipped
  b  contact term's scatter (.at[tidx].add) removed
  c  ALL scatter-adds removed (stretch/bend/contact)
  d  gathers only (p[edges], p[hinges], p[tidx]) + elementwise
"""

import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms, dep_scalar
from benchmarks.probe_r4_cloth import build_two_layer
from zpc_tpu.sim.cloth import (assemble_operator,
                               self_contact_candidates)


def make_apply(sim, op, dt, variant):
    n_hat = sim.ground_n
    e0, e1 = sim.edges[:, 0], sim.edges[:, 1]

    def apply(p):
        q = (sim.mass / (dt * dt))[:, None] * p
        u = p[e0] - p[e1]
        du = jnp.sum(op["ed"] * u, axis=-1)
        f = (op["coef_b"][:, None] * u
             + ((op["coef_a"] - op["coef_b"]) * du)[:, None] * op["ed"])
        if variant in ("a", "b"):
            q = q.at[e0].add(f).at[e1].add(-f)
        else:
            q = q + jnp.sum(f, 0, keepdims=True) * 1e-30
        ph = p[sim.hinges]
        w = jnp.sum(op["gth"] * ph, axis=(-1, -2))
        hv = ((op["coef_h"] * w)[:, None, None] * op["gth"]
              ).reshape(-1, 3)
        if variant in ("a", "b"):
            q = q.at[sim.hinges.reshape(-1)].add(hv)
        else:
            q = q + jnp.sum(hv, 0, keepdims=True) * 1e-30
        pn = p @ n_hat
        q = q + (op["curv"] * pn)[:, None] * n_hat[None, :]
        q = q + op["fr_c"][:, None] * (p - pn[:, None] * n_hat[None, :])
        tidx, bary, diff, bpp = op["contact"]
        pt = p[tidx]
        rel = p[:, None, :] - jnp.sum(bary[..., None] * pt, axis=2)
        dots = 2.0 * jnp.sum(diff * rel, axis=-1)
        coef = bpp * dots
        q = q + jnp.sum(2.0 * coef[..., None] * diff, axis=1)
        ct = (-2.0 * coef[..., None, None] * bary[..., None]
              * diff[:, :, None, :]).reshape(-1, 3)
        if variant == "a":
            q = q.at[tidx.reshape(-1)].add(ct)
        else:
            q = q + jnp.sum(ct, 0, keepdims=True) * 1e-30
        return q

    def gathers_only(p):
        u = p[e0] - p[e1]
        ph = p[sim.hinges]
        pt = p[op["contact"][0]]
        return (p + jnp.sum(u, 0, keepdims=True) * 1e-30
                + jnp.sum(ph, (0, 1), keepdims=False)[None] * 1e-30
                + jnp.sum(pt, (0, 1, 2))[None] * 1e-30)

    return gathers_only if variant == "d" else apply


def main():
    sim, x0 = build_two_layer()
    dt = jnp.float32(0.005)
    cand, _ = jax.jit(lambda xx: self_contact_candidates(sim, xx, 8))(x0)
    lam = jnp.zeros(x0.shape[:1], x0.dtype)
    op = jax.block_until_ready(jax.jit(
        lambda y: assemble_operator(sim, y, y, dt, cand=cand,
                                    lam=lam))(x0))
    for variant in ("a", "b", "c", "d"):
        ap = make_apply(sim, op, dt, variant)

        def body(i, c):
            y, = c
            return (y + 1e-20 * ap(y * (1.0 + 1e-9)),)
        chained_ms(body, (x0,), iters=16, marginal=True,
                   label=f"apply variant {variant}")


if __name__ == "__main__" and "--ct" not in sys.argv:
    main()


def contact_transpose():
    """Variant e: tables for stretch/bend (now in the library) PLUS the
    contact scatter replaced by a per-step sorted transpose table —
    per-iter cost becomes ONE 1-D coef gather + fma (the open question
    is the 1-D gather rate at [N*cap] grouped-by-vertex indices)."""
    from zpc_tpu.sim.cloth import apply_operator
    sim, x0 = build_two_layer()
    dt = jnp.float32(0.005)
    cand, _ = jax.jit(lambda xx: self_contact_candidates(sim, xx, 8))(x0)
    lam = jnp.zeros(x0.shape[:1], x0.dtype)
    op = jax.block_until_ready(jax.jit(
        lambda y: assemble_operator(sim, y, y, dt, cand=cand,
                                    lam=lam))(x0))

    def lib(i, c):
        y, = c
        return (y + 1e-20 * apply_operator(sim, op, y * (1 + 1e-9), dt),)
    chained_ms(lib, (x0,), iters=16, marginal=True,
               label="apply lib (tables + contact scatter)")

    # build the contact transpose table once (per-Newton cost)
    N = x0.shape[0]
    C = cand.shape[1]
    tidx, bary, diff, bpp = op["contact"]
    NC = N * C
    cap = 32
    tflat = tidx.reshape(NC, 3)
    live = (cand >= 0).reshape(NC)
    tgt = jnp.where(live[:, None], tflat, N).reshape(-1)       # [3NC]
    val = jnp.arange(3 * NC, dtype=jnp.int32)
    skey, sval = jax.lax.sort((tgt, val), num_keys=1)
    segl = jnp.searchsorted(skey, jnp.arange(N, dtype=jnp.int32),
                            side="left").astype(jnp.int32)
    segr = jnp.searchsorted(skey, jnp.arange(N, dtype=jnp.int32),
                            side="right").astype(jnp.int32)
    pos = segl[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
    okp = pos < segr[:, None]
    table = jnp.where(okp, sval[jnp.clip(pos, 0, 3 * NC - 1)], -1)
    ge = (-2.0 * bary[..., None] * diff[:, :, None, :]).reshape(
        3 * NC, 3)                                  # entry n*3+k -> vec
    ct_g = jnp.where((table >= 0)[..., None],
                     ge[jnp.maximum(table, 0)], 0.0)  # [N, cap, 3]
    ct_n = jnp.maximum(table, 0) // 3                 # [N, cap]
    ct_g, ct_n = jax.block_until_ready((ct_g, ct_n))
    e0, e1 = sim.edges[:, 0], sim.edges[:, 1]
    n_hat = sim.ground_n

    def apply_e(p):
        q = (sim.mass / (dt * dt))[:, None] * p
        u = p[e0] - p[e1]
        du = jnp.sum(op["ed"] * u, axis=-1)
        f = (op["coef_b"][:, None] * u
             + ((op["coef_a"] - op["coef_b"]) * du)[:, None] * op["ed"])
        ft = jnp.concatenate([f, -f], axis=0)
        gi = sim.edge_inc
        q = q + jnp.sum(jnp.where((gi >= 0)[..., None],
                                  ft[jnp.maximum(gi, 0)], 0.0), axis=1)
        ph = p[sim.hinges]
        w = jnp.sum(op["gth"] * ph, axis=(-1, -2))
        hv = ((op["coef_h"] * w)[:, None, None] * op["gth"]
              ).reshape(-1, 3)
        gj = sim.hinge_inc
        q = q + jnp.sum(jnp.where((gj >= 0)[..., None],
                                  hv[jnp.maximum(gj, 0)], 0.0), axis=1)
        pn = p @ n_hat
        q = q + (op["curv"] * pn)[:, None] * n_hat[None, :]
        q = q + op["fr_c"][:, None] * (p - pn[:, None] * n_hat[None, :])
        pt = p[tidx]
        rel = p[:, None, :] - jnp.sum(bary[..., None] * pt, axis=2)
        dots = 2.0 * jnp.sum(diff * rel, axis=-1)
        coef = bpp * dots
        q = q + jnp.sum(2.0 * coef[..., None] * diff, axis=1)
        cf = coef.reshape(-1)                          # [NC]
        q = q + jnp.sum(cf[ct_n][..., None] * ct_g, axis=1)
        return q

    def ee(i, c):
        y, = c
        return (y + 1e-20 * apply_e(y * (1 + 1e-9)),)
    chained_ms(ee, (x0,), iters=16, marginal=True,
               label="apply e (tables + contact transpose)")


if __name__ == "__main__" and "--ct" in sys.argv:
    contact_transpose()
