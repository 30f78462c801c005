"""Is [B, K, side] one-hot construction paying the 128-lane padding tax?

Compares building + consuming the 6 axis stencils in minor-dim=side
([B,K,8], padded 16x) vs minor-dim=K ([B,8,K], clean) layouts, with a
matching contraction so both forms do the same work.  Decides the
transposed-stencil refactor of _step3d."""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from benchmarks.measure import chained_ms, dep_scalar

B, K, S = 2560, 128, 8
_PREC = jax.lax.Precision.HIGH


def main():
    rng = np.random.default_rng(0)
    off = jnp.asarray(rng.integers(1, 5, (B, K, 3)).astype(np.int32))
    wt = jnp.asarray(rng.standard_normal((B, K, 3, 3)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, K, 4)).astype(np.float32))

    sidx = jnp.arange(S, dtype=jnp.int32)

    def minor_side(i, c):
        offc, wtc, qc = c
        ws = []
        for d in range(3):
            w = jnp.zeros((B, K, S), jnp.float32)
            for j in range(3):
                hit = sidx[None, None, :] == (offc[..., d] + j)[..., None]
                w = w + jnp.where(hit, wtc[..., d, j:j + 1], 0.0)
            ws.append(w)
        S0 = (ws[1][:, :, :, None] * ws[2][:, :, None, :]).reshape(
            B, K, S * S)
        R = (ws[0][..., :, None] * qc[..., None, :]).reshape(B, K, 4 * S)
        out = jnp.einsum("bkm,bkA->bmA", S0, R, precision=_PREC,
                         preferred_element_type=jnp.float32)
        eps = dep_scalar(out)
        return offc, wtc + eps, qc + eps

    def minor_k(i, c):
        offc, wtc, qc = c
        ws = []
        for d in range(3):
            w = jnp.zeros((B, S, K), jnp.float32)
            for j in range(3):
                hit = sidx[None, :, None] == (offc[..., d] + j)[:, None, :]
                w = w + jnp.where(hit, wtc[:, None, :, d, j], 0.0)
            ws.append(w)
        S0 = (ws[1][:, :, None, :] * ws[2][:, None, :, :]).reshape(
            B, S * S, K)
        qt = jnp.moveaxis(qc, -1, 1)                       # [B,4,K]
        R = (ws[0][:, :, None, :] * qt[:, None, :, :]).reshape(B, 4 * S, K)
        out = jnp.einsum("bmk,bAk->bmA", S0, R, precision=_PREC,
                         preferred_element_type=jnp.float32)
        eps = dep_scalar(out)
        return offc, wtc + eps, qc + eps

    chained_ms(minor_side, (off, wt, q), iters=10,
               label="one-hots minor=side [B,K,8]")
    chained_ms(minor_k, (off, wt, q), iters=10,
               label="one-hots minor=K    [B,8,K]")


if __name__ == "__main__":
    main()
