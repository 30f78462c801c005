"""Small-tensor helpers (reference ``math/Vec.h`` / ``VecInterface.hpp``).

The reference builds a full fixed-size tensor template library; in JAX,
``jnp`` arrays with batched last-dims *are* that library, so this module only
adds what jnp lacks:

* :func:`mm` / :func:`mv` — small-matrix products pinned to
  ``Precision.HIGHEST``.  On TPU the default matmul precision is bf16; for
  3x3 constitutive/decomposition math that is a correctness bug (observed:
  Jacobi SVD stalling at ~1e-3), so every small-matrix product in the
  framework routes through here.  Large MXU matmuls (P2G one-hot products
  etc.) intentionally keep the default.
* common small-matrix ops the sim layer uses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["mm", "mv", "outer", "trace", "frobenius", "identity_like",
           "cross_matrix"]


def mm(a, b):
    """Batched small-matrix @ matrix at full fp32 precision."""
    return jnp.matmul(a, b, precision=lax.Precision.HIGHEST)


def mv(a, v):
    """Batched small-matrix @ vector at full fp32 precision."""
    return jnp.einsum("...ij,...j->...i", a, v,
                      precision=lax.Precision.HIGHEST)


def outer(u, v):
    return u[..., :, None] * v[..., None, :]


def trace(A):
    return jnp.trace(A, axis1=-2, axis2=-1)


def frobenius(A):
    return jnp.sqrt(jnp.sum(A * A, (-2, -1)))


def identity_like(A):
    return jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)


def cross_matrix(w):
    """Skew matrix [w]_x with [w]_x v = w x v."""
    zero = jnp.zeros_like(w[..., 0])
    return jnp.stack([
        jnp.stack([zero, -w[..., 2], w[..., 1]], -1),
        jnp.stack([w[..., 2], zero, -w[..., 0]], -1),
        jnp.stack([-w[..., 1], w[..., 0], zero], -1),
    ], -2)
