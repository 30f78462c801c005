"""Probe: FixedCorotated stress via scalar-Jacobi SVD vs Newton polar.

FixedCorotated needs only R = polar(F), J = det(F) and cof(F) — none of
the singular values (P = 2mu(F-R) + lam(J-1)cof(F)).  The scalar-form
Jacobi SVD (math/svd.py) runs ~4 full sweeps of 3 rotations; a scaled
Newton iteration X <- (X + X^-T)/2 converges quadratically to the polar
factor in 3-5 steps for MPM-regime F (near identity), at ~40 VPU ops per
step.  If the stress stage is a measurable slice of the 2.9 ms step,
this swap buys it back.

Caveat measured here too: under inversion (det F < 0) Newton converges
to the orthogonal (det=-1) factor while SVD-corotated flips the smallest
singular value — the fast path is only valid for det F > 0 lanes.
"""

import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms, dep_scalar
from zpc_tpu.math.vecmat import mm
from zpc_tpu.models.constitutive import FixedCorotated


def _cof(F):
    # columns of the cofactor matrix = cross products of F's columns
    c0 = jnp.cross(F[..., :, 1], F[..., :, 2], axis=-1)
    c1 = jnp.cross(F[..., :, 2], F[..., :, 0], axis=-1)
    c2 = jnp.cross(F[..., :, 0], F[..., :, 1], axis=-1)
    return jnp.stack([c0, c1, c2], axis=-1)


def polar_newton(F, iters=4):
    """Scaled Newton polar factor of [..., 3, 3] (det > 0 assumed)."""
    X = F
    for _ in range(iters):
        cof = _cof(X)
        det = jnp.sum(X[..., :, 0] * cof[..., :, 0], -1)
        inv_t = cof / det[..., None, None]                  # X^-T
        # Higham determinant scaling accelerates early iterations
        g = jnp.abs(det) ** (-1.0 / 3.0)
        X = 0.5 * (g[..., None, None] * X + inv_t / g[..., None, None])
    return X


def kirchhoff_polar(model, F, iters=4):
    R = polar_newton(F, iters)
    cof = _cof(F)
    J = jnp.sum(F[..., :, 0] * cof[..., :, 0], -1)
    P = 2.0 * model.mu * (F - R) + \
        (model.lam * (J - 1.0))[..., None, None] * cof
    return mm(P, jnp.swapaxes(F, -1, -2))


def main():
    model = FixedCorotated.from_young_poisson(1e4, 0.3)
    rng = np.random.default_rng(0)
    B, K = 2560, 128
    F = (np.eye(3) + 0.15 * rng.standard_normal((B, K, 3, 3))
         ).astype(np.float32)
    # keep det > 0 (MPM regime)
    det = np.linalg.det(F)
    F[det <= 0.05] = np.eye(3, dtype=np.float32)
    Fj = jnp.asarray(F)

    ref = jax.jit(model.kirchhoff)(Fj)
    for it in (3, 4, 5):
        got = jax.jit(lambda f: kirchhoff_polar(model, f, it))(Fj)
        d = float(jnp.max(jnp.abs(got - ref)))
        rel = d / float(jnp.max(jnp.abs(ref)))
        print(f"newton iters={it}: max|dtau|={d:.3e} rel={rel:.3e}",
              flush=True)

    def bsvd(i, c):
        f, = c
        t = model.kirchhoff(f)
        return (f + 1e-30 * jnp.abs(t),)
    ms = chained_ms(bsvd, (Fj,), iters=20, marginal=True,
                    label="kirchhoff SVD 327k")
    print(f"  svd: {ms:.3f} ms", flush=True)

    def bpol(i, c):
        f, = c
        t = kirchhoff_polar(model, f, 4)
        return (f + 1e-30 * jnp.abs(t),)
    ms = chained_ms(bpol, (Fj,), iters=20, marginal=True,
                    label="kirchhoff polar-newton4 327k")
    print(f"  polar: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
