"""Oracle tests for tight-inclusion CCD (geometry/ccd_tight.py) against
analytic impact times and brute-force dense time sampling.

Reference behavior: Rational.hpp vertexFaceCCD/edgeEdgeCCD — conservative
(never miss), toi within tol of the true impact when converged."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zpc_tpu.geometry.ccd_tight import (vertex_face_ccd, edge_edge_ccd_tight)
from zpc_tpu.geometry.distance import point_triangle_dist2, edge_edge_dist2

RNG = np.random.default_rng(3)
TRI = [jnp.array([[0.0, 0.0, 0.0]]), jnp.array([[1.0, 0.0, 0.0]]),
       jnp.array([[0.0, 1.0, 0.0]])]
Z = jnp.zeros((1, 3))


def test_vertex_face_direct_hit():
    p = jnp.array([[0.25, 0.25, 1.0]])
    dp = jnp.array([[0.0, 0.0, -2.0]])
    r = vertex_face_ccd(p, *TRI, dp, Z, Z, Z, tol=1e-5)
    assert bool(r.hit[0]) and not bool(r.overflowed[0])
    toi = float(r.toi[0])
    assert toi <= 0.5 + 1e-6            # conservative: never late
    assert toi >= 0.5 - 5e-4            # and tight (err band + tol)


def test_vertex_face_miss_outside_simplex():
    p = jnp.array([[2.0, 2.0, 1.0]])
    dp = jnp.array([[0.0, 0.0, -2.0]])
    r = vertex_face_ccd(p, *TRI, dp, Z, Z, Z)
    assert not bool(r.hit[0])
    assert np.isinf(float(r.toi[0]))


def test_vertex_face_min_separation():
    p = jnp.array([[0.25, 0.25, 1.0]])
    dp = jnp.array([[0.0, 0.0, -2.0]])
    r = vertex_face_ccd(p, *TRI, dp, Z, Z, Z, min_sep=0.2, tol=1e-5)
    toi = float(r.toi[0])
    assert bool(r.hit[0])
    assert toi <= 0.4 + 1e-6 and toi >= 0.4 - 5e-4


def test_vertex_face_t0_contact():
    p = jnp.array([[0.25, 0.25, 0.0]])      # on the face at t = 0
    dp = jnp.array([[0.0, 0.0, 1.0]])
    r = vertex_face_ccd(p, *TRI, dp, Z, Z, Z)
    assert bool(r.hit[0]) and float(r.toi[0]) == 0.0


def test_vertex_face_moving_triangle():
    # static vertex, triangle rises to meet it at t = 0.25
    p = jnp.array([[0.25, 0.25, 1.0]])
    dtz = jnp.array([[0.0, 0.0, 4.0]])
    r = vertex_face_ccd(p, *TRI, Z, dtz, dtz, dtz, tol=1e-5)
    toi = float(r.toi[0])
    assert bool(r.hit[0]) and toi <= 0.25 + 1e-6 and toi >= 0.25 - 5e-4


def test_edge_edge_crossing():
    a0 = jnp.array([[-1.0, 0.0, 1.0]])
    a1 = jnp.array([[1.0, 0.0, 1.0]])
    b0 = jnp.array([[0.0, -1.0, 0.0]])
    b1 = jnp.array([[0.0, 1.0, 0.0]])
    dz = jnp.array([[0.0, 0.0, -2.0]])
    r = edge_edge_ccd_tight(a0, a1, b0, b1, dz, dz, Z, Z, tol=1e-5)
    toi = float(r.toi[0])
    assert bool(r.hit[0]) and toi <= 0.5 + 1e-6 and toi >= 0.5 - 5e-4


def test_edge_edge_parallel_miss():
    a0 = jnp.array([[-1.0, 0.0, 1.0]])
    a1 = jnp.array([[1.0, 0.0, 1.0]])
    b0 = jnp.array([[-1.0, 0.0, 0.0]])
    b1 = jnp.array([[1.0, 0.0, 0.0]])
    dx = jnp.array([[0.5, 0.0, 0.0]])        # slide along, stay 1 apart
    r = edge_edge_ccd_tight(a0, a1, b0, b1, dx, dx, Z, Z)
    assert not bool(r.hit[0])


def _brute_first_hit_vf(p, t0, t1, t2, dp, d0, d1, d2, thresh, nt=2000):
    """Dense-time scan: first t where the vertex-triangle distance dips
    below thresh (numpy/jax fp32 oracle)."""
    ts = jnp.linspace(0.0, 1.0, nt)

    def at(t):
        return jnp.sqrt(point_triangle_dist2(
            p + t * dp, t0 + t * d0, t1 + t * d1, t2 + t * d2))

    ds = jax.vmap(at)(ts)
    hit = ds <= thresh
    idx = jnp.argmax(hit)
    return (float(ts[idx]) if bool(jnp.any(hit)) else None,
            float(jnp.min(ds)))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_vertex_face_random_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 32
    pts = rng.uniform(-1, 1, (4, n, 3)).astype(np.float32)
    disp = rng.uniform(-1, 1, (4, n, 3)).astype(np.float32)
    args = [jnp.asarray(a) for a in (*pts, *disp)]
    r = vertex_face_ccd(*args, tol=1e-5)
    for q in range(n):
        sub = [a[q:q + 1] for a in args]
        t_true, dmin = _brute_first_hit_vf(*sub, thresh=1e-4)
        if t_true is not None:
            # conservative: detect, and no later than the sampled hit
            assert bool(r.hit[q]), f"q={q} missed a real hit at {t_true}"
            assert float(r.toi[q]) <= t_true + 1e-3
        elif dmin > 2e-2:
            # clear miss (outside the fp32 error band): no false hit
            assert not bool(r.hit[q]), f"q={q} false hit dmin={dmin}"


def test_edge_edge_random_oracle():
    rng = np.random.default_rng(11)
    n = 32
    pts = rng.uniform(-1, 1, (4, n, 3)).astype(np.float32)
    disp = rng.uniform(-1, 1, (4, n, 3)).astype(np.float32)
    args = [jnp.asarray(a) for a in (*pts, *disp)]
    r = edge_edge_ccd_tight(*args, tol=1e-5)
    ts = jnp.linspace(0.0, 1.0, 2000)
    for q in range(8):
        a0, a1, b0, b1, da0, da1, db0, db1 = [a[q] for a in args]

        def at(t):
            return jnp.sqrt(edge_edge_dist2(
                a0 + t * da0, a1 + t * da1, b0 + t * db0, b1 + t * db1))

        ds = jax.vmap(at)(ts)
        hit = bool(jnp.any(ds <= 1e-4))
        if hit:
            t_true = float(ts[jnp.argmax(ds <= 1e-4)])
            assert bool(r.hit[q])
            assert float(r.toi[q]) <= t_true + 1e-3
        elif float(jnp.min(ds)) > 2e-2:
            assert not bool(r.hit[q])


def test_jit_and_batch():
    n = 64
    rng = np.random.default_rng(5)
    args = [jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
            for _ in range(8)]
    f = jax.jit(lambda *a: vertex_face_ccd(*a, tol=1e-4))
    r = f(*args)
    assert r.toi.shape == (n,) and r.hit.shape == (n,)
