"""Distance/CCD + predicate oracle tests (vs scipy-free numpy brute force)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zpc_tpu.geometry import distance as D
from zpc_tpu.geometry import predicates as P


def _j(*arrs):
    return [jnp.asarray(a, jnp.float32) for a in arrs]


class TestPointTriangle:
    def test_vs_dense_sampling(self, rng):
        # oracle: dense barycentric sampling of the triangle
        a, b, c = rng.standard_normal((3, 3)).astype(np.float32)
        u = np.linspace(0, 1, 60)
        uu, vv = np.meshgrid(u, u)
        keep = uu + vv <= 1
        uu, vv = uu[keep], vv[keep]
        samples = (1 - uu - vv)[:, None] * a + uu[:, None] * b + \
            vv[:, None] * c
        pts = rng.standard_normal((32, 3)).astype(np.float32)
        d2 = np.asarray(D.point_triangle_dist2(
            *_j(pts, np.tile(a, (32, 1)), np.tile(b, (32, 1)),
                np.tile(c, (32, 1)))))
        for i, p in enumerate(pts):
            ref = ((samples - p) ** 2).sum(1).min()
            assert d2[i] <= ref + 1e-5
            assert d2[i] >= ref - 1e-2  # sampling resolution slack

    def test_interior_projection(self):
        a = np.array([0, 0, 0], np.float32)
        b = np.array([1, 0, 0], np.float32)
        c = np.array([0, 1, 0], np.float32)
        p = np.array([0.2, 0.2, 0.5], np.float32)
        d2 = float(D.point_triangle_dist2(*_j(p, a, b, c)))
        assert abs(d2 - 0.25) < 1e-6
        bary, cl = D.point_triangle_closest(*_j(p, a, b, c))
        np.testing.assert_allclose(np.asarray(cl), [0.2, 0.2, 0.0],
                                   atol=1e-6)

    def test_vertex_and_edge_regions(self):
        a, b, c = (np.array(v, np.float32) for v in
                   ([0, 0, 0], [1, 0, 0], [0, 1, 0]))
        assert abs(float(D.point_triangle_dist2(
            *_j(np.array([-1, -1, 0], np.float32), a, b, c))) - 2.0) < 1e-6
        assert abs(float(D.point_triangle_dist2(
            *_j(np.array([0.5, -1, 0], np.float32), a, b, c))) - 1.0) < 1e-6


class TestEdgeEdge:
    def test_crossing_segments(self):
        p0, p1 = np.array([[-1, 0, 1], [1, 0, 1]], np.float32)
        q0, q1 = np.array([[0, -1, 0], [0, 1, 0]], np.float32)
        d2 = float(D.edge_edge_dist2(*_j(p0, p1, q0, q1)))
        assert abs(d2 - 1.0) < 1e-6

    def test_parallel_segments(self):
        p0, p1 = np.array([[0, 0, 0], [1, 0, 0]], np.float32)
        q0, q1 = np.array([[0, 1, 0], [1, 1, 0]], np.float32)
        assert abs(float(D.edge_edge_dist2(*_j(p0, p1, q0, q1))) - 1.0) < 1e-6

    def test_vs_sampling(self, rng):
        for _ in range(10):
            seg = rng.standard_normal((4, 3)).astype(np.float32)
            t = np.linspace(0, 1, 200)
            pa = seg[0] + t[:, None] * (seg[1] - seg[0])
            pb = seg[2] + t[:, None] * (seg[3] - seg[2])
            ref = ((pa[:, None] - pb[None]) ** 2).sum(-1).min()
            got = float(D.edge_edge_dist2(*_j(*seg)))
            assert got <= ref + 1e-5


class TestRay:
    def test_hit_miss(self):
        a, b, c = (np.array(v, np.float32) for v in
                   ([0, 0, 1], [1, 0, 1], [0, 1, 1]))
        o = np.array([0.2, 0.2, 0], np.float32)
        d = np.array([0, 0, 1], np.float32)
        hit, t, u, v = D.ray_triangle(*_j(o, d, a, b, c))
        assert bool(hit) and abs(float(t) - 1.0) < 1e-6
        o2 = np.array([2.0, 2.0, 0], np.float32)
        hit2, t2, _, _ = D.ray_triangle(*_j(o2, d, a, b, c))
        assert not bool(hit2) and np.isinf(float(t2))


class TestCCD:
    def test_point_triangle_toi(self):
        a, b, c = (np.array(v, np.float32) for v in
                   ([0, 0, 0], [1, 0, 0], [0, 1, 0]))
        p = np.array([0.2, 0.2, 1.0], np.float32)
        dp = np.array([0, 0, -2.0], np.float32)  # crosses plane at t=0.5
        zeros = np.zeros(3, np.float32)
        toi = float(D.point_triangle_ccd(
            *_j(p, a, b, c, dp, zeros, zeros, zeros)))
        assert 0.4 < toi <= 0.5

    def test_no_collision_full_step(self):
        a, b, c = (np.array(v, np.float32) for v in
                   ([0, 0, 0], [1, 0, 0], [0, 1, 0]))
        p = np.array([0.2, 0.2, 1.0], np.float32)
        dp = np.array([0, 0, 0.5], np.float32)  # moving away
        zeros = np.zeros(3, np.float32)
        toi = float(D.point_triangle_ccd(
            *_j(p, a, b, c, dp, zeros, zeros, zeros)))
        assert toi == 1.0

    def test_edge_edge_toi(self):
        p0, p1 = np.array([[-1, 0, 1], [1, 0, 1]], np.float32)
        q0, q1 = np.array([[0, -1, 0], [0, 1, 0]], np.float32)
        v = np.array([0, 0, -2.0], np.float32)
        z = np.zeros(3, np.float32)
        toi = float(D.edge_edge_ccd(*_j(p0, p1, q0, q1, v, v, z, z)))
        assert 0.4 < toi <= 0.5


class TestPredicates:
    def test_orient2d_basic(self):
        a = jnp.asarray([0.0, 0.0])
        b = jnp.asarray([1.0, 0.0])
        c = jnp.asarray([0.0, 1.0])
        assert float(P.orient2d(a, b, c)) > 0
        assert float(P.orient2d(a, c, b)) < 0
        assert float(P.orient2d(a, b, jnp.asarray([0.5, 0.0]))) == 0.0

    def test_orient2d_near_degenerate(self):
        # points nearly collinear: plain fp32 det is ambiguous; compensated
        # arithmetic resolves the sign consistently with fp64
        base = np.array([12.1, 12.1])
        for eps in (1e-6, -1e-6, 3e-7, -3e-7):
            a = base.astype(np.float32)
            b = (base + 1.0).astype(np.float32)
            c = np.array([base[0] + 2.0, base[1] + 2.0 + eps], np.float32)
            got = float(P.orient2d(jnp.asarray(a), jnp.asarray(b),
                                   jnp.asarray(c)))
            ref = float(np.float64(a[0] - c[0]) * (b[1] - c[1]) -
                        np.float64(a[1] - c[1]) * (b[0] - c[0]))
            assert np.sign(got) == np.sign(ref), (eps, got, ref)

    def test_orient3d(self):
        a = jnp.asarray([0.0, 0, 0])
        b = jnp.asarray([1.0, 0, 0])
        c = jnp.asarray([0.0, 1, 0])
        d_below = jnp.asarray([0.0, 0, -1.0])
        d_above = jnp.asarray([0.0, 0, 1.0])
        s1 = float(P.orient3d(a, b, c, d_below))
        s2 = float(P.orient3d(a, b, c, d_above))
        assert s1 * s2 < 0

    def test_incircle(self):
        a = jnp.asarray([0.0, 0.0])
        b = jnp.asarray([1.0, 0.0])
        c = jnp.asarray([0.0, 1.0])
        inside = jnp.asarray([0.4, 0.4])
        outside = jnp.asarray([2.0, 2.0])
        si = float(P.incircle(a, b, c, inside))
        so = float(P.incircle(a, b, c, outside))
        assert si * so < 0
