"""Robust-geometry oracles: insphere, cell-cut structures, IPC contact
derivatives (reference Predicates.hpp:20-57, Geometry.hpp:69-310,
Distance.hpp:233+, Friction.hpp) — checked against fractions-exact or
fp64 host evaluation."""

from fractions import Fraction

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zpc_tpu.geometry.predicates import incircle, insphere, orient3d
from zpc_tpu.geometry import cells
from zpc_tpu.geometry import contact
from zpc_tpu.geometry.distance import (edge_edge_closest, edge_edge_dist2,
                                       point_triangle_dist2)


def _exact_insphere(a, b, c, d, e):
    """fractions-exact 4x4 determinant oracle."""
    rows = []
    for p in (a, b, c, d):
        r = [Fraction(float(p[j])) - Fraction(float(e[j])) for j in range(3)]
        r.append(sum(x * x for x in r))
        rows.append(r)

    def det3(m):
        return (m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
                - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
                + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]))

    det = Fraction(0)
    for i in range(4):
        minor = [[rows[k][j] for j in range(3)] for k in range(4) if k != i]
        s = 1 if (i + 3) % 2 == 0 else -1
        det += s * rows[i][3] * det3(minor)
    return det


class TestInsphere:
    def test_sign_matches_exact(self, rng):
        pts = rng.uniform(-1, 1, (64, 5, 3)).astype(np.float32)
        vals = np.asarray(insphere(*[jnp.asarray(pts[:, i])
                                     for i in range(5)]))
        for i in range(64):
            ex = _exact_insphere(*[pts[i, j] for j in range(5)])
            if ex != 0:
                assert np.sign(vals[i]) == np.sign(float(ex)), i

    def test_unit_sphere_membership(self):
        # tetra inscribed in the unit sphere, positively oriented
        a = np.array([1.0, 0.0, 0.0], np.float32)
        b = np.array([0.0, 1.0, 0.0], np.float32)
        c = np.array([0.0, 0.0, 1.0], np.float32)
        d = np.array([-1.0, 0.0, 0.0], np.float32)
        ori = float(orient3d(*map(jnp.asarray, (a, b, c, d))))
        inside = np.zeros(3, np.float32)          # center
        outside = np.array([2.0, 0.0, 0.0], np.float32)
        v_in = float(insphere(*map(jnp.asarray, (a, b, c, d, inside))))
        v_out = float(insphere(*map(jnp.asarray, (a, b, c, d, outside))))
        # sign convention: same orientation factor as orient3d
        assert np.sign(v_in) == np.sign(ori)
        assert np.sign(v_out) == -np.sign(ori)

    def test_cospherical_is_zero(self):
        # 5 points on the unit sphere at exactly representable coords
        a = np.array([1.0, 0.0, 0.0], np.float32)
        b = np.array([0.0, 1.0, 0.0], np.float32)
        c = np.array([0.0, 0.0, 1.0], np.float32)
        d = np.array([-1.0, 0.0, 0.0], np.float32)
        e = np.array([0.0, -1.0, 0.0], np.float32)
        v = float(insphere(*map(jnp.asarray, (a, b, c, d, e))))
        assert v == 0.0


class TestCells:
    def test_triangle_degeneracy(self, rng):
        # exactly-representable colinear points (the exact predicate must
        # see them as colinear; float-rounded "colinear" inputs are not)
        a = jnp.asarray(rng.integers(-8, 8, (16, 3)), jnp.float32) / 8.0
        d = jnp.asarray(rng.integers(1, 8, (16, 3)), jnp.float32) / 8.0
        b = a + d
        c = a + 2.0 * d                       # colinear, exact
        assert bool(jnp.all(cells.is_triangle_degenerated(a, b, c)))
        c2 = c + jnp.asarray([0.0, 4.0, 0.0])
        assert not bool(jnp.any(cells.is_triangle_degenerated(a, b, c2)))

    def test_point_on_ray_codes(self):
        s0 = jnp.asarray([0.0, 0.0, 0.0])
        e0 = jnp.asarray([1.0, 0.0, 0.0])
        d0 = jnp.asarray([1.0, 0.0, 0.0])
        assert int(cells.point_on_ray(s0, e0, d0, s0)) == 2
        assert int(cells.point_on_ray(s0, e0, d0,
                                      jnp.asarray([3.0, 0.0, 0.0]))) == 1
        assert int(cells.point_on_ray(s0, e0, d0,
                                      jnp.asarray([-1.0, 0.0, 0.0]))) == 0
        assert int(cells.point_on_ray(s0, e0, d0,
                                      jnp.asarray([1.0, 1.0, 0.0]))) == 0

    def test_point_on_segment(self):
        s0 = jnp.asarray([0.0, 0.0, 0.0])
        s1 = jnp.asarray([2.0, 2.0, 2.0])
        assert bool(cells.point_on_segment(jnp.asarray([1.0, 1.0, 1.0]),
                                           s0, s1))
        assert not bool(cells.point_on_segment(jnp.asarray([3.0, 3.0, 3.0]),
                                               s0, s1))
        assert not bool(cells.point_on_segment(jnp.asarray([1.0, 1.0, 0.0]),
                                               s0, s1))

    def test_ray_segment_intersection(self):
        s0 = jnp.asarray([0.0, 0.0, 0.0])
        e0 = jnp.asarray([1.0, 0.0, 0.0])      # ray +x
        d0 = jnp.asarray([1.0, 0.0, 0.0])
        # segment crossing the ray at x=2
        hit = cells.ray_segment_intersection(
            s0, e0, d0, jnp.asarray([2.0, -1.0, 0.0]),
            jnp.asarray([2.0, 1.0, 0.0]))
        assert int(hit) == 1
        # behind the origin
        miss = cells.ray_segment_intersection(
            s0, e0, d0, jnp.asarray([-2.0, -1.0, 0.0]),
            jnp.asarray([-2.0, 1.0, 0.0]))
        assert int(miss) == 0
        # ray origin on the segment
        on = cells.ray_segment_intersection(
            s0, e0, d0, jnp.asarray([0.0, -1.0, 0.0]),
            jnp.asarray([0.0, 1.0, 0.0]))
        assert int(on) == 2
        # skew (non-coplanar) lines
        skew = cells.ray_segment_intersection(
            s0, e0, d0, jnp.asarray([2.0, -1.0, 1.0]),
            jnp.asarray([2.0, 1.0, 2.0]))
        assert int(skew) == 0
        # advisor round-2 repro: segment straddles the perpendicular
        # plane through s0 but its only crossing of the ray line is
        # BEHIND the origin (x = -0.5) -> must be a miss
        behind_straddle = cells.ray_segment_intersection(
            s0, e0, d0, jnp.asarray([-2.0, -1.0, 0.0]),
            jnp.asarray([1.0, 1.0, 0.0]))
        assert int(behind_straddle) == 0
        # mirror case: straddling segment crossing FORWARD (x = +0.5)
        forward_straddle = cells.ray_segment_intersection(
            s0, e0, d0, jnp.asarray([-1.0, -1.0, 0.0]),
            jnp.asarray([2.0, 1.0, 0.0]))
        assert int(forward_straddle) == 1

    def test_bilinear_orientation(self, rng):
        v = rng.uniform(-1, 1, (8, 4, 3)).astype(np.float32)
        bi = cells.make_bilinear(*[jnp.asarray(v[:, i]) for i in range(4)])
        ori = np.asarray(orient3d(*[jnp.asarray(v[:, i]) for i in range(4)]))
        f = np.asarray(bi.facets)
        for i in range(8):
            expect = (cells._BILINEAR_FACETS_POS if ori[i] >= 0
                      else cells._BILINEAR_FACETS_NEG)
            np.testing.assert_array_equal(f[i], expect)
        assert not bool(np.any(np.asarray(bi.is_degenerated)))

    def test_prism_hex_bbox_cut(self, rng):
        pts = [jnp.asarray(rng.uniform(0, 1, 3), jnp.float32)
               for _ in range(8)]
        pr = cells.make_prism(*pts)
        assert pr.v.shape == (6, 3)
        lo, hi = pr.bbox()
        assert bool(pr.bbox_cut_bbox(lo - 0.1, lo + 0.05))
        assert not bool(pr.bbox_cut_bbox(hi + 1.0, hi + 2.0))
        hx = cells.make_hex(*pts)
        assert hx.v.shape == (8, 3)
        lo, hi = hx.bbox()
        assert bool(hx.bbox_cut_bbox(lo, hi))
        assert not bool(hx.bbox_cut_bbox(hi + 1.0, hi + 2.0))
        np.testing.assert_array_equal(np.asarray(cells.PRISM_EDGES).shape,
                                      (9, 2))
        np.testing.assert_array_equal(np.asarray(cells.HEX_EDGES).shape,
                                      (12, 2))


def _fd_grad(f, x, eps=1e-3):
    g = np.zeros_like(x)
    for i in range(x.shape[-1]):
        xp = x.copy()
        xm = x.copy()
        xp[..., i] += eps
        xm[..., i] -= eps
        g[..., i] = (f(xp) - f(xm)) / (2 * eps)
    return g


class TestContactDerivatives:
    def _pt_setup(self, rng, n=32):
        t0 = rng.uniform(-1, 1, (n, 3))
        t1 = t0 + rng.uniform(0.5, 1.0, (n, 3))
        t2 = t0 + rng.uniform(-1.0, -0.5, (n, 3))
        p = rng.uniform(-2, 2, (n, 3))
        return np.concatenate([p, t0, t1, t2], -1).astype(np.float64)

    def test_pt_grad_matches_fd(self, rng):
        x12 = self._pt_setup(rng)

        def f64(z):
            zz = z.astype(np.float32)
            return np.asarray(point_triangle_dist2(
                jnp.asarray(zz[..., 0:3]), jnp.asarray(zz[..., 3:6]),
                jnp.asarray(zz[..., 6:9]), jnp.asarray(zz[..., 9:12])),
                np.float64)

        g = np.asarray(contact.pt_dist2_grad(
            jnp.asarray(x12[..., 0:3], jnp.float32),
            jnp.asarray(x12[..., 3:6], jnp.float32),
            jnp.asarray(x12[..., 6:9], jnp.float32),
            jnp.asarray(x12[..., 9:12], jnp.float32)))
        fd = _fd_grad(f64, x12)
        np.testing.assert_allclose(g, fd, atol=5e-3, rtol=5e-2)

    def test_pt_hess_symmetric_and_fd(self, rng):
        x12 = self._pt_setup(rng, n=8)
        args = [jnp.asarray(x12[..., 3 * i:3 * i + 3], jnp.float32)
                for i in range(4)]
        H = np.asarray(contact.pt_dist2_hess(*args))
        np.testing.assert_allclose(H, np.swapaxes(H, -1, -2), atol=1e-4)

        def gradf(z):
            zz = z.astype(np.float32)
            a = [jnp.asarray(zz[..., 3 * i:3 * i + 3]) for i in range(4)]
            return np.asarray(contact.pt_dist2_grad(*a), np.float64)

        eps = 1e-3
        for i in range(12):
            xp = x12.copy()
            xm = x12.copy()
            xp[..., i] += eps
            xm[..., i] -= eps
            fd_col = (gradf(xp) - gradf(xm)) / (2 * eps)
            np.testing.assert_allclose(H[..., i], fd_col, atol=2e-2,
                                       rtol=1e-1)

    def test_ee_grad_matches_fd(self, rng):
        n = 32
        p0 = rng.uniform(-1, 1, (n, 3))
        p1 = p0 + rng.uniform(0.5, 1.5, (n, 3))
        q0 = rng.uniform(-1, 1, (n, 3)) + np.asarray([0, 0, 2.0])
        q1 = q0 + rng.uniform(-1.5, -0.5, (n, 3))
        x12 = np.concatenate([p0, p1, q0, q1], -1)

        def f64(z):
            zz = z.astype(np.float32)
            return np.asarray(edge_edge_dist2(
                jnp.asarray(zz[..., 0:3]), jnp.asarray(zz[..., 3:6]),
                jnp.asarray(zz[..., 6:9]), jnp.asarray(zz[..., 9:12])),
                np.float64)

        g = np.asarray(contact.ee_dist2_grad(
            *[jnp.asarray(x12[..., 3 * i:3 * i + 3], jnp.float32)
              for i in range(4)]))
        fd = _fd_grad(f64, x12)
        np.testing.assert_allclose(g, fd, atol=5e-3, rtol=5e-2)

    def test_spd_project(self, rng):
        A = rng.standard_normal((4, 12, 12)).astype(np.float32)
        H = A + np.swapaxes(A, -1, -2)
        P = np.asarray(contact.spd_project(jnp.asarray(H)))
        w = np.linalg.eigvalsh(P)
        assert (w >= -1e-4).all()
        # already-PSD input is unchanged
        PSD = np.einsum("bij,bkj->bik", A, A)
        P2 = np.asarray(contact.spd_project(jnp.asarray(PSD)))
        np.testing.assert_allclose(P2, PSD, atol=5e-3, rtol=1e-2)

    def test_barrier(self):
        dhat2 = 0.01
        assert float(contact.barrier(0.02, dhat2)) == 0.0
        assert float(contact.barrier(0.005, dhat2)) > 0.0
        # gradient matches FD
        d2 = 0.004
        eps = 1e-6
        fd = (float(contact.barrier(d2 + eps, dhat2)) -
              float(contact.barrier(d2 - eps, dhat2))) / (2 * eps)
        g = float(contact.barrier_grad(d2, dhat2))
        assert abs(g - fd) < 2e-2 * abs(fd)

    def test_friction_mollifiers(self):
        epsvh = 1e-3
        # f1(y)/y continuous at epsvh: both sides -> 1/epsvh
        lo = float(contact.friction_f1_over_x(epsvh * (1 - 1e-6), epsvh))
        hi = float(contact.friction_f1_over_x(epsvh * (1 + 1e-6), epsvh))
        assert abs(lo - hi) / hi < 1e-3
        # f0 continuous at epsvh (value = epsvh on the linear side)
        v_in = float(contact.friction_f0(epsvh, epsvh))
        assert abs(v_in - epsvh) < 1e-9

    def test_ee_mollifier(self):
        p0 = jnp.asarray([0.0, 0.0, 0.0])
        p1 = jnp.asarray([1.0, 0.0, 0.0])
        q0 = jnp.asarray([0.0, 0.0, 1.0])
        # orthogonal edges: fully active
        m_orth = contact.edge_edge_mollifier(
            p0, p1, q0, jnp.asarray([0.0, 1.0, 1.0]), p1 - p0,
            jnp.asarray([0.0, 1.0, 0.0]))
        assert float(m_orth) == 1.0
        # parallel edges: zero
        m_par = contact.edge_edge_mollifier(
            p0, p1, q0, jnp.asarray([1.0, 0.0, 1.0]), p1 - p0,
            jnp.asarray([1.0, 0.0, 0.0]))
        assert float(m_par) == 0.0

    def test_tangent_basis_orthonormal(self, rng):
        p = jnp.asarray(rng.uniform(-1, 1, (8, 3)), jnp.float32)
        t0 = jnp.asarray(rng.uniform(-1, 1, (8, 3)), jnp.float32)
        t1 = t0 + jnp.asarray([1.0, 0.0, 0.0])
        t2 = t0 + jnp.asarray([0.0, 1.0, 0.0])
        b0, b1 = contact.pt_tangent_basis(p, t0, t1, t2)
        np.testing.assert_allclose(np.asarray(jnp.sum(b0 * b1, -1)), 0,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(jnp.linalg.norm(b0, axis=-1)),
                                   1, atol=1e-5)
        n = jnp.cross(t1 - t0, t2 - t0)
        np.testing.assert_allclose(np.asarray(jnp.sum(b0 * n, -1)), 0,
                                   atol=1e-5)
