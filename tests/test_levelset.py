"""Level set tests: analytic sets, sparse narrow-band sets, flood fill."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zpc_tpu.geometry.levelset import (Cuboid, Cylinder, HalfSpace, Sphere,
                                       Torus, UnionLevelSet,
                                       TransformedLevelSet)
from zpc_tpu.geometry.sparse_levelset import (flood_fill,
                                              levelset_from_analytic,
                                              levelset_from_points)


class TestAnalytic:
    def test_sphere(self, rng):
        s = Sphere(jnp.zeros(3), jnp.float32(1.0))
        x = jnp.asarray(rng.standard_normal((100, 3)) * 2, jnp.float32)
        d = np.asarray(s.sdf(x))
        ref = np.linalg.norm(np.asarray(x), axis=1) - 1.0
        np.testing.assert_allclose(d, ref, atol=1e-5)
        n = np.asarray(s.normal(x))
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)

    def test_cuboid_exact_exterior(self):
        c = Cuboid(jnp.zeros(3), jnp.ones(3))
        assert abs(float(c.sdf(jnp.asarray([[2.0, 0.5, 0.5]]))[0]) - 1.0) \
            < 1e-6
        assert abs(float(c.sdf(jnp.asarray([[2.0, 2.0, 0.5]]))[0]) -
                   np.sqrt(2.0)) < 1e-6
        assert float(c.sdf(jnp.asarray([[0.5, 0.5, 0.5]]))[0]) < 0

    def test_cylinder_torus(self):
        cyl = Cylinder(jnp.zeros(3), jnp.float32(0.5), jnp.float32(2.0))
        assert float(cyl.sdf(jnp.asarray([[0.0, 1.0, 0.0]]))[0]) < 0
        assert float(cyl.sdf(jnp.asarray([[1.0, 1.0, 0.0]]))[0]) > 0
        tor = Torus(jnp.zeros(3), jnp.float32(1.0), jnp.float32(0.2))
        assert float(tor.sdf(jnp.asarray([[1.0, 0.0, 0.0]]))[0]) < 0
        assert float(tor.sdf(jnp.asarray([[0.0, 0.0, 0.0]]))[0]) > 0

    def test_autodiff_normal_matches_analytic(self, rng):
        c = Cuboid(jnp.zeros(3), jnp.ones(3))
        x = jnp.asarray([[2.0, 0.5, 0.5], [0.5, -1.0, 0.5]], jnp.float32)
        n = np.asarray(c.normal(x))
        np.testing.assert_allclose(n[0], [1, 0, 0], atol=1e-4)
        np.testing.assert_allclose(n[1], [0, -1, 0], atol=1e-4)

    def test_union_velocity(self):
        a = Sphere(jnp.asarray([0.0, 0, 0]), jnp.float32(1.0))
        b = Sphere(jnp.asarray([5.0, 0, 0]), jnp.float32(1.0))
        u = UnionLevelSet((a, b))
        x = jnp.asarray([[4.5, 0, 0]], jnp.float32)
        assert abs(float(u.sdf(x)[0]) - (-0.5)) < 1e-5

    def test_transformed_moving(self):
        base = Sphere(jnp.zeros(3), jnp.float32(1.0))
        t = TransformedLevelSet(
            base, jnp.eye(3), jnp.asarray([2.0, 0, 0]),
            jnp.asarray([1.0, 0, 0]), jnp.zeros(3))
        x = jnp.asarray([[2.0, 0, 0]], jnp.float32)
        assert float(t.sdf(x)[0]) < 0
        np.testing.assert_allclose(np.asarray(t.velocity(x))[0],
                                   [1.0, 0, 0], atol=1e-6)


class TestSparseLevelSet:
    def test_rasterized_sphere(self):
        s = Sphere(jnp.asarray([0.5, 0.5, 0.5]), jnp.float32(0.3))
        ls = levelset_from_analytic(s, [0, 0, 0], [1, 1, 1], dx=0.02,
                                    block_capacity=2048)
        pts = jnp.asarray([[0.5, 0.5, 0.5], [0.5, 0.5, 0.75],
                           [0.5, 0.82, 0.5]], jnp.float32)
        d = np.asarray(ls.sdf(pts))
        assert d[0] < -0.2           # deep inside (clipped at band limit)
        assert abs(d[1] - (-0.05)) < 0.01
        assert abs(d[2] - 0.02) < 0.01

    def test_points_levelset(self, rng):
        x = jnp.asarray(rng.uniform(0.4, 0.6, (200, 3)), jnp.float32)
        ls = levelset_from_points(x, dx=0.02, radius=0.03,
                                  block_capacity=2048)
        inside = np.asarray(ls.sdf(x[:10]))
        assert (inside < 0).all()
        far = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
        assert float(ls.sdf(far)[0]) > 0

    def test_flood_fill_fills_band(self):
        s = Sphere(jnp.asarray([0.5, 0.5, 0.5]), jnp.float32(0.2))
        ls = levelset_from_analytic(s, [0, 0, 0], [1, 1, 1], dx=0.05,
                                    block_capacity=1024, band=2.0)
        ls2 = flood_fill(ls, iters=4)
        # flood fill must not corrupt near-surface values
        pts = jnp.asarray([[0.5, 0.5, 0.71]], jnp.float32)
        assert abs(float(ls2.sdf(pts)[0]) - 0.01) < 0.02
