"""Mesh container/surface-op tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from zpc_tpu.geometry.mesh import (TetMesh, TriMesh, mesh_aabbs,
                                   spray_points, tet_surface, tet_volumes,
                                   tri_normals, vertex_normals)


def _unit_tet():
    v = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                    jnp.float32)
    e = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
    return TetMesh(v, e)


def _two_tets():
    v = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                     [1, 1, 1]], jnp.float32)
    e = jnp.asarray([[0, 1, 2, 3], [1, 2, 3, 4]], jnp.int32)
    return TetMesh(v, e)


class TestMesh:
    def test_tet_volume(self):
        assert abs(float(tet_volumes(_unit_tet())[0]) - 1.0 / 6) < 1e-6

    def test_surface_single_tet(self):
        surf = tet_surface(_unit_tet())
        assert surf.faces.shape == (4, 3)

    def test_surface_shared_face_removed(self):
        surf = tet_surface(_two_tets())
        # 8 faces total, 1 shared pair removed -> 6 boundary faces
        assert surf.faces.shape == (6, 3)
        key = np.sort(np.asarray(surf.faces), axis=1)
        assert len(np.unique(key, axis=0)) == 6
        # face {1,2,3} is interior
        assert not any((k == [1, 2, 3]).all() for k in key)

    def test_normals_unit(self):
        m = TriMesh(jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                                jnp.float32),
                    jnp.asarray([[0, 1, 2]], jnp.int32))
        n = np.asarray(tri_normals(m))
        np.testing.assert_allclose(n[0], [0, 0, 1], atol=1e-6)
        vn = np.asarray(vertex_normals(m))
        np.testing.assert_allclose(vn, np.tile([0, 0, 1], (3, 1)),
                                   atol=1e-6)

    def test_aabbs(self):
        m = TriMesh(jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                                jnp.float32),
                    jnp.asarray([[0, 1, 2]], jnp.int32))
        lo, hi = mesh_aabbs(m, pad=0.1)
        np.testing.assert_allclose(np.asarray(lo)[0], [-0.1, -0.1, -0.1],
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(hi)[0], [1.1, 1.1, 0.1],
                                   atol=1e-6)

    def test_spray_points_on_surface(self):
        m = TriMesh(jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                                jnp.float32),
                    jnp.asarray([[0, 1, 2]], jnp.int32))
        pts = np.asarray(spray_points(m, density=2000.0, seed=1))
        assert len(pts) > 100
        assert np.allclose(pts[:, 2], 0.0)
        assert (pts[:, 0] >= -1e-6).all() and (pts[:, 1] >= -1e-6).all()
        assert (pts[:, 0] + pts[:, 1] <= 1 + 1e-5).all()
