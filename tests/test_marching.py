"""Marching-tetrahedra isosurface tests (geometry/marching.py).

Oracles: analytic sphere (area, radius, outward normals), watertight
edge matching, and the SparseLevelSet convenience path."""

import numpy as np
import jax
import jax.numpy as jnp

from zpc_tpu.geometry.marching import marching_tets, surface_from_levelset


def _sphere_sdf(n, dx, c, r):
    ax = np.arange(n) * dx
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    return jnp.asarray(
        np.sqrt((X - c[0]) ** 2 + (Y - c[1]) ** 2 + (Z - c[2]) ** 2) - r,
        jnp.float32)


def _tri_areas_normals(verts, count):
    v = np.asarray(verts)[:count]
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    n = np.cross(e1, e2)
    a = 0.5 * np.linalg.norm(n, axis=-1)
    return a, n


def test_sphere_area_and_radius():
    n, dx, r = 48, 1.0 / 48, 0.3
    c = (0.5, 0.5, 0.5)
    soup = marching_tets(_sphere_sdf(n, dx, c, r), dx, capacity=100_000)
    cnt = int(soup.count)
    assert cnt > 0 and not bool(soup.overflow)
    a, _ = _tri_areas_normals(soup.verts, cnt)
    area = a.sum()
    np.testing.assert_allclose(area, 4 * np.pi * r * r, rtol=0.02)
    # every vertex lies on the sphere
    v = np.asarray(soup.verts)[:cnt].reshape(-1, 3)
    d = np.linalg.norm(v - np.asarray(c), axis=-1)
    np.testing.assert_allclose(d, r, atol=dx)


def test_normals_point_outward():
    n, dx, r = 32, 1.0 / 32, 0.25
    c = np.array([0.5, 0.5, 0.5])
    soup = marching_tets(_sphere_sdf(n, dx, c, r), dx, capacity=50_000)
    cnt = int(soup.count)
    v = np.asarray(soup.verts)[:cnt]
    a, nrm = _tri_areas_normals(soup.verts, cnt)
    keep = a > 1e-10        # zero-area slivers have undefined normals
    centers = v.mean(axis=1)
    outward = centers - c
    dots = np.einsum("nd,nd->n", nrm[keep], outward[keep])
    assert (dots > 0).mean() > 0.999


def test_watertight_edges():
    """Closed surface: every directed edge appears exactly once with its
    opposite (each undirected edge shared by exactly 2 triangles)."""
    n, dx, r = 24, 1.0 / 24, 0.3
    soup = marching_tets(_sphere_sdf(n, dx, (0.5, 0.5, 0.5), r), dx,
                         capacity=50_000)
    cnt = int(soup.count)
    v = np.asarray(soup.verts)[:cnt]
    # quantize vertices to merge identical crossing points
    q = np.round(v / dx * 4096).astype(np.int64)
    from collections import Counter
    edges = Counter()
    for tri in q:
        pts = [tuple(p) for p in tri]
        if len(set(pts)) < 3:
            continue    # degenerate sliver (zero area), skip
        for i in range(3):
            a, b = pts[i], pts[(i + 1) % 3]
            edges[(min(a, b), max(a, b))] += 1
    counts = np.array(list(edges.values()))
    assert (counts == 2).mean() > 0.99


def test_overflow_flag():
    n, dx, r = 32, 1.0 / 32, 0.25
    soup = marching_tets(_sphere_sdf(n, dx, (0.5, 0.5, 0.5), r), dx,
                         capacity=16)
    assert bool(soup.overflow)


def test_jit():
    n, dx = 16, 1.0 / 16
    sdf = _sphere_sdf(n, dx, (0.5, 0.5, 0.5), 0.25)
    f = jax.jit(lambda s: marching_tets(s, dx, capacity=4096))
    soup = f(sdf)
    assert int(soup.count) > 0


def test_surface_from_levelset():
    from zpc_tpu.geometry.sparse_levelset import levelset_from_points
    rng = np.random.default_rng(0)
    # points on a sphere shell -> union-of-spheres SDF -> surface
    d = rng.normal(size=(400, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    x = jnp.asarray(0.5 + 0.2 * d, jnp.float32)
    ls = levelset_from_points(x, dx=1.0 / 32, radius=0.05,
                              block_capacity=512)
    soup = surface_from_levelset(ls, iso=0.05, capacity=100_000)
    cnt = int(soup.count)
    assert cnt > 100
    v = np.asarray(soup.verts)[:cnt].reshape(-1, 3)
    dist = np.linalg.norm(v - 0.5, axis=-1)
    # shell of radius ~0.2 (union of r=0.05 spheres surfaced at iso 0.05)
    assert 0.1 < np.median(dist) < 0.32
