"""Dihedral-angle hinge kernels vs the reference acos+sign form and
finite differences (math/DihedralAngle.hpp:1-180)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zpc_tpu.geometry.dihedral import (
    dihedral_angle, dihedral_angle_gradient, dihedral_angle_hessian,
    hinge_bending_energy, hinge_bending_gradient, hinge_bending_hessian)


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def ref_angle(v2, v0, v1, v3):
    """Reference form (DihedralAngle.hpp:20-28): acos of normalized
    normals + sign flip where (n2 x n1).(v0 - v1) < 0."""
    n1 = np.cross(v0 - v2, v1 - v2)
    n2 = np.cross(v1 - v3, v0 - v3)
    c = (n1 * n2).sum(-1) / np.sqrt(
        (n1 * n1).sum(-1) * (n2 * n2).sum(-1))
    da = np.arccos(np.clip(c, -1.0, 1.0))
    flip = (np.cross(n2, n1) * (v0 - v1)).sum(-1) < 0
    return np.where(flip, -da, da)


def hinges(rng, n=64):
    v0 = rng.standard_normal((n, 3))
    v1 = v0 + rng.standard_normal((n, 3))
    v2 = v0 + rng.standard_normal((n, 3))
    v3 = v0 + rng.standard_normal((n, 3))
    return [a.astype(np.float64) for a in (v2, v0, v1, v3)]


def test_angle_matches_reference_form(rng):
    v2, v0, v1, v3 = hinges(rng)
    ours = np.asarray(dihedral_angle(*map(jnp.asarray, (v2, v0, v1, v3))))
    ref = ref_angle(v2, v0, v1, v3)
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_branch_shifts(rng):
    v2, v0, v1, v3 = map(jnp.asarray, hinges(rng))
    t0 = np.asarray(dihedral_angle(v2, v0, v1, v3))
    tp = np.asarray(dihedral_angle(v2, v0, v1, v3, branch=+1))
    tm = np.asarray(dihedral_angle(v2, v0, v1, v3, branch=-1))
    assert (tp >= 0).all() and (tp < 2 * np.pi).all()
    assert (tm <= 0).all() and (tm > -2 * np.pi).all()
    np.testing.assert_allclose(np.mod(tp, 2 * np.pi),
                               np.mod(t0, 2 * np.pi), atol=1e-6)
    np.testing.assert_allclose(np.mod(tm, 2 * np.pi),
                               np.mod(t0, 2 * np.pi), atol=1e-6)


def test_gradient_matches_fd(rng):
    v2, v0, v1, v3 = hinges(rng, 16)
    g = np.asarray(dihedral_angle_gradient(
        *map(jnp.asarray, (v2, v0, v1, v3))))
    x = np.concatenate([v2, v0, v1, v3], axis=-1)
    eps = 1e-6
    for k in range(12):
        xp = x.copy(); xp[:, k] += eps
        xm = x.copy(); xm[:, k] -= eps
        fd = (ref_angle(xp[:, 0:3], xp[:, 3:6], xp[:, 6:9], xp[:, 9:12])
              - ref_angle(xm[:, 0:3], xm[:, 3:6], xm[:, 6:9],
                          xm[:, 9:12])) / (2 * eps)
        np.testing.assert_allclose(g[:, k], fd, rtol=2e-4, atol=2e-5)


def test_hessian_symmetric_and_matches_fd(rng):
    v2, v0, v1, v3 = hinges(rng, 8)
    args = list(map(jnp.asarray, (v2, v0, v1, v3)))
    H = np.asarray(dihedral_angle_hessian(*args))
    np.testing.assert_allclose(H, np.swapaxes(H, -1, -2), atol=3e-6)
    eps = 1e-3   # fp32 gradient noise ~1e-6 -> fd error ~1e-3
    x = np.concatenate([v2, v0, v1, v3], axis=-1)
    for k in range(0, 12, 5):
        xp = x.copy(); xp[:, k] += eps
        xm = x.copy(); xm[:, k] -= eps
        def grad_at(xx):
            return np.asarray(dihedral_angle_gradient(
                jnp.asarray(xx[:, 0:3]), jnp.asarray(xx[:, 3:6]),
                jnp.asarray(xx[:, 6:9]), jnp.asarray(xx[:, 9:12])))
        fd = (grad_at(xp) - grad_at(xm)) / (2 * eps)
        np.testing.assert_allclose(H[:, k, :], fd, rtol=3e-2, atol=4e-3)


def test_flat_hinge_is_finite():
    """The acos form's derivative blows up at theta=0; the atan2 form
    must stay finite and give theta=0 on a flat hinge."""
    v0 = jnp.asarray([[0.0, 0.0, 0.0]])
    v1 = jnp.asarray([[1.0, 0.0, 0.0]])
    v2 = jnp.asarray([[0.5, 1.0, 0.0]])
    v3 = jnp.asarray([[0.5, -1.0, 0.0]])
    t = dihedral_angle(v2, v0, v1, v3)
    g = dihedral_angle_gradient(v2, v0, v1, v3)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-7)
    assert np.isfinite(np.asarray(g)).all()


def test_rotation_translation_invariance(rng):
    v2, v0, v1, v3 = hinges(rng, 32)
    th = np.asarray(dihedral_angle(*map(jnp.asarray, (v2, v0, v1, v3))))
    # random rotation (QR) + shift
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    s = rng.standard_normal(3)
    rt = [jnp.asarray(v @ Q.T + s) for v in (v2, v0, v1, v3)]
    th2 = np.asarray(dihedral_angle(*rt))
    np.testing.assert_allclose(th2, th, atol=1e-6)


def test_bending_energy_grad_hess(rng):
    v2, v0, v1, v3 = map(jnp.asarray, hinges(rng, 8))
    k = jnp.float64(2.5)
    rest = jnp.float64(0.3)
    E = hinge_bending_energy(v2, v0, v1, v3, rest, k)
    g = hinge_bending_gradient(v2, v0, v1, v3, rest, k)
    H = hinge_bending_hessian(v2, v0, v1, v3, rest, k)
    th = np.asarray(dihedral_angle(v2, v0, v1, v3))
    np.testing.assert_allclose(np.asarray(E),
                               2.5 * (th - 0.3) ** 2, rtol=1e-6)
    # gradient = 2k (theta-rest) dtheta
    gt = np.asarray(dihedral_angle_gradient(v2, v0, v1, v3))
    np.testing.assert_allclose(
        np.asarray(g), 2 * 2.5 * (th - 0.3)[:, None] * gt, rtol=1e-6)
    assert np.isfinite(np.asarray(H)).all()
    np.testing.assert_allclose(np.asarray(H),
                               np.swapaxes(np.asarray(H), -1, -2),
                               atol=2e-4)
