"""Rotations, quaternions, and affine transforms.

Reference: ``math/Rotation.hpp`` (quaternions, angle-axis, Euler),
``math/Transform.hpp`` (4x4 affine used by SparseGrid's world<->index map).

Batched, branch-free, fp32.  Conventions: quaternions are ``[x, y, z, w]``,
matrices act on column vectors, transforms store a single 4x4 row-major
matrix applied as ``p_world = (T @ [p, 1])[:3]``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .vecmat import mm, mv

__all__ = [
    "quat_identity", "quat_from_axis_angle", "quat_mul", "quat_rotate",
    "quat_to_matrix", "quat_from_matrix", "quat_normalize", "quat_slerp",
    "rotation_x", "rotation_y", "rotation_z", "euler_to_matrix",
    "Transform", "translation", "scaling", "rotation_transform",
]


def quat_identity(dtype=jnp.float32):
    return jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype)


def quat_normalize(q):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def quat_from_axis_angle(axis, angle):
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True),
                              1e-12)
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [axis * s[..., None], jnp.cos(half)[..., None]], axis=-1)


def quat_mul(a, b):
    ax, ay, az, aw = (a[..., i] for i in range(4))
    bx, by, bz, bw = (b[..., i] for i in range(4))
    return jnp.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], axis=-1)


def quat_rotate(q, v):
    """Rotate vectors by quaternions (Rodrigues via quat algebra)."""
    u = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def quat_to_matrix(q):
    x, y, z, w = (q[..., i] for i in range(4))
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_from_matrix(R):
    """Branch-free Shepperd's method (selects the max-trace branch by
    arithmetic instead of control flow)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate forms
    qw = jnp.stack([1 + tr, 1 + m00 - m11 - m22,
                    1 - m00 + m11 - m22, 1 - m00 - m11 + m22], -1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) * 0.5
    w0, x1, y2, z3 = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]
    cands = jnp.stack([
        jnp.stack([(m21 - m12) / (4 * w0), (m02 - m20) / (4 * w0),
                   (m10 - m01) / (4 * w0), w0], -1),
        jnp.stack([x1, (m01 + m10) / (4 * x1), (m02 + m20) / (4 * x1),
                   (m21 - m12) / (4 * x1)], -1),
        jnp.stack([(m01 + m10) / (4 * y2), y2, (m12 + m21) / (4 * y2),
                   (m02 - m20) / (4 * y2)], -1),
        jnp.stack([(m02 + m20) / (4 * z3), (m12 + m21) / (4 * z3), z3,
                   (m10 - m01) / (4 * z3)], -1),
    ], axis=-2)
    which = jnp.argmax(qw, axis=-1)
    q = jnp.take_along_axis(cands, which[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    return quat_normalize(q)


def quat_slerp(a, b, t):
    d = jnp.sum(a * b, -1, keepdims=True)
    b = jnp.where(d < 0, -b, b)
    d = jnp.abs(d)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    s = jnp.sin(theta)
    near = s < 1e-5
    wa = jnp.where(near, 1.0 - t, jnp.sin((1 - t) * theta) / jnp.where(near, 1.0, s))
    wb = jnp.where(near, t, jnp.sin(t * theta) / jnp.where(near, 1.0, s))
    return quat_normalize(wa * a + wb * b)


def rotation_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack([o, z, z, z, c, -s, z, s, c], -1).reshape(a.shape + (3, 3))


def rotation_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack([c, z, s, z, o, z, -s, z, c], -1).reshape(a.shape + (3, 3))


def rotation_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack([c, -s, z, s, c, z, z, z, o], -1).reshape(a.shape + (3, 3))


def euler_to_matrix(rx, ry, rz):
    return mm(mm(rotation_z(rz), rotation_y(ry)), rotation_x(rx))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Transform:
    """4x4 affine world transform (math/Transform.hpp) — the SparseGrid's
    index<->world map."""

    matrix: jax.Array  # [4, 4]

    @staticmethod
    def identity(dtype=jnp.float32) -> "Transform":
        return Transform(jnp.eye(4, dtype=dtype))

    def apply(self, p):
        """Points: rotate/scale + translate (dim inferred from p, so the
        same 4x4 carrier serves 2-D grids)."""
        d = p.shape[-1]
        return mm(p, self.matrix[:d, :d].T) + self.matrix[:d, 3]

    def apply_vector(self, v):
        """Vectors: no translation."""
        d = v.shape[-1]
        return mm(v, self.matrix[:d, :d].T)

    def inverse(self) -> "Transform":
        R = self.matrix[:3, :3]
        t = self.matrix[:3, 3]
        Rinv = jnp.linalg.inv(R)
        M = jnp.eye(4, dtype=self.matrix.dtype)
        M = M.at[:3, :3].set(Rinv).at[:3, 3].set(-mv(Rinv, t))
        return Transform(M)

    def compose(self, other: "Transform") -> "Transform":
        return Transform(mm(self.matrix, other.matrix))


def translation(t) -> Transform:
    t = jnp.asarray(t, jnp.float32)
    M = jnp.eye(4).at[:t.shape[0], 3].set(t)
    return Transform(M)


def scaling(s) -> Transform:
    s = jnp.broadcast_to(jnp.asarray(s, jnp.float32), (3,))
    M = jnp.diag(jnp.concatenate([s, jnp.ones(1)]))
    return Transform(M)


def rotation_transform(R) -> Transform:
    M = jnp.eye(4).at[:3, :3].set(R)
    return Transform(M)
