"""SO(3)/SE(3) helpers used throughout the framework.

All functions are pure jnp, shape-static, and batch-friendly (leading batch
dims broadcast).  Conventions match the reference controller:
  * skew — reference src/whole_body_controller.cpp:3-10
  * RPY extraction — reference src/whole_body_controller.cpp:12-20
    (roll = atan2(R21, R22), pitch = atan2(-R20, sqrt(R21²+R22²)),
     yaw = atan2(R10, R00); extrinsic XYZ == intrinsic ZYX)
"""
from __future__ import annotations

import jax.numpy as jnp


def skew(v):
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def rpy_to_matrix(rpy):
    """(..., 3) roll-pitch-yaw -> (..., 3, 3) rotation, R = Rz(y) Ry(p) Rx(r)."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_rpy(R):
    """(..., 3, 3) -> (..., 3) RPY, exactly the reference's eulAnglesRPY."""
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    pitch = jnp.arctan2(
        -R[..., 2, 0],
        jnp.sqrt(R[..., 2, 1] ** 2 + R[..., 2, 2] ** 2),
    )
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], axis=-1)


def axis_angle_to_matrix(axis, angle):
    """Rodrigues rotation about a (fixed, unit) axis.

    axis: (..., 3); angle: (...) -> (..., 3, 3)
    """
    c = jnp.cos(angle)[..., None, None]
    s = jnp.sin(angle)[..., None, None]
    K = skew(axis)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=K.dtype), K.shape)
    return eye + s * K + (1.0 - c) * (K @ K)


def quat_to_matrix(q):
    """(..., 4) quaternion (w, x, y, z) -> (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = w * w + x * x + y * y + z * z
    s = 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    row0 = jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1)
    row1 = jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1)
    row2 = jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_quat(R):
    """(..., 3, 3) -> (..., 4) quaternion (w, x, y, z), branchless."""
    m00, m11, m22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick the numerically best via where-chains
    qw = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) / 2.0
    qx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) / 2.0
    qy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) / 2.0
    qz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) / 2.0
    qx = jnp.copysign(qx, R[..., 2, 1] - R[..., 1, 2])
    qy = jnp.copysign(qy, R[..., 0, 2] - R[..., 2, 0])
    qz = jnp.copysign(qz, R[..., 1, 0] - R[..., 0, 1])
    q = jnp.stack([qw, qx, qy, qz], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def orthonormalize(R):
    """Project a near-rotation matrix back onto SO(3) (Gram-Schmidt).

    Used by the integrator to keep the base rotation on the manifold across
    long lax.scan rollouts without an SVD.
    """
    x = R[..., :, 0]
    y = R[..., :, 1]
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    y = y - jnp.sum(x * y, axis=-1, keepdims=True) * x
    y = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
    z = jnp.cross(x, y)
    return jnp.stack([x, y, z], axis=-1)
