"""Floating-base forward kinematics and geometric Jacobians.

Replaces the kinematic half of iDynTree KinDynComputations as consumed by the
reference controller (src/whole_body_controller.cpp:256-294,322-382):
  * world poses of every body and named frame  (getWorldTransform)
  * robot CoM position / velocity              (getCenterOfMassPosition/Velocity)
  * mixed-representation frame Jacobians       (getFrameFreeFloatingJacobian)
  * frame velocities                           (getFrameVel)

Conventions (iDynTree MIXED representation, matching the reference's use):
  * generalized velocity u = [v_base_world (3); omega_world (3); qdot (12)]
    - linear first, base-origin linear velocity in world coordinates
  * a frame Jacobian maps u -> [v_frame_origin_world; omega_frame_world]

All functions are single-sample and shape-static; batch via jax.vmap.
The 12-joint tree loop is unrolled at trace time (static topology), so XLA
sees pure elementwise/matmul ops — no dynamic control flow.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from quadrupedwholebodycontroller_tpu.models.robot_model import RobotModel
from quadrupedwholebodycontroller_tpu.ops import spatial


class KinState(NamedTuple):
    """World-frame kinematic quantities for one configuration."""

    body_R: jax.Array        # (nb, 3, 3)
    body_p: jax.Array        # (nb, 3)   body frame origins
    body_com_w: jax.Array    # (nb, 3)   body CoM positions
    joint_axis_w: jax.Array  # (nj, 3)   world joint axes
    joint_origin_w: jax.Array  # (nj, 3) world joint origins
    frame_R: jax.Array       # (nf, 3, 3)
    frame_p: jax.Array       # (nf, 3)


def forward_kinematics(model: RobotModel, base_R, base_p, q) -> KinState:
    """FK over the whole tree. base_R: (3,3), base_p: (3,), q: (nj,)."""
    nb = model.num_bodies
    body_R = [None] * nb
    body_p = [None] * nb
    body_R[0] = base_R
    body_p[0] = base_p
    joint_axis_w = []
    joint_origin_w = []
    for b in range(1, nb):
        j = b - 1
        pa = model.parent[b]
        R_jf = body_R[pa] @ model.joint_R[j]          # joint frame in world
        p_j = body_p[pa] + body_R[pa] @ model.joint_p[j]
        axis_w = R_jf @ model.joint_axis[j]
        body_R[b] = R_jf @ spatial.axis_angle_to_matrix(model.joint_axis[j], q[j])
        body_p[b] = p_j
        joint_axis_w.append(axis_w)
        joint_origin_w.append(p_j)
    body_R = jnp.stack(body_R)
    body_p = jnp.stack(body_p)
    body_com_w = body_p + jnp.einsum("bij,bj->bi", body_R, model.com)
    if model.frame_R.shape[0]:
        fb = np.array(model.frame_body)
        frame_R = body_R[fb] @ model.frame_R
        frame_p = body_p[fb] + jnp.einsum("fij,fj->fi", body_R[fb], model.frame_p)
    else:
        frame_R = jnp.zeros((0, 3, 3), body_R.dtype)
        frame_p = jnp.zeros((0, 3), body_R.dtype)
    return KinState(
        body_R=body_R,
        body_p=body_p,
        body_com_w=body_com_w,
        joint_axis_w=jnp.stack(joint_axis_w),
        joint_origin_w=jnp.stack(joint_origin_w),
        frame_R=frame_R,
        frame_p=frame_p,
    )


def _point_jacobian(model, kin, x, mask_row):
    """Mixed Jacobian (6, nv) of a world point x on a body with ancestor-joint

    mask mask_row (nj,): u -> [v_x_world; omega_world]."""
    nj = model.num_joints
    dtype = x.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    # joint columns
    jv = jnp.cross(kin.joint_axis_w, x[None, :] - kin.joint_origin_w)  # (nj, 3)
    jv = jv * mask_row[:, None]
    jw = kin.joint_axis_w * mask_row[:, None]
    Jv = jnp.concatenate([eye3, -spatial.skew(x - kin.body_p[0]), jv.T], axis=1)
    Jw = jnp.concatenate([jnp.zeros((3, 3), dtype), eye3, jw.T], axis=1)
    return jnp.concatenate([Jv, Jw], axis=0)


def body_com_jacobians(model: RobotModel, kin: KinState) -> jax.Array:
    """(nb, 6, nv) mixed Jacobians at each body's CoM (for M, bias, energy)."""
    mask = jnp.asarray(model.ancestor_joint_mask(), dtype=kin.body_p.dtype)
    rows = [
        _point_jacobian(model, kin, kin.body_com_w[b], mask[b])
        for b in range(model.num_bodies)
    ]
    return jnp.stack(rows)


def frame_jacobians(model: RobotModel, kin: KinState) -> jax.Array:
    """(nf, 6, nv) mixed Jacobians of the named frames.

    Matches iDynTree getFrameFreeFloatingJacobian in MIXED representation
    (reference src/whole_body_controller.cpp:327-341 uses the top 3 rows)."""
    mask = jnp.asarray(model.ancestor_joint_mask(), dtype=kin.body_p.dtype)
    rows = [
        _point_jacobian(model, kin, kin.frame_p[f], mask[model.frame_body[f]])
        for f in range(len(model.frame_body))
    ]
    return jnp.stack(rows)


def robot_com(model: RobotModel, kin: KinState) -> jax.Array:
    """(3,) total CoM — iDynTree getCenterOfMassPosition."""
    return jnp.einsum("b,bi->i", model.mass, kin.body_com_w) / model.total_mass


def body_velocities(model: RobotModel, base_R, base_p, q, u):
    """Per-body CoM linear velocity and angular velocity.

    Returns (v_com (nb,3), omega (nb,3)).  Linear in u; used directly and —
    via jax.jvp along the state flow — for velocity-product accelerations."""
    kin = forward_kinematics(model, base_R, base_p, q)
    J = body_com_jacobians(model, kin)  # (nb, 6, nv)
    vel6 = jnp.einsum("bij,j->bi", J, u)
    return vel6[:, :3], vel6[:, 3:]


def frame_velocities(model: RobotModel, kin: KinState, u):
    """(nf, 6) mixed frame velocities [v_origin_world; omega_world].

    iDynTree getFrameVel (reference src/whole_body_controller.cpp:369-379
    uses the top 3 entries)."""
    J = frame_jacobians(model, kin)
    return jnp.einsum("fij,j->fi", J, u)


def com_velocity(model: RobotModel, kin: KinState, u) -> jax.Array:
    """(3,) CoM linear velocity — iDynTree getCenterOfMassVelocity."""
    J = body_com_jacobians(model, kin)
    v = jnp.einsum("b,bij,j->i", model.mass, J[:, :3, :], u)
    return v / model.total_mass


def state_flow(base_R, base_p, q, u):
    """Time derivative of the configuration (base_R, base_p, q) under mixed

    velocity u: (Rdot, pdot, qdot) with Rdot = skew(omega_world) @ R."""
    return (
        spatial.skew(u[3:6]) @ base_R,
        u[0:3],
        u[6:],
    )
