"""Floating-base rigid-body dynamics: mass matrix, Coriolis bias, energies.

Replaces the dynamic half of iDynTree KinDynComputations as consumed by the
reference controller:
  * getFreeFloatingMassMatrix (18x18 CRBA)  — src/whole_body_controller.cpp:266
  * generalizedBiasForces - generalizedGravityForces (Coriolis-only bias)
                                            — src/whole_body_controller.cpp:544-551

Design (TPU-first, autodiff-native — not a Featherstone port):
  * M(q) = sum_b  m_b J_cb^T J_cb  +  J_wb^T I_b^w J_wb   over the 13 lumped
    bodies, with mixed-representation CoM-point Jacobians.  Exact (kinetic
    energy identity), and it maps to one batched einsum on the MXU.
  * Coriolis bias via the principle of virtual work in world frame:
        h_C = sum_b J_cb^T (m_b a_cb) + J_wb^T (I_b^w alpha_b + w_b x I_b^w w_b)
    where (a_cb, alpha_b) are the velocity-product accelerations (u_dot = 0),
    obtained EXACTLY as one jax.jvp of the body-velocity map along the state
    flow — no hand-derived Christoffel symbols, valid in the anholonomic
    mixed basis because virtual work is basis-agnostic.

All single-sample; batch via vmap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from quadrupedwholebodycontroller_tpu.models.robot_model import RobotModel
from quadrupedwholebodycontroller_tpu.ops import kinematics as K


def world_inertias(model: RobotModel, kin: K.KinState) -> jax.Array:
    """(nb, 3, 3) body inertias about their CoM in world axes."""
    return jnp.einsum("bij,bjk,blk->bil", kin.body_R, model.inertia, kin.body_R)


def mass_matrix(model: RobotModel, kin: K.KinState, J=None) -> jax.Array:
    """(nv, nv) free-floating mass matrix, mixed representation.

    Matches iDynTree getFreeFloatingMassMatrix (u = [v_base; omega; qdot]).
    Pass J (body CoM Jacobians) to reuse an already-computed stack."""
    if J is None:
        J = K.body_com_jacobians(model, kin)      # (nb, 6, nv)
    Jv, Jw = J[:, :3, :], J[:, 3:, :]
    Iw = world_inertias(model, kin)
    M = jnp.einsum("b,bik,bil->kl", model.mass, Jv, Jv)
    M = M + jnp.einsum("bik,bij,bjl->kl", Jw, Iw, Jw)
    return M


def coriolis_bias_full(model: RobotModel, base_R, base_p, q, u):
    """Coriolis bias plus the primal kinematics it computes along the way.

    Returns (h_C (nv,), kin, J (nb,6,nv)) — callers (the WBC setup) reuse
    kin/J instead of recomputing FK, halving the kinematics op count."""
    flow = K.state_flow(base_R, base_p, q, u)

    def f(R, p, qq):
        kin = K.forward_kinematics(model, R, p, qq)
        J = K.body_com_jacobians(model, kin)
        vel6 = jnp.einsum("bij,j->bi", J, u)
        return vel6[:, :3], vel6[:, 3:], kin, J

    (v_c, w, kin, J), (a_c, alpha, _, _) = jax.jvp(f, (base_R, base_p, q), flow)

    Jv, Jw = J[:, :3, :], J[:, 3:, :]
    Iw = world_inertias(model, kin)
    F = model.mass[:, None] * a_c                              # (nb, 3)
    N = jnp.einsum("bij,bj->bi", Iw, alpha) + jnp.cross(w, jnp.einsum("bij,bj->bi", Iw, w))
    h = jnp.einsum("bik,bi->k", Jv, F) + jnp.einsum("bik,bi->k", Jw, N)
    return h, kin, J


def coriolis_bias(model: RobotModel, base_R, base_p, q, u) -> jax.Array:
    """(nv,) Coriolis/centrifugal generalized force C(q,u)u (gravity-free).

    Matches the reference's computeCoriolisBias (generalizedBiasForces minus
    generalizedGravityForces, src/whole_body_controller.cpp:544-551)."""
    h, _, _ = coriolis_bias_full(model, base_R, base_p, q, u)
    return h


def gravity_force(model: RobotModel, kin: K.KinState, g_vec) -> jax.Array:
    """(nv,) generalized gravity force for gravity acceleration g_vec (3,).

    With iDynTree's convention, generalizedGravityForces returns the
    generalized force that gravity must be *balanced against*; the reference
    passes g_vec = (0, 0, +9.81) (src/whole_body_controller.cpp:78) and only
    ever uses bias - gravity, so the sign convention cancels.  Here we return
    sum_b J_cb^T m_b g_vec (the generalized force of a +g_vec acceleration
    field), which under the centroidal transform maps to [m*g_vec; 0; 0]."""
    J = K.body_com_jacobians(model, kin)
    return jnp.einsum("bik,b,i->k", J[:, :3, :], model.mass, jnp.asarray(g_vec))


def kinetic_energy(model: RobotModel, kin: K.KinState, u) -> jax.Array:
    """Scalar kinetic energy computed directly from body velocities

    (independent path used to validate mass_matrix)."""
    J = K.body_com_jacobians(model, kin)
    vel6 = jnp.einsum("bij,j->bi", J, u)
    v_c, w = vel6[:, :3], vel6[:, 3:]
    Iw = world_inertias(model, kin)
    ke_lin = 0.5 * jnp.sum(model.mass * jnp.sum(v_c * v_c, axis=-1))
    ke_ang = 0.5 * jnp.einsum("bi,bij,bj->", w, Iw, w)
    return ke_lin + ke_ang


def potential_energy(model: RobotModel, kin: K.KinState, g: float = 9.81) -> jax.Array:
    """Scalar gravitational PE with gravity pulling along -z."""
    return g * jnp.einsum("b,b->", model.mass, kin.body_com_w[:, 2])


def forward_dynamics(model: RobotModel, base_R, base_p, q, u, tau_gen,
                     minv=None) -> jax.Array:
    """(nv,) u_dot = M^{-1} (tau_gen - h_C - g_gen) with gravity pulling -z.

    tau_gen is the full generalized applied force (e.g. S^T tau + J_c^T f).
    Used by the on-device simulator (the Gazebo/C5 replacement).

    minv: optional slightly-stale M^{-1} (e.g. computed once per control
    period) — applied with iterative refinement against the CURRENT M, so
    the solve stays accurate while the expensive inverse is amortized over
    the physics substeps."""
    kin = K.forward_kinematics(model, base_R, base_p, q)
    M = mass_matrix(model, kin)
    h = coriolis_bias(model, base_R, base_p, q, u)
    # applied gravity generalized force (field acceleration -9.81 z)
    grav = gravity_force(model, kin, jnp.array([0.0, 0.0, -9.81], dtype=u.dtype))
    rhs = tau_gen - h + grav
    if minv is not None:
        x = minv @ rhs
        for _ in range(2):
            x = x + minv @ (rhs - M @ x)
        return x
    # M is SPD: matmul-only solve (factorization custom calls are the
    # dominant cost on the target TPU stack — see ops/linalg.py)
    from quadrupedwholebodycontroller_tpu.ops.linalg import spd_solve

    return spd_solve(M, rhs, iters=30, refine=2)
