"""Batched dense convex QP solver (OSQP-style ADMM + active-set polish).

Replaces qpOASES' hot-started SQProblem (reference
src/whole_body_controller.cpp:517-541; 42 variables x 70 two-sided
constraints, hpp:31-32) with a TPU-native design:

  * fixed iteration count (XLA-static control flow, lax.fori_loop),
  * one 42x42 SPD factorization per problem, then matmul-only iterations
    (batched einsum -> MXU / VPU),
  * warm start carried across control cycles (the analogue of qpOASES
    hotstart: ADMM iterates (x, z, y) restart from the previous cycle's
    solution, and at 400 Hz consecutive problems differ slightly),
  * an active-set "polish" solve (OSQP-style) that recovers near-exact
    KKT-stationary solutions from the ADMM estimate of the active set,
  * per-problem status/KKT residuals instead of a global abort (the
    reference aborts the whole controller on QP failure, cpp:654-659; in a
    batched setting each scenario carries its own status).

Problem form:  min 1/2 x^T H x + g^T x   s.t.  l <= A x <= u
All functions are single-sample; batch via vmap.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from quadrupedwholebodycontroller_tpu.config import QPSolverParams


class QPData(NamedTuple):
    H: jax.Array  # (n, n) symmetric PD
    g: jax.Array  # (n,)
    A: jax.Array  # (m, n)
    l: jax.Array  # (m,)
    u: jax.Array  # (m,)


class QPState(NamedTuple):
    """Warm-startable iterate (the hotstart carry)."""

    x: jax.Array  # (n,)
    z: jax.Array  # (m,)
    y: jax.Array  # (m,)

    @classmethod
    def zeros(cls, n: int, m: int, dtype=jnp.float32) -> "QPState":
        return cls(
            x=jnp.zeros((n,), dtype), z=jnp.zeros((m,), dtype), y=jnp.zeros((m,), dtype)
        )


class QPInfo(NamedTuple):
    primal_residual: jax.Array  # max |clip(Ax) - Ax|
    dual_residual: jax.Array    # max |Hx + g + A^T y|
    kkt_residual: jax.Array     # max of the two
    polished: jax.Array         # bool: polish accepted


def _rho_vec(data: QPData, params: QPSolverParams):
    eq = (data.u - data.l) <= 1e-9
    return jnp.where(eq, params.rho * params.rho_eq_scale, params.rho)


def kkt_residual(data: QPData, x, y):
    """Exact KKT residual of a primal/dual pair (solver-independent optimality

    certificate — this is the test oracle replacing an external QP library)."""
    ax = data.A @ x
    primal = jnp.max(jnp.abs(ax - jnp.clip(ax, data.l, data.u)))
    dual = jnp.max(jnp.abs(data.H @ x + data.g + data.A.T @ y))
    # complementarity: y+ only at upper bound, y- only at lower bound
    dist_u = jnp.abs(data.u - ax)
    dist_l = jnp.abs(ax - data.l)
    comp = jnp.max(
        jnp.maximum(jnp.maximum(y, 0.0) * jnp.minimum(dist_u, 1.0),
                    jnp.maximum(-y, 0.0) * jnp.minimum(dist_l, 1.0))
    )
    return primal, dual, comp


def _polish(data: QPData, state: QPState, params: QPSolverParams):
    """Active-set KKT solve from the ADMM active-set estimate.

    Unknowns (x, y); rows:  [H  A^T] [x]   [-g ]
                            [Da A  (I-Da)] [y] = [Da b]
    where Da selects active rows (b = u or l as flagged by the dual sign /
    projection), inactive rows force y_i = 0.  Fixed shape (n+m, n+m)."""
    n = data.H.shape[0]
    m = data.A.shape[0]
    dtype = data.H.dtype
    ax = data.A @ state.x
    eq = (data.u - data.l) <= 1e-9
    tol = 1e-6
    low_active = (ax - data.l <= tol) | (state.y < -tol)
    upp_active = (data.u - ax <= tol) | (state.y > tol)
    active = eq | low_active | upp_active
    b = jnp.where(upp_active & ~low_active, data.u, data.l)
    b = jnp.where(eq, data.u, b)
    da = active.astype(dtype)

    reg = params.polish_reg
    top = jnp.concatenate([data.H + reg * jnp.eye(n, dtype=dtype), data.A.T], axis=1)
    bottom = jnp.concatenate(
        [da[:, None] * data.A, jnp.diag(1.0 - da) - reg * jnp.diag(da)], axis=1
    )
    S = jnp.concatenate([top, bottom], axis=0)
    rhs = jnp.concatenate([-data.g, da * b], axis=0)
    sol = jnp.linalg.solve(S, rhs)
    return QPState(x=sol[:n], z=jnp.clip(data.A @ sol[:n], data.l, data.u), y=sol[n:])


def solve(data: QPData, warm: QPState, params: QPSolverParams = QPSolverParams()):
    """Solve one QP; returns (QPState, QPInfo).

    Feed the returned state back as `warm` on the next control cycle for the
    hotstart behavior (reference cpp:529-533)."""
    n = data.H.shape[0]
    dtype = data.H.dtype
    rho = _rho_vec(data, params)
    sigma = jnp.asarray(params.sigma, dtype)
    alpha = jnp.asarray(params.alpha, dtype)

    K = data.H + sigma * jnp.eye(n, dtype=dtype) + (data.A.T * rho) @ data.A
    # one factorization per problem; iterations are then matmul-only
    K_chol = jax.scipy.linalg.cho_factor(K)

    def body(_, st):
        x, z, y = st
        rhs = sigma * x - data.g + data.A.T @ (rho * z - y)
        x_t = jax.scipy.linalg.cho_solve(K_chol, rhs)
        z_t = data.A @ x_t
        x_n = alpha * x_t + (1.0 - alpha) * x
        z_pre = alpha * z_t + (1.0 - alpha) * z + y / rho
        z_n = jnp.clip(z_pre, data.l, data.u)
        y_n = y + rho * (alpha * z_t + (1.0 - alpha) * z - z_n)
        return (x_n, z_n, y_n)

    x, z, y = jax.lax.fori_loop(
        0, params.iterations, body, (warm.x, warm.z, warm.y)
    )
    admm = QPState(x=x, z=z, y=y)

    if params.polish:
        pol = _polish(data, admm, params)
        pr_a, du_a, co_a = kkt_residual(data, admm.x, admm.y)
        pr_p, du_p, co_p = kkt_residual(data, pol.x, pol.y)
        res_a = jnp.maximum(jnp.maximum(pr_a, du_a), co_a)
        res_p = jnp.maximum(jnp.maximum(pr_p, du_p), co_p)
        ok = jnp.isfinite(res_p) & (res_p <= res_a)
        best = jax.tree.map(lambda p, a: jnp.where(ok, p, a), pol, admm)
        pr = jnp.where(ok, pr_p, pr_a)
        du = jnp.where(ok, du_p, du_a)
        info = QPInfo(
            primal_residual=pr,
            dual_residual=du,
            kkt_residual=jnp.where(ok, res_p, res_a),
            polished=ok,
        )
        return best, info

    pr, du, co = kkt_residual(data, admm.x, admm.y)
    info = QPInfo(
        primal_residual=pr,
        dual_residual=du,
        kkt_residual=jnp.maximum(jnp.maximum(pr, du), co),
        polished=jnp.asarray(False),
    )
    return admm, info


def solve_batched(data: QPData, warm: QPState, params: QPSolverParams = QPSolverParams()):
    """vmapped solve over a leading batch axis on every leaf."""
    return jax.vmap(lambda d, w: solve(d, w, params))(data, warm)
