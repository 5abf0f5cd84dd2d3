#!/usr/bin/env python3
"""Cost breakdown of the batched control cycle on the live accelerator.

Times each block of the full WBC step (setup / ADMM kernel / NS inverses /
polish) the only honest way on this TPU stack: a lax.scan of the block inside
one jit, timed over whole scan calls (see CLAUDE.md).  Prints one JSON line
per block.  Run on the real chip:

    python tools/profile_breakdown.py [B]
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from quadrupedwholebodycontroller_tpu.config import (
    ControllerParams,
    QPSolverParams,
    QP_NUM_CONSTRAINTS,
    QP_NUM_VARS,
)
from quadrupedwholebodycontroller_tpu.control import wbc
from quadrupedwholebodycontroller_tpu.models import anymal_d_model
from quadrupedwholebodycontroller_tpu.models.anymal import INITIAL_JOINT_POS
from quadrupedwholebodycontroller_tpu.ops import qp as qpm
from quadrupedwholebodycontroller_tpu.ops.linalg import ns_inverse
from quadrupedwholebodycontroller_tpu.ops.pallas.qp_kernel import admm_iterations

SCAN = 5
REPS = 3


def timed(name, fn, *args):
    """fn must be a jitted (carry -> carry, checksum) scan wrapper."""
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / SCAN)
    times.sort()
    ms = times[len(times) // 2] * 1e3
    print(json.dumps({"block": name, "ms_per_step": round(ms, 2)}), flush=True)
    return ms


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    dtype = jnp.float32
    model = anymal_d_model(dtype=dtype)
    cp = ControllerParams()
    qp = QPSolverParams()
    backend = "pallas" if jax.default_backend() != "cpu" else "xla"

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    obs = wbc.RobotObservation(
        base_R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (B, 3, 3)),
        base_p=jnp.tile(jnp.array([0.0, 0.0, 0.55], dtype), (B, 1))
        + 0.01 * jax.random.normal(k1, (B, 3), dtype),
        base_vel=0.02 * jax.random.normal(k2, (B, 6), dtype),
        q=jnp.tile(jnp.asarray(INITIAL_JOINT_POS, dtype), (B, 1))
        + 0.02 * jax.random.normal(k3, (B, 12), dtype),
        qd=0.05 * jax.random.normal(k4, (B, 12), dtype),
    )
    ref = jax.tree.map(lambda x: jnp.stack([x] * B), wbc.Reference.standing(cp, dtype))
    carry0 = jax.tree.map(lambda x: jnp.stack([x] * B), wbc.init_carry(dtype))
    cache0 = qpm.make_cache(B, QP_NUM_VARS, QP_NUM_CONSTRAINTS, qp, dtype)

    # ---- 1. full step (the bench) ----
    @jax.jit
    def full(carry, cache):
        def body(cc, _):
            c, ca = cc
            out, c2, ca2 = wbc.wbc_step_batched(
                model, cp, qp, obs, ref, c, True, backend, ca, True
            )
            return (c2, ca2), jnp.sum(out.tau)
        (c2, ca2), s = jax.lax.scan(body, (carry, cache), None, length=SCAN)
        return c2, ca2, s

    # warm the cache/carry first with one real call
    carry1, cache1, _ = full(carry0, cache0)
    t_full = timed("full_step", full, carry1, cache1)

    # ---- 2. setup only ----
    @jax.jit
    def setup_only(carry):
        def body(c, _):
            s = jax.vmap(lambda o, r, cc: wbc.wbc_setup(model, cp, o, r, cc))(
                obs, ref, c
            )
            c2 = c._replace(
                **{k: v for k, v in s.carry_updates.items()}
            )
            return c2, jnp.sum(s.qp_data.g)
        c2, s = jax.lax.scan(body, carry, None, length=SCAN)
        return c2, s

    t_setup = timed("wbc_setup", setup_only, carry1)

    # ---- 2b. fused Pallas setup kernel (the default on the pallas path) ----
    t_setup_pl = 0.0
    if backend == "pallas":
        from quadrupedwholebodycontroller_tpu.ops.pallas import setup_kernel

        @jax.jit
        def setup_pallas_only(carry):
            def body(c, _):
                sk = setup_kernel.setup_batched(
                    model, cp, obs, ref, c, jnp.ones((B,), bool)
                )
                c2 = c._replace(**sk["carry_updates"])
                return c2, jnp.sum(sk["g"])
            c2, s = jax.lax.scan(body, carry, None, length=SCAN)
            return c2, s

        t_setup_pl = timed("wbc_setup_pallas", setup_pallas_only, carry1)

    # fixed QP data for the solver-only blocks
    setup = jax.jit(
        lambda: jax.vmap(lambda o, r, c: wbc.wbc_setup(model, cp, o, r, c))(
            obs, ref, carry1
        )
    )()
    data = jax.tree.map(lambda x: x, setup.qp_data)
    warm0 = jax.vmap(lambda c: c.qp_warm)(carry1)

    # ---- 3. qp solve, warm cache ----
    def qp_block(name, params, use_cache):
        @jax.jit
        def run(w, ca):
            def body(st, _):
                w, ca = st
                if use_cache:
                    s2, info, ca2 = qpm.solve_batched(
                        data, w, params, backend, cache=ca, use_warm=True
                    )
                else:
                    s2, info = qpm.solve_batched(data, w, params, backend)
                    ca2 = ca
                return (s2, ca2), jnp.max(info.kkt_residual)
            (w2, ca2), s = jax.lax.scan(body, (w, ca), None, length=SCAN)
            return w2, ca2, s
        w1, ca1, _ = run(warm0, cache1)
        return timed(name, run, w1, ca1)

    t_qp = qp_block("qp_solve_warm", qp, True)
    qp_np = QPSolverParams(polish=False)
    t_qp_np = qp_block("qp_solve_warm_nopolish", qp_np, True)
    t_qp_cold = qp_block("qp_solve_cold(ns30)", qp, False)

    # ---- 4. admm kernel alone ----
    n, m = QP_NUM_VARS, QP_NUM_CONSTRAINTS
    Kinv = cache1.kinv
    A = data.A
    rho = jax.vmap(lambda d: qpm._rho_vec(d, qp))(data)

    if backend == "pallas":
        @jax.jit
        def admm_only(x):
            def body(x, _):
                x2, z2, y2 = admm_iterations(
                    Kinv, A, data.g, data.l, data.u, rho, x, warm0.z, warm0.y,
                    iters=qp.iterations, sigma=qp.sigma, alpha=qp.alpha,
                )
                return x2, jnp.sum(z2)
            x2, s = jax.lax.scan(body, x, None, length=SCAN)
            return x2, s

        t_admm = timed("admm_kernel_100it", admm_only, warm0.x)
    else:
        t_admm = 0.0

    # ---- 5. NS inverses alone ----
    S70 = jnp.einsum("bij,bkj->bik", data.A, data.A) + jnp.eye(m, dtype=dtype)
    M42 = data.H + 1e-6 * jnp.eye(n, dtype=dtype)

    def ns_block(name, M, warm, iters):
        @jax.jit
        def run(X):
            def body(X, _):
                X2 = ns_inverse(M, 30, warm=X, warm_iters=iters) if warm else ns_inverse(M, iters)
                return X2, jnp.sum(X2[..., 0, 0])
            X2, s = jax.lax.scan(body, X, None, length=SCAN)
            return X2, s
        X0 = ns_inverse(M, 30)
        return timed(name, run, X0)

    t_ns70w = ns_block(f"ns70_warm{qp.ns_warm_iters}", S70, True, qp.ns_warm_iters)
    t_ns70c = ns_block("ns70_cold30", S70, False, 30)
    t_ns42w = ns_block(f"ns42_warm{qp.ns_warm_iters}", M42, True, qp.ns_warm_iters)

    # ---- 6. ruiz + K formation (prepare) ----
    @jax.jit
    def prep_only(w):
        def body(w, _):
            def prepare(d, ww):
                dd, e = qpm._ruiz_equilibrate(d, qp.scaling_iters)
                sd = qpm.QPData(
                    H=dd[:, None] * d.H * dd[None, :], g=dd * d.g,
                    A=e[:, None] * d.A * dd[None, :], l=e * d.l, u=e * d.u,
                )
                rho = qpm._rho_vec(sd, qp)
                K = sd.H + qp.sigma * jnp.eye(n, dtype=dtype) + (sd.A.T * rho) @ sd.A
                return K
            K = jax.vmap(lambda d: prepare(d, w))(data)
            return w + 0.0 * jnp.sum(K), jnp.sum(K)
        w2, s = jax.lax.scan(body, w, None, length=SCAN)
        return w2, s

    t_prep = timed("ruiz_and_K", prep_only, warm0.x)

    print(json.dumps({
        "B": B,
        "summary_ms": {
            "full": round(t_full, 2), "setup": round(t_setup, 2),
            "setup_pallas": round(t_setup_pl, 2),
            "qp_warm": round(t_qp, 2), "qp_warm_nopolish": round(t_qp_np, 2),
            "qp_cold": round(t_qp_cold, 2),
            "admm": round(t_admm, 2), "ns70_warm": round(t_ns70w, 2),
            "ns70_cold": round(t_ns70c, 2), "ns42_warm": round(t_ns42w, 2),
            "prepare": round(t_prep, 2),
            "polish_est": round(t_qp - t_qp_np, 2),
            "unaccounted_full_minus_setup_qp": round(t_full - t_setup - t_qp, 2),
        },
    }), flush=True)


if __name__ == "__main__":
    main()
