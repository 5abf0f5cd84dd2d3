#!/usr/bin/env python3
"""Stage split of the DEFAULT fused path: setup+prepare / QP solve / finish.

Times scans of progressively larger prefixes of wbc_step_batched's pallas
path, so differences are true marginal stage costs inside one compiled
program (same carry threading as the bench):

    python tools/profile_stages.py [B]
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
from quadrupedwholebodycontroller_tpu.ops.pallas import setup_kernel

SCAN = 5
REPS = 3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    dtype = jnp.float32
    model = anymal_d_model(dtype=dtype)
    cp = ControllerParams()
    qp = QPSolverParams()

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
    rn = jnp.ones((B,), bool)

    def timed(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            ts.append((time.perf_counter() - t0) / SCAN)
        ts.sort()
        ms = ts[len(ts) // 2] * 1e3
        print(json.dumps({"stage": name, "ms_per_step": round(ms, 2)}),
              flush=True)
        return ms

    # stage A: fused setup+prepare kernel only (carry threaded)
    @jax.jit
    def setup_only(carry):
        def body(c, _):
            sk = setup_kernel.setup_batched(model, cp, obs, ref, c, rn,
                                            qp_params=qp,
                                            prepared_layout=qp.solve_layout)
            return c._replace(**sk["carry_updates"]), jnp.sum(sk["g"])
        return jax.lax.scan(body, carry, None, length=SCAN)

    # sub-stages of the solve: K build + warm-NS K^-1, then + P/Kg
    def k_chain(c, ca, with_p):
        sk = setup_kernel.setup_batched(model, cp, obs, ref, c, rn,
                                        qp_params=qp,
                                        prepared_layout=qp.solve_layout)
        sH, sA, sg = sk["prepared"][0], sk["prepared"][1], sk["prepared"][2]
        rho = sk["prepared"][5]
        if qp.solve_layout == "minor":
            from quadrupedwholebodycontroller_tpu.ops.linalg import (
                _bm_eye,
                ns_inverse_warm_shared_bm,
            )

            K = (sH + qp.sigma * _bm_eye(sH.shape[0], sH.dtype)
                 + jnp.einsum("mnB,mB,mkB->nkB", sA, rho, sA))
            Kinv = ns_inverse_warm_shared_bm(K, ca.kinv, qp.ns_warm_iters)
            s = jnp.sum(jnp.abs(Kinv))
            if with_p:
                P = jnp.einsum("mnB,nkB,jkB->mjB", sA, Kinv, sA)
                Kg = jnp.einsum("ijB,jB->iB", Kinv, sg)
                s = s + jnp.sum(jnp.abs(P)) + jnp.sum(jnp.abs(Kg))
            return c._replace(**sk["carry_updates"]), s
        K = (sH + qp.sigma * jnp.eye(sH.shape[-1], dtype=sH.dtype)
             + jnp.einsum("bmn,bm,bmk->bnk", sA, rho, sA))
        from quadrupedwholebodycontroller_tpu.ops.linalg import (
            ns_inverse_warm_shared,
        )
        Kinv = ns_inverse_warm_shared(K, ca.kinv, qp.ns_warm_iters)
        s = jnp.sum(jnp.abs(Kinv))
        if with_p:
            P = sA @ (Kinv @ jnp.swapaxes(sA, -1, -2))
            Kg = jnp.einsum("bij,bj->bi", Kinv, sg)
            s = s + jnp.sum(jnp.abs(P)) + jnp.sum(jnp.abs(Kg))
        return c._replace(**sk["carry_updates"]), s

    @jax.jit
    def setup_k(carry, cache):
        def body(c, _):
            return k_chain(c, cache, False)
        return jax.lax.scan(body, carry, None, length=SCAN)

    @jax.jit
    def setup_k_p(carry, cache):
        def body(c, _):
            return k_chain(c, cache, True)
        return jax.lax.scan(body, carry, None, length=SCAN)

    # stage B: + the batch QP solve (cache threaded, no finish step)
    @jax.jit
    def setup_solve(carry, cache):
        def body(cc, _):
            c, ca = cc
            sk = setup_kernel.setup_batched(model, cp, obs, ref, c, rn,
                                            qp_params=qp,
                                            prepared_layout=qp.solve_layout)
            setup = wbc.WBCSetup(
                qp_data=qpm.QPData(H=sk["H"], g=sk["g"], A=sk["A"],
                                   l=sk["l"], u=sk["u"]),
                h_c=sk["h_c"], Mc_jj=sk["Mc_jj"], Jc_st_j=sk["Jc_st_j"],
                com=sk["com"], current_pose=sk["current_pose"],
                foot_pos=sk["foot_pos"], carry_updates=sk["carry_updates"],
            )
            switch = setup.carry_updates["switch_flag"]
            warm = jax.vmap(wbc._switch_masked_warm)(c, switch)
            st, info, ca2 = qpm.solve_batched(
                setup.qp_data, warm, qp, "pallas", cache=ca,
                use_warm=jnp.asarray(True) & ~jnp.any(switch),
                hinv_fn=wbc._wbc_polish_hinv, prepared=sk["prepared"],
                prepared_layout=qp.solve_layout,
            )
            c2 = c._replace(**setup.carry_updates)
            c2 = c2._replace(qp_warm=st)
            return (c2, ca2), jnp.max(info.kkt_residual)
        return jax.lax.scan(body, (carry, cache), None, length=SCAN)

    # stage C: the full step (finish + carry plumbing included)
    @jax.jit
    def full(carry, cache):
        def body(cc, _):
            c, ca = cc
            out, c2, ca2 = wbc.wbc_step_batched(
                model, cp, qp, obs, ref, c, True, "pallas", ca, True
            )
            return (c2, ca2), jnp.sum(out.tau)
        return jax.lax.scan(body, (carry, cache), None, length=SCAN)

    (c1, ca1), _ = setup_solve(carry0, cache0)
    t_a = timed("setup_prepare", setup_only, c1)
    t_k = timed("setup_k", setup_k, c1, ca1)
    t_kp = timed("setup_k_p", setup_k_p, c1, ca1)
    t_b = timed("setup_solve", setup_solve, c1, ca1)
    t_c = timed("full_step", full, c1, ca1)
    print(json.dumps({
        "B": B,
        "split_ms": {
            "setup_prepare": round(t_a, 2),
            "k_build_plus_ns": round(t_k - t_a, 2),
            "p_kg": round(t_kp - t_k, 2),
            "admm_epi_polish_rest": round(t_b - t_kp, 2),
            "qp_solve": round(t_b - t_a, 2),
            "finish_plus_glue": round(t_c - t_b, 2),
        },
    }), flush=True)


if __name__ == "__main__":
    main()
