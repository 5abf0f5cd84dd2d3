#!/usr/bin/env python3
"""Bisect the B=16384 TPU device error by component (VERDICT r3 #4).

Round 3 recorded "TPU device error at execution" for the flagship bench at
B=16384 with no artifact.  This probe runs each stage of the production
step in isolation at a chosen batch size, catching and reporting the first
failure, so the failing component (or the absence of one) is named:

    timeout 7200 python tools/bisect_16k.py [B]          # default 16384

Stages: setup kernel (fused prepare, batch-minor) -> K build + warm-NS
K^-1 -> ADMM zy kernel -> polish kernel -> full wbc_step_batched.
Each stage jits, runs once, and block_until_ready()s; errors print the
stage name + the exception repr and continue to the next stage where
possible (independent inputs).
"""
import json
import os
import sys
import traceback

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


def stage(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(json.dumps({"stage": name, "ok": True}), flush=True)
        return out
    except Exception as e:  # noqa: BLE001 — this is a bisect probe
        print(json.dumps({"stage": name, "ok": False,
                          "error": repr(e)[:500]}), flush=True)
        traceback.print_exc()
        return None


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    dtype = jnp.float32
    model = anymal_d_model(dtype=dtype)
    cp = ControllerParams()
    qp = QPSolverParams()
    n, m = QP_NUM_VARS, QP_NUM_CONSTRAINTS
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
    ref = jax.tree.map(
        lambda x: jnp.stack([x] * B), wbc.Reference.standing(cp, dtype)
    )
    carry = jax.tree.map(lambda x: jnp.stack([x] * B), wbc.init_carry(dtype))

    # stage 1: fused setup kernel (batch-minor prepared outputs)
    import quadrupedwholebodycontroller_tpu.ops.pallas.setup_kernel as sku

    sk = stage("setup_kernel", lambda: sku.setup_batched(
        model, cp, obs, ref, carry, jnp.ones((B,), bool),
        qp_params=qp, prepared_layout="minor",
    ))
    if sk is None:
        return

    prepared = sk["prepared"]
    sH, sA, sg, sl, su, rho = prepared[:6]
    wxs, wzs, wys, dscale, escale = prepared[6:]

    # stage 2: batch-minor K build + cold NS inverse.  NOTE: pass the big
    # arrays as ARGUMENTS — a jitted closure would embed them as HLO
    # constants and the ~200 MB request body trips the remote compile
    # service's HTTP 413 length limit at this batch size
    from quadrupedwholebodycontroller_tpu.ops.linalg import (
        ns_inverse_bm,
    )

    @jax.jit
    def k_chain(sH, sA, rho):
        K = sH + jnp.einsum("mnB,mB,mkB->nkB", sA, rho, sA)
        return ns_inverse_bm(K, qp.ns_iters)

    Kinv = stage("k_chain_bm", lambda: k_chain(sH, sA, rho))
    if Kinv is None:
        return

    # (the ADMM/polish kernels are exercised inside stage 4/5 with the
    # production call conventions)

    # stage 4: polish kernel via one full solve_batched (prepared path)
    cache = qpm.make_cache(B, n, m, qp, dtype)
    data = qpm.QPData(H=sk["H"], g=sk["g"], A=sk["A"], l=sk["l"], u=sk["u"])
    warm = qpm.QPState(x=carry.qp_warm.x, z=carry.qp_warm.z,
                      y=carry.qp_warm.y)

    @jax.jit
    def run_solve(data, warm, cache, prepared, tiles):
        return qpm.solve_batched(
            data, warm, qp, "pallas", cache=cache, use_warm=False,
            hinv_fn=wbc._wbc_polish_hinv, prepared=prepared,
            prepared_layout="minor", prepared_tiles=tiles,
        )

    stage("solve_batched_prepared", lambda: run_solve(
        data, warm, cache, prepared, sk.get("tiles_minor")
    ))

    # stage 5: the full step
    cache2 = qpm.make_cache(B, n, m, qp, dtype)

    @jax.jit
    def run_step(obs, ref, carry, cache):
        return wbc.wbc_step_batched(
            model, cp, qp, obs, ref, carry, True, "pallas", cache, False,
        )

    stage("wbc_step_batched", lambda: run_step(obs, ref, carry, cache2))


if __name__ == "__main__":
    main()
