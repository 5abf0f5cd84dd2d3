#!/usr/bin/env python3
"""Subtractive profile of the DEFAULT fused control cycle on the live chip.

profile_breakdown.py times blocks standalone (each paying its own dispatch
and missing cross-block overlap); this tool instead times the FULL default
step under config deltas, so each delta is the true marginal cost of a
stage inside the compiled program:

    python tools/profile_deltas.py [B]
"""
import dataclasses
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

SCAN = 5
REPS = 3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    dtype = jnp.float32
    model = anymal_d_model(dtype=dtype)
    cp = ControllerParams()
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
    cache0 = qpm.make_cache(
        B, QP_NUM_VARS, QP_NUM_CONSTRAINTS, QPSolverParams(), dtype
    )

    def step_fn(qp):
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
        return full

    def timed(name, qp):
        fn = step_fn(qp)
        carry1, cache1, _ = fn(carry0, cache0)  # warm carry/cache + compile
        out = fn(carry1, cache1)
        jax.block_until_ready(out)
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn(carry1, cache1)
            jax.block_until_ready(out)
            ts.append((time.perf_counter() - t0) / SCAN)
        ts.sort()
        ms = ts[len(ts) // 2] * 1e3
        print(json.dumps({"config": name, "ms_per_step": round(ms, 2)}),
              flush=True)
        return ms

    base = QPSolverParams()
    t0 = timed("default", base)
    deltas = {
        "no_ns_warm": dataclasses.replace(base, ns_warm_iters=0),
        "no_polish": dataclasses.replace(base, polish=False),
        "polish_rounds_1": dataclasses.replace(base, polish_rounds=1),
        "polish_refine_0": dataclasses.replace(base, polish_refine=0),
        "admm_30": dataclasses.replace(base, iterations=30),
        "ruiz_2": dataclasses.replace(base, scaling_iters=2),
        "cold_boost_off": dataclasses.replace(
            base, cold_iterations=base.iterations
        ),
        # round-4 machinery
        "no_rescue": dataclasses.replace(base, rescue_threshold=0.0),
        "no_rescue_rounds1": dataclasses.replace(
            base, rescue_threshold=0.0, polish_rounds=1
        ),
        "drop_full_batch": dataclasses.replace(base, drop_batch=0),
    }
    out = {"B": B, "default_ms": round(t0, 2), "marginal_ms": {}}
    for name, qp in deltas.items():
        t = timed(name, qp)
        out["marginal_ms"][name] = round(t0 - t, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
