#!/usr/bin/env python3
"""Headline benchmark: WBC QP solves/s on the local accelerator.

Measures the FULL control cycle (state update, centroidal dynamics, 42x70 QP
with warm start, torque map — everything the reference does per 400 Hz cycle
at src/whole_body_controller.cpp:650-652) over a scenario batch with the
Pallas QP backend, timed as a lax.scan of control steps inside one jit (the
sweep execution pattern; also the only dispatch-artifact-free measurement on
this TPU stack).  SCAN=50 amortizes the fixed ~28 ms per-dispatch cost of
the axon remote-execution stack below 2% (see CLAUDE.md).  Prints ONE JSON
line.

vs_baseline is against the reference's engineered real-time rate: 400 WBC
QP solves/s on a desktop CPU (config/params_controller.yaml:3 — it publishes
no other perf numbers, BASELINE.md).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quadrupedwholebodycontroller_tpu.config import ControllerParams, QPSolverParams
from quadrupedwholebodycontroller_tpu.control import wbc
from quadrupedwholebodycontroller_tpu.models import anymal_d_model
from quadrupedwholebodycontroller_tpu.models.anymal import INITIAL_JOINT_POS


def main():
    batch = int(os.environ.get("QWBC_BENCH_BATCH", "8192"))
    scan_len = int(os.environ.get("QWBC_BENCH_SCAN", "50"))
    reps = int(os.environ.get("QWBC_BENCH_REPS", "3"))
    backend = os.environ.get("QWBC_BENCH_QP_BACKEND", "pallas")
    if jax.default_backend() == "cpu":
        backend = "xla"  # pallas compiles for TPU only
    dtype = jnp.float32

    model = anymal_d_model(dtype=dtype)
    cp = ControllerParams()
    qp = QPSolverParams()

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    obs = wbc.RobotObservation(
        base_R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (batch, 3, 3)),
        base_p=jnp.tile(jnp.array([0.0, 0.0, 0.55], dtype), (batch, 1))
        + 0.01 * jax.random.normal(k1, (batch, 3), dtype),
        base_vel=0.02 * jax.random.normal(k2, (batch, 6), dtype),
        q=jnp.tile(jnp.asarray(INITIAL_JOINT_POS, dtype), (batch, 1))
        + 0.02 * jax.random.normal(k3, (batch, 12), dtype),
        qd=0.05 * jax.random.normal(k4, (batch, 12), dtype),
    )
    ref = jax.tree.map(lambda x: jnp.stack([x] * batch), wbc.Reference.standing(cp, dtype))
    carry = jax.tree.map(lambda x: jnp.stack([x] * batch), wbc.init_carry(dtype))

    from quadrupedwholebodycontroller_tpu.ops import qp as qpm

    cache = qpm.QPCache.zeros(batch, 42, 70, dtype) if backend == "pallas" else None

    @jax.jit
    def multi_step(carry, cache, valid):
        def body(cc, _):
            c, cache = cc
            if cache is not None:
                out, c2, cache2 = wbc.wbc_step_batched(
                    model, cp, qp, obs, ref, c, True, backend, cache, valid
                )
            else:
                out, c2 = wbc.wbc_step_batched(model, cp, qp, obs, ref, c, True, backend)
                cache2 = None
            return (c2, cache2), (jnp.sum(out.tau), jnp.max(out.qp_info.kkt_residual))
        (c2, cache), (ts, kk) = jax.lax.scan(body, (carry, cache), None, length=scan_len)
        return c2, cache, ts, kk

    carry, cache, ts, kk = multi_step(carry, cache, False)
    jax.block_until_ready(ts)

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        carry, cache, ts, kk = multi_step(carry, cache, True)
        jax.block_until_ready(ts)
        times.append((time.perf_counter() - t0) / scan_len)
    times.sort()
    median = times[len(times) // 2]
    solves_per_s = batch / median

    print(
        json.dumps(
            {
                "metric": "wbc_qp_solves_per_s",
                "value": round(solves_per_s, 1),
                "unit": "solves/s/chip",
                "vs_baseline": round(solves_per_s / 400.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
