#!/usr/bin/env python3
"""Section ablation timing of the fused setup kernel (stop_after probes).

Each variant compiles the kernel truncated after a named section (the
checksum write keeps the prefix alive — see setup_kernel._make_kernel);
consecutive differences are per-section costs.  The scan threads the
checksum back into an input so nothing is loop-invariant.

    python tools/profile_setup_sections.py [B]
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from quadrupedwholebodycontroller_tpu.config import ControllerParams, QPSolverParams
from quadrupedwholebodycontroller_tpu.control import wbc
from quadrupedwholebodycontroller_tpu.models import anymal_d_model
from quadrupedwholebodycontroller_tpu.models.anymal import INITIAL_JOINT_POS
from quadrupedwholebodycontroller_tpu.ops.pallas import setup_kernel

SCAN = 5
REPS = 3
SECTIONS = ["inputs", "fk", "jac", "recursion", "mass", "centroidal", "foot", "fd",
            None, "prepare"]


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    dtype = jnp.float32
    model = anymal_d_model(dtype=dtype)
    cp = ControllerParams()
    qp = QPSolverParams()

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    obs = wbc.RobotObservation(
        base_R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (B, 3, 3)),
        base_p=jnp.tile(jnp.array([0.0, 0.0, 0.55], dtype), (B, 1))
        + 0.01 * jax.random.normal(ks[0], (B, 3), dtype),
        base_vel=0.02 * jax.random.normal(ks[1], (B, 6), dtype),
        q=jnp.tile(jnp.asarray(INITIAL_JOINT_POS, dtype), (B, 1))
        + 0.02 * jax.random.normal(ks[2], (B, 12), dtype),
        qd=0.05 * jax.random.normal(ks[3], (B, 12), dtype),
    )
    ref = jax.tree.map(lambda x: jnp.stack([x] * B), wbc.Reference.standing(cp, dtype))
    carry = jax.tree.map(lambda x: jnp.stack([x] * B), wbc.init_carry(dtype))
    rn = jnp.ones((B,), bool)

    prev = 0.0
    out = {}
    for sec in SECTIONS:
        qpp = qp if sec == "prepare" else None
        sa = None if sec in (None, "prepare") else sec

        @jax.jit
        def run(o):
            def body(t, _):
                o2 = o._replace(base_p=o.base_p + t[:, None] * 1e-30)
                sk = setup_kernel.setup_batched(
                    model, cp, o2, ref, carry, rn,
                    qp_params=qpp, stop_after=sa,
                )
                return sk["com"][:, 0] * 1e-30, None
            return jax.lax.scan(body, jnp.zeros((B,), dtype), None,
                                length=SCAN)

        res = run(obs)
        jax.block_until_ready(res)
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            res = run(obs)
            jax.block_until_ready(res)
            ts.append((time.perf_counter() - t0) / SCAN)
        ts.sort()
        ms = ts[len(ts) // 2] * 1e3
        name = sec if sec is not None else "full_plain"
        print(json.dumps({"section": name, "cum_ms": round(ms, 2),
                          "marginal_ms": round(ms - prev, 2)}), flush=True)
        out[name] = round(ms - prev, 2)
        prev = ms
    print(json.dumps({"B": B, "marginal_ms": out}), flush=True)


if __name__ == "__main__":
    main()
