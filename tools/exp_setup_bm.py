#!/usr/bin/env python3
"""Experiment: wbc_setup under batch-MINOR vmap (in_axes=-1) vs batch-major.

TPU arrays tile the last two dims to (8,128); batch-major small-matrix
intermediates like (B,13,6,18) pad ~9.5x, while batch-minor (13,6,18,B)
pads ~1.3x.  vmap over axis -1 turns the whole setup graph batch-minor.

    python tools/exp_setup_bm.py [B]
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from quadrupedwholebodycontroller_tpu.config import ControllerParams
from quadrupedwholebodycontroller_tpu.control import wbc
from quadrupedwholebodycontroller_tpu.models import anymal_d_model
from quadrupedwholebodycontroller_tpu.models.anymal import INITIAL_JOINT_POS

SCAN = 5
REPS = 3


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
    print(json.dumps({"variant": name, "ms": round(ms, 2)}), flush=True)
    return out, ms


def to_minor(tree):
    return jax.tree.map(lambda x: jnp.moveaxis(x, 0, -1), tree)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    dtype = jnp.float32
    model = anymal_d_model(dtype=dtype)
    cp = ControllerParams()
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
    carry = jax.tree.map(lambda x: jnp.stack([x] * B), wbc.init_carry(dtype))

    # ---- batch-major (current) ----
    @jax.jit
    def major(c):
        def body(c, _):
            s = jax.vmap(lambda o, r, cc: wbc.wbc_setup(model, cp, o, r, cc))(
                obs, ref, c
            )
            c2 = c._replace(**s.carry_updates)
            return c2, jnp.sum(s.qp_data.g)
        c2, s = jax.lax.scan(body, c, None, length=SCAN)
        return c2, s

    (out_major, _), t_major = timed("batch_major", major, carry)

    # ---- batch-minor: vmap over axis -1; carry stays minor across the scan,
    # transposes only at entry (obs/ref once) ----
    obs_m = to_minor(obs)
    ref_m = to_minor(ref)
    carry_m = to_minor(carry)

    @jax.jit
    def minor(c):
        def body(c, _):
            s = jax.vmap(
                lambda o, r, cc: wbc.wbc_setup(model, cp, o, r, cc),
                in_axes=-1, out_axes=-1,
            )(obs_m, ref_m, c)
            c2 = c._replace(**s.carry_updates)
            return c2, jnp.sum(s.qp_data.g)
        c2, s = jax.lax.scan(body, c, None, length=SCAN)
        return c2, s

    (out_minor, _), t_minor = timed("batch_minor", minor, carry_m)

    # ---- batch-minor INCLUDING boundary transposes to batch-major QPData
    # (what the solver interface currently needs) ----
    @jax.jit
    def minor_xposed(c):
        def body(c, _):
            s = jax.vmap(
                lambda o, r, cc: wbc.wbc_setup(model, cp, o, r, cc),
                in_axes=-1, out_axes=-1,
            )(obs_m, ref_m, c)
            c2 = c._replace(**s.carry_updates)
            qpd = jax.tree.map(lambda x: jnp.moveaxis(x, -1, 0), s.qp_data)
            return c2, jnp.sum(qpd.g[:, :1])
        c2, s = jax.lax.scan(body, c, None, length=SCAN)
        return c2, s

    _, t_xp = timed("batch_minor_+qpdata_transpose", minor_xposed, carry_m)

    # numerical agreement
    import numpy as np
    a = np.asarray(major(carry)[0].old_T)
    b = np.asarray(jnp.moveaxis(minor(carry_m)[0].old_T, -1, 0))
    print(json.dumps({
        "B": B,
        "speedup": round(t_major / t_minor, 2),
        "speedup_with_transpose": round(t_major / t_xp, 2),
        "max_disagreement_old_T": float(np.max(np.abs(a - b))),
    }), flush=True)


if __name__ == "__main__":
    main()
