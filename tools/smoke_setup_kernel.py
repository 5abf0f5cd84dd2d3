#!/usr/bin/env python3
"""TPU compile + correctness smoke for the fused setup kernel.

Small batch to keep the remote compile fast; compares the kernel against
the vmapped XLA wbc_setup ON CHIP (f32), then scan-times both at the bench
batch if requested:  python tools/smoke_setup_kernel.py [B_bench]
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from quadrupedwholebodycontroller_tpu.config import ControllerParams
from quadrupedwholebodycontroller_tpu.control import wbc
from quadrupedwholebodycontroller_tpu.models import anymal_d_model
from quadrupedwholebodycontroller_tpu.models.anymal import INITIAL_JOINT_POS
from quadrupedwholebodycontroller_tpu.ops.pallas import setup_kernel

SCAN = 5
REPS = 3


def make_inputs(B, dtype):
    cp = ControllerParams()
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
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
    ref = ref._replace(contacts=ref.contacts.at[B // 2 :, 1].set(0.0))
    carry = jax.tree.map(lambda x: jnp.stack([x] * B), wbc.init_carry(dtype))
    return cp, obs, ref, carry


def main():
    dtype = jnp.float32
    model = anymal_d_model(dtype=dtype)
    cp, obs, ref, carry = make_inputs(256, dtype)
    B = obs.q.shape[0]
    rn = jnp.ones((B,), bool)

    t0 = time.time()
    out_k = jax.jit(
        lambda o, r, c: setup_kernel.setup_batched(model, cp, o, r, c, rn)
    )(obs, ref, carry)
    jax.block_until_ready(out_k["A"])
    print(json.dumps({"kernel_compile_s": round(time.time() - t0, 1)}), flush=True)

    setup_x = jax.jit(
        lambda o, r, c: jax.vmap(
            lambda oo, rr, cc, nn: wbc.wbc_setup(model, cp, oo, rr, cc, nn)
        )(o, r, c, rn)
    )(obs, ref, carry)
    jax.block_until_ready(setup_x.qp_data.A)

    def err(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return float(np.abs(a - b).max() / max(1.0, np.abs(b).max()))

    checks = {
        "A": err(out_k["A"], setup_x.qp_data.A),
        "g": err(out_k["g"], setup_x.qp_data.g),
        "l": err(out_k["l"], setup_x.qp_data.l),
        "u": err(out_k["u"], setup_x.qp_data.u),
        "H": err(out_k["H"], setup_x.qp_data.H),
        "h_c": err(out_k["h_c"], setup_x.h_c),
        "old_T": err(out_k["carry_updates"]["old_T"],
                     setup_x.carry_updates["old_T"]),
        "tdot_inv": err(out_k["carry_updates"]["tdot_inv"],
                        setup_x.carry_updates["tdot_inv"]),
    }
    print(json.dumps({"rel_err_vs_xla_onchip": checks}), flush=True)
    assert max(checks.values()) < 2e-4, checks

    if len(sys.argv) > 1:
        Bb = int(sys.argv[1])
        cp, obs, ref, carry = make_inputs(Bb, dtype)
        rnb = jnp.ones((Bb,), bool)

        def scanify(fn):
            @jax.jit
            def run(c):
                def body(c, _):
                    out = fn(obs, ref, c)
                    cu = out["carry_updates"] if isinstance(out, dict) else out.carry_updates
                    c2 = c._replace(**cu)
                    s = jnp.sum(out["g"] if isinstance(out, dict) else out.qp_data.g)
                    return c2, s
                c2, s = jax.lax.scan(body, c, None, length=SCAN)
                return c2, s
            return run

        for name, fn in [
            ("setup_pallas", lambda o, r, c: setup_kernel.setup_batched(
                model, cp, o, r, c, rnb)),
            ("setup_xla", lambda o, r, c: jax.vmap(
                lambda oo, rr, cc, nn: wbc.wbc_setup(model, cp, oo, rr, cc, nn)
            )(o, r, c, rnb)),
        ]:
            run = scanify(fn)
            out = run(carry)
            jax.block_until_ready(out[1])
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                out = run(carry)
                jax.block_until_ready(out[1])
                ts.append((time.perf_counter() - t0) / SCAN)
            ts.sort()
            print(json.dumps({"block": name, "B": Bb,
                              "ms_per_step": round(ts[len(ts) // 2] * 1e3, 2)}),
                  flush=True)


if __name__ == "__main__":
    main()
