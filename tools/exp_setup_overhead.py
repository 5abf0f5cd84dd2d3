#!/usr/bin/env python3
"""Per-grid-step overhead probe for the fused setup kernel.

The inputs-only truncated kernel (stop_after="inputs") does no math, so
its time is pure launch + per-tile DMA/semaphore overhead.  Sweeping the
lane-tile width changes ONLY the grid-step count; if time scales with
grid steps, the kernel is per-step-overhead-bound (47 in/out buffers per
step) and buffer packing is the fix.

    python tools/exp_setup_overhead.py [B]
"""
import importlib
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


SCAN = int(os.environ.get("OVH_SCAN", "5"))


def run_case(B, tile):
    os.environ["QWBC_SETUP_LANE_TILE"] = str(tile)
    import quadrupedwholebodycontroller_tpu.ops.pallas.setup_kernel as sk_mod
    importlib.reload(sk_mod)

    from quadrupedwholebodycontroller_tpu.config import ControllerParams
    from quadrupedwholebodycontroller_tpu.control import wbc
    from quadrupedwholebodycontroller_tpu.models import anymal_d_model
    from quadrupedwholebodycontroller_tpu.models.anymal import INITIAL_JOINT_POS

    dtype = jnp.float32
    model = anymal_d_model(dtype=dtype)
    cp = ControllerParams()
    key = jax.random.PRNGKey(0)
    obs = wbc.RobotObservation(
        base_R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (B, 3, 3)),
        base_p=jnp.tile(jnp.array([0.0, 0.0, 0.55], dtype), (B, 1)),
        base_vel=jnp.zeros((B, 6), dtype),
        q=jnp.tile(jnp.asarray(INITIAL_JOINT_POS, dtype), (B, 1))
        + 0.02 * jax.random.normal(key, (B, 12), dtype),
        qd=jnp.zeros((B, 12), dtype),
    )
    ref = jax.tree.map(lambda x: jnp.stack([x] * B),
                       wbc.Reference.standing(cp, dtype))
    carry = jax.tree.map(lambda x: jnp.stack([x] * B), wbc.init_carry(dtype))
    rn = jnp.ones((B,), bool)

    for sec in ["inputs", None]:
        @jax.jit
        def run(o):
            def body(t, _):
                o2 = o._replace(base_p=o.base_p + t[:, None] * 1e-30)
                sk = sk_mod.setup_batched(model, cp, o2, ref, carry, rn,
                                          stop_after=sec)
                return sk["com"][:, 0] * 1e-30, None
            return jax.lax.scan(body, jnp.zeros((B,), dtype), None, length=SCAN)

        res = run(obs)
        jax.block_until_ready(res)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = run(obs)
            jax.block_until_ready(res)
            ts.append((time.perf_counter() - t0) / SCAN)
        ts.sort()
        print(json.dumps({
            "tile": tile, "grid": B // tile,
            "section": sec or "full",
            "ms": round(ts[len(ts) // 2] * 1e3, 2),
        }), flush=True)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    for tile in (128,):
        run_case(B, tile)


if __name__ == "__main__":
    main()
