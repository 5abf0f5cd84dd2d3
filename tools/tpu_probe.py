#!/usr/bin/env python3
"""Measure batched wbc_step throughput on the real TPU chip."""
import sys, time
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from quadrupedwholebodycontroller_tpu.config import ControllerParams, QPSolverParams
from quadrupedwholebodycontroller_tpu.control import wbc
from quadrupedwholebodycontroller_tpu.models import anymal_d_model
from quadrupedwholebodycontroller_tpu.models.anymal import INITIAL_JOINT_POS

print("devices:", jax.devices())
dtype = jnp.float32
model = anymal_d_model(dtype=dtype)
cp = ControllerParams()
qp = QPSolverParams(iterations=int(sys.argv[2]) if len(sys.argv) > 2 else 100)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
key = jax.random.PRNGKey(0)
obs = wbc.RobotObservation(
    base_R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (B, 3, 3)),
    base_p=jnp.tile(jnp.array([0.0, 0.0, 0.55], dtype), (B, 1))
    + 0.01 * jax.random.normal(key, (B, 3), dtype),
    base_vel=0.01 * jax.random.normal(key, (B, 6), dtype),
    q=jnp.tile(jnp.asarray(INITIAL_JOINT_POS, dtype), (B, 1))
    + 0.02 * jax.random.normal(key, (B, 12), dtype),
    qd=0.02 * jax.random.normal(key, (B, 12), dtype),
)
ref = jax.tree.map(lambda x: jnp.stack([x] * B), wbc.Reference.standing(cp, dtype))
carry = jax.tree.map(lambda x: jnp.stack([x] * B), wbc.init_carry(dtype))

@jax.jit
def step(obs, ref, carry):
    out, carry = jax.vmap(
        lambda o, r, c: wbc.wbc_step(model, cp, qp, o, r, c)
    )(obs, ref, carry)
    return out, carry

t0 = time.time()
out, carry2 = step(obs, ref, carry)
jax.block_until_ready(out.tau)
print(f"B={B} compile+first: {time.time()-t0:.1f}s")
print("kkt residuals: med %.1e max %.1e" % (
    float(jnp.median(out.qp_info.kkt_residual)), float(jnp.max(out.qp_info.kkt_residual))))

# steady state
N = 10
t0 = time.time()
for _ in range(N):
    out, carry2 = step(obs, ref, carry2)
jax.block_until_ready(out.tau)
dt = (time.time() - t0) / N
print(f"steady: {dt*1e3:.2f} ms/step  -> {B/dt:,.0f} solves/s")
