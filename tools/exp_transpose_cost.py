#!/usr/bin/env python3
"""Marginal cost of the batch-major<->batch-minor boundary transposes.

The fused setup kernel WRITES its `prepared` outputs batch-minor, then
_setup_call transposes them batch-major (`back`), and the ADMM/polish
kernels transpose them batch-minor again (`to_tile`).  Every batch-major
(B, 42, 42)/(B, 70, 42) f32 array also pads 42 lanes to 128 (~3x HBM
bytes), so the round trip costs ~4x the ideal traffic per tensor.  This
measures that round trip in isolation, scan-timed (SCAN=50):

  a) pass-through sums of the tensors (baseline: one padded read each)
  b) + one transpose each way per tensor (the current boundary cost)

    python tools/exp_transpose_cost.py [B]
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SCAN = 50
REPS = 3
N, M = 42, 70


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
    print(json.dumps({"variant": name,
                      "ms": round(ts[len(ts) // 2] * 1e3, 3)}), flush=True)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    rng = np.random.default_rng(0)
    # the tensors the solve path shuttles across the boundary each step:
    # Kinv (B,n,n), A (B,m,n), plus the polish-side Sinv (B,m,m)
    kinv = jnp.asarray(rng.normal(size=(B, N, N)), jnp.float32)
    A = jnp.asarray(rng.normal(size=(B, M, N)), jnp.float32)
    sinv = jnp.asarray(rng.normal(size=(B, M, M)), jnp.float32)

    def scanify(f):
        @jax.jit
        def run(*args):
            def body(c, _):
                a = [x + c * 1e-30 for x in args]
                return f(*a), None
            return jax.lax.scan(body, jnp.zeros(()), None, length=SCAN)
        return run

    def passthrough(kinv, A, sinv):
        return sum(jnp.sum(x) for x in (kinv, A, sinv))

    def round_trip(kinv, A, sinv):
        # batch-major -> batch-minor (to_tile) -> reduce -> and back once
        s = jnp.zeros(())
        for x in (kinv, A, sinv):
            t = jnp.transpose(x, (1, 2, 0))
            s = s + jnp.sum(t * 2.0)
            s = s + jnp.sum(jnp.transpose(t, (2, 0, 1)))
        return s

    def one_way(kinv, A, sinv):
        s = jnp.zeros(())
        for x in (kinv, A, sinv):
            s = s + jnp.sum(jnp.transpose(x, (1, 2, 0)) * 2.0)
        return s

    timed("passthrough_reads", scanify(passthrough), kinv, A, sinv)
    timed("transpose_one_way", scanify(one_way), kinv, A, sinv)
    timed("transpose_round_trip", scanify(round_trip), kinv, A, sinv)
    print(json.dumps({"B": B, "tensors": "Kinv(B,42,42)+A(B,70,42)+Sinv(B,70,70)"}),
          flush=True)


if __name__ == "__main__":
    main()
