#!/usr/bin/env python3
"""Pallas NS-inverse kernel vs the XLA path, on WBC-like Schur matrices.

    python tools/exp_pallas_ns.py [B] [tile]
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from quadrupedwholebodycontroller_tpu.ops.linalg import ns_inverse
from quadrupedwholebodycontroller_tpu.ops.pallas.ns_kernel import ns_inverse_pallas

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
    print(json.dumps({"variant": name, "ms": round(ts[len(ts) // 2] * 1e3, 2)}),
          flush=True)
    return out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    # WBC-polish-like S: A A^T + small diag, n=70
    n = 70
    M = rng.normal(size=(B, n, 42)).astype(np.float32)
    A = jnp.asarray(M @ np.swapaxes(M, 1, 2) + 0.5 * np.eye(n, dtype=np.float32))
    warm0 = ns_inverse(A, 30)
    A2 = A * (1.0 + 0.001 * jnp.asarray(rng.normal(size=(B, 1, 1)), dtype))

    def scanify(f):
        @jax.jit
        def run(x):
            def body(x, _):
                X = f(x)
                return x, jnp.sum(X[:, 0, 0])
            return jax.lax.scan(body, x, None, length=SCAN)
        return run

    timed("xla_warm2", scanify(lambda _: ns_inverse(A2, 30, warm=warm0, warm_iters=2)), jnp.zeros(()))
    o = timed(f"pallas_warm2_t{tile}", scanify(lambda _: ns_inverse_pallas(A2, warm=warm0, warm_iters=2, tile=tile)), jnp.zeros(()))
    timed("xla_cold30", scanify(lambda _: ns_inverse(A2, 30)), jnp.zeros(()))
    timed(f"pallas_cold30_t{tile}", scanify(lambda _: ns_inverse_pallas(A2, iters=30, tile=tile)), jnp.zeros(()))

    Xp = ns_inverse_pallas(A2, warm=warm0, warm_iters=2, tile=tile)
    Xx = ns_inverse(A2, 30, warm=warm0, warm_iters=2)
    print(json.dumps({
        "B": B,
        "warm_maxdiff": float(jnp.max(jnp.abs(Xp - Xx))),
        "warm_residual_pallas": float(jnp.max(jnp.abs(
            jnp.einsum("bij,bjk->bik", A2, Xp) - jnp.eye(n, dtype=dtype)))),
    }), flush=True)


if __name__ == "__main__":
    main()
