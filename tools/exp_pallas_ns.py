#!/usr/bin/env python3
"""Batch-minor Pallas warm-NS kernel vs the XLA path, on WBC-like matrices.

Times both the 42x42 K-inverse update (the hot QPCache refresh) and the
70x70 Schur-like case.

    python tools/exp_pallas_ns.py [B]
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
from quadrupedwholebodycontroller_tpu.ops.pallas.ns_kernel import (
    ns_inverse_warm_pallas,
)

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


def scanify(f):
    @jax.jit
    def run(x):
        def body(x, _):
            X = f(x)
            return x, jnp.sum(X[:, 0, 0])
        return jax.lax.scan(body, x, None, length=SCAN)
    return run


def case(name, n, B, rng, dtype=jnp.float32):
    M = rng.normal(size=(B, n, 42)).astype(np.float32)
    A = jnp.asarray(M @ np.swapaxes(M, 1, 2) + 0.5 * np.eye(n, dtype=np.float32))
    warm0 = ns_inverse(A, 30)
    A2 = A * (1.0 + 0.001 * jnp.asarray(rng.normal(size=(B, 1, 1)), dtype))

    timed(f"{name}_xla_warm2",
          scanify(lambda _: ns_inverse(A2, 30, warm=warm0, warm_iters=2)),
          jnp.zeros(()))
    timed(f"{name}_pallas_warm2",
          scanify(lambda _: ns_inverse_warm_pallas(A2, warm0, warm_iters=2)),
          jnp.zeros(()))

    Xp = ns_inverse_warm_pallas(A2, warm0, warm_iters=2)
    Xx = ns_inverse(A2, 30, warm=warm0, warm_iters=2)
    print(json.dumps({
        "case": name, "B": B,
        "warm_maxdiff": float(jnp.max(jnp.abs(Xp - Xx))),
        "warm_residual_pallas": float(jnp.max(jnp.abs(
            jnp.einsum("bij,bjk->bik", A2, Xp) - jnp.eye(n, dtype=dtype)))),
    }), flush=True)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rng = np.random.default_rng(0)
    case("k42", 42, B, rng)   # the QPCache K-inverse update
    case("s70", 70, B, rng)   # polish-Schur-like
    print(json.dumps({"note": "cold-30 stays in XLA by design"}), flush=True)


if __name__ == "__main__":
    main()
