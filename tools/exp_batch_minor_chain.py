#!/usr/bin/env python3
"""Honest layout test: the K-chain (K build + warm-NS + P/Kg) batch-FIRST
vs batch-LAST, scanned at SCAN=50 with loop-carried dependencies.

Batch-first (B, n, n) f32 arrays pad 42 lanes to 128 (3.4x HBM bytes);
batch-last (n, n, B) pads only sublanes 42->48.  If XLA's dot_general
runs trailing-batch contractions without relayout, the solve chain can
stay batch-minor end-to-end from the fused setup kernel.

    python tools/exp_batch_minor_chain.py [B]
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from quadrupedwholebodycontroller_tpu.ops.linalg import full_precision

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


@full_precision
def chain_first(sA, sH, rho, warm):
    K = sH + jnp.einsum("bmn,bm,bmk->bnk", sA, rho, sA)
    eye = jnp.eye(N, dtype=K.dtype)
    M_ = K @ warm
    T = 2.0 * eye - M_
    X = warm @ T
    X = X @ (2.0 * eye - K @ X)
    P = sA @ (X @ jnp.swapaxes(sA, -1, -2))
    return X, P


@full_precision
def chain_last(sA_t, sH_t, rho_t, warm_t):
    K = sH_t + jnp.einsum("mnB,mB,mkB->nkB", sA_t, rho_t, sA_t)
    i0 = jax.lax.broadcasted_iota(jnp.int32, K.shape, 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, K.shape, 1)
    eye = jnp.where(i0 == i1, 1.0, 0.0).astype(K.dtype)
    M_ = jnp.einsum("nkB,kjB->njB", K, warm_t)
    T = 2.0 * eye - M_
    X = jnp.einsum("nkB,kjB->njB", warm_t, T)
    X = jnp.einsum("nkB,kjB->njB", X, 2.0 * eye - jnp.einsum(
        "nkB,kjB->njB", K, X))
    P = jnp.einsum("mnB,nkB,jkB->mjB", sA_t, X, sA_t)
    return X, P


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rng = np.random.default_rng(0)
    sA = jnp.asarray(rng.normal(size=(B, M, N)) * 0.3, jnp.float32)
    sH = jnp.asarray(
        np.einsum("bmn,bmk->bnk", rng.normal(size=(B, M, N)) * 0.1,
                  rng.normal(size=(B, M, N)) * 0.1) + np.eye(N),
        jnp.float32)
    rho = jnp.asarray(rng.uniform(1, 2, size=(B, M)), jnp.float32)
    warm = jnp.linalg.inv(sH + np.einsum(
        "bmn,bm,bmk->bnk", np.asarray(sA), np.asarray(rho), np.asarray(sA)))
    sA_t = jnp.transpose(sA, (1, 2, 0))
    sH_t = jnp.transpose(sH, (1, 2, 0))
    rho_t = jnp.transpose(rho, (1, 0))
    warm_t = jnp.transpose(warm, (1, 2, 0))

    def scanify(f, pert_idx):
        @jax.jit
        def run(*args):
            def body(c, _):
                a = list(args)
                a[pert_idx] = a[pert_idx] + c * 1e-30
                X, P = f(*a)
                return jnp.sum(jnp.abs(X)) + jnp.sum(jnp.abs(P)) * 1e-30, None
            return jax.lax.scan(body, jnp.zeros(()), None, length=SCAN)
        return run

    timed("chain_batch_first", scanify(chain_first, 0), sA, sH, rho, warm)
    timed("chain_batch_last", scanify(chain_last, 0), sA_t, sH_t, rho_t,
          warm_t)
    # correctness cross-check
    Xf, Pf = chain_first(sA, sH, rho, warm)
    Xl, Pl = chain_last(sA_t, sH_t, rho_t, warm_t)
    print(json.dumps({
        "B": B,
        "X_maxdiff": float(jnp.max(jnp.abs(Xf - jnp.transpose(Xl, (2, 0, 1))))),
        "P_maxdiff": float(jnp.max(jnp.abs(Pf - jnp.transpose(Pl, (2, 0, 1))))),
    }), flush=True)


if __name__ == "__main__":
    main()
