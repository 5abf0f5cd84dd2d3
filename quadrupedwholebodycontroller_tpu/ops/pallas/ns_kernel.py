"""Pallas TPU kernel: batched Newton-Schulz SPD inverse, VMEM-resident.

The XLA path (ops/linalg.ns_inverse) round-trips every (B, n, n) iterate
through HBM per iteration and pays per-op dispatch latency for the safeguard
reductions; at B=4096 the 70x70 warm-2 inverse costs ~10 ms of a ~47 ms
control cycle.  This kernel loads one batch tile's A (and warm start) into
VMEM once, runs the full safeguarded NS recursion on-chip (MXU matmuls at
HIGHEST precision), and writes the inverse once.

Semantics match ops/linalg.ns_inverse exactly:
  * cold: Jacobi-scaled X0 with ||I - A X0|| < 1, `iters` iterations
  * warm: start from W unless ||I - A W||_inf is non-finite or >= 1e3
    (per-matrix fallback to the cold X0), `warm_iters` iterations
  * final non-finite safeguard: replace blown-up iterates with X0
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 8


def _bmm(a, b):
    """Batched (bt, n, n) @ (bt, n, n) on the MXU at full f32 precision."""
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _cold_x0(A, eye):
    d = jax.lax.rsqrt(jnp.abs(A * eye).sum(axis=-1, keepdims=True) + 1e-30)
    dd = d * jnp.swapaxes(d, -1, -2)       # d_i d_j outer product
    As = A * dd
    r1 = jnp.max(jnp.sum(jnp.abs(As), axis=-1), axis=-1)
    c1 = jnp.max(jnp.sum(jnp.abs(As), axis=-2), axis=-1)
    return As * dd / (r1 * c1)[..., None, None]


def _ns_kernel(A_ref, W_ref, X_ref, *, iters: int, warm_iters: int,
               use_warm: bool):
    A = A_ref[:]                            # (bt, n, n)
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)[None]
    X0 = _cold_x0(A, eye)
    if use_warm:
        W = W_ref[:]
        E = eye - _bmm(A, W)
        err = jnp.max(jnp.sum(jnp.abs(E), axis=-1), axis=-1)
        ok = (jnp.isfinite(err) & (err < 1e3))[:, None, None]
        X = jnp.where(ok, W, X0)
        k = warm_iters
    else:
        X = X0
        k = iters

    def body(_, X):
        return _bmm(X, 2.0 * eye - _bmm(A, X))

    X = jax.lax.fori_loop(0, k, body, X, unroll=True)
    if use_warm:
        finite = jnp.all(jnp.isfinite(X), axis=(-2, -1), keepdims=True)
        X = jnp.where(finite, X, X0)
    X_ref[:] = X


@functools.partial(
    jax.jit,
    static_argnames=("iters", "warm_iters", "tile", "interpret"),
)
def ns_inverse_pallas(A, warm=None, iters: int = 30, warm_iters: int = 2,
                      tile: int = DEFAULT_TILE, interpret: bool = False):
    """VMEM-resident Newton-Schulz inverse of (B, n, n) SPD matrices.

    Drop-in for ops/linalg.ns_inverse's batched f32 use.  warm=None runs the
    cold recursion; warm=(B, n, n) runs the safeguarded warm recursion."""
    B, n, _ = A.shape
    dtype = A.dtype
    Bp = -(-B // tile) * tile
    if Bp != B:
        pad = [(0, Bp - B), (0, 0), (0, 0)]
        # pad with identity so the padded matrices stay invertible
        eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (Bp - B, n, n))
        A = jnp.concatenate([A, eye], axis=0)
        if warm is not None:
            warm = jnp.concatenate([warm, eye], axis=0)
    use_warm = warm is not None
    if warm is None:
        warm = A  # unused placeholder with the right shape

    grid = (Bp // tile,)
    spec = pl.BlockSpec((tile, n, n), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _ns_kernel, iters=iters, warm_iters=warm_iters, use_warm=use_warm
    )
    X = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Bp, n, n), dtype),
        interpret=interpret,
    )(A, warm)
    return X[:B]
