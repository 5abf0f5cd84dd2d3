"""Pallas TPU kernel: batched warm Newton-Schulz SPD inverse, VMEM-resident.

VERDICT (measured, tools/exp_pallas_ns.py, B=4096 n=42 on v5e): this
kernel LOSES to the XLA path — 8.9 ms (statically unrolled outer
products; 11.7 ms fori-rolled) vs 7.8 ms for the warm-2 update.
Per-scenario MATMULS (unlike the matvec chains of qp_kernel/polish_kernel)
have no good VPU expression: the rolled outer-product form below streams
the (n, n, 128) accumulator through VMEM once per contraction step, O(n)
passes per matmul, which costs more than XLA's HBM-bound-but-MXU-fed
batched dot even with its 42->128 lane padding.  Kept as a tested,
documented negative result; NOT wired into ops/qp.solve_batched.

The motivation was: the XLA path (ops/linalg.ns_inverse) round-trips every
(B, n, n) iterate through HBM per matmul and pads n=42 lanes up to 128
(3x the bytes); at B=4096 the 42x42 warm-2 K-inverse update costs ~7.5 ms
of a ~20 ms control cycle.  This kernel keeps one 128-scenario tile's
A / warm / iterate resident in VMEM in BATCH-MINOR layout (n, n, 128) —
scenarios on the lanes, so nothing is padded — and runs the full
safeguarded warm recursion on the VPU.

Kernel-shape constraints (all hit while building this — see CLAUDE.md):
  * Mosaic cannot lower batched (3D) dot_general (layout.h check failure),
    so per-scenario matmuls are VPU sum-reductions.
  * Statically unrolled column-matvec matmuls (the qp_kernel.py pattern,
    n stacked `sum(P * Q[:, j][None], axis=1)` columns) blow the 16 MB
    scoped-VMEM limit at n=42/tile=128: Mosaic keeps ~30 (n, n, 128)
    temporaries live (27.3 MB).
  * Mosaic cannot lower dynamic_slice on VALUES — only on REFS.  Matmuls
    here are therefore ROLLED fori_loops of outer-product accumulations
    reading (n, Bt) slices from VMEM refs (inputs/scratch) by a dynamic
    leading-axis index, with one (n, n, Bt) value accumulator.
  * Leading-axis contraction computes PᵀQ, so the iteration tracks the
    TRANSPOSED iterate G = Xᵀ alongside X:
        T  = 2I - AX          (= outer(A, X) for symmetric A)
        X' = X T = GᵀT        (= outer(G, T))
        G' = (X T)ᵀ = TᵀG     (= outer(T, G), bitwise Xᵀ' — f32 multiply
                               commutes, same k-order accumulation)
    A = K is symmetric up to one rounding (the AᵀρA einsum), which only
    perturbs the approximate inverse at the NS convergence floor.

Semantics match ops/linalg.ns_inverse's warm path (up to f32 summation
order):
  * warm: start from W unless ||I - A W||_inf is non-finite or >= 1e3
    (per-matrix fallback to the Jacobi-scaled cold X0), `warm_iters`
    Newton-Schulz iterations
  * final safeguard: non-finite iterates are replaced with X0

Only the warm recursion lives here; the cold 30-iteration start stays in
XLA (ops/linalg.ns_inverse), where the MXU's throughput wins once the
iteration count is large enough to amortize the HBM traffic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128  # lane width; Pallas TPU requires 128-divisible lane blocks


def _outer_mm(P_ref, Q_ref):
    """(PᵀQ)[i, j, :] = sum_k P[k, i, :] * Q[k, j, :], STATICALLY unrolled.

    P_ref, Q_ref: (n, n, Bt) VMEM refs; the contraction axis is the
    leading (untiled) one, so every slice is static.  Unrolled rather
    than fori_loop-rolled: the rolled form pays per-step loop + dynamic-
    index overhead that dominated the compute (11.7 ms vs XLA's 7.8 for
    warm-2 at B=4096); the unrolled chain keeps ONE live accumulator, so
    it stays within VMEM where the column-stack formulation (27 MB of
    concurrent temporaries) did not."""
    n = P_ref.shape[0]
    acc = P_ref[0][:, None, :] * Q_ref[0][None, :, :]
    for k in range(1, n):
        acc = acc + P_ref[k][:, None, :] * Q_ref[k][None, :, :]
    return acc


def _eye_like(A):
    i0 = jax.lax.broadcasted_iota(jnp.int32, A.shape, 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, A.shape, 1)
    return jnp.where(i0 == i1, jnp.ones_like(A), jnp.zeros_like(A))


def _cold_x0(A):
    """Jacobi-scaled X0 with ||I - A X0|| < 1 (ops/linalg._cold_init).

    Symmetric whenever A is, so it serves as both X and G fallback."""
    diag = jnp.sum(jnp.where(_eye_like(A) != 0.0, A, 0.0), axis=1)
    d = jax.lax.rsqrt(jnp.abs(diag) + 1e-30)               # (n, Bt)
    dd = d[:, None, :] * d[None, :, :]
    As = A * dd
    r1 = jnp.max(jnp.sum(jnp.abs(As), axis=1), axis=0)     # inf-norm, (Bt,)
    c1 = jnp.max(jnp.sum(jnp.abs(As), axis=0), axis=0)     # 1-norm,  (Bt,)
    return As * dd / (r1 * c1)[None, None, :]


def _ns_warm_kernel(A_ref, W_ref, Wt_ref, X_ref, G_ref, T_ref,
                    *, warm_iters: int):
    A = A_ref[:]                                           # (n, n, Bt)
    # err = ||I - A W||_inf; A symmetric so outer(A, W) = A @ W
    E = _eye_like(A) - _outer_mm(A_ref, W_ref)
    err = jnp.max(jnp.sum(jnp.abs(E), axis=1), axis=0)     # (Bt,)
    # err < 1e3 is False for NaN/inf, so it subsumes the isfinite check
    ok = (err < 1e3)[None, None, :]
    X0 = _cold_x0(A)
    # X iterates live in the output ref; G = Xᵀ in scratch
    X_ref[:] = jnp.where(ok, W_ref[:], X0)
    G_ref[:] = jnp.where(ok, Wt_ref[:], X0)
    for _ in range(warm_iters):
        T_ref[:] = 2.0 * _eye_like(A) - _outer_mm(A_ref, X_ref)
        newX = _outer_mm(G_ref, T_ref)
        newG = _outer_mm(T_ref, G_ref)
        X_ref[:] = newX
        G_ref[:] = newG
    # never let a blown-up iterate poison the carried cache; max(|X|) is
    # inf or NaN iff any entry is, and both compare False against 1e30
    X = X_ref[:]
    bad = jnp.max(jnp.abs(X), axis=(0, 1))                 # (Bt,)
    X_ref[:] = jnp.where((bad < 1e30)[None, None, :], X, X0)


@functools.partial(jax.jit, static_argnames=("warm_iters", "interpret"))
def ns_inverse_warm_pallas(A, warm, warm_iters: int = 2,
                           interpret: bool = False):
    """VMEM-resident safeguarded warm Newton-Schulz inverse.

    Drop-in for ops/linalg.ns_inverse(A, warm=warm, warm_iters=k) on
    batched (B, n, n) f32 symmetric-positive-definite matrices (the
    QPCache hotstart update).  Batch-major in/out; the batch-minor
    transposes happen in XLA."""
    B, n, _ = A.shape
    dtype = A.dtype
    Bp = -(-B // TILE) * TILE
    if Bp != B:
        # pad with identity so the padded matrices stay invertible
        eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (Bp - B, n, n))
        A = jnp.concatenate([A, eye], axis=0)
        warm = jnp.concatenate([warm, eye], axis=0)

    Am = jnp.transpose(A, (1, 2, 0))                       # (n, n, Bp)
    Wm = jnp.transpose(warm, (1, 2, 0))
    Wt = jnp.transpose(warm, (2, 1, 0))                    # warmᵀ, batch-minor
    spec = pl.BlockSpec((n, n, TILE), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    X = pl.pallas_call(
        functools.partial(_ns_warm_kernel, warm_iters=warm_iters),
        grid=(Bp // TILE,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, n, Bp), dtype),
        scratch_shapes=[
            pltpu.VMEM((n, n, TILE), dtype),               # G = Xᵀ
            pltpu.VMEM((n, n, TILE), dtype),               # T = 2I - AX
        ],
        # Mosaic's stack accounting holds ~24 MB of (n, n, 128) values here;
        # the 16 MB scoped default is conservative (v5e VMEM is 128 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(Am, Wm, Wt)
    return jnp.transpose(X, (2, 0, 1))[:B]
