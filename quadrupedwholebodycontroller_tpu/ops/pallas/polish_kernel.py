"""Pallas TPU kernel: the active-set polish solve + iterative refinement.

The XLA path (ops/linalg.solve_kkt_schur + the acceptance residuals) is
HBM-bound: ~15 batched matvecs, each re-streaming a (B,70,70)/(B,70,42)
matrix from HBM, plus a separate kkt_residual pass over the problem data —
~7 GB of traffic per control step at B=4096.  This kernel loads each batch
tile's matrices into VMEM once and runs the ENTIRE cascade on-chip:

    y  = Sinv (-(da*b + B Hinv g))          x = Hinv (-g - B^T y)
    refine passes (preconditioned Richardson on the coupled KKT system):
        r1 = -g - H x - B^T y               r2 = da*b - B x - D y
        dy = Sinv (B Hinv r1 - r2)          dx = Hinv (r1 - B^T dy)
    z  = clip(A x, l, u)
    relative KKT residuals (OSQP normalization, matching ops/qp.kkt_residual)

B (the active-masked constraint matrix da*A) is never materialized: row
masking commutes through the matvecs (B v = da * (A v), B^T w = A^T (da*w)),
which keeps the resident set to {H, Hinv, A, Sinv} and fits the 16 MB
scoped-VMEM limit at full 128-lane tiles.

Layout is batch-minor (dims..., lanes=scenarios), the pattern proven by
ops/pallas/qp_kernel.py: every matvec is a VPU product + sublane reduction.
Replaces reference qpOASES's implicit factorization-backsolve accuracy
(src/whole_body_controller.cpp:517-541) at f32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_TILE = 128


def _mv(M, v):
    """(m, n, Bt) x (n, Bt) -> (m, Bt)."""
    return jnp.sum(M * v[None, :, :], axis=1)


def _mvt(M, w):
    """(m, n, Bt)^T x (m, Bt) -> (n, Bt)."""
    return jnp.sum(M * w[:, None, :], axis=0)


def _polish_kernel(H_ref, Hinv_ref, Sinv_ref, A_ref,
                   da_ref, g_ref, b_ref, l_ref, u_ref,
                   x_ref, y_ref, z_ref, pr_ref, du_ref,
                   *, refine: int, reg: float):
    H = H_ref[:]          # (n, n, Bt)  regularized polish H
    Hinv = Hinv_ref[:]    # (n, n, Bt)
    Sinv = Sinv_ref[:]    # (m, m, Bt)
    A = A_ref[:]          # (m, n, Bt)  original constraint matrix
    da = da_ref[:]        # (m, Bt)
    g = g_ref[:]          # (n, Bt)
    b = b_ref[:]          # (m, Bt)
    l = l_ref[:]
    u = u_ref[:]

    # active-masked constraint matvecs without materializing da*A
    bv = lambda v: da * _mv(A, v)          # B v
    btw = lambda w: _mvt(A, da * w)        # B^T w

    D = (1.0 - da) - reg * da
    dab = da * b
    y = _mv(Sinv, -(dab + bv(_mv(Hinv, g))))
    x = _mv(Hinv, -g - btw(y))
    for _ in range(refine):
        r1 = -g - _mv(H, x) - btw(y)
        r2 = dab - bv(x) - D * y
        dy = _mv(Sinv, bv(_mv(Hinv, r1)) - r2)
        dx = _mv(Hinv, r1 - btw(dy))
        x = x + dx
        y = y + dy

    ax = _mv(A, x)
    z = jnp.clip(ax, l, u)
    # relative KKT residuals — must match ops/qp.kkt_residual exactly
    hx = _mv(H, x)  # reg*1e-9 difference vs the unregularized H is below f32
    aty = _mvt(A, y)
    fin_l = jnp.where(jnp.abs(l) < 1e19, jnp.abs(l), 0.0)
    fin_u = jnp.where(jnp.abs(u) < 1e19, jnp.abs(u), 0.0)
    finite_b = jnp.maximum(jnp.max(fin_l, axis=0), jnp.max(fin_u, axis=0))
    pscale = jnp.maximum(1.0, jnp.maximum(jnp.max(jnp.abs(ax), axis=0), finite_b))
    dscale = jnp.maximum(
        1.0,
        jnp.maximum(
            jnp.max(jnp.abs(hx), axis=0),
            jnp.maximum(jnp.max(jnp.abs(aty), axis=0), jnp.max(jnp.abs(g), axis=0)),
        ),
    )
    pr = jnp.max(jnp.abs(ax - z), axis=0) / pscale
    du = jnp.max(jnp.abs(hx + g + aty), axis=0) / dscale

    x_ref[:] = x
    y_ref[:] = y
    z_ref[:] = z
    pr_ref[:] = pr[None, :]
    du_ref[:] = du[None, :]


def _to_tile(arr, Bsz, Bp):
    pad = [(0, Bp - Bsz)] + [(0, 0)] * (arr.ndim - 1)
    arr = jnp.pad(arr, pad)
    perm = tuple(range(1, arr.ndim)) + (0,)
    return jnp.transpose(arr, perm)


def polish_tiles(H, Hinv, A, g, l, u):
    """Pre-tile the polish-round-INVARIANT kernel inputs (batch-minor).

    The iterated active-set polish (ops/qp.solve_batched) calls
    polish_solve once per round, but only (Sinv, da, b) change between
    rounds; tiling (H, Hinv, A, g, l, u) once per solve saves one
    HBM round trip per (B, 70, 42)-class array per extra round."""
    Bsz = A.shape[0]
    Bp = -(-Bsz // LANE_TILE) * LANE_TILE
    big = jnp.asarray(1e20, l.dtype)
    l = jnp.clip(l, -big, big)
    u = jnp.clip(u, -big, big)
    t = lambda a: _to_tile(a, Bsz, Bp)
    return dict(H=t(H), Hinv=t(Hinv), A=t(A), g=t(g), l=t(l), u=t(u),
                Bsz=Bsz, Bp=Bp)


def _polish_call(tiles, Sinv_t, da_t, b_t, *, refine, reg, interpret):
    n = tiles["H"].shape[0]
    m = tiles["A"].shape[0]
    dtype = tiles["A"].dtype
    Bp = tiles["Bp"]
    Bt = LANE_TILE

    mat = lambda d0, d1: pl.BlockSpec((d0, d1, Bt), lambda i: (0, 0, i),
                                      memory_space=pltpu.VMEM)
    vec = lambda d0: pl.BlockSpec((d0, Bt), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)

    kernel = functools.partial(_polish_kernel, refine=refine, reg=float(reg))
    return pl.pallas_call(
        kernel,
        grid=(Bp // Bt,),
        in_specs=[
            mat(n, n), mat(n, n), mat(m, m), mat(m, n),
            vec(m), vec(n), vec(m), vec(m), vec(m),
        ],
        out_specs=(vec(n), vec(m), vec(m), vec(1), vec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((n, Bp), dtype),
            jax.ShapeDtypeStruct((m, Bp), dtype),
            jax.ShapeDtypeStruct((m, Bp), dtype),
            jax.ShapeDtypeStruct((1, Bp), dtype),
            jax.ShapeDtypeStruct((1, Bp), dtype),
        ),
        interpret=interpret,
    )(
        tiles["H"], tiles["Hinv"], Sinv_t, tiles["A"],
        da_t, tiles["g"], b_t, tiles["l"], tiles["u"],
    )


def polish_solve(H, Hinv, Sinv, A, da, g, b, l, u,
                 *, refine: int, reg: float, interpret: bool = False,
                 tiles=None):
    """Batch-major wrapper: inputs (B, ...) -> (x, y, z, pr, du) batch-major.

    H is the REGULARIZED polish Hessian (H + reg I); da the active-row mask;
    Sinv the (approximate) inverse of the polish Schur complement.

    tiles: optional pre-tiled invariants from polish_tiles (then H, Hinv,
    A, g, l, u may be None)."""
    if tiles is None:
        tiles = polish_tiles(H, Hinv, A, g, l, u)
    Bsz, Bp = tiles["Bsz"], tiles["Bp"]
    t = lambda a: _to_tile(a, Bsz, Bp)
    x, y, z, pr, du = _polish_call(
        tiles, t(Sinv), t(da), t(b),
        refine=refine, reg=reg, interpret=interpret,
    )
    back = lambda a: jnp.transpose(a, (1, 0))[:Bsz]
    return back(x), back(y), back(z), back(pr)[:, 0], back(du)[:, 0]
