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


def _blockdiag_apply(diag, blk, start, v):
    """(diag ⊕ blk) @ v for a block-diagonal matrix stored compactly.

    diag: (n, Bt) with ZEROS on the block rows; blk: (k, k, Bt) at rows
    start:start+k.  Bitwise equal to the dense matvec: the dense row sums
    only add exact zeros on top of these terms."""
    k = blk.shape[0]
    dv = diag * v
    # explicit slice_in_dim: the mixed v[None, a:b, :] bracket lowers to a
    # gather, which Mosaic cannot lower
    vs = jax.lax.slice_in_dim(v, start, start + k, axis=0)   # (k, Bt)
    bv = jnp.sum(blk * vs[None, :, :], axis=1)
    top = jax.lax.slice_in_dim(dv, 0, start, axis=0)
    bot = jax.lax.slice_in_dim(dv, start + k, dv.shape[0], axis=0)
    return jnp.concatenate([top, bv, bot], axis=0)


def _polish_body(apply_H, apply_Hinv, Sinv_ref, A_ref,
                 da_ref, g_ref, b_ref, l_ref, u_ref,
                 x_ref, y_ref, z_ref, pr_ref, du_ref, sv_ref,
                 *, refine: int, reg: float):
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
    y = _mv(Sinv, -(dab + bv(apply_Hinv(g))))
    x = apply_Hinv(-g - btw(y))
    for _ in range(refine):
        r1 = -g - apply_H(x) - btw(y)
        r2 = dab - bv(x) - D * y
        dy = _mv(Sinv, bv(apply_Hinv(r1)) - r2)
        dx = apply_Hinv(r1 - btw(dy))
        x = x + dx
        y = y + dy

    ax = _mv(A, x)
    z = jnp.clip(ax, l, u)
    # relative KKT residuals — must match ops/qp.kkt_residual exactly
    hx = apply_H(x)  # reg*1e-9 difference vs the unregularized H is below f32
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
    # sign/complementarity violation (ops/qp._sign_violation): y > 0 must
    # push on a nearby finite upper bound, y < 0 on a lower one; equality
    # rows are sign-free.  ax/hx/aty and both scales are already resident
    # — in XLA this costs a full re-read of (H, A) from HBM per call.
    # Bounds arrive clipped to +-1e20 (polish_tiles), so "finite" is
    # |.| < 1e19 and 1e20 serves as the infinite distance.
    eqr = (u - l) <= 1e-9
    d_up = jnp.where(jnp.abs(u) < 1e19, jnp.maximum(u - ax, 0.0), 1e20)
    d_lo = jnp.where(jnp.abs(l) < 1e19, jnp.maximum(ax - l, 0.0), 1e20)
    dist = jnp.where(eqr, 0.0, jnp.where(y > 0, d_up, d_lo))
    sv = jnp.max(
        jnp.minimum(jnp.abs(y) / dscale[None, :], dist / pscale[None, :]),
        axis=0,
    )

    x_ref[:] = x
    y_ref[:] = y
    z_ref[:] = z
    pr_ref[:] = pr[None, :]
    du_ref[:] = du[None, :]
    sv_ref[:] = sv[None, :]


def _polish_kernel(H_ref, Hinv_ref, Sinv_ref, A_ref,
                   da_ref, g_ref, b_ref, l_ref, u_ref,
                   x_ref, y_ref, z_ref, pr_ref, du_ref, sv_ref,
                   *, refine: int, reg: float):
    """Dense-H variant (generic QPs)."""
    H = H_ref[:]          # (n, n, Bt)  regularized polish H
    Hinv = Hinv_ref[:]    # (n, n, Bt)
    _polish_body(
        lambda v: _mv(H, v), lambda v: _mv(Hinv, v),
        Sinv_ref, A_ref, da_ref, g_ref, b_ref, l_ref, u_ref,
        x_ref, y_ref, z_ref, pr_ref, du_ref, sv_ref, refine=refine, reg=reg,
    )


def _polish_kernel_compact(hd_ref, hblk_ref, hid_ref, hiblk_ref,
                           Sinv_ref, A_ref,
                           da_ref, g_ref, b_ref, l_ref, u_ref,
                           x_ref, y_ref, z_ref, pr_ref, du_ref, sv_ref,
                           *, refine: int, reg: float, blk_start: int):
    """Block-diagonal-H variant (the WBC QP: identity vars ⊕ one k×k SPD
    block ⊕ scaled-identity slacks — SURVEY §3.5).  H and Hinv arrive as
    (diag, block) pairs: ~9x fewer VPU terms per H-matvec and no dense
    (B, n, n) H/Hinv materialization or transposes on the XLA side."""
    hd = hd_ref[:]        # (n, Bt), zeros on the block rows
    hblk = hblk_ref[:]    # (k, k, Bt)
    hid = hid_ref[:]
    hiblk = hiblk_ref[:]
    _polish_body(
        lambda v: _blockdiag_apply(hd, hblk, blk_start, v),
        lambda v: _blockdiag_apply(hid, hiblk, blk_start, v),
        Sinv_ref, A_ref, da_ref, g_ref, b_ref, l_ref, u_ref,
        x_ref, y_ref, z_ref, pr_ref, du_ref, sv_ref, refine=refine, reg=reg,
    )


def _to_tile(arr, Bsz, Bp):
    pad = [(0, Bp - Bsz)] + [(0, 0)] * (arr.ndim - 1)
    arr = jnp.pad(arr, pad)
    perm = tuple(range(1, arr.ndim)) + (0,)
    return jnp.transpose(arr, perm)


def polish_tiles(H, Hinv, A, g, l, u, pre_tiled=None):
    """Pre-tile the polish-round-INVARIANT kernel inputs (batch-minor).

    The iterated active-set polish (ops/qp.solve_batched) calls
    polish_solve once per round, but only (Sinv, da, b) change between
    rounds; tiling (H, Hinv, A, g, l, u) once per solve saves one
    HBM round trip per (B, 70, 42)-class array per extra round.

    H and Hinv may each be a dense (B, n, n) array or a compact
    block-diagonal (diag (B, n), blk (B, k, k), start) tuple — diag MUST
    be zero on the block rows.

    pre_tiled: optional dict with ALREADY batch-minor A (m, n, B) / g / l
    / u — straight from the fused setup kernel's native-layout outputs
    (ops/pallas/setup_kernel tiles_minor), skipping their boundary
    transposes entirely.  A is still required batch-major for Bsz."""
    Bsz = A.shape[0]
    Bp = -(-Bsz // LANE_TILE) * LANE_TILE
    t = lambda a: _to_tile(a, Bsz, Bp)
    big = jnp.asarray(1e20, l.dtype)
    if pre_tiled is not None:
        def pm(a):
            if Bp == a.shape[-1]:
                return a
            return jnp.pad(a, [(0, 0)] * (a.ndim - 1)
                           + [(0, Bp - a.shape[-1])])
        tiles = dict(
            A=pm(pre_tiled["A"]), g=pm(pre_tiled["g"]),
            l=pm(jnp.clip(pre_tiled["l"], -big, big)),
            u=pm(jnp.clip(pre_tiled["u"], -big, big)),
            Bsz=Bsz, Bp=Bp, n=A.shape[-1],
        )
    else:
        l = jnp.clip(l, -big, big)
        u = jnp.clip(u, -big, big)
        tiles = dict(A=t(A), g=t(g), l=t(l), u=t(u), Bsz=Bsz, Bp=Bp,
                     n=A.shape[-1])
    compact = isinstance(H, tuple)
    assert compact == isinstance(Hinv, tuple), "H/Hinv forms must match"
    tiles["compact"] = compact
    if compact:
        hd, hblk, start = H
        hid, hiblk, istart = Hinv
        assert start == istart
        tiles.update(hd=t(hd), hblk=t(hblk), hid=t(hid), hiblk=t(hiblk),
                     blk_start=start, k=hblk.shape[-1])
    else:
        tiles.update(H=t(H), Hinv=t(Hinv))
    return tiles


def _polish_call(tiles, Sinv_t, da_t, b_t, *, refine, reg, interpret):
    n = tiles["n"]
    m = tiles["A"].shape[0]
    dtype = tiles["A"].dtype
    Bp = tiles["Bp"]
    Bt = LANE_TILE

    mat = lambda d0, d1: pl.BlockSpec((d0, d1, Bt), lambda i: (0, 0, i),
                                      memory_space=pltpu.VMEM)
    vec = lambda d0: pl.BlockSpec((d0, Bt), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)

    if tiles["compact"]:
        k = tiles["k"]
        kernel = functools.partial(
            _polish_kernel_compact, refine=refine, reg=float(reg),
            blk_start=tiles["blk_start"],
        )
        h_specs = [vec(n), mat(k, k), vec(n), mat(k, k)]
        h_args = (tiles["hd"], tiles["hblk"], tiles["hid"], tiles["hiblk"])
    else:
        kernel = functools.partial(
            _polish_kernel, refine=refine, reg=float(reg)
        )
        h_specs = [mat(n, n), mat(n, n)]
        h_args = (tiles["H"], tiles["Hinv"])
    return pl.pallas_call(
        kernel,
        grid=(Bp // Bt,),
        in_specs=h_specs + [
            mat(m, m), mat(m, n),
            vec(m), vec(n), vec(m), vec(m), vec(m),
        ],
        out_specs=(vec(n), vec(m), vec(m), vec(1), vec(1), vec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((n, Bp), dtype),
            jax.ShapeDtypeStruct((m, Bp), dtype),
            jax.ShapeDtypeStruct((m, Bp), dtype),
            jax.ShapeDtypeStruct((1, Bp), dtype),
            jax.ShapeDtypeStruct((1, Bp), dtype),
            jax.ShapeDtypeStruct((1, Bp), dtype),
        ),
        interpret=interpret,
    )(
        *h_args, Sinv_t, tiles["A"],
        da_t, tiles["g"], b_t, tiles["l"], tiles["u"],
    )


def polish_solve(H, Hinv, Sinv, A, da, g, b, l, u,
                 *, refine: int, reg: float, interpret: bool | None = None,
                 tiles=None, sinv_layout: str = "major"):
    """Batch-major wrapper: inputs (B, ...) -> (x, y, z, pr, du) batch-major.

    H is the REGULARIZED polish Hessian (H + reg I); da the active-row mask;
    Sinv the (approximate) inverse of the polish Schur complement.  H and
    Hinv may be dense or compact block-diagonal tuples (see polish_tiles).

    tiles: optional pre-tiled invariants from polish_tiles (then H, Hinv,
    A, g, l, u may be None).

    sinv_layout="minor": Sinv is ALREADY batch-minor (m, m, B) — e.g. the
    carried cache in the batch-minor solve chain (ops/qp solve_layout) —
    so the (B, 70, 70) boundary transpose (the largest single tensor the
    polish shuttles) is skipped entirely."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if tiles is None:
        tiles = polish_tiles(H, Hinv, A, g, l, u)
    Bsz, Bp = tiles["Bsz"], tiles["Bp"]
    t = lambda a: _to_tile(a, Bsz, Bp)
    if sinv_layout == "minor":
        Sinv_t = (
            Sinv if Bp == Sinv.shape[-1]
            else jnp.pad(Sinv, [(0, 0)] * (Sinv.ndim - 1)
                         + [(0, Bp - Sinv.shape[-1])])
        )
    else:
        Sinv_t = t(Sinv)
    x, y, z, pr, du, sv = _polish_call(
        tiles, Sinv_t, t(da), t(b),
        refine=refine, reg=reg, interpret=interpret,
    )
    back = lambda a: jnp.transpose(a, (1, 0))[:Bsz]
    return (back(x), back(y), back(z), back(pr)[:, 0], back(du)[:, 0],
            back(sv)[:, 0])
