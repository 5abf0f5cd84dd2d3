"""Pallas TPU kernel for the batched ADMM iteration loop.

The qpOASES replacement's hot loop (ops/qp.py) as a hand-placed kernel:
each grid step loads one batch tile's problem data (K^{-1}, A, g, l, u, rho,
warm start) into VMEM once and runs ALL ADMM iterations on-chip, so HBM
traffic is O(1) per solve instead of O(iterations) — the design the
100k-solves/s BASELINE target calls for.

Data layout is batch-minor ("structure of arrays"): every per-problem
matrix/vector keeps its own dims leading and the scenario batch as the LAST
dim, mapped onto the 128-wide lane axis, so each scalar op in the update
equations is one VPU vector op over a full tile of scenarios.  Matvecs
lower to sublane reductions of (rows, cols, lanes) products.

The wrapper (solve_tile / admm_iterations) takes batch-major inputs,
transposes at the boundary, pads the batch to the tile size, and returns
batch-major iterates.  Equality/infinity handling, Ruiz scaling and the
active-set polish live in ops/qp.py — this kernel is exactly the fixed-point
loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_TILE = 128


def _admm_kernel(Kinv_ref, A_ref, g_ref, l_ref, u_ref, rho_ref,
                 x0_ref, z0_ref, y0_ref, xo_ref, zo_ref, yo_ref,
                 *, iters: int, sigma: float, alpha: float):
    A = A_ref[:]          # (m, n, Bt)
    Kinv = Kinv_ref[:]    # (n, n, Bt)
    g = g_ref[:]          # (n, Bt)
    l = l_ref[:]          # (m, Bt)
    u = u_ref[:]
    rho = rho_ref[:]
    inv_rho = 1.0 / rho
    body = _make_admm_body(A, Kinv, g, l, u, rho, inv_rho, sigma, alpha)
    x, z, y = jax.lax.fori_loop(
        0, iters, body, (x0_ref[:], z0_ref[:], y0_ref[:])
    )
    xo_ref[:] = x
    zo_ref[:] = z
    yo_ref[:] = y


def _make_admm_body(A, Kinv, g, l, u, rho, inv_rho, sigma, alpha):

    def body(_, st):
        x, z, y = st
        t = rho * z - y                                            # (m, Bt)
        rhs = sigma * x - g + jnp.sum(A * t[:, None, :], axis=0)   # (n, Bt)
        x_t = jnp.sum(Kinv * rhs[None, :, :], axis=1)              # (n, Bt)
        z_t = jnp.sum(A * x_t[None, :, :], axis=1)                 # (m, Bt)
        x_n = alpha * x_t + (1.0 - alpha) * x
        z_rel = alpha * z_t + (1.0 - alpha) * z
        z_n = jnp.clip(z_rel + y * inv_rho, l, u)
        y_n = y + rho * (z_rel - z_n)
        return (x_n, z_n, y_n)

    return body


def _admm_res_kernel(Kinv_ref, A_ref, g_ref, l_ref, u_ref, rho_ref,
                     x0_ref, z0_ref, y0_ref,
                     Hs_ref, lo_ref, uo_ref, d_ref, e_ref,
                     xo_ref, zo_ref, yo_ref, pr_ref, du_ref, sv_ref,
                     *, iters: int, sigma: float, alpha: float):
    """ADMM iterations + unscaled relative-KKT epilogue in one kernel.

    Scaled problem in VMEM (A = e o A_orig o d, Hs = d o H o d); the
    epilogue reconstructs unscaled residual quantities via the identities
    A x = (As xs)/e, H x = (Hs xs)/d, A^T y = (As^T ys)/d, g = gs/d, and
    scores them against the UNSCALED bounds lo/uo — matching
    ops/qp.kkt_residual exactly."""
    A = A_ref[:]
    Kinv = Kinv_ref[:]
    g = g_ref[:]
    l = l_ref[:]
    u = u_ref[:]
    rho = rho_ref[:]
    body = _make_admm_body(A, Kinv, g, l, u, rho, 1.0 / rho, sigma, alpha)
    x, z, y = jax.lax.fori_loop(
        0, iters, body, (x0_ref[:], z0_ref[:], y0_ref[:])
    )
    xo_ref[:] = x
    zo_ref[:] = z
    yo_ref[:] = y

    d = d_ref[:]          # (n, Bt)
    e = e_ref[:]          # (m, Bt)
    lo = lo_ref[:]        # (m, Bt) unscaled bounds
    uo = uo_ref[:]
    ax = jnp.sum(A * x[None, :, :], axis=1) / e
    hx = jnp.sum(Hs_ref[:] * x[None, :, :], axis=1) / d
    aty = jnp.sum(A * y[:, None, :], axis=0) / d
    gu = g / d
    fin_l = jnp.where(jnp.abs(lo) < 1e19, jnp.abs(lo), 0.0)
    fin_u = jnp.where(jnp.abs(uo) < 1e19, jnp.abs(uo), 0.0)
    finite_b = jnp.maximum(jnp.max(fin_l, axis=0), jnp.max(fin_u, axis=0))
    pscale = jnp.maximum(1.0, jnp.maximum(jnp.max(jnp.abs(ax), axis=0), finite_b))
    dscale = jnp.maximum(
        1.0,
        jnp.maximum(
            jnp.max(jnp.abs(hx), axis=0),
            jnp.maximum(jnp.max(jnp.abs(aty), axis=0),
                        jnp.max(jnp.abs(gu), axis=0)),
        ),
    )
    pr_ref[:] = (jnp.max(jnp.abs(ax - jnp.clip(ax, lo, uo)), axis=0)
                 / pscale)[None, :]
    du_ref[:] = (jnp.max(jnp.abs(hx + gu + aty), axis=0) / dscale)[None, :]
    # sign/complementarity violation (ops/qp._sign_violation) on the
    # UNSCALED pair: y_unscaled = e * ys; equality rows are sign-free;
    # bounds are pre-clipped to +-1e20 so 1e19 is the finiteness test
    y_u = e * y
    eqr_sv = (uo - lo) <= 1e-9
    dup_sv = jnp.where(jnp.abs(uo) < 1e19, jnp.maximum(uo - ax, 0.0), 1e20)
    dlo_sv = jnp.where(jnp.abs(lo) < 1e19, jnp.maximum(ax - lo, 0.0), 1e20)
    dist_sv = jnp.where(eqr_sv, 0.0, jnp.where(y_u > 0, dup_sv, dlo_sv))
    sv_ref[:] = jnp.max(
        jnp.minimum(jnp.abs(y_u) / dscale[None, :],
                    dist_sv / pscale[None, :]),
        axis=0,
    )[None, :]


def _admm_zy_kernel(Kinv_ref, A_ref, g_ref, l_ref, u_ref, rho_ref,
                    z0_ref, y0_ref,
                    zo_ref, yo_ref, Vo_ref, *, iters: int, alpha: float):
    """Constraint-space ADMM loop (sigma = 0).

    With sigma = 0 the x-update x~ = K^{-1}(A^T u - g), u = rho z - y, makes
    the (z, y) iteration closed:  z~ = A K^{-1} A^T u + c  with
    c = -A K^{-1} g.  The A K^{-1} A^T apply runs as three chained matvecs
    on the RESIDENT (A, Kinv) — measured (round 5, post dispatch-constant
    correction) this beats precomputing P = A K^{-1} A^T in XLA: the two
    (B,70,42)x(42,42) batched matmuls, the padded (B,70,70) HBM round trip,
    and the batch-minor transpose of P cost ~1 ms/step, while the extra
    in-kernel reductions cost ~0.3 ms at 60 iterations.
    The relaxed x_K is recovered EXACTLY from the linear recursion
        x_{k+1} = (1-alpha) x_k + alpha (K^{-1}A^T u_k - K^{-1}g)
    via the accumulator V_{k+1} = (1-alpha) V_k + alpha u_k  (V_0 = 0):
        x_K = (1-alpha)^K x_0 + K^{-1}A^T V_K - (1 - (1-alpha)^K) K^{-1}g
    (the epilogue kernel below).  Same fixed point as the sigma > 0
    iteration (the proximal term vanishes at convergence); sigma only
    changes the path."""
    Kinv = Kinv_ref[:]    # (n, n, Bt)
    A = A_ref[:]          # (m, n, Bt)  SCALED constraint matrix
    l = l_ref[:]
    u = u_ref[:]
    rho = rho_ref[:]
    inv_rho = 1.0 / rho
    # c = -A K^{-1} g, two matvecs once on the resident tiles
    kg = jnp.sum(Kinv * g_ref[:][None, :, :], axis=1)          # (n, Bt)
    c = -jnp.sum(A * kg[None, :, :], axis=1)                   # (m, Bt)

    def body(_, st):
        z, y, V = st
        t = rho * z - y                                        # (m, Bt)
        at = jnp.sum(A * t[:, None, :], axis=0)                # A^T t (n, Bt)
        kat = jnp.sum(Kinv * at[None, :, :], axis=1)           # (n, Bt)
        z_t = jnp.sum(A * kat[None, :, :], axis=1) + c         # (m, Bt)
        z_rel = alpha * z_t + (1.0 - alpha) * z
        z_n = jnp.clip(z_rel + y * inv_rho, l, u)
        y_n = y + rho * (z_rel - z_n)
        V_n = (1.0 - alpha) * V + alpha * t
        return (z_n, y_n, V_n)

    z0 = z0_ref[:]
    z, y, V = jax.lax.fori_loop(0, iters, body, (z0, y0_ref[:],
                                                 jnp.zeros_like(z0)))
    zo_ref[:] = z
    yo_ref[:] = y
    Vo_ref[:] = V


def _zy_epilogue_kernel(Kinv_ref, A_ref, g_ref, Hs_ref,
                        x0_ref, V_ref, y_ref,
                        lo_ref, uo_ref, d_ref, e_ref,
                        xo_ref, pr_ref, du_ref, sv_ref,
                        *, iters: int, alpha: float):
    """x reconstruction from the V accumulator + unscaled relative-KKT
    residuals (matches ops/qp.kkt_residual / _admm_res_kernel's epilogue)."""
    A = A_ref[:]          # (m, n, Bt)
    Kg = jnp.sum(Kinv_ref[:] * g_ref[:][None, :, :], axis=1)  # K^{-1} g
    y = y_ref[:]
    w0 = (1.0 - alpha) ** iters
    atv = jnp.sum(A * V_ref[:][:, None, :], axis=0)            # A^T V  (n, Bt)
    x = (
        w0 * x0_ref[:]
        + jnp.sum(Kinv_ref[:] * atv[None, :, :], axis=1)
        - (1.0 - w0) * Kg
    )
    xo_ref[:] = x

    d = d_ref[:]
    e = e_ref[:]
    lo = lo_ref[:]
    uo = uo_ref[:]
    ax = jnp.sum(A * x[None, :, :], axis=1) / e
    hx = jnp.sum(Hs_ref[:] * x[None, :, :], axis=1) / d
    aty = jnp.sum(A * y[:, None, :], axis=0) / d
    gu = g_ref[:] / d
    fin_l = jnp.where(jnp.abs(lo) < 1e19, jnp.abs(lo), 0.0)
    fin_u = jnp.where(jnp.abs(uo) < 1e19, jnp.abs(uo), 0.0)
    finite_b = jnp.maximum(jnp.max(fin_l, axis=0), jnp.max(fin_u, axis=0))
    pscale = jnp.maximum(1.0, jnp.maximum(jnp.max(jnp.abs(ax), axis=0), finite_b))
    dscale = jnp.maximum(
        1.0,
        jnp.maximum(
            jnp.max(jnp.abs(hx), axis=0),
            jnp.maximum(jnp.max(jnp.abs(aty), axis=0),
                        jnp.max(jnp.abs(gu), axis=0)),
        ),
    )
    pr_ref[:] = (jnp.max(jnp.abs(ax - jnp.clip(ax, lo, uo)), axis=0)
                 / pscale)[None, :]
    du_ref[:] = (jnp.max(jnp.abs(hx + gu + aty), axis=0) / dscale)[None, :]
    # sign/complementarity violation (ops/qp._sign_violation) on the
    # UNSCALED pair: y_unscaled = e * ys; equality rows are sign-free;
    # bounds are pre-clipped to +-1e20 so 1e19 is the finiteness test
    y_u = e * y
    eqr_sv = (uo - lo) <= 1e-9
    dup_sv = jnp.where(jnp.abs(uo) < 1e19, jnp.maximum(uo - ax, 0.0), 1e20)
    dlo_sv = jnp.where(jnp.abs(lo) < 1e19, jnp.maximum(ax - lo, 0.0), 1e20)
    dist_sv = jnp.where(eqr_sv, 0.0, jnp.where(y_u > 0, dup_sv, dlo_sv))
    sv_ref[:] = jnp.max(
        jnp.minimum(jnp.abs(y_u) / dscale[None, :],
                    dist_sv / pscale[None, :]),
        axis=0,
    )[None, :]


@functools.partial(
    jax.jit, static_argnames=("iters", "alpha", "interpret", "layout")
)
def admm_zy_iterations_res(Kinv, A, g, l, u, rho, x0, z0, y0,
                           Hs, l_orig, u_orig, d, e,
                           *, iters: int, alpha: float,
                           interpret: bool | None = None, layout: str = "major"):
    """Constraint-space (sigma = 0) ADMM + residual epilogue.

    Kinv (B,n,n) = K^{-1} in SCALED space; A/g/l/u/rho likewise scaled;
    A K^{-1} A^T, K^{-1} g and c = -A K^{-1} g are applied/formed on the
    VMEM-resident tiles in-kernel (no P matrix, no XLA matvecs).
    The rest as admm_iterations_res.  Returns (x, z, y, pr, du, sv)
    batch-major.

    layout="minor": the scaled problem (Kinv, A, g, l, u, rho, Hs, d, e)
    arrives ALREADY batch-minor (dims..., B) — straight from the fused
    setup kernel's prepared_layout="minor" outputs and the batch-minor
    K-chain (ops/linalg.ns_inverse_*_bm) — so the boundary to_tile
    transposes vanish for every matrix input.  Warm starts x0/z0/y0 and
    the original bounds stay batch-major (cheap vector tiles)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if layout == "minor":
        m, n = A.shape[0], A.shape[1]
        B = A.shape[-1]
    else:
        B, m, n = A.shape
    dtype = A.dtype
    Bt = LANE_TILE
    Bp = -(-B // Bt) * Bt

    big = jnp.asarray(1e20, dtype)
    l_orig = jnp.clip(l_orig, -big, big)
    u_orig = jnp.clip(u_orig, -big, big)

    def to_tile(arr, fill=None):
        pad = [(0, Bp - B)] + [(0, 0)] * (arr.ndim - 1)
        arr = jnp.pad(arr, pad)
        if fill is not None and Bp != B:
            arr = arr.at[B:].set(fill)
        perm = tuple(range(1, arr.ndim)) + (0,)
        return jnp.transpose(arr, perm)

    def pad_minor(arr, fill=None):
        """Pad a batch-minor (dims..., B) array's lane axis to Bp."""
        if Bp == B:
            return arr
        pad = [(0, 0)] * (arr.ndim - 1) + [(0, Bp - B)]
        arr = jnp.pad(arr, pad)
        if fill is not None:
            arr = arr.at[..., B:].set(fill)
        return arr

    prob_tile = pad_minor if layout == "minor" else to_tile
    l = jnp.clip(l, -big, big)
    u = jnp.clip(u, -big, big)

    grid = (Bp // Bt,)
    mat_spec = lambda d0, d1: pl.BlockSpec(
        (d0, d1, Bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    vec_spec = lambda d0: pl.BlockSpec(
        (d0, Bt), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    Kinv_t = prob_tile(Kinv)
    A_t = prob_tile(A)
    g_t = prob_tile(g)

    loop_kernel = functools.partial(
        _admm_zy_kernel, iters=iters, alpha=float(alpha)
    )
    zo, yo, Vo = pl.pallas_call(
        loop_kernel,
        grid=grid,
        in_specs=[
            mat_spec(n, n), mat_spec(m, n), vec_spec(n),
            vec_spec(m), vec_spec(m), vec_spec(m),
            vec_spec(m), vec_spec(m),
        ],
        out_specs=(vec_spec(m), vec_spec(m), vec_spec(m)),
        out_shape=(
            jax.ShapeDtypeStruct((m, Bp), dtype),
            jax.ShapeDtypeStruct((m, Bp), dtype),
            jax.ShapeDtypeStruct((m, Bp), dtype),
        ),
        interpret=interpret,
    )(Kinv_t, A_t, g_t, prob_tile(l), prob_tile(u),
      prob_tile(rho, fill=1.0), to_tile(z0), to_tile(y0))

    epi_kernel = functools.partial(
        _zy_epilogue_kernel, iters=iters, alpha=float(alpha)
    )
    xo, pr, du, sv = pl.pallas_call(
        epi_kernel,
        grid=grid,
        in_specs=[
            mat_spec(n, n), mat_spec(m, n), vec_spec(n),
            mat_spec(n, n),
            vec_spec(n), vec_spec(m), vec_spec(m),
            vec_spec(m), vec_spec(m), vec_spec(n), vec_spec(m),
        ],
        out_specs=(vec_spec(n), vec_spec(1), vec_spec(1), vec_spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((n, Bp), dtype),
            jax.ShapeDtypeStruct((1, Bp), dtype),
            jax.ShapeDtypeStruct((1, Bp), dtype),
            jax.ShapeDtypeStruct((1, Bp), dtype),
        ),
        interpret=interpret,
    )(Kinv_t, A_t, g_t, prob_tile(Hs),
      to_tile(x0), Vo, yo,
      to_tile(l_orig), to_tile(u_orig),
      prob_tile(d, fill=1.0), prob_tile(e, fill=1.0))

    back = lambda arr: jnp.transpose(arr, (1, 0))[:B]
    return (back(xo), back(zo), back(yo),
            back(pr)[:, 0], back(du)[:, 0], back(sv)[:, 0])


@functools.partial(
    jax.jit, static_argnames=("iters", "sigma", "alpha", "interpret")
)
def admm_iterations(Kinv, A, g, l, u, rho, x0, z0, y0,
                    *, iters: int, sigma: float, alpha: float,
                    interpret: bool | None = None):
    """Run `iters` ADMM iterations for a batch of QPs.

    Batch-major inputs: Kinv (B,n,n), A (B,m,n), g (B,n), l/u/rho (B,m),
    warm iterates x0 (B,n), z0/y0 (B,m).  Returns (x, z, y) batch-major.
    Infinite bounds are clamped to +-1e20 before entering the kernel (the
    qpOASES INFTY convention) to keep the lane arithmetic finite."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, m, n = A.shape
    dtype = A.dtype
    Bt = LANE_TILE
    Bp = -(-B // Bt) * Bt

    big = jnp.asarray(1e20, dtype)
    l = jnp.clip(l, -big, big)
    u = jnp.clip(u, -big, big)

    def to_tile(arr, trailing):
        """(B, *dims) -> (*dims, Bp) batch-minor with zero padding."""
        pad = [(0, Bp - B)] + [(0, 0)] * (arr.ndim - 1)
        arr = jnp.pad(arr, pad)
        perm = tuple(range(1, arr.ndim)) + (0,)
        return jnp.transpose(arr, perm)

    Kinv_t = to_tile(Kinv, 2)
    A_t = to_tile(A, 2)
    g_t = to_tile(g, 1)
    l_t = to_tile(l, 1)
    u_t = to_tile(u, 1)
    rho_t = to_tile(rho, 1)
    # pad rho with ones so padded lanes never divide by zero
    if Bp != B:
        rho_t = rho_t.at[:, B:].set(1.0)
    x0_t = to_tile(x0, 1)
    z0_t = to_tile(z0, 1)
    y0_t = to_tile(y0, 1)

    grid = (Bp // Bt,)
    mat_spec = lambda d0, d1: pl.BlockSpec(
        (d0, d1, Bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    vec_spec = lambda d0: pl.BlockSpec(
        (d0, Bt), lambda i: (0, i), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _admm_kernel, iters=iters, sigma=float(sigma), alpha=float(alpha)
    )
    xo, zo, yo = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            mat_spec(n, n), mat_spec(m, n), vec_spec(n),
            vec_spec(m), vec_spec(m), vec_spec(m),
            vec_spec(n), vec_spec(m), vec_spec(m),
        ],
        out_specs=(vec_spec(n), vec_spec(m), vec_spec(m)),
        out_shape=(
            jax.ShapeDtypeStruct((n, Bp), dtype),
            jax.ShapeDtypeStruct((m, Bp), dtype),
            jax.ShapeDtypeStruct((m, Bp), dtype),
        ),
        interpret=interpret,
    )(Kinv_t, A_t, g_t, l_t, u_t, rho_t, x0_t, z0_t, y0_t)

    back = lambda arr: jnp.transpose(arr, (1, 0))[:B]
    return back(xo), back(zo), back(yo)


@functools.partial(
    jax.jit, static_argnames=("iters", "sigma", "alpha", "interpret", "layout")
)
def admm_iterations_res(Kinv, A, g, l, u, rho, x0, z0, y0,
                        Hs, l_orig, u_orig, d, e,
                        *, iters: int, sigma: float, alpha: float,
                        interpret: bool | None = None, layout: str = "major"):
    """ADMM iterations plus the candidate's UNSCALED relative KKT residuals
    in one kernel pass (matches ops/qp.kkt_residual).

    Same scaled batch-major inputs as admm_iterations, plus the scaled
    Hessian Hs (B,n,n), ORIGINAL bounds l_orig/u_orig (B,m), and the Ruiz
    scalings d (B,n), e (B,m).  Returns (x, z, y, pr, du, sv) batch-major in
    scaled space (x,z,y) / unscaled residuals (pr, du) and the unscaled
    sign/complementarity violation sv (ops/qp._sign_violation).

    layout="minor" as in admm_zy_iterations_res: the scaled problem
    (Kinv, A, g, l, u, rho, Hs, d, e) is already batch-minor."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if layout == "minor":
        m, n = A.shape[0], A.shape[1]
        B = A.shape[-1]
    else:
        B, m, n = A.shape
    dtype = A.dtype
    Bt = LANE_TILE
    Bp = -(-B // Bt) * Bt

    big = jnp.asarray(1e20, dtype)
    l = jnp.clip(l, -big, big)
    u = jnp.clip(u, -big, big)
    l_orig = jnp.clip(l_orig, -big, big)
    u_orig = jnp.clip(u_orig, -big, big)

    def to_tile(arr, fill=None):
        pad = [(0, Bp - B)] + [(0, 0)] * (arr.ndim - 1)
        arr = jnp.pad(arr, pad)
        if fill is not None and Bp != B:
            arr = arr.at[B:].set(fill)
        perm = tuple(range(1, arr.ndim)) + (0,)
        return jnp.transpose(arr, perm)

    def pad_minor(arr, fill=None):
        if Bp == B:
            return arr
        pad = [(0, 0)] * (arr.ndim - 1) + [(0, Bp - B)]
        arr = jnp.pad(arr, pad)
        if fill is not None:
            arr = arr.at[..., B:].set(fill)
        return arr

    prob_tile = pad_minor if layout == "minor" else to_tile

    grid = (Bp // Bt,)
    mat_spec = lambda d0, d1: pl.BlockSpec(
        (d0, d1, Bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    vec_spec = lambda d0: pl.BlockSpec(
        (d0, Bt), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _admm_res_kernel, iters=iters, sigma=float(sigma), alpha=float(alpha)
    )
    xo, zo, yo, pr, du, sv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            mat_spec(n, n), mat_spec(m, n), vec_spec(n),
            vec_spec(m), vec_spec(m), vec_spec(m),
            vec_spec(n), vec_spec(m), vec_spec(m),
            mat_spec(n, n), vec_spec(m), vec_spec(m),
            vec_spec(n), vec_spec(m),
        ],
        out_specs=(vec_spec(n), vec_spec(m), vec_spec(m),
                   vec_spec(1), vec_spec(1), vec_spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((n, Bp), dtype),
            jax.ShapeDtypeStruct((m, Bp), dtype),
            jax.ShapeDtypeStruct((m, Bp), dtype),
            jax.ShapeDtypeStruct((1, Bp), dtype),
            jax.ShapeDtypeStruct((1, Bp), dtype),
            jax.ShapeDtypeStruct((1, Bp), dtype),
        ),
        interpret=interpret,
    )(prob_tile(Kinv), prob_tile(A), prob_tile(g), prob_tile(l),
      prob_tile(u), prob_tile(rho, fill=1.0),
      to_tile(x0), to_tile(z0), to_tile(y0),
      prob_tile(Hs), to_tile(l_orig), to_tile(u_orig),
      prob_tile(d, fill=1.0), prob_tile(e, fill=1.0))

    back = lambda arr: jnp.transpose(arr, (1, 0))[:B]
    return (back(xo), back(zo), back(yo),
            back(pr)[:, 0], back(du)[:, 0], back(sv)[:, 0])
