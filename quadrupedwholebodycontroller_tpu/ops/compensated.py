"""Error-free-transformation (double-f32) arithmetic for residual evaluation.

The reference stack is all-double (whole_body_controller.cpp uses `double`
throughout); this TPU stack cannot run f64 (compiles hang), so the natural
TPU-native precision lever is COMPENSATED f32: every f32 multiply and add is
correctly rounded on the VPU, so Dekker/Veltkamp error-free transformations
recover the exact rounding error of each operation and a Neumaier-compensated
reduction sums products to ~|result|*eps accuracy instead of ~eps*sum|terms|.

Used where f32 accuracy actually dies: the iterative-refinement residuals of
the active-set polish (r = b - K x suffers catastrophic cancellation when x
is already ~4 digits accurate and the terms are ~1e4 — a plain f32 matvec
leaves an absolute noise floor of eps * sum|terms| that caps the relative KKT
near 1e-3 on extreme scenarios).  The preconditioner applications stay plain
f32 matmuls — only residuals need the extra digits.

These are elementwise VPU ops + tiny fori reductions: they bypass the MXU
(and hence the bf16-pass matmul precision question) entirely.  XLA does not
reassociate floating-point arithmetic, so the transformations are exact.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Veltkamp splitting constant for binary32 (24-bit significand, s = 12)
_SPLIT = 4097.0  # 2**12 + 1


def _two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly (s = fl(a+b))."""
    s = a + b
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


def _split(a):
    c = _SPLIT * a
    h = c - (c - a)
    return h, a - h


def _two_prod(a, b):
    """Dekker TwoProd: p + e == a * b exactly (p = fl(a*b)); FMA-free."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def comp_matvec(M, v):
    """Compensated batched matvec: (..., m, n) @ (..., n) -> (..., m).

    Products via TwoProd, summation via a Neumaier-compensated fori loop
    (exact to ~eps * |result| + O(eps^2 * sum|terms|)); the product errors
    are summed plainly (they are already O(eps * |p_i|) each).  Cost is
    ~20x a plain matvec in VPU flops — used only on tail sub-batches and
    tiny (<=112-dim) reductions, where that is noise."""
    p, e = _two_prod(M, v[..., None, :])
    n = p.shape[-1]
    zero = jnp.zeros(p.shape[:-1], p.dtype)

    def body(i, sc):
        s, c = sc
        x = jax.lax.dynamic_index_in_dim(p, i, axis=-1, keepdims=False)
        t, err = _two_sum(s, x)
        return t, c + err

    s, c = jax.lax.fori_loop(0, n, body, (zero, zero))
    return s + (c + jnp.sum(e, axis=-1))


def comp_residual(b, M, x, scale=1.0):
    """r = b - M x with compensated products/sums: the refinement residual.

    `b` may carry a scalar/broadcastable scale already applied; the
    subtraction of b enters the compensated chain exactly (TwoSum)."""
    mx_p, mx_e = _two_prod(M, x[..., None, :])
    n = mx_p.shape[-1]

    def body(i, sc):
        s, c = sc
        xi = jax.lax.dynamic_index_in_dim(mx_p, i, axis=-1, keepdims=False)
        t, err = _two_sum(s, -xi)
        return t, c + err

    s, c = jax.lax.fori_loop(0, n, body, (b * jnp.ones_like(mx_p[..., 0]) * scale,
                                          jnp.zeros(mx_p.shape[:-1], mx_p.dtype)))
    return s + (c - jnp.sum(mx_e, axis=-1))
