"""Fused multi-RHS BLAS-1 ops for the blocked CG solvers.

Capability parity with ``dot_multiple`` / ``axpy_multiple`` /
``update_p_multiple`` (``/root/reference/work_2025/cg/utils_multiple.hpp:9-61``)
and their single-vector forms (``work_2025/main/single_strategy.hpp:61-103``).

The reference fuses the L-RHS lane loop with ``#pragma omp simd`` over a
row-major interleaved [n, L] layout; on TPU the same layout maps the RHS
dimension onto VPU lanes and XLA fuses the elementwise chains, so these
are thin jnp expressions kept as named ops for API parity and for
selective ``jax.checkpoint`` boundaries in the solvers.

fp64 reductions: XLA-TPU's emulated f64 reduction is pathological
*cross-lane* — an isolated 32k f64 (n,)->scalar dot measured 219 us
on v5e (vs ~2 us fp32; inside a fused solver loop the gap shrinks but
strict single-RHS fp64 CG still pays 1.4-2.1x end-to-end) — while f64
*elementwise* ops cost only ~3x fp32 and *lane-wise* (n, L) axis-0
reductions vectorize natively. ``df_sum`` reduces f64 operands in
compensated double-float (two-f32) arithmetic: split each f64 addend
into an exact hi+lo f32 pair, then pairwise-halve with two-sum adds —
accuracy *better* than the native sequential f64 sum (1.8e-13 vs
5.2e-13 relative at n=1e6 against fsum), intermediates bounded by the
f32 exponent range (~1e38). ``_reduce_sum`` routes only the
scalar-producing case through it (the measured win; see its
docstring for the multi-RHS negative results). Set
``F64_COMPENSATED_DOT = False`` to restore strict-IEEE f64 reductions.
"""

from __future__ import annotations

import jax.numpy as jnp

# Route f64 SCALAR-producing dot/sum reductions through the
# double-float path (see module docstring). Flip off for strict-IEEE
# f64 reductions everywhere.
F64_COMPENSATED_DOT = True


def _two_sum(a, b):
    """Knuth two-sum: s + err == a + b exactly (f32)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _df_add(ah, al, bh, bl):
    """Double-float addition: (ah+al) + (bh+bl) -> normalized (h, l)."""
    sh, se = _two_sum(ah, bh)
    t = al + bl + se
    h = sh + t
    l = t - (h - sh)
    return h, l


def df_sum(v, axis: int = 0):
    """Compensated pairwise sum of an f64 array along ``axis`` in
    double-float (two-f32) arithmetic; returns f64 of the reduced
    shape. Error ~1e-13 relative at n=1e6 (better than XLA's
    sequential f64 sum). Intermediates are limited to the f32
    exponent range."""
    v = jnp.moveaxis(v, axis, 0)
    n = v.shape[0]
    if n == 0:
        return jnp.zeros(v.shape[1:], dtype=jnp.float64)
    hi = v.astype(jnp.float32)
    lo = (v - hi.astype(jnp.float64)).astype(jnp.float32)
    p = 1 << max(n - 1, 0).bit_length()  # next power of two
    if p != n:
        pad = [(0, p - n)] + [(0, 0)] * (hi.ndim - 1)
        hi = jnp.pad(hi, pad)
        lo = jnp.pad(lo, pad)
    while p > 1:
        half = p // 2
        hi, lo = _df_add(hi[:half], lo[:half], hi[half:], lo[half:])
        p = half
    return hi[0].astype(jnp.float64) + lo[0].astype(jnp.float64)


def _reduce_sum(v, axis: int = 0):
    """jnp.sum, except f64 reductions that produce a SCALAR go
    through the double-float path.

    The gate is measured, not guessed (v5e, session-7 A/B, solver
    device rates): XLA-TPU's emulated f64 reduction is pathological
    only CROSS-LANE — a (n,)->scalar dot costs ~10-17 us where fp32
    costs ~2 us, and the df tree wins 1.4-2.1x end-to-end in fp64 CG.
    Axis-0 reductions of (n, L) keep every lane independent, vectorize
    natively, and BEAT the df tree (whose (p, L) stages idle 128-L
    lanes): strict won 1.04-1.20x at L=4, ~1.04x at L=16. Lane-packing
    the tree ((p*G, L) -> (p, G*L) reshape) made it 2.7-4x WORSE —
    the reshape is a physical cross-lane relayout paid on every dot."""
    if (F64_COMPENSATED_DOT and v.dtype == jnp.float64
            and v.ndim == 1):
        return df_sum(v, axis=axis)
    return jnp.sum(v, axis=axis)


def dot_multiple(a, b):
    """Per-RHS dot products: a, b (n, L) -> (L,).

    Parity: dot_multiple (cg/utils_multiple.hpp:9-26) — blocked
    omp-reduction over rows; here a lane-wise reduction the TPU VPU
    performs natively (f64: compensated double-float, see df_sum)."""
    return _reduce_sum(a * b, axis=0)


def axpy_multiple(y, alpha, x):
    """y += alpha[None, :] * x with per-RHS alpha (L,), arrays (n, L).

    Parity: axpy_multiple (cg/utils_multiple.hpp:28-43)."""
    return y + alpha[None, :] * x


def update_p_multiple(r, beta, p):
    """p = r + beta[None, :] * p with per-RHS beta (L,).

    Parity: update_p_multiple (cg/utils_multiple.hpp:45-61)."""
    return r + beta[None, :] * p


def dot_single(a, b):
    """Parity: DotSingle (single_strategy.hpp:61). Real-valued
    operands only (f64: compensated double-float, see df_sum)."""
    return _reduce_sum(a * b, axis=0)


def axpy_single(y, alpha, x):
    """Parity: AxpySingle (single_strategy.hpp:76)."""
    return y + alpha * x


def update_p_single(r, beta, p):
    """Parity: UpdatePSingle (single_strategy.hpp:90)."""
    return r + beta * p
