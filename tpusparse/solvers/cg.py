"""Conjugate-gradient solvers: single-RHS and blocked multi-RHS.

Capability parity with the reference solvers, re-designed as jitted
``lax.while_loop`` programs:

  * ``cg_solve``       — CGSolveSingle
    (``/root/reference/work_2025/main/single_strategy.hpp:105-170``).
  * ``cg_solve_multi`` — CGSolveMultiple
    (``/root/reference/work_2025/main/no_pretreatment.hpp:35-197``):
    simultaneous CG over L right-hand sides with per-vector alpha/beta
    and convergence masks — converged lanes get alpha = beta = 0 (x and
    r freeze, p follows r), while the SpMM keeps running full-width,
    exactly as the reference does for SIMD efficiency.

Convergence rule (parity with ``no_pretreatment.hpp:130-155``):
``sqrt(r.r) / ||b|| < tolerance`` per lane, with ``||b|| == 0``
replaced by 1. The per-iteration maximum relative error across lanes is
recorded (the reference's ``max_errors`` history, written to CSV by
``cpu_multicg.cpp:67-86``) into a fixed-size device array.

Preconditioned variants live in :mod:`tpusparse.solvers.pcg` (IC(0)) and
:mod:`tpusparse.solvers.spai_cg` (SPAI).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from tpusparse.ops.blas import (
    axpy_multiple,
    dot_multiple,
    dot_single,
    update_p_multiple,
)
from tpusparse.ops.spmv import spmm, spmv


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CgResult:
    x: Any              # solution (n,) or (n, L)
    iterations: Any     # int32 scalar — iterations executed
    converged: Any      # bool scalar or (L,) mask
    residual: Any       # final relative residual(s)
    history: Any        # (max_iters,) max relative error per iteration
                        # (NaN beyond the executed range)

    def tree_flatten(self):
        return (
            (self.x, self.iterations, self.converged, self.residual,
             self.history),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _matvec(A, strategy):
    return lambda v: spmv(A, v, strategy=strategy)


def _matmat(A, strategy):
    return lambda V: spmm(A, V, strategy=strategy)


def _plan_bakeable(A) -> bool:
    """True when closing the plan over the jitted solve (instead of
    passing it as a traced operand) is a measured win.

    Measured on-chip (lap3d-48 fp32, r3_s8 scripts): the DIA/Hybrid
    CG loop runs 8.2x faster when the diagonal planes are compile-time
    constants (4.9 vs 39.9 us/iter) — XLA-TPU fuses/places constant
    planes where parameter buffers are re-streamed every iteration.
    The Pallas merge-kernel path is flat (41 vs 43 us/iter, rmat-14),
    so gather plans keep the shape-cached argument dispatch and its
    compile-sharing across same-shaped matrices.

    Size gate: constants are shipped inside the executable, so large
    plans would blow compile time and the axon tunnel's ~400 MB
    request-body cap (and past VMEM scale the residency win is gone
    anyway) — plans above ``BAKE_MAX_BYTES`` keep argument dispatch."""
    from tpusparse.formats.dia import DiaDevice
    from tpusparse.kernels.dia_stream import (
        DiaStreamDevice,
        DiaStreamDFDevice,
    )
    from tpusparse.ops.hybrid import HybridPlan
    from tpusparse.ops.reorder import ReorderedPlan

    if isinstance(A, ReorderedPlan):
        return _plan_bakeable(A.inner)
    if not isinstance(
        A, (HybridPlan, DiaDevice, DiaStreamDevice, DiaStreamDFDevice)
    ):
        return False
    nbytes = sum(
        getattr(leaf, "nbytes", 0)
        for leaf in jax.tree_util.tree_leaves(A)
    )
    return nbytes <= BAKE_MAX_BYTES


# Largest plan (bytes) baked as executable constants; see
# _plan_bakeable. 64 MB: half the v5e core's VMEM, far under the
# tunnel's request-body cap.
BAKE_MAX_BYTES = 64 * 1024 * 1024


def _baked_worker(A, key, build):
    """Per-plan cache of jitted solvers with the plan closed over.

    The cache lives on the plan object itself (``_tpusparse_baked``),
    so executables die with the plan — no global registry, no stale
    ``id()`` reuse. Returns None when the plan can't carry a cache
    (fall back to the argument dispatch)."""
    try:
        cache = A.__dict__.setdefault("_tpusparse_baked", {})
    except (AttributeError, TypeError):
        return None
    fn = cache.get(key)
    if fn is None:
        fn = build()
        cache[key] = fn
    return fn


def cg_solve(
    A,
    b,
    max_iters: int = 10000,
    tolerance: float = 1e-5,
    strategy: str = "auto",
    x0=None,
    matvec: Callable | None = None,
    record_history: bool = False,
    bake: bool | None = None,
) -> CgResult:
    """Single-RHS CG (parity: CGSolveSingle, single_strategy.hpp:105-170).

    Textbook CG from x0 = 0: r = p = b; per iteration
    alpha = rs/(p.Ap); x += alpha p; r -= alpha Ap;
    converged when sqrt(rs_new) < ||b|| * tolerance;
    beta = rs_new/rs_old; p = r + beta p.

    Jit-dispatched for the common case (no custom matvec / x0): an
    eager solve pays ~10 host dispatches regardless of matrix size —
    ~250 ms through the axon tunnel — while the jitted solve is one.

    ``bake`` closes the plan over the jitted solve as a compile-time
    constant instead of tracing it as an operand — measured 8.2x
    per-iteration on the DIA/Hybrid path (see ``_plan_bakeable``).
    None = auto (bake exactly where it wins); the executable is cached
    on the plan object, keyed by (b shape/dtype, solver statics), so
    repeated solves with new right-hand sides reuse it.
    """
    if matvec is None and x0 is None:
        if bake is None:
            bake = _plan_bakeable(A)
        if bake:
            b = jnp.asarray(b)
            key = ("cg", b.shape, str(b.dtype),
                   int(max_iters), float(tolerance), str(strategy),
                   bool(record_history))
            fn = _baked_worker(A, key, lambda: jax.jit(
                lambda b_: _cg_solve_impl(
                    A, b_, int(max_iters), float(tolerance), strategy,
                    None, None, bool(record_history), fuse_mv=True)))
            if fn is not None:
                return fn(b)
        return _cg_solve_jit(A, b, int(max_iters), float(tolerance),
                             strategy, bool(record_history))
    return _cg_solve_impl(A, b, max_iters, tolerance, strategy, x0,
                          matvec, record_history)


def _cg_solve_impl(A, b, max_iters, tolerance, strategy, x0, matvec,
                   record_history, fuse_mv=False) -> CgResult:
    from tpusparse.ops.reorder import ReorderedPlan

    unpermute = None
    if isinstance(A, ReorderedPlan) and matvec is None and x0 is None:
        # solve in the permuted space (traced INSIDE the jitted
        # worker — still one host dispatch): one gather of b in, one
        # of x out, instead of two per iteration — via the Pallas
        # permute kernel for f32 (XLA's element gather is the
        # 0.14 Gelem/s cliff). Residual norms and the iteration
        # trajectory are permutation-invariant.
        b = A.apply_perm(b)
        unpermute = A.apply_inv
        A = A.inner
    mv = matvec
    if mv is None and fuse_mv and strategy == "auto":
        # baked solves only: the XLA shifted-FMA matvec fuses into the
        # while_loop body where a pallas_call is a fusion barrier —
        # measured 2.5x/iter on DIA plans (see ops.dia.xla_matvec_of).
        # Unbaked (argument-dispatch) solves keep the stream kernels:
        # parameter value planes re-stream from HBM every iteration,
        # which is the 8x regression _plan_bakeable exists to avoid.
        from tpusparse.ops.dia import xla_matvec_of

        mv = xla_matvec_of(A)
    if mv is None:
        mv = _matvec(A, strategy)
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - mv(x) if x0 is not None else b
    p = r
    rs = dot_single(r, r)
    b_norm = jnp.sqrt(dot_single(b, b))
    b_norm = jnp.where(b_norm == 0.0, 1.0, b_norm)
    threshold = b_norm * tolerance
    hist0 = (
        jnp.full((max_iters,), jnp.nan, dtype=b.dtype)
        if record_history
        else jnp.zeros((0,), dtype=b.dtype)
    )

    def cond(state):
        i, x, r, p, rs, hist = state
        return (i < max_iters) & (jnp.sqrt(rs) >= threshold)

    def body(state):
        i, x, r, p, rs, hist = state
        Ap = mv(p)
        pAp = dot_single(p, Ap)
        alpha = jnp.where(pAp == 0, 0.0, rs / pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = dot_single(r, r)
        if record_history:
            hist = hist.at[i].set(jnp.sqrt(rs_new) / b_norm)
        # rs == 0 means the residual underflowed to exactly zero (fp32
        # long past convergence — e.g. a tolerance=0 measurement run):
        # 0/0 would NaN the state and break the loop's iteration count;
        # freeze p on r instead, mirroring the multi-RHS mask.
        beta = jnp.where(rs == 0, 0.0, rs_new / rs)
        p = r + beta * p
        return (i + 1, x, r, p, rs_new, hist)

    i, x, r, p, rs, hist = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x, r, p, rs, hist0)
    )
    rel = jnp.sqrt(rs) / b_norm
    return CgResult(
        x=x if unpermute is None else unpermute(x),
        iterations=i,
        converged=rel < tolerance,
        residual=rel,
        history=hist,
    )


def cg_solve_multi(
    A,
    B,
    max_iters: int = 10000,
    tolerance: float = 1e-5,
    strategy: str = "auto",
    matmat: Callable | None = None,
    record_history: bool = True,
    bake: bool | None = None,
) -> CgResult:
    """Blocked multi-RHS CG (parity: CGSolveMultiple,
    no_pretreatment.hpp:35-197). B is (n, L); solves A X = B for all L
    columns simultaneously with per-lane convergence masking.

    Jit-dispatched when no custom matmat is given (see cg_solve);
    ``bake`` as in cg_solve (plan closed over as a constant on the
    DIA/Hybrid path)."""
    if matmat is None:
        if bake is None:
            bake = _plan_bakeable(A)
        if bake:
            B = jnp.asarray(B)
            key = ("cg_multi", B.shape, str(B.dtype),
                   int(max_iters), float(tolerance), str(strategy),
                   bool(record_history))
            fn = _baked_worker(A, key, lambda: jax.jit(
                lambda B_: _cg_solve_multi_impl(
                    A, B_, int(max_iters), float(tolerance), strategy,
                    None, bool(record_history))))
            if fn is not None:
                return fn(B)
        return _cg_solve_multi_jit(A, B, int(max_iters),
                                   float(tolerance), strategy,
                                   bool(record_history))
    return _cg_solve_multi_impl(A, B, max_iters, tolerance, strategy,
                                matmat, record_history)


def _pure_dia_of(A):
    """The DiaDevice behind a plan when the WHOLE matrix is diagonal
    runs (HybridPlan with no scattered remainder, or a bare DiaDevice);
    None otherwise. Gates the transposed-space multi-RHS fast path."""
    from tpusparse.formats.dia import DiaDevice
    from tpusparse.ops.hybrid import HybridPlan

    if isinstance(A, DiaDevice):
        return A
    if (isinstance(A, HybridPlan) and A.rest is None
            and isinstance(A.dia, DiaDevice)):
        return A.dia
    return None


def _dia_t_callable(D):
    """(mm_t, pad_to) for a bare diagonal operand: a transposed-layout
    SpMM callable plus the padded state width it consumes (None = the
    natural n). The fp32 stream kernel uses the edge-halo variant on
    PERMANENTLY padded (L, nb*B) state — zero per-iteration pad
    copies; zero-tail arithmetic is exact. (None, None) for
    non-diagonal operands."""
    from tpusparse.formats.dia import DiaDevice
    from tpusparse.kernels.dia_stream import (
        DiaStreamDevice,
        DiaStreamDFDevice,
        padded_cols,
        padded_cols_df,
        spmm_dia_stream_df_tp,
        spmm_dia_stream_tp,
    )
    from tpusparse.ops.dia import spmm_dia_t

    if isinstance(D, DiaDevice):
        return (lambda P: spmm_dia_t(D, P)), None
    if isinstance(D, DiaStreamDevice):
        return (lambda P: spmm_dia_stream_tp(D, P)), padded_cols(D)
    if isinstance(D, DiaStreamDFDevice):
        return (lambda P: spmm_dia_stream_df_tp(D, P)), padded_cols_df(D)
    return None, None


def _interleaved_plan_of(A):
    """The DiaNMajorDevice behind a plan when the whole matrix runs on
    the n-major (row-interleaved) masked stream kernel; None otherwise.
    Gates the interleaved-state multi-RHS fast path (state in the
    kernel's guarded flat (T_g, 128) layout across iterations — no
    per-iteration pack/unpack)."""
    from tpusparse.kernels.dia_nmajor import DiaNMajorDevice
    from tpusparse.ops.hybrid import HybridPlan

    if isinstance(A, DiaNMajorDevice):
        return A
    if (isinstance(A, HybridPlan) and A.rest is None
            and isinstance(A.dia, DiaNMajorDevice)):
        return A.dia
    return None


def _transposed_matmat_of(A):
    """(mm_t, pad_to) when the plan supports the multi-RHS
    transposed-state fast path (state in (L, n) — or (L, pad_to) with
    a zero tail when pad_to is not None); (None, None) otherwise.
    Covers pure-DIA plans at any size (stream plans past the XLA
    fusion scale included). Plans with ANY gather-kernel SpMM in the
    matvec keep the generic (n, L) path — measured: gather-only plans
    are a wash (their SpMM dominates, RESULTS session 8), and
    hybrid-with-remainder came out 4% WORSE transposed (2.33 vs 2.24
    ms/iter on band+noise at rest_frac 0.03, L=32 — even a tiny
    scattered remainder dominates the DIA part by the gather kernels'
    ~100x per-nnz cost, so the boundary transposes only add;
    scripts/r3_s9_hybrid_rest_t.py, RESULTS session 9)."""
    from tpusparse.ops.hybrid import HybridPlan

    if isinstance(A, HybridPlan):
        if A.rest is not None:
            return None, None
        return _dia_t_callable(A.dia)
    return _dia_t_callable(A)


def _cg_solve_multi_impl(A, B, max_iters, tolerance, strategy, matmat,
                         record_history) -> CgResult:
    from tpusparse.ops.reorder import ReorderedPlan

    inv_perm = None
    if isinstance(A, ReorderedPlan) and matmat is None:
        # permuted-space solve (see _cg_solve_impl): two gathers per
        # SOLVE instead of two per iteration, still one dispatch
        B = jnp.asarray(B)[A.perm]
        inv_perm = A.inv_perm
        A = A.inner
    if matmat is None:
        # Interleaved-state fast path for n-major masked plans: the
        # whole solver state lives in the kernel's guarded flat
        # (T_g, 128) row-interleaved layout across iterations — no
        # per-iteration pack/unpack, per-RHS scalars fold/tile over
        # the G = 128/L row groups (kernels/dia_nmajor). The kernel
        # itself measured 290-305 GF vs the lane-major stream's
        # 235-244 at L=8..32 on lap3d-192 (scripts/r3_s11_nmajor_ab).
        D_il = _interleaved_plan_of(A)
        if (D_il is not None and jnp.asarray(B).dtype == jnp.float32
                and B.shape[1] <= D_il.L):
            return _cg_solve_multi_interleaved(
                D_il, jnp.asarray(B), max_iters, tolerance,
                record_history, inv_perm)
        # Transposed-space fast path for pure-DIA plans: the (n, L)
        # layout breaks XLA's layout assignment past L=16 once
        # per-lane-scalar BLAS-1 ops mix with spmm_dia's internal
        # (L, n) compute (measured 103.6 vs 12.8 us/iter fp32 and
        # 758 vs 162 fp64 at L=32, lap3d-32 — RESULTS session 8).
        # Semantics-preserving for fp64 too: multi-RHS dots are
        # native lane-wise sums on both paths (the compensated df
        # reduction is scalar-dots/single-RHS only).
        mm_t, pad_to = _transposed_matmat_of(A)
        if mm_t is not None:
            return _cg_solve_multi_transposed(
                mm_t, jnp.asarray(B), max_iters, tolerance,
                record_history, inv_perm, pad_to)
    mm = matmat if matmat is not None else _matmat(A, strategy)
    n, L = B.shape
    X = jnp.zeros_like(B)
    R = B
    P = B
    b_norms = jnp.sqrt(dot_multiple(B, B))
    b_norms = jnp.where(b_norms == 0.0, 1.0, b_norms)
    rs_old = dot_multiple(R, R)
    converged0 = jnp.zeros((L,), dtype=bool)
    hist0 = (
        jnp.full((max_iters,), jnp.nan, dtype=B.dtype)
        if record_history
        else jnp.zeros((0,), dtype=B.dtype)
    )

    def cond(state):
        i, X, R, P, rs_old, converged, hist = state
        return (i < max_iters) & ~jnp.all(converged)

    def body(state):
        i, X, R, P, rs_old, converged, hist = state
        AP = mm(P)
        pAp = dot_multiple(P, AP)
        # Converged lanes freeze: alpha = 0 (no_pretreatment.hpp:109-120).
        # pAp == 0 means P = 0 (A SPD), i.e. the lane already converged in
        # exact arithmetic — guard the division so such lanes freeze
        # instead of propagating NaN.
        alpha = jnp.where(converged | (pAp == 0), 0.0, rs_old / pAp)
        X = axpy_multiple(X, alpha, P)
        R = axpy_multiple(R, -alpha, AP)
        rs_new = dot_multiple(R, R)
        rel = jnp.sqrt(rs_new) / b_norms
        converged = converged | (rel < tolerance)
        if record_history:
            hist = hist.at[i].set(jnp.max(rel))
        beta = jnp.where(converged | (rs_old == 0), 0.0, rs_new / rs_old)
        P = update_p_multiple(R, beta, P)
        return (i + 1, X, R, P, rs_new, converged, hist)

    i, X, R, P, rs, converged, hist = jax.lax.while_loop(
        cond, body, (jnp.int32(0), X, R, P, rs_old, converged0, hist0)
    )
    rel = jnp.sqrt(rs) / b_norms
    return CgResult(
        x=X if inv_perm is None else X[inv_perm],
        iterations=i,
        converged=converged,
        residual=rel,
        history=hist,
    )


def _cg_solve_multi_transposed(spmm_t, B, max_iters, tolerance,
                               record_history, inv_perm,
                               pad_to=None) -> CgResult:
    """Multi-RHS CG with the whole state in (L, n): lane dim = rows,
    per-lane alpha/beta/masks as (L, 1) sublane broadcasts, SpMM via
    a transposed-layout callable (see _transposed_matmat_of) with no
    boundary transposes. When ``pad_to`` is set the state lives
    zero-tail-padded at (L, pad_to) — the edge-halo stream kernel's
    native block width; dots/axpys over the zero tail are exact. Same
    recurrences and masking semantics as the generic path
    (no_pretreatment.hpp:35-197); only the fp reduction order of the
    dots differs (axis-1 sums)."""
    n_out = B.shape[0]
    BT = B.T  # (L, n)
    if pad_to is not None and pad_to > n_out:
        BT = jnp.pad(BT, ((0, 0), (0, pad_to - n_out)))
    L = BT.shape[0]
    X = jnp.zeros_like(BT)
    R = BT
    P = BT
    b_norms = jnp.sqrt(jnp.sum(BT * BT, axis=1))
    b_norms = jnp.where(b_norms == 0.0, 1.0, b_norms)
    rs_old = jnp.sum(R * R, axis=1)
    converged0 = jnp.zeros((L,), dtype=bool)
    hist0 = (
        jnp.full((max_iters,), jnp.nan, dtype=B.dtype)
        if record_history
        else jnp.zeros((0,), dtype=B.dtype)
    )

    def cond(state):
        i, X, R, P, rs_old, converged, hist = state
        return (i < max_iters) & ~jnp.all(converged)

    def body(state):
        i, X, R, P, rs_old, converged, hist = state
        AP = spmm_t(P).astype(B.dtype)
        pAp = jnp.sum(P * AP, axis=1)
        alpha = jnp.where(converged | (pAp == 0), 0.0, rs_old / pAp)
        X = X + alpha[:, None] * P
        R = R - alpha[:, None] * AP
        rs_new = jnp.sum(R * R, axis=1)
        rel = jnp.sqrt(rs_new) / b_norms
        converged = converged | (rel < tolerance)
        if record_history:
            hist = hist.at[i].set(jnp.max(rel))
        beta = jnp.where(converged | (rs_old == 0), 0.0,
                         rs_new / rs_old)
        P = R + beta[:, None] * P
        return (i + 1, X, R, P, rs_new, converged, hist)

    i, X, R, P, rs, converged, hist = jax.lax.while_loop(
        cond, body, (jnp.int32(0), X, R, P, rs_old, converged0, hist0)
    )
    rel = jnp.sqrt(rs) / b_norms
    XO = X[:, :n_out].T
    return CgResult(
        x=XO if inv_perm is None else XO[inv_perm],
        iterations=i,
        converged=converged,
        residual=rel,
        history=hist,
    )


def _cg_solve_multi_interleaved(D, B, max_iters, tolerance,
                                record_history, inv_perm) -> CgResult:
    """Multi-RHS CG with the whole state in the n-major kernel's
    guarded flat (T_g, 128) row-interleaved layout (kernels/dia_nmajor):
    element (row r, rhs l) sits at flat index r*Lp + l, so per-RHS dots
    are a sublane sum folded over the G = 128/Lp row groups sharing
    each lane (``fold_lanes``), and per-RHS scalars broadcast by lane
    tiling (``tile_lanes``). Zero guards/tail and zero pad lanes stay
    exactly zero through every axpy/dot (the masked kernel outputs
    zero there), so the state packs ONCE per solve. Pad lanes (Lp > L)
    are born converged; recurrences and masking otherwise match the
    generic path (no_pretreatment.hpp:35-197)."""
    from tpusparse.kernels.dia_nmajor import (
        fold_lanes,
        pack_gp,
        spmm_dia_nmajor_gp,
        tile_lanes,
        unpack_gp,
    )

    n, L_user = B.shape
    Lp = D.L
    Bg = pack_gp(D, B)  # (T_g, 128) f32, zero guards/tail/pad-lanes

    def dot_gp(U, V):
        return fold_lanes(jnp.sum(U * V, axis=0), Lp)  # (Lp,)

    X = jnp.zeros_like(Bg)
    b_norms = jnp.sqrt(dot_gp(Bg, Bg))
    b_norms = jnp.where(b_norms == 0.0, 1.0, b_norms)
    rs0 = dot_gp(Bg, Bg)
    converged0 = jnp.arange(Lp) >= L_user
    hist0 = (
        jnp.full((max_iters,), jnp.nan, dtype=B.dtype)
        if record_history
        else jnp.zeros((0,), dtype=B.dtype)
    )

    def cond(state):
        i, X, R, P, rs_old, converged, hist = state
        return (i < max_iters) & ~jnp.all(converged)

    def body(state):
        i, X, R, P, rs_old, converged, hist = state
        AP = spmm_dia_nmajor_gp(D, P)
        pAp = dot_gp(P, AP)
        alpha = jnp.where(converged | (pAp == 0), 0.0, rs_old / pAp)
        a = tile_lanes(alpha, Lp)  # (128,) broadcast over sublanes
        X2 = X + a * P
        R2 = R - a * AP
        rs_new = dot_gp(R2, R2)
        rel = jnp.sqrt(rs_new) / b_norms  # pad lanes: 0/1 = 0
        converged = converged | (rel < tolerance)
        if record_history:
            hist = hist.at[i].set(jnp.max(rel))
        beta = jnp.where(converged | (rs_old == 0), 0.0,
                         rs_new / rs_old)
        P2 = R2 + tile_lanes(beta, Lp) * P
        return (i + 1, X2, R2, P2, rs_new, converged, hist)

    i, X, R, P, rs, converged, hist = jax.lax.while_loop(
        cond, body, (jnp.int32(0), X, Bg, Bg, rs0, converged0, hist0)
    )
    rel = jnp.sqrt(rs) / b_norms
    XO = unpack_gp(D, X, L_user)
    return CgResult(
        x=XO if inv_perm is None else XO[inv_perm],
        iterations=i,
        converged=converged[:L_user],
        residual=rel[:L_user],
        history=hist,
    )


# Jitted workers: the matrix plan and RHS are traced operands (every
# plan type is a registered pytree); loop bounds / tolerances /
# strategy strings are static. One cache entry per (plan structure,
# shapes, params) — repeated solves are a single device dispatch.
import functools as _functools


@_functools.partial(
    jax.jit, static_argnums=(2, 3, 4, 5)
)
def _cg_solve_jit(A, b, max_iters, tolerance, strategy, record_history):
    return _cg_solve_impl(A, b, max_iters, tolerance, strategy, None,
                          None, record_history)


@_functools.partial(
    jax.jit, static_argnums=(2, 3, 4, 5)
)
def _cg_solve_multi_jit(A, B, max_iters, tolerance, strategy,
                        record_history):
    return _cg_solve_multi_impl(A, B, max_iters, tolerance, strategy,
                                None, record_history)
