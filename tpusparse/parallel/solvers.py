"""Full jitted distributed solvers — CG / PCG across the device mesh.

Round-2 exposed only per-iteration *step* functions
(:mod:`tpusparse.parallel.sharded_tiles`); a full distributed solve was
a Python loop of host dispatches (~25 ms each through the tunnel).
This module runs the ENTIRE solver — ``lax.while_loop`` recurrence,
per-lane convergence masks, tolerance exit, error history — inside one
``shard_map``, so a multi-chip solve is a single device dispatch, with
all_gather/psum riding ICI inside the loop body.

Parity targets:
  * ``cg_solve_sharded``        — CGSolveSingle
    (``/root/reference/work_2025/main/single_strategy.hpp:105-170``).
  * ``cg_solve_multi_sharded``  — CGSolveMultiple with per-vector
    alpha/beta masking and max-relative-error recording
    (``no_pretreatment.hpp:35-197``, masking :109-155).
  * ``pcg_solve_multi_sharded`` — PCGSolveMultiple
    (``incomplete_cholesky.hpp:36-199``): z = (L L^T)^{-1} r via
    *sharded* fixed-sweep Jacobi triangular solves (each sweep is an
    all_gather + per-shard merge-SpMM; exact at nilpotency depth).
  * ``spai_solve_multi_sharded`` — SPAISolveMultiple
    (``sparse_approximate_inverse.hpp:31-230``): z = M r as one more
    sharded SpMM per iteration.

All vectors live in the padded shard row layout (``D * rows_per_shard``
global rows; see ``parallel.sharded.to_padded_layout``); matrices are
:class:`~tpusparse.parallel.sharded_tiles.ShardedTiles` built with
``pad_layout_cols=True``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpusparse.kernels import merge_spmv
from tpusparse.kernels.spmm_merge import spmm_merge
from tpusparse.ops.blas import _reduce_sum
from tpusparse.parallel.sharded_tiles import ShardedTiles, _local_tiles
from tpusparse.solvers.cg import CgResult

_TILE_FIELDS = ("vals", "local_cols", "end_pos", "row_block",
                "col_block", "col_span")


def _lsum(v):
    """Local-shard partial reduction along axis 0 feeding a psum —
    scalar for (n,) operands, (L,) for (n, L). Scalar-producing f64
    reductions go through the compensated double-float path (see
    ops.blas._reduce_sum for the measured gate); the cross-shard psum
    then adds D f64 partials, negligible at D elements."""
    return _reduce_sum(v, axis=0)


def _tile_args(st: ShardedTiles):
    return tuple(getattr(st, f) for f in _TILE_FIELDS)


def _aux(st: ShardedTiles):
    """Hashable static metadata of a ShardedTiles (its pytree aux)."""
    return st.tree_flatten()[1]


def _skeleton(aux) -> ShardedTiles:
    """Metadata-only ShardedTiles for _local_tiles inside jit (the
    arrays come from shard_map block args)."""
    return ShardedTiles(*aux, *([None] * 7))


def _put_padded(v, mesh: Mesh, axis: str):
    return jax.device_put(v, NamedSharding(mesh, P(axis)))


@functools.partial(
    jax.jit, static_argnames=("aux", "mesh", "axis", "max_iters",
                              "tolerance", "record_history"),
)
def _cg_sharded_jit(tiles, b, *, aux, mesh, axis,
                    max_iters, tolerance, record_history):
    st = _skeleton(aux)

    def solve(v, lc, ep, rb, cb, cs, b_loc):
        A = _local_tiles(st, v, lc, ep, rb, cb, cs)
        mv = lambda p_full: merge_spmv.spmv_merge(A, p_full)

        b_norm = jnp.sqrt(jax.lax.psum(_lsum(b_loc * b_loc), axis))
        b_norm = jnp.where(b_norm == 0.0, 1.0, b_norm)
        x = jnp.zeros_like(b_loc)
        r = b_loc
        p = b_loc
        rs = jax.lax.psum(_lsum(r * r), axis)
        hist0 = (
            jnp.full((max_iters,), jnp.nan, dtype=b_loc.dtype)
            if record_history
            else jnp.zeros((0,), dtype=b_loc.dtype)
        )

        def cond(state):
            i, x, r, p, rs, hist = state
            return (i < max_iters) & (jnp.sqrt(rs)
                                      >= b_norm * tolerance)

        def body(state):
            i, x, r, p, rs, hist = state
            p_full = jax.lax.all_gather(p, axis, axis=0, tiled=True)
            Ap = mv(p_full)
            pAp = jax.lax.psum(_lsum(p * Ap), axis)
            alpha = jnp.where(pAp == 0, 0.0, rs / pAp)
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = jax.lax.psum(_lsum(r * r), axis)
            if record_history:
                hist = hist.at[i].set(jnp.sqrt(rs_new) / b_norm)
            beta = jnp.where(rs == 0, 0.0, rs_new / rs)
            p = r + beta * p
            return (i + 1, x, r, p, rs_new, hist)

        i, x, r, p, rs, hist = jax.lax.while_loop(
            cond, body, (jnp.int32(0), x, r, p, rs, hist0)
        )
        rel = jnp.sqrt(rs) / b_norm
        return x, i, rel < tolerance, rel, hist

    return jax.shard_map(
        solve,
        mesh=mesh,
        in_specs=(P(axis),) * 6 + (P(axis),),
        out_specs=(P(axis), P(), P(), P(), P()),
        check_vma=False,  # pallas_call has no varying-mesh-axes info
    )(*tiles, b)


def cg_solve_sharded(st: ShardedTiles, b, mesh: Mesh,
                     axis: str = "rows", max_iters: int = 10000,
                     tolerance: float = 1e-5,
                     record_history: bool = False) -> CgResult:
    """Single-RHS CG across the mesh in ONE dispatch. ``b`` is in the
    padded shard layout (D * rows_per_shard,); so is the returned x."""
    b = _put_padded(jnp.asarray(b), mesh, axis)
    x, i, conv, rel, hist = _cg_sharded_jit(
        _tile_args(st), b, aux=_aux(st), mesh=mesh, axis=axis,
        max_iters=int(max_iters), tolerance=float(tolerance),
        record_history=bool(record_history),
    )
    return CgResult(x=x, iterations=i, converged=conv, residual=rel,
                    history=hist)


def _multi_recurrence(matmat, precond, b_loc, axis, max_iters,
                      tolerance, record_history):
    """Shared blocked-CG/PCG recurrence on local shards. ``precond``
    maps the local residual block to the local z block (identity for
    plain CG); ``matmat`` consumes the LOCAL search block and owns its
    communication (all_gather for the merge kernels, ppermute halo
    exchange for the DIA path — see parallel.sharded_dia)."""
    L = b_loc.shape[1]
    b_norms = jnp.sqrt(jax.lax.psum(_lsum(b_loc * b_loc),
                                    axis))
    b_norms = jnp.where(b_norms == 0.0, 1.0, b_norms)
    X = jnp.zeros_like(b_loc)
    R = b_loc
    Z = precond(R)
    Pd = Z
    rho = jax.lax.psum(_lsum(R * Z), axis)
    converged0 = jnp.zeros((L,), dtype=bool)
    hist0 = (
        jnp.full((max_iters,), jnp.nan, dtype=b_loc.dtype)
        if record_history
        else jnp.zeros((0,), dtype=b_loc.dtype)
    )

    def cond(state):
        i, X, R, Pd, rho, converged, hist = state
        return (i < max_iters) & ~jnp.all(converged)

    def body(state):
        i, X, R, Pd, rho, converged, hist = state
        AP = matmat(Pd)
        pAp = jax.lax.psum(_lsum(Pd * AP), axis)
        # converged lanes freeze (alpha = beta = 0), SpMM stays
        # full-width — exactly no_pretreatment.hpp:109-120
        alpha = jnp.where(converged | (pAp == 0), 0.0, rho / pAp)
        X = X + alpha[None, :] * Pd
        R = R - alpha[None, :] * AP
        rs = jax.lax.psum(_lsum(R * R), axis)
        rel = jnp.sqrt(rs) / b_norms
        converged = converged | (rel < tolerance)
        if record_history:
            hist = hist.at[i].set(jnp.max(rel))
        Z = precond(R)
        rho_new = jax.lax.psum(_lsum(R * Z), axis)
        beta = jnp.where(converged | (rho == 0), 0.0, rho_new / rho)
        Pd = Z + beta[None, :] * Pd
        return (i + 1, X, R, Pd, rho_new, converged, hist)

    i, X, R, Pd, rho, converged, hist = jax.lax.while_loop(
        cond, body, (jnp.int32(0), X, R, Pd, rho, converged0, hist0)
    )
    rs = jax.lax.psum(_lsum(R * R), axis)
    rel = jnp.sqrt(rs) / b_norms
    return X, i, converged, rel, hist


@functools.partial(
    jax.jit, static_argnames=("aux", "mesh", "axis", "max_iters",
                              "tolerance", "record_history"),
)
def _cg_multi_sharded_jit(tiles, B, *, aux, mesh, axis,
                          max_iters, tolerance, record_history):
    st = _skeleton(aux)

    def solve(v, lc, ep, rb, cb, cs, B_loc):
        A = _local_tiles(st, v, lc, ep, rb, cb, cs)
        def matmat(Pl):
            Pf = jax.lax.all_gather(Pl, axis, axis=0, tiled=True)
            return spmm_merge(A, Pf)

        return _multi_recurrence(
            matmat, lambda R: R, B_loc, axis,
            max_iters, tolerance, record_history,
        )

    return jax.shard_map(
        solve,
        mesh=mesh,
        in_specs=(P(axis),) * 6 + (P(axis),),
        out_specs=(P(axis), P(), P(), P(), P()),
        check_vma=False,
    )(*tiles, B)


def cg_solve_multi_sharded(st: ShardedTiles, B, mesh: Mesh,
                           axis: str = "rows", max_iters: int = 10000,
                           tolerance: float = 1e-5,
                           record_history: bool = True) -> CgResult:
    """Blocked multi-RHS CG across the mesh in ONE dispatch. ``B`` is
    (D * rows_per_shard, L) in the padded layout."""
    B = _put_padded(jnp.asarray(B), mesh, axis)
    X, i, conv, rel, hist = _cg_multi_sharded_jit(
        _tile_args(st), B, aux=_aux(st), mesh=mesh, axis=axis,
        max_iters=int(max_iters), tolerance=float(tolerance),
        record_history=bool(record_history),
    )
    return CgResult(x=X, iterations=i, converged=conv, residual=rel,
                    history=hist)


@functools.partial(
    jax.jit, static_argnames=("aux", "laux", "uaux", "mesh", "axis",
                              "max_iters", "tolerance",
                              "record_history", "sweeps"),
)
def _pcg_multi_sharded_jit(tiles, ltiles, utiles,
                           inv_d, B, *, aux, laux, uaux, mesh, axis,
                           max_iters, tolerance, record_history,
                           sweeps):
    st, lt, ut = _skeleton(aux), _skeleton(laux), _skeleton(uaux)

    def solve(v, lc, ep, rb, cb, cs,
              lv, ll, le, lrb, lcb, lcs,
              uv, ul, ue, urb, ucb, ucs,
              d_loc, B_loc):
        A = _local_tiles(st, v, lc, ep, rb, cb, cs)
        Ls = _local_tiles(lt, lv, ll, le, lrb, lcb, lcs)
        Us = _local_tiles(ut, uv, ul, ue, urb, ucb, ucs)

        def jacobi(strict, inv_d, rhs):
            # fixed-sweep Jacobi on a triangular system: exact once
            # sweeps >= dependency depth (strict part is nilpotent)
            def sweep(_, x):
                xf = jax.lax.all_gather(x, axis, axis=0, tiled=True)
                return (rhs - spmm_merge(strict, xf)) * inv_d[:, None]

            return jax.lax.fori_loop(
                0, sweeps, sweep, rhs * inv_d[:, None]
            )

        def precond(R):
            Y = jacobi(Ls, d_loc, R)
            return jacobi(Us, d_loc, Y)

        def matmat(Pl):
            Pf = jax.lax.all_gather(Pl, axis, axis=0, tiled=True)
            return spmm_merge(A, Pf)

        return _multi_recurrence(
            matmat, precond, B_loc, axis,
            max_iters, tolerance, record_history,
        )

    return jax.shard_map(
        solve,
        mesh=mesh,
        in_specs=(P(axis),) * 18 + (P(axis), P(axis)),
        out_specs=(P(axis), P(), P(), P(), P()),
        check_vma=False,
    )(*tiles, *ltiles, *utiles, inv_d, B)


def pcg_solve_multi_sharded(st: ShardedTiles, lt: ShardedTiles,
                            ut: ShardedTiles, inv_diag,
                            B, mesh: Mesh, axis: str = "rows",
                            max_iters: int = 10000,
                            tolerance: float = 1e-5,
                            sweeps: int = 2,
                            record_history: bool = True) -> CgResult:
    """Blocked multi-RHS PCG-IC(0) across the mesh in ONE dispatch.

    ``lt``/``ut``: the STRICT parts of the IC(0) factor L and of L^T as
    ShardedTiles sharing ``st``'s padded layout; ``inv_diag``: the
    factor's reciprocal diagonal in that layout (zero on padding
    rows). Use :func:`shard_ic0_factor`. Default sweeps=2 matches the
    single-device measured optimum (solvers.pcg.make_ic0_preconditioner
    — truncation is PCG-safe: the composite is A_f^T A_f)."""
    B = _put_padded(jnp.asarray(B), mesh, axis)
    inv_d = _put_padded(jnp.asarray(inv_diag), mesh, axis)
    X, i, conv, rel, hist = _pcg_multi_sharded_jit(
        _tile_args(st), _tile_args(lt), _tile_args(ut),
        inv_d, B, aux=_aux(st), laux=_aux(lt), uaux=_aux(ut),
        mesh=mesh, axis=axis,
        max_iters=int(max_iters), tolerance=float(tolerance),
        record_history=bool(record_history), sweeps=int(sweeps),
    )
    return CgResult(x=X, iterations=i, converged=conv, residual=rel,
                    history=hist)


@functools.partial(
    jax.jit, static_argnames=("aux", "maux", "mesh", "axis",
                              "max_iters", "tolerance",
                              "record_history"),
)
def _spai_multi_sharded_jit(tiles, mtiles, B, *, aux, maux, mesh, axis,
                            max_iters, tolerance, record_history):
    st, mt = _skeleton(aux), _skeleton(maux)

    def solve(v, lc, ep, rb, cb, cs,
              mv, ml, me, mrb, mcb, mcs, B_loc):
        A = _local_tiles(st, v, lc, ep, rb, cb, cs)
        M = _local_tiles(mt, mv, ml, me, mrb, mcb, mcs)

        def precond(R):
            Rf = jax.lax.all_gather(R, axis, axis=0, tiled=True)
            return spmm_merge(M, Rf)

        def matmat(Pl):
            Pf = jax.lax.all_gather(Pl, axis, axis=0, tiled=True)
            return spmm_merge(A, Pf)

        return _multi_recurrence(
            matmat, precond, B_loc, axis,
            max_iters, tolerance, record_history,
        )

    return jax.shard_map(
        solve,
        mesh=mesh,
        in_specs=(P(axis),) * 12 + (P(axis),),
        out_specs=(P(axis), P(), P(), P(), P()),
        check_vma=False,
    )(*tiles, *mtiles, B)


def spai_solve_multi_sharded(st: ShardedTiles, mt: ShardedTiles, B,
                             mesh: Mesh, axis: str = "rows",
                             max_iters: int = 10000,
                             tolerance: float = 1e-5,
                             record_history: bool = True) -> CgResult:
    """Blocked multi-RHS SPAI-CG across the mesh in ONE dispatch:
    both A and the explicit approximate inverse M are row-sharded
    merge plans (``shard_tiles(..., pad_layout_cols=True)``)."""
    B = _put_padded(jnp.asarray(B), mesh, axis)
    X, i, conv, rel, hist = _spai_multi_sharded_jit(
        _tile_args(st), _tile_args(mt), B, aux=_aux(st), maux=_aux(mt),
        mesh=mesh,
        axis=axis, max_iters=int(max_iters), tolerance=float(tolerance),
        record_history=bool(record_history),
    )
    return CgResult(x=X, iterations=i, converged=conv, residual=rel,
                    history=hist)


def shard_ic0_factor(L_host, st: ShardedTiles, dtype=None,
                     **tile_kwargs):
    """Prepare the sharded IC(0) preconditioner operands from a host
    lower-triangular factor: strict(L) and strict(L^T) as padded-layout
    ShardedTiles plus the reciprocal diagonal in the padded layout.

    The factor shards REUSE the system matrix's row bounds (from
    ``st.row_start``) so every operand — matrix, factors, diagonal,
    state vectors — lives in ONE padded shard layout.

    ``dtype`` casts the factor before sharding (the IC(0) factor is
    fp64 from the host factorization; fp32 systems should pass fp32 so
    the sweep SpMMs don't run emulated f64 — see
    precond.trisolve.jacobi_trisolve_lower).

    Returns (lt, ut, inv_diag)."""
    import numpy as np

    from tpusparse.parallel.sharded import shard_csr, to_padded_layout
    from tpusparse.parallel.sharded_tiles import shard_tiles
    from tpusparse.precond.trisolve import split_diag

    if dtype is not None:
        L_host = L_host.astype(dtype)
    n_shards = st.num_shards
    bounds = np.concatenate(
        [np.asarray(st.row_start, dtype=np.int64), [st.num_rows]]
    )
    strict_l, diag = split_diag(L_host)
    strict_u, _ = split_diag(L_host.transpose())

    lt = shard_tiles(strict_l, n_shards, pad_layout_cols=True,
                     bounds=bounds, rows_per_shard=st.rows_per_shard,
                     **tile_kwargs)
    ut = shard_tiles(strict_u, n_shards, pad_layout_cols=True,
                     bounds=bounds, rows_per_shard=st.rows_per_shard,
                     **tile_kwargs)
    slabs = shard_csr(L_host, n_shards, bounds=bounds)
    inv_d = to_padded_layout(1.0 / diag, slabs)
    return lt, ut, np.asarray(inv_d)
