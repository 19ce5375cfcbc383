"""Row-sharded merge-tile SpMV — the Pallas kernel under shard_map.

Extends :mod:`tpusparse.parallel.sharded` (which runs the reference ops
per shard) to the flagship Pallas path: each device holds the merge-tile
partition of its row slab (local row space, global column space), x is
replicated, and the per-device kernel is exactly the single-chip
merge-tile kernel. Shards are padded to a common tile count so shapes
are uniform under ``shard_map``.

CG dot products on top of this compose exactly as in
``sharded.cg_step_sharded`` (psum-reduced partials); this module focuses
on the SpMV building block and its validation.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpusparse.formats.csr import CsrMatrix
from tpusparse.ops.blas import _reduce_sum
from tpusparse.formats.tiles import build_merge_tiles
from tpusparse.kernels import merge_spmv


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ShardedTiles:
    """Stacked per-shard DeviceTiles (leading axis = shard)."""

    num_rows: int
    num_cols: int
    rows_per_shard: int     # padded local row count (uniform)
    row_window: int
    col_window: int
    gather_rows: int
    x_pad_rows: int
    tiles_per_step: int     # uniform step batch across shards
    row_span: int           # uniform extraction span (max over shards)
    y_pad_rows: int         # uniform local-y padding (max over shards)

    vals: Any               # (D, ntp, 8, 128)
    local_cols: Any
    end_pos: Any
    row_block: Any          # (D, ntp)
    col_block: Any
    col_span: Any
    row_start: Any          # (D,) global first row per shard

    def tree_flatten(self):
        return (
            (self.vals, self.local_cols, self.end_pos, self.row_block,
             self.col_block, self.col_span, self.row_start),
            (self.num_rows, self.num_cols, self.rows_per_shard,
             self.row_window, self.col_window, self.gather_rows,
             self.x_pad_rows, self.tiles_per_step, self.row_span,
             self.y_pad_rows),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)

    @property
    def num_shards(self) -> int:
        return int(self.vals.shape[0])


def shard_tiles(csr: CsrMatrix, n_shards: int,
                pad_layout_cols: bool = False, bounds=None,
                rows_per_shard: int | None = None,
                partition: str | None = None, **tile_kwargs
                ) -> ShardedTiles:
    """Split rows into nnz-balanced slabs and merge-tile each slab.

    ``partition='auto'`` runs the per-matrix partition-family chooser
    (``formats.tiles.choose_partition_params``) ONCE on the full
    matrix and applies that family uniformly to every shard — shard_map
    needs uniform static shapes, so the choice cannot vary per shard.
    On scattered/power-law matrices this routes shards to the greedy
    variable-width window partition (the single-chip chooser's 2.2x
    occupancy repair, now across the mesh). A precomputed
    ``choose_partition_params`` tuple is also accepted (callers
    building several shardings of one matrix run the chooser once).
    Default (None) keeps the classic gap-split build with
    ``tile_kwargs``; combining ``partition`` with tile_kwargs raises.

    ``pad_layout_cols=True`` (square matrices only) remaps each slab's
    global column indices into the padded shard row layout (global
    column c owned by shard s sits at s*rows_per_shard + c -
    row_start[s]), the same remap as ``ShardedCsr.col_padded``. The
    per-shard kernel then gathers directly from an all-gathered
    row-sharded vector of length D*rows_per_shard — what the sharded CG
    step needs.

    ``bounds``/``rows_per_shard`` override the row split and slab
    padding so several matrices (system matrix + preconditioner
    factors) can share ONE padded shard layout."""
    from tpusparse.parallel.sharded import shard_csr

    slabs = shard_csr(csr, n_shards, bounds=bounds)
    rps = slabs.rows_per_shard
    if rows_per_shard is not None:
        if rows_per_shard < rps:
            raise ValueError("rows_per_shard below the split's max slab")
        rps = rows_per_shard

    pos = None
    gather_cols = csr.num_cols
    if pad_layout_cols:
        if csr.num_cols != csr.num_rows:
            raise ValueError("pad_layout_cols requires a square matrix")
        rstart = np.asarray(slabs.row_start).astype(np.int64)
        bounds = np.concatenate([rstart, [csr.num_rows]])
        shard_of = np.searchsorted(
            bounds[1:], np.arange(csr.num_rows), side="right"
        )
        pos = (
            shard_of * rps + np.arange(csr.num_rows) - bounds[shard_of]
        ).astype(np.int32)
        gather_cols = n_shards * rps

    fam = None
    if partition is not None:
        if tile_kwargs:
            raise ValueError(
                "partition= and explicit tile_kwargs conflict — the "
                f"family parameters would silently override {tile_kwargs}"
            )
        if partition == "auto":
            from tpusparse.formats.tiles import choose_partition_params

            fam = choose_partition_params(csr)
        elif isinstance(partition, tuple):
            fam = partition  # precomputed choose_partition_params
        else:
            raise ValueError(f"unknown partition {partition!r}")

    per_shard = []
    for i in range(n_shards):
        ro = np.asarray(slabs.row_offsets[i])
        if rps + 1 > ro.shape[0]:
            # rows_per_shard override widened the slabs: extend with
            # empty rows
            ro = np.concatenate([
                ro,
                np.full(rps + 1 - ro.shape[0], ro[-1], dtype=ro.dtype),
            ])
        nnz_i = int(ro[-1])
        ci = np.asarray(slabs.col_indices[i][:nnz_i])
        if pos is not None:
            ci = pos[ci]
        local = CsrMatrix(
            rps, gather_cols, ro,
            ci,
            np.asarray(slabs.values[i][:nnz_i]),
        )
        if fam is None:
            tiles = build_merge_tiles(local, **tile_kwargs)
        else:
            from tpusparse.formats.tiles import (
                build_partition_from_params,
            )

            tiles = build_partition_from_params(local, fam)
        # span_classes=1: shard_map needs uniform shapes across shards,
        # so each shard keeps one plan with the global static span
        per_shard.append(merge_spmv.to_device_tiles(tiles,
                                                    span_classes=1))

    return _stack_shard_plans(per_shard, csr.num_rows, gather_cols,
                              rps, np.asarray(slabs.row_start))


def _stack_shard_plans(per_shard, num_rows, gather_cols, rps,
                       row_start) -> ShardedTiles:
    """Uniformize per-shard DeviceTiles into one stacked ShardedTiles:
    common tile count (pad with all -1 / zero tiles), common step
    batch, and a common extraction span. Shared by shard_tiles and
    shard_tiles_overlapped so the padding invariants live in ONE place.
    """
    ntp = max(t.ntiles for t in per_shard)
    tps = merge_spmv._choose_tiles_per_step(ntp)
    ntp = -(-ntp // tps) * tps
    rs = max(t.row_span for t in per_shard)
    # a shard whose own span < rs writes rs-slice windows, so its y
    # padding grows by the difference
    ypad = max(t.y_pad_rows + (rs - t.row_span) for t in per_shard)

    def pad(x, fill, n):
        x = np.asarray(x)
        out = np.full((n,) + x.shape[1:], fill, dtype=x.dtype)
        out[: x.shape[0]] = x
        return out

    def pad_epos(t):
        # Grow the span axis by broadcasting each tile's final SCALAR
        # end position (last lane of the last slice — the running max,
        # exactly what to_device_tiles' window clipping produces):
        # constant appended slices extract duplicate values and yield
        # zero row-diffs. Replicating the last SLICE instead would
        # repeat its non-constant end positions and double-add each
        # widest tile's last-slice row sums 128 rows lower.
        e = np.asarray(t.end_pos)
        if e.shape[1] < rs:
            tail = np.broadcast_to(
                e[:, -1:, -1:], (e.shape[0], rs - e.shape[1], e.shape[2])
            )
            e = np.concatenate([e, tail], axis=1)
        return pad(e, -1, ntp)

    vals = np.stack([pad(t.vals, 0, ntp) for t in per_shard])
    lcols = np.stack([pad(t.local_cols, 0, ntp) for t in per_shard])
    epos = np.stack([pad_epos(t) for t in per_shard])
    rblk = np.stack([pad(t.row_block, 0, ntp) for t in per_shard])
    cblk = np.stack([pad(t.col_block, 0, ntp) for t in per_shard])
    cspan = np.stack([pad(t.col_span, 0, ntp) for t in per_shard])

    return ShardedTiles(
        num_rows=num_rows,
        num_cols=gather_cols,
        rows_per_shard=rps,
        row_window=per_shard[0].row_window,
        # greedy variable-width shards may differ in window width and
        # gather pad; the stacked statics take the max (safe for the
        # uniform classic build, where all shards agree)
        col_window=max(t.col_window for t in per_shard),
        gather_rows=max(t.gather_rows for t in per_shard),
        x_pad_rows=max(t.x_pad_rows for t in per_shard),
        tiles_per_step=tps,
        row_span=rs,
        y_pad_rows=ypad,
        vals=jnp.asarray(vals),
        local_cols=jnp.asarray(lcols),
        end_pos=jnp.asarray(epos),
        row_block=jnp.asarray(rblk),
        col_block=jnp.asarray(cblk),
        col_span=jnp.asarray(cspan),
        row_start=jnp.asarray(row_start),
    )


def device_put_sharded_tiles(st: ShardedTiles, mesh: Mesh,
                             axis: str = "rows") -> ShardedTiles:
    spec = NamedSharding(mesh, P(axis))
    put = lambda v: jax.device_put(v, spec)
    return ShardedTiles(
        st.num_rows, st.num_cols, st.rows_per_shard, st.row_window,
        st.col_window, st.gather_rows, st.x_pad_rows, st.tiles_per_step,
        st.row_span, st.y_pad_rows,
        put(st.vals), put(st.local_cols), put(st.end_pos),
        put(st.row_block), put(st.col_block), put(st.col_span),
        put(st.row_start),
    )


def spmv_sharded_tiles(st: ShardedTiles, x, mesh: Mesh,
                       axis: str = "rows"):
    """y = A @ x with the Pallas merge-tile kernel running per shard
    under shard_map; x replicated, y in the padded shard row layout
    (D * rows_per_shard,)."""
    empty_i = jnp.zeros((0,), jnp.int32)
    empty_f = jnp.zeros((0,), st.vals.dtype)

    def shard_fn(vals, lcols, epos, rblk, cblk, cspan, x):
        A = merge_spmv.DeviceTiles(
            num_rows=st.rows_per_shard,
            num_cols=st.num_cols,
            nnz=0,  # informational only
            row_window=st.row_window,
            col_window=st.col_window,
            vals=vals[0],
            local_cols=lcols[0],
            end_pos=epos[0],
            row_block=rblk[0],
            col_block=cblk[0],
            col_span=cspan[0],
            gather_rows=st.gather_rows,
            x_pad_rows=st.x_pad_rows,
            tiles_per_step=st.tiles_per_step,
            row_span=st.row_span,
            y_pad_rows=st.y_pad_rows,
            ovf_rows=empty_i,
            ovf_cols=empty_i,
            ovf_vals=empty_f,
        )
        return merge_spmv.spmv_merge(A, x)

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P()),
        out_specs=P(axis),
        check_vma=False,  # pallas_call has no varying-mesh-axes info
    )(st.vals, st.local_cols, st.end_pos, st.row_block, st.col_block,
      st.col_span, x)


def _local_tiles(st: ShardedTiles, vals, lcols, epos, rblk, cblk, cspan):
    """Reconstruct one shard's DeviceTiles from shard_map block args.
    Only ``st``'s static aux fields are read (the arrays come from the
    block args), so ``st`` may be a metadata-only skeleton."""
    empty_i = jnp.zeros((0,), jnp.int32)
    return merge_spmv.DeviceTiles(
        num_rows=st.rows_per_shard,
        num_cols=st.num_cols,
        nnz=0,  # informational only
        row_window=st.row_window,
        col_window=st.col_window,
        vals=vals[0],
        local_cols=lcols[0],
        end_pos=epos[0],
        row_block=rblk[0],
        col_block=cblk[0],
        col_span=cspan[0],
        gather_rows=st.gather_rows,
        x_pad_rows=st.x_pad_rows,
        tiles_per_step=st.tiles_per_step,
        row_span=st.row_span,
        y_pad_rows=st.y_pad_rows,
        ovf_rows=empty_i,
        ovf_cols=empty_i,
        ovf_vals=jnp.zeros((0,), vals.dtype),
    )


def shard_tiles_overlapped(csr: CsrMatrix, n_shards: int, **tile_kwargs
                           ) -> tuple[ShardedTiles, ShardedTiles]:
    """Split each shard's slab into a DIAGONAL block (columns owned by
    the shard, remapped to local indices [0, rows_per_shard)) and an
    OFF-DIAGONAL block (all other columns, in the padded global
    layout). The diagonal SpMV gathers only from the shard's own
    vector, so it carries no data dependency on the all_gather — XLA
    can overlap it with the ICI collective, the standard
    communication-hiding decomposition for distributed SpMV (beyond
    reference capability; SURVEY §2.4's psum/shard_map design).

    Returns (diag, offdiag) ShardedTiles; use with
    :func:`cg_step_sharded_overlap` / :func:`spmv_sharded_overlap`.
    """
    from tpusparse.parallel.sharded import shard_csr

    if csr.num_cols != csr.num_rows:
        raise ValueError("overlapped sharding requires a square matrix")
    slabs = shard_csr(csr, n_shards)
    rps = slabs.rows_per_shard
    rstart = np.asarray(slabs.row_start).astype(np.int64)
    bounds = np.concatenate([rstart, [csr.num_rows]])
    shard_of = np.searchsorted(
        bounds[1:], np.arange(csr.num_rows), side="right"
    )
    pos = (
        shard_of * rps + np.arange(csr.num_rows) - bounds[shard_of]
    ).astype(np.int32)

    diag_shards, off_shards = [], []
    for i in range(n_shards):
        ro = np.asarray(slabs.row_offsets[i])
        nnz_i = int(ro[-1])
        ci = np.asarray(slabs.col_indices[i][:nnz_i])
        va = np.asarray(slabs.values[i][:nnz_i])
        rows = np.repeat(
            np.arange(rps, dtype=np.int64), np.diff(ro.astype(np.int64))
        )
        own = (ci >= bounds[i]) & (ci < bounds[i + 1])

        def sub_csr(mask, cols, ncols):
            rr = rows[mask]
            counts = np.bincount(rr, minlength=rps)
            offs = np.zeros(rps + 1, dtype=np.int64)
            np.cumsum(counts, out=offs[1:])
            return CsrMatrix(rps, ncols, offs, cols.astype(np.int32),
                             va[mask])

        diag_shards.append(sub_csr(own, ci[own] - bounds[i], rps))
        off_shards.append(
            sub_csr(~own, pos[ci[~own]], n_shards * rps)
        )

    def stack(shards, gather_cols):
        per = [
            merge_spmv.to_device_tiles(
                build_merge_tiles(s, **tile_kwargs), span_classes=1
            )
            for s in shards
        ]
        return _stack_shard_plans(per, csr.num_rows, gather_cols, rps,
                                  rstart)

    return stack(diag_shards, rps), stack(off_shards, n_shards * rps)


def cg_step_sharded_overlap(diag: ShardedTiles, offd: ShardedTiles,
                            state, mesh: Mesh, axis: str = "rows"):
    """One CG iteration with the communication-overlapped SpMV: the
    diagonal-block kernel consumes only the local slice of the search
    direction, so it is independent of the all_gather and XLA can run
    it while the collective is in flight; the off-diagonal kernel then
    consumes the gathered vector. Same recurrence and state layout as
    :func:`cg_step_sharded_tiles`."""

    def step(dv, dl, de, drb, dcb, dcs,
             ov, ol, oe, orb, ocb, ocs, X, R, Pd, rs_old):
        Pd_full = jax.lax.all_gather(Pd, axis, axis=0, tiled=True)
        A_d = _local_tiles(diag, dv, dl, de, drb, dcb, dcs)
        A_o = _local_tiles(offd, ov, ol, oe, orb, ocb, ocs)
        AP = merge_spmv.spmv_merge(A_d, Pd) + merge_spmv.spmv_merge(
            A_o, Pd_full
        )
        pAp = jax.lax.psum(_reduce_sum(Pd * AP, axis=0), axis)
        alpha = jnp.where(pAp == 0, 0.0, rs_old / pAp)
        Xn = X + alpha * Pd
        Rn = R - alpha * AP
        rs_new = jax.lax.psum(_reduce_sum(Rn * Rn, axis=0), axis)
        beta = jnp.where(rs_old == 0, 0.0, rs_new / rs_old)
        Pn = Rn + beta * Pd
        return Xn, Rn, Pn, rs_new

    X, R, Pd, rs_old = state
    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(axis),) * 6 + (P(axis),) * 6
        + (P(axis), P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis), P()),
        check_vma=False,  # pallas_call has no varying-mesh-axes info
    )(diag.vals, diag.local_cols, diag.end_pos, diag.row_block,
      diag.col_block, diag.col_span,
      offd.vals, offd.local_cols, offd.end_pos, offd.row_block,
      offd.col_block, offd.col_span, X, R, Pd, rs_old)


def spmm_sharded_tiles(st: ShardedTiles, X, mesh: Mesh,
                       axis: str = "rows"):
    """Y = A @ X with the in-kernel multi-RHS merge kernel per shard;
    X replicated (num_cols, L), Y row-sharded in the padded layout
    (D * rows_per_shard, L)."""
    from tpusparse.kernels.spmm_merge import spmm_merge

    def shard_fn(vals, lcols, epos, rblk, cblk, cspan, X):
        A = _local_tiles(st, vals, lcols, epos, rblk, cblk, cspan)
        return spmm_merge(A, X)

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis),) * 6 + (P(),),
        out_specs=P(axis),
        check_vma=False,  # pallas_call has no varying-mesh-axes info
    )(st.vals, st.local_cols, st.end_pos, st.row_block, st.col_block,
      st.col_span, X)


def cg_step_sharded_tiles_multi(st: ShardedTiles, state, mesh: Mesh,
                                axis: str = "rows"):
    """One BLOCKED multi-RHS CG iteration with the in-kernel merge
    SpMM (kernels/spmm_merge) as the per-shard operator — the
    multi-chip expression of the reference's flagship solver
    (``CGSolveMultiple``, no_pretreatment.hpp:35-197: simultaneous CG
    over L right-hand sides) on the Pallas kernel path. Per-lane
    alpha/beta come from psum-reduced partial dots
    (``cg/utils_multiple.hpp:9-26``).

    ``st`` must be built with ``shard_tiles(..., pad_layout_cols=True)``.
    ``state`` = (X, R, P, rs_old): (D*rows_per_shard, L) row-sharded
    arrays in the padded layout + a replicated (L,) vector."""
    from tpusparse.kernels.spmm_merge import spmm_merge

    def step(vals, lcols, epos, rblk, cblk, cspan, X, R, Pd, rs_old):
        Pd_full = jax.lax.all_gather(Pd, axis, axis=0, tiled=True)
        A = _local_tiles(st, vals, lcols, epos, rblk, cblk, cspan)
        AP = spmm_merge(A, Pd_full)
        pAp = jax.lax.psum(_reduce_sum(Pd * AP, axis=0), axis)
        alpha = jnp.where(pAp == 0, 0.0, rs_old / pAp)
        Xn = X + alpha[None, :] * Pd
        Rn = R - alpha[None, :] * AP
        rs_new = jax.lax.psum(_reduce_sum(Rn * Rn, axis=0), axis)
        beta = jnp.where(rs_old == 0, 0.0, rs_new / rs_old)
        Pn = Rn + beta[None, :] * Pd
        return Xn, Rn, Pn, rs_new

    X, R, Pd, rs_old = state
    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(axis),) * 6 + (P(axis), P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis), P()),
        check_vma=False,  # pallas_call has no varying-mesh-axes info
    )(st.vals, st.local_cols, st.end_pos, st.row_block, st.col_block,
      st.col_span, X, R, Pd, rs_old)


def pcg_step_sharded_spai(st: ShardedTiles, mt: ShardedTiles, state,
                          mesh: Mesh, axis: str = "rows"):
    """One blocked multi-RHS SPAI-PCG iteration across the mesh — the
    reference's SPAI-CG (``SPAISolveMultiple``,
    sparse_approximate_inverse.hpp:31-230: z = M r applied as an SpMM)
    distributed: both A and the explicit approximate inverse M are
    row-sharded merge plans, so the preconditioner apply is one more
    all_gather + per-shard multi-RHS merge-SpMM per iteration.

    ``st``/``mt`` must both come from ``shard_tiles(...,
    pad_layout_cols=True)`` with the same shard count. ``state`` =
    (X, R, Z, P, rho_old): (D*rows_per_shard, L) row-sharded arrays in
    the padded layout + a replicated (L,) vector, with Z0 = M R0 and
    P0 = Z0."""
    from tpusparse.kernels.spmm_merge import spmm_merge

    def step(av, al, ae, arb, acb, acs,
             mv, ml, me, mrb, mcb, mcs, X, R, Z, Pd, rho_old):
        Pd_full = jax.lax.all_gather(Pd, axis, axis=0, tiled=True)
        A = _local_tiles(st, av, al, ae, arb, acb, acs)
        AP = spmm_merge(A, Pd_full)
        pAp = jax.lax.psum(_reduce_sum(Pd * AP, axis=0), axis)
        alpha = jnp.where(pAp == 0, 0.0, rho_old / pAp)
        Xn = X + alpha[None, :] * Pd
        Rn = R - alpha[None, :] * AP
        Rn_full = jax.lax.all_gather(Rn, axis, axis=0, tiled=True)
        M = _local_tiles(mt, mv, ml, me, mrb, mcb, mcs)
        Zn = spmm_merge(M, Rn_full)
        rho_new = jax.lax.psum(_reduce_sum(Rn * Zn, axis=0), axis)
        beta = jnp.where(rho_old == 0, 0.0, rho_new / rho_old)
        Pn = Zn + beta[None, :] * Pd
        return Xn, Rn, Zn, Pn, rho_new

    X, R, Z, Pd, rho_old = state
    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(axis),) * 12 + (P(axis),) * 4 + (P(),),
        out_specs=(P(axis),) * 4 + (P(),),
        check_vma=False,  # pallas_call has no varying-mesh-axes info
    )(st.vals, st.local_cols, st.end_pos, st.row_block, st.col_block,
      st.col_span,
      mt.vals, mt.local_cols, mt.end_pos, mt.row_block, mt.col_block,
      mt.col_span, X, R, Z, Pd, rho_old)


def cg_step_sharded_tiles(st: ShardedTiles, state, mesh: Mesh,
                          axis: str = "rows"):
    """One single-RHS CG iteration with the Pallas merge-tile kernel as
    the per-shard SpMV: all_gather the search direction over ICI, run
    the flagship kernel on the local slab, psum-reduce the dot products
    — the multi-chip expression of the reference CG recurrence
    (``work_2025/main/single_strategy.hpp:105-170``) on the kernel path
    rather than the XLA reference ops (``sharded.cg_step_sharded``).

    ``st`` must be built with ``shard_tiles(..., pad_layout_cols=True)``
    so the tile column indices address the all-gathered padded layout.
    ``state`` = (x, r, p, rs_old): (D*rows_per_shard,) row-sharded
    vectors in the padded shard layout + a replicated scalar.
    """

    def step(vals, lcols, epos, rblk, cblk, cspan, X, R, Pd, rs_old):
        Pd_full = jax.lax.all_gather(Pd, axis, axis=0, tiled=True)
        A = _local_tiles(st, vals, lcols, epos, rblk, cblk, cspan)
        AP = merge_spmv.spmv_merge(A, Pd_full)
        pAp = jax.lax.psum(_reduce_sum(Pd * AP, axis=0), axis)
        alpha = jnp.where(pAp == 0, 0.0, rs_old / pAp)
        Xn = X + alpha * Pd
        Rn = R - alpha * AP
        rs_new = jax.lax.psum(_reduce_sum(Rn * Rn, axis=0), axis)
        beta = jnp.where(rs_old == 0, 0.0, rs_new / rs_old)
        Pn = Rn + beta * Pd
        return Xn, Rn, Pn, rs_new

    X, R, Pd, rs_old = state
    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis), P()),
        check_vma=False,  # pallas_call has no varying-mesh-axes info
    )(st.vals, st.local_cols, st.end_pos, st.row_block, st.col_block,
      st.col_span, X, R, Pd, rs_old)
