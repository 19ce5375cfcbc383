"""Chunked plans — Pallas kernels on matrices beyond the VMEM limits.

The merge kernel keeps x and y resident in VMEM, which caps a single
call at ~1.2M rows/columns. For larger matrices the ops layer splits
A into a grid of row/column blocks, runs the unmodified kernel per
block, and combines:

    y[ri] = sum over ci of  A[ri, ci] @ x[ci]

Each sub-block's nonzeros are streamed exactly once, so total matrix
traffic is unchanged; x is re-read once per row block (small against
the nnz stream). This is also the natural host-side expression of the
reference's NUMA-partitioned layout (sparse_matrix.h:691-697) — blocks
are independent device workloads.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from tpusparse.formats.csr import CsrMatrix

CHUNK_DIM = 4_194_304  # 4M, 128-aligned; each sub-block rides the
                       # raised scoped-vmem budget (merge_spmv._vmem_params)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ChunkedMerge:
    """Grid of per-block merge-tile plans.

    blocks[(ri, ci)] -> DeviceTiles for rows [row_off[ri], row_off[ri+1])
    x cols [col_off[ci], col_off[ci+1]); empty blocks are omitted.
    """

    num_rows: int
    num_cols: int
    row_off: tuple          # static row chunk offsets
    col_off: tuple          # static col chunk offsets
    keys: tuple             # static tuple of (ri, ci) for each plan
    plans: Any              # list of DeviceTiles, same order as keys

    def tree_flatten(self):
        return (
            (self.plans,),
            (self.num_rows, self.num_cols, self.row_off, self.col_off,
             self.keys),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, children[0])

    @property
    def dtype(self):
        return self.plans[0].dtype


def build_chunked_merge(csr: CsrMatrix, chunk_dim: int = CHUNK_DIM,
                        dtype=np.float32, **tile_kwargs) -> ChunkedMerge:
    """Split a host CSR into a block grid and merge-tile each block.

    Each block is an independent single-chip plan, so without explicit
    ``tile_kwargs`` every block runs the per-matrix partition-family
    chooser (``choose_partition``) — scattered blocks of a huge matrix
    get the greedy variable-width partition, banded blocks keep the
    classic gap-split windows."""
    from tpusparse.formats.tiles import build_merge_tiles, choose_partition
    from tpusparse.kernels import merge_spmv

    assert chunk_dim % 128 == 0
    M, N = csr.num_rows, csr.num_cols
    row_off = list(range(0, M, chunk_dim)) + [M]
    col_off = list(range(0, N, chunk_dim)) + [N]

    ro = np.asarray(csr.row_offsets).astype(np.int64)
    ci = np.asarray(csr.col_indices).astype(np.int64)
    va = np.asarray(csr.values)
    rows = np.repeat(np.arange(M, dtype=np.int64), np.diff(ro))

    keys, plans = [], []
    for ri in range(len(row_off) - 1):
        r0, r1 = row_off[ri], row_off[ri + 1]
        in_rows = slice(int(ro[r0]), int(ro[r1]))
        sub_rows = rows[in_rows] - r0
        sub_cols = ci[in_rows]
        sub_vals = va[in_rows]
        for cj in range(len(col_off) - 1):
            c0, c1 = col_off[cj], col_off[cj + 1]
            m = (sub_cols >= c0) & (sub_cols < c1)
            if not m.any():
                continue
            rr = sub_rows[m]
            counts = np.bincount(rr, minlength=r1 - r0)
            offs = np.zeros(r1 - r0 + 1, dtype=np.int64)
            np.cumsum(counts, out=offs[1:])
            order = np.argsort(rr, kind="stable")
            sub = CsrMatrix(
                r1 - r0, c1 - c0, offs,
                (sub_cols[m][order] - c0).astype(np.int32),
                sub_vals[m][order],
            )
            keys.append((ri, cj))
            tiles = (build_merge_tiles(sub, **tile_kwargs)
                     if tile_kwargs else choose_partition(sub))
            plans.append(
                merge_spmv.to_device_tiles(tiles, dtype=dtype)
            )
    return ChunkedMerge(
        num_rows=M, num_cols=N,
        row_off=tuple(row_off), col_off=tuple(col_off),
        keys=tuple(keys), plans=plans,
    )


def spmv_chunked(A: ChunkedMerge, x, alpha=1.0, beta=0.0, y=None):
    from tpusparse.kernels import merge_spmv

    parts = {}
    for (ri, cj), plan in zip(A.keys, A.plans):
        xc = jax.lax.slice_in_dim(
            x, A.col_off[cj], A.col_off[cj + 1]
        )
        contrib = merge_spmv.spmv_merge(plan, xc)
        parts[ri] = contrib if ri not in parts else parts[ri] + contrib
    n_r = len(A.row_off) - 1
    zero = lambda ri: jnp.zeros(
        (A.row_off[ri + 1] - A.row_off[ri],), dtype=A.dtype
    )
    y_new = jnp.concatenate(
        [parts.get(ri, zero(ri)) for ri in range(n_r)]
    )
    if beta == 0.0 or y is None:
        return alpha * y_new
    return alpha * y_new + beta * y


def spmm_chunked(A: ChunkedMerge, X, alpha=1.0, beta=0.0, Y=None):
    """Block-grid SpMM: the in-kernel multi-RHS merge kernel
    (kernels/spmm_merge) per sub-block — each block's payload streams
    once for all L lanes, mirroring the single-call path."""
    from tpusparse.kernels.spmm_merge import spmm_merge

    L = X.shape[1]
    parts = {}
    for (ri, cj), plan in zip(A.keys, A.plans):
        Xc = jax.lax.slice_in_dim(
            X, A.col_off[cj], A.col_off[cj + 1]
        )
        contrib = spmm_merge(plan, Xc)
        parts[ri] = contrib if ri not in parts else parts[ri] + contrib
    n_r = len(A.row_off) - 1
    zero = lambda ri: jnp.zeros(
        (A.row_off[ri + 1] - A.row_off[ri], L), dtype=A.dtype
    )
    Y_new = jnp.concatenate(
        [parts.get(ri, zero(ri)) for ri in range(n_r)]
    )
    if beta == 0.0 or Y is None:
        return alpha * Y_new
    return alpha * Y_new + beta * Y
