"""BCSR (block-sparse row) SpMV/SpMM.

Capability parity with the reference's BCSR format
(``/root/reference/sparse_matrix.h:993-1258``), re-targeted at TPU
compute shapes: blocks are dense (block_rows x block_cols) panels —
(8, 128) VPU tiles or (128, 128) MXU tiles — so the per-block multiply
is a dense contraction XLA maps straight onto the vector/matrix units.

Current implementation is XLA-level (einsum over gathered x blocks +
segment_sum over block rows); profitable when the blocking fill ratio
is high (use ``BcsrMatrix.fill_ratio`` to decide). A Pallas panel
kernel with scalar-prefetched block columns is the planned upgrade.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _block_row_ids(bcsr):
    nb = bcsr.block_col_indices.shape[0]
    return (
        jnp.searchsorted(
            bcsr.block_row_offsets,
            jnp.arange(nb, dtype=bcsr.block_row_offsets.dtype),
            side="right",
        )
        - 1
    ).astype(jnp.int32)


def bsr_spmv(bcsr, x, alpha=1.0, beta=0.0, y=None):
    """y = alpha * A @ x + beta * y from a device BcsrMatrix."""
    br, bc = bcsr.block_rows, bcsr.block_cols
    nbc = -(-bcsr.num_cols // bc)
    xp = jnp.zeros((nbc * bc,), dtype=bcsr.blocks.dtype)
    xp = xp.at[: bcsr.num_cols].set(x.astype(bcsr.blocks.dtype))
    xb = xp.reshape(nbc, bc)

    xg = jnp.take(xb, bcsr.block_col_indices, axis=0)      # (nb, bc)
    contrib = jnp.einsum(
        "bij,bj->bi", bcsr.blocks, xg,
        preferred_element_type=bcsr.blocks.dtype,
    )                                                       # (nb, br)
    rows = _block_row_ids(bcsr)
    nbr = -(-bcsr.num_rows // br)
    ypanels = jax.ops.segment_sum(contrib, rows, num_segments=nbr)
    y_new = ypanels.reshape(-1)[: bcsr.num_rows]
    if beta == 0.0 or y is None:
        return alpha * y_new
    return alpha * y_new + beta * y


def bsr_spmm(bcsr, X, alpha=1.0, beta=0.0, Y=None):
    """Y = alpha * A @ X + beta * Y, X (num_cols, L). Block panels hit
    the MXU as (br, bc) x (bc, L) matmuls."""
    br, bc = bcsr.block_rows, bcsr.block_cols
    L = X.shape[1]
    nbc = -(-bcsr.num_cols // bc)
    Xp = jnp.zeros((nbc * bc, L), dtype=bcsr.blocks.dtype)
    Xp = Xp.at[: bcsr.num_cols].set(X.astype(bcsr.blocks.dtype))
    Xb = Xp.reshape(nbc, bc, L)

    Xg = jnp.take(Xb, bcsr.block_col_indices, axis=0)      # (nb, bc, L)
    contrib = jnp.einsum(
        "bij,bjl->bil", bcsr.blocks, Xg,
        preferred_element_type=bcsr.blocks.dtype,
    )                                                       # (nb, br, L)
    rows = _block_row_ids(bcsr)
    nbr = -(-bcsr.num_rows // br)
    Ypanels = jax.ops.segment_sum(contrib, rows, num_segments=nbr)
    Y_new = Ypanels.reshape(-1, L)[: bcsr.num_rows]
    if beta == 0.0 or Y is None:
        return alpha * Y_new
    return alpha * Y_new + beta * Y
