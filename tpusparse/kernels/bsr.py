"""BCSR (block-sparse row) SpMV/SpMM — MXU panel kernel.

Capability parity with the reference's BCSR format
(``/root/reference/sparse_matrix.h:993-1258``), re-targeted at TPU
compute shapes: blocks are dense (block_rows x block_cols) panels —
(8, 128) VPU tiles or (128, 128) MXU tiles — so the per-block multiply
is a dense contraction on the matrix unit.

Two paths:
  * ``bsr_spmm_pallas`` — the panel kernel: block panels and their RHS
    blocks stream from HBM via scalar-prefetched BlockSpec index maps
    (the block-column array drives the X DMA), each grid step runs one
    (br, bc) x (bc, L) MXU matmul and accumulates into the revisited
    (br, L) output panel (TPU grid steps are sequential — no atomics).
    No VMEM residency limit: only three panels are live per step.
  * XLA fallback (einsum + segment_sum) for shapes the kernel doesn't
    tile (br not a multiple of 8 / bc not a multiple of 128) and for
    off-TPU fp64.

Profitable when the blocking fill ratio is high; ``ops.spmv`` AUTO
gates on ``formats.bcsr.fill_estimate``.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.kernels._util import kernel_no_x64


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tileable(bcsr) -> bool:
    return (
        bcsr.block_rows % 8 == 0
        and bcsr.block_cols % 128 == 0
        and bcsr.num_blocks > 0
    )


def _block_meta(bcsr):
    """(brow, new) per block: output panel index + first-of-row flag."""
    bro = np.asarray(bcsr.block_row_offsets)
    nbr = bro.shape[0] - 1
    counts = np.diff(bro)
    brow = np.repeat(np.arange(nbr, dtype=np.int32), counts)
    new = np.zeros(brow.shape[0], dtype=np.int32)
    new[bro[:-1][counts > 0]] = 1
    return jnp.asarray(brow), jnp.asarray(new)


def _bsr_kernel(brow_ref, new_ref, bci_ref, blocks_ref, x_ref, y_ref):
    t = pl.program_id(0)

    @pl.when(new_ref[t] == 1)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    y_ref[0] = y_ref[0] + jax.lax.dot_general(
        blocks_ref[0], x_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=y_ref.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("nbr",))
@kernel_no_x64
def _bsr_spmm_panels_static(brow, new, bci, blocks, Xb, nbr: int):
    nb, br, bc = blocks.shape
    L = Xb.shape[2]
    return pl.pallas_call(
        _bsr_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # brow, new, bci
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, br, bc),
                             lambda i, rb, nw, cb: (i, 0, 0)),
                # the block-column array drives the RHS panel DMA
                pl.BlockSpec((1, bc, L),
                             lambda i, rb, nw, cb: (cb[i], 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, br, L), lambda i, rb, nw, cb: (rb[i], 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((nbr, br, L), blocks.dtype),
        interpret=_interpret(),
    )(brow, new, bci, blocks, Xb)


def bsr_spmm_pallas(bcsr, X):
    """Y = A @ X via the MXU panel kernel; X (num_cols, L)."""
    br, bc = bcsr.block_rows, bcsr.block_cols
    L = X.shape[1]
    Lp = max(-(-L // 8) * 8, 8)
    nbc = -(-bcsr.num_cols // bc)
    Xp = jnp.zeros((nbc * bc, Lp), dtype=bcsr.blocks.dtype)
    Xp = Xp.at[: bcsr.num_cols, :L].set(X.astype(bcsr.blocks.dtype))
    Xb = Xp.reshape(nbc, bc, Lp)
    brow, new = _block_meta(bcsr)
    nbr = -(-bcsr.num_rows // br)
    Y = _bsr_spmm_panels_static(brow, new, bcsr.block_col_indices,
                                bcsr.blocks, Xb, nbr)
    return Y.reshape(-1, Lp)[: bcsr.num_rows, :L]


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
    if _tileable(bcsr) and np.dtype(bcsr.blocks.dtype).itemsize <= 4:
        y_new = bsr_spmm_pallas(bcsr, x[:, None])[:, 0]
        if beta == 0.0 or y is None:
            return alpha * y_new
        return alpha * y_new + beta * y
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
    if _tileable(bcsr) and np.dtype(bcsr.blocks.dtype).itemsize <= 4:
        Y_new = bsr_spmm_pallas(bcsr, X)
        if beta == 0.0 or Y is None:
            return alpha * Y_new
        return alpha * Y_new + beta * Y
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
