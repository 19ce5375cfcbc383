"""Multi-RHS SpMM over merge tiles.

Capability parity with the reference SpMM kernels (``OmpCsrSpmmT``,
``OmpMergeCsrmm``, ``OmpNonzeroSplitCsrmm`` —
``work_2025/spmm/{row_splitting,merge_based,nonzero_splitting}.hpp``),
which fuse the L-RHS lane loop with ``#pragma omp simd``.

Current implementation maps the Pallas merge-tile SpMV kernel over the
RHS columns with ``lax.map`` (sequential scan — the kernel compiles
once; the matrix tile stream is re-read per column). A dedicated
multi-lane kernel that streams the matrix once and holds the RHS block
in VMEM is the planned next optimization (see ROADMAP.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpusparse.kernels.merge_spmv import DeviceTiles, spmv_merge


def spmm_merge(A: DeviceTiles, X, alpha=1.0, beta=0.0, Y=None):
    """Y = alpha * A @ X + beta * Y with X (num_cols, L)."""
    XT = jnp.transpose(X)  # (L, num_cols)
    YT = jax.lax.map(lambda xcol: spmv_merge(A, xcol), XT)
    Y_new = jnp.transpose(YT)  # (num_rows, L)
    if beta == 0.0 or Y is None:
        return alpha * Y_new
    return alpha * Y_new + beta * Y
