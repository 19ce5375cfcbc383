"""Golden-model sparse ops in plain jnp — the correctness trust anchor.

These mirror the reference's sequential golden model ``SpmvGold``
(``/root/reference/work_2025/spmm/sample.hpp:14-34``): y = alpha*A@x + beta*y.
They are pure XLA (gather + segment_sum), differentiable, and run on any
backend — used as the oracle in tests and as the fallback path for
matrices/dtypes the Pallas kernels don't cover.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def expand_row_ids(row_offsets, nnz: int):
    """Per-nonzero row ids from CSR row offsets, shape (nnz,).

    XLA-friendly expansion: searchsorted over the offsets. Traceable
    (static nnz)."""
    # row_id[k] = (number of row starts <= k) - 1
    return (
        jnp.searchsorted(row_offsets, jnp.arange(nnz, dtype=row_offsets.dtype),
                         side="right") - 1
    ).astype(jnp.int32)


def spmv_reference(csr, x, alpha=1.0, beta=0.0, y=None):
    """y = alpha * A @ x + beta * y (golden model, parity with SpmvGold)."""
    nnz = csr.col_indices.shape[0]
    rows = expand_row_ids(csr.row_offsets, nnz)
    gathered = jnp.take(x, csr.col_indices)
    y_new = jax.ops.segment_sum(
        csr.values * gathered, rows, num_segments=csr.num_rows
    )
    if beta == 0.0 or y is None:
        return alpha * y_new
    return alpha * y_new + beta * y


def spmm_reference(csr, X, alpha=1.0, beta=0.0, Y=None):
    """Y = alpha * A @ X + beta * Y with X (num_cols, L) — golden SpMM
    (parity with the multi-RHS drivers, cpu_spmm_v2.cpp)."""
    nnz = csr.col_indices.shape[0]
    rows = expand_row_ids(csr.row_offsets, nnz)
    gathered = jnp.take(X, csr.col_indices, axis=0)  # (nnz, L)
    Y_new = jax.ops.segment_sum(
        csr.values[:, None] * gathered, rows, num_segments=csr.num_rows
    )
    if beta == 0.0 or Y is None:
        return alpha * Y_new
    return alpha * Y_new + beta * Y


def spmv_coo(rows, cols, vals, x, num_rows: int):
    """COO SpMV fragment — used for the merge-tile overflow stream."""
    if vals.shape[0] == 0:
        return jnp.zeros((num_rows,), dtype=vals.dtype)
    return jax.ops.segment_sum(
        vals * jnp.take(x, cols), rows, num_segments=num_rows
    )


def spmm_coo(rows, cols, vals, X, num_rows: int):
    if vals.shape[0] == 0:
        return jnp.zeros((num_rows, X.shape[1]), dtype=vals.dtype)
    return jax.ops.segment_sum(
        vals[:, None] * jnp.take(X, cols, axis=0), rows, num_segments=num_rows
    )


def to_bcoo(csr, dtype=None):
    """Convert to jax.experimental.sparse BCOO — the JAX ecosystem's
    built-in sparse type, benchmarked as the vendor-baseline analogue of
    the reference's MKL comparisons (cpu_spmv.cpp:631-664)."""
    import jax.experimental.sparse as jsparse

    rows = jnp.asarray(
        np.repeat(
            np.arange(csr.num_rows, dtype=np.int32),
            np.diff(np.asarray(csr.row_offsets)),
        )
    )
    idx = jnp.stack(
        [rows, jnp.asarray(np.asarray(csr.col_indices), dtype=jnp.int32)],
        axis=1,
    )
    vals = np.asarray(csr.values)
    if dtype is not None:
        vals = vals.astype(dtype)
    return jsparse.BCOO(
        (jnp.asarray(vals), idx),
        shape=(csr.num_rows, csr.num_cols),
    )


def spmv_numpy(csr, x, alpha=1.0, beta=0.0, y=None):
    """Pure-numpy golden model (host oracle, independent of XLA)."""
    ro = np.asarray(csr.row_offsets)
    ci = np.asarray(csr.col_indices)
    va = np.asarray(csr.values)
    x = np.asarray(x)
    lengths = np.diff(ro)
    rows = np.repeat(np.arange(csr.num_rows), lengths)
    y_new = np.zeros(csr.num_rows, dtype=np.result_type(va, x))
    np.add.at(y_new, rows, va * x[ci])
    if beta == 0.0 or y is None:
        return alpha * y_new
    return alpha * y_new + beta * np.asarray(y)
