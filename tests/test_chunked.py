"""Chunked merge plans: Pallas kernels beyond the VMEM dim limit
(tested with an artificially small chunk size)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.io import generators
from tpusparse.ops.chunked import (
    build_chunked_merge,
    spmv_chunked,
    spmm_chunked,
)


def test_chunked_spmv_matches(rng):
    csr = generators.make_laplacian_grid2d(24).to_csr()  # 576 rows
    A = build_chunked_merge(csr, chunk_dim=256)
    assert len(A.keys) > 1  # actually chunked
    x = rng.standard_normal(csr.num_cols).astype(np.float32)
    y = np.asarray(spmv_chunked(A, jnp.asarray(x)))
    expect = csr.to_scipy().astype(np.float32) @ x
    scale = np.abs(expect).max() + 1.0
    np.testing.assert_allclose(y / scale, expect / scale, atol=2e-5)


def test_chunked_spmm_matches(rng):
    csr = generators.make_laplacian_grid2d(16).to_csr()
    A = build_chunked_merge(csr, chunk_dim=128)
    X = rng.standard_normal((csr.num_cols, 4)).astype(np.float32)
    Y = np.asarray(spmm_chunked(A, jnp.asarray(X)))
    expect = csr.to_scipy().astype(np.float32) @ X
    scale = np.abs(expect).max() + 1.0
    np.testing.assert_allclose(Y / scale, expect / scale, atol=2e-5)


def test_chunked_rect_with_empty_blocks(rng):
    # rectangular + a fully empty block row region
    from tpusparse.formats.coo import CooMatrix
    from tpusparse.formats.csr import CsrMatrix

    rows = np.array([0, 1, 300, 301], dtype=np.int32)
    cols = np.array([5, 400, 2, 399], dtype=np.int32)
    vals = rng.standard_normal(4)
    csr = CsrMatrix.from_coo(CooMatrix(320, 512, rows, cols, vals))
    A = build_chunked_merge(csr, chunk_dim=256)
    x = rng.standard_normal(512).astype(np.float32)
    y = np.asarray(spmv_chunked(A, jnp.asarray(x)))
    expect = csr.to_scipy().astype(np.float32) @ x
    np.testing.assert_allclose(y, expect, atol=1e-5)


@pytest.mark.slow
def test_chunked_scattered_uses_chooser(rng):
    """Blocks of a scattered matrix run the partition-family chooser
    independently (greedy where window clustering shatters) and the
    chunked SpMV stays exact."""
    import jax.numpy as jnp

    from tpusparse.io import generators
    from tpusparse.ops.chunked import build_chunked_merge, spmv_chunked

    csr = generators.make_rmat(13, edge_factor=4, seed=2).to_csr()
    csr = csr.astype(np.float32)
    A = build_chunked_merge(csr, chunk_dim=4096)
    x = rng.standard_normal(csr.num_cols).astype(np.float32)
    y = np.asarray(spmv_chunked(A, jnp.asarray(x)))
    ref = csr.to_scipy() @ x.astype(np.float64)
    scale = np.abs(ref).max() + 1.0
    assert np.abs(y - ref).max() / scale < 1e-5
