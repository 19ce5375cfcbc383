"""Randomized cross-strategy fuzzing — many small random matrices with
assorted shapes/densities through every kernel against the numpy
oracle (the property-test layer SURVEY §4 calls for)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.formats.coo import CooMatrix
from tpusparse.formats.csr import CsrMatrix
from tpusparse.formats.ell import build_ell_tiles
from tpusparse.formats.tiles import (
    build_merge_tiles,
    choose_partition,
    tiles_to_dense,
)
from tpusparse.io import generators
from tpusparse.kernels import ell_spmm, merge_spmv
from tpusparse.ops.reference import spmv_numpy


def random_matrix(rng, seed):
    r = np.random.default_rng(seed)
    m = int(r.integers(1, 400))
    n = int(r.integers(1, 400))
    nnz = int(r.integers(1, max(m * n // 4, 2)))
    shape_kind = seed % 4
    rows = r.integers(0, m, nnz).astype(np.int32)
    if shape_kind == 0:      # uniform random
        cols = r.integers(0, n, nnz).astype(np.int32)
    elif shape_kind == 1:    # banded
        cols = np.clip(rows * n // m + r.integers(-8, 9, nnz), 0,
                       n - 1).astype(np.int32)
    elif shape_kind == 2:    # few hot columns
        cols = r.choice(
            r.integers(0, n, max(n // 16, 1)), nnz
        ).astype(np.int32)
    else:                    # skewed rows (one hub)
        rows[: nnz // 2] = 0
        cols = r.integers(0, n, nnz).astype(np.int32)
    vals = r.standard_normal(nnz)
    return CsrMatrix.from_coo(
        CooMatrix(m, n, rows, cols, vals), sum_dups=True
    )


@pytest.mark.parametrize("seed", [
    pytest.param(s, marks=pytest.mark.slow if s >= 3 else [])
    for s in range(12)
])
def test_fuzz_kernels_vs_oracle(seed, rng):
    csr = random_matrix(rng, seed)
    x = np.random.default_rng(seed + 999).standard_normal(csr.num_cols)
    golden = spmv_numpy(csr, x)
    scale = np.abs(golden).max() + 1.0

    # partition losslessness
    t = build_merge_tiles(csr)
    np.testing.assert_allclose(
        tiles_to_dense(t), csr.to_dense(), rtol=1e-12, atol=1e-12
    )

    # merge kernel
    Am = merge_spmv.to_device_tiles(t, dtype=np.float32)
    ym = np.asarray(
        merge_spmv.spmv_merge(Am, jnp.asarray(x.astype(np.float32)))
    )
    np.testing.assert_allclose(ym / scale, golden / scale, atol=5e-5)

    # per-matrix partition chooser (family + parameters) end to end:
    # degenerate shapes (1-row, tiny-nnz, hot-column) exercise the
    # greedy cut logic and the native builders' edge cases
    tc = choose_partition(csr)
    Ac = merge_spmv.to_device_tiles(tc, dtype=np.float32)
    yc = np.asarray(
        merge_spmv.spmv_merge(Ac, jnp.asarray(x.astype(np.float32)))
    )
    np.testing.assert_allclose(yc / scale, golden / scale, atol=5e-5)

    # gather-job kernel (as SpMM with L=8)
    Ae = ell_spmm.to_device_ell(build_ell_tiles(csr), dtype=np.float32)
    X = np.tile(x[:, None], (1, 8)).astype(np.float32)
    Ye = np.asarray(ell_spmm.spmm_ell(Ae, jnp.asarray(X)))
    np.testing.assert_allclose(
        Ye[:, 0] / scale, golden / scale, atol=5e-5
    )


def test_cg_single_merge_plan(rng):
    """Single-RHS CG on the Pallas merge plan (cpu_singlecg parity on
    the fast path): converges to the fp32-appropriate tolerance."""
    from tpusparse.ops.spmv import plan_matrix
    from tpusparse.solvers.cg import cg_solve

    csr = generators.make_laplacian_grid2d(16).to_csr()
    A = plan_matrix(csr, strategy="merge", dtype=np.float32)
    b = rng.standard_normal(csr.num_rows).astype(np.float32)
    res = cg_solve(A, jnp.asarray(b), max_iters=1000, tolerance=1e-5)
    assert bool(res.converged)
    x = np.asarray(res.x)
    rel = np.linalg.norm(b - csr.to_scipy() @ x) / np.linalg.norm(b)
    assert rel < 1e-4


@pytest.mark.parametrize("seed", [
    pytest.param(s, marks=pytest.mark.slow if s >= 3 else [])
    for s in range(8)
])
def test_fuzz_edge_halo_stream_kernels(seed):
    """Edge-halo stream kernels (f32 + double-float) against scipy on
    random banded matrices: random offset sets (lane-crossing, exact
    block-boundary, r==0 multiples of 128), random block_rows, ragged
    n, random L — the geometry space the static E/q/r decomposition
    must cover."""
    import scipy.sparse as sp

    from tpusparse.formats.dia import partition_dia
    from tpusparse.kernels.dia_stream import (
        fits_stream,
        padded_cols,
        padded_cols_df,
        spmm_dia_stream_df_t,
        spmm_dia_stream_t,
        spmm_dia_stream_tp,
        to_device_dia_stream,
        to_device_dia_stream_df,
    )

    r = np.random.default_rng(1000 + seed)
    blk = int(r.choice([256, 512, 1024]))
    n = int(r.integers(blk // 2, 3 * blk + 7))
    K = int(r.integers(1, 8))
    cand = np.unique(np.concatenate([
        r.integers(-blk, blk + 1, K),
        [0],                       # keep the main diagonal
        r.choice([-blk, blk, -128, 128, -256, 256], 2),
    ]))
    offsets = np.array(
        [o for o in cand if abs(o) < n and abs(o) <= blk],
        dtype=np.int64,
    )
    assert fits_stream(offsets, block_rows=blk)
    diags = [r.standard_normal(n - abs(int(o))) for o in offsets]
    A = sp.diags(diags, offsets, shape=(n, n), format="csr")
    csr = CsrMatrix.from_scipy(A.tocsr())
    dia, rest = partition_dia(csr, offsets)
    assert rest.nnz == 0
    L = int(r.integers(1, 6))
    XT = r.standard_normal((L, n))
    refM = (A @ XT.T).T

    D = to_device_dia_stream(dia, block_rows=blk)
    YT = np.asarray(spmm_dia_stream_t(D, jnp.asarray(XT.astype(np.float32))))
    scale = max(np.abs(refM).max(), 1e-6)
    np.testing.assert_allclose(YT / scale, refM / scale, atol=5e-5)
    # padded entry: zero tail in, zero tail out
    np_ = padded_cols(D)
    XTP = np.zeros((L, np_), np.float32)
    XTP[:, :n] = XT
    YTP = np.asarray(spmm_dia_stream_tp(D, jnp.asarray(XTP)))
    np.testing.assert_array_equal(YTP[:, n:], 0.0)
    np.testing.assert_allclose(YTP[:, :n] / scale, refM / scale,
                               atol=5e-5)

    Ddf = to_device_dia_stream_df(dia, block_rows=blk)
    assert padded_cols_df(Ddf) == np_
    YTd = np.asarray(spmm_dia_stream_df_t(Ddf, jnp.asarray(XT)))
    np.testing.assert_allclose(YTd / scale, refM / scale, atol=1e-12)
