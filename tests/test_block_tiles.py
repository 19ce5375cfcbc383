"""Block-list merge partition (formats.tiles.build_block_tiles) and the
kernels' block-list gather mode.

Reference capability: the merge-based SpMV's equal-nnz load balancing on
scattered matrices (``cub/agent/agent_spmv_orig.cuh:289-406``). The
block list is the TPU re-design that keeps tile occupancy high on
power-law patterns where contiguous-window clustering shatters.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpusparse.formats.coo import CooMatrix
from tpusparse.formats.csr import CsrMatrix
from tpusparse.formats.tiles import (
    LANES,
    build_block_tiles,
    build_merge_tiles,
    choose_partition,
    tiles_to_dense,
)
from tpusparse.kernels.merge_spmv import to_device_tiles, spmv_merge
from tpusparse.kernels.spmm_merge import spmm_merge


def _random_csr(rng, n, nnz, scale=1.0):
    r = rng.integers(0, n, nnz).astype(np.int64)
    c = rng.integers(0, n, nnz).astype(np.int64)
    v = rng.standard_normal(nnz) * scale
    coo = CooMatrix(n, n, r, c, v)
    return CsrMatrix.from_coo(coo), r, c, v


def _dense_of(csr):
    d = np.zeros((csr.num_rows, csr.num_cols), dtype=np.float64)
    ro = np.asarray(csr.row_offsets)
    for i in range(csr.num_rows):
        for p in range(ro[i], ro[i + 1]):
            d[i, csr.col_indices[p]] += csr.values[p]
    return d


@pytest.mark.parametrize("n,nnz,wr,G", [
    (700, 6000, 256, 4),
    (300, 200, 128, 2),       # supersparse: block budget binds
    (512, 20000, 512, 8),     # dense-ish: nnz budget binds
])
def test_block_partition_lossless(rng, n, nnz, wr, G):
    csr, _, _, _ = _random_csr(rng, n, nnz)
    t = build_block_tiles(csr, row_window=wr, max_blocks=G)
    assert t.blk_list is not None
    assert int(t.col_span.max()) <= G
    # every tile's rows stay inside one aligned row window; slots are
    # row-sorted (end_pos monotonicity is by construction)
    np.testing.assert_allclose(tiles_to_dense(t), _dense_of(csr),
                               rtol=1e-12)


def test_block_partition_occupancy_beats_window_on_skewed():
    # supersparse power-law pattern: the gap-split window cells come
    # out underfull; the greedy cut keeps packing high
    from tpusparse.io import generators

    csr = generators.make_rmat(13, edge_factor=4, seed=2).to_csr()
    win = build_merge_tiles(csr, row_window=1024, col_window=2048)
    for contig in (False, True):
        blk = build_block_tiles(csr, max_blocks=16, contiguous=contig)
        assert blk.occupancy > win.occupancy + 0.05
        assert blk.occupancy > 0.8


def test_spmv_block_tiles_matches_oracle(rng):
    n, nnz = 2000, 40000
    csr, r, c, v = _random_csr(rng, n, nnz)
    t = build_block_tiles(csr, row_window=512, max_blocks=8)
    A = to_device_tiles(t, dtype=np.float32)
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(spmv_merge(A, jnp.asarray(x)))
    ref = np.zeros(n)
    np.add.at(ref, r, v * x[c].astype(np.float64))
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_spmm_block_tiles_matches_oracle(rng):
    n, nnz, L = 900, 12000, 8
    csr, r, c, v = _random_csr(rng, n, nnz)
    t = build_block_tiles(csr, row_window=256, max_blocks=4)
    A = to_device_tiles(t, dtype=np.float32)
    X = rng.standard_normal((n, L)).astype(np.float32)
    Y = np.asarray(spmm_merge(A, jnp.asarray(X)))
    ref = np.zeros((n, L))
    np.add.at(ref, r, v[:, None] * X[c].astype(np.float64))
    assert np.abs(Y - ref).max() / np.abs(ref).max() < 1e-4


def test_spmv_block_tiles_df_matches_float64(rng):
    from tpusparse.kernels.merge_df import (
        to_device_tiles_df, spmv_merge_df,
    )

    n, nnz = 900, 12000
    csr, r, c, v = _random_csr(rng, n, nnz)
    t = build_block_tiles(csr, row_window=256, max_blocks=4)
    A = to_device_tiles_df(t)
    x = rng.standard_normal(n)
    y = np.asarray(spmv_merge_df(A, jnp.asarray(x)))
    ref = np.zeros(n)
    np.add.at(ref, r, v * x[c])
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-12


def test_choose_partition_families():
    # banded stencil / well-packing patterns keep the classic gap-split
    # window partition (its row-span classes win whenever occupancy
    # holds up — measured 20.0 vs 15.4 GF on rmat-14)
    from tpusparse.io import generators

    lap = generators.make_laplacian_grid2d(48, dtype=np.float64).to_csr()
    t = choose_partition(lap)
    assert t.span_class_by == "row" and t.blk_list is None
    # heavy-skew power-law (classic occupancy shatters) routes to the
    # greedy variable-width window partition (measured 13.9 vs 6.4 GF
    # on rmat-16)
    rm = generators.make_rmat(13, edge_factor=4, seed=2).to_csr()
    t2 = choose_partition(rm)
    assert t2.span_class_by == "col"
    assert t2.occupancy > 0.55


def test_plan_matrix_merge_greedy_on_skewed(rng):
    from tpusparse.io import generators
    from tpusparse.ops.spmv import plan_matrix, spmv
    from tpusparse.kernels.merge_spmv import ClassedTiles

    m = generators.make_rmat(13, edge_factor=4, seed=2)
    csr = m.to_csr()
    A = plan_matrix(csr, strategy="merge", dtype=np.float32)
    x = rng.standard_normal(csr.num_cols).astype(np.float32)
    y = np.asarray(spmv(A, jnp.asarray(x)))
    ref = np.zeros(csr.num_rows)
    ro = np.asarray(csr.row_offsets)
    for i in range(csr.num_rows):
        lo, hi = ro[i], ro[i + 1]
        ref[i] = np.dot(csr.values[lo:hi],
                        x[csr.col_indices[lo:hi]].astype(np.float64))
    assert np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-30) < 1e-4


@pytest.mark.slow
def test_native_block_tiles_parity(rng):
    """Native builder (native/src/block_tiles.cpp) vs numpy: identical
    index structures; values compared through the dense reconstruction
    (duplicate (row, col) entries have no defined relative order in
    either builder, so raw slot values may permute within a duplicate
    group while every sum is identical)."""
    import os

    from tpusparse.utils import native

    if not native.available():
        pytest.skip("native library unavailable")
    from tpusparse.io import generators

    fixtures = [
        _random_csr(rng, 700, 6000)[0],
        generators.make_rmat(12, edge_factor=8, seed=3).to_csr(),
        generators.make_laplacian_grid2d(48, dtype=np.float64).to_csr(),
    ]
    for csr in fixtures:
        for contig in (False, True):
            for wr, G in [(1024, 16), (256, 4)]:
                os.environ["TPUSPARSE_NO_NATIVE"] = "1"
                try:
                    a = build_block_tiles(csr, row_window=wr,
                                          max_blocks=G,
                                          contiguous=contig)
                finally:
                    os.environ.pop("TPUSPARSE_NO_NATIVE", None)
                b = build_block_tiles(csr, row_window=wr, max_blocks=G,
                                      contiguous=contig)
                assert np.array_equal(a.local_cols, b.local_cols)
                assert np.array_equal(a.end_pos, b.end_pos)
                assert np.array_equal(a.row_block, b.row_block)
                assert np.array_equal(a.col_block, b.col_block)
                assert np.array_equal(a.col_span, b.col_span)
                if contig:
                    assert a.blk_list is None and b.blk_list is None
                else:
                    w = a.blk_list.shape[1]
                    assert np.array_equal(a.blk_list,
                                          b.blk_list[:, :w])
                np.testing.assert_allclose(
                    tiles_to_dense(a), tiles_to_dense(b), rtol=1e-12)


def test_span_classed_block_plan_roundtrip(rng):
    # enough tiles to trigger span classing on a skewed pattern: a few
    # hub columns + scattered background
    from tpusparse.kernels.merge_spmv import ClassedTiles

    n = 8192
    rng_l = np.random.default_rng(5)
    nnz_bg, nnz_hub = 150000, 50000
    r = np.concatenate([rng_l.integers(0, n, nnz_bg),
                        rng_l.integers(0, n, nnz_hub)])
    c = np.concatenate([rng_l.integers(0, n, nnz_bg),
                        rng_l.integers(0, 16, nnz_hub)])
    v = rng_l.standard_normal(len(r))
    csr = CsrMatrix.from_coo(
        CooMatrix(n, n, r.astype(np.int64), c.astype(np.int64), v))
    t = build_block_tiles(csr, max_blocks=16)
    A = to_device_tiles(t, dtype=np.float32)
    x = rng_l.standard_normal(n).astype(np.float32)
    y = np.asarray(spmv_merge(A, jnp.asarray(x)))
    ref = np.zeros(n)
    np.add.at(ref, r, v * x[c].astype(np.float64))
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5
    if isinstance(A, ClassedTiles):
        assert all(p.blk_list is not None for p in A.plans)


def test_nnz_split_strategy(rng):
    """The pure equal-nnz partition (reference NONZERO_SPLIT,
    nonzero_splitting.hpp:19-152) is its own plan family: cuts only at
    tile_nnz / row-window boundaries (no block-budget clustering), and
    the strategy dispatches numerically through ops.spmv."""
    from tpusparse.formats.tiles import build_nnz_split_tiles
    from tpusparse.io import generators
    from tpusparse.ops.spmv import plan_matrix, spmv

    csr = generators.make_rmat(11, edge_factor=8, seed=3,
                               dtype=np.float32).to_csr()
    t = build_nnz_split_tiles(csr)
    # no cut can come from the block budget: every tile except the
    # LAST of each row window must be exactly full (slot count ==
    # tile_nnz). Recover per-tile real slot counts from the dense
    # reconstruction-free invariant: occupancy * ntiles * tile_nnz =
    # nnz, and per row window the tile sequence is full..full,partial.
    rb = np.asarray(t.row_block)
    win = rb // (t.row_window // LANES)
    slots = np.asarray([
        int((np.asarray(t.vals)[i] != 0).sum()) for i in range(t.ntiles)
    ])
    # conservative check (zeros in vals undercount): every non-last
    # tile of a window must hold > tile_nnz - 128 genuine slots —
    # impossible if the (removed) block budget were cutting early
    for w in np.unique(win):
        idx = np.where(win == w)[0]
        assert (slots[idx[:-1]] > t.tile_nnz - 128).all(), (w, slots[idx])
    assert t.occupancy > 0.9  # equal-nnz packing is near-perfect
    A = plan_matrix(csr, strategy="nonzero_split", dtype=np.float32)
    x = rng.standard_normal(csr.num_cols).astype(np.float32)
    y = np.asarray(spmv(A, jnp.asarray(x)))
    ref = csr.to_scipy() @ x
    assert np.abs(y - ref).max() / (np.abs(ref).max() + 1) < 1e-5
    # fp64 routes to the double-float merge kernel family
    A64 = plan_matrix(csr, strategy="nonzero_split", dtype=np.float64)
    from tpusparse.ops.spmv import plan_kind, plan_semantics

    assert plan_semantics(A64) == "double-float(~1e-14)"
    # plan_kind itself (not a CLI-side string patch) labels the family
    # — enum callers and the real-matrix battery see the right row
    # label too (ADVICE r4)
    assert plan_kind(A) == "nonzero_split"
    assert plan_kind(A64) == "nonzero_split_df64"
    B = plan_matrix(csr, strategy="merge", dtype=np.float32)
    assert plan_kind(B) == "merge"
    # the family tag survives a save/load roundtrip (it rides the
    # pytree aux, plan format v4)
    import tempfile

    from tpusparse.io.plans import load_plan, save_plan

    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/nnz.plan"
        save_plan(p, A)
        assert plan_kind(load_plan(p)) == "nonzero_split"
