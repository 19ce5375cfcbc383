"""DIA format + hybrid DIA/merge partition tests.

Parity oracle: scipy.sparse (the reference's SpmvGold semantics,
work_2025/spmm/sample.hpp:14-34).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from tpusparse.formats.csr import CsrMatrix
from tpusparse.formats.dia import (
    DiaHost,
    diagonal_profile,
    partition_dia,
    select_diagonals,
    to_device_dia,
)
from tpusparse.io import generators
from tpusparse.ops.dia import spmm_dia, spmv_dia
from tpusparse.ops.hybrid import HybridPlan
from tpusparse.ops.spmv import plan_matrix, spmm, spmv


def _rng():
    return np.random.default_rng(0)


def test_diagonal_profile_tridiag():
    n = 100
    T = sp.diags(
        [np.ones(n - 1), 4 * np.ones(n), np.ones(n - 1)],
        [-1, 0, 1], format="csr",
    )
    csr = CsrMatrix.from_scipy(T.tocsr())
    offs, counts, lengths = diagonal_profile(csr)
    assert list(offs) == [-1, 0, 1]
    assert list(counts) == [n - 1, n, n - 1]
    assert list(lengths) == [n - 1, n, n - 1]


def test_select_respects_occupancy_and_cap():
    n = 200
    # dense main diagonal + a single scattered entry far off-diagonal
    rows = np.concatenate([np.arange(n), [0]])
    cols = np.concatenate([np.arange(n), [n - 3]])
    vals = np.ones(n + 1)
    S = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    csr = CsrMatrix.from_scipy(S)
    offs = select_diagonals(csr)
    assert list(offs) == [0]  # the lone far entry's occupancy ~ 1/3


def test_partition_exact_split():
    n = 300
    A = sp.diags([np.ones(n), 2 * np.ones(n - 7)], [0, 7],
                 format="csr") + sp.random(
        n, n, density=0.001, random_state=3, format="csr"
    )
    A = A.tocsr()
    csr = CsrMatrix.from_scipy(A)
    offs = select_diagonals(csr)
    dia, rest = partition_dia(csr, offs)
    # dia + rest reassembles the matrix exactly
    D = sp.dia_matrix(
        (np.zeros((len(dia.offsets), n)), dia.offsets), shape=(n, n)
    ).tocsr()
    recon = rest.to_scipy().astype(np.float64)
    for k, off in enumerate(dia.offsets):
        idx = np.arange(max(0, -off), min(n, n - off))
        recon += sp.coo_matrix(
            (dia.data[k, idx], (idx, idx + off)), shape=(n, n)
        )
    assert np.abs((recon - A).toarray()).max() < 1e-14


def test_partition_accumulates_duplicates():
    rows = np.array([0, 0, 1], dtype=np.int32)
    cols = np.array([0, 0, 1], dtype=np.int32)
    vals = np.array([1.0, 2.0, 5.0])
    from tpusparse.formats.coo import CooMatrix

    csr = CsrMatrix.from_coo(CooMatrix(2, 2, rows, cols, vals))
    dia, rest = partition_dia(csr, np.array([0]))
    assert rest.nnz == 0
    assert dia.data[0, 0] == 3.0 and dia.data[0, 1] == 5.0


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_pure_dia_spmv_spmm_parity(dtype):
    csr = generators.make_laplacian_grid3d(12, dtype=dtype).to_csr()
    S = csr.to_scipy()
    offs = select_diagonals(csr)
    dia, rest = partition_dia(csr, offs)
    assert rest.nnz == 0  # the stencil is entirely diagonal
    D = to_device_dia(dia, dtype=dtype)
    x = _rng().standard_normal(csr.num_cols).astype(dtype)
    tol = 1e-5 if dtype == np.float32 else 1e-13
    y = np.asarray(spmv_dia(D, x))
    ref = S @ x
    assert np.abs(y - ref).max() / np.abs(ref).max() < tol
    X = _rng().standard_normal((csr.num_cols, 8)).astype(dtype)
    Y = np.asarray(spmm_dia(D, X))
    refM = S @ X
    assert np.abs(Y - refM).max() / np.abs(refM).max() < tol


def test_dia_alpha_beta():
    csr = generators.make_laplacian_grid2d(16, dtype=np.float64).to_csr()
    S = csr.to_scipy()
    offs = select_diagonals(csr)
    dia, _ = partition_dia(csr, offs)
    D = to_device_dia(dia, dtype=np.float64)
    x = _rng().standard_normal(csr.num_cols)
    y0 = _rng().standard_normal(csr.num_rows)
    got = np.asarray(spmv_dia(D, x, alpha=2.5, beta=-0.5, y=y0))
    want = 2.5 * (S @ x) - 0.5 * y0
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-13


def test_rectangular_dia():
    n, m = 130, 170
    A = sp.diags([np.ones(n), np.ones(n)], [0, 30], shape=(n, m),
                 format="csr")
    csr = CsrMatrix.from_scipy(A.tocsr())
    plan = plan_matrix(csr, strategy="dia", dtype=np.float64)
    x = _rng().standard_normal(m)
    y = np.asarray(spmv(plan, x))
    ref = A @ x
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-13


def test_negative_offset_only():
    n = 90
    A = sp.diags([np.ones(n - 11)], [-11], shape=(n, n), format="csr")
    csr = CsrMatrix.from_scipy(A.tocsr())
    plan = plan_matrix(csr, strategy="dia", dtype=np.float32)
    x = _rng().standard_normal(n).astype(np.float32)
    y = np.asarray(spmv(plan, x))
    ref = A @ x
    assert np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-9) < 1e-5


class TestAutoGating:
    def test_stencil_goes_pure_dia(self):
        csr = generators.make_laplacian_grid3d(
            12, dtype=np.float32
        ).to_csr()
        plan = plan_matrix(csr, dtype=np.float32)
        assert isinstance(plan, HybridPlan) and plan.rest is None

    def test_fp64_stencil_goes_dia(self):
        csr = generators.make_laplacian_grid3d(
            12, dtype=np.float64
        ).to_csr()
        plan = plan_matrix(csr, dtype=np.float64)
        assert isinstance(plan, HybridPlan)
        assert plan.dia.data.dtype == np.float64

    def test_random_stays_merge(self):
        R = sp.random(2000, 2000, density=0.002, random_state=1,
                      format="csr")
        csr = CsrMatrix.from_scipy(R.tocsr().astype(np.float32))
        plan = plan_matrix(csr, dtype=np.float32)
        assert not isinstance(plan, HybridPlan)

    @pytest.mark.slow
    def test_band_plus_noise_goes_hybrid(self):
        n = 3000
        T = sp.diags(
            [np.ones(n - 1), 4 * np.ones(n), np.ones(n - 1)],
            [-1, 0, 1], format="csr",
        )
        N = sp.random(n, n, density=0.001, random_state=2, format="csr")
        csr = CsrMatrix.from_scipy((T + N).tocsr().astype(np.float32))
        plan = plan_matrix(csr, dtype=np.float32)
        assert isinstance(plan, HybridPlan) and plan.rest is not None
        S = csr.to_scipy()
        x = _rng().standard_normal(n).astype(np.float32)
        y = np.asarray(spmv(plan, x))
        ref = S @ x
        assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5
        X = _rng().standard_normal((n, 4)).astype(np.float32)
        Y = np.asarray(spmm(plan, X))
        refM = S @ X
        assert np.abs(Y - refM).max() / np.abs(refM).max() < 1e-5

    def test_explicit_dia_on_undiagonal_falls_back(self):
        R = sp.random(800, 800, density=0.003, random_state=4,
                      format="csr")
        csr = CsrMatrix.from_scipy(R.tocsr().astype(np.float32))
        plan = plan_matrix(csr, strategy="dia", dtype=np.float32)
        # no usable diagonals -> graceful fallback, still correct
        x = _rng().standard_normal(800).astype(np.float32)
        y = np.asarray(spmv(plan, x))
        ref = R @ x
        assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_multirhs_ultra_sparse_scatter_routes_to_ell():
    """Ultra-sparse uniform scatter (the hybrid-remainder pattern):
    merge tiles pack terribly AND the merge SpMM pays L serially per
    tile, so AUTO at L >= 8 must route below MERGE_MIN_OCC_MULTIRHS to
    the ELL gather kernel (measured 27x on-chip,
    scripts/r3_s9_rest_strategies.py). Correctness is checked through
    the planned kernel."""
    from tpusparse.kernels.ell_spmm import DeviceEll

    n, m = 131072, 8000  # merge occ 0.0083, well under the 0.05 floor
    rng = np.random.default_rng(11)
    Nz = sp.coo_matrix(
        (rng.random(m), (rng.integers(0, n, m), rng.integers(0, n, m))),
        shape=(n, n),
    ).tocsr()
    S = (0.1 * (Nz + Nz.T)).tocsr().astype(np.float32)
    S.eliminate_zeros()
    csr = CsrMatrix.from_scipy(S)
    plan = plan_matrix(csr, dtype=np.float32, L=32)
    assert isinstance(plan, DeviceEll), type(plan)
    X = _rng().standard_normal((n, 32)).astype(np.float32)
    Y = np.asarray(spmm(plan, X))
    refM = (S @ X).astype(np.float32)
    assert np.abs(Y - refM).max() / np.abs(refM).max() < 1e-5
    # past ELL's resident-RHS budget the same pattern goes BCOO
    import jax.experimental.sparse as jsparse
    from tpusparse.kernels import ell_spmm

    assert not ell_spmm.ell_fits(1_048_576, 32)
    wide = sp.coo_matrix(
        (S.tocoo().data, (S.tocoo().row, S.tocoo().col)),
        shape=(1_048_576, 1_048_576),
    ).tocsr()
    plan_w = plan_matrix(CsrMatrix.from_scipy(wide.astype(np.float32)),
                         dtype=np.float32, L=32)
    assert isinstance(plan_w, jsparse.BCOO), type(plan_w)


def test_cg_on_hybrid_plan():
    from tpusparse.solvers.cg import cg_solve

    csr = generators.make_laplacian_grid3d(8, dtype=np.float64).to_csr()
    plan = plan_matrix(csr, dtype=np.float64)
    assert isinstance(plan, HybridPlan)
    import jax.numpy as jnp

    b = jnp.asarray(_rng().standard_normal(csr.num_rows))
    res = cg_solve(plan, b, max_iters=2000, tolerance=1e-10)
    x = np.asarray(res.x)
    r = np.asarray(b) - csr.to_scipy() @ x
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-9


class TestDiaStream:
    """Pallas streaming DIA kernel (kernels/dia_stream.py) — the
    large-matrix diagonal path. CPU runs use interpret mode."""

    def _band(self, n, offsets, seed=0):
        rng = np.random.default_rng(seed)
        diags = [rng.standard_normal(n) for _ in offsets]
        A = sp.diags(diags, offsets, shape=(n, n), format="csr")
        return CsrMatrix.from_scipy(A.tocsr().astype(np.float32)), A

    def test_stream_parity_lane_crossing_offsets(self):
        from tpusparse.kernels.dia_stream import (
            spmv_dia_stream,
            to_device_dia_stream,
        )

        n = 2048
        offsets = [-300, -128, -127, -1, 0, 1, 127, 129, 300]
        csr, A = self._band(n, offsets)
        dia, rest = partition_dia(csr, np.array(offsets))
        assert rest.nnz == 0
        D = to_device_dia_stream(dia, block_rows=512)
        x = _rng().standard_normal(n).astype(np.float32)
        y = np.asarray(spmv_dia_stream(D, x))
        ref = (A @ x).astype(np.float32)
        assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5

    def test_stream_block_boundary_offsets(self):
        # |off| == block_rows exercises the halo edge slices
        from tpusparse.kernels.dia_stream import (
            fits_stream,
            spmv_dia_stream,
            to_device_dia_stream,
        )

        n = 2048
        offsets = [-512, -511, 0, 511, 512]
        csr, A = self._band(n, offsets, seed=1)
        dia, _ = partition_dia(csr, np.array(offsets))
        assert fits_stream(dia.offsets, block_rows=512)
        assert not fits_stream(dia.offsets, block_rows=256)
        D = to_device_dia_stream(dia, block_rows=512)
        x = _rng().standard_normal(n).astype(np.float32)
        y = np.asarray(spmv_dia_stream(D, x))
        ref = (A @ x).astype(np.float32)
        assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5

    def test_stream_ragged_last_block(self):
        # n not a multiple of block_rows: zero-padded tail block
        from tpusparse.kernels.dia_stream import (
            spmv_dia_stream,
            to_device_dia_stream,
        )

        n = 1000
        offsets = [-5, 0, 3]
        csr, A = self._band(n, offsets, seed=2)
        dia, _ = partition_dia(csr, np.array(offsets))
        D = to_device_dia_stream(dia, block_rows=256)
        x = _rng().standard_normal(n).astype(np.float32)
        y = np.asarray(spmv_dia_stream(D, x))
        assert y.shape == (n,)
        ref = (A @ x).astype(np.float32)
        assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5

    def test_stream_alpha_beta_and_spmm(self):
        from tpusparse.kernels.dia_stream import (
            spmm_dia_stream,
            spmv_dia_stream,
            to_device_dia_stream,
        )

        n = 640
        offsets = [-2, 0, 2]
        csr, A = self._band(n, offsets, seed=3)
        dia, _ = partition_dia(csr, np.array(offsets))
        D = to_device_dia_stream(dia, block_rows=128)
        x = _rng().standard_normal(n).astype(np.float32)
        y0 = _rng().standard_normal(n).astype(np.float32)
        got = np.asarray(spmv_dia_stream(D, x, alpha=2.0, beta=-0.5,
                                         y=y0))
        want = 2.0 * (A @ x).astype(np.float32) - 0.5 * y0
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-5
        X = _rng().standard_normal((n, 3)).astype(np.float32)
        Y = np.asarray(spmm_dia_stream(D, X))
        refM = (A @ X).astype(np.float32)
        assert np.abs(Y - refM).max() / np.abs(refM).max() < 1e-5

    def test_auto_gates_stream_past_plane_budget(self, monkeypatch):
        import importlib

        spmv_mod = importlib.import_module("tpusparse.ops.spmv")
        from tpusparse.kernels.dia_stream import DiaStreamDevice

        monkeypatch.setattr(spmv_mod, "DIA_STREAM_MIN_BYTES", 1024)
        csr = generators.make_laplacian_grid3d(
            12, dtype=np.float32
        ).to_csr()
        plan = plan_matrix(csr, dtype=np.float32)
        assert isinstance(plan, HybridPlan)
        assert isinstance(plan.dia, DiaStreamDevice)
        S = csr.to_scipy()
        x = _rng().standard_normal(csr.num_cols).astype(np.float32)
        y = np.asarray(spmv(plan, x))
        ref = (S @ x).astype(np.float32)
        assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5

    def test_auto_streams_multirhs_keeps_xla_under_f64_budget(
        self, monkeypatch
    ):
        import importlib

        spmv_mod = importlib.import_module("tpusparse.ops.spmv")
        from tpusparse.formats.dia import DiaDevice
        from tpusparse.kernels.dia_stream import DiaStreamDevice

        monkeypatch.setattr(spmv_mod, "DIA_STREAM_MIN_BYTES", 1024)
        csr32 = generators.make_laplacian_grid3d(
            12, dtype=np.float32
        ).to_csr()
        # multi-RHS plans stream too past the plane budget (the kernel
        # is RHS-major; solvers ride spmm_dia_stream_t). The n-major
        # kernel stays an EXPLICIT strategy (faster standalone SpMM,
        # 2-5% slower at solve level — RESULTS session 12).
        from tpusparse.kernels.dia_nmajor import DiaNMajorDevice

        plan = plan_matrix(csr32, dtype=np.float32, L=8)
        assert isinstance(plan.dia, DiaStreamDevice)
        plan_nm = plan_matrix(csr32, dtype=np.float32, L=8,
                              strategy="nmajor")
        assert isinstance(plan_nm.dia, DiaNMajorDevice)
        S = csr32.to_scipy()
        X = _rng().standard_normal((csr32.num_cols, 8)).astype(np.float32)
        Y = np.asarray(spmm(plan, X))
        refM = (S @ X).astype(np.float32)
        assert np.abs(Y - refM).max() / np.abs(refM).max() < 1e-5
        # the n-major plan must also be numerically correct through
        # the ops.spmm dispatch (ADVICE r3)
        Y_nm = np.asarray(spmm(plan_nm, X))
        assert np.abs(Y_nm - refM).max() / np.abs(refM).max() < 1e-5
        # RHS wider than the plan's lane count fails loudly (ADVICE r3)
        with pytest.raises(ValueError, match="n-major plan built for"):
            spmm(plan_nm, np.zeros((csr32.num_cols, 16), np.float32))
        # explicit nmajor with L=1 is rejected up front, not silently
        # replanned as a masked stream (ADVICE r3)
        with pytest.raises(ValueError, match="multi-RHS"):
            plan_matrix(csr32, dtype=np.float32, L=1, strategy="nmajor")
        # fp64 under DIA_STREAM_F64_MIN_BYTES stays on the XLA DIA op
        csr64 = generators.make_laplacian_grid3d(
            12, dtype=np.float64
        ).to_csr()
        plan64 = plan_matrix(csr64, dtype=np.float64)
        assert isinstance(plan64.dia, DiaDevice)

    def test_df_stream_multirhs_parity(self):
        from tpusparse.kernels.dia_stream import (
            spmm_dia_stream_df,
            spmm_dia_stream_df_t,
            to_device_dia_stream_df,
        )

        n = 1280
        offsets = [-130, -1, 0, 1, 130]
        rng = np.random.default_rng(11)
        A = sp.diags([rng.standard_normal(n) for _ in offsets], offsets,
                     shape=(n, n), format="csr")
        csr = CsrMatrix.from_scipy(A.tocsr())
        dia, _ = partition_dia(csr, np.array(offsets))
        D = to_device_dia_stream_df(dia, block_rows=256)
        X = rng.standard_normal((n, 5))
        refM = A @ X
        Y = np.asarray(spmm_dia_stream_df(D, X))
        assert np.abs(Y - refM).max() / np.abs(refM).max() < 1e-13
        YT = np.asarray(spmm_dia_stream_df_t(D, jnp.asarray(X.T)))
        assert np.abs(YT.T - refM).max() / np.abs(refM).max() < 1e-13

    def test_stream_tp_edge_kernel_parity_and_zero_tail(self):
        """Padded transposed entry (edge-halo kernel): ragged n, zero
        tail preserved, |off| up to the full block (E == R)."""
        from tpusparse.kernels.dia_stream import (
            padded_cols,
            spmm_dia_stream_tp,
            to_device_dia_stream,
        )

        n = 1000  # ragged: pads to 2 blocks of 512
        offsets = [-512, -200, -1, 0, 1, 200, 512]
        csr, A = self._band(n, offsets, seed=9)
        dia, _ = partition_dia(csr, np.array(offsets))
        D = to_device_dia_stream(dia, block_rows=512)
        np_ = padded_cols(D)
        assert np_ == 1024 and np_ > n
        XT = _rng().standard_normal((4, n)).astype(np.float32)
        XTP = np.zeros((4, np_), np.float32)
        XTP[:, :n] = XT
        YTP = np.asarray(spmm_dia_stream_tp(D, jnp.asarray(XTP)))
        assert YTP.shape == (4, np_)
        np.testing.assert_array_equal(YTP[:, n:], 0.0)
        refM = (A @ XT.T).astype(np.float32)
        err = np.abs(YTP[:, :n].T - refM).max() / np.abs(refM).max()
        assert err < 1e-5

    def test_df_stream_tp_edge_kernel_parity(self):
        """df padded transposed entry (edge-halo df kernel): ragged n,
        zero tail, block-boundary offsets, fp64 accuracy."""
        from tpusparse.kernels.dia_stream import (
            padded_cols_df,
            spmm_dia_stream_df_tp,
            to_device_dia_stream_df,
        )

        n = 1000
        offsets = [-512, -130, -1, 0, 1, 130, 512]
        rng = np.random.default_rng(13)
        A = sp.diags([rng.standard_normal(n - abs(d))
                      for d in offsets], offsets,
                     shape=(n, n), format="csr")
        csr = CsrMatrix.from_scipy(A.tocsr())
        dia, _ = partition_dia(csr, np.array(offsets))
        D = to_device_dia_stream_df(dia, block_rows=512)
        np_ = padded_cols_df(D)
        assert np_ == 1024
        XT = rng.standard_normal((3, n))
        XTP = np.zeros((3, np_))
        XTP[:, :n] = XT
        YTP = np.asarray(spmm_dia_stream_df_tp(D, jnp.asarray(XTP)))
        np.testing.assert_array_equal(YTP[:, n:], 0.0)
        refM = A @ XT.T
        err = np.abs(YTP[:, :n].T - refM).max() / np.abs(refM).max()
        assert err < 1e-13

    def _const_band(self, n, offsets, consts, seed=0, zero_frac=0.3):
        """Constant-coefficient band with IRREGULAR (random, not
        periodic) structural-zero patterns per plane — the general
        two-valued-plane case masked compression must cover."""
        rng = np.random.default_rng(seed)
        diags = []
        for o, c in zip(offsets, consts):
            d = np.full(n - abs(int(o)), float(c))
            d[rng.random(d.size) < zero_frac] = 0.0
            diags.append(d)
        A = sp.diags(diags, offsets, shape=(n, n), format="csr")
        return CsrMatrix.from_scipy(A.tocsr().astype(np.float32)), A

    def test_plane_constants_detection(self):
        from tpusparse.formats.dia import plane_constants

        n = 600
        offsets = [-7, 0, 7]
        csr, _ = self._const_band(n, offsets, [1.5, 4.0, 1.5], seed=3)
        dia, _ = partition_dia(csr, np.array(offsets))
        vals, ok = plane_constants(dia.data)
        assert ok.all()
        np.testing.assert_allclose(vals, [1.5, 4.0, 1.5])
        dia.data[1, 10] = 9.0  # plane 1 no longer two-valued
        vals, ok = plane_constants(dia.data)
        assert ok[0] and not ok[1] and ok[2]

    def test_masked_stream_bit_identical_and_parity(self):
        """Masked compression (int32 bitmask + static scalars) must be
        BIT-identical to the value-plane kernel — the per-element
        coefficient ``mask ? c : 0`` IS the stored plane value — and
        match scipy. Irregular zero patterns, ragged n, lane-crossing
        and block-boundary offsets."""
        from tpusparse.kernels.dia_stream import (
            padded_cols,
            spmm_dia_stream_t,
            spmm_dia_stream_tp,
            to_device_dia_stream,
        )

        n = 1300
        offsets = [-512, -129, -1, 0, 1, 129, 512]
        consts = [2.5, -1.25, 0.75, 6.0, 0.75, -1.25, 2.5]
        csr, A = self._const_band(n, offsets, consts, seed=17)
        dia, rest = partition_dia(csr, np.array(offsets))
        assert rest.nnz == 0
        Dm = to_device_dia_stream(dia, block_rows=512)
        Du = to_device_dia_stream(dia, block_rows=512, masked=False)
        assert Dm.data_b is None and Dm.mask_b is not None
        assert Du.mask_b is None
        XT = _rng().standard_normal((3, n)).astype(np.float32)
        Ym = np.asarray(spmm_dia_stream_t(Dm, jnp.asarray(XT)))
        Yu = np.asarray(spmm_dia_stream_t(Du, jnp.asarray(XT)))
        np.testing.assert_array_equal(Ym, Yu)
        refM = (A @ XT.T).astype(np.float32)
        assert np.abs(Ym.T - refM).max() / np.abs(refM).max() < 1e-5
        # padded entry: zero tail in, zero tail out
        np_ = padded_cols(Dm)
        assert np_ == padded_cols(Du)
        XTP = np.zeros((3, np_), np.float32)
        XTP[:, :n] = XT
        YTP = np.asarray(spmm_dia_stream_tp(Dm, jnp.asarray(XTP)))
        np.testing.assert_array_equal(YTP[:, n:], 0.0)
        np.testing.assert_array_equal(YTP[:, :n], Ym)

    def test_masked_stream_df_bit_identical(self):
        from tpusparse.kernels.dia_stream import (
            spmm_dia_stream_df_t,
            to_device_dia_stream_df,
        )

        n = 1100
        offsets = [-256, -1, 0, 1, 256]
        # constants that do NOT split losslessly to one f32 (exercise
        # the hi/lo scalar pairs); keep f64 values end-to-end
        consts = [1 / 3, -0.1, 4.7, -0.1, 1 / 3]
        rng = np.random.default_rng(23)
        diags = []
        for o, c in zip(offsets, consts):
            d = np.full(n - abs(int(o)), float(c))
            d[rng.random(d.size) < 0.3] = 0.0
            diags.append(d)
        A = sp.diags(diags, offsets, shape=(n, n), format="csr")
        csr = CsrMatrix.from_scipy(A.tocsr())
        dia, _ = partition_dia(csr, np.array(offsets))
        Dm = to_device_dia_stream_df(dia, block_rows=512)
        Du = to_device_dia_stream_df(dia, block_rows=512, masked=False)
        assert Dm.data_hi is None and Dm.mask_b is not None
        XT = _rng().standard_normal((2, n))
        Ym = np.asarray(spmm_dia_stream_df_t(Dm, jnp.asarray(XT)))
        Yu = np.asarray(spmm_dia_stream_df_t(Du, jnp.asarray(XT)))
        refM = (A @ XT.T).T
        scale = np.abs(refM).max()
        # element-wise the masked arithmetic IS the unmasked kernel's,
        # but the two programs compile separately and XLA's FMA
        # contraction choices perturb the Dekker/Knuth sequences at
        # the ~1e-16 level — assert df-class agreement, not bitwise
        assert np.abs(Ym - Yu).max() / scale < 1e-14
        assert np.abs(Ym - refM).max() / scale < 1e-12

    def test_masked_autodetect_fallback_and_force(self):
        from tpusparse.kernels.dia_stream import to_device_dia_stream

        n = 700
        offsets = [-3, 0, 3]
        csr, _ = self._const_band(n, offsets, [1.0, 4.0, 1.0], seed=5)
        dia, _ = partition_dia(csr, np.array(offsets))
        dia.data[0, 11] = 2.0  # break plane 0's constancy
        D = to_device_dia_stream(dia, block_rows=512)
        assert D.data_b is not None and D.mask_b is None
        with pytest.raises(ValueError):
            to_device_dia_stream(dia, block_rows=512, masked=True)

    def test_masked_default_L_gates(self):
        """Measured defaults: f32 auto-masks at any L (1.5-3% win at
        L=32 plus the plan-memory saving); df auto-masks only at
        L <= 1 (L=32 measured a reproducible 2% loss — the per-offset
        hi/lo selects repeat per RHS step). masked=True still forces
        the df compression for the memory saving."""
        from tpusparse.kernels.dia_stream import (
            to_device_dia_stream,
            to_device_dia_stream_df,
        )

        n = 800
        offsets = [-1, 0, 1]
        csr, _ = self._const_band(n, offsets, [-1.0, 4.0, -1.0])
        dia, _ = partition_dia(csr, np.array(offsets))
        assert to_device_dia_stream(dia, block_rows=512,
                                    L=32).mask_b is not None
        dia64, _ = partition_dia(
            CsrMatrix.from_scipy(csr.to_scipy().astype(np.float64)),
            np.array(offsets))
        assert to_device_dia_stream_df(dia64, block_rows=512,
                                       L=1).mask_b is not None
        D32 = to_device_dia_stream_df(dia64, block_rows=512, L=32)
        assert D32.mask_b is None and D32.data_hi is not None
        forced = to_device_dia_stream_df(dia64, block_rows=512, L=32,
                                         masked=True)
        assert forced.mask_b is not None

    def test_masked_plan_solver_parity_and_roundtrip(self):
        """cg_solve_multi on a masked stream plan: iteration parity
        with the value-plane plan, and save/load roundtrip preserves
        the masked payload (io/plans)."""
        from tpusparse.io.plans import load_plan, save_plan
        from tpusparse.kernels.dia_stream import to_device_dia_stream
        from tpusparse.solvers.cg import cg_solve_multi

        n = 1500
        offsets = np.array([-40, -1, 0, 1, 40])
        diags = [np.full(n - 40, -1.0), np.full(n - 1, -1.0),
                 np.full(n, 4.2), np.full(n - 1, -1.0),
                 np.full(n - 40, -1.0)]
        A = sp.diags(diags, offsets, shape=(n, n), format="csr")
        csr = CsrMatrix.from_scipy(A.astype(np.float32))
        dia, _ = partition_dia(csr, offsets)
        Dm = to_device_dia_stream(dia, block_rows=1024)
        Du = to_device_dia_stream(dia, block_rows=1024, masked=False)
        assert Dm.data_b is None
        B = _rng().standard_normal((n, 3)).astype(np.float32)
        rm = cg_solve_multi(Dm, B, tolerance=1e-6)
        ru = cg_solve_multi(Du, B, tolerance=1e-6)
        assert int(rm.iterations) == int(ru.iterations)
        X = np.asarray(rm.x, np.float64)
        rel = np.linalg.norm(B - A @ X) / np.linalg.norm(B)
        assert rel < 1e-5
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            path = f"{d}/m.plan"
            save_plan(path, Dm)
            D2 = load_plan(path)
            assert D2.data_b is None and D2.vals == Dm.vals
            np.testing.assert_array_equal(np.asarray(D2.mask_b),
                                          np.asarray(Dm.mask_b))

    def test_xla_matvec_of_forms(self):
        """ops.dia.xla_matvec_of — the fusable XLA matvec baked solver
        bodies use instead of the Pallas stream kernels (a pallas_call
        is a fusion barrier inside the CG while_loop; measured 2.5x).
        The masked bitmask form computes the same FMA sequence as the
        value-plane form (``mask ? c : 0`` IS the stored plane value —
        differences are ULP-level FMA-contraction choices of the two
        separately compiled programs), and hybrid plans add the
        remainder."""
        from tpusparse.kernels.dia_stream import to_device_dia_stream
        from tpusparse.ops.dia import xla_matvec_of

        n = 1300
        offsets = [-512, -129, -1, 0, 1, 129, 512]
        consts = [2.5, -1.25, 0.75, 6.0, 0.75, -1.25, 2.5]
        csr, A = self._const_band(n, offsets, consts, seed=29)
        dia, rest = partition_dia(csr, np.array(offsets))
        assert rest.nnz == 0
        Dm = to_device_dia_stream(dia, block_rows=512)
        Du = to_device_dia_stream(dia, block_rows=512, masked=False)
        x = _rng().standard_normal(n).astype(np.float32)
        xj = jnp.asarray(x)
        ym = np.asarray(xla_matvec_of(Dm)(xj))
        yu = np.asarray(xla_matvec_of(Du)(xj))
        ref = (A @ x).astype(np.float32)
        scale = np.abs(ref).max() + 1.0
        np.testing.assert_allclose(ym / scale, yu / scale, atol=1e-6)
        np.testing.assert_allclose(ym / scale, ref / scale, atol=2e-6)
        # hybrid with a scattered remainder: dia XLA term + rest kernel
        S = A.tolil()
        rng = np.random.default_rng(5)
        rows = rng.integers(0, n, 40)
        cols = rng.integers(0, n, 40)
        for i, j in zip(rows, cols):
            S[i, j] = S[i, j] + 0.5
        csr2 = CsrMatrix.from_scipy(S.tocsr().astype(np.float32))
        H = plan_matrix(csr2, dtype=np.float32)
        if isinstance(H, HybridPlan) and H.rest is not None:
            yh = np.asarray(xla_matvec_of(H)(xj))
            ref2 = (S.tocsr() @ x).astype(np.float32)
            scale2 = np.abs(ref2).max() + 1.0
            np.testing.assert_allclose(yh / scale2, ref2 / scale2,
                                       atol=2e-5)
        # no XLA lowering for gather/merge plans
        merge = plan_matrix(csr2, strategy="merge", dtype=np.float32)
        assert xla_matvec_of(merge) is None

    def test_cg_baked_fused_matvec_parity(self):
        """cg_solve's baked path routes DIA-family plans through
        xla_matvec_of (fuse_mv); the iteration trajectory must match
        the unbaked Pallas-kernel solve."""
        from tpusparse.solvers.cg import cg_solve

        n = 1500
        offsets = np.array([-40, -1, 0, 1, 40])
        diags = [np.full(n - 40, -1.0), np.full(n - 1, -1.0),
                 np.full(n, 4.2), np.full(n - 1, -1.0),
                 np.full(n - 40, -1.0)]
        A = sp.diags(diags, offsets, shape=(n, n), format="csr")
        csr = CsrMatrix.from_scipy(A.astype(np.float32))
        plan = plan_matrix(csr, dtype=np.float32)
        assert isinstance(plan, HybridPlan) and plan.rest is None
        b = _rng().standard_normal(n).astype(np.float32)
        rb = cg_solve(plan, b, tolerance=1e-6)          # baked + fused
        ru = cg_solve(plan, b, tolerance=1e-6, bake=False)
        assert abs(int(rb.iterations) - int(ru.iterations)) <= 1
        x = np.asarray(rb.x, np.float64)
        rel = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
        assert rel < 1e-5

    def test_stream_tp_mxu_rotation_bit_identical(self):
        """The MXU selection-matmul kernel body (mxu=True) must be
        BIT-identical to the VPU select+roll body — each output lane
        has exactly one unit product, so the matmul is exact
        selection. (On-chip A/B was a wash: 16.41 vs 16.25 ms at
        L=32, lap3d-192 — the VPU body stays the default.)"""
        from tpusparse.kernels.dia_stream import (
            padded_cols,
            spmm_dia_stream_tp,
            to_device_dia_stream,
        )

        n = 1500
        offsets = [-512, -200, -1, 0, 1, 200, 512]
        csr, A = self._band(n, offsets, seed=21)
        dia, _ = partition_dia(csr, np.array(offsets))
        D = to_device_dia_stream(dia, block_rows=512)
        np_ = padded_cols(D)
        XTP = np.zeros((4, np_), np.float32)
        XTP[:, :n] = _rng().standard_normal((4, n)).astype(np.float32)
        Ya = np.asarray(spmm_dia_stream_tp(D, jnp.asarray(XTP),
                                           mxu=False))
        Yb = np.asarray(spmm_dia_stream_tp(D, jnp.asarray(XTP),
                                           mxu=True))
        np.testing.assert_array_equal(Ya, Yb)
        refM = (A @ XTP[:, :n].T).astype(np.float32)
        err = np.abs(Ya[:, :n].T - refM).max() / np.abs(refM).max()
        assert err < 1e-5

    def test_stream_t_parity(self):
        from tpusparse.kernels.dia_stream import (
            spmm_dia_stream_t,
            to_device_dia_stream,
        )

        n = 1024
        offsets = [-200, -1, 0, 1, 200]
        csr, A = self._band(n, offsets, seed=5)
        dia, _ = partition_dia(csr, np.array(offsets))
        D = to_device_dia_stream(dia, block_rows=256)
        XT = _rng().standard_normal((4, n)).astype(np.float32)
        YT = np.asarray(spmm_dia_stream_t(D, jnp.asarray(XT)))
        refM = (A @ XT.T).astype(np.float32)
        assert np.abs(YT.T - refM).max() / np.abs(refM).max() < 1e-5

    def test_df_stream_parity_and_gating(self, monkeypatch):
        import importlib

        spmv_mod = importlib.import_module("tpusparse.ops.spmv")
        from tpusparse.kernels.dia_stream import (
            DiaStreamDFDevice,
            spmv_dia_stream_df,
            to_device_dia_stream_df,
        )

        n = 1280
        offsets = [-130, -1, 0, 1, 130]
        rng = np.random.default_rng(7)
        A = sp.diags([rng.standard_normal(n) for _ in offsets], offsets,
                     shape=(n, n), format="csr")
        csr = CsrMatrix.from_scipy(A.tocsr())
        dia, _ = partition_dia(csr, np.array(offsets))
        D = to_device_dia_stream_df(dia, block_rows=256)
        x = rng.standard_normal(n)
        y = np.asarray(spmv_dia_stream_df(D, x))
        ref = A @ x
        assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-13

        monkeypatch.setattr(spmv_mod, "DIA_STREAM_F64_MIN_BYTES", 1024)
        plan = plan_matrix(csr, dtype=np.float64)
        assert isinstance(plan, HybridPlan)
        assert isinstance(plan.dia, DiaStreamDFDevice)
        y2 = np.asarray(spmv(plan, x))
        assert np.abs(y2 - ref).max() / np.abs(ref).max() < 1e-13
        X = rng.standard_normal((n, 3))
        Y = np.asarray(spmm(plan, X))
        refM = A @ X
        assert np.abs(Y - refM).max() / np.abs(refM).max() < 1e-13


def test_masked_stream_32_planes_no_overflow():
    """K = MASK_MAX_PLANES = 32 exercises bit 31: the masked kernels
    must read the word with (m >> k) & 1 — the literal ``1 << 31``
    overflows int32 under the kernels' mandatory no-x64 tracing
    (round-5 review; kernel_no_x64 applies regardless of the ambient
    x64 setting, so this test fails loudly on the bad form)."""
    import scipy.sparse as sp

    from tpusparse.formats.csr import CsrMatrix
    from tpusparse.formats.dia import partition_dia, select_diagonals
    from tpusparse.kernels.dia_stream import (
        MASK_MAX_PLANES,
        spmv_dia_stream,
        to_device_dia_stream,
    )

    n = 2048
    offsets = list(range(32))          # 32 constant diagonals
    assert len(offsets) == MASK_MAX_PLANES
    diags = [np.full(n - o, float(k + 1))
             for k, o in enumerate(offsets)]
    A = sp.diags(diags, offsets, shape=(n, n), format="csr")
    csr = CsrMatrix.from_scipy(A.astype(np.float32))
    dia, rest = partition_dia(csr, select_diagonals(csr))
    assert rest.nnz == 0 and len(dia.offsets) == 32
    D = to_device_dia_stream(dia, masked=True)
    x = np.random.default_rng(0).standard_normal(n).astype(np.float32)
    y = np.asarray(spmv_dia_stream(D, jnp.asarray(x)))
    ref = A @ x
    assert np.abs(y - ref).max() / (np.abs(ref).max() + 1) < 1e-5
