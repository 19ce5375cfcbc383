"""N-major (row-interleaved) masked stream kernel tests.

Parity oracle: scipy.sparse (SpmvGold semantics,
work_2025/spmm/sample.hpp:14-34) and the lane-major masked stream
kernel (bit-compatible ``mask ? c : 0`` contract).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from tpusparse.formats.csr import CsrMatrix
from tpusparse.formats.dia import partition_dia, select_diagonals
from tpusparse.io import generators
from tpusparse.kernels.dia_nmajor import (
    DiaNMajorDevice,
    fold_lanes,
    pack_gp,
    plan_geometry,
    spmm_dia_nmajor,
    spmm_dia_nmajor_gp,
    spmv_dia_nmajor,
    tile_lanes,
    to_device_dia_nmajor,
    unpack_gp,
)


def _rng():
    return np.random.default_rng(0)


def _dia_host_of(csr):
    dia, rest = partition_dia(csr, select_diagonals(csr))
    assert rest.nnz == 0
    return dia


def _fixture(kind):
    if kind == "lap3d":
        return generators.make_laplacian_grid3d(6, dtype=np.float32)
    if kind == "lap2d":
        return generators.make_laplacian_grid2d(17, dtype=np.float32)
    raise KeyError(kind)


@pytest.mark.parametrize("kind", ["lap3d", "lap2d"])
@pytest.mark.parametrize("L", [2, 3, 8, 32, 100])
def test_spmm_matches_scipy(kind, L):
    coo = _fixture(kind)
    csr = coo.to_csr()
    D = to_device_dia_nmajor(_dia_host_of(csr), L=L)
    X = _rng().standard_normal((csr.num_cols, L)).astype(np.float32)
    Y = np.asarray(spmm_dia_nmajor(D, jnp.asarray(X)))
    ref = csr.to_scipy().astype(np.float64) @ X.astype(np.float64)
    assert Y.shape == (csr.num_rows, L)
    np.testing.assert_allclose(Y, ref, rtol=2e-5, atol=1e-5)


def test_multiword_mask_small_L():
    # L=8 -> G=16 -> F=2 bits/field -> lap3d's K=7 planes need W=4
    coo = _fixture("lap3d")
    csr = coo.to_csr()
    D = to_device_dia_nmajor(_dia_host_of(csr), L=8)
    assert D.mask_g.shape[1] == 4
    X = _rng().standard_normal((csr.num_cols, 8)).astype(np.float32)
    Y = np.asarray(spmm_dia_nmajor(D, jnp.asarray(X)))
    ref = csr.to_scipy().astype(np.float64) @ X.astype(np.float64)
    np.testing.assert_allclose(Y, ref, rtol=2e-5, atol=1e-5)


def test_matches_lane_major_masked_kernel():
    from tpusparse.kernels.dia_stream import (
        spmm_dia_stream_t,
        to_device_dia_stream,
    )

    coo = _fixture("lap3d")
    csr = coo.to_csr()
    dia = _dia_host_of(csr)
    L = 32
    Dn = to_device_dia_nmajor(dia, L=L)
    Dl = to_device_dia_stream(dia, masked=True, L=L)
    X = _rng().standard_normal((csr.num_cols, L)).astype(np.float32)
    Yn = np.asarray(spmm_dia_nmajor(Dn, jnp.asarray(X)))
    Yl = np.asarray(spmm_dia_stream_t(Dl, jnp.asarray(X.T))).T
    # same mask ? c : 0 products, same plane-k accumulation order
    np.testing.assert_allclose(Yn, Yl, rtol=1e-6, atol=1e-6)


def test_guarded_state_invariants():
    coo = _fixture("lap3d")
    csr = coo.to_csr()
    L = 32
    D = to_device_dia_nmajor(_dia_host_of(csr), L=L)
    X = _rng().standard_normal((csr.num_cols, L)).astype(np.float32)
    Xg = pack_gp(D, jnp.asarray(X))
    S, T = D.S, D.nb * D.S
    xg = np.asarray(Xg)
    assert np.all(xg[:S] == 0) and np.all(xg[S + T:] == 0)
    tail = xg[S:S + T].reshape(-1)[csr.num_rows * D.L:]
    assert np.all(tail == 0)
    Yg = np.asarray(spmm_dia_nmajor_gp(D, Xg))
    # kernel preserves zero guards and zero tail (mask words are 0)
    assert np.all(Yg[:S] == 0) and np.all(Yg[S + T:] == 0)
    assert np.all(Yg[S:S + T].reshape(-1)[csr.num_rows * D.L:] == 0)
    Y = np.asarray(unpack_gp(D, jnp.asarray(Yg), L))
    ref = csr.to_scipy().astype(np.float64) @ X.astype(np.float64)
    np.testing.assert_allclose(Y, ref, rtol=2e-5, atol=1e-5)


def test_spmv_entry_and_alpha_beta():
    coo = _fixture("lap2d")
    csr = coo.to_csr()
    D = to_device_dia_nmajor(_dia_host_of(csr), L=4)
    rng = _rng()
    x = rng.standard_normal(csr.num_cols).astype(np.float32)
    y0 = rng.standard_normal(csr.num_rows).astype(np.float32)
    A = csr.to_scipy().astype(np.float64)
    y = np.asarray(spmv_dia_nmajor(D, jnp.asarray(x), alpha=2.0,
                                   beta=0.5, y=jnp.asarray(y0)))
    np.testing.assert_allclose(
        y, 2.0 * (A @ x.astype(np.float64)) + 0.5 * y0,
        rtol=2e-5, atol=1e-5)


def test_fold_tile_lanes_roundtrip():
    rng = _rng()
    for L in (2, 8, 32, 128):
        s = rng.standard_normal(L).astype(np.float32)
        lanes = tile_lanes(jnp.asarray(s), L)
        assert lanes.shape == (128,)
        folded = np.asarray(fold_lanes(lanes, L))
        np.testing.assert_allclose(folded, s * (128 // L), rtol=1e-6)


def test_fold_lanes_matches_per_rhs_dot():
    coo = _fixture("lap2d")
    csr = coo.to_csr()
    L = 32
    D = to_device_dia_nmajor(_dia_host_of(csr), L=L)
    rng = _rng()
    X = rng.standard_normal((csr.num_cols, L)).astype(np.float32)
    Xg = pack_gp(D, jnp.asarray(X))
    dots = np.asarray(fold_lanes(jnp.sum(Xg * Xg, axis=0), D.L))[:L]
    ref = np.sum(X.astype(np.float64) ** 2, axis=0)
    np.testing.assert_allclose(dots, ref, rtol=1e-4)


def test_gates():
    # non-maskable: random values on the diagonals
    n = 64
    rng = _rng()
    d = sp.diags([rng.standard_normal(n - 1), rng.standard_normal(n),
                  rng.standard_normal(n - 1)], [-1, 0, 1]).tocsr()
    csr = CsrMatrix.from_scipy(d)
    with pytest.raises(ValueError, match="constant coefficient"):
        to_device_dia_nmajor(_dia_host_of(csr), L=8)
    # geometry: offsets too wide for the VMEM-capped block
    ok, *_ = plan_geometry((-10 ** 7, 0, 10 ** 7), L=32)
    assert not ok
    ok, Lp, S, E = plan_geometry((-1, 0, 1), L=5)
    assert ok and Lp == 8 and S >= E
    assert not plan_geometry((-1, 0, 1), L=1)[0]
    assert not plan_geometry((-1, 0, 1), L=129)[0]
