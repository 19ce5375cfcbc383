"""Real SuiteSparse-collection matrices (io.realmats) through the full
parse -> plan -> solve pipeline.

The reference's evaluation corpus is the UFL/SuiteSparse collection
(``get_uf_datasets.sh:10-24``, ``eval_csrmv.sh:14-17``); with no
network egress the exactly-reproducible subset is reconstructed
offline and pushed through the same pipeline the downloaded corpus
would ride.  Counts are asserted against published collection stats
inside ``build_real`` itself.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from tpusparse.io.market import read_market
from tpusparse.io.realmats import (
    REAL_MATRICES,
    build_real,
    ensure_mtx,
    list_real,
)
from tpusparse.ops.spmv import plan_matrix, spmv

DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data", "real")

# the committed .mtx subset (small files checked into data/real)
COMMITTED = ["karate", "lesmis", "gr_30_30", "Trefethen_20",
             "Trefethen_200", "mycielskian7"]


def test_all_entries_build_with_published_counts():
    # build_real asserts (n, nnz) against the published stats
    for name in list_real():
        coo = build_real(name)
        assert coo.num_rows == REAL_MATRICES[name][2][0]


@pytest.mark.parametrize("name", COMMITTED)
def test_committed_mtx_roundtrip(name):
    """The checked-in .mtx files parse back to the exact
    reconstruction (symmetric-expansion path of io.market)."""
    path = ensure_mtx(name, DATA_DIR)
    coo = read_market(path)
    ref = build_real(name)
    import scipy.sparse as sp

    S = sp.coo_matrix((coo.vals, (coo.rows, coo.cols)),
                      shape=(coo.num_rows, coo.num_cols))
    R = sp.coo_matrix((ref.vals, (ref.rows, ref.cols)),
                      shape=(ref.num_rows, ref.num_cols))
    assert coo.num_rows == ref.num_rows
    assert coo.nnz == ref.nnz
    assert abs(S - R).max() == 0.0


@pytest.mark.parametrize("name", ["Trefethen_200", "gr_30_30",
                                  "mycielskian9", "lesmis"])
def test_auto_plan_golden(name):
    """AUTO-planned SpMV matches scipy on real matrices."""
    csr = build_real(name).to_csr()
    A = plan_matrix(csr, dtype=np.float32)
    x = np.random.default_rng(0).standard_normal(
        csr.num_cols).astype(np.float32)
    y = np.asarray(spmv(A, jnp.asarray(x)))
    ref = csr.to_scipy() @ x
    assert np.abs(y - ref).max() / (np.abs(ref).max() + 1) < 2e-5


@pytest.mark.parametrize("name", ["Trefethen_200", "gr_30_30"])
def test_cg_iteration_parity_vs_scipy(name):
    """SPD entries solve with CG; iteration count matches a numpy
    oracle with the same recurrence to ±1."""
    from tpusparse.solvers.cg import cg_solve

    csr = build_real(name).to_csr()
    S = csr.to_scipy()
    b = np.random.default_rng(1).standard_normal(csr.num_rows)
    tol = 1e-8

    x = np.zeros_like(b)
    r = b.copy()
    p = r.copy()
    rs = r @ r
    bn = np.sqrt(b @ b)
    want = 0
    for it in range(1, 2001):
        ap = S @ p
        alpha = rs / (p @ ap)
        x += alpha * p
        r -= alpha * ap
        rs_new = r @ r
        if np.sqrt(rs_new) / bn < tol:
            want = it
            break
        p = r + (rs_new / rs) * p
        rs = rs_new

    A = plan_matrix(csr, dtype=np.float64)
    res = cg_solve(A, jnp.asarray(b), tolerance=tol, max_iters=2000)
    assert bool(res.converged.all())
    assert abs(int(res.iterations) - want) <= 1, (
        int(res.iterations), want)


def test_trefethen_spd():
    """Trefethen matrices are diagonally dominant SPD by construction."""
    csr = build_real("Trefethen_150").to_csr()
    d = csr.to_scipy().toarray()
    assert np.all(np.linalg.eigvalsh(d) > 0)


def test_cli_real_flag(capsys):
    """`--real NAME` feeds any subcommand from the offline
    reconstruction registry (reference: the UFL corpus feeds every
    driver via --mtx, eval_csrmv.sh:14-17)."""
    from tpusparse.bench.run import main as cli_main

    cli_main(["stats", "--real", "karate", "--quiet"])
    out = capsys.readouterr().out.strip()
    parts = out.split(",")
    assert parts[0] == "karate"
    assert int(parts[3]) == 156
