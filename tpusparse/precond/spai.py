"""SPAI — static-pattern sparse approximate inverse preconditioner.

Capability parity with ``SparseApproximateInversion``
(``/root/reference/work_2025/cg/sparse_approximate_inversion.hpp:41-321``):

  * static pattern S_M = S_A: M's column k has nonzeros where A's
    column k does;
  * per column k: collect the relevant rows I (rows with a nonzero in
    any column of J = pattern of column k), build the dense |I| x |J|
    least-squares problem min ||A_hat m_k - e_k||, solve by QR
    (reference: LAPACKE_dgels), scatter back;
  * failed solves zero the column;
  * forced symmetrization M <- (M + M^T)/2 afterwards (CG needs a
    symmetric preconditioner).

TPU re-design: the per-column problems are embarrassingly parallel and
tiny — instead of the reference's OpenMP-over-columns + LAPACK, columns
are bucketed by padded problem size and solved as *batched* device
least-squares (vmapped QR on the MXU). The host fallback uses
numpy lstsq per column.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from tpusparse.formats.csr import CsrMatrix


def _build_problems(csr: CsrMatrix):
    """For each column k: J = rows of M column k (= pattern of A column
    k), I = union of rows touched by A columns in J. Returns the CSC
    arrays and per-column index lists (host)."""
    S = csr.to_scipy().tocsc()
    n = csr.num_cols
    indptr, indices = S.indptr, S.indices
    problems = []
    for k in range(n):
        J = indices[indptr[k] : indptr[k + 1]]
        if J.size == 0:
            problems.append((J, np.zeros(0, dtype=np.int64)))
            continue
        I = np.unique(
            np.concatenate([indices[indptr[j] : indptr[j + 1]] for j in J])
        )
        problems.append((J, I))
    return S, problems


def _dense_problem(indptr, indices, data, J, I, out):
    """Fill the |I| x |J| least-squares matrix directly from CSC arrays
    (the scipy fancy-slicing this replaces costs O(n) per column and
    made SPAI construction quadratic)."""
    for j_local, c in enumerate(J):
        s0, s1 = indptr[c], indptr[c + 1]
        local = np.searchsorted(I, indices[s0:s1])
        out[local, j_local] = data[s0:s1]


def spai_inverse(csr: CsrMatrix, batched: bool = True) -> CsrMatrix:
    """Compute the SPAI approximate inverse M of A (static pattern) and
    symmetrize it. Returns a host CsrMatrix."""
    S, problems = _build_problems(csr)
    n = csr.num_cols
    dense_cols = {}

    if batched:
        _solve_batched(S, problems, dense_cols)
    else:
        indptr, indices, data = S.indptr, S.indices, S.data
        for k, (J, I) in enumerate(problems):
            if J.size == 0:
                continue
            A_hat = np.zeros((I.size, J.size))
            _dense_problem(indptr, indices, data, J, I, A_hat)
            e = np.zeros(I.size)
            pos = np.searchsorted(I, k)
            if pos < I.size and I[pos] == k:
                e[pos] = 1.0
            sol, *_ = np.linalg.lstsq(A_hat, e, rcond=None)
            dense_cols[k] = (J, sol)

    # assemble M in CSC order == transpose-of-CSR; then symmetrize
    rows_l, cols_l, vals_l = [], [], []
    for k, (J, I) in enumerate(problems):
        if k not in dense_cols:
            continue
        J_, sol = dense_cols[k]
        rows_l.append(J_)
        cols_l.append(np.full(J_.size, k, dtype=np.int64))
        vals_l.append(sol)
    from tpusparse.formats.coo import CooMatrix

    rows = np.concatenate(rows_l) if rows_l else np.zeros(0, np.int64)
    cols = np.concatenate(cols_l) if cols_l else np.zeros(0, np.int64)
    vals = np.concatenate(vals_l) if vals_l else np.zeros(0)
    M = CsrMatrix.from_coo(
        CooMatrix(n, n, rows.astype(np.int32), cols.astype(np.int32), vals)
    )
    return _symmetrize(M)


def _solve_batched(S, problems, out):
    """Bucket columns by padded (|I|, |J|) and solve each bucket as one
    batched lstsq on device (parity replacement for the reference's
    per-column LAPACKE_dgels loop)."""
    buckets = {}
    for k, (J, I) in enumerate(problems):
        if J.size == 0:
            continue
        mj = 1 << max(int(np.ceil(np.log2(max(J.size, 1)))), 1)
        # rows must hold |I| real equations PLUS one identity row per
        # padded unknown, or the padded system goes singular
        need_rows = I.size + (mj - J.size)
        mi = 1 << max(int(np.ceil(np.log2(max(need_rows, 1)))), 2)
        buckets.setdefault((mi, mj), []).append(k)

    indptr, indices, data = S.indptr, S.indices, S.data
    for (mi, mj), ks in buckets.items():
        A_b = np.zeros((len(ks), mi, mj))
        e_b = np.zeros((len(ks), mi))
        for b, k in enumerate(ks):
            J, I = problems[k]
            _dense_problem(indptr, indices, data, J, I, A_b[b])
            # pad the unused diagonal so the padded problem stays
            # full-rank and does not perturb the real unknowns
            for d in range(J.size, mj):
                if I.size + (d - J.size) < mi:
                    A_b[b, I.size + (d - J.size), d] = 1.0
            pos = np.searchsorted(I, k)
            if pos < I.size and I[pos] == k:
                e_b[b, pos] = 1.0

        sol = _batched_lstsq(jnp.asarray(A_b), jnp.asarray(e_b))
        sol = np.asarray(sol)
        for b, k in enumerate(ks):
            J, I = problems[k]
            out[k] = (J, sol[b, : J.size])


@jax.jit
def _batched_lstsq(A, e):
    """vmapped least squares via QR — the MXU path."""
    def one(Ai, ei):
        q, r = jnp.linalg.qr(Ai)
        return jax.scipy.linalg.solve_triangular(
            r, q.T @ ei, lower=False
        )

    return jax.vmap(one)(A, e)


def _symmetrize(M: CsrMatrix) -> CsrMatrix:
    """M <- (M + M^T)/2 (parity: sparse_approximate_inversion.hpp:
    268-318)."""
    S = M.to_scipy()
    Msym = (S + S.T) * 0.5
    return CsrMatrix.from_scipy(Msym.tocsr())
