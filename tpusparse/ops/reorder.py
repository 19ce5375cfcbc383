"""Symmetric relabeling + bandwidth-reducing (RCM) reordering.

Reference capability: ``CooMatrix::InitCsrRelabel``
(``/root/reference/sparse_matrix.h:184-207``) — rebuild a matrix under
a vertex relabeling ``A_new[relabel[i], relabel[j]] = A[i, j]``. The
reference ships the mechanism only (no caller computes an ordering);
here it anchors the TPU-side use that actually pays: a
reverse-Cuthill-McKee pre-order collapses a scrambled-banded matrix
back to a low-bandwidth form, which the partition planner then maps to
cheap contiguous windows (small col spans) or the DIA fast path —
instead of wide scattered gathers. Solvers are unaffected numerically:
``P A P^T`` is similar to ``A``, so CG trajectories (and iteration
counts) match up to rounding.

``ReorderedPlan`` wraps any inner device plan built on the permuted
matrix; ``ops.spmv.spmv``/``spmm`` dispatch on it and apply the
permutation as two device gathers per call (O(n) — negligible next to
any sparse kernel).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from tpusparse.formats.csr import CsrMatrix

# reorder='auto' gate: apply RCM only when it recovers substantial
# locality — the RCM bandwidth must undercut a quarter of the original
# (plus a 128-column dead band below which window partitions don't
# care). Already-banded inputs keep their native order.
RCM_GAIN = 0.25
RCM_SLACK = 128
# Secondary gate for patterns whose MAX bandwidth stays huge (hub rows)
# but whose bulk locality still improves — RCM halves R-MAT-16's mean
# span even though its max bandwidth barely moves. Cheap prefilter:
# mean |i - j| must improve >= RCM_MEANBW_GAIN; then the partition
# chooser's calibrated occupancy-over-cost score must improve
# >= RCM_SCORE_GAIN on the actually-built permuted matrix (measured:
# fem-50k 2.03x and rmat-16 1.43x fire; rmat-14 1.25x, rmat-11 1.09x,
# lap3d 0.83x, wheel 1.00x keep their order).
RCM_MEANBW_GAIN = 1.5
RCM_SCORE_GAIN = 1.3
# Degree-sort candidate (order='degree'): clustering HOT COLUMNS into
# the first x blocks shrinks the per-tile MEAN column span on
# power-law patterns (rmat-16: 15.0 -> 8.9, 2241 -> 1947 tiles).
# On-chip truth (scripts/r4_reorder_inner.py): the win does NOT
# materialize — the kernel's static gather trip is the CLASS MAX
# span, hub tiles are irreducible under any symmetric ordering, and
# the permuted-space kernel measured 346 us vs natural 289 on
# rmat-16 (RCM 362). The order stays available explicitly (same
# benchmarkable-alternative status as strategy='nonzero_split');
# 'auto' evaluates it only when the top ~3% of columns carry
# >= DEGREE_TOP_FRAC of the nonzeros (measured: rmat 0.57-0.61 vs
# lap3d/fem/wheel 0.03-0.05) and the matrix is not DIA-eligible,
# then gates on the chooser score — which correctly REFUSES rmat-16
# (gain 1.18 < 1.3; the chip confirmed the refusal).
DEGREE_TOP_FRAC = 0.25


def bandwidth(csr: CsrMatrix) -> int:
    """max |i - j| over the stored entries (0 for empty matrices)."""
    ro = np.asarray(csr.row_offsets)
    ci = np.asarray(csr.col_indices).astype(np.int64)
    if ci.size == 0:
        return 0
    rows = np.repeat(np.arange(csr.num_rows, dtype=np.int64),
                     np.diff(ro))
    return int(np.abs(rows - ci).max())


def permute_symmetric(csr: CsrMatrix, perm: np.ndarray) -> CsrMatrix:
    """``A_p[i, j] = A[perm[i], perm[j]]`` for a permutation array
    ``perm`` (row i of the result is row perm[i] of the input).

    Equivalent to the reference's ``InitCsrRelabel``
    (``sparse_matrix.h:184-207``) with ``relabel = argsort(perm)``:
    the reference names the OLD->NEW map, this names NEW->OLD (the
    gather convention, which is what device-side vector permutation
    wants). Square matrices only.
    """
    if csr.num_rows != csr.num_cols:
        raise ValueError("symmetric permutation needs a square matrix")
    n = csr.num_rows
    perm = np.asarray(perm, dtype=np.int64)
    if perm.shape != (n,):
        raise ValueError(f"perm must have shape ({n},)")
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n, dtype=np.int64)

    ro = np.asarray(csr.row_offsets).astype(np.int64)
    ci = np.asarray(csr.col_indices).astype(np.int64)
    va = np.asarray(csr.values)
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(ro))
    new_rows = inv[rows]
    new_cols = inv[ci]
    # CSR invariant: entries sorted by (row, col) — native counting
    # sort when available (the lexsort costs seconds at 10M nnz)
    o = None
    try:
        from tpusparse.utils import native

        o = native.coo_sort_order(n, new_rows, new_cols)
    except ImportError:
        o = None
    if o is None:
        o = np.lexsort((new_cols, new_rows))
    new_rows, new_cols, va2 = new_rows[o], new_cols[o], va[o]
    ro2 = np.zeros(n + 1, dtype=ro.dtype)
    np.cumsum(np.bincount(new_rows, minlength=n), out=ro2[1:])
    return CsrMatrix(
        num_rows=n, num_cols=n,
        row_offsets=ro2.astype(np.asarray(csr.row_offsets).dtype),
        col_indices=new_cols.astype(np.asarray(csr.col_indices).dtype),
        values=va2,
    )


def degree_order(csr: CsrMatrix) -> np.ndarray:
    """Column-degree-descending ordering (hub columns first), gather
    convention (``permute_symmetric(csr, perm)`` has the hot columns
    packed into the leading 128-column blocks). Stable, so ties keep
    their native relative order — uniform-degree matrices come back
    unchanged."""
    ci = np.asarray(csr.col_indices).astype(np.int64)
    deg = np.bincount(ci, minlength=csr.num_cols)
    return np.argsort(-deg, kind="stable").astype(np.int64)


def _degree_concentration(csr: CsrMatrix) -> float:
    """Fraction of nonzeros carried by the top ~3% highest-degree
    columns — the cheap O(nnz) prefilter for the degree candidate.
    Matrices under 1024 columns report 0.0: with fewer than ~8
    128-column blocks the k-floor would make the 'top set' a quarter
    of all columns (trivially concentrated), and hot-column
    clustering has nothing to cluster INTO anyway."""
    ci = np.asarray(csr.col_indices).astype(np.int64)
    if ci.size == 0 or csr.num_cols < 1024:
        return 0.0
    deg = np.bincount(ci, minlength=csr.num_cols)
    k = max(csr.num_cols // 32, 128)
    return float(np.sort(deg)[::-1][:k].sum()) / csr.nnz


def _dia_eligible(csr: CsrMatrix) -> bool:
    """Would AUTO peel this matrix onto the DIA path? (Same coverage
    test as ops.spmv._try_plan_dia — reordering must not scramble a
    matrix the planner would otherwise run as dense diagonals.)"""
    from tpusparse.formats.dia import diagonal_profile, select_diagonals
    from tpusparse.ops.spmv import DIA_MIN_COVERAGE

    offsets = select_diagonals(csr)
    if offsets.size == 0:
        return False
    all_off, counts, _ = diagonal_profile(csr)
    covered = int(counts[np.isin(all_off, offsets)].sum())
    return covered >= DIA_MIN_COVERAGE * csr.nnz


def rcm_order(csr: CsrMatrix) -> np.ndarray:
    """Reverse-Cuthill-McKee ordering of the symmetrized pattern:
    ``perm`` in the gather convention (``permute_symmetric(csr, perm)``
    has the reduced bandwidth)."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    sp = csr.to_scipy().tocsr()
    return np.asarray(
        reverse_cuthill_mckee(sp, symmetric_mode=False), dtype=np.int64
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ReorderedPlan:
    """Any device plan built on ``P A P^T``, plus the permutation as
    device gather indices. ``spmv``/``spmm`` dispatch:
    ``y = (alpha * A_p @ x[perm])[inv_perm] + beta * y``."""

    num_rows: int
    num_cols: int
    nnz: int
    inner: Any
    perm: Any        # (n,) int32 device — new -> old
    inv_perm: Any    # (n,) int32 device — old -> new
    order: str = "rcm"   # which ordering built the permutation
                         # ('rcm' | 'degree') — the plan_kind prefix
    # Pallas permutation plans (kernels/permute.py) — XLA's element
    # gather runs at ~0.14 Gelem/s on TPU (470 us per permute at 65k,
    # the round-4 A/B), the kernel at the hardware-gather rate. None
    # falls back to the XLA gather (and fp64 vectors always do:
    # Mosaic has no 64-bit types).
    kperm: Any = None
    kinv: Any = None

    def tree_flatten(self):
        return ((self.inner, self.perm, self.inv_perm, self.kperm,
                 self.kinv),
                (self.num_rows, self.num_cols, self.nnz, self.order))

    @classmethod
    def tree_unflatten(cls, aux, children):
        inner, perm, inv, kperm, kinv = children
        nr, nc, nnz, order = aux
        return cls(nr, nc, nnz, inner, perm, inv, order, kperm, kinv)

    def apply_perm(self, x):
        """``x[perm]`` (original -> permuted space), via the Pallas
        permute kernel for 32-bit-width 1-D vectors."""
        x = jnp.asarray(x)
        if (self.kperm is not None and x.ndim == 1
                and x.dtype.itemsize == 4):
            from tpusparse.kernels.permute import permute_apply

            return permute_apply(self.kperm, x)
        return x[self.perm]

    def apply_inv(self, y):
        """``y[inv_perm]`` (permuted -> original space)."""
        y = jnp.asarray(y)
        if (self.kinv is not None and y.ndim == 1
                and y.dtype.itemsize == 4):
            from tpusparse.kernels.permute import permute_apply

            return permute_apply(self.kinv, y)
        return y[self.inv_perm]

    @property
    def dtype(self):
        return getattr(self.inner, "dtype", None)


def _wrap_reordered(csr, perm, inv, strategy, dtype, L, order_name,
                    csr_p=None):
    from tpusparse.ops.spmv import plan_matrix

    if csr_p is None:
        csr_p = permute_symmetric(csr, perm)
    inner = plan_matrix(csr_p, strategy=strategy, dtype=dtype, L=L)
    from tpusparse.kernels.permute import build_permute_plan

    return ReorderedPlan(
        num_rows=csr.num_rows, num_cols=csr.num_cols, nnz=csr.nnz,
        inner=inner,
        perm=jnp.asarray(perm.astype(np.int32)),
        inv_perm=jnp.asarray(inv.astype(np.int32)),
        order=order_name,
        kperm=build_permute_plan(perm),
        kinv=build_permute_plan(inv),
    )


def plan_reorder(csr: CsrMatrix, strategy="auto", dtype=None,
                 L: int = 1, order: str = "rcm"):
    """Build a plan on a symmetrically permuted matrix, wrapped so
    callers use it exactly like any other plan.

    ``order='rcm'`` / ``order='degree'`` always permute (bandwidth
    recovery / hot-column clustering); ``order='auto'`` permutes only
    when a candidate clears its gates — RCM when it recovers
    substantial bandwidth locality, degree-sort when the pattern's
    column degrees are concentrated (:data:`DEGREE_TOP_FRAC`) and the
    matrix is not DIA-eligible — ranking the survivors by the
    partition chooser's calibrated score and returning a plain
    un-permuted plan when nothing clears :data:`RCM_SCORE_GAIN`.
    """
    from tpusparse.ops.spmv import plan_matrix

    if order not in ("rcm", "degree", "auto"):
        raise ValueError(f"unknown order {order!r}")
    if csr.num_rows != csr.num_cols or csr.nnz == 0:
        return plan_matrix(csr, strategy=strategy, dtype=dtype, L=L)
    if order == "degree":
        perm = degree_order(csr)
        return _wrap_reordered(csr, perm, np.argsort(perm), strategy,
                               dtype, L, "degree")
    perm = rcm_order(csr)
    inv = np.argsort(perm)
    if order == "rcm":
        return _wrap_reordered(csr, perm, inv, strategy, dtype, L,
                               "rcm")
    # order == 'auto'
    # permuted bandwidth straight from the relabeling — O(nnz),
    # no need to build the permuted matrix to reject the gate
    ro = np.asarray(csr.row_offsets)
    ci = np.asarray(csr.col_indices).astype(np.int64)
    rows = np.repeat(np.arange(csr.num_rows, dtype=np.int64),
                     np.diff(ro))
    d_orig = np.abs(rows - ci)
    d_perm = np.abs(inv[rows] - inv[ci])
    if int(d_perm.max()) + RCM_SLACK <= RCM_GAIN * int(d_orig.max()):
        # primary gate: RCM recovers a banded form outright
        return _wrap_reordered(csr, perm, inv, strategy, dtype, L,
                               "rcm")
    # hub rows can pin the max bandwidth while the bulk still
    # localizes — candidates that pass their cheap prefilter are
    # scored on the actually-built permuted matrix by the partition
    # chooser's calibrated occupancy-over-cost score
    candidates = []
    if float(d_perm.mean()) * RCM_MEANBW_GAIN <= float(d_orig.mean()):
        candidates.append(("rcm", perm, inv))
    if (_degree_concentration(csr) >= DEGREE_TOP_FRAC
            and not _dia_eligible(csr)):
        dperm = degree_order(csr)
        candidates.append(("degree", dperm, np.argsort(dperm)))
    if not candidates:
        return plan_matrix(csr, strategy=strategy, dtype=dtype, L=L)
    from tpusparse.formats.tiles import choose_partition_params

    _, s_orig = choose_partition_params(csr, return_score=True)
    scored = []
    for name, p, iv in candidates:
        csr_p = permute_symmetric(csr, p)
        _, s = choose_partition_params(csr_p, return_score=True)
        if s > RCM_SCORE_GAIN * s_orig:  # each candidate must clear
            scored.append((s, name, p, iv, csr_p))  # the gate ITSELF
    if not scored:
        return plan_matrix(csr, strategy=strategy, dtype=dtype, L=L)
    best = max(scored, key=lambda t: t[0])
    # tie-break toward degree inside the score proxy's resolution: on
    # rmat-16-ef4 the chip measured degree 78.1 us vs rcm 87.1-95.4
    # while the scores read 1.96 vs 2.03 — within ~10% the measured
    # ordering, not the proxy, decides (scripts/r4_reorder_inner.py)
    deg = next((t for t in scored if t[1] == "degree"), None)
    if deg is not None and deg[0] > 0.9 * best[0]:
        best = deg
    _, name, p, iv, csr_p = best
    return _wrap_reordered(csr, p, iv, strategy, dtype, L, name,
                           csr_p=csr_p)
