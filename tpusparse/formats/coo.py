"""COO (coordinate) sparse matrix.

Capability parity with the reference's ``CooMatrix``
(``/root/reference/sparse_matrix.h:118-624``): construction from
Matrix Market files and synthetic generators, duplicate handling, and
conversion to CSR. Re-designed as a host-side numpy container — on TPU
the device-resident formats are :class:`~tpusparse.formats.csr.CsrMatrix`
(pytree of jnp arrays) and :class:`~tpusparse.formats.tiles.MergeTiles`.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class CooMatrix:
    """Coordinate-format sparse matrix (host-side, numpy).

    Rows/cols are int32 (int64 when dims exceed int32 range), values
    float32/float64.
    """

    num_rows: int
    num_cols: int
    rows: np.ndarray
    cols: np.ndarray
    vals: np.ndarray

    @property
    def nnz(self) -> int:
        return int(self.rows.shape[0])

    @property
    def shape(self) -> tuple[int, int]:
        return (self.num_rows, self.num_cols)

    @property
    def dtype(self):
        return self.vals.dtype

    def __post_init__(self):
        self.rows = np.asarray(self.rows)
        self.cols = np.asarray(self.cols)
        self.vals = np.asarray(self.vals)
        if not (self.rows.shape == self.cols.shape == self.vals.shape):
            raise ValueError(
                f"COO arrays must have equal shapes, got {self.rows.shape}, "
                f"{self.cols.shape}, {self.vals.shape}"
            )

    @classmethod
    def from_arrays(cls, rows, cols, vals, shape) -> "CooMatrix":
        return cls(int(shape[0]), int(shape[1]), rows, cols, vals)

    def sorted_by_row(self) -> "CooMatrix":
        """Return a copy sorted by (row, col) — stable, like the reference's
        CSR build (``sparse_matrix.h:668-704`` uses std::stable_sort).

        Already-sorted input (the common case: row-major .mtx files and
        every matrix this package writes or generates) is detected with
        one linear pass and returned as-is — the lexsort cost 4.5 s at
        7M nnz and dominated matrix-load latency once the partitioners
        went native."""
        r, c = self.rows, self.cols
        if r.size == 0:
            return self
        # non-decreasing (row, col) pairs need no sort: a stable sort
        # of already-ordered keys is the identity, including for
        # adjacent duplicate coordinates
        if bool(((r[1:] > r[:-1]) | ((r[1:] == r[:-1])
                                     & (c[1:] >= c[:-1]))).all()):
            return self
        order = None
        import os

        # Sort-strategy heuristic: numpy's introsort exploits runs, so
        # NEARLY-sorted streams (diagonal-stacked generators: a handful
        # of row descents) sort faster with lexsort (0.9 s vs 2.4 s at
        # 7M nnz); substantially scrambled streams (symmetric .mtx
        # expansion, random) are ~2.3x faster through the native
        # counting sort (row-bucket scatter + per-row column sort).
        descents = int(np.count_nonzero(r[1:] < r[:-1]))
        if (descents * 64 > r.size
                and os.environ.get("TPUSPARSE_NO_NATIVE") != "1"):
            try:
                from tpusparse.utils import native

                order = native.coo_sort_order(self.num_rows, r, c)
            except ImportError:
                order = None
        if order is None:
            order = np.lexsort((c, r))
        return CooMatrix(
            self.num_rows,
            self.num_cols,
            r[order],
            c[order],
            self.vals[order],
        )

    def sum_duplicates(self) -> "CooMatrix":
        """Coalesce duplicate (row, col) entries by summation."""
        order = np.lexsort((self.cols, self.rows))
        r, c, v = self.rows[order], self.cols[order], self.vals[order]
        if r.size == 0:
            return self
        key_change = np.empty(r.size, dtype=bool)
        key_change[0] = True
        key_change[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
        group = np.cumsum(key_change) - 1
        n_groups = int(group[-1]) + 1
        out_v = np.zeros(n_groups, dtype=v.dtype)
        np.add.at(out_v, group, v)
        return CooMatrix(
            self.num_rows, self.num_cols, r[key_change], c[key_change], out_v
        )

    def to_dense(self) -> np.ndarray:
        d = np.zeros((self.num_rows, self.num_cols), dtype=self.vals.dtype)
        np.add.at(d, (self.rows, self.cols), self.vals)
        return d

    def to_scipy(self):
        import scipy.sparse as sp

        return sp.coo_matrix(
            (self.vals, (self.rows, self.cols)), shape=self.shape
        )

    def to_csr(self, sum_dups: bool = False):
        from tpusparse.formats.csr import CsrMatrix

        return CsrMatrix.from_coo(self, sum_dups=sum_dups)

    def astype(self, dtype) -> "CooMatrix":
        return CooMatrix(
            self.num_rows, self.num_cols, self.rows, self.cols,
            self.vals.astype(dtype),
        )
