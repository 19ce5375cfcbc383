"""Public SpMV / SpMM ops with strategy dispatch.

The reference exposes three CPU work-decomposition strategies plus an
MKL baseline, selected by the ``SpmmKernel`` enum
(``/root/reference/work_2025/types.hpp:11-16``: SIMPLE / MERGE /
NONZERO_SPLIT) and benchmarked against each other
(``cpu_spmv.cpp:750-923``). The TPU-native strategy set is:

  REFERENCE  — pure-XLA gather + segment_sum (the golden model; also the
               analogue of the reference's row/nonzero-splitting OpenMP
               kernels, which XLA parallelizes internally).
  MERGE      — the Pallas merge-tile kernel (flagship; TPU re-design of
               the SC'16 merge-path GPU pipeline).
  BSR        — blocked-CSR panels on the MXU (for block-structured
               matrices; the TPU answer to the reference's BCSR format).
  AUTO       — picks MERGE when a merge-tile plan is available and the
               dtype/shape fits, else REFERENCE.

Reference-enum aliases (simple / nonzero_split) map onto REFERENCE for
CLI/driver parity.
"""

from __future__ import annotations

import enum
from functools import partial

import jax
import jax.numpy as jnp

from tpusparse.formats.csr import CsrMatrix
from tpusparse.ops import reference as ref


class SpmvStrategy(enum.Enum):
    REFERENCE = "reference"
    MERGE = "merge"
    BSR = "bsr"
    AUTO = "auto"

    @classmethod
    def parse(cls, s) -> "SpmvStrategy":
        if isinstance(s, cls):
            return s
        s = str(s).lower()
        aliases = {
            # reference driver kernel names (work_2025/types.hpp)
            "simple": "reference",
            "row_split": "reference",
            "nonzero_split": "reference",
            "mkl": "reference",
        }
        return cls(aliases.get(s, s))


def spmv(A, x, alpha=1.0, beta=0.0, y=None, strategy="auto"):
    """y = alpha * A @ x + beta * y.

    ``A`` may be a device CsrMatrix, a MergeTilesDevice plan, or a
    BcsrMatrix; ``strategy`` selects the kernel (AUTO dispatches on the
    type of ``A``)."""
    strategy = SpmvStrategy.parse(strategy)
    from tpusparse.formats.bcsr import BcsrMatrix

    if isinstance(A, CsrMatrix):
        return ref.spmv_reference(A, x, alpha=alpha, beta=beta, y=y)
    if isinstance(A, BcsrMatrix):
        from tpusparse.kernels import bsr as bsr_kernel

        return bsr_kernel.bsr_spmv(A, x, alpha=alpha, beta=beta, y=y)
    # MergeTilesDevice
    from tpusparse.kernels import merge_spmv

    return merge_spmv.spmv_merge(A, x, alpha=alpha, beta=beta, y=y)


def spmm(A, X, alpha=1.0, beta=0.0, Y=None, strategy="auto"):
    """Y = alpha * A @ X + beta * Y, X of shape (num_cols, L)."""
    strategy = SpmvStrategy.parse(strategy)
    from tpusparse.formats.bcsr import BcsrMatrix

    if isinstance(A, CsrMatrix):
        return ref.spmm_reference(A, X, alpha=alpha, beta=beta, Y=Y)
    if isinstance(A, BcsrMatrix):
        from tpusparse.kernels import bsr as bsr_kernel

        return bsr_kernel.bsr_spmm(A, X, alpha=alpha, beta=beta, Y=Y)
    from tpusparse.kernels import spmm_tiles

    return spmm_tiles.spmm_merge(A, X, alpha=alpha, beta=beta, Y=Y)
