"""Hybrid DIA + remainder partition — dense diagonals on the stream
path, scattered entries on the merge/gather kernels.

``A = A_dia + A_rest`` elementwise, so ``y = A_dia x + A_rest x``
exactly (summing the two partial products is order-independent up to
fp rounding — the same argument the merge kernel's sequential-grid
accumulation already relies on). ``plan_hybrid`` partitions at plan
time; ``ops.spmv`` dispatches on the :class:`HybridPlan` type.

This is the strategy-dispatch answer to VERDICT r2 item 1: stencil
bands do NOT blockify at (8, 128) — a 7-point Laplacian band fills
~4% of such a window, so the 439 GF BSR MXU panel kernel nets
~17 effective-GF, below merge's 25 — but they are *diagonally* dense,
where the DIA stream path wins by an order of magnitude.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax

from tpusparse.formats.dia import DiaDevice
from tpusparse.kernels.dia_nmajor import (
    DiaNMajorDevice,
    spmm_dia_nmajor,
    spmv_dia_nmajor,
)
from tpusparse.kernels.dia_stream import (
    DiaStreamDevice,
    DiaStreamDFDevice,
    spmm_dia_stream,
    spmm_dia_stream_df,
    spmv_dia_stream,
    spmv_dia_stream_df,
)
from tpusparse.ops.dia import spmm_dia, spmv_dia


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class HybridPlan:
    """DIA part + any other device plan for the remainder (None when
    the diagonals cover the whole matrix — then this is pure DIA)."""

    dia: Any            # DiaDevice (XLA op) or DiaStreamDevice (Pallas)
    rest: Any           # merge/ELL/CSR plan or None
    nnz: int            # real nonzeros (for flop accounting)

    def tree_flatten(self):
        return (self.dia, self.rest), (self.nnz,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])


def spmv_hybrid(H: HybridPlan, x, alpha=1.0, beta=0.0, y=None):
    from tpusparse.ops.spmv import spmv

    if isinstance(H.dia, DiaNMajorDevice):
        y_new = spmv_dia_nmajor(H.dia, x)
    elif isinstance(H.dia, DiaStreamDevice):
        y_new = spmv_dia_stream(H.dia, x)
    elif isinstance(H.dia, DiaStreamDFDevice):
        y_new = spmv_dia_stream_df(H.dia, x)
    else:
        y_new = spmv_dia(H.dia, x)
    if H.rest is not None:
        y_new = spmv(H.rest, x, beta=1.0, y=y_new)
    if beta == 0.0 or y is None:
        return alpha * y_new if alpha != 1.0 else y_new
    return alpha * y_new + beta * y


def spmm_hybrid(H: HybridPlan, X, alpha=1.0, beta=0.0, Y=None):
    from tpusparse.ops.spmv import spmm

    if isinstance(H.dia, DiaNMajorDevice):
        Y_new = spmm_dia_nmajor(H.dia, X)
    elif isinstance(H.dia, DiaStreamDevice):
        Y_new = spmm_dia_stream(H.dia, X)
    elif isinstance(H.dia, DiaStreamDFDevice):
        Y_new = spmm_dia_stream_df(H.dia, X)
    else:
        Y_new = spmm_dia(H.dia, X)
    if H.rest is not None:
        Y_new = spmm(H.rest, X, beta=1.0, Y=Y_new)
    if beta == 0.0 or Y is None:
        return alpha * Y_new if alpha != 1.0 else Y_new
    return alpha * Y_new + beta * Y
