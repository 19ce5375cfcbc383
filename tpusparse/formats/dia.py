"""DIA (diagonal) format — the dense structure stencil matrices have.

The reference's BCSR format (``/root/reference/sparse_matrix.h:993-1258``)
captures *block*-dense substructure; its grid2d/grid3d fixtures
(``sparse_matrix.h:458-623``), however, are banded: every nonzero sits
on one of a handful of constant diagonals (7 for the 3-D Laplacian).
At TPU tile shapes those bands are the wrong kind of dense — an
(8, 128) block window over a 7-point stencil band holds ~4% nonzeros,
so the BSR MXU panel kernel (439 GF on dense fill) delivers only
~4% x 439 ≈ 17 effective-GF, *below* the merge kernel's 25 GF. The
dense structure the hardware can exploit is the *diagonal run*:

    y[i] += d_k[i] * x[i + off_k]

is a shifted elementwise FMA — unit-stride streams, zero gathers, pure
VPU — and XLA fuses all K diagonals into one pass over the vectors.
That turns SpMV from gather-bound (~25 GF, 25% of the HBM roofline) to
stream-bound.

``select_diagonals`` + ``partition_dia`` split any CSR into a DIA part
(diagonals whose occupancy clears the elementwise-vs-merge break-even)
and a scattered remainder for the merge-tile kernel; y-accumulation is
order-independent so summing the two paths is exact. ``ops.hybrid``
wraps the pair; ``ops.spmv.plan_matrix`` AUTO-gates on coverage.

Layout: row-aligned DIA (scipy.sparse.dia_matrix convention transposed
to row index): ``data[k, i] = A[i, i + offsets[k]]``, zero-filled where
out of range, so the kernel needs no masking.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp


# Break-even occupancy: a DIA plane costs ~2 streams of num_rows slots
# at 4 B/slot (~0.013 ns/slot at the 621 GB/s ceiling) versus
# ~0.08 ns/nnz on the merge-tile kernel for its `count` real entries —
# the plane pays once count/num_rows > ~0.16. Default 0.25 keeps a
# safety margin for the extra hybrid writeback.
MIN_OCCUPANCY = 0.25
MAX_DIAGS = 64


@dataclasses.dataclass
class DiaHost:
    """Host-side DIA plan: ``data[k, i] = A[i, i + offsets[k]]``."""

    num_rows: int
    num_cols: int
    offsets: np.ndarray   # (K,) int64, sorted
    data: np.ndarray      # (K, num_rows), zero where out of range

    @property
    def nnz_slots(self) -> int:
        return int(self.data.size)


def diagonal_profile(csr):
    """(offsets, counts, lengths) for every populated diagonal
    ``off = col - row``; lengths are the in-bounds run lengths."""
    ro = np.asarray(csr.row_offsets).astype(np.int64)
    ci = np.asarray(csr.col_indices).astype(np.int64)
    n, m = csr.num_rows, csr.num_cols
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(ro))
    off = ci - rows
    counts = np.bincount(off + n - 1, minlength=n + m - 1)
    offsets = np.flatnonzero(counts) - (n - 1)
    counts = counts[offsets + n - 1]
    lengths = np.minimum(n, m - offsets) - np.maximum(0, -offsets)
    return offsets, counts, lengths


def select_diagonals(csr, min_occ: float = MIN_OCCUPANCY,
                     max_diags: int = MAX_DIAGS) -> np.ndarray:
    """Offsets worth moving to the DIA path: occupancy >= ``min_occ``,
    highest-count first, at most ``max_diags``. Sorted ascending.

    Occupancy is counted against ``num_rows`` — the *plane* cost — not
    the diagonal's in-bounds length: a DIA plane streams num_rows slots
    regardless of how short the run is, so a 3-entry corner diagonal
    must not be selected just because its run is fully occupied."""
    offsets, counts, _lengths = diagonal_profile(csr)
    occ = counts / max(csr.num_rows, 1)
    keep = occ >= min_occ
    offsets, counts = offsets[keep], counts[keep]
    if offsets.size > max_diags:
        top = np.argsort(counts)[::-1][:max_diags]
        offsets = offsets[top]
    return np.sort(offsets)


def partition_dia(csr, offsets):
    """Split ``csr`` into (DiaHost over ``offsets``, remainder CsrMatrix).

    Every entry whose ``col - row`` is in ``offsets`` lands in the DIA
    data planes (duplicates accumulate, matching CSR semantics);
    everything else keeps CSR order in the remainder."""
    from tpusparse.formats.csr import CsrMatrix

    ro = np.asarray(csr.row_offsets).astype(np.int64)
    ci = np.asarray(csr.col_indices).astype(np.int64)
    va = np.asarray(csr.values)
    n, m = csr.num_rows, csr.num_cols
    offsets = np.sort(np.asarray(offsets, dtype=np.int64))
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(ro))
    off = ci - rows

    if offsets.size:
        pos_c = np.minimum(np.searchsorted(offsets, off),
                           offsets.size - 1)
        on_dia = offsets[pos_c] == off
    else:
        pos_c = np.zeros(off.shape, dtype=np.int64)
        on_dia = np.zeros(off.shape, dtype=bool)

    data = np.zeros((offsets.size, n), dtype=va.dtype)
    np.add.at(data, (pos_c[on_dia], rows[on_dia]), va[on_dia])

    keep = ~on_dia
    counts = np.bincount(rows[keep], minlength=n)
    new_ro = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=new_ro[1:])
    rest = CsrMatrix(n, m, new_ro, ci[keep].astype(np.int32),
                     va[keep].copy())
    return DiaHost(n, m, offsets, data), rest


def plane_constants(data: np.ndarray):
    """Per-plane two-valued detection for masked-DIA compression.

    Returns ``(vals, ok)``: ``ok[k]`` is True when plane k's value
    alphabet is exactly ``{0, vals[k]}`` — i.e. the diagonal is a
    CONSTANT coefficient wherever it is populated (structural zeros
    and boundary gaps are the 0s). Every constant-coefficient stencil
    operator (the reference's grid2d/grid3d fixtures,
    ``/root/reference/sparse_matrix.h:458-623``) satisfies this on all
    planes, so its K f32 value planes compress to ONE int32 bitmask
    word per row (bit k = plane k populated) + K static scalars —
    exact, not approximate: ``mask * c`` reproduces the stored plane
    values bit-for-bit. Empty planes report ok=True, vals=0."""
    K = data.shape[0]
    vals = np.zeros(K, dtype=np.float64)
    ok = np.ones(K, dtype=bool)
    for k in range(K):
        plane = data[k]
        nz = plane[plane != 0]
        if nz.size:
            vals[k] = nz[0]
            ok[k] = bool((nz == nz[0]).all())
    return vals, ok


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DiaDevice:
    """Device DIA operand: static offsets + (K, num_rows) value planes.

    fp64 stays *native* f64: the DIA op is pure elementwise XLA, and
    XLA-TPU's emulated f64 streams measure ~3x faster than a Dekker
    double-float formulation here while keeping genuine IEEE fp64
    semantics (measured lap3d-48: 92 GF native vs 31 GF double-float).
    """

    num_rows: int
    num_cols: int
    offsets: tuple          # static python ints
    data: Any               # (K, num_rows) f32/f64

    def tree_flatten(self):
        return (
            (self.data,),
            (self.num_rows, self.num_cols, self.offsets),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)

    @property
    def nnz(self) -> int:
        # informational: slots, not real nnz
        return int(self.data.shape[0] * self.data.shape[1])


def to_device_dia(dia: DiaHost, dtype=None) -> DiaDevice:
    """Ship a host DIA plan at the requested dtype (fp64 needs x64)."""
    dtype = np.dtype(dtype or dia.data.dtype)
    if dtype.itemsize > 4 and not jax.config.jax_enable_x64:
        raise TypeError(
            "fp64 DIA requires jax_enable_x64=True (the value planes "
            "would silently truncate to f32 otherwise)"
        )
    from tpusparse.utils.transfer import device_put_chunked

    return DiaDevice(
        dia.num_rows, dia.num_cols,
        tuple(int(o) for o in dia.offsets),
        device_put_chunked(dia.data.astype(dtype)),
    )
