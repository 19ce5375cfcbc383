"""Pallas gather-job SpMM — the multi-RHS flagship kernel.

Replaces the reference's SIMD-over-RHS SpMM kernels
(``OmpCsrSpmmT`` row_splitting.hpp:18, ``OmpMergeCsrmm``
merge_based.hpp:49): the RHS block rides the VPU lanes as dense
(L, 128) register tiles, one lane per matrix row.

Per grid step (one EllTiles tile = J gather jobs x 128 rows), for each
job:

    acc += take_along_axis(X[job_cblk], local_cols) * vals

— one x-block read, one hardware lane-gather, one FMA. Row sums emerge
in lane order (a job holds at most one entry per row), so there is no
scan, no extraction, and no scatter; tiles of a row block are
consecutive and accumulate into a revisited (1, L, 128) output block
(zeroed on first visit, written back once per row block).

Requires X resident in VMEM: num_cols * L * 4B <= ~10 MB. ops.spmm's
AUTO policy falls back to the merge kernel otherwise or when the
job-packing occupancy says the pattern is too irregular (skewed rows /
scattered columns).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.kernels._util import kernel_no_x64, tala32
from tpusparse.formats.ell import EllTiles, LANES

# RHS-block VMEM budget: the kernels raise Mosaic's scoped-vmem limit
# per call (merge_spmv._vmem_params; v5e carries 128 MB), so the RHS
# block may take most of it before the lane-chunk fallback engages.
X_VMEM_BUDGET_BYTES = 64 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceEll:
    num_rows: int
    num_cols: int
    nnz: int
    jobs_per_tile: int

    vals: Any         # (ntiles, J, 128)
    local_cols: Any   # (ntiles, J, 128) int32
    row_block: Any    # (ntiles,) int32
    new_block: Any    # (ntiles,) int32
    job_cblk: Any     # (ntiles*J,) int32

    def tree_flatten(self):
        return (
            (self.vals, self.local_cols, self.row_block, self.new_block,
             self.job_cblk),
            (self.num_rows, self.num_cols, self.nnz, self.jobs_per_tile),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)

    @property
    def ntiles(self) -> int:
        return int(self.vals.shape[0])

    @property
    def dtype(self):
        return self.vals.dtype


def to_device_ell(tiles: EllTiles, dtype=np.float32) -> DeviceEll:
    return DeviceEll(
        num_rows=tiles.num_rows,
        num_cols=tiles.num_cols,
        nnz=tiles.nnz,
        jobs_per_tile=tiles.jobs_per_tile,
        vals=jnp.asarray(np.asarray(tiles.vals, dtype=dtype)),
        local_cols=jnp.asarray(tiles.local_cols),
        row_block=jnp.asarray(tiles.row_block),
        new_block=jnp.asarray(tiles.new_block),
        job_cblk=jnp.asarray(tiles.job_cblk),
    )


@kernel_no_x64
def _ell_kernel(J: int, L: int,
                rb_ref, new_ref, cblk_ref, vals_ref, lc_ref, x_ref,
                y_ref):
    t = pl.program_id(0)

    @pl.when(new_ref[t] == 1)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    acc = jnp.zeros((L, LANES), x_ref.dtype)
    for j in range(J):
        xq = x_ref[cblk_ref[0, 0, j]]             # (L, 128)
        b = jnp.broadcast_to(lc_ref[0, j, :][None, :], (L, LANES))
        cand = tala32(xq, b, axis=1)
        v = jnp.broadcast_to(vals_ref[0, j, :][None, :], (L, LANES))
        acc = acc + cand * v
    y_ref[0] = y_ref[0] + acc


@functools.partial(jax.jit, static_argnames=("mb",))
@kernel_no_x64
def _spmm_ell(A: DeviceEll, x3, mb: int):
    """x3: (Nb, L, 128) VMEM-resident RHS; returns (mb, L, 128)."""
    from tpusparse.kernels.merge_spmv import _vmem_params

    L = x3.shape[1]
    itemsize = np.dtype(A.dtype).itemsize
    # rb (out index map) and new stay scalar-prefetched (8 B/tile).
    # cblk is only read in the kernel body, and at ntiles*J elements a
    # whole-array prefetch overflows the 1 MB SMEM on multi-million-row
    # matrices (lap3d-160: u8[2048000] > 1048576) — stream it as a
    # per-step (1, 1, J) SMEM block instead (J*4 B resident).
    y3 = pl.pallas_call(
        functools.partial(_ell_kernel, A.jobs_per_tile, L),
        compiler_params=_vmem_params(
            (x3.size + mb * L * LANES) * itemsize,
            2 * A.jobs_per_tile, 1),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # rb, new
            grid=(A.ntiles,),
            in_specs=[
                pl.BlockSpec((1, 1, A.jobs_per_tile),
                             lambda i, rb, nw: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, A.jobs_per_tile, LANES),
                             lambda i, rb, nw: (i, 0, 0)),
                pl.BlockSpec((1, A.jobs_per_tile, LANES),
                             lambda i, rb, nw: (i, 0, 0)),
                pl.BlockSpec(x3.shape,
                             lambda i, rb, nw: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, L, LANES), lambda i, rb, nw: (rb[i], 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((mb, L, LANES), A.vals.dtype),
        interpret=_interpret(),
    )(A.row_block, A.new_block,
      A.job_cblk.reshape(A.ntiles, 1, A.jobs_per_tile),
      A.vals, A.local_cols, x3)
    return y3


def _to_x3(A: DeviceEll, X):
    """(num_cols, L) -> (Nb, L, 128), one pad block for padding jobs."""
    L = X.shape[1]
    nb = -(-A.num_cols // LANES) + 1
    Xp = jnp.zeros((nb * LANES, L), dtype=A.dtype)
    Xp = Xp.at[: A.num_cols].set(X.astype(A.dtype))
    return jnp.transpose(Xp.reshape(nb, LANES, L), (0, 2, 1))


def spmm_ell(A: DeviceEll, X, alpha=1.0, beta=0.0, Y=None):
    """Y = alpha * A @ X + beta * Y, X (num_cols, L).

    When the full RHS block exceeds the VMEM budget, the lane dimension
    is split into chunks that fit (the matrix tile stream is re-read
    per chunk — amortized over L/chunk lanes)."""
    squeeze = False
    if X.ndim == 1:
        X = X[:, None]
        squeeze = True
    L = X.shape[1]
    # Mosaic's lane gather needs a full (>=8, 128) register tile; pad
    # narrow RHS blocks up to 8 lanes.
    Lp = max(-(-L // 8) * 8, 8)
    if Lp != L:
        X = jnp.concatenate(
            [X, jnp.zeros((X.shape[0], Lp - L), X.dtype)], axis=1
        )
    # chunk the lane dimension to the VMEM budget
    itemsize = np.dtype(A.dtype).itemsize
    # the formulation needs the RHS block resident in VMEM, and the
    # lane chunk cannot drop below Mosaic's 8-lane register tile — a
    # matrix whose 8-lane X slab alone exceeds the scoped-vmem ceiling
    # (~100 MB, merge_spmv._vmem_params) cannot run on this kernel at
    # any chunking (observed: lap3d-160, 4.1M cols -> 131 MB slab)
    if A.num_cols * itemsize * 8 > 100 * 1024 * 1024:
        raise ValueError(
            f"row_split/ELL SpMM needs an 8-lane RHS slab resident in "
            f"VMEM; {A.num_cols} cols x 8 lanes = "
            f"{A.num_cols * itemsize * 8 / 2**20:.0f} MB exceeds the "
            f"~100 MB scoped-vmem ceiling. Use strategy='merge' (or "
            f"'dia' for banded matrices) at this size."
        )
    max_lanes = max(
        (X_VMEM_BUDGET_BYTES // (A.num_cols * itemsize)) // 8 * 8, 8
    )
    mb = -(-A.num_rows // LANES)
    outs = []
    for s in range(0, Lp, max_lanes):
        chunk = X[:, s : s + max_lanes]
        x3 = _to_x3(A, chunk)
        y3 = _spmm_ell(A, x3, mb)
        outs.append(
            jnp.transpose(y3, (0, 2, 1)).reshape(-1, chunk.shape[1])
        )
    Y_new = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
    Y_new = Y_new[: A.num_rows, :L]
    if squeeze:
        Y_new = Y_new[:, 0]
    if beta == 0.0 or Y is None:
        return alpha * Y_new
    return alpha * Y_new + beta * Y


def spmv_ell(A: DeviceEll, x, alpha=1.0, beta=0.0, y=None):
    return spmm_ell(A, x, alpha=alpha, beta=beta, Y=y)


def ell_fits(num_cols: int, L: int, itemsize: int = 4) -> bool:
    return num_cols * L * itemsize <= X_VMEM_BUDGET_BYTES


# ---------------------------------------------------------------------------
# Padded-layout helpers for solvers that keep state in kernel layout
# ---------------------------------------------------------------------------

def pack_rows(A: DeviceEll, V):
    """(num_rows, L) -> (mb, L, 128) row-space kernel layout."""
    L = V.shape[1]
    mb = -(-A.num_rows // LANES)
    Vp = jnp.zeros((mb * LANES, L), dtype=A.dtype)
    Vp = Vp.at[: A.num_rows].set(V.astype(A.dtype))
    return jnp.transpose(Vp.reshape(mb, LANES, L), (0, 2, 1))


def unpack_rows(A: DeviceEll, V3):
    """(mb, L, 128) -> (num_rows, L)."""
    L = V3.shape[1]
    return jnp.transpose(V3, (0, 2, 1)).reshape(-1, L)[: A.num_rows]


def spmm_ell_packed(A: DeviceEll, P3):
    """Y3 = A @ P3 with both operands in (blocks, L, 128) layout —
    square matrices only (row space == column space). Skips the per-call
    pack/transpose passes; used by the layout-native CG driver."""
    L = P3.shape[1]
    mb = -(-A.num_rows // LANES)
    # one zero pad block for padding jobs (cblk sentinel)
    x3 = jnp.concatenate(
        [P3, jnp.zeros((1 + max(-(-A.num_cols // LANES) - mb, 0), L,
                        LANES), dtype=P3.dtype)],
        axis=0,
    )
    return _spmm_ell(A, x3, mb)
