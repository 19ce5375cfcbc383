"""Pallas layered-ELL SpMM — the multi-RHS flagship kernel.

Replaces the reference's SIMD-over-RHS SpMM kernels
(``OmpCsrSpmmT`` row_splitting.hpp:18, ``OmpMergeCsrmm``
merge_based.hpp:49): the RHS block rides the VPU lanes as dense
(L, 128) register tiles, one lane per matrix row.

Per grid step (one EllTiles tile = 8 slots x 128 rows):
  * for each slot position i: lane-gather the (L, 128) X values of the
    chunk's columns from the VMEM-resident X (select-loop over the
    chunk's static span — per-diagonal anchors keep it at 1-3);
  * multiply by the chunk's values (broadcast over L) and accumulate —
    the 128 per-row partial sums emerge in lane order with NO scan,
    extraction, or scatter;
  * the output block (1, L, 128) is revisited by consecutive layers of
    the same row block (zeroed on the first), so layer accumulation is
    free and write-back happens once per row block.

Requires X resident in VMEM: num_cols * L * 4B <= ~10 MB. ops.spmm's
AUTO policy falls back to the merge kernel otherwise or when the ELL
occupancy / gather span says the pattern is too irregular (skewed rows).
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

from tpusparse.formats.ell import EllTiles, LANES, SUBLANES

X_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceEll:
    num_rows: int
    num_cols: int
    nnz: int
    gather_rows: int

    vals: Any         # (ntiles, 8, 128)
    local_cols: Any   # (ntiles, 8, 128) int32
    row_block: Any    # (ntiles,) int32
    new_block: Any    # (ntiles,) int32
    chunk_cblk: Any   # (ntiles*8,) int32

    def tree_flatten(self):
        return (
            (self.vals, self.local_cols, self.row_block, self.new_block,
             self.chunk_cblk),
            (self.num_rows, self.num_cols, self.nnz, self.gather_rows),
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
        gather_rows=tiles.gather_rows,
        vals=jnp.asarray(np.asarray(tiles.vals, dtype=dtype)),
        local_cols=jnp.asarray(tiles.local_cols),
        row_block=jnp.asarray(tiles.row_block),
        new_block=jnp.asarray(tiles.new_block),
        chunk_cblk=jnp.asarray(tiles.chunk_cblk),
    )


def _ell_kernel(gather_rows: int, L: int,
                rb_ref, new_ref, cblk_ref, vals_ref, lc_ref, x_ref,
                y_ref):
    t = pl.program_id(0)

    @pl.when(new_ref[t] == 1)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    acc = jnp.zeros((L, LANES), x_ref.dtype)
    for i in range(SUBLANES):
        lc = lc_ref[0, i, :]                      # (128,) int32
        b = jnp.broadcast_to((lc % LANES)[None, :], (L, LANES))
        q = jnp.broadcast_to((lc // LANES)[None, :], (L, LANES))
        cblk = cblk_ref[t * SUBLANES + i]
        g = jnp.zeros((L, LANES), x_ref.dtype)
        for qq in range(gather_rows):
            xq = x_ref[cblk + qq]                 # (L, 128)
            cand = jnp.take_along_axis(xq, b, axis=1)
            g = jnp.where(q == qq, cand, g)
        v = jnp.broadcast_to(vals_ref[0, i, :][None, :], (L, LANES))
        acc = acc + g * v
    y_ref[0] = y_ref[0] + acc


@functools.partial(jax.jit, static_argnames=("mb",))
def _spmm_ell(A: DeviceEll, x3, mb: int):
    """x3: (Nb, L, 128) VMEM-resident RHS; returns (mb, L, 128)."""
    L = x3.shape[1]
    y3 = pl.pallas_call(
        functools.partial(_ell_kernel, A.gather_rows, L),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # rb, new, cblk
            grid=(A.ntiles,),
            in_specs=[
                pl.BlockSpec((1, SUBLANES, LANES),
                             lambda i, rb, nw, cb: (i, 0, 0)),
                pl.BlockSpec((1, SUBLANES, LANES),
                             lambda i, rb, nw, cb: (i, 0, 0)),
                pl.BlockSpec(x3.shape,
                             lambda i, rb, nw, cb: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, L, LANES), lambda i, rb, nw, cb: (rb[i], 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((mb, L, LANES), A.vals.dtype),
        interpret=_interpret(),
    )(A.row_block, A.new_block, A.chunk_cblk,
      A.vals, A.local_cols, x3)
    return y3


def _to_x3(A: DeviceEll, X):
    """(num_cols, L) -> (Nb, L, 128) with column padding to the gather
    slack."""
    L = X.shape[1]
    nb = -(-A.num_cols // LANES) + A.gather_rows
    Xp = jnp.zeros((nb * LANES, L), dtype=A.dtype)
    Xp = Xp.at[: A.num_cols].set(X.astype(A.dtype))
    return jnp.transpose(Xp.reshape(nb, LANES, L), (0, 2, 1))


def spmm_ell(A: DeviceEll, X, alpha=1.0, beta=0.0, Y=None):
    """Y = alpha * A @ X + beta * Y, X (num_cols, L)."""
    squeeze = False
    if X.ndim == 1:
        X = X[:, None]
        squeeze = True
    x3 = _to_x3(A, X)
    mb = -(-A.num_rows // LANES)
    y3 = _spmm_ell(A, x3, mb)
    Y_new = jnp.transpose(y3, (0, 2, 1)).reshape(-1, X.shape[1])
    Y_new = Y_new[: A.num_rows]
    if squeeze:
        Y_new = Y_new[:, 0]
    if beta == 0.0 or Y is None:
        return alpha * Y_new
    return alpha * Y_new + beta * Y


def spmv_ell(A: DeviceEll, x, alpha=1.0, beta=0.0, y=None):
    return spmm_ell(A, x, alpha=alpha, beta=beta, Y=y)


def ell_fits(num_cols: int, L: int, itemsize: int = 4) -> bool:
    return num_cols * L * itemsize <= X_VMEM_BUDGET_BYTES
