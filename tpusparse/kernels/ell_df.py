"""Double-float (two-f32) gather-job SpMM — the fast fp64 path.

Mosaic has no 64-bit vector types, but the BASELINE target demands
fp64 results within 1e-12 of the CPU reference. This kernel represents
every value as an unevaluated (hi, lo) f32 pair (Dekker/Knuth
double-float, ~2^-48 relative precision ~ 3.6e-16..e-15 per op) and
runs the gather-job SpMM recurrence with error-free transforms:

  * twoProd via Veltkamp splitting (no FMA assumption),
  * twoSum accumulation with renormalization.

~7x the flops of the fp32 kernel per job, still orders of magnitude
faster than the XLA fp64 gather path on this hardware. Layout and
scheduling are identical to kernels/ell_spmm.py (same EllTiles).
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
from tpusparse.kernels import ell_spmm
from tpusparse.formats.ell import EllTiles, LANES

_SPLIT = np.float32(4097.0)  # 2^12 + 1 Veltkamp constant for f32

# The double-float arithmetic inflates the unrolled kernel body ~30x;
# J=16 sends XLA-CPU (interpret-mode) compile time past 6 minutes while
# J=8 compiles in seconds and measures equally fast on the chip.
DF_JOBS_PER_TILE = 8


def build_df_tiles(csr):
    from tpusparse.formats.ell import build_ell_tiles

    return build_ell_tiles(csr, jobs_per_tile=DF_JOBS_PER_TILE)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def split_f64(a) -> tuple[np.ndarray, np.ndarray]:
    """Host: f64 array -> (hi, lo) f32 pair with a == hi + lo exactly
    representable to double-float precision."""
    a = np.asarray(a, dtype=np.float64)
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def _two_prod(a, b):
    """Error-free a*b = x + err in f32 (Veltkamp/Dekker)."""
    x = a * b
    ca = a * _SPLIT
    a1 = ca - (ca - a)
    a2 = a - a1
    cb = b * _SPLIT
    b1 = cb - (cb - b)
    b2 = b - b1
    err = ((a1 * b1 - x) + a1 * b2 + a2 * b1) + a2 * b2
    return x, err


def _df_mul(ah, al, bh, bl):
    """(ah+al) * (bh+bl) -> double-float."""
    p, e = _two_prod(ah, bh)
    e = e + (ah * bl + al * bh)
    hi = p + e
    lo = e - (hi - p)
    return hi, lo


def _df_add(ah, al, bh, bl):
    """(ah+al) + (bh+bl) -> double-float (Knuth twoSum + renorm)."""
    s = ah + bh
    v = s - ah
    e = (ah - (s - v)) + (bh - v)
    e = e + (al + bl)
    hi = s + e
    lo = e - (hi - s)
    return hi, lo


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceEllDF:
    """Device gather-job tiles in double-float."""

    num_rows: int
    num_cols: int
    nnz: int
    jobs_per_tile: int

    vals_hi: Any
    vals_lo: Any
    local_cols: Any
    row_block: Any
    new_block: Any
    job_cblk: Any

    def tree_flatten(self):
        return (
            (self.vals_hi, self.vals_lo, self.local_cols,
             self.row_block, self.new_block, self.job_cblk),
            (self.num_rows, self.num_cols, self.nnz, self.jobs_per_tile),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)

    @property
    def ntiles(self) -> int:
        return int(self.vals_hi.shape[0])


def to_device_ell_df(tiles: EllTiles) -> DeviceEllDF:
    hi, lo = split_f64(tiles.vals)
    return DeviceEllDF(
        num_rows=tiles.num_rows,
        num_cols=tiles.num_cols,
        nnz=tiles.nnz,
        jobs_per_tile=tiles.jobs_per_tile,
        vals_hi=jnp.asarray(hi),
        vals_lo=jnp.asarray(lo),
        local_cols=jnp.asarray(tiles.local_cols),
        row_block=jnp.asarray(tiles.row_block),
        new_block=jnp.asarray(tiles.new_block),
        job_cblk=jnp.asarray(tiles.job_cblk),
    )


@kernel_no_x64
def _ell_df_kernel(J: int, L: int,
                   rb_ref, new_ref, cblk_ref,
                   vh_ref, vl_ref, lc_ref, x_ref, y_ref):
    """x_ref: (Nb, 2L, 128) with hi lanes [0, L) and lo lanes [L, 2L);
    y_ref block (1, 2L, 128) likewise — single in/out buffers keep the
    structure Mosaic already compiles for the f32 kernel."""
    t = pl.program_id(0)

    @pl.when(new_ref[t] == 1)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    ah = jnp.zeros((L, LANES), jnp.float32)
    al = jnp.zeros((L, LANES), jnp.float32)
    for j in range(J):
        c = cblk_ref[0, 0, j]
        b = jnp.broadcast_to(lc_ref[0, j, :][None, :], (L, LANES))
        xq = x_ref[c]                              # (2L, 128)
        gh = tala32(xq[:L], b, axis=1)
        gl = tala32(xq[L:], b, axis=1)
        vh = jnp.broadcast_to(vh_ref[0, j, :][None, :], (L, LANES))
        vl = jnp.broadcast_to(vl_ref[0, j, :][None, :], (L, LANES))
        ph, plo = _df_mul(vh, vl, gh, gl)
        ah, al = _df_add(ah, al, ph, plo)
    nh, nl = _df_add(y_ref[0, :L], y_ref[0, L:], ah, al)
    y_ref[0] = jnp.concatenate([nh, nl], axis=0)


@functools.partial(jax.jit, static_argnames=("mb",))
@kernel_no_x64
def _spmm_ell_df(A: DeviceEllDF, x3, mb: int):
    """x3: (Nb, 2L, 128) hi/lo-stacked; returns (mb, 2L, 128)."""
    L = x3.shape[1] // 2
    spec_tile = pl.BlockSpec(
        (1, A.jobs_per_tile, LANES), lambda i, rb, nw: (i, 0, 0)
    )
    from tpusparse.kernels.merge_spmv import _vmem_params

    # cblk rides a per-step (1, 1, J) SMEM block, not a whole-array
    # scalar prefetch: at ntiles*J elements the prefetch overflows the
    # 1 MB SMEM on multi-million-row matrices (see ell_spmm._spmm_ell).
    with jax.enable_x64(False):
        y3 = pl.pallas_call(
            functools.partial(_ell_df_kernel, A.jobs_per_tile, L),
            compiler_params=_vmem_params(
                (x3.size + mb * 2 * L * LANES) * 4,
                3 * A.jobs_per_tile, 1),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(A.ntiles,),
                in_specs=[
                    pl.BlockSpec((1, 1, A.jobs_per_tile),
                                 lambda i, rb, nw: (i, 0, 0),
                                 memory_space=pltpu.SMEM),
                    spec_tile, spec_tile, spec_tile,
                    pl.BlockSpec(x3.shape,
                                 lambda i, rb, nw: (0, 0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, 2 * L, LANES),
                    lambda i, rb, nw: (rb[i], 0, 0)
                ),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (mb, 2 * L, LANES), jnp.float32
            ),
            interpret=_interpret(),
        )(A.row_block, A.new_block,
          A.job_cblk.reshape(A.ntiles, 1, A.jobs_per_tile),
          A.vals_hi, A.vals_lo, A.local_cols, x3)
    return y3


def _split_planes(A: DeviceEllDF, X):
    """(num_cols, L) f64 -> (hi, lo) f32 planes, padded to the x-block
    row layout. Exact only under x64 (checked by the caller): without
    it the f64 intermediates silently truncate to f32 and the lo plane
    collapses to zero."""
    L = X.shape[1]
    nb = -(-A.num_cols // LANES) + 1
    Xp = jnp.zeros((nb * LANES, L), dtype=jnp.float64)
    Xp = Xp.at[: A.num_cols].set(X.astype(jnp.float64))
    hi = Xp.astype(jnp.float32)
    lo = (Xp - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def spmm_ell_df(A: DeviceEllDF, X, alpha=1.0, beta=0.0, Y=None):
    """Y = alpha * A @ X + beta * Y in double-float; returns float64.

    Requires x64 (raises otherwise — the hi/lo split and the final
    hi+lo reconstruction are f64 ops). RHS blocks beyond the VMEM
    budget are lane-chunked exactly like the fp32 kernel (spmm_ell),
    with the hi+lo doubling accounted in the budget."""
    import jax

    if not jax.config.jax_enable_x64:
        raise TypeError(
            "spmm_ell_df requires jax_enable_x64=True: without it the "
            "double-float hi/lo split silently truncates to f32 and the "
            "advertised ~1e-14 accuracy degrades to ~1e-6. Enable x64 "
            "or use the fp32 kernels."
        )
    squeeze = False
    if X.ndim == 1:
        X = X[:, None]
        squeeze = True
    L = X.shape[1]
    # Mosaic's lane gather needs a full (>=8, 128) register tile; round
    # the RHS width UP to a multiple of 8 (max(L, 8) alone would hand
    # the kernel e.g. a (12, 128) gather tile that fails to compile on
    # real TPU while passing in CPU interpret mode).
    Lp = max(-(-L // 8) * 8, 8)
    if Lp != L:
        X = jnp.concatenate(
            [X, jnp.zeros((X.shape[0], Lp - L), X.dtype)], axis=1
        )
    # hi/lo stacking doubles the minimum slab vs the f32 kernel (see
    # ell_spmm.spmm_ell for the constraint)
    if A.num_cols * 4 * 2 * 8 > 100 * 1024 * 1024:
        raise ValueError(
            f"df-ELL SpMM needs an 8-lane hi+lo RHS slab resident in "
            f"VMEM; {A.num_cols} cols -> "
            f"{A.num_cols * 4 * 2 * 8 / 2**20:.0f} MB exceeds the "
            f"~100 MB scoped-vmem ceiling. Use strategy='merge' (the "
            f"df merge SpMM) or 'dia' at this size."
        )
    hi, lo = _split_planes(A, X)
    nb = -(-A.num_cols // LANES) + 1
    # lane-chunk to the VMEM budget; hi+lo stacking doubles the
    # per-lane footprint vs the f32 kernel
    max_lanes = max(
        (ell_spmm.X_VMEM_BUDGET_BYTES // (A.num_cols * 2 * 4)) // 8 * 8,
        8,
    )
    mb = -(-A.num_rows // LANES)
    to3 = lambda v: jnp.transpose(
        v.reshape(nb, LANES, v.shape[1]), (0, 2, 1)
    )
    outs = []
    for s in range(0, Lp, max_lanes):
        hc, lc = hi[:, s : s + max_lanes], lo[:, s : s + max_lanes]
        Lc = hc.shape[1]
        x3 = jnp.concatenate([to3(hc), to3(lc)], axis=1)
        y3 = _spmm_ell_df(A, x3, mb)
        yh, yl = y3[:, :Lc], y3[:, Lc:]
        unt = lambda v: jnp.transpose(v, (0, 2, 1)).reshape(-1, v.shape[1])
        outs.append(
            unt(yh).astype(jnp.float64) + unt(yl).astype(jnp.float64)
        )
    Y_new = (jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0])
    Y_new = Y_new[: A.num_rows, :L]
    if squeeze:
        Y_new = Y_new[:, 0]
    if beta == 0.0 or Y is None:
        return alpha * Y_new
    return alpha * Y_new + beta * Y


def spmv_ell_df(A: DeviceEllDF, x, alpha=1.0, beta=0.0, y=None):
    return spmm_ell_df(A, x, alpha=alpha, beta=beta, Y=y)
