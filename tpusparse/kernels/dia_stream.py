"""Streaming DIA SpMV kernel — the large-matrix diagonal path.

The XLA DIA op (ops/dia.py) is the right tool while the value planes
fit VMEM (~300-500 GF with plane residency across a solver loop), but
beyond ~100 MB of planes XLA's elementwise fusion materializes the
shifted slices in HBM and throughput collapses (measured 36 GF at 7M
rows). This kernel tiles the row space into B-sized blocks and stages
each block's x-halo in VMEM exactly once per step:

  * x ships pre-padded into (nb + 2, R, 128) blocks (B = 128 R rows
    per block); the SAME array is passed three times with index maps
    (i, i+1, i+2), so the kernel sees the previous/current/next blocks
    — an overlapping halo window expressed through non-overlapping
    BlockSpecs.
  * per grid step: stack the three x blocks into a (3R, 128) buffer,
    then for each static diagonal offset ``off = 128 q + r`` take the
    sublane-shifted slice at q and lane-rotate by r (two static
    slices + one lane concat — no gathers) and FMA into the (R, 128)
    accumulator. Everything runs on full (R, 128) registers at native
    VPU width.
  * traffic per step = K data planes + 3 x blocks + 1 y block — the
    stream-bound operating point at any matrix size.

Requires max |offset| <= B (the planner falls back to the XLA op for
pathologically wide bands). fp32 only (Mosaic has no 64-bit types);
fp64 stays on the XLA op.

Reference capability: the grid2d/grid3d stencil fixtures at scale
(``/root/reference/sparse_matrix.h:458-623``) under the SpMV drivers
(``cpu_spmv.cpp:750-923``).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from tpusparse.kernels._util import kernel_no_x64

LANES = 128
BLOCK_ROWS = 131072  # 128k rows/block: ~6 MB/step at K=7, 2x buffered


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _shifted(buf, off: int, R: int, interpret: bool):
    """(R, 128) view of ``buf[(R + s) * 128 + l + off]`` for the
    (3R, 128) halo buffer. The offset decomposes as a sublane shift
    ``q = off // 128`` plus a lane rotation ``r``; lanes whose rotated
    source wraps past lane 127 come from the NEXT sublane row, so the
    rotate is applied to a per-lane select between the two row slices
    (Mosaic cannot concat lane-misaligned slices, but it rotates and
    selects full registers natively)."""
    q, r = divmod(off, LANES)
    c0 = jax.lax.slice(buf, (R + q, 0), (2 * R + q, LANES))
    if r == 0:
        return c0
    c1 = jax.lax.slice(buf, (R + q + 1, 0), (2 * R + q + 1, LANES))
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    pre = jnp.where(lane < r, c1, c0)
    if interpret:
        return jnp.roll(pre, LANES - r, axis=1)
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.roll(pre, LANES - r, axis=1)


def _dia_stream_kernel(offsets, R, interpret, x0_ref, x1_ref, x2_ref,
                       d_ref, y_ref):
    buf = jnp.concatenate(
        [x0_ref[0], x1_ref[0], x2_ref[0]], axis=0
    )  # (3R, 128)
    acc = jnp.zeros((R, LANES), jnp.float32)
    for k, off in enumerate(offsets):
        acc = acc + d_ref[0, k] * _shifted(buf, off, R, interpret)
    y_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "R"))
@kernel_no_x64
def _spmv_dia_stream(data_b, xpad_b, offsets, R):
    """data_b: (nb, K, R, 128); xpad_b: (nb+2, R, 128) -> (nb, R, 128)."""
    nb, K, _, _ = data_b.shape
    kernel = functools.partial(_dia_stream_kernel, offsets, R,
                               _interpret())
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, R, LANES), lambda i: (i + 1, 0, 0)),
            pl.BlockSpec((1, R, LANES), lambda i: (i + 2, 0, 0)),
            pl.BlockSpec((1, K, R, LANES), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, R, LANES), jnp.float32),
        interpret=_interpret(),
    )(xpad_b, xpad_b, xpad_b, data_b)


def fits_stream(offsets, block_rows: int = BLOCK_ROWS) -> bool:
    offs = [int(o) for o in offsets]
    return bool(offs) and max(abs(o) for o in offs) <= block_rows


def prepare_stream(dia_host, block_rows: int = BLOCK_ROWS):
    """Host-side blocking of a DiaHost plan: (data_b, num_rows, B)."""
    n = dia_host.num_rows
    K = dia_host.offsets.shape[0]
    B = int(block_rows)
    assert B % LANES == 0
    nb = -(-n // B)
    flat = np.zeros((K, nb * B), dtype=np.float32)
    flat[:, :n] = dia_host.data.astype(np.float32)
    data_b = np.ascontiguousarray(
        flat.reshape(K, nb, B // LANES, LANES).transpose(1, 0, 2, 3)
    )
    return data_b, n, B


@jax.tree_util.register_pytree_node_class
class DiaStreamDevice:
    """Device operand for the streaming DIA kernel."""

    def __init__(self, num_rows, num_cols, offsets, block_rows,
                 data_b):
        self.num_rows = num_rows
        self.num_cols = num_cols
        self.offsets = offsets          # static tuple
        self.block_rows = block_rows
        self.data_b = data_b            # (nb, K, R, 128) f32

    def tree_flatten(self):
        return (self.data_b,), (self.num_rows, self.num_cols,
                                self.offsets, self.block_rows)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)


def to_device_dia_stream(dia_host,
                         block_rows: int = BLOCK_ROWS
                         ) -> DiaStreamDevice:
    data_b, n, B = prepare_stream(dia_host, block_rows)
    return DiaStreamDevice(
        n, dia_host.num_cols,
        tuple(int(o) for o in dia_host.offsets), B,
        jnp.asarray(data_b),
    )


def spmv_dia_stream(D: DiaStreamDevice, x, alpha=1.0, beta=0.0,
                    y=None):
    """y = alpha * A @ x + beta * y via the streaming kernel."""
    B = D.block_rows
    nb = D.data_b.shape[0]
    xf = x.astype(jnp.float32)
    xpad_b = jnp.zeros(((nb + 2) * B,), jnp.float32)
    xpad_b = jax.lax.dynamic_update_slice(xpad_b, xf, (B,))
    xpad_b = xpad_b.reshape(nb + 2, B // LANES, LANES)
    yb = _spmv_dia_stream(D.data_b, xpad_b, D.offsets, B // LANES)
    y_new = yb.reshape(-1)[: D.num_rows]
    if beta == 0.0 or y is None:
        return alpha * y_new if alpha != 1.0 else y_new
    return alpha * y_new + beta * y


def spmm_dia_stream(D: DiaStreamDevice, X, alpha=1.0, beta=0.0,
                    Y=None):
    """Column-at-a-time fallback: the stream plan is chosen only for
    L == 1 workloads (plan_matrix gates on L); this keeps spmm() total
    on the operand type at full single-vector speed per column."""
    cols = [spmv_dia_stream(D, X[:, j]) for j in range(X.shape[1])]
    Y_new = jnp.stack(cols, axis=1)
    if beta == 0.0 or Y is None:
        return alpha * Y_new if alpha != 1.0 else Y_new
    return alpha * Y_new + beta * Y
