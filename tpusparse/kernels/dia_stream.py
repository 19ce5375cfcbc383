"""Streaming DIA kernels — the large-matrix diagonal path.

The XLA DIA op (ops/dia.py) is the right tool while the value planes
fit VMEM (~300-500 GF with plane residency across a solver loop), but
at L=1 beyond ~100 MB of planes XLA's elementwise fusion materializes
the shifted slices in HBM and throughput collapses (measured 36 GF at
7M rows; multi-RHS does NOT collapse — it is x-stream-bound — so AUTO
gates by L, see ops.spmv.DIA_STREAM_MAX_L). These kernels tile the
row space into B-sized blocks (B = 128 R rows) and stage each block's
x context in VMEM exactly once per step — the EDGE-HALO formulation
(session 9; it replaced a 3-full-block halo, measured 391 vs 336 GF
single-RHS and 194 vs 177 GF at L=32):

  * operands are RHS-major blocked: x as (L, nb, R, 128) consumed IN
    PLACE, plus two E-sublane edge slabs (E = ceil(max|off|/128))
    carrying just the neighbour rows any offset can reach — x traffic
    per matvec is (1 + 2E/R) reads, not 3.
  * grid (nb, L) with the RHS index minor: the K plane blocks' index
    maps depend only on the row block, so Pallas skips their DMAs
    across the L steps that share them.
  * per grid step: concat [lo_edge, x, hi_edge] into an (R + 2E, 128)
    buffer, then for each static diagonal offset ``off = 128 q + r``
    take the sublane-shifted slice at q and lane-rotate by r (two
    static slices + select + one pltpu.roll — no gathers) and FMA
    into the (R, 128) accumulator.
  * solvers keep their whole transposed state PERMANENTLY padded at
    (L, nb*B) (`spmm_dia_stream_tp` + `padded_cols`): the value
    planes are zero past num_rows, so pad outputs stay exactly 0 and
    no per-iteration pad copies exist at all.

Requires max |offset| <= B (the planner falls back to the XLA op for
pathologically wide bands). Mosaic has no 64-bit types, so fp64 at
scale runs the double-float variant (`_spmm_dia_stream_df_edge`):
hi/lo f32 plane pairs, Dekker products + Knuth two-sums sequentially
over the K offsets — ~1e-14 relative accuracy; 77.6 GF at L=32 /
4.9M rows where the fused XLA native-f64 path reads 43 GF (and 13 GF
at L=1). Below the collapse thresholds the XLA op keeps both dtypes
(and strict IEEE f64).

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

# Kernel-body choice for the fp32 edge-halo stream kernel: False =
# VPU select+roll lane rotation, True = MXU selection-matmul rotation
# (see _rotation_mats). Default set by on-chip A/B (session 9).
DIA_STREAM_MXU_ROTATE = False

# Double-buffered per-step VMEM the block chooser budgets for (the
# raise-able scoped-vmem window is ~80 MB in practice — the 1M-row
# block OOM'd at 88.15 vs limit 80.56; leave headroom for Mosaic's
# stack overhead).
_BLOCK_VMEM_BUDGET = 48 * 1024 * 1024


def _auto_block_rows(dia_host, df: bool, L: int = 1,
                     masked: bool = False) -> int:
    """Default block for a plan: L-aware (lap3d-192 sweep, session 9
    — single-RHS is pipeline-bound and prefers the 128k block (397 vs
    296 GF at 512k), multi-RHS is orchestration-bound and prefers the
    biggest VMEM-budgeted block (231 vs 194 GF at L=32)), capped at
    the matrix size (rounded to an (8,128)-tile multiple) so small
    matrices don't zero-pad to a full block — unless the cap would
    break the max|off| <= block invariant."""
    if L <= 1:
        blk = BLOCK_ROWS
    else:
        blk = choose_block_rows(len(dia_host.offsets), df=df,
                                masked=masked)
    cap = max(1024, -(-int(dia_host.num_rows) // 1024) * 1024)
    if cap < blk and fits_stream(dia_host.offsets, cap):
        return cap
    return blk


def choose_block_rows(num_planes: int, df: bool = False,
                      masked: bool = False) -> int:
    """Largest kernel block (rows) whose per-step working set fits the
    scoped-vmem budget. Fewer, bigger blocks win — the per-step cost
    is DMA orchestration, not arithmetic (L=32 sweep on lap3d-192:
    128k rows 194 GF, 256k 221, 512k 231, 1M VMEM-OOM; the MXU-rotate
    wash isolated the orchestration bound). The step holds K value
    planes (x2 for the df kernel's hi/lo pairs; ONE int32 mask block
    replaces them all in masked form) plus x/edge/y blocks, all
    (R, 128) f32, double-buffered."""
    if masked:
        per_R = (4 + 1 + 4) if df else (2 + 1 + 2)
    elif df:
        per_R = 4 + 2 * num_planes + 4
    else:
        per_R = 2 + num_planes + 2
    for R in (4096, 2048, 1024):
        if 2 * per_R * R * LANES * 4 <= _BLOCK_VMEM_BUDGET:
            return R * LANES
    return 1024 * LANES


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _shifted(buf, off: int, R: int, interpret: bool, base: int | None = None):
    """(R, 128) view of ``buf[(base + s) * 128 + l + off]`` for a halo
    buffer whose centre block starts at sublane row ``base`` (= R for
    the 3-full-block halo, = E for the edge-slab halo). The offset
    decomposes as a sublane shift ``q = off // 128`` plus a lane
    rotation ``r``; lanes whose rotated source wraps past lane 127
    come from the NEXT sublane row, so the rotate is applied to a
    per-lane select between the two row slices (Mosaic cannot concat
    lane-misaligned slices, but it rotates and selects full registers
    natively)."""
    if base is None:
        base = R
    q, r = divmod(off, LANES)
    c0 = jax.lax.slice(buf, (base + q, 0), (base + R + q, LANES))
    if r == 0:
        return c0
    c1 = jax.lax.slice(buf, (base + q + 1, 0),
                       (base + R + q + 1, LANES))
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    pre = jnp.where(lane < r, c1, c0)
    if interpret:
        return jnp.roll(pre, LANES - r, axis=1)
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.roll(pre, LANES - r, axis=1)


@jax.tree_util.register_pytree_node_class
class DiaStreamDFDevice:
    """Double-float streaming DIA operand (hi/lo f32 plane pairs).

    ~1e-14 relative accuracy and f32 exponent range — NOT strict IEEE
    fp64 (the same semantics as the df-ELL plan; plan_matrix documents
    the trade). Chosen for fp64 matrices whose f64 planes outgrow the
    XLA DIA op's fusion capacity (collapse measured 110 -> 13 GF
    between 229 MB and 396 MB of planes on lap3d).

    Masked (compressed) form: when every diagonal is a constant
    coefficient (``formats.dia.plane_constants``), ``data_hi/lo`` are
    None and the operand is ``mask_b`` — ONE int32 bitmask word per
    row (bit k = plane k populated) — plus static per-plane hi/lo
    scalar pairs ``vals_hi/vals_lo``. Plane traffic drops from 8K to
    4 bytes/row; ``mask ? split(c) : 0`` reproduces the stored hi/lo
    plane values exactly (outputs agree to ~1e-16 — separate
    compilation can perturb FMA contraction in the df sequences)."""

    def __init__(self, num_rows, num_cols, offsets, block_rows,
                 data_hi, data_lo, mask_b=None, vals_hi=None,
                 vals_lo=None):
        self.num_rows = num_rows
        self.num_cols = num_cols
        self.offsets = offsets
        self.block_rows = block_rows
        self.data_hi = data_hi
        self.data_lo = data_lo
        self.mask_b = mask_b
        self.vals_hi = vals_hi      # static tuple of f32 floats
        self.vals_lo = vals_lo

    def tree_flatten(self):
        return (self.data_hi, self.data_lo, self.mask_b), (
            self.num_rows, self.num_cols, self.offsets,
            self.block_rows, self.vals_hi, self.vals_lo,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], aux[2], aux[3],
                   children[0], children[1], children[2],
                   aux[4], aux[5])


def to_device_dia_stream_df(dia_host,
                            block_rows: int | None = None,
                            L: int = 1,
                            masked: bool | None = None
                            ) -> DiaStreamDFDevice:
    from tpusparse.kernels.ell_df import split_f64

    if not jax.config.jax_enable_x64:
        raise TypeError(
            "the double-float DIA stream plan requires "
            "jax_enable_x64=True (x splits and the hi+lo recombine "
            "run in f64 outside the kernel)"
        )
    vals64, ok = (None, False) if masked is False \
        else _maskable(dia_host)
    if masked is True and not ok:
        raise ValueError(
            "masked df stream plan requires every diagonal to be a "
            "constant coefficient (formats.dia.plane_constants)")
    # df auto-masks only at L <= 1: the single-RHS matvec is
    # plane-read-bound (65 vs 50 GF at 275 MB planes) but multi-RHS
    # is RHS-stream-bound and the per-offset hi/lo selects cost x L
    # (masked 96.3 vs 98.5 GF at L=32, reproducible) — callers who
    # want the 14x plan-memory saving anyway pass masked=True
    use_mask = (ok and L <= 1) if masked is None else masked
    if block_rows is None:
        block_rows = _auto_block_rows(dia_host, df=True, L=L,
                                      masked=use_mask)
    from tpusparse.utils.transfer import device_put_chunked

    offsets = tuple(int(o) for o in dia_host.offsets)
    if use_mask:
        mask_b, n, B = prepare_stream_mask(dia_host, block_rows)
        vh, vl = split_f64(vals64)
        return DiaStreamDFDevice(
            n, dia_host.num_cols, offsets, B, None, None,
            device_put_chunked(mask_b),
            tuple(float(v) for v in vh), tuple(float(v) for v in vl),
        )
    hi, lo = split_f64(dia_host.data)
    n = dia_host.num_rows
    B = int(block_rows)
    nb = -(-n // B)

    def block(flat):
        out = np.zeros((flat.shape[0], nb * B), dtype=np.float32)
        out[:, :n] = flat
        return np.ascontiguousarray(
            out.reshape(-1, nb, B // LANES, LANES).transpose(1, 0, 2, 3)
        )

    return DiaStreamDFDevice(
        n, dia_host.num_cols, offsets, B,
        device_put_chunked(block(hi)), device_put_chunked(block(lo)),
    )


def spmv_dia_stream_df(D: DiaStreamDFDevice, x, alpha=1.0, beta=0.0,
                       y=None):
    """y = alpha * A @ x + beta * y, fp64 in/out via the edge-halo
    double-float stream kernel at L=1 (see spmv_dia_stream)."""
    y_new = spmm_dia_stream_df_t(D, x.astype(jnp.float64)[None, :])[0]
    if beta == 0.0 or y is None:
        return alpha * y_new if alpha != 1.0 else y_new
    return alpha * y_new + beta * y


def spmm_dia_stream_df_t(D: DiaStreamDFDevice, XT):
    """Transposed-layout df SpMM: XT (L, num_cols) fp64 ->
    (L, num_rows) fp64 via the edge-halo double-float stream kernel
    (~1e-14 relative accuracy, f32 exponent range — the plan's
    documented semantics). Splits to f32 hi/lo BEFORE the tail pad and
    recombines to f64 AFTER the tail slice — padding/slicing in f64
    measured 14.5 ms/matvec of pure emulated-f64 copy traffic at
    4.9M rows x L=32 (38.7 vs 24.1 ms, scripts/r3_s9_stream_f64.py)."""
    n = XT.shape[1]
    np_ = padded_cols_df(D)
    XT = XT.astype(jnp.float64)
    xh = XT.astype(jnp.float32)
    xl = (XT - xh.astype(jnp.float64)).astype(jnp.float32)
    if np_ > n:
        pad = ((0, 0), (0, np_ - n))
        xh, xl = jnp.pad(xh, pad), jnp.pad(xl, pad)
    yh, yl = _df_edge_core(D, xh, xl)
    return (yh[:, :n].astype(jnp.float64)
            + yl[:, :n].astype(jnp.float64))


def spmm_dia_stream_df(D: DiaStreamDFDevice, X, alpha=1.0, beta=0.0,
                       Y=None):
    """Y = alpha * A @ X + beta * Y, fp64 in/out via the multi-RHS
    double-float stream kernel."""
    Y_new = spmm_dia_stream_df_t(D, jnp.asarray(X).T).T
    if beta == 0.0 or Y is None:
        return alpha * Y_new if alpha != 1.0 else Y_new
    return alpha * Y_new + beta * Y


def _dia_stream_kernel_df_edge(offsets, R, E, interpret, loh, xh, hih,
                               lol, xl, hil, dh_ref, dl_ref,
                               yh_ref, yl_ref):
    from tpusparse.kernels.ell_df import _df_add, _df_mul

    bufh = jnp.concatenate([loh[0, 0], xh[0, 0], hih[0, 0]], axis=0)
    bufl = jnp.concatenate([lol[0, 0], xl[0, 0], hil[0, 0]], axis=0)
    acc_h = jnp.zeros((R, LANES), jnp.float32)
    acc_l = jnp.zeros((R, LANES), jnp.float32)
    for k, off in enumerate(offsets):
        wh = _shifted(bufh, off, R, interpret, base=E)
        wl = _shifted(bufl, off, R, interpret, base=E)
        ph, pl = _df_mul(dh_ref[0, k], dl_ref[0, k], wh, wl)
        acc_h, acc_l = _df_add(acc_h, acc_l, ph, pl)
    yh_ref[0, 0] = acc_h
    yl_ref[0, 0] = acc_l


@functools.partial(jax.jit, static_argnames=("offsets", "R", "E"))
@kernel_no_x64
def _spmm_dia_stream_df_edge(dh_b, dl_b, xh_b, xl_b, loh, hih, lol,
                             hil, offsets, R, E):
    """Edge-halo df multi-RHS stream (see _spmm_dia_stream_edge): hi/lo
    x blocks consumed in place, neighbour context as E-sublane edge
    slabs per plane."""
    L, nb, _, _ = xh_b.shape
    K = dh_b.shape[1]
    kernel = functools.partial(_dia_stream_kernel_df_edge, offsets, R,
                               E, _interpret())
    xspec = pl.BlockSpec((1, 1, R, LANES), lambda i, l: (l, i, 0, 0))
    espec = pl.BlockSpec((1, 1, E, LANES), lambda i, l: (l, i, 0, 0))
    if _interpret():
        params = {}
    else:
        from jax.experimental.pallas import tpu as pltpu

        # blocks (x/y hi+lo, 2K planes, 4 edge slabs) double-buffered
        # + the kernel-stack concat buffers (2x (R+2E) hi/lo)
        step = (4 + 2 * K + 4 * E / R) * R * LANES * 4
        stack = 2 * (R + 2 * E) * LANES * 4
        params = {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=min(int(2 * step + stack) + (8 << 20),
                                 100 << 20)
        )}
    return pl.pallas_call(
        kernel,
        grid=(nb, L),
        in_specs=[
            espec, xspec, espec,
            espec, xspec, espec,
            pl.BlockSpec((1, K, R, LANES), lambda i, l: (i, 0, 0, 0)),
            pl.BlockSpec((1, K, R, LANES), lambda i, l: (i, 0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, R, LANES), lambda i, l: (l, i, 0, 0)),
            pl.BlockSpec((1, 1, R, LANES), lambda i, l: (l, i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, nb, R, LANES), jnp.float32),
            jax.ShapeDtypeStruct((L, nb, R, LANES), jnp.float32),
        ),
        interpret=_interpret(),
        **params,
    )(loh, xh_b, hih, lol, xl_b, hil, dh_b, dl_b)


def padded_cols_df(D: DiaStreamDFDevice) -> int:
    """Padded state width for the df edge path (see padded_cols)."""
    payload = D.data_hi if D.data_hi is not None else D.mask_b
    return payload.shape[0] * D.block_rows


def _dia_stream_kernel_df_edge_mask(offsets, vals_hi, vals_lo, R, E,
                                    interpret, loh, xh, hih, lol, xl,
                                    hil, m_ref, yh_ref, yl_ref):
    """Masked df edge body: hi/lo plane blocks become
    ``mask bit k ? split(c_k) : (0, 0)`` selects against static
    scalars — element-for-element the values the unmasked kernel
    loads (agreement to ~1e-16: separate compilation can perturb the
    Dekker/Knuth FMA contraction) while 8K B/row of plane traffic
    becomes one int32 word."""
    from tpusparse.kernels.ell_df import _df_add, _df_mul

    bufh = jnp.concatenate([loh[0, 0], xh[0, 0], hih[0, 0]], axis=0)
    bufl = jnp.concatenate([lol[0, 0], xl[0, 0], hil[0, 0]], axis=0)
    m = m_ref[0]
    acc_h = jnp.zeros((R, LANES), jnp.float32)
    acc_l = jnp.zeros((R, LANES), jnp.float32)
    for k, off in enumerate(offsets):
        wh = _shifted(bufh, off, R, interpret, base=E)
        wl = _shifted(bufl, off, R, interpret, base=E)
        # (m >> k) & 1, NOT m & (1 << k): the literal 1 << 31
        # overflows int32 under the kernels' mandatory no-x64 tracing
        # while MASK_MAX_PLANES admits 32 planes (round-5 review)
        bit = ((m >> k) & 1) != 0
        dh = jnp.where(bit, jnp.float32(vals_hi[k]), jnp.float32(0.0))
        dl = jnp.where(bit, jnp.float32(vals_lo[k]), jnp.float32(0.0))
        ph, pl = _df_mul(dh, dl, wh, wl)
        acc_h, acc_l = _df_add(acc_h, acc_l, ph, pl)
    yh_ref[0, 0] = acc_h
    yl_ref[0, 0] = acc_l


@functools.partial(jax.jit, static_argnames=("offsets", "vals_hi",
                                             "vals_lo", "R", "E"))
@kernel_no_x64
def _spmm_dia_stream_df_edge_mask(mask_b, xh_b, xl_b, loh, hih, lol,
                                  hil, offsets, vals_hi, vals_lo,
                                  R, E):
    """Masked variant of _spmm_dia_stream_df_edge: one int32 bitmask
    block replaces BOTH hi and lo plane sets (lap3d K=7 df: 56 -> 4
    B/row of operand traffic)."""
    L, nb, _, _ = xh_b.shape
    kernel = functools.partial(_dia_stream_kernel_df_edge_mask,
                               offsets, vals_hi, vals_lo, R, E,
                               _interpret())
    xspec = pl.BlockSpec((1, 1, R, LANES), lambda i, l: (l, i, 0, 0))
    espec = pl.BlockSpec((1, 1, E, LANES), lambda i, l: (l, i, 0, 0))
    if _interpret():
        params = {}
    else:
        from jax.experimental.pallas import tpu as pltpu

        # blocks (x/y hi+lo, mask, 4 edge slabs) double-buffered + the
        # kernel STACK: hi/lo concat buffers (2x (R+2E)), hi/lo
        # accumulators (2R) and live shifted/product temporaries
        # (~2R). The value-plane kernels hide these under their 2K
        # plane-block slack; here the planes are gone and omitting
        # the stack term OOM'd the 512k masked block at lap3d-170
        # L=32 (38.89M need vs 28.88M limit).
        step = (4 + 1 + 4 * E / R) * R * LANES * 4
        stack = (2 * (R + 2 * E) + 4 * R) * LANES * 4
        params = {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=min(int(2 * step + stack) + (8 << 20),
                                 100 << 20)
        )}
    return pl.pallas_call(
        kernel,
        grid=(nb, L),
        in_specs=[
            espec, xspec, espec,
            espec, xspec, espec,
            pl.BlockSpec((1, R, LANES), lambda i, l: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, R, LANES), lambda i, l: (l, i, 0, 0)),
            pl.BlockSpec((1, 1, R, LANES), lambda i, l: (l, i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, nb, R, LANES), jnp.float32),
            jax.ShapeDtypeStruct((L, nb, R, LANES), jnp.float32),
        ),
        interpret=_interpret(),
        **params,
    )(loh, xh_b, hih, lol, xl_b, hil, mask_b)


def _df_edge_core(D: DiaStreamDFDevice, xh, xl):
    """Edge-halo df kernel on pre-split f32 hi/lo planes of shape
    (L, nb*B); returns the (L, nb*B) f32 hi/lo output pair."""
    B = D.block_rows
    nb = padded_cols_df(D) // B
    L = xh.shape[0]
    R = B // LANES
    E = _edge_sublanes(D.offsets)
    xh = xh.reshape(L, nb, R, LANES)
    xl = xl.reshape(L, nb, R, LANES)
    zero = jnp.zeros((L, 1, E, LANES), jnp.float32)

    def edges(xb):
        lo = jnp.concatenate([zero, xb[:, :-1, R - E:, :]], axis=1)
        hi = jnp.concatenate([xb[:, 1:, :E, :], zero], axis=1)
        return lo, hi

    loh, hih = edges(xh)
    lol, hil = edges(xl)
    if D.data_hi is None:
        yh, yl = _spmm_dia_stream_df_edge_mask(
            D.mask_b, xh, xl, loh, hih, lol, hil, D.offsets,
            D.vals_hi, D.vals_lo, R, E)
    else:
        yh, yl = _spmm_dia_stream_df_edge(D.data_hi, D.data_lo, xh,
                                          xl, loh, hih, lol, hil,
                                          D.offsets, R, E)
    return yh.reshape(L, nb * B), yl.reshape(L, nb * B)


def spmm_dia_stream_df_tp(D: DiaStreamDFDevice, XTP):
    """Padded transposed df SpMM: XTP (L, nb*B) fp64 with zero tail ->
    (L, nb*B) fp64 with zero tail, via the edge-halo df kernel. The
    hi/lo split is per call (the solver state stays one f64 array);
    pad outputs stay exactly 0 (zero-padded planes). Measured 24.1
    ms/matvec (90.7 GF) at 4.9M rows x L=32 — 1.9x the XLA native-f64
    op and 1.17x the former 3-block df kernel."""
    XTP = XTP.astype(jnp.float64)
    xh = XTP.astype(jnp.float32)
    xl = (XTP - xh.astype(jnp.float64)).astype(jnp.float32)
    yh, yl = _df_edge_core(D, xh, xl)
    return yh.astype(jnp.float64) + yl.astype(jnp.float64)


def fits_stream(offsets, block_rows: int = BLOCK_ROWS) -> bool:
    offs = [int(o) for o in offsets]
    return bool(offs) and max(abs(o) for o in offs) <= block_rows


def prepare_stream(dia_host, block_rows: int = BLOCK_ROWS,
                   plane_dtype=np.float32):
    """Host-side blocking of a DiaHost plan: (data_b, num_rows, B).
    ``plane_dtype`` is the STORED plane precision (f32, or bf16 for
    the halved-traffic refinement operator — see plan_dia_bf16)."""
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
    if np.dtype(plane_dtype) != np.float32:
        # bf16 rounding stays on HOST: numpy handles ml_dtypes'
        # bfloat16 directly (round-to-nearest-even, identical to the
        # device cast) — an eager jnp round-trip here would device_put
        # the full f32 plane array UNCHUNKED through the tunnel, the
        # documented >=160 MB wedge hazard (round-5 review)
        data_b = data_b.astype(np.dtype(plane_dtype))
    return data_b, n, B


@jax.tree_util.register_pytree_node_class
class DiaStreamDevice:
    """Device operand for the streaming DIA kernel.

    Masked (compressed) form: when every diagonal is a constant
    coefficient (``formats.dia.plane_constants``), ``data_b`` is None
    and the operand is ``mask_b`` — ONE int32 bitmask word per row
    (bit k = plane k populated) — plus the static per-plane f32
    scalars ``vals``. Plane traffic drops from 4K to 4 bytes/row
    (lap3d K=7: 28 -> 4) on a kernel that is DMA-bound, and results
    stay BIT-identical to the unmasked kernel: the per-element
    coefficient ``mask ? c : 0`` IS the stored plane value."""

    def __init__(self, num_rows, num_cols, offsets, block_rows,
                 data_b, mask_b=None, vals=None):
        self.num_rows = num_rows
        self.num_cols = num_cols
        self.offsets = offsets          # static tuple
        self.block_rows = block_rows
        self.data_b = data_b            # (nb, K, R, 128) f32, or None
        self.mask_b = mask_b            # (nb, R, 128) int32, or None
        self.vals = vals                # static tuple of f32 floats

    def tree_flatten(self):
        return (self.data_b, self.mask_b), (
            self.num_rows, self.num_cols, self.offsets,
            self.block_rows, self.vals,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], aux[2], aux[3],
                   children[0], children[1], aux[4])


# Masked-DIA packs one validity bit per plane into an int32 word per
# row; planner falls back to value planes past 32 diagonals.
MASK_MAX_PLANES = 32


def mask_words(dia_host) -> np.ndarray:
    """(n,) uint32 validity words for a host DIA plan: bit k = plane
    k populated at that row. THE one bit-layout definition — the
    single-chip bitmask kernels, the XLA masked matvec
    (ops.dia.xla_matvec_of) and the sharded masked form
    (parallel.sharded_dia.shard_dia) all read these words with
    ``(m >> k) & 1``."""
    K = dia_host.offsets.shape[0]
    assert K <= MASK_MAX_PLANES
    w = np.zeros(dia_host.num_rows, dtype=np.uint32)
    for k in range(K):
        w |= (dia_host.data[k] != 0).astype(np.uint32) << np.uint32(k)
    return w


def prepare_stream_mask(dia_host, block_rows: int):
    """Host-side bitmask blocking: (mask_b int32 (nb, R, 128), n, B).
    Bit k of word i = plane k populated at row i; pad tail rows are 0
    so pad outputs stay exactly 0 (same contract as zero-padded value
    planes)."""
    n = dia_host.num_rows
    B = int(block_rows)
    assert B % LANES == 0
    nb = -(-n // B)
    w = mask_words(dia_host)
    flat = np.zeros(nb * B, dtype=np.uint32)
    flat[:n] = w
    mask_b = np.ascontiguousarray(
        flat.view(np.int32).reshape(nb, B // LANES, LANES)
    )
    return mask_b, n, B


def _maskable(dia_host) -> tuple:
    """(vals_f64, ok): masked-compression eligibility of a host plan."""
    from tpusparse.formats.dia import plane_constants

    if len(dia_host.offsets) > MASK_MAX_PLANES:
        return None, False
    vals, ok = plane_constants(dia_host.data)
    return vals, bool(ok.all())


def to_device_dia_stream(dia_host,
                         block_rows: int | None = None,
                         L: int = 1,
                         masked: bool | None = None,
                         plane_dtype=np.float32) -> DiaStreamDevice:
    """Ship a host DIA plan for the stream kernel. ``masked=None``
    auto-compresses constant-coefficient operators to the int32
    bitmask form (bit-identical results, K-planes -> one-word row
    traffic); ``False`` forces value planes, ``True`` raises if any
    plane is not two-valued.

    ``plane_dtype=jnp.bfloat16`` stores the value planes in bf16
    (halved plane traffic; the kernel upcasts in-register and all
    arithmetic stays f32). The OPERATOR is perturbed ~1e-2 relative —
    an approximation, never an AUTO choice; it exists as the inner
    operator of the bf16-plane refinement solve
    (solvers/refine.cg_solve_refined_f32, ops.spmv.plan_dia_bf16).
    Forces the unmasked form (a maskable operator's bitmask plan is
    already exact AND cheaper than any value-plane precision)."""
    from tpusparse.utils.transfer import device_put_chunked

    bf16_planes = np.dtype(plane_dtype) != np.float32
    if bf16_planes and masked:
        raise ValueError(
            "bf16 planes apply to the value-plane form only — a "
            "maskable operator's bitmask plan is exact and cheaper")
    vals64, ok = (None, False) if (masked is False or bf16_planes) \
        else _maskable(dia_host)
    if masked is True and not ok:
        raise ValueError(
            "masked stream plan requires every diagonal to be a "
            "constant coefficient (formats.dia.plane_constants)")
    use_mask = ok if masked is None else masked
    if block_rows is None:
        block_rows = _auto_block_rows(dia_host, df=False, L=L,
                                      masked=use_mask)
    offsets = tuple(int(o) for o in dia_host.offsets)
    if use_mask:
        mask_b, n, B = prepare_stream_mask(dia_host, block_rows)
        vals = tuple(float(np.float32(v)) for v in vals64)
        return DiaStreamDevice(
            n, dia_host.num_cols, offsets, B,
            None, device_put_chunked(mask_b), vals,
        )
    data_b, n, B = prepare_stream(dia_host, block_rows,
                                  plane_dtype=plane_dtype)
    return DiaStreamDevice(
        n, dia_host.num_cols, offsets, B,
        device_put_chunked(data_b),
    )


def spmv_dia_stream(D: DiaStreamDevice, x, alpha=1.0, beta=0.0,
                    y=None):
    """y = alpha * A @ x + beta * y via the edge-halo streaming kernel
    at L=1 (same-process A/B vs the former dedicated (nb,)-grid
    3-block kernel: 391/344 vs 336/345 GF on lap3d-192 — equal or
    better, one kernel to maintain)."""
    y_new = spmm_dia_stream_t(D, x.astype(jnp.float32)[None, :])[0]
    if beta == 0.0 or y is None:
        return alpha * y_new if alpha != 1.0 else y_new
    return alpha * y_new + beta * y


def spmm_dia_stream_t(D: DiaStreamDevice, XT):
    """Transposed-layout SpMM: XT (L, num_cols) -> A@X as (L, num_rows)
    with no boundary transposes. The kernel's blocked layout IS the
    transposed layout (RHS-major, rows on lanes), so this is the native
    entry point — solvers keep their whole multi-RHS state in (L, n)
    (the (n, L) layout cliff, RESULTS session 8) and the stream plan
    joins the transposed-space fast path at any matrix size. Routes
    through the edge-halo kernel (one tail pad per call): measured
    351 vs 228 GF at L=1 and 194 vs 177 at L=32 over the 3-full-block
    halo (lap3d-192, RESULTS session 9)."""
    n = XT.shape[1]
    np_ = padded_cols(D)
    XTP = XT if np_ == n else jnp.pad(XT, ((0, 0), (0, np_ - n)))
    return spmm_dia_stream_tp(D, XTP)[:, :n]


def spmm_dia_stream(D: DiaStreamDevice, X, alpha=1.0, beta=0.0,
                    Y=None):
    """Y = alpha * A @ X + beta * Y via the multi-RHS streaming kernel
    (X of shape (num_cols, L))."""
    Y_new = spmm_dia_stream_t(D, X.T).T
    if beta == 0.0 or Y is None:
        return alpha * Y_new if alpha != 1.0 else Y_new
    return alpha * Y_new + beta * Y


def _edge_sublanes(offsets) -> int:
    """Halo depth in sublane rows: the edge-slab kernel needs only
    ceil(max|off|/128) rows from each neighbour block, not the whole
    block (the 3-full-block halo reads each x block 3x; for a 7-point
    lap3d stencil at K=192 the true need is 288 of 1024 rows)."""
    return max(1, -(-max(abs(int(o)) for o in offsets) // LANES))


def _dia_stream_kernel_edge(offsets, R, E, interpret, lo_ref, x_ref,
                            hi_ref, d_ref, y_ref):
    buf = jnp.concatenate(
        [lo_ref[0, 0], x_ref[0, 0], hi_ref[0, 0]], axis=0
    )  # (E + R + E, 128)
    acc = jnp.zeros((R, LANES), jnp.float32)
    for k, off in enumerate(offsets):
        # planes may be stored bf16 (plan_dia_bf16); upcast in-register
        # — the FMA and accumulator stay f32 either way
        d = d_ref[0, k].astype(jnp.float32)
        acc = acc + d * _shifted(buf, off, R, interpret, base=E)
    y_ref[0, 0] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "R", "E"))
@kernel_no_x64
def _spmm_dia_stream_edge(data_b, x_b, lo_b, hi_b, offsets, R, E):
    """Edge-halo multi-RHS stream: x_b (L, nb, R, 128) consumed
    IN PLACE (no padded copy), neighbour context as two E-sublane edge
    slabs (L, nb, E, 128). Grid (nb, L), RHS minor, planes DMA-shared
    across the L steps of a row block (their index maps depend only on i).
    x/y traffic per matvec = (1 + 2E/R) x reads + 1 y write versus the
    3-full-block kernel's 3 x reads + 1 y + a whole padded-x copy."""
    L, nb, _, _ = x_b.shape
    K = data_b.shape[1]
    kernel = functools.partial(_dia_stream_kernel_edge, offsets, R, E,
                               _interpret())
    if _interpret():
        params = {}
    else:
        from jax.experimental.pallas import tpu as pltpu

        psize = jnp.dtype(data_b.dtype).itemsize  # 4 f32 / 2 bf16
        step = (2 + 2 * E / R) * R * LANES * 4 + K * R * LANES * psize
        stack = (R + 2 * E) * LANES * 4   # in-kernel concat buffer
        params = {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=min(int(2 * step + stack) + (8 << 20),
                                 100 << 20)
        )}
    return pl.pallas_call(
        kernel,
        grid=(nb, L),
        in_specs=[
            pl.BlockSpec((1, 1, E, LANES), lambda i, l: (l, i, 0, 0)),
            pl.BlockSpec((1, 1, R, LANES), lambda i, l: (l, i, 0, 0)),
            pl.BlockSpec((1, 1, E, LANES), lambda i, l: (l, i, 0, 0)),
            pl.BlockSpec((1, K, R, LANES), lambda i, l: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, R, LANES),
                               lambda i, l: (l, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((L, nb, R, LANES), jnp.float32),
        interpret=_interpret(),
        **params,
    )(lo_b, x_b, hi_b, data_b)


def padded_cols(D: DiaStreamDevice) -> int:
    """State width for the padded transposed fast path: multiples of
    the kernel block so (L, np) reshapes to (L, nb, R, 128) for free."""
    payload = D.data_b if D.data_b is not None else D.mask_b
    return payload.shape[0] * D.block_rows


def _dia_stream_kernel_edge_mask(offsets, vals, R, E, interpret,
                                 lo_ref, x_ref, hi_ref, m_ref, y_ref):
    """Masked edge-halo body: the per-row coefficient of plane k is
    ``mask bit k ? vals[k] : 0`` — a select against a static scalar
    (~3 extra VPU ops per offset on a kernel whose bound is DMA, not
    arithmetic: the MXU-rotation wash). Products are EXACTLY the
    unmasked kernel's (0 * w included), so outputs are bit-identical."""
    buf = jnp.concatenate(
        [lo_ref[0, 0], x_ref[0, 0], hi_ref[0, 0]], axis=0
    )
    m = m_ref[0]  # (R, 128) int32 bitmask, shared by all K offsets
    acc = jnp.zeros((R, LANES), jnp.float32)
    for k, off in enumerate(offsets):
        w = _shifted(buf, off, R, interpret, base=E)
        # (m >> k) & 1: 1 << 31 would overflow int32 under no-x64
        d = jnp.where(((m >> k) & 1) != 0,
                      jnp.float32(vals[k]), jnp.float32(0.0))
        acc = acc + d * w
    y_ref[0, 0] = acc


@functools.partial(jax.jit,
                   static_argnames=("offsets", "vals", "R", "E"))
@kernel_no_x64
def _spmm_dia_stream_edge_mask(mask_b, x_b, lo_b, hi_b, offsets, vals,
                               R, E):
    """Masked variant of _spmm_dia_stream_edge: ONE int32 bitmask
    block per row block replaces the K f32 value planes (lap3d K=7:
    28 -> 4 B/row of operand traffic); per-plane constants ride the
    jit key as static floats."""
    L, nb, _, _ = x_b.shape
    kernel = functools.partial(_dia_stream_kernel_edge_mask, offsets,
                               vals, R, E, _interpret())
    if _interpret():
        params = {}
    else:
        from jax.experimental.pallas import tpu as pltpu

        # stack: concat buffer (R+2E) + accumulator and live shifted
        # temporaries (~2R) — no plane-block slack in the masked form
        step = (2 + 1 + 2 * E / R) * R * LANES * 4
        stack = ((R + 2 * E) + 2 * R) * LANES * 4
        params = {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=min(int(2 * step + stack) + (8 << 20),
                                 100 << 20)
        )}
    return pl.pallas_call(
        kernel,
        grid=(nb, L),
        in_specs=[
            pl.BlockSpec((1, 1, E, LANES), lambda i, l: (l, i, 0, 0)),
            pl.BlockSpec((1, 1, R, LANES), lambda i, l: (l, i, 0, 0)),
            pl.BlockSpec((1, 1, E, LANES), lambda i, l: (l, i, 0, 0)),
            pl.BlockSpec((1, R, LANES), lambda i, l: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, R, LANES),
                               lambda i, l: (l, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((L, nb, R, LANES), jnp.float32),
        interpret=_interpret(),
        **params,
    )(lo_b, x_b, hi_b, mask_b)


def _rotation_mats(offsets) -> np.ndarray:
    """(K, 2, 128, 128) f32 0/1 selection-rotation matrices: for an
    offset with lane remainder r != 0, ``c0 @ M0 + c1 @ M1`` equals
    the select+roll of `_shifted` — each output lane has exactly one
    unit product, so the MXU matmul is EXACT selection. Offsets with
    r == 0 leave zero matrices (the kernel's static branch skips
    them)."""
    K = len(offsets)
    M = np.zeros((K, 2, LANES, LANES), np.float32)
    o = np.arange(LANES)
    for k, off in enumerate(offsets):
        r = int(off) % LANES
        if r == 0:
            continue
        j = (o + r) % LANES
        wrap = j < r
        M[k, 0, j[~wrap], o[~wrap]] = 1.0
        M[k, 1, j[wrap], o[wrap]] = 1.0
    return M


def _rot_mats_of(D) -> "jnp.ndarray":
    """Per-plan cache of the rotation-matrix operand (built once)."""
    m = D.__dict__.get("_tpusparse_rot_mats")
    if m is None:
        m = jnp.asarray(_rotation_mats(D.offsets))
        D.__dict__["_tpusparse_rot_mats"] = m
    return m


def _dia_stream_kernel_edge_mxu(offsets, R, E, interpret, m_ref,
                                lo_ref, x_ref, hi_ref, d_ref, y_ref):
    """Edge-halo kernel body with the lane rotation on the MXU: the
    VPU select+iota+roll sequence (~5 ops per offset on (R, 128)
    registers) becomes two (R,128)@(128,128) selection matmuls that
    run on the otherwise-idle MXU, leaving the VPU only the FMA."""
    buf = jnp.concatenate(
        [lo_ref[0, 0], x_ref[0, 0], hi_ref[0, 0]], axis=0
    )
    acc = jnp.zeros((R, LANES), jnp.float32)
    for k, off in enumerate(offsets):
        q, r = divmod(off, LANES)
        c0 = jax.lax.slice(buf, (E + q, 0), (E + R + q, LANES))
        if r == 0:
            w = c0
        else:
            c1 = jax.lax.slice(buf, (E + q + 1, 0),
                               (E + R + q + 1, LANES))
            w = (jnp.dot(c0, m_ref[k, 0],
                         preferred_element_type=jnp.float32)
                 + jnp.dot(c1, m_ref[k, 1],
                           preferred_element_type=jnp.float32))
        acc = acc + d_ref[0, k].astype(jnp.float32) * w
    y_ref[0, 0] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "R", "E"))
@kernel_no_x64
def _spmm_dia_stream_edge_mxu(data_b, x_b, lo_b, hi_b, mats, offsets,
                              R, E):
    """MXU-rotation variant of _spmm_dia_stream_edge; ``mats`` is the
    (K, 2, 128, 128) selection-matrix operand (DMA'd once — its index
    map is constant)."""
    L, nb, _, _ = x_b.shape
    K = data_b.shape[1]
    kernel = functools.partial(_dia_stream_kernel_edge_mxu, offsets,
                               R, E, _interpret())
    if _interpret():
        params = {}
    else:
        from jax.experimental.pallas import tpu as pltpu

        step = (2 + K + 2 * E / R) * R * LANES * 4
        stack = (R + 2 * E) * LANES * 4   # in-kernel concat buffer
        params = {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=min(int(2 * step + stack) + (12 << 20),
                                 100 << 20)
        )}
    return pl.pallas_call(
        kernel,
        grid=(nb, L),
        in_specs=[
            pl.BlockSpec((K, 2, LANES, LANES),
                         lambda i, l: (0, 0, 0, 0)),
            pl.BlockSpec((1, 1, E, LANES), lambda i, l: (l, i, 0, 0)),
            pl.BlockSpec((1, 1, R, LANES), lambda i, l: (l, i, 0, 0)),
            pl.BlockSpec((1, 1, E, LANES), lambda i, l: (l, i, 0, 0)),
            pl.BlockSpec((1, K, R, LANES), lambda i, l: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, R, LANES),
                               lambda i, l: (l, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((L, nb, R, LANES), jnp.float32),
        interpret=_interpret(),
        **params,
    )(mats, lo_b, x_b, hi_b, data_b)


def spmm_dia_stream_tp(D: DiaStreamDevice, XTP, mxu: bool | None = None):
    """Padded transposed SpMM: XTP (L, nb*B) with zero tail rows ->
    A@X as (L, nb*B) with zero tail rows (the value planes are
    zero-padded past num_rows, so pad outputs stay exactly 0 — solver
    state can live permanently in this layout with no per-iteration
    pad copies; dots/axpys over the zero tail are exact). ``mxu``
    selects the MXU-rotation kernel body (None = module default
    DIA_STREAM_MXU_ROTATE)."""
    B = D.block_rows
    nb = padded_cols(D) // B
    L = XTP.shape[0]
    R = B // LANES
    E = _edge_sublanes(D.offsets)
    x_b = XTP.astype(jnp.float32).reshape(L, nb, R, LANES)
    zero = jnp.zeros((L, 1, E, LANES), jnp.float32)
    lo_b = jnp.concatenate([zero, x_b[:, :-1, R - E:, :]], axis=1)
    hi_b = jnp.concatenate([x_b[:, 1:, :E, :], zero], axis=1)
    if D.data_b is None:
        Yb = _spmm_dia_stream_edge_mask(D.mask_b, x_b, lo_b, hi_b,
                                        D.offsets, D.vals, R, E)
        return Yb.reshape(L, nb * B)
    if mxu is None:
        mxu = DIA_STREAM_MXU_ROTATE
    if mxu:
        Yb = _spmm_dia_stream_edge_mxu(D.data_b, x_b, lo_b, hi_b,
                                       _rot_mats_of(D), D.offsets,
                                       R, E)
    else:
        Yb = _spmm_dia_stream_edge(D.data_b, x_b, lo_b, hi_b,
                                   D.offsets, R, E)
    return Yb.reshape(L, nb * B)
