"""DIA SpMV/SpMM — shifted elementwise FMAs, the stream-bound path.

For each stored diagonal ``off``: ``y[i] += data[k, i] * x[i + off]``.
With x zero-padded by the offset range, every diagonal is a *static*
slice of the padded vector, so the whole SpMV is K unrolled
multiply-adds over unit-stride streams — XLA fuses them into a single
pass (no gathers, no MXU, pure VPU). This is the operating point the
merge/gather kernels cannot reach on this ISA (see
``kernels/merge_spmv.py``'s VPU-op accounting): the arithmetic
intensity is that of a STREAM triad per diagonal. Measured lap3d-48:
~210 GF fp32 / ~92 GF native fp64 versus the merge kernel's 25 GF.

fp64 runs in *native* f64 (XLA-TPU software emulation) — measured 3x
faster than a Dekker double-float formulation for this elementwise
workload, with genuine IEEE semantics (~7e-15 vs scipy, reordering
only).

Reference capability this accelerates: the grid2d/grid3d stencil
fixtures (``/root/reference/sparse_matrix.h:458-623``) under the SpMV
drivers (``cpu_spmv.cpp:750-923``); correctness is defined by
``SpmvGold`` (``work_2025/spmm/sample.hpp:14-34``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpusparse.formats.dia import DiaDevice


def _pads(D: DiaDevice) -> tuple[int, int]:
    offs = D.offsets
    pad_lo = max(0, -min(offs)) if offs else 0
    pad_hi = max(0, (max(offs) if offs else 0)
                 + D.num_rows - D.num_cols)
    return pad_lo, pad_hi


@functools.partial(jax.jit, static_argnums=(2,))
def _spmm_dia_t(data, XT, meta):
    """Transposed-layout core: XT (L, num_cols) -> (L, num_rows).

    The row dimension sits on the 128-wide lane axis — an (n, L)
    layout pads L up to 128 lanes and wastes (128 - L)/128 of every
    register for the typical L = 8..32 (measured 20x slower at L=32).
    Exposed separately so solvers can keep their whole state in
    (L, n) and skip the boundary transposes: mixing per-lane-scalar
    BLAS-1 ops with (n, L) operands breaks XLA's layout assignment
    past L=16 (measured 10x/iter at L=32, RESULTS session 8)."""
    offsets, num_rows, pad_lo, pad_hi = meta
    n = num_rows
    L = XT.shape[0]
    Xp = jnp.concatenate(
        [
            jnp.zeros((L, pad_lo), XT.dtype),
            XT,
            jnp.zeros((L, pad_hi), XT.dtype),
        ],
        axis=1,
    )
    acc = jnp.zeros((L, n), XT.dtype)
    for k, off in enumerate(offsets):
        sl = jax.lax.slice_in_dim(Xp, off + pad_lo, off + pad_lo + n,
                                  axis=1)
        acc = acc + data[k][None, :] * sl
    return acc


@functools.partial(jax.jit, static_argnums=(2,))
def _spmm_dia(data, X, meta):
    """X: (num_cols, L) in data's dtype; returns (num_rows, L)."""
    return _spmm_dia_t(data, X.T, meta).T


def spmm_dia_t(D: DiaDevice, XT):
    """Transposed-layout SpMM: XT (L, num_cols) -> A@X as (L, num_rows)
    with no boundary transposes (solver fast path)."""
    pad_lo, pad_hi = _pads(D)
    meta = (D.offsets, D.num_rows, pad_lo, pad_hi)
    return _spmm_dia_t(D.data, XT.astype(D.data.dtype), meta)


def spmm_dia(D: DiaDevice, X, alpha=1.0, beta=0.0, Y=None):
    """Y = alpha * A @ X + beta * Y, X of shape (num_cols, L)."""
    pad_lo, pad_hi = _pads(D)
    meta = (D.offsets, D.num_rows, pad_lo, pad_hi)
    Y_new = _spmm_dia(D.data, X.astype(D.data.dtype), meta)
    if beta == 0.0 or Y is None:
        return alpha * Y_new if alpha != 1.0 else Y_new
    return alpha * Y_new + beta * Y


@functools.partial(jax.jit, static_argnums=(2,))
def _spmv_dia(data, x, meta):
    """1-D variant: keeps the vector on the lane dimension."""
    offsets, num_rows, pad_lo, pad_hi = meta
    n = num_rows
    xp = jnp.concatenate(
        [jnp.zeros(pad_lo, x.dtype), x, jnp.zeros(pad_hi, x.dtype)]
    )
    acc = jnp.zeros(n, x.dtype)
    for k, off in enumerate(offsets):
        sl = jax.lax.slice_in_dim(xp, off + pad_lo, off + pad_lo + n)
        acc = acc + data[k] * sl
    return acc


def spmv_dia(D: DiaDevice, x, alpha=1.0, beta=0.0, y=None):
    """y = alpha * A @ x + beta * y."""
    pad_lo, pad_hi = _pads(D)
    meta = (D.offsets, D.num_rows, pad_lo, pad_hi)
    y_new = _spmv_dia(D.data, x.astype(D.data.dtype), meta)
    if beta == 0.0 or y is None:
        return alpha * y_new if alpha != 1.0 else y_new
    return alpha * y_new + beta * y


def xla_matvec_of(plan):
    """Fusable XLA-level matvec for a DIA-family plan, or None.

    Intended for BAKED solver bodies (``solvers/cg.py``): a
    ``pallas_call`` is a fusion barrier, so inside a ``while_loop`` CG
    body the stream kernels force separate HBM passes for the matvec
    and the surrounding BLAS-1, while these shifted-FMA forms fuse
    into one pass. Measured same-process on lap3d-48/112 fp32 CG
    (r3_s10_cg_masked_ab): masked Pallas stream 4.6-4.9 / 57-61
    us/iter vs XLA value-plane 1.7-3.3 / 23-45 and XLA bitmask
    1.7-6.2 / 22.4-23.1 — the XLA forms win 2.5x, and the bitmask
    form stays flat at scale where the K value planes both blow the
    64 MB bake budget and collapse XLA's fusion capacity (the
    lap3d-192 single-RHS collapse, RESULTS session 10).

    Masked stream plans lower to ``((mask >> k) & 1) ? c_k : 0`` FMAs
    — one int32 word per row of plan traffic, exactly the Pallas
    masked kernel's math (agreement with the value-plane form is
    ULP-level: separately compiled programs contract FMAs
    differently). Unmasked stream plans reconstruct their value
    planes from the blocked layout at trace time (compile-time
    constant folding under bake). Returns None for plans with no
    XLA-DIA lowering (gather/merge kernels, double-float fp64).
    """
    from tpusparse.kernels.dia_stream import DiaStreamDevice
    from tpusparse.ops.hybrid import HybridPlan

    if isinstance(plan, HybridPlan):
        inner = xla_matvec_of(plan.dia)
        if inner is None:
            return None
        if plan.rest is None:
            return inner
        rest = plan.rest

        def mv_hybrid(x):
            from tpusparse.ops.spmv import spmv

            return spmv(rest, x, beta=1.0, y=inner(x))

        return mv_hybrid
    if isinstance(plan, DiaDevice):
        return lambda x: spmv_dia(plan, x)
    if not isinstance(plan, DiaStreamDevice):
        return None
    D = plan
    n, m = D.num_rows, D.num_cols
    offs = D.offsets
    pad_lo = max(0, -min(offs))
    pad_hi = max(0, max(offs) + n - m)
    if D.mask_b is None:
        # value planes: unblock (nb, K, R, 128) -> (K, n)
        K = D.data_b.shape[1]
        data = D.data_b.transpose(1, 0, 2, 3).reshape(K, -1)[:, :n]
        dd = DiaDevice(n, m, offs, data)
        return lambda x: spmv_dia(dd, x)
    mask = D.mask_b.reshape(-1)[:n]
    consts = tuple(jnp.float32(v) for v in D.vals)

    def mv_masked(x):
        xp = jnp.pad(x.astype(jnp.float32), (pad_lo, pad_hi))
        acc = jnp.zeros(n, jnp.float32)
        for k, off in enumerate(offs):
            c = jnp.where(((mask >> k) & 1) != 0, consts[k],
                          jnp.float32(0.0))
            sl = jax.lax.slice_in_dim(xp, off + pad_lo,
                                      off + pad_lo + n)
            acc = acc + c * sl
        return acc

    return mv_masked
