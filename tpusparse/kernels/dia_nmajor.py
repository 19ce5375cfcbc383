"""N-major (row-interleaved) multi-RHS streaming DIA kernel.

The lane-major stream kernel (kernels/dia_stream.py) runs one RHS per
grid step with rows on lanes, so every diagonal offset whose lane
remainder is nonzero pays a select + ``pltpu.roll`` materialization
per RHS step — at L = 32 on lap3d-192 that throttles the kernel to
~9.1 ms/matvec where pure byte traffic costs ~3 ms. This kernel keeps
the multi-RHS operand in its NATURAL row-major (n, L) layout and views
it as the contiguous ``(n*L/128, 128)`` array (a free reshape): a
diagonal shift by ``o`` rows becomes a FLAT shift by ``o*L`` elements,
i.e. a pure SUBLANE slice whenever ``128 | o*L`` and a single roll by
``L*(o mod G)`` lanes otherwise (G = 128/L row groups per sublane).
For lap3d at L=32 that is 5 of 7 offsets shift-free; the measured A/B
(scripts/r3_s11_nmajor_micro.py, same process) read 9.16 vs 13.5
ms/matvec INCLUDING an identical ~4.4 ms chain-normalize overhead —
the kernel itself is ~1.9x the lane-major kernel and sits at the HBM
read ceiling of its 3-block halo.

Constant-coefficient (masked) operators only: per-row plane values
cannot ride (S, 1) sublane columns once G > 1 (a sublane carries G
different rows), but one PACKED int32 word per sublane can — word
``wi`` holds G fields of F = 32/G bits, field g = presence bits of
planes [wi*F, (wi+1)*F) for row t*G + g. The kernel extracts each
element's bit with a lane-varying logical shift (``F*(lane//L) + f``)
and selects the static per-plane scalar — the same ``mask ? c : 0``
contract as the lane-major masked kernel, so results are
bit-identical to the value-plane kernels. Mask traffic is W = ceil(K/F)
int32 words per SUBLANE (L rows), ~1/L-th of the lane-major mask.

State lives PERMANENTLY guarded: one zero block of S sublanes on each
side of the ``nb*S`` interior (plus a zero tail inside it past
``n*L``). Shifts read the guards instead of branching; guard OUTPUTS
are zero because their mask words are zero, so solver state can live
in the guarded flat layout across iterations with no per-iteration
copies (dots/axpys over the zero guards and tail are exact).

Reference capability: multi-RHS SpMM / blocked-CG on the grid2d/grid3d
stencil fixtures (``/root/reference/sparse_matrix.h:458-623``,
``cpu_spmm_v2.cpp``, ``no_pretreatment.hpp:35-197``) at scale.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from tpusparse.kernels._util import kernel_no_x64
from tpusparse.kernels.dia_stream import _interpret, _maskable, _shifted

LANES = 128

# Sublanes per kernel block: the micro measured S=9216 and S=13824
# within 2% of each other at E=9216; keep blocks >= S_TARGET and admit
# stencils while the whole per-call scoped-vmem need (blocks + Mosaic
# kernel stack) fits under the ~100 MB raise-able ceiling.
S_TARGET = 8192
_VMEM_CEIL = 100 << 20


def _vmem_need(S: int, E: int, W: int) -> int:
    """Scoped-vmem bytes for one call: 4 double-buffered (S, 128) f32
    blocks (lo/c/hi/out; the mask block is ~S*W words) plus the kernel
    stack — concat buffer (S + 2E), accumulator, live shifted
    temporaries (~2S) and the int32 iota/broadcast buffers ((W + 2)S
    words; measured: Mosaic billed 67.1M at S=8192, E=8, W=2 where a
    (4S + 2E)-only stack model predicted ~50M)."""
    blocks = 2 * 4 * S * LANES * 4
    stack = (6 * S + 2 * E + (W + 2) * S) * LANES * 4
    return blocks + stack


def _next_lane_count(L: int) -> int:
    """Smallest divisor of 128 that is >= L (RHS lanes are padded up to
    it so G = 128/Lp row groups tile a register row exactly). Floors at
    4: below it G > 32 leaves fields narrower than one bit per packed
    int32 word."""
    for p in (4, 8, 16, 32, 64, 128):
        if p >= L:
            return p
    raise ValueError(f"n-major plans support L <= 128, got {L}")


def plan_geometry(offsets, L: int):
    """(ok, Lp, S, E): block geometry for an n-major plan, or
    ok=False when the stencil's halo outgrows the VMEM-capped block
    (the gate applies the same scoped-vmem model the kernel's
    compiler-params use, so admitted plans compile)."""
    if L < 2 or L > 128:
        return False, 0, 0, 0
    Lp = _next_lane_count(L)
    maxoff = max(abs(int(o)) for o in offsets) if len(offsets) else 0
    if maxoff == 0:
        return False, 0, 0, 0
    E = -(-maxoff * Lp // LANES)
    S = max(S_TARGET, E)
    G = LANES // Lp
    F = 32 // G
    W = -(-len(offsets) // F)
    if _vmem_need(S, E, W) > _VMEM_CEIL:
        return False, 0, 0, 0
    return True, Lp, S, E


@jax.tree_util.register_pytree_node_class
class DiaNMajorDevice:
    """Device operand for the n-major masked stream kernel.

    ``mask_g``: ((nb + 2) * S, W) int32 packed presence words (guard
    blocks zero). ``vals``: static per-plane f32 scalars. The plan is
    L-specific (the interleave factor G = 128/L shapes the packing)."""

    def __init__(self, num_rows, num_cols, offsets, vals, L, S, E, nb,
                 mask_g):
        self.num_rows = num_rows
        self.num_cols = num_cols
        self.offsets = offsets      # static tuple of ints
        self.vals = vals            # static tuple of floats
        self.L = L                  # padded lane count Lp (divides 128)
        self.S = S                  # sublanes per block
        self.E = E                  # halo depth in sublanes
        self.nb = nb                # interior blocks
        self.mask_g = mask_g        # ((nb+2)*S, W) int32

    @property
    def G(self) -> int:
        return LANES // self.L

    @property
    def F(self) -> int:
        return 32 // self.G

    def tree_flatten(self):
        return (self.mask_g,), (self.num_rows, self.num_cols,
                                self.offsets, self.vals, self.L,
                                self.S, self.E, self.nb)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], aux[2], aux[3], aux[4], aux[5],
                   aux[6], aux[7], children[0])


def _pack_mask_host(dia_host, Lp: int, S: int) -> np.ndarray:
    """((nb+2)*S, W) int32 packed presence words (numpy, vectorized).
    word[t, wi] = sum_g field(row t*G+g, planes [wi*F,(wi+1)*F)) << F*g
    with zero guards/tail past num_rows."""
    n = int(dia_host.num_rows)
    K = len(dia_host.offsets)
    G = LANES // Lp
    F = 32 // G
    W = -(-K // F)
    T = -(-n * Lp // LANES)
    nb = -(-T // S)
    bits = (np.asarray(dia_host.data) != 0)          # (K, n)
    fld = np.zeros((n, W), np.uint32)
    for k in range(K):
        wi, f = divmod(k, F)
        fld[:, wi] |= bits[k].astype(np.uint32) << np.uint32(f)
    rows_cap = nb * S * G
    fld_p = np.zeros((rows_cap, W), np.uint32)
    fld_p[:n] = fld
    grp = fld_p.reshape(nb * S, G, W)
    words = np.zeros((nb * S, W), np.uint32)
    for g in range(G):
        words |= grp[:, g, :] << np.uint32(F * g)
    out = np.zeros(((nb + 2) * S, W), np.uint32)
    out[S:S + nb * S] = words
    return out.view(np.int32)


def to_device_dia_nmajor(dia_host, L: int) -> DiaNMajorDevice:
    """Ship a constant-coefficient host DIA plan in n-major packed-mask
    form for RHS count ``L`` (2..128; padded up to a divisor of 128).
    Raises ValueError when the operator is not maskable or the stencil
    halo exceeds the VMEM-capped block (use plan_geometry to pre-check)."""
    from tpusparse.utils.transfer import device_put_chunked

    if dia_host.num_rows != dia_host.num_cols:
        raise ValueError("n-major DIA plans require a square matrix")
    vals64, ok = _maskable(dia_host)
    if not ok:
        raise ValueError(
            "n-major stream plan requires every diagonal to be a "
            "constant coefficient (formats.dia.plane_constants)")
    geo_ok, Lp, S, E = plan_geometry(dia_host.offsets, L)
    if not geo_ok:
        raise ValueError(
            f"n-major geometry unsupported at L={L}: the halo blocks "
            "would exceed the scoped-vmem ceiling (see plan_geometry)")
    mask = _pack_mask_host(dia_host, Lp, S)
    nb = mask.shape[0] // S - 2
    offsets = tuple(int(o) for o in dia_host.offsets)
    vals = tuple(float(np.float32(v)) for v in vals64)
    return DiaNMajorDevice(int(dia_host.num_rows),
                           int(dia_host.num_cols), offsets, vals,
                           Lp, S, E, nb, device_put_chunked(mask))


def guarded_sublanes(D: DiaNMajorDevice) -> int:
    """Total sublane rows of the guarded flat state ((nb+2)*S)."""
    return (D.nb + 2) * D.S


def pack_gp(D: DiaNMajorDevice, X):
    """(n, L_user) RHS block -> guarded flat (T_g, 128) f32 state
    (zero guards, zero col-pad, zero tail)."""
    n, Lu = X.shape
    assert n == D.num_cols, (n, D.num_cols)
    if Lu > D.L:
        raise ValueError(
            f"n-major plan built for L <= {D.L} RHS columns, got "
            f"{Lu}; rebuild with plan_matrix(..., strategy='nmajor', "
            f"L={Lu})")
    Xp = X.astype(jnp.float32)
    if Lu < D.L:
        Xp = jnp.pad(Xp, ((0, 0), (0, D.L - Lu)))
    T = D.nb * D.S
    flat = jnp.pad(Xp.reshape(-1), (0, T * LANES - n * D.L))
    out = jnp.zeros(((D.nb + 2) * D.S, LANES), jnp.float32)
    return jax.lax.dynamic_update_slice(
        out, flat.reshape(T, LANES), (D.S, 0))


def unpack_gp(D: DiaNMajorDevice, Yg, L_user: int):
    """Guarded flat (T_g, 128) -> (n, L_user)."""
    n = D.num_rows
    T = D.nb * D.S
    flat = jax.lax.dynamic_slice(Yg, (D.S, 0), (T, LANES)).reshape(-1)
    return flat[:n * D.L].reshape(n, D.L)[:, :L_user]


def _nmajor_kernel(offsets_static, vals, S, E, Lp, F, interpret,
                   m_ref, lo_ref, c_ref, hi_ref, y_ref):
    buf = jnp.concatenate(
        [lo_ref[0, S - E:], c_ref[0], hi_ref[0, :E]], axis=0
    )  # (S + 2E, 128)
    W = m_ref.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 1)
    gsh = F * (lane // Lp)  # per-lane field base shift (hoisted)
    mws = [jnp.broadcast_to(m_ref[0, :, wi:wi + 1], (S, LANES))
           for wi in range(W)]
    acc = jnp.zeros((S, LANES), jnp.float32)
    for k, off in enumerate(offsets_static):
        fo = off * Lp  # row offset -> flat-element offset
        wi, f = divmod(k, F)
        bit = jax.lax.shift_right_logical(mws[wi], gsh + f) & 1
        coef = jnp.where(bit != 0, jnp.float32(vals[k]),
                         jnp.float32(0.0))
        acc = acc + coef * _shifted(buf, fo, S, interpret, base=E)
    # guard blocks carry zero mask words -> their outputs are exactly 0
    y_ref[0] = acc


@functools.partial(
    jax.jit, static_argnames=("offsets_static", "vals", "S", "E", "Lp",
                              "F"))
@kernel_no_x64
def _spmm_nmajor(mask_g, x_g, offsets_static, vals, S, E, Lp, F):
    nbg = x_g.shape[0] // S
    W = mask_g.shape[1]
    kernel = functools.partial(_nmajor_kernel, offsets_static, vals,
                               S, E, Lp, F, _interpret())
    if _interpret():
        params = {}
    else:
        from jax.experimental.pallas import tpu as pltpu

        params = {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=min(_vmem_need(S, E, W) + (4 << 20),
                                 100 << 20)
        )}
    xv = x_g.reshape(nbg, S, LANES)
    mv = mask_g.reshape(nbg, S, W)

    def lo_map(j):
        return (jnp.maximum(j - 1, 0), 0, 0)

    def hi_map(j):
        return (jnp.minimum(j + 1, nbg - 1), 0, 0)

    return pl.pallas_call(
        kernel,
        grid=(nbg,),
        in_specs=[
            pl.BlockSpec((1, S, W), lambda j: (j, 0, 0)),
            pl.BlockSpec((1, S, LANES), lo_map),
            pl.BlockSpec((1, S, LANES), lambda j: (j, 0, 0)),
            pl.BlockSpec((1, S, LANES), hi_map),
        ],
        out_shape=jax.ShapeDtypeStruct((nbg, S, LANES), jnp.float32),
        out_specs=pl.BlockSpec((1, S, LANES), lambda j: (j, 0, 0)),
        interpret=_interpret(),
        **params,
    )(mv, xv, xv, xv).reshape(nbg * S, LANES)


def spmm_dia_nmajor_gp(D: DiaNMajorDevice, Xg):
    """Guarded flat SpMM: (T_g, 128) -> (T_g, 128) with zero guards
    preserved — the solver fast-path entry (state lives here)."""
    return _spmm_nmajor(D.mask_g, Xg.astype(jnp.float32), D.offsets,
                        D.vals, D.S, D.E, D.L, D.F)


def spmm_dia_nmajor(D: DiaNMajorDevice, X, alpha=1.0, beta=0.0,
                    Y=None):
    """Y = alpha * A @ X + beta * Y, X of shape (num_cols, L<=Lp) —
    the generic (pack/unpack per call) entry point."""
    L_user = X.shape[1]
    Yn = unpack_gp(D, spmm_dia_nmajor_gp(D, pack_gp(D, X)), L_user)
    if beta == 0.0 or Y is None:
        return alpha * Yn if alpha != 1.0 else Yn
    return alpha * Yn + beta * Y


def spmv_dia_nmajor(D: DiaNMajorDevice, x, alpha=1.0, beta=0.0,
                    y=None):
    """Single-vector entry (pads the lane dim; the L=1 masked
    lane-major kernel is the right tool — this exists for dispatch
    completeness on an L-specific plan)."""
    yn = spmm_dia_nmajor(D, x.astype(jnp.float32)[:, None])[:, 0]
    if beta == 0.0 or y is None:
        return alpha * yn if alpha != 1.0 else yn
    return alpha * yn + beta * y


def fold_lanes(v, Lp: int):
    """(128,) per-lane partials -> (Lp,) per-RHS values (sums the
    G = 128/Lp row groups sharing each RHS lane)."""
    return v.reshape(LANES // Lp, Lp).sum(axis=0)


def tile_lanes(s, Lp: int):
    """(Lp,) per-RHS scalars -> (128,) lane vector (repeats across the
    G row groups) for broadcasting against guarded flat state."""
    return jnp.tile(s, LANES // Lp)
