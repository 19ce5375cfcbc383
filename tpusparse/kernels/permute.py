"""Pallas device permutation: y = x[perm] as select-loop lane gathers.

XLA-TPU's element gather runs at ~0.14 Gelem/s (measured: 470 us for
one 65k-element permute, scripts/r4_reorder_inner.py) — the cliff that
makes per-call reordered SpMV lose 4.3x and that CLAUDE.md warns about
for every ``ReorderedPlan`` dispatch. This kernel runs the same
permutation at the hardware-gather rate instead (~1-4 Gelem/s on
locality-bearing permutations), and is EXACT — pure broadcast /
lane-gather / select / add of disjoint slot sets, no arithmetic on the
values (the merge-plan proxy measured 1.02 Gelem/s but rounds through
its MXU prefix scan at ~7e-6).

Formulation: outputs in flat order chunk into (8, 128) register tiles
(tile t = elements [t*1024, (t+1)*1024)). Each tile's sources touch
some set of 128-element input blocks; the host builder splits that set
into SUBTILES of <= ``span`` blocks (the kernel's static trip count).
Per subtile the kernel runs the standard select-loop — broadcast one
x block row, lane-gather with the per-slot source lane, keep where the
per-slot local block index matches — and ACCUMULATES into the tile's
y rows (slots outside the subtile carry a -1 local index that matches
no loop iteration and contributes exact zero; the sequential TPU grid
makes += safe, as in the merge kernel). Even an adversarial random
permutation (every tile touching ~512 blocks) costs ~141 us at 65k —
still 3x ahead of XLA; structured orderings (degree / RCM / banded)
run 10-40x ahead.

Reference capability anchor: the reordering machinery around
``CooMatrix::InitCsrRelabel`` (``/root/reference/sparse_matrix.h:
184-207``); this kernel is the TPU-native piece that makes applying a
relabeling to device vectors cheap.
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

LANES = 128
SUB = 8
TILE = SUB * LANES  # outputs per register tile

# static select-loop trip count per subtile; wide tiles split into
# several subtiles (the compile-time bound — the merge kernel's span
# cap plays the same role)
SPAN = 32
# subtiles batched per grid step (amortizes the ~100 ns step overhead)
SUBTILES_PER_STEP = 8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PermutePlan:
    """Device payload for one fixed permutation."""

    n: int               # vector length
    nsub: int            # real subtile count (pre-padding)
    code: Any            # (nsub_pad, 8, 128) int16 — q * 128 + b per
                         # slot (q = local block index in this
                         # subtile's list, b = source lane); -1 =
                         # slot not served by this subtile
    reg: Any             # (steps, 1, S) int32 — output register tile
                         # id, streamed as a per-step SMEM block
    blk: Any             # (steps, S, SPAN) int32 — source block ids,
                         # streamed as a per-step SMEM block (a
                         # whole-array scalar prefetch would overflow
                         # the 1 MB SMEM at ~128 B/subtile; CLAUDE.md)

    def tree_flatten(self):
        return ((self.code, self.reg, self.blk), (self.n, self.nsub))

    @classmethod
    def tree_unflatten(cls, aux, children):
        code, reg, blk = children
        n, nsub = aux
        return cls(n, nsub, code, reg, blk)


# Above this much per-plan device payload (~2 KB per subtile), skip
# the kernel plan and let callers fall back to the XLA gather: only
# pathologically scattered permutations on multi-million-element
# vectors get here, and the kernel's advantage has shrunk to ~5x by
# then while the payload upload starts to matter.
PERMUTE_MAX_BYTES = 256 * 1024 * 1024


def build_permute_plan(perm: np.ndarray) -> PermutePlan | None:
    """Host build: subtile decomposition of ``y = x[perm]``.
    Returns None past :data:`PERMUTE_MAX_BYTES` (callers fall back to
    the XLA gather)."""
    from tpusparse.utils.transfer import device_put_chunked

    perm = np.asarray(perm, dtype=np.int64)
    n = perm.size
    # cheap bounds check (full bijectivity would cost a bincount per
    # build; out-of-range is the failure mode that otherwise surfaces
    # as silent wrong gathers — ADVICE r4)
    if n and (perm.min() < 0 or perm.max() >= n):
        raise ValueError(
            f"perm entries must lie in [0, {n}); got range "
            f"[{perm.min()}, {perm.max()}]")
    nt = -(-n // TILE)
    pad = np.zeros(nt * TILE, dtype=np.int64)
    pad[:n] = perm
    blk_flat = pad // LANES                        # (nt*TILE,)
    lane_flat = (pad % LANES).astype(np.int64)
    tile_id = np.arange(nt * TILE) // TILE

    # Vectorized per-tile unique + local rank: key = tile*OFFSET +
    # block is tile-major, so the globally-sorted unique key list is
    # per-tile-contiguous; each slot's local block rank is its global
    # unique rank minus its tile's first rank. Pad slots (beyond n)
    # are excluded from the unique sets via a sentinel key.
    OFFSET = int(blk_flat.max()) + 2 if n else 2
    key = tile_id * OFFSET + blk_flat
    key_served = key[:n]
    uniq, inv = np.unique(key_served, return_inverse=True)
    uniq_tile = uniq // OFFSET
    uniq_blk = (uniq % OFFSET).astype(np.int32)
    first = np.searchsorted(uniq, uniq_tile * OFFSET)  # per-unique:
    loc = inv - first[inv]                             # tile-local rank

    # subtile decomposition: slot -> subtile sub_base[tile] + loc//SPAN
    nu = np.bincount(uniq_tile, minlength=nt)          # uniques/tile
    nsub_t = -(-nu // SPAN)
    sub_base = np.concatenate([[0], np.cumsum(nsub_t)])
    nsub = int(sub_base[-1])
    S = SUBTILES_PER_STEP
    nsp = max(-(-nsub // S) * S, S)
    if nsp * SUB * LANES * 2 > PERMUTE_MAX_BYTES:
        return None

    blk_a = np.zeros((nsp, SPAN), dtype=np.int32)
    reg_a = np.zeros(nsp, dtype=np.int32)
    code_a = np.full((nsp, SUB, LANES), -1, dtype=np.int16)
    if nsub:
        # blk rows: unique blocks scatter to (subtile, loc % SPAN)
        u_loc = np.arange(uniq.size) - first
        u_sub = sub_base[uniq_tile] + u_loc // SPAN
        blk_a[u_sub, u_loc % SPAN] = uniq_blk
        # reg: tile id per subtile
        reg_a[:nsub] = np.repeat(np.arange(nt, dtype=np.int32),
                                 nsub_t)
        # codes: served slots scatter into their subtile's register
        slot = np.arange(n) % TILE
        sub_idx = sub_base[tile_id[:n]] + loc // SPAN
        code = (loc % SPAN) * LANES + lane_flat[:n]
        code_a.reshape(nsp, TILE)[sub_idx, slot] = code.astype(
            np.int16)
    return PermutePlan(
        n=n, nsub=nsub,
        code=device_put_chunked(code_a),
        reg=jnp.asarray(reg_a.reshape(-1, S)[:, None, :]),  # (steps,1,S)
        blk=jnp.asarray(blk_a.reshape(-1, S, SPAN)),
    )


@kernel_no_x64
def _permute_kernel(S: int, code_ref, reg_ref, blk_ref, x_ref, y_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    for u in range(S):
        code = code_ref[u].astype(jnp.int32)
        # numpy semantics: -1 // 128 = -1 (never matches a loop qq),
        # -1 % 128 = 127 (harmless under a dead select)
        q = code // LANES
        b = code % LANES
        g = jnp.zeros((SUB, LANES), x_ref.dtype)
        for qq in range(SPAN):
            row = x_ref[pl.ds(blk_ref[0, u, qq], 1), :]
            cand = tala32(jnp.broadcast_to(row, (SUB, LANES)), b,
                          axis=1)
            g = jnp.where(q == qq, cand, g)
        rb = reg_ref[0, 0, u] * SUB
        y_ref[pl.ds(rb, SUB), :] = y_ref[pl.ds(rb, SUB), :] + g


@functools.partial(jax.jit, static_argnames=("n", "mb"))
@kernel_no_x64
def _permute_call(P: PermutePlan, x, n: int, mb: int):
    from tpusparse.kernels.merge_spmv import _vmem_params

    S = SUBTILES_PER_STEP
    steps = P.blk.shape[0]
    nb = -(-n // LANES)
    x2d = jnp.zeros((nb * LANES,), x.dtype).at[:n].set(x)
    x2d = x2d.reshape(nb, LANES)
    itemsize = x2d.dtype.itemsize
    y2d = pl.pallas_call(
        functools.partial(_permute_kernel, S),
        compiler_params=_vmem_params(
            (x2d.size + mb * LANES) * itemsize, S, 1),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((S, SUB, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S, SPAN), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(x2d.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((mb, LANES), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((mb, LANES), x.dtype),
        interpret=_interpret(),
    )(P.code, P.reg, P.blk, x2d)
    return y2d.reshape(-1)[:n]


def permute_apply(P: PermutePlan, x):
    """``y = x[perm]`` for the permutation ``P`` was built from.
    fp32/int32-width vectors; exact (selects only). Pad, kernel, and
    slice run inside ONE jit — the eager path would pay a ~25 ms
    tunnel round trip per dispatch."""
    x = jnp.asarray(x)
    if x.size != P.n:
        raise ValueError(
            f"permute_apply: x has {x.size} elements but the plan "
            f"permutes {P.n} (stale or mismatched PermutePlan)")
    mb = max(-(-P.n // TILE) * SUB, SUB)
    return _permute_call(P, x, P.n, mb)
