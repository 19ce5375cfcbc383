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
    blk_list: Any        # (nsub_pad, SPAN) int32 — source block ids
    reg: Any             # (nsub_pad,) int32 — output register tile id
    q: Any               # (nsub_pad, 8, 128) int16 — local block
                         # index within this subtile's list, -1 =
                         # slot not served by this subtile
    b: Any               # (nsub_pad, 8, 128) int16 — source lane

    def tree_flatten(self):
        return ((self.blk_list, self.reg, self.q, self.b),
                (self.n, self.nsub))

    @classmethod
    def tree_unflatten(cls, aux, children):
        blk, reg, q, b = children
        n, nsub = aux
        return cls(n, nsub, blk, reg, q, b)


def build_permute_plan(perm: np.ndarray) -> PermutePlan:
    """Host build: subtile decomposition of ``y = x[perm]``."""
    perm = np.asarray(perm, dtype=np.int64)
    n = perm.size
    nt = -(-n // TILE)
    pad = np.zeros(nt * TILE, dtype=np.int64)
    pad[:n] = perm
    src = pad.reshape(nt, TILE)
    served = np.zeros(nt * TILE, dtype=bool)
    served[:n] = True
    served = served.reshape(nt, TILE)

    blk = src // LANES                     # (nt, TILE)
    lane = (src % LANES).astype(np.int16)  # source lane per slot

    blk_rows, regs, qs, bs = [], [], [], []
    for t in range(nt):
        ub = np.unique(blk[t][served[t]])
        if ub.size == 0:
            continue
        # local index of each slot's source block in ub
        loc = np.searchsorted(ub, blk[t])
        for s0 in range(0, ub.size, SPAN):
            sub = ub[s0 : s0 + SPAN]
            row = np.zeros(SPAN, dtype=np.int32)
            row[: sub.size] = sub
            inset = served[t] & (loc >= s0) & (loc < s0 + sub.size)
            q = np.where(inset, loc - s0, -1)
            blk_rows.append(row)
            regs.append(t)
            qs.append(q.reshape(SUB, LANES))
            bs.append(lane[t].reshape(SUB, LANES))
    nsub = len(regs)
    S = SUBTILES_PER_STEP
    nsp = max(-(-nsub // S) * S, S)
    blk_a = np.zeros((nsp, SPAN), dtype=np.int32)
    reg_a = np.zeros(nsp, dtype=np.int32)
    q_a = np.full((nsp, SUB, LANES), -1, dtype=np.int16)
    b_a = np.zeros((nsp, SUB, LANES), dtype=np.int16)
    if nsub:
        blk_a[:nsub] = np.stack(blk_rows)
        reg_a[:nsub] = np.asarray(regs, dtype=np.int32)
        q_a[:nsub] = np.stack(qs).astype(np.int16)
        b_a[:nsub] = np.stack(bs)
    return PermutePlan(
        n=n, nsub=nsub,
        blk_list=jnp.asarray(blk_a),
        reg=jnp.asarray(reg_a),
        q=jnp.asarray(q_a),
        b=jnp.asarray(b_a),
    )


@kernel_no_x64
def _permute_kernel(S: int, reg_ref, blk_ref, q_ref, b_ref, x_ref,
                    y_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    for u in range(S):
        t = step * S + u
        q = q_ref[u].astype(jnp.int32)
        b = jnp.broadcast_to(b_ref[u].astype(jnp.int32), (SUB, LANES))
        g = jnp.zeros((SUB, LANES), x_ref.dtype)
        for qq in range(SPAN):
            row = x_ref[pl.ds(blk_ref[t, qq], 1), :]
            cand = tala32(jnp.broadcast_to(row, (SUB, LANES)), b,
                          axis=1)
            g = jnp.where(q == qq, cand, g)
        rb = reg_ref[t] * SUB
        y_ref[pl.ds(rb, SUB), :] = y_ref[pl.ds(rb, SUB), :] + g


@functools.partial(jax.jit, static_argnames=("mb",))
@kernel_no_x64
def _permute_call(P: PermutePlan, x2d, mb: int):
    from tpusparse.kernels.merge_spmv import _vmem_params

    S = SUBTILES_PER_STEP
    steps = P.reg.shape[0] // S
    itemsize = x2d.dtype.itemsize
    y2d = pl.pallas_call(
        functools.partial(_permute_kernel, S),
        compiler_params=_vmem_params(
            (x2d.size + mb * LANES) * itemsize, S, 1),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # reg, blk_list
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((S, SUB, LANES),
                             lambda i, rg, bl: (i, 0, 0)),
                pl.BlockSpec((S, SUB, LANES),
                             lambda i, rg, bl: (i, 0, 0)),
                pl.BlockSpec(x2d.shape, lambda i, rg, bl: (0, 0)),
            ],
            out_specs=pl.BlockSpec((mb, LANES),
                                   lambda i, rg, bl: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((mb, LANES), x2d.dtype),
        interpret=_interpret(),
    )(P.reg, P.blk_list, P.q, P.b, x2d)
    return y2d


def permute_apply(P: PermutePlan, x):
    """``y = x[perm]`` for the permutation ``P`` was built from.
    fp32/int32-width vectors; exact (selects only)."""
    x = jnp.asarray(x)
    nb = -(-P.n // LANES)
    x2d = jnp.zeros((nb * LANES,), x.dtype).at[: P.n].set(x)
    x2d = x2d.reshape(nb, LANES)
    mb = -(-P.n // TILE) * SUB
    y2d = _permute_call(P, x2d, max(mb, SUB))
    return y2d.reshape(-1)[: P.n]
