#!/usr/bin/env python
"""Primitive cost decomposition for the general gather-path SpMV.

Measures, on the real chip, the per-register-op cost of the primitives
the merge kernel (kernels/merge_spmv.py) is built from:

  fma      — acc = acc * c + s on an (8,128) f32 register (VPU clock
             calibration; 8 independent streams expose pipelining)
  tala     — acc_k = take_along_axis(acc_k, idx_k, axis=1): the Mosaic
             hardware lane gather, 8 independent chains (gather-from-
             accumulator defeats CSE/hoisting)
  dynread  — acc += x[dyn, :] broadcast: a dynamic-index VMEM row read
             (the ELL job-source cost; the 50/50 SpMM profile term)
  step     — per-grid-step overhead from the R->0 extrapolation

Method: grid of G steps, each running R primitive iterations across
U=8 independent accumulator streams; per-op cost = slope between two
R values (cancels per-step overhead), per-step cost from the R=0
intercept. Timed with the chained-slope harness (bench/timing.py) —
the only sound method on the ~25 ms-RTT tunnel.

The numbers feed the RESULTS.md ceiling analysis the round-4 VERDICT
asks for: how many ns/nnz the (8,128) gather primitive itself bounds
the merge formulation at (reference flagship for comparison:
cub/agent/agent_spmv_orig.cuh:289-406, bandwidth-bound on GPU because
GPUs gather at HBM bandwidth; the TPU formulation is VPU-shuffle-bound
instead).
"""

import functools
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpusparse.bench.timing import slope_time
from tpusparse.kernels._util import kernel_no_x64, tala32

LANES = 128
SUB = 8
U = 8          # independent accumulator streams
G = 256        # grid steps per kernel call


def _interpret():
    return jax.default_backend() != "tpu"


@kernel_no_x64
def _micro_kernel(variant: str, R: int, W: int,
                  x_ref, idx_ref, acc_ref, y_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    accs = [acc_ref[u] + jnp.float32(step) for u in range(U)]
    idxs = [idx_ref[u] for u in range(U)]
    if variant == "fma":
        c = jnp.float32(1.0000001)
        s = x_ref[0:SUB, :]
        for _ in range(R):
            for u in range(U):
                accs[u] = accs[u] * c + s
    elif variant == "tala":
        for _ in range(R):
            for u in range(U):
                accs[u] = tala32(accs[u], idxs[u], axis=1)
    elif variant == "dynread":
        # dynamic-index VMEM row reads; index from cheap scalar
        # arithmetic on the step id so reads cannot be hoisted
        for i in range(R):
            for u in range(U):
                d = (step * jnp.int32(U) + jnp.int32(i * U + u)) % W
                row = x_ref[pl.ds(d, 1), :]
                accs[u] = accs[u] + jnp.broadcast_to(row,
                                                     (SUB, LANES))
    elif variant == "selloop":
        # one merge select-loop iteration per R: broadcast window row,
        # lane-gather, compare, select — the per-window-row cost of
        # _gather_window. Each (i, u) uses a distinct index slice so
        # repeats cannot be CSE'd/hoisted.
        RMAX = idx_ref.shape[0]
        for i in range(R):
            qq = i % SUB
            row = x_ref[qq:qq + 1, :]
            for u in range(U):
                b = idx_ref[(i * U + u) % RMAX]
                cand = tala32(jnp.broadcast_to(row, (SUB, LANES)),
                              b, axis=1)
                accs[u] = jnp.where(b == qq, cand, accs[u])
    else:
        raise ValueError(variant)
    out = accs[0]
    for u in range(1, U):
        out = out + accs[u]
    y_ref[:] = y_ref[:] + out


@functools.partial(jax.jit, static_argnames=("variant", "R", "W"))
@kernel_no_x64
def _micro(acc0, x2d, idx, variant, R, W):
    kernel = functools.partial(_micro_kernel, variant, R, W)
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(x2d.shape, lambda i: (0, 0)),
            pl.BlockSpec(idx.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(acc0.shape, lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((SUB, LANES), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((SUB, LANES), jnp.float32),
        interpret=_interpret(),
    )(x2d, idx, acc0)


def measure(variant, R, x2d, idx, iters=(40, 240)):
    acc0 = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (U, SUB, LANES)).astype(np.float32))

    def fn(v):
        out = _micro(v, x2d, idx, variant, R, x2d.shape[0])
        return v.at[0].set(out * 1e-30)

    st = slope_time(fn, acc0, iters=iters, sets=5, reps=3)
    return st


def main():
    rng = np.random.default_rng(1)
    W = 512
    RMAX = 512
    x2d = jnp.asarray(rng.standard_normal((W, LANES)).astype(np.float32))
    idx = jnp.asarray(
        rng.integers(0, LANES, (RMAX, SUB, LANES)).astype(np.int32))

    print(f"variant  R_lo R_hi  per_op_ns  per_step_ns  spread")
    for variant in ("fma", "tala", "dynread", "selloop"):
        R1, R2 = 16, 64
        st1 = measure(variant, R1, x2d, idx)
        st2 = measure(variant, R2, x2d, idx)
        # per kernel call: G steps x R iters x U streams
        t1, t2 = st1.min_s, st2.min_s
        per_op = (t2 - t1) / (G * (R2 - R1) * U)
        per_step = (t1 - per_op * G * R1 * U) / G
        sp = max(st1.spread, st2.spread)
        print(f"{variant:8s} {R1:4d} {R2:4d}  {per_op*1e9:9.3f}  "
              f"{per_step*1e9:11.2f}  {sp:.3f}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
