"""Robust TPU timing.

Parity with the reference methodology (``utils.h:531-654``,
``cpu_spmv.cpp:330-347``, ``no_pretreatment.hpp:232-255``): warmup pass,
then timed repetitions reporting average (SpMV/SpMM) or min-of-reps
(solvers); timing-iteration count auto-scaled toward a target amount of
streamed work (the reference targets ~16 G nnz, ``cpu_spmv.cpp:832``).

TPU-specific detail: on the tunneled platform used here,
``block_until_ready`` does not reliably block, so synchronization is a
scalar device->host fetch of a reduction over the result. Benchmarked
functions must therefore return (result, scalar) or a scalar.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


def sync(x) -> float:
    """Force execution of everything feeding `x`; returns the scalar."""
    return float(np.asarray(jax.device_get(x)).ravel()[0])


def _run_once(fn, args) -> float:
    t0 = time.perf_counter()
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    sync(jnp.sum(leaf) if leaf.ndim else leaf)
    return time.perf_counter() - t0


@dataclass
class Timing:
    avg_s: float
    min_s: float
    reps: int

    @property
    def avg_ms(self) -> float:
        return self.avg_s * 1e3

    @property
    def min_ms(self) -> float:
        return self.min_s * 1e3


def benchmark(
    fn,
    *args,
    reps: int | None = None,
    target_work: float | None = None,
    work_per_call: float = 0.0,
    warmup: int = 2,
    max_reps: int = 1000,
    min_reps: int = 3,
) -> Timing:
    """Time ``fn(*args)``.

    If ``reps`` is None, a calibration run sizes the repetition count so
    total streamed work approaches ``target_work`` (the reference's
    16 G-nnz auto-scaling, cpu_spmv.cpp:832), clamped to
    [min_reps, max_reps].
    """
    for _ in range(warmup):
        t_cal = _run_once(fn, args)
    if reps is None:
        if target_work and work_per_call > 0 and t_cal > 0:
            per_call = work_per_call
            reps = int(target_work / per_call)
        else:
            reps = int(1.0 / max(t_cal, 1e-4))  # ~1 s of reps
        reps = max(min_reps, min(reps, max_reps))
    times = [_run_once(fn, args) for _ in range(reps)]
    return Timing(avg_s=float(np.mean(times)), min_s=float(np.min(times)),
                  reps=reps)
