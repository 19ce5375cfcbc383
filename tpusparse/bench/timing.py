"""Robust TPU timing — chained-slope methodology.

Parity with the reference methodology (``utils.h:531-654``,
``cpu_spmv.cpp:330-347``, ``no_pretreatment.hpp:232-255``): warmup pass,
then timed repetitions; timing-iteration count auto-scaled toward a
target amount of streamed work (the reference targets ~16 G nnz,
``cpu_spmv.cpp:832``).

TPU-specific redesign: on the tunneled platform used here the
host<->device round trip is ~25 ms and ``block_until_ready`` does not
reliably block, so timing a single dispatch is invalid. The only sound
method is the *slope*: chain K iterations of the op inside one jitted
``fori_loop``, synchronize with a scalar device->host fetch, and take
(t(K2) - t(K1)) / (K2 - K1). The chip is also shared (run-to-run
variance ~2x), so a headline number must aggregate several interleaved
slope measurements and report the spread.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np


def sync(x) -> float:
    """Force execution of everything feeding `x`; returns the scalar."""
    import jax

    return float(np.asarray(jax.device_get(x)).ravel()[0])


@dataclass
class SlopeTiming:
    """Per-op seconds from interleaved slope measurements."""

    slopes_s: list[float] = field(default_factory=list)
    robust_slope_s: float = 0.0

    @property
    def median_s(self) -> float:
        return float(np.median(self.slopes_s))

    @property
    def min_s(self) -> float:
        """Cleanest estimate: slope between the independent minima of
        the two chain lengths across ALL sets. Per-set slopes can pair
        a contended short chain with a clean long chain (negative /
        absurd slopes on this shared chip); min-vs-min cannot."""
        if self.robust_slope_s > 0:
            return self.robust_slope_s
        return float(np.min(self.slopes_s))

    @property
    def spread(self) -> float:
        """(max - min) / median over the slope sets — the honesty
        metric for shared-chip variance."""
        m = self.median_s
        return float(
            (np.max(self.slopes_s) - np.min(self.slopes_s)) / m
        ) if m > 0 else 0.0

    @property
    def median_ms(self) -> float:
        return self.median_s * 1e3


def _make_chain(fn, x, K):
    """jit(K-fold self-composition of fn), renormalizing each step so
    values stay finite. For ops whose output shape differs from the
    input's, the loop carries x and folds a data dependency on fn(x)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def g(x):
        def body(i, x):
            y = fn(x)
            if y.shape == x.shape and y.dtype == x.dtype:
                return y / (jnp.max(jnp.abs(y)) + 1.0)
            return x * (1.0 + 0.0 * jnp.sum(y).astype(x.dtype))

        return jax.lax.fori_loop(0, K, body, x)

    return g


def _run_one(g, x) -> float:
    import jax.numpy as jnp

    t0 = time.perf_counter()
    r = g(x)
    sync(jnp.sum(r))
    return time.perf_counter() - t0


def iter_slope(run, iters=(50, 650), sets: int = 3, reps: int = 3,
               min_delta_s: float = 0.02,
               max_span: int = 200_000) -> SlopeTiming:
    """Per-ITERATION seconds of an iterative solver.

    ``run(M)`` must execute exactly M solver iterations in ONE device
    dispatch and block until the result reaches the host (pass
    tolerance=0 so the convergence exit never fires). The slope over M
    cancels the dispatch round trip exactly as ``slope_time``'s chained
    loops do — this is how a *solver* (a data-dependent
    ``lax.while_loop`` that cannot be fori-chained) gets an honest
    device-side rate through the ~25 ms tunnel: the wall clock of a
    single converged solve is dominated by the round trip at small
    sizes (measured: a 23 ms "solve" whose device work is ~1 ms).

    The long span amplifies 4x until the time delta clears
    ``min_delta_s`` (tunnel jitter floor; pass 0 off-tunnel) — each new
    span is a fresh jit compile, so amplification is bounded."""
    K1, K2 = iters
    run(K1), run(K2)  # compile both programs before timing

    def t(M):
        t0 = time.perf_counter()
        run(M)
        return time.perf_counter() - t0

    slopes, all_t1, all_t2 = [], [], []
    for _ in range(sets):
        t1s = [t(K1) for _ in range(reps)]
        t2s = [t(K2) for _ in range(reps)]
        all_t1 += t1s
        all_t2 += t2s
        slopes.append(max(
            float(np.median(t2s) - np.median(t1s)) / (K2 - K1), 1e-9))
    robust = max((min(all_t2) - min(all_t1)) / (K2 - K1), 1e-9)
    st = SlopeTiming(slopes, robust_slope_s=robust)
    delta = float(np.median(all_t2) - np.median(all_t1))
    if delta < min_delta_s and K2 < max_span:
        return iter_slope(run, iters=(K1, K1 + (K2 - K1) * 4),
                          sets=sets, reps=reps, min_delta_s=min_delta_s,
                          max_span=max_span)
    return st


def slope_time(fn, x, iters=(10, 110), sets: int = 1, reps: int = 3,
               min_per_op: float = 0.0) -> SlopeTiming:
    """Per-op seconds for ``fn(x)`` via chained-slope timing.

    ``iters = (K1, K2)``: the two chain lengths. ``sets`` interleaved
    slope measurements are collected (each = min over ``reps`` runs of
    both chains). When the measured per-op time undercuts
    ``min_per_op`` (slope noise regime for tiny ops), the chains are
    amplified 20x and remeasured, repeatedly, until the slope leaves
    the noise floor or the chains reach ~1e6 iterations (tiny kernels
    on tiny matrices need ~10^5 chained iterations before the slope
    rises above host-timer jitter).
    """
    K1, K2 = iters
    g1, g2 = _make_chain(fn, x, K1), _make_chain(fn, x, K2)
    # warmup both chains once before any timing
    _run_one(g1, x), _run_one(g2, x)
    slopes, all_t1, all_t2 = [], [], []
    for _ in range(sets):
        t1s = [_run_one(g1, x) for _ in range(reps)]
        t2s = [_run_one(g2, x) for _ in range(reps)]
        all_t1 += t1s
        all_t2 += t2s
        # median-vs-median within a set: a lone contended rep cannot
        # fabricate a too-fast (or negative) slope the way min-vs-min
        # pairing across unequal contention windows can
        slopes.append(max(
            float(np.median(t2s) - np.median(t1s)) / (K2 - K1), 1e-9))
    robust = max((min(all_t2) - min(all_t1)) / (K2 - K1), 1e-9)
    st = SlopeTiming(slopes, robust_slope_s=robust)
    # Amplify while the chain-length DELTA is inside the noise floor:
    # the tunnel's ~25 ms round trip jitters at ms scale, so the delta
    # must clear ~20 ms before the slope is trustworthy — in EITHER
    # direction. The old guard amplified only when the reading
    # undercut ``min_per_op``; jitter can just as well fabricate a
    # too-SLOW slope that sails past that check (the round-5
    # regression battery caught the lap3d-48 masked-dia CLI row at
    # 28.9 us/op for a 1.7 us kernel — a pure short-chain artifact),
    # so the trigger is now the delta itself. (The per-op estimate
    # alone would amplify forever for genuinely fast tiny ops; a
    # large-enough delta is trustworthy at any op size.)
    delta = float(np.median(all_t2) - np.median(all_t1))
    if min_per_op > 0 and delta < 20e-3 and K2 < 1_000_000:
        return slope_time(fn, x, iters=(K1 * 20, K2 * 20), sets=sets,
                          reps=reps, min_per_op=min_per_op)
    return st
