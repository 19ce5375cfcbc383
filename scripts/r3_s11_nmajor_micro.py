#!/usr/bin/env python
"""Micro-benchmark: sublane-major (n-major) multi-RHS DIA stream.

Hypothesis: the lane-major stream kernel at L >= 2 is throttled by the
per-offset lane-rotation materializations (select + pltpu.roll per RHS
step); laying the multi-RHS operand out as the FLAT row-major (n, L)
view reshaped to (n*L/128, 128) makes a diagonal shift by ``o`` a flat
shift by ``o*L`` — a PURE SUBLANE SLICE whenever 128 | o*L (for lap3d
at L=32 that is 5 of 7 offsets; the +-1 offsets keep one roll). If
Mosaic turns the sublane-shifted FMA chain into near-register-speed
code, the kernel becomes DMA-bound at the 3-block halo's (1 + 2E/S)
x-read overhead -> projected ~700 GF at L=32 on lap3d-192 vs the
lane-major kernel's measured ~231.

Measures CONSTANT-coefficient (unmasked, no boundary masking)
shifted-FMA throughput only — the decision gate for building the full
kernel (mask broadcast, guard maintenance, solver layout). The
lane-major stream kernel is timed IN-PROCESS with the same chain shape
for a contention-cancelling A/B. Correctness of the n-major body is
pinned in interpret mode against numpy (NMAJOR_CHECK=1).
"""

import functools
import os
import sys
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpusparse.kernels._util import kernel_no_x64
from tpusparse.kernels.dia_stream import _interpret, _shifted

LANES = 128


def _nmajor_kernel(flat_offsets, coefs, S, E, nbg, interpret,
                   lo_ref, c_ref, hi_ref, y_ref):
    buf = jnp.concatenate(
        [lo_ref[0, S - E:], c_ref[0], hi_ref[0, :E]], axis=0
    )  # (S + 2E, 128)
    acc = jnp.zeros((S, LANES), jnp.float32)
    for k, fo in enumerate(flat_offsets):
        acc = acc + jnp.float32(coefs[k]) * _shifted(
            buf, fo, S, interpret, base=E)
    j = pl.program_id(0)
    interior = jnp.logical_and(j > 0, j < nbg - 1)
    y_ref[0] = jnp.where(interior, acc, jnp.float32(0.0))


@functools.partial(jax.jit,
                   static_argnames=("flat_offsets", "coefs", "S", "E"))
@kernel_no_x64
def nmajor_spmm_g(x_g, flat_offsets, coefs, S, E):
    """x_g: ((nb + 2) * S, 128) f32 guarded flat view (one zero guard
    block each side). Returns the SAME guarded shape with zero guards
    (so solver state could live in it permanently)."""
    nbg = x_g.shape[0] // S
    kernel = functools.partial(_nmajor_kernel, flat_offsets, coefs,
                               S, E, nbg, _interpret())
    if _interpret():
        params = {}
    else:
        from jax.experimental.pallas import tpu as pltpu

        step = 4 * S * LANES * 4
        stack = (S + 2 * E + 3 * S) * LANES * 4
        params = {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=min(2 * step + stack + (8 << 20), 100 << 20)
        )}
    xv = x_g.reshape(nbg, S, LANES)

    def lo_map(j):
        return (jnp.maximum(j - 1, 0), 0, 0)

    def hi_map(j):
        return (jnp.minimum(j + 1, nbg - 1), 0, 0)

    return pl.pallas_call(
        kernel,
        grid=(nbg,),
        in_specs=[
            pl.BlockSpec((1, S, LANES), lo_map),
            pl.BlockSpec((1, S, LANES), lambda j: (j, 0, 0)),
            pl.BlockSpec((1, S, LANES), hi_map),
        ],
        out_shape=jax.ShapeDtypeStruct((nbg, S, LANES), jnp.float32),
        out_specs=pl.BlockSpec((1, S, LANES), lambda j: (j, 0, 0)),
        interpret=_interpret(),
        **params,
    )(xv, xv, xv).reshape(nbg * S, LANES)


def reference_nmajor(x, n, L, offsets, coefs):
    """Zero-padded constant-coefficient shift semantics on (n, L)."""
    y = np.zeros((n, L), np.float64)
    for o, c in zip(offsets, coefs):
        lo_s, hi_s = max(0, -o), min(n, n - o)
        y[lo_s:hi_s] += c * x[lo_s + o:hi_s + o].astype(np.float64)
    return y


def check_small():
    for (n, L, W, S) in ((64, 32, 4, 8), (512, 16, 8, 16),
                         (729, 64, 9, 128)):
        offsets = (-W * W, -W, -1, 0, 1, W, W * W)
        coefs = (-1.0, -1.0, -1.0, 6.0, -1.0, -1.0, -1.0)
        E = -(-max(abs(o) for o in offsets) * L // LANES)
        assert S >= E, (S, E)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((n, L)).astype(np.float32)
        T = -(-n * L // LANES)
        nb = -(-T // S)
        x_g = np.zeros(((nb + 2) * S, LANES), np.float32)
        x_g.reshape(-1)[S * LANES:S * LANES + n * L] = x.reshape(-1)
        fo = tuple(o * L for o in offsets)
        yg = np.asarray(nmajor_spmm_g(jnp.asarray(x_g), fo, coefs, S, E))
        assert np.all(yg[:S] == 0) and np.all(yg[-S:] == 0)
        y = yg.reshape(-1)[S * LANES:S * LANES + n * L].reshape(n, L)
        # rows past n*L in the padded tail contribute zeros, but the
        # reference treats x past n as zero too, so interior matches
        ref = reference_nmajor(x, n, L, offsets, coefs)
        err = np.max(np.abs(y - ref)) / np.max(np.abs(ref))
        print(f"n={n} L={L} S={S}: rel err {err:.2e}", flush=True)
        assert err < 1e-5, err


def time_chain(run, K1=4, K2=24, reps=3):
    run(K1), run(K2)

    def t(M):
        t0 = time.perf_counter()
        run(M)
        return time.perf_counter() - t0

    t1 = min(t(K1) for _ in range(reps))
    t2 = min(t(K2) for _ in range(reps))
    return max((t2 - t1) / (K2 - K1), 1e-9)


def main():
    Wd = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n = Wd ** 3
    offsets = (-Wd * Wd, -Wd, -1, 0, 1, Wd, Wd * Wd)
    coefs = (-1.0, -1.0, -1.0, 6.0, -1.0, -1.0, -1.0)
    nnz_eff = 7 * n
    E = -(-max(abs(o) for o in offsets) * L // LANES)
    T = n * L // LANES
    print(f"lap3d-{Wd} L={L}: n={n} T={T} E={E}", flush=True)

    key = jax.random.PRNGKey(0)

    # --- lane-major baseline (current production path), in-process ---
    from tpusparse.formats.dia import partition_dia, select_diagonals
    from tpusparse.io import generators
    from tpusparse.kernels.dia_stream import (
        padded_cols, spmm_dia_stream_tp, to_device_dia_stream)

    csr = generators.make_laplacian_grid3d(Wd, dtype=np.float32).to_csr()
    dia_host, _ = partition_dia(csr, select_diagonals(csr))
    for masked in (True, False):
        A = to_device_dia_stream(dia_host, L=L, masked=masked)
        np_ = padded_cols(A)
        XTP = jax.random.normal(key, (L, np_), jnp.float32)

        @functools.partial(jax.jit, static_argnums=1)
        def chain_lm(X0, M, A=A):
            def body(_, Xc):
                Y = spmm_dia_stream_tp(A, Xc)
                return Y / (jnp.max(jnp.abs(Y)) + 1.0)

            return jax.lax.fori_loop(0, M, body, X0)

        def run(M, chain_lm=chain_lm, XTP=XTP):
            float(jnp.sum(chain_lm(XTP, M)))

        try:
            per = time_chain(run)
            gf = 2.0 * nnz_eff * L / per / 1e9
            print(f"lane-major masked={masked}: {per*1e3:.2f} ms/matvec,"
                  f" {gf:.1f} GF", flush=True)
        except Exception as e:
            print(f"lane-major masked={masked}: ERROR "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
        del A, XTP
    del csr, dia_host

    # --- n-major variants ---
    for S in (9216, 13824):
        if S < E:
            print(f"S={S}: skipped (E={E} > S)", flush=True)
            continue
        nb = -(-T // S)
        x_g = jnp.zeros(((nb + 2) * S, LANES), jnp.float32)
        x_g = jax.lax.dynamic_update_slice(
            x_g, jax.random.normal(key, (T, LANES), jnp.float32), (S, 0))
        float(jnp.sum(x_g[:8]))
        fo = tuple(o * L for o in offsets)

        variants = {
            "full7": (fo, coefs),
            "slices5": (tuple(o for o in fo if o % LANES == 0),
                        tuple(c for o, c in zip(fo, coefs)
                              if o % LANES == 0)),
        }
        for tag, (fos, cs) in variants.items():
            @functools.partial(jax.jit, static_argnums=1)
            def chain(X0, M, fos=fos, cs=cs, S=S):
                def body(_, Xc):
                    Y = nmajor_spmm_g(Xc, fos, cs, S, E)
                    return Y / (jnp.max(jnp.abs(Y)) + 1.0)

                return jax.lax.fori_loop(0, M, body, X0)

            def run(M, chain=chain, x_g=x_g):
                float(jnp.sum(chain(x_g, M)))

            try:
                per = time_chain(run)
            except Exception as e:
                print(f"S={S} {tag}: ERROR {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
                continue
            gf = 2.0 * nnz_eff * L / per / 1e9
            rd = (3 * S * (nb + 2) * LANES * 4) / per / 1e9
            print(f"S={S} nb={nb} {tag}: {per*1e3:.2f} ms/matvec, "
                  f"{gf:.1f} GF-equiv, {rd:.0f} GB/s x-read", flush=True)
        del x_g


if __name__ == "__main__":
    _staged = threading.Event()

    def _fire():
        if not _staged.is_set():
            print("STARTUP WEDGE, exiting for retry", flush=True)
            os._exit(3)

    th = threading.Timer(600.0, _fire)
    th.daemon = True
    th.start()

    if os.environ.get("NMAJOR_CHECK"):
        jax.config.update("jax_platforms", "cpu")
        check_small()
        _staged.set()
        print("CHECK OK", flush=True)
    else:
        _staged.set()
        main()
