#!/usr/bin/env python
"""Merge-kernel ceiling-gap accounting (round 5, VERDICT r4 item 2).

Round 4 proved the gather stage sits at ~92% of its ISA floor, but
the WHOLE kernel measures 1.6-2.1x off its composed ceiling (24-26 vs
~45 GF banded, 14.1-14.9 vs ~30 GF rmat-16) with the residual
attributed in one clause. This script decomposes the measured time
into terms that must sum (same process, interleaved):

  T_prod        measured production spmv (classed plan)
  T_cls_k       measured per-class pallas_call (bare DeviceTiles)
  dispatch      = T_prod - sum_k T_cls_k   (multi-call + combine)
  model(tile)   = sum_t (62 + 4.3*span_t) ns   — the round-4
                  calibrated per-tile model at PER-TILE spans
                  (the ISA floor of this plan)
  model(class)  = same with each tile at its CLASS's static span
                  (what the unrolled loop actually executes)
  quantization  = model(class) - model(tile)
  within-class residual_k = T_cls_k - model_k(class)  (padding, window
                  misalignment, model error — reported per class)

Accounting identity: T_prod = model(tile) + quantization +
sum_k residual_k + dispatch. Terms are printed in ns/tile and GF.

Usage: r5_merge_gap.py [fixture=lap3d48|rmat16|both]
"""

import functools
import os
import signal
import sys
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

FIX = sys.argv[1] if len(sys.argv) > 1 else "both"

FIXED_NS = 62.0
SPAN_NS = 4.3


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def slope(tag, run, iters=(20, 220)):
    K1, K2 = iters
    run(K1)
    run(K2)

    def t(M):
        t0 = time.perf_counter()
        run(M)
        return time.perf_counter() - t0

    t1 = min(t(K1) for _ in range(3))
    t2 = min(t(K2) for _ in range(3))
    per = max((t2 - t1) / (K2 - K1), 1e-9)
    print(f"  {tag}: {per*1e6:.1f} us", flush=True)
    return per


def account(name, csr):
    from tpusparse.formats.tiles import choose_partition
    from tpusparse.kernels import merge_spmv as M
    from tpusparse.kernels.merge_spmv import ClassedTiles, spmv_merge

    nnz = csr.nnz
    host = choose_partition(csr)
    A = M.to_device_tiles(host, dtype=np.float32)
    classes = A.plans if isinstance(A, ClassedTiles) else (A,)
    stamp(f"{name}: nnz={nnz} tiles={host.ntiles} "
          f"occ={host.occupancy:.3f} classes={len(classes)} "
          f"spans={[int(np.asarray(p.col_span).max()) for p in classes]}")

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal(csr.num_cols).astype(np.float32))
    # golden
    y = np.asarray(spmv_merge(A, x))
    ref = csr.to_scipy() @ np.asarray(x)
    rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1)
    assert rel < 2e-5, rel

    @functools.partial(jax.jit, static_argnums=2)
    def chain(Aa, x0, K):
        def body(_, xc):
            yy = spmv_merge(Aa, xc)
            return yy / (jnp.max(jnp.abs(yy)) + 1.0)

        return jax.lax.fori_loop(0, K, body, x0)

    def runner(Aa):
        return lambda K: float(jnp.sum(chain(Aa, x, K)))

    # interleave: production, then each class, twice
    t_prod, t_cls = [], [[] for _ in classes]
    for _ in range(2):
        t_prod.append(slope("prod (classed)", runner(A)))
        for k, p in enumerate(classes):
            t_cls[k].append(slope(f"class{k} gr={p.gather_rows} "
                                  f"rs={p.row_span}", runner(p)))
    T_prod = min(t_prod)
    T_cls = [min(ts) for ts in t_cls]

    # models from the HOST plan: per-tile spans and class-max spans
    spans = np.asarray(host.col_span, dtype=np.float64)
    model_tile = (FIXED_NS + SPAN_NS * spans).sum() * 1e-9
    # per-class max spans: reconstruct the bucketing from the device
    # plans (tile counts + static gather_rows); pad tiles in each
    # class pay the class cost too (they execute the same loop)
    model_class = 0.0
    model_class_k = []
    for p in classes:
        nt_pad = p.ntiles
        m = nt_pad * (FIXED_NS + SPAN_NS * p.gather_rows) * 1e-9
        model_class += m
        model_class_k.append(m)

    disp = T_prod - sum(T_cls)
    quant = model_class - model_tile
    resid_k = [T_cls[k] - model_class_k[k] for k in range(len(classes))]
    gf = 2.0 * nnz / T_prod / 1e9
    stamp(f"{name} accounting (us): T_prod={T_prod*1e6:.1f} "
          f"({gf:.1f} GF)")
    stamp(f"  model(tile-spans) = {model_tile*1e6:.1f}  "
          f"[ISA floor of this plan -> "
          f"{2.0*nnz/model_tile/1e9:.1f} GF]")
    stamp(f"  + quantization    = {quant*1e6:.1f}  "
          f"[class-max static spans]")
    for k in range(len(classes)):
        stamp(f"  + residual cls{k}   = {resid_k[k]*1e6:.1f}  "
              f"[measured {T_cls[k]*1e6:.1f} vs model "
              f"{model_class_k[k]*1e6:.1f}]")
    stamp(f"  + dispatch        = {disp*1e6:.1f}  "
          f"[{len(classes)} calls + combine]")
    total = model_tile + quant + sum(resid_k) + disp
    stamp(f"  sum = {total*1e6:.1f} vs T_prod {T_prod*1e6:.1f} "
          f"(identity check {total/T_prod:.3f})")
    return dict(T_prod=T_prod, model_tile=model_tile, quant=quant,
                resid=sum(resid_k), disp=disp, gf=gf)


if __name__ == "__main__":
    import faulthandler

    faulthandler.register(signal.SIGUSR1)
    _staged = threading.Event()

    def _fire():
        if not _staged.is_set():
            print("STARTUP WEDGE: exiting for retry", flush=True)
            os._exit(3)

    _t = threading.Timer(600.0, _fire)
    _t.daemon = True
    _t.start()

    from tpusparse.io import generators

    _staged.set()
    if FIX in ("lap3d48", "both"):
        account("lap3d-48",
                generators.make_laplacian_grid3d(
                    48, dtype=np.float32).to_csr())
    if FIX in ("rmat16", "both"):
        account("rmat-16",
                generators.make_rmat(16, seed=0,
                                     dtype=np.float32).to_csr())
