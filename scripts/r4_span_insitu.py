#!/usr/bin/env python
"""In-situ merge-kernel cost vs column span (round-4 decomposition).

Controlled fixtures: 128-row-aligned block bands — every row dense in a
w-column 128-aligned window, so merge tiles pack at occupancy ~1 with a
single span class of exactly w/128 window rows. Regressing per-nnz
kernel time against the span isolates the select-loop's per-window-row
cost IN SITU (with the scan, extraction, and y-RMW terms as the
intercept) — the companion to scripts/r4_gather_micro.py's primitive
costs. Same-process A/B (shared chip: only same-process slopes are
comparable; CLAUDE.md).
"""

import os
import sys

import numpy as np

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpusparse.bench.timing import slope_time
from tpusparse.formats.coo import CooMatrix
from tpusparse.formats.csr import CsrMatrix
from tpusparse.formats.tiles import build_merge_tiles
from tpusparse.kernels.merge_spmv import spmv_merge, to_device_tiles


def band_csr(n, w, rng):
    """Rows dense in a w-wide 128-aligned column window shared per
    128-row block: single span class w/128, occupancy ~1."""
    r = np.repeat(np.arange(n, dtype=np.int64), w)
    c0 = np.minimum((np.arange(n) // 128) * 128, n - w)
    c = (np.repeat(c0, w)
         + np.tile(np.arange(w, dtype=np.int64), n))
    v = rng.standard_normal(r.size)
    return CsrMatrix.from_coo(CooMatrix(n, n, r, c, v)).astype(
        np.float32) if hasattr(CsrMatrix, "astype") else \
        CsrMatrix.from_coo(CooMatrix(n, n, r, c,
                                     v.astype(np.float32)))


def main():
    rng = np.random.default_rng(7)
    n = 8192
    print("span  nnz      occ    gather_rows  ns/nnz   GF    spread")
    rows = []
    for w in (128, 256, 512, 1024):
        csr = band_csr(n, w, rng)
        tiles = build_merge_tiles(csr, 1024, 1024, w)
        A = to_device_tiles(tiles, dtype=np.float32)
        from tpusparse.kernels.merge_spmv import ClassedTiles
        plans = A.plans if isinstance(A, ClassedTiles) else [A]
        gr = [p.gather_rows for p in plans]
        occ = tiles.occupancy
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        st = slope_time(lambda v: spmv_merge(A, v), x,
                        iters=(30, 300), sets=6, reps=3)
        per = st.min_s
        ns_nnz = per / csr.nnz * 1e9
        gf = 2 * csr.nnz / per / 1e9
        print(f"{w//128:4d}  {csr.nnz:8d} {occ:.3f}  {gr!s:11s} "
              f"{ns_nnz:7.4f} {gf:6.1f}  {st.spread:.3f}")
        sys.stdout.flush()
        rows.append((w // 128, ns_nnz))
    s = np.array([r[0] for r in rows], dtype=np.float64)
    t = np.array([r[1] for r in rows], dtype=np.float64)
    b, a = np.polyfit(s, t, 1)
    print(f"fit: ns/nnz = {a:.4f} + {b:.4f} * span  "
          f"(intercept = scan+extract+y, slope = select-loop/row)")


if __name__ == "__main__":
    main()
