#!/usr/bin/env python
"""Round-over-round regression battery (VERDICT r4 item 7).

Pins the canonical CLI rows (spmv lap3d-48 / rmat-16 / wheel-500k /
Trefethen_2000, multicg lap3d-32 L=32) against the committed
expectation table ``scripts/regress_expected.json`` with spread-aware
floors, and emits ONE machine-readable JSON verdict — so drift like
the r03->r04 headline wiggle is classified automatically instead of
by eyeball against RESULTS.md.

PASS logic per row: the golden/convergence check must PASS outright;
the GFLOP/s must clear ``expect_gf * min_ratio`` (floors sized for
the shared chip's ~2x contention variance — this battery catches the
3x-10x regression class, not 10% drift; same-process A/Bs remain the
tool for strategy decisions, CLAUDE.md).

Usage: regress.py [--out data/regress.json]
Exit code 0 = all rows PASS.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def run_row(spec):
    from tpusparse.bench.run import build_parser

    argv = [spec["cmd"], "--quiet"] + spec["argv"]
    args = build_parser().parse_args(argv)
    t0 = time.time()
    out = args.fn(args)
    wall = time.time() - t0
    row = {"id": spec["id"], "wall_s": round(wall, 1)}
    if spec["cmd"] == "spmv":
        # rows: (name, kind, n, nnz, ms, gf, bw, check, semantics)
        want_kind = spec.get("kind")
        match = [r for r in out
                 if want_kind is None or r[1] == want_kind]
        if want_kind is None:
            match = out[:1]  # AUTO row prints first
        if not match:
            row.update(ok=False, reason=f"no row kind={want_kind}",
                       kinds=[r[1] for r in out])
            return row
        r = match[0]
        row.update(kind=r[1], gf=round(float(r[5]), 2), check=r[7])
        ok = r[7] == "PASS"
    elif spec["cmd"] == "multicg":
        res = out.get(spec["solver"], {})
        gf = res.get("dev_gflops")
        row.update(kind=spec["solver"],
                   gf=round(float(gf), 2) if gf else None,
                   check="PASS" if res.get("converged") else "FAIL",
                   iters=res.get("iters"),
                   spread=round(res.get("dev_spread", -1.0), 3))
        ok = bool(res.get("converged")) and gf is not None
    else:
        raise ValueError(spec["cmd"])
    if ok and spec.get("expect_gf"):
        floor = spec["expect_gf"] * spec["min_ratio"]
        row["floor_gf"] = round(floor, 2)
        ok = row["gf"] >= floor
    row["ok"] = bool(ok)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/regress.json")
    ap.add_argument("--only", help="comma-separated row ids")
    opts = ap.parse_args()
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "regress_expected.json")) as f:
        table = json.load(f)
    rows = table["rows"]
    if opts.only:
        keep = set(opts.only.split(","))
        rows = [r for r in rows if r["id"] in keep]
    results = []
    for spec in rows:
        print(f"[regress] {spec['id']} ...", flush=True)
        try:
            results.append(run_row(spec))
        except Exception as e:  # noqa: BLE001 — classify, don't crash
            results.append({"id": spec["id"], "ok": False,
                            "reason": f"{type(e).__name__}: {e}"})
        print(f"[regress]   -> {results[-1]}", flush=True)
    verdict = {"pass": all(r["ok"] for r in results),
               "rows": results}
    os.makedirs(os.path.dirname(opts.out) or ".", exist_ok=True)
    with open(opts.out, "w") as f:
        json.dump(verdict, f, indent=1)
    print(json.dumps(verdict))
    return 0 if verdict["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
