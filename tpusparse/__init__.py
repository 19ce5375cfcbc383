"""tpusparse — TPU-native sparse linear algebra in JAX/Pallas.

A from-scratch, TPU-first framework with the capabilities of the
Merrill–Garland merge-based CSR SpMV benchmark suite
(YuyaW-0118/Sparse-Matrix-Linear-Equations): Matrix Market / SuiteSparse
ingestion, COO/CSR/BCSR formats plus a TPU-native merge-tile format,
load-balanced SpMV/SpMM kernels (Pallas), single- and multi-RHS conjugate
gradient solvers with IC(0) and SPAI preconditioning, and a full
benchmark/verification harness.

Layering (mirrors the reference's L4→L9 stack, re-designed TPU-first):

    formats/   COO, CSR, BCSR, merge-tiles        (ref: sparse_matrix.h)
    io/        .mtx parser, generators, fetch     (ref: sparse_matrix.h, get_uf_datasets.sh)
    ops/       spmv/spmm/BLAS-1 public ops        (ref: work_2025/spmm, cg/utils_multiple.hpp)
    kernels/   Pallas TPU kernels                 (ref: cub/agent + cub/device CUDA kernels)
    solvers/   CG / PCG / SPAI-CG                 (ref: work_2025/main, work_2025/cg)
    precond/   IC(0), SPAI, triangular solves     (ref: work_2025/cg/*decomp*.hpp)
    parallel/  multi-chip sharding (shard_map)    (beyond-reference capability)
    bench/     timing, flop/byte models, sweeps   (ref: cpu_*.cpp drivers, eval_*.sh)
    analysis/  plots and result pivots            (ref: verification/**/*.py)
"""

__version__ = "0.1.0"

from tpusparse.formats.coo import CooMatrix
from tpusparse.formats.csr import CsrMatrix
from tpusparse.formats.bcsr import BcsrMatrix
from tpusparse.io.market import read_market, write_market
from tpusparse.io.generators import (
    make_dense,
    make_wheel,
    make_grid2d,
    make_grid3d,
    make_random_spd,
)
from tpusparse.ops.spmv import spmv, spmm, plan_matrix, SpmvStrategy
from tpusparse.solvers.cg import cg_solve, cg_solve_multi
from tpusparse.solvers.pcg import pcg_solve_multi, make_ic0_preconditioner
from tpusparse.solvers.spai_cg import spai_cg_solve_multi
from tpusparse.solvers.refine import cg_solve_refined, cg_solve_multi_refined
from tpusparse.solvers.implicit import make_cg_solver, make_cg_solver_multi
from tpusparse.precond.ic0 import ic0_factorize
from tpusparse.precond.spai import spai_inverse
