"""Public SpMV / SpMM ops with strategy dispatch.

The reference exposes three CPU work-decomposition strategies plus an
MKL baseline, selected by the ``SpmmKernel`` enum
(``/root/reference/work_2025/types.hpp:11-16``: SIMPLE / MERGE /
NONZERO_SPLIT) and benchmarked against each other
(``cpu_spmv.cpp:750-923``). The TPU-native strategy set is:

  REFERENCE     — pure-XLA gather + segment_sum (the golden model).
  MERGE         — the Pallas merge-tile kernel (skew-insensitive
                  flagship; TPU re-design of the SC'16 merge-path GPU
                  pipeline — the reference's MERGE strategy).
  NONZERO_SPLIT — the reference's pure equal-nnz partition
                  (nonzero_splitting.hpp:19-152) as its own
                  benchmarkable family: merge kernels on
                  build_nnz_split_tiles (no locality clustering;
                  explicit-only — see the RESULTS.md A/B).
  ROW_SPLIT     — the Pallas layered-ELL kernel (one vector lane per
                  row; TPU re-design of the reference's SIMPLE
                  row-splitting strategy; the fastest multi-RHS path
                  for regular rows).
  BSR           — blocked-CSR panels on the MXU (for block-structured
                  matrices; the TPU answer to the reference's BCSR).
  DIA / NMAJOR  — diagonal-structure fast paths (formats/dia,
                  kernels/dia_stream, kernels/dia_nmajor); AUTO peels
                  dense diagonals first, NMAJOR is the explicit
                  row-interleaved masked multi-RHS plan.
  AUTO          — plan-time selection by occupancy / gather-span /
                  VMEM fit, mirroring the reference's
                  benchmarked-strategy selection.

``plan_kind`` names a plan's family (CLI row labels);
``plan_semantics`` tags its numeric semantics (f32 / ieee-f64 /
double-float(~1e-14)).

``plan_matrix`` builds the device operand for a host CsrMatrix under a
strategy; ``spmv``/``spmm`` dispatch on the operand type.
"""

from __future__ import annotations

import enum
import jax

from tpusparse.formats.csr import CsrMatrix
from tpusparse.ops import reference as ref


class SpmvStrategy(enum.Enum):
    REFERENCE = "reference"
    MERGE = "merge"
    NONZERO_SPLIT = "nonzero_split"
    ROW_SPLIT = "row_split"
    BSR = "bsr"
    BCOO = "bcoo"
    DIA = "dia"
    NMAJOR = "nmajor"
    AUTO = "auto"

    @classmethod
    def parse(cls, s) -> "SpmvStrategy":
        if isinstance(s, cls):
            return s
        s = str(s).lower()
        aliases = {
            # reference driver kernel names (work_2025/types.hpp)
            "simple": "row_split",
            "ell": "row_split",
            "hybrid": "dia",
            # the vendor baseline the reference benchmarks against is
            # MKL (cpu_spmv.cpp:631-664); the JAX-ecosystem analogue is
            # jax.experimental.sparse BCOO
            "mkl": "bcoo",
        }
        return cls(aliases.get(s, s))


# fp64 multi-RHS AUTO: below this df-ELL packing efficiency the
# padded job stream (and its per-job gather cost) grows faster than
# the lanes it fills, and the skew-insensitive df merge SpMM kernel
# takes over (kernels/merge_df._spmm_kernel_df).
DF_ELL_MIN_OCC = 0.2

# explicit nonzero_split plans refuse tiles whose column span (the
# kernel's static gather trip count) exceeds this — unbounded spans
# are the pure partition's failure mode on scattered patterns
NNZ_SPLIT_MAX_SPAN = 256

# fp32 multi-RHS AUTO: below this merge-tile slot occupancy the merge
# SpMM's per-tile work (repeated serially per RHS lane block) loses to
# the ELL gather kernel even when ELL's own packing is poor — see the
# gate comment in plan_matrix (measured 27x at L=32 on ultra-sparse
# scatter; rmat-class patterns sit well above this floor).
MERGE_MIN_OCC_MULTIRHS = 0.05


def plan_matrix(csr, strategy="auto", dtype=None, L: int = 1,
                reorder=None, _allow_dia: bool = True):
    """Build the device operand for a host CsrMatrix.

    ``reorder``: None (default) plans in the native order; ``'rcm'``
    plans on the RCM-permuted matrix (ops.reorder — the reference's
    ``InitCsrRelabel`` capability, ``sparse_matrix.h:184-207``);
    ``'degree'`` clusters hot columns first (power-law gather-span
    reduction); ``'auto'`` permutes only when a candidate ordering
    clears its calibrated gates.

    AUTO policy: fp64 -> double-float plans (two-f32 planes, ~1e-14
    relative accuracy and f32 exponent range — NOT strict IEEE fp64;
    callers that need genuine fp64 semantics must pass
    strategy='reference', the XLA fp64 path; inside CG on
    ill-conditioned systems the df matvec costs ~3-10% extra
    iterations vs strict IEEE — solvers/refine.py recovers full fp64
    accuracy at fp32-kernel speed): multi-RHS rides df-ELL
    while its packing holds (occupancy >= DF_ELL_MIN_OCC) and the df
    merge SpMM on skewed/scattered patterns; single-RHS rides the df
    merge kernel. fp32 -> BSR MXU panels for block-structured fill,
    layered-ELL when the packing is efficient and the RHS block fits
    VMEM, else merge tiles.
    """
    import numpy as np

    if reorder:
        from tpusparse.ops.reorder import plan_reorder

        return plan_reorder(csr, strategy=strategy, dtype=dtype, L=L,
                            order=reorder)
    strategy = SpmvStrategy.parse(strategy)
    if dtype is None:
        dtype = np.asarray(csr.values).dtype
    if strategy == SpmvStrategy.BCOO:
        return ref.to_bcoo(csr, dtype=dtype)
    # DIA / hybrid gate: dense diagonal runs beat every gather kernel
    # by an order of magnitude (stream-bound shifted FMAs), so they are
    # peeled off first; the scattered remainder re-enters the planner.
    if _allow_dia and strategy in (SpmvStrategy.AUTO, SpmvStrategy.DIA,
                                   SpmvStrategy.NMAJOR):
        plan = _try_plan_dia(csr, strategy, dtype, L)
        if plan is not None:
            return plan
    # The Pallas kernels keep x (and the merge kernel also y) resident
    # in VMEM. The kernels raise Mosaic's scoped-vmem budget to what
    # the call needs (merge_spmv._vmem_params, ~100 MB ceiling on the
    # v5e's 128 MB), which admits ~8M rows/cols in one kernel call —
    # measured 28.9 GF at 2.1M rows / 14.6M nnz. Beyond this the
    # chunked block grid takes over.
    VMEM_DIM_LIMIT = 8_000_000
    too_big = max(csr.num_rows, csr.num_cols) > VMEM_DIM_LIMIT
    # the df merge kernel keeps TWO resident x/y planes (hi + lo)
    df_too_big = max(csr.num_rows, csr.num_cols) > VMEM_DIM_LIMIT // 2
    if np.dtype(dtype).itemsize > 4 and not too_big and (
        strategy in (SpmvStrategy.AUTO, SpmvStrategy.ROW_SPLIT)
    ) and (strategy == SpmvStrategy.ROW_SPLIT or L >= 2):
        # fp64 multi-RHS: the double-float gather-job kernel delivers
        # ~1e-14 agreement at ~half the fp32 kernel's speed — orders of
        # magnitude faster than the XLA fp64 gather path.
        from tpusparse.formats.ell import ell_occupancy_estimate
        from tpusparse.kernels import ell_df

        # no VMEM-fit gate: spmm_ell_df lane-chunks oversized RHS
        # blocks just like the fp32 kernel. Explicit ROW_SPLIT always
        # honors the request. AUTO keeps df-ELL where its packing
        # holds (its (L,128) registers fill and it measured 78 GF at
        # L=32 on stencils) but routes low-occupancy / power-law
        # patterns to the in-kernel df merge SpMM below — df-ELL's
        # job count explodes on heavy row skew (rmat-14: 0.33 GF vs
        # the df merge kernel's skew-insensitive tiles). The reference
        # benches its kernels in the default fp64 mode
        # (cpu_spmv.cpp:979-986).
        occ = ell_occupancy_estimate(csr, ell_df.DF_JOBS_PER_TILE)
        payload_ok = occ > 0 and (
            csr.nnz / occ * 2 * 4 <= 2 * 1024**3  # hi+lo f32 planes
        )
        if strategy == SpmvStrategy.ROW_SPLIT or (
            occ >= DF_ELL_MIN_OCC and payload_ok
        ):
            return ell_df.to_device_ell_df(ell_df.build_df_tiles(csr))
    if np.dtype(dtype).itemsize > 4 and not df_too_big and (
        strategy in (SpmvStrategy.AUTO, SpmvStrategy.MERGE)
    ):
        # fp64 single-RHS — and multi-RHS once the df-ELL occupancy
        # gate above falls through: the double-float MERGE kernels —
        # skew-insensitive like the f32 flagship (compensated register
        # scans instead of the MXU scan; ~1e-14 accuracy, f32 exponent
        # range). SpMV: 8.6 GF on rmat-14 vs df-ELL's 0.33 and the XLA
        # reference's 0.01; SpMM: kernels/merge_df._spmm_kernel_df
        # streams the payload once with (L,128) lane gathers.
        # Strict-IEEE callers pass strategy='reference'. Reference
        # default mode: cpu_spmv.cpp:979-986.
        from tpusparse.kernels import merge_df

        return merge_df.to_device_tiles_df(_host_merge_tiles(csr))
    if too_big and np.dtype(dtype).itemsize <= 4 and (
        strategy in (SpmvStrategy.AUTO, SpmvStrategy.MERGE)
    ):
        # beyond VMEM residency: block-grid of merge plans
        from tpusparse.ops.chunked import build_chunked_merge

        return build_chunked_merge(csr, dtype=dtype)
    if strategy == SpmvStrategy.NONZERO_SPLIT:
        # EXPLICIT pure equal-nnz partition (the reference's
        # NONZERO_SPLIT strategy row, nonzero_splitting.hpp:19-152,
        # benchmarked per matrix in cpu_spmv.cpp:750-923). Never the
        # AUTO choice: equal-nnz cuts without locality clustering let
        # the per-tile column span (= the kernel's static gather trip
        # count) grow with the scatter — see
        # formats.tiles.build_nnz_split_tiles and the RESULTS.md A/B.
        from tpusparse.formats.tiles import build_nnz_split_tiles

        tiles = build_nnz_split_tiles(csr)
        # capacity guard: the per-tile column span is the kernel's
        # STATIC unrolled gather trip count; with no clustering it
        # grows with the scatter, and Mosaic compile time explodes on
        # large unrolled bodies (CLAUDE.md). Raise with guidance so
        # CLI sweeps print an ERROR row and continue.
        max_span = int(np.asarray(tiles.col_span).max()) if \
            tiles.ntiles else 0
        if max_span > NNZ_SPLIT_MAX_SPAN:
            raise ValueError(
                f"nonzero_split tile span {max_span} exceeds the "
                f"compile-safe cap {NNZ_SPLIT_MAX_SPAN} (pure "
                "equal-nnz cuts on a scattered pattern); use "
                "strategy='merge' — its clustering bounds the span")
        if np.dtype(dtype).itemsize > 4:
            from tpusparse.kernels import merge_df

            return merge_df.to_device_tiles_df(
                tiles, family="nonzero_split")
        from tpusparse.kernels import merge_spmv

        return merge_spmv.to_device_tiles(tiles, dtype=dtype,
                                          family="nonzero_split")
    if (
        strategy == SpmvStrategy.REFERENCE
        or np.dtype(dtype).itemsize > 4
        or too_big
    ):
        return csr.to_device(dtype=dtype)
    if strategy == SpmvStrategy.BSR:
        from tpusparse.formats.bcsr import BcsrMatrix

        return BcsrMatrix.from_csr(csr, 8, 128).to_device(dtype=dtype)
    if strategy == SpmvStrategy.ROW_SPLIT:
        from tpusparse.formats.ell import build_ell_tiles
        from tpusparse.kernels import ell_spmm

        return ell_spmm.to_device_ell(build_ell_tiles(csr), dtype=dtype)
    if strategy == SpmvStrategy.MERGE:
        return _plan_merge(csr, dtype)
    # AUTO
    from tpusparse.formats.bcsr import BcsrMatrix, fill_estimate
    from tpusparse.formats.ell import build_ell_tiles, choose_jobs_per_tile
    from tpusparse.kernels import ell_spmm

    # block-structured pattern: dense (8,128)+ tiles feed the MXU panel
    # kernel, which beats every gather path when the blocking wastes
    # little (the reference's BcsrMatrix use case, sparse_matrix.h:993)
    if fill_estimate(csr, 8, 128) >= 0.3:
        bc = 256 if fill_estimate(csr, 8, 256) >= 0.3 else 128
        return BcsrMatrix.from_csr(csr, 8, bc).to_device(dtype=dtype)
    if L >= 8 and ell_spmm.ell_fits(csr.num_cols, L):
        # multi-RHS: the gather-job kernel fills its (L,128) registers;
        # pick the tile job capacity per matrix, gate on packing waste
        J, occ = choose_jobs_per_tile(csr)
        if occ >= 0.35:
            return ell_spmm.to_device_ell(
                build_ell_tiles(csr, jobs_per_tile=J), dtype=dtype
            )
        # Both packings poor (ultra-sparse scatter): the merge kernel
        # pays the RHS count SERIALLY per tile (its MXU-scan work
        # repeats per lane block) while ELL rides its (L,128)
        # registers, so badly-packed merge tiles lose by the L factor
        # — measured 27x at L=32 (50.1 vs 1.85 ms/SpMM on 262k rows /
        # 60k scattered nnz, scripts/r3_s9_rest_strategies.py; BCOO
        # within 7% of ELL). Merge keeps well-packed scattered
        # patterns (rmat et al, occ >~ 0.1).
        tiles = _host_merge_tiles(csr)
        if csr.nnz / (tiles.ntiles * 1024) < MERGE_MIN_OCC_MULTIRHS:
            return ell_spmm.to_device_ell(
                build_ell_tiles(csr, jobs_per_tile=J), dtype=dtype
            )
        from tpusparse.kernels import merge_spmv

        return merge_spmv.to_device_tiles(tiles, dtype=dtype)
    if L >= 8:
        # ELL's resident-RHS budget excludes this width (ell_fits
        # false): the same serial-per-lane merge pathology applies, so
        # ultra-sparse scatter goes to the BCOO vendor baseline
        # instead (measured within 7% of ELL on the scatter fixture).
        tiles = _host_merge_tiles(csr)
        if csr.nnz / (tiles.ntiles * 1024) < MERGE_MIN_OCC_MULTIRHS:
            return ref.to_bcoo(csr, dtype=dtype)
        from tpusparse.kernels import merge_spmv

        return merge_spmv.to_device_tiles(tiles, dtype=dtype)
    return _plan_merge(csr, dtype)


# AUTO moves to the DIA/hybrid path only when the selected diagonals
# carry at least this fraction of the nonzeros (below it the extra
# partial-product writeback isn't worth the peel).
DIA_MIN_COVERAGE = 0.3

# Beyond this many bytes of value planes, XLA's elementwise fusion of
# the shifted slices stops holding them on-chip and the DIA op
# collapses (measured lap3d: 530 GF at 115 MB planes -> 36 GF at
# 198 MB); the Pallas streaming kernel (kernels/dia_stream.py) holds
# ~330-365 GF at any size, so it takes over past the VMEM scale.
DIA_STREAM_MIN_BYTES = 128 * 1024 * 1024
# fp64 planes fuse further before collapsing (110 GF at 229 MB ->
# 13 GF at 396 MB); past this the double-float stream kernel (~86 GF
# at any size, ~1e-14 accuracy — NOT strict IEEE fp64) takes over.
DIA_STREAM_F64_MIN_BYTES = 256 * 1024 * 1024

# Multi-RHS fp32 crossover: the single-RHS XLA collapse does NOT
# apply at L > 1 (the op is x/y-stream-bound, not plane-bound), so
# past DIA_STREAM_MIN_BYTES the edge-halo stream kernel wins only
# while its fixed per-step VPU work beats XLA's per-diagonal
# re-stream of the (L, n) RHS. Measured lap3d-192 (198 MB planes),
# transposed CG GFLOP/s (stream-edge vs XLA): L=4: 259 vs 143,
# L=8: 217 vs 180, L=16: 222 vs 214, L=32: 239 vs 236 (tie),
# L=64: 241 vs 250 — XLA takes over past 32.
DIA_STREAM_MAX_L = 32


def _nmajor_geometry_ok(dia_host, L) -> bool:
    from tpusparse.kernels.dia_nmajor import plan_geometry

    return plan_geometry(dia_host.offsets, L)[0]


def _try_plan_dia(csr, strategy, dtype, L):
    """DIA / hybrid plan, or None when the matrix has no diagonal
    structure worth peeling (explicit strategy='dia' skips the
    coverage gate but still returns None with zero usable diagonals)."""
    import numpy as np

    from tpusparse.formats.dia import (
        diagonal_profile,
        partition_dia,
        select_diagonals,
        to_device_dia,
    )
    from tpusparse.ops.hybrid import HybridPlan

    if strategy == SpmvStrategy.NMAJOR and L < 2:
        # validate the explicit request up front: without this, the
        # L<=1 masked-stream branch below (or the AUTO tail after a
        # None return) would silently hand back a non-nmajor plan,
        # mislabeling A/B runs (ADVICE r3)
        raise ValueError(
            "strategy='nmajor' is a multi-RHS plan (needs L >= 2); "
            "use strategy='dia' for single-RHS masked streams")
    if csr.nnz == 0:
        if strategy == SpmvStrategy.NMAJOR:
            raise ValueError("strategy='nmajor': matrix has no nonzeros")
        return None
    offsets = select_diagonals(csr)
    if offsets.size == 0:
        if strategy == SpmvStrategy.NMAJOR:
            raise ValueError(
                "strategy='nmajor': no dense diagonals selected "
                "(formats.dia.select_diagonals) — the n-major kernel "
                "needs a constant-coefficient diagonal operator")
        return None
    all_off, counts, _ = diagonal_profile(csr)
    covered = int(counts[np.isin(all_off, offsets)].sum())
    if (strategy not in (SpmvStrategy.DIA, SpmvStrategy.NMAJOR)
            and covered < DIA_MIN_COVERAGE * csr.nnz):
        return None
    dia_host, rest = partition_dia(csr, offsets)
    from tpusparse.kernels import dia_stream

    itemsize = np.dtype(dtype).itemsize
    plane_bytes = dia_host.data.size * itemsize
    K_planes = len(dia_host.offsets)
    square = csr.num_rows == csr.num_cols
    stream_ok = square and dia_stream.fits_stream(
        dia_host.offsets, dia_stream.choose_block_rows(K_planes)
    )
    stream_ok_df = square and dia_stream.fits_stream(
        dia_host.offsets,
        dia_stream.choose_block_rows(K_planes, df=True),
    )
    maskable = dia_stream._maskable(dia_host)[1]
    if strategy == SpmvStrategy.NMAJOR:
        # EXPLICIT n-major (row-interleaved) masked multi-RHS plan:
        # the fastest standalone masked SpMM at scale (290-305 GF vs
        # the lane-major stream's 235-244 at L=8/16/32 on lap3d-192,
        # scripts/r3_s11_nmajor_ab.py) — but NOT the AUTO multi-RHS
        # choice: at SOLVE level the interleaved-state CG measured
        # 2-5% SLOWER than the lane-major transposed path (L=32:
        # 21.1 vs 20.0 ms/iter; the kernel's win is eaten by an
        # in-loop cost around the triple-operand pallas_call — the
        # BLAS-1 layouts themselves are a wash,
        # scripts/r3_s12_nmajor_cg_ab.py / r3_s12_blas_layout_ab.py).
        # Solvers on these plans use the interleaved-state fast path.
        from tpusparse.kernels import dia_nmajor

        if itemsize > 4:
            raise ValueError("strategy='nmajor' is fp32-only")
        if not (maskable and square):
            raise ValueError(
                "strategy='nmajor' requires a square constant-"
                "coefficient (maskable) diagonal operator")
        if not _nmajor_geometry_ok(dia_host, L):
            raise ValueError(
                f"strategy='nmajor' geometry unsupported at L={L} "
                "(needs 2 <= L <= 128 and the stencil halo within "
                "the scoped-vmem block; see dia_nmajor.plan_geometry)")
        dev = dia_nmajor.to_device_dia_nmajor(dia_host, L)
    elif itemsize <= 4 and L <= 1 and maskable and square \
            and dia_stream.fits_stream(
                dia_host.offsets,
                dia_stream._auto_block_rows(dia_host, df=False, L=1,
                                            masked=True)):
        # constant-coefficient single-RHS: the masked stream kernel
        # (int32 bitmask + static scalars, bit-identical) wins at ANY
        # size — measured lap3d-48 890-910 GF vs XLA-dia 242-279 and
        # lap3d-192 1254-1375 vs 339 (scripts/r3_s10_masked_dia.py)
        dev = dia_stream.to_device_dia_stream(dia_host, L=1)
    elif (itemsize <= 4 and stream_ok and L <= DIA_STREAM_MAX_L
            and plane_bytes > DIA_STREAM_MIN_BYTES):
        dev = dia_stream.to_device_dia_stream(dia_host, L=L)
    elif (itemsize > 4 and stream_ok_df
            and plane_bytes > DIA_STREAM_F64_MIN_BYTES):
        # double-float accuracy semantics (~1e-14, f32 exponent range)
        # past the fp64 fusion collapse; strict-IEEE callers at this
        # scale must pass strategy='reference'
        dev = dia_stream.to_device_dia_stream_df(dia_host, L=L)
    else:
        dev = to_device_dia(dia_host, dtype=dtype)
    rest_plan = None
    if rest.nnz > 0:
        rest_plan = plan_matrix(rest, strategy="auto", dtype=dtype,
                                L=L, _allow_dia=False)
    return HybridPlan(dev, rest_plan, csr.nnz)


def plan_dia_bf16(csr, L: int = 1, block_rows: int | None = None):
    """OPT-IN bf16-plane stream plan — the inner operator of the
    mixed-precision refinement solve (solvers/refine.py,
    ``cg_solve_refined_f32``). NEVER an AUTO choice: the planes are
    stored bf16, perturbing the operator ~4e-3 relative (bf16 eps =
    2^-8), so standalone SpMV results are approximate — the supported
    use is inner-CG iterations whose error a full-precision outer
    residual corrects.

    Why it pays: variable-coefficient diagonal operators (the
    SuiteSparse FD/FEM reality the constant-coefficient fixtures
    idealize — ``make_variable_stencil`` vs ``InitGrid2d/3d``,
    ``sparse_matrix.h:458-623``) are plane-stream-bound at L=1: a
    27-point stencil reads 108 B/row of f32 planes against ~12 B/row
    of x/y traffic. bf16 planes halve the dominant term; arithmetic
    stays f32 in-register.

    Requires: diagonal structure (>= DIA_MIN_COVERAGE nnz on selected
    diagonals), square, stream-geometry fit. The scattered remainder
    (if any) stays EXACT f32. Raises with guidance otherwise."""
    import jax.numpy as jnp
    import numpy as np

    from tpusparse.formats.dia import partition_dia, select_diagonals
    from tpusparse.kernels import dia_stream
    from tpusparse.ops.hybrid import HybridPlan

    if csr.num_rows != csr.num_cols:
        raise ValueError("plan_dia_bf16: square matrices only")
    offsets = select_diagonals(csr)
    if offsets.size == 0:
        raise ValueError(
            "plan_dia_bf16: no dense diagonals selected — the bf16-"
            "plane stream plan needs a diagonal-structured operator")
    dia_host, rest = partition_dia(csr, offsets)
    if not dia_stream.fits_stream(
        dia_host.offsets,
        block_rows or dia_stream._auto_block_rows(dia_host, df=False,
                                                  L=L),
    ):
        raise ValueError(
            "plan_dia_bf16: max |offset| exceeds the stream block "
            "(pathologically wide band)")
    if dia_stream._maskable(dia_host)[1]:
        # constant-coefficient operators compress to the EXACT int32
        # bitmask plan at 4 B/row — strictly better than bf16 value
        # planes; honor the request but say so
        print("plan_dia_bf16: operator is constant-coefficient — the "
              "exact masked plan (strategy='dia') reads 4 B/row and "
              "beats bf16 value planes; proceeding as requested",
              flush=True)
    dev = dia_stream.to_device_dia_stream(
        dia_host, block_rows=block_rows, L=L,
        plane_dtype=jnp.bfloat16)
    rest_plan = None
    if rest.nnz > 0:
        rest_plan = plan_matrix(rest, strategy="auto",
                                dtype=np.float32, L=L,
                                _allow_dia=False)
    return HybridPlan(dev, rest_plan, csr.nnz)


def plan_kind(A) -> str:
    """Canonical short name of a plan's kernel family (the CLI row
    label; the reference prints its kernel enum name per benchmark
    row, ``cpu_spmv.cpp:750-923``). Single source of truth — the CLI
    and the real-matrix battery both use it."""
    import jax.experimental.sparse as jsparse

    from tpusparse.formats.bcsr import BcsrMatrix
    from tpusparse.formats.csr import CsrMatrix
    from tpusparse.kernels.ell_df import DeviceEllDF
    from tpusparse.kernels.ell_spmm import DeviceEll
    from tpusparse.ops.hybrid import HybridPlan
    from tpusparse.ops.reorder import ReorderedPlan

    if isinstance(A, ReorderedPlan):
        return A.order + "+" + plan_kind(A.inner)
    if isinstance(A, HybridPlan):
        from tpusparse.kernels.dia_nmajor import DiaNMajorDevice

        if isinstance(A.dia, DiaNMajorDevice):
            tag = "dia_nmajor"
        elif _bf16_planes(A.dia):
            tag = "dia_bf16"
        else:
            tag = "dia"
        return tag if A.rest is None else "hybrid_" + tag
    if isinstance(A, CsrMatrix):
        return "reference"
    if isinstance(A, jsparse.BCOO):
        return "bcoo"
    if isinstance(A, DeviceEll):
        return "row_split"
    if isinstance(A, DeviceEllDF):
        return "row_split_df64"
    if type(A).__name__ == "DfMergeTiles":
        # the df plan's partition family rides its hi DeviceTiles
        return getattr(A.hi, "family", "merge") + "_df64"
    if isinstance(A, BcsrMatrix):
        return "bsr"
    # merge-device-typed plans: the family tag distinguishes the
    # equal-nnz partition (reference NONZERO_SPLIT row) from the
    # clustered merge families sharing these kernels (ADVICE r4)
    return getattr(A, "family", "merge")


def plan_semantics(A) -> str:
    """Numeric semantics a plan's kernels deliver: ``'f32'``,
    ``'ieee-f64'`` (strict XLA fp64 arithmetic), or
    ``'double-float(~1e-14)'`` (two-f32 compensated kernels — ~1e-14
    relative accuracy with the f32 exponent range, NOT strict IEEE
    fp64). The reference's default driver mode is fp64
    (``cpu_spmv.cpp:979-986``); this tag makes visible which semantics
    each TPU strategy row actually ran (VERDICT r3 item 7)."""
    import numpy as np

    from tpusparse.ops.hybrid import HybridPlan
    from tpusparse.ops.reorder import ReorderedPlan

    if isinstance(A, ReorderedPlan):
        return plan_semantics(A.inner)
    if isinstance(A, HybridPlan):
        parts = {plan_semantics(A.dia)}
        if A.rest is not None:
            parts.add(plan_semantics(A.rest))
        if "double-float(~1e-14)" in parts:
            return "double-float(~1e-14)"
        if "ieee-f64" in parts:
            return "ieee-f64"
        if "bf16-plane(~4e-3)" in parts:
            return "bf16-plane(~4e-3)"
        return "f32"
    from tpusparse.kernels.dia_stream import DiaStreamDFDevice

    if isinstance(A, DiaStreamDFDevice):
        return "double-float(~1e-14)"
    if _bf16_planes(A):
        return "bf16-plane(~4e-3)"
    tname = type(A).__name__
    if tname in ("DfMergeTiles", "DeviceEllDF"):
        return "double-float(~1e-14)"
    dtype = getattr(A, "dtype", None)
    if dtype is None:
        values = getattr(A, "values", None)
        if values is None:
            values = getattr(A, "data", None)
        dtype = getattr(values, "dtype", np.float32)
    return "ieee-f64" if np.dtype(dtype).itemsize > 4 else "f32"


def _bf16_planes(A) -> bool:
    """True for a DiaStreamDevice whose value planes are stored bf16
    (the plan_dia_bf16 inner-refinement operator)."""
    import jax.numpy as jnp

    from tpusparse.kernels.dia_stream import DiaStreamDevice

    return (isinstance(A, DiaStreamDevice) and A.data_b is not None
            and A.data_b.dtype == jnp.bfloat16)


def _host_merge_tiles(csr):
    """Tuned host MergeTiles partition (shared by the f32 and df merge
    plans): per-matrix choice between the contiguous-window and the
    block-list partition families (formats.tiles.choose_partition)."""
    from tpusparse.formats.tiles import choose_partition

    return choose_partition(csr)


def _plan_merge(csr, dtype):
    """Merge-tile plan with the per-matrix partition chooser
    (formats.tiles.choose_partition): gap-split windows when their
    occupancy holds, greedy variable-width windows on scattered /
    power-law patterns — the TPU analogue of the reference's per-arch
    dispatch policies (dispatch_spmv_orig.cuh:266-424)."""
    from tpusparse.kernels import merge_spmv

    return merge_spmv.to_device_tiles(_host_merge_tiles(csr),
                                      dtype=dtype)


def spmv(A, x, alpha=1.0, beta=0.0, y=None, strategy="auto"):
    """y = alpha * A @ x + beta * y.

    ``A`` may be a device CsrMatrix, a MergeTilesDevice plan, or a
    BcsrMatrix; ``strategy`` selects the kernel (AUTO dispatches on the
    type of ``A``)."""
    strategy = SpmvStrategy.parse(strategy)
    from tpusparse.formats.bcsr import BcsrMatrix
    from tpusparse.formats.dia import DiaDevice
    from tpusparse.ops.hybrid import HybridPlan, spmv_hybrid
    from tpusparse.ops.reorder import ReorderedPlan

    if isinstance(A, ReorderedPlan):
        yp = spmv(A.inner, A.apply_perm(x), alpha=alpha)
        y_new = A.apply_inv(yp)
        if beta == 0.0 or y is None:
            return y_new
        return y_new + beta * y
    if isinstance(A, HybridPlan):
        return spmv_hybrid(A, x, alpha=alpha, beta=beta, y=y)
    if isinstance(A, DiaDevice):
        from tpusparse.ops.dia import spmv_dia

        return spmv_dia(A, x, alpha=alpha, beta=beta, y=y)
    from tpusparse.kernels.dia_stream import (
        DiaStreamDevice,
        DiaStreamDFDevice,
    )

    if isinstance(A, DiaStreamDevice):
        from tpusparse.kernels.dia_stream import spmv_dia_stream

        return spmv_dia_stream(A, x, alpha=alpha, beta=beta, y=y)
    if isinstance(A, DiaStreamDFDevice):
        from tpusparse.kernels.dia_stream import spmv_dia_stream_df

        return spmv_dia_stream_df(A, x, alpha=alpha, beta=beta, y=y)
    if isinstance(A, CsrMatrix):
        return ref.spmv_reference(A, x, alpha=alpha, beta=beta, y=y)
    import jax.experimental.sparse as jsparse

    if isinstance(A, jsparse.BCOO):
        y_new = A @ x.astype(A.dtype)
        if beta == 0.0 or y is None:
            return alpha * y_new
        return alpha * y_new + beta * y
    if isinstance(A, BcsrMatrix):
        from tpusparse.kernels import bsr as bsr_kernel

        return bsr_kernel.bsr_spmv(A, x, alpha=alpha, beta=beta, y=y)
    from tpusparse.kernels import ell_df, ell_spmm

    if isinstance(A, ell_spmm.DeviceEll):
        return ell_spmm.spmv_ell(A, x, alpha=alpha, beta=beta, y=y)
    if isinstance(A, ell_df.DeviceEllDF):
        return ell_df.spmv_ell_df(A, x, alpha=alpha, beta=beta, y=y)
    from tpusparse.kernels import merge_df

    if isinstance(A, merge_df.DfMergeTiles):
        return merge_df.spmv_merge_df(A, x, alpha=alpha, beta=beta,
                                      y=y)
    from tpusparse.ops.chunked import ChunkedMerge, spmv_chunked

    if isinstance(A, ChunkedMerge):
        return spmv_chunked(A, x, alpha=alpha, beta=beta, y=y)
    from tpusparse.kernels import merge_spmv

    return merge_spmv.spmv_merge(A, x, alpha=alpha, beta=beta, y=y)


def spmm(A, X, alpha=1.0, beta=0.0, Y=None, strategy="auto"):
    """Y = alpha * A @ X + beta * Y, X of shape (num_cols, L)."""
    strategy = SpmvStrategy.parse(strategy)
    from tpusparse.formats.bcsr import BcsrMatrix
    from tpusparse.formats.dia import DiaDevice
    from tpusparse.ops.hybrid import HybridPlan, spmm_hybrid
    from tpusparse.ops.reorder import ReorderedPlan

    if isinstance(A, ReorderedPlan):
        import jax.numpy as jnp

        Yp = spmm(A.inner, jnp.asarray(X)[A.perm], alpha=alpha)
        Y_new = Yp[A.inv_perm]
        if beta == 0.0 or Y is None:
            return Y_new
        return Y_new + beta * Y
    if isinstance(A, HybridPlan):
        return spmm_hybrid(A, X, alpha=alpha, beta=beta, Y=Y)
    if isinstance(A, DiaDevice):
        from tpusparse.ops.dia import spmm_dia

        return spmm_dia(A, X, alpha=alpha, beta=beta, Y=Y)
    from tpusparse.kernels.dia_stream import (
        DiaStreamDevice,
        DiaStreamDFDevice,
    )

    if isinstance(A, DiaStreamDevice):
        from tpusparse.kernels.dia_stream import spmm_dia_stream

        return spmm_dia_stream(A, X, alpha=alpha, beta=beta, Y=Y)
    if isinstance(A, DiaStreamDFDevice):
        from tpusparse.kernels.dia_stream import spmm_dia_stream_df

        return spmm_dia_stream_df(A, X, alpha=alpha, beta=beta, Y=Y)
    if isinstance(A, CsrMatrix):
        return ref.spmm_reference(A, X, alpha=alpha, beta=beta, Y=Y)
    import jax.experimental.sparse as jsparse

    if isinstance(A, jsparse.BCOO):
        Y_new = A @ X.astype(A.dtype)
        if beta == 0.0 or Y is None:
            return alpha * Y_new
        return alpha * Y_new + beta * Y
    if isinstance(A, BcsrMatrix):
        from tpusparse.kernels import bsr as bsr_kernel

        return bsr_kernel.bsr_spmm(A, X, alpha=alpha, beta=beta, Y=Y)
    from tpusparse.kernels import ell_df, ell_spmm

    if isinstance(A, ell_spmm.DeviceEll):
        return ell_spmm.spmm_ell(A, X, alpha=alpha, beta=beta, Y=Y)
    if isinstance(A, ell_df.DeviceEllDF):
        return ell_df.spmm_ell_df(A, X, alpha=alpha, beta=beta, Y=Y)
    from tpusparse.kernels import merge_df

    if isinstance(A, merge_df.DfMergeTiles):
        return merge_df.spmm_merge_df(A, X, alpha=alpha, beta=beta,
                                      Y=Y)
    from tpusparse.ops.chunked import ChunkedMerge, spmm_chunked

    if isinstance(A, ChunkedMerge):
        return spmm_chunked(A, X, alpha=alpha, beta=beta, Y=Y)
    from tpusparse.kernels import spmm_merge

    return spmm_merge.spmm_merge(A, X, alpha=alpha, beta=beta, Y=Y)
