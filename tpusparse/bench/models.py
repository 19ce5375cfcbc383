"""FLOP and byte models — metric definitions with reference parity.

Every formula cites its reference origin (see BASELINE.md):

  * SpMV GFLOP/s       = 2*nnz / t                  (cpu_spmv.cpp:725,733)
  * SpMM GFLOP/s       = 2*nnz*L / t                (cpu_spmm_v2.cpp:876,884)
  * effective GB/s     = (nnz*(2*sV+sO) + rows*L*(sO+sV)) / t
                                                    (cpu_spmv.cpp:721-727)
  * CG GFLOP/s         = (2*nnz + 10*n)*L*iters / t (cpu_multicg.cpp:176)
  * PCG-IC0 GFLOP/s    = (2*nnz + 4*nnz_L + 12*n)*L*iters / t
                                                    (cpu_multicg.cpp:240)
  * SPAI-CG GFLOP/s    = (4*nnz + 12*n)*L*iters / t (cpu_multicg.cpp:282)
"""

from __future__ import annotations


def spmv_flops(nnz: int, L: int = 1) -> float:
    return 2.0 * nnz * L


def spmv_bytes(nnz: int, rows: int, L: int = 1, value_bytes: int = 8,
               offset_bytes: int = 4) -> float:
    """Effective-bandwidth byte model (cpu_spmv.cpp:721-727): stream the
    values + column indices once, plus per-row offset and output."""
    return (
        nnz * (2 * value_bytes + offset_bytes)
        + rows * L * (offset_bytes + value_bytes)
    )


def dia_bytes(n_diags: int, rows: int, L: int = 1,
              value_bytes: int = 4) -> float:
    """Byte model for the DIA stream path: K value planes + x + y,
    each streamed once (no index traffic — offsets are static). A
    roofline percentage above 100 on small matrices means the planes
    stayed VMEM-resident across the timing chain (legitimate for
    solver workloads, which reuse A every iteration)."""
    return (n_diags + 2 * L) * rows * value_bytes


def dia_masked_bytes(rows: int, L: int = 1,
                     value_bytes: int = 4) -> float:
    """Byte model for the MASKED DIA stream path: the K value planes
    compress to one int32 bitmask word per row (constant-coefficient
    operators), so traffic is mask + x + y. Percentages above 100 of
    the r+w stream ceiling are expected at scale: reads (x + mask)
    and the y write pipeline on separate HBM channels, so the kernel
    runs at the READ channel's speed of light (RESULTS.md session
    10)."""
    return (1 + 2 * L) * rows * value_bytes


def cg_flops(nnz: int, n: int, L: int, iters: int) -> float:
    return (2.0 * nnz + 10.0 * n) * L * iters


def pcg_ic0_flops(nnz: int, nnz_L: int, n: int, L: int, iters: int) -> float:
    return (2.0 * nnz + 4.0 * nnz_L + 12.0 * n) * L * iters


def spai_cg_flops(nnz: int, n: int, L: int, iters: int) -> float:
    return (4.0 * nnz + 12.0 * n) * L * iters


def gflops(flops: float, seconds: float) -> float:
    return flops / seconds / 1e9 if seconds > 0 else 0.0


def gbytes_per_s(nbytes: float, seconds: float) -> float:
    return nbytes / seconds / 1e9 if seconds > 0 else 0.0


# Empirically measured streaming-bandwidth ceilings of the benchmark
# chip (TPU v5e via the axon tunnel; slope-timed at 256-512 MB, spread
# < 5%): a 1-read+1-write scale pass sustains ~445 GB/s; a
# 2-read+1-write triad sustains ~672 GB/s. SpMV is read-dominated
# (values + indices streamed, x gathered, y written once), so roofline
# percentages use the read-dominant ceiling. Datasheet HBM: 819 GB/s.
MEASURED_STREAM_GBS = 650.0
MEASURED_SCALE_GBS = 445.0
HBM_DATASHEET_GBS = 819.0


def roofline_pct(nbytes: float, seconds: float,
                 ceiling_gbs: float = MEASURED_STREAM_GBS) -> float:
    """Effective bandwidth as a percentage of the measured stream
    ceiling — the bandwidth-bound SpMV quality metric (the SC'16
    pipeline's claim, agent_spmv_orig.cuh:289-406)."""
    if seconds <= 0:
        return 0.0
    return 100.0 * (nbytes / seconds / 1e9) / ceiling_gbs
