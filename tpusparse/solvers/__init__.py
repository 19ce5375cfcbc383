from tpusparse.solvers.cg import cg_solve, cg_solve_multi, CgResult
