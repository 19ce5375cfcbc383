from tpusparse.solvers.cg import cg_solve, cg_solve_multi, CgResult
from tpusparse.solvers.cg_ell import cg_solve_multi_ell
from tpusparse.solvers.pcg import pcg_solve_multi, make_ic0_preconditioner
from tpusparse.solvers.spai_cg import spai_cg_solve_multi
from tpusparse.solvers.refine import (
    cg_solve_refined,
    cg_solve_multi_refined,
    RefineResult,
)
from tpusparse.solvers.implicit import (
    make_cg_solver,
    make_cg_solver_multi,
)
