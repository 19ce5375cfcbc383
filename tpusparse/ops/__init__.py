from tpusparse.ops.spmv import spmv, spmm, SpmvStrategy
from tpusparse.ops.blas import dot_multiple, axpy_multiple, update_p_multiple
