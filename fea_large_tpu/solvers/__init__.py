from fea_large_tpu.solvers.linear import (  # noqa: F401
    dense_cholesky_solve,
    block_jacobi_preconditioner,
    pcg,
    PCGResult,
)
from fea_large_tpu.solvers.newton import (  # noqa: F401
    NewtonSolver,
    SolverOptions,
    SolveResult,
)
