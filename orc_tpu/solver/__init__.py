from orc_tpu.solver.krylov import SolveInfo, iterative_solve  # noqa: F401
