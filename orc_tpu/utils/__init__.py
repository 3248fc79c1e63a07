from orc_tpu.utils.settings import NumericalSettings, MatrixSolverSettings  # noqa: F401
