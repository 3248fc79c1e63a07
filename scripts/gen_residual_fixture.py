"""Generate the residual-history regression fixture.

BASELINE.json's correctness target is a residual-history match at 1e-6
relative tolerance on couette_flow_128x64x1. The Rust reference cannot
be built in this environment (no cargo), so this framework's own f64
trajectory is the pinned fixture (BASELINE.md, NOTES.md item 6): any
future change to SIMPLE semantics — including the planned K-major
relayout — must reproduce it or consciously regenerate it.

Deterministic setup: CPU backend, f64, the reference's VALIDATED
couette configuration with default numerics (CD1 + SecondOrder +
Rhie-Chow + Jacobi-preconditioned BiCGSTAB(50)).

Usage: env -u PALLAS_AXON_POOL_IPS python scripts/gen_residual_fixture.py
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

FIXTURE = "tests/fixtures/residual_history_couette_r1.npz"
ITERATIONS = 60


def build():
    from orc_tpu.mesh import read_mesh
    from orc_tpu.mesh.zones import FaceCondition
    from orc_tpu.solver.simple import initial_state, solve_steady
    from orc_tpu.utils.settings import (
        MatrixSolverSettings,
        NumericalSettings,
        PreconditionMethod,
        SolutionMethod,
    )

    mesh, table = read_mesh(
        "/root/reference/examples/couette_flow_128x64x1.msh"
    )
    table.set("TOP_WALL", FaceCondition.WALL, vector_value=(5e-4, 0.0, 0.0))
    table.set("BOTTOM_WALL", FaceCondition.WALL)
    table.set("INLET", FaceCondition.PRESSURE_INLET, scalar_value=0.02)
    table.set("OUTLET", FaceCondition.PRESSURE_OUTLET, scalar_value=0.0)
    table.set("PERIODIC_-Z", FaceCondition.SYMMETRY)
    table.set("PERIODIC_+Z", FaceCondition.SYMMETRY)
    settings = NumericalSettings(
        matrix_solver=MatrixSolverSettings(
            solver_type=SolutionMethod.BICGSTAB,
            iterations=50,
            preconditioner=PreconditionMethod.JACOBI,
        ),
    )
    state, history = solve_steady(
        mesh, table, settings, 1000.0, 0.001,
        state=initial_state(mesh), iterations=ITERATIONS,
        reporting_interval=ITERATIONS, verbose=False,
    )
    return history


def main():
    from orc_tpu.solver.simple import save_history

    history = build()
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    save_history(FIXTURE, history)
    import numpy as np

    with np.load(FIXTURE) as z:
        print(f"wrote {FIXTURE}:")
        for k in z.files:
            print(f"  {k}: {z[k].shape}")


if __name__ == "__main__":
    main()
