"""Capture a jax.profiler device trace of the ck SIMPLE step and print
the top ops by total device time (no TensorBoard needed — parses the
trace protobuf/json artifacts directly).

Usage: python scripts/profile_trace.py [n] [iters]
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/orc_tpu_jax_cache")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from orc_tpu.models.cavity import cavity_case
    from orc_tpu.ops.assembly import diffusion_system
    from orc_tpu.ops.fields import device_bc, face_bc
    from orc_tpu.ops.ck_ops import build_ck_geometry, ck_bc, ck_diffusion
    from orc_tpu.solver.simple import _make_chunk_runner, initial_state
    from orc_tpu.utils.settings import (
        MatrixSolverSettings,
        MomentumScheme,
        NumericalSettings,
        PreconditionMethod,
        PressureInterpolation,
        RelaxationMode,
        SolutionMethod,
        VelocityInterpolation,
    )

    mesh, table = cavity_case(n=n, nz=1, lid_velocity=1.0, dtype=jnp.float32)
    rho, mu = 1.0, 1e-3
    settings = NumericalSettings(
        momentum=MomentumScheme.UD,
        pressure_interpolation=PressureInterpolation.LINEAR_WEIGHTED,
        velocity_interpolation=VelocityInterpolation.LINEAR_WEIGHTED,
        matrix_solver=MatrixSolverSettings(
            solver_type=SolutionMethod.BICGSTAB,
            iterations=50,
            preconditioner=PreconditionMethod.JACOBI,
        ),
        pressure_relaxation=0.1,
        momentum_relaxation=0.7,
        relaxation_mode=RelaxationMode.IMPLICIT,
    )
    zc, zs, zv = device_bc(table, dtype=mesh.dtype)
    fbc = face_bc(mesh, zc, zs, zv)
    diff = diffusion_system(mesh, fbc, jnp.asarray(mu, mesh.dtype))
    ck = build_ck_geometry(mesh, len(table.zone_ids))
    ck_diff = ck_diffusion(
        mesh, ck, ck_bc(ck, zc, zs, zv), jnp.asarray(mu, mesh.dtype)
    )
    # Profile the SHIPPED configuration: fused assembly kernels exactly
    # as solve_steady picks them (ORC_TPU_PALLAS_ASM=0 opts out).
    from orc_tpu.solver.simple import _pallas_asm_spec

    pallas_asm = _pallas_asm_spec(mesh, table, settings, ck)
    print(f"fused assembly kernels: {pallas_asm is not None}",
          file=sys.stderr)
    run = _make_chunk_runner(
        mesh, settings, diff, iters, {}, ck=ck, ck_diff=ck_diff,
        pallas_asm=pallas_asm, maybe_singular=False,
    )
    state = initial_state(mesh)
    state, _ = run(state, zc, zs, zv, rho, mu)
    _ = np.asarray(state.p[:8])
    print("warmup done", file=sys.stderr)

    trace_dir = "/tmp/orc_tpu_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        state, _ = run(state, zc, zs, zv, rho, mu)
        _ = np.asarray(state.p[:8])

    # Parse the trace-events json (perfetto format).
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace json found; files:", file=sys.stderr)
        for p in glob.glob(f"{trace_dir}/**/*", recursive=True):
            print(" ", p, file=sys.stderr)
        return
    with gzip.open(paths[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Device lanes: pid names containing "TPU"/"/device:".
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p for p, nm in pid_name.items()
        if "TPU" in nm or "Device" in nm or "device" in nm
    }
    from collections import defaultdict

    tot = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        d = float(e.get("dur", 0.0))
        name = e.get("name", "?")
        tot[name] += d
        cnt[name] += 1
        total += d
    print(f"pids: { {p: pid_name.get(p) for p in dev_pids} }",
          file=sys.stderr)
    print(f"total device-op time: {total/1e3:.1f} ms over {iters} iters")
    for name, d in sorted(tot.items(), key=lambda t: -t[1])[:25]:
        print(f"  {d/1e3:9.2f} ms  x{cnt[name]:<6d} {name[:100]}")


if __name__ == "__main__":
    main()
