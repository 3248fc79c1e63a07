"""Dump the optimized HLO of the ck SIMPLE chunk runner and print the
named fusions' bodies (to attribute profile_trace.py's top ops).

Usage: python scripts/probe_hlo.py [n] [names...]
"""

import re
import sys

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/orc_tpu_jax_cache")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
    names = sys.argv[2:] or [
        "fusion.142", "fusion.143", "fusion.140", "fusion.138",
        "fusion.144", "mul.1072",
    ]

    from orc_tpu.models.cavity import cavity_case
    from orc_tpu.ops.assembly import diffusion_system
    from orc_tpu.ops.fields import device_bc, face_bc
    from orc_tpu.ops.ck_ops import build_ck_geometry, ck_bc, ck_diffusion
    from orc_tpu.solver.simple import (
        _pallas_asm_spec,
        _run_scan,
        initial_state,
    )
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
    pallas_asm = _pallas_asm_spec(mesh, table, settings, ck)
    state = initial_state(mesh)

    lowered = jax.jit(
        _run_scan,
        static_argnames=(
            "settings", "n_steps", "n_colors", "use_ck", "pallas_asm",
            "maybe_singular", "use_fc",
        ),
    ).lower(
        mesh, diff, ck, ck_diff, state, zc, zs, zv, rho, mu, None, None,
        settings=settings, n_steps=10, n_colors=0, use_ck=True,
        pallas_asm=pallas_asm, maybe_singular=False, use_fc=False,
    )
    txt = lowered.compile().as_text()
    print(f"HLO: {len(txt)} chars", file=sys.stderr)
    with open("/tmp/hlo_runscan.txt", "w") as f:
        f.write(txt)
    # Print each requested computation's body (the fused_computation it
    # calls, or the instruction line itself).
    for nm in names:
        m = re.search(rf"^\s+%?{re.escape(nm)} = .*$", txt, re.M)
        if not m:
            print(f"--- {nm}: NOT FOUND")
            continue
        line = m.group(0)
        print(f"--- {nm}:\n{line[:600]}")
        cm = re.search(r"(?:calls|fusion)=%?([\w.\-]+)", line)
        if "fusion" in nm and cm:
            comp = cm.group(1)
            bm = re.search(
                rf"^%?{re.escape(comp)} .*?\n(.*?)^\}}", txt, re.M | re.S
            )
            if bm:
                body = bm.group(1)
                ops = re.findall(r"= (\S+?)[( ]", body)
                from collections import Counter

                print(f"    body ops: {Counter(ops).most_common(15)}")
                big = [
                    ln.strip()[:200]
                    for ln in body.splitlines()
                    if re.search(r"f32\[\d{7,}", ln)
                ]
                print(f"    {len(big)} big lines; first 12:")
                for ln in big[:12]:
                    print("      ", ln)


if __name__ == "__main__":
    main()
