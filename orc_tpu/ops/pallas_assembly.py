"""Fused momentum/pressure-correction assembly kernels (Pallas TPU).

Round-2 measurement (BASELINE.md): the SIMPLE step's assembly fusions
run at ~25% HBM efficiency at 9.4M cells — XLA materializes [C,K(,3)]
intermediates (fluxes, face pressures, coefficient scratch) between
fusion islands. These kernels compute an ENTIRE assembly pass per
VMEM-resident window: read the cell fields once (u, v, w, p), write
only what the solver consumes (matrix diag/off + RHS), and keep every
per-(c,k) intermediate in registers/VMEM.

Scope (the production large-cavity configuration, gated by callers):
- UNIFORM structured box meshes (UniformCKGeometry: per-column
  constant geometry, boundary-ness decidable from the cell index);
- MomentumScheme.UD + Linear/LinearWeighted face velocities and
  pressures (on a uniform box Linear == LinearWeighted);
- implicit (Patankar) relaxation; WALL / SYMMETRY / pressure-BC
  columns specialized statically per column from the zone constants.

The momentum matrix comes out in the SHARED form (diag [C], off [C,K]
— see assembly.momentum_system): UD coefficients are component-
independent. Math is pinned against ck_momentum / ck_pressure_
correction by tests/test_pallas_assembly.py.

Layout mirrors ops/pallas_spmv.py: vectors are [R, 128] row-major
planes; a flat neighbor offset d = 128 q + s becomes two static lane
slices of a VMEM window holding [block + halo] rows. Inputs stay in
HBM (pl.ANY) and are DMA'd per block; outputs are blocked VMEM.

NOTE v5e: f32 only (XLA's x64-emulation cannot feed custom calls).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_ROWS = 256


class ColumnSpec(NamedTuple):
    """Static per-ELL-column description of a uniform box mesh."""

    offset: int  # flat neighbor index delta (0 for z columns of a 2D box)
    area: float
    n_out: tuple  # (nx, ny, nz) outward unit normal, column-constant
    dist_fo: float  # |x_face - x_c|
    dist_on: float  # interior |x_nbr - x_c|
    kind: str  # "wall" | "symmetry" | "pressure" (boundary behavior)
    zone: int  # zone slot (row of the traced bc-values array)


ACTIVE_BIT = 6  # flag bit marking real (non-padded) cells


def pack_flags(interior, mask):
    """[C] int8 per-cell flags: bit k = column k interior, bit 6 =
    active row. Runtime integer div/mod on cell indices does not lower
    on Mosaic (measured: RecursionError in _convert_helper), so
    boundary-ness ships as one byte per cell instead."""
    C, K = interior.shape
    assert K <= ACTIVE_BIT
    f = jnp.zeros((C,), jnp.int32)
    for k in range(K):
        f = f | (interior[:, k].astype(jnp.int32) << k)
    f = f | (mask.any(axis=1).astype(jnp.int32) << ACTIVE_BIT)
    # int32 (not int8): Mosaic rejects the int8 block load on v5e
    # ("failed to legalize operation 'func.return'"); 4 B/cell is still
    # ~3% of the kernel's traffic.
    return f


def _shifted(xb, hr, br, d):
    """Window rows [hr : hr+br] of xb shifted by flat offset d."""
    q, s = divmod(d, LANES)
    base = hr + q
    if s == 0:
        return xb[base : base + br, :]
    return jnp.concatenate(
        [xb[base : base + br, s:], xb[base + 1 : base + 1 + br, :s]],
        axis=1,
    )


def _momentum_kernel(
    cols, hr, br, fc,
    params_ref, bc_ref, flags_ref,
    u_hbm, v_hbm, w_hbm, p_hbm,
    *refs,
):
    """Shared body for the parity and SIMPLE_FC momentum assemblies.

    `fc` (static): advect with the STORED [C,K] flux (an extra blocked
    VMEM input) instead of re-interpolating face velocities — the only
    difference between the two couplings' momentum systems
    (solver/fc.py: ck_momentum is called with F = state.flux * A * rho).
    """
    if fc:
        flux_ref, diag_ref, off_ref, bu_ref, bv_ref, bw_ref = refs
    else:
        diag_ref, off_ref, bu_ref, bv_ref, bw_ref = refs
    r = pl.program_id(0)
    start = pl.multiple_of(r * jnp.int32(br), br)
    W = br + 2 * hr + 1
    rho = params_ref[0, 0]
    mu = params_ref[0, 1]
    alpha = params_ref[0, 2]

    def body(ub, vb, wb, pb, sem):
        for ref, buf in ((u_hbm, ub), (v_hbm, vb), (w_hbm, wb), (p_hbm, pb)):
            dma = pltpu.make_async_copy(
                ref.at[pl.ds(start, W), :], buf, sem
            )
            dma.start()
            dma.wait()
        flags = flags_ref[...]
        active = ((flags >> ACTIVE_BIT) & 1) == 1
        u_c = ub[hr : hr + br, :]
        v_c = vb[hr : hr + br, :]
        w_c = wb[hr : hr + br, :]
        p_c = pb[hr : hr + br, :]
        zero = jnp.zeros_like(u_c)
        one = jnp.ones_like(u_c)

        diag = zero
        bu = zero
        bv = zero
        bw = zero
        for k, col in enumerate(cols):
            interior = ((flags >> k) & 1) == 1
            # NOTE: keep every scalar expression anchored to an f32
            # operand — a pure-python-scalar jnp.where under x64 makes
            # an f64, which Mosaic cannot lower on v5e (measured:
            # RecursionError in _convert_helper).
            fint = jnp.where(interior, one, zero)
            nxk, nyk, nzk = col.n_out
            if col.offset != 0:
                p_n = _shifted(pb, hr, br, col.offset)
                if not fc:
                    u_n = _shifted(ub, hr, br, col.offset)
                    v_n = _shifted(vb, hr, br, col.offset)
                    w_n = _shifted(wb, hr, br, col.offset)
            else:
                u_n, v_n, w_n, p_n = u_c, v_c, w_c, p_c
            if fc:
                # SIMPLE_FC: the conservative stored flux IS the face
                # flux (corrected through the p-matrix coefficients at
                # the end of the previous iteration).
                F = flux_ref[k] * (col.area * rho)
            else:
                # Face flux (LinearWeighted == Linear on a uniform
                # box): interior 0.5 (v_c + v_n) . n; boundary per
                # column kind.
                vn_int = 0.5 * (
                    (u_c + u_n) * nxk
                    + (v_c + v_n) * nyk
                    + (w_c + w_n) * nzk
                )
                if col.kind == "pressure":
                    vn_bnd = u_c * nxk + v_c * nyk + w_c * nzk
                else:  # wall / symmetry: no flux through the face
                    vn_bnd = zero
                flux = jnp.where(interior, vn_int, vn_bnd)
                F = flux * (col.area * rho)
            # UD advection + diffusion.
            a_nb = jnp.minimum(F, 0.0)
            d_int = mu * col.area / col.dist_on
            d_bnd = mu * col.area / col.dist_fo
            off_k = fint * (a_nb - d_int)
            off_ref[k] = jnp.where(active, off_k, 0.0)
            # diag: -a_nb + F on real faces + diffusion.
            if col.kind == "wall":
                a_nb_bnd = jnp.minimum(F, 0.0)  # F == 0 at walls -> 0
                diag = diag + jnp.where(
                    interior, -a_nb + F + d_int, -a_nb_bnd + F + d_bnd
                )
                # Dirichlet sources: (a_nb - F) * v_bc + d_bnd * v_bc
                # (the diffusion part rides DiffusionSystem.b in the
                # reference formulation; both fold to d_bnd * v_bc at
                # F == 0). Wall velocities come from the TRACED zone
                # table (no recompile on BC value changes).
                s_w = jnp.where(interior, 0.0, (a_nb_bnd - F) + d_bnd)
                bu = bu + s_w * bc_ref[col.zone, 0]
                bv = bv + s_w * bc_ref[col.zone, 1]
                bw = bw + s_w * bc_ref[col.zone, 2]
            elif col.kind == "symmetry":
                diag = diag + jnp.where(interior, -a_nb + F + d_int, 0.0)
            else:  # pressure BC: advection a_p term, no diffusion
                diag = diag + jnp.where(
                    interior, -a_nb + F + d_int, -a_nb + F
                )
            # Pressure force: -n_out * p_f * area.
            if col.kind == "pressure":
                p_bnd = jnp.full_like(p_c, bc_ref[col.zone, 3])
            else:
                p_bnd = p_c
            p_f = jnp.where(interior, 0.5 * (p_c + p_n), p_bnd)
            pfA = p_f * col.area
            if nxk:
                bu = bu - nxk * pfA
            if nyk:
                bv = bv - nyk * pfA
            if nzk:
                bw = bw - nzk * pfA

        # Implicit (Patankar) relaxation + inactive padding rows.
        bu = bu + (1.0 - alpha) / alpha * diag * u_c
        bv = bv + (1.0 - alpha) / alpha * diag * v_c
        bw = bw + (1.0 - alpha) / alpha * diag * w_c
        diag = diag / alpha
        diag_ref[...] = jnp.where(active, diag, one)
        bu_ref[...] = jnp.where(active, bu, 0.0)
        bv_ref[...] = jnp.where(active, bv, 0.0)
        bw_ref[...] = jnp.where(active, bw, 0.0)

    pl.run_scoped(
        body,
        *(
            pltpu.VMEM((br + 2 * hr + 1, LANES), diag_ref.dtype)
            for _ in range(4)
        ),
        pltpu.SemaphoreType.DMA,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cols", "interpret"),
)
def momentum_assembly(
    vel, p, bc_values, flags, cols: tuple, rho, mu,
    alpha, interpret: bool = False,
):
    """Fused UD momentum assembly on a uniform box.

    vel [C,3], p [C] -> (diag [C], off [C,K], b [3,C]) in the shared-
    matrix form of assembly.momentum_system. `cols` is a tuple of
    ColumnSpec; `flags` [C] int8 from pack_flags; `bc_values` [Z,4]
    stacks the traced zone tables (vx, vy, vz, pressure); rho / mu /
    alpha are traced scalars.
    """
    return _momentum_asm(
        vel, p, None, bc_values, flags, cols, rho, mu, alpha, interpret
    )


@functools.partial(
    jax.jit,
    static_argnames=("cols", "interpret"),
)
def fc_momentum_assembly(
    vel, p, flux, bc_values, flags, cols: tuple, rho, mu,
    alpha, interpret: bool = False,
):
    """SIMPLE_FC fused momentum assembly: identical to
    momentum_assembly except advection uses the stored conservative
    [C,K] flux (solver/fc.py) instead of re-interpolated face
    velocities."""
    return _momentum_asm(
        vel, p, flux, bc_values, flags, cols, rho, mu, alpha, interpret
    )


def _momentum_asm(
    vel, p, flux, bc_values, flags, cols, rho, mu, alpha, interpret
):
    fc = flux is not None
    C = p.shape[0]
    K = len(cols)
    H = max(abs(c.offset) for c in cols)
    hr = -(-H // LANES) if H else 1
    R = -(-C // LANES)
    n_blocks = -(-R // BLOCK_ROWS)
    Rp = n_blocks * BLOCK_ROWS
    Cp = Rp * LANES

    def plane(x):
        return jnp.pad(
            jnp.pad(x, (0, Cp - C)), (hr * LANES, (hr + 1) * LANES)
        ).reshape(Rp + 2 * hr + 1, LANES)

    u_p = plane(vel[:, 0])
    v_p = plane(vel[:, 1])
    w_p = plane(vel[:, 2])
    p_p = plane(p)

    kern = functools.partial(
        _momentum_kernel, tuple(cols), hr, BLOCK_ROWS, fc
    )
    flags2 = jnp.pad(flags, (0, Cp - C)).reshape(Rp, LANES)
    params = jnp.stack(
        [jnp.asarray(rho, p.dtype), jnp.asarray(mu, p.dtype),
         jnp.asarray(alpha, p.dtype), jnp.zeros((), p.dtype)]
    )[None, :]
    bc_values = jnp.asarray(bc_values, p.dtype)
    z32 = lambda r: jnp.int32(0)
    out_block = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda r: (r, z32(r)), memory_space=pltpu.VMEM
    )
    kblock = pl.BlockSpec(
        (K, BLOCK_ROWS, LANES),
        lambda r: (z32(r), r, z32(r)),
        memory_space=pltpu.VMEM,
    )
    operands = [params, bc_values, flags2, u_p, v_p, w_p, p_p]
    in_specs = [
        # Explicit i32 index maps: a full-array VMEM spec
        # synthesizes i64 zero indices under jax_enable_x64, which
        # Mosaic fails to legalize ('func.return').
        pl.BlockSpec(
            (1, 4), lambda r: (z32(r), z32(r)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            bc_values.shape, lambda r: (z32(r), z32(r)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (BLOCK_ROWS, LANES),
            lambda r: (r, z32(r)),
            memory_space=pltpu.VMEM,
        ),
    ] + [pl.BlockSpec(memory_space=pl.ANY)] * 4
    if fc:
        # [C,K] stored flux -> [K, Rp, LANES] blocked VMEM planes.
        fl = jnp.moveaxis(flux, -1, 0)  # [K, C]
        fl = jnp.pad(fl, ((0, 0), (0, Cp - C))).reshape(K, Rp, LANES)
        operands.append(fl)
        in_specs.append(kblock)
    diag, off, bu, bv, bw = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((Rp, LANES), p.dtype),
            jax.ShapeDtypeStruct((K, Rp, LANES), p.dtype),
            jax.ShapeDtypeStruct((Rp, LANES), p.dtype),
            jax.ShapeDtypeStruct((Rp, LANES), p.dtype),
            jax.ShapeDtypeStruct((Rp, LANES), p.dtype),
        ),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=(
            out_block,
            kblock,
            out_block,
            out_block,
            out_block,
        ),
        interpret=interpret,
    )(*operands)
    diag = diag.reshape(Cp)[:C]
    off_ck = jnp.moveaxis(off.reshape(K, Cp)[:, :C], 0, -1)  # [C,K]
    b3 = jnp.stack(
        [bu.reshape(Cp)[:C], bv.reshape(Cp)[:C], bw.reshape(Cp)[:C]]
    )
    return diag, off_ck, b3


def _pc_kernel(
    cols, hr, br,
    params_ref, flags_ref,
    u_hbm, v_hbm, w_hbm, md_hbm,
    diag_ref, off_ref, b_ref,
):
    r = pl.program_id(0)
    start = pl.multiple_of(r * jnp.int32(br), br)
    W = br + 2 * hr + 1
    rho = params_ref[0, 0]

    def body(ub, vb, wb, mb, sem):
        for ref, buf in ((u_hbm, ub), (v_hbm, vb), (w_hbm, wb), (md_hbm, mb)):
            dma = pltpu.make_async_copy(
                ref.at[pl.ds(start, W), :], buf, sem
            )
            dma.start()
            dma.wait()
        flags = flags_ref[...]
        active = ((flags >> ACTIVE_BIT) & 1) == 1
        u_c = ub[hr : hr + br, :]
        v_c = vb[hr : hr + br, :]
        w_c = wb[hr : hr + br, :]
        md_c = mb[hr : hr + br, :]
        zero = jnp.zeros_like(u_c)
        diag = zero
        b = zero
        for k, col in enumerate(cols):
            interior = ((flags >> k) & 1) == 1
            nxk, nyk, nzk = col.n_out
            if col.offset != 0:
                u_n = _shifted(ub, hr, br, col.offset)
                v_n = _shifted(vb, hr, br, col.offset)
                w_n = _shifted(wb, hr, br, col.offset)
                md_n = _shifted(mb, hr, br, col.offset)
            else:
                u_n, v_n, w_n, md_n = u_c, v_c, w_c, md_c
            vn_int = 0.5 * (
                (u_c + u_n) * nxk + (v_c + v_n) * nyk + (w_c + w_n) * nzk
            )
            if col.kind == "pressure":
                vn_bnd = u_c * nxk + v_c * nyk + w_c * nzk
            else:
                vn_bnd = zero
            F2 = jnp.where(interior, vn_int, vn_bnd) * (col.area * rho)
            b = b - F2
            # Shared momentum diag: |md * n| == md for unit normals.
            a_face = 0.5 * (md_c + md_n)
            a_nb = (rho * col.area * col.area) / a_face
            a_bnd = (rho * col.area * col.area) / md_c * 0.5
            off_ref[k] = jnp.where(
                active & interior, -a_nb, 0.0
            )
            diag = diag + jnp.where(interior, a_nb, a_bnd)
        diag_ref[...] = jnp.where(active, diag, jnp.ones_like(diag))
        b_ref[...] = jnp.where(active, b, 0.0)

    pl.run_scoped(
        body,
        *(
            pltpu.VMEM((br + 2 * hr + 1, LANES), diag_ref.dtype)
            for _ in range(4)
        ),
        pltpu.SemaphoreType.DMA,
    )


@functools.partial(
    jax.jit, static_argnames=("cols", "interpret")
)
def pc_assembly(
    vel, mom_diag, flags, cols: tuple, rho,
    interpret: bool = False,
):
    """Fused pressure-correction assembly on a uniform box.

    vel [C,3] (post-momentum), mom_diag [C] (SHARED momentum diagonal)
    -> (diag [C], off [C,K], b [C]) matching ck_pressure_correction
    with LinearWeighted face fluxes.
    """
    C = mom_diag.shape[0]
    K = len(cols)
    H = max(abs(c.offset) for c in cols)
    hr = -(-H // LANES) if H else 1
    R = -(-C // LANES)
    n_blocks = -(-R // BLOCK_ROWS)
    Rp = n_blocks * BLOCK_ROWS
    Cp = Rp * LANES

    def plane(x, fill=0.0):
        return jnp.pad(
            jnp.pad(x, (0, Cp - C), constant_values=fill),
            (hr * LANES, (hr + 1) * LANES),
            constant_values=fill,
        ).reshape(Rp + 2 * hr + 1, LANES)

    u_p = plane(vel[:, 0])
    v_p = plane(vel[:, 1])
    w_p = plane(vel[:, 2])
    md_p = plane(mom_diag, fill=1.0)  # avoid 0-division in padding

    kern = functools.partial(_pc_kernel, tuple(cols), hr, BLOCK_ROWS)
    flags2 = jnp.pad(flags, (0, Cp - C)).reshape(Rp, LANES)
    params = jnp.stack(
        [jnp.asarray(rho, vel.dtype)] + [jnp.zeros((), vel.dtype)] * 3
    )[None, :]
    z32 = lambda r: jnp.int32(0)
    out_block = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda r: (r, z32(r)), memory_space=pltpu.VMEM
    )
    diag, off, b = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((Rp, LANES), vel.dtype),
            jax.ShapeDtypeStruct((K, Rp, LANES), vel.dtype),
            jax.ShapeDtypeStruct((Rp, LANES), vel.dtype),
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (1, 4), lambda r: (z32(r), z32(r)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (BLOCK_ROWS, LANES),
                lambda r: (r, z32(r)),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(
            out_block,
            pl.BlockSpec(
                (K, BLOCK_ROWS, LANES),
                lambda r: (z32(r), r, z32(r)),
                memory_space=pltpu.VMEM,
            ),
            out_block,
        ),
        interpret=interpret,
    )(params, flags2, u_p, v_p, w_p, md_p)
    return (
        diag.reshape(Cp)[:C],
        jnp.moveaxis(off.reshape(K, Cp)[:, :C], 0, -1),
        b.reshape(Cp)[:C],
    )


def _fc_pc_kernel(
    cols, hr, br,
    params_ref, bc_ref, flags_ref,
    u_hbm, v_hbm, w_hbm, md_hbm,
    diag_ref, off_ref, b_ref, fh_ref,
):
    """Fused SIMPLE_FC full-p continuity assembly (solver/fc.py:
    ck_flux_h + ck_d_coeffs + ck_fc_pressure_system in one pass).

    Differences from the parity _pc_kernel: the matrix coefficient is
    the Rhie-Chow damping d_f = 0.5 rho A (V/a_c + V/a_n)/dist (NOT the
    reference's rho A^2/a form), pressure columns close with a
    one-sided Dirichlet d_b and add d_b * p_BC to the RHS,
    prescribed-flux boundaries contribute NOTHING to the matrix, and
    the flux predictor flux_h is emitted ([K,...] output) for the
    conservative correction after the p-solve."""
    r = pl.program_id(0)
    start = pl.multiple_of(r * jnp.int32(br), br)
    W = br + 2 * hr + 1
    rho = params_ref[0, 0]
    vol = params_ref[0, 1]

    def body(ub, vb, wb, mb, sem):
        for ref, buf in ((u_hbm, ub), (v_hbm, vb), (w_hbm, wb), (md_hbm, mb)):
            dma = pltpu.make_async_copy(
                ref.at[pl.ds(start, W), :], buf, sem
            )
            dma.start()
            dma.wait()
        flags = flags_ref[...]
        active = ((flags >> ACTIVE_BIT) & 1) == 1
        u_c = ub[hr : hr + br, :]
        v_c = vb[hr : hr + br, :]
        w_c = wb[hr : hr + br, :]
        md_c = mb[hr : hr + br, :]
        zero = jnp.zeros_like(u_c)
        diag = zero
        b = zero
        for k, col in enumerate(cols):
            interior = ((flags >> k) & 1) == 1
            nxk, nyk, nzk = col.n_out
            if col.offset != 0:
                u_n = _shifted(ub, hr, br, col.offset)
                v_n = _shifted(vb, hr, br, col.offset)
                w_n = _shifted(wb, hr, br, col.offset)
                md_n = _shifted(mb, hr, br, col.offset)
            else:
                u_n, v_n, w_n, md_n = u_c, v_c, w_c, md_c
            # Flux predictor: plain interpolated face-normal velocity
            # (LINEAR == LINEAR_WEIGHTED on a uniform box; these
            # schemes carry no pressure term — fc.face_flux_h).
            vn_int = 0.5 * (
                (u_c + u_n) * nxk + (v_c + v_n) * nyk + (w_c + w_n) * nzk
            )
            if col.kind == "pressure":
                vn_bnd = u_c * nxk + v_c * nyk + w_c * nzk
            else:
                vn_bnd = zero
            fh = jnp.where(interior, vn_int, vn_bnd)
            fh_ref[k] = jnp.where(active, fh, 0.0)
            b = b - fh * (col.area * rho)
            # d coefficients (fc.ck_d_coeffs): |md n| == md for unit
            # normals; V/a == vol/md on the uniform box.
            d_int = (
                (0.5 * rho * col.area / col.dist_on)
                * (vol / md_c + vol / md_n)
            )
            off_ref[k] = jnp.where(active & interior, -d_int, 0.0)
            if col.kind == "pressure":
                d_bnd = (rho * col.area / col.dist_fo) * (vol / md_c)
                diag = diag + jnp.where(interior, d_int, d_bnd)
                p_bc = bc_ref[col.zone, 3]
                b = b + jnp.where(interior, 0.0, d_bnd * p_bc)
            else:
                # Prescribed-flux boundaries: no matrix contribution.
                diag = diag + jnp.where(interior, d_int, 0.0)
        diag_ref[...] = jnp.where(active, diag, jnp.ones_like(diag))
        b_ref[...] = jnp.where(active, b, 0.0)

    pl.run_scoped(
        body,
        *(
            pltpu.VMEM((br + 2 * hr + 1, LANES), diag_ref.dtype)
            for _ in range(4)
        ),
        pltpu.SemaphoreType.DMA,
    )


@functools.partial(
    jax.jit, static_argnames=("cols", "interpret")
)
def fc_pc_assembly(
    vel, mom_diag, cell_volume, bc_values, flags, cols: tuple, rho,
    interpret: bool = False,
):
    """Fused SIMPLE_FC full-p continuity assembly on a uniform box.

    vel [C,3] (post-momentum), mom_diag [C] (shared momentum diagonal),
    cell_volume (traced scalar — uniform box) ->
    (diag [C], off [C,K], b [C], flux_h [C,K]) matching
    fc.ck_flux_h / fc.ck_fc_pressure_system with LINEAR_WEIGHTED
    face velocities."""
    C = mom_diag.shape[0]
    K = len(cols)
    H = max(abs(c.offset) for c in cols)
    hr = -(-H // LANES) if H else 1
    R = -(-C // LANES)
    n_blocks = -(-R // BLOCK_ROWS)
    Rp = n_blocks * BLOCK_ROWS
    Cp = Rp * LANES

    def plane(x, fill=0.0):
        return jnp.pad(
            jnp.pad(x, (0, Cp - C), constant_values=fill),
            (hr * LANES, (hr + 1) * LANES),
            constant_values=fill,
        ).reshape(Rp + 2 * hr + 1, LANES)

    u_p = plane(vel[:, 0])
    v_p = plane(vel[:, 1])
    w_p = plane(vel[:, 2])
    md_p = plane(mom_diag, fill=1.0)  # avoid 0-division in padding

    kern = functools.partial(_fc_pc_kernel, tuple(cols), hr, BLOCK_ROWS)
    flags2 = jnp.pad(flags, (0, Cp - C)).reshape(Rp, LANES)
    params = jnp.stack(
        [jnp.asarray(rho, vel.dtype), jnp.asarray(cell_volume, vel.dtype)]
        + [jnp.zeros((), vel.dtype)] * 2
    )[None, :]
    bc_values = jnp.asarray(bc_values, vel.dtype)
    z32 = lambda r: jnp.int32(0)
    out_block = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda r: (r, z32(r)), memory_space=pltpu.VMEM
    )
    kblock = pl.BlockSpec(
        (K, BLOCK_ROWS, LANES),
        lambda r: (z32(r), r, z32(r)),
        memory_space=pltpu.VMEM,
    )
    diag, off, b, fh = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((Rp, LANES), vel.dtype),
            jax.ShapeDtypeStruct((K, Rp, LANES), vel.dtype),
            jax.ShapeDtypeStruct((Rp, LANES), vel.dtype),
            jax.ShapeDtypeStruct((K, Rp, LANES), vel.dtype),
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (1, 4), lambda r: (z32(r), z32(r)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                bc_values.shape, lambda r: (z32(r), z32(r)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (BLOCK_ROWS, LANES),
                lambda r: (r, z32(r)),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(out_block, kblock, out_block, kblock),
        interpret=interpret,
    )(params, bc_values, flags2, u_p, v_p, w_p, md_p)
    return (
        diag.reshape(Cp)[:C],
        jnp.moveaxis(off.reshape(K, Cp)[:, :C], 0, -1),
        b.reshape(Cp)[:C],
        jnp.moveaxis(fh.reshape(K, Cp)[:, :C], 0, -1),
    )


def column_specs(mesh, table) -> "tuple | None":
    """Build the static ColumnSpec tuple from a uniform mesh's
    ck_constants + zone table, or None when ineligible (non-uniform
    mesh, unsupported BC kinds, or periodic wrap columns)."""
    import numpy as np

    from orc_tpu.mesh.zones import FaceCondition

    if mesh.ck_constants is None or mesh.neighbor_offsets is None:
        return None
    int_slot, colc = mesh.ck_constants
    offsets = mesh.neighbor_offsets
    if len(colc) != len(offsets):
        return None
    # Box dims from the offsets: columns come in +/- pairs along axes.
    from orc_tpu.solver.gmg import infer_box_dims

    dims = infer_box_dims(offsets, mesh.n_cells)
    if dims is None:
        return None
    nx, ny, nz = dims
    strides = {1: 0, nx: 1, nx * ny: 2}
    slot_types = {}
    for zid, fz in table.zones.items():
        slot_types[table.slot_of_zone[zid]] = fz.zone_type
    cols = []
    for k, (off, (area, n_out, dist_fo, dist_on, zslot)) in enumerate(
        zip(offsets, colc)
    ):
        if abs(off) not in strides and off != 0:
            return None  # periodic wrap column: unsupported here
        zt = slot_types.get(int(zslot))
        if zt == FaceCondition.WALL:
            kind = "wall"
        elif zt == FaceCondition.SYMMETRY:
            kind = "symmetry"
        elif zt in (
            FaceCondition.PRESSURE_INLET,
            FaceCondition.PRESSURE_OUTLET,
        ):
            kind = "pressure"
        else:
            return None
        cols.append(
            ColumnSpec(
                offset=int(off),
                area=float(area),
                n_out=tuple(float(c) for c in n_out),
                dist_fo=float(dist_fo),
                dist_on=float(dist_on),
                kind=kind,
                zone=int(zslot),
            )
        )
    return tuple(cols)


def bc_value_table(zone_scalar, zone_vector):
    """[Z,4] traced (vx, vy, vz, pressure) rows from the device zone
    tables — the kernels read per-column rows with static indices."""
    return jnp.concatenate(
        [zone_vector, zone_scalar[:, None]], axis=1
    )
