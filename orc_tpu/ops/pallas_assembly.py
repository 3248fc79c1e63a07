"""Fused momentum/pressure-correction assembly kernels (Pallas TPU).

Round-2 measurement (BASELINE.md): the SIMPLE step's assembly fusions
run at ~25% HBM efficiency at 9.4M cells — XLA materializes [C,K(,3)]
intermediates (fluxes, face pressures, coefficient scratch) between
fusion islands. These kernels compute an ENTIRE assembly pass per
VMEM-resident window: read the cell fields once (u, v, w, p, and —
scheme-dependent — grad p, the shared momentum diagonal, grad vel),
write only what the solver consumes (matrix diag/off + RHS), and keep
every per-(c,k) intermediate in registers/VMEM.

Scope (gated by callers via solver/simple._pallas_asm_spec):
- UNIFORM structured box meshes (UniformCKGeometry: per-column
  constant geometry, boundary-ness decidable from the cell index);
- momentum schemes UD / CD1 / TVD_DC (the shared-matrix set — see
  assembly.momentum_system; reference advection menu:
  discretization.rs:133-356);
- Linear / LinearWeighted face velocities AND Rhie-Chow
  (solver.rs:1051-1095); Linear / LinearWeighted / SecondOrder face
  pressures (solver.rs:1124-1147);
- implicit (Patankar) relaxation; the transient inertia term
  rho V/dt (phi - phi^n) as optional blocked inputs;
- WALL / SYMMETRY / VELOCITY_INLET / pressure-BC columns specialized
  statically per column from the zone constants.

The momentum matrix comes out in the SHARED form (diag [C], off [C,K]
— see assembly.momentum_system): UD/CD1/TVD_DC coefficients are
component-independent. Math is pinned against ck_momentum /
ck_pressure_correction / solver.fc by tests/test_pallas_assembly.py.

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
    kind: str  # "wall" | "symmetry" | "pressure" | "vinlet"
    zone: int  # zone slot (row of the traced bc-values array)


class AsmSpec(NamedTuple):
    """Static scheme selection for the fused kernels (one Mosaic
    compilation per distinct spec)."""

    scheme: str = "ud"  # "ud" | "cd1" | "tvd_dc"
    rc: bool = False  # Rhie-Chow face fluxes (else Linear[Weighted])
    p_so: bool = False  # SecondOrder face pressures (else Linear[W])
    psi: object = None  # static TVD limiter callable (tvd_dc only)
    vol: float = 0.0  # uniform cell volume (rc / FC d-coefficients)
    # Compute the Green-Gauss cell pressure gradient IN-KERNEL from the
    # p halo window (doubled halo + a flags plane) instead of streaming
    # XLA-computed grad-p planes — removes the separate gradient pass
    # and its fusion barrier (round-5; the reason the reference-default
    # CD1+SecondOrder+RhieChow config assembled at 40% of roofline).
    # Single-device only: the sharded slab partition keeps a 1-deep
    # ghost layer, but the in-kernel NEIGHBOR gradient needs p (and
    # interior flags) 2 layers deep — sharded runs stream grad-p planes
    # refreshed by ppermute instead (solver/simple._pallas_asm_spec).
    gg: bool = False


ACTIVE_BIT = 6  # flag bit marking real (non-padded) cells


def pack_flags(interior, mask):
    """[C] int32 per-cell flags: bit k = column k interior, bit 6 =
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


def _axis(col: ColumnSpec) -> int:
    """Static axis index of the column's unit normal."""
    return max(range(3), key=lambda i: abs(col.n_out[i]))


def _gp_axes(cols, spec: AsmSpec):
    """Axes whose grad-p component the kernels read (interior columns
    only — boundary faces never use gradient terms)."""
    if not (spec.rc or spec.p_so):
        return ()
    return tuple(sorted({_axis(c) for c in cols if c.offset != 0}))


def _gv_axes(cols, spec: AsmSpec):
    if spec.scheme != "tvd_dc":
        return ()
    return tuple(sorted({_axis(c) for c in cols if c.offset != 0}))


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


def _dot_n(u, v, w, n):
    """u*nx + v*ny + w*nz skipping statically-zero components."""
    nx, ny, nz = n
    acc = None
    for val, comp in ((u, nx), (v, ny), (w, nz)):
        if comp:
            t = val * comp if comp != 1.0 else val
            acc = t if acc is None else acc + t
    return acc


def _gg_eval(cols, spec, bufs, flb, hr, p_hr, br, bc_ref, zero):
    """Lazy in-kernel Green-Gauss CELL pressure gradient (Linear face
    pressures — exactly ck_ops.ck_pressure_gradient) evaluated at
    (axis, cell-offset d0) from the doubled-halo p window `bufs["p"]`
    and the flags plane `flb`; memoized per (axis, d0) so gp_c at d0=0
    is computed once for all columns. d0 ranges over {0} ∪ {column
    offsets}, so p reads reach at most 2·max|offset| — covered by the
    doubled p halo. Values at positions whose flags are padding (past
    the domain) are finite garbage masked out by the caller's
    `interior` selects."""
    cache = {}

    def gp(ax, d0):
        key = (ax, d0)
        if key in cache:
            return cache[key]
        fl = flb[hr : hr + br, :] if d0 == 0 else _shifted(flb, hr, br, d0)
        p_c = (
            bufs["p"][p_hr : p_hr + br, :]
            if d0 == 0
            else _shifted(bufs["p"], p_hr, br, d0)
        )
        acc = zero
        for k2, col2 in enumerate(cols):
            na2 = col2.n_out[ax]
            if not na2:
                continue  # statically zero contribution to this axis
            p_n = _shifted(bufs["p"], p_hr, br, d0 + col2.offset)
            i2 = ((fl >> k2) & 1) == 1
            if col2.kind == "pressure":
                p_b = jnp.zeros_like(p_c) + bc_ref[col2.zone, 3]
            else:
                p_b = p_c
            p_f = jnp.where(i2, 0.5 * (p_c + p_n), p_b)
            acc = acc + (na2 * col2.area / spec.vol) * p_f
        cache[key] = acc
        return acc

    return gp


def _momentum_kernel(
    cols, hr, br, fc, spec, gp_axes, gv_axes, transient, n_planes,
    params_ref, bc_ref, flags_ref,
    *refs,
):
    """Shared body for the parity and SIMPLE_FC momentum assemblies.

    `fc` (static): advect with the STORED [C,K] flux (an extra blocked
    VMEM input) instead of interpolating face velocities — the only
    difference between the two couplings' momentum systems
    (solver/fc.py: ck_momentum is called with F = state.flux * A * rho).

    `spec` (static) selects the advection scheme (UD/CD1/TVD_DC), the
    face-velocity model (Linear vs Rhie-Chow) and the face-pressure
    model (Linear vs SecondOrder); `transient` adds the implicit-Euler
    inertia term from blocked rv_dt / vel^n inputs.
    """
    idx = 0
    if transient:
        rvdt_ref, un_ref, vn_ref, wn_ref = refs[idx : idx + 4]
        idx += 4
    if fc:
        flux_ref = refs[idx]
        idx += 1
    hbm = refs[idx : idx + n_planes]
    diag_ref, off_ref, bu_ref, bv_ref, bw_ref = refs[idx + n_planes :]

    r = pl.program_id(0)
    start = pl.multiple_of(r * jnp.int32(br), br)
    p_hr = 2 * hr if spec.gg else hr  # gg: p halo covers 2-hop shifts
    halo_of = lambda n: p_hr if n == "p" else hr
    rho = params_ref[0, 0]
    mu = params_ref[0, 1]
    alpha = params_ref[0, 2]

    # Plane naming convention (must mirror _momentum_asm's build):
    names = ["u", "v", "w", "p"]
    if not spec.gg:
        names += [f"gp{a}" for a in gp_axes]
    if spec.rc and not fc:
        names += ["md"]
    names += [f"gv{i}{a}" for i in range(3) for a in gv_axes]
    assert len(names) == n_planes

    def body(*scoped):
        bufs = dict(zip(names, scoped[:n_planes]))
        flb = scoped[n_planes] if spec.gg else None
        sem = scoped[-1]
        for name, buf in bufs.items():
            Wn = br + 2 * halo_of(name) + 1
            dma = pltpu.make_async_copy(
                hbm[names.index(name)].at[pl.ds(start, Wn), :], buf, sem
            )
            dma.start()
            dma.wait()
        if spec.gg:
            # flags ride as a halo'd i32 plane: the in-kernel neighbor
            # gradient needs the NEIGHBOR cell's interior bits.
            dma = pltpu.make_async_copy(
                flags_ref.at[pl.ds(start, br + 2 * hr + 1), :], flb, sem
            )
            dma.start()
            dma.wait()
            flags = flb[hr : hr + br, :]
        else:
            flags = flags_ref[...]
        active = ((flags >> ACTIVE_BIT) & 1) == 1

        def ctr(name):
            h = halo_of(name)
            return bufs[name][h : h + br, :]

        u_c, v_c, w_c, p_c = ctr("u"), ctr("v"), ctr("w"), ctr("p")
        zero = jnp.zeros_like(u_c)
        one = jnp.ones_like(u_c)
        gp_eval = (
            _gg_eval(cols, spec, bufs, flb, hr, p_hr, br, bc_ref, zero)
            if spec.gg
            else None
        )

        if spec.rc and not fc:
            md_c = ctr("md")
            voa_c = spec.vol / md_c

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
            ax = _axis(col) if col.offset != 0 else None
            na = col.n_out[ax] if ax is not None else 0.0

            def nb(name):
                if col.offset == 0:
                    return ctr(name)
                return _shifted(bufs[name], halo_of(name), br, col.offset)

            p_n = nb("p")
            need_vn = (not fc) or spec.scheme == "tvd_dc"
            if need_vn:
                u_n, v_n, w_n = nb("u"), nb("v"), nb("w")
            if ax is not None and spec.gg and ax in gp_axes:
                gp_c = gp_eval(ax, 0)
                gp_n = gp_eval(ax, col.offset)
            elif ax is not None and f"gp{ax}" in names:
                gp_c = ctr(f"gp{ax}")
                gp_n = nb(f"gp{ax}")
            # --- face mass flow F ---
            if fc:
                # SIMPLE_FC: the conservative stored flux IS the face
                # flux (corrected through the p-matrix coefficients at
                # the end of the previous iteration).
                F = flux_ref[k] * (col.area * rho)
            else:
                if spec.rc:
                    # Rhie-Chow (interpolation.face_flux / ck_flux):
                    # 0.5 [ (v_c+v_n).n + (V/a_c+V/a_n)(p_c-p_n)/d_on
                    #       + (V/a_c gp_c + V/a_n gp_n).n ]
                    md_n = nb("md")
                    voa_n = spec.vol / md_n
                    term1 = _dot_n(u_c + u_n, v_c + v_n, w_c + w_n,
                                   col.n_out)
                    term2 = (
                        (voa_c + voa_n) * (p_c - p_n)
                        * (1.0 / col.dist_on)
                    )
                    term3 = (voa_c * gp_c + voa_n * gp_n) * na
                    vn_int = 0.5 * (term1 + term2 + term3)
                else:
                    # LinearWeighted == Linear on a uniform box.
                    vn_int = 0.5 * _dot_n(
                        u_c + u_n, v_c + v_n, w_c + w_n, col.n_out
                    )
                if col.kind == "pressure":
                    vn_bnd = _dot_n(u_c, v_c, w_c, col.n_out)
                elif col.kind == "vinlet":
                    vn_bnd = zero + _dot_n(
                        bc_ref[col.zone, 0],
                        bc_ref[col.zone, 1],
                        bc_ref[col.zone, 2],
                        col.n_out,
                    )
                else:  # wall / symmetry: no flux through the face
                    vn_bnd = zero
                flux = jnp.where(interior, vn_int, vn_bnd)
                F = flux * (col.area * rho)
            # --- advection coefficient (shared-matrix schemes) ---
            if spec.scheme == "cd1":
                a_nb = F * 0.5
            else:  # UD matrix (also the TVD_DC implicit matrix)
                a_nb = jnp.minimum(F, 0.0)
            d_int = mu * col.area / col.dist_on
            d_bnd = mu * col.area / col.dist_fo
            off_ref[k] = jnp.where(active & interior, a_nb - d_int, 0.0)
            # diag: -a_nb + F on every face + diffusion on interior /
            # Dirichlet-velocity faces (wall & symmetry boundary terms
            # are identically 0 since F == 0 there).
            dirichlet = col.kind in ("wall", "vinlet")
            d_b = d_bnd if dirichlet else 0.0
            diag = diag + jnp.where(
                interior, -a_nb + F + d_int, -a_nb + F + d_b
            )
            if dirichlet:
                # Dirichlet sources: (a_nb - F) * v_bc + d_bnd * v_bc
                # (the diffusion part rides DiffusionSystem.b in the
                # reference formulation). BC velocities come from the
                # TRACED zone table (no recompile on value changes).
                s_w = jnp.where(interior, 0.0, (a_nb - F) + d_bnd)
                bu = bu + s_w * bc_ref[col.zone, 0]
                bv = bv + s_w * bc_ref[col.zone, 1]
                bw = bw + s_w * bc_ref[col.zone, 2]
            # --- TVD deferred correction (ck_momentum TVD_DC) ---
            if spec.scheme == "tvd_dc" and col.offset != 0:
                up_c = F > 0
                e_on = na * col.dist_on  # grad.r_on = gv[.,ax]*na*d_on
                comps = ((u_c, u_n), (v_c, v_n), (w_c, w_n))
                accs = []
                for i, (x_c, x_n) in enumerate(comps):
                    gv_c = ctr(f"gv{i}{ax}")
                    gv_n = nb(f"gv{i}{ax}")
                    d_cd = x_n - x_c
                    delta = jnp.where(up_c, d_cd, -d_cd)
                    gdotr = jnp.where(up_c, gv_c * e_on, gv_n * (-e_on))
                    safe = jnp.where(delta == 0.0, one, delta)
                    rr = 2.0 * gdotr / safe - 1.0
                    corr = jnp.where(
                        delta == 0.0, zero, spec.psi(rr) * 0.5 * delta
                    )
                    accs.append(jnp.where(interior, F * corr, 0.0))
                bu = bu - accs[0]
                bv = bv - accs[1]
                bw = bw - accs[2]
            # --- pressure force: -n_out * p_f * area ---
            if col.kind == "pressure":
                p_bnd = jnp.full_like(p_c, bc_ref[col.zone, 3])
            else:
                p_bnd = p_c
            if spec.p_so and col.offset != 0:
                # SecondOrder (ck_face_pressure): p_f = 0.5[(p_c+p_n)
                # + gp_c.r_cf + gp_n.(r_cf - r_on)].
                e_c = na * col.dist_fo
                e_n = na * (col.dist_fo - col.dist_on)
                p_int = 0.5 * ((p_c + p_n) + gp_c * e_c + gp_n * e_n)
            else:
                p_int = 0.5 * (p_c + p_n)
            p_f = jnp.where(interior, p_int, p_bnd)
            pfA = p_f * col.area
            nxk, nyk, nzk = col.n_out
            if nxk:
                bu = bu - nxk * pfA
            if nyk:
                bv = bv - nyk * pfA
            if nzk:
                bw = bw - nzk * pfA

        if transient:
            # Implicit-Euler inertia: rho V/dt on the diagonal,
            # rho V/dt * vel^n on the RHS (ck_momentum `inertia`).
            rvdt = rvdt_ref[...]
            diag = diag + rvdt
            bu = bu + rvdt * un_ref[...]
            bv = bv + rvdt * vn_ref[...]
            bw = bw + rvdt * wn_ref[...]
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
            pltpu.VMEM((br + 2 * halo_of(nm) + 1, LANES), diag_ref.dtype)
            for nm in names
        ),
        *(
            (pltpu.VMEM((br + 2 * hr + 1, LANES), jnp.int32),)
            if spec.gg
            else ()
        ),
        pltpu.SemaphoreType.DMA,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cols", "spec", "interpret"),
)
def momentum_assembly(
    vel, p, bc_values, flags, cols: tuple, rho, mu,
    alpha, grad_p=None, mom_diag=None, grad_vel=None, inertia=None,
    spec: AsmSpec = AsmSpec(), interpret: bool = False,
):
    """Fused momentum assembly on a uniform box.

    vel [C,3], p [C] -> (diag [C], off [C,K], b [3,C]) in the shared-
    matrix form of assembly.momentum_system. `cols` is a tuple of
    ColumnSpec; `flags` [C] int32 from pack_flags; `bc_values` [Z,4]
    stacks the traced zone tables (vx, vy, vz, pressure); rho / mu /
    alpha are traced scalars. Scheme-dependent traced extras:
    `grad_p` [C,3] (rc / p_so), `mom_diag` [C] shared diagonal (rc),
    `grad_vel` [C,3,3] (tvd_dc), `inertia` = (rv_dt [C], vel_n [C,3]).
    """
    return _momentum_asm(
        vel, p, None, bc_values, flags, cols, rho, mu, alpha,
        grad_p, mom_diag, grad_vel, inertia, spec, interpret
    )


@functools.partial(
    jax.jit,
    static_argnames=("cols", "spec", "interpret"),
)
def fc_momentum_assembly(
    vel, p, flux, bc_values, flags, cols: tuple, rho, mu,
    alpha, grad_p=None, grad_vel=None, inertia=None,
    spec: AsmSpec = AsmSpec(), interpret: bool = False,
):
    """SIMPLE_FC fused momentum assembly: identical to
    momentum_assembly except advection uses the stored conservative
    [C,K] flux (solver/fc.py) instead of interpolated face
    velocities (so `mom_diag` is never needed)."""
    return _momentum_asm(
        vel, p, flux, bc_values, flags, cols, rho, mu, alpha,
        grad_p, None, grad_vel, inertia, spec, interpret
    )


def _halo_geometry(cols, C):
    H = max(abs(c.offset) for c in cols)
    hr = -(-H // LANES) if H else 1
    R = -(-C // LANES)
    n_blocks = -(-R // BLOCK_ROWS)
    Rp = n_blocks * BLOCK_ROWS
    Cp = Rp * LANES
    return hr, n_blocks, Rp, Cp


def _plane(x, hr, C, Cp, Rp, fill=0.0):
    return jnp.pad(
        jnp.pad(x, (0, Cp - C), constant_values=fill),
        (hr * LANES, (hr + 1) * LANES),
        constant_values=fill,
    ).reshape(Rp + 2 * hr + 1, LANES)


def _momentum_asm(
    vel, p, flux, bc_values, flags, cols, rho, mu, alpha,
    grad_p, mom_diag, grad_vel, inertia, spec, interpret
):
    fc = flux is not None
    if fc:
        # The FC flux predictor reads iteration-START grad p computed
        # in fc.py; keep the streamed-plane contract for FC kernels.
        spec = spec._replace(gg=False)
    transient = inertia is not None
    C = p.shape[0]
    K = len(cols)
    hr, n_blocks, Rp, Cp = _halo_geometry(cols, C)
    gp_axes = _gp_axes(cols, spec)
    gv_axes = _gv_axes(cols, spec)

    plane = functools.partial(_plane, hr=hr, C=C, Cp=Cp, Rp=Rp)

    planes = [plane(vel[:, 0]), plane(vel[:, 1]), plane(vel[:, 2]),
              _plane(p, hr=2 * hr, C=C, Cp=Cp, Rp=Rp)
              if spec.gg else plane(p)]
    if gp_axes and fc and not spec.p_so:
        gp_axes = ()  # FC momentum with Linear p never reads grad p
    elif gp_axes and not spec.gg:
        planes += [plane(grad_p[:, a]) for a in gp_axes]
    if spec.rc and not fc:
        planes.append(plane(mom_diag, fill=1.0))
    if gv_axes:
        planes += [
            plane(grad_vel[:, i, a])
            for i in range(3)
            for a in gv_axes
        ]
    n_planes = len(planes)

    kern = functools.partial(
        _momentum_kernel, tuple(cols), hr, BLOCK_ROWS, fc, spec,
        gp_axes, gv_axes, transient, n_planes,
    )
    if spec.gg:
        # Halo'd i32 flags plane (ANY memory, DMA'd like the field
        # planes): in-kernel gradients need neighbor-cell flag words.
        flags2 = jnp.pad(
            jnp.pad(flags, (0, Cp - C)),
            (hr * LANES, (hr + 1) * LANES),
        ).reshape(Rp + 2 * hr + 1, LANES)
    else:
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
    operands = [params, bc_values, flags2]
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
        pl.BlockSpec(memory_space=pl.ANY)
        if spec.gg
        else pl.BlockSpec(
            (BLOCK_ROWS, LANES),
            lambda r: (r, z32(r)),
            memory_space=pltpu.VMEM,
        ),
    ]
    if transient:
        rv_dt, vel_n = inertia
        blk = lambda x: jnp.pad(x, (0, Cp - C)).reshape(Rp, LANES)
        operands += [
            blk(rv_dt), blk(vel_n[:, 0]), blk(vel_n[:, 1]),
            blk(vel_n[:, 2]),
        ]
        in_specs += [out_block] * 4
    if fc:
        # [C,K] stored flux -> [K, Rp, LANES] blocked VMEM planes.
        fl = jnp.moveaxis(flux, -1, 0)  # [K, C]
        fl = jnp.pad(fl, ((0, 0), (0, Cp - C))).reshape(K, Rp, LANES)
        operands.append(fl)
        in_specs.append(kblock)
    operands += planes
    in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * n_planes
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
    cols, hr, br, spec, gp_axes, n_planes,
    params_ref, bc_ref, flags_ref,
    *refs,
):
    hbm = refs[:n_planes]
    diag_ref, off_ref, b_ref = refs[n_planes:]
    r = pl.program_id(0)
    start = pl.multiple_of(r * jnp.int32(br), br)
    p_hr = 2 * hr if spec.gg else hr
    halo_of = lambda n: p_hr if n == "p" else hr
    rho = params_ref[0, 0]

    names = ["u", "v", "w", "md"]
    if spec.rc:
        names += ["p"]
        if not spec.gg:
            names += [f"gp{a}" for a in gp_axes]
    assert len(names) == n_planes

    def body(*scoped):
        bufs = dict(zip(names, scoped[:n_planes]))
        flb = scoped[n_planes] if spec.gg else None
        sem = scoped[-1]
        for name, buf in bufs.items():
            Wn = br + 2 * halo_of(name) + 1
            dma = pltpu.make_async_copy(
                hbm[names.index(name)].at[pl.ds(start, Wn), :], buf, sem
            )
            dma.start()
            dma.wait()
        if spec.gg:
            dma = pltpu.make_async_copy(
                flags_ref.at[pl.ds(start, br + 2 * hr + 1), :], flb, sem
            )
            dma.start()
            dma.wait()
            flags = flb[hr : hr + br, :]
        else:
            flags = flags_ref[...]
        active = ((flags >> ACTIVE_BIT) & 1) == 1

        def ctr(name):
            h = halo_of(name)
            return bufs[name][h : h + br, :]

        u_c, v_c, w_c, md_c = ctr("u"), ctr("v"), ctr("w"), ctr("md")
        zero = jnp.zeros_like(u_c)
        gp_eval = (
            _gg_eval(cols, spec, bufs, flb, hr, p_hr, br, bc_ref, zero)
            if spec.gg
            else None
        )
        if spec.rc:
            p_c = ctr("p")
            voa_c = spec.vol / md_c
        diag = zero
        b = zero
        for k, col in enumerate(cols):
            interior = ((flags >> k) & 1) == 1
            ax = _axis(col) if col.offset != 0 else None
            na = col.n_out[ax] if ax is not None else 0.0

            def nb(name):
                if col.offset == 0:
                    return ctr(name)
                return _shifted(bufs[name], halo_of(name), br, col.offset)

            u_n, v_n, w_n, md_n = nb("u"), nb("v"), nb("w"), nb("md")
            term1 = _dot_n(u_c + u_n, v_c + v_n, w_c + w_n, col.n_out)
            if spec.rc and ax is not None:
                p_n = nb("p")
                if spec.gg:
                    gp_c = gp_eval(ax, 0)
                    gp_n = gp_eval(ax, col.offset)
                else:
                    gp_c = ctr(f"gp{ax}")
                    gp_n = nb(f"gp{ax}")
                voa_n = spec.vol / md_n
                term2 = (
                    (voa_c + voa_n) * (p_c - p_n) * (1.0 / col.dist_on)
                )
                term3 = (voa_c * gp_c + voa_n * gp_n) * na
                vn_int = 0.5 * (term1 + term2 + term3)
            else:
                vn_int = 0.5 * term1
            if col.kind == "pressure":
                vn_bnd = _dot_n(u_c, v_c, w_c, col.n_out)
            elif col.kind == "vinlet":
                vn_bnd = zero + _dot_n(
                    bc_ref[col.zone, 0],
                    bc_ref[col.zone, 1],
                    bc_ref[col.zone, 2],
                    col.n_out,
                )
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
            pltpu.VMEM((br + 2 * halo_of(nm) + 1, LANES), diag_ref.dtype)
            for nm in names
        ),
        *(
            (pltpu.VMEM((br + 2 * hr + 1, LANES), jnp.int32),)
            if spec.gg
            else ()
        ),
        pltpu.SemaphoreType.DMA,
    )


@functools.partial(
    jax.jit, static_argnames=("cols", "spec", "interpret")
)
def pc_assembly(
    vel, mom_diag, bc_values, flags, cols: tuple, rho,
    p=None, grad_p=None,
    spec: AsmSpec = AsmSpec(), interpret: bool = False,
):
    """Fused pressure-correction assembly on a uniform box.

    vel [C,3] (post-momentum), mom_diag [C] (SHARED momentum diagonal)
    -> (diag [C], off [C,K], b [C]) matching ck_pressure_correction.
    The RHS flux matches ck_flux with the configured face-velocity
    model: LinearWeighted (spec.rc False) or Rhie-Chow (spec.rc True,
    requiring `p` and `grad_p` from the ITERATION START — exactly what
    ck_simple_step feeds its flux2)."""
    # The non-RC pc kernel never reads p, so gg is meaningful only
    # under Rhie-Chow (schemes like UD+SecondOrder set spec.gg for the
    # momentum kernel alone).
    spec = spec._replace(gg=spec.gg and spec.rc)
    C = mom_diag.shape[0]
    K = len(cols)
    hr, n_blocks, Rp, Cp = _halo_geometry(cols, C)
    gp_axes = _gp_axes(cols, spec) if spec.rc else ()

    plane = functools.partial(_plane, hr=hr, C=C, Cp=Cp, Rp=Rp)
    planes = [plane(vel[:, 0]), plane(vel[:, 1]), plane(vel[:, 2]),
              plane(mom_diag, fill=1.0)]  # fill avoids 0-division
    if spec.rc:
        planes.append(
            _plane(p, hr=2 * hr, C=C, Cp=Cp, Rp=Rp)
            if spec.gg else plane(p)
        )
        if not spec.gg:
            planes += [plane(grad_p[:, a]) for a in gp_axes]
    n_planes = len(planes)

    kern = functools.partial(
        _pc_kernel, tuple(cols), hr, BLOCK_ROWS, spec, gp_axes, n_planes
    )
    if spec.gg:
        flags2 = jnp.pad(
            jnp.pad(flags, (0, Cp - C)),
            (hr * LANES, (hr + 1) * LANES),
        ).reshape(Rp + 2 * hr + 1, LANES)
    else:
        flags2 = jnp.pad(flags, (0, Cp - C)).reshape(Rp, LANES)
    params = jnp.stack(
        [jnp.asarray(rho, vel.dtype)] + [jnp.zeros((), vel.dtype)] * 3
    )[None, :]
    bc_values = jnp.asarray(bc_values, vel.dtype)
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
                bc_values.shape, lambda r: (z32(r), z32(r)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY)
            if spec.gg
            else pl.BlockSpec(
                (BLOCK_ROWS, LANES),
                lambda r: (r, z32(r)),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_planes,
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
    )(params, bc_values, flags2, *planes)
    return (
        diag.reshape(Cp)[:C],
        jnp.moveaxis(off.reshape(K, Cp)[:, :C], 0, -1),
        b.reshape(Cp)[:C],
    )


def _fc_pc_kernel(
    cols, hr, br, spec, gp_axes, n_planes,
    params_ref, bc_ref, flags_ref,
    *refs,
):
    """Fused SIMPLE_FC full-p continuity assembly (solver/fc.py:
    ck_flux_h + ck_d_coeffs + ck_fc_pressure_system in one pass).

    Differences from the parity _pc_kernel: the matrix coefficient is
    the Rhie-Chow damping d_f = 0.5 rho A (V/a_c + V/a_n)/dist (NOT the
    reference's rho A^2/a form), pressure columns close with a
    one-sided Dirichlet d_b and add d_b * p_BC to the RHS,
    prescribed-flux boundaries contribute NOTHING to the matrix, and
    the flux predictor flux_h is emitted ([K,...] output) for the
    conservative correction after the p-solve. With spec.rc the
    predictor is the Rhie-Chow flux WITHOUT its compact term2 (the
    pressure equation re-adds it — fc.face_flux_h)."""
    hbm = refs[:n_planes]
    diag_ref, off_ref, b_ref, fh_ref = refs[n_planes:]
    r = pl.program_id(0)
    start = pl.multiple_of(r * jnp.int32(br), br)
    W = br + 2 * hr + 1
    rho = params_ref[0, 0]
    vol = params_ref[0, 1]

    names = ["u", "v", "w", "md"]
    if spec.rc:
        names += [f"gp{a}" for a in gp_axes]
    assert len(names) == n_planes

    def body(*scoped):
        bufs = dict(zip(names, scoped[:-1]))
        sem = scoped[-1]
        for name, buf in bufs.items():
            dma = pltpu.make_async_copy(
                hbm[names.index(name)].at[pl.ds(start, W), :], buf, sem
            )
            dma.start()
            dma.wait()
        flags = flags_ref[...]
        active = ((flags >> ACTIVE_BIT) & 1) == 1

        def ctr(name):
            return bufs[name][hr : hr + br, :]

        u_c, v_c, w_c, md_c = ctr("u"), ctr("v"), ctr("w"), ctr("md")
        zero = jnp.zeros_like(u_c)
        diag = zero
        b = zero
        for k, col in enumerate(cols):
            interior = ((flags >> k) & 1) == 1
            ax = _axis(col) if col.offset != 0 else None
            na = col.n_out[ax] if ax is not None else 0.0

            def nb(name):
                if col.offset == 0:
                    return ctr(name)
                return _shifted(bufs[name], hr, br, col.offset)

            u_n, v_n, w_n, md_n = nb("u"), nb("v"), nb("w"), nb("md")
            # Flux predictor (fc.ck_flux_h): plain interpolated normal
            # velocity, plus — under Rhie-Chow — term3 only (term2 is
            # what the pressure equation replaces).
            term1 = _dot_n(u_c + u_n, v_c + v_n, w_c + w_n, col.n_out)
            if spec.rc and ax is not None:
                gp_c = ctr(f"gp{ax}")
                gp_n = nb(f"gp{ax}")
                voa_c = vol / md_c
                voa_n = vol / md_n
                term3 = (voa_c * gp_c + voa_n * gp_n) * na
                vn_int = 0.5 * (term1 + term3)
            else:
                vn_int = 0.5 * term1
            if col.kind == "pressure":
                vn_bnd = _dot_n(u_c, v_c, w_c, col.n_out)
            elif col.kind == "vinlet":
                vn_bnd = zero + _dot_n(
                    bc_ref[col.zone, 0],
                    bc_ref[col.zone, 1],
                    bc_ref[col.zone, 2],
                    col.n_out,
                )
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
            for _ in range(n_planes)
        ),
        pltpu.SemaphoreType.DMA,
    )


@functools.partial(
    jax.jit, static_argnames=("cols", "spec", "interpret")
)
def fc_pc_assembly(
    vel, mom_diag, bc_values, flags, cols: tuple, rho,
    grad_p=None, spec: AsmSpec = AsmSpec(), interpret: bool = False,
):
    """Fused SIMPLE_FC full-p continuity assembly on a uniform box.

    vel [C,3] (post-momentum), mom_diag [C] (shared momentum diagonal)
    -> (diag [C], off [C,K], b [C], flux_h [C,K]) matching
    fc.ck_flux_h / fc.ck_fc_pressure_system; the cell volume comes from
    spec.vol (uniform box). With spec.rc, `grad_p` is the iteration-
    start pressure gradient (fc.ck_flux_h's term3 input)."""
    spec = spec._replace(gg=False)  # FC kernels stream grad-p planes
    C = mom_diag.shape[0]
    K = len(cols)
    hr, n_blocks, Rp, Cp = _halo_geometry(cols, C)
    gp_axes = _gp_axes(cols, spec) if spec.rc else ()

    plane = functools.partial(_plane, hr=hr, C=C, Cp=Cp, Rp=Rp)
    planes = [plane(vel[:, 0]), plane(vel[:, 1]), plane(vel[:, 2]),
              plane(mom_diag, fill=1.0)]  # fill avoids 0-division
    if spec.rc:
        planes += [plane(grad_p[:, a]) for a in gp_axes]
    n_planes = len(planes)

    kern = functools.partial(
        _fc_pc_kernel, tuple(cols), hr, BLOCK_ROWS, spec, gp_axes,
        n_planes,
    )
    flags2 = jnp.pad(flags, (0, Cp - C)).reshape(Rp, LANES)
    params = jnp.stack(
        [jnp.asarray(rho, vel.dtype),
         jnp.asarray(spec.vol, vel.dtype)]
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
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_planes,
        out_specs=(out_block, kblock, out_block, kblock),
        interpret=interpret,
    )(params, bc_values, flags2, *planes)
    return (
        diag.reshape(Cp)[:C],
        jnp.moveaxis(off.reshape(K, Cp)[:, :C], 0, -1),
        b.reshape(Cp)[:C],
        jnp.moveaxis(fh.reshape(K, Cp)[:, :C], 0, -1),
    )


#: VMEM budget for the DMA'd halo windows + blocked outputs. v5e has
#: 16 MiB of VMEM per core; leave headroom for Mosaic's own scratch.
VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def vmem_estimate(cols, spec: AsmSpec, fc: bool, transient: bool) -> int:
    """Worst-case VMEM bytes of the momentum kernel (the widest of the
    three): n_planes halo windows + blocked ins/outs."""
    K = len(cols)
    H = max(abs(c.offset) for c in cols)
    hr = -(-H // LANES) if H else 1
    W = BLOCK_ROWS + 2 * hr + 1
    gg = spec.gg and not fc
    n_planes = 4
    if (spec.rc or spec.p_so) and not gg:
        n_planes += len(_gp_axes(cols, spec))
    if spec.rc and not fc:
        n_planes += 1
    n_planes += 3 * len(_gv_axes(cols, spec))
    extra = 0
    if gg:
        extra = 2 * hr + W  # doubled p halo + the i32 flags window
    blocked = 4 + K  # diag + 3 b + flags + off[K]
    if transient:
        blocked += 4
    if fc:
        blocked += 2 * K  # flux in + flux_h out
    return 4 * LANES * ((n_planes * W) + extra + blocked * BLOCK_ROWS)


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
        elif zt == FaceCondition.VELOCITY_INLET:
            kind = "vinlet"
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
