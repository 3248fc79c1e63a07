"""Bisect the residual memory blowup inside diffusion/momentum assembly
at 2048^2 (compile-only)."""

import sys

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/orc_tpu_jax_cache")
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    dtype = jnp.float32

    from orc_tpu.models.cavity import cavity_case
    from orc_tpu.ops.fields import WALL, VELOCITY_INLET, device_bc, face_bc
    from orc_tpu.ops.layout import take

    mesh, table = cavity_case(n=nx, nz=1, lid_velocity=1.0, dtype=dtype)
    C, K = mesh.n_cells, mesh.max_faces_per_cell
    zc, zs, zv = device_bc(table, dtype=dtype)
    gb = 1 / (1 << 30)

    def analyze(name, fn, *args):
        try:
            m = jax.jit(fn).lower(*args).compile().memory_analysis()
            print(
                f"{name:28s} args {m.argument_size_in_bytes*gb:6.2f}  "
                f"out {m.output_size_in_bytes*gb:6.2f}  "
                f"temp {m.temp_size_in_bytes*gb:6.2f} GiB"
            )
        except Exception as e:
            msg = str(e)
            i = msg.find("Ran out of memory")
            print(f"{name:28s} OOM: {msg[i:i+60] if i>=0 else msg[:90]}")

    mu = 1e-3

    def core(m_):
        fbc = face_bc(m_, zc, zs, zv)
        cf = m_.cell_faces
        mk = m_.cell_face_mask
        code = take(fbc.code, cf)
        area = take(m_.face_area, cf)
        interior = take(m_.face_interior, cf) & mk
        d_bnd = mu * area / take(m_.face_dist_fo, cf)
        d_int = mu * area / take(m_.face_dist_on, cf)
        dirichlet = ((code == WALL) | (code == VELOCITY_INLET)) & mk
        d = jnp.where(interior, d_int, jnp.where(dirichlet, d_bnd, 0.0))
        return d, interior, dirichlet, cf, fbc

    analyze("diff: scalars only", lambda m_: core(m_)[:1], mesh)

    def diag_off(m_):
        d, interior, dirichlet, cf, fbc = core(m_)
        return jnp.sum(d, axis=1), jnp.where(interior, -d, 0.0)

    analyze("diff: diag+off", diag_off, mesh)

    def bvec(m_):
        d, interior, dirichlet, cf, fbc = core(m_)
        return jnp.sum(
            jnp.where(dirichlet[..., None], d[..., None] * take(fbc.vector, cf), 0.0),
            axis=1,
        )

    analyze("diff: b (vector gather)", bvec, mesh)

    def bvec_nogather(m_, vec_ck):
        d, interior, dirichlet, cf, fbc = core(m_)
        return jnp.sum(
            jnp.where(dirichlet[..., None], d[..., None] * vec_ck, 0.0), axis=1
        )

    rng = np.random.default_rng(0)
    vec_ck = jnp.asarray(rng.standard_normal((C, K, 3)), dtype)
    analyze("diff: b (vec as arg)", bvec_nogather, mesh, vec_ck)

    def bvec_zone_sel(m_):
        # zone_sel-style static where chain instead of the gather chain
        d, interior, dirichlet, cf, fbc = core(m_)
        zslot = take(m_.face_zone_slot, cf)
        out = jnp.broadcast_to(jnp.asarray(zv, dtype)[0], (C, K, 3))
        for z in range(1, len(table.zone_ids)):
            out = jnp.where((zslot == z)[..., None], jnp.asarray(zv, dtype)[z], out)
        return jnp.sum(
            jnp.where(dirichlet[..., None], d[..., None] * out, 0.0), axis=1
        )

    analyze("diff: b (zone_sel)", bvec_zone_sel, mesh)


if __name__ == "__main__":
    main()
