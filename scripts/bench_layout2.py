"""Layout experiment 2: (c,k) buffers PRODUCED inside a graph,
[C,K]-major vs [K,C]-major (compile-only memory analysis, no execution
— safe at sizes that OOM at runtime).

bench_layout.py showed jit-ARGUMENT matrices are layout-normalized on
entry (no speed difference). The 2048^2 OOM (BASELINE.md) comes from
buffers the graph itself materializes: gather outputs `face_vals[cf]`
and roll-stacks, which XLA lays out minor-dim-K, padding lanes K->128
(21.3x) / 3->128 (42x). This measures, per layout variant:

  - gather expansion of face arrays to (c,k) form,
  - an assembly-like fragment (neighbor rolls + flux + reduce),

printing argument/output/temp sizes from compile().memory_analysis().

Usage: python scripts/bench_layout2.py [nx] (default 2048 -> 4.2M cells)
"""

import os
import sys

os.environ.setdefault("JAX_ENABLE_X64", "1")
sys.path.insert(0, "/root/repo")


def analyze(name, fn, *args):
    import jax

    m = jax.jit(fn).lower(*args).compile().memory_analysis()
    gb = 1 / (1 << 30)
    print(
        f"{name:28s} args {m.argument_size_in_bytes*gb:7.2f} GiB  "
        f"out {m.output_size_in_bytes*gb:7.2f} GiB  "
        f"temp {m.temp_size_in_bytes*gb:7.2f} GiB"
    )
    return m


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/orc_tpu_jax_cache")
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    C = nx * nx
    K = 6
    F = 3 * C + 2 * nx  # ~ structured 2D box with z symmetry pair
    dt = jnp.float32
    print(f"backend: {jax.devices()}  C={C}  K={K}  F={F}  {dt.__name__}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    # Host-side index tables (structured-ish contents; values irrelevant
    # to layout assignment, shapes/dtypes are what matters).
    cf = jnp.asarray(rng.integers(0, F, size=(C, K)), jnp.int32)
    cfT = jnp.asarray(np.asarray(cf).T.copy())
    area = jnp.asarray(rng.standard_normal(F), dt)
    normal = jnp.asarray(rng.standard_normal((F, 3)), dt)
    normalT = jnp.asarray(np.asarray(normal).T.copy())
    p = jnp.asarray(rng.standard_normal(C), dt)
    vel = jnp.asarray(rng.standard_normal((C, 3)), dt)
    velT = jnp.asarray(np.asarray(vel).T.copy())
    offsets = (-nx, -1, 1, nx, 0, 0)

    # --- 1. gather expansion --------------------------------------------
    def expand_ck(cf, area, normal):
        a = area[cf]                      # [C,K]
        n = normal[cf]                    # [C,K,3]
        return a * 2.0, n * 2.0           # force materialization

    def expand_kc(cfT, area, normalT):
        a = area[cfT]                     # [K,C]
        n = normalT[:, cfT]               # [3,K,C]
        return a * 2.0, n * 2.0

    def expand_kc_T(cfT, area, normalT):
        # K-major gather, then logical transpose back to [C,K]/[C,K,3]
        # (checks whether XLA folds the transpose into a bitcast or
        # materializes a padded buffer).
        a = area[cfT].T                           # [C,K]
        n = jnp.transpose(normalT[:, cfT], (2, 1, 0))  # [C,K,3]
        return a * 2.0, n * 2.0

    def expand_kc_T_reduce(cfT, area, normalT, x):
        # transposed gathers feeding typical [C,K]-math: reduce axis=1
        a = area[cfT].T
        n = jnp.transpose(normalT[:, cfT], (2, 1, 0))
        s = jnp.sum(a[..., None] * n * x[:, None, :], axis=1)  # [C,3]
        return s

    analyze("expand [C,K]/[C,K,3]", expand_ck, cf, area, normal)
    analyze("expand [K,C]/[3,K,C]", expand_kc, cfT, area, normalT)
    analyze("expand KC-gather+T", expand_kc_T, cfT, area, normalT)
    analyze("expand KC+T+reduce", expand_kc_T_reduce, cfT, area, normalT, vel)

    # --- 2. assembly-like fragment: rolls + flux + masked reduce ---------
    def asm_ck(p, vel, area_ck, n_ck):
        # area_ck [C,K], n_ck [C,K,3]
        p_n = jnp.stack([jnp.roll(p, -d) if d else p for d in offsets], 1)
        v_n = jnp.stack(
            [jnp.roll(vel, -d, axis=0) if d else vel for d in offsets], 1
        )  # [C,K,3]
        vf = 0.5 * (vel[:, None, :] + v_n)
        flux = jnp.sum(vf * n_ck, axis=-1)        # [C,K]
        Fm = flux * area_ck
        a_nb = jnp.minimum(Fm, 0.0)               # [C,K]
        diag = jnp.sum(-a_nb + Fm, axis=1)        # [C]
        b = -jnp.sum(n_ck * (0.5 * (p[:, None] + p_n) * area_ck)[..., None], 1)
        return diag, a_nb, b

    def asm_kc(p, velT, area_kc, n_kc):
        # area_kc [K,C], n_kc [3,K,C], velT [3,C]
        p_n = jnp.stack([jnp.roll(p, -d) if d else p for d in offsets], 0)
        v_n = jnp.stack(
            [jnp.roll(velT, -d, axis=1) if d else velT for d in offsets], 1
        )  # [3,K,C]
        vf = 0.5 * (velT[:, None, :] + v_n)
        flux = jnp.sum(vf * n_kc, axis=0)         # [K,C]
        Fm = flux * area_kc
        a_nb = jnp.minimum(Fm, 0.0)               # [K,C]
        diag = jnp.sum(-a_nb + Fm, axis=0)        # [C]
        b = -jnp.sum(n_kc * (0.5 * (p[None] + p_n) * area_kc)[None], axis=1)
        return diag, a_nb, b

    area_ck = jnp.asarray(rng.standard_normal((C, K)), dt)
    n_ck = jnp.asarray(rng.standard_normal((C, K, 3)), dt)
    area_kc = jnp.asarray(np.asarray(area_ck).T.copy())
    n_kc = jnp.asarray(np.transpose(np.asarray(n_ck), (2, 1, 0)).copy())
    analyze("assembly [C,K]", asm_ck, p, vel, area_ck, n_ck)
    analyze("assembly [K,C]", asm_kc, p, velT, area_kc, n_kc)


if __name__ == "__main__":
    main()
