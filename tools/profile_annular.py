"""Stage-split profiling for the device-resident annular PCA path
(VERDICT r4 #2): where do the 1415 s at 1000x512x512 go?

Times, per representative annulus bucket (p_pad, L_pad):
  - segment gather + Gram formation (n^2 p)
  - per-frame (L, L) eigendecomposition: batched QDWH eigh vs the
    matmul-only subspace iteration (ops/annular.py _subspace_topk)
  - coefficient scatter + (n, n) x (n, p) reconstruction matmul
  - the full resident_annulus_update for both methods
plus the derotate+collapse tail. Run ON TPU (not under the test
conftest). Results feed docs/PROFILING.md's annular table.
"""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def t(fn, reps=2, label=""):
    out = fn()
    val = float(jnp.sum(out) if hasattr(out, "dtype") else 0.0)
    assert np.isfinite(val), label
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:55s} {best*1000:10.1f} ms", flush=True)
    return best


def main():
    n = int(os.environ.get("N", 1000))
    L = 200
    ncomp = 10
    rng = np.random.default_rng(0)

    from vip_tpu.ops.annular import (_subspace_topk,
                                     batched_pca_patch_residuals_gram,
                                     resident_annulus_update)

    # representative annulus: mid-radius bucket at 512^2 / asize=4
    for p_pad in (2048, 4096):
        seg = jnp.asarray(rng.standard_normal((n, p_pad)).astype(np.float32))

        # library index/weight tables like _pad_lib_arrays builds (window
        # exclusion + truncation to L nearest)
        lib_idx = np.zeros((n, L), np.int32)
        lib_w = np.ones((n, L), np.float32)
        for fr in range(n):
            idx = np.r_[max(0, fr - 110):max(0, fr - 10),
                        fr + 10:min(n, fr + 110)][:L]
            lib_idx[fr, :idx.size] = idx
            lib_w[fr, idx.size:] = 0.0
        lib_idx = jnp.asarray(lib_idx)
        lib_w = jnp.asarray(lib_w)
        k_eff = jnp.full(n, ncomp)

        gram = jax.jit(lambda m: m @ m.T)
        t(lambda: gram(seg), label=f"G = M M.T        (n={n}, p={p_pad})")

        G = gram(seg)

        def gather_libs(G):
            def one(idx, w):
                return G[idx[:, None], idx[None, :]] * (w[:, None] * w[None, :])
            return jax.vmap(one)(lib_idx, lib_w)

        gat = jax.jit(gather_libs)
        t(lambda: gat(G), label=f"per-frame (L,L) Gram gathers (L={L})")
        Gm = gat(G)

        eigh_b = jax.jit(lambda Gs: jax.vmap(jnp.linalg.eigh)(Gs)[0])
        t(lambda: eigh_b(Gm), label=f"batched QDWH eigh ({n}x{L}x{L})")

        sub_b = jax.jit(lambda Gs: jax.vmap(
            lambda g: _subspace_topk(g, ncomp)[0])(Gs))
        t(lambda: sub_b(Gm), label=f"batched subspace_topk ({n}x{L}x{L})")

        recon = jax.jit(lambda C, M: M - C @ M)
        C = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
        t(lambda: recon(C, seg), label=f"residual matmul (n,n)x(n,p)")

        full = jax.jit(lambda *a: batched_pca_patch_residuals_gram(
            *a, ncomp, k_eff=k_eff, method="eigh"))
        t(lambda: full(seg, seg, lib_idx, lib_w),
          label=f"full gram path, eigh     (p={p_pad})")
        full_s = jax.jit(lambda *a: batched_pca_patch_residuals_gram(
            *a, ncomp, k_eff=k_eff, method="subspace"))
        t(lambda: full_s(seg, seg, lib_idx, lib_w),
          label=f"full gram path, subspace (p={p_pad})")


if __name__ == "__main__":
    main()
