"""Batched per-frame PCA patches for annular algorithms.

The reference's annular PCA parallelizes ONE FRAME PER PROCESS
(pca_local.py:726-742 pool over ``do_pca_patch``), each worker building a
variable-size library (PA threshold + dPA truncation) and running a small
LAPACK SVD. On TPU all frames of a segment run as ONE vmapped batched SVD.

The trick making ragged libraries batchable: the principal components used
for projection are the top right singular vectors of the library matrix,
i.e. eigenvectors of libᵀlib = Σ_rows outer(row, row). Zero-ing excluded
rows leaves libᵀlib — and therefore the PCs and the projection — EXACTLY
unchanged. So per-frame libraries become fixed-shape boolean masks, and the
whole segment is one static-shape batched computation.

Frames whose library is smaller than ``ncomp`` are truncated per frame
(the reference's ``min(ncomp, lib_rows)`` in get_eigenvectors,
svd.py:696-698) by zeroing the surplus PC rows before projection.
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ["batched_pca_patch_residuals",
           "batched_pca_patch_residuals_gram",
           "resident_annulus_update"]


def _masked_top_v(lib, ncomp, method):
    """Top-ncomp right singular vectors of a (possibly zero-row-padded)
    library, guarded against division by zero singular values."""
    if method == "eigen":
        C = lib @ lib.T
        e, EV = jnp.linalg.eigh(C)
        pc = EV.T @ lib
        V = pc[::-1]
        S = jnp.sqrt(jnp.abs(e))[::-1]
        S = jnp.where(S == 0, 1.0, S)
        V = V / S[:, None]
        return V[:ncomp]
    else:  # 'lapack' and fallback
        U2, _, _ = jnp.linalg.svd(lib.T, full_matrices=False)
        return U2[:, :ncomp].T


@functools.partial(jax.jit, static_argnames=("ncomp", "method"))
def batched_pca_patch_residuals(matrix, matrix_emp, lib_masks, ncomp,
                                method="lapack", matrix_ref=None,
                                k_eff=None):
    """Per-frame PCA residuals over a segment matrix.

    Parameters
    ----------
    matrix : (n, p) — segment pixels per frame (scaled).
    matrix_emp : (n, p) — signal-subtracted version (same as matrix if no
        cube_sig).
    lib_masks : (n, n) bool — lib_masks[f, i] True if frame i belongs to
        frame f's PCA library.
    ncomp : int (static) — max number of PCs.
    matrix_ref : (m, p) or None — RDI library rows prepended to every
        frame's library.
    k_eff : (n,) int or None — per-frame effective number of PCs
        (min(ncomp, per-frame library rank bound)); surplus PC rows are
        zeroed before projecting.

    Returns
    -------
    residuals : (n, p); V_all : (n, ncomp, p) the per-frame PCs (surplus
    rows zeroed).
    """
    if k_eff is None:
        k_eff = jnp.full(matrix.shape[0], ncomp)

    def one(mask_row, curr, curr_emp, k):
        lib = matrix_emp * mask_row[:, None]
        if matrix_ref is not None:
            lib = jnp.concatenate([matrix_ref, lib], axis=0)
        V = _masked_top_v(lib, ncomp, method)
        comp_mask = (jnp.arange(ncomp) < k)[:, None]
        V = jnp.where(comp_mask, V, 0.0)
        transformed = curr_emp @ V.T
        reconstructed = transformed @ V
        return curr - reconstructed, V

    return jax.vmap(one)(lib_masks, matrix, matrix_emp, k_eff)


def _subspace_topk(Gm, ncomp, n_iter=30, oversample=8):
    """Top-ncomp eigenpairs of a batched SPD Gram via blocked subspace
    iteration + Rayleigh-Ritz — matmul-only (MXU-resident), replacing
    the batched QDWH eigh whose QR panels run at <1% MXU utilization.

    This is the Gram-space analogue of the reference's randomized SVD
    mode (reference svd.py:705-840, SvdMode.RANDSVD) with far more power
    iterations (30 vs sklearn's 2), re-orthonormalized every other step
    through a Cholesky solve, so the dominant subspace is converged well
    past f32 resolution for the spectra PCA libraries produce.

    Gm : (L, L) symmetric PSD (single matrix — vmap over the batch).
    Returns (e_top, U_top): (ncomp,), (L, ncomp), descending.
    """
    L = Gm.shape[-1]
    m = min(L, ncomp + oversample)
    # deterministic start: a fixed Gaussian sketch (same for every frame)
    R = jax.random.normal(jax.random.PRNGKey(7), (L, m), Gm.dtype)
    # normalize to keep powers of the spectral radius in range
    scale = jnp.maximum(jnp.max(jnp.abs(Gm)), 1e-30)
    A = Gm / scale

    def orth(B):
        # QR every step: subdominant columns decay like (lam_j/lam_1)^q
        # under raw powering, and a Cholesky-Gram orthonormalization
        # collapses once their norms hit the dtype floor
        Q, _ = jnp.linalg.qr(B)
        return Q

    B = orth(A @ R)
    B = jax.lax.fori_loop(0, n_iter, lambda _, b: orth(A @ b), B)
    T = B.T @ (A @ B)
    T = 0.5 * (T + T.T)
    e, W = jnp.linalg.eigh(T)                   # (m, m) — tiny
    e_top = e[::-1][:ncomp] * scale
    U_top = (B @ W)[:, ::-1][:, :ncomp]
    return e_top, U_top


@functools.partial(jax.jit, static_argnames=("ncomp", "method"))
def batched_pca_patch_residuals_gram(matrix, matrix_emp, lib_idx, lib_w,
                                     ncomp, k_eff=None, method="eigh"):
    """Scale path of :func:`batched_pca_patch_residuals`: identical
    per-frame PCA residuals computed entirely in Gram space.

    The masked formulation above is O(n^2 p) *per frame* (it re-forms the
    full library Gram under every frame's mask), which is fine at test
    scale (61 frames) but cubic-in-frames at the 1000x512x512 bench scale.
    This path exploits the reference's own max_frames_lib=200 truncation
    (reference derotation.py:483-494): every frame's library is at most L
    rows, so

    - the segment Gram ``G = M_emp @ M_emp.T`` is formed ONCE (n^2 p),
    - each frame's library Gram is an (L, L) GATHER ``G[idx_f, idx_f]``
      (padding rows carry weight 0, which leaves the eigendecomposition
      of the valid submatrix unchanged — same zero-row trick as above),
    - the projection coefficients come from Gram columns
      (``lib @ curr_emp = G[idx_f, f]``), never touching pixel space,
    - and all n reconstructions collapse into ONE scatter + (n, n) x
      (n, p) matmul: ``residuals = matrix - C @ matrix_emp`` where row f
      of C holds frame f's library combination weights.

    Per segment this is two n^2 p matmuls + n small (L, L) eigh's instead
    of n Gram formations — the same arithmetic the reference's per-worker
    LAPACK SVD performs, reorganized for the MXU.

    Parameters
    ----------
    matrix, matrix_emp : (n, p) — as in batched_pca_patch_residuals.
    lib_idx : (n, L) int — per-frame library row indices, padded
        arbitrarily (padding entries must have lib_w == 0).
    lib_w : (n, L) float — 1.0 for valid library rows, 0.0 for padding.
    ncomp : int (static) — max number of PCs.
    k_eff : (n,) int or None — per-frame effective number of PCs.

    Returns
    -------
    residuals : (n, p). (No V_all: the explicit (n, ncomp, p) PC stack is
    exactly what this path avoids materializing; callers needing PCs use
    the masked path.)
    """
    n = matrix.shape[0]
    if k_eff is None:
        k_eff = jnp.full(n, ncomp)

    G = matrix_emp @ matrix_emp.T                      # (n, n), n^2 p
    Gm_all = _gather_lib_grams(G, lib_idx)             # (n, L, L)

    def coeffs(Gm_raw, idx, w, f, k):
        Gm = Gm_raw * (w[:, None] * w[None, :])
        if method == "subspace":
            e_top, U_top = _subspace_topk(Gm, ncomp)
        else:
            e, EV = jnp.linalg.eigh(Gm)                # ascending
            # top-ncomp PCs: V_k = lib.T @ U_k/s_k with s_k = sqrt(e_k)
            e_top = e[::-1][:ncomp]
            U_top = EV[:, ::-1][:, :ncomp]
        U_top = U_top * w[:, None]                     # (L, ncomp)
        s = jnp.sqrt(jnp.abs(e_top))
        s = jnp.where(s == 0, 1.0, s)
        # transformed_k = curr_emp @ V_k = (U_k/s_k) . (lib @ curr_emp)
        #              = (U_k/s_k) . (G[idx, f] * w)
        g_col = G[idx, f] * w                          # (L,)
        t = (U_top / s[None, :]).T @ g_col             # (ncomp,)
        t = jnp.where(jnp.arange(ncomp) < k, t, 0.0)   # per-frame k_eff
        # reconstructed = sum_k t_k V_k = lib.T @ (U/s @ t)
        return (U_top / s[None, :]) @ t                # (L,) row weights

    c_all = jax.vmap(coeffs)(Gm_all, lib_idx, lib_w,
                             jnp.arange(n), k_eff)     # (n, L)
    C = jnp.zeros((n, n), matrix.dtype)
    C = C.at[jnp.arange(n)[:, None], lib_idx].add(c_all)
    return matrix - C @ matrix_emp


def _gather_lib_grams(G, lib_idx, chunk=256):
    """All per-frame library Grams ``Gm[f] = G[idx_f][:, idx_f]`` as one
    batched (n, L, L) tensor.

    The obvious two-axis gather ``G[idx[:, None], idx[None, :]]`` lowers
    to per-element loads on TPU (~0.5 s at n=1000, L=200 on v5e — the
    dominant non-eigh cost of the whole annulus). ``G`` is symmetric, so
    the same tensor is two MAJOR-AXIS row gathers with a transpose in
    between — all three layout-friendly block copies:

        R  = G[idx_f]                  # (L, n)  rows of G
        Gm = (R.T)[idx_f]              # (L, L)  rows of R.T = cols of R

    Chunked over frames to bound the (chunk*L, n) intermediate.
    """
    n, L = lib_idx.shape
    chunk = min(chunk, n)
    nch = -(-n // chunk)
    pad = nch * chunk - n
    idx_p = jnp.pad(lib_idx, ((0, pad), (0, 0)))

    def one_chunk(idx_c):                                  # (c, L)
        R = jnp.take(G, idx_c.reshape(-1), axis=0)         # (c*L, n)
        RT = jnp.swapaxes(R.reshape(-1, L, G.shape[0]), 1, 2)   # (c, n, L)
        return jnp.take_along_axis(RT, idx_c[:, :, None], axis=1)

    out = jax.lax.map(one_chunk, idx_p.reshape(nch, chunk, L))
    return out.reshape(nch * chunk, L, L)[:n]


@functools.partial(jax.jit, static_argnames=("ncomp", "method"),
                   donate_argnames=("cube_out",))
def resident_annulus_update(cube, cube_out, flat_idx, colmask, lib_idx,
                            lib_w, k_eff, ncomp, method="eigh"):
    """One annulus segment of the device-resident annular PCA: gather
    the segment pixels, run the Gram-path per-frame PCA, scatter the
    residuals — a single compiled program per (p_pad, L_pad) bucket.

    ``flat_idx`` holds FLATTENED pixel indices (yy * x + xx) padded to
    the bucket width with OUT-OF-BOUNDS values: the gather clamps them
    (and ``colmask`` zeroes the clamped columns so they cannot
    contribute to the Gram) while the scatter drops them (mode="drop").
    Flat 1-D indexing instead of the 2-D fancy ``cube[:, yy, xx]`` is a
    compile-time necessity: XLA lowers the 2-D form pathologically on
    TPU (~187 s to compile at 1000x512x512 vs 0.8 s flat — measured
    2026-08-20; it is also ~1.5x faster at runtime). The scatter uses
    ``set`` because the reference's last annulus overlaps the previous
    one (derotation.py:507-539 widens it to reach the frame edge) and
    the host path's assignment semantics let the later annulus win.
    """
    n, y, x = cube.shape
    seg = jnp.take(cube.reshape(n, y * x), flat_idx, axis=1,
                   mode="clip") * colmask[None, :]
    res = batched_pca_patch_residuals_gram(seg, seg, lib_idx, lib_w,
                                           ncomp, k_eff=k_eff,
                                           method=method)
    out = cube_out.reshape(n, y * x).at[:, flat_idx].set(res, mode="drop")
    return out.reshape(n, y, x)
