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

__all__ = ["batched_pca_patch_residuals"]


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
