"""PCA sky subtraction with data imputation ([REN23] boat/anchor masks).

Port of vip_hci/preproc/skysubtraction.py:36-259 — also the engine behind
``pca(..., mask_rdi=)``.
"""

import numpy as np

__all__ = ["cube_subtract_sky_pca"]


def cube_subtract_sky_pca(sci_cube, sky_cube, masks, ref_cube=None, ncomp=2,
                          full_output=False):
    """PCA-based sky subtraction with anchor/boat masks."""
    from ..psfsub.svd import svd_wrapper
    from ..var.shapes import prepare_matrix

    sci_cube = np.asarray(sci_cube, dtype=float)
    sky_cube = np.asarray(sky_cube, dtype=float)

    if sci_cube.shape[1] != sky_cube.shape[1] or \
            sci_cube.shape[2] != sky_cube.shape[2]:
        raise TypeError("Science and Sky frames sizes do not match")
    if ref_cube is not None:
        if sci_cube.shape[1] != ref_cube.shape[1] or \
                sci_cube.shape[2] != ref_cube.shape[2]:
            raise TypeError("Science and Reference frames sizes do not "
                            "match")
    if type(masks) not in (list, tuple):
        mask_anchor = masks
        mask_boat = np.ones(masks.shape)
    elif len(masks) != 2:
        raise TypeError("Science and Reference frames sizes do not match")
    else:
        mask_anchor, mask_boat = masks

    def _apply_mask(cube, mask):
        out = cube.copy()
        out[:, mask == 0] = 0
        return out

    sky_cube_masked = _apply_mask(sky_cube, mask_anchor)
    sky_anchor = sky_cube_masked.reshape(sky_cube.shape[0], -1)

    sci_cube_anchor = _apply_mask(sci_cube, mask_anchor)
    Msci_masked_anchor = prepare_matrix(sci_cube_anchor, scaling=None,
                                        verbose=False)

    sci_cube_boat = _apply_mask(sci_cube, mask_boat)
    Msci_masked = prepare_matrix(sci_cube_boat, scaling=None, verbose=False)

    sky_cube_boat = _apply_mask(sky_cube, mask_boat)
    sky_boat = sky_cube_boat.reshape(sky_cube.shape[0], -1)

    # principal components of the sky in the anchor region (KL trick)
    sky_kl = np.dot(sky_anchor, sky_anchor.T)
    Msky_kl = prepare_matrix(sky_kl, scaling=None, verbose=False)
    sky_pcs = svd_wrapper(Msky_kl, "lapack", sky_kl.shape[0], False)
    sky_pcs_kl = sky_pcs.reshape(sky_kl.shape[0], sky_kl.shape[1])

    sky_pc_anchor = np.dot(sky_pcs_kl, sky_anchor)
    sky_anchor_cube = sky_pc_anchor.reshape(sky_cube.shape)
    sky_boat_cube = np.dot(sky_pcs_kl, sky_boat).reshape(sky_cube.shape)

    # least-squares coefficients of each science frame on the anchor PCs,
    # then the optimal sky model on the boat region — the reference's
    # per-frame np.inner loops (skysubtraction.py:...) as two matmuls
    transf_sci = sky_pc_anchor @ Msci_masked_anchor.T

    Msky_pcs_anchor = prepare_matrix(sky_anchor_cube, scaling=None,
                                     verbose=False)
    mat_inv = np.linalg.inv(Msky_pcs_anchor @ Msky_pcs_anchor.T)
    transf_sci_scaled = mat_inv @ transf_sci

    sky_opt = np.einsum("ji,jyx->iyx", transf_sci_scaled[:ncomp],
                        sky_boat_cube[:ncomp])
    sci_cube_skysub = sci_cube_boat - sky_opt

    if ref_cube is not None:
        ref_cube = np.asarray(ref_cube, dtype=float)
        ref_cube_anchor = _apply_mask(ref_cube, mask_anchor)
        Mref_masked_anchor = prepare_matrix(ref_cube_anchor, scaling=None,
                                            verbose=False)
        ref_cube_boat = _apply_mask(ref_cube, mask_boat)

        transf_ref_scaled = mat_inv @ (sky_pc_anchor @ Mref_masked_anchor.T)
        ref_cube_skysub = ref_cube_boat - np.einsum(
            "ji,jyx->iyx", transf_ref_scaled[:ncomp],
            sky_boat_cube[:ncomp])

        if full_output:
            return (sci_cube_skysub, ref_cube_skysub, sky_anchor_cube,
                    sky_boat_cube, sky_opt)
        return sci_cube_skysub, ref_cube_skysub
    if full_output:
        return (sci_cube_skysub, sky_anchor_cube, sky_boat_cube, sky_opt)
    return sci_cube_skysub
