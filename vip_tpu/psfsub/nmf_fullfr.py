"""Full-frame NMF PSF subtraction.

TPU rebuild of vip_hci/psfsub/nmf_fullfr.py. The sklearn NMF dependency is
replaced by the jitted multiplicative-update solver in ``vip_tpu.ops.nmf``
(same NNDSVD(a) init, same update rules and stopping criterion), keeping
the reference's negative-value handling modes and the per-frame
rotation-threshold path.
"""

from dataclasses import dataclass, field
from enum import Enum
from typing import List, Tuple

import numpy as np

from ..config import (Collapse, HandleNeg, Initsvd, time_ini,
                      timing)
from ..config.utils_param import resolve_algo_params, setup_parameters
from ..ops.nmf import nmf_fit, nmf_transform
from ..preproc.derotation import _compute_pa_thresh, _find_indices_adi, \
    cube_derotate
from ..preproc.subsampling import cube_collapse
from ..var.coords import dist, frame_center
from ..var.shapes import (mask_circle, matrix_scaling, prepare_matrix,
                          reshape_matrix)

__all__ = ["nmf", "NMF_Params"]


@dataclass
class NMF_Params:
    """Parameters of ``nmf`` (reference nmf_fullfr.py:32-58)."""

    cube: np.ndarray = None
    angle_list: np.ndarray = None
    cube_ref: np.ndarray = None
    ncomp: int = 1
    scaling: Enum = None
    max_iter: int = 10000
    random_state: int = None
    mask_center_px: int = None
    source_xy: Tuple[int] = None
    delta_rot: float = 1
    fwhm: float = 4
    init_svd: Enum = Initsvd.NNDSVD
    collapse: Enum = Collapse.MEDIAN
    full_output: bool = False
    verbose: bool = True
    cube_sig: np.ndarray = None
    handle_neg: Enum = HandleNeg.MASK
    nmf_args: dict = field(default_factory=lambda: {})


def nmf(*all_args: List, **all_kwargs: dict):
    """Non-negative matrix factorization PSF subtraction
    (reference nmf_fullfr.py:60-344)."""
    algo_params, rot_options = resolve_algo_params(
        NMF_Params, all_args, all_kwargs)

    array = np.asarray(algo_params.cube, dtype=float).copy()
    if array.ndim != 3:
        raise TypeError("Input array is not a cube or 3d array")
    n, y, x = array.shape

    if algo_params.verbose:
        start_time = time_ini()

    handle_neg = str(getattr(algo_params.handle_neg, "value",
                             algo_params.handle_neg))
    init_svd = str(getattr(algo_params.init_svd, "value",
                           algo_params.init_svd))

    matrix_ref = None
    matrix_sig = None
    yy = xx = None

    if handle_neg == "mask":
        if algo_params.mask_center_px:
            array = mask_circle(array, algo_params.mask_center_px)
        if algo_params.cube_sig is not None:
            yy, xx = np.where(
                np.amin(array - np.abs(algo_params.cube_sig), axis=0) > 0)
        else:
            yy, xx = np.where(np.amin(array, axis=0) > 0)
        H_tmp = np.zeros([algo_params.ncomp, y, x])
        if len(yy) > 0:
            matrix = matrix_scaling(array[:, yy, xx], algo_params.scaling)
            if algo_params.cube_ref is not None:
                matrix_ref = matrix_scaling(
                    algo_params.cube_ref[:, yy, xx], algo_params.scaling)
            if algo_params.cube_sig is not None:
                matrix_sig = algo_params.cube_sig[:, yy, xx]
        else:
            raise ValueError("Remove frame(s) with negative values")
    else:
        # test signal-subtracted values when a cube_sig is given
        probe = array if algo_params.cube_sig is None \
            else array - algo_params.cube_sig
        if handle_neg == "null":
            neg = probe < 0
            array[neg] = 0
            if algo_params.cube_sig is not None:
                algo_params.cube_sig[neg] = 0
        elif handle_neg == "subtr_min":
            array -= np.amin(probe)
        else:
            raise ValueError("Mode to handle neg. pixels not recognized")

        matrix = prepare_matrix(array, algo_params.scaling,
                                algo_params.mask_center_px, mode="fullfr",
                                verbose=algo_params.verbose)
        if algo_params.cube_ref is not None:
            matrix_ref = prepare_matrix(algo_params.cube_ref,
                                        algo_params.scaling,
                                        algo_params.mask_center_px,
                                        mode="fullfr",
                                        verbose=algo_params.verbose)
        if algo_params.cube_sig is not None:
            matrix_sig = prepare_matrix(algo_params.cube_sig,
                                        algo_params.scaling,
                                        algo_params.mask_center_px,
                                        mode="fullfr",
                                        verbose=algo_params.verbose)

    if algo_params.cube_sig is not None:
        residuals_cube = algo_params.cube_sig.copy()
    else:
        residuals_cube = np.zeros_like(array)

    if algo_params.source_xy is None:
        res = _project_subtract(matrix, matrix_ref, algo_params.ncomp,
                                algo_params.scaling,
                                algo_params.mask_center_px,
                                algo_params.verbose, True,
                                matrix_sig=matrix_sig,
                                max_iter=algo_params.max_iter,
                                random_state=algo_params.random_state,
                                init_svd=init_svd, **algo_params.nmf_args)
        if algo_params.verbose:
            timing(start_time)
        residuals, reconstructed, H = res
        recon_cube = residuals_cube.copy()
        if handle_neg == "mask":
            residuals_cube[:, yy, xx] = residuals
            if algo_params.full_output:
                recon_cube[:, yy, xx] = reconstructed
                H_tmp[:, yy, xx] = H
                H = H_tmp
        else:
            residuals_cube[:] = residuals.reshape((n, y, x))
            if algo_params.full_output:
                recon_cube = reshape_matrix(reconstructed, y, x)
                H = H.reshape(algo_params.ncomp, y, x)
    else:
        if algo_params.delta_rot is None or algo_params.fwhm is None:
            raise TypeError("Delta_rot or fwhm parameters missing. Needed "
                            "for the PA-based rejection of frames from the "
                            "library")
        recon_cube = np.zeros_like(algo_params.cube)
        yc, xc = frame_center(algo_params.cube[0], False)
        x1, y1 = algo_params.source_xy
        ann_center = dist(yc, xc, y1, x1)
        pa_thr = _compute_pa_thresh(ann_center, algo_params.fwhm,
                                    algo_params.delta_rot)
        mid_range = np.abs(np.amax(algo_params.angle_list)
                           - np.amin(algo_params.angle_list)) / 2
        if pa_thr >= mid_range - mid_range * 0.1:
            new_pa_th = float(mid_range - mid_range * 0.1)
            if algo_params.verbose:
                print(f"PA threshold {pa_thr:.2f} is too big, will be set "
                      f"to {new_pa_th:.2f}")
            pa_thr = new_pa_th

        for fr in range(n):
            ind = _find_indices_adi(algo_params.angle_list, fr, pa_thr)
            res = _project_subtract(matrix, matrix_ref, algo_params.ncomp,
                                    algo_params.scaling,
                                    algo_params.mask_center_px,
                                    algo_params.verbose, True, indices=ind,
                                    frame=fr, matrix_sig=matrix_sig,
                                    max_iter=algo_params.max_iter,
                                    random_state=algo_params.random_state,
                                    init_svd=init_svd,
                                    **algo_params.nmf_args)
            residuals, recon_frame, H = res
            if handle_neg == "mask":
                recon_cube[fr][yy, xx] = recon_frame
                residuals_cube[fr][yy, xx] = residuals
                if fr == n - 1 and algo_params.full_output:
                    for pp in range(algo_params.ncomp):
                        H_tmp[pp][yy, xx] = H[pp]
                    H = H_tmp
            else:
                recon_cube[fr] = recon_frame.reshape((y, x))
                residuals_cube[fr] = residuals.reshape((y, x))
                if fr == n - 1 and algo_params.full_output:
                    H = H.reshape(algo_params.ncomp, y, x)

    if algo_params.verbose:
        print("Done NMF with device multiplicative updates.")
        timing(start_time)

    residuals_cube_ = cube_derotate(residuals_cube, algo_params.angle_list,
                                    **rot_options)
    frame = cube_collapse(residuals_cube_, mode=algo_params.collapse)

    if algo_params.verbose:
        print("Done derotating and combining.")
        timing(start_time)
    if algo_params.full_output:
        return (H, recon_cube, residuals_cube, residuals_cube_, frame)
    return frame


def _project_subtract(matrix, matrix_ref, ncomp, scaling, mask_center_px,
                      verbose, full_output, indices=None, frame=None,
                      matrix_sig=None, max_iter=100, random_state=None,
                      init_svd="nndsvda", **kwargs):
    """NMF projection + subtraction (reference nmf_fullfr.py:345-480)."""
    matrix_emp = matrix.copy() if matrix_sig is None else matrix - matrix_sig

    per_frame = indices is not None and frame is not None
    if matrix_ref is not None:
        ref_lib = matrix_ref
    else:
        ref_lib = (matrix_emp[indices] if per_frame else matrix_emp).copy()

    if np.median(ref_lib) < 0:
        raise ValueError("Mostly negative values in the cube")
    ref_lib = np.where(ref_lib < 0, 0, ref_lib)
    if per_frame and ref_lib.shape[0] <= 10:
        raise RuntimeError("Less than 10 frames left in the PCA library"
                           ", Try decreasing the parameter delta_rot")

    # fit the basis on the library, project the empirical target, rebuild
    target = matrix_emp[frame][None] if per_frame else matrix_emp
    _, H, _ = nmf_fit(ref_lib, ncomp, max_iter=max_iter, init=init_svd)
    H = np.asarray(H)
    W = np.asarray(nmf_transform(target, H, max_iter=max_iter))
    reconstructed = W @ H
    raw = matrix[frame] if per_frame else matrix
    residuals = raw - reconstructed
    if full_output:
        return residuals, reconstructed, H
    return residuals
