"""Annular NMF PSF subtraction.

TPU rebuild of vip_hci/psfsub/nmf_local.py: same annulus/segment machinery
as ``pca_annular``, with the per-patch factorization running on the jitted
multiplicative-update NMF (vip_tpu.ops.nmf) instead of sklearn + a fork
pool (nmf_local.py:346-360).
"""

from dataclasses import dataclass, field
from enum import Enum
from typing import List, Tuple, Union

import numpy as np

from ..config import (Collapse, HandleNeg, Imlib, Initsvd,
                      Interpolation, time_ini, timing)
from ..config.utils_param import resolve_algo_params
from ..ops.nmf import nmf_fit, nmf_transform
from ..preproc.derotation import (_define_annuli, _find_indices_adi,
                                  cube_derotate)
from ..preproc.parangles import check_pa_vector
from ..preproc.subsampling import cube_collapse
from ..var.shapes import get_annulus_segments, matrix_scaling
from ..var.shapes import resolve_n_segments

__all__ = ["nmf_annular", "NMF_ANNULAR_Params"]


def _nmf_batched_enabled():
    import os

    return os.environ.get("VIP_TPU_NMF_BATCHED", "1") == "1"


def _nmf_patches_batched(matrix_segm, angle_list, pa_thr, ncomp, max_iter,
                         init_svd, min_frames_lib, max_frames_lib,
                         handle_neg):
    """All per-frame NMF patches of one segment in ONE batched program
    (ops/nmf.nmf_patch_batched) instead of n serial sklearn-style fits —
    and, as important on CPU, ONE compile per segment shape instead of
    one per distinct per-frame library size.

    Libraries are built with the reference's PA-threshold + dPA
    truncation host logic, handle_neg applied per frame on the unpadded
    rows, then zero-row-padded to a shared L (exactly neutral — see
    ops/nmf._nndsvd_init_masked). Returns (residuals (n, p),
    recon (n, p), H_frame0 (k, p))."""
    from ..ops.nmf import nmf_patch_batched

    n, p = matrix_segm.shape
    libs = []
    msg = ("Too few frames left in the PCA library. Accepted indices "
           "length ({:.0f}) less than {:.0f}. Try decreasing either "
           "delta_rot or min_frames_lib.")
    for fr in range(n):
        if pa_thr != 0:
            idx = _find_indices_adi(angle_list, fr, pa_thr, truncate=True,
                                    max_frames=max_frames_lib)
            if len(idx) < min_frames_lib:
                raise RuntimeError(msg.format(len(idx), min_frames_lib))
            libs.append(np.asarray(idx))
        else:
            libs.append(np.arange(n))

    L = max(len(i) for i in libs)
    L_pad = 16 * ((L + 15) // 16)
    X = np.zeros((n, L_pad, p))
    row_valid = np.zeros((n, L_pad))
    curr = np.array(matrix_segm, dtype=float)
    for fr, idx in enumerate(libs):
        data_ref = np.array(matrix_segm[idx], dtype=float)
        if np.median(data_ref) < 0:
            raise ValueError("Mostly negative values in the cube")
        if handle_neg == "null":
            data_ref[data_ref < 0] = 0
        elif handle_neg == "subtr_min":
            data_ref -= np.amin(data_ref)
        X[fr, :len(idx)] = data_ref
        row_valid[fr, :len(idx)] = 1.0
    if handle_neg == "null":
        curr[curr < 0] = 0
    elif handle_neg == "subtr_min":
        curr -= np.amin(curr, axis=1, keepdims=True)
    # 'mask': the segment was pre-filtered to all-positive pixels, so the
    # per-frame mask logic of do_nmf_patch is a no-op here

    import jax.numpy as jnp

    recon, H_all = nmf_patch_batched(
        jnp.asarray(X), jnp.asarray(row_valid), jnp.asarray(curr),
        int(ncomp), max_iter=int(max_iter), variant=str(init_svd))
    recon = np.asarray(recon)
    residuals = np.asarray(matrix_segm, dtype=float) - recon
    return residuals, recon, np.asarray(H_all[0])


@dataclass
class NMF_ANNULAR_Params:
    """Parameters of ``nmf_annular`` (reference nmf_local.py:25-57)."""

    cube: np.ndarray = None
    angle_list: np.ndarray = None
    cube_ref: np.ndarray = None
    radius_int: int = 0
    fwhm: float = 4
    asize: int = 4
    n_segments: int = 1
    delta_rot: Union[float, Tuple[float]] = (0.1, 1)
    ncomp: int = 1
    init_svd: Enum = Initsvd.NNDSVD
    nproc: int = 1
    min_frames_lib: int = 2
    max_frames_lib: int = 200
    scaling: Enum = None
    imlib: Enum = Imlib.VIPFFT
    interpolation: Enum = Interpolation.LANCZOS4
    collapse: Enum = Collapse.MEDIAN
    full_output: bool = False
    verbose: bool = True
    theta_init: float = 0
    weights: List = None
    cube_sig: np.ndarray = None
    handle_neg: Enum = HandleNeg.MASK
    max_iter: int = 1000
    random_state: int = None
    nmf_args: dict = field(default_factory=lambda: {})


def nmf_annular(*all_args: List, **all_kwargs: dict):
    """NMF in concentric annuli (reference nmf_local.py:61-380)."""
    algo_params, rot_options = resolve_algo_params(
        NMF_ANNULAR_Params, all_args, all_kwargs)

    if algo_params.verbose:
        start_time = time_ini()

    array = np.asarray(algo_params.cube, dtype=float)
    if array.ndim != 3:
        raise TypeError("Input array is not a cube or 3d array")
    if array.shape[0] != algo_params.angle_list.shape[0]:
        raise TypeError("Input vector or parallactic angles has wrong length")

    n, y, _ = array.shape
    angle_list = check_pa_vector(algo_params.angle_list)
    n_annuli = int((y / 2 - algo_params.radius_int) / algo_params.asize)

    delta_rot = algo_params.delta_rot
    if isinstance(delta_rot, tuple):
        delta_rot = np.linspace(delta_rot[0], delta_rot[1], num=n_annuli)
    elif np.isscalar(delta_rot):
        delta_rot = [delta_rot] * n_annuli

    n_segments = algo_params.n_segments
    n_segments = resolve_n_segments(n_segments, n_annuli,
                                    algo_params.asize)

    if algo_params.verbose:
        print(f"N annuli = {n_annuli}, FWHM = {algo_params.fwhm:.3f}")
        print("NMF per annulus (or annular sectors):")

    handle_neg = str(getattr(algo_params.handle_neg, "value",
                             algo_params.handle_neg))
    init_svd = str(getattr(algo_params.init_svd, "value",
                           algo_params.init_svd))

    cube_out = np.zeros_like(array)
    cube_recon = np.zeros_like(array)
    H_comps = np.zeros([int(np.max(algo_params.ncomp)), y, array.shape[2]])
    strict = algo_params.cube_ref is not None

    for ann in range(n_annuli):
        if isinstance(algo_params.ncomp, (tuple, np.ndarray)):
            if len(algo_params.ncomp) == n_annuli:
                ncompann = algo_params.ncomp[ann]
            else:
                raise TypeError("If `ncomp` is a tuple, it must match the "
                                "number of annuli")
        else:
            ncompann = algo_params.ncomp

        n_segments_ann = n_segments[ann]
        pa_thr, inner_radius, ann_center = _define_annuli(
            angle_list, ann, n_annuli, algo_params.fwhm,
            algo_params.radius_int, algo_params.asize, delta_rot[ann],
            n_segments_ann, algo_params.verbose, strict)
        indices = get_annulus_segments(array[0], inner_radius,
                                       algo_params.asize, n_segments_ann,
                                       algo_params.theta_init)

        for j in range(n_segments_ann):
            yy, xx = indices[j]
            if handle_neg == "mask":
                npts = range(len(yy))
                if algo_params.cube_sig is not None:
                    keep = [i for i in npts if np.amin(
                        array[:, yy[i], xx[i]]
                        - np.abs(algo_params.cube_sig[:, yy[i], xx[i]])) > 0]
                else:
                    keep = [i for i in npts
                            if np.amin(array[:, yy[i], xx[i]]) > 0]
                yy = tuple(yy[i] for i in keep)
                xx = tuple(xx[i] for i in keep)
            matrix_segm = matrix_scaling(array[:, yy, xx],
                                         algo_params.scaling)
            matrix_segm_ref = None
            if algo_params.cube_ref is not None:
                matrix_segm_ref = matrix_scaling(
                    algo_params.cube_ref[:, yy, xx], algo_params.scaling)
            matrix_sig_segm = algo_params.cube_sig[:, yy, xx] \
                if algo_params.cube_sig is not None else None

            batched = (matrix_sig_segm is None and matrix_segm_ref is None
                       and str(init_svd).startswith("nndsvd")
                       and not algo_params.nmf_args
                       and _nmf_batched_enabled())
            if batched:
                res_b, recon_b, H0 = _nmf_patches_batched(
                    matrix_segm, angle_list, pa_thr, ncompann,
                    algo_params.max_iter, init_svd,
                    algo_params.min_frames_lib, algo_params.max_frames_lib,
                    handle_neg)
                for fr in range(n):
                    cube_out[fr][yy, xx] = res_b[fr]
                    cube_recon[fr][yy, xx] = recon_b[fr]
                for pp in range(int(np.max(algo_params.ncomp))):
                    if pp < H0.shape[0]:
                        H_comps[pp][yy, xx] = H0[pp]
                continue
            for fr in range(n):
                res = do_nmf_patch(
                    matrix_segm, fr, angle_list, algo_params.fwhm, pa_thr,
                    ann_center, ncompann, algo_params.max_iter,
                    algo_params.random_state, init_svd,
                    algo_params.min_frames_lib, algo_params.max_frames_lib,
                    matrix_segm_ref, matrix_sig_segm, handle_neg,
                    **algo_params.nmf_args)
                residuals, recon, H = res
                cube_out[fr][yy, xx] = residuals
                cube_recon[fr][yy, xx] = recon
                if fr == 0:
                    for pp in range(int(np.max(algo_params.ncomp))):
                        if pp < H.shape[0]:
                            H_comps[pp][yy, xx] = H[pp]

        if algo_params.verbose:
            timing(start_time)

    cube_der = cube_derotate(cube_out, angle_list, nproc=algo_params.nproc,
                             imlib=algo_params.imlib,
                             interpolation=algo_params.interpolation,
                             **rot_options)
    frame = cube_collapse(cube_der, mode=algo_params.collapse,
                          w=algo_params.weights)
    if algo_params.verbose:
        print("Done derotating and combining.")
        timing(start_time)
    if algo_params.full_output:
        return cube_out, cube_der, cube_recon, H_comps, frame
    return frame


def do_nmf_patch(matrix, frame, angle_list, fwhm, pa_threshold, ann_center,
                 ncomp, max_iter, random_state, init_svd, min_frames_lib,
                 max_frames_lib, matrix_ref, matrix_sig_segm, handle_neg,
                 **kwargs):
    """NMF for one frame patch (reference nmf_local.py:382-495)."""
    if pa_threshold != 0:
        indices_left = _find_indices_adi(angle_list, frame, pa_threshold,
                                         truncate=True,
                                         max_frames=max_frames_lib)
        msg = ("Too few frames left in the PCA library. Accepted indices "
               "length ({:.0f}) less than {:.0f}. Try decreasing either "
               "delta_rot or min_frames_lib.")
        try:
            if matrix_sig_segm is not None:
                data_ref = matrix[indices_left] - \
                    matrix_sig_segm[indices_left]
            else:
                data_ref = matrix[indices_left]
        except IndexError:
            if matrix_ref is None:
                raise RuntimeError(msg.format(0, min_frames_lib))
            data_ref = None
        if data_ref.shape[0] < min_frames_lib and matrix_ref is None:
            raise RuntimeError(msg.format(data_ref.shape[0], min_frames_lib))
    else:
        if matrix_sig_segm is not None:
            data_ref = matrix - matrix_sig_segm
        else:
            data_ref = matrix
    if matrix_ref is not None:
        if data_ref is not None:
            data_ref = np.vstack((matrix_ref, data_ref))
        else:
            data_ref = matrix_ref

    data_ref = np.array(data_ref, dtype=float)
    if np.median(data_ref) < 0:
        raise ValueError("Mostly negative values in the cube")
    zp = None
    if handle_neg == "null":
        data_ref[np.where(data_ref < 0)] = 0
    elif handle_neg == "subtr_min":
        data_ref -= np.amin(data_ref)
    else:  # 'mask'
        zp = np.nonzero(np.amin(data_ref, axis=0) > 0)

    curr_frame = matrix[frame]
    if matrix_sig_segm is not None:
        curr_frame_emp = matrix[frame] - matrix_sig_segm[frame]
    else:
        curr_frame_emp = curr_frame.copy()
    if handle_neg == "null":
        curr_frame_emp[np.where(curr_frame_emp < 0)] = 0
    elif handle_neg == "subtr_min":
        curr_frame_emp -= np.amin(curr_frame_emp)
    else:  # 'mask'
        zzp = np.nonzero(curr_frame_emp > 0)
        pos_p = np.intersect1d(zp[0], zzp[0])
        curr_frame_emp = curr_frame_emp[pos_p]
        data_ref = data_ref[:, pos_p]

    _, H, _ = nmf_fit(data_ref, int(ncomp), max_iter=max_iter, init=init_svd)
    H = np.asarray(H)
    W = np.asarray(nmf_transform(curr_frame_emp[np.newaxis, ...], H,
                                 max_iter=max_iter))
    reconstructed = np.dot(W, H)

    if handle_neg == "mask":
        recon = np.zeros(matrix.shape[1])
        recon[pos_p] = reconstructed
        reconstructed = recon.copy()
        H_tmp = np.zeros([int(ncomp), matrix.shape[1]])
        for pp in range(int(ncomp)):
            H_tmp[pp, pos_p] = H[pp]
        H = H_tmp.copy()
    residuals = curr_frame - reconstructed
    return residuals, reconstructed, H
