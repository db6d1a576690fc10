"""LLSG — Local Low-rank + Sparse + Gaussian-noise decomposition ([GOM16]).

TPU rebuild of vip_hci/psfsub/llsg.py. The GoDec-style patch iteration
(`_patch_rlrps`, llsg.py:449-549) keeps its host control loop (few, small
iterations) with each SVD/BRP update running on device; segments of an
annulus share shapes and are processed together.
"""

from dataclasses import dataclass
from enum import Enum
from typing import List

import numpy as np
from scipy.linalg import qr

from ..config import (ALGO_KEY, AutoRankMode, Collapse, LowRankMode,
                      ThreshMode, time_ini, timing)
from ..config.utils_param import separate_kwargs_dict
from ..preproc.derotation import cube_derotate
from ..preproc.subsampling import cube_collapse
from ..var.filters import cube_filter_highpass
from ..var.shapes import get_annulus_segments
from .svd import get_eigenvectors, svd_wrapper

__all__ = ["llsg", "thresholding", "LLSG_Params"]


def _mad(x):
    """astropy median_absolute_deviation (unscaled)."""
    x = np.asarray(x)
    return np.median(np.abs(x - np.median(x)))


@dataclass
class LLSG_Params:
    """Parameters of ``llsg`` (reference llsg.py:36-67)."""

    cube: np.ndarray = None
    angle_list: np.ndarray = None
    fwhm: float = None
    rank: int = 10
    thresh: float = 1
    max_iter: int = 10
    low_rank_ref: bool = False
    low_rank_mode: Enum = LowRankMode.SVD
    auto_rank_mode: Enum = AutoRankMode.NOISE
    residuals_tol: float = 1e-1
    cevr: float = 0.9
    thresh_mode: Enum = ThreshMode.SOFT
    nproc: int = 1
    asize: int = None
    n_segments: int = 4
    azimuth_overlap: int = None
    radius_int: int = None
    random_seed: int = None
    high_pass: int = None
    collapse: Enum = Collapse.MEDIAN
    full_output: bool = False
    verbose: bool = True
    debug: bool = False


def llsg(*all_args: List, **all_kwargs: dict):
    """LLSG decomposition of an ADI cube (reference llsg.py:69-400)."""
    class_params, rot_options = separate_kwargs_dict(
        initial_kwargs=all_kwargs, parent_class=LLSG_Params)
    algo_params = None
    if ALGO_KEY in rot_options.keys():
        algo_params = rot_options[ALGO_KEY]
        del rot_options[ALGO_KEY]
    if algo_params is None:
        algo_params = LLSG_Params(*all_args, **class_params)

    if algo_params.cube.ndim != 3:
        raise TypeError("Input array is not a cube (3d array)")
    if not algo_params.cube.shape[0] == algo_params.angle_list.shape[0]:
        raise TypeError("Angle list vector has wrong length. It must equal "
                        "the number frames in the cube")

    low_rank_mode = str(getattr(algo_params.low_rank_mode, "value",
                                algo_params.low_rank_mode))
    if low_rank_mode == "brp":
        if algo_params.rank is None:
            raise ValueError("Auto rank only works with SVD low_rank_mode. "
                             "Set a value for the rank parameter")
        if algo_params.low_rank_ref:
            raise ValueError("Low_rank_ref only works with SVD "
                             "low_rank_mode")

    if algo_params.high_pass is not None:
        cube_init = cube_filter_highpass(algo_params.cube, "median-subt",
                                         median_size=19, verbose=False)
        cube_init = cube_filter_highpass(cube_init, "laplacian-conv",
                                         kernel_size=algo_params.high_pass,
                                         verbose=False)
    else:
        cube_init = np.asarray(algo_params.cube, dtype=float)

    if algo_params.verbose:
        start_time = time_ini()
    n, y, x = algo_params.cube.shape

    if algo_params.azimuth_overlap == 0:
        algo_params.azimuth_overlap = None
    if algo_params.radius_int is None:
        algo_params.radius_int = 0

    if algo_params.asize is None:
        annulus_width = int(np.ceil(2 * algo_params.fwhm))
    else:
        annulus_width = int(algo_params.asize)
    n_annuli = int((y / 2 - algo_params.radius_int) / annulus_width)

    if algo_params.n_segments is None:
        n_segments = [4 for _ in range(n_annuli)]
    elif isinstance(algo_params.n_segments, int):
        n_segments = [algo_params.n_segments] * n_annuli
    elif algo_params.n_segments == "auto":
        n_segments = [2, 3]
        ld = 2 * np.tan(360 / 4 / 2) * annulus_width
        for i in range(2, n_annuli):
            radius = i * annulus_width
            ang = np.rad2deg(2 * np.arctan(ld / (2 * radius)))
            n_segments.append(int(np.ceil(360 / ang)))
    else:
        n_segments = list(algo_params.n_segments)

    if algo_params.verbose:
        print(f"Annuli = {n_annuli}")

    if algo_params.azimuth_overlap is None:
        azimuth_overlap = 360
    else:
        azimuth_overlap = algo_params.azimuth_overlap
    n_rots = int(360 / azimuth_overlap)

    matrix_s = np.zeros((n_rots, n, y, x))
    if algo_params.full_output:
        matrix_l = np.zeros((n_rots, n, y, x))
        matrix_g = np.zeros((n_rots, n, y, x))

    if algo_params.verbose:
        print("Processing annulus: ")
    for ann in range(n_annuli):
        inner_radius = algo_params.radius_int + ann * annulus_width
        n_segments_ann = n_segments[ann]
        if algo_params.verbose:
            print(f"{ann + 1} : in_rad={inner_radius}, "
                  f"n_segm={n_segments_ann}")

        for i in range(n_rots):
            theta_init = i * azimuth_overlap
            indices = get_annulus_segments(algo_params.cube[0], inner_radius,
                                           annulus_width, n_segments_ann,
                                           theta_init)
            for j in range(n_segments_ann):
                patch = _decompose_patch(
                    cube_init, indices, j, n_segments_ann, algo_params.rank,
                    algo_params.low_rank_ref, low_rank_mode,
                    algo_params.thresh,
                    str(getattr(algo_params.thresh_mode, "value",
                                algo_params.thresh_mode)),
                    algo_params.max_iter,
                    str(getattr(algo_params.auto_rank_mode, "value",
                                algo_params.auto_rank_mode)),
                    algo_params.cevr, algo_params.residuals_tol,
                    algo_params.random_seed, debug=algo_params.debug,
                    full_output=algo_params.full_output)
                yy, xx = indices[j]
                if algo_params.full_output:
                    matrix_l[i, :, yy, xx] = patch[0]
                    matrix_s[i, :, yy, xx] = patch[1]
                    matrix_g[i, :, yy, xx] = patch[2]
                else:
                    matrix_s[i, :, yy, xx] = patch

    def derot_collapse(mat):
        ders = [cube_derotate(mat[k], algo_params.angle_list,
                              nproc=algo_params.nproc, **rot_options)
                for k in range(n_rots)]
        frames = [cube_collapse(d, mode=algo_params.collapse) for d in ders]
        return ders, cube_collapse(np.array(frames),
                                   mode=algo_params.collapse)

    list_s_array_der, frame_s = derot_collapse(matrix_s)
    if algo_params.full_output:
        list_l_array_der, frame_l = derot_collapse(matrix_l)
        list_g_array_der, frame_g = derot_collapse(matrix_g)

    if algo_params.verbose:
        print("")
        timing(start_time)

    if algo_params.full_output:
        return (list_l_array_der, list_s_array_der, list_g_array_der,
                frame_l, frame_s, frame_g)
    return frame_s


def _decompose_patch(cube_init, indices, i_patch, n_segments_ann, rank,
                     low_rank_ref, low_rank_mode, thresh, thresh_mode,
                     max_iter, auto_rank_mode, cevr, residuals_tol,
                     random_seed, debug=False, full_output=False):
    """One patch decomposition (reference llsg.py:401-448)."""
    j = i_patch
    yy, xx = indices[j]
    data_segm = cube_init[:, yy, xx]

    if low_rank_ref:
        ref_segments = list(range(n_segments_ann))
        ref_segments.pop(j)
        yy_ref = np.hstack([indices[m][0] for m in ref_segments])
        xx_ref = np.hstack([indices[m][1] for m in ref_segments])
        data_ref = cube_init[:, yy_ref, xx_ref]
    else:
        data_ref = data_segm

    return _patch_rlrps(data_segm, data_ref, rank, low_rank_ref,
                        low_rank_mode, thresh, thresh_mode, max_iter,
                        auto_rank_mode, cevr, residuals_tol, random_seed,
                        debug=debug, full_output=full_output)


def _patch_rlrps(array, array_ref, rank, low_rank_ref, low_rank_mode, thresh,
                 thresh_mode, max_iter, auto_rank_mode="noise", cevr=0.9,
                 residuals_tol=1e-2, random_seed=None, debug=False,
                 full_output=False):
    """GoDec/SSGoDec patch decomposition (reference llsg.py:449-549)."""
    L = array
    L_ref = array_ref.T if low_rank_ref else None
    S = np.zeros_like(L)
    random_state = np.random.RandomState(random_seed)
    itr = 0
    power = 0
    svdlib = "lapack"

    while itr <= max_iter:
        if low_rank_mode == "brp":
            Y2 = random_state.randn(L.shape[1], rank)
            for _ in range(power + 1):
                Y1 = np.dot(L, Y2)
                Y2 = np.dot(L.T, Y1)
            Q, _ = qr(Y2, mode="economic")
            Lnew = np.dot(np.dot(L, Q), Q.T)
        elif low_rank_mode == "svd":
            if itr == 0:
                PC = get_eigenvectors(rank, L, svdlib, mode=auto_rank_mode,
                                      cevr=cevr, noise_error=residuals_tol,
                                      data_ref=L_ref, debug=debug,
                                      collapse=True,
                                      scaling="temp-standard")
                rank = PC.shape[0]
                if low_rank_ref:
                    Lnew = np.dot(np.dot(PC, L).T, PC).T
                else:
                    Lnew = np.dot(np.dot(L, PC.T), PC)
            else:
                rank_i = min(rank, min(L.shape[0], L.shape[1]))
                PC = svd_wrapper(L, svdlib, rank_i, False,
                                 random_state=random_state)
                Lnew = np.dot(np.dot(L, PC.T), PC)
        else:
            raise RuntimeError("Low Rank estimation mode not recognized.")

        T = L - Lnew + S
        threshold = np.sqrt(_mad(T.ravel())) * thresh
        if debug:
            print(f"threshold = {threshold:.3f}")
        S = thresholding(T, threshold, thresh_mode)

        T = T - S
        L = Lnew + T
        itr += 1

    G = array - L - S
    L = L.T
    S = S.T
    G = G.T
    if full_output:
        return L, S, G
    return S


def thresholding(array, threshold, mode):
    """Thresholding strategies (reference llsg.py:552-579)."""
    x = array.copy()
    if mode == "soft":
        j = np.abs(x) <= threshold
        x[j] = 0
        k = np.abs(x) > threshold
        if np.isscalar(threshold):
            x[k] = x[k] - np.sign(x[k]) * threshold
        else:
            x[k] = x[k] - np.sign(x[k]) * threshold[k]
    elif mode == "hard":
        j = np.abs(x) < threshold
        x[j] = 0
    elif mode == "nng":
        j = np.abs(x) <= threshold
        x[j] = 0
        j = np.abs(x) > threshold
        x[j] = x[j] - threshold**2 / x[j]
    elif mode == "greater":
        j = x < threshold
        x[j] = 0
    elif mode == "less":
        j = x > threshold
        x[j] = 0
    else:
        raise RuntimeError("Thresholding mode not recognized")
    return x
