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

from ..config import (AutoRankMode, Collapse, LowRankMode,
                      ThreshMode, time_ini, timing)
from ..config.utils_param import resolve_algo_params
from ..preproc.derotation import cube_derotate
from ..preproc.subsampling import cube_collapse
from ..var.filters import cube_filter_highpass
from ..var.shapes import get_annulus_segments
from ..var.shapes import resolve_n_segments
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
    algo_params, rot_options = resolve_algo_params(
        LLSG_Params, all_args, all_kwargs)

    cube_nd = np.ndim(algo_params.cube)
    if cube_nd != 3:
        raise TypeError("Input array is not a cube (3d array)")
    if len(algo_params.angle_list) != len(algo_params.cube):
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

    start_time = time_ini() if algo_params.verbose else None
    n, y, x = algo_params.cube.shape
    radius_int = algo_params.radius_int or 0

    if algo_params.asize is None:
        annulus_width = int(np.ceil(2 * algo_params.fwhm))
    else:
        annulus_width = int(algo_params.asize)
    n_annuli = int((y / 2 - radius_int) / annulus_width)

    n_segments = resolve_n_segments(algo_params.n_segments, n_annuli,
                                    annulus_width, default=4)

    if algo_params.verbose:
        print(f"Annuli = {n_annuli}")

    azimuth_overlap = algo_params.azimuth_overlap or 360
    n_rots = int(360 / azimuth_overlap)

    # accumulators per decomposition term, one plane per azimuth rotation
    n_terms = 3 if algo_params.full_output else 1
    terms = np.zeros((n_terms, n_rots, n, y, x))

    if algo_params.verbose:
        print("Processing annulus: ")
    for ann in range(n_annuli):
        inner_radius = radius_int + ann * annulus_width
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
                # full_output order: (L, S, G); otherwise S alone
                for term, values in enumerate(
                        patch if algo_params.full_output else [patch]):
                    terms[term, i, :, yy, xx] = values

    def derot_collapse(mat):
        ders = [cube_derotate(mat[k], algo_params.angle_list,
                              nproc=algo_params.nproc, **rot_options)
                for k in range(n_rots)]
        frames = [cube_collapse(d, mode=algo_params.collapse) for d in ders]
        return ders, cube_collapse(np.array(frames),
                                   mode=algo_params.collapse)

    derotated = [derot_collapse(terms[t]) for t in range(n_terms)]

    if algo_params.verbose:
        print("")
        timing(start_time)
    if algo_params.full_output:
        (ders_l, frame_l), (ders_s, frame_s), (ders_g, frame_g) = derotated
        return ders_l, ders_s, ders_g, frame_l, frame_s, frame_g
    return derotated[0][1]


def _decompose_patch(cube_init, indices, i_patch, n_segments_ann, rank,
                     low_rank_ref, low_rank_mode, thresh, thresh_mode,
                     max_iter, auto_rank_mode, cevr, residuals_tol,
                     random_seed, debug=False, full_output=False):
    """One patch decomposition (reference llsg.py:401-448)."""
    yy, xx = indices[i_patch]
    data_segm = cube_init[:, yy, xx]

    if low_rank_ref:
        # reference library = every OTHER segment of this annulus
        others = [m for m in range(n_segments_ann) if m != i_patch]
        yy_ref = np.hstack([indices[m][0] for m in others])
        xx_ref = np.hstack([indices[m][1] for m in others])
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
    """GoDec/SSGoDec patch decomposition (same alternation as reference
    llsg.py:449-549): repeat { project the running estimate onto a rank-k
    subspace; shrink what the projection left behind into the sparse
    term; carry the unshrunk remainder forward }.
    """
    rng = np.random.RandomState(random_seed)
    power = 0

    def low_rank_brp(M):
        # bilateral random projection: sketch the row space, orthonormalize
        sketch = rng.randn(M.shape[1], rank)
        for _ in range(power + 1):
            sketch = M.T @ (M @ sketch)
        basis = qr(sketch, mode="economic")[0]
        return (M @ basis) @ basis.T

    def low_rank_svd_first(M):
        # auto-rank on the first pass (CEVR / noise-decay criterion)
        pcs = get_eigenvectors(rank, M, "lapack", mode=auto_rank_mode,
                               cevr=cevr, noise_error=residuals_tol,
                               data_ref=(array_ref.T if low_rank_ref
                                         else None),
                               debug=debug, collapse=True,
                               scaling="temp-standard")
        if low_rank_ref:
            return pcs.shape[0], ((pcs @ M).T @ pcs).T
        return pcs.shape[0], (M @ pcs.T) @ pcs

    def low_rank_svd(M):
        k = min(rank, *M.shape)
        pcs = svd_wrapper(M, "lapack", k, False, random_state=rng)
        return (M @ pcs.T) @ pcs

    if low_rank_mode not in ("brp", "svd"):
        raise RuntimeError("Low Rank estimation mode not recognized.")

    running = array
    sparse = np.zeros_like(array)
    for step in range(max_iter + 1):
        if low_rank_mode == "brp":
            lowrank = low_rank_brp(running)
        elif step == 0:
            rank, lowrank = low_rank_svd_first(running)
        else:
            lowrank = low_rank_svd(running)

        leftover = running - lowrank + sparse
        cut = np.sqrt(_mad(leftover.ravel())) * thresh
        if debug:
            print(f"threshold = {cut:.3f}")
        sparse = thresholding(leftover, cut, thresh_mode)
        running = lowrank + leftover - sparse

    noise = array - running - sparse
    if full_output:
        return running.T, sparse.T, noise.T
    return sparse.T


def thresholding(array, threshold, mode):
    """Elementwise shrinkage operators, vectorized (behavioral parity with
    reference llsg.py:552-579): 'soft'/'hard'/'nng' act on |x| vs the
    threshold, 'greater'/'less' are one-sided clips."""
    x = np.asarray(array)
    mag = np.abs(x)
    if mode == "soft":
        return np.where(mag <= threshold, 0.0,
                        x - np.sign(x) * threshold)
    if mode == "hard":
        return np.where(mag < threshold, 0.0, x)
    if mode == "nng":
        with np.errstate(divide="ignore", invalid="ignore"):
            shrunk = x - threshold ** 2 / x
        return np.where(mag <= threshold, 0.0, shrunk)
    if mode == "greater":
        return np.where(x < threshold, 0.0, x)
    if mode == "less":
        return np.where(x > threshold, 0.0, x)
    raise RuntimeError("Thresholding mode not recognized")
