"""Pairwise frame differencing.

TPU rebuild of vip_hci/psfsub/framediff.py: per-annulus frame-similarity
matrix → most-similar pair (or median of ``n_similar``) subtraction →
derotate → collapse; annuli summed. The pool over annuli
(framediff.py:180-186) becomes a host loop with the derotation batched on
device.
"""

from dataclasses import dataclass
from enum import Enum
from typing import List

import numpy as np
from scipy.spatial.distance import cdist

from ..config import (Collapse, Imlib, Interpolation, Metric,
                      time_ini, timing)
from ..config.utils_param import resolve_algo_params
from ..preproc.derotation import (_define_annuli, _find_indices_adi,
                                  cube_derotate)
from ..preproc.parangles import check_pa_vector
from ..preproc.subsampling import cube_collapse
from ..var.shapes import get_annulus_segments
from .loci import _METRIC_MAP
from .utils_pca import pca_annulus

__all__ = ["frame_diff", "FRAME_DIFF_Params"]


@dataclass
class FRAME_DIFF_Params:
    """Parameters of ``frame_diff`` (reference framediff.py:24-50)."""

    cube: np.ndarray = None
    angle_list: np.ndarray = None
    fwhm: float = 4
    metric: Enum = Metric.MANHATTAN
    dist_threshold: int = 50
    n_similar: int = None
    delta_rot: float = 0.5
    radius_int: int = 2
    asize: int = 4
    ncomp: int = None
    imlib: Enum = Imlib.VIPFFT
    interpolation: Enum = Interpolation.LANCZOS4
    collapse: Enum = Collapse.MEDIAN
    nproc: int = 1
    verbose: bool = True
    debug: bool = False
    full_output: bool = False


def frame_diff(*all_args: List, **all_kwargs: dict):
    """Pairwise subtraction of the most-correlated frames per annulus
    (reference framediff.py:52-143)."""
    algo_params, rot_options = resolve_algo_params(
        FRAME_DIFF_Params, all_args, all_kwargs)

    cube = np.asarray(algo_params.cube, dtype=float)
    if algo_params.verbose:
        start_time = time_ini()

    y = cube.shape[1]
    if not algo_params.asize < y // 2:
        raise ValueError("asize is too large")

    angle_list = check_pa_vector(algo_params.angle_list)
    n_annuli = int((y / 2 - algo_params.radius_int) / algo_params.asize)
    if algo_params.verbose:
        if algo_params.ncomp is not None:
            print(f"{n_annuli} annuli. Performing annular PCA subtraction "
                  f"with {algo_params.ncomp} PCs and pair-wise subtraction:")
        else:
            print(f"{n_annuli} annuli. Performing pair-wise subtraction:")

    res = [
        _pairwise_ann(cube, ann, n_annuli, algo_params.fwhm, angle_list,
                      algo_params.delta_rot,
                      str(getattr(algo_params.metric, "value",
                                  algo_params.metric)),
                      algo_params.dist_threshold, algo_params.n_similar,
                      algo_params.radius_int, algo_params.asize,
                      algo_params.ncomp, algo_params.imlib,
                      algo_params.interpolation, algo_params.collapse,
                      algo_params.verbose, debug=algo_params.debug,
                      **rot_options)
        for ann in range(n_annuli)
    ]
    final_frame = np.sum(res, axis=0)

    if algo_params.verbose:
        print("Done processing annuli")
        timing(start_time)
    return final_frame


def _pairwise_ann(cube, ann, n_annuli, fwhm, angles, delta_rot, metric,
                  dist_threshold, n_similar, radius_int, asize, ncomp, imlib,
                  interpolation, collapse, verbose, debug=False,
                  **rot_options):
    """Pair-wise subtraction in one annulus (framediff.py:146-341)."""
    n_frames = cube.shape[0]

    pa_threshold, in_rad, ann_center = _define_annuli(
        angles, ann, n_annuli, fwhm, radius_int, asize, delta_rot, 1, verbose)
    if ncomp is not None:
        arrayin = pca_annulus(cube, None, ncomp, asize, ann_center,
                              svd_mode="lapack", scaling=None, collapse=None)
    else:
        arrayin = cube

    yy, xx = get_annulus_segments(cube[0], inner_radius=in_rad, width=asize,
                                  nsegm=1)[0]
    values = arrayin[:, yy, xx]

    mat_dists_ann_full = cdist(values, values,
                               metric=_METRIC_MAP.get(metric, metric))

    if pa_threshold > 0:
        mat_dists_ann = np.zeros_like(mat_dists_ann_full)
        for i in range(n_frames):
            ind_fr_i = _find_indices_adi(angles, i, pa_threshold, None, False)
            mat_dists_ann[i][ind_fr_i] = mat_dists_ann_full[i][ind_fr_i]
    else:
        mat_dists_ann = mat_dists_ann_full

    if debug:
        print(f"Done calculating the {metric} distance for annulus "
              f"{ann + 1}")

    threshold = np.percentile(mat_dists_ann[mat_dists_ann != 0],
                              dist_threshold)
    mat_dists_ann[mat_dists_ann > threshold] = np.nan
    mat_dists_ann[mat_dists_ann == 0] = np.nan
    if not mat_dists_ann[~np.isnan(mat_dists_ann)].size > 0:
        raise RuntimeError("No pairs left. Decrease thresholds")

    if debug:
        import matplotlib.pyplot as plt

        plt.figure(figsize=(5, 5))
        plt.imshow(mat_dists_ann, origin="lower",
                   interpolation="nearest")
        plt.colorbar()
        plt.title(f"Thresholded distance matrix, annulus {ann + 1}")
        plt.show()

    if n_similar is not None:
        if n_similar < 3:
            raise ValueError("n_similar must be >= 3 or None")
        cube_res = []
        angles_list = []
        for i in range(n_frames):
            vector = mat_dists_ann[i]
            if np.nansum(vector) == 0:
                continue
            order = np.argsort(vector)  # NaNs sort to the end
            valid = order[~np.isnan(vector[order])][:n_similar]
            res = values[i] - np.median(values[valid], axis=0)
            cube_res.append(res)
            angles_list.append(angles[i])
        angles_list = np.array(angles_list)
        cube_res = np.array(cube_res)
    else:
        ind = []
        for i in range(n_frames):
            vector = mat_dists_ann[i]
            if np.nansum(vector) == 0:
                continue
            j = int(np.nanargmin(vector))
            ind.append((i, j))
            ind.append((j, i))

        indices = np.array(sorted(ind, key=lambda t: t[0]), dtype=int)
        size = indices.shape[0]
        angles_list = np.array([angles[indices[i][0]] for i in range(size)])
        cube_res = np.zeros((size, yy.shape[0]))
        for i in range(size):
            cube_res[i] = values[indices[i][0]] - values[indices[i][1]]

    cube_out = np.zeros((cube_res.shape[0], cube.shape[1], cube.shape[2]))
    for i in range(cube_res.shape[0]):
        cube_out[i, yy, xx] = cube_res[i]

    cube_der = cube_derotate(cube_out, angles_list, imlib=imlib,
                             interpolation=interpolation, mask_val=0,
                             **rot_options)
    return cube_collapse(cube_der, collapse)
