"""Roll subtraction (JWST/HST two-roll-angle imaging).

Port of vip_hci/psfsub/rollsub.py:55-256 with derotations on device.
"""

from dataclasses import dataclass
from enum import Enum
from typing import List

import numpy as np

from ..config import Collapse, Imlib, Interpolation, time_ini, \
    timing
from ..config.utils_param import resolve_algo_params
from ..preproc.derotation import cube_derotate, frame_rotate
from ..preproc.subsampling import cube_collapse
from ..var.filters import cube_filter_lowpass, frame_filter_lowpass
from ..var.shapes import mask_circle

__all__ = ["roll_sub", "ROLL_SUB_Params"]


@dataclass
class ROLL_SUB_Params:
    """Parameters of ``roll_sub`` (reference rollsub.py:32-54)."""

    cube: np.ndarray = None
    angle_list: np.ndarray = None
    mode: str = "mean"
    imlib: Enum = Imlib.VIPFFT
    interpolation: Enum = Interpolation.LANCZOS4
    collapse: Enum = Collapse.MEAN
    smooth_ker_bef: float = 0.0
    smooth_ker_aft: float = 0.0
    mask_rad: float = 0.0
    cube_sig: np.ndarray = None
    nproc: int = 1
    full_output: bool = False
    verbose: bool = True


def roll_sub(*all_args: List, **all_kwargs: dict):
    """Roll subtraction of a two-roll-angle sequence
    (reference rollsub.py:55-256)."""
    algo_params, rot_options = resolve_algo_params(
        ROLL_SUB_Params, all_args, all_kwargs)

    angle_list = np.asarray(algo_params.angle_list, dtype=float)
    mang = np.mean(angle_list)
    if len(angle_list) == 2:
        ang1, ang2 = angle_list
    else:
        ang1 = np.mean(angle_list[np.where(angle_list <= mang)])
        ang2 = np.mean(angle_list[np.where(angle_list > mang)])

    if isinstance(algo_params.cube, tuple):
        nh1 = len(algo_params.cube[0])
        nh2 = len(algo_params.cube[1])
        ARRAY = np.concatenate((algo_params.cube[0], algo_params.cube[1]),
                               axis=0)
        angle_list = np.array([ang1] * nh1 + [ang2] * nh2)
    elif np.asarray(algo_params.cube).ndim == 3:
        ARRAY = np.asarray(algo_params.cube, dtype=float).copy()
        nfr = ARRAY.shape[0]
        nh1 = nfr // 2
        nh2 = nfr - nfr // 2
        if len(angle_list) != nfr:
            if len(angle_list) == 2:
                angle_list = np.array([ang1] * nh1 + [ang2] * nh2)
            else:
                raise ValueError(f"Input angle_list has wrong length (should"
                                 f" be 2 or {nfr}")
    else:
        raise TypeError("Input array is not a 3d array or tuple of 2 3d "
                        "arrays")

    if algo_params.verbose:
        start_time = time_ini()

    cube = ARRAY.copy()
    if np.isscalar(algo_params.smooth_ker_bef):
        if algo_params.smooth_ker_bef > 0:
            cube = cube_filter_lowpass(ARRAY.copy(),
                                       fwhm_size=algo_params.smooth_ker_bef)
    elif algo_params.smooth_ker_bef.ndim == 2:
        cube = cube_filter_lowpass(ARRAY.copy(), mode="psf",
                                   psf=algo_params.smooth_ker_bef)

    if algo_params.cube_sig is not None:
        cube_ref = cube - algo_params.cube_sig
    else:
        cube_ref = cube.copy()

    idx1 = np.where(angle_list <= mang)
    idx2 = np.where(angle_list > mang)

    if algo_params.mode == "individual":
        if nh1 != nh2:
            raise ValueError("In 'individual' mode, the same number of "
                             "images is required for both roll angles.")
        cube1 = cube[idx1]
        cube2 = cube[idx2]
        arr1 = cube_ref[idx1]
        arr2 = cube_ref[idx2]
        cube_res1 = np.array([cube1[i] - arr2[i] for i in range(nh1)])
        cube_res2 = np.array([cube2[i] - arr1[i] for i in range(nh2)])
        cube_res = np.concatenate((cube_res1, cube_res2), axis=0)
        cube_der = cube_derotate(cube_res, angle_list,
                                 imlib=algo_params.imlib,
                                 interpolation=algo_params.interpolation,
                                 nproc=algo_params.nproc, **rot_options)
        finroll = cube_collapse(cube_der, mode=algo_params.collapse)
    else:
        mr1 = np.mean(cube[idx1], axis=0)
        mr2 = np.mean(cube[idx2], axis=0)
        arr1 = np.mean(cube_ref[idx1], axis=0)
        arr2 = np.mean(cube_ref[idx2], axis=0)
        a1 = np.mean(-angle_list[idx1])
        a2 = np.mean(-angle_list[idx2])

        dr12 = mr1 - arr2
        dr12_drot = frame_rotate(dr12, a1, imlib=algo_params.imlib,
                                 interpolation=algo_params.interpolation,
                                 **rot_options)
        dr21 = mr2 - arr1
        dr21_drot = frame_rotate(dr21, a2, imlib=algo_params.imlib,
                                 interpolation=algo_params.interpolation,
                                 **rot_options)
        cube_res = np.array([dr12, dr21])
        cube_der = np.array([dr12_drot, dr21_drot])
        finroll = cube_collapse(cube_der, mode=algo_params.collapse)

    if np.isscalar(algo_params.smooth_ker_aft):
        if algo_params.smooth_ker_aft > 0:
            finroll = frame_filter_lowpass(
                finroll, fwhm_size=algo_params.smooth_ker_aft)
    elif algo_params.smooth_ker_aft.ndim == 2:
        finroll = frame_filter_lowpass(finroll, mode="psf",
                                       psf=algo_params.smooth_ker_aft)
    if algo_params.mask_rad > 0:
        finroll = mask_circle(finroll, algo_params.mask_rad)

    if algo_params.verbose:
        print("Done derotating and combining")
        timing(start_time)

    if algo_params.full_output:
        return cube_res, cube_der, finroll
    return finroll
