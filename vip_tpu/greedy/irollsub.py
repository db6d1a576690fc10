"""Iterative roll subtraction (reference vip_hci/greedy/irollsub.py:50-210)."""

from dataclasses import dataclass
from typing import List, Union

import numpy as np

from ..config import time_ini, timing
from ..config.utils_param import (resolve_algo_params,
                                  separate_kwargs_dict)
from ..preproc.derotation import cube_derotate
from ..psfsub.rollsub import ROLL_SUB_Params, roll_sub
from .utils_greedy import find_significant_signals

__all__ = ["iroll", "IROLL_SUB_Params"]


@dataclass
class IROLL_SUB_Params(ROLL_SUB_Params):
    """Parameters of ``iroll`` (reference irollsub.py:33-49)."""

    nit: int = 1
    thr: Union[float, str] = 0.0
    thr_mode: str = "STIM"
    r_out: float = None
    r_max: float = None


def iroll(*all_args: List, **all_kwargs: dict):
    """Iterative roll subtraction (reference irollsub.py:50-210)."""
    algo_params, rot_options = resolve_algo_params(
        IROLL_SUB_Params, all_args, all_kwargs)
    roll_params, _ = separate_kwargs_dict(
        initial_kwargs=separate_kwargs_dict(all_kwargs,
                                            IROLL_SUB_Params)[0],
        parent_class=ROLL_SUB_Params)

    roll_params["full_output"] = True
    array = np.asarray(algo_params.cube, dtype=float).copy()
    nframes = array.shape[0]

    def _sig_cube_from(roll_img, cube_res, cube_der):
        if algo_params.thr_mode == "STIM":
            sig_mask, _ = find_significant_signals(
                cube_res, cube_der, algo_params.angle_list, algo_params.thr,
                mask=algo_params.mask_rad, r_out=algo_params.r_out)
        else:
            sig_mask = np.ones_like(roll_img)
            sig_mask[np.where(roll_img < algo_params.thr)] = 0
        roll_cube = np.repeat(roll_img[np.newaxis, :, :], nframes, axis=0)
        mask_cube = np.repeat(sig_mask[np.newaxis, :, :], nframes, axis=0)
        img_cube = cube_derotate(roll_cube, -algo_params.angle_list,
                                 **rot_options)
        sig_cube = cube_derotate(mask_cube, -algo_params.angle_list,
                                 imlib="skimage", interpolation="bilinear")
        sig_cube[np.where(sig_cube < 0.5)] = 0
        sig_cube[np.where(sig_cube >= 0.5)] = 1
        return img_cube * sig_cube

    cube_res0, cube_der0, roll0 = roll_sub(**roll_params, **rot_options)
    img_cube = _sig_cube_from(roll0, cube_res0, cube_der0)

    all_rolli = [roll0]
    cube_resi, cube_deri, rolli = cube_res0, cube_der0, roll0
    for _ in range(algo_params.nit):
        roll_params["cube"] = array
        roll_params["cube_sig"] = img_cube
        cube_resi, cube_deri, rolli = roll_sub(**roll_params, **rot_options)
        img_cube = _sig_cube_from(rolli, cube_resi, cube_deri)
        all_rolli.append(rolli)

    all_rolli = np.array(all_rolli)
    if algo_params.full_output:
        return cube_resi, cube_deri, rolli, all_rolli
    return rolli
