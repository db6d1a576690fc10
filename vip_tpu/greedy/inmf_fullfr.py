"""Iterative NMF (same greedy pattern as ipca).

TPU rebuild of vip_hci/greedy/inmf_fullfr.py:42-586.
"""

from dataclasses import dataclass
from typing import List, Union

import numpy as np

from ..config import Progressbar, time_ini, timing
from ..config.utils_param import (resolve_algo_params,
                                  separate_kwargs_dict)
from ..preproc.derotation import cube_derotate
from ..preproc.subsampling import cube_collapse
from ..psfsub.nmf_fullfr import NMF_Params, nmf
from ..var.shapes import mask_circle, prepare_matrix
from .utils_greedy import blurring_2d, blurring_3d, find_significant_signals

__all__ = ["inmf", "INMF_Params"]


@dataclass
class INMF_Params(NMF_Params):
    """Parameters of ``inmf`` (reference inmf_fullfr.py:19-41)."""

    mode: str = None
    strategy: str = "ADI"
    ncomp_step: int = 1
    nit: int = 1
    thr: Union[float, str] = 0.0
    thr_mode: str = "STIM"
    r_out: float = None
    r_max: float = None
    smooth_ker: Union[float, List, np.ndarray] = 1.0
    rtol: float = 1e-2
    atol: float = 1e-2
    continue_without_smooth_after_conv: bool = False
    mask_rdi: np.ndarray = None
    imlib: str = "vip-fft"
    nproc: int = 1


def inmf(*all_args: List, **all_kwargs: dict):
    """Iterative NMF (reference inmf_fullfr.py:42-586)."""
    algo_params, rot_options = resolve_algo_params(
        INMF_Params, all_args, all_kwargs)
    nmf_params, _ = separate_kwargs_dict(
        initial_kwargs=separate_kwargs_dict(all_kwargs, INMF_Params)[0],
        parent_class=NMF_Params)

    start_time = time_ini(algo_params.verbose)
    nmf_params["full_output"] = True
    nmf_params["verbose"] = False

    mask_center_px = algo_params.mask_center_px
    mask_rdi_tmp = None
    if algo_params.strategy == "ADI":
        ref_cube = None
        mask_rdi_tmp = algo_params.mask_rdi
    elif algo_params.strategy in ["RDI", "ARDI", "RADI"]:
        if algo_params.mask_rdi is not None:
            mask_rdi_tmp = algo_params.mask_rdi.copy()
        if algo_params.cube_ref is None:
            raise ValueError("cube_ref should be provided for RDI or RADI")
        if algo_params.strategy == "ARDI":
            ref_cube = np.concatenate((algo_params.cube,
                                       algo_params.cube_ref), axis=0)
        else:
            ref_cube = algo_params.cube_ref.copy()
    else:
        raise ValueError("strategy not recognized: must be ADI, RDI, ARDI "
                         "or RADI")

    if isinstance(algo_params.ncomp, (float, int)):
        ncomp_list = [algo_params.ncomp]
        if algo_params.strategy == "RADI":
            ncomp_list.append(algo_params.ncomp)
    elif isinstance(algo_params.ncomp, (tuple, list)):
        ncomp_list = list(algo_params.ncomp)
        if len(ncomp_list) == 1:
            if algo_params.strategy == "RADI":
                ncomp_list.append(ncomp_list[0])
        elif len(ncomp_list) != 2:
            raise ValueError("Length of npc list cannot be larger than 2")
    else:
        raise TypeError("ncomp should be float, int, tuple or list")

    ncomp_tmp = ncomp_list[0]
    nframes = algo_params.cube.shape[0]
    # incremental-npc schedules (reference inmf_fullfr.py:373-388); nit is
    # pinned to the schedule length (the reference sets nit=ncomp for
    # 'Pairet18', which over-runs the schedule when ncomp_step > 1)
    if algo_params.mode is not None:
        if algo_params.mode == "Pairet18":
            final_ncomp = list(range(1, ncomp_tmp + 1,
                                     algo_params.ncomp_step))
            algo_params.nit = len(final_ncomp)
            algo_params.thr = 0
        elif algo_params.mode in ("Pairet21", "Christiaens21"):
            final_ncomp = []
            for npc in range(1, ncomp_tmp + 1, algo_params.ncomp_step):
                final_ncomp.extend([npc] * algo_params.nit)
            algo_params.nit = len(final_ncomp)
            if algo_params.mode == "Pairet21":
                algo_params.thr = 0
        else:
            # any other non-None mode falls back to the plain incremental
            # schedule, as the reference does (inmf_fullfr.py:373-388);
            # pad with the last npc so a user-set nit can't over-run it
            final_ncomp = list(range(1, ncomp_tmp + 1,
                                     algo_params.ncomp_step))
            if algo_params.nit > len(final_ncomp):
                final_ncomp += [final_ncomp[-1]] * (algo_params.nit
                                                    - len(final_ncomp))
            else:
                final_ncomp = final_ncomp[:max(1, algo_params.nit)]
                algo_params.nit = len(final_ncomp)
    else:
        final_ncomp = [ncomp_tmp] * algo_params.nit

    cube_tmp = prepare_matrix(algo_params.cube, scaling=algo_params.scaling,
                              mask_center_px=mask_center_px, mode="fullfr",
                              verbose=False)
    cube_tmp = np.reshape(cube_tmp, algo_params.cube.shape)
    if ref_cube is not None:
        cube_ref_tmp = prepare_matrix(ref_cube, scaling=algo_params.scaling,
                                      mask_center_px=mask_center_px,
                                      mode="fullfr", verbose=False)
        cube_ref_tmp = np.reshape(cube_ref_tmp, ref_cube.shape)
    else:
        cube_ref_tmp = None

    # --- first iteration ---
    cube_nn = np.asarray(algo_params.cube, dtype=float).copy()
    cube_nn[cube_nn < 0] = 0
    nmf_params["cube"] = cube_nn
    nmf_params["cube_ref"] = ref_cube
    nmf_params["ncomp"] = final_ncomp[0]
    res = nmf(**nmf_params, **rot_options)
    frame = res[-1]
    residuals_cube = res[-3]
    residuals_cube_ = res[-2]

    smooth_ker = algo_params.smooth_ker
    if smooth_ker is None or np.isscalar(smooth_ker):
        smooth_ker = np.array([smooth_ker] * algo_params.nit, dtype=object)
    else:
        smooth_ker = np.array(smooth_ker, dtype=object)
    if smooth_ker[0] is not None:
        residuals_cube = blurring_3d(residuals_cube, None,
                                     fwhm_sz=smooth_ker[0])
        residuals_cube_ = cube_derotate(residuals_cube,
                                        algo_params.angle_list,
                                        imlib=algo_params.imlib,
                                        nproc=algo_params.nproc)
        frame = cube_collapse(residuals_cube_, algo_params.collapse)

    it_cube = np.zeros([algo_params.nit, frame.shape[0], frame.shape[1]])
    it_cube_nd = np.zeros_like(it_cube)
    stim_cube = np.zeros_like(it_cube)
    sig_images = np.zeros_like(it_cube)
    it_cube[0] = frame.copy()
    it_cube_nd[0] = frame.copy()

    if algo_params.thr_mode == "STIM":
        sig_mask, nstim = find_significant_signals(
            residuals_cube, residuals_cube_, algo_params.angle_list,
            algo_params.thr, mask=mask_center_px, r_out=algo_params.r_out)
    else:
        sig_mask = (frame >= algo_params.thr).astype(float)
        nstim = sig_mask.copy()
    sig_image = np.where(sig_mask.astype(bool), np.maximum(frame, 0), 0.0)
    sig_images[0] = sig_image.copy()
    stim_cube[0] = nstim.copy()
    mask_rdi_tmp = None
    frame_nd = frame.copy()

    it = 0
    for it in Progressbar(range(1, algo_params.nit), desc="Iterating...",
                          verbose=algo_params.verbose):
        if smooth_ker[it] is not None:
            frame = blurring_2d(frame, None, fwhm_sz=smooth_ker[it])

        sig_cube = np.repeat(frame[np.newaxis, :, :], nframes, axis=0)
        sig_cube = cube_derotate(sig_cube, -algo_params.angle_list,
                                 imlib=algo_params.imlib,
                                 nproc=algo_params.nproc)
        if algo_params.thr_mode == "STIM":
            mask_sig = (sig_image > 0).astype(float)
            sig_mcube = np.repeat(mask_sig[np.newaxis, :, :], nframes,
                                  axis=0)
            sig_mcube = cube_derotate(sig_mcube, -algo_params.angle_list,
                                      imlib="skimage",
                                      interpolation="bilinear",
                                      nproc=algo_params.nproc)
            sig_cube[(sig_mcube < 0.5) | (sig_cube < 0)] = 0
        else:
            sig_cube[sig_cube < algo_params.thr] = 0

        if algo_params.strategy == "ARDI":
            ref_cube = np.concatenate((algo_params.cube - sig_cube,
                                       algo_params.cube_ref), axis=0)
            cube_ref_tmp = prepare_matrix(ref_cube,
                                          scaling=algo_params.scaling,
                                          mask_center_px=mask_center_px,
                                          mode="fullfr", verbose=False)
            cube_ref_tmp = np.reshape(cube_ref_tmp, ref_cube.shape)

        nmf_params["cube"] = algo_params.cube
        nmf_params["cube_ref"] = ref_cube
        nmf_params["ncomp"] = final_ncomp[it]
        nmf_params["cube_sig"] = sig_cube
        if mask_rdi_tmp is not None:
            nmf_params["mask_rdi"] = mask_rdi_tmp
        res = nmf(**nmf_params, **rot_options)
        frame = res[-1]
        residuals_cube = res[-3]
        residuals_cube_ = res[-2]
        it_cube[it] = frame.copy()

        if smooth_ker[it] is not None:
            residuals_cube = blurring_3d(residuals_cube, None,
                                         fwhm_sz=smooth_ker[it])
            residuals_cube_ = cube_derotate(residuals_cube,
                                            algo_params.angle_list,
                                            imlib=algo_params.imlib,
                                            nproc=algo_params.nproc)
            frame = cube_collapse(residuals_cube_, algo_params.collapse)

        nmf_params["cube"] = np.clip(cube_tmp - sig_cube, 0, None)
        nmf_params["cube_ref"] = cube_ref_tmp
        nmf_params["cube_sig"] = None
        res_nd = nmf(**nmf_params, **rot_options)
        residuals_cube_nd = res_nd[-3]
        frame_nd = res_nd[-1]

        if algo_params.thr_mode == "STIM":
            sig_mask, nstim = find_significant_signals(
                residuals_cube_nd, residuals_cube_, algo_params.angle_list,
                algo_params.thr, mask=mask_center_px,
                r_out=algo_params.r_out)
        else:
            sig_mask = (frame >= algo_params.thr).astype(float)
            nstim = sig_mask.copy()

        inv_sig_mask = np.where(sig_mask, 0.0, 1.0)
        if mask_center_px:
            inv_sig_mask = mask_circle(inv_sig_mask, mask_center_px,
                                       fillwith=1)
        sig_image = np.where(inv_sig_mask.astype(bool), 0.0,
                             np.maximum(frame, 0))

        it_cube[it] = frame.copy()
        it_cube_nd[it] = frame_nd.copy()
        sig_images[it] = sig_image.copy()
        stim_cube[it] = nstim.copy()

        if it > 1:
            cond1 = np.allclose(sig_image, sig_images[it - 1],
                                rtol=algo_params.rtol, atol=algo_params.atol)
            cond2 = np.allclose(sig_image, sig_images[it - 2],
                                rtol=algo_params.rtol, atol=algo_params.atol)
            if cond1 or cond2:
                if algo_params.strategy in ["ADI", "RDI", "ARDI"]:
                    condc = algo_params.continue_without_smooth_after_conv
                    if smooth_ker[it] is not None and condc:
                        smooth_ker[it + 1:] = None
                        if algo_params.verbose:
                            print(f"Convergence after {it} iterations. "
                                  "Switching smoothing off!")
                    else:
                        if algo_params.verbose:
                            print(f"Final convergence criterion met after "
                                  f"{it} iterations.")
                        break
                elif algo_params.strategy == "RADI":
                    ncomp_tmp = ncomp_list[1]
                    final_ncomp = [ncomp_tmp] * algo_params.nit
                    algo_params.strategy = "ADI"
                    ref_cube = None
                    cube_ref_tmp = None
                    if algo_params.verbose:
                        print(f" After {it} iterations, NMF-RDI -> NMF-ADI.")

    if mask_center_px is not None:
        frame = mask_circle(frame, mask_center_px)
        it_cube = mask_circle(it_cube, mask_center_px)
        residuals_cube = mask_circle(residuals_cube, mask_center_px)
        residuals_cube_ = mask_circle(residuals_cube_, mask_center_px)
        it_cube_nd = mask_circle(it_cube_nd, mask_center_px)

    if algo_params.verbose:
        timing(start_time)

    if algo_params.full_output:
        return (frame, it_cube[:it + 1], sig_images[:it + 1], residuals_cube,
                residuals_cube_, stim_cube[:it + 1], it_cube_nd[:it + 1])
    return frame
