"""Iterative PCA (GreeDS; [PAI21]/[CHR24]).

TPU rebuild of vip_hci/greedy/ipca_fullfr.py: repeat {pca → estimate
significant signal (STIM threshold) → subtract rotated signal estimate
from the library} ``nit`` times. The host drives the iteration; every
inner PCA runs through the batched device pipeline. Strategies ADI / RDI /
ARDI / RADI; fixed-ncomp (mode=None) and incremental 'Christiaens24'
schedule. (The 'Juillard23' mode is this same incremental GreeDS with the
reference's external torch backend — use mode='Christiaens24' here.)
"""

from dataclasses import dataclass
from typing import List, Union

import numpy as np

from ..config import Progressbar, time_ini, timing
from ..config.utils_param import (resolve_algo_params,
                                  separate_kwargs_dict)
from ..preproc.derotation import cube_derotate
from ..preproc.subsampling import cube_collapse
from ..psfsub.pca_fullfr import PCA_Params, pca
from ..var.filters import frame_filter_lowpass
from ..var.shapes import mask_circle, prepare_matrix
from .utils_greedy import blurring_2d, blurring_3d, find_significant_signals

__all__ = ["ipca", "IPCA_Params"]


def _greeds_native(cube, angles, ncomp, nit, ncomp_start=1, pup=0,
                   refs=None, imlib="vip-fft", nproc=1, keep_l="last"):
    """Native GreeDS loop ([PAI21] alg. 1, as packaged by [JUI23] — the
    engine behind the reference's mode='Juillard23', which delegates to
    the external torch GreeDS package at ipca_fullfr.py:442-479).

    Repeat, with the rank stepped from ``ncomp_start`` to ``ncomp`` and
    ``nit`` inner iterations per rank: rotate the current disk estimate
    into every frame, subtract it, build a rank-r model of that
    estimate-free cube, subtract the model from the raw cube, derotate,
    mean-combine, clip to positive values (+ optional pupil mask).

    Returns (it_cube, star_estim): the estimate after every iteration and
    the rank-r speckle models ('last' keeps only the final one).
    """
    import jax.numpy as jnp

    from ..ops.linalg import svd_top

    if nit < 1 or ncomp < ncomp_start:
        raise ValueError("GreeDS needs nit >= 1 and ncomp >= ncomp_start "
                         f"(got nit={nit}, ncomp={ncomp}, "
                         f"ncomp_start={ncomp_start})")
    t = cube.shape[0]
    estimate = np.zeros(cube.shape[1:])
    it_frames = []
    star_estim = []
    for rank in range(ncomp_start, ncomp + 1):
        for _ in range(nit):
            est_cube = np.repeat(estimate[None], t, axis=0)
            est_rot = cube_derotate(est_cube, -angles, imlib=imlib,
                                    nproc=nproc)
            speckle_only = (cube - est_rot).reshape(t, -1)
            lib = speckle_only
            if refs is not None:
                lib = np.vstack([speckle_only,
                                 refs.reshape(refs.shape[0], -1)])
            basis = np.asarray(svd_top(jnp.asarray(lib), rank,
                                       method="lapack"))
            model = ((speckle_only @ basis.T) @ basis).reshape(cube.shape)
            derot = cube_derotate(cube - model, angles, imlib=imlib,
                                  nproc=nproc)
            frame = np.mean(derot, axis=0)
            estimate = np.where(frame > 0, frame, 0.0)
            if pup:
                estimate = np.asarray(mask_circle(estimate, pup))
            it_frames.append(estimate.copy())
            if keep_l == "all":
                star_estim.append(model)
    if keep_l != "all":
        star_estim.append(model)
    return np.array(it_frames), star_estim


def _ipca_juillard23(algo_params, start_time):
    """mode='Juillard23' branch: the incremental GreeDS scheme run through
    the native loop (the reference wraps the external torch package,
    ipca_fullfr.py:442-526; outputs are assembled the same way)."""
    if algo_params.strategy not in ("ADI", "ARDI"):
        raise RuntimeError("Juillard23 not compatible with this mode.")
    refs = algo_params.cube_ref.copy() if algo_params.strategy == "ARDI" \
        else None
    pup = algo_params.mask_center_px or 0
    full = bool(algo_params.full_output)

    it_cube, star_estim = _greeds_native(
        np.asarray(algo_params.cube, dtype=float),
        np.asarray(algo_params.angle_list, dtype=float),
        ncomp=int(algo_params.ncomp), nit=int(algo_params.nit),
        ncomp_start=int(algo_params.ncomp_start), pup=pup, refs=refs,
        imlib=algo_params.imlib, nproc=algo_params.nproc,
        keep_l="all" if full else "last")
    frame = it_cube[-1]

    if algo_params.verbose:
        timing(start_time)
    if not full:
        return frame

    cube = np.asarray(algo_params.cube, dtype=float)
    angles = np.asarray(algo_params.angle_list, dtype=float)
    residuals_cube_ = cube_derotate(cube - star_estim[-1], angles,
                                    imlib=algo_params.imlib,
                                    nproc=algo_params.nproc) - frame
    residuals_cube = cube_derotate(residuals_cube_, -angles,
                                   imlib=algo_params.imlib,
                                   nproc=algo_params.nproc)
    n_it = len(it_cube)
    sig_mask = np.zeros_like(it_cube)
    nstim = np.zeros_like(it_cube)
    if algo_params.thr_mode == "STIM":
        for i in range(n_it):
            der_i = cube_derotate(cube - star_estim[i], angles,
                                  imlib=algo_params.imlib,
                                  nproc=algo_params.nproc)
            res_der_i = der_i - it_cube[i]
            res_i = cube_derotate(res_der_i, -angles,
                                  imlib=algo_params.imlib,
                                  nproc=algo_params.nproc)
            sig_mask[i], nstim[i] = find_significant_signals(
                res_i, res_der_i, angles, algo_params.thr,
                mask=algo_params.mask_center_px, r_out=algo_params.r_out)
    else:
        sig_mask = np.ones_like(it_cube)
        sig_mask[it_cube < algo_params.thr] = 0
        nstim = sig_mask.copy()
    sig_images = it_cube.copy()
    sig_images[1 - sig_mask > 0] = 0
    sig_images[sig_images < 0] = 0
    stim_cube = nstim.copy()
    it_cube_nd = np.zeros_like(it_cube)
    return (frame, it_cube, sig_images, residuals_cube, residuals_cube_,
            stim_cube, it_cube_nd)


@dataclass
class IPCA_Params(PCA_Params):
    """Parameters of ``ipca`` (reference ipca_fullfr.py:70-95)."""

    mode: str = None
    strategy: str = "ADI"
    ncomp_start: int = 1
    ncomp_step: int = 1
    nit: int = 1
    thr: Union[float, str] = 0.0
    thr_mode: str = "STIM"
    r_out: float = None
    r_max: float = None
    smooth_ker: Union[float, List, np.ndarray] = None
    rtol: float = 1e-2
    atol: float = 1e-2
    continue_without_smooth_after_conv: bool = False
    add_nd_excess: bool = False


def ipca(*all_args: List, **all_kwargs: dict):
    """Iterative PCA (reference ipca_fullfr.py:96-873, mode None /
    'Christiaens24' paths)."""
    algo_params, rot_options = resolve_algo_params(
        IPCA_Params, all_args, all_kwargs)
    # Seed the inner-PCA kwargs from the RESOLVED params (not the raw
    # kwargs) so positionally-passed arguments (cube, angle_list, ...)
    # reach the pca() calls too.
    import dataclasses as _dc

    _pca_fields = {f.name for f in _dc.fields(PCA_Params)}
    pca_params = {f.name: getattr(algo_params, f.name)
                  for f in _dc.fields(IPCA_Params)
                  if f.name in _pca_fields
                  and getattr(algo_params, f.name) is not None}

    start_time = time_ini(algo_params.verbose)
    pca_params["full_output"] = True
    pca_params["verbose"] = False

    if algo_params.mode == "Juillard23":
        return _ipca_juillard23(algo_params, start_time)
    if algo_params.mask_rdi is not None and algo_params.mode is not None:
        raise TypeError("IPCA with data imputation is not compatible with "
                        "incremental mode. Set 'mode' to None.")

    mask_center_px = algo_params.mask_center_px
    mask_rdi_tmp = None
    if algo_params.strategy == "ADI" and algo_params.cube_ref is None:
        ref_cube = None
        mask_rdi_tmp = algo_params.mask_rdi
    elif algo_params.cube_ref is not None:
        if algo_params.strategy == "ADI":
            print("WARNING: requested strategy is 'ADI' but reference cube "
                  "detected! Strategy automatically switched to 'ARDI'.")
            algo_params.strategy = "ARDI"
        if algo_params.mask_rdi is not None:
            mask_rdi_tmp = algo_params.mask_rdi
        if algo_params.strategy == "ARDI" and algo_params.mask_rdi is None:
            ref_cube = np.concatenate((algo_params.cube,
                                       algo_params.cube_ref), axis=0)
        else:
            ref_cube = algo_params.cube_ref.copy()
    else:
        raise ValueError("strategy not recognized: must be ADI, RDI, ARDI "
                         "or RADI")

    cond_di = algo_params.mask_rdi is not None
    if isinstance(algo_params.ncomp, (float, int)):
        ncomp_list = [algo_params.ncomp]
        if cond_di:
            ncomp_list.append(algo_params.ncomp)
        if algo_params.strategy == "RADI":
            ncomp_list.append(algo_params.ncomp)
    elif isinstance(algo_params.ncomp, (tuple, list)):
        ncomp_list = list(algo_params.ncomp)
    else:
        raise TypeError("ncomp should be float, int, tuple or list")

    ncomp_tmp = ncomp_list[0]
    nframes = algo_params.cube.shape[0]
    nit_ori = algo_params.nit

    if algo_params.mode is not None:
        if algo_params.mode == "Christiaens24":
            final_ncomp = []
            for npc in range(algo_params.ncomp_start, ncomp_tmp + 1,
                             algo_params.ncomp_step):
                for _ in range(algo_params.nit):
                    final_ncomp.append(npc)
            algo_params.nit = len(final_ncomp)
        else:
            raise ValueError("mode is not recognized.")
    else:
        final_ncomp = [ncomp_tmp] * algo_params.nit
        if cond_di:
            final_ncomp = [ncomp_tmp] + [ncomp_list[1]] * \
                (algo_params.nit - 1)

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
    pca_params["ncomp"] = final_ncomp[0]
    pca_params["cube"] = cube_tmp
    pca_params["cube_ref"] = cube_ref_tmp
    pca_params["mask_rdi"] = mask_rdi_tmp
    res = pca(**pca_params, **rot_options)
    frame = res[0]
    residuals_cube = res[-2]
    residuals_cube_ = res[-1]

    smooth_ker = algo_params.smooth_ker
    if smooth_ker is None or np.isscalar(smooth_ker):
        smooth_ker = [smooth_ker] * algo_params.nit
    else:
        smooth_ker = list(smooth_ker)
        if len(smooth_ker) != algo_params.nit:
            raise TypeError("If a 1d array or list, smooth_ker should have "
                            "nit length")

    if smooth_ker[0] is not None:
        if np.isscalar(smooth_ker[0]):
            frame = frame_filter_lowpass(frame, fwhm_size=smooth_ker[0])
        else:
            frame = frame_filter_lowpass(frame, mode="psf",
                                         psf=smooth_ker[0])

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
        sig_mask = np.ones_like(frame)
        sig_mask[np.where(frame < algo_params.thr)] = 0
        nstim = sig_mask.copy()
    sig_image = frame.copy()
    sig_image[np.where(1 - sig_mask)] = 0
    sig_image[np.where(sig_image < 0)] = 0
    sig_images[0] = sig_image.copy()
    stim_cube[0] = nstim.copy()
    mask_rdi_tmp = None
    frame_nd = frame.copy()

    # --- iterations ---
    it = 0
    for it in Progressbar(range(1, algo_params.nit), desc="Iterating...",
                          verbose=algo_params.verbose):
        # rotate the current signal estimate to each frame's orientation
        sig_cube = np.repeat(frame[np.newaxis, :, :], nframes, axis=0)
        sig_cube = cube_derotate(sig_cube, -algo_params.angle_list,
                                 imlib=algo_params.imlib,
                                 nproc=algo_params.nproc)
        if algo_params.thr_mode == "STIM":
            mask_sig = np.zeros_like(sig_image)
            mask_sig[np.where(sig_image > 0)] = 1
            sig_mcube = np.repeat(mask_sig[np.newaxis, :, :], nframes,
                                  axis=0)
            sig_mcube = cube_derotate(sig_mcube, -algo_params.angle_list,
                                      imlib="skimage",
                                      interpolation="bilinear",
                                      nproc=algo_params.nproc)
            sig_cube[np.where(sig_mcube < 0.5)] = 0
            sig_cube[np.where(sig_cube < 0)] = 0
        else:
            sig_cube[np.where(sig_cube < algo_params.thr)] = 0

        if algo_params.strategy == "ARDI":
            ref_cube = np.concatenate((algo_params.cube - sig_cube,
                                       algo_params.cube_ref), axis=0)
            cube_ref_tmp = prepare_matrix(ref_cube,
                                          scaling=algo_params.scaling,
                                          mask_center_px=mask_center_px,
                                          mode="fullfr", verbose=False)
            cube_ref_tmp = np.reshape(cube_ref_tmp, ref_cube.shape)

        # PCA with signal subtracted from the library
        pca_params["cube"] = algo_params.cube
        pca_params["cube_ref"] = None if algo_params.strategy == "ADI" \
            else ref_cube
        pca_params["ncomp"] = final_ncomp[it]
        pca_params["scaling"] = algo_params.scaling
        pca_params["cube_sig"] = sig_cube
        pca_params["mask_rdi"] = mask_rdi_tmp
        res = pca(**pca_params, **rot_options)
        frame = res[0]
        residuals_cube = res[-2]
        # NOTE: reference quirk — residuals_cube_ is NOT refreshed here
        # (ipca_fullfr.py:730-734); the STIM normalization keeps using the
        # derotated residuals from the previous smoothing/initial step.
        it_cube[it] = frame.copy()

        # PCA on the no-disk cube (for the STIM normalization)
        pca_params["cube"] = cube_tmp - sig_cube
        pca_params["cube_ref"] = cube_ref_tmp
        pca_params["cube_sig"] = None
        pca_params["scaling"] = None
        res_nd = pca(**pca_params, **rot_options)
        residuals_cube_nd = res_nd[-2]
        frame_nd = res_nd[0]

        if smooth_ker[it] is not None:
            residuals_cube = blurring_3d(residuals_cube, None,
                                         fwhm_sz=smooth_ker[it])
            residuals_cube_ = cube_derotate(residuals_cube,
                                            algo_params.angle_list,
                                            imlib=algo_params.imlib,
                                            nproc=algo_params.nproc)
            frame = cube_collapse(residuals_cube_, algo_params.collapse)
            residuals_cube_nd = blurring_3d(residuals_cube_nd, None,
                                            fwhm_sz=smooth_ker[it])
            residuals_cube_nd_ = cube_derotate(residuals_cube_nd,
                                               algo_params.angle_list,
                                               imlib=algo_params.imlib,
                                               nproc=algo_params.nproc)
            frame_nd = cube_collapse(residuals_cube_nd_,
                                     algo_params.collapse)

        if algo_params.add_nd_excess and algo_params.thr_mode != "STIM":
            sig_mask_nd = np.ones_like(frame_nd)
            sig_mask_nd[np.where(frame_nd < algo_params.thr)] = 0
            frame += frame_nd * sig_mask_nd

        if algo_params.thr_mode == "STIM":
            sig_mask, nstim = find_significant_signals(
                residuals_cube_nd, residuals_cube_, algo_params.angle_list,
                algo_params.thr, mask=mask_center_px,
                r_out=algo_params.r_out)
        else:
            sig_mask = np.ones_like(frame)
            sig_mask[np.where(frame < algo_params.thr)] = 0
            nstim = sig_mask.copy()
        inv_sig_mask = np.ones_like(sig_mask)
        inv_sig_mask[np.where(sig_mask)] = 0
        if mask_center_px:
            inv_sig_mask = mask_circle(inv_sig_mask, mask_center_px,
                                       fillwith=1)
        sig_image = frame.copy()
        sig_image[np.where(inv_sig_mask)] = 0
        sig_image[np.where(sig_image < 0)] = 0

        it_cube[it] = frame.copy()
        it_cube_nd[it] = frame_nd.copy()
        sig_images[it] = sig_image.copy()
        stim_cube[it] = nstim.copy()

        # convergence
        if it > 1:
            cond1 = np.allclose(sig_image, sig_images[it - 1],
                                rtol=algo_params.rtol, atol=algo_params.atol)
            cond2 = np.allclose(sig_image, sig_images[it - 2],
                                rtol=algo_params.rtol, atol=algo_params.atol)
            if cond1 or cond2:
                if algo_params.mode == "Christiaens24" and \
                        (it % nit_ori != nit_ori - 1):
                    continue
                if algo_params.strategy in ["ADI", "RDI", "ARDI"]:
                    condc = algo_params.continue_without_smooth_after_conv
                    if smooth_ker[it] is not None and condc:
                        for k in range(it + 1, algo_params.nit):
                            smooth_ker[k] = None
                        if algo_params.verbose:
                            print(f"Convergence after {it} iterations. "
                                  "Switching smoothing off and iterating!")
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
                        print(f" After {it} iterations, PCA-RDI -> PCA-ADI.")

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
