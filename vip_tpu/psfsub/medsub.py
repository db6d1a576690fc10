"""Median ADI / RDI subtraction.

TPU rebuild of vip_hci/psfsub/medsub.py ([MAR06] median-ADI). Full-frame
mode is a single device reduction; 'annular' smart mode gathers each
annulus to a [n_frames, n_px] matrix and computes every frame's optimized
median reference in one vmapped masked-median (replacing the pool over
annuli at medsub.py:336-359 and the per-frame Python loop at :602-641).
The per-frame library selection (PA threshold + nframes-closest) is host
logic from ``_find_indices_adi`` emitted as a static boolean mask. 4-d
(ADI+mSDI) input runs a per-frame SDI stage first (medsub.py:388-599).
"""

from dataclasses import dataclass
from enum import Enum
from typing import List, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Collapse, Imlib, Interpolation, time_ini, timing
from ..config.utils_param import resolve_algo_params
from ..preproc.derotation import (_define_annuli, _find_indices_adi,
                                  cube_derotate)
from ..preproc.parangles import check_pa_vector
from ..preproc.subsampling import cube_collapse
from ..var.shapes import get_annulus_segments, mask_circle

__all__ = ["median_sub", "MEDIAN_SUB_Params"]


@dataclass
class MEDIAN_SUB_Params:
    """Parameters of ``median_sub`` (reference medsub.py:46-88)."""

    cube: np.ndarray = None
    angle_list: np.ndarray = None
    scale_list: np.ndarray = None
    flux_sc_list: np.ndarray = None
    fwhm: float = 4
    radius_int: int = 0
    asize: int = 4
    delta_rot: int = 1
    delta_sep: Union[float, tuple] = (0.1, 1)
    mode: str = "fullfr"
    nframes: int = 4
    sdi_only: bool = False
    imlib: Enum = Imlib.VIPFFT
    interpolation: Enum = Interpolation.LANCZOS4
    collapse: Enum = Collapse.MEDIAN
    cube_ref: np.ndarray = None
    collapse_ref: str = "median"
    nproc: int = 1
    full_output: bool = False
    verbose: bool = True


@jax.jit
def _masked_median_residuals(matrix, lib_mask):
    """residual[f] = matrix[f] - nanmedian(matrix[lib_mask[f]], axis=0),
    vectorized over frames. ``lib_mask`` is (n, n) boolean."""
    def one(frame_row, mask_row):
        lib = jnp.where(mask_row[:, None], matrix, jnp.nan)
        return frame_row - jnp.nanmedian(lib, axis=0)

    return jax.vmap(one)(matrix, lib_mask)


def median_sub(*all_args: List, **all_kwargs: dict):
    """(Smart) median-ADI / median-RDI.

    Reference-parity signature via MEDIAN_SUB_Params; extra kwargs are
    rot_options (medsub.py:91-215).
    """
    algo_params, rot_options = resolve_algo_params(
        MEDIAN_SUB_Params, all_args, all_kwargs)

    if algo_params.radius_int and len(rot_options) == 0:
        rot_options["mask_val"] = 0
        rot_options["ker"] = 1
        rot_options["interp_zeros"] = True

    array = np.asarray(algo_params.cube, dtype=float).copy()
    if array.ndim not in (3, 4):
        raise TypeError("Input array is not a 3d or 4d array")

    if algo_params.verbose:
        start_time = time_ini()

    if array.ndim == 4:
        return _median_sub_4d(array, algo_params,
                              start_time if algo_params.verbose else None,
                              rot_options)

    angle_list = check_pa_vector(algo_params.angle_list)
    n, y, x = array.shape
    if array.shape[0] != angle_list.shape[0]:
        raise TypeError("Input vector or parallactic angles has wrong length")

    ref_frame = None
    if algo_params.cube_ref is not None:
        cube_ref = np.asarray(algo_params.cube_ref)
        if cube_ref.shape[-1] != x or cube_ref.shape[-2] != y:
            raise TypeError("Reference cube shape should have same xy "
                            "dimensions as science cube")
        if "median" in algo_params.collapse_ref:
            ref_frame = np.median(cube_ref, axis=0)
        elif "mean" in algo_params.collapse_ref:
            ref_frame = np.mean(cube_ref, axis=0)
        else:
            ref_frame = cube_collapse(cube_ref, mode=algo_params.collapse_ref)

    # The median frame is subtracted from each frame (if no RDI)
    if algo_params.cube_ref is None:
        model_psf = np.median(array, axis=0)
        array -= model_psf

    if algo_params.mode == "fullfr":
        cube_out = array
        if algo_params.cube_ref is not None:
            if "sc" in algo_params.collapse_ref:
                if len(algo_params.collapse_ref) > 9:
                    idx_rin = algo_params.collapse_ref.index("n") + 1
                    idx_rout = algo_params.collapse_ref.index("-")
                    rin = int(algo_params.collapse_ref[idx_rin:idx_rout])
                    rout = int(algo_params.collapse_ref[idx_rout + 1:])
                else:
                    rin = 0
                    rout = y // 2 - 1
                mask_ref = mask_circle(ref_frame, rin, fillwith=np.nan)
                mask_ref = mask_circle(mask_ref, rout, fillwith=np.nan,
                                       mode="out")
                for i in range(n):
                    mask_sci = mask_circle(array[i], rin, fillwith=np.nan)
                    mask_sci = mask_circle(mask_sci, rout, fillwith=np.nan,
                                           mode="out")
                    scal_fac = np.nansum(mask_sci) / np.nansum(mask_ref)
                    array[i] -= scal_fac * ref_frame
                cube_out = array
            else:
                array -= ref_frame
                cube_out = array
        if algo_params.verbose:
            print("Median psf reference subtracted")

    elif algo_params.mode == "annular":
        cube_out = np.zeros_like(array)
        n_annuli = int((y / 2 - algo_params.radius_int) / algo_params.asize)
        if algo_params.verbose:
            print(f"N annuli = {n_annuli}, FWHM = {algo_params.fwhm}")

        if algo_params.cube_ref is None and algo_params.nframes is not None \
                and algo_params.nframes % 2 != 0:
            raise TypeError("`nframes` argument must be even value")

        for ann in range(n_annuli):
            if algo_params.cube_ref is None:
                res = _median_subt_ann_adi(
                    array, ann, angle_list, n_annuli, algo_params.fwhm,
                    algo_params.radius_int, algo_params.asize,
                    algo_params.delta_rot, algo_params.nframes
                )
                mres, yy, xx, _ = res
            else:
                mres, yy, xx = _median_subt_ann_rdi(
                    array, ref_frame, algo_params.collapse_ref, ann,
                    algo_params.radius_int, algo_params.asize
                )
            cube_out[:, yy, xx] = mres
        if algo_params.verbose:
            print("Optimized median psf reference subtracted")
    else:
        raise RuntimeError("Mode not recognized")

    cube_der = cube_derotate(cube_out, angle_list, nproc=algo_params.nproc,
                             imlib=algo_params.imlib,
                             interpolation=algo_params.interpolation,
                             **rot_options)
    if algo_params.radius_int:
        cube_out = mask_circle(cube_out, algo_params.radius_int)
        cube_der = mask_circle(cube_der, algo_params.radius_int)
    frame = cube_collapse(cube_der, mode=algo_params.collapse)

    if algo_params.verbose:
        print("Done derotating and combining")
        timing(start_time)
    if algo_params.full_output:
        return cube_out, cube_der, frame
    return frame


def _median_sub_4d(array, algo_params, start_time, rot_options):
    """ADI+mSDI median subtraction (reference medsub.py:388-520): first a
    per-frame SDI stage exploiting spectral variability, then (optionally)
    median-ADI on the resulting channel-collapsed cube."""
    z, n, y_in, x_in = array.shape
    angle_list = check_pa_vector(algo_params.angle_list)

    scale_list = algo_params.scale_list
    if scale_list is None:
        raise ValueError("Scaling factors vector must be provided")
    scale_list = np.asarray(scale_list)
    if scale_list.ndim > 1:
        raise ValueError("Scaling factors vector is not 1d")
    if not scale_list.shape[0] == z:
        raise ValueError("Scaling factors vector has wrong length")
    flux_sc_list = algo_params.flux_sc_list
    if flux_sc_list is not None:
        flux_sc_list = np.asarray(flux_sc_list)
        if flux_sc_list.ndim > 1:
            raise ValueError("Scaling factors vector is not 1d")
        if not flux_sc_list.shape[0] == z:
            raise ValueError("Scaling factors vector has wrong length")

    fwhm = int(np.round(np.mean(algo_params.fwhm)))
    n_annuli = int((y_in / 2 - algo_params.radius_int) / algo_params.asize)

    if algo_params.nframes is not None and algo_params.nframes % 2 != 0:
        raise TypeError("`nframes` argument must be even value")

    if algo_params.verbose:
        print(f"{z} spectral channels per IFS frame")
        print("First median subtraction exploiting spectral variability")
        if algo_params.mode == "annular":
            print(f"N annuli = {n_annuli}, mean FWHM = {fwhm:.3f}")

    residuals_cube_channels = np.array([
        _median_subt_fr_sdi(array, fr, scale_list, flux_sc_list, n_annuli,
                            fwhm, algo_params.radius_int, algo_params.asize,
                            algo_params.delta_sep, algo_params.nframes,
                            algo_params.imlib, algo_params.interpolation,
                            algo_params.collapse, algo_params.mode)
        for fr in range(n)
    ])

    if algo_params.verbose:
        if start_time is not None:
            timing(start_time)
        print(f"{n} ADI frames")
        print("Median subtraction in the ADI fashion")

    if algo_params.sdi_only:
        cube_out = residuals_cube_channels
    else:
        if algo_params.mode == "fullfr":
            median_frame = np.nanmedian(residuals_cube_channels, axis=0)
            cube_out = residuals_cube_channels - median_frame
        elif algo_params.mode == "annular":
            cube_out = np.zeros_like(residuals_cube_channels)
            cube_out[:] = np.nan
            for ann in range(n_annuli):
                mres, yy, xx, _ = _median_subt_ann_adi(
                    residuals_cube_channels, ann, angle_list, n_annuli, fwhm,
                    algo_params.radius_int, algo_params.asize,
                    algo_params.delta_rot, algo_params.nframes)
                cube_out[:, yy, xx] = mres
        else:
            raise RuntimeError("Mode not recognized")

    cube_der = cube_derotate(cube_out, angle_list, imlib=algo_params.imlib,
                             interpolation=algo_params.interpolation,
                             nproc=algo_params.nproc, **rot_options)
    if algo_params.radius_int:
        cube_der = mask_circle(cube_der, algo_params.radius_int)
    frame = cube_collapse(cube_der, mode=algo_params.collapse)

    if algo_params.verbose:
        print("Done derotating and combining")
        if start_time is not None:
            timing(start_time)
    if algo_params.full_output:
        return cube_out, cube_der, frame
    return frame


def _median_subt_fr_sdi(array, fr, scal, flux_scal, n_annuli, fwhm,
                        radius_int, annulus_width, delta_sep, nframes, imlib,
                        interpolation, collapse, mode):
    """Optimized median subtraction on one multi-spectral frame
    (reference medsub.py:522-599)."""
    from ..preproc.rescaling import (_find_indices_sdi, check_scal_vector,
                                     cube_rescaling_wavelengths as scwave)

    z, n, y_in, x_in = array.shape
    scale_list = check_scal_vector(scal)
    multispec_fr = scwave(array[:, fr, :, :], scale_list, imlib=imlib,
                          interpolation=interpolation)[0]
    if flux_scal is not None:
        for i in range(z):
            multispec_fr[i] *= flux_scal[i]

    if mode == "annular":
        cube_res = np.zeros_like(multispec_fr)
        if isinstance(delta_sep, tuple):
            delta_sep_vec = np.linspace(delta_sep[0], delta_sep[1], n_annuli)
        else:
            delta_sep_vec = [delta_sep] * n_annuli

        for ann in range(n_annuli):
            if ann == n_annuli - 1:
                inner_radius = radius_int + (ann * annulus_width - 1)
            else:
                inner_radius = radius_int + ann * annulus_width
            ann_center = inner_radius + (annulus_width / 2)

            indices = get_annulus_segments(multispec_fr[0], inner_radius,
                                           annulus_width)[0]
            yy, xx = indices
            matrix = multispec_fr[:, yy, xx]

            for j in range(z):
                indices_left = _find_indices_sdi(scal, ann_center, j, fwhm,
                                                 delta_sep_vec[ann], nframes)
                matrix_masked = matrix[indices_left]
                ref_psf_opt = np.nanmedian(matrix_masked, axis=0)
                cube_res[j, yy, xx] = matrix[j] - ref_psf_opt
    elif mode == "fullfr":
        median_frame = np.nanmedian(multispec_fr, axis=0)
        cube_res = multispec_fr - median_frame
    else:
        raise RuntimeError("Mode not recognized")

    if flux_scal is not None:
        for i in range(z):
            cube_res[i] /= flux_scal[i]

    frame_desc = scwave(cube_res, scale_list, full_output=False,
                        inverse=True, y_in=y_in, x_in=x_in, imlib=imlib,
                        interpolation=interpolation, collapse=collapse)
    return frame_desc


def _median_subt_ann_adi(array, ann, angle_list, n_annuli, fwhm, radius_int,
                         annulus_width, delta_rot, nframes):
    """Smart median subtraction in one annulus (medsub.py:602-641), with the
    per-frame loop replaced by one vmapped masked median on device."""
    n = array.shape[0]
    pa_thr, inner_radius, _ = _define_annuli(angle_list, ann, n_annuli, fwhm,
                                             radius_int, annulus_width,
                                             delta_rot, 1, False)
    indices = get_annulus_segments(array[0], inner_radius, annulus_width)[0]
    yy, xx = indices
    matrix = array[:, yy, xx]

    if pa_thr != 0:
        lib_mask = np.zeros((n, n), dtype=bool)
        for frame in range(n):
            idx = _find_indices_adi(angle_list, frame, pa_thr, nframes)
            lib_mask[frame, idx] = True
    else:
        lib_mask = np.ones((n, n), dtype=bool)

    matrix_res = np.asarray(
        _masked_median_residuals(jnp.asarray(matrix), jnp.asarray(lib_mask))
    )
    return matrix_res, yy, xx, pa_thr


def _median_subt_ann_rdi(array, frame_ref, collapse_ref, ann, radius_int,
                         annulus_width):
    """RDI median subtraction in one annulus (medsub.py:644-677)."""
    inner_radius = radius_int + ann * annulus_width
    indices = get_annulus_segments(array[0], inner_radius, annulus_width)[0]
    yy, xx = indices
    matrix_ref = frame_ref[yy, xx]
    matrix = array[:, yy, xx]
    if "sc" in collapse_ref:
        scal = np.nansum(matrix, axis=1) / np.nansum(matrix_ref)
        matrix_res = matrix - scal[:, None] * matrix_ref[None, :]
    else:
        matrix_res = matrix - matrix_ref[None, :]
    return matrix_res, yy, xx
