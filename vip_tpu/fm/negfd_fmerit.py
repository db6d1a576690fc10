"""Figure of merit for the NEGFD (negative fake disk) optimization
(reference vip_hci/fm/negfd_fmerit.py)."""

import numpy as np

from ..psfsub.pca_fullfr import pca
from .negfd_interp import interpolate_model
from .utils_negfd import cube_disk_free

__all__ = ["chisquare_fd"]


def chisquare_fd(modelParameters, cube, angs, disk_model, mask_fm,
                 initialState, force_params=None, grid_param_list=None,
                 fmerit="sum", mu_sigma=None, psfn=None, algo=pca,
                 algo_options={}, interp_order=-1, imlib="skimage",
                 interpolation="biquintic", transmission=None, weights=None,
                 debug=False, rot_options={}):
    """Reduced chi2 of the residuals after negative disk injection + psfsub
    (reference negfd_fmerit.py:13-313).

    modelParameters: (x, y, theta, scal, flux) for 3D cubes, with optional
    leading grid parameters and per-channel fluxes for 4D cubes;
    ``force_params`` marks fixed parameters pulled from ``initialState``.
    """
    grid_ndim = disk_model.ndim - cube.ndim + 1

    if cube.ndim == 3:
        multispectral = False
        if force_params is not None:
            grid_params, df_params = _split_params(
                modelParameters, initialState, force_params, grid_ndim,
                len(force_params))
            x, y, theta, scal = tuple(df_params[:4])
            flux_tmp = df_params[-1]
        else:
            grid_params = modelParameters[:grid_ndim] if grid_ndim > 0 else []
            x, y, theta, scal = modelParameters[grid_ndim:grid_ndim + 4]
            flux_tmp = modelParameters[grid_ndim + 4:]
            if len(np.atleast_1d(flux_tmp)) == 1:
                flux_tmp = np.atleast_1d(flux_tmp)[0]
    else:
        multispectral = True
        if force_params is not None:
            flux_fix = force_params[grid_ndim + 4]
            for j in range(len(force_params) - (5 + grid_ndim)):
                if force_params[j + 5 + grid_ndim] != flux_fix:
                    raise ValueError("All fluxes need to be either free or "
                                     "fixed")
            grid_params, df_params = _split_params(
                modelParameters, initialState, force_params, grid_ndim,
                grid_ndim + 4)
            x, y, theta, scal = tuple(df_params)
            n_used = sum(1 for i in range(grid_ndim + 4)
                         if force_params[i])
            n_free = (grid_ndim + 4) - n_used
            if flux_fix:
                flux_tmp = np.asarray(initialState[n_used:])
            else:
                flux_tmp = np.asarray(modelParameters[n_free:])
        else:
            grid_params = modelParameters[:grid_ndim] if grid_ndim > 0 else []
            x = modelParameters[grid_ndim + 0]
            y = modelParameters[grid_ndim + 1]
            theta = modelParameters[grid_ndim + 2]
            scal = modelParameters[grid_ndim + 3]
            flux_tmp = np.array(modelParameters[grid_ndim + 4:])

    # apply temporal weights, if any
    if weights is None:
        flux = flux_tmp
    elif np.isscalar(flux_tmp):
        flux = flux_tmp * np.asarray(weights)
    else:
        flux = np.outer(flux_tmp, weights)

    df_params = (x, y, theta, scal, flux)

    # interpolate in the model grid, if any
    if grid_ndim > 0:
        grid_params = tuple(grid_params)
        for p in range(len(grid_param_list)):
            if grid_params[p] < grid_param_list[p][0]:
                return np.inf
            if grid_params[p] > grid_param_list[p][-1]:
                return np.inf
        disk_img = interpolate_model(grid_params, grid_param_list,
                                     disk_model, multispectral=multispectral,
                                     interp_order=interp_order)
    else:
        disk_img = disk_model.copy()

    # imlib pairing for shift vs rotation (reference negfd_fmerit.py:236-246)
    if imlib == "opencv":
        imlib_sh = imlib_rot = imlib
    elif imlib in ("skimage", "ndimage-interp"):
        imlib_sh = "ndimage-interp"
        imlib_rot = "skimage"
    elif imlib in ("vip-fft", "ndimage-fourier"):
        imlib_sh = "ndimage-fourier"
        imlib_rot = "vip-fft"
    else:
        raise TypeError("Interpolation not recognized.")

    cube_negfd = cube_disk_free(df_params, cube, angs, disk_img, psfn=None,
                                imlib=imlib_rot, interpolation=interpolation,
                                imlib_sh=imlib_sh,
                                interpolation_sh=interpolation,
                                transmission=transmission, weights=weights,
                                **rot_options)

    res = algo(cube=cube_negfd, angle_list=angs, **algo_options)
    values = res[np.where(mask_fm)]
    nonzero = values != 0
    values = values[nonzero]
    ddf = values.size - len(modelParameters)
    if ddf < 1:
        raise ValueError("Not enough pixels at the intersection of input "
                         "binary mask and area where the algorithm is run. "
                         "Check mask_fm and algo_params.")
    if values.size < 10:
        print("WARNING: less than 10 pixels in the optimization area "
              "(intersection of input binary mask and where the algorithm "
              "is run). You may want to double-check mask_fm and "
              "algo_params.")
    if mu_sigma is None:
        if fmerit == "sum":
            chi = np.sum(np.abs(values)) / ddf
        elif fmerit == "stddev":
            chi = np.std(values) * values.size / ddf
        else:
            raise RuntimeError("fmerit choice not recognized.")
    else:
        mu, sigma = mu_sigma[0], mu_sigma[1]
        if isinstance(mu, np.ndarray):
            if mu.shape == cube.shape[-2:]:
                mu = mu[np.where(mask_fm)][nonzero]
            else:
                raise TypeError("If input mu is an array, it should have "
                                "same shape as cube frames")
        if isinstance(sigma, np.ndarray):
            if sigma.shape == cube.shape[-2:]:
                sigma = sigma[np.where(mask_fm)][nonzero]
            else:
                raise TypeError("If input sigma is an array, it should have "
                                "same shape as cube frames")
        chi = np.sum(np.power((mu - values) / sigma, 2)) / ddf
    return chi


def _split_params(modelParameters, initialState, force_params, grid_ndim,
                  nparams):
    """Merge free (modelParameters) and fixed (initialState) parameters
    following the force_params flags (reference negfd_fmerit.py:138-196)."""
    grid_params, df_params = [], []
    c_free = 0
    c_forced = 0
    for i in range(nparams):
        if force_params[i]:
            val = initialState[c_forced]
            c_forced += 1
        else:
            val = modelParameters[c_free]
            c_free += 1
        (grid_params if i < grid_ndim else df_params).append(val)
    return grid_params, df_params
