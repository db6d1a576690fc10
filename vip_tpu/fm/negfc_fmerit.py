"""NEGFC figure of merit (χ²) and annulus noise statistics.

TPU rebuild of vip_hci/fm/negfc_fmerit.py: inject a negative companion,
run the PSF-subtraction algo (pca_annulus by default), extract aperture
values, and compute χ² with either (μ, σ) Gaussian statistics or the
sum/stddev/hessian merits. All heavy steps (injection, PCA, derotation,
photometry) run on the batched device kernels.
"""

import numpy as np

from ..preproc.cosmetics import cube_crop_frames, frame_crop
from ..psfsub.pca_fullfr import pca
from ..psfsub.pca_local import pca_annular
from ..psfsub.nmf_local import nmf_annular
from ..psfsub.utils_pca import pca_annulus
from ..var.coords import frame_center
from ..var.shapes import disk_coords, get_annular_wedge, get_annulus_segments
from .fakecomp import cube_inject_companions, cube_planet_free

__all__ = ["chisquare", "get_values_optimize", "get_mu_and_sigma", "hessian"]


def chisquare(modelParameters, cube, angs, psfs_norm, fwhm, annulus_width,
              aperture_radius, initialState, ncomp, cube_ref=None,
              svd_mode="lapack", scaling=None, fmerit="sum",
              collapse="median", algo=pca_annulus, delta_rot=1,
              imlib="vip-fft", interpolation="lanczos4", algo_options={},
              transmission=None, radial_gradient=False, mu_sigma=(0, 1),
              weights=None, force_rPA=False, ndet=None, bin_spec=False,
              debug=False):
    """Reduced χ² of the residuals after negative injection
    (reference negfc_fmerit.py:18-345)."""
    if cube.ndim == 3 or (cube.ndim == 4 and bin_spec):
        if force_rPA:
            r, theta = initialState
            flux_tmp = modelParameters[0]
        else:
            r, theta, flux_tmp = modelParameters
    else:
        if force_rPA:
            r, theta = initialState
            flux_tmp = np.array(modelParameters)
        else:
            r = modelParameters[0]
            theta = modelParameters[1]
            flux_tmp = np.array(modelParameters[2:])

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

    norm_weights = None
    if weights is None:
        flux = -flux_tmp
    elif np.isscalar(flux_tmp):
        flux = -flux_tmp * weights
        norm_weights = weights / np.sum(weights)
    else:
        flux = -np.outer(flux_tmp, weights)
        norm_weights = weights / np.sum(weights)

    cube_negfc = cube_inject_companions(
        cube, psfs_norm, angs, flevel=flux, rad_dists=[r], n_branches=1,
        theta=theta, imlib=imlib_sh, interpolation=interpolation,
        transmission=transmission, radial_gradient=radial_gradient,
        verbose=False)

    full_output = (debug and collapse) or (fmerit == "hessian")
    res = get_values_optimize(
        cube_negfc, angs, ncomp, annulus_width, aperture_radius, fwhm,
        initialState[0], initialState[1], cube_ref=cube_ref,
        svd_mode=svd_mode, scaling=scaling, algo=algo, delta_rot=delta_rot,
        collapse=collapse, algo_options=algo_options, weights=norm_weights,
        imlib=imlib_rot, interpolation=interpolation,
        full_output=full_output)

    if full_output:
        values, frpca = res
    else:
        values = res

    if mu_sigma is None:
        if fmerit == "sum":
            ddf = values.size - len(np.atleast_1d(modelParameters))
            chi = np.nansum(np.abs(values)) / ddf
        elif fmerit == "stddev":
            values = values[values != 0]
            ddf = values.size - len(np.atleast_1d(modelParameters))
            chi = np.nanstd(values) * values.size / ddf
        elif fmerit == "hessian":
            if ndet is None:
                ndet = int(round(max(min(fwhm / 2, r), 2)))
            elif not isinstance(ndet, int):
                raise TypeError("If provided, ndet should be an integer")
            ny, nx = frpca.shape[-2:]
            cy, cx = frame_center(frpca)
            yi = cy + r * np.sin(np.deg2rad(theta))
            xi = cx + r * np.cos(np.deg2rad(theta))
            if ndet % 2:
                yround, xround = int(np.round(yi)), int(np.round(xi))
            else:
                yround, xround = int(np.ceil(yi)), int(np.ceil(xi))
            crop_sz = ndet + 4
            spaces = [yround, xround, ny - yround, nx - xround]
            if crop_sz / 2 > np.amin(spaces):
                raise ValueError("Test location too close from image edge "
                                 "for Hessian calculation. Consider larger "
                                 "input images.")
            subim = frame_crop(frpca, crop_sz, xy=(xround, yround),
                               force=True, verbose=False)
            H = hessian(subim)
            dets = np.zeros([ndet, ndet])
            for i in range(ndet):
                for j in range(ndet):
                    dets[i, j] = np.linalg.det(H[:, :, 2 + i, 2 + j])
            chi = np.sum(np.abs(dets))
        else:
            raise RuntimeError("fmerit choice not recognized.")
    else:
        mu, sigma = mu_sigma[0], mu_sigma[1]
        ddf = values.size - len(np.atleast_1d(modelParameters))
        chi = np.sum(np.power(mu - values, 2) / sigma**2) / ddf
    return chi


def get_values_optimize(cube, angs, ncomp, annulus_width, aperture_radius,
                        fwhm, r_guess, theta_guess, cube_ref=None,
                        svd_mode="lapack", scaling=None, algo=pca_annulus,
                        delta_rot=1, imlib="vip-fft",
                        interpolation="lanczos4", collapse="median",
                        algo_options={}, weights=None, full_output=False):
    """Pixel values in the NEGFC aperture after PSF subtraction
    (reference negfc_fmerit.py:346-631)."""
    ceny_fr, cenx_fr = frame_center(cube[0] if cube.ndim == 3
                                    else cube[0, 0])
    posy = r_guess * np.sin(np.deg2rad(theta_guess)) + ceny_fr
    posx = r_guess * np.cos(np.deg2rad(theta_guess)) + cenx_fr
    halfw = max(aperture_radius * fwhm, annulus_width / 2)

    if r_guess > cenx_fr - halfw:
        raise RuntimeError(
            "The annulus and/or the circular aperture used by the NegFC "
            "falls outside the FOV. Try increasing the size of your frames "
            "or decreasing the annulus or aperture size. "
            f"r_guess: {r_guess:.1f}px; half xy dim: {cenx_fr:.1f}px")

    # user-supplied algo_options win over this function's own defaults;
    # whatever is not consumed here flows through to the algo verbatim
    opts = dict(algo_options)

    def _pull(**defaults):
        return {k: opts.pop(k, v) for k, v in defaults.items()}

    base = _pull(ncomp=ncomp, svd_mode=svd_mode, scaling=scaling,
                 imlib=imlib, interpolation=interpolation,
                 collapse=collapse, collapse_ifs="absmean", nproc=1,
                 verbose=False)
    collapse = base["collapse"]      # downstream shape logic keys on it

    if algo is pca_annulus:
        res = pca_annulus(cube, angs, base["ncomp"], annulus_width,
                          r_guess, cube_ref, base["svd_mode"],
                          base["scaling"], imlib=base["imlib"],
                          interpolation=base["interpolation"],
                          collapse=base["collapse"],
                          collapse_ifs=base["collapse_ifs"],
                          weights=weights, **opts)
    elif algo is pca_annular or algo is nmf_annular:
        ann = _pull(tol=1e-1, min_frames_lib=2, max_frames_lib=200,
                    radius_int=max(1, int(np.floor(r_guess
                                                   - annulus_width / 2))),
                    asize=annulus_width, delta_rot=delta_rot)

        crop_sz = int(2 * np.ceil(ann["radius_int"] + ann["asize"] + 1))
        crop_sz += 1 - crop_sz % 2
        if crop_sz < min(cube.shape[-2], cube.shape[-1]):
            pad = int((cube.shape[-2] - crop_sz) / 2)
            crop_cube = cube_crop_frames(cube, crop_sz, verbose=False)
        else:
            crop_cube, pad = cube, 0

        call = dict(cube=crop_cube, angle_list=angs, cube_ref=cube_ref,
                    fwhm=fwhm, radius_int=ann["radius_int"],
                    delta_rot=ann["delta_rot"], ncomp=base["ncomp"],
                    scaling=base["scaling"], imlib=base["imlib"],
                    interpolation=base["interpolation"],
                    collapse=base["collapse"], weights=weights,
                    nproc=base["nproc"],
                    min_frames_lib=ann["min_frames_lib"],
                    max_frames_lib=ann["max_frames_lib"],
                    full_output=False, verbose=base["verbose"])
        if algo is pca_annular:
            call.update(asize=ann["asize"], svd_mode=base["svd_mode"],
                        collapse_ifs=base["collapse_ifs"], tol=ann["tol"])
        else:
            # NOTE reference quirk: the nmf_annular branch passes the raw
            # annulus_width, not the (possibly overridden) asize
            call.update(asize=annulus_width)
        res = np.pad(algo(**call, **opts), pad, mode="constant",
                     constant_values=0)
    elif algo is pca:
        extra = _pull(scale_list=None, ifs_collapse_range="all",
                      mask_rdi=None, delta_rot=delta_rot, source_xy=None)
        res = pca(cube=cube, angle_list=angs, cube_ref=cube_ref,
                  fwhm=fwhm, weights=weights, **base, **extra, **opts)
    else:
        res = algo(cube=cube, angle_list=angs, **algo_options)

    frame_shape = res.shape[-2:] if collapse is None else res.shape
    indices = disk_coords((posy, posx), radius=aperture_radius * fwhm,
                          shape=frame_shape)
    yy, xx = indices

    if algo is pca_annulus:
        fr_size = res.shape[-1]
        inner_rad = r_guess - annulus_width / 2
        yy_a, xx_a = get_annulus_segments((fr_size, fr_size), inner_rad,
                                          annulus_width, nsegm=1)[0]
        yy_f, xx_f = [], []
        for i in range(len(yy)):
            ind_y = np.where(yy_a == yy[i])
            for j in ind_y[0]:
                if xx[i] == xx_a[j]:
                    yy_f.append(yy[i])
                    xx_f.append(xx[i])
        yy = np.array(yy_f, dtype=int)
        xx = np.array(xx_f, dtype=int)

    if collapse is None:
        values = res[:, yy, xx].ravel()
    else:
        values = res[yy, xx].ravel()

    if full_output and collapse is not None:
        return values, res
    return values


def get_mu_and_sigma(cube, angs, ncomp, annulus_width, aperture_radius, fwhm,
                     r_guess, theta_guess, f_guess=None, psfn=None,
                     cube_ref=None, wedge=None, svd_mode="lapack",
                     scaling=None, algo=pca_annulus, delta_rot=1,
                     imlib="vip-fft", interpolation="lanczos4",
                     collapse="median", weights=None, algo_options={},
                     bin_spec=False, verbose=False):
    """Mean and std of pixel intensities in an annulus wedge excluding the
    companion (reference negfc_fmerit.py:632-1018)."""
    from ..var.filters import cube_filter_highpass

    centy_fr, cenx_fr = frame_center(cube[0] if cube.ndim == 3
                                     else cube[0, 0])
    halfw = max(aperture_radius * fwhm, annulus_width / 2)
    if r_guess > cenx_fr - halfw:
        raise RuntimeError(
            "The annulus and/or the circular aperture used by the NegFC "
            "falls outside the FOV.")
    if r_guess < fwhm:
        raise ValueError("r_guess should be greater than fwhm.")

    if f_guess is not None and psfn is not None:
        if np.isscalar(f_guess):
            planet_parameter = (r_guess, theta_guess, f_guess)
        elif len(f_guess) == 1:
            planet_parameter = (r_guess, theta_guess, f_guess[0])
        else:
            r_all = [r_guess] * len(f_guess)
            theta_all = [r_guess] * len(f_guess)
            planet_parameter = np.array([r_all, theta_all, f_guess])
        array = cube_planet_free(planet_parameter, cube, angs, psfn,
                                 imlib=imlib, interpolation=interpolation)
    else:
        array = cube.copy()

    opts = dict(algo_options)

    def _pull(**defaults):
        return {k: opts.pop(k, v) for k, v in defaults.items()}

    base = _pull(ncomp=ncomp, svd_mode=svd_mode, scaling=scaling,
                 imlib=imlib, interpolation=interpolation,
                 collapse=collapse,
                 radius_int=max(int(np.floor(r_guess - annulus_width / 2)),
                                0))
    radius_int = base["radius_int"]

    hp = _pull(hp_filter=None, hp_kernel=None)
    if hp["hp_filter"] is not None:
        mode = hp["hp_filter"]
        size_kw = ("median_size" if "median" in mode
                   else "fwhm_size" if "gauss" in mode else "kernel_size")
        array = cube_filter_highpass(array, mode=mode,
                                     **{size_kw: hp["hp_kernel"]})

    # the inverse-angle reduction (speckle-noise realization with the
    # companion removed) is needed whenever a planet was subtracted
    need_inv = f_guess is not None and psfn is not None
    pca_res_inv = None
    if algo is pca_annulus:
        def _annulus(a_list):
            return pca_annulus(array, a_list, base["ncomp"], annulus_width,
                               r_guess, cube_ref, base["svd_mode"],
                               base["scaling"], imlib=base["imlib"],
                               interpolation=base["interpolation"],
                               collapse=base["collapse"], weights=weights,
                               **opts)
        pca_res = _annulus(angs)
        if need_inv:
            pca_res_inv = _annulus(-angs)
    elif algo is pca_annular or algo is nmf_annular:
        ann = _pull(tol=1e-1, min_frames_lib=2, max_frames_lib=200,
                    radius_int=max(1, int(np.floor(r_guess
                                                   - annulus_width / 2))),
                    asize=annulus_width, delta_rot=delta_rot,
                    verbose=verbose)
        radius_int = ann["radius_int"]

        crop_sz = int(2 * np.ceil(ann["radius_int"] + ann["asize"] + 1))
        crop_sz += 1 - crop_sz % 2
        if crop_sz < min(cube.shape[-2], cube.shape[-1]):
            pad = int((cube.shape[-2] - crop_sz) / 2)
            crop_cube = cube_crop_frames(array, crop_sz, verbose=False)
        else:
            crop_cube, pad = array, 0
        common = dict(cube_ref=cube_ref, radius_int=ann["radius_int"],
                      fwhm=fwhm, asize=annulus_width,
                      delta_rot=ann["delta_rot"], ncomp=base["ncomp"],
                      scaling=base["scaling"], imlib=base["imlib"],
                      interpolation=base["interpolation"],
                      collapse=base["collapse"], tol=ann["tol"],
                      min_frames_lib=ann["min_frames_lib"],
                      max_frames_lib=ann["max_frames_lib"],
                      full_output=False, verbose=False, weights=weights,
                      **opts)
        if algo is pca_annular:
            common["svd_mode"] = base["svd_mode"]
        pca_res = np.pad(algo(cube=crop_cube, angle_list=angs, **common),
                         pad, mode="constant", constant_values=0)
        if need_inv:
            pca_res_inv = np.pad(
                algo(cube=crop_cube, angle_list=-angs, **common), pad,
                mode="constant", constant_values=0)
    elif algo is pca:
        extra = _pull(scale_list=None, ifs_collapse_range="all", nproc=1,
                      source_xy=None)
        common = dict(cube_ref=cube_ref, delta_rot=delta_rot,
                      weights=weights, verbose=False,
                      **{k: v for k, v in base.items()
                         if k != "radius_int"},
                      **extra, **opts)
        pca_res = pca(cube=array, angle_list=angs, **common)
        if need_inv:
            pca_res_inv = pca(cube=array, angle_list=-angs, **common)
    else:
        pca_res = algo(cube=array, angle_list=angs, **algo_options)
        if need_inv:
            pca_res_inv = algo(cube=array, angle_list=-angs, **algo_options)

    if f_guess is not None and psfn is not None:
        if wedge is None:
            wedge = (0, 360)
    elif wedge is None:
        delta_theta = np.amax(angs) - np.amin(angs)
        if delta_theta > 120:
            delta_theta = 120
        theta_ini = (theta_guess + delta_theta) % 360
        theta_fin = theta_ini + (360 - 2 * delta_theta)
        wedge = (theta_ini, theta_fin)
    if wedge is not None:
        if len(wedge) == 2:
            if wedge[0] > wedge[1]:
                print("2nd value of wedge smaller than first one => +360")
                wedge = (wedge[0], wedge[1] + 360)
        else:
            raise TypeError("Wedge should have exactly 2 values")

    indices = get_annular_wedge(pca_res, inner_radius=radius_int,
                                width=min(annulus_width, 2 * fwhm),
                                wedge=wedge)
    yy, xx = indices
    if f_guess is not None and psfn is not None:
        indices_inv = get_annular_wedge(pca_res_inv,
                                        inner_radius=radius_int,
                                        width=min(annulus_width, 2 * fwhm))
        yyi, xxi = indices_inv
        all_res = np.concatenate((pca_res[yy, xx], pca_res_inv[yyi, xxi]))
        npx = len(yy) + len(yyi)
    else:
        all_res = pca_res[yy, xx]
        npx = len(yy)
    mu = np.nanmean(all_res)
    all_res = all_res - mu
    area = np.pi * (fwhm / 2) ** 2
    ddof = min(int(npx * (1.0 - (1.0 / area))), npx - 1)
    sigma = np.nanstd(all_res, ddof=ddof)
    return mu, sigma


def hessian(array):
    """Hessian matrix by finite differences (negfc_fmerit.py:1019-1045)."""
    grad = np.gradient(array)
    hess = np.empty((array.ndim, array.ndim) + array.shape,
                    dtype=array.dtype)
    for k, grad_k in enumerate(grad):
        tmp_grad = np.gradient(grad_k)
        for m, grad_km in enumerate(tmp_grad):
            hess[k, m, :, :] = grad_km
    return hess
