"""Fake-companion injection and PSF normalization.

TPU rebuild of vip_hci/fm/fakecomp.py. Injection keeps the reference's
split of the shift into an integer part (placement in the big frame) and a
sub-pixel part (FFT shift of the small PSF stamp; fakecomp.py:320-375), but
the per-frame sub-pixel shifts of a whole cube run as ONE batched device
FFT instead of a persistent fork pool (fakecomp.py:155-161).
"""

import numpy as np
import jax.numpy as jnp
from scipy.interpolate import interp1d

from ..config.utils_conf import check_array
from ..ops.fft import fourier_shift_batch
from ..preproc.cosmetics import cube_crop_frames, frame_crop
from ..preproc.derotation import frame_rotate
from ..preproc.recentering import frame_shift
from ..var.coords import dist_matrix, frame_center
from ..var.fit_2d import fit_2dairydisk, fit_2dgaussian, fit_2dmoffat
from ..var.shapes import get_annulus_segments, get_circle

__all__ = ["cube_inject_companions", "generate_cube_copies_with_injections",
           "frame_inject_companion", "collapse_psf_cube", "normalize_psf",
           "cube_planet_free"]


def _centroid_com(data):
    d = np.asarray(data, dtype=float)
    total = d.sum()
    yy, xx = np.mgrid[: d.shape[0], : d.shape[1]]
    return (d * xx).sum() / total, (d * yy).sum() / total


def _inject_batched_subpx(array_out, fc_fr, angle_list, rad, ang, flevel,
                          imlib_sh):
    """Shift-add the PSF stamps for all frames: batched FFT sub-px shift of
    the stamps + integer placement (parity with _frame_shift_fcp,
    fakecomp.py:320-375)."""
    nframes = array_out.shape[0]
    sizey, sizex = array_out.shape[-2:]
    size_fc = fc_fr.shape[-1]
    ceny, cenx = frame_center(array_out[0])

    w = int(np.ceil(size_fc / 2))
    if size_fc % 2:
        w -= 1
    sty = int(ceny) - w
    stx = int(cenx) - w

    shift_y = rad * np.sin(ang - np.deg2rad(angle_list))
    shift_x = rad * np.cos(ang - np.deg2rad(angle_list))
    dsy = shift_y - shift_y.astype(int)
    dsx = shift_x - shift_x.astype(int)

    if imlib_sh == "vip-fft":
        # group by pad margin (ceil of max |subpx shift|, always 1 here)
        shifted = np.asarray(fourier_shift_batch(
            jnp.asarray(fc_fr), jnp.asarray(dsy), jnp.asarray(dsx), 1))
    else:
        shifted = np.stack([
            frame_shift(fc_fr[fr], dsy[fr], dsx[fr], imlib=imlib_sh,
                        border_mode="constant")
            for fr in range(nframes)
        ])

    for fr in range(nframes):
        y0 = sty + int(shift_y[fr])
        x0 = stx + int(shift_x[fr])
        yN = y0 + size_fc
        xN = x0 + size_fc
        p_y0 = p_x0 = 0
        p_yN = p_xN = size_fc
        if y0 < 0:
            p_y0 = -y0
            y0 = 0
        if x0 < 0:
            p_x0 = -x0
            x0 = 0
        if yN > sizey:
            p_yN -= yN - sizey
            yN = sizey
        if xN > sizex:
            p_xN -= xN - sizex
            xN = sizex
        array_out[fr, y0:yN, x0:xN] += \
            flevel[fr] * shifted[fr, p_y0:p_yN, p_x0:p_xN]
    return array_out


def cube_inject_companions(array, psf_template, angle_list, flevel, rad_dists,
                           plsc=None, n_branches=1, theta=0, imlib="vip-fft",
                           interpolation="lanczos4", transmission=None,
                           radial_gradient=False, full_output=False,
                           verbose=False, nproc=1, copy_array=True):
    """Inject fake companions on branches and radial distances
    (reference fakecomp.py:30-317)."""
    check_array(array, dim=(3, 4), msg="array")
    check_array(psf_template, dim=(2, 3), msg="psf_template")

    nframes = array.shape[-3]
    pceny, pcenx = frame_center(psf_template)

    if array.ndim == 4 and psf_template.ndim != 3:
        raise ValueError("`psf_template` must be a 3d array")
    if not np.isscalar(flevel):
        if len(np.asarray(flevel).reshape(-1)) not in (array.shape[0],
                                                       nframes):
            raise TypeError("if not scalar `flevel` must have same length as "
                            "array")

    if imlib == "opencv":
        imlib_sh = imlib_rot = imlib
    elif imlib in ("skimage", "ndimage-interp"):
        imlib_sh = "ndimage-interp"
        imlib_rot = "skimage"
    elif imlib in ("vip-fft", "ndimage-fourier"):
        imlib_sh = imlib
        imlib_rot = "vip-fft"
    else:
        raise TypeError("Interpolation not recognized.")

    rad_dists = np.asarray(rad_dists).reshape(-1)
    if not rad_dists[-1] < array.shape[-1] / 2:
        raise ValueError("rad_dists last location is at the border (or "
                         "outside) of the field")

    if transmission is not None:
        transmission = np.asarray(transmission, dtype=float)
        t_nz = transmission.shape[0]
        if transmission.ndim != 2:
            raise ValueError("transmission should be a 2D ndarray")
        elif t_nz != 2 and t_nz != 1 + array.shape[0]:
            raise ValueError("transmission dimensions should be (2,N) or "
                             "(n_wave+1, N)")
        # extend transmission to cover [0, diag] (fakecomp.py:220-239)
        diag = np.sqrt(2) * array.shape[-1]
        if transmission[0, 0] != 0 or transmission[0, -1] < diag:
            trans_rad_list = transmission[0].tolist()
            ntransmission = None
            for j in range(t_nz - 1):
                trans_list = transmission[j + 1].tolist()
                if transmission[0, 0] != 0:
                    if j == 0:
                        trans_rad_list = [0] + trans_rad_list
                    trans_list = [0] + trans_list
                if transmission[0, -1] < np.sqrt(2) * array.shape[-1] / 2:
                    if j == 0:
                        trans_rad_list = trans_rad_list + [diag]
                    trans_list = trans_list + [1]
                if j == 0:
                    ntransmission = np.zeros([t_nz, len(trans_rad_list)])
                    ntransmission[0] = trans_rad_list
                ntransmission[j + 1] = trans_list
            transmission = ntransmission.copy()

    def _cube_inject_adi(array, psf_template, angle_list, flevel, rad_dists,
                         n_branches, theta, transmission, radial_gradient,
                         verbose, copy_array):
        if np.isscalar(flevel):
            flevel = np.ones_like(angle_list) * flevel
        flevel = np.asarray(flevel, dtype=float)

        if transmission is not None:
            interp_trans = interp1d(transmission[0], transmission[1])
        ceny, cenx = frame_center(array[0])
        size_fc = psf_template.shape[-1]

        fc_fr = np.zeros([nframes, size_fc, size_fc])
        if psf_template.ndim == 2:
            fc_fr[:] = psf_template
        else:
            fc_fr[:] = psf_template[:nframes]

        psf_trans = None
        array_out = array.copy() if copy_array else array
        positions = []

        for branch in range(n_branches):
            ang = (branch * 2 * np.pi / n_branches) + np.deg2rad(theta)
            if verbose:
                print(f"Branch {branch + 1}:")
            for rad in rad_dists:
                fc_fr_rad = fc_fr.copy()
                if transmission is not None:
                    if radial_gradient:
                        y_star = pceny
                        x_star = pcenx - rad
                        d = dist_matrix(size_fc, x_star, y_star)
                        for i in range(d.shape[0]):
                            fc_fr_rad[:, i] = interp_trans(d[i]) * fc_fr[:, i]
                        psf_trans = frame_rotate(
                            fc_fr_rad[0],
                            -(ang * 180 / np.pi - angle_list[0]),
                            imlib=imlib_rot, interpolation=interpolation)
                    else:
                        fc_fr_rad = interp_trans(rad) * fc_fr

                if transmission is not None and radial_gradient:
                    # per-frame rotation of the gradient stamp (host loop)
                    for fr in range(nframes):
                        stamp = frame_rotate(
                            fc_fr_rad[fr],
                            -(ang * 180 / np.pi - angle_list[fr]),
                            imlib=imlib_rot, interpolation=interpolation)
                        array_out[fr:fr + 1] = _inject_batched_subpx(
                            array_out[fr:fr + 1], stamp[None],
                            angle_list[fr:fr + 1], rad, ang,
                            flevel[fr:fr + 1], imlib_sh)
                else:
                    array_out = _inject_batched_subpx(
                        array_out, fc_fr_rad, angle_list, rad, ang, flevel,
                        imlib_sh)

                pos_y = rad * np.sin(ang) + ceny
                pos_x = rad * np.cos(ang) + cenx
                positions.append((pos_y, pos_x))
                if verbose:
                    print(f"\t(X,Y)=({pos_x:.2f}, {pos_y:.2f}) "
                          f"({rad:.2f} pxs from center)")
        return array_out, positions, psf_trans

    if array.ndim == 3:
        array_out, positions, psf_trans = _cube_inject_adi(
            np.asarray(array, dtype=float), np.asarray(psf_template, float),
            np.asarray(angle_list, float), flevel, rad_dists, n_branches,
            theta, transmission, radial_gradient, verbose, copy_array)
    else:
        nframes_wav = array.shape[0]
        array_out = np.asarray(array, dtype=float).copy()
        if np.isscalar(flevel):
            flevel_all = np.ones([nframes_wav, nframes]) * flevel
        elif np.asarray(flevel).ndim == 1:
            flevel_all = np.tile(np.asarray(flevel, float)[:, None],
                                 (1, nframes))
        else:
            flevel_all = np.asarray(flevel, float)
        for i in range(nframes_wav):
            if verbose:
                print(f"*** Processing spectral channel {i + 1}/"
                      f"{nframes_wav} ***")
            if transmission is None:
                trans = None
            elif transmission.shape[0] == 2:
                trans = transmission
            else:
                trans = np.array([transmission[0], transmission[i + 1]])
            res = _cube_inject_adi(
                array_out[i], np.asarray(psf_template[i], float),
                np.asarray(angle_list, float), flevel_all[i], rad_dists,
                n_branches, theta, trans, radial_gradient,
                verbose=(i == 0 and verbose), copy_array=False)
            array_out[i], positions, psf_trans = res

    if full_output:
        if transmission is not None:
            return array_out, positions, psf_trans
        return array_out, positions
    return array_out


def generate_cube_copies_with_injections(array, psf_template, angle_list,
                                         plsc, n_copies=100, inrad=8,
                                         outrad=12,
                                         dist_flux=("uniform", 2, 500)):
    """Generator of cube copies with random injections
    (reference fakecomp.py:376-472)."""
    from scipy import stats

    width = outrad - inrad
    yy, xx = get_annulus_segments(array[0] if array.ndim == 3
                                  else array[0, 0], inrad, width)[0]
    num_patches = yy.shape[0]

    dist_fkt = dict(skewnormal=stats.skewnorm.rvs,
                    normal=np.random.normal,
                    uniform=np.random.uniform).get(dist_flux[0], dist_flux[0])
    fluxes = sorted(dist_fkt(*dist_flux[1:], size=n_copies))
    inds_inj = np.random.randint(0, num_patches, size=n_copies)

    for n in range(n_copies):
        injx = xx[inds_inj[n]] - frame_center(array[0])[1]
        injy = yy[inds_inj[n]] - frame_center(array[0])[0]
        d = np.sqrt(injx**2 + injy**2)
        theta = np.mod(np.arctan2(injy, injx) / np.pi * 180, 360)
        fake_cube, positions = cube_inject_companions(
            array, psf_template, angle_list, plsc=plsc, flevel=fluxes[n],
            theta=theta, rad_dists=d, n_branches=1, full_output=True,
            verbose=False)
        yield dict(positions=positions, dist=d, theta=theta, flux=fluxes[n],
                   cube=fake_cube)


def frame_inject_companion(array, array_fc, pos_y, pos_x, flux,
                           imlib="vip-fft", interpolation="lanczos4"):
    """Inject a companion image at given coordinates in a frame or cube
    (reference fakecomp.py:473-533)."""
    from ..preproc.recentering import cube_shift

    array = np.asarray(array, dtype=float)
    if array.ndim not in (2, 3):
        raise TypeError("Array is not a 2d or 3d array.")
    if array.ndim == 2:
        size_fc = array_fc.shape[0]
        ceny, cenx = frame_center(array)
        ceny = int(ceny)
        cenx = int(cenx)
        fc_fr = np.zeros_like(array)
        w = int(np.floor(size_fc / 2.0))
        odd = size_fc % 2
        fc_fr[ceny - w:ceny + w + odd, cenx - w:cenx + w + odd] = array_fc
        return array + frame_shift(fc_fr, pos_y - ceny, pos_x - cenx, imlib,
                                   interpolation) * flux
    size_fc = array_fc.shape[1] if np.asarray(array_fc).ndim > 1 \
        else array_fc.shape[0]
    ceny, cenx = frame_center(array[0])
    ceny = int(ceny)
    cenx = int(cenx)
    fc_fr = np.zeros_like(array)
    w = int(np.floor(size_fc / 2.0))
    odd = size_fc % 2
    fc_fr[:, ceny - w:ceny + w + odd, cenx - w:cenx + w + odd] = array_fc
    return array + cube_shift(fc_fr, pos_y - ceny, pos_x - cenx, imlib,
                              interpolation) * flux


def collapse_psf_cube(array, size, fwhm=4, verbose=True, collapse="mean"):
    """2d PSF template from a cube of off-axis frames
    (reference fakecomp.py:534-576)."""
    if array.ndim != 3 and array.ndim != 4:
        raise TypeError("Array is not a cube, 3d or 4d array")

    n = array.shape[0]
    psf = cube_crop_frames(array, size=size, verbose=verbose)
    if collapse == "mean":
        psf = np.mean(psf, axis=0)
    elif collapse == "median":
        psf = np.median(psf, axis=0)
    else:
        raise TypeError("Collapse mode not recognized")
    psf_norm = normalize_psf(psf, fwhm=fwhm)
    if verbose:
        print(f"Done scaled PSF template from the average of {n} frames")
    return psf_norm


def normalize_psf(array, fwhm="fit", size=None, threshold=None,
                  mask_core=None, model="gauss", imlib="vip-fft",
                  interpolation="lanczos4", force_odd=True,
                  correct_outliers=True, full_output=False, verbose=True,
                  debug=False):
    """Normalize the PSF: odd-size crop, sub-px centering (iterative 2d fit
    + FFT shift), flux in 1-FWHM aperture scaled to 1
    (reference fakecomp.py:577-824)."""
    from ..ops.apertures import aperture_flux

    if model == "gauss":
        fit_2d = fit_2dgaussian
    elif model == "moff":
        fit_2d = fit_2dmoffat
    elif model == "airy":
        fit_2d = fit_2dairydisk
    else:
        raise ValueError("`Model` not recognized")

    def psf_norm_2d(psf, fwhm, threshold, mask_core, full_output, verbose):
        cy, cx = frame_center(psf, verbose=False)
        xcom, ycom = _centroid_com(psf)
        if not (np.allclose(cy, ycom, atol=1e-2)
                or np.allclose(cx, xcom, atol=1e-2)):
            centry, centrx = fit_2d(psf, full_output=False, debug=False)
            if not np.isnan(centry) and not np.isnan(centrx):
                shiftx, shifty = centrx - cx, centry - cy
                psf = frame_shift(psf, -shifty, -shiftx, imlib=imlib,
                                  interpolation=interpolation)
                for _ in range(2):
                    centry, centrx = fit_2d(psf, full_output=False,
                                            debug=False)
                    if np.isnan(centry) or np.isnan(centrx):
                        break
                    cy, cx = frame_center(psf, verbose=False)
                    shiftx, shifty = centrx - cx, centry - cy
                    psf = frame_shift(psf, -shifty, -shiftx, imlib=imlib,
                                      interpolation=interpolation)

        fwhm_flux = float(np.asarray(aperture_flux(
            jnp.asarray(np.asarray(psf, float)), np.array([cy], float),
            np.array([cx], float), fwhm / 2))[0])

        if fwhm_flux > 1.1 or fwhm_flux < 0.9:
            psf_norm_array = psf / fwhm_flux
        else:
            psf_norm_array = psf
        if threshold is not None:
            psf_norm_array[np.where(psf_norm_array < threshold)] = 0
        if mask_core is not None:
            psf_norm_array = get_circle(psf_norm_array, radius=mask_core)
        if verbose:
            print(f"Flux in 1xFWHM aperture: {fwhm_flux:.3f}")
        if full_output:
            return psf_norm_array, fwhm_flux, fwhm
        return psf_norm_array

    array = np.asarray(array, dtype=float)
    if array.ndim == 2:
        y, x = array.shape
        if size is not None:
            if force_odd and size % 2 == 0:
                size += 1
                print(f"`Force_odd` is True therefore `size` was set to "
                      f"{size}")
        else:
            if force_odd and y % 2 == 0:
                size = y - 1
                print("`Force_odd` is True and frame size is even, therefore "
                      f"new frame size was set to {size}")
        if size is not None and size < array.shape[0]:
            array = frame_crop(array, size, force=True, verbose=False)
        else:
            array = array.copy()

        if not np.isscalar(fwhm) and fwhm != "fit":
            raise ValueError("For a 2d input array, fwhm should be a scalar "
                             "or string.")
        if isinstance(fwhm, str) and fwhm == "fit":
            fit = fit_2d(array, full_output=True, debug=debug)
            if model == "gauss":
                fwhm = float(np.mean((fit["fwhm_x"], fit["fwhm_y"])))
                if verbose:
                    print(f"\nMean FWHM: {fwhm:.3f}")
            else:
                fwhm = float(fit["fwhm"].iloc[0])
                if verbose:
                    print(f"FWHM: {fwhm:.3f}")
        return psf_norm_2d(array, fwhm, threshold, mask_core, full_output,
                           verbose)

    elif array.ndim == 3:
        n, y, x = array.shape
        if size is not None:
            if force_odd and size % 2 == 0:
                size += 1
                print(f"`Force_odd` is True therefore `size` was set to "
                      f"{size}")
        else:
            if force_odd and y % 2 == 0:
                size = y - 1
                print("`Force_odd` is True and frame size is even, therefore "
                      f"new frame size was set to {size}")
        if size is not None and size < array.shape[1]:
            array = cube_crop_frames(array, size, force=True, verbose=False)

        if np.isscalar(fwhm):
            fwhm = [fwhm] * array.shape[0]
        elif isinstance(fwhm, str) and fwhm == "fit":
            fits_vect = [fit_2d(array[i], full_output=True, debug=debug)
                         for i in range(n)]
            if model == "gauss":
                fwhm = np.array([
                    np.mean((fits_vect[i]["fwhm_x"], fits_vect[i]["fwhm_y"]))
                    for i in range(n)
                ])
            else:
                fwhm = np.array([float(fits_vect[i]["fwhm"].iloc[0])
                                 for i in range(n)]).flatten()
            if correct_outliers and np.sum(np.isnan(fwhm)) > 0:
                for f in range(n):
                    if np.isnan(fwhm[f]) and f != 0 and f != n - 1:
                        fwhm[f] = np.nanmean([fwhm[f - 1], fwhm[f + 1]])
                    elif np.isnan(fwhm[f]):
                        raise ValueError("2D fit failed for first or last "
                                         "channel. Try other parameters?")
        elif len(fwhm) != array.shape[0]:
            raise ValueError(f"If fwhm is a list/1darray it should have a "
                             f"length of {array.shape[0]}")

        array_out = []
        fwhm_flux = np.zeros(n)
        for fr in range(array.shape[0]):
            restemp = psf_norm_2d(array[fr], fwhm[fr], threshold, mask_core,
                                  True, False)
            array_out.append(restemp[0])
            fwhm_flux[fr] = restemp[1]
        array_out = np.array(array_out)
        if verbose:
            print("Flux in 1xFWHM aperture: ")
            print(fwhm_flux)
        if full_output:
            return array_out, fwhm_flux, np.asarray(fwhm)
        return array_out
    raise ValueError("Input psf should be 2D or 3D.")


def cube_planet_free(planet_parameter, cube, angs, psfn, imlib="vip-fft",
                     interpolation="lanczos4", transmission=None,
                     radial_gradient=False):
    """Inject negative companions at known (r, theta, flux)
    (reference fakecomp.py:825-917)."""
    cpf = np.zeros_like(cube)
    planet_parameter = np.array(planet_parameter)
    cond1 = cube.ndim == 3 and planet_parameter.ndim < 2
    cond2 = cube.ndim == 4 and planet_parameter.ndim < 3
    if cond1 or cond2:
        planet_parameter = planet_parameter[np.newaxis, :]

    if cube.ndim == 4 and planet_parameter.shape[2] != cube.shape[0]:
        raise TypeError("Input planet parameter with wrong dimensions.")

    for i in range(planet_parameter.shape[0]):
        cube_temp = cube if i == 0 else cpf
        if cube.ndim == 4:
            for j in range(cube.shape[0]):
                cpf[j] = cube_inject_companions(
                    cube_temp[j], psfn[j], angs,
                    flevel=-planet_parameter[i, 2, j],
                    rad_dists=[planet_parameter[i, 0, j]], n_branches=1,
                    theta=planet_parameter[i, 1, j], imlib=imlib,
                    interpolation=interpolation, verbose=False,
                    transmission=transmission,
                    radial_gradient=radial_gradient)
        else:
            cpf = cube_inject_companions(
                cube_temp, psfn, angs, n_branches=1,
                flevel=-planet_parameter[i, 2],
                rad_dists=[planet_parameter[i, 0]],
                theta=planet_parameter[i, 1], imlib=imlib, verbose=False,
                interpolation=interpolation, transmission=transmission,
                radial_gradient=radial_gradient)
    return cpf
