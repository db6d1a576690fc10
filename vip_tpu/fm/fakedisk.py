"""Fake disk injection (reference vip_hci/fm/fakedisk.py)."""

import numpy as np
from scipy.signal import fftconvolve

from ..preproc.derotation import cube_derotate
from ..preproc.recentering import frame_shift
from ..var.coords import dist_matrix, frame_center

__all__ = ["cube_inject_fakedisk", "cube_inject_trace"]


def cube_inject_fakedisk(fakedisk, angle_list, psf=None, transmission=None,
                         normalize_psf=True, **rot_options):
    """Rotate a disk model to each PA and optionally convolve with the PSF
    (reference fakedisk.py:16-114)."""
    fakedisk = np.asarray(fakedisk, dtype=float).copy()
    if not fakedisk.ndim == 2:
        raise TypeError("Fakedisk is not a frame or a 2d array.")
    angle_list = np.asarray(angle_list)
    if not angle_list.ndim == 1:
        raise TypeError("Input parallactic angle is not a 1d array")

    if transmission is not None:
        if transmission.ndim != 2:
            raise ValueError("transmission should be a 2D ndarray")
        y_star, x_star = frame_center(fakedisk)
        d = dist_matrix(fakedisk.shape[-1], x_star, y_star)
        interp_trans = np.interp(d, transmission[0], transmission[1],
                                 left=0, right=1)
        fakedisk *= interp_trans

    nframes = len(angle_list)
    fakedisk_cube = np.repeat(fakedisk[np.newaxis, :, :], nframes, axis=0)
    fakedisk_cube = cube_derotate(fakedisk_cube, -angle_list, **rot_options)

    if psf is not None:
        if isinstance(psf, np.ndarray):
            if psf.ndim != 2:
                raise TypeError("Input PSF is not a frame or 2d array.")
            if np.abs(np.sum(psf) - 1) > 1e-4 and normalize_psf:
                print("Warning the PSF is not normalized to a total of 1. "
                      "Normalization was forced.")
                psf = psf / np.sum(psf)
        elif isinstance(psf, (int, float)):
            psf_size = 2 * int(np.round(psf)) + 1
            xarr, yarr = np.meshgrid(
                np.arange(-(psf_size // 2), psf_size // 2 + 1),
                np.arange(-(psf_size // 2), psf_size // 2 + 1))
            d = np.sqrt(xarr**2 + yarr**2)
            sigma = psf / (2 * np.sqrt(2 * np.log(2)))
            psf = np.exp(-(d**2 / (2.0 * sigma**2)))
            psf = psf / np.sum(psf)
        else:
            raise TypeError("The type of the psf is unknown. "
                            "cube_inject_fakedisk accepts ndarray, int or "
                            "float.")
        for i in range(nframes):
            fakedisk_cube[i] = fftconvolve(fakedisk_cube[i], psf,
                                           mode="same")
    return fakedisk_cube


def cube_inject_trace(array, psf_template, angle_list, flevel, rad_dists,
                      theta, plsc=0.01225, n_branches=1, imlib="vip-fft",
                      interpolation="lanczos4", verbose=True):
    """Inject the PSF at a trace of polar positions (fakedisk.py:115-241)."""
    array = np.asarray(array, dtype=float)
    if not array.ndim == 3:
        raise TypeError("Array is not a cube or 3d array")

    ceny, cenx = frame_center(array[0])
    ceny = int(ceny)
    cenx = int(cenx)
    rad_dists = np.asarray(rad_dists).reshape(-1)
    theta = np.asarray(theta).reshape(-1)
    if not rad_dists.max() < array[0].shape[0] / 2:
        raise ValueError("rad_dists last location is at the border (or "
                         "outside) of the field")

    size_fc = psf_template.shape[0]
    nframes = array.shape[0]
    fc_fr = np.zeros_like(array[0])
    w = int(np.floor(size_fc / 2.0))
    odd = size_fc % 2
    fc_fr[ceny - w:ceny + w + odd, cenx - w:cenx + w + odd] = psf_template

    array_out = array.copy()
    for branch in range(n_branches):
        ang0 = branch * 2 * np.pi / n_branches
        for i in range(rad_dists.shape[0]):
            rad = rad_dists[i]
            ang = ang0 + np.deg2rad(theta[i])
            for fr in range(nframes):
                y = rad * np.sin(ang - np.deg2rad(angle_list[fr]))
                x = rad * np.cos(ang - np.deg2rad(angle_list[fr]))
                array_out[fr] += frame_shift(fc_fr, y, x, imlib,
                                             interpolation) * flevel
            if verbose:
                posy = rad * np.sin(ang) + ceny
                posx = rad * np.cos(ang) + cenx
                print(f"Branch {branch + 1}, point {i + 1}: "
                      f"(X,Y)=({posx:.2f}, {posy:.2f})")
    return array_out
