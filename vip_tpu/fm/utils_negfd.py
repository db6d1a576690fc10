"""Utility functions for the NEGFD (negative fake disk) algorithm
(reference vip_hci/fm/utils_negfd.py)."""

import numpy as np

from ..preproc.cosmetics import cube_crop_frames, frame_pad
from ..preproc.derotation import cube_derotate, frame_rotate
from ..preproc.recentering import cube_shift, frame_shift
from ..preproc.rescaling import frame_rescaling
from .fakedisk import cube_inject_fakedisk

__all__ = ["cube_disk_free"]


def cube_disk_free(disk_parameter, cube, derot_angs, disk_img, psfn=None,
                   imlib="vip-fft", interpolation="lanczos4",
                   imlib_sh="vip-fft", interpolation_sh="lanczos4",
                   imlib_sc="vip-fft", interpolation_sc="lanczos4",
                   transmission=None, weights=None, **rot_options):
    """Subtract a shifted/rotated/rescaled/flux-scaled disk model from a cube.

    ``disk_parameter`` is (delta_x, delta_y, theta, scal, flux); for a 4D
    cube it may be (5, n_ch)-shaped (reference utils_negfd.py:24-243).
    """
    cdf = np.zeros_like(cube)
    disk_model_tmp = np.asarray(disk_img, dtype=float).copy()

    if not isinstance(disk_parameter, np.ndarray):
        if len(disk_parameter) != 5:
            raise TypeError("Wrong length for disk_parameter")

    if cube.ndim == 4:
        if np.isscalar(disk_parameter[-1]) or \
                len(np.atleast_1d(disk_parameter[-1])) != cube.shape[0]:
            raise ValueError("Length of flux scaling parameter should match "
                             "cube axis 0")
        if not isinstance(disk_parameter, np.ndarray) or \
                disk_parameter.ndim < 2:
            ndisk_parameter = np.zeros([5, cube.shape[0]])
            for j in range(5):
                ndisk_parameter[j, :] = disk_parameter[j]
            disk_parameter = ndisk_parameter
        else:
            disk_parameter = np.array(disk_parameter)
            if disk_parameter.shape[-1] != cube.shape[0]:
                raise TypeError("Input disk parameter has wrong dimensions")

        if disk_model_tmp.ndim == 2:
            disk_model_tmp = np.array([disk_model_tmp] * cube.shape[0])
        if psfn is None:
            psfn = [None] * cube.shape[0]

        delta_x = disk_parameter[0, :]
        delta_y = disk_parameter[1, :]
        theta = disk_parameter[2, :]
        disk_model_tmp = cube_shift(disk_model_tmp, delta_y, delta_x,
                                    imlib=imlib_sh,
                                    interpolation=interpolation_sh)
        angs = np.array(theta)
        disk_model_tmp = cube_derotate(disk_model_tmp, -angs, imlib=imlib,
                                       interpolation=interpolation,
                                       **rot_options)
        for j in range(cube.shape[0]):
            sc = disk_parameter[3, j]
            frame_j = frame_rescaling(disk_model_tmp[j], scale=sc,
                                      imlib=imlib_sc,
                                      interpolation=interpolation_sc)
            flevel = disk_parameter[4, j]
            disk_rot = cube_inject_fakedisk(flevel * frame_j, derot_angs,
                                            psf=psfn[j],
                                            transmission=transmission,
                                            **rot_options)
            if weights is not None:
                if len(weights) != cube.shape[1]:
                    raise TypeError("weights length should match cube axis 1")
                disk_rot *= np.asarray(weights)[:, None, None]
            disk_rot = _match_fov(disk_rot, cube.shape[-1])
            cdf[j] = cube[j] - disk_rot
    else:
        delta_x, delta_y, theta, sc, flevel = (disk_parameter[0],
                                               disk_parameter[1],
                                               disk_parameter[2],
                                               disk_parameter[3],
                                               disk_parameter[4])
        disk_model_tmp = frame_shift(disk_model_tmp, delta_y, delta_x,
                                     imlib=imlib_sh,
                                     interpolation=interpolation_sh)
        disk_model_tmp = frame_rotate(disk_model_tmp, theta, imlib=imlib,
                                      interpolation=interpolation,
                                      **rot_options)
        disk_model_tmp = frame_rescaling(disk_model_tmp, scale=sc,
                                         imlib=imlib_sc,
                                         interpolation=interpolation_sc)
        disk_rot = cube_inject_fakedisk(flevel * disk_model_tmp, derot_angs,
                                        psf=psfn, transmission=transmission,
                                        **rot_options)
        if weights is not None:
            if len(weights) != cube.shape[0]:
                raise TypeError("weights length should match cube axis 0")
            disk_rot *= np.asarray(weights)[:, None, None]
        disk_rot = _match_fov(disk_rot, cube.shape[-1])
        cdf = cube - disk_rot
    return cdf


def _match_fov(disk_rot, target_size):
    """Pad or crop a rotated disk cube to the cube field of view
    (reference utils_negfd.py:174-239)."""
    if disk_rot.shape[-1] < target_size:
        pad_fac = target_size / disk_rot.shape[-1]
        out = np.zeros((disk_rot.shape[0], target_size, target_size))
        for i in range(disk_rot.shape[0]):
            out[i] = frame_pad(disk_rot[i], pad_fac, fillwith=0,
                               keep_parity=False, full_output=False)
        return out
    if disk_rot.shape[-1] > target_size:
        return cube_crop_frames(disk_rot, target_size, force=True,
                                verbose=False)
    return disk_rot
