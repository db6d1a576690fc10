"""Shared helpers for the greedy/iterative algorithms.

STIM-based significant-signal identification and masked gaussian blurring
(duplicated in the reference at ipca_fullfr.py:362-428,
inmf_fullfr.py:270-324, irollsub.py:101-126 — factored out here).
"""

import numpy as np

from ..metrics.stim import inverse_stim_map, stim_map
from ..var.filters import frame_filter_lowpass
from ..var.shapes import mask_circle

__all__ = ["find_significant_signals", "blurring_2d", "blurring_3d"]


def find_significant_signals(residuals_cube, residuals_cube_, angle_list,
                             thr, mask=0, r_out=None, r_max=None):
    """Mask of significant signals from the (normalized) STIM map."""
    stim = stim_map(residuals_cube_)
    inv_stim = inverse_stim_map(residuals_cube, angle_list)
    if mask:
        inv_stim = mask_circle(inv_stim, mask)
    max_inv = np.amax(inv_stim)
    if max_inv == 0:
        max_inv = 1
    if thr == "auto":
        if r_out is None:
            r_out = residuals_cube.shape[-1] // 4
        if r_max is None:
            r_max = residuals_cube.shape[-1] // 2
        inv_stim_rout = mask_circle(inv_stim, r_out)
        inv_stim_rmax = mask_circle(inv_stim_rout, r_max, mode="out")
        thr = np.amax(inv_stim_rmax) / max_inv
    norm_stim = stim / max_inv
    good_mask = np.zeros_like(stim)
    good_mask[np.where(norm_stim > thr)] = 1
    return good_mask, norm_stim


def blurring_2d(array, mask_center_sz, fwhm_sz=2):
    """Gaussian blur, optionally only outside a central mask."""
    if mask_center_sz:
        frame_mask = mask_circle(array, radius=mask_center_sz + fwhm_sz,
                                 fillwith=np.nan, mode="out")
        frame_mask2 = mask_circle(array, radius=mask_center_sz,
                                  fillwith=np.nan, mode="out")
        if np.isscalar(fwhm_sz):
            frame_filt = frame_filter_lowpass(frame_mask, mode="gauss",
                                              fwhm_size=fwhm_sz,
                                              iterate=False)
        else:
            frame_filt = frame_filter_lowpass(frame_mask, mode="psf",
                                              psf=fwhm_sz, iterate=False)
        nonan_loc = np.where(np.isfinite(frame_mask2))
        array = array.copy()
        array[nonan_loc] = frame_filt[nonan_loc]
        return array
    if np.isscalar(fwhm_sz):
        return frame_filter_lowpass(array, mode="gauss", fwhm_size=fwhm_sz,
                                    iterate=False)
    return frame_filter_lowpass(array, mode="psf", psf=fwhm_sz,
                                iterate=False)


def blurring_3d(array, mask_center_sz, fwhm_sz=2):
    """Per-frame :func:`blurring_2d`."""
    bl_array = np.zeros_like(array)
    for i in range(array.shape[0]):
        bl_array[i] = blurring_2d(array[i], mask_center_sz, fwhm_sz)
    return bl_array
