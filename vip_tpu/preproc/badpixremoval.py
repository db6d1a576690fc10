"""Bad-pixel identification and correction
(reference vip_hci/preproc/badpixremoval.py).

The FFT-based iterative interpolation ([AAC01]) replaces the reference's
per-pixel numba loop with vectorized rolls; the sigma filters follow the
reference's (numba-variant) math exactly.
"""

import numpy as np
from scipy.ndimage import median_filter

from ..config import time_ini, timing
from ..stats.clip_sigma import clip_array, sigma_filter
from ..var.coords import dist_matrix, frame_center
from ..var.shapes import get_annulus_segments
from .cosmetics import frame_pad

__all__ = ["frame_fix_badpix_isolated", "cube_fix_badpix_isolated",
           "cube_fix_badpix_annuli", "cube_fix_badpix_clump",
           "cube_fix_badpix_ifs", "cube_fix_badpix_interp",
           "frame_fix_badpix_fft"]


def _disk_idx(center, radius, shape):
    """skimage.draw.disk equivalent (strict < radius)."""
    cy, cx = center
    yy, xx = np.mgrid[:shape[0], :shape[1]]
    return np.where((yy - cy)**2 + (xx - cx)**2 < radius**2)


def _ellipse_idx(r, c, r_radius, c_radius, shape):
    """skimage.draw.ellipse equivalent (strict < 1)."""
    yy, xx = np.mgrid[:shape[0], :shape[1]]
    return np.where(((yy - r) / r_radius)**2 + ((xx - c) / c_radius)**2 < 1)


def _sigma_clipped_std(data, sigma=2.5, maxiters=5):
    """Stddev of sigma-clipped data (astropy sigma_clipped_stats
    equivalent, clipping about the median)."""
    d = np.asarray(data, dtype=float).ravel()
    d = d[np.isfinite(d)]
    for _ in range(maxiters):
        med = np.median(d)
        std = np.std(d)
        keep = np.abs(d - med) <= sigma * std
        if keep.all():
            break
        d = d[keep]
    return np.std(d)



def _check_bpix_args(ndim_ok, array, size=None, correct_only=False,
                     bpm_mask=None, match_full_shape=True):
    """Shared argument validation for the bad-pixel correctors: dims,
    odd median-kernel size, correct_only/bpm consistency; returns the
    boolean-cast bad-pixel map."""
    if array.ndim not in ndim_ok:
        raise TypeError(f"Array is not {ndim_ok}-dimensional")
    if size is not None and size % 2 == 0:
        raise TypeError("Size of the median blur kernel must be an odd "
                        "integer")
    if correct_only and bpm_mask is None:
        raise ValueError("Bad pixel map should be provided if correct_only "
                         "is True.")
    if bpm_mask is not None:
        want = array.shape if match_full_shape else array.shape[-2:]
        if bpm_mask.shape[-2:] != want[-2:]:
            raise AssertionError("Input bad pixel mask should match the "
                                 "frame shape")
        bpm_mask = bpm_mask.astype(bool)
    return bpm_mask


def frame_fix_badpix_isolated(array, bpm_mask=None, correct_only=False,
                              sigma_clip=3, num_neig=5, size=5,
                              protect_mask=0, cxy=None, mad=False,
                              ignore_nan=True, verbose=True,
                              full_output=False, excl_mask=None):
    """Sigma-clip isolated bad pixels of a frame and replace them with the
    local median (reference badpixremoval.py:61-187)."""
    if array.ndim != 2:
        raise TypeError("Array is not a 2d array or single frame")
    bpm_mask = _check_bpix_args((2,), array, size, correct_only, bpm_mask)
    if excl_mask is None:
        excl_mask = np.zeros(array.shape, dtype=bool)
    else:
        assert excl_mask.shape == array.shape, \
            "Input exclusion mask should have same shape as array\n"
    ind_excl = np.where(excl_mask)

    if verbose:
        start = time_ini()
    neigh = num_neig > 0
    frame = array.copy()
    if cxy is None:
        cy, cx = frame_center(frame)
    else:
        cx, cy = cxy

    if bpm_mask is None or not correct_only:
        if bpm_mask is None:
            bpm_mask = np.zeros(array.shape, dtype=bool)
        bpm_mask = bpm_mask + excl_mask
        ori_nan_mask = np.where(np.isnan(frame))
        ind = clip_array(frame, sigma_clip, sigma_clip, bpm_mask,
                         neighbor=neigh, num_neighbor=num_neig, mad=mad)
        bpm_mask = np.zeros(frame.shape, dtype=bool)
        bpm_mask[ind] = True
        if ignore_nan:
            bpm_mask[ori_nan_mask] = False
        if protect_mask:
            cir = _disk_idx((cy, cx), protect_mask, bpm_mask.shape)
            bpm_mask[cir] = False
        bpm_mask[ind_excl] = False
        bpm_mask = bpm_mask.astype("bool")

    smoothed = median_filter(frame, size, mode="mirror")
    frame[bpm_mask] = smoothed[bpm_mask]
    if verbose:
        print("Done replacing {} bad pixels using the median of neighbors"
              .format(np.sum(bpm_mask)))
        timing(start)
    if full_output:
        return frame, bpm_mask
    return frame


def cube_fix_badpix_isolated(array, bpm_mask=None, correct_only=False,
                             sigma_clip=3, num_neig=5, size=5,
                             frame_by_frame=False, protect_mask=0, cxy=None,
                             mad=False, ignore_nan=True, verbose=True,
                             full_output=False, nproc=1, excl_mask=None):
    """Cube version of isolated bad pixel correction
    (reference badpixremoval.py:190-375)."""
    if array.ndim != 3:
        raise TypeError("Array is not a 3d array or cube")
    bpm_mask = _check_bpix_args((3,), array, size, correct_only, bpm_mask,
                                match_full_shape=False)
    if verbose:
        start = time_ini()
    neigh = num_neig > 0

    nz = array.shape[0]
    if cxy is None:
        cy, cx = frame_center(array[0])
    elif isinstance(cxy, tuple):
        cx, cy = cxy
    elif isinstance(cxy, np.ndarray):
        if cxy.shape[0] != nz or cxy.shape[1] != 2 or cxy.ndim != 2:
            raise ValueError("cxy does not have right shape")
        if not frame_by_frame:
            raise ValueError("cxy must be a tuple or None if not in "
                             "frame_by_frame mode")
        cx = cxy[:, 0]
        cy = cxy[:, 1]

    array_out = array.copy()
    final_bpm = np.zeros_like(array_out, dtype=bool)
    n_frames = array.shape[0]
    count_bp = 0
    if frame_by_frame:
        if np.isscalar(cx):
            cx = [cx] * nz
            cy = [cy] * nz
        if bpm_mask is not None and bpm_mask.ndim == 2:
            bpm_mask = np.array([bpm_mask] * n_frames)
        for i in range(n_frames):
            bpm_mask_tmp = bpm_mask[i] if bpm_mask is not None else None
            excl_mask_tmp = excl_mask[i] if excl_mask is not None else None
            res = frame_fix_badpix_isolated(
                array[i], bpm_mask=bpm_mask_tmp, correct_only=correct_only,
                sigma_clip=sigma_clip, num_neig=num_neig, size=size,
                protect_mask=protect_mask, excl_mask=excl_mask_tmp,
                verbose=False, cxy=(cx[i], cy[i]), ignore_nan=ignore_nan,
                mad=mad, full_output=True)
            array_out[i] = res[0]
            final_bpm[i] = res[1]
        count_bp = np.sum(final_bpm)
    else:
        if excl_mask is None:
            excl_mask = np.zeros(array.shape[-2:], dtype=bool)
        elif excl_mask.ndim == 3:
            excl_mask = np.median(excl_mask, axis=0)
        else:
            assert excl_mask.shape == array.shape[-2:], \
                "Input exclusion mask should have same last 2 dims as array"
        ind_excl = np.where(excl_mask)
        if bpm_mask is None or not correct_only:
            if bpm_mask is None:
                bpm_mask = np.zeros(array.shape[-2:], dtype=bool)
            elif bpm_mask.ndim == 3:
                bpm_mask = np.median(bpm_mask, axis=0)
            all_excl_mask = bpm_mask + excl_mask
            ori_nan_mask = np.where(np.isnan(np.nanmean(array, axis=0)))
            ind = clip_array(np.nanmean(array, axis=0), sigma_clip,
                             sigma_clip, all_excl_mask, neighbor=neigh,
                             num_neighbor=num_neig, mad=mad)
            final_bpm = np.asarray(bpm_mask).copy().astype(bool)
            final_bpm[ind] = True
            if ignore_nan:
                final_bpm[ori_nan_mask] = False
            if protect_mask:
                cir = _disk_idx((cy, cx), protect_mask, final_bpm.shape)
                final_bpm[cir] = False
            final_bpm[ind_excl] = False
            final_bpm = final_bpm.astype("bool")
        else:
            if bpm_mask.ndim == 3:
                final_bpm = np.median(bpm_mask, axis=0).astype(bool)
            else:
                final_bpm = bpm_mask.copy()
        for i in range(n_frames):
            frame = array_out[i]
            smoothed = median_filter(frame, size, mode="mirror")
            frame[np.where(final_bpm)] = smoothed[np.where(final_bpm)]
            array_out[i] = frame
            count_bp += np.sum(final_bpm)

    if verbose:
        print("Done replacing {:.0f} bad pixels using the median of "
              "neighbors".format(count_bp))
        timing(start)
    if full_output:
        return array_out, final_bpm
    return array_out


def reject_outliers(data, test_value, m=5., stddev=None, debug=False):
    """Robust outlier test (reference badpixremoval.py:1850-1943, numba
    variant: the reference compares max(data) — not max(|d|) — to
    stddev)."""
    data = np.asarray(data, dtype=float)
    if stddev is None:
        stddev = np.std(data)
    med = np.median(data)
    d_flat = np.abs(data.flatten() - med)
    mdev = np.median(d_flat)
    if max(np.max(data), np.abs(test_value - med)) > stddev:
        test = np.abs((test_value - med) / mdev) if mdev > 0 else np.inf
        return 0 if test < m else 1
    return 0


def _trimmed_med_std(values, stddev):
    """Median/std of one annulus after the reference's outlier trim
    (badpixremoval.py:711-732). Its loop guard compares the running count
    against the *initial* count, so at most one extreme value is ever
    dropped — the minimum tested first, then the maximum."""
    vals = np.asarray(values, dtype=float)
    if vals.size:
        if reject_outliers(vals, vals.min(), m=5, stddev=stddev):
            vals = np.delete(vals, vals.argmin())
        elif reject_outliers(vals, vals.max(), m=5, stddev=stddev):
            vals = np.delete(vals, vals.argmax())
    if not vals.size:
        return np.nan, np.nan
    return float(np.median(vals)), float(np.std(vals))


def find_outliers(frame, sig_dist, in_bpix=None, stddev=None,
                  neighbor_box=3, min_thr=None, mid_thr=None):
    """Bad-pixel map from a local robust outlier test around each pixel
    (reference badpixremoval.py:1714-1848)."""
    assert frame.ndim == 2, "Object is not two dimensional.\n"
    ny, nx = frame.shape
    bpix_map = np.zeros_like(frame)
    if stddev is None:
        stddev = np.std(frame)
    half_box = int(neighbor_box / 2)

    def _test(yy, xx):
        hbox_b = min(half_box, yy)
        hbox_t = min(half_box, ny - 1 - yy)
        hbox_l = min(half_box, xx)
        hbox_r = min(half_box, nx - 1 - xx)
        if yy > ny - 1 - half_box:
            hbox_b = hbox_b + (yy - (ny - 1 - half_box))
        elif yy < half_box:
            hbox_t = hbox_t + (half_box - yy)
        if xx > nx - 1 - half_box:
            hbox_l = hbox_l + (xx - (nx - 1 - half_box))
        elif xx < half_box:
            hbox_r = hbox_r + (half_box - xx)
        neighbours = frame[yy - hbox_b:yy + hbox_t + 1,
                           xx - hbox_l:xx + hbox_r + 1]
        flat_idx = np.ravel_multi_index(
            ([[hbox_b], [hbox_l]]),
            (hbox_t + hbox_b + 1, hbox_r + hbox_l + 1))
        neighbours = np.delete(neighbours, flat_idx)
        return reject_outliers(neighbours, frame[yy, xx], m=sig_dist,
                               stddev=stddev)

    if in_bpix is None:
        for xx in range(nx):
            for yy in range(ny):
                bpix_map[yy, xx] = _test(yy, xx)
    else:
        nb = int(np.sum(in_bpix))
        wb = np.where(in_bpix)
        bool_bpix = np.zeros_like(in_bpix)
        for n in range(nb):
            for yy in [max(0, wb[0][n] - half_box), wb[0][n],
                       min(ny - 1, wb[0][n] + half_box)]:
                for xx in [max(0, wb[1][n] - half_box), wb[1][n],
                           min(ny - 1, wb[1][n] + half_box)]:
                    bool_bpix[yy, xx] = 1
        wb = np.where(bool_bpix)
        for n in range(len(wb[0])):
            bpix_map[wb[0][n], wb[1][n]] = _test(wb[0][n], wb[1][n])
    return bpix_map


def correct_ann_outliers(array, bpix_map, ann_width, sig, med_neig,
                         std_neig, cy, cx, min_thr, max_thr, stddev,
                         half_res_y=False, rand_arr=None):
    """Correct outliers wrt concentric-annulus statistics
    (reference badpixremoval.py:1946-2064), vectorized."""
    n_y, n_x = array.shape
    if rand_arr is None:
        rand_arr = 2 * (np.random.rand(n_y, n_x) - 0.5)
    yy, xx = np.mgrid[:n_y, :n_x]
    if half_res_y:
        rad = np.sqrt((2 * (cy - yy))**2 + (cx - xx)**2)
    else:
        rad = np.sqrt((cy - yy)**2 + (cx - xx)**2)
    rr = (rad / ann_width).astype(int)
    med = med_neig[rr]
    dev = np.maximum(stddev, np.minimum(std_neig[rr], med))
    bpm = np.asarray(bpix_map).astype(bool).copy()
    bpm |= array < min_thr
    bpm |= array > max_thr
    bpm |= (array < med - sig * dev) | (array > med + sig * dev)
    array_corr = array.copy()
    array_corr[bpm] = med[bpm] + np.sqrt(np.abs(med[bpm])) * rand_arr[bpm]
    return array_corr, bpm.astype(float)


def cube_fix_badpix_annuli(array, fwhm, cy=None, cx=None, sig=5.,
                           bpm_mask=None, protect_mask=0, excl_mask=None,
                           r_in_std=50, r_out_std=None, verbose=True,
                           half_res_y=False, min_thr=None, max_thr=None,
                           min_thr_np=None, bad_values=None,
                           full_output=False):
    """Identify/correct bad pixels against concentric-annulus statistics
    (reference badpixremoval.py:491-833)."""
    ndims = array.ndim
    assert ndims in (2, 3), "Object is not two or three dimensional.\n"

    if min_thr is None:
        min_thr = np.amin(array) - 1
    if max_thr is None:
        max_thr = np.amax(array) - 1
    if bpm_mask is not None:
        assert bpm_mask.shape[-2:] == array.shape[-2:], \
            "Input bad pixel mask should have same last 2 dims as array\n"
        bpm_mask = bpm_mask.astype("bool")
    if bad_values is not None:
        if bpm_mask is None:
            bpm_mask = np.zeros(array.shape, dtype=bool)
        for bad in bad_values:
            bpm_mask[np.where(array == bad)] = 1

    def bp_removal_2d(array, cy, cx, fwhm, sig, protect_mask, bpm_mask_ori,
                      excl_mask, r_in_std, r_out_std, verbose):
        assert excl_mask.shape == array.shape, \
            "Input exclusion mask should have same shape as array\n"
        ind_excl = np.where(excl_mask)
        frame = array.copy()
        n_x = array.shape[1]
        n_y = array.shape[0]

        if half_res_y:
            if n_y % 2 != 0:
                raise ValueError("The input frames do not have of an even "
                                 "number of rows. Hence, you should not use "
                                 "option half_res_y = True")
            n_y = int(n_y / 2)
            cy = int(cy / 2)
            array = frame[::2].copy()
            excl_mask = excl_mask[::2]
            if bpm_mask_ori is not None:
                bpm_mask_ori = bpm_mask_ori[::2]

        if r_in_std or r_out_std:
            r_in_std = min(r_in_std * fwhm, cx - 2, cy - 2, n_x - cx - 2,
                           n_y - cy - 2)
            if r_out_std:
                r_out_std *= fwhm
            else:
                r_out_std = min(n_y - (cy + r_in_std), cy - r_in_std,
                                n_x - (cx + r_in_std), cx - r_in_std)
            width = max(2, r_out_std - r_in_std)
            array_crop = get_annulus_segments(array, r_in_std, width,
                                              mode="val")
        else:
            array_crop = array
        stddev = _sigma_clipped_std(array_crop, sigma=2.5)

        ymax = max(cy, n_y - cy)
        xmax = max(cx, n_x - cx)
        if half_res_y:
            ymax *= 2
        rmax = np.sqrt(ymax**2 + xmax**2)
        ann_width = max(1.5, 0.5 * fwhm)
        nrad = int(rmax / ann_width) + 1
        d_bord_max = max(n_y - cy, cy, n_x - cx, cx)
        if half_res_y:
            d_bord_max = max(2 * (n_y - cy), 2 * cy, n_x - cx, cx)

        bpm_mask = excl_mask.astype(bool).copy()
        if bpm_mask_ori is not None:
            bpm_mask |= bpm_mask_ori.astype(bool)
        if min_thr_np is not None:
            bpm_mask |= array < min_thr_np
        valid = ~bpm_mask

        # pixel -> annulus index from the radial metric (elliptic when
        # half_res_y); the strict-< disk membership of the reference's
        # rasterized annuli is reproduced by searchsorted on the squared
        # ring boundaries.
        yy_g, xx_g = np.mgrid[:n_y, :n_x]
        if half_res_y:
            r2 = (2.0 * (yy_g - cy)) ** 2 + (xx_g - cx) ** 2
        else:
            r2 = (yy_g - cy) ** 2.0 + (xx_g - cx) ** 2
        bounds = (np.arange(1, nrad + 1, dtype=float) * ann_width) ** 2
        ann_idx = np.searchsorted(bounds, r2.ravel(),
                                  side="right").reshape(n_y, n_x)
        ann_idx = np.minimum(ann_idx, nrad - 1)

        # past the frame border the reference pools every remaining pixel
        # into one outer region whose stats serve all outer annuli
        rr_limit = int(d_bord_max / ann_width)
        med_neig = np.full(nrad, np.nan)
        std_neig = np.full(nrad, np.nan)
        for rr in range(min(rr_limit + 1, nrad)):
            med_neig[rr], std_neig[rr] = _trimmed_med_std(
                array[valid & (ann_idx == rr)], stddev)
        if nrad - 1 > rr_limit:
            outer = valid & (ann_idx >= rr_limit)
            med_neig[rr_limit + 1:], std_neig[rr_limit + 1:] = \
                _trimmed_med_std(array[outer], stddev)

        ann_frame_cumul = np.where(valid, ann_idx, 0)
        if nrad - 1 > rr_limit:
            ann_frame_cumul[valid & (ann_idx >= rr_limit)] = nrad - 1

        protected = np.zeros((n_y, n_x), dtype=bool)
        if protect_mask:
            if half_res_y:
                protected[_ellipse_idx(cy, cx, r_radius=protect_mask / 2.,
                                       c_radius=protect_mask,
                                       shape=(n_y, n_x))] = True
            else:
                protected[_disk_idx((cy, cx), protect_mask,
                                    (n_y, n_x))] = True

        array_corr, bpix_map = correct_ann_outliers(
            array, bpm_mask, ann_width, sig, med_neig, std_neig, cy, cx,
            min_thr, max_thr, stddev, half_res_y)

        nbpix_tot = int(np.sum(bpix_map))
        nbpix_tbc = nbpix_tot - int(np.sum(bpix_map[protected]))
        # inside the protected zone only clear pixels above the
        # no-protection floor (min_thr_np), else clear the whole zone
        restore = protected if min_thr_np is None \
            else protected & (array >= min_thr_np)
        bpix_map[restore] = 0
        array_corr[restore] = array[restore]
        if verbose:
            print(nbpix_tot, " bpix in total, and ", nbpix_tbc,
                  " corrected.")

        if half_res_y:
            array_corr = np.repeat(array_corr, 2, axis=0)[:2 * n_y]
            bpix_map = np.repeat(bpix_map, 2, axis=0)[:2 * n_y]
            ann_frame_cumul = np.repeat(ann_frame_cumul, 2,
                                        axis=0)[:2 * n_y]
        array_corr[ind_excl] = frame[ind_excl]
        bpix_map[ind_excl] = 0
        return array_corr, bpix_map, ann_frame_cumul

    if cy is None or cx is None:
        cy, cx = frame_center(array)
    if ndims == 2:
        if excl_mask is None:
            excl_mask = np.zeros(array.shape, dtype=bool)
        array_corr, bpix_map, ann_frame_cumul = bp_removal_2d(
            array, cy, cx, fwhm, sig, protect_mask, bpm_mask, excl_mask,
            r_in_std, r_out_std, verbose)
    else:
        array_corr = array.copy()
        n_z = array.shape[0]
        bpix_map = np.zeros_like(array)
        ann_frame_cumul = np.zeros_like(array)
        if np.isscalar(fwhm):
            fwhm = [fwhm] * n_z
        if np.isscalar(cx) and np.isscalar(cy):
            cy = [cy] * n_z
            cx = [cx] * n_z
        if bpm_mask is None:
            bpm_mask = np.zeros(array_corr.shape, dtype=bool)
        elif bpm_mask.ndim == 2:
            bpm_mask = np.array([bpm_mask] * n_z, dtype=bool)
        if excl_mask is None:
            excl_mask = np.zeros(array_corr.shape, dtype=bool)
        elif excl_mask.ndim == 2:
            excl_mask = np.array([excl_mask] * n_z, dtype=bool)
        for i in range(n_z):
            if verbose:
                print("************Frame # ", i, " *************")
            res_i = bp_removal_2d(array[i], cy[i], cx[i], fwhm[i], sig,
                                  protect_mask, bpm_mask[i], excl_mask[i],
                                  r_in_std, r_out_std, verbose)
            array_corr[i], bpix_map[i], ann_frame_cumul[i] = res_i
    if full_output:
        return array_corr, bpix_map, ann_frame_cumul
    return array_corr


def cube_fix_badpix_clump(array, bpm_mask=None, correct_only=False, cy=None,
                          cx=None, fwhm=4., sig=4., protect_mask=0,
                          excl_mask=None, half_res_y=False, min_thr=None,
                          max_nit=15, mad=True, bad_values=None,
                          verbose=True, full_output=False, debug=False,
                          nproc=1):
    """Iteratively identify and correct clumps of bad pixels
    (reference badpixremoval.py:836-1262)."""
    array_corr = array.copy()
    ndims = array_corr.ndim
    assert ndims in (2, 3), "Object is not two or three dimensional.\n"

    if correct_only and bpm_mask is None:
        raise ValueError("Bad pixel map should be provided if correct_only "
                         "is True.")
    if bad_values is not None:
        if bpm_mask is None:
            bpm_mask = np.zeros(array.shape, dtype=bool)
        for bad in bad_values:
            bpm_mask[np.where(array == bad)] = 1

    def bp_removal_2d(array_corr, cy, cx, fwhm, sig, protect_mask,
                      bpm_mask_ori, excl_mask, min_thr, half_res_y, mad,
                      verbose):
        assert excl_mask.shape == array_corr.shape, \
            "Input exclusion mask should have same shape as array\n"
        ind_excl = np.where(excl_mask)
        n_x = array_corr.shape[1]
        n_y = array_corr.shape[0]
        if half_res_y:
            if n_y % 2 != 0:
                raise ValueError("The input frames do not have of an even "
                                 "number of rows. Hence, you should not use "
                                 "option half_res_y = True")
            n_y = int(n_y / 2)
            frame = array_corr.copy()
            array_corr = frame[::2].copy()
            excl_mask = excl_mask[::2]
            if bpm_mask_ori is not None:
                bpm_mask_ori = bpm_mask_ori[::2]

        fwhm_round = int(round(fwhm))
        if fwhm_round % 2 == 0:
            neighbor_box = max(3, fwhm_round + 1)
        else:
            neighbor_box = max(3, fwhm_round)
        nneig = sum(np.arange(3, neighbor_box + 2, 2))

        if protect_mask:
            if half_res_y:
                circl_new = _ellipse_idx(int(cy / 2), cx,
                                         r_radius=0.5 * protect_mask,
                                         c_radius=protect_mask,
                                         shape=(n_y, n_x))
            else:
                circl_new = _disk_idx((cy, cx), protect_mask, (n_y, n_x))
        else:
            circl_new = []

        bpm_mask = excl_mask.copy().astype(bool)
        if bpm_mask_ori is not None:
            bpm_mask = bpm_mask + bpm_mask_ori.astype(bool)
        bp = clip_array(array_corr, sig, sig, bpm_mask, out_good=False,
                        neighbor=True, num_neighbor=neighbor_box, mad=mad,
                        half_res_y=half_res_y)
        bpix_map = np.zeros_like(array_corr)
        bpix_map[bp] = 1
        if min_thr is not None:
            if np.isscalar(min_thr):
                min_thr = (-min_thr, min_thr)
            elif not isinstance(min_thr, tuple) or len(min_thr) != 2:
                raise ValueError("if provided, min_thr should be float or "
                                 "2-element tuple")
            bpix_map[np.where((array_corr > min_thr[0]) &
                              (array_corr < min_thr[1]))] = 0
        nbpix_tot = int(np.sum(bpix_map))
        bpix_map[circl_new] = 0
        bpix_map[ind_excl] = 0
        nbpix_tbc = int(np.sum(bpix_map))
        bpix_map_cumul = np.zeros(bpix_map.shape, dtype=bool)
        bpix_map_cumul[:] = bpix_map.astype(bool)[:]
        nit = 0
        while nbpix_tbc > 0 and nit < max_nit:
            nit += 1
            if verbose:
                msg = "Iteration {}: {} bad pixels identified".format(
                    nit, nbpix_tot)
                if protect_mask:
                    msg += ", {} to be corrected".format(nbpix_tbc)
                print(msg)
            array_corr = sigma_filter(array_corr, bpix_map,
                                      neighbor_box=neighbor_box,
                                      min_neighbors=nneig,
                                      half_res_y=half_res_y,
                                      verbose=verbose)
            bp = clip_array(array_corr, sig, sig, None, out_good=False,
                            neighbor=True, num_neighbor=neighbor_box,
                            mad=mad, half_res_y=half_res_y)
            bpix_map = np.zeros(array_corr.shape, dtype=bool)
            bpix_map[bp] = 1
            if min_thr is not None:
                bpix_map[np.where((array_corr > min_thr[0]) &
                                  (array_corr < min_thr[1]))] = 0
            nbpix_tot = int(np.sum(bpix_map))
            bpix_map[circl_new] = 0
            bpix_map[ind_excl] = 0
            nbpix_tbc = int(np.sum(bpix_map))
            bpix_map_cumul = bpix_map_cumul + bpix_map
        if verbose:
            print("All bad pixels are corrected.")
        if half_res_y:
            array_corr = np.repeat(array_corr, 2, axis=0)
            bpix_map_cumul = np.repeat(bpix_map_cumul, 2, axis=0)
        return array_corr, bpix_map_cumul

    if ndims == 2:
        if bpm_mask is None or not correct_only:
            if (cy is None or cx is None) and protect_mask:
                cy, cx = frame_center(array)
            if excl_mask is None:
                excl_mask = np.zeros(array_corr.shape, dtype=bool)
            array_corr, bpix_map_cumul = bp_removal_2d(
                array_corr, cy, cx, fwhm, sig, protect_mask, bpm_mask,
                excl_mask, min_thr, half_res_y, mad, verbose)
        else:
            fwhm_round = int(round(fwhm))
            fwhm_round = fwhm_round + 1 - (fwhm_round % 2)
            neighbor_box = max(3, fwhm_round)
            nneig = sum(np.arange(3, neighbor_box + 2, 2))
            array_corr = sigma_filter(array_corr, bpm_mask, neighbor_box,
                                      nneig, half_res_y, verbose)
            bpix_map_cumul = bpm_mask

    if ndims == 3:
        n_z = array_corr.shape[0]
        if bpm_mask is None or not correct_only:
            if bpm_mask is None:
                bpm_mask3 = np.zeros(array_corr.shape, dtype=bool)
            elif bpm_mask.ndim == 2:
                bpm_mask3 = np.array([bpm_mask] * n_z, dtype=bool)
            else:
                bpm_mask3 = bpm_mask
            if excl_mask is None:
                excl_mask = np.zeros(array_corr.shape, dtype=bool)
            elif excl_mask.ndim == 2:
                excl_mask = np.array([excl_mask] * n_z, dtype=bool)
            if cy is None or cx is None:
                cy, cx = frame_center(array)
                cy = [cy] * n_z
                cx = [cx] * n_z
            elif np.isscalar(cy) and np.isscalar(cx):
                cy = [cy] * n_z
                cx = [cx] * n_z
            if np.isscalar(fwhm):
                fwhm = [fwhm] * n_z
            bpix_map_cumul = np.zeros_like(array_corr)
            for i in range(n_z):
                if verbose:
                    print("************Frame # ", i, " *************")
                res = bp_removal_2d(array_corr[i], cy[i], cx[i], fwhm[i],
                                    sig, protect_mask, bpm_mask3[i],
                                    excl_mask[i], min_thr, half_res_y, mad,
                                    verbose)
                array_corr[i], bpix_map_cumul[i] = res
        else:
            if np.isscalar(fwhm):
                fwhm_round = int(round(fwhm))
            else:
                fwhm_round = int(np.median(fwhm))
            fwhm_round = fwhm_round + 1 - (fwhm_round % 2)
            neighbor_box = max(3, fwhm_round)
            nneig = sum(np.arange(3, neighbor_box + 2, 2))
            if bpm_mask.ndim == 2:
                bpm_mask = np.array([bpm_mask] * n_z, dtype=bool)
            for i in range(n_z):
                array_corr[i] = sigma_filter(array_corr[i], bpm_mask[i],
                                             neighbor_box, nneig,
                                             half_res_y, verbose)
            bpix_map_cumul = bpm_mask
    if full_output:
        return array_corr, bpix_map_cumul
    return array_corr


def cube_fix_badpix_ifs(array, lbdas, fluxes=None, mask=None, cy=None,
                        cx=None, clumps=True, sigma_clip=6, num_neig=5,
                        size=5, protect_mask=0, mad=True,
                        fwhm=4, min_thr=None, max_nit=15, ignore_nan=True,
                        verbose=True, full_output=False, imlib="vip-fft",
                        interpolation="lanczos4"):
    """Identify bad pixels in IFS cubes from SDI residuals
    (reference badpixremoval.py:1265-1478)."""
    from ..preproc.rescaling import find_scal_vector, frame_rescaling

    def _res_scaled_images(array, lbdas, fluxes, mask, cy, cx):
        if fluxes is None:
            fluxes = [1] * len(lbdas)
        if cx is None or cy is None:
            ref_xy = None
        else:
            ref_xy = (cx, cy)
        scal_vec, flux_vec = find_scal_vector(array, lbdas, fluxes,
                                              mask=mask, nfp=2, fm="sum",
                                              imlib=imlib,
                                              interpolation=interpolation)
        res_array = np.zeros_like(array)
        for z in range(array.shape[0]):
            other_ch = [i for i in range(array.shape[0]) if i != z]
            res_arr_tmp = []
            for zp in other_ch:
                flux_scal = flux_vec[zp] / flux_vec[z]
                resc_fr = frame_rescaling(flux_scal * array[zp],
                                          ref_xy=ref_xy,
                                          scale=scal_vec[zp] / scal_vec[z],
                                          imlib=imlib,
                                          interpolation=interpolation)
                res_arr_tmp.append(array[z] - resc_fr)
            res_array[z] = np.median(np.array(res_arr_tmp), axis=0)
        return res_array

    cube = array.copy()
    ndims = cube.ndim
    if cy is None or cx is None:
        cxy = None
    else:
        cy, cx = frame_center(cube)
        cxy = (cx, cy)

    if ndims == 3:
        array_res = _res_scaled_images(cube, lbdas, fluxes, mask, cy, cx)
        if clumps:
            _, final_bpm = cube_fix_badpix_clump(
                array_res, bpm_mask=None, cy=cy, cx=cx, fwhm=fwhm,
                sig=sigma_clip, protect_mask=protect_mask, verbose=verbose,
                min_thr=min_thr, max_nit=max_nit, mad=mad, full_output=True)
        else:
            _, final_bpm = cube_fix_badpix_isolated(
                array_res, bpm_mask=None, sigma_clip=sigma_clip,
                num_neig=num_neig, size=size, frame_by_frame=True,
                protect_mask=protect_mask, cxy=cxy, mad=mad,
                ignore_nan=ignore_nan, verbose=verbose, full_output=True)
        final_bpm = np.clip(final_bpm.astype(int), 0, 1)
        array_out = cube_fix_badpix_isolated(
            cube, bpm_mask=final_bpm, sigma_clip=sigma_clip,
            num_neig=num_neig, size=size, frame_by_frame=True,
            protect_mask=protect_mask, cxy=cxy, mad=mad,
            ignore_nan=ignore_nan, verbose=verbose, full_output=False)
    elif ndims == 4:
        n_z = cube.shape[1]
        array_out = np.zeros_like(cube)
        array_res = np.zeros_like(cube)
        final_bpm = np.zeros_like(cube, dtype=int)
        if np.isscalar(cy) and np.isscalar(cx):
            cy = [cy] * n_z
            cx = [cx] * n_z
        for i in range(n_z):
            if verbose:
                print("************ Cube #{}/{} *************".format(
                    i + 1, n_z))
            array_res[:, i] = _res_scaled_images(cube[:, i], lbdas, fluxes,
                                                 mask, cy, cx)
            if clumps:
                res = cube_fix_badpix_clump(
                    array_res[:, i], bpm_mask=None, cy=cy, cx=cx, fwhm=fwhm,
                    sig=sigma_clip, protect_mask=protect_mask,
                    verbose=verbose, min_thr=min_thr, max_nit=max_nit,
                    mad=mad, full_output=True)
            else:
                res = cube_fix_badpix_isolated(
                    array_res[:, i], bpm_mask=None, sigma_clip=sigma_clip,
                    num_neig=num_neig, size=size, frame_by_frame=True,
                    protect_mask=protect_mask, cxy=cxy, mad=mad,
                    ignore_nan=ignore_nan, verbose=verbose,
                    full_output=True)
            _, final_bpm[:, i] = res
            final_bpm = np.clip(final_bpm, 0, 1)
            array_out[:, i] = cube_fix_badpix_isolated(
                cube[:, i], final_bpm[:, i], correct_only=False,
                sigma_clip=sigma_clip, num_neig=num_neig, size=size,
                frame_by_frame=True, protect_mask=protect_mask, cxy=cxy,
                mad=mad, ignore_nan=ignore_nan, verbose=verbose,
                full_output=False)
    else:
        raise TypeError("Input array should be 3D or 4D")

    if full_output:
        return array_out, final_bpm, array_res
    return array_out


def frame_fix_badpix_fft(array, bpm_mask, nit=500, tol=1, pad_fac=2,
                         verbose=True, full_output=False):
    """Iterative FFT-based bad-pixel interpolation ([AAC01])
    (reference badpixremoval.py:2067-2254). The error-spectrum update is
    vectorized with rolls instead of the reference's per-pixel loop."""
    if array.ndim != 2:
        raise TypeError("Input array should be 2D")
    if array.shape != bpm_mask.shape:
        raise TypeError("Input bad pixel map should have same shape as "
                        "array")
    if isinstance(nit, list):
        nit_max = max(nit)
        return_list = True
    else:
        nit_max = nit
        return_list = False

    final_array_corr = []
    final_f_est = []
    ini_y, ini_x = array.shape
    pad_fac = (int(pad_fac * ini_x / ini_y), pad_fac)
    g = frame_pad(array, pad_fac, keep_parity=False, fillwith=0)
    w = frame_pad(1 - bpm_mask.astype(float), pad_fac, keep_parity=False,
                  fillwith=0)
    g = g * w
    if verbose:
        start = time_ini()
    G_i = np.fft.fft2(g)
    W = np.fft.fft2(w)
    ny, nx = g.shape
    npix = float(ny * nx)
    F_est = np.zeros(g.shape, dtype=complex)
    Eg = tol + 1

    for it in range(nit_max):
        ind = np.unravel_index(np.argmax(np.abs(G_i.real[:, 0:nx // 2])),
                               (ny, nx // 2))
        ind_conj = (np.mod(ny - ind[0], ny), np.mod(nx - ind[1], nx))
        cond1 = (ind[0] == 0) and (ind[1] == 0)
        cond2 = (ind[0] == ny / 2) and (ind[1] == 0)
        cond3 = (ind[0] == 0) and (ind[1] == nx / 2)
        cond4 = (ind[0] == ny / 2) and (ind[1] == nx / 2)
        special = cond1 or cond2 or cond3 or cond4
        if special:
            F_i = npix * G_i[ind] / W[(0, 0)]
            F_est[ind] += F_i
        else:
            a = np.abs(W[(0, 0)])**2
            b = np.abs(W[(2 * ind[0]) % ny, (2 * ind[1]) % nx])**2
            if a == b:
                W[(2 * ind[0]) % ny, (2 * ind[1]) % nx] += \
                    np.amin(np.abs(W)) * 1e-11
            a = np.abs(W[(0, 0)])**2
            b = np.abs(W[(2 * ind[0]) % ny, (2 * ind[1]) % nx])**2
            c = a - b
            F_i = (npix / c) * (G_i[ind] * W[(0, 0)] - np.conj(G_i[ind]) *
                                W[(2 * ind[0]) % ny, (2 * ind[1]) % nx])
            F_est[ind] += F_i
            F_est[ind_conj] += np.conj(F_i)

        # error-spectrum update: conv[y, x] = F_i W[y-i0, x-i1]
        # (+ conj for the symmetric component) == rolls of W
        conv = F_i * np.roll(W, (ind[0], ind[1]), axis=(0, 1))
        if not special:
            conv = conv + np.conj(F_i) * np.roll(W, (-ind[0], -ind[1]),
                                                 axis=(0, 1))
        G_i = G_i - conv / npix

        Eg = np.sum(np.abs(G_i.ravel())**2) / npix
        if (return_list and it in nit) or (it == nit_max - 1) or (Eg < tol):
            array_corr = g + np.fft.ifft2(F_est).real * (1 - w)
            cy, cx = frame_center(array_corr)
            wy = (ini_y - 1) / 2
            wx = (ini_x - 1) / 2
            y0, y1 = int(cy - wy), int(cy + wy + 1)
            x0, x1 = int(cx - wx), int(cx + wx + 1)
            final_array_corr.append(array_corr[y0:y1, x0:x1])
            if full_output:
                f_est = np.fft.ifft2(F_est).real
                final_f_est.append(f_est[y0:y1, x0:x1])
        if Eg < tol:
            break

    if verbose:
        print("FFT-interpolation terminated after {} iterations (Eg={})"
              .format(it + 1, Eg))
        timing(start)
    if not return_list:
        final_array_corr = final_array_corr[-1]
        if full_output:
            final_f_est = final_f_est[-1]
    if full_output:
        return final_array_corr, final_f_est
    return final_array_corr


def cube_fix_badpix_interp(array, bpm_mask, mode="fft", excl_mask=None,
                           fwhm=4., kernel_sz=None, psf=None,
                           half_res_y=False, nit=500, tol=1, nproc=1,
                           full_output=False, **kwargs):
    """Correct bad pixels by interpolation: gaussian/psf convolution or
    iterative FFT ([AAC01]) (reference badpixremoval.py:1479-1711)."""
    from ..var.filters import frame_filter_lowpass

    ndims = array.ndim
    assert ndims in (2, 3), "Object is not two or three dimensional.\n"
    if bpm_mask.shape[-2:] != array.shape[-2:]:
        raise TypeError("Bad pixel map has wrong y/x dimensions.")
    if excl_mask is None:
        excl_mask = np.zeros(array.shape, dtype=bool)
    elif excl_mask.ndim == 2 and array.ndim == 3:
        excl_mask = np.array([excl_mask] * array.shape[0], dtype=bool)
    assert excl_mask.shape[-2:] == array.shape[-2:], \
        "Input exclusion mask should have same shape as array\n"
    if np.sum(bpm_mask) == 0:
        print("Warning: no bad pixel found in bad pixel map. Returning "
              "input array as is.")
        return array

    ny, nx = array.shape[-2:]
    if ndims == 3:
        nz = array.shape[0]
        if bpm_mask.ndim == 2:
            bpm_mask = np.array([bpm_mask] * nz)
    array_corr = array.copy()
    array_ori = array.copy()

    if mode != "fft":
        array_corr[np.where(bpm_mask.astype(bool) |
                            excl_mask.astype(bool))] = np.nan
        if ndims == 2:
            array_corr_filt = frame_filter_lowpass(
                array_corr, mode=mode, fwhm_size=fwhm, conv_mode="conv",
                kernel_sz=kernel_sz, psf=psf, iterate=True,
                half_res_y=half_res_y, **kwargs)
        else:
            array_corr_filt = array_corr.copy()
            if np.isscalar(fwhm):
                fwhm = [fwhm] * nz
            if psf is None:
                psf = [None] * nz
            elif np.asarray(psf).ndim == 2:
                psf = [psf] * nz
            for z in range(nz):
                array_corr_filt[z] = frame_filter_lowpass(
                    array_corr[z], mode=mode, fwhm_size=fwhm[z],
                    conv_mode="conv", kernel_sz=kernel_sz, psf=psf[z],
                    iterate=True, half_res_y=half_res_y, **kwargs)
        array_corr = array_ori.copy()
        array_corr[np.where(bpm_mask)] = \
            array_corr_filt[np.where(bpm_mask)]
        recon = array_corr_filt
    else:
        full_bp_mask = (bpm_mask.astype(bool) |
                        excl_mask.astype(bool))
        if ndims == 2:
            res = frame_fix_badpix_fft(array_corr, full_bp_mask, nit=nit,
                                       tol=tol, full_output=full_output,
                                       verbose=False)
            if full_output:
                array_corr_filt, recon = res
            else:
                array_corr_filt = res
                recon = None
        else:
            array_corr_filt = np.empty_like(array_corr)
            recon = np.empty_like(array_corr)
            for z in range(nz):
                res = frame_fix_badpix_fft(array_corr[z], full_bp_mask[z],
                                           nit=nit, tol=tol,
                                           full_output=full_output,
                                           verbose=False)
                if full_output:
                    array_corr_filt[z], recon[z] = res
                else:
                    array_corr_filt[z] = res
        array_corr = array_ori.copy()
        array_corr[np.where(bpm_mask)] = \
            array_corr_filt[np.where(bpm_mask)]

    if full_output and mode == "fft":
        return array_corr, recon
    return array_corr


def get_err_spec(F_i, W, ind, npix, G_i, dims):
    """Error-spectrum update of the FFT-based bad-pixel interpolation
    (reference badpixremoval.py:2226-2254, a numba double loop): subtract
    the contribution of the newly estimated Fourier component ``F_i`` at
    frequency ``ind`` (plus its Hermitian partner unless self-conjugate)
    from the current error spectrum ``G_i``. The per-pixel loop collapses
    to two rolls of the window spectrum ``W``."""
    ny, nx = dims
    self_conj = ((ind[0] % (ny / 2) == 0) and (ind[1] % (nx / 2) == 0))
    conv = F_i * np.roll(np.asarray(W), (ind[0], ind[1]), axis=(0, 1))
    if not self_conj:
        conv = conv + np.conj(F_i) * np.roll(np.asarray(W),
                                             (-ind[0], -ind[1]),
                                             axis=(0, 1))
    return G_i - conv / float(npix)
