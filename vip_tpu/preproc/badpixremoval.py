"""Bad-pixel identification and correction
(reference vip_hci/preproc/badpixremoval.py).

The FFT-based iterative interpolation ([AAC01]) replaces the reference's
per-pixel numba loop with vectorized rolls; the sigma filters follow the
reference's (numba-variant) math exactly. Host-side plumbing (mask
normalization, per-frame broadcasting, protected zones) is factored into
the shared helpers below instead of the reference's per-function inline
blocks.
"""

import numpy as np
from scipy.ndimage import median_filter as _sp_median_filter

from ..config import time_ini, timing
from ..stats.clip_sigma import clip_array, sigma_filter
from ..var.coords import dist_matrix, frame_center
from ..var.shapes import get_annulus_segments
from .cosmetics import frame_pad


def median_filter(frame, size, mode="mirror"):
    """Windowed median (scipy signature) on device; scipy fallback for
    frames smaller than the mirror pad or non-mirror modes."""
    if mode != "mirror" or min(frame.shape[-2:]) <= size // 2:
        return _sp_median_filter(frame, size, mode=mode)
    from ..ops.badpix import median_filter_device

    return np.asarray(median_filter_device(frame, int(size)),
                      dtype=frame.dtype)


def _cube_median_filter(cube, size, chunk=100):
    """Batched device median filter over the frame axis, chunked to bound
    the window-stack working set (size^2 x frame bytes per frame)."""
    if min(cube.shape[-2:]) <= size // 2:
        return np.stack([_sp_median_filter(f, size, mode="mirror")
                         for f in cube])
    from ..ops.badpix import median_filter_device

    out = np.empty_like(cube)
    for i in range(0, cube.shape[0], chunk):
        blk = cube[i:i + chunk]
        out[i:i + chunk] = np.asarray(median_filter_device(blk, int(size)),
                                      dtype=cube.dtype)
    return out

__all__ = ["frame_fix_badpix_isolated", "cube_fix_badpix_isolated",
           "cube_fix_badpix_annuli", "cube_fix_badpix_clump",
           "cube_fix_badpix_ifs", "cube_fix_badpix_interp",
           "frame_fix_badpix_fft"]


# ---------------------------------------------------------------------------
# shared host-side helpers
# ---------------------------------------------------------------------------
def _disk_mask(cy, cx, radius, shape):
    """Boolean mask of the strict-interior disk (skimage.draw.disk)."""
    yy, xx = np.mgrid[:shape[0], :shape[1]]
    return (yy - cy) ** 2 + (xx - cx) ** 2 < radius ** 2


def _ellipse_mask(cy, cx, ry, rx, shape):
    """Boolean mask of the strict-interior ellipse (skimage.draw.ellipse)."""
    yy, xx = np.mgrid[:shape[0], :shape[1]]
    return ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1


def _protect_region(cy, cx, radius, shape, half_res_y=False):
    """Protected central zone: a disk, or a half-height ellipse when the
    frame is y-subsampled (half_res_y)."""
    if not radius:
        return np.zeros(shape, dtype=bool)
    if half_res_y:
        return _ellipse_mask(cy, cx, radius / 2.0, radius, shape)
    return _disk_mask(cy, cx, radius, shape)


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


def _norm_mask(mask, shape2d, name="mask"):
    """None -> all-False; else bool-cast and check trailing dims."""
    if mask is None:
        return np.zeros(shape2d, dtype=bool)
    if mask.shape[-2:] != tuple(shape2d[-2:]):
        raise AssertionError(
            f"Input {name} should match the frame shape")
    return mask.astype(bool)


def _stack_per_frame(mask, nz):
    """Broadcast a 2-d mask to (nz, y, x); pass 3-d through."""
    mask = np.asarray(mask)
    if mask.ndim == 2:
        return np.repeat(mask[None], nz, axis=0)
    return mask


def _seq_per_frame(val, nz):
    """Scalars become an nz-long list; sequences pass through."""
    return [val] * nz if np.isscalar(val) else val


def _require_odd_kernel(size):
    if size is not None and size % 2 == 0:
        raise TypeError("Size of the median blur kernel must be an odd "
                        "integer")


def _require_map_for_correct_only(correct_only, bpm_mask):
    if correct_only and bpm_mask is None:
        raise ValueError("Bad pixel map should be provided if correct_only "
                         "is True.")


def _seed_from_values(array, bad_values, bpm_mask):
    """Flag every pixel equal to one of ``bad_values`` in the map."""
    if bad_values is None:
        return bpm_mask
    seeded = (np.zeros(array.shape, dtype=bool) if bpm_mask is None
              else bpm_mask.astype(bool).copy())
    for bad in bad_values:
        seeded |= array == bad
    return seeded


def _clump_kernel_geom(fwhm):
    """Odd neighbor-box edge from the FWHM + minimum neighbor count
    (the reference's sum over the odd box perimeter sizes)."""
    edge = int(round(fwhm))
    edge += 1 - edge % 2
    box = max(3, edge)
    return box, int(np.arange(3, box + 2, 2).sum())


# ---------------------------------------------------------------------------
# isolated bad pixels (sigma clip + local median)
# ---------------------------------------------------------------------------
def frame_fix_badpix_isolated(array, bpm_mask=None, correct_only=False,
                              sigma_clip=3, num_neig=5, size=5,
                              protect_mask=0, cxy=None, mad=False,
                              ignore_nan=True, verbose=True,
                              full_output=False, excl_mask=None):
    """Sigma-clip isolated bad pixels of a frame and replace them with the
    local median (reference badpixremoval.py:61-187)."""
    if array.ndim != 2:
        raise TypeError("Array is not a 2d array or single frame")
    _require_odd_kernel(size)
    _require_map_for_correct_only(correct_only, bpm_mask)
    if bpm_mask is not None:
        bpm_mask = _norm_mask(bpm_mask, array.shape, "bad pixel mask")
    if excl_mask is not None and excl_mask.shape != array.shape:
        raise AssertionError(
            "Input exclusion mask should have same shape as array\n")
    excl = (np.zeros(array.shape, bool) if excl_mask is None
            else excl_mask.astype(bool))

    clock = time_ini() if verbose else None
    cy, cx = frame_center(array) if cxy is None else cxy[::-1]

    frame = array.copy()
    detect = bpm_mask is None or not correct_only
    if detect:
        seed = excl if bpm_mask is None else (bpm_mask | excl)
        was_nan = np.isnan(frame)
        hits = clip_array(frame, sigma_clip, sigma_clip, seed,
                          neighbor=num_neig > 0, num_neighbor=num_neig,
                          mad=mad)
        bpm_mask = np.zeros(frame.shape, dtype=bool)
        bpm_mask[hits] = True
        if ignore_nan:
            bpm_mask &= ~was_nan
        bpm_mask &= ~_protect_region(cy, cx, protect_mask, bpm_mask.shape)
        bpm_mask &= ~excl

    smoothed = median_filter(frame, size, mode="mirror")
    frame[bpm_mask] = smoothed[bpm_mask]
    if verbose:
        print(f"Done replacing {np.sum(bpm_mask)} bad pixels using the "
              "median of neighbors")
        timing(clock)
    return (frame, bpm_mask) if full_output else frame


def cube_fix_badpix_isolated(array, bpm_mask=None, correct_only=False,
                             sigma_clip=3, num_neig=5, size=5,
                             frame_by_frame=False, protect_mask=0, cxy=None,
                             mad=False, ignore_nan=True, verbose=True,
                             full_output=False, nproc=1, excl_mask=None):
    """Cube version of isolated bad pixel correction
    (reference badpixremoval.py:190-375)."""
    if array.ndim != 3:
        raise TypeError("Array is not a 3d array or cube")
    _require_odd_kernel(size)
    _require_map_for_correct_only(correct_only, bpm_mask)
    if bpm_mask is not None:
        bpm_mask = _norm_mask(bpm_mask, array.shape[-2:], "bad pixel mask")
    clock = time_ini() if verbose else None

    nz = array.shape[0]
    if cxy is None:
        cy, cx = frame_center(array[0])
    elif isinstance(cxy, tuple):
        cx, cy = cxy
    elif isinstance(cxy, np.ndarray):
        if cxy.ndim != 2 or cxy.shape != (nz, 2):
            raise ValueError("cxy does not have right shape")
        if not frame_by_frame:
            raise ValueError("cxy must be a tuple or None if not in "
                             "frame_by_frame mode")
        cx, cy = cxy[:, 0], cxy[:, 1]

    fixed = array.copy()
    found = np.zeros_like(array, dtype=bool)

    if frame_by_frame:
        cx = _seq_per_frame(cx, nz)
        cy = _seq_per_frame(cy, nz)
        if bpm_mask is not None:
            bpm_mask = _stack_per_frame(bpm_mask, nz)
        for i in range(nz):
            fixed[i], found[i] = frame_fix_badpix_isolated(
                array[i],
                bpm_mask=None if bpm_mask is None else bpm_mask[i],
                correct_only=correct_only, sigma_clip=sigma_clip,
                num_neig=num_neig, size=size, protect_mask=protect_mask,
                excl_mask=None if excl_mask is None else excl_mask[i],
                verbose=False, cxy=(cx[i], cy[i]), ignore_nan=ignore_nan,
                mad=mad, full_output=True)
        n_fixed = int(found.sum())
        final_bpm = found
    else:
        # one shared map from the mean frame
        if excl_mask is None:
            excl = np.zeros(array.shape[-2:], dtype=bool)
        elif excl_mask.ndim == 3:
            excl = np.median(excl_mask, axis=0).astype(bool)
        else:
            if excl_mask.shape != array.shape[-2:]:
                raise AssertionError(
                    "Input exclusion mask should have same last 2 dims as"
                    " array")
            excl = excl_mask.astype(bool)

        if bpm_mask is None or not correct_only:
            if bpm_mask is None:
                seed2d = np.zeros(array.shape[-2:], dtype=bool)
            elif bpm_mask.ndim == 3:
                seed2d = np.median(bpm_mask, axis=0).astype(bool)
            else:
                seed2d = bpm_mask
            mean_fr = np.nanmean(array, axis=0)
            hits = clip_array(mean_fr, sigma_clip, sigma_clip,
                              seed2d | excl, neighbor=num_neig > 0,
                              num_neighbor=num_neig, mad=mad)
            final_bpm = np.asarray(seed2d).copy().astype(bool)
            final_bpm[hits] = True
            if ignore_nan:
                final_bpm &= ~np.isnan(mean_fr)
            final_bpm &= ~_protect_region(cy, cx, protect_mask,
                                          final_bpm.shape)
            final_bpm &= ~excl
        elif bpm_mask.ndim == 3:
            final_bpm = np.median(bpm_mask, axis=0).astype(bool)
        else:
            final_bpm = bpm_mask.copy()

        smoothed = _cube_median_filter(fixed, size)
        fixed[:, final_bpm] = smoothed[:, final_bpm]
        n_fixed = nz * int(final_bpm.sum())

    if verbose:
        print(f"Done replacing {n_fixed:.0f} bad pixels using the median "
              "of neighbors")
        timing(clock)
    return (fixed, final_bpm) if full_output else fixed


# ---------------------------------------------------------------------------
# annulus-statistics correction
# ---------------------------------------------------------------------------
def reject_outliers(data, test_value, m=5., stddev=None, debug=False):
    """Robust outlier test (reference badpixremoval.py:1850-1943, numba
    variant: the reference compares max(data) — not max(|d|) — to
    stddev)."""
    data = np.asarray(data, dtype=float)
    if stddev is None:
        stddev = np.std(data)
    med = np.median(data)
    mdev = np.median(np.abs(data.ravel() - med))
    if debug:
        print("data = ", data)
        print("median(data)= ", med)
        print("mdev = ", mdev)
        print("stddev(box) = ", np.std(data))
        print("stddev(frame) = ", stddev)
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
        # only revisit the 3x3-ish neighborhoods of the seeded bad pixels
        seen = np.zeros_like(in_bpix)
        for y0, x0 in zip(*np.where(in_bpix)):
            for yy in {max(0, y0 - half_box), y0,
                       min(ny - 1, y0 + half_box)}:
                for xx in {max(0, x0 - half_box), x0,
                           min(ny - 1, x0 + half_box)}:
                    seen[yy, xx] = 1
        for yy, xx in zip(*np.where(seen)):
            bpix_map[yy, xx] = _test(yy, xx)
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


def _ann_removal_2d(frame_in, cy, cx, fwhm, sig, protect_mask, seed_map,
                    excl_mask, r_in_std, r_out_std, min_thr, max_thr,
                    min_thr_np, half_res_y, verbose):
    """One frame of :func:`cube_fix_badpix_annuli`."""
    if excl_mask.shape != frame_in.shape:
        raise AssertionError(
            "Input exclusion mask should have same shape as array\n")
    excl = excl_mask.astype(bool)
    work = frame_in
    ny, nx = work.shape

    if half_res_y:
        if ny % 2:
            raise ValueError("The input frames do not have of an even "
                             "number of rows. Hence, you should not use "
                             "option half_res_y = True")
        ny //= 2
        cy = int(cy / 2)
        work = frame_in[::2].copy()
        excl = excl[::2]
        if seed_map is not None:
            seed_map = seed_map[::2]

    # noise floor from a clean annulus (or the whole frame)
    if r_in_std or r_out_std:
        r_in_std = min(r_in_std * fwhm, cx - 2, cy - 2, nx - cx - 2,
                       ny - cy - 2)
        if r_out_std:
            r_out_std *= fwhm
        else:
            r_out_std = min(ny - (cy + r_in_std), cy - r_in_std,
                            nx - (cx + r_in_std), cx - r_in_std)
        sample = get_annulus_segments(work, r_in_std,
                                      max(2, r_out_std - r_in_std),
                                      mode="val")
    else:
        sample = work
    stddev = _sigma_clipped_std(sample, sigma=2.5)

    ymax = max(cy, ny - cy) * (2 if half_res_y else 1)
    xmax = max(cx, nx - cx)
    ann_width = max(1.5, 0.5 * fwhm)
    nrad = int(np.sqrt(ymax ** 2 + xmax ** 2) / ann_width) + 1
    if half_res_y:
        d_border = max(2 * (ny - cy), 2 * cy, nx - cx, cx)
    else:
        d_border = max(ny - cy, cy, nx - cx, cx)

    known_bad = excl.copy()
    if seed_map is not None:
        known_bad |= seed_map.astype(bool)
    if min_thr_np is not None:
        known_bad |= work < min_thr_np
    valid = ~known_bad

    # pixel -> annulus index from the radial metric (elliptic when
    # half_res_y); the strict-< disk membership of the reference's
    # rasterized annuli is reproduced by searchsorted on the squared
    # ring boundaries.
    yy_g, xx_g = np.mgrid[:ny, :nx]
    if half_res_y:
        r2 = (2.0 * (yy_g - cy)) ** 2 + (xx_g - cx) ** 2
    else:
        r2 = (yy_g - cy) ** 2.0 + (xx_g - cx) ** 2
    bounds = (np.arange(1, nrad + 1, dtype=float) * ann_width) ** 2
    ann_idx = np.searchsorted(bounds, r2.ravel(),
                              side="right").reshape(ny, nx)
    ann_idx = np.minimum(ann_idx, nrad - 1)

    # past the frame border the reference pools every remaining pixel
    # into one outer region whose stats serve all outer annuli
    rr_limit = int(d_border / ann_width)
    med_neig = np.full(nrad, np.nan)
    std_neig = np.full(nrad, np.nan)
    for rr in range(min(rr_limit + 1, nrad)):
        med_neig[rr], std_neig[rr] = _trimmed_med_std(
            work[valid & (ann_idx == rr)], stddev)
    if nrad - 1 > rr_limit:
        pooled = _trimmed_med_std(work[valid & (ann_idx >= rr_limit)],
                                  stddev)
        med_neig[rr_limit + 1:], std_neig[rr_limit + 1:] = pooled

    ann_frame_cumul = np.where(valid, ann_idx, 0)
    if nrad - 1 > rr_limit:
        ann_frame_cumul[valid & (ann_idx >= rr_limit)] = nrad - 1

    protected = _protect_region(cy, cx, protect_mask, (ny, nx), half_res_y)

    fixed, bpix_map = correct_ann_outliers(
        work, known_bad, ann_width, sig, med_neig, std_neig, cy, cx,
        min_thr, max_thr, stddev, half_res_y)

    n_found = int(bpix_map.sum())
    n_corrected = n_found - int(bpix_map[protected].sum())
    # inside the protected zone only clear pixels above the
    # no-protection floor (min_thr_np), else clear the whole zone
    restore = protected if min_thr_np is None \
        else protected & (work >= min_thr_np)
    bpix_map[restore] = 0
    fixed[restore] = work[restore]
    if verbose:
        print(n_found, " bpix in total, and ", n_corrected, " corrected.")

    if half_res_y:
        fixed = np.repeat(fixed, 2, axis=0)[:2 * ny]
        bpix_map = np.repeat(bpix_map, 2, axis=0)[:2 * ny]
        ann_frame_cumul = np.repeat(ann_frame_cumul, 2, axis=0)[:2 * ny]
    fixed[excl_mask.astype(bool)] = frame_in[excl_mask.astype(bool)]
    bpix_map[excl_mask.astype(bool)] = 0
    return fixed, bpix_map, ann_frame_cumul


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
        bpm_mask = _norm_mask(bpm_mask, array.shape[-2:],
                              "bad pixel mask")
    bpm_mask = _seed_from_values(array, bad_values, bpm_mask)

    if cy is None or cx is None:
        cy, cx = frame_center(array)

    if ndims == 2:
        excl = (np.zeros(array.shape, bool) if excl_mask is None
                else excl_mask)
        fixed, bpix_map, ann_frame = _ann_removal_2d(
            array, cy, cx, fwhm, sig, protect_mask, bpm_mask, excl,
            r_in_std, r_out_std, min_thr, max_thr, min_thr_np,
            half_res_y, verbose)
    else:
        nz = array.shape[0]
        fixed = array.copy()
        bpix_map = np.zeros_like(array)
        ann_frame = np.zeros_like(array)
        fwhm = _seq_per_frame(fwhm, nz)
        if np.isscalar(cx) and np.isscalar(cy):
            cy, cx = [cy] * nz, [cx] * nz
        seeds = (np.zeros(array.shape, bool) if bpm_mask is None
                 else _stack_per_frame(bpm_mask, nz))
        excls = (np.zeros(array.shape, bool) if excl_mask is None
                 else _stack_per_frame(excl_mask, nz))
        for i in range(nz):
            if verbose:
                print("************Frame # ", i, " *************")
            fixed[i], bpix_map[i], ann_frame[i] = _ann_removal_2d(
                array[i], cy[i], cx[i], fwhm[i], sig, protect_mask,
                seeds[i], excls[i], r_in_std, r_out_std, min_thr,
                max_thr, min_thr_np, half_res_y, verbose)
    if full_output:
        return fixed, bpix_map, ann_frame
    return fixed


# ---------------------------------------------------------------------------
# clump correction (iterative sigma filter)
# ---------------------------------------------------------------------------
def _clump_removal_2d(frame, cy, cx, fwhm, sig, protect_mask, seed_map,
                      excl_mask, min_thr, max_nit, half_res_y, mad,
                      verbose):
    """One frame of :func:`cube_fix_badpix_clump`."""
    if excl_mask.shape != frame.shape:
        raise AssertionError(
            "Input exclusion mask should have same shape as array\n")
    excl = excl_mask.astype(bool)
    work = frame
    ny, nx = work.shape
    if half_res_y:
        if ny % 2:
            raise ValueError("The input frames do not have of an even "
                             "number of rows. Hence, you should not use "
                             "option half_res_y = True")
        ny //= 2
        work = frame[::2].copy()
        excl = excl[::2]
        if seed_map is not None:
            seed_map = seed_map[::2]

    fwhm_round = int(round(fwhm))
    box = max(3, fwhm_round + 1 if fwhm_round % 2 == 0 else fwhm_round)
    nneig = int(np.arange(3, box + 2, 2).sum())

    if min_thr is not None:
        if np.isscalar(min_thr):
            min_thr = (-min_thr, min_thr)
        elif not isinstance(min_thr, tuple) or len(min_thr) != 2:
            raise ValueError("if provided, min_thr should be float or "
                             "2-element tuple")
    keep_out = _protect_region(int(cy / 2) if half_res_y else cy, cx,
                               protect_mask, (ny, nx), half_res_y)

    seed = excl.copy()
    if seed_map is not None:
        seed |= seed_map.astype(bool)

    def _detect(img, prior):
        hits = clip_array(img, sig, sig, prior, out_good=False,
                          neighbor=True, num_neighbor=box, mad=mad,
                          half_res_y=half_res_y)
        found = np.zeros(img.shape, dtype=bool)
        found[hits] = True
        if min_thr is not None:
            found &= ~((img > min_thr[0]) & (img < min_thr[1]))
        n_all = int(found.sum())
        found &= ~keep_out
        found &= ~excl
        return found, n_all

    bad, n_all = _detect(work, seed)
    cumulative = bad.copy()
    for nit in range(1, max_nit + 1):
        n_todo = int(bad.sum())
        if not n_todo:
            break
        if verbose:
            msg = f"Iteration {nit}: {n_all} bad pixels identified"
            if protect_mask:
                msg += f", {n_todo} to be corrected"
            print(msg)
        work = sigma_filter(work, bad, neighbor_box=box,
                            min_neighbors=nneig, half_res_y=half_res_y,
                            verbose=verbose)
        bad, n_all = _detect(work, None)
        cumulative |= bad
    if verbose:
        print("All bad pixels are corrected.")
    if half_res_y:
        work = np.repeat(work, 2, axis=0)
        cumulative = np.repeat(cumulative, 2, axis=0)
    return work, cumulative


def cube_fix_badpix_clump(array, bpm_mask=None, correct_only=False, cy=None,
                          cx=None, fwhm=4., sig=4., protect_mask=0,
                          excl_mask=None, half_res_y=False, min_thr=None,
                          max_nit=15, mad=True, bad_values=None,
                          verbose=True, full_output=False, debug=True,
                          nproc=1):
    """Iteratively identify and correct clumps of bad pixels
    (reference badpixremoval.py:836-1262)."""
    out = array.copy()
    ndims = out.ndim
    assert ndims in (2, 3), "Object is not two or three dimensional.\n"
    _require_map_for_correct_only(correct_only, bpm_mask)
    bpm_mask = _seed_from_values(array, bad_values, bpm_mask)
    detect = bpm_mask is None or not correct_only

    if ndims == 2:
        if detect:
            if (cy is None or cx is None) and protect_mask:
                cy, cx = frame_center(array)
            excl = (np.zeros(out.shape, bool) if excl_mask is None
                    else excl_mask)
            out, bad_total = _clump_removal_2d(
                out, cy, cx, fwhm, sig, protect_mask, bpm_mask, excl,
                min_thr, max_nit, half_res_y, mad, verbose)
        else:
            box, nneig = _clump_kernel_geom(fwhm)
            out = sigma_filter(out, bpm_mask, box, nneig, half_res_y,
                               verbose)
            bad_total = bpm_mask
        if full_output:
            return out, bad_total
        return out

    nz = out.shape[0]
    if detect:
        seeds = (np.zeros(out.shape, bool) if bpm_mask is None
                 else _stack_per_frame(bpm_mask.astype(bool), nz))
        excls = (np.zeros(out.shape, bool) if excl_mask is None
                 else _stack_per_frame(excl_mask, nz))
        if cy is None or cx is None:
            cy, cx = frame_center(array)
        cy = _seq_per_frame(cy, nz)
        cx = _seq_per_frame(cx, nz)
        fwhm = _seq_per_frame(fwhm, nz)
        bad_total = np.zeros_like(out)
        for i in range(nz):
            if verbose:
                print("************Frame # ", i, " *************")
            out[i], bad_total[i] = _clump_removal_2d(
                out[i], cy[i], cx[i], fwhm[i], sig, protect_mask,
                seeds[i], excls[i], min_thr, max_nit, half_res_y, mad,
                verbose)
    else:
        bpm3 = _stack_per_frame(bpm_mask.astype(bool), nz)
        # one vmapped device fixed point over the frame axis (the box/nneig
        # arguments are ignored by sigma_filter, reference
        # clip_sigma.py:187-191)
        from ..stats.clip_sigma import cube_sigma_filter

        out = cube_sigma_filter(out, bpm3, verbose=verbose).astype(
            out.dtype)
        bad_total = bpm3
    if full_output:
        return out, bad_total
    return out


# ---------------------------------------------------------------------------
# IFS (SDI-residual) detection
# ---------------------------------------------------------------------------
def cube_fix_badpix_ifs(array, lbdas, fluxes=None, mask=None, cy=None,
                        cx=None, clumps=True, sigma_clip=3, num_neig=5,
                        size=5, protect_mask=0, mad=False,
                        fwhm=4, min_thr=None, max_nit=15, ignore_nan=True,
                        verbose=True, full_output=False, imlib="vip-fft",
                        interpolation="lanczos4"):
    """Identify bad pixels in IFS cubes from SDI residuals
    (reference badpixremoval.py:1265-1478)."""
    from ..preproc.rescaling import find_scal_vector, frame_rescaling

    def _sdi_residuals(chans):
        """Per-channel median residual against the flux/scale-matched
        other channels."""
        flx = [1] * len(lbdas) if fluxes is None else fluxes
        scal_vec, flux_vec = find_scal_vector(
            chans, lbdas, flx, mask=mask, nfp=2, fm="sum", imlib=imlib,
            interpolation=interpolation)
        res = np.zeros_like(chans)
        for z in range(chans.shape[0]):
            diffs = [
                chans[z] - frame_rescaling(
                    (flux_vec[zp] / flux_vec[z]) * chans[zp],
                    ref_xy=ref_xy, scale=scal_vec[zp] / scal_vec[z],
                    imlib=imlib, interpolation=interpolation)
                for zp in range(chans.shape[0]) if zp != z]
            res[z] = np.median(diffs, axis=0)
        return res

    cube = array.copy()
    if cy is None or cx is None:
        cxy = ref_xy = None
    else:
        cy, cx = frame_center(cube)
        cxy = ref_xy = (cx, cy)

    def _detect_and_fix(chans, cyi, cxi, cxyi):
        res = _sdi_residuals(chans)
        if clumps:
            _, bpm = cube_fix_badpix_clump(
                res, bpm_mask=None, cy=cyi, cx=cxi, fwhm=fwhm,
                sig=sigma_clip, protect_mask=protect_mask, verbose=verbose,
                min_thr=min_thr, max_nit=max_nit, mad=mad,
                full_output=True)
        else:
            _, bpm = cube_fix_badpix_isolated(
                res, bpm_mask=None, sigma_clip=sigma_clip,
                num_neig=num_neig, size=size, frame_by_frame=True,
                protect_mask=protect_mask, cxy=cxyi, mad=mad,
                ignore_nan=ignore_nan, verbose=verbose, full_output=True)
        bpm = np.clip(bpm.astype(int), 0, 1)
        fixed = cube_fix_badpix_isolated(
            chans, bpm_mask=bpm, sigma_clip=sigma_clip, num_neig=num_neig,
            size=size, frame_by_frame=True, protect_mask=protect_mask,
            cxy=cxyi, mad=mad, ignore_nan=ignore_nan, verbose=verbose,
            full_output=False)
        return fixed, bpm, res

    if cube.ndim == 3:
        array_out, final_bpm, array_res = _detect_and_fix(cube, cy, cx,
                                                          cxy)
    elif cube.ndim == 4:
        nt = cube.shape[1]
        array_out = np.zeros_like(cube)
        array_res = np.zeros_like(cube)
        final_bpm = np.zeros_like(cube, dtype=int)
        for i in range(nt):
            if verbose:
                print(f"************ Cube #{i + 1}/{nt} *************")
            array_out[:, i], final_bpm[:, i], array_res[:, i] = \
                _detect_and_fix(cube[:, i], cy, cx, cxy)
    else:
        raise TypeError("Input array should be 3D or 4D")

    if full_output:
        return array_out, final_bpm, array_res
    return array_out


# ---------------------------------------------------------------------------
# FFT interpolation ([AAC01])
# ---------------------------------------------------------------------------
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
    snapshots_at = set(nit) if isinstance(nit, list) else None
    nit_max = max(nit) if snapshots_at else nit

    results = []
    spectra = []
    ini_y, ini_x = array.shape
    pad_fac = (int(pad_fac * ini_x / ini_y), pad_fac)
    w = frame_pad(1 - bpm_mask.astype(float), pad_fac, keep_parity=False,
                  fillwith=0)
    g = frame_pad(array, pad_fac, keep_parity=False, fillwith=0) * w
    clock = time_ini() if verbose else None
    G_i = np.fft.fft2(g)
    W = np.fft.fft2(w)
    ny, nx = g.shape
    npix = float(ny * nx)
    F_est = np.zeros(g.shape, dtype=complex)
    Eg = tol + 1

    for it in range(nit_max):
        # strongest remaining error component in the left half-spectrum
        ind = np.unravel_index(np.argmax(np.abs(G_i.real[:, 0:nx // 2])),
                               (ny, nx // 2))
        ind_conj = ((ny - ind[0]) % ny, (nx - ind[1]) % nx)
        self_conj = (ind[0] in (0, ny / 2)) and (ind[1] in (0, nx / 2))
        if self_conj:
            F_i = npix * G_i[ind] / W[0, 0]
            F_est[ind] += F_i
        else:
            w2 = W[(2 * ind[0]) % ny, (2 * ind[1]) % nx]
            if np.abs(W[0, 0]) ** 2 == np.abs(w2) ** 2:
                W[(2 * ind[0]) % ny, (2 * ind[1]) % nx] += \
                    np.amin(np.abs(W)) * 1e-11
                w2 = W[(2 * ind[0]) % ny, (2 * ind[1]) % nx]
            denom = np.abs(W[0, 0]) ** 2 - np.abs(w2) ** 2
            F_i = (npix / denom) * (G_i[ind] * W[0, 0]
                                    - np.conj(G_i[ind]) * w2)
            F_est[ind] += F_i
            F_est[ind_conj] += np.conj(F_i)

        # error-spectrum update: conv[y, x] = F_i W[y-i0, x-i1]
        # (+ conj for the symmetric component) == rolls of W
        conv = F_i * np.roll(W, ind, axis=(0, 1))
        if not self_conj:
            conv = conv + np.conj(F_i) * np.roll(W, (-ind[0], -ind[1]),
                                                 axis=(0, 1))
        G_i = G_i - conv / npix

        Eg = np.sum(np.abs(G_i.ravel()) ** 2) / npix
        take_snapshot = ((snapshots_at and it in snapshots_at)
                         or it == nit_max - 1 or Eg < tol)
        if take_snapshot:
            filled = g + np.fft.ifft2(F_est).real * (1 - w)
            cy, cx = frame_center(filled)
            hy, hx = (ini_y - 1) / 2, (ini_x - 1) / 2
            ys = slice(int(cy - hy), int(cy + hy + 1))
            xs = slice(int(cx - hx), int(cx + hx + 1))
            results.append(filled[ys, xs])
            if full_output:
                spectra.append(np.fft.ifft2(F_est).real[ys, xs])
        if Eg < tol:
            break

    if verbose:
        print(f"FFT-interpolation terminated after {it + 1} iterations "
              f"(Eg={Eg})")
        timing(clock)
    if snapshots_at is None:
        results = results[-1]
        if full_output:
            spectra = spectra[-1]
    return (results, spectra) if full_output else results


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
        excl = np.zeros(array.shape, dtype=bool)
    else:
        excl = (_stack_per_frame(excl_mask, array.shape[0])
                if ndims == 3 else np.asarray(excl_mask))
        if excl.shape[-2:] != array.shape[-2:]:
            raise AssertionError(
                "Input exclusion mask should have same shape as array\n")
        excl = excl.astype(bool)
    if not np.sum(bpm_mask):
        print("Warning: no bad pixel found in bad pixel map. Returning "
              "input array as is.")
        return array

    if ndims == 3:
        nz = array.shape[0]
        bpm_mask = _stack_per_frame(bpm_mask, nz)
    bad = bpm_mask.astype(bool)
    out = array.copy()

    if mode != "fft":
        holes = array.copy()
        holes[bad | excl] = np.nan
        if ndims == 2:
            recon = frame_filter_lowpass(
                holes, mode=mode, fwhm_size=fwhm, conv_mode="conv",
                kernel_sz=kernel_sz, psf=psf, iterate=True,
                half_res_y=half_res_y, **kwargs)
        else:
            fwhm = _seq_per_frame(fwhm, nz)
            if psf is None:
                psf = [None] * nz
            elif np.asarray(psf).ndim == 2:
                psf = [psf] * nz
            recon = np.stack([
                frame_filter_lowpass(
                    holes[z], mode=mode, fwhm_size=fwhm[z],
                    conv_mode="conv", kernel_sz=kernel_sz, psf=psf[z],
                    iterate=True, half_res_y=half_res_y, **kwargs)
                for z in range(nz)])
        out[bad] = recon[bad]
        return out

    # FFT mode
    fill_mask = bad | excl
    if ndims == 2:
        res = frame_fix_badpix_fft(out, fill_mask, nit=nit, tol=tol,
                                   full_output=full_output, verbose=False)
        filled, recon = res if full_output else (res, None)
    else:
        filled = np.empty_like(out)
        recon = np.empty_like(out)
        for z in range(nz):
            res = frame_fix_badpix_fft(out[z], fill_mask[z], nit=nit,
                                       tol=tol, full_output=full_output,
                                       verbose=False)
            if full_output:
                filled[z], recon[z] = res
            else:
                filled[z] = res
    out[bad] = filled[bad]
    if full_output:
        return out, recon
    return out


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
