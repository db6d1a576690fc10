"""Cube/frame cosmetics: cropping, padding, NaN correction.

Port of vip_hci/preproc/cosmetics.py (host-side geometry; cheap ops).
"""

import numpy as np

from ..var.coords import frame_center
from ..var.shapes import get_square

__all__ = ["cube_crop_frames", "frame_crop", "frame_pad", "cube_drop_frames",
           "frame_remove_stripes", "cube_correct_nan", "approx_stellar_position"]


def cube_crop_frames(array, size, xy=None, force=False, verbose=True,
                     full_output=False):
    """Crop frames in a 3d/4d cube (cosmetics.py:38-111)."""
    array = np.asarray(array)
    if array.ndim == 3:
        temp_fr = array[0]
    elif array.ndim == 4:
        temp_fr = array[0, 0]
    else:
        raise TypeError("`Array` is not a cube (3d or 4d numpy.ndarray)")

    if temp_fr.shape[0] == size and temp_fr.shape[1] == size:
        if verbose:
            print("Frame size already matches crop size. No cropping needed.")
        if full_output:
            ceny, cenx = frame_center(temp_fr)
            return array, cenx, ceny
        return array

    if xy is not None:
        cenx, ceny = xy
    else:
        ceny, cenx = frame_center(temp_fr)
    _, y0, x0 = get_square(temp_fr, size, y=ceny, x=cenx, position=True,
                           force=force, verbose=verbose)

    if not force:
        if temp_fr.shape[0] % 2 == 0:
            if size % 2 != 0:
                size += 1
        else:
            if size % 2 == 0:
                size += 1
    y1 = int(y0 + size)
    x1 = int(x0 + size)

    if array.ndim == 3:
        array_out = array[:, y0:y1, x0:x1]
    else:
        array_out = array[:, :, y0:y1, x0:x1]

    if verbose:
        print(f"New shape: {array_out.shape}")
    if full_output:
        return array_out, cenx, ceny
    return array_out


def frame_crop(array, size, xy=None, force=False, verbose=True):
    """Crop a square subframe (cosmetics.py:112-157)."""
    array = np.asarray(array)
    if array.ndim != 2:
        raise TypeError("`Array` is not a frame or 2d array")
    if array.shape[0] == size and array.shape[1] == size:
        if verbose:
            print("Frame size already matches crop size. No cropping needed.")
        return array
    if not xy:
        ceny, cenx = frame_center(array)
    else:
        cenx, ceny = xy
    array_view = get_square(array, size, ceny, cenx, force=force,
                            verbose=verbose)
    if verbose:
        print(f"New shape: {array_view.shape}")
    return array_view


def frame_pad(array, fac, fillwith=0, loc=0, scale=1, keep_parity=True,
              full_output=False):
    """Pad a frame by a multiplicative size factor (cosmetics.py:158-242)."""
    array = np.asarray(array)
    if array.ndim != 2:
        raise TypeError("The input array must be 2d")
    if np.isscalar(fac):
        if fac < 1:
            raise ValueError("fac should be larger than 1")
        fac = [fac, fac]
    elif fac[0] < 1 or fac[-1] < 1:
        raise ValueError("fac elements should be larger than 1")

    y, x = array.shape
    cy_ori, cx_ori = frame_center(array)
    new_y = int(round(y * fac[0]))
    new_x = int(round(x * fac[1]))
    if new_y % 2 != y % 2 and keep_parity:
        new_y -= 1
    if new_x % 2 != x % 2 and keep_parity:
        new_x -= 1
    if fillwith == "noise":
        array_out = np.random.normal(loc=loc, scale=scale,
                                     size=(new_y, new_x))
    else:
        array_out = np.zeros([new_y, new_x], dtype=array.dtype)
        array_out[:] = fillwith
    cy, cx = frame_center(array_out)
    y0 = int(cy - cy_ori)
    y1 = int(cy + cy_ori)
    if y1 - y0 < y:
        y1 += 1
    elif y1 - y0 > y:
        y1 -= 1
    x0 = int(cx - cx_ori)
    x1 = int(cx + cx_ori)
    if x1 - x0 < x:
        x1 += 1
    elif x1 - x0 > x:
        x1 -= 1
    array_out[y0:y1, x0:x1] = array.copy()

    if full_output:
        return array_out, (y0, y1, x0, x1)
    return array_out


def cube_drop_frames(array, n, m, parallactic=None, verbose=True):
    """Discard frames at the beginning/end of a cube (cosmetics.py:243-301).

    Keeps frames n..m (1-based, inclusive)."""
    array = np.asarray(array)
    if m > array.shape[0]:
        raise TypeError("End index must be smaller than the # of frames")
    if array.ndim == 3:
        array_view = array[n - 1:m].copy()
    elif array.ndim == 4:
        array_view = array[:, n - 1:m].copy()
    else:
        raise TypeError("only 3d and 4d cubes are supported")
    if parallactic is not None:
        if parallactic.ndim != 1:
            raise TypeError("Parallactic angles vector has wrong shape")
        parallactic = parallactic[n - 1:m]
    if verbose:
        print(f"Cube successfully sliced. New cube shape: {array_view.shape}")
    if parallactic is not None:
        return array_view, parallactic
    return array_view


def frame_remove_stripes(array):
    """Remove vertical stripe artifacts: subtract from each column the
    mean of its first and last 50 rows (reference cosmetics.py:302-312,
    which also mutates the input in place — we return a copy)."""
    array = np.asarray(array, dtype=float).copy()
    lines = np.vstack((array[:50], array[-50:]))
    array -= lines.mean(axis=0)[None, :]
    return array


def cube_correct_nan(cube, neighbor_box=3, min_neighbors=3, verbose=False,
                     half_res_y=False, nproc=1):
    """Correct NaN values by the iterative median-of-good-neighbours
    sigma filter — the same math as the reference's numba kernel
    (cosmetics.py:313-453 -> nan_corr_2d -> stats.sigma_filter)."""
    cube = np.asarray(cube, dtype=float).copy()

    def _fix_frame(frame):
        return nan_corr_2d(frame, neighbor_box, min_neighbors, half_res_y,
                           verbose, full_output=False)

    if cube.ndim == 2:
        return _fix_frame(cube)
    elif cube.ndim == 3:
        from ..config.utils_conf import iterable, pool_map

        cube = np.array(pool_map(nproc, _fix_frame, iterable(cube)))
    elif cube.ndim == 4:
        for j in range(cube.shape[0]):
            for i in range(cube.shape[1]):
                cube[j, i] = _fix_frame(cube[j, i])
    if verbose:
        print("All nan pixels are corrected.")
    return cube


def approx_stellar_position(cube, fwhm, return_test=False, verbose=False):
    """Approximate the star position per channel: per-frame
    median-filtered peak (``peak_coordinates``), 2.5-sigma-clipped
    column statistics with +-3*stddev outlier gating, and replacement of
    outliers by the nearest good channels (reference
    cosmetics.py:500-595, bit-identical)."""
    from ..metrics.detection import _sigma_clipped_stats, peak_coordinates

    obj_tmp = np.asarray(cube)
    n_z = obj_tmp.shape[0]
    if np.isscalar(fwhm):
        fwhm = np.full(n_z, fwhm)

    star_tmp_idx = np.zeros([n_z, 2])
    star_approx_idx = np.zeros([n_z, 2])
    test_result = np.ones(n_z)
    for zz in range(n_z):
        star_tmp_idx[zz] = peak_coordinates(obj_tmp[zz], fwhm[zz])

    _, med_y, stddev_y = _sigma_clipped_stats(star_tmp_idx[:, 0], sigma=2.5)
    _, med_x, stddev_x = _sigma_clipped_stats(star_tmp_idx[:, 1], sigma=2.5)
    lim_inf_y, lim_sup_y = med_y - 3 * stddev_y, med_y + 3 * stddev_y
    lim_inf_x, lim_sup_x = med_x - 3 * stddev_x, med_x + 3 * stddev_x

    if verbose:
        print("median y of star - 3sigma = ", lim_inf_y)
        print("median y of star + 3sigma = ", lim_sup_y)
        print("median x of star - 3sigma = ", lim_inf_x)
        print("median x of star + 3sigma = ", lim_sup_x)

    for zz in range(n_z):
        if (star_tmp_idx[zz, 0] < lim_inf_y
                or star_tmp_idx[zz, 0] > lim_sup_y
                or star_tmp_idx[zz, 1] < lim_inf_x
                or star_tmp_idx[zz, 1] > lim_sup_x):
            test_result[zz] = 0

    # replace outliers by the median of the nearest good channels
    for zz in range(n_z):
        if test_result[zz] == 0:
            ii = 1
            inf_neigh = max(0, zz - ii)
            sup_neigh = min(n_z - 1, zz + ii)
            while test_result[inf_neigh] == 0 \
                    and test_result[sup_neigh] == 0:
                ii += 1
                inf_neigh = max(0, zz - ii)
                sup_neigh = min(n_z - 1, zz + ii)
            if test_result[inf_neigh] == 1 and test_result[sup_neigh] == 1:
                star_approx_idx[zz] = np.floor(
                    (star_tmp_idx[sup_neigh] + star_tmp_idx[inf_neigh]) / 2)
            elif test_result[inf_neigh] == 1:
                star_approx_idx[zz] = star_tmp_idx[inf_neigh]
            else:
                star_approx_idx[zz] = star_tmp_idx[sup_neigh]
        else:
            star_approx_idx[zz] = star_tmp_idx[zz]

    if return_test:
        return star_approx_idx, test_result.astype(bool)
    return star_approx_idx


def nan_corr_2d(obj_tmp, neighbor_box, min_neighbors, half_res_y, verbose,
                full_output=True):
    """Correct the NaN pixels of one frame with the iterative sigma filter
    (reference cosmetics.py:454-497). Returns the corrected frame and,
    with ``full_output``, the number of corrected pixels."""
    from ..stats.clip_sigma import sigma_filter

    obj_tmp = np.asarray(obj_tmp, dtype=float)
    n_y, n_x = obj_tmp.shape
    if half_res_y:
        if n_y % 2 != 0:
            raise ValueError("The input frames do not have an even number "
                             "of rows. Hence, you should probably not be "
                             "using the option half_res_y = True.")
        n_y = n_y // 2
        obj_tmp = obj_tmp[::2].copy()

    nan_map = np.where(np.isnan(obj_tmp), 1.0, 0.0)
    nnanpix = int(nan_map.sum())
    obj_tmp = sigma_filter(obj_tmp, nan_map, neighbor_box=neighbor_box,
                           min_neighbors=min_neighbors, verbose=verbose,
                           half_res_y=half_res_y)
    if half_res_y:
        obj_tmp = np.repeat(obj_tmp, 2, axis=0)

    if full_output:
        return obj_tmp, nnanpix
    return obj_tmp
