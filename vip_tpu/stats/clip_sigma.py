"""Sigma filtering / clipping of bad pixels
(reference vip_hci/stats/clip_sigma.py).

The reference accelerates these with numba ("up to ~50x over numpy",
reference README.rst:186). Here both kernels run as jitted JAX window
programs on device (ops/badpix.py): the iterative bad-pixel replacement is
a ``lax.while_loop`` fixed point of a masked 3x3 windowed median, and the
neighbour sigma-clip is one vectorized masked-window statistics pass. Tiny
frames (smaller than the window) fall back to the host loop.
"""

import numpy as np

__all__ = ["clip_array", "sigma_filter"]


def sigma_filter(frame_tmp, bpix_map, neighbor_box=3, min_neighbors=3,
                 half_res_y=False, verbose=False, no_numba=False):
    """Iteratively replace bad pixels by the median of their good
    neighbours (reference clip_sigma.py:24-192).

    NOTE (bug-compat): like the reference, the inner routine is invoked
    with neighbor_box=3 and min_neighbors=3 regardless of the arguments
    (reference clip_sigma.py:187-191).
    """
    if frame_tmp.ndim != 2:
        raise TypeError("Input array is not a frame or 2d array")

    if min(frame_tmp.shape) < 3:
        return _sigma_filter_host(frame_tmp, bpix_map, verbose=verbose)

    from ..ops.badpix import sigma_filter_device

    out, nit = sigma_filter_device(frame_tmp, bpix_map, min_neighbors=3)
    if verbose:
        print("Required number of iterations in the sigma filter: ",
              int(nit))
    out = np.asarray(out, dtype=frame_tmp.dtype)
    if isinstance(frame_tmp, np.ndarray) and frame_tmp.flags.writeable:
        np.copyto(frame_tmp, out)  # the reference mutates in place
        return frame_tmp
    return out


def cube_sigma_filter(cube, bpix_maps, verbose=False):
    """Batched :func:`sigma_filter` over the frame axis (one vmapped
    device fixed point instead of a per-frame host loop)."""
    from ..ops.badpix import cube_sigma_filter_device

    out, nits = cube_sigma_filter_device(cube, bpix_maps, min_neighbors=3)
    if verbose:
        print("Required number of iterations in the sigma filter: ",
              int(np.max(np.asarray(nits))))
    return np.asarray(out, dtype=cube.dtype)


def _sigma_filter_host(frame_tmp, bpix_map, neighbor_box=3, min_neighbors=3,
                       half_res_y=False, verbose=False):
    """Host fallback (the reference's serial sweep, clip_sigma.py:55-192),
    used for frames smaller than the 3x3 window and as a test oracle."""
    neighbor_box = 3
    min_neighbors = 3
    sz_y, sz_x = frame_tmp.shape
    bp = np.asarray(bpix_map).copy()
    im = frame_tmp
    nb = int(np.sum(bp))
    nit = 0
    half_box_x = int(np.floor(neighbor_box / 2.))
    half_box_y = max(1, int(half_box_x / 2)) if half_res_y else half_box_x

    while nb > 0:
        nit += 1
        wb = np.where(bp)
        gp = 1 - bp
        for n in range(nb):
            hbox_b = min(half_box_y, wb[0][n])
            hbox_t = min(half_box_y, sz_y - 1 - wb[0][n])
            hbox_l = min(half_box_x, wb[1][n])
            hbox_r = min(half_box_x, sz_x - 1 - wb[1][n])
            # rebalance box at edges (reference numba variant,
            # clip_sigma.py:93-100)
            if hbox_b < hbox_t:
                hbox_t += half_box_y - hbox_b
            elif hbox_t < hbox_b:
                hbox_b += half_box_y - hbox_t
            if hbox_l < hbox_r:
                hbox_r += half_box_x - hbox_l
            elif hbox_r < hbox_l:
                hbox_l += half_box_x - hbox_r
            sgp = gp[(wb[0][n] - hbox_b):(wb[0][n] + hbox_t + 1),
                     (wb[1][n] - hbox_l):(wb[1][n] + hbox_r + 1)]
            if int(np.sum(sgp)) >= min_neighbors:
                sim = im[(wb[0][n] - hbox_b):(wb[0][n] + hbox_t + 1),
                         (wb[1][n] - hbox_l):(wb[1][n] + hbox_r + 1)]
                im[wb[0][n], wb[1][n]] = np.median(sim[np.where(sgp)])
                bp[wb[0][n], wb[1][n]] = 0
        nb_new = int(np.sum(bp))
        if nb_new == nb:  # stalled: no pixel has enough good neighbours
            break
        nb = nb_new
    if verbose:
        print("Required number of iterations in the sigma filter: ", nit)
    return im


def clip_array(array, lower_sigma, upper_sigma, bpm_mask_ori=None,
               out_good=False, neighbor=False, num_neighbor=3, mad=False,
               min_std=None, half_res_y=False, no_numba=False):
    """Sigma clipping on a 2d array, optionally against local patch
    statistics (reference clip_sigma.py:194-387); one vectorized
    masked-window pass on device instead of the per-pixel loop."""
    if array.ndim != 2:
        raise TypeError("Input array is not two dimensional (frame)\n")
    ny, nx = array.shape
    if bpm_mask_ori is None:
        gpm_ori = np.ones(array.shape, dtype=bool)
    else:
        gpm_ori = ~np.asarray(bpm_mask_ori, dtype=bool)

    if neighbor and num_neighbor:
        half_box_x = int(np.floor(num_neighbor / 2.))
        half_box_y = max(1, int(half_box_x / 2)) if half_res_y \
            else half_box_x
        if ny < 2 * half_box_y + 1 or nx < 2 * half_box_x + 1:
            bpm = _clip_neighbor_host(array, gpm_ori, lower_sigma,
                                      upper_sigma, half_box_y, half_box_x,
                                      mad, min_std)
        else:
            from ..ops.badpix import clip_neighbor_device

            bpm = np.asarray(clip_neighbor_device(
                array, gpm_ori, float(lower_sigma), float(upper_sigma),
                half_box_y, half_box_x, mad=bool(mad),
                has_min_std=min_std is not None,
                min_std=0.0 if min_std is None else float(min_std)))
    else:
        median = np.median(array)
        sigma = np.std(array)
        if min_std is not None:
            sigma = max(sigma, min_std)
        bpm = (array < (median - lower_sigma * sigma)) | \
            (array > (median + upper_sigma * sigma))

    if out_good:
        return np.where(~bpm)
    return np.where(bpm)


def _clip_neighbor_host(array, gpm_ori, lower_sigma, upper_sigma,
                        half_box_y, half_box_x, mad, min_std):
    """Host fallback for frames smaller than the window (reference
    clip_sigma.py:280-345 semantics), and test oracle."""
    ny, nx = array.shape
    bpm = np.ones(array.shape, dtype=bool)
    for y in range(ny):
        for x in range(nx):
            if not gpm_ori[y, x]:
                continue
            hbox_b = min(half_box_y, y)
            hbox_t = min(half_box_y, ny - 1 - y)
            hbox_l = min(half_box_x, x)
            hbox_r = min(half_box_x, nx - 1 - x)
            if hbox_b < hbox_t:
                hbox_t += half_box_y - hbox_b
            elif hbox_t < hbox_b:
                hbox_b += half_box_y - hbox_t
            if hbox_l < hbox_r:
                hbox_r += half_box_x - hbox_l
            elif hbox_r < hbox_l:
                hbox_l += half_box_x - hbox_r
            sub_arr = array[max(0, y - hbox_b):y + hbox_t + 1,
                            max(0, x - hbox_l):x + hbox_r + 1]
            gp_arr = gpm_ori[max(0, y - hbox_b):y + hbox_t + 1,
                             max(0, x - hbox_l):x + hbox_r + 1]
            neighbours = sub_arr[np.nonzero(gp_arr)]
            # remove the pixel itself once (reference clip_sigma.py:316-327)
            neigh_list = []
            remove_itself = True
            for v in neighbours:
                if v == array[y, x] and remove_itself:
                    remove_itself = False
                else:
                    neigh_list.append(v)
            neigh_arr = np.array(neigh_list)
            if neigh_arr.size == 0:
                bpm[y, x] = False
                continue
            median = np.median(neigh_arr)
            if mad:
                sigma = np.median(np.abs(median - neigh_arr))
            else:
                sigma = np.std(neigh_arr)
            if min_std is not None:
                sigma = max(sigma, min_std)
            bad1 = array[y, x] < (median - lower_sigma * sigma)
            bad2 = array[y, x] > (median + upper_sigma * sigma)
            bpm[y, x] = bad1 | bad2
    return bpm
