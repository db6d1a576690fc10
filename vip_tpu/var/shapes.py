"""Geometry engine: masks, annuli/segments, cube→matrix conversion.

Host-side numpy port of vip_hci/var/shapes.py. In the TPU architecture these
functions are *static geometry builders*: they run once on host, and their
boolean masks / index sets become compile-time constants (gathers, masked
reductions) inside the jitted device pipelines. The pixel-selection
semantics (strict ``< 1`` normalized distance, annulus ``in <= r < out``)
replicate skimage.draw / reference shapes.py exactly, since they gate
numerical parity of every annular algorithm.
"""

import numpy as np

from ..config.utils_conf import frame_or_shape
from .coords import frame_center, dist

__all__ = [
    "resolve_n_segments",
    "dist",
    "frame_center",
    "get_square",
    "get_circle",
    "get_ellipse",
    "get_ell_annulus",
    "get_annulus_segments",
    "get_annular_wedge",
    "mask_circle",
    "mask_ellipse",
    "create_ringed_spider_mask",
    "matrix_scaling",
    "prepare_matrix",
    "reshape_matrix",
    "disk_coords",
    "mask_roi",
]


# ---------------------------------------------------------------------------
# skimage.draw-compatible primitives (strict '< 1' normalized distance)
# ---------------------------------------------------------------------------
def _ellipse_in_shape(shape, center, radii):
    r_lim, c_lim = np.ogrid[0:float(shape[0]), 0:float(shape[1])]
    r_org, c_org = center
    r_rad, c_rad = radii
    distances = ((r_lim - r_org) / r_rad) ** 2 + ((c_lim - c_org) / c_rad) ** 2
    return np.nonzero(distances < 1)


def disk_coords(center, radius, shape):
    """Pixel coordinates strictly inside a circle (skimage.draw.disk
    semantics, used by reference mask_circle via shapes.py:88)."""
    return _ellipse_in_shape(shape, center, (radius, radius))


def mask_circle(array, radius, fillwith=0, mode="in", cy=None, cx=None,
                output="masked_arr"):
    """Mask pixels inside/outside a circle (reference shapes.py:38-114)."""
    if not isinstance(fillwith, (int, float)):
        raise ValueError("`fillwith` must be integer, float or np.nan")
    array = np.asarray(array)
    if cy is None or cx is None:
        cy, cx = frame_center(array)
    shape = (array.shape[-2], array.shape[-1])

    if radius == 0:
        mask = np.ones(shape, dtype=bool) if mode == "in" else \
            np.zeros(shape, dtype=bool)
        if output == "bool_mask":
            return mask
        return mask[0, 0] * array

    ind = disk_coords((cy, cx), radius, shape)

    if output == "bool_mask":
        mask = np.ones(shape, dtype=bool)
        mask[ind] = False
        return mask

    if mode == "in":
        array_masked = array.copy()
        if array.ndim == 2:
            array_masked[ind] = fillwith
        elif array.ndim == 3:
            array_masked[:, ind[0], ind[1]] = fillwith
        elif array.ndim == 4:
            array_masked[:, :, ind[0], ind[1]] = fillwith
    elif mode == "out":
        array_masked = np.full_like(array, fillwith)
        if array.ndim == 2:
            array_masked[ind] = array[ind]
        elif array.ndim == 3:
            array_masked[:, ind[0], ind[1]] = array[:, ind[0], ind[1]]
        elif array.ndim == 4:
            array_masked[:, :, ind[0], ind[1]] = array[:, :, ind[0], ind[1]]
    else:
        raise ValueError("mode not recognized")
    return array_masked


def mask_ellipse(array, a, b, theta, fillwith=0, mode="in", cy=None, cx=None,
                 output="masked_arr"):
    """Elliptic mask (reference shapes.py:116-187)."""
    array = np.asarray(array)
    if cy is None or cx is None:
        cy, cx = frame_center(array)
    shape = (array.shape[-2], array.shape[-1])

    # rotated ellipse membership, strict < 1
    rot = -np.deg2rad(theta - 90)
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    dy = yy - cy
    dx = xx - cx
    yr = dy * np.cos(rot) + dx * np.sin(rot)
    xr = -dy * np.sin(rot) + dx * np.cos(rot)
    inside = (yr / b) ** 2 + (xr / a) ** 2 < 1
    ind = np.nonzero(inside)

    if output == "bool_mask":
        mask = np.ones(shape, dtype=bool)
        mask[ind] = False
        return mask

    if mode == "in":
        array_masked = array.copy()
        array_masked[..., ind[0], ind[1]] = fillwith
    elif mode == "out":
        array_masked = np.full_like(array, fillwith)
        array_masked[..., ind[0], ind[1]] = array[..., ind[0], ind[1]]
    else:
        raise ValueError("mode not recognized")
    return array_masked


def create_ringed_spider_mask(im_shape, ann_out, ann_in=0, sp_width=10,
                              sp_angle=0, nlegs=6):
    """Annulus mask with spider legs zeroed (reference shapes.py:188-254)."""
    from matplotlib.path import Path

    mask = np.zeros(im_shape)
    nbranch = int(nlegs / 2)
    s = im_shape
    r = min(s) / 2
    theta = np.arctan2(sp_width / 2, r)

    cy, cx = frame_center(mask)
    rr0, cc0 = _unbounded_disk((cy, cx), ann_out)
    cond = (rr0 >= 0) & (rr0 < s[0]) & (cc0 >= 0) & (cc0 < s[1])
    mask[rr0[cond], cc0[cond]] = 1

    t0 = np.array([theta, np.pi - theta, np.pi + theta, 2 * np.pi - theta])
    if isinstance(sp_angle, (list, np.ndarray)):
        dtheta = [sp_angle[i] - sp_angle[0] for i in range(nbranch)]
    else:
        sp_angle = [sp_angle]
        dtheta = [i * 180.0 / nbranch for i in range(nbranch)]
    for i in range(nbranch):
        tn = t0 + np.deg2rad(sp_angle[0] + dtheta[i])
        xn = r * np.cos(tn) + s[1] / 2
        yn = r * np.sin(tn) + s[0] / 2
        rr, cc = _polygon_coords(yn, xn, s)
        mask[rr, cc] = 0
    rr4, cc4 = disk_coords((cy, cx), ann_in, s) if ann_in > 0 else \
        (np.array([], int), np.array([], int))
    mask[rr4, cc4] = 0
    return mask


def _unbounded_disk(center, radius):
    cy, cx = center
    size = int(np.ceil(max(cy, cx) + radius + 2))
    rr, cc = _ellipse_in_shape((size, size), center, (radius, radius))
    return rr, cc


def _polygon_coords(r, c, shape):
    from matplotlib.path import Path

    rr, cc = np.mgrid[: shape[0], : shape[1]]
    pts = np.column_stack([np.asarray(r), np.asarray(c)])
    inside = Path(pts).contains_points(
        np.column_stack([rr.ravel(), cc.ravel()])
    ).reshape(shape)
    return np.nonzero(inside)


def get_square(array, size, y, x, position=False, force=False, verbose=True):
    """Square subframe centered at (y, x) (reference shapes.py:255-354)."""
    array = np.asarray(array)
    size_init_y, size_init_x = array.shape
    size_init = array.shape[0]

    if array.ndim != 2:
        raise TypeError("Input array is not a 2d array.")
    if not isinstance(size, (int, np.integer)):
        raise TypeError("`Size` must be integer")
    if size >= size_init_y and size >= size_init_x:
        raise ValueError("`Size` is equal to or bigger than the initial frame"
                         " size")

    if not force:
        if size_init % 2 == 0 and size % 2 != 0:
            size += 1
            if verbose:
                print("`Size` is odd (while input frame size is even). "
                      f"Setting `size` to {size} pixels")
        elif size_init % 2 != 0 and size % 2 == 0:
            size += 1
            if verbose:
                print("`Size` is even (while input frame size is odd). "
                      f"Setting `size` to {size} pixels")

    wing = (size - 1) / 2
    y0 = int(y - wing)
    y1 = int(y + wing + 1)
    x0 = int(x - wing)
    x1 = int(x + wing + 1)

    if y0 < 0 or x0 < 0 or y1 > size_init_y or x1 > size_init_x:
        raise RuntimeError(
            f"square cannot be obtained with size={size}, y={y}, x={x}"
        )

    array_out = array[y0:y1, x0:x1].copy()
    if position:
        return array_out, y0, x0
    return array_out


def get_circle(array, radius, cy=None, cx=None, mode="mask"):
    """Centered circular region (reference shapes.py:354-414); note the
    strict ``< r**2`` convention distinct from ``mask_circle``."""
    array = np.asarray(array)
    if array.ndim != 2:
        raise TypeError("Input array is not a frame or 2d array.")
    sy, sx = array.shape
    if cy is None or cx is None:
        cy, cx = frame_center(array, verbose=False)

    yy, xx = np.ogrid[:sy, :sx]
    circle_mask = (yy - cy) ** 2 + (xx - cx) ** 2 < radius**2
    if mode == "mask":
        return array * circle_mask
    elif mode == "val":
        return array[circle_mask]
    elif mode == "ind":
        return np.where(circle_mask)
    raise ValueError(f"mode '{mode}' unknown!")


def get_ellipse(data, a, b, pa, cy=None, cx=None, mode="ind"):
    """Centered elliptical region via the two-foci definition
    (reference shapes.py:414-473)."""
    array = frame_or_shape(data)
    if cy is None or cx is None:
        cy, cx = frame_center(array, verbose=False)

    f = np.sqrt(a**2 - b**2)
    pa_rad = np.deg2rad(pa)
    pos_f1 = (cy + f * np.cos(pa_rad), cx + f * np.sin(pa_rad))
    pos_f2 = (cy - f * np.cos(pa_rad), cx - f * np.sin(pa_rad))

    yy, xx = np.ogrid[: array.shape[0], : array.shape[1]]
    ell = (np.sqrt((yy - pos_f1[0]) ** 2 + (xx - pos_f1[1]) ** 2)
           + np.sqrt((yy - pos_f2[0]) ** 2 + (xx - pos_f2[1]) ** 2))
    ellipse_mask = ell < 2 * a

    if mode == "ind":
        return np.where(ellipse_mask)
    elif mode == "val":
        return array[ellipse_mask]
    elif mode == "mask":
        return array * ellipse_mask
    elif mode == "bool":
        return ellipse_mask
    raise ValueError(f"mode '{mode}' unknown!")


def get_annulus_segments(data, inner_radius, width, nsegm=1, theta_init=0,
                         optim_scale_fact=1, mode="ind", out=False):
    """Indices/values/masks of segments of a centered annulus.

    Exact port of reference shapes.py:474-583 (the annulus is
    ``inner <= r < inner + width*optim_scale_fact``; segments tile the
    azimuth starting at ``theta_init`` from the positive x-axis,
    counter-clockwise).
    """
    array = frame_or_shape(data)

    if not isinstance(nsegm, int):
        raise TypeError("`nsegm` must be an integer")

    cy, cx = frame_center(array)
    azimuth_coverage = np.deg2rad(int(np.ceil(360 / nsegm)))
    twopi = 2 * np.pi

    yy, xx = np.mgrid[: array.shape[0], : array.shape[1]]
    rad = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
    phi = np.arctan2(yy - cy, xx - cx)
    phirot = phi % twopi
    outer_radius = inner_radius + (width * optim_scale_fact)
    masks = []

    for i in range(nsegm):
        phi_start = np.deg2rad(theta_init) + (i * azimuth_coverage)
        phi_end = phi_start + azimuth_coverage

        if phi_start < twopi and phi_end > twopi:
            masks.append(
                (rad >= inner_radius) & (rad < outer_radius)
                & (phirot >= phi_start) & (phirot <= twopi)
                | (rad >= inner_radius) & (rad < outer_radius)
                & (phirot >= 0) & (phirot < phi_end - twopi)
            )
        elif phi_start >= twopi and phi_end > twopi:
            masks.append(
                (rad >= inner_radius) & (rad < outer_radius)
                & (phirot >= phi_start - twopi)
                & (phirot < phi_end - twopi)
            )
        else:
            masks.append(
                (rad >= inner_radius) & (rad < outer_radius)
                & (phirot >= phi_start) & (phirot < phi_end)
            )

    if out:
        masks = ~np.array(masks)

    if mode == "ind":
        return [np.where(mask) for mask in masks]
    elif mode == "val":
        return [array[mask] for mask in masks]
    elif mode == "mask":
        return [array * mask for mask in masks]
    raise ValueError(f"mode '{mode}' unknown!")


def get_annular_wedge(data, inner_radius, width, wedge=(0, 360), mode="ind"):
    """Wedge of an annulus (reference shapes.py:584-660)."""
    array = frame_or_shape(data)
    cy, cx = frame_center(array)
    yy, xx = np.mgrid[: array.shape[0], : array.shape[1]]
    rad = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
    phi = np.arctan2(yy - cy, xx - cx)
    phirot = phi % (2 * np.pi)
    outer_radius = inner_radius + width
    phi_start = np.deg2rad(wedge[0])
    phi_end = np.deg2rad(wedge[1])

    if phi_start < 2 * np.pi and phi_end > 2 * np.pi:
        mask = ((rad >= inner_radius) & (rad < outer_radius)
                & (phirot >= phi_start) & (phirot <= 2 * np.pi)) | \
               ((rad >= inner_radius) & (rad < outer_radius)
                & (phirot >= 0) & (phirot < phi_end - 2 * np.pi))
    elif phi_start >= 2 * np.pi and phi_end > 2 * np.pi:
        mask = ((rad >= inner_radius) & (rad < outer_radius)
                & (phirot >= phi_start - 2 * np.pi)
                & (phirot < phi_end - 2 * np.pi))
    else:
        mask = ((rad >= inner_radius) & (rad < outer_radius)
                & (phirot >= phi_start) & (phirot < phi_end))

    if mode == "ind":
        return np.where(mask)
    elif mode == "val":
        return array[mask]
    elif mode == "mask":
        return array * mask
    raise ValueError(f"mode '{mode}' unknown!")


def mask_roi(array, source_xy, exc_radius=4, ann_width=4, inc_radius=8,
             mode="val", plot=False):
    """Region-of-interest mask for a test point source [GEB20]: the local
    circle r2 (radius ``inc_radius``) at the source, the symmetric circle
    r3 opposite the star, and the annulus r4 through the source, with the
    exclusion circle r1 (radius ``exc_radius``) removed from r2 and r4
    (reference shapes.py:913-1017, incl. its out-of-field TypeErrors)."""
    array = np.asarray(array)
    if exc_radius >= inc_radius:
        print("Warning: The excluded region is bigger than the included "
              "region")
    frsize = array.shape[0]
    cx, cy = source_xy
    yc, xc = frame_center(array)
    distance = dist(yc, xc, cy, cx)

    if distance >= (frsize / 2) - (inc_radius / 2):
        raise TypeError("Circles are out of the field. Try changing "
                        "coordinates or the circles radius")
    if ann_width / 2 + distance > frsize / 2:
        raise TypeError("Annulus is out of the field. Try changing "
                        "coordinates or the annulus width")

    yr1, xr1 = get_circle(array, radius=exc_radius, cy=cy, cx=cx,
                          mode="ind")
    r2 = get_circle(array, radius=inc_radius, cy=cy, cx=cx, mode="mask")
    r3 = get_circle(array, radius=inc_radius, cy=2 * yc - cy,
                    cx=2 * xc - cx, mode="mask")
    r4 = get_annulus_segments(array, distance - ann_width / 2, ann_width,
                              mode="mask")[0]
    # NOTE the reference builds the mask from the masked *values*
    # (r2+r3+r4 != 0), so zero-valued pixels inside the regions drop out
    # of the mask — replicated as-is
    r2[yr1, xr1] = 0
    r4[yr1, xr1] = 0
    mask = (r2 + r3 + r4) != 0
    if plot:
        import matplotlib.pyplot as plt

        _, ax = plt.subplots(figsize=(5, 5), dpi=100)
        ax.imshow(mask, origin="lower", interpolation="nearest",
                  cmap="viridis")
        ax.plot(xc, yc, "r+", ms=10)
        plt.show()
    if mode == "bool":
        return mask
    elif mode == "val":
        return array[mask]
    elif mode == "mask":
        return array * mask
    elif mode == "ind":
        # NOTE the reference returns np.where(mask is True) here — always
        # empty (an `is` on an ndarray); we return the actual indices
        return np.where(mask)
    raise ValueError(f"mode '{mode}' unknown!")


# ---------------------------------------------------------------------------
# matrix preparation (cube → [n_frames, n_px])
# ---------------------------------------------------------------------------
def matrix_scaling(matrix, scaling):
    """Scale a matrix (sklearn.preprocessing.scale semantics, incl. the
    zero-variance→1 guard and post-scale re-centering;
    reference shapes.py:740-782)."""
    matrix = np.asarray(matrix)
    if scaling is None:
        return matrix
    if scaling == "temp-mean":
        return matrix - matrix.mean(axis=0)
    elif scaling == "spat-mean":
        return matrix - matrix.mean(axis=1, keepdims=True)
    elif scaling == "temp-standard":
        centered = matrix - matrix.mean(axis=0)
        std = matrix.std(axis=0)
        std = np.where(std == 0, 1.0, std)
        scaled = centered / std
        return scaled - scaled.mean(axis=0)
    elif scaling == "spat-standard":
        centered = matrix - matrix.mean(axis=1, keepdims=True)
        std = matrix.std(axis=1, keepdims=True)
        std = np.where(std == 0, 1.0, std)
        scaled = centered / std
        return scaled - scaled.mean(axis=1, keepdims=True)
    raise ValueError("Scaling mode not recognized")


def prepare_matrix(array, scaling=None, mask_center_px=None, mode="fullfr",
                   inner_radius=None, outer_radius=None,
                   discard_mask_pix=False, verbose=True):
    """Build the [n_frames, n_px] matrix for SVD/PCA
    (reference shapes.py:784-875)."""
    array = np.asarray(array)
    if mode == "annular":
        if inner_radius is None or outer_radius is None:
            raise ValueError("`inner_radius` and `outer_radius` must be "
                             "defined in annular mode")
        fr_size = array.shape[1]
        annulus_width = int(np.round(outer_radius - inner_radius))
        ind = get_annulus_segments((fr_size, fr_size), inner_radius,
                                   annulus_width, nsegm=1)[0]
        yy, xx = ind
        matrix = array[:, yy, xx]
        matrix = matrix_scaling(matrix, scaling)
        if verbose:
            print("Done vectorizing the cube annulus. Matrix shape: "
                  f"({matrix.shape[0]}, {matrix.shape[1]})")
        return matrix, ind

    elif mode == "fullfr":
        if mask_center_px:
            if discard_mask_pix:
                mask = mask_circle(array, mask_center_px, output="bool_mask")
                array = array[:, mask]
            else:
                array = mask_circle(array, mask_center_px)
        nfr = array.shape[0]
        matrix = np.reshape(array, (nfr, -1))
        matrix = matrix_scaling(matrix, scaling)
        if verbose:
            print("Done vectorizing the frames. Matrix shape: "
                  f"({matrix.shape[0]}, {matrix.shape[1]})")
        return matrix
    raise ValueError("mode not recognized")


def reshape_matrix(array, y, x):
    """Matrix of vectorized frames → cube (reference shapes.py:876-912)."""
    return np.asarray(array).reshape(array.shape[0], y, x)


def get_ell_annulus(data, a, b, PA, width, cy=None, cx=None, mode="ind"):
    """Centered elliptical annulus of a 2d frame
    (reference shapes.py:678-737)."""
    array = frame_or_shape(data)
    hwa = width / 2
    hwb = (width * b / a) / 2
    big_ellipse = get_ellipse(array, a + hwa, b + hwb, PA, cy=cy, cx=cx,
                              mode="bool")
    small_ellipse = get_ellipse(array, a - hwa, b - hwb, PA, cy=cy, cx=cx,
                                mode="bool")
    ell_ann_mask = big_ellipse ^ small_ellipse
    if mode == "ind":
        return np.where(ell_ann_mask)
    elif mode == "val":
        return array[ell_ann_mask]
    elif mode == "mask":
        return array * ell_ann_mask
    elif mode == "bool":
        return ell_ann_mask
    raise ValueError("mode '{}' unknown!".format(mode))


def resolve_n_segments(n_segments, n_annuli, asize, default=1):
    """Per-annulus segment counts: an int broadcasts, 'auto' picks the
    count whose arc length stays close to one 4-segment arc of the first
    annuli (the reference's auto-segments rule, pca_local.py:644-652)."""
    if n_segments is None:
        return [default] * n_annuli
    if isinstance(n_segments, int):
        return [n_segments] * n_annuli
    if n_segments == "auto":
        counts = [2, 3]
        arc = 2 * np.tan(360 / 4 / 2) * asize
        for ann in range(2, n_annuli):
            opening = np.rad2deg(2 * np.arctan(arc / (2 * ann * asize)))
            counts.append(int(np.ceil(360 / opening)))
        return counts
    return list(n_segments)
