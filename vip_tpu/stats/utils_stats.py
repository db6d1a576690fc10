"""Descriptive statistics helpers (reference stats/utils_stats.py)."""

import numpy as np

from ..var.coords import frame_center
from ..var.shapes import get_annulus_segments, get_circle, get_square

__all__ = ["descriptive_stats", "frame_basic_stats", "cube_basic_stats"]


def descriptive_stats(array, verbose=True, label="", mean=False, plot=False):
    """Simple summary statistics of a vector (utils_stats.py:20-48)."""
    array = np.asarray(array)
    if mean:
        mean_ = np.mean(array)
    median = np.median(array)
    mini = np.min(array)
    maxi = np.max(array)
    first_qu = np.percentile(array, 25)
    third_qu = np.percentile(array, 75)

    if verbose:
        if mean:
            lab = label + ("min={:.1f} / 1st QU={:.1f} / ave={:.1f} / "
                           "med={:.1f} / 3rd QU={:.1f} / max={:.1f}")
            print(lab.format(mini, first_qu, mean_, median, third_qu, maxi))
        else:
            lab = label + ("min={:.1f} / 1st QU={:.1f} / med={:.1f} / "
                           "3rd QU={:.1f} / max={:.1f}")
            print(lab.format(mini, first_qu, median, third_qu, maxi))

    if plot:
        from matplotlib.pyplot import boxplot

        boxplot(array, vert=False, meanline=mean, showfliers=True, sym=".")

    if mean:
        return mini, first_qu, mean_, median, third_qu, maxi
    return mini, first_qu, median, third_qu, maxi


def _region_values(frame, region, radius, xy, inner_radius, size):
    if region == "circle":
        if xy is not None:
            x, y = xy
        else:
            y, x = frame_center(frame)
        return get_circle(frame, radius, cy=y, cx=x, mode="val")
    elif region == "annulus":
        return get_annulus_segments(frame, inner_radius, radius,
                                    mode="val")[0]
    elif region == "square":
        if xy is not None:
            x, y = xy
        else:
            y, x = frame_center(frame)
        return get_square(frame, size, y, x, verbose=False).ravel()
    raise ValueError("Region not recognized")


def frame_basic_stats(arr, region="circle", radius=5, xy=None, inner_radius=0,
                      size=5, plot=False, full_output=False):
    """Mean/median/std(/min/max) in a region of a frame
    (utils_stats.py:50-123)."""
    arr = np.asarray(arr)
    vals = _region_values(arr, region, radius, xy, inner_radius, size)
    maxi = np.max(vals)
    mean = np.mean(vals)
    median = np.median(vals)
    std = np.std(vals)
    if full_output:
        return np.min(vals), np.percentile(vals, 25), mean, median, \
            np.percentile(vals, 75), maxi, std
    return mean, median, std, maxi


def cube_basic_stats(arr, region="circle", radius=5, xy=None, inner_radius=0,
                     size=5, plot=False, full_output=False):
    """Per-frame region statistics for a cube (utils_stats.py:124-231)."""
    arr = np.asarray(arr)
    n = arr.shape[0]
    if full_output:
        out = np.array([frame_basic_stats(arr[i], region, radius, xy,
                                          inner_radius, size,
                                          full_output=True)
                        for i in range(n)])
    else:
        out = np.array([frame_basic_stats(arr[i], region, radius, xy,
                                          inner_radius, size)
                        for i in range(n)])
    return tuple(out.T)
