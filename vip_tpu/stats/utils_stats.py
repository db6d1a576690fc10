"""Descriptive statistics in frame regions
(reference vip_hci/stats/utils_stats.py)."""

import numpy as np

from ..var.coords import frame_center
from ..var.shapes import get_annulus_segments, get_circle

__all__ = ["descriptive_stats", "frame_basic_stats", "cube_basic_stats"]


def descriptive_stats(array, verbose=True, label="", mean=False,
                      plot=False):
    """Min/25%/median(/mean)/75%/max summary of an array
    (reference utils_stats.py:20-49)."""
    if mean:
        mean_ = np.mean(array)
    median = np.median(array)
    mini = np.min(array)
    maxi = np.max(array)
    first_qu = np.percentile(array, 25)
    third_qu = np.percentile(array, 75)
    if verbose:
        if mean:
            label += "min={:.1f} / 1st QU={:.1f} / ave={:.1f} / med={:.1f}"
            label += " / 3rd QU={:.1f} / max={:.1f}"
            print(label.format(mini, first_qu, mean_, median, third_qu,
                               maxi))
        else:
            label += "min={:.1f} / 1st QU={:.1f} / med={:.1f} / 3rd "
            label += "QU={:.1f} / max={:.1f}"
            print(label.format(mini, first_qu, median, third_qu, maxi))
    if plot:
        import matplotlib.pyplot as plt
        plt.boxplot(np.asarray(array).ravel(), vert=False, meanline=mean,
                    showfliers=True, sym=".")
        plt.grid("on", alpha=0.2)
    if mean:
        return mini, first_qu, mean_, median, third_qu, maxi
    return mini, first_qu, median, third_qu, maxi


def _region_values(frame, region, radius, xy, inner_radius, size):
    if region == "circle":
        if xy is not None:
            x, y = xy
        else:
            x, y = None, None
        return get_circle(frame, radius, cy=y, cx=x, mode="val")
    elif region == "annulus":
        return get_annulus_segments(frame, inner_radius, size,
                                    mode="val")[0]
    raise ValueError("Region not recognized")


def _plot_region_histogram(frame, vals, region, radius, xy, inner_radius,
                           size):
    """Frame-with-region-overlay + histogram figure shared by
    frame/cube_basic_stats (reference utils_stats.py:96-116,182-203)."""
    import matplotlib.pyplot as plt

    if region == "circle":
        x, y = xy if xy is not None else (None, None)
        overlay = get_circle(frame, radius, cy=y, cx=x)
    else:
        overlay = get_annulus_segments(frame, inner_radius, size,
                                       mode="mask")[0].astype(float)
    overlay = np.where(overlay == 0, np.nan, overlay)
    plt.figure("Image crop (first slice)", figsize=(10, 4))
    ax1 = plt.subplot(1, 2, 1)
    ax1.imshow(frame, origin="lower", interpolation="nearest", cmap="gray")
    ax1.imshow(overlay, origin="lower", interpolation="nearest",
               cmap="viridis")
    ax1.set_title("Frame region")
    ax2 = plt.subplot(1, 2, 2)
    ax2.hist(np.asarray(vals).ravel(),
             bins=max(1, int(np.sqrt(np.size(vals)))),
             alpha=0.5, histtype="stepfilled")
    ax2.set_title("Histogram")
    ax2.tick_params(axis="x", labelsize=8)
    plt.show()


def frame_basic_stats(arr, region="circle", radius=5, xy=None,
                      inner_radius=0, size=5, plot=True,
                      full_output=False):
    """Mean (+ std/median/max with full_output) in a circle or annulus
    (reference utils_stats.py:50-123)."""
    arr = np.asarray(arr)
    vals = _region_values(arr, region, radius, xy, inner_radius, size)
    maxi = vals.max()
    mean = vals.mean()
    std_dev = vals.std()
    median = np.median(vals)
    if plot:
        _plot_region_histogram(arr, vals, region, radius, xy, inner_radius,
                               size)
    if full_output:
        return mean, std_dev, median, maxi
    return mean


def cube_basic_stats(arr, region="circle", radius=5, xy=None,
                     inner_radius=0, size=5, plot=False, full_output=False):
    """Per-frame region statistics of a cube
    (reference utils_stats.py:124-231); returns (mean, std, median, max)
    arrays with full_output, else the mean array."""
    arr = np.asarray(arr)
    n = arr.shape[0]
    mean = np.empty(n)
    std_dev = np.empty(n)
    median = np.empty(n)
    maxi = np.empty(n)
    for i in range(n):
        vals = _region_values(arr[i], region, radius, xy, inner_radius,
                              size)
        maxi[i] = vals.max()
        mean[i] = vals.mean()
        std_dev[i] = vals.std()
        median[i] = np.median(vals)
    if plot:
        import matplotlib.pyplot as plt

        vals0 = _region_values(arr[0], region, radius, xy, inner_radius,
                               size)
        _plot_region_histogram(arr[0], vals0, region, radius, xy,
                               inner_radius, size)
        fig = plt.figure("Stats in annulus", figsize=(10, 6))
        fig.subplots_adjust(hspace=0.15)
        series = [(mean, f"Mean value in {region}"),
                  (std_dev, f"Px std dev in {region}"),
                  (maxi, f"Max value in {region}")]
        ax0 = None
        for k, (vec, lab) in enumerate(series):
            ax = plt.subplot(3, 1, k + 1, sharex=ax0)
            ax0 = ax0 or ax
            ax.plot(vec, ".-", label=lab, lw=0.8, alpha=0.6)
            ax.legend(loc=1, fancybox=True).get_frame().set_alpha(0.5)
            ax.grid(True, alpha=0.2)
            if k < 2:
                plt.setp(ax.get_xticklabels(), visible=False)
        ax.set_xlabel("Frame number")
        plt.show()
    if full_output:
        return mean, std_dev, median, maxi
    return mean
