"""Bad-frame detection in cubes (reference vip_hci/preproc/badframes.py)."""

import numpy as np

from ..config import time_ini, timing
from ..config.utils_conf import check_array
from ..stats.distances import cube_distance
from ..stats.utils_stats import cube_basic_stats
from ..var.shapes import get_annulus_segments
from .cosmetics import cube_crop_frames, frame_crop

__all__ = ["cube_detect_badfr_pxstats", "cube_detect_badfr_ellipticity",
           "cube_detect_badfr_correlation"]


def _rolling_mean_centered(values, window):
    """Centered rolling mean with back/forward fill (pandas
    Series.rolling(center=True).mean() + bfill + ffill equivalent)."""
    import pandas as pd

    s = pd.Series(values).rolling(window, center=True).mean()
    s = s.bfill().ffill()
    return s.to_numpy()


def cube_detect_badfr_pxstats(array, mode="annulus", in_radius=10, width=10,
                              top_sigma=1.0, low_sigma=1.0, window=None,
                              method="mean", plot=True, verbose=True):
    """Bad frames from pixel statistics in an annulus or circle
    (reference badframes.py:23-139). Returns (good_idx, bad_idx)."""
    check_array(array, 3, msg="array")

    if mode == "annulus":
        if in_radius + width > array[0].shape[0] / 2:
            raise ValueError("Inner radius and annulus size are too big")
    elif mode == "circle":
        if in_radius > array[0].shape[0] / 2:
            raise ValueError("Radius size is too big (out of boundaries)")

    if verbose:
        start_time = time_ini()
    n = array.shape[0]

    res = cube_basic_stats(array, mode, radius=in_radius,
                           inner_radius=in_radius, size=width,
                           full_output=True)
    mean_values = res[0] if method == "mean" else res[2]

    if window is None:
        window = n // 3
    mean_smooth = _rolling_mean_centered(mean_values, window)
    sigma = np.std(mean_values)
    top_boundary = mean_smooth + top_sigma * sigma
    bot_boundary = mean_smooth - low_sigma * sigma
    bad_index_list = []
    good_index_list = []
    for i in range(n):
        if mode == "annulus":
            i_mean_value = get_annulus_segments(
                array[i], width=width, inner_radius=in_radius,
                mode="val")[0].mean()
        else:
            i_mean_value = mean_values[i]
        if i_mean_value > top_boundary[i] or i_mean_value < bot_boundary[i]:
            bad_index_list.append(i)
        else:
            good_index_list.append(i)

    if plot:
        import matplotlib.pyplot as plt

        plt.figure(figsize=(8, 4))
        plt.plot(mean_values, "o", alpha=0.6)
        plt.plot(mean_smooth, label="smoothed mean fluctuation", lw=2,
                 ls="-", alpha=0.5)
        plt.plot(top_boundary, label="upper threshold", lw=1.4, ls="-",
                 color="#9467bd", alpha=0.8)
        plt.plot(bot_boundary, label="lower threshold", lw=1.4, ls="-",
                 color="#9467bd", alpha=0.8)
        plt.legend(fancybox=True, framealpha=0.5, loc="best")
        plt.grid("on", alpha=0.2)
        plt.ylabel("Mean value in " + mode)
        plt.xlabel("Frame number")

    if verbose:
        bad = len(bad_index_list)
        print("Done detecting bad frames from cube: {} out of {} "
              "({:.3}%)".format(bad, n, (bad * 100) / n))
        timing(start_time)
    return np.array(good_index_list), np.array(bad_index_list)


def cube_detect_badfr_ellipticity(array, fwhm, crop_size=30, roundlo=-0.2,
                                  roundhi=0.2, plot=True, verbose=True):
    """Bad frames from the roundness of the central PSF, DAOFIND-style
    (reference badframes.py:142-248). Returns (good_idx, bad_idx).

    The DAOStarFinder roundness statistics are computed directly on the
    brightest source: roundness1 from the 4-fold symmetry of the marginal
    kernel fits, roundness2 from the gaussian-fit x/y height difference.
    """
    check_array(array, 3, msg="array")
    if verbose:
        start_time = time_ini()

    array = cube_crop_frames(array, crop_size, verbose=False)
    n = array.shape[0]
    goodfr, badfr = [], []
    roundness1, roundness2 = np.empty(n), np.empty(n)
    for i in range(n):
        roun1, roun2 = _daofind_roundness(array[i], fwhm)
        roundness1[i], roundness2[i] = roun1, roun2
        if roundhi > roun1 > roundlo and roundhi > roun2 > roundlo:
            goodfr.append(i)
        else:
            badfr.append(i)

    if plot:
        import matplotlib.pyplot as plt

        _, ax = plt.subplots(figsize=(8, 4))
        x = np.arange(n)
        marker = "," if n > 5000 else "o"
        for vec, col, lab in ((roundness1, "#1f77b4", "roundness1"),
                              (roundness2, "#9467bd", "roundness2")):
            ax.plot(x, vec, "-", alpha=0.6, color=col, label=lab)
            ax.plot(x, vec, marker=marker, ls="", alpha=0.4, color=col)
        ax.hlines(roundlo, xmin=-1, xmax=n + 1, lw=2, colors="#ff7f0e",
                  linestyles="dashed", label="roundlo", alpha=0.6)
        ax.hlines(roundhi, xmin=-1, xmax=n + 1, lw=2, colors="#ff7f0e",
                  linestyles="dashdot", label="roundhi", alpha=0.6)
        ax.set_xlabel("Frame number")
        ax.set_ylabel("Roundness")
        ax.set_xlim(-1, n + 1)
        ax.legend(fancybox=True, framealpha=0.5, loc="best")
        ax.grid("on", alpha=0.2)

    good_index_list = np.array(goodfr)
    bad_index_list = np.array(badfr)
    if verbose:
        bad = len(bad_index_list)
        print("Done detecting bad frames from cube: {} out of {} "
              "({:.3}%)".format(bad, n, (bad * 100) / n))
        timing(start_time)
    return good_index_list, bad_index_list


def _daofind_roundness(frame, fwhm):
    """Roundness statistics of the brightest star, following the DAOFIND
    definitions used by photutils DAOStarFinder ([STE87]):
    GROUND (roundness1) = 2(hx-hy)/(hx+hy) from 1-d gaussian column/row
    kernel sums; SROUND (roundness2) = 4-fold symmetry of the convolved
    peak."""
    from scipy.ndimage import convolve as sconv

    frame = np.asarray(frame, dtype=float)
    sigma = fwhm * 0.42466
    ksize = max(3, int(2 * np.ceil(1.5 * sigma)) + 1)
    half = ksize // 2
    yk, xk = np.mgrid[-half:half + 1, -half:half + 1]
    # lowered gaussian kernel (zero mean within the truncated support)
    g = np.exp(-(xk**2 + yk**2) / (2 * sigma**2))
    mask = (xk**2 + yk**2) <= (1.5 * fwhm)**2
    g = g * mask
    kern = (g - g[mask].mean() * mask) / np.sum((g[mask]
                                                 - g[mask].mean())**2)
    conv = sconv(frame, kern, mode="constant")

    # brightest peak
    py, px = np.unravel_index(np.argmax(conv), conv.shape)
    py = int(np.clip(py, half, frame.shape[0] - half - 1))
    px = int(np.clip(px, half, frame.shape[1] - half - 1))
    cut = frame[py - half:py + half + 1, px - half:px + half + 1]

    # roundness1 (GROUND): marginal gaussian heights along x and y
    gx = np.exp(-(np.arange(-half, half + 1))**2 / (2 * sigma**2))
    margx = cut.sum(axis=0)
    margy = cut.sum(axis=1)

    def _height(marg):
        w = gx - gx.mean()
        denom = np.sum(w * gx)
        return np.sum(w * marg) / denom if denom != 0 else 0.0

    hx = _height(margx)
    hy = _height(margy)
    roundness1 = 2 * (hx - hy) / (hx + hy) if (hx + hy) != 0 else np.inf

    # roundness2 (SROUND): 4-fold symmetry of the convolved peak
    c = conv[py - half:py + half + 1, px - half:px + half + 1]
    sum2 = c[half, half + 1:].sum() + c[half, :half].sum()
    sum4 = c[half + 1:, half].sum() + c[:half, half].sum()
    denom = sum2 + sum4
    roundness2 = 2.0 * (sum2 - sum4) / denom if denom != 0 else np.inf
    return roundness1, roundness2


def cube_detect_badfr_correlation(array, frame_ref, crop_size=30,
                                  dist="pearson", percentile=20,
                                  threshold=None, mode="full", inradius=None,
                                  width=None, plot=True, verbose=True,
                                  full_output=False):
    """Bad frames from frame-to-reference distance thresholding
    (reference badframes.py:251-382). Returns (good_idx, bad_idx
    [, distances])."""
    check_array(array, 3, msg="array")
    if verbose:
        start_time = time_ini()
    n = array.shape[0]

    subarray = cube_crop_frames(array, crop_size, verbose=False)
    if isinstance(frame_ref, np.ndarray):
        frame_ref = frame_crop(frame_ref, crop_size, verbose=False)
    distances = cube_distance(subarray, frame_ref, mode, dist,
                              inradius=inradius, width=width, plot=False)

    if dist in ("pearson", "spearman", "ssim"):
        minval = np.min(distances[~np.isnan(distances)])
        distances = np.nan_to_num(distances)
        distances[np.where(distances == 0)] = minval
        if threshold is None:
            threshold = np.percentile(distances, percentile)
        indbad = np.where(distances <= threshold)
        indgood = np.where(distances > threshold)
    else:
        if threshold is None:
            threshold = np.percentile(distances, 100 - percentile)
        indbad = np.where(distances >= threshold)
        indgood = np.where(distances < threshold)

    bad_index_list = indbad[0]
    good_index_list = indgood[0]

    if plot:
        import matplotlib.pyplot as plt

        ylabels = {"sad": "SAD - Manhattan distance",
                   "euclidean": "Euclidean distance",
                   "pearson": "Pearson correlation coefficient",
                   "spearman": "Spearman correlation coefficient",
                   "mse": "Mean squared error",
                   "ssim": "Structural Similarity Index"}
        _, ax = plt.subplots(figsize=(8, 4))
        x = np.arange(n)
        marker = "," if n > 5000 else "o"
        ax.plot(x, distances, "-", alpha=0.6, color="#1f77b4")
        ax.plot(x, distances, marker=marker, ls="", alpha=0.4,
                color="#1f77b4")
        if isinstance(frame_ref, int):
            ax.vlines(frame_ref, ymin=np.nanmin(distances),
                      ymax=np.nanmax(distances), colors="green",
                      linestyles="dashed", lw=2, alpha=0.6,
                      label=f"Reference frame {frame_ref}")
        ax.hlines(threshold, xmin=-1, xmax=n + 1, lw=2, colors="#ff7f0e",
                  linestyles="dashed", label="Threshold", alpha=0.6)
        ax.set_xlabel("Frame number")
        ax.set_ylabel(ylabels.get(dist, dist))
        ax.set_xlim(-1, n + 1)
        ax.legend(fancybox=True, framealpha=0.5, loc="best")
        ax.grid("on", alpha=0.2)

    if verbose:
        bad = len(bad_index_list)
        print("Done detecting bad frames from cube: {} out of {} "
              "({:.3}%)".format(bad, n, (bad * 100) / n))
        timing(start_time)
    if full_output:
        return good_index_list, bad_index_list, distances
    return good_index_list, bad_index_list
