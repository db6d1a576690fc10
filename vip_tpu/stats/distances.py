"""Distances / similarity between frames (reference
vip_hci/stats/distances.py)."""

import numpy as np
from scipy.optimize import curve_fit
from scipy.stats import pearsonr, spearmanr

from ..var.shapes import get_annulus_segments, get_circle

__all__ = ["cube_distance", "spectral_correlation"]

_GAUSSIAN_FWHM_TO_SIGMA = 1.0 / (2.0 * np.sqrt(2.0 * np.log(2.0)))


def _ssim(a, b, win_size=7, data_range=None, sigma=1.5):
    """Mean SSIM (Wang et al. 2004) with gaussian weights and sample
    covariance — skimage structural_similarity equivalent."""
    from scipy.ndimage import gaussian_filter

    a = np.asarray(a, float)
    b = np.asarray(b, float)
    truncate = 3.5

    def filt(x):
        return gaussian_filter(x, sigma, truncate=truncate)

    NP = win_size ** a.ndim
    cov_norm = NP / (NP - 1)
    ux, uy = filt(a), filt(b)
    uxx, uyy, uxy = filt(a * a), filt(b * b), filt(a * b)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux**2 + uy**2 + C1) * (vx + vy + C2))
    pad = (win_size - 1) // 2
    return S[pad:-pad, pad:-pad].mean()


def cube_distance(array, frame, mode="full", dist="sad", inradius=None,
                  width=None, mask=None, plot=True):
    """Distance (or similarity) of every frame to a reference frame
    (reference distances.py:38-147)."""
    lista = []
    n = array.shape[0]
    if isinstance(frame, int):
        frame_ref = array[frame]
    elif isinstance(frame, np.ndarray):
        frame_ref = frame
    elif frame is None:
        frame_ref = np.median(array, axis=0)
    else:
        raise TypeError("Input ref frame format not recognized")

    if mode == "full":
        pass
    elif mode == "annulus":
        if inradius is None:
            raise ValueError("`Inradius` has not been set")
        if width is None:
            raise ValueError("`Width` has not been set")
        frame_ref = get_annulus_segments(frame_ref, inradius, width,
                                         mode="val")[0]
    elif mode == "mask":
        if mask is None:
            raise ValueError("mask has not been set")
        frame_ref = frame_ref[np.where(mask)]
    else:
        raise TypeError("Mode not recognized or missing parameters")

    for i in range(n):
        if mode == "full":
            framei = array[i]
        elif mode == "annulus":
            framei = get_annulus_segments(array[i], inradius, width,
                                          mode="val")[0]
        elif mode == "mask":
            framei = array[i][np.where(mask)]
        if dist == "sad":
            lista.append(np.sum(abs(frame_ref - framei)))
        elif dist == "euclidean":
            lista.append(np.sqrt(np.sum((frame_ref - framei)**2)))
        elif dist == "mse":
            lista.append((np.sum((frame_ref - framei)**2))
                         / len(frame_ref))
        elif dist == "pearson":
            pears, _ = pearsonr(frame_ref.ravel(), framei.ravel())
            lista.append(pears)
        elif dist == "spearman":
            spear, _ = spearmanr(frame_ref.ravel(), framei.ravel())
            lista.append(spear)
        elif dist == "ssim":
            lista.append(_ssim(frame_ref, framei, win_size=7,
                               data_range=frame_ref.max()
                               - frame_ref.min()))
        else:
            raise ValueError("Distance not recognized")
    lista = np.array(lista)
    if plot:
        import matplotlib.pyplot as plt

        ylabels = {"sad": "SAD - Manhattan distance",
                   "euclidean": "Euclidean distance",
                   "pearson": "Pearson correlation coefficient",
                   "spearman": "Spearman rank correlation coefficient",
                   "mse": "Mean squared error",
                   "ssim": "Structural Similarity Index"}
        _, ax = plt.subplots(figsize=(8, 4))
        if isinstance(frame, int):
            ax.vlines(frame, ymin=np.nanmin(lista), ymax=np.nanmax(lista),
                      colors="green", linestyles="dashed", lw=2, alpha=0.8,
                      label=f"Frame {frame}")
        ax.hlines(np.median(lista), xmin=-1, xmax=n + 1, colors="purple",
                  alpha=0.3, linestyles="dashed",
                  label=f"Median value : {np.median(lista):.3f}")
        ax.hlines(np.mean(lista), xmin=-1, xmax=n + 1, colors="green",
                  alpha=0.3, linestyles="dashed",
                  label=f"Mean value : {np.mean(lista):.3f}")
        ax.plot(np.arange(n), lista, "-", alpha=0.6)
        ax.plot(np.arange(n), lista, "o", alpha=0.4)
        ax.set_xlabel("Frame number")
        ax.set_ylabel(ylabels.get(dist, dist))
        ax.set_xlim(-1, n + 1)
        ax.minorticks_on()
        ax.legend(fancybox=True, framealpha=0.5, fontsize=12, loc="best")
        ax.grid(which="major", alpha=0.2)
    return lista


def spectral_correlation(array, ann_width=2, r_in=1, r_out=None, pl_xy=None,
                         mask_r=4, fwhm=4, sp_fwhm_guess=3,
                         full_output=False):
    """Spectral correlation between IFS channels, Eq. 7 of [GRE16]
    (reference distances.py:187-310)."""
    if not isinstance(ann_width, int) or not isinstance(r_in, int):
        raise TypeError("Inputs should be integers")
    if array.ndim != 3:
        raise TypeError("Input array should be 3D.")

    n_ch, n_y, n_x = array.shape
    n_r = min((n_y - 1) / 2., (n_x - 1) / 2.)
    if n_r % 1:
        raise TypeError("Input array y and x dimensions should be odd")
    if r_out is None:
        r_out = n_r

    test_rads = np.arange(r_in - 1, r_out - 1)
    n_rad = int(np.floor(test_rads.shape[0] / ann_width))

    sp_corr = np.zeros([int(n_r), n_ch, n_ch])
    if full_output:
        sp_fwhm = np.zeros([int(n_r), n_ch])

        def gauss_1fp(x, *p):
            sig = p[0] * _GAUSSIAN_FWHM_TO_SIGMA
            return np.exp(-x**2 / (2. * sig**2))

    mask_final = np.zeros_like(array[0])
    if pl_xy is not None:
        mask = np.ones_like(array[0])
        for i in range(len(pl_xy)):
            if not isinstance(pl_xy[i], tuple):
                raise TypeError("Format of companions coordinates "
                                "incorrect")
            mask_i = get_circle(mask, radius=mask_r * fwhm,
                                cy=pl_xy[i][1], cx=pl_xy[i][0], mode="mask")
            mask_final[np.where(mask_i)] = 1

    for ann in range(n_rad):
        inner_radius = r_in + (ann * ann_width)
        indices = get_annulus_segments(array[0], inner_radius, ann_width)
        yy = indices[0][0]
        xx = indices[0][1]
        keep = ~mask_final[yy, xx].astype(bool)
        yy_final = yy[keep]
        xx_final = xx[keep]
        matrix = array[:, yy_final, xx_final]
        # all-channel-pairs correlation in one batched product
        m2 = np.nanmean(matrix[:, None, :] * matrix[None, :, :], axis=-1)
        diag = np.sqrt(np.diag(m2))
        corr = m2 / np.outer(diag, diag)
        sp_corr[r_in + ann * ann_width:r_in + (ann + 1) * ann_width] = corr
        if full_output:
            for zi in range(n_ch):
                x = np.arange(n_ch) - zi
                y = sp_corr[r_in + ann * ann_width, zi]
                y = y - np.amin(y)
                y = y / np.amax(y)
                coeff, _ = curve_fit(gauss_1fp, x, y, p0=(sp_fwhm_guess,))
                sp_fwhm[r_in + ann * ann_width:
                        r_in + (ann + 1) * ann_width, zi] = coeff[0]
    if full_output:
        return sp_corr, sp_fwhm
    return sp_corr
