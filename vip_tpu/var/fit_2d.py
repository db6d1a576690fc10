"""2-d model PSF creation and fitting (Gaussian / Moffat / Airy).

TPU rebuild of vip_hci/var/fit_2d.py. Model evaluation matches the astropy
functional models the reference uses; fitting uses Levenberg-Marquardt via
``scipy.optimize.least_squares`` with the same initializations
(center-of-mass centroid, peak-to-peak amplitude; fit_2d.py:135-306).
"""

import numpy as np
from scipy.optimize import least_squares
from scipy.special import j1

from ..config.utils_conf import check_array
from .coords import frame_center
from .shapes import get_square

GAUSSIAN_FWHM_TO_SIGMA = 1.0 / (2.0 * np.sqrt(2.0 * np.log(2.0)))
GAUSSIAN_SIGMA_TO_FWHM = 2.0 * np.sqrt(2.0 * np.log(2.0))

__all__ = ["create_synth_psf", "fit_2dgaussian", "fit_2dmoffat",
           "fit_2dairydisk", "fit_2d2gaussian", "gaussian_2d", "moffat_2d",
           "airydisk_2d"]


# ---------------------------------------------------------------------------
# model functions (astropy.modeling.functional_models equivalents)
# ---------------------------------------------------------------------------
def gaussian_2d(x, y, amplitude, x_mean, y_mean, x_stddev, y_stddev, theta):
    """astropy Gaussian2D: theta in radians, CCW from +x axis."""
    cost2 = np.cos(theta) ** 2
    sint2 = np.sin(theta) ** 2
    sin2t = np.sin(2 * theta)
    xstd2 = x_stddev**2
    ystd2 = y_stddev**2
    a = 0.5 * (cost2 / xstd2 + sint2 / ystd2)
    b = 0.5 * (sin2t / xstd2 - sin2t / ystd2)
    c = 0.5 * (sint2 / xstd2 + cost2 / ystd2)
    xd = x - x_mean
    yd = y - y_mean
    return amplitude * np.exp(-(a * xd**2 + b * xd * yd + c * yd**2))


def moffat_2d(x, y, amplitude, x_0, y_0, gamma, alpha):
    """astropy Moffat2D."""
    rr_gg = ((x - x_0) ** 2 + (y - y_0) ** 2) / gamma**2
    return amplitude * (1 + rr_gg) ** (-alpha)


def airydisk_2d(x, y, amplitude, x_0, y_0, radius):
    """astropy AiryDisk2D: first zero at ``radius``."""
    RZ = 1.2196698912665045  # first zero of j1(pi x)/x over pi
    r = np.hypot(x - x_0, y - y_0) / (radius / RZ)
    out = np.ones_like(r)
    mask = r > 0
    rt = np.pi * r[mask]
    out[mask] = (2.0 * j1(rt) / rt) ** 2
    return amplitude * out


def create_synth_psf(model="gauss", shape=(9, 9), amplitude=1, x_mean=None,
                     y_mean=None, fwhm=4, theta=0, gamma=None, alpha=1.5,
                     radius=None, msdi=False):
    """Synthetic 2d/3d PSF (reference fit_2d.py:27-134)."""
    if not msdi:
        sizex, sizey = shape
        if x_mean is None or y_mean is None:
            y_mean, x_mean = frame_center(np.zeros((sizey, sizex)))
        x, y = np.meshgrid(np.arange(sizex), np.arange(sizey))

        if model == "gauss":
            if np.isscalar(fwhm):
                fwhm_x = fwhm_y = fwhm
            else:
                fwhm_x, fwhm_y = fwhm
            return gaussian_2d(x, y, amplitude, x_mean, y_mean,
                               fwhm_x * GAUSSIAN_FWHM_TO_SIGMA,
                               fwhm_y * GAUSSIAN_FWHM_TO_SIGMA,
                               np.deg2rad(theta))
        elif model == "moff":
            if gamma is None and fwhm is not None:
                gamma = fwhm / (2.0 * np.sqrt(2 ** (1 / alpha) - 1))
            return moffat_2d(x, y, amplitude, x_mean, y_mean, gamma, alpha)
        elif model == "airy":
            if radius is None and fwhm is not None:
                diam_1st_zero = (fwhm * 2.44) / 1.028
                radius = diam_1st_zero / 2.0
            return airydisk_2d(x, y, amplitude, x_mean, y_mean, radius)
        raise ValueError("`model` not recognized")
    else:
        if np.isscalar(fwhm):
            raise ValueError("`Fwhm` must be a 1d vector")
        return np.array([
            create_synth_psf(model, shape, amplitude, x_mean, y_mean, fwhm_i,
                             theta, gamma, alpha, radius)
            for fwhm_i in fwhm
        ])


# ---------------------------------------------------------------------------
# fitting helpers
# ---------------------------------------------------------------------------
def _centroid_com(data):
    d = np.asarray(data, dtype=float)
    total = d.sum()
    yy, xx = np.mgrid[: d.shape[0], : d.shape[1]]
    return (d * xx).sum() / total, (d * yy).sum() / total


def _threshold_noise(subim, sigfactor):
    from numpy.random import randn

    d = subim.ravel()
    d = d[np.isfinite(d)]
    med = np.median(d)
    std = np.std(d - med)
    # iterative 2-sigma clip (sigma_clipped_stats equivalent)
    for _ in range(5):
        keep = np.abs(d - np.median(d)) <= 2 * np.std(d, ddof=0)
        if keep.all():
            break
        d = d[keep]
    clipmed, clipstd = np.median(d), np.std(d)
    indi = np.where(subim <= clipmed + sigfactor * clipstd)
    noise = randn(*subim.shape) * clipstd
    out = subim.copy()
    out[indi] = noise[indi]
    return out


def _lm_fit(residual_fn, p0, bounds=None):
    try:
        res = least_squares(residual_fn, p0, method="lm", max_nfev=5000)
    except Exception:
        res = least_squares(residual_fn, p0, max_nfev=5000)
    # parameter covariance from the final jacobian
    try:
        _, s, VT = np.linalg.svd(res.jac, full_matrices=False)
        thr = np.finfo(float).eps * max(res.jac.shape) * s[0]
        s = s[s > thr]
        VT = VT[: s.size]
        dof = max(res.fun.size - res.x.size, 1)
        cov = np.dot(VT.T / s**2, VT) * 2 * res.cost / dof
        perr = np.sqrt(np.diag(cov))
    except Exception:
        perr = np.full_like(res.x, np.nan)
    return res.x, perr, res


def _prepare_subimage(array, crop, cent, cropsize, bpm):
    array = np.asarray(array, dtype=float)
    if bpm is None:
        bpm = np.zeros_like(array).astype(bool)
    if crop:
        if cent is None:
            ceny, cenx = frame_center(array)
        else:
            cenx, ceny = cent
        imside = array.shape[0]
        psf_subimage, suby, subx = get_square(array, min(cropsize, imside),
                                              ceny, cenx, position=True,
                                              verbose=False)
        bpm_subimage, _, _ = get_square(bpm, min(cropsize, imside), ceny,
                                        cenx, position=True, verbose=False)
    else:
        psf_subimage = array.copy()
        bpm_subimage = bpm.copy()
        suby = subx = 0
    return psf_subimage, bpm_subimage, suby, subx


def fit_2dgaussian(array, crop=False, cent=None, cropsize=15, fwhmx=4,
                   fwhmy=4, theta=0, threshold=False, sigfactor=6, bpm=None,
                   full_output=True, debug=True):
    """Fit a 2D Gaussian (reference fit_2d.py:135-306)."""
    check_array(array, dim=2, msg="array")
    psf_subimage, bpm_subimage, suby, subx = _prepare_subimage(
        array, crop, cent, cropsize, bpm)
    if threshold:
        psf_subimage = _threshold_noise(psf_subimage, sigfactor)

    good = ~bpm_subimage
    init_amplitude = np.ptp(psf_subimage[good])
    xcom, ycom = _centroid_com(psf_subimage)
    y, x = np.indices(psf_subimage.shape)
    xg, yg, data = x[good], y[good], psf_subimage[good]

    p0 = np.array([init_amplitude, xcom, ycom,
                   fwhmx * GAUSSIAN_FWHM_TO_SIGMA,
                   fwhmy * GAUSSIAN_FWHM_TO_SIGMA, theta])

    def resid(p):
        return gaussian_2d(xg, yg, *p) - data

    p, perr, res = _lm_fit(resid, p0)
    amplitude, mean_x, mean_y, xstd, ystd, th = p
    mean_y_tot = mean_y + suby
    mean_x_tot = mean_x + subx
    fwhm_y = abs(ystd) * GAUSSIAN_SIGMA_TO_FWHM
    fwhm_x = abs(xstd) * GAUSSIAN_SIGMA_TO_FWHM
    theta_deg = np.rad2deg(th)

    amplitude_e, mean_x_e, mean_y_e, fwhm_x_e, fwhm_y_e, theta_e = perr
    fwhm_x_e /= GAUSSIAN_FWHM_TO_SIGMA
    fwhm_y_e /= GAUSSIAN_FWHM_TO_SIGMA

    if debug:
        print("FWHM_y =", fwhm_y)
        print("FWHM_x =", fwhm_x)
        print("centroid y =", mean_y_tot)
        print("centroid x =", mean_x_tot)
        print("amplitude =", amplitude)
        print("theta =", theta_deg)

    if full_output:
        import pandas as pd

        return pd.DataFrame(
            {"centroid_y": mean_y_tot, "centroid_x": mean_x_tot,
             "fwhm_y": fwhm_y, "fwhm_x": fwhm_x, "amplitude": amplitude,
             "theta": theta_deg, "centroid_y_err": mean_y_e,
             "centroid_x_err": mean_x_e, "fwhm_y_err": fwhm_y_e,
             "fwhm_x_err": fwhm_x_e, "amplitude_err": amplitude_e,
             "theta_err": theta_e}, index=[0], dtype=np.float64)
    return mean_y_tot, mean_x_tot


def fit_2dmoffat(array, crop=False, cent=None, cropsize=15, fwhm=4,
                 threshold=False, sigfactor=6, bpm=None, full_output=True,
                 debug=True):
    """Fit a 2D Moffat (reference fit_2d.py:306-454)."""
    check_array(array, dim=2, msg="array")
    psf_subimage, bpm_subimage, suby, subx = _prepare_subimage(
        array, crop, cent, cropsize, bpm)
    if threshold:
        psf_subimage = _threshold_noise(psf_subimage, sigfactor)

    good = ~bpm_subimage
    init_amplitude = np.ptp(psf_subimage[good])
    xcom, ycom = _centroid_com(psf_subimage)
    y, x = np.indices(psf_subimage.shape)
    xg, yg, data = x[good], y[good], psf_subimage[good]

    alpha0 = 1.5
    gamma0 = fwhm / (2.0 * np.sqrt(2 ** (1 / alpha0) - 1))
    p0 = np.array([init_amplitude, xcom, ycom, gamma0, alpha0])

    def resid(p):
        return moffat_2d(xg, yg, *p) - data

    p, perr, res = _lm_fit(resid, p0)
    amplitude, mean_x, mean_y, gamma, alpha = p
    mean_y_tot = mean_y + suby
    mean_x_tot = mean_x + subx
    fwhm_fit = np.abs(2 * gamma * np.sqrt(2 ** (1 / alpha) - 1))

    if debug:
        print("FWHM =", fwhm_fit)
        print("centroid y =", mean_y_tot)
        print("centroid x =", mean_x_tot)

    if full_output:
        import pandas as pd

        return pd.DataFrame(
            {"centroid_y": mean_y_tot, "centroid_x": mean_x_tot,
             "fwhm": fwhm_fit, "alpha": alpha, "gamma": gamma,
             "amplitude": amplitude,
             "centroid_y_err": perr[2], "centroid_x_err": perr[1],
             "gamma_err": perr[3], "alpha_err": perr[4],
             "amplitude_err": perr[0]}, index=[0], dtype=np.float64)
    return mean_y_tot, mean_x_tot


def fit_2dairydisk(array, crop=False, cent=None, cropsize=15, fwhm=4,
                   threshold=False, sigfactor=6, bpm=None, full_output=True,
                   debug=True):
    """Fit a 2D Airy disk (reference fit_2d.py:454-600)."""
    check_array(array, dim=2, msg="array")
    psf_subimage, bpm_subimage, suby, subx = _prepare_subimage(
        array, crop, cent, cropsize, bpm)
    if threshold:
        psf_subimage = _threshold_noise(psf_subimage, sigfactor)

    good = ~bpm_subimage
    init_amplitude = np.ptp(psf_subimage[good])
    xcom, ycom = _centroid_com(psf_subimage)
    y, x = np.indices(psf_subimage.shape)
    xg, yg, data = x[good], y[good], psf_subimage[good]

    diam_1st_zero = (fwhm * 2.44) / 1.028
    p0 = np.array([init_amplitude, xcom, ycom, diam_1st_zero / 2.0])

    def resid(p):
        return airydisk_2d(xg, yg, *p) - data

    p, perr, res = _lm_fit(resid, p0)
    amplitude, mean_x, mean_y, radius = p
    mean_y_tot = mean_y + suby
    mean_x_tot = mean_x + subx
    fwhm_fit = radius * 1.028 / 1.22

    if debug:
        print("FWHM =", fwhm_fit)
        print("centroid y =", mean_y_tot)
        print("centroid x =", mean_x_tot)

    if full_output:
        import pandas as pd

        return pd.DataFrame(
            {"centroid_y": mean_y_tot, "centroid_x": mean_x_tot,
             "fwhm": fwhm_fit, "radius": radius, "amplitude": amplitude,
             "centroid_y_err": perr[2], "centroid_x_err": perr[1],
             "radius_err": perr[3], "amplitude_err": perr[0]},
            index=[0], dtype=np.float64)
    return mean_y_tot, mean_x_tot


def fit_2d2gaussian(array, crop=False, cent=None, cropsize=15, fwhm_neg=4,
                    fwhm_pos=4, theta_neg=0, theta_pos=0, neg_amp=1,
                    fix_neg=True, threshold=False, sigfactor=2, bpm=None,
                    full_output=False, debug=True):
    """Fit a sum of a positive and a negative 2D Gaussian (coronagraphic
    PSFs; reference fit_2d.py:600-835)."""
    check_array(array, dim=2, msg="array")
    psf_subimage, bpm_subimage, suby, subx = _prepare_subimage(
        array, crop, cent, cropsize, bpm)
    if threshold:
        psf_subimage = _threshold_noise(psf_subimage, sigfactor)

    good = ~bpm_subimage
    init_amplitude = np.ptp(psf_subimage[good])
    xcom, ycom = _centroid_com(psf_subimage)
    y, x = np.indices(psf_subimage.shape)
    xg, yg, data = x[good], y[good], psf_subimage[good]

    if np.isscalar(fwhm_neg):
        fwhm_neg = (fwhm_neg, fwhm_neg)
    if np.isscalar(fwhm_pos):
        fwhm_pos = (fwhm_pos, fwhm_pos)

    if fix_neg:
        # neg gaussian fixed: fit pos amplitude/position/stddev/theta + neg amp
        neg_x, neg_y = cent if cent is not None else (xcom, ycom)

        def model(p):
            amp_p, xm, ym, xs, ys, th, amp_n = p
            pos = gaussian_2d(xg, yg, amp_p, xm, ym, xs, ys, th)
            neg = gaussian_2d(xg, yg, amp_n * amp_p, neg_x - subx,
                              neg_y - suby,
                              fwhm_neg[0] * GAUSSIAN_FWHM_TO_SIGMA,
                              fwhm_neg[1] * GAUSSIAN_FWHM_TO_SIGMA,
                              np.deg2rad(theta_neg))
            return pos - neg

        p0 = np.array([init_amplitude, xcom, ycom,
                       fwhm_pos[0] * GAUSSIAN_FWHM_TO_SIGMA,
                       fwhm_pos[1] * GAUSSIAN_FWHM_TO_SIGMA,
                       np.deg2rad(theta_pos), neg_amp])
    else:
        def model(p):
            (amp_p, xm_p, ym_p, xs_p, ys_p, th_p,
             amp_n, xm_n, ym_n, xs_n, ys_n, th_n) = p
            pos = gaussian_2d(xg, yg, amp_p, xm_p, ym_p, xs_p, ys_p, th_p)
            neg = gaussian_2d(xg, yg, amp_n, xm_n, ym_n, xs_n, ys_n, th_n)
            return pos - neg

        p0 = np.array([init_amplitude, xcom, ycom,
                       fwhm_pos[0] * GAUSSIAN_FWHM_TO_SIGMA,
                       fwhm_pos[1] * GAUSSIAN_FWHM_TO_SIGMA,
                       np.deg2rad(theta_pos),
                       neg_amp * init_amplitude, xcom, ycom,
                       fwhm_neg[0] * GAUSSIAN_FWHM_TO_SIGMA,
                       fwhm_neg[1] * GAUSSIAN_FWHM_TO_SIGMA,
                       np.deg2rad(theta_neg)])

    def resid(p):
        return model(p) - data

    p, perr, res = _lm_fit(resid, p0)
    mean_x = p[1] + subx
    mean_y = p[2] + suby

    if debug:
        print("centroid y =", mean_y)
        print("centroid x =", mean_x)

    if full_output:
        import pandas as pd

        cols = {"centroid_y": mean_y, "centroid_x": mean_x,
                "fwhm_x": abs(p[3]) * GAUSSIAN_SIGMA_TO_FWHM,
                "fwhm_y": abs(p[4]) * GAUSSIAN_SIGMA_TO_FWHM,
                "amplitude": p[0], "theta": np.rad2deg(p[5])}
        return pd.DataFrame(cols, index=[0], dtype=np.float64)
    return mean_y, mean_x
