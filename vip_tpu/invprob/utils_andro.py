"""Utility functions for ANDROMEDA (reference vip_hci/invprob/utils_andro.py,
itself a port of LibAndromeda IDL routines)."""

import numpy as np

__all__ = []


def robust_std(x):
    """Robust standard deviation: MAD / 0.6745
    (reference utils_andro.py:14-37)."""
    x = np.asarray(x)
    mad = np.median(np.abs(x - np.median(x)))
    return mad / 0.6745


def idl_round(x):
    """Round half-away-from-zero, like IDL ROUND
    (reference utils_andro.py:40-62)."""
    return np.trunc(x + np.copysign(0.5, x))


def idl_where(array_expression):
    """Indices matching the expression (IDL WHERE, returning [] if none)."""
    return np.flatnonzero(array_expression)


def fitaffine(x, y, debug=False):
    """Robust (L1) affine fit y = b*x + a, Numerical-Recipes style
    (reference utils_andro.py:92-195)."""
    ndata = x.shape[0]
    sx = np.sum(x)
    sy = np.sum(y)
    sxy = np.sum(x * y)
    sxx = np.sum(x**2)

    delta = ndata * sxx - sx**2
    a_ls = (sxx * sy - sx * sxy) / delta
    b_ls = (ndata * sxy - sx * sy) / delta

    if debug:
        print("FITAFFINE: ***next dataset***")
        print(f"FITAFFINE: first guess LS: {a_ls} + {b_ls} x")

    chisq = np.sum((y - (a_ls + b_ls * x))**2)
    sigb = np.sqrt(chisq / delta)

    a = a_ls
    b = b_ls
    b1 = b_ls
    f1, a = rofunc(x=x, y=y, b=b1)

    if sigb > 0 and f1 != 0:
        if debug:
            print("FITAFFINE: entering iteration loop")
        if f1 > 0:
            b2 = b1 + 3 * sigb
        else:
            b2 = b1 - 3 * sigb
        f2, a = rofunc(x, y, b=b2)
        while f1 * f2 > 0:
            b = b2 + 1.6 * (b2 - b1)
            b1 = b2
            f1 = f2
            b2 = b
            f2, a = rofunc(x, y, b=b2)
        sigb = 0.01 * sigb
        while np.abs(b2 - b1) > sigb:
            b = b1 + 0.5 * (b2 - b1)
            f, a = rofunc(x, y, b=b)
            if f * f1 >= 0:
                f1 = f
                b1 = b
            else:
                f2 = f
                b2 = b
    if debug:
        print("FITAFFINE: *end of iterative loop*")
        print(f"FITAFFINE: equation of the robust fit: {a} + {b} x")
    return b, a


def rofunc(x, y, b):
    """Compute a for given b solving 0 = sum_i x_i sign(y_i - a - b x_i)
    (reference utils_andro.py:198-248); vectorized over points."""
    epsilon = 1e-5
    arr = y - b * x
    a = np.median(arr)
    d = y - (b * x + a)
    d = np.where(y != 0, d / np.abs(np.where(y != 0, y, 1.0)), d)
    sum_result = np.sum(np.where(np.abs(d) > epsilon,
                                 np.where(d >= 0, x, -x), 0.0))
    return sum_result, a


def subpixel_shift(image, xshift, yshift):
    """Fourier subpixel shift (reference utils_andro.py:300-335,
    LibAndromeda subpixel_shift.pro)."""
    npix = image.shape[0]
    if npix != image.shape[1]:
        raise ValueError("`image` must be square")
    ramp = np.outer(np.ones(npix), np.arange(npix) - npix / 2)
    tilt = (-2 * np.pi / npix) * (xshift * ramp + yshift * ramp.T)
    fact = np.fft.fftshift(np.cos(tilt) + 1j * np.sin(tilt))
    image_ft = np.fft.fft2(image)  # no fftshift applied
    return np.fft.ifft2(image_ft * fact).real


def calc_psf_shift_subpix(psf, precision):
    """Stack of subpixel-shifted PSFs, shape (precision+1, precision+1, n, n)
    (reference utils_andro.py:251-297)."""
    n = psf.shape[0]
    psf_cube = np.empty((precision + 1, precision + 1, n, n))
    for i_column in range(precision + 1):
        decalx = i_column / precision
        for j_row in range(precision + 1):
            decaly = j_row / precision
            psf_cube[j_row, i_column] = subpixel_shift(psf, decalx, decaly)
    return psf_cube
