"""Frame/cube filtering (low-pass, high-pass, deconvolution).

TPU rebuild of vip_hci/var/filters.py. Convolutions follow the
astropy.convolution semantics the reference relies on (normalized kernel,
zero-fill boundary, NaN interpolation by valid-coverage renormalization;
filters.py:405-550) but run as FFT convolutions on device, vmapped over
cubes instead of the reference's ``pool_map`` (filters.py:550+).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

GAUSSIAN_FWHM_TO_SIGMA = 1.0 / (2.0 * np.sqrt(2.0 * np.log(2.0)))

__all__ = [
    "frame_filter_lowpass",
    "frame_filter_highpass",
    "cube_filter_lowpass",
    "cube_filter_highpass",
    "cube_filter_iuwt",
    "cube_filter_lowpass",
    "frame_deconvolution",
    "fft",
    "ifft",
    "gaussian_kernel_2d",
]


def fft(array):
    """Centered 2-d FFT (reference filters.py:146-161)."""
    fft_array = np.fft.fftshift(np.fft.fft2(array))
    return fft_array


def ifft(array):
    """Centered 2-d inverse FFT (reference filters.py:162-179)."""
    new_array = np.fft.ifft2(np.fft.ifftshift(array)).real
    return new_array


def _round_up_to_odd_integer(value):
    i = int(np.ceil(value))
    return i + 1 if i % 2 == 0 else i


def gaussian_kernel_2d(sigma_x, sigma_y=None, x_size=None, y_size=None):
    """Sampled, normalized 2-d Gaussian kernel (astropy Gaussian2DKernel
    semantics: default support 8·stddev rounded up to odd)."""
    if sigma_y is None:
        sigma_y = sigma_x
    if x_size is None:
        x_size = _round_up_to_odd_integer(8 * max(sigma_x, 1e-3))
    if y_size is None:
        y_size = _round_up_to_odd_integer(8 * max(sigma_y, 1e-3))
    xs = np.arange(x_size) - (x_size - 1) / 2
    ys = np.arange(y_size) - (y_size - 1) / 2
    gx = np.exp(-0.5 * (xs / sigma_x) ** 2)
    gy = np.exp(-0.5 * (ys / sigma_y) ** 2)
    k = np.outer(gy, gx)
    return k / k.sum()


def _fft_convolve_same(image, kernel):
    """'same'-size linear FFT convolution with zero-fill boundary (device)."""
    iy, ix = image.shape
    ky, kx = kernel.shape
    fy, fx = iy + ky - 1, ix + kx - 1
    F = jnp.fft.rfft2(image, (fy, fx))
    G = jnp.fft.rfft2(kernel, (fy, fx))
    full = jnp.fft.irfft2(F * G, (fy, fx))
    y0 = (ky - 1) // 2
    x0 = (kx - 1) // 2
    return full[y0:y0 + iy, x0:x0 + ix]


@functools.partial(jax.jit, static_argnames=("interpolate_nan",))
def convolve_with_mask(image, kernel, interpolate_nan=True):
    """astropy-style convolution: NaNs (and boundary) handled by dividing by
    the convolved valid-coverage map. Jitted: the intermediate complex
    spectra must not cross a dispatch boundary on the tunneled TPU
    backend."""
    image = jnp.asarray(image)
    kernel = jnp.asarray(kernel, image.dtype)
    finite = jnp.isfinite(image)
    im0 = jnp.where(finite, image, 0.0)
    num = _fft_convolve_same(im0, kernel)
    if interpolate_nan:
        den = _fft_convolve_same(finite.astype(image.dtype), kernel)
        return num / den
    return num


def frame_filter_lowpass(array, mode="gauss", median_size=5, fwhm_size=5,
                         conv_mode="convfft", kernel_sz=None, psf=None,
                         mask=None, iterate=True, half_res_y=False, **kwargs):
    """Low-pass filter a frame: 'median', 'gauss' or 'psf' convolution
    (reference filters.py:405-550)."""
    array = np.asarray(array)
    if array.ndim != 2:
        raise TypeError("Input array is not a frame or 2d array.")
    if not isinstance(median_size, int):
        raise ValueError("`Median_size` must be integer")

    if mode == "median":
        from scipy.ndimage import median_filter

        return median_filter(array, median_size, mode="nearest")
    elif mode == "gauss":
        kernel_sz_y = kernel_sz
        if np.isscalar(fwhm_size):
            sigma = fwhm_size * GAUSSIAN_FWHM_TO_SIGMA
            sigma_y = sigma
        else:
            if len(fwhm_size) != 2:
                raise TypeError("If not a scalar, fwhm_size must be of "
                                "length 2")
            sigma_y = fwhm_size[0] * GAUSSIAN_FWHM_TO_SIGMA
            sigma = fwhm_size[1] * GAUSSIAN_FWHM_TO_SIGMA
            if kernel_sz is not None:
                kernel_sz_y = int(kernel_sz * fwhm_size[0] / fwhm_size[1])
                if kernel_sz_y % 2 != kernel_sz % 2:
                    kernel_sz_y += 1
        if half_res_y:
            sigma_y = max(1, sigma_y // 2)
            if kernel_sz_y is not None:
                kernel_sz_y = kernel_sz_y // 2
                if kernel_sz_y % 2 != kernel_sz % 2:
                    kernel_sz_y += 1
        kernel = gaussian_kernel_2d(sigma, sigma_y, x_size=kernel_sz,
                                    y_size=kernel_sz_y)
        work = array.copy()
        if mask is not None:
            work = work.astype(float)
            work[mask.astype(bool)] = np.nan
        filtered = np.asarray(convolve_with_mask(work, kernel))
        if iterate and np.any(np.isnan(filtered)):
            filtered = _interp_remaining_nan(filtered, kernel)
        return filtered
    elif mode == "psf":
        if psf is None:
            raise TypeError("psf should be provided for convolution")
        if psf.ndim != 2:
            raise TypeError("Input psf is not a frame or 2d array.")
        if psf.shape[-1] > array.shape[-1]:
            raise TypeError("Input psf is larger than input array. Crop.")
        work = array.copy()
        if mask is not None:
            work = work.astype(float)
            work[mask.astype(bool)] = np.nan
        filtered = np.asarray(convolve_with_mask(work, psf))
        if iterate and np.any(np.isnan(filtered)):
            filtered = _interp_remaining_nan(filtered, psf)
        return filtered
    raise TypeError("Low-pass filter mode not recognized")


def _interp_remaining_nan(filtered, kernel):
    """Fill NaNs that survive the masked convolution (a fully-NaN
    neighbourhood larger than the kernel support) the way the reference's
    ``iterate=True`` branch does via astropy interpolate_replace_nans
    (reference filters.py:499-545): replace only the NaN pixels with the
    kernel interpolation of the valid filtered values."""
    conv = np.asarray(convolve_with_mask(filtered, kernel))
    return np.where(np.isnan(filtered), conv, filtered)


def _butter2d_lp(size, cutoff, n=3):
    """Low-pass 2-d Butterworth transfer function (filters.py:246-300,
    credits PsychoPy / J. Peirce)."""
    if not 0 < cutoff <= 1.0:
        raise ValueError("Cutoff frequency must be between 0 and 1.0")
    if not isinstance(n, int):
        raise ValueError("n must be an integer >= 1")
    rows, cols = size
    # radius in PIXELS (the reference scales the normalized axes by the
    # frame size, filters.py:282-283), so `cutoff` is in cycles/frame
    x = np.linspace(-0.5, 0.5, cols) * cols
    y = np.linspace(-0.5, 0.5, rows) * rows
    radius = np.sqrt((x**2)[np.newaxis] + (y**2)[:, np.newaxis])
    f = 1 / (1 + (radius / cutoff) ** (2 * n))
    return f


def frame_filter_highpass(array, mode, median_size=5, kernel_size=5,
                          fwhm_size=5, btw_cutoff=0.2, btw_order=2,
                          hann_cutoff=5, psf=None, conv_mode="conv",
                          mask=None):
    """High-pass filter a frame (reference filters.py:181-405)."""
    array = np.asarray(array)
    if array.ndim != 2:
        raise TypeError("Input array is not a frame or 2d array.")

    if mode == "laplacian":
        import cv2

        if kernel_size % 2 == 0 or kernel_size < 0:
            raise ValueError("Kernel size must be an odd and positive "
                             "value.")
        # keep the input dtype: cv2 convolves in the source depth and only
        # casts the OUTPUT to f32, so pre-casting changes the result at
        # the f32-epsilon level vs the reference (filters.py:322)
        return cv2.Laplacian(-array, cv2.CV_32F, ksize=kernel_size)
    elif mode == "laplacian-conv":
        kernel3 = np.array([[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]])
        kernel5 = np.array([[-4, -1, 0, -1, -4],
                            [-1, 2, 3, 2, -1],
                            [0, 3, 4, 3, 0],
                            [-1, 2, 3, 2, -1],
                            [-4, -1, 0, -1, -4]])
        kernel7 = np.array([[-10, -5, -2, -1, -2, -5, -10],
                            [-5, 0, 3, 4, 3, 0, -5],
                            [-2, 3, 6, 7, 6, 3, -2],
                            [-1, 4, 7, 8, 7, 4, -1],
                            [-2, 3, 6, 7, 6, 3, -2],
                            [-5, 0, 3, 4, 3, 0, -5],
                            [-10, -5, -2, -1, -2, -5, -10]])
        if kernel_size == 3:
            kernel = kernel3
        elif kernel_size == 5:
            kernel = kernel5
        elif kernel_size == 7:
            kernel = kernel7
        else:
            raise ValueError("Kernel size must be either 3, 5 or 7.")
        num = np.asarray(_fft_convolve_same(jnp.asarray(array, float),
                                            jnp.asarray(kernel, float)))
        return num
    elif mode == "median-subt":
        medianed = frame_filter_lowpass(array, "median",
                                        median_size=median_size)
        return array - medianed
    elif mode == "gauss-subt":
        gaussed = frame_filter_lowpass(array, "gauss", fwhm_size=fwhm_size,
                                       conv_mode=conv_mode, mask=mask)
        return array - gaussed
    elif mode == "fourier-butter":
        filt = _butter2d_lp(array.shape, cutoff=btw_cutoff, n=btw_order)
        filt = 1.0 - filt
        array_fft = fft(array)
        fft_new = array_fft * filt
        return ifft(fft_new)
    elif mode == "hann":
        # attenuate low frequencies with a Hann profile cut at
        # cutoff = npix/2 * hann_cutoff (reference filters.py:380-398)
        npix = array.shape[0]
        cutoff = npix / 2 * hann_cutoff
        cutoff_inside = int(np.trunc(np.minimum(cutoff, npix / 2 - 1)
                                     + np.copysign(0.5, cutoff)))
        winsize = 2 * cutoff_inside + 1
        win1d = np.hanning(winsize)
        win = 1 - np.outer(win1d, win1d)
        array_fft = np.array(fft(array))
        array_fft[npix // 2 - cutoff_inside:npix // 2 + cutoff_inside + 1,
                  npix // 2 - cutoff_inside:npix // 2 + cutoff_inside + 1] \
            *= win
        return ifft(array_fft)
    elif mode == "psf-subt":
        psfed = frame_filter_lowpass(array, "psf", psf=psf,
                                     conv_mode=conv_mode, mask=mask)
        return array - psfed
    raise TypeError("High-pass filter mode not recognized")


def cube_filter_lowpass(array, mode="gauss", median_size=5, fwhm_size=5,
                        conv_mode='conv', kernel_sz=None, verbose=True,
                        psf=None, mask=None, iterate=True, half_res_y=False,
                        nproc=1, **kwargs):
    """Low-pass filter every frame of a cube (filters.py:550+); batched."""
    array = np.asarray(array)
    out = np.empty_like(array, dtype=float)
    for i in range(array.shape[0]):
        out[i] = frame_filter_lowpass(array[i], mode, median_size, fwhm_size,
                                      conv_mode, kernel_sz, psf, mask,
                                      iterate, half_res_y, **kwargs)
    return out


def cube_filter_highpass(array, mode="laplacian", verbose=True, **kwargs):
    """High-pass filter every frame of a cube (filters.py:108-145)."""
    array = np.asarray(array)
    out = np.empty_like(array, dtype=float)
    for i in range(array.shape[0]):
        out[i] = frame_filter_highpass(array[i], mode, **kwargs)
    return out


def frame_deconvolution(array, psf, n_it=30):
    """Richardson-Lucy deconvolution (reference filters.py:616-655)."""
    from scipy.signal import convolve as sconvolve

    array = np.asarray(array, dtype=float)
    psf = np.asarray(psf, dtype=float)
    im_deconv = np.full(array.shape, 0.5)
    psf_mirror = psf[::-1, ::-1]
    for _ in range(n_it):
        conv = sconvolve(im_deconv, psf, mode="same")
        relative_blur = array / np.where(conv == 0, 1e-12, conv)
        im_deconv *= sconvolve(relative_blur, psf_mirror, mode="same")
    return im_deconv


def cube_filter_iuwt(cube, coeff=5, rel_coeff=1, full_output=False):
    """IUWT filtering of a cube ([KEN15]/[DAB15], reference
    filters.py:63-105); the per-frame decomposition is one batched device
    program."""
    from .iuwt import iuwt_decomposition_batch

    cube = np.asarray(cube, dtype=float)
    cube_coeff = iuwt_decomposition_batch(cube, coeff)
    cubeout = cube_coeff[:, :rel_coeff].sum(axis=1)
    if full_output:
        return cubeout, cube_coeff
    return cubeout
