"""Sub-pixel shifting and cube recentering.

TPU rebuild of vip_hci/preproc/recentering.py. ``frame_shift`` ('vip-fft')
reproduces the reference's pad→phase-ramp→ifft→crop math
(recentering.py:66-254) on device; ``cube_shift`` batches all frames in one
vmapped computation with a shared pad margin. Registration methods
(DFT upsampling, satellite spots, radon, 2d fits) land in later passes of
this module.
"""

import numpy as np
import jax.numpy as jnp

from ..config.utils_conf import check_array
from ..ops.fft import fourier_shift, fourier_shift_batch

__all__ = ["frame_shift", "cube_shift", "cube_recenter_dft_upsampling"]


def frame_shift(array, shift_y, shift_x, imlib="vip-fft",
                interpolation="lanczos4", border_mode="reflect"):
    """Shift a 2d array by (shift_y, shift_x) px.

    'vip-fft' is bit-parity with the reference path (per-call pad margin
    ceil(max|shift|), recentering.py:127); 'ndimage-fourier' and
    'ndimage-interp' use scipy on host; 'opencv' uses cv2.
    """
    check_array(array, dim=2)
    array = np.asarray(array)

    if imlib == "vip-fft":
        npad = int(np.ceil(np.amax(np.abs([shift_y, shift_x]))))
        return np.asarray(fourier_shift(jnp.asarray(array), shift_y, shift_x,
                                        npad))
    elif imlib == "ndimage-fourier":
        from scipy.ndimage import fourier_shift as sp_fourier_shift

        shifted = sp_fourier_shift(np.fft.fftn(array), (shift_y, shift_x))
        return np.fft.ifftn(shifted).real
    elif imlib == "ndimage-interp":
        from scipy.ndimage import shift as sp_shift

        order = {"nearneig": 0, "bilinear": 1, "biquadratic": 2, "bicubic": 3,
                 "biquartic": 4, "lanczos4": 4, "biquintic": 5}[interpolation]
        return sp_shift(array, (shift_y, shift_x), order=order,
                        mode=border_mode)
    elif imlib == "opencv":
        import cv2

        intp = {"bilinear": cv2.INTER_LINEAR, "bicubic": cv2.INTER_CUBIC,
                "nearneig": cv2.INTER_NEAREST,
                "lanczos4": cv2.INTER_LANCZOS4}[interpolation]
        bormo = {"mirror": cv2.BORDER_REFLECT_101,
                 "reflect": cv2.BORDER_REFLECT, "wrap": cv2.BORDER_WRAP,
                 "constant": cv2.BORDER_CONSTANT,
                 "nearest": cv2.BORDER_REPLICATE}[border_mode]
        image = np.float32(array)
        yy, xx = image.shape
        M = np.float32([[1, 0, shift_x], [0, 1, shift_y]])
        return cv2.warpAffine(image, M, (xx, yy), flags=intp,
                              borderMode=bormo)
    raise ValueError("Image transformation library not recognized")


def cube_shift(cube, shift_y, shift_x, imlib="vip-fft",
               interpolation="lanczos4", border_mode="reflect", nproc=None):
    """Shift every frame of a cube; scalar or per-frame shift values.

    The 'vip-fft' path runs one batched device computation. To keep XLA
    shapes static the pad margin is shared (max over frames) — the FFT
    shift itself is identical; only the zero-pad halo differs, which for
    per-frame margins matches the reference to ~machine precision of the
    wrap-around leakage.
    """
    check_array(cube, dim=3)
    cube = np.asarray(cube)
    n = cube.shape[0]
    shift_y = np.broadcast_to(np.asarray(shift_y, float), (n,)).copy()
    shift_x = np.broadcast_to(np.asarray(shift_x, float), (n,)).copy()

    if imlib == "vip-fft":
        # group frames by per-frame pad margin for bit-parity with the
        # reference's per-call npad (few distinct values in practice)
        npads = np.ceil(np.maximum(np.abs(shift_y),
                                   np.abs(shift_x))).astype(int)
        out = np.empty_like(cube, dtype=float)
        for npad in np.unique(npads):
            sel = npads == npad
            res = fourier_shift_batch(jnp.asarray(cube[sel]),
                                      jnp.asarray(shift_y[sel]),
                                      jnp.asarray(shift_x[sel]), int(npad))
            out[sel] = np.asarray(res)
        return out
    return np.stack([
        frame_shift(cube[i], shift_y[i], shift_x[i], imlib=imlib,
                    interpolation=interpolation, border_mode=border_mode)
        for i in range(n)
    ])


def cube_recenter_dft_upsampling(array, center_fr1=None, negative=False,
                                 fwhm=4, subi_size=None, upsample_factor=100,
                                 imlib="vip-fft", interpolation="lanczos4",
                                 mask=None, border_mode="reflect",
                                 log=False, collapse="median",
                                 full_output=False, verbose=True, nproc=None,
                                 save_shifts=False, debug=False, plot=False):
    """Register a cube against its first frame with upsampled
    cross-correlation ([GUI08]; reference recentering.py:1142-1410).

    The cross-correlation and the matrix-multiply DFT refinement run
    batched on device.
    """
    from ..ops.registration import dft_registration_batch

    check_array(array, dim=3)
    array = np.asarray(array, dtype=float)
    n = array.shape[0]

    ref = array[0]
    shifts = dft_registration_batch(jnp.asarray(ref), jnp.asarray(array[1:]),
                                    upsample_factor=int(upsample_factor))
    shifts = np.vstack([np.zeros((1, 2)), -np.asarray(shifts)])

    array_rec = cube_shift(array, shifts[:, 0], shifts[:, 1], imlib=imlib,
                           interpolation=interpolation,
                           border_mode=border_mode)
    if verbose:
        print("Median shifts: dy={:.3f}, dx={:.3f}".format(
            np.median(shifts[:, 0]), np.median(shifts[:, 1])))
    if full_output:
        return array_rec, shifts[:, 0], shifts[:, 1]
    return array_rec
