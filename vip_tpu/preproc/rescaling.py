"""Spatial rescaling of frames/cubes (IFS speckle alignment).

TPU rebuild of vip_hci/preproc/rescaling.py. ``scale_fft`` is the exact FFT
zoom with the reference's KD/KF integer optimization
(rescaling.py:1114-1217); its geometry is computed on host and the two
large FFTs run on device. ``cube_rescaling_wavelengths`` is the SDI
workhorse: pad → per-channel FFT zoom → (collapse) → inverse: crop.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..var.coords import frame_center
from ..var.shapes import get_square
from .subsampling import cube_collapse

import functools


@functools.partial(jax.jit, static_argnames=("dim_pp",))
def _scale_fft_core(big, dim_pp):
    """fft2 -> centered frequency-domain pad/crop -> ifft2, as ONE jitted
    program: on the tunneled TPU backend complex arrays cannot cross a
    dispatch boundary (eager complex ops and complex host transfers are
    unimplemented), so the spectrum must live and die inside one jit."""
    dim_p = big.shape[0]
    F = jnp.fft.fftshift(jnp.fft.fft2(big))
    if dim_pp > dim_p:
        off = (dim_pp - dim_p) // 2
        tmp = jnp.zeros((dim_pp, dim_pp), F.dtype)
        tmp = jax.lax.dynamic_update_slice(tmp, F, (off, off))
    else:
        off = (dim_p - dim_pp) // 2
        tmp = jax.lax.dynamic_slice(F, (off, off), (dim_pp, dim_pp))
    return jnp.real(jnp.fft.ifft2(jnp.fft.fftshift(tmp)))

__all__ = ["cube_px_resampling", "frame_px_resampling", "cube_rescaling",
           "frame_rescaling", "cube_rescaling_wavelengths", "check_scal_vector",
           "find_scal_vector", "scale_fft"]


def scale_fft(array, scale, ori_dim=False):
    """Exact FFT resampling of a (even-size square) frame by ``scale``
    (reference rescaling.py:1114-1217)."""
    if scale == 1:
        return np.asarray(array)
    array = np.asarray(array)
    dim = array.shape[0]  # even square
    kd_array = np.arange(dim / 2 + 1, dtype=int)

    yy = dim / 2 * (scale - 1) + kd_array.astype(float) * scale
    kf_array = np.round(yy).astype(int)
    tmp = np.abs(yy - kf_array)
    imin = np.nanargmin(tmp)
    kd_io = int(kd_array[imin])
    kf_io = int(kf_array[imin])

    dim_p = int(dim + 2 * kd_io)
    # reference quirk: dtype=array.dtype.KIND ('f' -> float32!) at
    # rescaling.py:1168 — replicated for bit-parity
    big = np.zeros((dim_p, dim_p), dtype=array.dtype.kind)
    big[kd_io:kd_io + dim, kd_io:kd_io + dim] = array

    # numpy's pocketfft always upcasts to float64; match that when x64 is
    # live (CPU parity runs). On TPU float64/complex128 is unavailable —
    # keep f32 there. The whole fft -> pad/crop -> ifft chain runs inside
    # _scale_fft_core (complex cannot cross a dispatch boundary on the
    # tunneled TPU backend).
    f_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    dim_pp = int(dim + 2 * kf_io)
    array_resc = np.asarray(_scale_fft_core(
        jnp.asarray(big, dtype=f_dtype), dim_pp))

    dim_resc = int(round(scale * dim))
    if dim_resc > dim and dim_resc % 2 != dim % 2:
        dim_resc += 1
    elif dim_resc < dim and dim_resc % 2 != dim % 2:
        dim_resc -= 1

    if not ori_dim and dim_pp > dim_resc:
        array_resc = array_resc[(dim_pp - dim_resc) // 2:
                                (dim_pp + dim_resc) // 2,
                                (dim_pp - dim_resc) // 2:
                                (dim_pp + dim_resc) // 2]
    elif not ori_dim and dim_pp <= dim_resc:
        out = np.zeros((dim_resc, dim_resc))
        out[(dim_resc - dim_pp) // 2:(dim_resc + dim_pp) // 2,
            (dim_resc - dim_pp) // 2:(dim_resc + dim_pp) // 2] = array_resc
        array_resc = out
    elif dim_pp > dim:
        array_resc = array_resc[kf_io:kf_io + dim, kf_io:kf_io + dim]
    elif dim_pp <= dim:
        scaled = array * 0
        scaled[-kf_io:-kf_io + dim_pp, -kf_io:-kf_io + dim_pp] = array_resc
        array_resc = scaled

    return array_resc


def scale_fft_matrix(dim, scale, dtype=np.float64):
    """Exact ``scale_fft(·, scale, ori_dim=True)`` as a (dim, dim) operator.

    ``scale_fft`` (reference rescaling.py:1114-1217) is a linear operator
    on the (even, square) input frame: zero-embed at offset KD -> DFT ->
    centered spectrum pad/crop to ``dim_pp = dim + 2*KF`` -> inverse DFT
    -> crop or re-embed at offset KF. The 2-D DFT separates, so per axis
    the chain is one (dim, dim) complex matrix D[m, v] =
    (1/dim_pp) * sum_k e^{2πik(m+KF)/dim_pp} e^{-2πik(v+KD)/dim_p} over
    the centered ``dmin = min(dim_p, dim_pp)`` frequencies. That range is
    asymmetric (it keeps -dmin/2 but not +dmin/2), so D = R0 + i*g*hᵀ
    with a REAL R0 and a rank-1 imaginary Nyquist term, and the real 2-D
    result the reference returns is exactly

        real(D f Dᵀ) = R0 @ f @ R0.T - (h @ f @ h) * outer(g, g).

    Returns ``(R0, g, h)``. This gives every IFS channel a UNIFORM-shape
    exact zoom (two MXU matmuls + a rank-1 correction), which is what the
    sharded SDI path needs — the per-channel KD/KF integer paddings
    otherwise force one compiled program per channel.
    """
    if dim % 2:
        raise ValueError("scale_fft_matrix requires an even dim")
    if scale == 1:
        z = np.zeros(dim, dtype=dtype)
        return np.eye(dim, dtype=dtype), z, z
    # identical KD/KF integer optimization as scale_fft above
    kd_array = np.arange(dim / 2 + 1, dtype=int)
    yy = dim / 2 * (scale - 1) + kd_array.astype(float) * scale
    kf_array = np.round(yy).astype(int)
    imin = int(np.nanargmin(np.abs(yy - kf_array)))
    kd = int(kd_array[imin])
    kf = int(kf_array[imin])
    dim_p = dim + 2 * kd
    dim_pp = dim + 2 * kf
    dmin = min(dim_p, dim_pp)
    k = np.arange(-(dmin // 2), dmin // 2, dtype=np.float64)
    m = np.arange(dim, dtype=np.float64)
    u = m + kf                       # output sample index in the dim_pp grid
    E_out = np.exp(2j * np.pi * np.outer(u, k) / dim_pp)       # (dim, dmin)
    E_in = np.exp(-2j * np.pi * np.outer(k, m + kd) / dim_p)   # (dmin, dim)
    R0 = np.real(E_out @ E_in) / dim_pp
    # rank-1 imaginary part from the unpaired Nyquist frequency -dmin/2:
    # one of the two factors is an exact (-1)^integer alternation
    k0 = -(dmin // 2)
    a = np.exp(2j * np.pi * k0 * u / dim_pp)           # output-side factor
    b = np.exp(-2j * np.pi * k0 * (m + kd) / dim_p)    # input-side factor
    if dmin == dim_p:   # scale > 1: b = (-1)^(v+kd) exactly real
        g = np.imag(a) / dim_pp
        h = np.where((m.astype(int) + kd) % 2 == 0, 1.0, -1.0)
    else:               # scale < 1: a = (-1)^(m+kf) exactly real
        g = np.where((m.astype(int) + kf) % 2 == 0, 1.0, -1.0) / dim_pp
        h = np.imag(b)
    invalid = (u < 0) | (u >= dim_pp)   # out-of-range rows of the re-embed
    R0[invalid] = 0.0
    g = np.where(invalid, 0.0, g)
    return (np.ascontiguousarray(R0, dtype=dtype), g.astype(dtype),
            h.astype(dtype))


def apply_scale_matrix(frame, R0, g, h):
    """Apply a :func:`scale_fft_matrix` operator to a square frame (works
    with numpy or jax arrays): ``R0 f R0ᵀ - (hᵀ f h) g gᵀ``."""
    corr = h @ frame @ h
    return R0 @ frame @ R0.T - corr * g[:, None] * g[None, :]


def frame_rescaling(array, ref_xy=None, scale=1.0, imlib="vip-fft",
                    interpolation="lanczos4", scale_y=None, scale_x=None):
    """Rescale a frame wrt a reference point, keeping its dimensions
    (reference rescaling.py:506-687)."""
    array = np.asarray(array, dtype=float).copy()
    if array.ndim != 2:
        raise TypeError("Input array is not a frame or 2d array.")

    if scale_y is None:
        scale_y = scale
    if scale_x is None:
        scale_x = scale

    outshape = array.shape
    if ref_xy is None:
        ref_xy = frame_center(array)
    else:
        if imlib == "vip-fft" and tuple(ref_xy) != frame_center(array):
            raise ValueError("'vip-fft' imlib does not yet allow for custom "
                             "center to be provided")

    mask = None
    nan_mask = np.isnan(array)
    if np.any(nan_mask):
        medval = np.nanmedian(array)
        array[nan_mask] = medval
        mask = np.zeros_like(array)
        mask[nan_mask] = 1

    if imlib == "ndimage":
        from scipy.ndimage import geometric_transform

        order = {"nearneig": 0, "bilinear": 1, "biquadratic": 2,
                 "bicubic": 3, "biquartic": 4, "lanczos4": 4,
                 "biquintic": 5}[interpolation]

        def _scale_func(output_coords):
            ref_x, ref_y = ref_xy
            return (ref_y + (output_coords[0] - ref_y) / scale_y,
                    ref_x + (output_coords[1] - ref_x) / scale_x)

        array_out = geometric_transform(array, _scale_func, order=order,
                                        output_shape=outshape)
        array_out /= scale_y * scale_x
    elif imlib == "opencv":
        import cv2

        intp = {"bilinear": cv2.INTER_LINEAR, "bicubic": cv2.INTER_CUBIC,
                "nearneig": cv2.INTER_NEAREST,
                "lanczos4": cv2.INTER_LANCZOS4}[interpolation]
        M = np.array([[scale_x, 0, (1.0 - scale_x) * ref_xy[0]],
                      [0, scale_y, (1.0 - scale_y) * ref_xy[1]]])
        array_out = cv2.warpAffine(array.astype(np.float32), M, outshape,
                                   flags=intp)
        array_out /= scale_y * scale_x
    elif imlib == "vip-fft":
        if scale_x != scale_y:
            raise ValueError("FFT scaling only supports identical factors "
                             "along x and y")
        if array.shape[0] != array.shape[1]:
            raise ValueError("FFT scaling only supports square input arrays")

        odd = bool(array.shape[0] % 2)
        if odd:
            array_even = np.zeros([array.shape[0] + 1, array.shape[1] + 1])
            array_even[1:, 1:] = array
            array = array_even

        if mask is not None:
            if odd:
                mask_even = np.zeros([mask.shape[0] + 1, mask.shape[1] + 1])
                mask_even[1:, 1:] = mask
                mask = mask_even
            mask = scale_fft(mask, scale_x, ori_dim=True)
            if odd:
                mask = mask[1:, 1:]

        array_out = scale_fft(array, scale_x, ori_dim=True)
        if odd:
            array_out = array_out[1:, 1:]
    else:
        raise ValueError("Image transformation library not recognized")

    if mask is not None:
        # scale_fft hands back a read-only view of a device array
        array_out = np.array(array_out)
        array_out[mask >= 0.5] = np.nan

    return array_out


def cube_rescaling(array, scaling_list, ref_xy=None, imlib="vip-fft",
                   interpolation="lanczos4", scaling_y=None, scaling_x=None,
                   nproc=1):
    """Rescale each frame of a cube by its own factor
    (reference rescaling.py:687-766)."""
    array = np.asarray(array)
    if array.ndim != 3:
        raise TypeError("Input array is not a cube or 3d array")
    if scaling_list is None:
        scaling_list = [None] * array.shape[0]
    array_sc = [
        frame_rescaling(array[i], ref_xy=ref_xy, scale=scaling_list[i],
                        imlib=imlib, interpolation=interpolation,
                        scale_y=scaling_y, scale_x=scaling_x)
        for i in range(array.shape[0])
    ]
    return np.array(array_sc)


def cube_rescaling_wavelengths(cube, scal_list, full_output=True,
                               inverse=False, y_in=None, x_in=None,
                               imlib="vip-fft", interpolation="lanczos4",
                               collapse="median", pad_mode="reflect",
                               nproc=1):
    """Rescale spectral channels to align speckles (or the inverse)
    (reference rescaling.py:324-477)."""
    cube = np.asarray(cube, dtype=float)
    n, y, x = cube.shape
    scal_list = np.asarray(scal_list, dtype=float)
    max_sc = np.amax(scal_list)

    if not inverse and max_sc > 1:
        new_y = int(np.ceil(max_sc * y))
        new_x = int(np.ceil(max_sc * x))
        if (new_y - y) % 2 != 0:
            new_y += 1
        if (new_x - x) % 2 != 0:
            new_x += 1
        pad_len_y = (new_y - y) // 2
        pad_len_x = (new_x - x) // 2
        pad_width = ((0, 0), (pad_len_y, pad_len_y), (pad_len_x, pad_len_x))
        big_cube = np.pad(cube, pad_width, pad_mode)
    else:
        big_cube = cube.copy()

    n, y, x = big_cube.shape
    cy, cx = frame_center(big_cube[0])

    if inverse:
        scal_list = 1.0 / scal_list
        cy, cx = frame_center(cube[0])

    cube_out = cube_rescaling(big_cube, scal_list, ref_xy=(cx, cy),
                              imlib=imlib, interpolation=interpolation,
                              nproc=nproc)
    frame = cube_collapse(cube_out, collapse)

    if inverse and max_sc > 1:
        if y_in is None or x_in is None:
            raise ValueError("Provide y_in and x_in when inverse=True")
        siz = max(y_in, x_in)
        if frame.shape[0] > siz:
            frame = get_square(frame, siz, cy, cx, verbose=False)
        if full_output and cube_out.shape[-1] > siz:
            array_old = cube_out.copy()
            cube_out = np.zeros([array_old.shape[0], siz, siz])
            for zz in range(cube_out.shape[0]):
                cube_out[zz] = get_square(array_old[zz], siz, cy, cx,
                                          verbose=False)

    if full_output:
        return cube_out, frame, y, x, cy, cx
    return frame


def check_scal_vector(scal_vec):
    """Normalize scaling factors to all be >= 1
    (reference rescaling.py:767-796)."""
    if not isinstance(scal_vec, (list, np.ndarray)):
        raise TypeError("`Scal_vec` is neither a list or an np.ndarray")
    scal_vec = np.array(scal_vec)
    if scal_vec.min() != 1:
        scal_vec = scal_vec / scal_vec.min()
    return scal_vec


def _chisquare_scal(modelParameters, cube, flux_fac=1, mask=None, fm="sum",
                    imlib="vip-fft", interpolation="lanczos4"):
    """χ² of the difference between channel 0 scaled and channel 1
    (reference rescaling.py:991-1054)."""
    array = cube.copy()
    (scale_fac,) = modelParameters
    array[0] = array[0] * flux_fac
    scaling_list = np.array([scale_fac, 1])
    array = cube_rescaling(array, scaling_list, imlib=imlib,
                           interpolation=interpolation)
    frame = array[1] - array[0]
    if mask is None:
        mask = np.ones_like(frame)
    if fm == "sum":
        return np.sum(np.power(frame[np.where(mask)], 2))
    elif fm == "stddev":
        values = frame[np.where(mask)]
        values = values[values != 0]
        return np.std(values)
    raise RuntimeError("fm choice not recognized.")


def _chisquare_scal_2fp(modelParameters, cube, mask=None, fm="sum",
                        imlib="vip-fft", interpolation="lanczos4"):
    """χ² with 2 free parameters (scale + flux; rescaling.py:1055-1113)."""
    scale_fac, flux_fac = modelParameters
    return _chisquare_scal((scale_fac,), cube, flux_fac, mask, fm, imlib,
                           interpolation)


def find_scal_vector(cube, lbdas, fluxes, mask=None, nfp=2, fm='stddev',
                     simplex_options=None, debug=False, imlib="vip-fft",
                     interpolation="lanczos4", hpf=False, fwhm_max=5,
                     **kwargs):
    """Optimize per-channel scaling (and flux) factors by simplex on χ²
    (reference rescaling.py:797-915)."""
    from scipy.optimize import minimize

    scal_vec_ini = np.asarray(lbdas)[-1] / np.asarray(lbdas)
    n_z = len(lbdas)
    if n_z != len(fluxes) or n_z != cube.shape[0]:
        raise TypeError("first axis of cube, fluxes and lbda must have same "
                        "length")

    if simplex_options is None:
        simplex_options = {"xatol": 1e-6, "fatol": 1e-6, "maxiter": 800,
                           "maxfev": 2000}
    scal_vec = np.ones(n_z)
    flux_vec = np.ones(n_z)
    array = cube.copy()
    if hpf:
        from ..var.filters import cube_filter_highpass

        med_sz = int(5 * fwhm_max)
        if not med_sz % 2:
            med_sz += 1
        array = cube_filter_highpass(cube, mode="median-subt",
                                     median_size=med_sz)
    for z in range(n_z - 1):
        flux_scal = fluxes[-1] / fluxes[z]
        cube_tmp = np.array([array[z], array[-1]])
        if nfp == 1:
            solu = minimize(_chisquare_scal, (scal_vec_ini[z],),
                            args=(cube_tmp, flux_scal, mask, fm, imlib,
                                  interpolation),
                            method="Nelder-Mead", bounds=((1e-1, None),),
                            options=simplex_options, **kwargs)
            (scal_fac,) = solu.x
            flux_fac = flux_scal
        else:
            solu = minimize(_chisquare_scal_2fp,
                            (scal_vec_ini[z], flux_scal),
                            args=(cube_tmp, mask, fm, imlib, interpolation),
                            method="Nelder-Mead",
                            bounds=((1e-1, None), (1e-2, None)),
                            options=simplex_options, **kwargs)
            scal_fac, flux_fac = solu.x
        if debug:
            print(f"channel {z}:", solu.x)
        scal_vec[z] = scal_fac
        flux_vec[z] = flux_fac

    scal_vec = check_scal_vector(scal_vec)
    if nfp == 2:
        return scal_vec, flux_vec
    return scal_vec, flux_vec


def _find_indices_sdi(scal, dist, index_ref, fwhm, delta_sep=1, nframes=None,
                      debug=False):
    """Wavelength indices minimizing SDI self-subtraction
    (reference rescaling.py:916-990)."""
    scal = np.asarray(scal)
    scal_ref = scal[index_ref]
    sep_lft = (scal_ref - scal) / scal_ref * ((dist + fwhm * delta_sep)
                                              / fwhm)
    sep_rgt = (scal - scal_ref) / scal_ref * ((dist - fwhm * delta_sep)
                                              / fwhm)
    map_lft = sep_lft >= delta_sep
    map_rgt = sep_rgt >= delta_sep
    indices = np.nonzero(map_lft | map_rgt)[0]

    if debug:
        print(f"dist: {dist}, index_ref: {index_ref}")

    if indices.size == 0:
        raise RuntimeError("No frames left after radial motion threshold. "
                           "Try decreasing the value of `delta_sep`")

    if nframes is not None:
        i1 = map_lft.sum()
        window = nframes // 2
        if i1 - window < 0 or i1 + window > indices[-1]:
            window = nframes
        ind1 = max(0, i1 - window)
        ind2 = min(scal.size, i1 + window)
        indices = indices[ind1:ind2]
        if indices.size < 2:
            raise RuntimeError("No frames left after radial motion "
                               "threshold. Try decreasing the value of "
                               "`delta_sep` or `nframes`")
    return indices


def frame_px_resampling(array, scale, imlib="vip-fft",
                        interpolation="lanczos4", keep_center=False,
                        verbose=False):
    """Resample a frame to new dimensions (reference rescaling.py:103-323)."""
    array = np.asarray(array, dtype=float).copy()
    if array.ndim != 2:
        raise TypeError("Input array is not a frame or 2d array")

    if isinstance(scale, tuple):
        scale_x, scale_y = scale
    elif isinstance(scale, (float, int)):
        scale_x = scale_y = scale
    else:
        raise TypeError("`scale` must be float, int or tuple")

    mask = None
    nan_mask = np.isnan(array)
    if np.any(nan_mask):
        medval = np.nanmedian(array)
        array[nan_mask] = medval
        mask = np.zeros_like(array)
        mask[nan_mask] = 1

    odd = bool(array.shape[0] % 2)

    if imlib == "ndimage":
        from scipy.ndimage import zoom

        order = {"nearneig": 0, "bilinear": 1, "biquadratic": 2,
                 "bicubic": 3, "biquartic": 4, "lanczos4": 4,
                 "biquintic": 5}[interpolation]
        if mask is not None:
            mask = zoom(mask, zoom=(scale_y, scale_x), order=order)
        array_resc = zoom(array, zoom=(scale_y, scale_x), order=order)
        array_resc /= scale_y * scale_x
    elif imlib == "opencv":
        import cv2

        intp = {"bilinear": cv2.INTER_LINEAR, "bicubic": cv2.INTER_CUBIC,
                "nearneig": cv2.INTER_NEAREST,
                "lanczos4": cv2.INTER_LANCZOS4}[interpolation]
        if mask is not None:
            mask = cv2.resize(mask.astype(np.float32), (0, 0), fx=scale_x,
                              fy=scale_y, interpolation=intp)
        array_resc = cv2.resize(array.astype(np.float32), (0, 0), fx=scale_x,
                                fy=scale_y, interpolation=intp)
        array_resc = array_resc.astype(float)
        array_resc /= scale_y * scale_x
    elif imlib == "vip-fft":
        if scale_x != scale_y:
            raise ValueError("FFT scaling only supports identical factors")
        if array.shape[0] != array.shape[1]:
            raise ValueError("FFT scaling only supports square input arrays")
        if odd:
            array_even = np.zeros([array.shape[0] + 1, array.shape[1] + 1])
            array_even[1:, 1:] = array
            array = array_even
        if mask is not None:
            if odd:
                mask_even = np.zeros([mask.shape[0] + 1, mask.shape[1] + 1])
                mask_even[1:, 1:] = mask
                mask = mask_even
            mask = scale_fft(mask, scale_x)
            if odd:
                mask = mask[1:, 1:]
        array_resc = scale_fft(array, scale_x)
        if odd:
            array_resc = array_resc[1:, 1:]
    else:
        raise ValueError("Image transformation library not recognized")

    if mask is not None and mask.shape == array_resc.shape:
        # scale_fft hands back a read-only view of a device array
        array_resc = np.array(array_resc)
        array_resc[mask >= 0.5] = np.nan

    if verbose:
        print(f"Image successfully rescaled. New shape: {array_resc.shape}")
    return array_resc


def cube_px_resampling(array, scale, imlib="vip-fft",
                       interpolation="lanczos4", keep_center=False,
                       verbose=True):
    """Resample every frame of a cube (reference rescaling.py:39-102)."""
    array = np.asarray(array)
    if array.ndim != 3:
        raise TypeError("Input array is not a cube or 3d array.")
    array_resc = np.array([
        frame_px_resampling(array[i], scale=scale, imlib=imlib,
                            interpolation=interpolation,
                            keep_center=keep_center)
        for i in range(array.shape[0])
    ])
    if verbose:
        print("Cube successfully rescaled")
        print(f"New shape: {array_resc.shape}")
    return array_resc
