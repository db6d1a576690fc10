"""Sub-pixel image registration on device.

Guizar-Sicairos matrix-multiply DFT upsampling ([GUI08]) — the algorithm
behind skimage's ``phase_cross_correlation`` which the reference wraps at
vip_hci/preproc/recentering.py:1385 (``_shift_dft``). Implemented as a
jittable, vmappable JAX computation: one FFT cross-power spectrum + two
small DFT matrix multiplications per frame (MXU-friendly), batched over the
cube instead of the reference's per-frame pool.
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ["dft_registration", "dft_registration_batch", "upsampled_dft"]


def upsampled_dft(data, upsampled_region_size, upsample_factor, axis_offsets):
    """Upsampled DFT of a 2-d complex array over a small region, computed by
    matrix multiplication (no zero-padding)."""
    ny, nx = data.shape
    urs = upsampled_region_size
    im2pi = 1j * 2 * jnp.pi

    # operate over the last axis first, then the first (matches skimage)
    for n_items, ax_offset_idx in ((nx, 1), (ny, 0)):
        offset = axis_offsets[ax_offset_idx]
        kernel = ((jnp.arange(urs) - offset)[:, None]
                  * jnp.fft.fftfreq(n_items, upsample_factor))
        kernel = jnp.exp(-im2pi * kernel)
        data = jnp.tensordot(kernel, data, axes=(1, -1))
    return data


@functools.partial(jax.jit, static_argnames=("upsample_factor",))
def dft_registration(ref_freq, target_freq, upsample_factor=1):
    """Shift (dy, dx) that registers ``target`` to ``ref`` given their FFTs.

    Coarse pixel peak from the cross-correlation, refined on a
    ``1.5×upsample_factor`` grid around it.
    """
    shape = ref_freq.shape
    image_product = ref_freq * jnp.conj(target_freq)
    cc = jnp.fft.ifft2(image_product)
    amax = jnp.argmax(jnp.abs(cc))
    maxima = jnp.stack(jnp.unravel_index(amax, shape)).astype(jnp.float64
                                                              if cc.real.dtype == jnp.float64 else jnp.float32)
    midpoints = jnp.array([jnp.trunc(s / 2) for s in shape],
                          dtype=maxima.dtype)
    shifts = jnp.where(maxima > midpoints,
                       maxima - jnp.array(shape, dtype=maxima.dtype), maxima)

    if upsample_factor > 1:
        import math

        u = float(upsample_factor)
        urs = int(math.ceil(u * 1.5))
        dftshift = jnp.trunc(urs / 2.0)
        shifts = jnp.round(shifts * u) / u
        sample_region_offset = dftshift - shifts * u
        data = upsampled_dft(jnp.conj(image_product), urs, u,
                             sample_region_offset)
        data = jnp.conj(data)
        amax2 = jnp.argmax(jnp.abs(data))
        maxima2 = jnp.stack(jnp.unravel_index(amax2, data.shape)).astype(
            shifts.dtype) - dftshift
        shifts = shifts + maxima2 / u
    return shifts


def dft_registration_batch(ref, cube, upsample_factor=1):
    """Register every frame of ``cube`` to ``ref``; returns (n, 2) shifts."""
    ref_freq = jnp.fft.fft2(ref)
    freqs = jnp.fft.fft2(cube, axes=(-2, -1))
    return jax.vmap(lambda tf: dft_registration(ref_freq, tf,
                                                upsample_factor))(freqs)


def masked_register_translation(reference_image, moving_image,
                                reference_mask, moving_mask=None,
                                overlap_ratio=0.3):
    """Masked translation registration (Padfield 2012), equivalent to
    skimage phase_cross_correlation with ``reference_mask`` — integer-pixel
    shifts from masked normalized cross-correlation, computed with
    device FFTs. Returns (dy, dx) to apply to ``moving_image``.

    Used by cube_recenter_dft_upsampling when a mask is provided
    (reference recentering.py:1385-1409).
    """
    ref = jnp.asarray(reference_image, dtype=float)
    mov = jnp.asarray(moving_image, dtype=float)
    m1 = jnp.asarray(reference_mask, dtype=float)
    m2 = m1 if moving_mask is None else jnp.asarray(moving_mask, dtype=float)

    fixed = ref * m1
    moving = mov * m2
    rot_moving = moving[::-1, ::-1]
    rot_m2 = m2[::-1, ::-1]

    fshape = tuple(2 * s - 1 for s in ref.shape)

    def F(x):
        return jnp.fft.fft2(x, fshape)

    def IF(x):
        return jnp.fft.ifft2(x).real

    eps = jnp.finfo(float).eps
    fixed_fft = F(fixed)
    rot_moving_fft = F(rot_moving)
    m1_fft = F(m1)
    rot_m2_fft = F(rot_m2)

    n_overlap = IF(rot_m2_fft * m1_fft)
    n_overlap = jnp.maximum(n_overlap, eps)
    corr_fixed = IF(rot_m2_fft * fixed_fft)
    corr_moving = IF(m1_fft * rot_moving_fft)
    numerator = IF(rot_moving_fft * fixed_fft) \
        - corr_fixed * corr_moving / n_overlap

    fixed_den = IF(rot_m2_fft * F(fixed * fixed)) \
        - corr_fixed**2 / n_overlap
    moving_den = IF(m1_fft * F(rot_moving * rot_moving)) \
        - corr_moving**2 / n_overlap
    denom = jnp.sqrt(jnp.maximum(fixed_den, 0) * jnp.maximum(moving_den, 0))

    tol = 1e3 * eps * jnp.max(jnp.abs(denom))
    xcorr = jnp.where(denom > tol, jnp.clip(numerator / jnp.maximum(
        denom, tol), -1, 1), 0.0)

    keep = n_overlap > overlap_ratio * jnp.max(n_overlap)
    xcorr = jnp.where(keep, xcorr, 0.0)

    amax = jnp.argmax(xcorr)
    idx = jnp.stack(jnp.unravel_index(amax, xcorr.shape))
    shifts = idx - (jnp.asarray(ref.shape) - 1)
    import numpy as _np
    return _np.asarray(shifts, dtype=float)
