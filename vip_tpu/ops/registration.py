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
    midpoints = jnp.array([jnp.fix(s / 2) for s in shape],
                          dtype=maxima.dtype)
    shifts = jnp.where(maxima > midpoints,
                       maxima - jnp.array(shape, dtype=maxima.dtype), maxima)

    if upsample_factor > 1:
        import math

        u = float(upsample_factor)
        urs = int(math.ceil(u * 1.5))
        dftshift = jnp.fix(urs / 2.0)
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
