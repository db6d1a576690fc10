"""Batched interpolation-based image rotation on device.

This is the TPU-native speed-mode rotation — the analog of the reference's
OpenCV path (reference README.rst:183 advertises interpolation rotation as
"up to a factor 50" faster than the exact FFT rotation, at the cost of
strict flux preservation; reference derotation.py:279-311). All frames
rotate in ONE jitted gather program: per-output-pixel source coordinates
from the inverse rotation about the frame center, then bilinear (4-tap) or
bicubic (16-tap, cv2 INTER_CUBIC a=-0.75 kernel) sampling with
constant-zero borders.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import jit, lax, vmap

__all__ = ["rotate_interp_batch", "rotate_interp"]


def _source_coords(shape, angle_deg):
    """Inverse-rotation sampling grid about the vip frame center
    (even size -> d/2, odd -> (d-1)/2), cv2.getRotationMatrix2D
    convention: positive angle rotates the image counterclockwise."""
    ny, nx = shape
    cy = ny / 2 if ny % 2 == 0 else (ny - 1) / 2
    cx = nx / 2 if nx % 2 == 0 else (nx - 1) / 2
    # negative sign matches cv2.getRotationMatrix2D / frame_rotate(opencv):
    # positive angle rotates the image counterclockwise in array coords
    theta = -jnp.deg2rad(angle_deg)
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    yy, xx = jnp.mgrid[0:ny, 0:nx]
    x0 = xx - cx
    y0 = yy - cy
    # dst(x, y) = src(cos·x + sin·y, -sin·x + cos·y) about the center
    xs = cos_t * x0 + sin_t * y0 + cx
    ys = -sin_t * x0 + cos_t * y0 + cy
    return ys, xs


def _sample_bilinear(img, ys, xs):
    ny, nx = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(dy, dx):
        yi = y0i + dy
        xi = x0i + dx
        valid = (yi >= 0) & (yi < ny) & (xi >= 0) & (xi < nx)
        v = img[jnp.clip(yi, 0, ny - 1), jnp.clip(xi, 0, nx - 1)]
        return jnp.where(valid, v, 0.0)

    return ((1 - wy) * (1 - wx) * tap(0, 0) + (1 - wy) * wx * tap(0, 1)
            + wy * (1 - wx) * tap(1, 0) + wy * wx * tap(1, 1))


def _cubic_weights(t):
    """Cubic convolution weights for offsets (-1, 0, 1, 2) given
    fractional position t in [0, 1); a = -0.75 matches cv2 INTER_CUBIC."""
    a = -0.75
    t2 = t * t
    t3 = t2 * t
    w_m1 = a * (t3 - 2 * t2 + t)
    w_0 = (a + 2) * t3 - (a + 3) * t2 + 1
    w_1 = -(a + 2) * t3 + (2 * a + 3) * t2 - a * t
    w_2 = a * (t2 - t3)
    return w_m1, w_0, w_1, w_2


def _sample_bicubic(img, ys, xs):
    ny, nx = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ty = ys - y0
    tx = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    wys = _cubic_weights(ty)
    wxs = _cubic_weights(tx)

    out = jnp.zeros_like(ys, dtype=img.dtype)
    for iy, wy in zip((-1, 0, 1, 2), wys):
        row = jnp.zeros_like(ys, dtype=img.dtype)
        yi = y0i + iy
        yvalid = (yi >= 0) & (yi < ny)
        yc = jnp.clip(yi, 0, ny - 1)
        for ix, wx in zip((-1, 0, 1, 2), wxs):
            xi = x0i + ix
            valid = yvalid & (xi >= 0) & (xi < nx)
            v = img[yc, jnp.clip(xi, 0, nx - 1)]
            row = row + wx * jnp.where(valid, v, 0.0)
        out = out + wy * row
    return out


@partial(jit, static_argnames=("mode",))
def rotate_interp_batch(cube, angles, mode="bicubic"):
    """Rotate every frame of ``cube`` by its own angle (degrees, CCW) in
    one fused gather program. ``mode``: 'bilinear' or 'bicubic'."""
    cube = jnp.asarray(cube)
    angles = jnp.asarray(angles, dtype=cube.dtype)
    shape = cube.shape[-2:]
    sampler = _sample_bilinear if mode == "bilinear" else _sample_bicubic

    def one(img, ang):
        ys, xs = _source_coords(shape, ang)
        return sampler(img, ys, xs)

    return vmap(one)(cube, angles)


def rotate_interp(frame, angle, mode="bicubic"):
    """Rotate a single frame by ``angle`` degrees (CCW) on device."""
    return rotate_interp_batch(jnp.asarray(frame)[None],
                               jnp.asarray([angle]), mode=mode)[0]
