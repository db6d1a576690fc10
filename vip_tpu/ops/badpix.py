"""Device bad-pixel kernels: sigma filter + neighbour sigma clipping.

Replaces the reference's numba kernels (vip_hci/stats/clip_sigma.py:24-192
``_sigma_filter_numba`` and :194-387 ``clip_array``) with jitted, vmappable
JAX fixed-point/window programs. The reference's per-bad-pixel loop is
iteration-synchronous — the good-pixel map ``gp`` is frozen at the start of
each ``while nb > 0`` sweep and only bad pixels are written — so one sweep
is a fully parallel masked windowed median, and the whole filter is a
``lax.while_loop`` fixed point.

Window semantics (exact reference parity): the box around a pixel is always
shifted *inward* at the edges so its size never shrinks (reference
clip_sigma.py:93-100). For a window of width ``w`` (half ``h``) the row
window start is ``clip(y - h, 0, ny - w)``. Those shifted windows are built
here from pure XLA slices + concats (no gather): the index vector
``clip(arange(n) - h + d, d, n - w + d)`` for window offset ``d`` is
``[d]*h ++ [d .. n-w+d] ++ [n-w+d]*(w-1-h)``, i.e. three contiguous slices.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sigma_filter_device", "cube_sigma_filter_device",
           "clip_neighbor_device", "median_filter_device"]


def _shiftw(a, d, h, w, axis):
    """Rows/cols of ``a`` at index ``clip(arange(n) - h + d, d, n - w + d)``
    along ``axis``, built from slices (see module docstring)."""
    n = a.shape[axis]
    sl = functools.partial(jax.lax.slice_in_dim, a, axis=axis)
    parts = []
    if h > 0:
        parts.append(jnp.repeat(sl(d, d + 1), h, axis=axis))
    parts.append(sl(d, n - w + d + 1))
    if w - 1 - h > 0:
        parts.append(jnp.repeat(sl(n - w + d, n - w + d + 1), w - 1 - h,
                                axis=axis))
    return jnp.concatenate(parts, axis=axis) if len(parts) > 1 else parts[0]


def _windows(a, hy, hx):
    """[ny, nx, wy*wx] view of the inward-shifted (wy, wx) window around
    every pixel (wy = 2*hy + 1, wx = 2*hx + 1)."""
    wy, wx = 2 * hy + 1, 2 * hx + 1
    chans = []
    for dy in range(wy):
        row = _shiftw(a, dy, hy, wy, axis=0)
        for dx in range(wx):
            chans.append(_shiftw(row, dx, hx, wx, axis=1))
    return jnp.stack(chans, axis=-1)


def _window_index_vectors(n, h, w):
    """1-D absolute index vectors idx[d][i] of the window member at offset
    ``d`` for a pixel at position ``i`` (host-side, static)."""
    ar = np.arange(n)
    return [np.clip(ar - h + d, d, n - w + d) for d in range(w)]


def _masked_median(vals, good, k):
    """np.median over ``vals[good]`` per pixel; NaN when k == 0.

    ``vals``: [..., W]; ``good``: bool [..., W]; ``k``: int [...] count.
    """
    big = jnp.array(jnp.finfo(vals.dtype).max, vals.dtype)
    svals = jnp.sort(jnp.where(good, vals, big), axis=-1)
    ilo = jnp.clip((k - 1) // 2, 0, svals.shape[-1] - 1)
    ihi = jnp.clip(k // 2, 0, svals.shape[-1] - 1)
    lo = jnp.take_along_axis(svals, ilo[..., None], axis=-1)[..., 0]
    hi = jnp.take_along_axis(svals, ihi[..., None], axis=-1)[..., 0]
    med = 0.5 * (lo + hi)
    return jnp.where(k > 0, med, jnp.nan)


@functools.partial(jax.jit, static_argnames=("min_neighbors",))
def sigma_filter_device(frame, bpix_map, min_neighbors=3):
    """Fixed-point 3x3 masked-median bad-pixel replacement.

    Parity with reference clip_sigma.py:24-192 (which forces
    neighbor_box=3 / min_neighbors=3 at :187-191, so the window is always
    an inward-shifted 3x3). Returns (corrected_frame, n_iterations).
    Terminates when no bad pixels remain OR a sweep makes no progress (the
    reference would loop forever in that case).
    """
    im0 = jnp.asarray(frame)
    if not jnp.issubdtype(im0.dtype, jnp.floating):
        im0 = im0.astype(jnp.float32)   # raw integer detector frames
    bp0 = jnp.asarray(bpix_map, dtype=jnp.int32)
    ny, nx = im0.shape
    # worst case erodes one ring of a frame-sized clump per sweep
    max_it = (max(ny, nx) + 1) // 2 + 2

    def sweep(im, bp):
        gp = bp == 0
        wim = _windows(im, 1, 1)
        wgp = _windows(gp, 1, 1)
        k = jnp.sum(wgp, axis=-1, dtype=jnp.int32)
        med = _masked_median(wim, wgp, k)
        can_fix = (bp > 0) & (k >= min_neighbors)
        return jnp.where(can_fix, med, im), jnp.where(can_fix, 0, bp)

    def wl_body(state):
        im, bp, nit, _ = state
        prev_nb = jnp.sum(bp)
        im, bp = sweep(im, bp)
        return im, bp, nit + 1, jnp.sum(bp) < prev_nb

    def wl_cond(state):
        im, bp, nit, progressed = state
        return (jnp.sum(bp) > 0) & progressed & (nit < max_it)

    im, bp, nit, _ = jax.lax.while_loop(
        wl_cond, wl_body, (im0, bp0, jnp.int32(0), jnp.bool_(True)))
    return im, nit


@functools.partial(jax.jit, static_argnames=("min_neighbors",))
def cube_sigma_filter_device(cube, bpix_maps, min_neighbors=3):
    """vmapped :func:`sigma_filter_device` over the frame axis."""
    cube = jnp.asarray(cube)
    if not jnp.issubdtype(cube.dtype, jnp.floating):
        cube = cube.astype(jnp.float32)
    fn = jax.vmap(lambda f, b: sigma_filter_device(f, b, min_neighbors))
    return fn(cube, jnp.asarray(bpix_maps, dtype=jnp.int32))


@functools.partial(jax.jit, static_argnames=("size",))
def median_filter_device(frames, size):
    """``scipy.ndimage.median_filter(x, size, mode="mirror")`` on device,
    batched over any leading axes.

    Mirror mode is reflection about the edge pixel (numpy 'reflect'); the
    window has an odd element count so the median is a single order
    statistic — exact parity with scipy's selection for floats. Used by the
    isolated bad-pixel correction (reference badpixremoval.py:160-180).
    """
    h = size // 2
    ny, nx = frames.shape[-2:]
    pad_width = [(0, 0)] * (frames.ndim - 2) + [(h, h), (h, h)]
    p = jnp.pad(frames, pad_width, mode="reflect")
    chans = []
    for dy in range(size):
        rows = jax.lax.slice_in_dim(p, dy, dy + ny, axis=frames.ndim - 2)
        for dx in range(size):
            chans.append(jax.lax.slice_in_dim(rows, dx, dx + nx,
                                              axis=frames.ndim - 1))
    s = jnp.sort(jnp.stack(chans, axis=-1), axis=-1)
    return s[..., (size * size) // 2]


@functools.partial(jax.jit,
                   static_argnames=("hy", "hx", "mad", "has_min_std"))
def clip_neighbor_device(array, gpm_ori, lower_sigma, upper_sigma, hy, hx,
                         mad=False, has_min_std=False, min_std=0.0):
    """Vectorized neighbour branch of reference clip_sigma.py:194-387.

    For every originally-good pixel, compares its value against the
    median +/- sigma of the good pixels in its inward-shifted window,
    excluding one occurrence of the pixel's own value (the reference's
    "remove itself once" scan removes the *first* value equal to the
    centre, which is multiset-equivalent to removing the centre itself).
    Returns the bad-pixel map (bool), with originally-bad pixels True.
    """
    a = jnp.asarray(array)
    if not jnp.issubdtype(a.dtype, jnp.floating):
        a = a.astype(jnp.float32)
    gpm = jnp.asarray(gpm_ori, dtype=bool)
    ny, nx = a.shape
    wy, wx = 2 * hy + 1, 2 * hx + 1

    wim = _windows(a, hy, hx)
    wgp = _windows(gpm, hy, hx)

    # centre-exclusion mask: window channel (dy, dx) of pixel (y, x) is the
    # centre iff its absolute coords equal (y, x)
    iys = _window_index_vectors(ny, hy, wy)
    ixs = _window_index_vectors(nx, hx, wx)
    ar_y = np.arange(ny)
    ar_x = np.arange(nx)
    cen_chans = []
    for dy in range(wy):
        cy = iys[dy] == ar_y  # [ny]
        for dx in range(wx):
            cx = ixs[dx] == ar_x  # [nx]
            cen_chans.append(np.logical_and.outer(cy, cx))
    center = jnp.asarray(np.stack(cen_chans, axis=-1))  # [ny, nx, W]

    good = wgp & ~center
    k = jnp.sum(good, axis=-1, dtype=jnp.int32)
    med = _masked_median(wim, good, k)

    if mad:
        sigma = _masked_median(jnp.abs(med[..., None] - wim), good, k)
    else:
        gf = good.astype(a.dtype)
        kf = jnp.maximum(k, 1).astype(a.dtype)
        mean = jnp.sum(wim * gf, axis=-1) / kf
        var = jnp.sum((wim - mean[..., None]) ** 2 * gf, axis=-1) / kf
        sigma = jnp.sqrt(var)
        sigma = jnp.where(k > 0, sigma, jnp.nan)
    if has_min_std:
        sigma = jnp.maximum(sigma, min_std)

    bad = (a < (med - lower_sigma * sigma)) | \
          (a > (med + upper_sigma * sigma))
    return jnp.where(gpm, bad, True)
