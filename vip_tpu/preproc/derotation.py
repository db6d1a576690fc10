"""Frame/cube derotation.

TPU-native rebuild of vip_hci/preproc/derotation.py. The default
('vip-fft') path reproduces the reference's FFT 3-shear rotation with its
1.5x + 4x zero-padding pipeline (derotation.py:129-217) bit-for-bit in
float64, but executes the whole cube as ONE batched, jit-compiled XLA
computation (chunked to bound HBM) instead of a fork pool per frame
(derotation.py:394-397). An 'opencv' host path is kept for the reference's
speed-mode API parity.

The PA-threshold library-selection helpers (`_find_indices_adi`,
`_compute_pa_thresh`, `_define_annuli`: derotation.py:410-539) are
host-side control logic reproduced on numpy — their outputs become *static*
gather indices/masks for the batched annular algorithms.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config.utils_conf import check_array
from ..ops.fft import rotate_fft
from ..var.coords import frame_center

__all__ = ["cube_derotate", "frame_rotate", "rotate_fft_pipeline",
           "rotate_fft_pruned_batch"]

# complex arithmetic must run under jit on the TPU backend
_rotate_fft_jit = jax.jit(rotate_fft)


# ---------------------------------------------------------------------------
# geometry of the vip-fft padding pipeline (all static Python ints)
# ---------------------------------------------------------------------------
def _prepad_placement(y_ori, x_ori, fac=1.5):
    """Dims of the intermediate ~1.5x parity-preserving canvas and the
    slice where the original frame sits (derotation.py:150-183)."""
    cy_ori = int(y_ori / 2 - 0.5) if y_ori % 2 else int(y_ori / 2)
    cx_ori = int(x_ori / 2 - 0.5) if x_ori % 2 else int(x_ori / 2)
    new_y = int(y_ori * fac)
    new_x = int(x_ori * fac)
    if y_ori % 2 != new_y % 2:
        new_y += 1
    if x_ori % 2 != new_x % 2:
        new_x += 1
    cy = int(new_y / 2 - 0.5) if new_y % 2 else int(new_y / 2)
    cx = int(new_x / 2 - 0.5) if new_x % 2 else int(new_x / 2)
    y0_p = int(cy - cy_ori)
    y1_p = int(cy + cy_ori)
    if new_y % 2:
        y1_p += 1
    x0_p = int(cx - cx_ori)
    x1_p = int(cx + cx_ori)
    if new_x % 2:
        x1_p += 1
    return new_y, new_x, y0_p, y1_p, x0_p, x1_p


def _fft_rotate_geometry(y_ori, x_ori):
    """Replicate frame_rotate's pad geometry (derotation.py:150-217).

    Returns (canvas_y, canvas_x, place_y0, place_x0, crop_y0, crop_y1,
    crop_x0, crop_x1) where canvas is the final ~4x zero-padded frame fed to
    ``rotate_fft`` and crop recovers the original frame.
    """
    fac = 1.5
    new_y, new_x, y0_p, y1_p, x0_p, x1_p = _prepad_placement(y_ori, x_ori,
                                                             fac)
    cy = int(new_y / 2 - 0.5) if new_y % 2 else int(new_y / 2)
    cx = int(new_x / 2 - 0.5) if new_x % 2 else int(new_x / 2)

    # frame_pad(fac=4/1.5, keep_parity=True) — cosmetics.py:158-238
    fac2 = 4 / fac
    pad_y = int(round(new_y * fac2))
    pad_x = int(round(new_x * fac2))
    if pad_y % 2 != new_y % 2:
        pad_y -= 1
    if pad_x % 2 != new_x % 2:
        pad_x -= 1
    cyp = int(pad_y / 2 - 0.5) if pad_y % 2 else int(pad_y / 2)
    cxp = int(pad_x / 2 - 0.5) if pad_x % 2 else int(pad_x / 2)
    py0 = int(cyp - cy)
    py1 = int(cyp + cy)
    if py1 - py0 < new_y:
        py1 += 1
    elif py1 - py0 > new_y:
        py1 -= 1
    px0 = int(cxp - cx)
    px1 = int(cxp + cx)
    if px1 - px0 < new_x:
        px1 += 1
    elif px1 - px0 > new_x:
        px1 -= 1

    place_y0 = py0 + y0_p
    place_x0 = px0 + x0_p
    crop_y0 = py0 + y0_p
    crop_y1 = py0 + y1_p
    crop_x0 = px0 + x0_p
    crop_x1 = px0 + x1_p
    return pad_y, pad_x, place_y0, place_x0, crop_y0, crop_y1, crop_x0, crop_x1


def rotate_fft_pipeline(frame, angle):
    """Jittable single-frame rotation with the reference's full padding
    pipeline (pad ~4x → 3-shear FFT rotate → crop). ``angle`` may be traced.

    ``frame`` must be square (the standard high-contrast-imaging case).
    """
    y_ori, x_ori = frame.shape
    if y_ori != x_ori:
        raise ValueError("vip-fft rotation requires square frames")
    (pad_y, pad_x, place_y0, place_x0,
     cy0, cy1, cx0, cx1) = _fft_rotate_geometry(y_ori, x_ori)

    canvas = jnp.zeros((pad_y, pad_x), frame.dtype)
    canvas = canvas.at[place_y0:place_y0 + y_ori,
                       place_x0:place_x0 + x_ori].set(frame)
    rotated = rotate_fft(canvas, angle)
    return rotated[cy0:cy1, cx0:cx1]


# jitted: eager complex arithmetic is unimplemented on the TPU backend
_rotate_fft_pipeline_jit = jax.jit(rotate_fft_pipeline)


def rotate_fft_pruned_batch(cube, angles):
    """Batched pad -> 3-shear rotate -> crop with support pruning:
    fp-identical to ``vmap(rotate_fft_pipeline)`` (<=1e-14) at roughly
    half the FFT work (the two x-shears run only on the occupied/cropped
    row slabs — ops.fft.rotate_fft_exact_pruned, which also handles the
    odd-canvas geometry of odd frames)."""
    from ..ops.fft import rotate_fft_exact_pruned

    y, x = cube.shape[-2:]
    pad_y, pad_x, py0, px0, cy0, cy1, cx0, cx1 = _fft_rotate_geometry(y, x)
    return rotate_fft_exact_pruned(cube, angles, pad_y, py0, px0,
                                   cy0, cy1, cx0, cx1)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _cube_rotate_fft(cube, angles, chunk):
    if cube.shape[-2] != cube.shape[-1]:
        if chunk is None or chunk >= cube.shape[0]:
            return jax.vmap(rotate_fft_pipeline)(cube, angles)
        return jax.lax.map(lambda fa: rotate_fft_pipeline(*fa),
                           (cube, angles), batch_size=chunk)
    if chunk is None or chunk >= cube.shape[0]:
        return rotate_fft_pruned_batch(cube, angles)
    n = cube.shape[0]
    nch = -(-n // chunk)
    pad_n = nch * chunk - n
    cube_p = jnp.pad(cube, ((0, pad_n), (0, 0), (0, 0)))
    ang_p = jnp.pad(angles, (0, pad_n))
    out = jax.lax.map(
        lambda fa: rotate_fft_pruned_batch(fa[0], fa[1]),
        (cube_p.reshape(nch, chunk, *cube.shape[1:]),
         ang_p.reshape(nch, chunk)))
    return out.reshape(nch * chunk, *cube.shape[1:])[:n]


def _auto_chunk(n, y, itemsize, budget_bytes=2 << 30):
    """Pick a frame-chunk size keeping the padded complex FFT working set
    under ``budget_bytes`` (HBM guard for big cubes: 512² frames pad to
    2048² complex)."""
    per_frame = (4 * y) ** 2 * itemsize * 2 * 6  # complex + fft scratch
    return int(max(1, min(n, budget_bytes // max(per_frame, 1))))


def frame_rotate(array, angle, imlib="vip-fft", interpolation="lanczos4",
                 cxy=None, border_mode="constant", mask_val=np.nan,
                 edge_blend=None, interp_zeros=False, ker=1):
    """Rotate a 2-d frame by ``angle`` degrees counter-clockwise.

    numpy-in / numpy-out API parity with reference frame_rotate
    (derotation.py:51-328). 'vip-fft' runs the batched device kernel;
    'opencv' runs host cv2 (speed mode on CPU).
    """
    array = np.asarray(array)
    if array.ndim != 2:
        raise TypeError("Input array is not a frame or 2d array")

    if imlib == "vip-fft":
        if cxy is not None and tuple(cxy)[::-1] != frame_center(array):
            raise ValueError("'vip-fft' imlib does not allow custom centers")
        mask_ori = ~np.isfinite(array) if np.isnan(mask_val) \
            else (array == mask_val)
        if edge_blend:
            frame_nan = np.asarray(array, dtype=float).copy()
            frame_nan[mask_ori] = np.nan
            if interp_zeros:
                frame_nan[frame_nan == 0] = np.nan
            out = _rotate_fft_blended(frame_nan, angle, edge_blend, ker)
        else:
            work = np.nan_to_num(array, copy=True)
            out = np.array(_rotate_fft_pipeline_jit(jnp.asarray(work),
                                                    angle))
        if mask_ori.any():
            out[mask_ori] = mask_val
        return out
    elif imlib in ("opencv", "skimage"):
        # 'skimage' is served by cv2 with the matching interpolation order
        # (linear interpolation is normalization-invariant, so the
        # reference's rescale-to-[0,1] step is a mathematical no-op)
        import cv2

        y, x = array.shape
        if cxy is None:
            cy, cx = frame_center(array)
        else:
            cx, cy = cxy
        intp = {"bilinear": cv2.INTER_LINEAR, "bicubic": cv2.INTER_CUBIC,
                "nearneig": cv2.INTER_NEAREST, "biquadratic": cv2.INTER_CUBIC,
                "biquartic": cv2.INTER_LANCZOS4,
                "biquintic": cv2.INTER_LANCZOS4,
                "lanczos4": cv2.INTER_LANCZOS4}[interpolation]
        bormo = {"constant": cv2.BORDER_CONSTANT, "edge": cv2.BORDER_REPLICATE,
                 "symmetric": cv2.BORDER_REFLECT,
                 "reflect": cv2.BORDER_REFLECT_101,
                 "wrap": cv2.BORDER_WRAP}[border_mode]
        M = cv2.getRotationMatrix2D((cx, cy), angle, 1)
        # reference casts to float32 for its opencv speed path
        # (derotation.py:310); real skimage computes in float64
        dt = np.float32 if imlib == "opencv" else np.float64
        return cv2.warpAffine(array.astype(dt), M, (x, y), flags=intp,
                              borderMode=bormo)
    else:
        raise ValueError(f"imlib {imlib!r} not supported (use 'vip-fft' or "
                         "'opencv')")


def _background_med_std(values, sigma=1.5, max_iter=5):
    """Median/std of the finite values after iterative sigma clipping about
    the median (the stats the reference draws its noise prepad from)."""
    vals = np.asarray(values, dtype=float).ravel()
    vals = vals[np.isfinite(vals)]
    for _ in range(max_iter):
        med = np.median(vals)
        std = np.std(vals)
        keep = np.abs(vals - med) < sigma * std
        if keep.all() or not keep.any():
            break
        vals = vals[keep]
    return float(np.median(vals)), float(np.std(vals))


def _edge_blend_canvas(frame_nan, mode, ker):
    """Build the ~1.5x Gibbs-mitigation canvas (derotation.py:129-205).

    ``frame_nan`` carries NaN at every invalid pixel. ``mode`` may contain
    'noise' (fill the pad ring with sigma-clipped background noise) and/or
    'interp' (extend the frame smoothly into the ring with a NaN-aware
    gaussian convolution); combined, the smooth halo rides on zero-mean
    noise. Returns the canvas plus the slice of the original frame.
    """
    y_ori, x_ori = frame_nan.shape
    new_y, new_x, y0, y1, x0, x1 = _prepad_placement(y_ori, x_ori)
    holes = ~np.isfinite(frame_nan)

    with_noise = "noise" in mode
    with_interp = "interp" in mode

    if with_noise:
        med, std = _background_med_std(frame_nan)
        level = 0.0 if with_interp else med
        canvas = np.random.normal(loc=level, scale=std, size=(new_y, new_x))
    else:
        canvas = np.zeros((new_y, new_x))
    interior = canvas[y0:y1, x0:x1]
    canvas[y0:y1, x0:x1] = np.where(holes, interior, frame_nan)

    if with_interp:
        sparse = np.full((new_y, new_x), np.nan)
        sparse[y0:y1, x0:x1] = frame_nan
        halo_fwhm = ker if ker else y_ori / 5
        halo, covered = _masked_gauss_smooth(sparse, halo_fwhm)
        ring = np.ones((new_y, new_x), dtype=bool)
        ring[y0:y1, x0:x1] = False
        if with_noise:
            local, local_cov = _masked_gauss_smooth(sparse, 1)
            hole_canvas = np.zeros_like(canvas, dtype=bool)
            hole_canvas[y0:y1, x0:x1] = holes
            canvas[hole_canvas] = np.where(local_cov[hole_canvas],
                                           local[hole_canvas], 0.0)
            # beyond the kernel's reach the reference ends at 0 (its NaNs
            # survive the add and get zeroed), not bare noise
            canvas[ring] = np.where(covered[ring],
                                    canvas[ring] + halo[ring], 0.0)
        else:
            fill = ring.copy()
            fill[y0:y1, x0:x1] = holes
            canvas[fill] = np.where(covered[fill], halo[fill], 0.0)
    canvas[~np.isfinite(canvas)] = 0.0
    return canvas, (y0, x0)


def _masked_gauss_smooth(sparse, fwhm):
    """NaN-aware gaussian smoothing with an explicit coverage map: returns
    (smooth, covered) where ``covered`` is False wherever the valid pixels
    contribute negligible kernel weight (the finite-support kernel of the
    reference's astropy convolution would leave NaN there)."""
    from ..var.filters import (GAUSSIAN_FWHM_TO_SIGMA, _fft_convolve_same,
                               gaussian_kernel_2d)

    sigma = fwhm * GAUSSIAN_FWHM_TO_SIGMA
    kernel = jnp.asarray(np.asarray(gaussian_kernel_2d(sigma, sigma)))
    finite = np.isfinite(sparse)
    conv = jax.jit(_fft_convolve_same)
    num = np.asarray(conv(jnp.asarray(np.where(finite, sparse, 0.0)), kernel))
    den = np.asarray(conv(jnp.asarray(finite.astype(float)), kernel))
    covered = den > 1e-8
    smooth = np.where(covered, num / np.where(covered, den, 1.0), 0.0)
    return smooth, covered


def _rotate_fft_blended(frame_nan, angle, mode, ker):
    """Host-path rotation with the noise/interp prepad: build the blended
    1.5x canvas, embed it in the 4x zero canvas, 3-shear rotate, crop."""
    y_ori, x_ori = frame_nan.shape
    canvas, (y0, x0) = _edge_blend_canvas(frame_nan, mode, ker)
    (pad_y, pad_x, place_y0, place_x0,
     cy0, cy1, cx0, cx1) = _fft_rotate_geometry(y_ori, x_ori)
    big = np.zeros((pad_y, pad_x))
    by0 = place_y0 - y0
    bx0 = place_x0 - x0
    big[by0:by0 + canvas.shape[0], bx0:bx0 + canvas.shape[1]] = canvas
    out = np.array(_rotate_fft_jit(jnp.asarray(big), angle))
    return out[cy0:cy1, cx0:cx1]


@functools.partial(jax.jit, static_argnames=("chunk",))
def _derotate_small_jit(cube, angle_list, chunk):
    """Jitted wrapper for the packed fft-small speed mode (eager complex
    arithmetic is unimplemented on the TPU backend, so the whole rotation
    must run as one compiled program)."""
    from ..ops.pipeline import _derotate_frames

    return _derotate_frames(cube, angle_list, chunk=chunk,
                            rot_mode="fft-small")


def cube_derotate(array, angle_list, imlib="vip-fft",
                  interpolation="lanczos4", cxy=None, nproc=1,
                  border_mode="constant", mask_val=np.nan, edge_blend=None,
                  interp_zeros=False, ker=1, chunk="auto"):
    """Derotate an ADI cube: frame i is rotated by ``-angle_list[i]``.

    The 'vip-fft' path derotates the whole cube as one jitted, vmapped XLA
    computation (replacing the reference's pool_map at derotation.py:394);
    ``chunk`` bounds the number of frames whose 4x-padded FFTs are in
    flight at once ('auto' sizes from the frame dims). ``nproc`` is accepted
    for API parity and ignored.
    """
    array = np.asarray(array) if isinstance(array, np.ndarray) else array
    n = array.shape[0]
    angle_list = np.asarray(angle_list, dtype=np.result_type(array.dtype,
                                                             np.float32))
    if angle_list.ndim == 0:
        angle_list = np.full(n, float(angle_list))
    if angle_list.shape[0] != n:
        raise ValueError("angle_list length must match the cube")

    if imlib == "vip-fft-small" and (array.shape[-1] % 2 != 0
                                     or array.shape[-2] != array.shape[-1]):
        imlib = "vip-fft"  # speed mode needs even square frames

    if imlib in ("vip-fft", "vip-fft-small") \
            and isinstance(array, jax.Array) \
            and not isinstance(array, np.ndarray):
        # device-resident fast path: when the cube is already a device
        # array (e.g. PCA residuals straight from the projection), keep it
        # there — a numpy round-trip costs two cube-sized host<->device
        # transfers. Masked (non-finite / mask_val) cubes fall back to the
        # host path below for the reference's mask bookkeeping.
        dev = jnp.asarray(array, dtype=jnp.result_type(array.dtype,
                                                       jnp.float32))
        if np.isnan(mask_val):
            clean = bool(jnp.isfinite(dev).all())
        else:
            clean = not bool(jnp.any(dev == mask_val))
        if clean:
            angs = jnp.asarray(angle_list, dev.dtype)
            if imlib == "vip-fft":
                if chunk == "auto":
                    chunk = _auto_chunk(n, array.shape[-1],
                                        dev.dtype.itemsize)
                return _cube_rotate_fft(dev, -angs, chunk)
            if chunk == "auto":
                chunk = min(n, max(1, 4 * _auto_chunk(
                    n, array.shape[-1], dev.dtype.itemsize)))
            return _derotate_small_jit(dev, angs, chunk)
        array = np.asarray(array)

    if imlib == "vip-fft":
        if chunk == "auto":
            chunk = _auto_chunk(n, array.shape[-1], array.dtype.itemsize)
        work = np.asarray(array, dtype=float)
        # mask handling parity with frame_rotate (derotation.py:130-145,
        # 326-328): masked values rotate as zeros and are reset afterwards.
        if np.isnan(mask_val):
            mask = ~np.isfinite(work)
        else:
            mask = work == mask_val
        has_mask = mask.any()
        if edge_blend:
            out = np.stack([
                frame_rotate(array[i], -angle_list[i], imlib="vip-fft",
                             mask_val=mask_val, edge_blend=edge_blend,
                             interp_zeros=interp_zeros, ker=ker)
                for i in range(n)
            ])
            return out
        if has_mask:
            work = np.where(mask, 0.0, work)
        cube = jnp.asarray(work)
        out = np.array(_cube_rotate_fft(cube, jnp.asarray(-angle_list),
                                        chunk))
        if has_mask:
            out[mask] = mask_val
        return out
    elif imlib == "vip-fft-small":
        # packed shift-free 3-shear rotation on a 1.25x canvas restricted
        # to the inscribed circular FoV (the benchmarked speed mode; see
        # ops/pipeline._derotate_frames). Trades the exact mode's 4x
        # flux-preserving canvas for ~10x throughput; pixels outside the
        # inscribed circle come back as 0. Falls through to the exact path
        # for odd/non-square frames.
        if chunk == "auto":
            chunk = min(n, max(1, 4 * _auto_chunk(n, array.shape[-1],
                                                  array.dtype.itemsize)))
        work = np.nan_to_num(np.asarray(array, dtype=float))
        return np.asarray(_derotate_small_jit(jnp.asarray(work),
                                              jnp.asarray(angle_list),
                                              chunk))
    elif imlib == "tpu-interp":
        # batched gather rotation on device — speed mode, one fused program
        from ..ops.interp_rotation import rotate_interp_batch

        mode = "bilinear" if interpolation == "bilinear" else "bicubic"
        work = np.nan_to_num(np.asarray(array, dtype=float))
        return np.asarray(rotate_interp_batch(jnp.asarray(work),
                                              jnp.asarray(-angle_list),
                                              mode=mode))
    else:
        return np.stack([
            frame_rotate(array[i], -angle_list[i], imlib=imlib,
                         interpolation=interpolation, cxy=cxy,
                         border_mode=border_mode, mask_val=mask_val,
                         edge_blend=edge_blend, interp_zeros=interp_zeros,
                         ker=ker)
            for i in range(n)
        ])


# ---------------------------------------------------------------------------
# PA-threshold library selection (host-side static control logic)
# ---------------------------------------------------------------------------
def _find_indices_adi(angle_list, frame, thr, nframes=None, out_closest=False,
                      truncate=False, max_frames=200):
    """Indices kept in the ADI reference library for ``frame`` after the PA
    threshold. Exact port of derotation.py:410-496; runs on host, producing
    static gather indices for the batched device algorithms."""
    n = angle_list.shape[0]
    # vectorized first-hit scans (the reference's python loops,
    # derotation.py:429-441, are O(n) per call — 64k calls at bench
    # scale): index_prev = first i < frame with |dPA| < thr (else
    # frame); index_foll = first k >= frame with |dPA| > thr (else n)
    dpa = np.abs(angle_list - angle_list[frame])
    below = dpa[:frame] < thr
    index_prev = int(np.argmax(below)) if below.any() else frame
    above = dpa[frame:] > thr
    index_foll = frame + int(np.argmax(above)) if above.any() else n

    if out_closest:
        return index_prev, index_foll - 1

    if nframes is not None:
        window = nframes // 2
        ind1 = max(index_prev - window, 0)
        ind2 = index_prev
        ind3 = index_foll
        ind4 = min(index_foll + window, n)
        indices = np.concatenate([np.arange(ind1, ind2),
                                  np.arange(ind3, ind4)]).astype("int32")
    else:
        indices = np.concatenate([np.arange(0, index_prev),
                                  np.arange(index_foll, n)]).astype("int32")
        if truncate:
            thr_n = min(n - 1, max_frames)
            if len(indices) > thr_n:
                all_indices = indices.astype(np.int64)
                dPA = np.abs(angle_list[all_indices] - angle_list[frame])
                sort_indices = all_indices[np.argsort(dPA)]
                good_indices = sort_indices[:thr_n]
                indices = np.sort(good_indices)
    return indices


def _compute_pa_thresh(ann_center, fwhm, delta_rot=1):
    """PA threshold [deg] for one annulus (derotation.py:499-504)."""
    return np.rad2deg(2 * np.arctan(delta_rot * fwhm / (2 * ann_center)))


def _define_annuli(angle_list, ann, n_annuli, fwhm, radius_int, annulus_width,
                   delta_rot, n_segments, verbose, strict=False):
    """Annulus geometry: (pa_threshold, inner_radius, ann_center).

    Port of derotation.py:507-539 including the mid-range PA-threshold cap.
    """
    if ann == n_annuli - 1:
        inner_radius = radius_int + (ann * annulus_width - 1)
    else:
        inner_radius = radius_int + ann * annulus_width
    ann_center = inner_radius + (annulus_width / 2)
    pa_threshold = _compute_pa_thresh(ann_center, fwhm, delta_rot)
    mid_range = np.abs(np.amax(angle_list) - np.amin(angle_list)) / 2
    if pa_threshold >= mid_range - mid_range * 0.1:
        new_pa_th = float(mid_range - mid_range * 0.1)
        if not strict:
            print("PA threshold {:.2f} is likely too big, will be set to "
                  "{:.2f}".format(pa_threshold, new_pa_th))
            pa_threshold = new_pa_th
    if verbose:
        if pa_threshold > 0:
            print("Ann {}    PA thresh: {:5.2f}    Ann center: {:3.0f}    "
                  "N segments: {} ".format(ann + 1, pa_threshold, ann_center,
                                           n_segments))
        else:
            print("Ann {}    Ann center: {:3.0f}    N segments: {} ".format(
                ann + 1, ann_center, n_segments))
    return pa_threshold, inner_radius, ann_center


def tensor_fft_shear(arr, arr_ori, c, ax):
    """One FFT shear pass of the accelerated 3-shear rotation
    (reference derotation.py:709-724, a torch.Tensor routine). Here the
    "tensor" is a device array; same fftshift-sandwich math.

    ``arr`` is the (1, y, x) working array (may be complex), ``arr_ori``
    the centered coordinate ramp along the *other* axis, ``c`` the shear
    coefficient and ``ax`` the FFT axis (1 or 2 for the batch layout)."""
    arr = jnp.asarray(np.asarray(arr))
    arr_ori = jnp.asarray(np.asarray(arr_ori))
    ax2 = 1 - (ax - 1) % 2
    freqs = jnp.fft.fftfreq(arr_ori.shape[ax2])
    sh_freqs = jnp.fft.fftshift(freqs)
    arr_u = jnp.tile(sh_freqs, (arr_ori.shape[ax - 1], 1))
    if ax == 2:
        arr_u = arr_u.T
    s_x = jnp.fft.fftshift(arr)
    s_x = jnp.fft.fft(s_x, axis=ax)
    s_x = jnp.fft.fftshift(s_x)
    s_x = jnp.exp(-2j * jnp.pi * c * arr_u * arr_ori) * s_x
    s_x = jnp.fft.fftshift(s_x)
    s_x = jnp.fft.ifft(s_x, axis=ax)
    return jnp.fft.fftshift(s_x)


def tensor_rotate_fft(tensor, angle):
    """Rotate a (1, y, x) device array by ``angle`` with the 3-shear FFT
    method (reference derotation.py:643-706, the reference's torch/GPU
    batch path). Assumes the frame is centered on (cy+0.5, cx+0.5) for
    even dims, like the reference. For batched per-frame angles prefer
    ``vip_tpu.ops.fft.rotate_fft_fast_batch``."""
    tensor = jnp.asarray(np.asarray(tensor), dtype=float)
    if tensor.ndim == 2:
        tensor = tensor[None]
    y_ori, x_ori = tensor.shape[1:]

    angle = float(angle) % 360.0
    if angle > 45:
        dangle = angle % 90
        if dangle > 45:
            dangle = -(90 - dangle)
        nangle = int(np.rint(angle / 90))
        tensor_in = jnp.rot90(tensor, nangle, axes=(1, 2))
    else:
        dangle = angle
        tensor_in = tensor

    if y_ori % 2 or x_ori % 2:
        # FFT rotation center sits at cx+0.5/cy+0.5 — crop to even dims
        tensor_in = tensor_in[:, :-1, :-1]

    a = np.tan(np.deg2rad(dangle) / 2)
    b = -np.sin(np.deg2rad(dangle))

    y_new, x_new = tensor_in.shape[1:]
    yy, xx = np.mgrid[0:y_new, 0:x_new]
    cy, cx = frame_center(np.zeros((y_ori, x_ori)))
    arr_y = jnp.asarray(yy - cy)
    arr_x = jnp.asarray(xx - cx)

    s_x = tensor_fft_shear(tensor_in, arr_x, a, ax=2)
    s_xy = tensor_fft_shear(s_x, arr_y, b, ax=1)
    s_xyx = tensor_fft_shear(s_xy, arr_x, a, ax=2)

    if y_ori % 2 or x_ori % 2:
        out = jnp.zeros((1, s_xyx.shape[1] + 1, s_xyx.shape[2] + 1))
        return out.at[0, :-1, :-1].set(jnp.real(s_xyx[0]))
    return jnp.real(s_xyx)
