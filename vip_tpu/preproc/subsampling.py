"""Temporal collapse / subsampling of cubes.

Port of vip_hci/preproc/subsampling.py with the bottleneck nan-reductions
replaced by jnp nan-reductions; the trimmed mean is vectorized (one sort +
windowed mean) instead of the reference's per-pixel Python loop
(subsampling.py:90-104).
"""

import jax.numpy as jnp
import numpy as np

__all__ = ["cube_collapse", "cube_subsample", "cube_subsample_trimmean"]


def collapse_jax(arr, mode="median", n=50, w=None, ax=0):
    """Jittable collapse along axis ``ax`` (nan-aware)."""
    if mode == "mean":
        return jnp.nanmean(arr, axis=ax)
    elif mode == "median":
        from ..ops.pallas_median import nanmedian_axis0, nanmedian_supported

        if nanmedian_supported(arr, ax):
            # radix-select Pallas kernel: ~10x over XLA's sort-based
            # lowering for long frame axes (docs/PROFILING.md)
            return nanmedian_axis0(arr)
        return jnp.nanmedian(arr, axis=ax)
    elif mode == "sum":
        return jnp.nansum(arr, axis=ax)
    elif mode == "max":
        return jnp.nanmax(arr, axis=ax)
    elif mode == "absmean":
        return jnp.nanmean(jnp.abs(arr), axis=ax)
    elif mode == "trimmean":
        N = arr.shape[ax]
        k = (N - n) // 2
        if N % 2 != n % 2:
            n = n + 1
        srt = jnp.sort(arr, axis=ax)
        idx = [slice(None)] * arr.ndim
        idx[ax] = slice(k, k + n)
        return jnp.nanmean(srt[tuple(idx)], axis=ax)
    elif mode == "wmean":
        if w is None:
            raise ValueError("Weights have to be provided for weighted mean"
                             " mode")
        arr = jnp.where(jnp.isnan(arr), 0.0, arr)
        w = jnp.asarray(w)
        return jnp.tensordot(w, arr, axes=(0, ax))
    raise TypeError("mode not recognized")


def cube_collapse(cube, mode="median", n=50, w=None):
    """Collapse a 3d cube to a frame (or 4d to 3d along the temporal axis).

    Reference parity: subsampling.py:30-118.
    """
    arr = cube
    if arr.ndim == 3:
        ax = 0
    elif arr.ndim == 4:
        ax = 1
    else:
        raise TypeError("The input array is not a cube or 3d array.")

    if mode == "wmean":
        if w is None:
            raise ValueError("Weights have to be provided for weighted mean"
                             " mode")
        if len(w) != cube.shape[ax]:
            raise TypeError("Weights need same length as cube")

    out = collapse_jax(jnp.asarray(arr), mode=mode, n=n, w=w, ax=ax)
    return np.asarray(out)


def cube_subsample(array, n, mode="mean", w=None, parallactic=None,
                   verbose=True):
    """Combine every ``n`` consecutive frames (subsampling.py:119-200)."""
    array = np.asarray(array)
    if array.ndim == 3:
        m = array.shape[0] // n
        resid = array.shape[0] % n
        y, x = array.shape[1], array.shape[2]
        arr = np.empty((m, y, x))
        if parallactic is not None:
            angles = np.zeros(m)
        for i in range(m):
            chunk = array[n * i:n * i + n]
            arr[i] = cube_collapse(chunk, mode=mode, w=w)
            if parallactic is not None:
                angles[i] = np.mean(parallactic[n * i:n * i + n])
    elif array.ndim == 4:
        m = array.shape[1] // n
        resid = array.shape[1] % n
        w_, y, x = array.shape[0], array.shape[2], array.shape[3]
        arr = np.empty((w_, m, y, x))
        if parallactic is not None:
            angles = np.zeros(m)
        for j in range(m):
            arr[:, j] = cube_collapse(array[:, n * j:n * j + n], mode=mode,
                                      w=w)
            if parallactic is not None:
                angles[j] = np.mean(parallactic[n * j:n * j + n])
    else:
        raise TypeError("The input array is not a cube or 3d array")

    if verbose:
        print(f"Cube temporally subsampled by mean of every {n} frames")
        if resid:
            print(f"Initial # of frames and window are not multiples "
                  f"({resid} frames were dropped)")
    if parallactic is not None:
        return arr, angles
    return arr


def cube_subsample_trimmean(arr, n, m):
    """Trimmed-mean temporal subsampling (subsampling.py:201-237)."""
    arr = np.asarray(arr)
    if arr.ndim != 3:
        raise TypeError("The input array is not a cube or 3d array")
    num = arr.shape[0] // m
    res = arr.shape[0] % m
    y, x = arr.shape[1], arr.shape[2]
    arr2 = np.empty((num + 2, y, x))
    for i in range(num):
        arr2[0] = cube_collapse(arr[:m], mode="trimmean", n=n)
        if i > 0:
            arr2[i] = cube_collapse(arr[m * i:m * i + m], mode="trimmean",
                                    n=n)
    arr2[num] = cube_collapse(arr[-res:], mode="trimmean", n=n)
    print("Cube temporally subsampled by taking the trimmed mean of every "
          f"{m} frames")
    return arr2[: num + 1]
