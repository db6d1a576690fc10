"""Isotropic Undecimated Wavelet Transform (à trous), [KEN15]/[DAB15]
(reference vip_hci/var/iuwt.py, itself from PyMORESANE).

The separable B3-spline à-trous convolution is expressed with jnp.pad
(reflect) + shifted adds, jitted and batched over frames on device — the
reference's 'mp' multiprocessing variant maps to the same batched call.
"""

from functools import partial

import numpy as np
import jax.numpy as jnp
from jax import jit, vmap

__all__ = ["iuwt_decomposition", "iuwt_recomposition"]

_FILTER = (1. / 16) * np.array([1, 4, 6, 4, 1])


def _a_trous(C0, scale):
    """One à-trous smoothing pass at the given dyadic scale, with the
    reference's edge-reflection convention (reference iuwt.py:162-205)."""
    f = _FILTER
    s1 = 2 ** scale
    s2 = 2 ** (scale + 1)

    def _axis_pass(x):
        # along axis 0 with reflected edges as in the reference
        tmp = f[2] * x
        tmp = tmp.at[s2:, :].add(f[0] * x[:-s2, :])
        tmp = tmp.at[:s2, :].add(f[0] * x[s2 - 1::-1, :])
        tmp = tmp.at[s1:, :].add(f[1] * x[:-s1, :])
        tmp = tmp.at[:s1, :].add(f[1] * x[s1 - 1::-1, :])
        tmp = tmp.at[:-s1, :].add(f[3] * x[s1:, :])
        tmp = tmp.at[-s1:, :].add(f[3] * x[:-s1 - 1:-1, :])
        tmp = tmp.at[:-s2, :].add(f[4] * x[s2:, :])
        tmp = tmp.at[-s2:, :].add(f[4] * x[:-s2 - 1:-1, :])
        return tmp

    tmp = _axis_pass(jnp.asarray(C0, dtype=float))
    return _axis_pass(tmp.T).T


@partial(jit, static_argnames=("scale_count", "scale_adjust",
                               "store_smoothed"))
def _iuwt_decompose(in1, scale_count, scale_adjust, store_smoothed):
    C0 = jnp.asarray(in1, dtype=float)
    for i in range(scale_adjust):
        C0 = _a_trous(C0, i)
    details = []
    for i in range(scale_adjust, scale_count):
        C = _a_trous(C0, i)
        C1 = _a_trous(C, i)
        details.append(C0 - C1)
        C0 = C
    details = jnp.stack(details)
    if store_smoothed:
        return details, C0
    return details


def iuwt_decomposition(in1, scale_count, scale_adjust=0, mode="ser",
                       core_count=2, store_smoothed=False):
    """IUWT decomposition (reference iuwt.py:14-41). ``mode`` is accepted
    for API compatibility; everything runs as one jitted program."""
    res = _iuwt_decompose(in1, int(scale_count), int(scale_adjust),
                          bool(store_smoothed))
    if store_smoothed:
        return np.asarray(res[0]), np.asarray(res[1])
    return np.asarray(res)


def iuwt_recomposition(in1, scale_adjust=0, mode="ser", core_count=1,
                       store_on_gpu=False, smoothed_array=None):
    """IUWT recomposition (reference iuwt.py:43-159)."""
    in1 = jnp.asarray(in1, dtype=float)
    max_scale = in1.shape[0] + scale_adjust
    if smoothed_array is None:
        recomposition = jnp.zeros(in1.shape[1:])
    else:
        recomposition = jnp.asarray(smoothed_array, dtype=float)
    for i in range(max_scale - 1, scale_adjust - 1, -1):
        recomposition = _a_trous(recomposition, i) + in1[i - scale_adjust]
    if scale_adjust > 0:
        for i in range(scale_adjust - 1, -1, -1):
            recomposition = _a_trous(recomposition, i)
    return np.asarray(recomposition)


def iuwt_decomposition_batch(cube, scale_count, scale_adjust=0,
                             store_smoothed=False):
    """Batched decomposition over the frame axis (one vmapped program)."""
    fn = lambda fr: _iuwt_decompose(fr, int(scale_count),
                                    int(scale_adjust), False)
    return np.asarray(vmap(fn)(jnp.asarray(cube, dtype=float)))


# ---------------------------------------------------------------------------
# Reference-compatible public helpers (reference iuwt.py:67-395). The
# reference splits its implementation into 'ser' (single-core numpy) and
# 'mp' (fork-pool row/column slices) variants; on an accelerator both map
# to the same jitted program, so these are thin numpy-exact wrappers kept
# for API/unit-test parity (the 'filter' argument is honored).
# ---------------------------------------------------------------------------
def ser_a_trous(C0, filter, scale):
    """One à-trous pass with an arbitrary 5-tap filter and the reference's
    edge-reflection convention (reference iuwt.py:162-205)."""
    f = np.asarray(filter, dtype=float)
    x = np.asarray(C0, dtype=float)
    s1, s2 = 2 ** scale, 2 ** (scale + 1)

    def _pass(x):
        tmp = f[2] * x
        tmp[s2:, :] += f[0] * x[:-s2, :]
        tmp[:s2, :] += f[0] * x[s2 - 1::-1, :]
        tmp[s1:, :] += f[1] * x[:-s1, :]
        tmp[:s1, :] += f[1] * x[s1 - 1::-1, :]
        tmp[:-s1, :] += f[3] * x[s1:, :]
        tmp[-s1:, :] += f[3] * x[:-s1 - 1:-1, :]
        tmp[:-s2, :] += f[4] * x[s2:, :]
        tmp[-s2:, :] += f[4] * x[:-s2 - 1:-1, :]
        return tmp

    return _pass(_pass(x).T).T


def ser_iuwt_decomposition(in1, scale_count, scale_adjust, store_smoothed):
    """Serial-API IUWT decomposition (reference iuwt.py:67-118); runs the
    jitted device program."""
    res = _iuwt_decompose(np.asarray(in1, float), int(scale_count),
                          int(scale_adjust), bool(store_smoothed))
    if store_smoothed:
        return np.asarray(res[0]), np.asarray(res[1])
    return np.asarray(res)


def ser_iuwt_recomposition(in1, scale_adjust, smoothed_array):
    """Serial-API IUWT recomposition (reference iuwt.py:120-160)."""
    return iuwt_recomposition(in1, scale_adjust,
                              smoothed_array=smoothed_array)


def mp_a_trous(C0, wavelet_filter, scale, core_count):
    """Multiprocessing-API à-trous pass (reference iuwt.py:306-354);
    ``core_count`` is accepted and ignored — the whole frame is one device
    computation."""
    return ser_a_trous(C0, wavelet_filter, scale)


def mp_a_trous_kernel(C0, wavelet_filter, scale, slice_ind, slice_width,
                      r_or_c="row"):
    """One row/column slice of the à-trous convolution, as dispatched by the
    reference's fork pool (reference iuwt.py:356-395). Computes the 1-D pass
    along the requested direction and returns the requested slice."""
    f = np.asarray(wavelet_filter, dtype=float)
    x = np.asarray(C0, dtype=float)
    if r_or_c == "col":
        x = x.T
    s1, s2 = 2 ** scale, 2 ** (scale + 1)
    tmp = f[2] * x
    tmp[s2:, :] += f[0] * x[:-s2, :]
    tmp[:s2, :] += f[0] * x[s2 - 1::-1, :]
    tmp[s1:, :] += f[1] * x[:-s1, :]
    tmp[:s1, :] += f[1] * x[s1 - 1::-1, :]
    tmp[:-s1, :] += f[3] * x[s1:, :]
    tmp[-s1:, :] += f[3] * x[:-s1 - 1:-1, :]
    tmp[:-s2, :] += f[4] * x[s2:, :]
    tmp[-s2:, :] += f[4] * x[:-s2 - 1:-1, :]
    if r_or_c == "col":
        tmp = tmp.T
        return tmp[:, slice_ind * slice_width:(slice_ind + 1) * slice_width]
    return tmp[slice_ind * slice_width:(slice_ind + 1) * slice_width]


def mp_iuwt_decomposition(in1, scale_count, scale_adjust, store_smoothed,
                          core_count):
    """Multiprocessing-API IUWT decomposition (reference iuwt.py:205-260);
    ``core_count`` ignored — one device program."""
    return ser_iuwt_decomposition(in1, scale_count, scale_adjust,
                                  store_smoothed)


def mp_iuwt_recomposition(in1, scale_adjust, core_count, smoothed_array):
    """Multiprocessing-API IUWT recomposition (reference iuwt.py:262-304)."""
    return ser_iuwt_recomposition(in1, scale_adjust, smoothed_array)
