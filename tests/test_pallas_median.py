"""Radix-select exact nanmedian kernel (ops/pallas_median.py) vs
jnp.nanmedian / jnp.median, in Pallas interpret mode on CPU."""

import numpy as np
import pytest

import jax.numpy as jnp

from vip_tpu.ops.pallas_median import nanmedian_axis0


def _check(arr, propagate=False):
    got = np.asarray(nanmedian_axis0(jnp.asarray(arr), interpret=True,
                                     propagate=propagate))
    ref = (np.median if propagate else np.nanmedian)(
        np.asarray(arr, np.float64), axis=0).astype(np.float32)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(ref))
    m = ~np.isnan(ref)
    # selection returns exact elements; the only rounding is the f32
    # average of the two middles vs numpy's f64 average
    assert np.abs(got[m] - ref[m]).max() <= np.maximum(
        np.abs(ref[m]) * 1e-6, 1e-7).max()


@pytest.mark.parametrize("n", [16, 17, 33])
@pytest.mark.parametrize("shape", [(8, 128), (16, 256)])
def test_median_kernel_random(n, shape):
    rng = np.random.default_rng(n)
    _check(rng.standard_normal((n,) + shape).astype(np.float32) * 100)


def test_median_kernel_ragged_pads():
    rng = np.random.default_rng(1)
    _check(rng.standard_normal((20, 11, 150)).astype(np.float32))


def test_median_kernel_specials():
    rng = np.random.default_rng(2)
    arr = rng.standard_normal((24, 8, 128)).astype(np.float32)
    arr[3, 0, 0] = np.inf
    arr[5, 0, 1] = -np.inf
    arr[:, 0, 2] = -0.0
    arr[::2, 0, 3] = np.nan          # half NaN
    arr[:, 0, 4] = np.nan            # all NaN
    arr[7, 1, :] = 1e-42             # denormal
    _check(arr)


def test_median_kernel_propagate_nan():
    rng = np.random.default_rng(3)
    arr = rng.standard_normal((19, 8, 128)).astype(np.float32)
    arr[4, 2, 7] = np.nan
    _check(arr, propagate=True)


def test_collapse_jax_gate_off_on_cpu():
    # on the CPU backend collapse_jax must keep the jnp.nanmedian path
    from vip_tpu.preproc.subsampling import collapse_jax

    rng = np.random.default_rng(4)
    arr = rng.standard_normal((30, 10, 10))
    out = np.asarray(collapse_jax(jnp.asarray(arr), mode="median"))
    assert np.allclose(out, np.nanmedian(arr, axis=0), atol=1e-12)
