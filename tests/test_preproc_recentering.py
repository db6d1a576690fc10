"""Parity tests for FFT sub-pixel shifting and DFT registration."""

import numpy as np
import pytest

from ref_oracle import load_ref


@pytest.fixture(scope="module")
def ref_recenter():
    return load_ref("vip_hci.preproc.recentering")


def _frame(size, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter

    return gaussian_filter(rng.standard_normal((size, size)), 1.5) * 10


@pytest.mark.parametrize("size", [50, 51])
@pytest.mark.parametrize("shift", [(0.3, -0.7), (2.5, 1.2), (-3.7, 0.0),
                                   (0.0, 0.0)])
def test_frame_shift_parity(ref_recenter, size, shift):
    from vip_tpu.preproc.recentering import frame_shift

    frame = _frame(size)
    sy, sx = shift
    ref = ref_recenter.frame_shift(frame, sy, sx, imlib="vip-fft")
    got = frame_shift(frame, sy, sx, imlib="vip-fft")
    assert ref.shape == got.shape
    assert np.max(np.abs(ref - got)) < 1e-9


def test_frame_shift_nonsquare_parity(ref_recenter):
    from vip_tpu.preproc.recentering import frame_shift

    rng = np.random.default_rng(1)
    frame = rng.standard_normal((40, 56))
    ref = ref_recenter.frame_shift(frame, 1.3, -0.4, imlib="vip-fft")
    got = frame_shift(frame, 1.3, -0.4, imlib="vip-fft")
    assert np.max(np.abs(ref - got)) < 1e-9


def test_cube_shift_matches_frame_shift():
    from vip_tpu.preproc.recentering import cube_shift, frame_shift

    rng = np.random.default_rng(2)
    cube = rng.standard_normal((6, 31, 31))
    sy = rng.uniform(-3, 3, 6)
    sx = rng.uniform(-3, 3, 6)
    got = cube_shift(cube, sy, sx)
    for i in range(6):
        single = frame_shift(cube[i], sy[i], sx[i])
        assert np.max(np.abs(got[i] - single)) < 1e-10


def test_shift_roundtrip():
    from vip_tpu.preproc.recentering import frame_shift

    frame = _frame(64, seed=3)
    out = frame_shift(frame_shift(frame, 1.37, -2.11), -1.37, 2.11)
    inner = (slice(16, 48),) * 2
    # FFT shift on a zero-padded crop is not exactly invertible (sinc
    # leakage at the pad boundary); the reference behaves identically.
    assert np.allclose(out[inner], frame[inner], atol=0.1)


def test_dft_registration_recovers_known_shift():
    from vip_tpu.preproc.recentering import frame_shift
    from vip_tpu.ops.registration import dft_registration_batch
    import jax.numpy as jnp

    from scipy.ndimage import fourier_shift

    frame = _frame(64, seed=4)
    true = [(1.24, -0.57), (-2.13, 0.85)]
    # circular (wrap) shifts: the registration problem is then exact
    shifted = np.stack([
        np.fft.ifftn(fourier_shift(np.fft.fftn(frame), (dy, dx))).real
        for dy, dx in true
    ])
    shifts = np.asarray(dft_registration_batch(jnp.asarray(frame),
                                               jnp.asarray(shifted),
                                               upsample_factor=100))
    for (dy, dx), est in zip(true, shifts):
        # registration returns the shift needed to go target->ref
        assert abs(est[0] + dy) < 0.011
        assert abs(est[1] + dx) < 0.011


def test_fourier_shift_np_matches_jitted():
    """frame_shift's host path (fourier_shift_np) is the exact numpy twin
    of the jitted fourier_shift: same pad-to-square/pad-to-even geometry,
    same sign-dependent odd->even placement, same phase ramp. Pinned so
    the eager host path (which exists to avoid one device compile per
    distinct shift magnitude) can never drift from the device kernel."""
    import jax.numpy as jnp

    from vip_tpu.ops.fft import fourier_shift, fourier_shift_np

    rng = np.random.default_rng(11)
    for shape in [(64, 64), (65, 65), (64, 66), (67, 64), (101, 101)]:
        frame = rng.standard_normal(shape)
        for sy, sx in [(0.3, -0.7), (5.2, 3.9), (-220.4, 110.2),
                       (0.0, 0.0), (-0.5, 0.5), (1.0, -3.0)]:
            npad = int(np.ceil(max(abs(sy), abs(sx))))
            dev = np.asarray(fourier_shift(jnp.asarray(frame), sy, sx,
                                           npad))
            host = fourier_shift_np(frame, sy, sx, npad)
            assert np.abs(dev - host).max() < 1e-9, (shape, sy, sx)
