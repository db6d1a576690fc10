"""Parity + invariant tests for FFT rotation/derotation."""

import numpy as np
import pytest

from ref_oracle import load_ref


@pytest.fixture(scope="module")
def ref_derot():
    return load_ref("vip_hci.preproc.derotation")


def _random_frame(size, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter

    return gaussian_filter(rng.standard_normal((size, size)), 1.5) * 10


@pytest.mark.parametrize("size", [100, 101])
@pytest.mark.parametrize("angle", [0.0, 10.0, 33.3, 45.0, 46.0, 90.0, 135.1,
                                   222.2, 359.0, -33.3])
def test_rotate_fft_core_parity(ref_derot, size, angle):
    """vip_tpu.ops.fft.rotate_fft ≡ reference rotate_fft (derotation.py:542)."""
    from vip_tpu.ops.fft import rotate_fft
    import jax.numpy as jnp

    frame = _random_frame(size)
    # reference normalizes negative angles by +360 loops
    ref = ref_derot.rotate_fft(frame, angle)
    got = np.asarray(rotate_fft(jnp.asarray(frame), angle))
    assert np.max(np.abs(ref - got)) < 1e-9


@pytest.mark.parametrize("size", [100, 101])
@pytest.mark.parametrize("angle", [17.7, 61.0, 181.4])
def test_frame_rotate_pipeline_parity(ref_derot, size, angle):
    """Full pad→rotate→crop pipeline ≡ reference frame_rotate vip-fft."""
    from vip_tpu.preproc.derotation import frame_rotate

    frame = _random_frame(size, seed=1)
    ref = ref_derot.frame_rotate(frame, angle, imlib="vip-fft")
    got = frame_rotate(frame, angle, imlib="vip-fft")
    assert ref.shape == got.shape
    assert np.max(np.abs(ref - got)) < 1e-9


def test_cube_derotate_parity(ref_derot):
    from vip_tpu.preproc.derotation import cube_derotate

    rng = np.random.default_rng(3)
    cube = np.stack([_random_frame(64, seed=i) for i in range(7)])
    angles = rng.uniform(-180, 180, 7)
    ref = ref_derot.cube_derotate(cube, angles, imlib="vip-fft")
    got = cube_derotate(cube, angles, imlib="vip-fft")
    assert np.max(np.abs(ref - got)) < 1e-9


def test_cube_derotate_chunked_equals_unchunked():
    from vip_tpu.preproc.derotation import cube_derotate

    cube = np.stack([_random_frame(32, seed=i) for i in range(9)])
    angles = np.linspace(-50, 130, 9)
    full = cube_derotate(cube, angles, chunk=None)
    chunked = cube_derotate(cube, angles, chunk=4)
    assert np.max(np.abs(full - chunked)) < 1e-12


def test_rotation_roundtrip_preserves_flux():
    """FFT rotation preserves total power; rotate +a then -a ≈ identity in
    the interior (reference test_preproc_rotation.py round-trip contract)."""
    from vip_tpu.preproc.derotation import frame_rotate

    frame = _random_frame(101, seed=5)
    rot = frame_rotate(frame, 37.0)
    back = frame_rotate(rot, -37.0)
    c = 50
    inner = (slice(c - 20, c + 21),) * 2
    assert np.allclose(back[inner], frame[inner], atol=1e-1, rtol=1e-1)


def test_find_indices_adi_parity(ref_derot):
    from vip_tpu.preproc.derotation import _find_indices_adi

    angles = np.linspace(0, 60, 40)
    for frame in [0, 5, 20, 39]:
        for thr in [0.5, 3.0, 10.0]:
            ref = ref_derot._find_indices_adi(angles, frame, thr)
            got = _find_indices_adi(angles, frame, thr)
            assert np.array_equal(ref, got)
            ref_t = ref_derot._find_indices_adi(angles, frame, thr,
                                                truncate=True, max_frames=10)
            got_t = _find_indices_adi(angles, frame, thr, truncate=True,
                                      max_frames=10)
            assert np.array_equal(ref_t, got_t)
            ref_n = ref_derot._find_indices_adi(angles, frame, thr, nframes=6)
            got_n = _find_indices_adi(angles, frame, thr, nframes=6)
            assert np.array_equal(ref_n, got_n)


def test_cube_derotate_fft_small_imlib():
    """imlib='vip-fft-small' (packed 1.25x-canvas speed mode) agrees with
    the exact vip-fft path inside the inscribed circular FoV on smooth,
    band-limited content."""
    from vip_tpu.preproc.derotation import cube_derotate

    rng = np.random.default_rng(7)
    n, sz = 8, 64
    yy, xx = np.mgrid[:sz, :sz] - sz / 2
    # smooth circle-supported content (gaussian blobs well inside the FoV)
    cube = np.zeros((n, sz, sz))
    for i in range(n):
        cy, cx = rng.uniform(-15, 15, 2)
        cube[i] = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / 18.0))
    angs = np.linspace(-160.0, 140.0, n)

    exact = cube_derotate(cube.copy(), angs, imlib="vip-fft")
    fast = cube_derotate(cube.copy(), angs, imlib="vip-fft-small")
    fov = (yy ** 2 + xx ** 2) < (sz / 2 - 3) ** 2
    err = np.abs(exact - fast)[:, fov].max()
    assert err < 5e-3

    # odd-size frames transparently fall back to the exact path
    odd = cube_derotate(cube[:, :-1, :-1].copy(), angs,
                        imlib="vip-fft-small")
    assert odd.shape == (n, sz - 1, sz - 1)
