"""Parity tests for PSF normalization and fake-companion injection."""

import numpy as np
import pytest

from ref_oracle import load_ref


@pytest.fixture(scope="module")
def ref_fakecomp():
    return load_ref("vip_hci.fm.fakecomp")


@pytest.fixture(scope="module")
def psf():
    yy, xx = np.mgrid[:27, :27]
    sigma = 4.0 / 2.355
    # slightly offset gaussian to exercise the recentering loop
    return 3.0 * np.exp(-((yy - 13.3) ** 2 + (xx - 12.8) ** 2)
                        / (2 * sigma**2))


def test_normalize_psf_parity(ref_fakecomp, psf):
    from vip_tpu.fm import normalize_psf

    ref, ref_flux, ref_fwhm = ref_fakecomp.normalize_psf(
        psf.copy(), fwhm="fit", full_output=True, verbose=False, debug=False)
    got, got_flux, got_fwhm = normalize_psf(
        psf.copy(), fwhm="fit", full_output=True, verbose=False)
    assert abs(ref_fwhm - got_fwhm) < 1e-4
    assert abs(ref_flux - got_flux) < 1e-5
    assert np.max(np.abs(ref - got)) < 1e-5


def test_cube_inject_companions_parity(ref_fakecomp, psf):
    from vip_tpu.fm import cube_inject_companions, normalize_psf

    rng = np.random.default_rng(5)
    cube = rng.standard_normal((10, 61, 61))
    angles = np.linspace(0, 40, 10)
    psfn = normalize_psf(psf.copy(), fwhm=4.0, verbose=False)

    kwargs = dict(flevel=30.0, rad_dists=[12.5], n_branches=2, theta=33.0,
                  plsc=0.01, verbose=False)
    ref, ref_pos = ref_fakecomp.cube_inject_companions(
        cube.copy(), psfn, angles, full_output=True, **kwargs)
    got, got_pos = cube_inject_companions(
        cube.copy(), psfn, angles, full_output=True, **kwargs)
    assert np.allclose(ref_pos, got_pos)
    assert np.max(np.abs(ref - got)) < 1e-8


def test_cube_inject_transmission_parity(ref_fakecomp, psf):
    from vip_tpu.fm import cube_inject_companions, normalize_psf

    rng = np.random.default_rng(6)
    cube = rng.standard_normal((8, 61, 61))
    angles = np.linspace(0, 30, 8)
    psfn = normalize_psf(psf.copy(), fwhm=4.0, verbose=False)
    trans = np.array([[0.0, 5.0, 10.0, 30.0, 90.0],
                      [0.0, 0.5, 0.9, 1.0, 1.0]])
    kwargs = dict(flevel=20.0, rad_dists=[9.0], theta=10.0,
                  transmission=trans, verbose=False)
    ref = ref_fakecomp.cube_inject_companions(cube.copy(), psfn, angles,
                                              **kwargs)
    got = cube_inject_companions(cube.copy(), psfn, angles, **kwargs)
    assert np.max(np.abs(ref - got)) < 1e-8


def test_cube_planet_free_removes_companion(ref_fakecomp, psf):
    from vip_tpu.fm import (cube_inject_companions, cube_planet_free,
                            normalize_psf)

    rng = np.random.default_rng(7)
    cube = rng.standard_normal((8, 61, 61)) * 0.01
    angles = np.linspace(0, 30, 8)
    psfn = normalize_psf(psf.copy(), fwhm=4.0, verbose=False)
    fc = cube_inject_companions(cube.copy(), psfn, angles, flevel=10.0,
                                rad_dists=[14.0], theta=77.0, verbose=False)
    clean = cube_planet_free([(14.0, 77.0, 10.0)], fc, angles, psfn)
    assert np.max(np.abs(clean - cube)) < 1e-8


def test_frame_inject_companion_parity(ref_fakecomp, psf):
    from vip_tpu.fm import frame_inject_companion, normalize_psf

    rng = np.random.default_rng(8)
    frame = rng.standard_normal((61, 61))
    psfn = normalize_psf(psf.copy(), fwhm=4.0, verbose=False)
    ref = ref_fakecomp.frame_inject_companion(frame.copy(), psfn, 40.3, 25.7,
                                              5.0)
    got = frame_inject_companion(frame.copy(), psfn, 40.3, 25.7, 5.0)
    assert np.max(np.abs(ref - got)) < 1e-8
