"""Parity tests for ANDROMEDA against the reference implementation."""

import numpy as np
import pytest

from vip_tpu.invprob.andromeda import (andromeda, andromeda_core,
                                       create_indices, diff_images,
                                       normalize_snr)
from vip_tpu.invprob.utils_andro import (calc_psf_shift_subpix, fitaffine,
                                         idl_round, robust_std,
                                         subpixel_shift)

from ref_oracle import load_ref


@pytest.fixture(scope="module")
def ref_andro():
    return load_ref("vip_hci.invprob.andromeda")


@pytest.fixture(scope="module")
def ref_utils():
    return load_ref("vip_hci.invprob.utils_andro")


@pytest.fixture(scope="module")
def small_data():
    rng = np.random.default_rng(42)
    n, sz = 12, 40
    angs = np.linspace(-20, 20, n)
    cube = rng.normal(0, 1, (n, sz, sz))
    # bright companion at (y=+8, x=+3) rotating with the angles
    yy, xx = np.mgrid[:sz, :sz]
    for k, a in enumerate(angs):
        th = np.deg2rad(a)
        cy = sz / 2 - 0.5 + (8 * np.cos(th) - 3 * np.sin(th))
        cx = sz / 2 - 0.5 + (3 * np.cos(th) + 8 * np.sin(th))
        cube[k] += 20 * np.exp(-((yy - cy)**2 + (xx - cx)**2) / 4.0)
    psf = np.exp(-((yy - sz / 2)**2 + (xx - sz / 2)**2) / 3.0)
    psf = psf[sz // 2 - 4:sz // 2 + 4, sz // 2 - 4:sz // 2 + 4].copy()
    return cube, angs, psf


def test_utils_parity(ref_utils):
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, 200)
    y = 2.5 * x + 0.3 + rng.normal(0, 0.1, 200)
    assert np.isclose(robust_std(x), ref_utils.robust_std(x))
    vals = rng.uniform(-3, 3, 50)
    assert np.allclose(idl_round(vals), ref_utils.idl_round(vals))
    b, a = fitaffine(x, y)
    b_r, a_r = ref_utils.fitaffine(x, y)
    assert np.isclose(b, b_r) and np.isclose(a, a_r)
    img = rng.normal(0, 1, (16, 16))
    assert np.allclose(subpixel_shift(img, 0.3, -0.7),
                       ref_utils.subpixel_shift(img, 0.3, -0.7), atol=1e-12)
    ours = calc_psf_shift_subpix(img, 4)
    theirs = ref_utils.calc_psf_shift_subpix(img, 4)
    assert np.allclose(ours, theirs, atol=1e-12)


def test_create_indices_diff_images_parity(ref_andro, small_data):
    cube, angs, _ = small_data
    for angmin in (2.0, 5.0, 11.0):
        ours = create_indices(angs, angmin, verbose=False)
        theirs = ref_andro.create_indices(angs, angmin, verbose=False)
        assert np.array_equal(ours[0], theirs[0])
        assert np.array_equal(ours[1], theirs[1])
        assert list(ours[2]) == list(theirs[2])

    ineg, ipos, _ = create_indices(angs, 5.0, verbose=False)
    for method in ("lsq", "total", "l1"):
        ours = diff_images(cube[ipos], cube[ineg], 5, 12,
                           opt_method=method)
        theirs = ref_andro.diff_images(cube[ipos], cube[ineg], 5, 12,
                                       opt_method=method)
        assert np.allclose(ours[0], theirs[0], atol=1e-10), method
        assert np.allclose(ours[1], theirs[1], atol=1e-10), method
        assert np.allclose(ours[2], theirs[2], atol=1e-10), method


def test_andromeda_core_parity(ref_andro, small_data):
    cube, angs, psf = small_data
    angle_list = -angs
    psf_cube = calc_psf_shift_subpix(psf / psf.max(), precision=8)
    ineg, ipos, _ = create_indices(angle_list, 5.0, verbose=False)
    diff, gamma, _ = diff_images(cube[ipos], cube[ineg], 5, 12, "lsq")
    ours = andromeda_core(diff, ineg, ipos, angle_list, psf_cube,
                          rhomin=5, rhomax=12, gamma=gamma)
    theirs = ref_andro.andromeda_core(diff, ineg, ipos, angle_list,
                                      psf_cube, rhomin=5, rhomax=12,
                                      gamma=gamma)
    for o, t, name in zip(ours, theirs, ("flux", "snr", "lik", "stdflux")):
        scale = max(np.abs(t).max(), 1e-12)
        assert np.max(np.abs(o - t)) / scale < 1e-8, name


def test_andromeda_full_parity(ref_andro, small_data):
    cube, angs, psf = small_data
    kwargs = dict(oversampling_fact=1.2, filtering_fraction=0.3,
                  min_sep=0.5, annuli_width=1.0, roa=2, opt_method="lsq",
                  nsmooth_snr=8, precision=8, homogeneous_variance=True,
                  verbose=False)
    ours = andromeda(cube=cube.copy(), angle_list=angs.copy(),
                     psf=psf.copy(), **kwargs)
    theirs = ref_andro.andromeda(cube=cube.copy(), angle_list=angs.copy(),
                                 psf=psf.copy(), **kwargs)
    names = ("contrast", "snr", "snr_norm", "stdcontrast",
             "stdcontrast_norm", "likelihood")
    for o, t, name in zip(ours[:6], theirs[:6], names):
        scale = max(np.abs(t).max(), 1e-12)
        assert np.max(np.abs(o - t)) / scale < 1e-7, name
    assert np.isclose(ours[6], theirs[6])
    # sanity: the planet is detected at high S/N in the normalized map
    snr_norm = ours[2]
    assert snr_norm.max() > 5


def test_normalize_snr_parity(ref_andro):
    rng = np.random.default_rng(3)
    snr = rng.normal(0, 1, (40, 40))
    d = np.sqrt((np.mgrid[:40, :40][0] - 19.5)**2 +
                (np.mgrid[:40, :40][1] - 19.5)**2)
    snr[(d < 4) | (d > 16)] = 0
    ours = normalize_snr(snr, nsmooth_snr=4)
    theirs = ref_andro.normalize_snr(snr, nsmooth_snr=4)
    assert np.allclose(ours[0], theirs[0], atol=1e-10)
    assert np.allclose(ours[1], theirs[1], atol=1e-10)
