"""Parity tests for PACO against the reference implementation."""

import numpy as np
import pytest

from vip_tpu.invprob.paco import (FastPACO, FullPACO,
                                  compute_statistics_at_pixel,
                                  create_boolean_circular_mask,
                                  get_rotated_pixel_coords,
                                  sample_covariance, shrinkage_factor)

from ref_oracle import load_ref


@pytest.fixture(scope="module")
def ref_paco():
    return load_ref("vip_hci.invprob.paco")


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(5)
    n, sz = 8, 24
    angs = np.linspace(0, 50, n)
    cube = rng.normal(0, 1, (n, sz, sz)) + 5
    yy, xx = np.mgrid[:sz, :sz]
    for k, a in enumerate(angs):
        th = np.deg2rad(-a)
        py = sz // 2 + 7 * np.sin(th + np.pi / 4)
        px = sz // 2 + 7 * np.cos(th + np.pi / 4)
        cube[k] += 15 * np.exp(-((yy - py)**2 + (xx - px)**2) / 2.0)
    psf = np.exp(-((yy - sz / 2)**2 + (xx - sz / 2)**2) / 2.0)
    psf = psf[sz // 2 - 4:sz // 2 + 5, sz // 2 - 4:sz // 2 + 5].copy()
    return cube, angs, psf


def test_patch_stats_parity(ref_paco):
    rng = np.random.default_rng(1)
    patch = rng.normal(0, 1, (10, 13))
    m_o, c_o = compute_statistics_at_pixel(patch)
    m_r, c_r = ref_paco.compute_statistics_at_pixel(patch)
    assert np.allclose(m_o, m_r, atol=1e-12)
    assert np.allclose(c_o, c_r, atol=1e-9)
    S_o = sample_covariance(patch, patch.mean(0), 10)
    S_r = ref_paco.sample_covariance(patch, patch.mean(0), 10)
    assert np.allclose(S_o, S_r, atol=1e-12)
    assert np.isclose(shrinkage_factor(S_o, 10),
                      ref_paco.shrinkage_factor(S_r, 10))


def test_rotated_coords_and_mask_parity(ref_paco):
    x, y = np.meshgrid(np.arange(-12, 12), np.arange(-12, 12))
    angs = np.linspace(0, 50, 8)
    for p0 in ((5, 7), (20, 3), (12, 12)):
        o = get_rotated_pixel_coords(x, y, p0, angs)
        r = ref_paco.get_rotated_pixel_coords(x, y, p0, angs)
        assert np.allclose(o, r, atol=1e-10)
    assert np.array_equal(
        create_boolean_circular_mask((24, 24), 4, (10, 13)),
        ref_paco.create_boolean_circular_mask((24, 24), 4, (10, 13)))


@pytest.mark.parametrize("cls_name", ["FastPACO", "FullPACO"])
def test_paco_run_parity(ref_paco, data, cls_name):
    cube, angs, psf = data
    ours_cls = {"FastPACO": FastPACO, "FullPACO": FullPACO}[cls_name]
    theirs_cls = getattr(ref_paco, cls_name)
    kw = dict(angles=angs, psf=psf, fwhm=2.0, pixscale=1.0, verbose=False)
    ours = ours_cls(cube=cube.copy(), **kw)
    theirs = theirs_cls(cube=cube.copy(), **kw)
    x0, y0 = np.meshgrid(np.arange(0, 24), np.arange(0, 24))
    phi0s = np.column_stack((x0.flatten(), y0.flatten()))
    ao, bo = ours.PACOCalc(np.array(phi0s),
                           use_subpixel_psf_astrometry=False)
    at, bt = theirs.PACOCalc(np.array(phi0s),
                             use_subpixel_psf_astrometry=False)
    m = np.isfinite(at)
    assert np.array_equal(np.isfinite(ao), m)
    assert np.allclose(ao[m], at[m], atol=1e-8)
    assert np.allclose(bo[m], bt[m], atol=1e-8)
    # the planted companion yields a peak (weak without subpixel
    # astrometry on this tiny scene — parity above is the real check)
    snr = bo / np.sqrt(ao)
    assert np.nanmax(snr) > 2.5


def test_paco_subpixel_astrometry_parity(ref_paco, data):
    cube, angs, psf = data
    kw = dict(angles=angs, psf=psf, fwhm=2.0, pixscale=1.0, verbose=False)
    ours = FastPACO(cube=cube.copy(), **kw)
    theirs = ref_paco.FastPACO(cube=cube.copy(), **kw)
    o_snr, _ = ours.run(use_subpixel_psf_astrometry=True)
    t_snr, _ = theirs.run(use_subpixel_psf_astrometry=True)
    m = np.isfinite(t_snr)
    assert np.allclose(o_snr[m], t_snr[m], atol=1e-6)
