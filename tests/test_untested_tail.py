"""Parity/behavior tests for previously untested components:
cube_subtract_sky_pca, bkg_star_proba, cube_detect_badfr_*,
iuwt_decomposition, find_scal_vector, cube_fix_badpix_ifs, EvalRoc."""

import numpy as np
import pytest

from conftest import make_adi_cube
from ref_oracle import load_ref


def test_cube_subtract_sky_pca_parity():
    ref = load_ref("vip_hci.preproc.skysubtraction")
    from vip_tpu.preproc.skysubtraction import cube_subtract_sky_pca

    rng = np.random.default_rng(5)
    sky = rng.normal(10, 1, (6, 32, 32))
    sci = sky[:4] * 1.05 + rng.normal(0, 0.05, (4, 32, 32))
    yy, xx = np.mgrid[:32, :32]
    mask = (np.hypot(yy - 16, xx - 16) > 8).astype(float)
    ours = cube_subtract_sky_pca(sci.copy(), sky.copy(), mask.copy(),
                                 ncomp=2)
    theirs = ref.cube_subtract_sky_pca(sci.copy(), sky.copy(), mask.copy(),
                                       ncomp=2)
    assert np.allclose(ours, theirs, atol=1e-8)


def test_bkg_star_proba_parity():
    ref = load_ref("vip_hci.stats.bkg_proba")
    from vip_tpu.stats.bkg_proba import bkg_star_proba

    for sep in (1.0, 2.5):
        ours = bkg_star_proba(0.03, sep, n_bkg=1, unit="arcsec",
                              verbose=False)
        theirs = ref.bkg_star_proba(0.03, sep, n_bkg=1, unit="arcsec",
                                    verbose=False)
        assert np.isclose(float(ours), float(theirs), rtol=1e-8)


def test_cube_detect_badfr_parity():
    ref = load_ref("vip_hci.preproc.badframes")
    from vip_tpu.preproc import badframes as bf

    cube, angs = make_adi_cube(n=20, size=40)
    cube = cube.copy()
    cube[3] *= 5.0       # bad frame: flux jump
    cube[11] += np.roll(cube[11], 7, axis=0) * 3  # distorted frame

    og, ob = bf.cube_detect_badfr_pxstats(cube, verbose=False, plot=False)
    rg, rb = ref.cube_detect_badfr_pxstats(cube, verbose=False, plot=False)
    assert np.array_equal(np.sort(og), np.sort(rg))
    assert np.array_equal(np.sort(ob), np.sort(rb))

    og, ob = bf.cube_detect_badfr_correlation(cube, frame_ref=0,
                                              verbose=False, plot=False)
    rg, rb = ref.cube_detect_badfr_correlation(cube, frame_ref=0,
                                               verbose=False, plot=False)
    assert np.array_equal(np.sort(og), np.sort(rg))
    assert np.array_equal(np.sort(ob), np.sort(rb))


def test_iuwt_decomposition_parity():
    ref = load_ref("vip_hci.var.iuwt")
    from vip_tpu.var.iuwt import iuwt_decomposition

    rng = np.random.default_rng(6)
    img = rng.standard_normal((48, 48))
    ours = iuwt_decomposition(img, 3, store_smoothed=True)
    theirs = ref.iuwt_decomposition(img, 3, store_smoothed=True)
    for o, t in zip(ours, theirs):
        assert np.allclose(o, t, atol=1e-10)


def test_find_scal_vector_parity():
    ref = load_ref("vip_hci.preproc.rescaling")
    from vip_tpu.preproc.rescaling import find_scal_vector

    rng = np.random.default_rng(7)
    z, size = 3, 40
    lbdas = np.linspace(1.0, 1.3, z)
    scal_gt = lbdas[-1] / lbdas
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(rng.standard_normal((size, size)), 2.0) * 10
    from vip_tpu.preproc.rescaling import frame_rescaling

    cube = np.stack([frame_rescaling(base.copy(), scale=1 / s)
                     for s in scal_gt])
    fluxes = np.ones(z)
    o_scal, o_flux = find_scal_vector(cube.copy(), lbdas, fluxes,
                                      nfp=2, debug=False)
    t_scal, t_flux = ref.find_scal_vector(cube.copy(), lbdas, fluxes,
                                          nfp=2, debug=False)
    assert np.allclose(o_scal, t_scal, atol=1e-3)
    assert np.allclose(o_flux, t_flux, atol=1e-3)


@pytest.mark.slow
def test_cube_fix_badpix_ifs_runs():
    from vip_tpu.preproc.badpixremoval import cube_fix_badpix_ifs

    rng = np.random.default_rng(8)
    z, size = 3, 40
    lbdas = np.linspace(1.0, 1.3, z)
    cube = rng.normal(10, 1, (z, size, size))
    cube[0, 5, 5] = 500.0
    cube[2, 20, 31] = -200.0
    corr, bpm, _ = cube_fix_badpix_ifs(cube.copy(), lbdas, verbose=False,
                                       full_output=True)
    assert corr.shape == cube.shape
    assert bpm[0, 5, 5] or bpm[2, 20, 31]
    assert abs(corr[0, 5, 5]) < 100


def test_evalroc_runs():
    from vip_tpu.metrics.roc import EvalRoc
    from vip_tpu.fm.fakecomp import normalize_psf
    from vip_tpu.objects import Dataset, MedianBuilder

    cube, angs = make_adi_cube(n=12, size=50)
    yy, xx = np.mgrid[:13, :13]
    psf = np.exp(-((yy - 6) ** 2 + (xx - 6) ** 2) / (2 * (4 / 2.355) ** 2))
    psfn = normalize_psf(psf, fwhm=4.0, verbose=False)

    np.random.seed(10)
    ds = Dataset(cube=cube, angles=angs, psf=psfn, fwhm=4.0, px_scale=0.1)
    roc = EvalRoc(ds, plsc=0.1, n_injections=2, inrad=8, outrad=14,
                  dist_flux=("uniform", 40, 60))
    medsub_obj = MedianBuilder(dataset=ds, verbose=False).build()
    roc.add_algo("medsub", medsub_obj, "-", "b", thresholds=[1, 2, 3])
    roc.inject_and_postprocess(cevr=0.9)
    assert len(roc.list_xy) == 2
    m = roc.methods[0]
    assert m["frames"][0].shape == cube.shape[1:]
    assert m["probmaps"][0].shape == cube.shape[1:]
    roc.compute_tpr_fps()
    assert len(m["detections"]) == 2
