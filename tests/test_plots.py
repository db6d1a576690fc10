"""Smoke tests for every plot/debug branch of the public API.

The reference draws matplotlib figures behind ``plot=``/``debug=`` kwargs
throughout (e.g. stats/utils_stats.py:96-116, stats/distances.py:148-183,
metrics/snr_source.py:434-450, preproc/badframes.py:119-239,
preproc/recentering.py:649-666, fm/negfc_mcmc.py:1360-1607,
fm/negfc_simplex.py:259-273, psfsub/utils_pca.py:384-409). These tests
assert each branch actually creates figures (headless Agg backend) instead
of silently ignoring the kwarg.
"""

import os

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _close_figs():
    plt.close("all")
    yield
    plt.close("all")


def _assert_figs(minimum=1):
    assert len(plt.get_fignums()) >= minimum
    plt.close("all")


@pytest.fixture(scope="module")
def frame():
    rng = np.random.default_rng(0)
    return rng.standard_normal((40, 40)).astype(float)


@pytest.fixture(scope="module")
def small_cube():
    rng = np.random.default_rng(0)
    return rng.standard_normal((10, 40, 40)).astype(float)


def test_stats_plots(frame, small_cube):
    from vip_tpu.stats.distances import cube_distance
    from vip_tpu.stats.utils_stats import (cube_basic_stats,
                                           descriptive_stats,
                                           frame_basic_stats)

    frame_basic_stats(frame, "annulus", inner_radius=5, size=5, plot=True,
                      full_output=True)
    _assert_figs()
    cube_basic_stats(small_cube, "annulus", inner_radius=5, size=5,
                     plot=True, full_output=True)
    _assert_figs(2)
    descriptive_stats(frame.ravel(), verbose=False, plot=True)
    _assert_figs()
    cube_distance(small_cube, 0, "full", "sad", plot=True)
    _assert_figs()


def test_metrics_plots(frame):
    from vip_tpu.metrics.contrcurve import noise_per_annulus
    from vip_tpu.metrics.roc import compute_binary_map
    from vip_tpu.metrics.snr_source import snr

    snr(frame, (30.0, 20.0), 4.0, plot=True)
    _assert_figs()

    f2 = np.zeros((40, 40))
    f2[10:13, 10:13] = 5.0
    compute_binary_map(f2, [1.0, 2.0], [(11, 11)], fwhm=3.0, plot=True)
    _assert_figs()

    noise_per_annulus(frame, 4.0, 4.0, debug=True)
    _assert_figs()


def test_detection_save_plot(frame, tmp_path):
    from vip_tpu.metrics.detection import detection

    yy, xx = np.mgrid[:40, :40]
    fr = frame * 0.01 + 10 * np.exp(
        -((yy - 30.0) ** 2 + (xx - 30.0) ** 2) / (2 * (4 / 2.355) ** 2))
    out = str(tmp_path / "det.png")
    detection(fr, fwhm=4, mode="lpeaks", plot=True, verbose=False,
              save_plot=out, plot_title="test")
    _assert_figs()
    assert os.path.exists(out)


def test_var_badframes_plots(frame, small_cube):
    from vip_tpu.preproc.badframes import (cube_detect_badfr_correlation,
                                           cube_detect_badfr_ellipticity,
                                           cube_detect_badfr_pxstats)
    from vip_tpu.var.shapes import mask_roi

    mask_roi(frame, source_xy=(28, 24), exc_radius=2, ann_width=2,
             inc_radius=3, mode="bool", plot=True)
    _assert_figs()

    cube_detect_badfr_pxstats(small_cube, plot=True, verbose=False)
    _assert_figs()
    yy, xx = np.mgrid[:40, :40]
    star = 100 * np.exp(-((yy - 20.0) ** 2 + (xx - 20.0) ** 2) / 8.0)
    cube_detect_badfr_ellipticity(small_cube + star, 4.0, crop_size=21,
                                  plot=True, verbose=False)
    _assert_figs()
    cube_detect_badfr_correlation(small_cube, 0, crop_size=21, plot=True,
                                  verbose=False)
    _assert_figs()


def test_confidence_plots_and_save(tmp_path):
    from vip_tpu.fm.negfc_mcmc import confidence

    rng = np.random.default_rng(1)
    samp = rng.normal(size=(500, 3)) * [1.0, 5.0, 10.0] + [20.0, 45.0, 100.0]
    outdir = str(tmp_path) + "/"
    confidence(samp, bins=20, verbose=False, save=True, output_dir=outdir,
               plsc=0.01)
    _assert_figs()
    txt = open(outdir + "confidence.txt").read()
    assert "confidence interval" in txt and "r (mas)" in txt

    mu, sig = confidence(samp, bins=20, gaussian_fit=True, verbose=False)
    _assert_figs()
    # gaussian_fit returns the norm MLE fit = sample mean/std
    assert np.allclose(mu, samp.mean(axis=0))
    assert np.allclose(sig, samp.std(axis=0))


def test_nested_sampling_results_contract(tmp_path):
    """Reference contract (negfc_nested.py:410-459): (3, 2) array of
    weighted mean +- sqrt(cov), plus the diagnostic figures/files."""
    from vip_tpu.fm.negfc_nested import NestedResult, nested_sampling_results

    rng = np.random.default_rng(2)
    ns = 300
    samp = rng.normal(size=(ns, 3)) * [1.0, 5.0, 10.0] + [20.0, 45.0, 100.0]
    logwt = -np.arange(ns)[::-1] / 50.0
    res = NestedResult(samp, np.zeros(ns), logwt, 0.0, 0.1, ns,
                       logvol=-np.arange(ns) / 100.0)
    outdir = str(tmp_path) + "/"
    out = nested_sampling_results(res, burnin=0.3, save=True,
                                  output_dir=outdir, plot=True,
                                  verbose=False)
    assert out.shape == (3, 2)
    _assert_figs()
    assert os.path.exists(outdir + "Nested_sampling.txt")
    # weighted mean must match the weights actually applied
    ind = int(np.percentile(np.arange(ns), 30))
    w = res.weights[ind:]
    assert np.allclose(out[:, 0], np.average(samp[ind:], weights=w, axis=0))


@pytest.mark.slow
def test_algorithm_plot_paths():
    """plot/debug branches that require a full algorithm run."""
    from vip_tpu.fm.negfc_simplex import firstguess_from_coord
    from vip_tpu.metrics.contrcurve import contrast_curve
    from vip_tpu.psfsub import median_sub
    from vip_tpu.psfsub.framediff import frame_diff
    from vip_tpu.psfsub.utils_pca import pca_grid

    rng = np.random.default_rng(3)
    n, sz = 12, 41
    yy, xx = np.mgrid[:sz, :sz]
    psf = np.exp(-((np.mgrid[:15, :15][0] - 7.0) ** 2
                   + (np.mgrid[:15, :15][1] - 7.0) ** 2)
                 / (2 * (4 / 2.355) ** 2))
    cube = rng.standard_normal((n, sz, sz)) * 0.01
    cube += 50 * np.exp(-((yy - 20.0) ** 2 + (xx - 20.0) ** 2)
                        / (2 * (4 / 2.355) ** 2))
    angs = np.linspace(0, 40, n)

    pca_grid(cube, angs, fwhm=4.0, range_pcs=(1, 4), source_xy=(30, 20),
             mode="fullfr", plot=True, verbose=False, full_output=True)
    _assert_figs()

    firstguess_from_coord((30, 20), (20, 20), cube, angs, psf, 4.0,
                          annulus_width=4, aperture_radius=2,
                          f_range=np.array([1.0, 10.0, 100.0]),
                          plot=True, verbose=False)
    _assert_figs()

    frame_diff(cube, angs, fwhm=4.0, asize=4, ncomp=None, debug=True,
               verbose=False)
    _assert_figs()

    contrast_curve(cube, angs, psf, 4.0, pxscale=0.01, starphot=100.0,
                   algo=median_sub, nbranch=1, plot=False, debug=True,
                   verbose=False)
    _assert_figs(3)


@pytest.mark.slow
def test_recentering_plot_paths():
    from vip_tpu.preproc.recentering import (cube_recenter_2dfit,
                                             cube_recenter_dft_upsampling,
                                             cube_recenter_via_speckles,
                                             frame_center_radon)

    rng = np.random.default_rng(4)
    n, sz = 6, 41
    yy, xx = np.mgrid[:sz, :sz]
    cube = rng.standard_normal((n, sz, sz)) * 0.01
    for i in range(n):
        cube[i] += 30 * np.exp(-((yy - 20.0 - 0.3 * i) ** 2
                                 + (xx - 20.0 + 0.2 * i) ** 2)
                               / (2 * (4 / 2.355) ** 2))

    cube_recenter_dft_upsampling(cube, fwhm=4.0, plot=True, verbose=False)
    _assert_figs(2)
    cube_recenter_2dfit(cube, fwhm=4.0, subi_size=9, plot=True,
                        verbose=False)
    _assert_figs(2)
    cube_recenter_via_speckles(cube, plot=True, fwhm=4.0, gammaval=1,
                               min_spat_freq=0.5, max_spat_freq=3)
    _assert_figs(2)

    fr = rng.standard_normal((sz, sz)) * 0.01 + \
        30 * np.exp(-((yy - 20.35) ** 2 + (xx - 19.8) ** 2)
                    / (2 * (4 / 2.355) ** 2))
    frame_center_radon(fr, cropsize=35, hsize_ini=0.3, step_ini=0.1,
                       n_iter=1, plot=True, verbose=False)
    _assert_figs()
