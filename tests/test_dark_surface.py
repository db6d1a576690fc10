"""Oracle parity for the less-traveled public API ("dark surface").

These functions had no direct test references; the NaN-rescale and
cube_correct_nan bugs both hid there. Each case compares against the
reference running in-process, bit-exact unless noted.
"""

import numpy as np
import pytest

from ref_oracle import load_ref


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(2)
    fr = rng.standard_normal((45, 45)) + 10
    cube = rng.standard_normal((8, 45, 45)) + 10
    return fr, cube


def test_cosmetics_parity(data):
    from vip_tpu import preproc

    rp = load_ref("vip_hci.preproc")
    rcos = load_ref("vip_hci.preproc.cosmetics")
    fr, cube = data

    assert np.array_equal(preproc.frame_crop(fr, 21, verbose=False),
                          rp.frame_crop(fr, 21, verbose=False))
    assert np.array_equal(preproc.cube_crop_frames(cube, 21, verbose=False),
                          rp.cube_crop_frames(cube, 21, verbose=False))
    assert np.array_equal(preproc.frame_pad(fr, 1.5), rp.frame_pad(fr, 1.5))
    o = preproc.cube_drop_frames(cube, 2, 6, np.linspace(0, 40, 8),
                                 verbose=False)
    r = rp.cube_drop_frames(cube, 2, 6, np.linspace(0, 40, 8), verbose=False)
    assert np.array_equal(o[0], r[0]) and np.array_equal(o[1], r[1])
    assert np.array_equal(preproc.frame_remove_stripes(fr.copy()),
                          rcos.frame_remove_stripes(fr.copy()))


def test_cube_correct_nan_parity(data):
    """NaN correction must ride the same iterative median-of-good-
    neighbours sigma filter as the reference (cosmetics.py:313-453)."""
    from vip_tpu import preproc

    rp = load_ref("vip_hci.preproc")
    _, cube = data
    nc = cube.copy()
    nc[:, 3, 4] = np.nan
    nc[2, 20, 20] = np.nan
    nc[5, 0, 0] = np.nan          # corner: few neighbours
    nc[:, 10:13, 10:13] = np.nan  # clump: needs iteration
    o = preproc.cube_correct_nan(nc.copy(), verbose=False)
    r = rp.cube_correct_nan(nc.copy(), verbose=False)
    assert np.isfinite(o).all()
    assert np.array_equal(np.asarray(o, float), np.asarray(r, float))


def test_approx_stellar_position_parity(data):
    from vip_tpu import preproc

    rp = load_ref("vip_hci.preproc")
    _, cube = data
    # plant a star drifting across channels + one outlier channel
    yy, xx = np.mgrid[:45, :45]
    c = cube.copy()
    for i in range(len(c)):
        c[i] += 50 * np.exp(-((yy - 22 - i % 3) ** 2 + (xx - 21) ** 2) / 8.0)
    c[4] = cube[4]  # no star: outlier channel
    o = preproc.approx_stellar_position(c.copy(), 4.0, return_test=True)
    r = rp.approx_stellar_position(c.copy(), 4.0, return_test=True)
    assert np.array_equal(o[0], r[0])
    assert np.array_equal(o[1], r[1])


def test_peak_coordinates_parity(data):
    from vip_tpu import metrics

    rm = load_ref("vip_hci.metrics")
    fr, cube = data
    assert tuple(metrics.peak_coordinates(fr, 4.0)) == \
        tuple(rm.peak_coordinates(fr, 4.0))
    o = metrics.peak_coordinates(cube, 4.0)           # (zz, yy, xx)
    r = rm.peak_coordinates(cube, 4.0)
    assert tuple(o) == tuple(r) and len(o) == 3
    o2, och = metrics.peak_coordinates(cube, 4.0, channels_peak=True)
    r2, rch = rm.peak_coordinates(cube, 4.0, channels_peak=True)
    assert tuple(o2) == tuple(r2)
    assert np.array_equal(och, rch)


def test_shapes_coords_parity(data):
    from vip_tpu import var

    rv = load_ref("vip_hci.var")
    fr, _ = data
    assert np.array_equal(var.get_square(fr, 11, 20, 22),
                          rv.get_square(fr, 11, 20, 22))
    for o, r in zip(var.get_ellipse(fr, 12, 6, 30.0),
                    rv.get_ellipse(fr, 12, 6, 30.0)):
        assert np.array_equal(o, r)
    for o, r in zip(var.get_ell_annulus(fr, 10, 5, 30.0, 4.0),
                    rv.get_ell_annulus(fr, 10, 5, 30.0, 4.0)):
        assert np.array_equal(o, r)
    for o, r in zip(var.get_annular_wedge(fr, 8, 4, wedge=(10, 80)),
                    rv.get_annular_wedge(fr, 8, 4, wedge=(10, 80))):
        assert np.array_equal(o, r)
    assert np.array_equal(
        var.create_ringed_spider_mask(fr.shape, 18, 4, 2, 30),
        rv.create_ringed_spider_mask(fr.shape, 18, 4, 2, 30))
    assert np.array_equal(var.dist_matrix(31), rv.dist_matrix(31))
    assert var.cart_to_pol(30.0, 20.0) == rv.cart_to_pol(30.0, 20.0)
    assert var.pol_to_cart(10.0, 45.0) == rv.pol_to_cart(10.0, 45.0)
    assert var.pol_to_eq(10.0, 45.0) == rv.pol_to_eq(10.0, 45.0)


def test_stats_parity(data):
    from vip_tpu import stats

    rs = load_ref("vip_hci.stats")
    fr, cube = data
    o = stats.frame_basic_stats(fr, plot=False)
    r = rs.frame_basic_stats(fr, plot=False)
    assert np.allclose(np.asarray(o, float), np.asarray(r, float))
    o = stats.cube_basic_stats(cube, plot=False)
    r = rs.cube_basic_stats(cube, plot=False)
    for a, b in zip(np.atleast_1d(o), np.atleast_1d(r)):
        assert np.allclose(np.asarray(a, float), np.asarray(b, float))
    o = stats.descriptive_stats(fr.ravel(), verbose=False, plot=False)
    r = rs.descriptive_stats(fr.ravel(), verbose=False, plot=False)
    assert np.allclose(np.asarray(o, float), np.asarray(r, float))


def test_px_resampling_parity(data):
    """FFT zoom replicates the reference's float32-canvas quirk
    (rescaling.py:1168), so parity is at the f32 floor."""
    from vip_tpu import preproc

    rp = load_ref("vip_hci.preproc")
    fr, cube = data
    o = preproc.frame_px_resampling(fr, 1.3, verbose=False)
    r = rp.frame_px_resampling(fr, 1.3, verbose=False)
    assert o.shape == r.shape
    assert np.nanmax(np.abs(np.asarray(o, float) - r)) < 1e-5
    o = preproc.cube_px_resampling(cube, 0.7, verbose=False)
    r = rp.cube_px_resampling(cube, 0.7, verbose=False)
    assert o.shape == r.shape
    assert np.nanmax(np.abs(np.asarray(o, float) - r)) < 1e-4


def test_subsample_and_highpass_parity(data):
    from vip_tpu import preproc, var

    rp = load_ref("vip_hci.preproc")
    rv = load_ref("vip_hci.var")
    fr, cube = data
    assert np.array_equal(preproc.cube_subsample(cube, 3, verbose=False),
                          rp.cube_subsample(cube, 3, verbose=False))
    assert np.array_equal(preproc.cube_subsample_trimmean(cube, 2, 3),
                          rp.cube_subsample_trimmean(cube, 2, 3))
    o = var.cube_filter_highpass(cube, "laplacian", verbose=False)
    r = rv.cube_filter_highpass(cube, "laplacian", verbose=False)
    assert np.array_equal(np.asarray(o), np.asarray(r))
    with pytest.raises(ValueError):
        var.frame_filter_highpass(fr, "laplacian", kernel_size=4)


def test_stim_and_report_parity(data):
    from vip_tpu import metrics

    rm = load_ref("vip_hci.metrics")
    _, cube = data
    ang = np.linspace(0, 40, 8)
    assert np.allclose(metrics.inverse_stim_map(cube, ang),
                       rm.inverse_stim_map(cube, ang), atol=1e-10)
    fr_rep = np.asarray(cube, float).mean(axis=0)
    for o, r in zip(metrics.frame_report(fr_rep, 4.0, verbose=False),
                    rm.frame_report(fr_rep, 4.0, verbose=False)):
        assert np.allclose(np.asarray(o, float), np.asarray(r, float),
                           atol=1e-10)


def test_fm_invprob_helper_parity(data):
    """NEGFC merit helpers and the ANDROMEDA radial-profile utility."""
    import importlib

    ofm = importlib.import_module("vip_tpu.fm.negfc_fmerit")
    oa = importlib.import_module("vip_tpu.invprob.andromeda")
    rfm = load_ref("vip_hci.fm.negfc_fmerit")
    ra = load_ref("vip_hci.invprob.andromeda")
    fr, cube = data
    # 61x61 geometry so the NEGFC annulus fits
    rng = np.random.default_rng(4)
    cube61 = rng.standard_normal((8, 61, 61)) + 10
    ang = np.linspace(0, 40, 8)

    o = ofm.get_mu_and_sigma(cube61, ang, 1, 4, 1.5, 4.0, 12.0, 30.0)
    r = rfm.get_mu_and_sigma(cube61, ang, 1, 4, 1.5, 4.0, 12.0, 30.0)
    assert np.allclose(np.asarray(o, float), np.asarray(r, float))

    o = ofm.get_values_optimize(cube61, ang, 2, 4.0, 2.0, 4.0, 12.0, 30.0)
    r = rfm.get_values_optimize(cube61, ang, 2, 4.0, 2.0, 4.0, 12.0, 30.0)
    assert np.allclose(np.asarray(o, float), np.asarray(r, float),
                       atol=1e-12)

    for o, r in zip(oa.couronne_img(cube61.mean(axis=0), 30.0),
                    ra.couronne_img(cube61.mean(axis=0), 30.0)):
        assert np.allclose(np.asarray(o, float), np.asarray(r, float))


def test_mask_source_centers_parity(data):
    from vip_tpu import metrics

    rm = load_ref("vip_hci.metrics")
    fr, _ = data
    assert np.array_equal(metrics.mask_source_centers(fr, 4.0, [22], [25]),
                          rm.mask_source_centers(fr, 4.0, [22], [25]))


def test_svdecomposer_parity(data):
    """SVDecomposer CEVR tooling matches the reference end-to-end."""
    from vip_tpu.psfsub import SVDecomposer

    rps = load_ref("vip_hci.psfsub")
    _, cube = data
    o = SVDecomposer(cube, mode="fullfr", svd_mode="lapack",
                     scaling="temp-standard", verbose=False)
    r = rps.SVDecomposer(cube, mode="fullfr", svd_mode="lapack",
                         scaling="temp-standard", verbose=False)
    odf = o.get_cevr(plot=False)
    rdf = r.get_cevr(plot=False)
    assert np.allclose(np.asarray(o.cevr, float), np.asarray(r.cevr, float))
    on = o.cevr_to_ncomp(0.9)
    rn = r.cevr_to_ncomp(0.9)
    assert on == rn
    # annular mode
    o2 = SVDecomposer(cube, mode="annular", inrad=5, outrad=18,
                      svd_mode="lapack", scaling="temp-standard",
                      verbose=False)
    r2 = rps.SVDecomposer(cube, mode="annular", inrad=5, outrad=18,
                          svd_mode="lapack", scaling="temp-standard",
                          verbose=False)
    o2.get_cevr(plot=False)
    r2.get_cevr(plot=False)
    assert np.allclose(np.asarray(o2.cevr, float),
                       np.asarray(r2.cevr, float))


def test_filter_mode_matrix_parity(data):
    """Every highpass/lowpass mode on even and odd frames, incl. the
    zero-sum laplacian-conv kernels, the pixel-scaled Butterworth filter
    and masked gauss; <=1e-12 vs the reference."""
    from vip_tpu import var

    rv = load_ref("vip_hci.var")
    rng = np.random.default_rng(6)
    frames = [rng.standard_normal((46, 46)) + 10,
              rng.standard_normal((45, 45)) + 10]
    yy, xx = np.mgrid[:13, :13]
    psfn = np.exp(-((yy - 6) ** 2 + (xx - 6) ** 2) / (2 * (4 / 2.355) ** 2))
    psfn = psfn / psfn.sum()

    def close(o, r, tol=1e-12):
        assert np.nanmax(np.abs(np.asarray(o, float)
                                - np.asarray(r, float))) < tol

    for f in frames:
        for mode in ("laplacian", "laplacian-conv", "median-subt",
                     "gauss-subt", "fourier-butter", "hann"):
            close(var.frame_filter_highpass(f.copy(), mode),
                  rv.frame_filter_highpass(f.copy(), mode))
        for mode in ("median", "gauss"):
            close(var.frame_filter_lowpass(f.copy(), mode),
                  rv.frame_filter_lowpass(f.copy(), mode))
        close(var.frame_filter_lowpass(f.copy(), "psf", psf=psfn),
              rv.frame_filter_lowpass(f.copy(), "psf", psf=psfn))
    f = frames[1]
    for ks in (5, 7):
        close(var.frame_filter_highpass(f.copy(), "laplacian-conv",
                                        kernel_size=ks),
              rv.frame_filter_highpass(f.copy(), "laplacian-conv",
                                       kernel_size=ks))
    mask = np.zeros_like(f, bool)
    mask[10:14, 10:14] = True
    close(var.frame_filter_highpass(f.copy(), "gauss-subt", mask=mask),
          rv.frame_filter_highpass(f.copy(), "gauss-subt", mask=mask))
