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


def test_confidence_parity(data):
    """Exact CI parity incl. the n_arg_max convention and the (buggy,
    replicated) force=True raise (reference negfc_mcmc.py:1610-1691)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from vip_tpu.fm.negfc_mcmc import confidence

    ref_mcmc = load_ref("vip_hci.fm.negfc_mcmc")
    rng = np.random.default_rng(3)
    for _ in range(3):
        samp = rng.normal(size=(400, 3)) * [1.0, 5.0, 10.0] \
            + [20.0, 45.0, 100.0]
        a_val, a_ci = confidence(samp, bins=30, verbose=False)
        b_val, b_ci = ref_mcmc.confidence(samp, bins=30, verbose=False)
        for lab in ("r", "theta", "f"):
            assert abs(a_val[lab] - b_val[lab]) < 1e-10
            assert np.allclose(a_ci[lab], b_ci[lab])
        mu_a, sig_a = confidence(samp, bins=30, gaussian_fit=True,
                                 verbose=False)
        mu_b, sig_b = ref_mcmc.confidence(samp, bins=30, gaussian_fit=True,
                                          verbose=False)
        assert np.allclose(mu_a, mu_b) and np.allclose(sig_a, sig_b)
        plt.close("all")

    # single-bin percentile + force=True raises (as the reference does)
    degenerate = np.full((50, 1), 7.0) + 1e-12 * rng.standard_normal((50, 1))
    degenerate[0] = 100.0  # one outlier -> cfd reached in one bin
    with pytest.raises(ValueError):
        confidence(degenerate, bins=10, labels=["f"], verbose=False,
                   force=True)
    plt.close("all")


def test_more_untested_symbols_parity(data):
    """Exact parity probes for symbols previously only covered indirectly:
    mask_ellipse (stub ellipse now implements skimage rotation), hessian,
    get_pca_coeffs, nan_corr_2d, reshape_matrix, thresholding, rofunc,
    idl_where, chain_zero_truncated, collapse_psf_cube, iuwt_recomposition."""
    fr, cube = data
    rng = np.random.default_rng(6)

    rs = load_ref("vip_hci.var.shapes")
    from vip_tpu.var.shapes import mask_ellipse, reshape_matrix

    for (a, b, th) in [(5, 9, 30.0), (7, 3, 0.0), (4, 11, 117.0)]:
        for mode in ("in", "out"):
            assert np.array_equal(
                mask_ellipse(fr, a, b, th, mode=mode),
                rs.mask_ellipse(fr, a, b, th, mode=mode))
    m = rng.standard_normal((8, 45 * 45))
    assert np.array_equal(reshape_matrix(m, 45, 45),
                          rs.reshape_matrix(m, 45, 45))

    rm = load_ref("vip_hci.fm.negfc_fmerit")
    from vip_tpu.fm.negfc_fmerit import hessian

    assert np.array_equal(np.asarray(hessian(fr)),
                          np.asarray(rm.hessian(fr)))

    rmc = load_ref("vip_hci.fm.negfc_mcmc")
    from vip_tpu.fm.negfc_mcmc import chain_zero_truncated

    ch = rng.standard_normal((4, 20, 3))
    ch[:, 15:] = 0
    assert np.array_equal(chain_zero_truncated(ch),
                          rmc.chain_zero_truncated(ch))

    rp = load_ref("vip_hci.psfsub.pca_fullfr")
    from vip_tpu.psfsub.pca_fullfr import get_pca_coeffs
    from vip_tpu.psfsub.svd import svd_wrapper
    from vip_tpu.var.shapes import prepare_matrix

    mat = prepare_matrix(cube, scaling=None, verbose=False)
    pcs = np.asarray(svd_wrapper(mat, "lapack", 3, False))
    assert np.array_equal(get_pca_coeffs(cube, pcs, 3, verbose=False),
                          rp.get_pca_coeffs(cube, pcs, 3, verbose=False))

    rl = load_ref("vip_hci.psfsub.llsg")
    from vip_tpu.psfsub.llsg import thresholding

    for mode in ("soft", "hard", "nng", "greater", "less"):
        assert np.array_equal(thresholding(fr, 1.0, mode),
                              rl.thresholding(fr, 1.0, mode))

    ra = load_ref("vip_hci.invprob.utils_andro")
    from vip_tpu.invprob.utils_andro import idl_where, rofunc

    assert np.array_equal(np.asarray(idl_where(fr > 5)),
                          np.asarray(ra.idl_where(fr > 5)))
    x, y = np.arange(20.0), 2 * np.arange(20.0) + rng.standard_normal(20)
    assert np.allclose(np.asarray(rofunc(x, y, 2.0)),
                       np.asarray(ra.rofunc(x, y, 2.0)))

    rcos = load_ref("vip_hci.preproc.cosmetics")
    from vip_tpu.preproc.cosmetics import nan_corr_2d

    frn = fr.copy()
    frn[3, 4] = np.nan
    frn[20, 25] = np.nan
    o = nan_corr_2d(frn.copy(), 3, 3, False, False)
    t = rcos.nan_corr_2d(frn.copy(), 3, 3, False, False)
    assert np.array_equal(np.asarray(o[0]), np.asarray(t[0]))

    rf = load_ref("vip_hci.fm.fakecomp")
    from vip_tpu.fm.fakecomp import collapse_psf_cube

    psfcube = np.abs(rng.standard_normal((8, 15, 15))) + 1
    assert np.allclose(collapse_psf_cube(psfcube, 9, verbose=False),
                       rf.collapse_psf_cube(psfcube, 9, verbose=False),
                       atol=1e-7)

    riu = load_ref("vip_hci.var.iuwt")
    from vip_tpu.var.iuwt import iuwt_decomposition, iuwt_recomposition

    dec = np.asarray(iuwt_decomposition(fr, 3))
    assert np.allclose(iuwt_recomposition(dec, 0),
                       riu.iuwt_recomposition(dec, 0), atol=1e-9)


def test_qu_to_quphi_intent():
    """The reference QU_to_QUphi is upstream-broken (passes
    north_convention to cart_to_pol, which only accepts astro_convention —
    TypeError on every call; reference coords.py:316,103). Assert our
    vectorized version implements the documented intent."""
    from vip_tpu.var.coords import QU_to_QUphi, frame_center

    rng = np.random.default_rng(7)
    Q, U = rng.standard_normal((2, 21, 21))
    Qphi, Uphi = QU_to_QUphi(Q, U, delta_x=0.3, delta_y=-0.2, scale_r2=True)
    # pixel-wise intent (the reference loop with the kwarg bug fixed)
    cy, cx = frame_center(Q)
    jj, ii = 13, 5
    x = ii - cx - 0.3
    y = jj - cy + 0.2
    rho = np.hypot(y, x)
    phi = np.arctan2(y, x)
    assert np.isclose(Qphi[jj, ii],
                      (Q[jj, ii] * np.cos(2 * phi)
                       + U[jj, ii] * np.sin(2 * phi)) * rho ** 2)
    assert np.isclose(Uphi[jj, ii],
                      (-Q[jj, ii] * np.sin(2 * phi)
                       + U[jj, ii] * np.cos(2 * phi)) * rho ** 2)
    # north convention rotates phi by -90 deg
    Qn, _ = QU_to_QUphi(Q, U, north_convention=True)
    phin = np.arctan2(jj - cy, ii - cx) - np.deg2rad(90)
    assert np.isclose(Qn[jj, ii], Q[jj, ii] * np.cos(2 * phin)
                      + U[jj, ii] * np.sin(2 * phin))
