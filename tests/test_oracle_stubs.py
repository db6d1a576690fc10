"""Self-validation of the oracle's functional stubs (VERDICT r3 #5).

The golden/parity suites compare vip_tpu against the mounted reference,
but in stub-backed branches BOTH sides execute the re-implemented
dependency math in ``tests/ref_oracle.py`` / ``tests/circ_overlap.py`` —
a shared-bug risk. This suite pins every stub to values that are
independent of both implementations: closed-form geometry, analytic
model values, known-truth recoveries, and published constants. It is the
honest closure of the reference's real-data fixtures (reference
tests/conftest.py:15-55) given no network access.
"""

import numpy as np
import pytest

import ref_oracle

ref_oracle._install_stubs()


# ---------------------------------------------------------------------
# exact circular-aperture overlap (tests/circ_overlap.py)
# ---------------------------------------------------------------------

def test_circle_rect_area_closed_forms():
    from circ_overlap import circle_rect_area

    r = 2.3
    area = np.pi * r * r
    # rectangle containing the whole circle
    assert np.isclose(circle_rect_area(-10, 10, -10, 10, r), area, atol=1e-12)
    # half plane and quadrant
    assert np.isclose(circle_rect_area(0, 10, -10, 10, r), area / 2,
                      atol=1e-12)
    assert np.isclose(circle_rect_area(0, 10, 0, 10, r), area / 4,
                      atol=1e-12)
    # tangent rectangle: zero overlap
    assert np.isclose(circle_rect_area(r, 2 * r, -10, 10, r), 0.0,
                      atol=1e-12)
    # circular segment cut at x = d: closed form
    # A = r^2 arccos(d/r) - d sqrt(r^2 - d^2)
    d = 0.8
    seg = r * r * np.arccos(d / r) - d * np.sqrt(r * r - d * d)
    assert np.isclose(circle_rect_area(d, 10, -10, 10, r), seg, atol=1e-12)
    # additivity: two halves sum to the whole
    left = circle_rect_area(-10, 0.37, -10, 10, r)
    right = circle_rect_area(0.37, 10, -10, 10, r)
    assert np.isclose(left + right, area, atol=1e-12)


def test_circular_overlap_weights_unit_and_total():
    from circ_overlap import circular_overlap_weights

    # total weight of a well-contained circle == its exact area
    r = 3.7
    w = circular_overlap_weights((21, 21), 10.2, 9.8, r)
    assert np.isclose(w.sum(), np.pi * r * r, atol=1e-10)
    # a pixel fully inside the circle has weight exactly 1, fully
    # outside exactly 0
    assert w[10, 10] == 1.0
    assert w[0, 0] == 0.0
    eps = 4 * np.finfo(float).eps
    assert ((w >= -eps) & (w <= 1 + eps)).all()


# ---------------------------------------------------------------------
# astropy.modeling stubs: analytic values + known-truth fit recovery
# ---------------------------------------------------------------------

def test_model2d_analytic_values():
    from astropy.modeling import models

    g = models.Gaussian2D(amplitude=3.0, x_mean=1.0, y_mean=-2.0,
                          x_stddev=1.5, y_stddev=2.5, theta=0.0)
    assert np.isclose(float(g(1.0, -2.0)), 3.0)
    # one stddev along each axis: amplitude * exp(-1/2)
    assert np.isclose(float(g(1.0 + 1.5, -2.0)), 3.0 * np.exp(-0.5))
    assert np.isclose(float(g(1.0, -2.0 + 2.5)), 3.0 * np.exp(-0.5))

    m = models.Moffat2D(amplitude=2.0, x_0=0.0, y_0=0.0, gamma=3.0,
                        alpha=1.5)
    # analytic: amp * (1 + (r/gamma)^2)^-alpha at r = gamma -> amp * 2^-alpha
    assert np.isclose(float(m(3.0, 0.0)), 2.0 * 2.0 ** -1.5)
    # Moffat FWHM: 2*gamma*sqrt(2^(1/alpha) - 1) (published closed form)
    assert np.isclose(m.fwhm, 2 * 3.0 * np.sqrt(2 ** (1 / 1.5) - 1))

    a = models.AiryDisk2D(amplitude=5.0, x_0=0.0, y_0=0.0, radius=4.0)
    assert np.isclose(float(a(0.0, 0.0)), 5.0)
    # first zero of the Airy pattern sits exactly at r = radius
    assert abs(float(a(4.0, 0.0))) < 1e-12


def test_levmar_fitter_recovers_known_gaussian():
    """Ground-truth recovery, independent of the fit-2d code paths on
    either side (the multi-start machinery of test_var_fit2d_oracle)."""
    from astropy.modeling import fitting, models

    truth = dict(amplitude=4.2, x_mean=13.3, y_mean=11.7, x_stddev=2.1,
                 y_stddev=1.6, theta=0.3)
    yy, xx = np.mgrid[:25, :25]
    data = models.Gaussian2D.evaluate(xx, yy, *[truth[k] for k in
                                      ("amplitude", "x_mean", "y_mean",
                                       "x_stddev", "y_stddev", "theta")])
    init = models.Gaussian2D(amplitude=3.0, x_mean=12.0, y_mean=12.0,
                             x_stddev=1.0, y_stddev=1.0, theta=0.0)
    fit = fitting.LevMarLSQFitter()(init, xx, yy, data)
    got = fit.parameters()
    expected = [truth[k] for k in ("amplitude", "x_mean", "y_mean",
                                   "x_stddev", "y_stddev", "theta")]
    assert np.allclose(got, expected, atol=1e-6)
    # covariance machinery produced a finite matrix
    cov = fitting.LevMarLSQFitter().fit_info.get("param_cov", 0)
    fitter = fitting.LevMarLSQFitter()
    fitter(init, xx, yy, data)
    assert fitter.fit_info["param_cov"] is not None


# ---------------------------------------------------------------------
# astropy.convolution / stats stubs
# ---------------------------------------------------------------------

def test_convolve_identity_nan_interp_and_norm_semantics():
    from astropy.convolution import convolve

    rng = np.random.default_rng(0)
    img = rng.standard_normal((12, 12))
    delta = np.zeros((3, 3))
    delta[1, 1] = 1.0
    # normalized delta kernel == identity
    assert np.allclose(convolve(img, delta), img, atol=1e-12)
    # NaN interpolation: a constant image with a NaN stays constant
    cim = np.full((10, 10), 7.0)
    cim[4, 5] = np.nan
    box = np.ones((3, 3))
    assert np.allclose(convolve(cim, box), 7.0, atol=1e-12)
    # normalize_kernel=False: plain convolution, zero-filled NaNs —
    # a zero-sum kernel on a constant image gives exactly zero
    lap = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], float)
    out = convolve(np.full((8, 8), 3.0), lap, normalize_kernel=False)
    assert np.allclose(out[2:-2, 2:-2], 0.0, atol=1e-12)


def test_sigma_clip_and_mad_std_closed_forms():
    from astropy.stats import mad_std, sigma_clipped_stats

    # gross outlier in an exactly-known inlier set
    inliers = np.array([1.0, 2.0, 3.0, 4.0, 5.0] * 4)
    data = np.concatenate([inliers, [1e6]])
    mean, med, std = sigma_clipped_stats(data, sigma=3.0)
    assert np.isclose(mean, inliers.mean())
    assert np.isclose(med, np.median(inliers))
    assert np.isclose(std, inliers.std())
    # mad_std of a known sequence: 1.4826... * median(|x - median|)
    x = np.array([1.0, 1.0, 2.0, 2.0, 4.0, 6.0, 9.0])
    expected = 1.482602218505602 * np.median(np.abs(x - np.median(x)))
    assert np.isclose(mad_std(x), expected)


# ---------------------------------------------------------------------
# skimage stubs
# ---------------------------------------------------------------------

def test_ssim_published_constant_image_form():
    """Wang et al. 2004 closed form on structure-free inputs: for
    constant images all (co)variances vanish and SSIM reduces to
    (2 mu1 mu2 + C1) / (mu1^2 + mu2^2 + C1) with C1 = (K1 L)^2."""
    from skimage.metrics import structural_similarity

    a = np.full((32, 32), 10.0)
    b = np.full((32, 32), 12.0)
    L = 255.0
    C1 = (0.01 * L) ** 2
    expected = (2 * 10.0 * 12.0 + C1) / (10.0 ** 2 + 12.0 ** 2 + C1)
    got = structural_similarity(a, b, data_range=L)
    assert np.isclose(got, expected, atol=1e-12)
    # identical images: exactly 1
    rng = np.random.default_rng(1)
    img = rng.random((32, 32))
    assert np.isclose(structural_similarity(img, img, data_range=1.0), 1.0)


def test_radon_sinusoid_and_mass_conservation():
    """A point source's projection follows the analytic sinogram
    sinusoid, and every projection conserves total mass — properties of
    the Radon transform itself, independent of the warp implementation."""
    from skimage.transform import radon

    n = 64
    y0, x0 = 40.0, 22.0      # blob center, offset from center (32, 32)
    yy, xx = np.mgrid[:n, :n]
    img = np.exp(-((yy - y0) ** 2 + (xx - x0) ** 2) / (2 * 2.0 ** 2))
    thetas = np.array([0.0, 30.0, 60.0, 90.0, 135.0])
    sino = radon(img, theta=thetas, circle=True)
    c = n // 2
    for i, th in enumerate(np.deg2rad(thetas)):
        # skimage's build_rotation inverse map: the blob lands on the
        # detector at s = c + (x-c) cos th - (y-c) sin th (skimage
        # transform matrices act on (col, row) with R = [[c, s], [-s, c]])
        expected = c + (x0 - c) * np.cos(th) - (y0 - c) * np.sin(th)
        got = np.average(np.arange(n), weights=np.maximum(sino[:, i], 0))
        assert abs(got - expected) < 0.1, (np.degrees(th), got, expected)
        # mass conservation of each projection (to bilinear-warp accuracy)
        assert np.isclose(sino[:, i].sum(), img.sum(), rtol=1e-3)


def test_phase_cross_correlation_known_subpixel_shift():
    from skimage.registration import phase_cross_correlation

    rng = np.random.default_rng(2)
    from scipy.ndimage import gaussian_filter

    ref = gaussian_filter(rng.standard_normal((64, 64)), 2.0)
    dy, dx = -3.37, 2.81
    # shift with an exact FFT phase ramp (periodic, so exactly known)
    fy = np.fft.fftfreq(64)[:, None]
    fx = np.fft.fftfreq(64)[None, :]
    mov = np.real(np.fft.ifft2(np.fft.fft2(ref)
                               * np.exp(-2j * np.pi * (fy * dy + fx * dx))))
    shifts, _, _ = phase_cross_correlation(ref, mov, upsample_factor=100)
    assert np.allclose(shifts, [-dy, -dx], atol=0.01), shifts


def test_draw_disk_ellipse_membership():
    from skimage.draw import disk, ellipse

    # non-integer radius -> boundary-tie-free exact membership
    rr, cc = disk((10.0, 12.0), 4.3, shape=(24, 24))
    got = set(zip(rr.tolist(), cc.tolist()))
    yy, xx = np.mgrid[:24, :24]
    want = set(zip(*[a.tolist() for a in np.nonzero(
        (yy - 10.0) ** 2 + (xx - 12.0) ** 2 < 4.3 ** 2)]))
    assert got == want

    rr, cc = ellipse(10.0, 12.0, 3.3, 5.1, shape=(24, 24))
    got = set(zip(rr.tolist(), cc.tolist()))
    want = set(zip(*[a.tolist() for a in np.nonzero(
        ((yy - 10.0) / 3.3) ** 2 + ((xx - 12.0) / 5.1) ** 2 < 1)]))
    assert got == want


def test_peak_local_max_two_known_peaks():
    from skimage.feature import peak_local_max

    img = np.zeros((30, 30))
    img[8, 9] = 5.0
    img[20, 22] = 7.0
    peaks = peak_local_max(img, min_distance=3, threshold_abs=1.0)
    assert [tuple(p) for p in peaks] == [(20, 22), (8, 9)]  # intensity order


def test_richardson_lucy_delta_psf_identity():
    from skimage.restoration import richardson_lucy

    rng = np.random.default_rng(3)
    img = rng.random((16, 16)) * 0.8 + 0.1
    psf = np.zeros((5, 5))
    psf[2, 2] = 1.0
    out = richardson_lucy(img, psf, num_iter=20, clip=True)
    assert np.allclose(out, img, atol=1e-6)


# ---------------------------------------------------------------------
# photutils stub
# ---------------------------------------------------------------------

def test_centroid_com_exact_point_mass():
    from photutils.centroids import centroid_com

    img = np.zeros((15, 17))
    img[4, 11] = 2.5
    assert np.allclose(centroid_com(img), [11.0, 4.0])
    # two equal masses: centroid at the midpoint
    img[10, 3] = 2.5
    assert np.allclose(centroid_com(img), [7.0, 7.0])
