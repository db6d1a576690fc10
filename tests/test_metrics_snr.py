"""Parity tests for S/N metrics vs the reference (photutils replaced by an
independent numpy exact-overlap implementation in the oracle stubs)."""

import numpy as np
import pytest

from ref_oracle import load_ref


@pytest.fixture(scope="module")
def ref_snr():
    return load_ref("vip_hci.metrics.snr_source")


@pytest.fixture(scope="module")
def frame():
    rng = np.random.default_rng(3)
    from scipy.ndimage import gaussian_filter

    fr = gaussian_filter(rng.standard_normal((61, 61)), 1.5)
    fr[40, 35] += 2.0  # fake blob
    return fr


def test_aperture_flux_matches_exact_overlap(frame):
    """JAX exact-overlap photometry vs the independent numpy implementation
    (and a Monte-Carlo area check)."""
    import jax.numpy as jnp
    from vip_tpu.ops.apertures import aperture_flux
    from circ_overlap import CircularAperture, aperture_photometry

    ys = np.array([30.3, 12.7, 45.0])
    xs = np.array([31.9, 40.2, 10.5])
    r = 2.3
    got = np.asarray(aperture_flux(jnp.asarray(frame), ys, xs, r))
    apers = CircularAperture(list(zip(xs, ys)), r)
    ref = aperture_photometry(frame, apers)["aperture_sum"]
    assert np.allclose(got, ref, atol=1e-10)

    # Monte-Carlo check of the overlap area itself on a uniform image
    ones = np.ones_like(frame)
    area = np.asarray(aperture_flux(jnp.asarray(ones), ys[:1], xs[:1], r))[0]
    assert abs(area - np.pi * r**2) < 1e-8


@pytest.mark.parametrize("xy", [(35, 40), (20, 15), (42, 30)])
def test_snr_parity(ref_snr, frame, xy):
    from vip_tpu.metrics import snr

    ref = ref_snr.snr(frame, xy, fwhm=4.0)
    got = snr(frame, xy, fwhm=4.0)
    assert abs(ref - got) < 1e-8


def test_snr_exclude_lobes_parity(ref_snr, frame):
    from vip_tpu.metrics import snr

    ref = ref_snr.snr(frame, (35, 40), fwhm=4.0,
                      exclude_negative_lobes=True)
    got = snr(frame, (35, 40), fwhm=4.0, exclude_negative_lobes=True)
    assert abs(ref - got) < 1e-8


@pytest.mark.slow
def test_snrmap_parity(ref_snr, frame):
    from vip_tpu.metrics import snrmap

    ref = ref_snr.snrmap(frame, fwhm=4.0, plot=False, verbose=False, nproc=1)
    got = snrmap(frame, fwhm=4.0, plot=False, verbose=False)
    assert ref.shape == got.shape
    assert np.max(np.abs(ref - got)) < 1e-7


def test_significance_parity(ref_snr):
    from vip_tpu.metrics import significance

    ref = ref_snr.significance(5.0, rad=12.0, fwhm=4.0, verbose=False)
    got = significance(5.0, rad=12.0, fwhm=4.0, verbose=False)
    assert abs(ref - got) < 1e-10


def test_snrmap_fast_matches_exact():
    """Polar fast S/N map tracks the exact engine (detection-map grade)."""
    import numpy as np
    from vip_tpu.metrics.snr_source import snrmap, snrmap_fast

    rng = np.random.default_rng(0)
    sz = 100
    fr = rng.standard_normal((sz, sz)).astype(np.float32)
    yy, xx = np.mgrid[:sz, :sz]
    fr += 8 * np.exp(-((yy - 35)**2 + (xx - 70)**2) / 4.0)
    exact = snrmap(fr, 4.0, plot=False, verbose=False)
    fast = snrmap_fast(fr, 4.0)
    m = (np.hypot(yy - 50, xx - 50) > 6) & (np.hypot(yy - 50, xx - 50) < 42)
    corr = np.corrcoef(fast[m], exact[m])[0, 1]
    assert corr > 0.98
    # the injected source is a strong detection in both
    assert fast[35, 70] > 10 and exact[35, 70] > 10
    # relative peak agreement within 10%
    assert abs(fast[35, 70] - exact[35, 70]) / exact[35, 70] < 0.1
