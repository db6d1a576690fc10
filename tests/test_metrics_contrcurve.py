"""Parity tests for contrast curves / throughput / noise_per_annulus."""

import numpy as np
import pytest

from conftest import make_adi_cube
from ref_oracle import load_ref


@pytest.fixture(scope="module")
def ref_contr():
    return load_ref("vip_hci.metrics.contrcurve")


@pytest.fixture(scope="module")
def data():
    cube, angles = make_adi_cube(n=20, size=61)
    yy, xx = np.mgrid[:19, :19]
    sigma = 4.0 / 2.355
    psf = np.exp(-((yy - 9) ** 2 + (xx - 9) ** 2) / (2 * sigma**2))
    return cube, angles, psf


def test_noise_per_annulus_parity(ref_contr, data):
    from vip_tpu.metrics import noise_per_annulus

    cube, angles, psf = data
    frame = cube[0]
    ref = ref_contr.noise_per_annulus(frame, separation=4.0, fwhm=4.0)
    got = noise_per_annulus(frame, separation=4.0, fwhm=4.0)
    for r, g in zip(ref, got):
        assert np.allclose(r, g, atol=1e-8)


def test_aperture_flux_parity(ref_contr, data):
    from vip_tpu.metrics.contrcurve import aperture_flux

    cube, angles, psf = data
    frame = cube[0]
    yc = [30.0, 20.5, 44.2]
    xc = [31.0, 40.1, 12.9]
    ref = ref_contr.aperture_flux(frame, yc, xc, 4.0)
    got = aperture_flux(frame, yc, xc, 4.0)
    assert np.allclose(ref, got, atol=1e-8)


def test_contrast_curve_parity(ref_contr, data):
    """Full contrast-curve parity with pca as the black-box algo on both
    sides (each side running its own pca implementation)."""
    import vip_tpu.psfsub as tpu_psfsub
    from vip_tpu.metrics import contrast_curve

    ref_psfsub = load_ref("vip_hci.psfsub")
    cube, angles, psf = data

    kwargs = dict(fwhm=4.0, pxscale=0.027, starphot=5000.0, sigma=5,
                  nbranch=1, inner_rad=1, fc_rad_sep=3, plot=False,
                  verbose=False, ncomp=5)
    ref = ref_contr.contrast_curve(cube.copy(), angles, psf.copy(),
                                   algo=ref_psfsub.pca, **kwargs)
    got = contrast_curve(cube.copy(), angles, psf.copy(),
                         algo=tpu_psfsub.pca, **kwargs)
    for col in ["sensitivity_gaussian", "sensitivity_student", "throughput",
                "distance", "noise"]:
        r = np.asarray(ref[col], dtype=float)
        g = np.asarray(got[col], dtype=float)
        assert r.shape == g.shape, col
        assert np.allclose(r, g, rtol=1e-4, atol=1e-7), col
