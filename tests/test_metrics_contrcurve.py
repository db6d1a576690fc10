"""Parity tests for contrast curves / throughput / noise_per_annulus."""

import numpy as np
import pytest

from conftest import make_adi_cube
from ref_oracle import load_ref

pytestmark = pytest.mark.slow


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


def test_throughput_batched_equals_serial(data):
    """SURVEY §3.3: all injection patterns through one vmapped program
    must reproduce the serial black-box loop."""
    import vip_tpu.psfsub as tpu_psfsub
    from vip_tpu.metrics.contrcurve import throughput

    cube, angles, psf = data
    cube = cube[:12, 10:51, 10:51]
    angles = angles[:12]
    kw = dict(nbranch=1, theta=0, inner_rad=1, fc_rad_sep=3, verbose=False,
              ncomp=3)
    th_s, rad_s = throughput(cube.copy(), angles, psf, 4.0, tpu_psfsub.pca,
                             batch_patterns=False, **kw)
    th_b, rad_b = throughput(cube.copy(), angles, psf, 4.0, tpu_psfsub.pca,
                             batch_patterns=True, **kw)
    assert np.allclose(rad_s, rad_b)
    assert np.allclose(th_s, th_b, atol=1e-8)


def test_inject_ladder_device_matches_host(data):
    """ops/inject.py device ladder == repeated cube_inject_companions
    (fm/fakecomp.py host path), incl. an edge-clipped rung and zero-flux
    K-padding."""
    import jax
    import jax.numpy as jnp

    from vip_tpu.fm.fakecomp import cube_inject_companions
    from vip_tpu.ops.inject import inject_ladder_adi

    cube, angles, psf = data
    cube = np.asarray(cube[:10], dtype=float)
    angles = angles[:10]
    rads = [6.0, 13.5, 21.0, 27.0]      # 27 px: stamp clips the 61-frame
    fluxes = [20.0, 8.0, 4.0, 3.0]      # edge at some parangles
    theta = 57.0
    host = cube.copy()
    for r, f in zip(rads, fluxes):
        host = cube_inject_companions(host, psf, angles, f, rad_dists=[r],
                                      theta=theta, copy_array=False,
                                      verbose=False)
    dev = np.asarray(jax.jit(inject_ladder_adi)(
        jnp.asarray(cube), jnp.asarray(psf), jnp.asarray(angles),
        jnp.asarray(np.r_[rads, 0.0]), jnp.asarray(np.r_[fluxes, 0.0]),
        jnp.asarray(np.deg2rad(theta))))
    assert np.max(np.abs(host - dev)) < 1e-10


def test_contrast_curve_4d_parity(ref_contr):
    """4D/IFS contrast curve vs the reference oracle (both sides run
    their own pca; reference 4D branch contrcurve.py:950-1077)."""
    from scipy.ndimage import gaussian_filter

    import vip_tpu.psfsub as tpu_psfsub
    from vip_tpu.metrics.contrcurve import contrast_curve
    from vip_tpu.preproc.rescaling import frame_rescaling

    rng = np.random.default_rng(9)
    z, n, size = 4, 8, 40
    lbdas = np.linspace(1.0, 1.3, z)
    scal = lbdas[-1] / lbdas
    speck = gaussian_filter(rng.standard_normal((size, size)), 2.0) * 5
    cube = np.empty((z, n, size, size))
    for ch in range(z):
        sp = frame_rescaling(speck.copy(), scale=1 / scal[ch])
        for fr in range(n):
            cube[ch, fr] = sp + gaussian_filter(
                rng.standard_normal((size, size)), 1.0) * 0.3
    angles = np.linspace(0, 40, n)
    kk = 15
    yy, xx = np.mgrid[:kk, :kk]
    sigma = 4.0 / 2.355
    psf = np.exp(-((yy - 7) ** 2 + (xx - 7) ** 2) / (2 * sigma ** 2))
    psf3 = np.stack([psf] * z)
    fwhm = [4.0] * z

    ref_psfsub = load_ref("vip_hci.psfsub")
    kw = dict(sigma=5, nbranch=1, theta=0, inner_rad=1, fc_rad_sep=3,
              plot=False, verbose=False, ncomp=2, scale_list=scal)
    ours = contrast_curve(cube.copy(), angles.copy(), psf3.copy(), fwhm,
                          0.01, 1000., tpu_psfsub.pca, **kw)
    theirs = ref_contr.contrast_curve(cube.copy(), angles.copy(),
                                      psf3.copy(), fwhm, 0.01, 1000.,
                                      ref_psfsub.pca, **kw)
    for col in ("sensitivity_gaussian", "sensitivity_student", "throughput",
                "distance", "noise"):
        a = np.asarray(ours[col], dtype=float)
        b = np.asarray(theirs[col], dtype=float)
        rel = np.nanmax(np.abs(a - b) / np.maximum(np.abs(b), 1e-30))
        assert rel < 1e-6, (col, rel)
