"""Coverage tests for smaller modules: speckle-noise uncertainty, image
stats, spectral correlation, deconvolution, parangles, ds9 gating."""

import numpy as np
import pytest

from conftest import make_adi_cube


def test_frame_average_radprofile_and_histo():
    from vip_tpu.stats.im_stats import (frame_average_radprofile,
                                        frame_histo_stats)
    yy, xx = np.mgrid[:41, :41]
    r = np.hypot(yy - 20, xx - 20)
    fr = np.exp(-r / 5.0)
    df = frame_average_radprofile(fr, plot=False)
    prof = np.asarray(df["radprof"])
    assert np.all(np.diff(prof) < 0)  # monotonically decreasing
    df2, subtr = frame_average_radprofile(fr, subtr_profile=True,
                                          plot=False)
    assert np.abs(subtr).max() < 0.2  # profile subtraction removes most
    stats = frame_histo_stats(fr, plot=False)
    assert stats[3] == pytest.approx(1.0)  # max


def test_spectral_correlation():
    from vip_tpu.stats.distances import spectral_correlation
    rng = np.random.default_rng(0)
    n_ch, sz = 6, 41
    common = rng.normal(0, 1, (sz, sz))
    cube = np.array([common + 0.3 * rng.normal(0, 1, (sz, sz))
                     for _ in range(n_ch)])
    sp = spectral_correlation(cube, ann_width=2, r_in=3)
    # strong cross-channel correlation by construction
    assert sp.shape == (20, n_ch, n_ch)
    ann = sp[5]
    assert np.allclose(np.diag(ann), 1.0, atol=1e-10)
    assert ann[0, 1] > 0.5


def test_frame_deconvolution():
    from vip_tpu.var.filters import frame_deconvolution
    from vip_tpu.var.fit_2d import create_synth_psf
    from scipy.signal import fftconvolve
    psf = np.asarray(create_synth_psf("gauss", shape=(15, 15), fwhm=4.0))
    psf /= psf.sum()
    truth = np.zeros((64, 64))
    truth[30, 40] = 1.0
    truth[20, 20] = 0.5
    blurred = fftconvolve(truth, psf, mode="same")
    rec = frame_deconvolution(blurred, psf, n_it=50)
    assert np.unravel_index(np.argmax(rec), rec.shape) == (30, 40)
    # deconvolution concentrates the flux
    assert rec.max() > blurred.max() * 3


def test_parangles_header_pipeline(tmp_path):
    from vip_tpu.fits import Header, write_fits
    from vip_tpu.preproc.parangles import (compute_derot_angles_cd,
                                           compute_derot_angles_pa)
    for i in range(3):
        h = Header({"HIERARCH ESO ADA POSANG": 10.0 * i,
                    "HIERARCH ESO ADA POSANG END": 10.0 * i + 2.0,
                    "CD1_1": -np.cos(np.deg2rad(5 * i)) * 1e-5,
                    "CD1_2": np.sin(np.deg2rad(5 * i)) * 1e-5,
                    "CD2_1": np.sin(np.deg2rad(5 * i)) * 1e-5,
                    "CD2_2": np.cos(np.deg2rad(5 * i)) * 1e-5})
        write_fits(str(tmp_path / f"cube_{i:03d}.fits"),
                   np.zeros((4, 4), np.float32), header=h, verbose=False)
    rot = compute_derot_angles_pa("cube_", 3, "", str(tmp_path) + "/",
                                  verbose=False)
    assert np.allclose(rot % 360, [-(1.0), -(11.0), -(21.0)] % np.float64(360))
    rot_cd = compute_derot_angles_cd("cube_", 3, "", str(tmp_path) + "/",
                                     verbose=False)
    assert rot_cd.shape == (3,)


def test_ds9_gated_import():
    from vip_tpu.vip_ds9 import Ds9Window
    with pytest.raises(ImportError):
        Ds9Window()


@pytest.mark.slow
def test_speckle_noise_uncertainty_small():
    from vip_tpu.fm.fakecomp import normalize_psf
    from vip_tpu.fm.negfc_speckle_noise import speckle_noise_uncertainty
    from vip_tpu.psfsub.utils_pca import pca_annulus
    from vip_tpu.var.fit_2d import create_synth_psf

    cube, angs = make_adi_cube(n=10, size=60, rot_amp=60.0)
    psf = np.asarray(create_synth_psf("gauss", shape=(11, 11), fwhm=4.0))
    psfn = normalize_psf(psf, fwhm=4.0, verbose=False)
    # inject a known companion, then measure the speckle-noise uncertainty
    from vip_tpu.fm.fakecomp import cube_inject_companions
    cube_fc = cube_inject_companions(cube, psfn, angs, flevel=40,
                                     rad_dists=[12], theta=0,
                                     verbose=False)
    res = speckle_noise_uncertainty(
        cube_fc, (12.0, 0.0, 40.0), angle_range=np.linspace(60, 300, 3),
        derot_angles=angs, algo=pca_annulus, psfn=psfn, fwhm=4.0,
        aperture_radius=2, algo_options={"ncomp": 2},
        mu_sigma=None, verbose=False, full_output=True, plot=False,
        bins=2)
    sp_unc, mean_dev = np.atleast_1d(res[0]), np.atleast_1d(res[1])
    assert sp_unc.shape[-1] == 3  # (r, theta, f)
    assert np.isfinite(sp_unc).all()


def test_mask_roi_oracle_parity():
    """mask_roi must be bit-identical to the reference's GEB20 ROI mask
    (reference var/shapes.py:913-1017), incl. its out-of-field raises."""
    from ref_oracle import load_ref
    ref_var = load_ref("vip_hci.var")
    import vip_tpu

    rng = np.random.default_rng(1)
    arr = rng.standard_normal((61, 61))
    for sxy in [(40, 35), (22, 28), (30, 45)]:
        for mode in ("bool", "val", "mask"):
            a = vip_tpu.var.mask_roi(arr.copy(), sxy, mode=mode)
            b = ref_var.mask_roi(arr.copy(), sxy, mode=mode)
            assert np.array_equal(a, b), (sxy, mode)
    for bad in [(3, 30), (58, 30)]:
        with pytest.raises(TypeError):
            vip_tpu.var.mask_roi(arr, bad)
        with pytest.raises(TypeError):
            ref_var.mask_roi(arr, bad)
