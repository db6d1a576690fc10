"""Execute every code block of docs/TUTORIAL.md and print its numbers.

The tutorial walks the replica beta Pic dataset (tests/naco_replica.py)
through the full reference workflow: load -> recenter -> psf norm ->
median_sub/pca/pca_annular -> snrmap -> detection -> NEGFC
(firstguess -> MCMC -> confidence) -> contrast curve. This script IS the
tutorial's transcript generator: run it after any numerics change and
refresh the numbers quoted in docs/TUTORIAL.md if they moved.

Runs on CPU (x64 parity mode) in a few minutes:
    python tools/run_tutorial.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np


def section(title):
    print(f"\n=== {title} ===", flush=True)


def main():
    t_start = time.perf_counter()

    # --- 1. load ---------------------------------------------------------
    section("1. load")
    import tempfile

    from naco_replica import FWHM, PLSC, STARPHOT, get_replica

    from vip_tpu.fits import open_fits, write_fits

    cube, angles, psf, _, _ = get_replica()
    # round-trip through FITS like a real session would
    tmp = tempfile.mkdtemp()
    write_fits(os.path.join(tmp, "cube.fits"), cube, verbose=False)
    write_fits(os.path.join(tmp, "angles.fits"), angles, verbose=False)
    write_fits(os.path.join(tmp, "psf.fits"), psf, verbose=False)
    cube = open_fits(os.path.join(tmp, "cube.fits"), verbose=False)
    angles = open_fits(os.path.join(tmp, "angles.fits"), verbose=False)
    psf = open_fits(os.path.join(tmp, "psf.fits"), verbose=False)
    print(f"cube {cube.shape}, angles {angles.shape} "
          f"({angles.min():.2f}..{angles.max():.2f} deg), psf {psf.shape}")

    # --- 2. normalize psf ------------------------------------------------
    section("2. normalize_psf")
    from vip_tpu.fm import normalize_psf

    psfn, flux, fwhm = normalize_psf(psf, fwhm="fit", size=19, model="moff",
                                     full_output=True, verbose=False)
    fwhm = float(fwhm)
    print(f"fitted Moffat FWHM = {fwhm:.4f} px "
          f"(replica ground truth {FWHM:.4f})")
    print(f"1-FWHM aperture flux of the raw PSF = "
          f"{float(np.atleast_1d(flux)[0]):.2f}")

    # --- 3. recenter ------------------------------------------------------
    section("3. recenter (dft upsampling)")
    from vip_tpu.preproc import cube_recenter_dft_upsampling

    cube_rc, shy, shx = cube_recenter_dft_upsampling(
        cube, center_fr1=(50, 50), subi_size=None, full_output=True,
        verbose=False)
    print(f"max residual shift |y|,|x| = {np.abs(shy).max():.3f}, "
          f"{np.abs(shx).max():.3f} px (replica frames are pre-centered)")

    # --- 4. reductions ----------------------------------------------------
    section("4. median_sub / pca / pca_annular")
    from vip_tpu.psfsub import median_sub, pca, pca_annular

    fr_med = median_sub(cube, angles, verbose=False)
    fr_pca = pca(cube, angles, ncomp=5, verbose=False)
    fr_ann = pca_annular(cube, angles, fwhm=fwhm, ncomp=3, asize=fwhm,
                         radius_int=int(fwhm), delta_rot=(0.1, 1),
                         verbose=False)
    for name, fr in (("median_sub", fr_med), ("pca ncomp=5", fr_pca),
                     ("pca_annular ncomp=3", fr_ann)):
        print(f"{name}: frame {fr.shape}, max {np.nanmax(fr):.2f}")

    # --- 5. S/N map + detection ------------------------------------------
    section("5. snrmap + detection")
    from vip_tpu.metrics import detection, snr, snrmap

    sm = snrmap(fr_pca, fwhm=fwhm, plot=False, verbose=False)
    table = detection(fr_pca, fwhm=fwhm, psf=psfn, bkg_sigma=5,
                      mode="lpeaks", snr_thresh=5, plot=False,
                      verbose=False, full_output=True)
    print(table[["y", "x", "px_snr"]].to_string(index=False))
    ys, xs = float(table.y.iloc[0]), float(table.x.iloc[0])
    s = snr(fr_pca, (xs, ys), fwhm, verbose=False)
    r = np.hypot(ys - 50, xs - 50)
    print(f"companion at (y={ys:.2f}, x={xs:.2f}), r={r:.2f} px "
          f"({r * PLSC:.3f} arcsec), S/N={s:.1f}")

    # --- 6. NEGFC ---------------------------------------------------------
    section("6. NEGFC firstguess (simplex)")
    from vip_tpu.fm import firstguess

    r0, theta0, f0 = firstguess(cube, angles, psfn,
                                planets_xy_coord=[(xs, ys)], ncomp=5,
                                fwhm=fwhm, annulus_width=4 * fwhm,
                                aperture_radius=2, imlib="vip-fft",
                                interpolation=None, simplex=True,
                                plot=False, verbose=False)
    r0, theta0, f0 = float(r0[0]), float(theta0[0]), float(f0[0])
    print(f"r={r0:.3f} px  theta={theta0:.3f} deg  flux={f0:.1f}")
    print(f"contrast vs starphot: {f0 / STARPHOT:.2e}")

    section("6b. NEGFC MCMC (device-batched walkers)")
    from vip_tpu.fm import confidence, mcmc_negfc_sampling

    chain = mcmc_negfc_sampling(
        cube, angles, psfn, initial_state=[r0, theta0, f0], ncomp=5,
        fwhm=fwhm, annulus_width=4 * fwhm, aperture_radius=2,
        nwalkers=32, niteration_min=20, niteration_limit=60,
        conv_test="ac", imlib="vip-fft", interpolation=None,
        display=False, verbosity=0, save=False)
    burnin = int(0.3 * chain.shape[1])
    isamples = chain[:, burnin:].reshape((-1, 3))
    val_max, conf = confidence(isamples, cfd=68, bins=100,
                               gaussian_fit=False, verbose=False,
                               save=False, plot=False)
    print(f"posterior max: r={val_max['r']:.3f} px, "
          f"theta={val_max['theta']:.3f} deg, f={val_max['f']:.1f}")
    print(f"68% interval r: +{conf['r'][1]:.3f}/{conf['r'][0]:.3f} px")

    # --- 7. contrast curve -------------------------------------------------
    section("7. contrast_curve")
    from vip_tpu.fm import cube_planet_free
    from vip_tpu.metrics import contrast_curve

    cube_emp = cube_planet_free([(r0, theta0, f0)], cube, angles, psfn,
                                imlib="vip-fft", interpolation=None)
    cc = contrast_curve(cube_emp, angles, psfn, fwhm, pxscale=PLSC,
                        starphot=STARPHOT, algo=pca, nbranch=1, ncomp=5,
                        verbose=False, plot=False)
    sep = np.asarray(cc["distance_arcsec"])
    con = np.asarray(cc["sensitivity_student"])
    for want in (0.2, 0.4, 0.6, 0.8):
        i = int(np.argmin(np.abs(sep - want)))
        print(f"5-sigma contrast @ {sep[i]:.2f}\" = {con[i]:.2e}")

    print(f"\ntotal wall time: {time.perf_counter() - t_start:.1f} s")


if __name__ == "__main__":
    main()
