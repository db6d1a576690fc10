"""Execute every code block of docs/TUTORIAL_IFS.md and print its numbers.

Two worked flows the ADI tutorial (docs/TUTORIAL.md) does not cover:

1. a 4-D IFS (ADI+mSDI) reduction — wavelength rescaling via scale_list,
   single- and double-stage PCA (reference pca_fullfr.py:1038-1475) and
   4-D annular PCA, ending in S/N + detection of a planted companion;
2. disk forward modeling — a ScatteredLightDisk model injected into an
   ADI sequence (reference fakedisk.py:16), reduced, then recovered with
   the NEGFD grid search (reference negfd_simplex.py:554).

Runs offline on CPU (x64 parity mode):
    python tools/run_tutorial_ifs.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np


def section(title):
    print(f"\n=== {title} ===", flush=True)


def make_ifs_cube(z=4, n=20, size=80, fwhm=4.0, seed=5):
    """Synthetic IFS sequence: speckles scale radially with wavelength
    (the physics SDI exploits), smooth temporal noise, ADI rotation."""
    from scipy.ndimage import gaussian_filter

    from vip_tpu.preproc.rescaling import frame_rescaling

    rng = np.random.default_rng(seed)
    lbdas = np.linspace(1.0, 1.35, z)            # microns
    scal = lbdas[-1] / lbdas                     # rescale to common lambda
    speck = gaussian_filter(rng.standard_normal((size, size)), 2.0) * 20
    yy, xx = np.mgrid[:size, :size]
    c = size // 2
    halo = 60.0 * np.exp(-((yy - c) ** 2 + (xx - c) ** 2)
                         / (2 * (3 * fwhm) ** 2))
    cube = np.empty((z, n, size, size))
    for ch in range(z):
        sp = frame_rescaling(speck.copy(), scale=1 / scal[ch])
        for fr in range(n):
            noise = gaussian_filter(rng.standard_normal((size, size)),
                                    1.5) * 0.4
            cube[ch, fr] = halo + sp + noise
    angles = np.linspace(0.0, 60.0, n)
    return cube, angles, lbdas, scal


def main():
    t0_all = time.perf_counter()
    fwhm = 4.0

    # --- 1. build the IFS dataset + plant a companion --------------------
    section("1. IFS dataset")
    from vip_tpu.fm import cube_inject_companions, normalize_psf
    from vip_tpu.var import create_synth_psf

    cube, angles, lbdas, scal = make_ifs_cube(fwhm=fwhm)
    z, n, size, _ = cube.shape
    print(f"cube {cube.shape}, lambdas {lbdas[0]:.2f}-{lbdas[-1]:.2f} um, "
          f"scale_list {np.round(scal, 4)}")

    psf = np.asarray(create_synth_psf("gauss", shape=(19, 19), fwhm=fwhm))
    psfn = normalize_psf(psf, fwhm=fwhm, verbose=False)
    psfn3 = np.repeat(psfn[None], z, axis=0)      # one PSF per channel

    r_true, theta_true, flux_true = 18.0, 240.0, 6.0
    cube_fc = cube_inject_companions(cube, psfn3, angles, flevel=flux_true,
                                     rad_dists=[r_true], theta=theta_true,
                                     n_branches=1, verbose=False)
    cy = cx = size // 2
    x_true = cx + r_true * np.cos(np.deg2rad(theta_true))
    y_true = cy + r_true * np.sin(np.deg2rad(theta_true))
    print(f"planted companion: r={r_true} px, theta={theta_true} deg, "
          f"flux={flux_true} -> (x, y) = ({x_true:.2f}, {y_true:.2f})")

    # --- 2. single-stage PCA (rescale all channels -> one PCA) ----------
    section("2. pca adimsdi='single'")
    from vip_tpu.psfsub import pca

    t0 = time.perf_counter()
    fr_single = pca(cube_fc.copy(), angles, scale_list=scal, ncomp=8,
                    adimsdi="single", crop_ifs=False, verbose=False)
    print(f"frame {fr_single.shape} in {time.perf_counter()-t0:.1f}s")

    # --- 3. double-stage PCA (per-frame spectral PCA, then ADI PCA) -----
    section("3. pca adimsdi='double'")
    t0 = time.perf_counter()
    fr_double = pca(cube_fc.copy(), angles, scale_list=scal, ncomp=(2, 2),
                    adimsdi="double", verbose=False)
    print(f"frame {fr_double.shape} in {time.perf_counter()-t0:.1f}s")

    # --- 4. 4-D annular PCA ----------------------------------------------
    section("4. pca_annular 4D (SDI+ADI)")
    from vip_tpu.psfsub import pca_annular

    t0 = time.perf_counter()
    fr_ann = pca_annular(cube_fc.copy(), angles, scale_list=scal,
                         ncomp=(2, 2), asize=8, fwhm=fwhm, delta_rot=0.5,
                         delta_sep=(0.1, 1), radius_int=4, verbose=False)
    print(f"frame {fr_ann.shape} in {time.perf_counter()-t0:.1f}s")

    # --- 5. S/N map + detection ------------------------------------------
    section("5. snrmap + detection")
    from vip_tpu.metrics import detection, snrmap

    for name, fr in (("single", fr_single), ("double", fr_double),
                     ("annular", fr_ann)):
        sn = snrmap(np.asarray(fr), fwhm=fwhm, plot=False, verbose=False)
        tbl = detection(np.asarray(fr), fwhm=fwhm, psf=psfn, mode="lpeaks",
                        snr_thresh=4, plot=False, verbose=False)
        ys, xs = np.atleast_1d(tbl[0]), np.atleast_1d(tbl[1])
        if len(ys):
            d = np.hypot(np.asarray(ys) - y_true, np.asarray(xs) - x_true)
            i = int(np.argmin(d))
            print(f"{name:8s}: peak S/N {np.nanmax(sn):6.2f}; detection at "
                  f"({xs[i]:.1f}, {ys[i]:.1f}) — {d[i]:.2f} px from truth")
        else:
            print(f"{name:8s}: peak S/N {np.nanmax(sn):6.2f}; no blob above "
                  "threshold")

    # --- 6. scattered-light disk model -----------------------------------
    section("6. ScatteredLightDisk model")
    from vip_tpu.fm import ScatteredLightDisk, cube_inject_fakedisk

    size_d, n_d = 80, 20
    itilt_true, pa_true, flux_scal_true = 62.0, 35.0, 1.0
    disk = ScatteredLightDisk(
        nx=size_d, ny=size_d, distance=50.0, itilt=itilt_true, omega=0.0,
        pxInArcsec=0.01225, pa=pa_true,
        density_dico={"name": "2PowerLaws", "ain": 8, "aout": -4,
                      "a": 25, "e": 0.0, "ksi0": 1.0, "gamma": 2.0,
                      "beta": 1.0, "dens_at_r0": 1.0},
        spf_dico={"name": "HG", "g": 0.3, "polar": False},
        flux_max=8.0)
    disk_img = np.asarray(disk.compute_scattered_light())
    print(f"disk model {disk_img.shape}, max flux {disk_img.max():.2f}, "
          f"itilt={itilt_true} deg, pa={pa_true} deg")

    # build the sequence exactly as the NEGFD model does
    # (fm/utils_negfd.py cube_disk_free): rotate the model to each
    # parallactic angle, no PSF convolution
    angles_d = np.linspace(0.0, 70.0, n_d)
    rng = np.random.default_rng(11)
    from scipy.ndimage import gaussian_filter
    disk_seq = cube_inject_fakedisk(disk_img, angles_d)
    noise = np.stack([gaussian_filter(
        rng.standard_normal((size_d, size_d)), 1.5) * 0.2
        for _ in range(n_d)])
    cube_disk = disk_seq + noise

    # --- 7. reduce the disk sequence -------------------------------------
    section("7. median-ADI reduction of the disk")
    from vip_tpu.psfsub import median_sub

    t0 = time.perf_counter()
    fr_disk = median_sub(cube_disk.copy(), angles_d, verbose=False)
    rec = float(np.nansum(np.asarray(fr_disk) * (disk_img > 0.5))
                / max(np.sum(disk_img * (disk_img > 0.5)), 1e-9))
    print(f"median-ADI frame in {time.perf_counter()-t0:.1f}s; recovered "
          f"flux fraction over the disk spine: {rec:.2f} "
          "(ADI self-subtraction removes part of an azimuthally smooth "
          "disk — the reason disk work needs forward modeling)")

    # --- 8. NEGFD: recover the disk parameters ---------------------------
    section("8. firstguess_fd (grid search on scaling + flux)")
    from vip_tpu.fm import firstguess_fd

    t0 = time.perf_counter()
    res = firstguess_fd(cube_disk.copy(), angles_d, disk_model=disk_img,
                        mask_fm=disk_img > 0.2, ini_xy=(0, 0), ini_theta=0,
                        ini_scal=1.0, f_range=np.linspace(0.4, 1.6, 25),
                        psfn=None, algo=median_sub, algo_options={},
                        simplex=False, imlib="vip-fft",
                        interpolation=None, plot=False, verbose=False)
    arr = np.asarray(res, dtype=object).reshape(-1)
    # grid-only firstguess returns (x, y, theta, scal, flux) estimates
    vals = [float(np.round(float(v), 3)) for v in arr[:5]]
    print(f"grid-recovered (dx, dy, dtheta, scal, flux) = {vals}"
          "  (truth: 0, 0, 0, 1, 1)")
    print(f"NEGFD grid in {time.perf_counter()-t0:.1f}s")

    print(f"\nTotal: {time.perf_counter()-t0_all:.1f}s")


if __name__ == "__main__":
    main()
