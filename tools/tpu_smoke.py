"""Run tiny inputs through the major public API on the axon TPU backend."""
import os
import sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

rng = np.random.default_rng(0)
n, sz = 12, 64
cube = rng.standard_normal((n, sz, sz)).astype(np.float32) + 10.0
ang = np.linspace(0, 50, n).astype(np.float32)
frame = cube[0]
yy, xx = np.mgrid[:13, :13]
psf = np.exp(-((yy - 6.) ** 2 + (xx - 6.) ** 2) / (2 * (4 / 2.355) ** 2)
             ).astype(np.float32)
lbdas = np.linspace(1.0, 1.3, 4)
cube4 = rng.standard_normal((4, n, sz, sz)).astype(np.float32) + 10.0

def t(name, fn):
    """Run one entry; on the TPU backend a failing device call can crash
    the worker (self-heals in ~1-2 min), so retry once after a pause.
    SMOKE_RETRY=0 disables the retry for fast CPU checks."""
    attempts = (1, 2) if os.environ.get("SMOKE_RETRY", "1") == "1" else (2,)
    for attempt in attempts:
        t0 = time.perf_counter()
        try:
            fn()
            print(f"OK   {name} ({time.perf_counter()-t0:.1f}s)", flush=True)
            return
        except Exception as e:
            first = str(e).split("\n")[0][:100]
            if attempt == 1:
                time.sleep(75)   # TPU worker self-heal window
            else:
                print(f"FAIL {name}: {type(e).__name__}: {first}",
                      flush=True)
                with open("/tmp/smoke_tb_" + name + ".log", "w") as f:
                    traceback.print_exc(file=f)

import vip_tpu
from vip_tpu import preproc, psfsub, metrics, fm, invprob, greedy, var, stats

t("frame_rotate", lambda: preproc.frame_rotate(frame, 13.0))
t("cube_derotate", lambda: preproc.cube_derotate(cube, ang))
t("frame_shift", lambda: preproc.frame_shift(frame, 1.3, -0.7))
t("cube_recenter_dft_upsampling",
  lambda: preproc.cube_recenter_dft_upsampling(cube, verbose=False))
t("cube_rescaling_wavelengths",
  lambda: preproc.cube_rescaling_wavelengths(cube4[:, 0], lbdas))
t("frame_filter_lowpass", lambda: var.frame_filter_lowpass(frame, "gauss"))
t("frame_filter_highpass",
  lambda: var.frame_filter_highpass(frame, "laplacian"))
t("fit_2dgaussian", lambda: var.fit_2dgaussian(psf, debug=False))
t("median_sub", lambda: psfsub.median_sub(cube, ang, verbose=False))
t("pca", lambda: psfsub.pca(cube, ang, ncomp=3, verbose=False))
t("pca_annular", lambda: psfsub.pca_annular(
    cube, ang, ncomp=2, asize=8, radius_int=4, verbose=False))
t("nmf", lambda: psfsub.nmf(cube, ang, ncomp=3, verbose=False))
t("llsg", lambda: psfsub.llsg(cube, ang, fwhm=4, rank=3, verbose=False))
t("xloci", lambda: psfsub.xloci(cube, ang, fwhm=4, verbose=False))
t("frame_diff", lambda: psfsub.frame_diff(cube, ang, fwhm=4, verbose=False))
t("normalize_psf", lambda: fm.normalize_psf(psf, fwhm=4.0, verbose=False))
t("cube_inject_companions", lambda: fm.cube_inject_companions(
    cube, psf / psf.sum(), ang, flevel=20, plsc=0.1, rad_dists=[14],
    verbose=False))
t("snrmap", lambda: metrics.snrmap(frame, fwhm=4.0, verbose=False))
t("detection", lambda: metrics.detection(frame, fwhm=4.0, verbose=False))
t("stim_map", lambda: metrics.stim_map(cube))
t("andromeda", lambda: invprob.andromeda(
    cube, oversampling_fact=0.5, angle_list=ang, psf=psf, verbose=False))
t("ipca", lambda: greedy.ipca(cube, ang, ncomp=2, nit=2, verbose=False))
t("sigma_filter", lambda: stats.clip_array(frame, 3, 3))



# ------------------------------------------------------------------
# tier 2: heavier public entry points
from vip_tpu import preproc, psfsub, metrics, fm, invprob

t("roll_sub", lambda: psfsub.roll_sub(cube, ang, verbose=False))
t("nmf_annular", lambda: psfsub.nmf_annular(
    cube, ang, ncomp=2, fwhm=4, asize=8, radius_int=4, verbose=False))
t("pca_grid", lambda: psfsub.pca_grid(cube, ang, fwhm=4,
                                      range_pcs=(1, 4, 1), verbose=False))
t("pca_incremental", lambda: psfsub.pca_incremental(
    cube, ang, batch=4, ncomp=2, verbose=False))
t("pca_annulus", lambda: psfsub.pca_annulus(
    cube, ang, ncomp=2, annulus_width=10, r_guess=16))
t("fmmf", lambda: invprob.fmmf(
    cube, ang, psf / psf.sum(), fwhm=4, min_r=8, max_r=16, verbose=False))
t("fast_paco", lambda: __import__("vip_tpu").invprob.FastPACO(
    cube=cube, angles=ang, psf=psf / psf.sum(), fwhm=4.0,
    pixscale=1.0).run(cpu=1))
t("normalize_psf+contrast_curve", lambda: metrics.contrast_curve(
    cube, ang, psf, fwhm=4.0, pxscale=0.01, starphot=5000.0,
    algo=psfsub.median_sub, nbranch=1, plot=False, verbose=False))
t("completeness_curve", lambda: metrics.completeness_curve(
    cube, ang, psf, fwhm=4.0, algo=psfsub.median_sub,
    an_dist=[16], pxscale=0.01, starphot=5000.0, plot=False,
    verbose=False))
t("firstguess", lambda: fm.firstguess(
    cube, ang, psf / psf.sum(), planets_xy_coord=[(44, 32)], fwhm=4.0,
    ncomp=2, verbose=False, simplex=False))
t("cube_recenter_2dfit", lambda: preproc.cube_recenter_2dfit(
    cube, fwhm=4.0, subi_size=9, model="gauss", verbose=False,
    debug=False, plot=False))
t("cube_collapse_wmean", lambda: preproc.cube_collapse(
    cube, mode="wmean", w=np.linspace(1, 2, n)))
t("frame_deconvolution", lambda: __import__("vip_tpu").var.
  frame_deconvolution(frame, psf / psf.sum(), n_it=5))
_anchor = (np.mgrid[:sz, :sz][0] < sz // 3)
_boat = ~_anchor
t("cube_subtract_sky_pca", lambda: preproc.cube_subtract_sky_pca(
    cube, cube[:5] * 0.1 + rng.standard_normal(
        (5, sz, sz)).astype(np.float32), (_anchor, _boat), ncomp=2))
t("cube_detect_badfr_pxstats", lambda: preproc.cube_detect_badfr_pxstats(
    cube, verbose=False, plot=False))
t("cube_filter_iuwt", lambda: __import__("vip_tpu").var.cube_filter_iuwt(
    cube[:3], coeff=3))



# ------------------------------------------------------------------
# tier 3: objects layer, samplers, Dataset workflow
from vip_tpu.objects import Dataset, PPResult
from vip_tpu import fm

def _dataset_flow():
    ds = Dataset(cube=cube.astype(float), angles=ang.astype(float),
                 psf=psf.astype(float), fwhm=4.0, px_scale=0.01)
    ds.normalize_psf(size=None, verbose=False)
    ds.inject_companions(flux=20, rad_dists=[18], verbose=False)
    return ds

t("Dataset workflow", _dataset_flow)

def _pppca():
    from vip_tpu.objects import PPPCA
    ds = Dataset(cube=cube.astype(float), angles=ang.astype(float),
                 psf=psf.astype(float), fwhm=4.0, px_scale=0.01)
    res = PPResult()
    p = PPPCA(dataset=ds, ncomp=3, results=res, verbose=False)
    p.run()
    p.make_snrmap()
    return p

t("PPPCA run + snrmap", _pppca)

def _ppmediansub():
    from vip_tpu.objects import PPMedianSub
    ds = Dataset(cube=cube.astype(float), angles=ang.astype(float),
                 psf=psf.astype(float), fwhm=4.0, px_scale=0.01)
    p = PPMedianSub(dataset=ds, verbose=False)
    p.run()
    return p

t("PPMedianSub run", _ppmediansub)

def _mcmc():
    from vip_tpu.fm import mcmc_negfc_sampling, normalize_psf
    psfn = normalize_psf(psf, fwhm=4.0, size=13, verbose=False)
    cubefc = fm.cube_inject_companions(
        cube.astype(float), psfn, ang.astype(float), flevel=40, plsc=0.1,
        rad_dists=[16], theta=30, verbose=False)
    chain = mcmc_negfc_sampling(
        cubefc, ang.astype(float), psfn, initial_state=(16.0, 30.0, 40.0),
        fwhm=4.0, annulus_width=8, aperture_radius=2, nwalkers=12,
        niteration_min=3, niteration_limit=6, conv_test="gb", check_maxgap=2,
        verbosity=0, display=False, save=False)
    return chain

t("mcmc_negfc_sampling (short)", _mcmc)

def _nested():
    from vip_tpu.fm import nested_negfc_sampling, normalize_psf
    psfn = normalize_psf(psf, fwhm=4.0, size=13, verbose=False)
    cubefc = fm.cube_inject_companions(
        cube.astype(float), psfn, ang.astype(float), flevel=40, plsc=0.1,
        rad_dists=[16], theta=30, verbose=False)
    res = nested_negfc_sampling(
        init=(16.0, 30.0, 40.0), cube=cubefc, angs=ang.astype(float),
        psfn=psfn, fwhm=4.0, annulus_width=8, aperture_radius=2,
        npoints=20, dlogz=5.0, verbose=False)
    return res

t("nested_negfc_sampling (short)", _nested)


print("SMOKE DONE", flush=True)
