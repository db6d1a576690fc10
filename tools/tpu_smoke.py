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
    for attempt in (1, 2):
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
print("SMOKE DONE", flush=True)
