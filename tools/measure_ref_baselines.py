"""Measure same-host reference wall-times used as bench.py vs_baseline.

Runs the in-process reference (via tests/ref_oracle.py) on the NACO
replica (61x101x101) for the workloads bench.py reports absolute TPU
wall-times for: pca_annular, contrast_curve, andromeda, fmmf, FastPACO.
The configs are the golden-snapshot configs (tests/gen_golden.py), so the
TPU bench legs and the host baselines time the same algorithm shapes. The
measured numbers are recorded as documented constants next to each bench
entry, exactly as pca_incremental's derivation (bench.py) already does.

Run on an otherwise idle host:  python tools/measure_ref_baselines.py
Optionally pass leg names (pca_annular, contrast_curve, andro_adi,
fmmf_kl_adi, fastpaco) to run a subset.

Measured 2026-08-19 on this host (1 physical core, nproc=1 — `nproc`
reports 1, so serial IS the reference's best on this machine):

    pca_annular 61x101x101 n_segments=auto          9.48 s
    contrast_curve 61x101x101 nbranch=1 pca ncomp=5 27.61 s
    andromeda (golden lsq config)                   12.48 s
    fmmf KLIP (golden config)                       3365.19 s
    FastPACO run() (golden config, pixscale=1)      176.60 s (re-run on
                                                    an idle host; the
                                                    first 251.61 s run
                                                    shared the core)

These constants are the vs_baseline denominators for the corresponding
bench.py legs (same algorithm shapes as the golden snapshots).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    import numpy as np

    from gen_golden import input_dataset_cached, invprob_configs
    from naco_replica import PLSC

    legs = set(sys.argv[1:]) or {"pca_annular", "contrast_curve",
                                 "andro_adi", "fmmf_kl_adi", "fastpaco"}

    if "pca_scale" in legs:
        # reference full-frame PCA at the bench scale (1000x512x512,
        # ncomp=10, lapack SVD + vip-fft derotation) — the per-run unit
        # of contrast_curve's (1 + fc_rad_sep*nbranch) algo invocations
        from ref_oracle import load_ref

        ps = load_ref("vip_hci.psfsub")
        rng = np.random.default_rng(0)
        big = rng.standard_normal((1000, 512, 512)).astype(np.float32)
        angs = np.linspace(0.0, 80.0, 1000)
        t0 = time.perf_counter()
        ps.pca(big, angs, ncomp=10, verbose=False, imlib="vip-fft",
               interpolation=None, check_memory=False)
        print(f"pca fullfr 1000x512x512 ncomp=10: "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        legs.discard("pca_scale")
        if not legs:
            return
    ds = input_dataset_cached()
    cube, angles, psfn, fwhm = (ds["cube"], ds["angles"], ds["psfn"],
                                ds["fwhm"])
    print(f"replica: cube {cube.shape}, fwhm {fwhm:.3f}")

    from ref_oracle import load_ref

    ps = load_ref("vip_hci.psfsub")
    ip = load_ref("vip_hci.invprob")
    me = load_ref("vip_hci.metrics")

    def t(name, fn):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        print(f"{name}: {dt:.2f}s", flush=True)
        return dt

    if "pca_annular" in legs:
        t("pca_annular 61x101x101 n_segments=auto", lambda: ps.pca_annular(
            cube.copy(), angles, fwhm=fwhm, n_segments="auto", nproc=1,
            imlib="vip-fft", interpolation=None, verbose=False))

    if "contrast_curve" in legs:
        # reference throughput() requires an ODD psf (contrcurve.py:725);
        # the golden psfn is 20x20, so build a 19x19 one from the raw
        # replica PSF for this leg (the TPU bench leg uses the same)
        from naco_replica import get_replica

        fm = load_ref("vip_hci.fm")
        psf_raw = get_replica()[2]
        psfn_odd = fm.normalize_psf(psf_raw, fwhm="fit", size=19,
                                    verbose=False)
        t("contrast_curve 61x101x101 nbranch=1 (pca ncomp=5)",
          lambda: me.contrast_curve(
              cube.copy(), angles, psfn_odd, fwhm, pxscale=PLSC,
              starphot=5e4, algo=ps.pca, nbranch=1, ncomp=5,
              imlib="vip-fft", interpolation=None, verbose=False,
              plot=False, nproc=1))

    cfgs = {name: (fn, kw) for name, fn, kw, _ in invprob_configs(ds)}
    for name in ("andro_adi", "fmmf_kl_adi"):
        if name not in legs:
            continue
        fn, kw = cfgs[name]
        kw = dict(kw, nproc=1)
        t(f"{name} (golden config)", lambda fn=fn, kw=kw: getattr(ip, fn)(
            cube=cube.copy(), angle_list=angles, psf=psfn, **kw))

    if "fmmf_small" in legs:
        # the bench.py leg narrows the annulus window to min_r=26,max_r=30
        # to fit the driver's budget; baseline re-measured at that shape
        _, kw = cfgs["fmmf_kl_adi"]
        kw = dict(kw, nproc=1, max_r=30)
        t("fmmf_kl (min_r=26, max_r=30)", lambda: ip.fmmf(
            cube=cube.copy(), angle_list=angles, psf=psfn, **kw))

    def fastpaco():
        # pixscale=1.0 with fwhm in PIXELS: PACO.__init__ rescales
        # fwhm = int(fwhm/pixscale) (reference paco.py:134), so passing
        # the platescale with a pixel fwhm inflates the patch radius to
        # the whole frame (a 7.7 TiB Cinv). Matches the config the
        # parity tests pin (tests/test_invprob_paco.py:68).
        algo = ip.FastPACO(cube=cube.copy(), angles=angles, psf=psfn,
                           fwhm=fwhm, pixscale=1.0, verbose=False)
        algo.run(cpu=1)

    if "fastpaco" in legs:
        t("FastPACO 61x101x101 run()", fastpaco)


if __name__ == "__main__":
    main()
