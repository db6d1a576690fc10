"""Extrapolate the reference's pca_annular wall time at 1000x512x512.

The reference cannot be run directly at the bench scale (its unit of
work is one LAPACK SVD of the per-frame library per (annulus, frame):
reference pca_local.py:830-909 ``do_pca_patch``; at 1000 frames x 64
annuli that is 64,000 patch SVDs of up to (200, seg_px) — hours on this
host).  Instead this script measures the reference's OWN per-patch
worker at several segment widths p (the real per-patch shapes of the
512^2 geometry), fits the per-patch cost t(p) = a + b*p (LAPACK gesdd
on a (200, p) matrix is linear in p for p >> 200), and sums over the
actual annulus geometry of the bench config (asize=4, n_annuli=64,
delta_rot=(0.1, 1) -> all libraries truncated to max_frames_lib=200).

The derived total is recorded as the documented vs_baseline denominator
for bench.py's pca_annular leg.

Run on an idle host: python tools/measure_ref_annular_unit.py

Measured 2026-08-19 on this host: t(p) = -2.86 ms + 22.84 us*p;
extrapolated total for 1000x512x512 (64 annuli, 1-segment): 4520 s.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    from ref_oracle import load_ref

    pl = load_ref("vip_hci.psfsub.pca_local")

    n, lib = 1000, 200
    angles = np.linspace(0.0, 80.0, n)
    rng = np.random.default_rng(0)

    # representative per-annulus segment widths of the 512^2 / asize=4
    # geometry: p(r) ~ area of the annulus at radius r
    sizes = [120, 500, 1500, 3000, 6400]
    reps = {120: 30, 500: 20, 1500: 8, 3000: 4, 6400: 2}
    ts = []
    for p in sizes:
        matrix = rng.standard_normal((n, p))
        # pa_threshold chosen so the library saturates the 200-frame cap
        # (the bench config's delta_rot=(0.1,1) does the same)
        t0 = time.perf_counter()
        for fr in range(reps[p]):
            pl.do_pca_patch(matrix, (fr * 37) % n, angles, 4.0, 1.0, 100,
                            "lapack", 10, 2, lib, 1e-1, None, None)
        dt = (time.perf_counter() - t0) / reps[p]
        ts.append(dt)
        print(f"p={p}: {dt*1e3:.1f} ms/patch", flush=True)

    A = np.vstack([np.ones(len(sizes)), sizes]).T
    (a, b), *_ = np.linalg.lstsq(A, np.asarray(ts), rcond=None)
    print(f"fit: t(p) = {a*1e3:.2f} ms + {b*1e6:.3f} us*p")

    # 512^2, radius_int=0, asize=4 -> 64 annuli, n_segments=1
    total = 0.0
    for ann in range(64):
        inner = ann * 4
        # annulus pixel count (area between inner and inner+4)
        pann = np.pi * ((inner + 4.0) ** 2 - inner**2)
        total += n * (a + b * pann)
    print(f"extrapolated reference pca_annular 1000x512x512: {total:.0f} s"
          f" ({total/3600:.2f} h)")


if __name__ == "__main__":
    main()
