"""Full-pipeline injection-recovery oracle.

The reference's dominant end-to-end contract (tests/helpers.py:38-79 +
test_pipeline_adi_paco.py): inject a companion into the *cube*, run each
algorithm, build an S/N map, and assert ``detection`` recovers the blob
within 3 px of the injection.
"""

import numpy as np
import pytest

from conftest import make_adi_cube

from vip_tpu.fm.fakecomp import cube_inject_companions, normalize_psf
from vip_tpu.metrics.detection import detection
from vip_tpu.metrics.snr_source import snrmap

pytestmark = pytest.mark.slow

RAD, THETA, FWHM = 14.0, 40.0, 4.0


@pytest.fixture(scope="module")
def injected():
    cube, angs = make_adi_cube(n=20, size=60, rot_amp=70.0, fwhm=FWHM)
    yy, xx = np.mgrid[:13, :13]
    sigma = FWHM / 2.355
    psf = np.exp(-((yy - 6) ** 2 + (xx - 6) ** 2) / (2 * sigma ** 2))
    psfn = normalize_psf(psf, fwhm=FWHM, verbose=False)
    cubefc = cube_inject_companions(cube, psfn, angs, flevel=60, plsc=0.1,
                                    rad_dists=RAD, theta=THETA, n_branches=1,
                                    verbose=False)
    cy = cx = 30
    exp_y = cy + RAD * np.sin(np.deg2rad(THETA))
    exp_x = cx + RAD * np.cos(np.deg2rad(THETA))
    return cubefc, angs, psfn, (exp_y, exp_x)


def _assert_recovery(frame, expected_yx, snr_thresh=4, is_snr_map=False):
    """The reference's check_detection contract (tests/helpers.py:38-79):
    lpeaks-mode detection on the final frame, recovery within 3 px. For
    algorithms that output an S/N map directly (andromeda, PACO), the
    map's global peak must sit on the injection above the threshold."""
    frame = np.asarray(frame, dtype=float)
    if is_snr_map:
        exp_y, exp_x = expected_yx
        py, px = np.unravel_index(np.nanargmax(frame), frame.shape)
        assert frame[py, px] >= snr_thresh, frame[py, px]
        assert np.hypot(py - exp_y, px - exp_x) <= 3.0, (py, px, expected_yx)
        return
    table = detection(frame, fwhm=FWHM, mode="lpeaks", bkg_sigma=5,
                      matched_filter=False, mask=True,
                      snr_thresh=snr_thresh, plot=False, full_output=True,
                      verbose=False)
    yy = np.atleast_1d(np.asarray(table.y, dtype=float))
    xx = np.atleast_1d(np.asarray(table.x, dtype=float))
    assert len(yy), "no source detected"
    exp_y, exp_x = expected_yx
    dists = np.hypot(yy - exp_y, xx - exp_x)
    assert dists.min() <= 3.0, (list(zip(yy, xx)), expected_yx)


def test_e2e_pca(injected):
    from vip_tpu.psfsub import pca

    cubefc, angs, psfn, exp = injected
    _assert_recovery(pca(cubefc, angs, ncomp=5, verbose=False), exp)


def test_e2e_pca_annular(injected):
    from vip_tpu.psfsub import pca_annular

    cubefc, angs, psfn, exp = injected
    frame = pca_annular(cubefc, angs, ncomp=3, fwhm=FWHM, asize=4,
                        delta_rot=0.5, radius_int=2, verbose=False)
    _assert_recovery(frame, exp)


def test_e2e_median_sub(injected):
    from vip_tpu.psfsub import median_sub

    cubefc, angs, psfn, exp = injected
    _assert_recovery(median_sub(cubefc, angs, verbose=False), exp)


def test_e2e_llsg(injected):
    from vip_tpu.psfsub import llsg

    cubefc, angs, psfn, exp = injected
    frame = llsg(cubefc, angs, fwhm=FWHM, rank=4, verbose=False)
    _assert_recovery(frame, exp)


def test_e2e_xloci(injected):
    from vip_tpu.psfsub import xloci

    cubefc, angs, psfn, exp = injected
    frame = xloci(cubefc, angs, fwhm=FWHM, asize=FWHM, verbose=False)
    _assert_recovery(frame, exp)


def test_e2e_nmf(injected):
    from vip_tpu.psfsub import nmf

    cubefc, angs, psfn, exp = injected
    frame = nmf(cubefc, angs, ncomp=5, verbose=False)
    _assert_recovery(frame, exp)


def test_e2e_frame_diff(injected):
    from vip_tpu.psfsub import frame_diff

    cubefc, angs, psfn, exp = injected
    frame = frame_diff(cubefc, angs, fwhm=FWHM, asize=FWHM, verbose=False)
    _assert_recovery(frame, exp, snr_thresh=3)


def test_e2e_andromeda(injected):
    from vip_tpu.invprob import andromeda

    cubefc, angs, psfn, exp = injected
    out = andromeda(cube=cubefc, angle_list=angs, psf=psfn,
                    oversampling_fact=1.2, filtering_fraction=0.3,
                    min_sep=0.5, annuli_width=1.0, roa=2, opt_method="lsq",
                    nsmooth_snr=8, precision=8, homogeneous_variance=True,
                    verbose=False)
    snr_norm = np.nan_to_num(np.asarray(out[2]))
    _assert_recovery(snr_norm, exp, is_snr_map=True, snr_thresh=4)


def test_e2e_fast_paco(injected):
    from vip_tpu.invprob import FastPACO

    cubefc, angs, psfn, exp = injected
    paco = FastPACO(cube=cubefc, angles=angs, psf=psfn, fwhm=FWHM,
                    pixscale=1.0, verbose=False)
    snr_map, _ = paco.run()
    _assert_recovery(np.nan_to_num(snr_map), exp, is_snr_map=True,
                     snr_thresh=4)
