"""Parity tests for bad-pixel/bad-frame detection and correction and the
stats helpers they rely on."""

import numpy as np
import pytest

from vip_tpu.preproc.badframes import (cube_detect_badfr_correlation,
                                       cube_detect_badfr_pxstats)
from vip_tpu.preproc.badpixremoval import (cube_fix_badpix_annuli,
                                           cube_fix_badpix_clump,
                                           cube_fix_badpix_isolated,
                                           frame_fix_badpix_fft,
                                           frame_fix_badpix_isolated,
                                           reject_outliers)
from vip_tpu.stats.clip_sigma import clip_array, sigma_filter
from vip_tpu.stats.distances import cube_distance

from ref_oracle import load_ref


@pytest.fixture(scope="module")
def frame_with_badpix():
    rng = np.random.default_rng(7)
    fr = rng.normal(10, 1, (40, 40))
    yy, xx = np.mgrid[:40, :40]
    fr += 50 * np.exp(-((yy - 20)**2 + (xx - 20)**2) / 8.0)
    bad = [(5, 7), (13, 33), (28, 12), (35, 35), (20, 5)]
    for (y, x) in bad:
        fr[y, x] = 200.0
    fr[8, 25] = -100.0
    return fr, bad


def test_clip_array_parity(frame_with_badpix):
    ref = load_ref("vip_hci.stats.clip_sigma")
    fr, _ = frame_with_badpix
    for neighbor, mad in ((False, False), (True, False), (True, True)):
        ours = clip_array(fr, 3, 3, None, neighbor=neighbor,
                          num_neighbor=5, mad=mad)
        theirs = ref.clip_array(fr, 3, 3, None, neighbor=neighbor,
                                num_neighbor=5, mad=mad)
        assert np.array_equal(ours[0], theirs[0]), (neighbor, mad)
        assert np.array_equal(ours[1], theirs[1]), (neighbor, mad)


def test_sigma_filter_parity(frame_with_badpix):
    ref = load_ref("vip_hci.stats.clip_sigma")
    fr, bad = frame_with_badpix
    bpm = np.zeros_like(fr)
    for (y, x) in bad:
        bpm[y, x] = 1
    ours = sigma_filter(fr.copy(), bpm.copy())
    theirs = ref.sigma_filter(fr.copy(), bpm.copy())
    assert np.allclose(ours, theirs, atol=1e-12)
    for (y, x) in bad:
        assert abs(ours[y, x]) < 20  # replaced by local median


def test_reject_outliers_parity():
    ref = load_ref("vip_hci.preproc.badpixremoval")
    rng = np.random.default_rng(1)
    data = rng.normal(0, 1, 24)
    for val in (0.5, 8.0, -12.0):
        assert reject_outliers(data, val, m=5, stddev=1.0) == \
            ref.reject_outliers(data, val, m=5, stddev=1.0)


def test_frame_fix_badpix_isolated_parity(frame_with_badpix):
    ref = load_ref("vip_hci.preproc.badpixremoval")
    fr, bad = frame_with_badpix
    ours, bpm_o = frame_fix_badpix_isolated(fr.copy(), sigma_clip=5,
                                            num_neig=5, size=5,
                                            verbose=False,
                                            full_output=True)
    theirs, bpm_t = ref.frame_fix_badpix_isolated(fr.copy(), sigma_clip=5,
                                                  num_neig=5, size=5,
                                                  verbose=False,
                                                  full_output=True)
    assert np.array_equal(bpm_o, bpm_t)
    assert np.allclose(ours, theirs, atol=1e-12)
    for (y, x) in bad:
        assert bpm_o[y, x]


def test_cube_fix_badpix_isolated_parity(frame_with_badpix):
    ref = load_ref("vip_hci.preproc.badpixremoval")
    fr, _ = frame_with_badpix
    rng = np.random.default_rng(2)
    cube = np.array([fr + rng.normal(0, 0.1, fr.shape) for _ in range(4)])
    for fbf in (False, True):
        ours, bpm_o = cube_fix_badpix_isolated(cube.copy(), sigma_clip=5,
                                               frame_by_frame=fbf,
                                               verbose=False,
                                               full_output=True)
        theirs, bpm_t = ref.cube_fix_badpix_isolated(cube.copy(),
                                                     sigma_clip=5,
                                                     frame_by_frame=fbf,
                                                     verbose=False,
                                                     full_output=True)
        assert np.array_equal(np.asarray(bpm_o, bool),
                              np.asarray(bpm_t, bool)), fbf
        assert np.allclose(ours, theirs, atol=1e-12), fbf


def test_cube_fix_badpix_clump_map_parity(frame_with_badpix):
    ref = load_ref("vip_hci.preproc.badpixremoval")
    fr, bad = frame_with_badpix
    ours, map_o = cube_fix_badpix_clump(fr.copy(), fwhm=4., sig=5.,
                                        verbose=False, full_output=True)
    theirs, map_t = ref.cube_fix_badpix_clump(fr.copy(), fwhm=4., sig=5.,
                                              verbose=False,
                                              full_output=True)
    assert np.array_equal(np.asarray(map_o, bool), np.asarray(map_t, bool))
    assert np.allclose(ours, theirs, atol=1e-10)
    for (y, x) in bad:
        assert map_o[y, x]


def test_cube_fix_badpix_annuli_map(frame_with_badpix):
    # bad pixel map is deterministic (corrected values use random noise)
    ref = load_ref("vip_hci.preproc.badpixremoval")
    fr, bad = frame_with_badpix
    _, map_o, ann_o = cube_fix_badpix_annuli(fr.copy(), fwhm=4., sig=5.,
                                             r_in_std=2, verbose=False,
                                             full_output=True)
    _, map_t, ann_t = ref.cube_fix_badpix_annuli(fr.copy(), fwhm=4.,
                                                 sig=5., r_in_std=2,
                                                 verbose=False,
                                                 full_output=True)
    assert np.array_equal(np.asarray(map_o, bool), np.asarray(map_t, bool))
    assert np.array_equal(ann_o, ann_t)
    for (y, x) in bad:
        assert map_o[y, x]


def test_frame_fix_badpix_fft_parity(frame_with_badpix):
    ref = load_ref("vip_hci.preproc.badpixremoval")
    fr, bad = frame_with_badpix
    bpm = np.zeros_like(fr, dtype=bool)
    for (y, x) in bad:
        bpm[y, x] = True
    ours = frame_fix_badpix_fft(fr.copy(), bpm, nit=50, tol=1e-3,
                                verbose=False)
    theirs = ref.frame_fix_badpix_fft(fr.copy(), bpm, nit=50, tol=1e-3,
                                      verbose=False)
    assert np.allclose(ours, theirs, atol=1e-8)
    for (y, x) in bad:
        assert abs(ours[y, x]) < 50


def test_badframes_parity():
    ref = load_ref("vip_hci.preproc.badframes")
    rng = np.random.default_rng(3)
    n, sz = 12, 40
    cube = rng.normal(10, 1, (n, sz, sz))
    yy, xx = np.mgrid[:sz, :sz]
    cube += 30 * np.exp(-((yy - 20)**2 + (xx - 20)**2) / 8.0)
    cube[3] *= 2.0    # bad frame (flux jump)
    cube[9] += rng.normal(0, 5, (sz, sz))  # noisy frame

    g_o, b_o = cube_detect_badfr_pxstats(cube, plot=False, verbose=False)
    g_t, b_t = ref.cube_detect_badfr_pxstats(cube, plot=False,
                                             verbose=False)
    assert np.array_equal(g_o, g_t)
    assert np.array_equal(b_o, b_t)
    assert 3 in b_o

    for dist in ("pearson", "sad", "mse", "ssim"):
        d_o = cube_distance(cube, 0, dist=dist)
        g_o, b_o = cube_detect_badfr_correlation(cube, 0, dist=dist,
                                                 percentile=20, plot=False,
                                                 verbose=False)
        g_t, b_t = ref.cube_detect_badfr_correlation(cube, 0, dist=dist,
                                                     percentile=20,
                                                     plot=False,
                                                     verbose=False)
        assert np.array_equal(g_o, g_t), dist
        assert np.array_equal(b_o, b_t), dist


def test_sigma_filter_device_edges_and_clumps():
    """Device fixed point == reference serial sweep on edge/corner bad
    pixels, multi-iteration clumps, and a frame needing several erosion
    sweeps (exact equality: both take medians of identical multisets)."""
    ref = load_ref("vip_hci.stats.clip_sigma")
    rng = np.random.default_rng(11)
    fr = rng.normal(0, 5, (32, 32))
    bpm = (rng.random((32, 32)) < 0.15)
    bpm[0, :4] = True          # top edge run
    bpm[-1, -1] = True         # corner
    bpm[10:17, 10:17] = True   # 7x7 clump -> needs ~4 sweeps
    ours = sigma_filter(fr.copy(), bpm.astype(int))
    theirs = ref.sigma_filter(fr.copy(), bpm.astype(float))
    assert np.max(np.abs(ours - theirs)) == 0.0


def test_cube_sigma_filter_batched_matches_per_frame():
    from vip_tpu.stats.clip_sigma import cube_sigma_filter

    rng = np.random.default_rng(5)
    cube = rng.normal(0, 3, (4, 24, 24))
    bpms = rng.random((4, 24, 24)) < 0.1
    bpms[2, 5:12, 5:12] = True  # one frame needs more sweeps than others
    got = cube_sigma_filter(cube.copy(), bpms.astype(int))
    for i in range(4):
        want = sigma_filter(cube[i].copy(), bpms[i].astype(int))
        assert np.max(np.abs(got[i] - want)) == 0.0


def test_clip_array_half_res_y_and_min_std():
    """half_res_y window geometry and the min_std floor vs the host
    oracle (exercises the device kernel's non-default static branches)."""
    from vip_tpu.stats.clip_sigma import _clip_neighbor_host

    rng = np.random.default_rng(9)
    a = rng.normal(0, 2, (26, 26))
    seed = rng.random((26, 26)) < 0.1
    for nn, mad, min_std in ((5, False, 1.5), (5, True, None),
                             (3, False, None)):
        hbx = nn // 2
        hby = max(1, hbx // 2)
        want = _clip_neighbor_host(a, ~seed, 2.0, 2.5, hby, hbx, mad,
                                   min_std)
        got = clip_array(a, 2.0, 2.5, seed, neighbor=True,
                         num_neighbor=nn, mad=mad, min_std=min_std,
                         half_res_y=True)
        assert all(np.array_equal(x, y)
                   for x, y in zip(np.where(want), got)), (nn, mad, min_std)
