"""Tests for the NEGFD (negative fake disk) forward-modeling suite."""

import numpy as np
import pytest

from vip_tpu.fm.fakedisk import cube_inject_fakedisk
from vip_tpu.fm.negfd_interp import interpolate_model
from vip_tpu.fm.negfd_simplex import firstguess_fd
from vip_tpu.fm.utils_negfc import find_nearest
from vip_tpu.fm.utils_negfd import cube_disk_free
from vip_tpu.psfsub.medsub import median_sub

from ref_oracle import load_ref


def test_find_nearest_parity():
    ref = load_ref("vip_hci.fm.utils_negfc")
    arr = np.array([1.0, 3.0, 7.0, 12.0, 20.0])
    for val in (5.0, 7.0, 0.5, 25.0):
        for constraint in (None, "ceil", "floor", "ceil=", "floor="):
            try:
                expected = ref.find_nearest(arr, val, constraint=constraint,
                                            output="both")
            except ValueError:
                with pytest.raises(ValueError):
                    find_nearest(arr, val, constraint=constraint,
                                 output="both")
                continue
            got = find_nearest(arr, val, constraint=constraint,
                               output="both")
            assert got[1] == expected[1]
            assert got[0] == expected[0]


def test_interpolate_model_parity():
    ref = load_ref("vip_hci.fm.negfd_interp")
    rng = np.random.default_rng(0)
    # note: grids need >=2 candidates on each side of the query — the
    # reference's find_nearest crashes otherwise (argpartition kth bound)
    # (central interval of 4-point grids) — elsewhere the reference's
    # find_nearest itself crashes on argpartition kth bounds
    grid = [np.array([1.0, 2.0, 4.0, 8.0]),
            np.array([10.0, 20.0, 40.0, 80.0])]
    models = rng.normal(size=(4, 4, 8, 8))
    for params in ((2.5, 25.0), (3.2, 35.0), (2.1, 22.0)):
        for order in (1, -1, 0):
            ours = interpolate_model(params, grid, models,
                                     interp_order=order)
            theirs = ref.interpolate_model(params, grid, models,
                                           interp_order=order)
            assert np.allclose(ours, theirs, atol=1e-12), (params, order)


def test_cube_disk_free_removes_disk():
    rng = np.random.default_rng(1)
    n, sz = 8, 60
    angs = np.linspace(-30, 30, n)
    disk = np.zeros((sz, sz))
    disk[27:33, 15:45] = 1.0
    cube = cube_inject_fakedisk(2.0 * disk, angs) \
        + rng.normal(0, 0.01, (n, sz, sz))
    cdf = cube_disk_free((0, 0, 0, 1.0, 2.0), cube, angs, disk)
    # disk signal should be gone to within the noise level
    assert np.abs(cdf).max() < 0.2
    assert np.abs(cdf).std() < 0.02


@pytest.mark.slow
def test_firstguess_fd_recovers_flux():
    rng = np.random.default_rng(2)
    n, sz = 8, 60
    angs = np.linspace(-30, 30, n)
    disk = np.zeros((sz, sz))
    disk[27:33, 15:45] = 1.0
    true_f = 3.0
    cube = cube_inject_fakedisk(true_f * disk, angs) \
        + rng.normal(0, 0.01, (n, sz, sz))
    mask = np.zeros((sz, sz), dtype=bool)
    mask[20:40, 10:50] = True

    res = firstguess_fd(cube, angs, disk, mask, f_range=np.geomspace(0.5, 10, 12),
                        algo=median_sub, algo_options={"verbose": False},
                        simplex=True, imlib="skimage",
                        interpolation="biquintic", verbose=False)
    x0, y0, th0, sc0, f0 = res
    assert abs(f0 - true_f) < 0.3
    assert abs(x0) < 1 and abs(y0) < 1
    assert abs(sc0 - 1.0) < 0.1
