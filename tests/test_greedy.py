"""Functional + parity tests for the greedy iterative algorithms."""

import numpy as np
import pytest

from conftest import make_adi_cube
from ref_oracle import load_ref


@pytest.fixture(scope="module")
def cube_angles():
    return make_adi_cube(n=15, size=51)


def test_ipca_parity(cube_angles):
    ref_greedy = load_ref("vip_hci.greedy")
    from vip_tpu.greedy import ipca

    cube, angles = cube_angles
    kwargs = dict(ncomp=3, nit=3, thr=0.5, verbose=False)
    ref = ref_greedy.ipca(cube=cube.copy(), angle_list=angles, **kwargs)
    got = ipca(cube=cube.copy(), angle_list=angles, **kwargs)
    assert np.max(np.abs(ref - got)) < 1e-6


def test_ipca_incremental_runs(cube_angles):
    from vip_tpu.greedy import ipca

    cube, angles = cube_angles
    fr = ipca(cube=cube.copy(), angle_list=angles, ncomp=3, nit=2,
              mode="Christiaens24", thr=0.5, verbose=False)
    assert fr.shape == cube.shape[1:]
    assert np.isfinite(fr).all()


def test_inmf_runs(cube_angles):
    from vip_tpu.greedy import inmf

    cube, angles = cube_angles
    cube_pos = cube - cube.min() + 1.0
    fr = inmf(cube=cube_pos, angle_list=angles, ncomp=3, nit=2, thr=0.5,
              max_iter=100, handle_neg="subtr_min", verbose=False)
    assert fr.shape == cube.shape[1:]
    assert np.isfinite(fr).all()


def test_iroll_runs():
    from conftest import make_adi_cube
    from vip_tpu.greedy import iroll

    cube, _ = make_adi_cube(n=16, size=51)
    roll_angles = np.array([0.0] * 8 + [25.0] * 8)
    fr = iroll(cube=cube.copy(), angle_list=roll_angles, mode="individual",
               nit=2, thr=0.5, verbose=False)
    assert fr.shape == cube.shape[1:]
    assert np.isfinite(fr).all()
