"""Parity/functional tests for LLSG, NMF, LOCI, frame_diff, roll_sub."""

import numpy as np
import pytest

from conftest import make_adi_cube
from ref_oracle import load_ref


@pytest.fixture(scope="module")
def cube_angles():
    return make_adi_cube(n=20, size=61)


@pytest.fixture(scope="module")
def ref_psfsub():
    return load_ref("vip_hci.psfsub")


def test_llsg_parity(ref_psfsub, cube_angles):
    from vip_tpu.psfsub import llsg

    cube, angles = cube_angles
    kwargs = dict(fwhm=4, rank=3, thresh=1, max_iter=4, random_seed=10,
                  verbose=False)
    ref = ref_psfsub.llsg(cube.copy(), angles, **kwargs)
    got = llsg(cube.copy(), angles, **kwargs)
    assert np.max(np.abs(ref - got)) < 1e-7


def test_nmf_parity(ref_psfsub, cube_angles):
    """NMF consistency with the reference, within its own RNG variability.

    sklearn's NNDSVD init runs an *unconverged* randomized SVD seeded from
    the global RNG, so the reference's own residual frames vary between
    runs by as much as the frame scale. We therefore assert that our
    (deterministic) result deviates from a reference run by no more than
    the reference deviates from itself across seeds.
    """
    from vip_tpu.psfsub import nmf

    cube, angles = cube_angles
    cube_pos = cube - cube.min() + 1.0
    cube_pos += 3 * np.median(cube_pos, axis=0)[None]
    kwargs = dict(ncomp=3, max_iter=300, init_svd="nndsvda",
                  handle_neg="mask", verbose=False)
    np.random.seed(1)
    ref1 = ref_psfsub.nmf(cube_pos.copy(), angles, **kwargs)
    np.random.seed(2)
    ref2 = ref_psfsub.nmf(cube_pos.copy(), angles, **kwargs)
    self_var = np.max(np.abs(ref1 - ref2))
    got = nmf(cube_pos.copy(), angles, **kwargs)
    assert np.max(np.abs(ref1 - got)) < max(2 * self_var, 1e-8)
    # the low-rank reconstructions (init-robust) must agree tightly
    np.random.seed(1)
    H_r, rec_r, res_r, _, _ = ref_psfsub.nmf(cube_pos.copy(), angles,
                                             full_output=True, **kwargs)
    H_g, rec_g, res_g, _, _ = nmf(cube_pos.copy(), angles,
                                  full_output=True, **kwargs)
    assert np.max(np.abs(rec_r - rec_g)) < 2e-3 * np.abs(rec_r).max()


@pytest.mark.slow
def test_nmf_annular_parity(ref_psfsub, cube_angles):
    from vip_tpu.psfsub import nmf_annular

    cube, angles = cube_angles
    cube_pos = cube - cube.min() + 1.0
    kwargs = dict(ncomp=2, fwhm=4.0, asize=6, n_segments=1, max_iter=100,
                  random_state=42, verbose=False)
    ref = ref_psfsub.nmf_annular(cube_pos.copy(), angles.copy(), **kwargs)
    got = nmf_annular(cube_pos.copy(), angles.copy(), **kwargs)
    # multiplicative updates amplify fp differences over ~100 iterations;
    # 5e-3 abs on a ~0.8-scale frame is solver-level agreement
    assert np.max(np.abs(np.asarray(ref) - np.asarray(got))) < 5e-3


@pytest.mark.parametrize("solver,tol_abs", [
    ("lstsq", 1e-7),
    # the device Lawson–Hanson NNLS matches scipy.optimize.nnls exactly.
    # 'lsq' converges to KKT residual 1e-12 while scipy's trf/lsmr stops
    # at its default tolerance (status 2) on these ill-conditioned
    # (κ~1e7) speckle Grams, leaving a ~3e-4 gap that is scipy's
    # truncation, not ours — test_lsq_solvers.py asserts our objective
    # is at least as low as scipy's on the same segments
    ("nnls", 1e-6),
    ("lsq", 5e-4),
])
def test_xloci_parity(ref_psfsub, cube_angles, solver, tol_abs):
    from vip_tpu.psfsub import xloci

    cube, angles = cube_angles
    kwargs = dict(fwhm=4, asize=10, delta_rot=0.3, n_segments=2,
                  dist_threshold=90, solver=solver, tol=1e-2, verbose=False)
    ref = ref_psfsub.xloci(cube.copy(), angles, **kwargs)
    got = xloci(cube.copy(), angles, **kwargs)
    assert np.max(np.abs(ref - got)) < tol_abs


def test_frame_diff_parity(ref_psfsub, cube_angles):
    from vip_tpu.psfsub import frame_diff

    cube, angles = cube_angles
    kwargs = dict(fwhm=4, metric="manhattan", dist_threshold=90,
                  delta_rot=0.3, radius_int=2, asize=10, verbose=False)
    ref = ref_psfsub.frame_diff(cube.copy(), angles, **kwargs)
    got = frame_diff(cube.copy(), angles, **kwargs)
    assert np.max(np.abs(ref - got)) < 1e-7


def test_frame_diff_nsimilar_parity(ref_psfsub, cube_angles):
    from vip_tpu.psfsub import frame_diff

    cube, angles = cube_angles
    kwargs = dict(fwhm=4, metric="euclidean", dist_threshold=90, n_similar=4,
                  delta_rot=0.3, radius_int=2, asize=10, verbose=False)
    ref = ref_psfsub.frame_diff(cube.copy(), angles, **kwargs)
    got = frame_diff(cube.copy(), angles, **kwargs)
    assert np.max(np.abs(ref - got)) < 1e-7


def test_roll_sub_parity(ref_psfsub, cube_angles):
    from vip_tpu.psfsub import roll_sub

    cube, angles = cube_angles
    roll_angles = np.array([0.0] * 10 + [30.0] * 10)
    for mode in ["mean", "individual"]:
        ref = ref_psfsub.roll_sub(cube.copy(), roll_angles.copy(), mode=mode,
                                  verbose=False)
        got = roll_sub(cube.copy(), roll_angles.copy(), mode=mode,
                       verbose=False)
        assert np.max(np.abs(ref - got)) < 1e-8, mode
