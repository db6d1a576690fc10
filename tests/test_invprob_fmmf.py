"""Parity tests for FMMF (KLIP and LOCI models) against the reference."""

import numpy as np
import pytest

from vip_tpu.invprob.fmmf import fmmf

from ref_oracle import load_ref
from conftest import make_adi_cube


@pytest.fixture(scope="module")
def data():
    cube, angs = make_adi_cube(n=15, size=40, rot_amp=60.0)
    yy, xx = np.mgrid[:11, :11]
    psf = np.exp(-((yy - 5)**2 + (xx - 5)**2) / (2 * (4 / 2.355)**2))
    psf /= psf.sum()
    # plant a companion at r=6 rotating with the field
    cy = cx = 40 // 2
    for k, a in enumerate(angs):
        th = np.deg2rad(a)
        py = cy + 6 * np.sin(-th)
        px = cx + 6 * np.cos(-th)
        yyf, xxf = np.mgrid[:40, :40]
        cube[k] += 30 * np.exp(-((yyf - py)**2 + (xxf - px)**2) /
                               (2 * (4 / 2.355)**2))
    return cube, angs, psf


@pytest.mark.slow
@pytest.mark.parametrize("model", ["KLIP", "LOCI"])
def test_fmmf_parity(data, model):
    cube, angs, psf = data
    ref = load_ref("vip_hci.invprob.fmmf")
    kwargs = dict(fwhm=4.0, min_r=5, max_r=8, model=model, var="FR",
                  param={"ncomp": 5, "tolerance": 5e-3, "delta_rot": 0.25},
                  crop=5, nproc=1, verbose=False)
    ours = fmmf(cube=cube.copy(), angle_list=angs.copy(), psf=psf.copy(),
                **kwargs)
    theirs = ref.fmmf(cube=cube.copy(), angle_list=angs.copy(),
                      psf=psf.copy(), **kwargs)
    for o, t, name in zip(ours, theirs, ("flux", "snr")):
        scale = max(np.abs(t).max(), 1e-12)
        assert np.max(np.abs(o - t)) / scale < 1e-6, name
    # detection sanity: the planet at r=6 shows up
    assert ours[1].max() > 3


def test_fmmf_var_fm_parity(data):
    cube, angs, psf = data
    ref = load_ref("vip_hci.invprob.fmmf")
    kwargs = dict(fwhm=4.0, min_r=6, max_r=7, model="KLIP", var="FM",
                  param={"ncomp": 4, "tolerance": 5e-3, "delta_rot": 0.25},
                  crop=5, nproc=1, verbose=False)
    ours = fmmf(cube=cube.copy(), angle_list=angs.copy(), psf=psf.copy(),
                **kwargs)
    theirs = ref.fmmf(cube=cube.copy(), angle_list=angs.copy(),
                      psf=psf.copy(), **kwargs)
    for o, t in zip(ours, theirs):
        scale = max(np.abs(t).max(), 1e-12)
        assert np.max(np.abs(o - t)) / scale < 1e-6


def test_fmmf_batched_equals_serial(data, monkeypatch):
    """The batched per-pixel engine (fmmf._pixels_fm_batched) must equal
    the serial loop bit-for-bit up to summation order: both go through
    the same injection/rotation/crop helpers."""
    cube, angs, psf = data
    kwargs = dict(fwhm=4.0, min_r=6, max_r=8, model="KLIP", var="FR",
                  param={"ncomp": 4, "tolerance": 5e-3, "delta_rot": 0.25},
                  crop=5, nproc=1, verbose=False)
    monkeypatch.setenv("VIP_TPU_FMMF_BATCHED", "1")
    fb = fmmf(cube=cube.copy(), angle_list=angs.copy(), psf=psf.copy(),
              **kwargs)
    monkeypatch.setenv("VIP_TPU_FMMF_BATCHED", "0")
    fs = fmmf(cube=cube.copy(), angle_list=angs.copy(), psf=psf.copy(),
              **kwargs)
    for b, s in zip(fb, fs):
        scale = max(np.abs(s).max(), 1e-12)
        assert np.max(np.abs(b - s)) / scale < 1e-10
