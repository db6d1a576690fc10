"""Tests for the object-oriented layer: Dataset, Frame, PostProc objects,
PPResult round-trips."""

import numpy as np
import pytest

from vip_tpu.objects import (Dataset, Frame, MedianBuilder, PCABuilder,
                             PPMedianSub, PPPCA, PPResult, LAST_SESSION)
from vip_tpu.config.paramenum import Runmode

from conftest import make_adi_cube


@pytest.fixture(scope="module")
def ds():
    cube, angs = make_adi_cube(n=12, size=40, rot_amp=60.0)
    yy, xx = np.mgrid[:13, :13]
    psf = np.exp(-((yy - 6)**2 + (xx - 6)**2) / (2 * (4 / 2.355)**2))
    d = Dataset(cube=cube, angles=angs, psf=psf, px_scale=0.0272)
    d.normalize_psf(fit_fwhm=True, verbose=False)
    return d


def test_dataset_basic_ops(ds):
    d = ds.copy()
    assert d.cube.shape == (12, 40, 40)
    assert d.fwhm == pytest.approx(4.0, abs=0.3)
    d.crop_frames(30)
    assert d.cube.shape == (12, 30, 30)
    d.subsample(2, mode="mean")
    assert d.cube.shape == (6, 30, 30)
    assert d.angles.shape == (6,)
    stats = d.frame_stats(region="annulus", annulus_inner_radius=5,
                          annulus_width=5, plot=False)
    assert len(stats) == 4
    nb = d.get_nbytes()
    assert nb > 0


def test_dataset_injections(ds):
    d = ds.copy()
    yx = d.inject_companions(50, rad_dists=10, verbose=False,
                             full_output=True)
    assert len(d.injections_yx) == 1
    fr = d.collapse()
    assert isinstance(fr, Frame)


def test_frame_methods(ds):
    fr = Frame(np.asarray(ds.collapse().data), fwhm=4.0)
    fr.crop(30)
    assert fr.data.shape == (30, 30)
    cy, cx = fr.get_center(verbose=False)
    assert cy == 15  # even-size convention: d // 2
    res = fr.stats(region="annulus", annulus_inner_radius=5,
                   annulus_width=5, verbose=False)
    assert len(res) == 4
    fr.shift(0.5, -0.5)
    fr.rotate(10)


def test_ppmediansub_run_and_results(ds, tmp_path):
    res = PPResult()
    obj = MedianBuilder(dataset=ds, results=res, verbose=False).build()
    obj.run(full_output=True)
    assert obj.frame_final.shape == (40, 40)
    obj.make_snrmap(approximated=True)
    assert obj.snr_map.shape == (40, 40)
    assert len(res.sessions) == 1
    assert res.sessions[0].algo_name == "median_sub"
    assert res.sessions[0].snr_map is not None

    # FITS round trip of the results container
    path = str(tmp_path / "sessions.fits")
    res.results_to_fits(path)
    res2 = PPResult(load_from_path=path)
    assert len(res2.sessions) == 1
    assert np.allclose(res2.sessions[0].frame,
                       np.asarray(res.sessions[0].frame, np.float32),
                       atol=1e-6)
    assert res2.sessions[0].algo_name == "median_sub"


def test_pppca_classic_and_annular(ds):
    obj = PCABuilder(dataset=ds, ncomp=5, verbose=False).build()
    obj.run(runmode=Runmode.CLASSIC, verbose=False)
    frame_classic = obj.frame_final
    assert frame_classic.shape == (40, 40)
    assert obj.pcs is not None

    obj2 = PCABuilder(dataset=ds, ncomp=3, asize=4, delta_rot=(0.1, 1),
                      verbose=False).build()
    obj2.run(runmode=Runmode.ANNULAR, verbose=False)
    assert obj2.frame_final.shape == (40, 40)

    # parity with the functional API
    from vip_tpu.psfsub import pca
    direct = pca(cube=ds.cube, angle_list=ds.angles, ncomp=5,
                 fwhm=ds.fwhm, verbose=False)
    assert np.allclose(frame_classic, direct, atol=1e-10)


def test_compute_significance(ds):
    d = ds.copy()
    d.inject_companions(100, rad_dists=10, theta=0, verbose=False)
    obj = PCABuilder(dataset=d, ncomp=4, verbose=False).build()
    obj.run(runmode=Runmode.CLASSIC, verbose=False)
    obj.make_snrmap(approximated=False)
    cy, cx = 20, 20
    obj.compute_significance(source_xy=(cx + 10, cy))
    assert obj.signf > 2


def test_dataset_save_load_list_attrs_and_shape(ds, tmp_path):
    """Round-trip a Dataset whose injections_yx is a list (npz stores it
    as a 2-d array; load must rebuild the list) and check shape-derived
    attributes are recomputed after load."""
    import copy

    d = copy.deepcopy(ds)
    d.normalize_psf(size=None, verbose=False)
    d.inject_companions(flux=10, rad_dists=[10], verbose=False)
    path = str(tmp_path / "ds_roundtrip")
    d.save(path)
    d2 = type(d).load(path)
    assert (d2.n, d2.y, d2.x, d2.w) == (d.n, d.y, d.x, d.w)
    assert isinstance(d2.injections_yx, list)
    assert np.allclose(d2.cube, d.cube)


def test_all_pp_classes_run(ds):
    """Every PP algorithm object builds, runs on a small dataset and
    registers a finite frame_final (the six classes not covered by the
    dedicated tests above; reference objects/pp*.py)."""
    from vip_tpu.objects import (AndroBuilder, FMMFBuilder,
                                 FrameDiffBuilder, LLSGBuilder,
                                 LOCIBuilder, NMFBuilder)

    d = ds.copy()
    d.inject_companions(60, rad_dists=10, verbose=False)
    builders = [
        (NMFBuilder, dict(ncomp=3, verbose=False)),
        (LLSGBuilder, dict(rank=3, verbose=False)),
        (LOCIBuilder, dict(verbose=False)),
        (FrameDiffBuilder, dict(verbose=False)),
        (AndroBuilder, dict(oversampling_fact=0.5, verbose=False)),
        (FMMFBuilder, dict(min_r=6, max_r=14, verbose=False)),
    ]
    for builder, kw in builders:
        obj = builder(dataset=d, **kw).build()
        obj.run()
        fr = np.asarray(obj.frame_final)
        assert fr.shape == d.cube.shape[1:], builder.__name__
        assert np.isfinite(fr).any(), builder.__name__
