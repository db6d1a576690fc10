"""Parity tests for the scattered-light disk model and fake-disk injection."""

import numpy as np
import pytest

from vip_tpu.fm.scattered_light_disk import (ScatteredLightDisk,
                                             Dust_distribution,
                                             Phase_function)
from vip_tpu.fm.fakedisk import cube_inject_fakedisk, cube_inject_trace

from ref_oracle import load_ref


@pytest.fixture(scope="module")
def ref_sld():
    return load_ref("vip_hci.fm.scattered_light_disk")


def _params():
    return dict(nx=80, ny=80, distance=20., itilt=65., omega=30.,
                pxInArcsec=0.01225, pa=40.,
                density_dico={'name': '2PowerLaws', 'ain': 4, 'aout': -4,
                              'a': 8, 'e': 0.2, 'ksi0': 1., 'gamma': 2.,
                              'beta': 1.}, xdo=0.5, ydo=-0.3)


@pytest.mark.parametrize("spf", [
    {'name': 'HG', 'g': 0.4, 'polar': False},
    {'name': 'HG', 'g': -0.3, 'polar': True},
    {'name': 'DoubleHG', 'g': [0.6, -0.6], 'weight': 0.7, 'polar': False},
])
def test_scattered_light_parity(ref_sld, spf):
    ours = ScatteredLightDisk(spf_dico=spf, **_params())
    img = ours.compute_scattered_light()
    ref = ref_sld.ScatteredLightDisk(spf_dico=spf, **_params())
    img_ref = ref.compute_scattered_light()
    assert img.shape == img_ref.shape
    scale = np.max(np.abs(img_ref))
    assert np.max(np.abs(img - img_ref)) / scale < 1e-10


def test_scattered_light_interpolated_spf(ref_sld):
    spf = {'name': 'interpolated',
           'phi': np.array([0, 30, 60, 90, 120, 150, 180], dtype=float),
           'spf': np.array([3.5, 0.7, 0.15, 0.05, 0.025, 0.015, 0.012])}
    ours = ScatteredLightDisk(spf_dico=spf, **_params())
    img = ours.compute_scattered_light()
    ref = ref_sld.ScatteredLightDisk(spf_dico=spf, **_params())
    img_ref = ref.compute_scattered_light()
    scale = np.max(np.abs(img_ref))
    assert np.max(np.abs(img - img_ref)) / scale < 1e-10


def test_scattering_angle_and_flux_max(ref_sld):
    p = _params()
    ours = ScatteredLightDisk(flux_max=10., **p)
    ref = ref_sld.ScatteredLightDisk(flux_max=10., **p)
    assert np.allclose(ours.get_scattering_angle(),
                       ref.get_scattering_angle(), atol=1e-12,
                       equal_nan=True)
    img = ours.compute_scattered_light()
    img_ref = ref.compute_scattered_light()
    assert abs(np.nanmax(img) - 10.) < 1e-10
    assert np.max(np.abs(img - img_ref)) < 1e-8


def test_density_cylindrical_parity(ref_sld):
    dico = {'name': '2PowerLaws', 'ain': 3, 'aout': -3.5, 'a': 12, 'e': 0.1,
            'ksi0': 0.8, 'gamma': 1.5, 'beta': 0.5, 'amin': 2.0}
    ours = Dust_distribution(dico)
    ref = ref_sld.Dust_distribution(dico)
    rng = np.random.default_rng(3)
    r = rng.uniform(0.5, 30, 200)
    ct = rng.uniform(-1, 1, 200)
    z = rng.uniform(-3, 3, 200)
    assert np.allclose(ours.density_cylindrical(r, ct, z),
                       ref.density_cylindrical(r, ct, z), atol=1e-14)


def test_phase_function_parity(ref_sld):
    cosphi = np.linspace(-0.99, 0.99, 101)
    for dico in ({'name': 'HG', 'g': 0.5, 'polar': True},
                 {'name': 'DoubleHG', 'g': [0.5, -0.4], 'weight': 0.6,
                  'polar': False},
                 {'name': 'HG', 'g': 0.2, 'polar': True,
                  'polar_polynom_coeff': [1e-4, -0.01, 0.5]}):
        ours = Phase_function(dict(dico))
        ref = ref_sld.Phase_function(dict(dico))
        assert np.allclose(ours.compute_phase_function_from_cosphi(cosphi),
                           ref.compute_phase_function_from_cosphi(cosphi),
                           atol=1e-14)


def test_cube_inject_fakedisk():
    disk = np.zeros((40, 40))
    disk[18:22, 10:30] = 1.0
    angs = np.linspace(0, 60, 5)
    cube = cube_inject_fakedisk(disk, angs)
    assert cube.shape == (5, 40, 40)
    # frame 0 has angle 0: rotation by -0 → identical
    assert np.allclose(cube[0], disk, atol=1e-7)
    # total flux approximately conserved by rotation
    assert np.allclose(cube.sum(axis=(1, 2)), disk.sum(), rtol=0.05)
    # convolution with a psf conserves flux too
    cube_c = cube_inject_fakedisk(disk, angs, psf=3.0)
    assert np.allclose(cube_c.sum(axis=(1, 2)), disk.sum(), rtol=0.05)


def test_cube_inject_trace():
    cube = np.zeros((4, 50, 50))
    angs = np.linspace(0, 30, 4)
    psf = np.zeros((7, 7))
    psf[3, 3] = 1.0
    out = cube_inject_trace(cube, psf, angs, flevel=2.0,
                            rad_dists=[8, 12], theta=[0, 20],
                            verbose=False)
    assert out.shape == cube.shape
    # each frame gains 2 point sources of flux 2
    assert np.allclose(out.sum(axis=(1, 2)), 4.0, atol=0.05)
