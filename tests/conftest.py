"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
without TPU pods) with x64 enabled so numerical parity against the float64
reference can be asserted at tight tolerances.

Must set the env vars BEFORE jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_ENABLE_X64"] = "1"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/repo")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def make_adi_cube(n=30, size=101, fwhm=4.0, rng=None, rot_amp=40.0):
    """Synthetic ADI cube: speckle-ish smooth noise + star halo + a planted
    companion, with a monotonic parallactic-angle ramp. Stands in for the
    NACO β Pic fixture (reference tests/conftest.py:15-55) since the test
    image has no network access."""
    if rng is None:
        rng = np.random.default_rng(0)
    yy, xx = np.mgrid[:size, :size]
    cy = cx = size // 2
    r2 = (yy - cy) ** 2 + (xx - cx) ** 2
    halo = 100.0 * np.exp(-r2 / (2 * (6 * fwhm) ** 2))

    angles = np.linspace(0, rot_amp, n)
    from scipy.ndimage import gaussian_filter

    static_speckles = gaussian_filter(rng.standard_normal((size, size)), 2.0) * 5
    cube = np.empty((n, size, size))
    for i in range(n):
        noise = gaussian_filter(rng.standard_normal((size, size)), 1.5) * 0.5
        cube[i] = halo + static_speckles + noise
    return cube.astype(np.float64), angles.astype(np.float64)


@pytest.fixture(scope="session")
def adi_cube():
    return make_adi_cube()


@pytest.fixture(scope="session")
def psf_template(rng):
    """Gaussian PSF template, 2D, normalized similar to reference fixtures."""
    size = 39
    fwhm = 4.0
    sigma = fwhm / (2 * np.sqrt(2 * np.log(2)))
    yy, xx = np.mgrid[:size, :size]
    c = size // 2
    psf = np.exp(-((yy - c) ** 2 + (xx - c) ** 2) / (2 * sigma**2))
    return psf / psf.sum()
