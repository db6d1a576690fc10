"""Out-of-core incremental PCA: lazy FITS reads, streaming contract,
and parity with the reference's sklearn IncrementalPCA engine."""

import numpy as np
import pytest

from conftest import make_adi_cube
from ref_oracle import load_ref

from vip_tpu.fits import open_fits, write_fits
from vip_tpu.psfsub.utils_pca import pca_incremental


@pytest.fixture(scope="module")
def fits_cube(tmp_path_factory):
    cube, angs = make_adi_cube(n=24, size=50)
    path = str(tmp_path_factory.mktemp("ooc") / "cube.fits")
    write_fits(path, cube.astype(np.float32), verbose=False)
    return path, cube.astype(np.float32), angs


def test_lazy_hdu_frame_slicing(fits_cube):
    path, cube, angs = fits_cube
    lazy = open_fits(path, n=0, return_memmap=True, verbose=False)
    assert lazy.shape == cube.shape and len(lazy) == cube.shape[0]
    assert np.allclose(lazy[3:9], cube[3:9])
    assert np.allclose(lazy[-1], cube[-1])
    assert np.allclose(lazy[::5], cube[::5])


class _CountingCube:
    """Lazy-cube wrapper that records the largest frame read and forbids
    whole-cube materialization."""

    def __init__(self, inner):
        self.inner = inner
        self.max_read = 0

    @property
    def shape(self):
        return self.inner.shape

    def __getitem__(self, key):
        out = self.inner[key]
        self.max_read = max(self.max_read,
                            out.shape[0] if out.ndim == 3 else 1)
        return out

    @property
    def data(self):
        raise AssertionError("pca_incremental materialized the full cube")


def test_pca_incremental_streams_batches(fits_cube):
    path, cube, angs = fits_cube
    lazy = open_fits(path, n=0, return_memmap=True, verbose=False)
    wrap = _CountingCube(lazy)
    frame = pca_incremental(wrap, angs, batch=6, ncomp=3, verbose=False)
    assert wrap.max_read <= 6
    assert frame.shape == cube.shape[1:]
    assert np.isfinite(frame).all()


def test_pca_incremental_sklearn_parity(fits_cube):
    path, cube, angs = fits_cube
    ref = load_ref("vip_hci.psfsub.utils_pca")
    theirs = ref.pca_incremental(cube.astype(float), angs, batch=6, ncomp=3,
                                 verbose=False)
    ours = pca_incremental(path, angs, batch=6, ncomp=3, verbose=False)
    assert np.abs(ours - theirs).max() < 1e-10


def test_pca_incremental_wire_dtype(fits_cube):
    """bf16 WIRE streaming (docs/PROFILING.md: the workload is
    host<->device-link-bound) errs at ~bf16 precision of the CUBE's
    dynamic range — the quantization rides through the projection — so
    the bound is relative to the input scale, not the residual scale."""
    path, cube, angs = fits_cube
    exact = pca_incremental(path, angs, batch=6, ncomp=3, verbose=False)
    approx = pca_incremental(path, angs, batch=6, ncomp=3, verbose=False,
                             wire_dtype="bfloat16")
    scale = np.abs(cube).max()
    assert np.abs(approx - exact).max() < 1e-2 * scale


def test_pca_incremental_return_residuals(fits_cube):
    path, cube, angs = fits_cube
    res = pca_incremental(path, angs, batch=6, ncomp=3, verbose=False,
                          return_residuals=True)
    assert res.shape == cube.shape
    ref = load_ref("vip_hci.psfsub.utils_pca")
    rres = ref.pca_incremental(cube.astype(float), angs, batch=6, ncomp=3,
                               verbose=False, return_residuals=True)
    assert np.abs(res - rres).max() < 1e-10
