"""Tests for the self-contained FITS reader/writer (+ native decoder)."""

import numpy as np
import pytest

from vip_tpu.fits import (Header, byteswap_array, dict_to_fitsheader,
                          fitsheader_to_dict, info_fits, open_fits,
                          open_header, verify_fits, write_fits)
from vip_tpu.fits import _native


def test_roundtrip_simple(tmp_path):
    path = str(tmp_path / "cube.fits")
    arr = np.random.default_rng(0).normal(0, 1, (4, 16, 16)) \
        .astype(np.float32)
    write_fits(path, arr, verbose=False)
    back = open_fits(path, verbose=False)
    assert back.shape == arr.shape
    assert np.array_equal(back, arr)
    verify_fits(path)


def test_roundtrip_header_and_precision(tmp_path):
    path = str(tmp_path / "img.fits")
    arr = np.arange(100, dtype=np.float64).reshape(10, 10)
    hdr = Header({"OBJECT": "beta Pic", "EXPTIME": 1.5, "COADDS": 4,
                  "GOOD": True})
    write_fits(path, arr, header=hdr, precision=np.float64, verbose=False)
    back, bh = open_fits(path, header=True, precision=np.float64,
                         verbose=False)
    assert np.array_equal(back, arr)
    assert bh["OBJECT"] == "beta Pic"
    assert bh["EXPTIME"] == 1.5
    assert bh["COADDS"] == 4
    assert bh["GOOD"] is True


def test_multi_extension(tmp_path):
    path = str(tmp_path / "multi.fits")
    a = np.ones((5, 5), dtype=np.float32)
    b = np.full((3, 4), 2.0, dtype=np.float32)
    write_fits(path, (a, b), verbose=False)
    data = open_fits(path, n=-2, verbose=False)
    assert len(data) == 2
    assert np.array_equal(data[0], a)
    assert np.array_equal(data[1], b)
    ext1 = open_fits(path, n=1, verbose=False)
    assert np.array_equal(ext1, b)


def test_integer_bitpix_and_bscale(tmp_path):
    # hand-build a BITPIX=16 file with BSCALE/BZERO
    path = str(tmp_path / "int16.fits")
    raw = np.arange(-5, 7, dtype=">i2").reshape(3, 4)
    hdr = Header()
    hdr["SIMPLE"] = True
    hdr["BITPIX"] = 16
    hdr["NAXIS"] = 2
    hdr["NAXIS1"] = 4
    hdr["NAXIS2"] = 3
    hdr["BSCALE"] = 2.0
    hdr["BZERO"] = 10.0
    cards = hdr.tocards() + ["END".ljust(80)]
    text = "".join(cards)
    with open(path, "wb") as fh:
        fh.write(text.encode() + b" " * ((-len(text)) % 2880))
        fh.write(raw.tobytes() + b"\x00" * ((-raw.nbytes) % 2880))
    data = open_fits(path, precision=np.float64, verbose=False)
    expected = 2.0 * raw.astype(np.float64) + 10.0
    assert np.array_equal(data, expected)


def test_native_decoder_available_and_matches(tmp_path):
    assert _native.available(), "native FITS decoder failed to build"
    path = str(tmp_path / "big.fits")
    arr = np.random.default_rng(1).normal(size=(8, 64, 64)) \
        .astype(np.float32)
    write_fits(path, arr, verbose=False)
    # force the numpy fallback and compare against the native path
    from vip_tpu.fits.fits import _scan_hdus, _read_hdu_data
    hdus = _scan_hdus(path)
    native = _native.decode(path, hdus[0]["offset"], hdus[0]["shape"],
                            hdus[0]["bitpix"], 1.0, 0.0, np.float32)
    fallback = np.fromfile(path, dtype=">f4", count=arr.size,
                           offset=hdus[0]["offset"]).reshape(arr.shape)
    assert np.array_equal(native, fallback.astype(np.float32))


def test_memmap_and_header_utils(tmp_path):
    path = str(tmp_path / "lazy.fits")
    arr = np.ones((6, 6), dtype=np.float32) * 3
    write_fits(path, arr, header=Header({"EXTNAME": "SCI"}), verbose=False)
    hdu = open_fits(path, return_memmap=True, verbose=False)
    assert hdu.header["EXTNAME"] == "SCI"
    assert np.array_equal(hdu.data, arr)

    h = dict_to_fitsheader({"ALGO_NAME": "pca", "NCOMP": 5})
    params, algo = fitsheader_to_dict(h)
    assert algo == "pca"
    assert params["ncomp"] == 5
    hh = open_header(path)
    assert hh["EXTNAME"] == "SCI"

    x = np.array([1.0, 2.0], dtype=">f8")
    sw = byteswap_array(x)
    assert np.array_equal(np.asarray(sw, dtype=float), [1.0, 2.0])


def test_lazy_hdu_slice_variants(tmp_path):
    """Negative-step, empty and strided slices of the lazy HDU behave
    like numpy slicing on the decoded array."""
    path = str(tmp_path / "slices.fits")
    cube = np.arange(5 * 4 * 4, dtype=np.float32).reshape(5, 4, 4)
    write_fits(path, cube, verbose=False)
    lazy = open_fits(path, return_memmap=True, verbose=False)
    assert np.array_equal(lazy[::-1], cube[::-1])
    assert np.array_equal(lazy[4:1:-1], cube[4:1:-1])
    assert np.array_equal(lazy[1:4:2], cube[1:4:2])
    assert lazy[3:3].shape == (0, 4, 4)


def test_seeing_from_header_roundtrip(tmp_path):
    """ESO DIMM seeing averages through our own writer/parser
    (reference headers.py:125-154)."""
    import numpy as np

    from vip_tpu.fits import write_fits
    from vip_tpu.fits.headers import seeing_from_header

    p = str(tmp_path / "x.fits")
    hdr = {"HIERARCH ESO TEL AMBI FWHM START": 0.8,
           "HIERARCH ESO TEL AMBI FWHM END": 1.2}
    write_fits(p, np.zeros((4, 4), np.float32), header=hdr, verbose=False)
    assert seeing_from_header(p) == 1.0
