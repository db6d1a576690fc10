"""ctypes loader for the native FITS decoder (fits_io.cpp).

Compiles the shared library on first use (cached next to the source) and
exposes ``decode`` / ``encode``; ``available()`` reports whether the
native path is usable. All callers must fall back to numpy when not.
"""

import ctypes
import hashlib
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fits_io.cpp")
_SO = os.path.join(_HERE, "_fits_io.so")
_STAMP = _SO + ".srchash"

_lib = None
_tried = False


def _src_hash():
    try:
        with open(_SRC, "rb") as fh:
            return hashlib.sha256(fh.read()).hexdigest()
    except OSError:
        return None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC,
           "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        digest = _src_hash()
        if digest:
            with open(_STAMP, "w") as fh:
                fh.write(digest)
        return True
    except Exception:
        return False


def _stale():
    """The binary is reused only when the recorded source hash matches;
    mtimes are unreliable (git does not preserve them)."""
    if not os.path.exists(_SO):
        return True
    digest = _src_hash()
    if digest is None:
        return False  # no source to compare against; trust the binary
    try:
        with open(_STAMP) as fh:
            return fh.read().strip() != digest
    except OSError:
        return True


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if _stale():
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.fits_decode_f32.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float)]
    lib.fits_decode_f32.restype = ctypes.c_int
    lib.fits_decode_f64.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double)]
    lib.fits_decode_f64.restype = ctypes.c_int
    lib.fits_encode_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64]
    lib.fits_encode_f64.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64]
    _lib = lib
    return _lib


def available():
    return _load() is not None


def decode(path, offset, shape, bitpix, bscale, bzero, precision):
    """Decode a FITS data block straight into a native-order float array
    via the multithreaded mmap decoder. Returns None on failure."""
    lib = _load()
    if lib is None:
        return None
    n = int(np.prod(shape)) if len(shape) else 1
    if precision == np.float64:
        out = np.empty(n, dtype=np.float64)
        rc = lib.fits_decode_f64(
            path.encode(), int(offset), n, int(bitpix), float(bscale),
            float(bzero), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    else:
        out = np.empty(n, dtype=np.float32)
        rc = lib.fits_decode_f32(
            path.encode(), int(offset), n, int(bitpix), float(bscale),
            float(bzero), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        return None
    return out.reshape(shape)


def encode(arr):
    """Byteswap a float32/float64 array to big-endian bytes using the
    native encoder. Returns None on failure."""
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(arr)
    out = np.empty(arr.nbytes, dtype=np.uint8)
    n = arr.size
    if arr.dtype == np.float32:
        lib.fits_encode_f32(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n)
    elif arr.dtype == np.float64:
        lib.fits_encode_f64(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n)
    else:
        return None
    return out.tobytes()
