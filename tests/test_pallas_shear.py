"""Fused Pallas 3-shear rotation vs the jnp.fft pruned reference path.

Runs the Pallas kernels in interpreter mode on the CPU backend (the
compiled path is exercised on real TPU by bench.py). The two paths share
the quadrant/placement/crop geometry, so agreement here validates the
folded matmul-DFT math including the exact input/output band slicing.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vip_tpu.preproc.derotation import _fft_rotate_geometry
from vip_tpu.ops.fft import rotate_fft_exact_pruned
from vip_tpu.ops.pallas_shear import (rotate_fft_exact_fused,
                                      fused_shear_supported)


@pytest.mark.parametrize("impl", ["fused", "fused3"])
@pytest.mark.parametrize("y", [64, 128])
def test_fused_rotation_matches_pruned(y, impl):
    from vip_tpu.ops.pallas_shear import rotate_fft_exact_fused3

    pad_y, _pad_x, py0, px0, cy0, cy1, cx0, cx1 = _fft_rotate_geometry(y, y)
    geom = (pad_y, py0, px0, cy0, cy1, cx0, cx1)
    assert fused_shear_supported(y, pad_y)
    rng = np.random.default_rng(7)
    frames = rng.standard_normal((4, y, y)).astype(np.float32)
    angles = np.array([13.7, 61.2, 158.9, 305.4], np.float32)

    ref = rotate_fft_exact_pruned(
        jnp.asarray(frames), jnp.asarray(angles), *geom)
    fn = rotate_fft_exact_fused if impl == "fused" else \
        rotate_fft_exact_fused3
    fused = fn(jnp.asarray(frames), jnp.asarray(angles), *geom,
               interpret=True)

    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(ref - fused))) < 3e-5 * max(scale, 1.0)


def test_fused_support_gate():
    assert fused_shear_supported(512, 2048)
    assert not fused_shear_supported(511, 2048)   # odd frame
    assert not fused_shear_supported(100, 400)    # canvas not 128-foldable


def test_fused_small_matches_exact_chain():
    """Speed-mode fused shears vs a float64 complex 3-shear oracle.

    The packed jnp.fft path (`rotate_fft_fast_batch`) drops each shear's
    imaginary residue when frames are re-packed, so it is NOT a valid
    oracle for white-noise test frames (residue ~10% there, negligible
    for real FoV-masked content). The fused path carries the complex
    intermediates like the exact mode and only takes the real part at
    the end — compare against the same computation in float64.
    """
    from vip_tpu.ops.pallas_shear import (fused_small_supported,
                                          rotate_fft_small_fused)

    N = 256
    assert fused_small_supported(N)
    rng = np.random.default_rng(11)
    frames = rng.standard_normal((4, N, N)).astype(np.float32)
    angles = np.array([7.3, 44.2, 1.0, 334.6], np.float32)

    # float64 oracle: quadrant rot90 about (N/2, N/2) + 3 complex shears
    kint = np.fft.fftfreq(N, 1.0 / N)
    q = np.arange(N, dtype=np.float64) - N / 2

    def sh(z, c, ax):
        ramp = np.outer(q, kint) / N if ax == 2 else np.outer(kint, q) / N
        ph = np.exp(-2j * np.pi * c * ramp)
        return np.fft.ifft(ph * np.fft.fft(z, axis=ax), axis=ax)

    ref = np.empty_like(frames, np.float64)
    for i, ang in enumerate(angles % 360.0):
        d = ang % 90.0
        dangle = d - 90.0 if d > 45.0 else d
        k = int(round(ang / 90.0)) % 4 if ang > 45.0 else 0
        dangle = dangle if ang > 45.0 else ang
        ext = np.zeros((N + 1, N + 1))
        ext[:-1, :-1] = frames[i]
        fr = np.rot90(ext, k)[:-1, :-1].astype(np.complex128)
        a = np.tan(np.deg2rad(dangle) / 2)
        b = -np.sin(np.deg2rad(dangle))
        z = sh(sh(sh(fr[None], a, 2), b, 1), a, 2)
        ref[i] = z[0].real

    fused = rotate_fft_small_fused(jnp.asarray(frames),
                                   jnp.asarray(angles), interpret=True)
    scale = float(np.max(np.abs(ref)))
    assert float(jnp.max(jnp.abs(jnp.asarray(ref) - fused))) \
        < 3e-5 * max(scale, 1.0)

    from vip_tpu.ops.pallas_shear import rotate_fft_small_fused3

    fused3 = rotate_fft_small_fused3(jnp.asarray(frames),
                                     jnp.asarray(angles), interpret=True)
    assert float(jnp.max(jnp.abs(jnp.asarray(ref) - fused3))) \
        < 3e-5 * max(scale, 1.0)
