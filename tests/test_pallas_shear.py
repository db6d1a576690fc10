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


@pytest.mark.parametrize("y", [64, 128])
def test_fused_rotation_matches_pruned(y):
    pad_y, _pad_x, py0, px0, cy0, cy1, cx0, cx1 = _fft_rotate_geometry(y, y)
    geom = (pad_y, py0, px0, cy0, cy1, cx0, cx1)
    assert fused_shear_supported(y, pad_y)
    rng = np.random.default_rng(7)
    frames = rng.standard_normal((4, y, y)).astype(np.float32)
    angles = np.array([13.7, 61.2, 158.9, 305.4], np.float32)

    ref = rotate_fft_exact_pruned(
        jnp.asarray(frames), jnp.asarray(angles), *geom)
    fused = rotate_fft_exact_fused(
        jnp.asarray(frames), jnp.asarray(angles), *geom, interpret=True)

    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(ref - fused))) < 3e-5 * max(scale, 1.0)


def test_fused_support_gate():
    assert fused_shear_supported(512, 2048)
    assert not fused_shear_supported(511, 2048)   # odd frame
    assert not fused_shear_supported(100, 400)    # canvas not 128-foldable
