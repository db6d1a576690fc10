"""Detection-recovery oracle tests (reference helpers.py:38-79 pattern)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def frame_with_blob():
    rng = np.random.default_rng(4)
    from scipy.ndimage import gaussian_filter

    fr = gaussian_filter(rng.standard_normal((81, 81)), 1.5) * 0.3
    yy, xx = np.mgrid[:81, :81]
    sigma = 4.0 / 2.355
    fr += 3.0 * np.exp(-((yy - 55) ** 2 + (xx - 30) ** 2) / (2 * sigma**2))
    return fr


@pytest.mark.parametrize("mode", ["lpeaks", "snrmapf", "log", "dog"])
def test_detection_recovers_blob(frame_with_blob, mode):
    from vip_tpu.metrics import detection

    yy, xx = detection(frame_with_blob, fwhm=4.0, mode=mode, snr_thresh=5,
                       plot=False, verbose=False)
    assert len(np.atleast_1d(yy)) >= 1
    d = np.hypot(np.atleast_1d(yy) - 55, np.atleast_1d(xx) - 30)
    assert d.min() < 3.0, f"mode {mode}: blob not found within 3px"


def test_mask_source_centers(frame_with_blob):
    from vip_tpu.metrics.detection import mask_source_centers, mask_sources

    mask = mask_source_centers(frame_with_blob, fwhm=4.0, y=(55,), x=(30,))
    assert mask[55, 30] == 0
    assert mask.sum() == mask.size - 1
    mask2 = mask_sources(mask, ap_rad=3)
    assert mask2.sum() < mask.sum()
