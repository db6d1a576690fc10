"""Exact circular-aperture photometry in pure numpy.

Drop-in functional replacement for the small subset of ``photutils``
(CircularAperture / CircularAnnulus / aperture_photometry with
method='exact') that the reference uses for S/N and contrast-curve
photometry (vip_hci/metrics/snr_source.py:405-415,
metrics/contrcurve.py:1213+). The exact pixel/circle overlap is computed
analytically via signed quadrant-corner areas — identical mathematics to
photutils' C 'exact' mode, so values agree to float precision.

Shared by the test oracle stubs; vip_tpu carries an independent JAX
implementation of the same geometry (vip_tpu/ops/apertures.py).
"""

import numpy as np


def _quadrant_corner_area(x, y, r):
    """Area of circle (radius r, origin center) ∩ [0,x]×[0,y], x,y >= 0."""
    x = np.minimum(x, r)
    y = np.minimum(y, r)
    corner_in = x * x + y * y <= r * r

    def antideriv(t):
        # (r-t)(r+t) and atan2 avoid the catastrophic cancellation of
        # r^2 - t^2 / arcsin(t/r) near t = r (a ~1e-8 area error at
        # tangent pixels otherwise — caught by test_oracle_stubs)
        t = np.clip(t, -r, r)
        s = np.sqrt(np.maximum((r - t) * (r + t), 0.0))
        return 0.5 * (t * s + r * r * np.arctan2(t, s))

    # crossing point where circle height equals y (only meaningful y < r)
    tstar = np.sqrt(np.maximum((r - y) * (r + y), 0.0))
    xe = np.minimum(x, r)
    # region 1: 0..min(x, tstar) capped at height y
    a1 = y * np.minimum(xe, tstar)
    # region 2: tstar..x under the arc (when x > tstar)
    hi = np.maximum(xe, tstar)
    a2 = antideriv(hi) - antideriv(tstar)
    area = np.where(corner_in, x * y, a1 + a2)
    return area


def circle_rect_area(x0, x1, y0, y1, r):
    """Exact area of circle (radius r at origin) ∩ rectangle [x0,x1]×[y0,y1].

    Fully vectorized; uses inclusion–exclusion on signed corner areas.
    """
    def s_area(x, y):
        return (np.sign(x) * np.sign(y)
                * _quadrant_corner_area(np.abs(x), np.abs(y), r))

    return (s_area(x1, y1) - s_area(x0, y1) - s_area(x1, y0) + s_area(x0, y0))


def circular_overlap_weights(shape, xc, yc, r):
    """(ny, nx) array of exact overlap fractions of each unit pixel
    (centered at integer coordinates) with the circle of radius ``r``
    centered at (xc, yc)."""
    ny, nx = shape
    yy, xx = np.mgrid[:ny, :nx]
    x0 = xx - 0.5 - xc
    x1 = xx + 0.5 - xc
    y0 = yy - 0.5 - yc
    y1 = yy + 0.5 - yc
    return circle_rect_area(x0, x1, y0, y1, r)


class _Table(dict):
    """Tiny stand-in for astropy Table rows used by photutils results."""

    def __getitem__(self, key):
        return dict.__getitem__(self, key)


class CircularAperture:
    def __init__(self, positions, r):
        if not isinstance(positions, np.ndarray):
            positions = list(positions)
        positions = np.atleast_2d(np.asarray(positions, dtype=float))
        self.positions = positions  # (N, 2) as (x, y)
        self.r = float(r)

    def weights(self, shape):
        return np.stack([
            circular_overlap_weights(shape, x, y, self.r)
            for x, y in self.positions
        ])

    def area(self):
        return np.pi * self.r ** 2


class CircularAnnulus:
    def __init__(self, positions, r_in, r_out):
        self.inner = CircularAperture(positions, r_in)
        self.outer = CircularAperture(positions, r_out)
        self.positions = self.inner.positions

    def weights(self, shape):
        return self.outer.weights(shape) - self.inner.weights(shape)


def aperture_photometry(data, apertures, method="exact", subpixels=5, **kw):
    """Sum of data × exact overlap weights for each aperture position."""
    data = np.asarray(data, dtype=float)
    if method == "center":
        w = apertures.weights(data.shape)
        w = (w >= 0.5).astype(float)  # approximation; 'exact' is the default
    else:
        w = apertures.weights(data.shape)
    sums = np.array([(data * wi).sum() for wi in w])
    xs = apertures.positions[:, 0]
    ys = apertures.positions[:, 1]
    return _Table(aperture_sum=sums, xcenter=xs, ycenter=ys,
                  id=np.arange(1, len(sums) + 1))
