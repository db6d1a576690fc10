"""Exact circular-aperture photometry and Student-t S/N, fully on device.

Replaces the reference's photutils 'exact' aperture photometry
(vip_hci/metrics/snr_source.py:405-415) and its pixel-per-process S/N map
pool (snr_source.py:121-122). The exact unit-pixel/circle overlap area is
computed analytically via signed quadrant-corner areas (identical math to
photutils' C implementation), evaluated over a static gather window around
each (possibly fractional) aperture center — so fluxes at arbitrary centers
vmap/batch freely.

The Mawet+14 small-sample-statistics ring of independent apertures
(snr_source.py:226-318) has the closed form: aperture i is the source
vector rotated by -i·(2·asin(fwhm/2/sep)), which turns the reference's
per-aperture recurrence into one batched rotation.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["aperture_flux", "snr_at", "snrmap_engine", "circle_overlap_window"]


def _quadrant_corner_area(x, y, r):
    """Area of circle (radius r at origin) ∩ [0,x]×[0,y] for x,y >= 0."""
    x = jnp.minimum(x, r)
    y = jnp.minimum(y, r)
    corner_in = x * x + y * y <= r * r

    def antideriv(t):
        # (r-t)(r+t) and atan2 avoid the catastrophic cancellation of
        # r^2 - t^2 / arcsin(t/r) near t = r (a ~1e-8 area error at
        # tangent pixels otherwise — caught by tests/test_oracle_stubs)
        t = jnp.clip(t, -r, r)
        s = jnp.sqrt(jnp.maximum((r - t) * (r + t), 0.0))
        return 0.5 * (t * s + r * r * jnp.arctan2(t, s))

    tstar = jnp.sqrt(jnp.maximum((r - y) * (r + y), 0.0))
    xe = jnp.minimum(x, r)
    a1 = y * jnp.minimum(xe, tstar)
    hi = jnp.maximum(xe, tstar)
    a2 = antideriv(hi) - antideriv(tstar)
    return jnp.where(corner_in, x * y, a1 + a2)


def _circle_rect_area(x0, x1, y0, y1, r):
    def s_area(x, y):
        return (jnp.sign(x) * jnp.sign(y)
                * _quadrant_corner_area(jnp.abs(x), jnp.abs(y), r))

    return s_area(x1, y1) - s_area(x0, y1) - s_area(x1, y0) + s_area(x0, y0)


def circle_overlap_window(cy, cx, r, window):
    """Exact overlap fractions of the pixels in a (W, W) window anchored at
    floor(cy - W/2)+... with the circle of radius ``r`` at (cy, cx).

    Returns (weights (W, W), y0, x0) where (y0, x0) is the window anchor
    (integer pixel of the window's [0,0] element). Traced-center friendly.
    """
    W = window
    y0 = jnp.floor(cy).astype(jnp.int32) - W // 2
    x0 = jnp.floor(cx).astype(jnp.int32) - W // 2
    yy = y0 + jnp.arange(W)[:, None]
    xx = x0 + jnp.arange(W)[None, :]
    ylo = yy - 0.5 - cy
    yhi = yy + 0.5 - cy
    xlo = xx - 0.5 - cx
    xhi = xx + 0.5 - cx
    w = _circle_rect_area(xlo, xhi, ylo, yhi, r)
    return w, y0, x0


def _aperture_flux_core(image, ys, xs, r, window):
    ny, nx = image.shape

    def one(cy, cx):
        w, y0, x0 = circle_overlap_window(cy, cx, r, window)
        rows = jnp.clip(y0 + jnp.arange(window), 0, ny - 1)
        cols = jnp.clip(x0 + jnp.arange(window), 0, nx - 1)
        inside = ((y0 + jnp.arange(window) >= 0)
                  & (y0 + jnp.arange(window) < ny))[:, None] \
            & ((x0 + jnp.arange(window) >= 0)
               & (x0 + jnp.arange(window) < nx))[None, :]
        patch = image[rows[:, None], cols[None, :]]
        return jnp.sum(jnp.where(inside, patch * w, 0.0))

    return jax.vmap(one)(jnp.asarray(ys), jnp.asarray(xs))


_aperture_flux_jit = jax.jit(_aperture_flux_core,
                             static_argnames=("window",))

_aperture_flux_images_jit = jax.jit(
    jax.vmap(_aperture_flux_core, in_axes=(0, 0, 0, None, None)),
    static_argnames=("window",))


def aperture_flux_images(images, ys, xs, r, window=None):
    """Exact-aperture fluxes on a STACK of images in one dispatch.

    images: (p, ny, nx); ys, xs: length-p sequences of per-image aperture
    centers (possibly ragged). Returns a list of p (k_i,) arrays. One
    device round-trip replaces p (or 2p) separate :func:`aperture_flux`
    calls — e.g. the per-pattern photometry of ``throughput``
    (reference contrcurve.py:1030-1068) at ~30 ms per dispatch through a
    remote tunnel.
    """
    if window is None:
        window = int(2 * float(r) + 4)
    counts = [len(np.atleast_1d(y)) for y in ys]
    kmax = max(64, 1 << max(0, (max(counts) - 1)).bit_length())
    p = len(counts)
    ys_p = np.zeros((p, kmax))
    xs_p = np.zeros((p, kmax))
    for i in range(p):
        ys_p[i, :counts[i]] = np.asarray(ys[i], dtype=float).reshape(-1)
        xs_p[i, :counts[i]] = np.asarray(xs[i], dtype=float).reshape(-1)
    out = np.asarray(_aperture_flux_images_jit(
        jnp.asarray(np.asarray(images, dtype=float)), ys_p, xs_p, r,
        window))
    return [out[i, :counts[i]] for i in range(p)]


def aperture_flux(image, ys, xs, r, window=None):
    """Exact-aperture fluxes of ``image`` at arbitrary centers (vmapped).

    ys, xs: (k,) aperture centers (floats, traced ok). Returns (k,) sums.
    Apertures fully inside the frame are exact; windows are clipped at the
    frame edge (matching photutils' zero-contribution outside the image).

    Concrete (host) calls are padded to power-of-two buckets so repeated
    calls with varying aperture counts (one per annulus in
    ``noise_per_annulus``) share a handful of compiled programs instead
    of recompiling per count.
    """
    if window is None:
        window = int(2 * float(r) + 4)
    concrete = not isinstance(ys, jax.core.Tracer) \
        and not isinstance(xs, jax.core.Tracer)
    if not concrete:
        return _aperture_flux_core(image, ys, xs, r, window)
    ys = np.asarray(ys, dtype=float).reshape(-1)
    xs = np.asarray(xs, dtype=float).reshape(-1)
    k = ys.shape[0]
    bucket = max(64, 1 << max(0, (k - 1)).bit_length())
    ys_p = np.zeros(bucket)
    xs_p = np.zeros(bucket)
    ys_p[:k] = ys
    xs_p[:k] = xs
    return _aperture_flux_jit(image, ys_p, xs_p, r, window)[:k]


def ring_aperture_centers(sourcey, sourcex, cy, cx, fwhm, n_max):
    """Centers of the Mawet+14 ring of independent apertures (closed form of
    snr_source.py:286-318's rotation recurrence; clockwise, source first).

    Returns (ys, xs, n_apertures) with ``n_max`` entries (mask with
    ``arange(n_max) < n_apertures``).
    """
    dy = sourcey - cy
    dx = sourcex - cx
    sep = jnp.hypot(dy, dx)
    angle = 2 * jnp.arcsin(fwhm / 2.0 / sep)
    number_apertures = jnp.floor(2 * jnp.pi / angle).astype(jnp.int32)
    i = jnp.arange(n_max)
    # reference recurrence uses sign=-1 (clockwise): rotation by +i*angle
    # of (dx, dy) with x' = cos·x + sin·y, y' = cos·y - sin·x
    ca = jnp.cos(i * angle)
    sa = jnp.sin(i * angle)
    xs = ca * dx + sa * dy + cx
    ys = ca * dy - sa * dx + cy
    return ys, xs, number_apertures


def snr_at(image, sourcey, sourcex, cy, cx, fwhm, n_max, window,
           exclude_negative_lobes=False, image2=None, use2alone=False):
    """Student-t corrected S/N at one (traced) position — jit/vmap-able.

    Implements snr_source.py:321-455: ring of independent apertures, exact
    photometry, S/N = (f0 - mean(bkg)) / (std(bkg, ddof=1)·sqrt(1 + 1/n2)).
    """
    ys, xs, n_ap = ring_aperture_centers(sourcey, sourcex, cy, cx, fwhm,
                                         n_max)
    fluxes = aperture_flux(image, ys, xs, fwhm / 2.0, window=window)
    valid = jnp.arange(n_max) < n_ap
    if exclude_negative_lobes:
        idx = jnp.arange(n_max)
        valid = valid & (idx != 1) & (idx != n_ap - 1)

    f_source = fluxes[0]
    bkg_valid = valid.at[0].set(False)

    if image2 is not None:
        fluxes2 = aperture_flux(image2, ys, xs, fwhm / 2.0, window=window)
        if use2alone:
            f_all = fluxes2
            v_all = bkg_valid
        else:
            f_all = jnp.concatenate([fluxes, fluxes2])
            v_all = jnp.concatenate([bkg_valid, bkg_valid])
    else:
        f_all = fluxes
        v_all = bkg_valid

    n2 = jnp.sum(v_all)
    mean_bkg = jnp.sum(jnp.where(v_all, f_all, 0.0)) / n2
    var = jnp.sum(jnp.where(v_all, (f_all - mean_bkg) ** 2, 0.0)) / (n2 - 1)
    std = jnp.sqrt(var)
    return f_source, (f_source - mean_bkg) / (std * jnp.sqrt(1 + 1.0 / n2))


@functools.partial(
    jax.jit,
    static_argnames=("fwhm", "n_max", "window", "exclude_negative_lobes",
                     "use2alone", "chunk"),
)
def snrmap_engine(image, coords_y, coords_x, cy, cx, fwhm, n_max, window,
                  exclude_negative_lobes=False, image2=None,
                  use2alone=False, chunk=4096):
    """Batched S/N at many positions: the whole S/N map in one XLA program
    (replaces the pool over pixels at snr_source.py:121-122). ``chunk``
    bounds the vmapped pixel batch per step (keeps the compiled program
    and the aperture-window working set small on large frames)."""
    def one(y, x):
        return snr_at(image, y, x, cy, cx, fwhm, n_max, window,
                      exclude_negative_lobes=exclude_negative_lobes,
                      image2=image2, use2alone=use2alone)[1]

    ys = coords_y.astype(image.dtype)
    xs = coords_x.astype(image.dtype)
    npix = ys.shape[0]
    if chunk is None or npix <= chunk:
        return jax.vmap(one)(ys, xs)
    nch = -(-npix // chunk)
    pad = nch * chunk - npix
    ys_p = jnp.pad(ys, (0, pad), constant_values=cy + fwhm + 2)
    xs_p = jnp.pad(xs, (0, pad), constant_values=cx)
    out = jax.lax.map(
        lambda yx: jax.vmap(one)(yx[0], yx[1]),
        (ys_p.reshape(nch, chunk), xs_p.reshape(nch, chunk)))
    return out.reshape(-1)[:npix]


# ---------------------------------------------------------------------------
# polar fast S/N map: ring statistics as Fourier comb sums
# ---------------------------------------------------------------------------
def _aperture_kernel(r_ap):
    """Exact-overlap photometry kernel: area of the disc of radius ``r_ap``
    (centered on an integer pixel) intersected with each neighboring pixel.
    Correlating the image with this kernel gives the exact circular
    aperture flux at every integer center."""
    r = float(r_ap)

    def antideriv(t):
        # cancellation-free near t = r (see _quadrant_corner_area)
        t = np.clip(t, -r, r)
        s = np.sqrt(np.maximum((r - t) * (r + t), 0.0))
        return 0.5 * (t * s + r * r * np.arctan2(t, s))

    def corner(x, y):
        x = np.minimum(x, r)
        y = np.minimum(y, r)
        inside = x * x + y * y <= r * r
        tstar = np.sqrt(np.maximum((r - y) * (r + y), 0.0))
        a1 = y * np.minimum(x, tstar)
        a2 = antideriv(np.maximum(x, tstar)) - antideriv(tstar)
        return np.where(inside, x * y, a1 + a2)

    def s_area(x, y):
        return np.sign(x) * np.sign(y) * corner(np.abs(x), np.abs(y))

    half = int(np.ceil(r)) + 1
    yy, xx = np.mgrid[-half:half + 1, -half:half + 1]
    x0, x1 = xx - 0.5, xx + 0.5
    y0, y1 = yy - 0.5, yy + 0.5
    return (s_area(x1, y1) - s_area(x0, y1) - s_area(x1, y0)
            + s_area(x0, y0))


@functools.partial(jax.jit, static_argnames=("n_theta", "fwhm",
                                             "exclude_negative_lobes"))
def snrmap_polar_engine(image, fwhm, n_theta=0,
                        exclude_negative_lobes=False):
    """Full-frame Mawet+14 S/N map as a polar-domain device program.

    TPU-native reformulation of the per-pixel engine: (1) the exact
    aperture-flux field AF is one small convolution (MXU) of the image
    with the analytic disc-overlap kernel; (2) AF is bilinearly resampled
    to a polar grid; (3) for each radius row, the ring-aperture sums
    sum_m AF(theta + m*dtheta) (and of AF^2) are geometric Fourier combs —
    one FFT per row instead of per-pixel gathers; (4) the Student-t S/N is
    mapped back to cartesian. Accuracy is interpolation-limited (~1%% of
    the exact per-pixel engine); use ``snr``/``snrmap`` for exact values.
    """
    ny, nx = image.shape
    cy = ny / 2 if ny % 2 == 0 else (ny - 1) / 2
    cx = nx / 2 if nx % 2 == 0 else (nx - 1) / 2
    r_ap = fwhm / 2.0
    n_r = int(min(cy, cx, ny - cy, nx - cx)) - int(np.ceil(r_ap)) - 1
    if n_theta == 0:
        n_theta = 4 * max(ny, nx)
    radii = jnp.arange(1, n_r + 1, dtype=image.dtype)
    snr_p = polar_snr_rows(image, radii, fwhm, n_theta,
                           exclude_negative_lobes)
    return polar_snr_to_cart(snr_p, (ny, nx), fwhm, n_theta)


def polar_snr_rows(image, radii, fwhm, n_theta, exclude_negative_lobes):
    """Steps (1)-(3) of the polar S/N engine for the given radius rows —
    rows are independent, which is the multi-chip shard axis
    (metrics.sharded)."""
    ny, nx = image.shape
    cy = ny / 2 if ny % 2 == 0 else (ny - 1) / 2
    cx = nx / 2 if nx % 2 == 0 else (nx - 1) / 2
    r_ap = fwhm / 2.0

    # (1) exact aperture flux at every integer center: one conv
    kern = jnp.asarray(_aperture_kernel(r_ap), image.dtype)
    kh = kern.shape[0] // 2
    AF = jax.lax.conv_general_dilated(
        image[None, None], kern[None, None], (1, 1),
        [(kh, kh), (kh, kh)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]

    # (2) polar resampling (bilinear)
    thetas = jnp.arange(n_theta, dtype=image.dtype) * (2 * jnp.pi / n_theta)
    yy = cy + radii[:, None] * jnp.sin(thetas)[None, :]
    xx = cx + radii[:, None] * jnp.cos(thetas)[None, :]
    y0 = jnp.floor(yy).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    wy = yy - y0
    wx = xx - x0

    def samp(dy, dx):
        return AF[jnp.clip(y0 + dy, 0, ny - 1), jnp.clip(x0 + dx, 0, nx - 1)]

    AFp = ((1 - wy) * (1 - wx) * samp(0, 0) + (1 - wy) * wx * samp(0, 1)
           + wy * (1 - wx) * samp(1, 0) + wy * wx * samp(1, 1))

    # (3) ring statistics per radius row via Fourier combs
    # ring construction (snr_source.py): apertures every
    # angle = 2 asin(fwhm/2/r), n = floor(2pi/angle) of them (the ring has
    # a gap at the end; spacing is NOT 2pi/n)
    ap_angle = 2 * jnp.arcsin(r_ap / radii)
    n_ap = jnp.maximum(jnp.floor(2 * jnp.pi / ap_angle), 3.0)
    k = jnp.fft.fftfreq(n_theta, d=1.0 / n_theta)     # integer freqs

    # comb transfer function: sum_{m=0..n-1} exp(-i k m angle)
    shift_frac = ap_angle / (2 * jnp.pi)              # per-aperture shift
    phase = 2j * jnp.pi * k[None, :] * shift_frac[:, None]
    num = 1.0 - jnp.exp(-phase * n_ap[:, None])
    den = 1.0 - jnp.exp(-phase)
    comb = jnp.where(jnp.abs(den) > 1e-9, num / den, n_ap[:, None])

    F1 = jnp.fft.fft(AFp, axis=1)
    F2 = jnp.fft.fft(AFp * AFp, axis=1)
    S1 = jnp.fft.ifft(F1 * comb, axis=1).real     # sum of ring fluxes
    S2 = jnp.fft.ifft(F2 * comb, axis=1).real     # sum of squares

    f0 = AFp
    if exclude_negative_lobes:
        # also remove the two apertures adjacent to the source (index 1
        # and index n-1 in the reference's ring ordering)
        ph = jnp.exp(-2j * jnp.pi * k[None, :] * shift_frac[:, None])
        adj1 = jnp.fft.ifft(F1 * ph, axis=1).real
        adj1b = jnp.fft.ifft(F1 * jnp.conj(ph), axis=1).real
        adj2 = jnp.fft.ifft(F2 * ph, axis=1).real
        adj2b = jnp.fft.ifft(F2 * jnp.conj(ph), axis=1).real
        S1 = S1 - adj1 - adj1b
        S2 = S2 - adj2 - adj2b
        n2 = n_ap[:, None] - 3.0
    else:
        n2 = n_ap[:, None] - 1.0
    S1b = S1 - f0
    S2b = S2 - f0 * f0
    mean_bkg = S1b / n2
    var = jnp.maximum(S2b / n2 - mean_bkg**2, 0.0) * n2 / (n2 - 1.0)
    den = jnp.sqrt(var) * jnp.sqrt(1.0 + 1.0 / n2)
    return jnp.where(den > 0, (f0 - mean_bkg) / jnp.where(den > 0, den, 1.0),
                     0.0)


def polar_snr_to_cart(snr_p, shape, fwhm, n_theta):
    """Step (4): map the (n_r, n_theta) polar S/N grid back to a
    cartesian frame (bilinear in polar coordinates)."""
    ny, nx = shape
    cy = ny / 2 if ny % 2 == 0 else (ny - 1) / 2
    cx = nx / 2 if nx % 2 == 0 else (nx - 1) / 2
    n_r = snr_p.shape[0]
    gy, gx = jnp.mgrid[0:ny, 0:nx]
    rr = jnp.hypot(gy - cy, gx - cx).astype(snr_p.dtype)
    tt = jnp.arctan2(gy - cy, gx - cx) % (2 * jnp.pi)
    ri = rr - 1.0
    ti = tt / (2 * jnp.pi / n_theta)
    r0 = jnp.clip(jnp.floor(ri).astype(jnp.int32), 0, n_r - 2)
    t0i = jnp.floor(ti).astype(jnp.int32) % n_theta
    wr = jnp.clip(ri - r0, 0.0, 1.0)
    wt = ti - jnp.floor(ti)
    t1i = (t0i + 1) % n_theta

    def gsamp(rr_, tt_):
        return snr_p[rr_, tt_]

    out = ((1 - wr) * (1 - wt) * gsamp(r0, t0i)
           + (1 - wr) * wt * gsamp(r0, t1i)
           + wr * (1 - wt) * gsamp(r0 + 1, t0i)
           + wr * wt * gsamp(r0 + 1, t1i))
    valid = (rr >= fwhm / 2.0 + 1.0) & (rr <= n_r - 1)
    return jnp.where(valid, out, 0.0)
