"""Device-resident fake-companion injection.

The host injector (``fm.fakecomp._inject_batched_subpx``, parity with
reference fakecomp.py:320-375) splits each companion shift into an
integer placement in the big frame plus a sub-pixel FFT shift of the
small PSF stamp. This module runs the same math entirely on device so
injected cubes never cross the host<->device link: the contrast stack's
pattern cubes (``metrics.contrcurve.throughput``, reference
contrcurve.py:584-1096) are rebuilt from the base cube + per-rung
``(radius, flux)`` scalars inside the same jitted program that reduces
them. At the 1000x512x512 bench scale that replaces ~1 GB of host copy
+ tunnel upload PER PATTERN with a one-time base-cube upload.

Numerical parity with the host injector is pinned by
``tests/test_metrics_contrcurve.py`` (device ladder == repeated
``cube_inject_companions`` at 1e-8 on the CPU/x64 lane).
"""

import jax
import jax.numpy as jnp
import numpy as np

from .fft import _frame_center_static, fourier_shift

__all__ = ["inject_ladder_adi"]


def _clip_gather(stamps, dy, dx):
    """``adj[k,f,i,j] = stamps[k,f,i-dy[k,f],j-dx[k,f]]``, zero outside.

    Implements the reference's window clipping (fakecomp.py:320-375:
    a stamp overhanging the frame edge loses its out-of-frame rows/cols)
    as a shift of the stamp relative to an in-bounds corner.
    """
    K, n, s, _ = stamps.shape
    iy = jnp.arange(s)[None, None, :, None] - dy[:, :, None, None]
    ix = jnp.arange(s)[None, None, None, :] - dx[:, :, None, None]
    valid = (iy >= 0) & (iy < s) & (ix >= 0) & (ix < s)
    iyc = jnp.clip(iy, 0, s - 1)
    ixc = jnp.clip(ix, 0, s - 1)
    adj = jnp.take_along_axis(
        stamps, jnp.broadcast_to(iyc, (K, n, s, s)), axis=2)
    adj = jnp.take_along_axis(
        adj, jnp.broadcast_to(ixc, (K, n, s, s)), axis=3)
    return jnp.where(valid, adj, 0)


def inject_ladder_adi(cube, psf_stamp, angle_list, rads, fluxes, ang):
    """Inject a radial ladder of companions at azimuth ``ang`` on device.

    Parameters
    ----------
    cube : (n, Y, X) device array.
    psf_stamp : (s, s) normalized PSF stamp (odd s <= min(Y, X)).
    angle_list : (n,) parallactic angles [deg].
    rads, fluxes : (K,) radial distances [px] and flux levels. A rung
        with ``flux == 0`` is an exact no-op (use ``rad=0, flux=0`` to
        pad ladders to a common K across vmapped patterns).
    ang : scalar azimuth [rad] (the host path's
        ``branch * 2pi/n_branches + deg2rad(theta)``).

    Mirrors ``fm.fakecomp._inject_batched_subpx`` rung by rung: in frame
    ``f`` the companion sits at PA ``ang - parang[f]``; the shift splits
    into a truncated-integer placement and a sub-pixel FFT shift (pad
    margin 1) of the stamp; the flux scales the shifted stamp.
    """
    n, Y, X = cube.shape
    s = psf_stamp.shape[-1]
    K = rads.shape[0]
    dt = cube.dtype
    ceny, cenx = _frame_center_static(Y, X)

    w = int(np.ceil(s / 2))
    if s % 2:
        w -= 1
    sty = ceny - w
    stx = cenx - w

    pa = ang - jnp.deg2rad(jnp.asarray(angle_list, dt))          # (n,)
    shift_y = rads.astype(dt)[:, None] * jnp.sin(pa)[None, :]    # (K, n)
    shift_x = rads.astype(dt)[:, None] * jnp.cos(pa)[None, :]
    inty = jnp.trunc(shift_y).astype(jnp.int32)   # == .astype(int) on host
    intx = jnp.trunc(shift_x).astype(jnp.int32)
    dsy = shift_y - inty.astype(dt)
    dsx = shift_x - intx.astype(dt)

    stamp_kn = jnp.broadcast_to(psf_stamp.astype(dt), (K, n, s, s))
    shifted = jax.vmap(jax.vmap(fourier_shift, (0, 0, 0, None)),
                       (0, 0, 0, None))(stamp_kn, dsy, dsx, 1)

    y0 = sty + inty                                # (K, n) stamp corners
    x0 = stx + intx
    cy0 = jnp.clip(y0, 0, Y - s)                   # in-bounds corners
    cx0 = jnp.clip(x0, 0, X - s)
    adj = _clip_gather(shifted, y0 - cy0, x0 - cx0)
    updates = adj * fluxes.astype(dt)[:, None, None, None]

    fidx = jnp.broadcast_to(jnp.arange(n)[None, :, None, None], adj.shape)
    oy = jnp.broadcast_to(cy0[:, :, None, None]
                          + jnp.arange(s)[None, None, :, None], adj.shape)
    ox = jnp.broadcast_to(cx0[:, :, None, None]
                          + jnp.arange(s)[None, None, None, :], adj.shape)
    return cube.at[fidx, oy, ox].add(updates)
