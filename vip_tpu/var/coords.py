"""Image-coordinate conventions and conversions.

Parity with reference vip_hci/var/coords.py. The load-bearing convention is
``frame_center`` (coords.py:61-101): odd dims → (dim-1)/2, even dims →
dim/2 — i.e. for even frames the center sits on the top-right pixel of the
central 2x2 block, NOT between pixels. Every FFT kernel in this package
assumes that convention.
"""

import numpy as np

__all__ = [
    "dist",
    "dist_matrix",
    "frame_center",
    "cart_to_pol",
    "pol_to_cart",
    "pol_to_eq",
    "QU_to_QUphi",
]


def dist(yc, xc, y1, x1):
    """Euclidean distance between two points (or arrays of points)."""
    return np.hypot(yc - y1, xc - x1)


def dist_matrix(n, cx=None, cy=None):
    """Matrix of Euclidean distances from a reference point (cx, cy)."""
    if isinstance(n, (int, np.integer)):
        n1 = n2 = int(n)
    else:
        n1, n2 = np.asarray(n).shape[:2]
    if cy is None:
        cy = (n1 - 1) / 2
    if cx is None:
        cx = (n2 - 1) / 2
    yy, xx = np.ogrid[:n1, :n2]
    return np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)


def frame_center(array, verbose=False):
    """Return integer (cy, cx) of the frame center.

    Odd dims: dim/2 - 0.5. Even dims: dim/2. Accepts 2d/3d/4d arrays (the
    trailing two axes are the image). Reference: var/coords.py:61-101.
    """
    if hasattr(array, "ndim"):
        if array.ndim == 2:
            shape = array.shape
        elif array.ndim == 3:
            shape = array.shape[1:]
        elif array.ndim == 4:
            shape = array.shape[2:]
        else:
            raise ValueError("`array` is not a 2d, 3d or 4d array")
    else:
        shape = tuple(array)

    cy = shape[0] / 2
    cx = shape[1] / 2
    if shape[0] % 2:
        cy -= 0.5
    if shape[1] % 2:
        cx -= 0.5
    if verbose:
        print(f"Center px coordinates at x,y = ({cx}, {cy})")
    return int(cy), int(cx)


def cart_to_pol(x, y, x_err=0, y_err=0, cx=0, cy=0, astro_convention=False):
    """Cartesian → polar (r, theta[deg]) with optional error propagation."""
    r = dist(cy, cx, y, x)
    theta = np.rad2deg(np.arctan2(y - cy, x - cx))
    if astro_convention:
        theta -= 90

    dx = x - cx
    dy = y - cy
    with np.errstate(divide="ignore", invalid="ignore"):
        r1 = dx * x_err / np.sqrt(dx**2 + dy**2)
        r2 = dy * y_err / np.sqrt(dx**2 + dy**2)
        t1 = (1 / (1 + (dy / dx) ** 2)) * (1 / dx) * y_err
        t2 = (1 / (1 + (dy / dx) ** 2)) * (-1) * (dy / dx**2) * x_err
    r_err = np.sqrt(r1**2 + r2**2)
    theta_err = np.rad2deg(np.sqrt(t1**2 + t2**2))

    if np.any(x_err != 0) or np.any(y_err != 0):
        return r, theta, r_err, theta_err
    return r, theta


def pol_to_cart(r, theta, r_err=0, theta_err=0, cx=0, cy=0,
                astro_convention=False):
    """Polar (r, theta[deg]) → cartesian with optional error propagation."""
    if astro_convention:
        theta = theta + 90
        sign = -1
    else:
        sign = 1

    theta = np.deg2rad(theta)
    theta_err = np.deg2rad(theta_err)

    x = cx + sign * r * np.cos(theta)
    y = cy + r * np.sin(theta)

    t1x = np.cos(theta) ** 2 * r_err**2
    t2x = r**2 * np.sin(theta) ** 2 * theta_err**2
    t1y = np.sin(theta) ** 2 * r_err**2
    t2y = r**2 * np.cos(theta) ** 2 * theta_err**2
    dx_err = np.sqrt(t1x + t2x)
    dy_err = np.sqrt(t1y + t2y)

    if np.any(r_err != 0) or np.any(theta_err != 0):
        return x, y, dx_err, dy_err
    return x, y


def pol_to_eq(r, t, rError=0, tError=0, astro_convention=False, plot=False):
    """Polar (r, t[deg]) → (ΔRA, ΔDEC) with error ellipse propagation."""
    if not astro_convention:
        t = t - 90

    ra = r * np.sin(np.deg2rad(t))
    dec = r * np.cos(np.deg2rad(t))
    u, v = ra, dec

    nu = np.mod(np.pi / 2 - np.deg2rad(t), 2 * np.pi)
    a, b = rError, r * np.sin(np.deg2rad(tError))

    beta = np.linspace(0, 2 * np.pi, 5000)
    x = u + (a * np.cos(beta) * np.cos(nu) - b * np.sin(beta) * np.sin(nu))
    y = v + (b * np.sin(beta) * np.cos(nu) + a * np.cos(beta) * np.sin(nu))

    raErrorInf = u - np.amin(x)
    raErrorSup = np.amax(x) - u
    decErrorInf = v - np.amin(y)
    decErrorSup = np.amax(y) - v

    if plot:
        import matplotlib.pyplot as plt

        plt.plot(u, v, "ks", x, y, "r")
        plt.gca().set_aspect("equal")
        plt.gca().invert_xaxis()
        plt.show()

    return (
        (ra, np.mean([raErrorInf, raErrorSup])),
        (dec, np.mean([decErrorInf, decErrorSup])),
    )


def QU_to_QUphi(Q, U, delta_x=0, delta_y=0, scale_r2=False,
                north_convention=False):
    """Compute azimuthal-Stokes Qphi/Uphi images from Q and U.

    Vectorized (the reference loops per pixel: coords.py:282-328).

    NOTE: the reference implementation is upstream-broken — it passes
    ``north_convention`` to ``cart_to_pol`` (coords.py:316), which only
    accepts ``astro_convention`` (coords.py:103), so every call raises
    TypeError. This version implements the documented intent
    (phi measured from North when ``north_convention``).
    """
    Q = np.asarray(Q)
    U = np.asarray(U)
    cy, cx = frame_center(Q)
    yy, xx = np.mgrid[: Q.shape[0], : Q.shape[1]]
    x = xx - cx - delta_x
    y = yy - cy - delta_y
    rho = np.hypot(y, x)
    phi = np.arctan2(y, x)
    if north_convention:
        phi -= np.deg2rad(90)
    c2 = np.cos(2 * phi)
    s2 = np.sin(2 * phi)
    Qphi = Q * c2 + U * s2
    Uphi = -Q * s2 + U * c2
    if scale_r2:
        Qphi = Qphi * rho**2
        Uphi = Uphi * rho**2
    return Qphi, Uphi
