"""Background-star probability (reference vip_hci/stats/bkg_proba.py)."""

from math import factorial

import numpy as np

__all__ = ["bkg_star_proba"]


def bkg_star_proba(n_dens, sep, n_bkg=1, unit="deg", verbose=True,
                   full_output=False):
    """Poisson probability of >= n_bkg background stars within ``sep``
    arcsec (reference bkg_proba.py:14-90)."""
    if n_bkg < 1 or not isinstance(n_bkg, int):
        raise TypeError("n_bkg should be a strictly positive integer.")
    if unit == "deg":
        if verbose:
            print("Input n_dens unit: deg^-2")
        n_dens = n_dens / 3600**2
    elif unit == "arcsec":
        if verbose:
            print("Input n_dens unit: arcsec^-2")
    else:
        raise ValueError("unit must be 'deg' or 'arcsec'.")

    if not isinstance(sep, float):
        if isinstance(sep, np.ndarray):
            if sep.ndim != 1 or sep.shape[0] != n_bkg:
                raise TypeError("if sep is a np array, its len should be "
                                "n_bkg")
            sep = np.amax(sep)
        else:
            raise TypeError("sep can only be a float or a np 1d array")

    B = np.pi * sep**2
    probas = np.zeros(n_bkg)
    for i in range(n_bkg):
        probas[i] = np.exp(-n_dens * B) * (n_dens * B)**i \
            / float(factorial(i))
        if verbose:
            print("Proba of having {:.0f} bkg star in a disk of {:.2g}'' "
                  "radius: {:.4g}%".format(i, sep, probas[i] * 100))
    proba = 1 - np.sum(probas)
    if verbose:
        print("Proba of having {:.0f} bkg star or more in a disk of "
              "{:.2g}'' radius: {:.4g}%".format(n_bkg, sep, proba * 100))
    if full_output:
        return proba, probas
    return proba
