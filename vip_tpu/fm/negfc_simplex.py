"""NEGFC first guess: coarse flux grid + Nelder-Mead simplex.

TPU rebuild of vip_hci/fm/negfc_simplex.py: the simplex runs on host
driving the device-resident χ² forward model (inject → PCA-annulus →
aperture statistics).
"""

import numpy as np
from scipy.optimize import minimize

from ..config import sep, time_ini, timing
from ..psfsub.utils_pca import pca_annulus
from ..var.coords import frame_center
from .negfc_fmerit import chisquare, get_mu_and_sigma

__all__ = ["firstguess", "firstguess_from_coord", "firstguess_simplex"]


def firstguess_from_coord(planet, center, cube, angs, psfn, fwhm,
                          annulus_width, aperture_radius, ncomp=1,
                          cube_ref=None, svd_mode="lapack", scaling=None,
                          fmerit="sum", imlib="vip-fft",
                          interpolation="lanczos4", collapse="median",
                          algo=pca_annulus, delta_rot=1, algo_options={},
                          f_range=None, transmission=None,
                          radial_gradient=True, mu_sigma=(0, 1),
                          weights=None, ndet=None, bin_spec=False,
                          plot=False, verbose=True, save=False, debug=False,
                          full_output=False):
    """Estimate (r, theta, flux) by a flux grid search
    (reference negfc_simplex.py:25-343)."""
    def _grid_search_f(r0, theta0, ch, f_range):
        chi2r = []
        if verbose:
            print("Step | flux    | chi2r")
        counter = 0
        n = f_range.shape[0]
        for j, f_guess in enumerate(f_range):
            if cube.ndim == 3 or (cube.ndim == 4 and bin_spec):
                params = (r0, theta0, f_guess)
            elif ch is not None and cube.ndim == 4:
                fluxes = [0] * cube.shape[0]
                fluxes[ch] = f_guess
                params = tuple([r0, theta0] + fluxes)
            else:
                raise TypeError("If cube is 4d, channel index must be "
                                "provided")
            chi2r.append(chisquare(params, cube, angs, psfn, fwhm,
                                   annulus_width, aperture_radius,
                                   (r0, theta0), ncomp, cube_ref, svd_mode,
                                   scaling, fmerit, collapse, algo,
                                   delta_rot, imlib, interpolation,
                                   algo_options, transmission,
                                   radial_gradient, mu_sigma, weights, False,
                                   ndet, bin_spec, debug))
            if chi2r[j] > chi2r[j - 1]:
                counter += 1
            if counter == 4:
                break
            if verbose:
                print(f"{j + 1}/{n}   {f_guess:.3f}   {chi2r[j]:.3f}")
        return chi2r

    planet = np.asarray(planet, dtype=float)
    center = np.asarray(center, dtype=float)
    xy = planet - center
    r0 = np.sqrt(xy[0] ** 2 + xy[1] ** 2)
    theta0 = np.mod(np.arctan2(xy[1], xy[0]) / np.pi * 180, 360)

    if f_range is not None:
        f_range = np.asarray(f_range)
    else:
        f_range = np.geomspace(1e-1, 1e4, 30)

    def _plot_chi2r(curves):
        """One figure overlaying all channel curves, with a legend when
        labeled (reference negfc_simplex.py:300-334 draws exactly one
        figure and one saved pdf for the multi-channel case)."""
        import matplotlib.pyplot as plt

        plt.figure(figsize=(8, 4))
        plt.title(r"$\chi^2_{r}$ vs flux")
        lo = min(c.min() for _, c in curves)
        hi = max(c.max() for _, c in curves)
        plt.xlim(f_range[0],
                 max(f_range[:c.shape[0]].max() for _, c in curves))
        plt.ylim(lo * 0.9, hi * 1.1)
        for label, chi2r_arr in curves:
            plt.plot(f_range[:chi2r_arr.shape[0]], chi2r_arr, linestyle="-",
                     marker=".", markerfacecolor="r", markeredgecolor="r",
                     color="gray" if label is None else None, label=label)
        plt.xlabel("flux")
        plt.ylabel(r"$\chi^2_r$")
        plt.grid("on")
        if any(label is not None for label, _ in curves):
            plt.legend()
        if save:
            plt.savefig("chi2rVSflux.pdf")
        plt.show()

    if cube.ndim == 3 or bin_spec:
        chi2r = np.array(_grid_search_f(r0, theta0, None, f_range))
        f0 = f_range[chi2r.argmin()]
        res = (r0, theta0, f0)
        if plot:
            _plot_chi2r([(None, chi2r)])
    else:
        f0 = []
        chi2r = []
        for ch in range(cube.shape[0]):
            chi2r_ch = np.array(_grid_search_f(r0, theta0, ch, f_range))
            f0.append(f_range[chi2r_ch.argmin()])
            chi2r.append(chi2r_ch)
        if plot:
            _plot_chi2r([(f"ch. {ch}", c) for ch, c in enumerate(chi2r)])
        res = tuple([r0, theta0] + f0)

    if full_output:
        return res, f_range, chi2r
    return res


def firstguess_simplex(p, cube, angs, psfn, ncomp, fwhm, annulus_width,
                       aperture_radius, cube_ref=None, svd_mode="lapack",
                       scaling=None, fmerit="sum", imlib="vip-fft",
                       interpolation="lanczos4", collapse="median",
                       algo=pca_annulus, delta_rot=1, algo_options={},
                       p_ini=None, transmission=None, radial_gradient=False,
                       mu_sigma=(0, 1), weights=None, force_rPA=False,
                       ndet=None, bin_spec=False, options=None, verbose=False,
                       **kwargs):
    """Nelder-Mead minimization of the NEGFC χ²
    (reference negfc_simplex.py:344-525).

    NOTE intentional default deviation: the reference defaults to
    imlib='skimage', interpolation='biquintic' (host interpolation
    chosen there for CPU speed); vip_tpu defaults to its exact
    device-resident FFT rotation. Pass the reference values to
    reproduce its interpolated path bit-for-bit."""
    if verbose:
        print("\nNelder-Mead minimization is running...")

    if p_ini is None:
        p_ini = p
    if force_rPA:
        p_t = p[2:]
        p_ini = (p[0], p[1])
    else:
        p_t = p
    solu = minimize(chisquare, p_t,
                    args=(cube, angs, psfn, fwhm, annulus_width,
                          aperture_radius, p_ini, ncomp, cube_ref, svd_mode,
                          scaling, fmerit, collapse, algo, delta_rot, imlib,
                          interpolation, algo_options, transmission,
                          radial_gradient, mu_sigma, weights, force_rPA,
                          ndet, bin_spec),
                    method="Nelder-Mead", options=options, **kwargs)
    if verbose:
        print(solu)
    return solu


def firstguess(cube, angs, psfn, planets_xy_coord, ncomp=1, fwhm=4,
               annulus_width=4, aperture_radius=1, cube_ref=None,
               svd_mode="lapack", scaling=None, fmerit="sum",
               imlib="vip-fft", interpolation="lanczos4", collapse="median",
               algo=pca_annulus, delta_rot=1, f_range=None,
               transmission=None, radial_gradient=False, mu_sigma=True,
               wedge=None, weights=None, force_rPA=False, ndet=None,
               bin_spec=False, algo_options={}, simplex=True,
               simplex_options=None, plot=False, verbose=True, save=False):
    """First guess of (r, theta, flux) per planet: flux grid + simplex
    (reference negfc_simplex.py:526-885).

    NOTE intentional default deviation: imlib/interpolation default to
    the exact device FFT rotation instead of the reference's
    'skimage'/'biquintic' host interpolation (see firstguess_simplex)."""
    if cube.ndim not in (3, 4):
        raise TypeError("Input cube is not 3D nor 4D")

    if verbose:
        start_time = time_ini()

    planets_xy_coord = np.atleast_2d(np.array(planets_xy_coord, dtype=float))
    n_planet = planets_xy_coord.shape[0]
    center_xy_coord = np.array(frame_center(cube[0]))

    r_0 = np.zeros(n_planet)
    theta_0 = np.zeros_like(r_0)
    if cube.ndim == 3 or bin_spec:
        f_0 = np.zeros_like(r_0)
    else:
        if psfn.ndim < 3:
            raise TypeError("The normalized PSF should be 3D for a 4D input "
                            "cube")
        f_0 = np.zeros([n_planet, cube.shape[0]])

    if weights is not None:
        if not len(weights) == cube.shape[-3]:
            raise TypeError("Weights should have same length as temporal "
                            "cube axis")
        norm_weights = weights / np.sum(weights)
    else:
        norm_weights = weights

    for i_planet in range(n_planet):
        if verbose:
            print("\n" + sep)
            print(f"             Planet {i_planet}           ")
            print(sep + "\n")
            print(f"Planet {i_planet}: flux estimation at the position "
                  f"[{planets_xy_coord[i_planet, 0]},"
                  f"{planets_xy_coord[i_planet, 1]}], running ...")

        mu_sigma_i = mu_sigma
        if isinstance(mu_sigma, tuple):
            if len(mu_sigma) != 2:
                raise TypeError("If a tuple, mu_sigma must have 2 elements")
        elif mu_sigma is not None:
            xy = planets_xy_coord[i_planet] - center_xy_coord
            r0 = np.sqrt(xy[0] ** 2 + xy[1] ** 2)
            theta0 = np.mod(np.arctan2(xy[1], xy[0]) / np.pi * 180, 360)
            mu_sigma_i = get_mu_and_sigma(
                cube, angs, ncomp, annulus_width, aperture_radius, fwhm, r0,
                theta0, cube_ref=cube_ref, wedge=wedge, svd_mode=svd_mode,
                scaling=scaling, algo=algo, delta_rot=delta_rot, imlib=imlib,
                interpolation=interpolation, collapse=collapse,
                weights=norm_weights, algo_options=algo_options,
                bin_spec=bin_spec)

        res_init = firstguess_from_coord(
            planets_xy_coord[i_planet], center_xy_coord, cube, angs, psfn,
            fwhm, annulus_width, aperture_radius, ncomp, f_range=f_range,
            cube_ref=cube_ref, svd_mode=svd_mode, scaling=scaling,
            fmerit=fmerit, imlib=imlib, collapse=collapse, algo=algo,
            delta_rot=delta_rot, interpolation=interpolation,
            algo_options=algo_options, transmission=transmission,
            radial_gradient=radial_gradient, mu_sigma=mu_sigma_i,
            weights=weights, ndet=ndet, bin_spec=bin_spec, plot=plot,
            verbose=verbose, save=save)
        r_pre = res_init[0]
        theta_pre = res_init[1]
        f_pre = res_init[2:]

        if verbose:
            print(f"Planet {i_planet}: preliminary position guess: "
                  f"(r, theta)=({r_pre:.1f}, {theta_pre:.1f})")
            print(f"Planet {i_planet}: preliminary flux guess: "
                  + ", ".join(f"{fz:.2f}" for fz in f_pre))

        if simplex or force_rPA:
            if verbose:
                print(f"Planet {i_planet}: Simplex Nelder-Mead minimization,"
                      " running ...")
            if simplex_options is None:
                simplex_options = {"xatol": 1e-6, "fatol": 1e-6,
                                   "maxiter": 800, "maxfev": 2000}
            res = firstguess_simplex(
                res_init, cube, angs, psfn, ncomp, fwhm, annulus_width,
                aperture_radius, cube_ref=cube_ref, svd_mode=svd_mode,
                scaling=scaling, fmerit=fmerit, imlib=imlib,
                interpolation=interpolation, collapse=collapse, algo=algo,
                delta_rot=delta_rot, algo_options=algo_options,
                transmission=transmission, radial_gradient=radial_gradient,
                mu_sigma=mu_sigma_i, weights=weights, force_rPA=force_rPA,
                ndet=ndet, bin_spec=bin_spec, options=simplex_options,
                verbose=False)
            if force_rPA:
                r_0[i_planet], theta_0[i_planet] = (r_pre, theta_pre)
                if cube.ndim == 3 or (cube.ndim == 4 and bin_spec):
                    f_0[i_planet] = res.x[0]
                else:
                    f_0[i_planet, :] = res.x[:]
            else:
                r_0[i_planet] = res.x[0]
                theta_0[i_planet] = res.x[1]
                if cube.ndim == 3 or (cube.ndim == 4 and bin_spec):
                    f_0[i_planet] = res.x[2]
                else:
                    f_0[i_planet] = res.x[2:]
            if verbose:
                print(f"Planet {i_planet}: Success: {res.success}, nit: "
                      f"{res.nit}, nfev: {res.nfev}, chi2r: {res.fun}")
                print(f"message: {res.message}")
        else:
            if verbose:
                print(f"Planet {i_planet}: Simplex Nelder-Mead minimization "
                      "skipped.")
            r_0[i_planet] = r_pre
            theta_0[i_planet] = theta_pre
            if cube.ndim == 3 or (cube.ndim == 4 and bin_spec):
                f_0[i_planet] = f_pre[0]
            else:
                f_0[i_planet] = f_pre

    if verbose:
        print("\n", sep, "\nDONE !\n", sep)
        timing(start_time)

    return r_0, theta_0, f_0
