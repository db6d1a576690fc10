"""NEGFC MCMC astrometry/photometry with on-device batched walkers.

TPU rebuild of vip_hci/fm/negfc_mcmc.py. The reference forks an emcee
ensemble over a process pool (negfc_mcmc.py:950-963); here the
affine-invariant stretch move runs with EVERY walker's likelihood —
inject → pca_annulus → derotate → collapse → aperture χ² — evaluated as
ONE vmapped, jit-compiled XLA computation per half-ensemble
(vip_tpu.ops.negfc_model). Host code keeps the reference's convergence
machinery: geometric check schedule, Gelman-Rubin and autocorrelation
tests, dynamic chain growth.

The device model covers the full pca_annulus family — 3-D and 4-D
cubes, per-frame weights, (non-gradient) coronagraph transmission,
cube_ref RDI libraries, all matrix scalings and both merit variants.
When the fast path does not apply (custom algos, radial-gradient
transmission), the same sampler runs with the host likelihood.
"""

import datetime

import numpy as np
import jax

from ..config import sep as SEP, time_ini, timing
from ..psfsub.utils_pca import pca_annulus
from .negfc_fmerit import get_mu_and_sigma, get_values_optimize
from .fakecomp import cube_inject_companions
from .utils_mcmc import autocorr_test, gelman_rubin

__all__ = ["mcmc_negfc_sampling", "lnprior", "lnlike", "lnprob",
           "chain_zero_truncated", "show_walk_plot", "show_corner_plot",
           "confidence"]


def lnprior(param, bounds, force_rPA=False):
    """Flat prior within bounds (reference negfc_mcmc.py:72-122)."""
    for i in range(len(param)):
        if not bounds[i][0] <= param[i] <= bounds[i][1]:
            return -np.inf
    return 0.0


def lnlike(param, cube, angs, psf_norm, fwhm, annulus_width, ncomp,
           aperture_radius, initial_state, cube_ref=None, svd_mode="lapack",
           scaling=None, algo=pca_annulus, delta_rot=1, fmerit="sum",
           imlib="vip-fft", interpolation="lanczos4", collapse="median",
           algo_options={}, weights=None, transmission=None,
           radial_gradient=False, mu_sigma=True, sigma="spe+pho",
           force_rPA=False, debug=False):
    """Log-likelihood (reference negfc_mcmc.py:123-343) — host fallback."""
    if imlib == "opencv":
        imlib_rot = imlib_sh = imlib
    elif imlib in ("skimage", "ndimage-interp"):
        imlib_rot = "skimage"
        imlib_sh = "ndimage-interp"
    elif imlib in ("vip-fft", "ndimage-fourier"):
        imlib_rot = "vip-fft"
        imlib_sh = "ndimage-fourier"
    else:
        raise TypeError("Interpolation not recognized.")

    if force_rPA:
        r0 = initial_state[0]
        theta0 = initial_state[1]
        flux = -np.array(param) if len(param) > 1 else -param[0]
    else:
        r0 = param[0]
        theta0 = param[1]
        flux = -np.array(param[2:]) if len(param) > 3 else -param[2]

    norm_weights = None
    if weights is not None:
        if np.isscalar(flux):
            flux = flux * weights
        else:
            flux = np.outer(flux, weights)

    cube_negfc = cube_inject_companions(cube, psf_norm, angs, flevel=flux,
                                        rad_dists=[r0], n_branches=1,
                                        theta=theta0, imlib=imlib_sh,
                                        interpolation=interpolation,
                                        transmission=transmission,
                                        radial_gradient=radial_gradient,
                                        verbose=False)
    values = get_values_optimize(cube_negfc, angs, ncomp, annulus_width,
                                 aperture_radius, fwhm, initial_state[0],
                                 initial_state[1], cube_ref=cube_ref,
                                 svd_mode=svd_mode, scaling=scaling,
                                 algo=algo, delta_rot=delta_rot,
                                 imlib=imlib_rot,
                                 interpolation=interpolation,
                                 collapse=collapse,
                                 algo_options=algo_options,
                                 weights=norm_weights)

    if isinstance(mu_sigma, tuple):
        mu = mu_sigma[0]
        sigma2 = mu_sigma[1] ** 2
        num = np.power(mu - values, 2)
        denom = 0
        if "spe" in sigma:
            denom += sigma2
        if "pho" in sigma:
            denom += np.abs(values - mu)
        lnlikelihood = -0.5 * np.sum(num / denom)
    else:
        mu = mu_sigma
        if fmerit == "sum":
            lnlikelihood = -0.5 * np.sum(np.abs(values - mu))
        elif fmerit == "stddev":
            values = values[values != 0]
            lnlikelihood = -np.std(values, ddof=1) * values.size
        else:
            raise RuntimeError("fmerit choice not recognized.")
    if debug:
        return lnlikelihood, cube_negfc
    return lnlikelihood


def lnprob(param, bounds, cube, angs, psf_norm, fwhm, annulus_width, ncomp,
           aperture_radius, initial_state, cube_ref=None, svd_mode="lapack",
           scaling=None, algo=pca_annulus, delta_rot=1, fmerit="sum",
           imlib="vip-fft", interpolation="lanczos4", collapse="median",
           algo_options={}, weights=None, transmission=None,
           radial_gradient=False, mu_sigma=True, sigma="spe+pho",
           force_rPA=False, display=False):
    """lnprior + lnlike (reference negfc_mcmc.py:344-503)."""
    lp = lnprior(param, bounds, force_rPA)
    if np.isinf(lp):
        return -np.inf
    return lp + lnlike(param, cube, angs, psf_norm, fwhm, annulus_width,
                       ncomp, aperture_radius, initial_state, cube_ref,
                       svd_mode, scaling, algo, delta_rot, fmerit, imlib,
                       interpolation, collapse, algo_options, weights,
                       transmission, radial_gradient, mu_sigma, sigma,
                       force_rPA)


def mcmc_negfc_sampling(cube, angs, psfn, initial_state, algo=pca_annulus,
                        ncomp=1, annulus_width=8, aperture_radius=1, fwhm=4,
                        mu_sigma=True, sigma="spe+pho", force_rPA=False,
                        fmerit="sum", cube_ref=None, svd_mode="lapack",
                        scaling=None, delta_rot=1, imlib="vip-fft",
                        interpolation="lanczos4", collapse="median",
                        algo_options={}, wedge=None, weights=None,
                        transmission=None, radial_gradient=False,
                        nwalkers=100, bounds=None, a=2.0, burnin=0.3,
                        rhat_threshold=1.01, rhat_count_threshold=1,
                        niteration_min=10, niteration_limit=10000,
                        niteration_supp=0, check_maxgap=20, conv_test="ac",
                        ac_c=50, ac_count_thr=3, nproc=1,
                        output_dir="results/", output_file=None,
                        display=False, verbosity=0, save=False,
                        rng_seed=0, walker_mesh=None):
    """Affine-invariant MCMC of (r, θ, f) with the NEGFC technique
    (reference negfc_mcmc.py:504-1121).

    ``walker_mesh``: optional ``jax.sharding.Mesh`` — the walker axis of
    every likelihood batch is sharded over its devices (ICI-parallel
    rebuild of the reference's fork pool, negfc_mcmc.py:950-963). Both
    ``nwalkers`` and ``nwalkers // 2`` (the stretch-move half-ensembles)
    must divide evenly over the mesh. Requires the on-device likelihood
    fast path (default ``algo=pca_annulus``).

    Returns the chain (nwalkers, nsteps, ndim), zero-truncated.
    """
    if cube.ndim != 3 and cube.ndim != 4:
        raise ValueError("`cube` must be a 3D or 4D numpy array")

    if verbosity > 0:
        start_time = time_ini()
        print("        MCMC sampler for the NEGFC technique       ")
        print(SEP)

    if imlib == "opencv":
        imlib_rot = imlib
    elif imlib in ("skimage", "ndimage-interp"):
        imlib_rot = "skimage"
    else:
        imlib_rot = "vip-fft"

    initial_state = np.array(initial_state, dtype=float)
    if initial_state[1] == 0:
        initial_state[1] = 360  # for appropriate scaling of initial ball

    if force_rPA:
        dim = len(initial_state) - 2
    else:
        dim = len(initial_state)

    norm_weights = None
    if weights is not None:
        norm_weights = weights / np.sum(weights)

    mu_sig = get_mu_and_sigma(
        cube, angs, ncomp, annulus_width, aperture_radius, fwhm,
        initial_state[0], initial_state[1], initial_state[2:], psfn,
        cube_ref=cube_ref, wedge=wedge, svd_mode=svd_mode, scaling=scaling,
        algo=algo, delta_rot=delta_rot, imlib=imlib_rot,
        interpolation=interpolation, collapse=collapse,
        weights=norm_weights, algo_options=algo_options)

    if isinstance(mu_sigma, tuple):
        if len(mu_sigma) != 2:
            raise TypeError("if a tuple, mu_sigma should have 2 elements")
    elif mu_sigma:
        mu_sigma = mu_sig
        if verbosity > 0:
            print("The mean and stddev in the annulus at the radius of the "
                  f"companion are {mu_sigma[0]:.2f} and {mu_sigma[1]:.2f} "
                  "respectively.")
    else:
        mu_sigma = mu_sig[0]

    limit = niteration_limit
    itermin = niteration_min
    supp = niteration_supp
    maxgap = check_maxgap
    if itermin > limit:
        itermin = 0

    if bounds is None:
        bounds = []
        d0 = 0
        if not force_rPA:
            dr = min(annulus_width / 2, aperture_radius * fwhm / 2)
            dth = 360.0 / (2 * np.pi * initial_state[0]
                           / (aperture_radius * fwhm / 2))
            bounds = [(initial_state[0] - dr, initial_state[0] + dr),
                      (initial_state[1] - dth, initial_state[1] + dth)]
            d0 = 2
        for i in range(dim - d0):
            bounds.append((0, 5 * initial_state[d0 + i]))

    # size of ball of parameters for MCMC initialization
    init = initial_state[2:] if force_rPA else initial_state
    scal = abs(bounds[0][0] - init[0]) / init[0]
    for i in range(dim):
        for j in range(2):
            test_scal = abs(bounds[i][j] - init[i]) / init[i]
            if test_scal < scal:
                scal = test_scal
    rng = np.random.default_rng(rng_seed)
    pos = init * (1 + rng.normal(0, scal / 50.0, (nwalkers, dim)))

    # ------------------------------------------------------------------
    # choose likelihood backend: fully-on-device fast path when possible
    # ------------------------------------------------------------------
    # the device model covers the full pca_annulus family: 3-D and 4-D
    # cubes, weights, (non-gradient) transmission, cube_ref RDI libraries,
    # all matrix scalings and both merit variants. Host fallback remains
    # only for custom algos (incl. pca_annular's moving libraries),
    # radial-gradient transmission and exotic algo_options.
    _dev_opts = dict(algo_options)
    _opt_overrides = {
        k: _dev_opts.pop(k, d) for k, d in (
            ("ncomp", ncomp), ("svd_mode", svd_mode), ("scaling", scaling),
            ("collapse", collapse), ("collapse_ifs", "absmean"),
            ("nproc", 1), ("verbose", False), ("imlib", imlib),
            ("interpolation", interpolation))}
    use_device = (
        algo is pca_annulus
        and not _dev_opts  # unknown algo_options -> host path
        and _opt_overrides["collapse"] in ("median", "mean", "sum")
        and _opt_overrides["collapse_ifs"] in ("absmean", "mean", "median",
                                               "sum")
        and not radial_gradient
        and (isinstance(mu_sigma, tuple) or fmerit in ("sum", "stddev"))
        and _opt_overrides["imlib"] in ("vip-fft", "ndimage-fourier")
        and np.asarray(psfn).ndim == (2 if cube.ndim == 3 else 3)
    )

    if use_device:
        from ..ops.negfc_model import make_batched_lnprob
        from ..psfsub.svd import MODE_TO_METHOD

        if verbosity > 0:
            print("Evaluating all walkers on device (batched XLA "
                  "likelihood)...")
        if isinstance(mu_sigma, tuple):
            dev_mu, dev_sig2 = mu_sigma[0], mu_sigma[1] ** 2
        else:
            dev_mu, dev_sig2 = float(mu_sigma), 0.0
        _lnp_args = (cube, angs, psfn, _opt_overrides["ncomp"],
                     annulus_width, initial_state[0], initial_state[1],
                     aperture_radius, fwhm, dev_mu, dev_sig2, bounds)
        _lnp_kwargs = dict(
            svd_method=MODE_TO_METHOD.get(_opt_overrides["svd_mode"],
                                          "lapack"),
            collapse=_opt_overrides["collapse"], sigma=sigma,
            force_rPA=force_rPA, weights=weights,
            transmission=transmission, cube_ref=cube_ref,
            scaling=_opt_overrides["scaling"],
            collapse_ifs=_opt_overrides["collapse_ifs"],
            mu_sigma_is_tuple=isinstance(mu_sigma, tuple), fmerit=fmerit)
        if walker_mesh is not None:
            from .sharded import make_sharded_batched_lnprob

            n_dev = len(np.ravel(walker_mesh.devices))
            if nwalkers % n_dev or (nwalkers // 2) % n_dev:
                raise ValueError(
                    f"nwalkers ({nwalkers}) and nwalkers//2 must divide "
                    f"evenly over the {n_dev} walker_mesh devices")
            if verbosity > 0:
                print(f"Sharding walker batches over {n_dev} devices")
            lnprob_batched = make_sharded_batched_lnprob(
                walker_mesh, *_lnp_args,
                axis=walker_mesh.axis_names[0], **_lnp_kwargs)
        else:
            lnprob_batched = make_batched_lnprob(*_lnp_args, **_lnp_kwargs)
    elif walker_mesh is not None:
        raise ValueError(
            "walker_mesh requires the on-device likelihood fast path "
            "(algo=pca_annulus without radial_gradient/custom "
            "algo_options); got a host-fallback configuration")
    else:
        def _lnprob_one(p):
            return lnprob(tuple(p), bounds, cube, angs, psfn, fwhm,
                          annulus_width, ncomp, aperture_radius,
                          initial_state, cube_ref, svd_mode, scaling, algo,
                          delta_rot, fmerit, imlib, interpolation, collapse,
                          algo_options, weights, transmission,
                          radial_gradient, mu_sigma, sigma, force_rPA)

        if nproc > 1:
            # host-fallback walker parallelism (the reference's fork pool,
            # negfc_mcmc.py:950-963): threads — the per-walker work is
            # numpy/scipy/jit-dispatch which releases the GIL, and forking
            # with an initialized accelerator backend is unsafe
            import concurrent.futures

            _walker_pool = concurrent.futures.ThreadPoolExecutor(nproc)

            def lnprob_batched(coords):  # pool shut down before return
                return np.fromiter(
                    _walker_pool.map(_lnprob_one, np.asarray(coords)),
                    dtype=float)
        else:
            def lnprob_batched(coords):
                return np.array([_lnprob_one(p)
                                 for p in np.asarray(coords)])

    # ------------------------------------------------------------------
    # stretch-move ensemble loop with the reference's convergence schedule
    # ------------------------------------------------------------------
    import jax.numpy as jnp

    key = jax.random.PRNGKey(rng_seed)
    half = nwalkers // 2
    coords = np.asarray(pos, dtype=float)
    lp = np.array(lnprob_batched(jnp.asarray(coords)))
    n_accepted = np.zeros(nwalkers)

    fraction = 0.3
    geom = 0
    lastcheck = 0
    konvergence = np.inf
    rhat_count = 0
    ac_count = 0
    chain = np.empty([nwalkers, 1, dim])
    nIterations = limit + supp
    rhat = np.zeros(dim)
    stop = np.inf

    start = datetime.datetime.now()
    k = -1
    for k in range(nIterations):
        # one full stretch-move sweep (two half-updates)
        for (i0, i1), (j0, j1) in ((( 0, half), (half, nwalkers)),
                                   ((half, nwalkers), (0, half))):
            key, kz, kc, ku = jax.random.split(key, 4)
            S0 = coords[i0:i1]
            S1 = coords[j0:j1]
            ns0 = S0.shape[0]
            u = np.asarray(jax.random.uniform(kz, (ns0,)))
            z = ((a - 1.0) * u + 1.0) ** 2 / a
            partners = np.asarray(jax.random.randint(kc, (ns0,), 0,
                                                     S1.shape[0]))
            proposal = S1[partners] + z[:, None] * (S0 - S1[partners])
            lp_new = np.array(lnprob_batched(jnp.asarray(proposal)))
            log_ratio = (dim - 1) * np.log(z) + lp_new - lp[i0:i1]
            accept = np.log(np.asarray(jax.random.uniform(ku, (ns0,)))) \
                < log_ratio
            coords[i0:i1][accept] = proposal[accept]
            lp[i0:i1][accept] = lp_new[accept]
            n_accepted[i0:i1] += accept

        if verbosity > 1 and k % 50 == 0:
            elapsed = (datetime.datetime.now() - start).total_seconds()
            print(f"{k}\t\t{elapsed / (k + 1):.5f} s/step", flush=True)

        # dynamic chain growth (negfc_mcmc.py:994-1000)
        s = chain.shape[1]
        if k + 1 > s:
            empty = np.zeros([nwalkers, 2 * s, dim])
            chain = np.concatenate((chain, empty), axis=1)
        chain[:, k] = coords

        # convergence checks on the geometric schedule
        criterion = int(np.amin([np.ceil(itermin * (1 + fraction) ** geom),
                                 lastcheck + np.floor(maxgap)]))
        if k == criterion:
            geom += 1
            lastcheck = k
            if display:
                if force_rPA:
                    wp_labels = [f"f{j}" for j in range(dim)]
                else:
                    wp_labels = ["r", "theta"] + \
                        [f"f{j}" for j in range(dim - 2)]
                show_walk_plot(chain[:, :k + 1], labels=wp_labels)
            if (k + 1) >= itermin and konvergence == np.inf:
                if conv_test == "gb":
                    thr0 = int(np.floor(burnin * k))
                    thr1 = int(np.floor((1 - burnin) * k * 0.25))
                    rhat = np.zeros(dim)
                    for j in range(dim):
                        part1 = chain[:, thr0:thr0 + thr1, j].reshape(-1)
                        part2 = chain[:, thr0 + 3 * thr1:thr0 + 4 * thr1,
                                      j].reshape(-1)
                        series = np.vstack((part1, part2))
                        rhat[j] = gelman_rubin(series)
                    if verbosity > 0:
                        print(f"   r_hat = {rhat}")
                        print(f"   r_hat <= threshold = "
                              f"{rhat <= rhat_threshold} \n", flush=True)
                    if (rhat <= rhat_threshold).all():
                        rhat_count += 1
                        if rhat_count >= rhat_count_threshold:
                            if verbosity > 0:
                                print("... ==> convergence reached")
                            konvergence = k
                            stop = konvergence + supp
                    else:
                        rhat_count = 0
                elif conv_test == "ac":
                    for j in range(dim):
                        rhat[j] = autocorr_test(chain[:, :k, j])
                    thr = 1.0 / ac_c
                    if verbosity > 0:
                        print(f"Auto-corr tau/N = {rhat}")
                        print(f"tau/N <= {thr} = {rhat < thr} \n", flush=True)
                    if (rhat <= thr).all():
                        ac_count += 1
                        if verbosity > 0:
                            print(f"Auto-correlation test passed for all "
                                  f"params! {ac_count}/{ac_count_thr}")
                        if ac_count >= ac_count_thr:
                            if verbosity > 0:
                                print("\n ... ==> convergence reached")
                            break
                    else:
                        ac_count = 0
                else:
                    raise ValueError("conv_test value not recognized")

        if k + 1 >= stop:
            if verbosity > 0:
                print("We break the loop because we have reached convergence")
            break

    if k == nIterations - 1 and verbosity > 0:
        print("We have reached the limit # of steps without convergence")

    if save:
        import pickle
        import os

        os.makedirs(output_dir, exist_ok=True)
        output = {"chain": chain_zero_truncated(chain),
                  "AR": n_accepted / (k + 1),
                  "lnprobability": lp}
        if output_file is None:
            output_file = "MCMC_results"
        with open(output_dir + "/" + output_file, "wb") as f:
            pickle.dump(output, f)
        print(f"\nThe file MCMC_results has been stored in the folder "
              f"{output_dir}/")

    if verbosity > 0:
        timing(start_time)

    if "_walker_pool" in locals():
        _walker_pool.shutdown(wait=False)
    return chain_zero_truncated(chain)


def chain_zero_truncated(chain):
    """Truncate the chain at the last constructed step
    (negfc_mcmc.py:1122-1144)."""
    try:
        idxzero = np.where(chain[0, :, 0] == 0.0)[0][0]
    except IndexError:
        idxzero = chain.shape[1]
    return chain[:, 0:idxzero, :]


def show_walk_plot(chain, save=False, output_dir="", **kwargs):
    """Walk plot of the chain (negfc_mcmc.py:1145-1201)."""
    import matplotlib.pyplot as plt

    nparams = chain.shape[2]
    labels = kwargs.get("labels", [f"p{j}" for j in range(nparams)])
    fig, axes = plt.subplots(nparams, 1, sharex=True,
                             figsize=kwargs.get("figsize", (8, 6)))
    axes = np.atleast_1d(axes)
    for j in range(nparams):
        axes[j].plot(chain[:, :, j].T, color="k", alpha=0.3)
        axes[j].set_ylabel(labels[j])
    axes[-1].set_xlabel("step number")
    if save:
        plt.savefig(output_dir + "walk_plot.pdf")
        plt.close(fig)
    else:
        plt.show()


def show_corner_plot(chain, burnin=0.5, save=False, output_dir="", **kwargs):
    """Corner plot of the posterior samples (negfc_mcmc.py:1202-1256)."""
    import matplotlib.pyplot as plt

    temp = np.where(chain[0, :, 0] == 0.0)[0]
    if len(temp) != 0:
        chain = chain[:, :temp[0], :]
    length = chain.shape[1]
    chain = chain[:, int(np.floor(burnin * (length - 1))):length, :]
    ndim = chain.shape[2]
    samples = chain.reshape((-1, ndim))
    labels = kwargs.get("labels", [f"p{j}" for j in range(ndim)])

    fig, axes = plt.subplots(ndim, ndim, figsize=(3 * ndim, 3 * ndim))
    axes = np.atleast_2d(axes)
    for i in range(ndim):
        for j in range(ndim):
            ax = axes[i][j]
            if j > i:
                ax.axis("off")
            elif i == j:
                ax.hist(samples[:, i], bins=50, histtype="step")
                ax.set_xlabel(labels[i])
            else:
                ax.hist2d(samples[:, j], samples[:, i], bins=50)
                ax.set_xlabel(labels[j])
                ax.set_ylabel(labels[i])
    if save:
        plt.savefig(output_dir + "corner_plot.pdf")
        plt.close(fig)
    else:
        plt.show()


def confidence(isamples, cfd=68.27, bins=100, gaussian_fit=False,
               weights=None, verbose=True, save=False, output_dir="",
               force=False, output_file="confidence.txt", title=None,
               ndig=1, plsc=None, labels=["r", "theta", "f"], gt=None,
               **kwargs):
    """Highly probable value and confidence interval per parameter
    (reference negfc_mcmc.py:1257-1500); histogram-based, with optional
    1-d Gaussian fit."""
    isamples = np.asarray(isamples)
    if isamples.ndim == 1:
        isamples = isamples[:, None]
    n_params = isamples.shape[1]
    if n_params != len(labels):
        raise ValueError("Length of labels different to number of "
                         "parameters")
    if cfd == 100:
        cfd = 99.9

    val_max = {}
    confidenceInterval = {}
    mu = np.zeros(n_params)
    sigma_fit = np.zeros(n_params)
    hist_state = []  # per-param (n, bin_vertices, peak_idx, lo, hi)

    for j in range(n_params):
        n, bin_vertices = np.histogram(isamples[:, j], bins=bins,
                                       weights=weights)
        bins_width = np.mean(np.diff(bin_vertices))
        surface_total = np.sum(np.ones_like(n) * bins_width * n)
        n_arg_sort = np.argsort(n)[::-1]

        test = 0
        pourcentage = 0
        k = 0
        for k, jj in enumerate(n_arg_sort):
            test += bins_width * n[int(jj)]
            pourcentage = test / surface_total * 100
            if pourcentage > cfd:
                if verbose:
                    print(f"percentage for {labels[j]}: {pourcentage}%")
                break
        if k == 0:
            msg = ("WARNING: Percentile reached in a single bin. This may "
                   "be due to outliers or a small sample. Uncertainties "
                   "will be unreliable. Try one of these: increase bins, "
                   "or trim outliers, or decrease cfd.")
            # NOTE: the reference raises when force=True (negfc_mcmc.py:
            # 1660-1669), inverted vs its own docstring — replicated as-is
            if force:
                raise ValueError(msg)
            print(msg)
        n_arg_min = int(n_arg_sort[:k + 1].min())
        n_arg_max = int(n_arg_sort[:k + 1].max())
        if n_arg_min == 0:
            n_arg_min += 1
        if n_arg_max == bins:
            n_arg_max -= 1

        val_max[labels[j]] = bin_vertices[int(n_arg_sort[0]) + 1] \
            - bins_width / 2
        confidenceInterval[labels[j]] = np.array(
            [bin_vertices[n_arg_min - 1], bin_vertices[n_arg_max + 1]]
        ) - val_max[labels[j]]
        hist_state.append((n, bin_vertices, int(n_arg_sort[0]),
                           bin_vertices[n_arg_min - 1],
                           bin_vertices[n_arg_max + 1]))

        if gaussian_fit:
            mu[j] = np.mean(isamples[:, j])
            sigma_fit[j] = np.std(isamples[:, j])

    # figure mirroring the reference's (negfc_mcmc.py:1360-1607): one
    # histogram per parameter with the CI samples shaded and the mode
    # marked; a second row with the normalized histogram + Gaussian fit
    # when gaussian_fit is on
    import matplotlib.pyplot as plt
    from scipy.stats import norm as _norm

    ncols = min(4, n_params)
    hist_rows = max(int(np.ceil(n_params / 4)), 1)
    nrows = 2 * hist_rows if gaussian_fit else hist_rows
    fig, axs = plt.subplots(nrows, ncols, figsize=(12, 4 * nrows),
                            squeeze=False)
    if isinstance(ndig, int):
        ndig = [ndig] * n_params
    for j in range(n_params):
        n, bin_vertices, peak_idx, lo, hi = hist_state[j]
        ax0 = axs[j // 4][j % 4]
        arg = (isamples[:, j] >= lo) & (isamples[:, j] <= hi)
        ax0.hist(isamples[arg, j], bins=bin_vertices, facecolor="gray",
                 edgecolor="darkgray", histtype="stepfilled", alpha=0.5)
        ax0.vlines(val_max[labels[j]], 0, n[peak_idx], linestyles="dashed",
                   color="red", label="estimate" if gt is not None else None)
        if gt is not None:
            ax0.vlines(gt[j], 0, n.max(), linestyles="dashed", color="blue",
                       label="gt")
            ax0.legend()
        ax0.set_xlabel(labels[j])
        if j == 0:
            ax0.set_ylabel("Counts")
        if title is not None:
            fmt = f"{{:.{ndig[j]}f}}".format
            lab = title if isinstance(title, str) else labels[j]
            tit = (f"${{{fmt(val_max[labels[j]])}}}"
                   f"_{{{fmt(confidenceInterval[labels[j]][0])}}}"
                   f"^{{+{fmt(confidenceInterval[labels[j]][1])}}}$")
            ax0.set_title(f"{lab}: {tit}", fontsize=10)
        if gaussian_fit:
            ax1 = axs[hist_rows + j // 4][j % 4]
            _, bins_fit, _ = ax1.hist(isamples[:, j], bins, density=True,
                                      weights=weights, facecolor="gray",
                                      edgecolor="darkgray", histtype="step")
            y = _norm.pdf(bins_fit, np.mean(isamples[:, j]),
                          np.std(isamples[:, j]))
            ax1.plot(bins_fit, y, "g-", linewidth=2, alpha=0.7)
            ax1.vlines(np.mean(isamples[:, j]), 0, np.amax(y),
                       linestyles="dashed", color="green")
            ax1.set_xlabel(labels[j])
            if j == 0:
                ax1.set_ylabel("Counts")
    plt.tight_layout(w_pad=0.1)
    if save:
        fig.savefig(output_dir + "confi_hist_flux_r_theta_gaussfit.pdf")

    if verbose:
        print("\n\nConfidence intervals:")
        for j in range(n_params):
            lab = labels[j]
            print(f"{lab}: {val_max[lab]} "
                  f"[{confidenceInterval[lab][0]},"
                  f"{confidenceInterval[lab][1]}]")
        if gaussian_fit:
            print("Gaussian fit results:")
            for j, lab in enumerate(labels):
                print(f"{lab}: {mu[j]} +-{sigma_fit[j]}")

    if save:
        with open(output_dir + output_file, "w") as f:
            f.write("###########################\n")
            f.write("####   INFERENCE TEST   ###\n")
            f.write("###########################\n \n")
            f.write("Results of the MCMC fit\n")
            f.write("----------------------- \n \n")
            f.write(">> Position and flux of the planet (highly "
                    "probable):\n")
            f.write(f"{cfd} % confidence interval\n \n")
            for j, lab in enumerate(labels):
                f.write(f"{lab}: \t\t\t{val_max[lab]:.3f} "
                        f"\t-{-confidenceInterval[lab][0]:.3f} "
                        f"\t+{confidenceInterval[lab][1]:.3f}\n")
            if n_params > 1 and plsc is not None and "r" in labels:
                f.write(f" Platescale = {plsc * 1000} mas\n")
                f.write(f"r (mas): \t\t{val_max['r'] * plsc * 1000:.2f} "
                        f"\t\t-{-confidenceInterval['r'][0] * plsc * 1000:.2f} "
                        f"\t\t+{confidenceInterval['r'][1] * plsc * 1000:.2f}\n")

    if gaussian_fit:
        return mu, sigma_fit
    return val_max, confidenceInterval
