"""NEGFC end-to-end tests: recover injected companion parameters."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def negfc_data():
    """Cube with a known companion injected with the real injector."""
    rng = np.random.default_rng(11)
    from scipy.ndimage import gaussian_filter
    from vip_tpu.fm import cube_inject_companions, normalize_psf

    n, size, fwhm = 20, 81, 4.0
    angles = np.linspace(0, 60, n)
    yy, xx = np.mgrid[:25, :25]
    sigma = fwhm / 2.355
    psf = np.exp(-((yy - 12) ** 2 + (xx - 12) ** 2) / (2 * sigma**2))
    psfn = normalize_psf(psf, fwhm=fwhm, verbose=False)

    cube = gaussian_filter(rng.standard_normal((n, size, size)), 1.2) * 0.3
    r_true, theta_true, f_true = 16.0, 35.0, 15.0
    cube = cube_inject_companions(cube, psfn, angles, flevel=f_true,
                                  rad_dists=[r_true], theta=theta_true,
                                  verbose=False)
    return cube, angles, psfn, (r_true, theta_true, f_true), fwhm


def test_chisquare_minimum_near_truth(negfc_data):
    from vip_tpu.fm import chisquare

    cube, angles, psfn, truth, fwhm = negfc_data
    r, th, f = truth
    chi_true = chisquare((r, th, f), cube, angles, psfn, fwhm, 4, 1,
                         (r, th), ncomp=3, mu_sigma=(0.0, 0.05))
    chi_off = chisquare((r, th, f * 2), cube, angles, psfn, fwhm, 4, 1,
                        (r, th), ncomp=3, mu_sigma=(0.0, 0.05))
    assert chi_true < chi_off


def test_firstguess_recovers_truth(negfc_data):
    from vip_tpu.fm import firstguess

    cube, angles, psfn, truth, fwhm = negfc_data
    r, th, f = truth
    cy = cx = cube.shape[1] // 2
    x_pl = cx + r * np.cos(np.deg2rad(th))
    y_pl = cy + r * np.sin(np.deg2rad(th))
    r0, th0, f0 = firstguess(cube, angles, psfn, [(x_pl, y_pl)], ncomp=3,
                             fwhm=fwhm, annulus_width=4, aperture_radius=1,
                             simplex=True, plot=False, verbose=False,
                             f_range=np.geomspace(1, 100, 12))
    assert abs(r0[0] - r) < 0.5
    assert abs(((th0[0] - th + 180) % 360) - 180) < 3.0
    assert abs(f0[0] - f) / f < 0.3


def test_device_lnprob_matches_host(negfc_data):
    """The jittable batched likelihood agrees with the host lnprob."""
    import jax.numpy as jnp
    from vip_tpu.fm.negfc_mcmc import lnprob
    from vip_tpu.ops.negfc_model import make_batched_lnprob

    cube, angles, psfn, truth, fwhm = negfc_data
    r, th, f = truth
    mu_sigma = (0.001, 0.05)
    bounds = [(r - 2, r + 2), (th - 10, th + 10), (0, 5 * f)]

    batched = make_batched_lnprob(cube, angles, psfn, 3, 4, r, th, 1.0,
                                  fwhm, mu_sigma[0], mu_sigma[1] ** 2,
                                  bounds)
    params = np.array([[r, th, f],
                       [r + 0.5, th - 2.0, f * 1.2],
                       [r - 0.7, th + 3.0, f * 0.8]])
    dev = np.asarray(batched(jnp.asarray(params)))
    host = np.array([
        lnprob(tuple(p), bounds, cube, angles, psfn, fwhm, 4, 3, 1.0,
               (r, th, f), mu_sigma=mu_sigma)
        for p in params
    ])
    assert np.allclose(dev, host, rtol=1e-4, atol=1e-6)


@pytest.fixture(scope="module")
def negfc_small():
    """Smaller cube for per-branch device/host parity checks."""
    rng = np.random.default_rng(7)
    from scipy.ndimage import gaussian_filter
    from vip_tpu.fm import cube_inject_companions, normalize_psf

    n, size, fwhm = 10, 61, 4.0
    angles = np.linspace(0, 50, n)
    yy, xx = np.mgrid[:25, :25]
    sigma = fwhm / 2.355
    psf = np.exp(-((yy - 12) ** 2 + (xx - 12) ** 2) / (2 * sigma**2))
    psfn = normalize_psf(psf, fwhm=fwhm, verbose=False)

    cube = gaussian_filter(rng.standard_normal((n, size, size)), 1.2) * 0.3
    r_true, theta_true, f_true = 12.0, 35.0, 15.0
    cube = cube_inject_companions(cube, psfn, angles, flevel=f_true,
                                  rad_dists=[r_true], theta=theta_true,
                                  verbose=False)
    cube_ref = gaussian_filter(
        rng.standard_normal((n, size, size)), 1.2) * 0.3
    return cube, angles, psfn, (r_true, theta_true, f_true), fwhm, cube_ref


@pytest.mark.parametrize("branch", [
    "weights", "transmission", "transmission-short", "cube_ref",
    "scaling-tmean", "scaling-tstd", "fmerit-sum", "fmerit-stddev",
    "collapse-sum",
])
def test_device_lnprob_branches_match_host(negfc_small, branch):
    """Each newly supported device-model branch agrees with the host
    lnprob (itself oracle-checked vs the reference)."""
    import jax.numpy as jnp
    from vip_tpu.fm.negfc_mcmc import lnprob
    from vip_tpu.ops.negfc_model import make_batched_lnprob

    cube, angles, psfn, truth, fwhm, cube_ref = negfc_small
    r, th, f = truth
    n = cube.shape[0]
    bounds = [(r - 2, r + 2), (th - 10, th + 10), (0, 5 * f)]

    host_kw = dict(mu_sigma=(0.001, 0.05))
    dev_kw = dict(mu_sigma_is_tuple=True)
    mu, sig2 = 0.001, 0.05 ** 2
    if branch == "weights":
        w = np.linspace(0.8, 1.2, n)
        host_kw["weights"] = w
        dev_kw["weights"] = w
    elif branch == "transmission":
        trans = np.array([[0.0, 4.0, 8.0, 14.0, 30.0],
                          [0.0, 0.3, 0.7, 1.0, 1.0]])
        host_kw["transmission"] = trans
        dev_kw["transmission"] = trans
    elif branch == "transmission-short":
        # table stops short of the companion radius: exercises the
        # injector's append-1-at-sqrt(2)*width extension rule
        trans = np.array([[0.0, 4.0, 8.0], [0.0, 0.3, 0.6]])
        host_kw["transmission"] = trans
        dev_kw["transmission"] = trans
    elif branch == "cube_ref":
        host_kw["cube_ref"] = cube_ref
        dev_kw["cube_ref"] = cube_ref
    elif branch == "scaling-tmean":
        host_kw["scaling"] = dev_kw["scaling"] = "temp-mean"
    elif branch == "scaling-tstd":
        host_kw["scaling"] = dev_kw["scaling"] = "temp-standard"
    elif branch == "fmerit-sum":
        host_kw["mu_sigma"] = 0.001
        dev_kw["mu_sigma_is_tuple"] = False
        dev_kw["fmerit"] = host_kw["fmerit"] = "sum"
        sig2 = 0.0
    elif branch == "fmerit-stddev":
        host_kw["mu_sigma"] = 0.001
        dev_kw["mu_sigma_is_tuple"] = False
        dev_kw["fmerit"] = host_kw["fmerit"] = "stddev"
        sig2 = 0.0
    elif branch == "collapse-sum":
        host_kw["collapse"] = dev_kw["collapse"] = "sum"

    batched = make_batched_lnprob(cube, angles, psfn, 3, 4, r, th, 1.0,
                                  fwhm, mu, sig2, bounds, **dev_kw)
    params = np.array([[r, th, f],
                       [r + 0.5, th - 2.0, f * 1.2],
                       [r - 0.7, th + 3.0, f * 0.8]])
    dev = np.asarray(batched(jnp.asarray(params)))
    host = np.array([
        lnprob(tuple(p), bounds, cube, angles, psfn, fwhm, 4, 3, 1.0,
               (r, th, f), **host_kw)
        for p in params
    ])
    assert np.allclose(dev, host, rtol=1e-4, atol=1e-5)


def test_device_lnprob_4d_matches_host(negfc_small):
    """4-D (IFS) cube device model vs host lnprob, scalar flux broadcast
    over channels + absmean IFS collapse."""
    import jax.numpy as jnp
    from vip_tpu.fm.negfc_mcmc import lnprob
    from vip_tpu.ops.negfc_model import make_batched_lnprob

    cube3, angles, psfn, truth, fwhm, _ = negfc_small
    r, th, f = truth
    cube4 = np.stack([cube3, cube3 * 1.1])
    psfn4 = np.stack([psfn, psfn])
    bounds = [(r - 2, r + 2), (th - 10, th + 10), (0, 5 * f)]
    mu_sigma = (0.001, 0.05)

    batched = make_batched_lnprob(cube4, angles, psfn4, 3, 4, r, th, 1.0,
                                  fwhm, mu_sigma[0], mu_sigma[1] ** 2,
                                  bounds)
    params = np.array([[r, th, f], [r + 0.4, th - 1.5, f * 1.1]])
    dev = np.asarray(batched(jnp.asarray(params)))
    host = np.array([
        lnprob(tuple(p), bounds, cube4, angles, psfn4, fwhm, 4, 3, 1.0,
               (r, th, f), mu_sigma=mu_sigma)
        for p in params
    ])
    assert np.allclose(dev, host, rtol=1e-4, atol=1e-5)


def test_mcmc_host_fallback_threaded(negfc_small):
    """Custom algos route through the host fallback; nproc>1 evaluates
    walkers on a thread pool (reference fork-pool semantics,
    negfc_mcmc.py:950-963) and must agree with the serial path."""
    from vip_tpu.fm import mcmc_negfc_sampling
    from vip_tpu.psfsub import pca

    cube, angles, psfn, truth, fwhm, _ = negfc_small
    r, th, f = truth

    def my_algo(cube, angle_list, **kw):
        return pca(cube=cube, angle_list=angle_list, ncomp=3, verbose=False)

    kwargs = dict(algo=my_algo, ncomp=3, annulus_width=4,
                  aperture_radius=1, fwhm=fwhm, nwalkers=8,
                  niteration_min=2, niteration_limit=5, conv_test="gb",
                  verbosity=0, rng_seed=3)
    ch1 = mcmc_negfc_sampling(cube, angles, psfn, (r, th, f), nproc=1,
                              **kwargs)
    ch4 = mcmc_negfc_sampling(cube, angles, psfn, (r, th, f), nproc=4,
                              **kwargs)
    assert np.allclose(ch1, ch4)


def test_mcmc_negfc_sampling_device(negfc_data):
    from vip_tpu.fm import confidence, mcmc_negfc_sampling

    cube, angles, psfn, truth, fwhm = negfc_data
    r, th, f = truth
    chain = mcmc_negfc_sampling(cube, angles, psfn, (r, th, f), ncomp=3,
                                annulus_width=4, aperture_radius=1,
                                fwhm=fwhm, nwalkers=24,
                                niteration_min=5, niteration_limit=40,
                                conv_test="gb", verbosity=0, rng_seed=3)
    assert chain.shape[0] == 24
    assert chain.shape[2] == 3
    burn = chain[:, chain.shape[1] // 2:, :].reshape(-1, 3)
    med = np.median(burn, axis=0)
    assert abs(med[0] - r) < 1.0
    assert abs(((med[1] - th + 180) % 360) - 180) < 5.0
    assert abs(med[2] - f) / f < 0.5
    val_max, ci = confidence(burn, cfd=68, verbose=False)
    assert "r" in val_max


def test_nested_negfc_sampling_recovers_truth(negfc_data):
    """End-to-end nested sampling: recover the injected companion and
    return the reference-shaped (3, 2) summary
    (reference negfc_nested.py:54-341,342-459)."""
    from vip_tpu.fm.negfc_nested import (nested_negfc_sampling,
                                         nested_sampling_results)

    cube, angles, psfn, truth, fwhm = negfc_data
    r, th, f = truth
    res = nested_negfc_sampling(np.array([r, th, f]), cube, angles, psfn,
                                fwhm, annulus_width=4, aperture_radius=1,
                                ncomp=3, npoints=50, dlogz=0.1,
                                w=(3, 3, 0.5 * f), verbose=False)
    assert res.samples.shape[1] == 3
    assert res.samples.shape[0] == res.logvol.shape[0]
    out = nested_sampling_results(res, burnin=0.3, plot=False,
                                  verbose=False)
    assert out.shape == (3, 2)
    assert abs(out[0, 0] - r) < 2.0
    assert abs(((out[1, 0] - th + 180) % 360) - 180) < 6.0
    assert abs(out[2, 0] - f) / f < 0.5
