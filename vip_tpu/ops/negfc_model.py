"""Fully jittable NEGFC forward model and batched walker log-probability.

This is the BASELINE.json stretch target (SURVEY.md §3.4): the reference
evaluates each MCMC walker's likelihood in a forked process — inject a
negative companion, run pca_annulus, extract aperture statistics
(vip_hci/fm/negfc_mcmc.py:950-963). Here the ENTIRE likelihood is one XLA
computation with traced (r, θ, f):

  cyclic Fourier shift of the PSF stamp (scipy fourier_shift math, the
  reference's 'ndimage-fourier' default for NEGFC) → dynamic placement →
  annulus gather (static indices) → SVD → project/subtract → scatter →
  FFT 3-shear derotation of every frame → median collapse → aperture
  values (static indices) → Gaussian log-likelihood.

``make_batched_lnprob`` vmaps it over all walkers, so one sampler
iteration is a single device call.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .fft import rotate_fft
from .linalg import matrix_scaling_jax as _matrix_scaling_jnp, svd_top
from ..preproc.derotation import rotate_fft_pruned_batch

__all__ = ["make_negfc_lnprob", "make_batched_lnprob", "cyclic_fourier_shift"]


def cyclic_fourier_shift(frame, dy, dx):
    """Cyclic (wrap) Fourier shift — scipy.ndimage.fourier_shift math."""
    ny, nx = frame.shape
    fy = jnp.fft.fftfreq(ny)[:, None]
    fx = jnp.fft.fftfreq(nx)[None, :]
    phase = jnp.exp(-2j * jnp.pi * (dy * fy + dx * fx))
    return jnp.fft.ifft2(jnp.fft.fft2(frame) * phase).real


def _inject_negfc(cube, psfn, angs, r, theta, flux):
    """Inject -flux at polar (r, theta) in each frame (traced r/theta/flux).

    Mirrors ``_frame_shift_fcp`` (fm/fakecomp.py:320-375): integer placement
    + sub-pixel cyclic Fourier shift of the PSF stamp.
    """
    n, ny, nx = cube.shape
    size_fc = psfn.shape[-1]
    cy = ny // 2 if ny % 2 == 0 else (ny - 1) // 2
    cx = nx // 2 if nx % 2 == 0 else (nx - 1) // 2

    w = int(np.ceil(size_fc / 2))
    if size_fc % 2:
        w -= 1
    sty = cy - w
    stx = cx - w

    ang = jnp.deg2rad(theta)

    def one(frame, a, f):
        shift_y = r * jnp.sin(ang - jnp.deg2rad(a))
        shift_x = r * jnp.cos(ang - jnp.deg2rad(a))
        int_y = shift_y.astype(jnp.int32)
        int_x = shift_x.astype(jnp.int32)
        dsy = shift_y - int_y
        dsx = shift_x - int_x
        stamp = cyclic_fourier_shift(psfn, dsy, dsx)
        canvas = jnp.zeros((ny, nx), cube.dtype)
        canvas = jax.lax.dynamic_update_slice(canvas, stamp.astype(cube.dtype),
                                              (sty + int_y, stx + int_x))
        return frame - f * canvas

    # flux may be a scalar or a per-frame vector (weights-scaled)
    flux_fr = jnp.broadcast_to(jnp.asarray(flux, cube.dtype), (n,))
    return jax.vmap(one)(cube, jnp.asarray(angs, cube.dtype), flux_fr)


def _extend_transmission(transmission, width):
    """Pad a (2, n_rad) transmission table exactly like the injector the
    host path calls (fm/fakecomp.py:128-155, mirroring reference
    fakecomp.py:240-263): prepend transmission 0 at radius 0, and append
    transmission **1** at radius sqrt(2)*width (the full frame size) when
    the table stops short of sqrt(2)*width/2."""
    transmission = np.asarray(transmission, dtype=float)
    rad = transmission[0].tolist()
    tr = transmission[1].tolist()
    last = transmission[0, -1]
    if transmission[0, 0] != 0:
        rad = [0.0] + rad
        tr = [0.0] + tr
    if last < np.sqrt(2) * width / 2:
        rad = rad + [np.sqrt(2) * width]
        tr = tr + [1.0]
    return np.array(rad), np.array(tr)


def make_negfc_lnprob(cube, angs, psfn, ncomp, annulus_width, r_guess,
                      theta_guess, aperture_radius, fwhm, mu, sigma2_spe,
                      bounds, svd_method="lapack", collapse="median",
                      sigma="spe+pho", force_rPA=False, weights=None,
                      transmission=None, cube_ref=None, scaling=None,
                      collapse_ifs="absmean", mu_sigma_is_tuple=True,
                      fmerit="sum"):
    """Build the jittable single-walker log-probability.

    Static geometry (annulus indices, aperture indices) is precomputed on
    host from (r_guess, theta_guess). Returns ``lnprob(params)`` with
    params = (r, theta, f[, f2, ...]) — or just the fluxes if
    ``force_rPA`` — matching the reference lnlike's parameterization
    (vip_hci/fm/negfc_mcmc.py:123-343). Supports 3-D and 4-D cubes,
    per-frame ``weights`` on the injected flux, radial coronagraph
    ``transmission`` (non-gradient mode), an RDI ``cube_ref`` library
    (whose principal components are static and precomputed), the four
    matrix ``scaling`` modes, and the mu_sigma/fmerit merit variants.
    """
    from ..var.shapes import disk_coords, get_annulus_segments

    cube = jnp.asarray(cube)
    psfn = jnp.asarray(psfn)
    angs = np.asarray(angs, dtype=float)
    is4d = cube.ndim == 4
    nch = cube.shape[0] if is4d else 1
    n, ny, nx = cube.shape[-3:]

    # static annulus + aperture geometry (negfc_fmerit.py:600-625)
    inrad = int(r_guess - annulus_width / 2.0)
    outrad = int(r_guess + annulus_width / 2.0)
    ann_yy, ann_xx = get_annulus_segments((ny, nx), inrad,
                                          int(round(outrad - inrad)),
                                          nsegm=1)[0]
    ceny = ny // 2 if ny % 2 == 0 else (ny - 1) // 2
    cenx = nx // 2 if nx % 2 == 0 else (nx - 1) // 2
    posy = r_guess * np.sin(np.deg2rad(theta_guess)) + ceny
    posx = r_guess * np.cos(np.deg2rad(theta_guess)) + cenx
    ap_yy, ap_xx = disk_coords((posy, posx), aperture_radius * fwhm,
                               (ny, nx))
    # intersection with the annulus (pca_annulus semantics)
    ann_set = set(zip(ann_yy.tolist(), ann_xx.tolist()))
    keep = [(y, x) for y, x in zip(ap_yy.tolist(), ap_xx.tolist())
            if (y, x) in ann_set]
    ap_yy = jnp.asarray([p[0] for p in keep])
    ap_xx = jnp.asarray([p[1] for p in keep])
    ann_yy_j = jnp.asarray(ann_yy)
    ann_xx_j = jnp.asarray(ann_xx)

    neg_angs = jnp.asarray(-angs, cube.dtype)
    lo = jnp.asarray([b[0] for b in bounds], cube.dtype)
    hi = jnp.asarray([b[1] for b in bounds], cube.dtype)
    mu = jnp.asarray(mu, cube.dtype)
    sigma2 = jnp.asarray(sigma2_spe, cube.dtype)
    use_spe = "spe" in sigma
    use_pho = "pho" in sigma
    ncomp = int(ncomp)

    w_fr = None if weights is None else jnp.asarray(weights, cube.dtype)

    # transmission tables, one per channel (static radii/values)
    if transmission is not None:
        transmission = np.asarray(transmission, dtype=float)
        tabs = []
        for ch in range(nch):
            col = 1 if transmission.shape[0] == 2 else ch + 1
            tabs.append(_extend_transmission(
                np.array([transmission[0], transmission[col]]), nx))
        t_rad = jnp.asarray(np.stack([t[0] for t in tabs]))
        t_val = jnp.asarray(np.stack([t[1] for t in tabs]))

    # static RDI library -> static principal components (the injection
    # never touches the reference cube, so V is a constant of the model)
    if cube_ref is not None:
        if is4d:
            if isinstance(cube_ref, (list, tuple)):
                refs = [np.asarray(c, float) for c in cube_ref]
            elif np.asarray(cube_ref).ndim == 3:
                refs = [np.asarray(cube_ref, float)] * nch
            else:
                refs = [np.asarray(cube_ref[ch], float)
                        for ch in range(nch)]
        else:
            refs = [np.asarray(cube_ref, float)]
        V_static = []
        for rc in refs:
            data_ref = _matrix_scaling_jnp(
                jnp.asarray(rc)[:, ann_yy_j, ann_xx_j], scaling)
            V_static.append(svd_top(data_ref, ncomp, method=svd_method))
        V_static = jnp.stack(V_static)          # (nch, ncomp, npx)

    def forward_3d(cube_ch, psfn_ch, r, theta, f, ch):
        if transmission is not None:
            f = f * jnp.interp(r, t_rad[ch], t_val[ch])
        flux_fr = f if w_fr is None else f * w_fr
        cube_fc = _inject_negfc(cube_ch, psfn_ch, angs, r, theta, flux_fr)

        # pca_annulus on static annulus indices
        data = _matrix_scaling_jnp(cube_fc[:, ann_yy_j, ann_xx_j], scaling)
        if cube_ref is not None:
            V = V_static[ch]
        else:
            V = svd_top(data, ncomp, method=svd_method)
        transformed = data @ V.T
        recon = transformed @ V
        residuals = data - recon

        cube_zeros = jnp.zeros_like(cube_fc)
        cube_zeros = cube_zeros.at[:, ann_yy_j, ann_xx_j].set(residuals)

        der = rotate_fft_pruned_batch(cube_zeros, neg_angs)
        if collapse == "median":
            return jnp.median(der, axis=0)
        elif collapse == "mean":
            return jnp.mean(der, axis=0)
        elif collapse == "sum":
            return jnp.sum(der, axis=0)
        raise ValueError("collapse not supported in device model")

    def forward(params):
        if force_rPA:
            r = jnp.asarray(r_guess, cube.dtype)
            theta = jnp.asarray(theta_guess, cube.dtype)
            fluxes = params
        else:
            r, theta = params[0], params[1]
            fluxes = params[2:]

        if not is4d:
            frame = forward_3d(cube, psfn, r, theta, fluxes[0], 0)
        else:
            # scalar flux broadcasts over channels (reference lnlike
            # flux handling, negfc_mcmc.py:288-300)
            fl = jnp.broadcast_to(fluxes, (nch,)) if fluxes.shape[0] == 1 \
                else fluxes
            frames = jnp.stack([
                forward_3d(cube[ch], psfn[ch], r, theta, fl[ch], ch)
                for ch in range(nch)])
            if collapse_ifs == "mean":
                frame = jnp.mean(frames, axis=0)
            elif collapse_ifs == "median":
                frame = jnp.median(frames, axis=0)
            elif collapse_ifs == "sum":
                frame = jnp.sum(frames, axis=0)
            elif collapse_ifs == "absmean":
                frame = jnp.mean(jnp.abs(frames), axis=0)
            else:
                raise ValueError("collapse_ifs not supported in device "
                                 "model")
        return frame[ap_yy, ap_xx]

    def lnprob(params):
        inb = jnp.all((params >= lo) & (params <= hi))
        values = forward(params)
        if mu_sigma_is_tuple:
            num = (mu - values) ** 2
            denom = jnp.zeros_like(values)
            if use_spe:
                denom = denom + sigma2
            if use_pho:
                denom = denom + jnp.abs(values - mu)
            ll = -0.5 * jnp.sum(num / denom)
        elif fmerit == "sum":
            ll = -0.5 * jnp.sum(jnp.abs(values - mu))
        elif fmerit == "stddev":
            # reference: -np.std(values[values != 0], ddof=1) * values.size
            nz = values != 0
            k = jnp.sum(nz)
            mean_nz = jnp.sum(jnp.where(nz, values, 0.0)) / \
                jnp.maximum(k, 1)
            var = jnp.sum(jnp.where(nz, (values - mean_nz) ** 2, 0.0)) / \
                jnp.maximum(k - 1, 1)
            ll = -jnp.sqrt(var) * values.size
        else:
            raise ValueError("fmerit choice not recognized.")
        return jnp.where(inb, ll, -jnp.inf)

    return lnprob


def make_batched_lnprob(*args, **kwargs):
    """jitted, vmapped log-probability over a (nwalkers, ndim) batch."""
    lnprob = make_negfc_lnprob(*args, **kwargs)
    return jax.jit(jax.vmap(lnprob))


def run_stretch_mcmc(lnprob_batched, pos0, n_iterations, key, a=2.0,
                     callback=None, callback_every=None):
    """Affine-invariant ensemble MCMC (Goodman & Weare stretch move,
    emcee-equivalent) with every likelihood batch on device.

    Parameters
    ----------
    lnprob_batched : callable (nwalkers, ndim) -> (nwalkers,)
    pos0 : (nwalkers, ndim) initial positions.
    n_iterations : int.
    key : jax PRNG key.
    callback(k, chain, acc) : optional host callback (convergence checks).

    Returns
    -------
    chain (nwalkers, n_iterations, ndim), lnprobs, acceptance_rate
    """
    nwalkers, ndim = pos0.shape
    half = nwalkers // 2
    coords = jnp.asarray(pos0)
    lp = lnprob_batched(coords)

    chain = np.empty((nwalkers, n_iterations, ndim))
    lnps = np.empty((nwalkers, n_iterations))
    n_accept = 0

    for k in range(n_iterations):
        for (s0, s1) in (((0, half), (half, nwalkers)),
                         ((half, nwalkers), (0, half))):
            key, kz, kc, ku = jax.random.split(key, 4)
            S0 = coords[s0[0]:s0[1]]
            S1 = coords[s1[0]:s1[1]]
            ns0 = S0.shape[0]
            # z ~ g(z) ∝ 1/sqrt(z) on [1/a, a]
            u = jax.random.uniform(kz, (ns0,))
            z = ((a - 1.0) * u + 1.0) ** 2 / a
            partners = jax.random.randint(kc, (ns0,), 0, S1.shape[0])
            proposal = S1[partners] + z[:, None] * (S0 - S1[partners])
            lp_new = lnprob_batched(proposal)
            lp_old = lp[s0[0]:s0[1]]
            log_ratio = (ndim - 1) * jnp.log(z) + lp_new - lp_old
            accept = jnp.log(jax.random.uniform(ku, (ns0,))) < log_ratio
            coords = coords.at[s0[0]:s0[1]].set(
                jnp.where(accept[:, None], proposal, S0))
            lp = lp.at[s0[0]:s0[1]].set(jnp.where(accept, lp_new, lp_old))
            n_accept += int(jnp.sum(accept))

        chain[:, k] = np.asarray(coords)
        lnps[:, k] = np.asarray(lp)
        if callback is not None and callback_every and \
                (k + 1) % callback_every == 0:
            if callback(k, chain[:, :k + 1], None):
                return (chain[:, :k + 1], lnps[:, :k + 1],
                        n_accept / ((k + 1) * nwalkers))

    return chain, lnps, n_accept / (n_iterations * nwalkers)
