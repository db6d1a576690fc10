"""ANDROMEDA: maximum-likelihood exoplanet detection in ADI sequences.

TPU rebuild of vip_hci/invprob/andromeda.py ([CAN15], [MUG09]). The host
side (annuli geometry, frame pairing, optimized image differences, SNR
normalization) mirrors the reference control flow; the core matched-filter
engine — the reference's per-pixel Python double loop with per-pair pattern
placement (reference andromeda.py:860-975) — is ONE jitted XLA program
vmapped over (pixels x frame-pairs), with fixed-shape dynamic-slice window
gathers and a fixed 3Sx3S canvas for the pattern cross-term. All annuli
share one compilation (padded pixel buckets).
"""

from dataclasses import dataclass
from enum import Enum
from functools import partial
from typing import List, Union

import numpy as np
import jax.numpy as jnp
from jax import jit, lax, vmap

from ..config.paramenum import ALGO_KEY, OptMethod
from ..config.utils_param import separate_kwargs_dict
from ..var.coords import dist_matrix
from ..var.filters import cube_filter_highpass, frame_filter_highpass
from .utils_andro import (calc_psf_shift_subpix, fitaffine, idl_round,
                          idl_where, robust_std, subpixel_shift)

__all__ = ["andromeda", "ANDROMEDA_Params"]


@dataclass
class ANDROMEDA_Params:
    """Parameters for the ANDROMEDA algorithm
    (reference andromeda.py:50-78)."""

    cube: np.ndarray = None
    oversampling_fact: float = None
    angle_list: np.ndarray = None
    psf: np.ndarray = None
    filtering_fraction: float = 0.25
    min_sep: float = 0.5
    annuli_width: float = 1.0
    roa: float = 2
    opt_method: Enum = OptMethod.LSQ
    nsmooth_snr: int = 18
    iwa: float = None
    owa: float = None
    precision: int = 50
    fast: Union[float, bool] = False
    homogeneous_variance: bool = True
    ditimg: float = 1.0
    ditpsf: float = None
    tnd: float = 1.0
    total: bool = False
    multiply_gamma: bool = True
    nproc: int = 1
    verbose: bool = False


def andromeda(*all_args: List, **all_kwargs: dict):
    """Run ANDROMEDA on an ADI cube (reference andromeda.py:81-594).

    Returns (contrast, snr, snr_norm, stdcontrast, stdcontrast_norm,
    likelihood, ext_radius).
    """
    class_params, other_options = separate_kwargs_dict(
        initial_kwargs=all_kwargs, parent_class=ANDROMEDA_Params)
    algo_params = other_options.pop(ALGO_KEY, None)
    if algo_params is None:
        algo_params = ANDROMEDA_Params(*all_args, **class_params)
    p = algo_params

    def info(msg, *fmt):
        if p.verbose:
            print(msg.format(*fmt))

    # invert angles: the reference uses IDL parallactic-angle convention
    angle_list = -np.asarray(p.angle_list, dtype=float)

    cube = np.asarray(p.cube, dtype=float)
    psf = np.asarray(p.psf, dtype=float)

    # centering on npix/2+0.5 convention (reference andromeda.py:295-316)
    if cube.shape[-1] % 2 == 1:
        andro_cube = np.array([subpixel_shift(img, 0.5, 0.5)
                               for img in cube])[:, 1:, 1:]
    else:
        andro_cube = np.array([subpixel_shift(img, -0.5, -0.5)
                               for img in cube])
    if psf.shape[0] % 2 == 1:
        psf = subpixel_shift(psf, 0.5, 0.5)[1:, 1:]
    else:
        psf = subpixel_shift(psf, -0.5, -0.5)

    if p.filtering_fraction > 1 or p.filtering_fraction < 0:
        raise ValueError("``filtering_fraction`` must be between 0 and 1")

    frames, npix, _ = andro_cube.shape
    npixpsf = psf.shape[0]

    if p.opt_method != "no" and p.opt_method != OptMethod.NO:
        if p.roa < 1:
            raise ValueError("The optimization to subtraction area ``roa`` "
                             "must be >= 1")
    else:
        p.roa = 1

    iwa, owa = p.iwa, p.owa
    if iwa is None:
        for test_iwa in [0.5, 4, 0.25]:
            test_ang = 2 * np.arcsin(p.min_sep / (2 * test_iwa)) * 180 / np.pi
            test_id, _, _ = create_indices(angle_list, angmin=test_ang)
            if test_id is not None:
                break
        iwa = test_iwa
        info("iwa automatically set to {}*lambda/D", iwa)
    if owa is None:
        owa = (npix / 2 - npixpsf / 2) / (2 * p.oversampling_fact)
        info("owa automatically set to {} (based on frame size)", owa)
    else:
        owa -= (npixpsf / 2) / (2 * p.oversampling_fact)
    if owa <= iwa - p.annuli_width:
        raise ValueError("You must increase `owa` or decrease `iwa`")

    fast = p.fast
    dmean = None
    if fast is False:
        pass
    elif fast is True:
        fast = 20
        if owa > fast:
            dmean = fast
        else:
            fast = 0
        if iwa > fast:
            dmean = owa
    else:
        if owa > fast:
            dmean = fast
        else:
            fast = 0
    if fast:
        info("annuli_width is set to {} from {} lambda/D",
             4 * p.annuli_width, dmean)

    ditpsf = p.ditpsf if p.ditpsf is not None else p.ditimg

    if p.nsmooth_snr != 0 and p.nsmooth_snr < 2:
        raise ValueError("`nsmooth_snr` must be >= 2")

    # PSF normalization + filtering (reference andromeda.py:402-440)
    if p.total:
        psf_scale_factor = np.sum(psf)
    else:
        psf_scale_factor = np.max(psf)
    psf = psf / psf_scale_factor
    if p.filtering_fraction != 1:
        psf = frame_filter_highpass(psf, "hann",
                                    hann_cutoff=p.filtering_fraction)
    psf_cube = calc_psf_shift_subpix(psf, precision=p.precision)

    if p.filtering_fraction != 1:
        if p.verbose:
            print("Pre-processing filtering of the images and the PSF: "
                  "done! F={}".format(p.filtering_fraction))
        andro_cube = cube_filter_highpass(andro_cube, mode="hann",
                                          hann_cutoff=p.filtering_fraction,
                                          verbose=p.verbose)

    # annuli limits (reference andromeda.py:445-496)
    dmin, dmax = iwa, owa
    if fast:
        first_distarray = dmin + np.arange(
            int(np.round(np.abs(dmean - dmin - 1)) / p.annuli_width + 1),
            dtype=float) * p.annuli_width
        second_distarray = dmean + dmin - 1 + np.arange(
            int(np.round(dmax - dmean) / (4 * p.annuli_width) + 1),
            dtype=float) * 4 * p.annuli_width
        distarray_lambdaonD = np.hstack([first_distarray, second_distarray])
        if iwa > fast:
            distarray_lambdaonD = first_distarray
        if distarray_lambdaonD[-1] > dmax:
            distarray_lambdaonD[-1] = dmax
        annuli_limits = p.oversampling_fact * 2 * distarray_lambdaonD
    else:
        distarray_lambdaonD = dmin + np.arange(
            int(np.round(dmax - dmin) / p.annuli_width + 1),
            dtype=float) * p.annuli_width
        distarray_lambdaonD[-1] = dmax
        annuli_limits = np.floor(
            p.oversampling_fact * 2 * distarray_lambdaonD).astype(int)

    while dmax * (2 * p.oversampling_fact) < annuli_limits[-1]:
        annuli_limits = annuli_limits[:-1]
    annuli_number = len(annuli_limits) - 1
    info("Using these user parameters, {} annuli will be processed, from a "
         "separation of {} to {} pixels.", annuli_number, annuli_limits[0],
         annuli_limits[-1])

    flux = np.zeros((npix, npix))
    snr = np.zeros((npix, npix))
    likelihood = np.zeros((npix, npix))
    stdflux = np.zeros((npix, npix))
    for i in range(annuli_number)[::-1]:
        res = _process_annulus(
            i, annuli_limits, p.roa, p.min_sep, p.oversampling_fact,
            angle_list, p.opt_method, p.multiply_gamma, psf_cube,
            p.homogeneous_variance, andro_cube, verbose=p.verbose)
        if res is None:
            continue
        flux += res[0]
        snr += res[1]
        likelihood += res[2]
        stdflux += res[3]

    factor = 1 / psf_scale_factor
    flux_factor = factor * p.tnd * (ditpsf / p.ditimg)

    if p.nsmooth_snr != 0:
        if p.verbose:
            print("Normalizing SNR...")
        snr_norm, snr_std = normalize_snr(snr, nsmooth_snr=p.nsmooth_snr,
                                          fast=fast)
        stdflux_norm = np.zeros((npix, npix))
        zone = snr_std != 0
        stdflux_norm[zone] = stdflux[zone] * snr_std[zone]
        ext_radius = annuli_limits[annuli_number - 1] / (
            2 * p.oversampling_fact)
        return (flux * flux_factor, snr, snr_norm, stdflux * flux_factor,
                stdflux_norm * flux_factor, likelihood, ext_radius)
    else:
        ext_radius = np.floor(annuli_limits[annuli_number]) / (
            2 * p.oversampling_fact)
        return (flux * flux_factor, snr, snr, stdflux * flux_factor,
                stdflux * flux_factor, likelihood, ext_radius)


def _process_annulus(i, annuli_limits, roa, min_sep, oversampling_fact,
                     angle_list, opt_method, multiply_gamma, psf_cube,
                     homogeneous_variance, cube, verbose=False):
    """Pair frames, build optimized differences, run the matched filter on
    one annulus (reference andromeda.py:597-718)."""
    rhomin = annuli_limits[i]
    rhomax = annuli_limits[i + 1]
    rhomax_opt = np.sqrt(roa * rhomax**2 - (roa - 1) * rhomin**2)

    min_sep_pix = min_sep * oversampling_fact * 2
    angmin = 2 * np.arcsin(min_sep_pix / (2 * rhomin)) * 180 / np.pi
    index_neg, index_pos, indices_not_used = create_indices(
        angle_list, angmin, verbose=verbose)

    if index_neg is None:
        if verbose:
            print("  Warning: No couples found for this distance. "
                  "Skipping annulus...")
        return None

    res = diff_images(cube_pos=cube[index_pos], cube_neg=cube[index_neg],
                      rint=rhomin, rext=rhomax_opt, opt_method=opt_method,
                      verbose=verbose)
    cube_diff, gamma, gamma_prime = res
    if not multiply_gamma:
        gamma = np.ones_like(gamma)
        gamma_prime = np.ones_like(gamma_prime)

    return andromeda_core(diffcube=cube_diff, index_neg=index_neg,
                          index_pos=index_pos, angle_list=angle_list,
                          psf_cube=psf_cube,
                          homogeneous_variance=homogeneous_variance,
                          rhomin=rhomin, rhomax=rhomax, gamma=gamma,
                          verbose=verbose)


# ----------------------------------------------------------------------
# device matched-filter engine


def _idl_round_jnp(x):
    return jnp.trunc(x + jnp.copysign(0.5, x))


@partial(jit, static_argnames=("npix", "S", "precision"))
def _andromeda_engine(wd_pad, w_pad, psf_flat, parang, gamma, pair_valid,
                      pix_j, pix_i, npix, S, precision):
    """Numerator/denominator of the ML flux estimate for a batch of pixels.

    Equivalent math to reference andromeda.py:860-975, restructured: the
    union-box sums split into per-sign fixed SxS window sums plus a
    cross-term computed on a 3Sx3S canvas in positive-window coordinates.

    wd_pad, w_pad : (K, npix+2S, npix+2S) and (npix+2S, npix+2S) — the
        weighted difference images and the weight map, zero-padded by S.
    psf_flat : ((precision+1)^2, S, S) subpixel-shifted PSF patterns.
    parang : (2, K) pair angles in radians (neg, pos).
    gamma : (K,) optimization factors. pair_valid : (K,) 0/1 mask.
    pix_j, pix_i : (P,) pixel coordinates.
    """
    half = npix // 2

    def one_pixel(j, i):
        x0 = i - (npix / 2 - 0.5)
        y0 = j - (npix / 2 - 0.5)
        cosp = jnp.cos(parang)
        sinp = jnp.sin(parang)
        decalx = x0 * cosp - y0 * sinp          # (2, K)
        decaly = y0 * cosp + x0 * sinp
        fx = jnp.floor(decalx)
        fy = jnp.floor(decaly)
        subp_x = (_idl_round_jnp((decalx - fx)) * precision).astype(jnp.int32)
        subp_y = (_idl_round_jnp((decaly - fy)) * precision).astype(jnp.int32)
        lef = half + fx.astype(jnp.int32) - S // 2   # (2, K)
        bot = half + fy.astype(jnp.int32) - S // 2

        patterns = psf_flat[subp_y * (precision + 1) + subp_x]  # (2,K,S,S)

        def windows(k):
            wd_neg = lax.dynamic_slice(wd_pad[k],
                                       (bot[0, k] + S, lef[0, k] + S), (S, S))
            wd_pos = lax.dynamic_slice(wd_pad[k],
                                       (bot[1, k] + S, lef[1, k] + S), (S, S))
            w_neg = lax.dynamic_slice(w_pad,
                                      (bot[0, k] + S, lef[0, k] + S), (S, S))
            w_pos = lax.dynamic_slice(w_pad,
                                      (bot[1, k] + S, lef[1, k] + S), (S, S))
            # cross-term: embed the negative pattern in positive-window
            # coordinates on a 3Sx3S canvas
            dy = bot[0, k] - bot[1, k]
            dx = lef[0, k] - lef[1, k]
            overlap = (jnp.abs(dy) < S) & (jnp.abs(dx) < S)
            p_neg = patterns[0, k] * overlap
            canvas = jnp.zeros((3 * S, 3 * S))
            canvas = lax.dynamic_update_slice(
                canvas, p_neg, (jnp.clip(S + dy, 0, 2 * S),
                                jnp.clip(S + dx, 0, 2 * S)))
            neg_in_pos = canvas[S:2 * S, S:2 * S]
            g = gamma[k]
            p_pos = patterns[1, k]
            p_neg_full = patterns[0, k]
            num_k = jnp.sum(p_pos * wd_pos) - g * jnp.sum(p_neg_full * wd_neg)
            den_k = (jnp.sum(p_pos**2 * w_pos)
                     + g**2 * jnp.sum(p_neg_full**2 * w_neg)
                     - 2 * g * jnp.sum(p_pos * neg_in_pos * w_pos))
            return num_k * pair_valid[k], den_k * pair_valid[k]

        nums, dens = vmap(windows)(jnp.arange(parang.shape[1]))
        return jnp.sum(nums), jnp.sum(dens)

    return vmap(one_pixel)(pix_j, pix_i)


def andromeda_core(diffcube, index_neg, index_pos, angle_list, psf_cube,
                   rhomin, rhomax, gamma=None, homogeneous_variance=True,
                   verbose=False):
    """ML flux/snr/likelihood/stdflux maps for one annulus
    (reference andromeda.py:721-988), evaluated on device."""
    npairs, npix, _ = diffcube.shape
    npixpsf = psf_cube.shape[2]
    precision = psf_cube.shape[0] - 1

    if npix % 2 == 1:
        raise ValueError("size of the cube is odd!")
    if npixpsf % 2 == 1:
        raise ValueError("PSF has odd pixel size!")

    if npairs == 1:
        variance_diff_2d = np.ones((npix, npix))
    else:
        variance_diff_2d = (diffcube**2).sum(0) / npairs - (
            diffcube.sum(0) / npairs)**2

    if homogeneous_variance:
        varmean = np.mean(variance_diff_2d)
        weights_diff_2d = np.zeros((npix, npix)) + 1 / varmean
        if verbose:
            print("    ANDROMEDA_CORE: Variance is considered homogeneous, "
                  "mean {:.3f}".format(varmean))
    else:
        weights_diff_2d = (variance_diff_2d > 0).astype(float)
        weights_diff_2d /= variance_diff_2d + (variance_diff_2d == 0)

    wd_images = diffcube * weights_diff_2d

    d = dist_matrix(npix)
    select_pixels = (d > rhomin) & (d < rhomax)
    rmax_i = int(np.ceil(rhomax))
    window = np.zeros_like(select_pixels)
    window[npix // 2 - rmax_i:npix // 2 + rmax_i,
           npix // 2 - rmax_i:npix // 2 + rmax_i] = True
    select_pixels &= window
    jj, ii = np.nonzero(select_pixels)
    n_sel = len(jj)
    if n_sel == 0:
        z = np.zeros((npix, npix))
        return z, z.copy(), z.copy(), z.copy()

    if gamma is None:
        gamma_arr = np.ones(npairs)
    else:
        gamma_arr = np.asarray(gamma, dtype=float)

    parang = np.array([angle_list[index_neg],
                       angle_list[index_pos]]) * np.pi / 180

    S = npixpsf
    # pad pixel batch to a bucket so all annuli share one compilation
    bucket = int(2 ** np.ceil(np.log2(max(n_sel, 256))))
    pix_j = np.zeros(bucket, dtype=np.int32)
    pix_i = np.zeros(bucket, dtype=np.int32)
    pix_j[:n_sel] = jj
    pix_i[:n_sel] = ii

    wd_pad = np.zeros((npairs, npix + 2 * S, npix + 2 * S))
    wd_pad[:, S:S + npix, S:S + npix] = wd_images
    w_pad = np.zeros((npix + 2 * S, npix + 2 * S))
    w_pad[S:S + npix, S:S + npix] = weights_diff_2d

    psf_flat = psf_cube.reshape(-1, S, S)

    nums, dens = _andromeda_engine(
        jnp.asarray(wd_pad), jnp.asarray(w_pad), jnp.asarray(psf_flat),
        jnp.asarray(parang), jnp.asarray(gamma_arr),
        jnp.ones(npairs), jnp.asarray(pix_j), jnp.asarray(pix_i),
        npix, S, precision)
    nums = np.array(nums)[:n_sel]
    dens = np.array(dens)[:n_sel]

    numerator = np.zeros((npix, npix))
    denominator = np.ones((npix, npix))
    numerator[jj, ii] = nums
    denominator[jj, ii] = dens

    flux = numerator / denominator
    snr = numerator / np.sqrt(denominator)
    likelihood = 0.5 * snr**2
    stdflux = flux / (snr + (snr == 0))
    return flux, snr, likelihood, stdflux


# ----------------------------------------------------------------------
# host helpers


def create_indices(angle_list, angmin, verbose=True):
    """Pair frame indices so each pair is separated by at least ``angmin``
    (reference andromeda.py:991-1062)."""
    angle_list = np.asarray(angle_list, dtype=float)
    if angle_list[-1] < angle_list[0]:
        angle_list = -angle_list

    good_angles = idl_where(angle_list - angle_list[0] >= angmin)
    if len(good_angles) == 0:
        if verbose:
            print("Impossible to find any couple of angles! Try to reduce "
                  "the IWA first, else you need to reduce the minimum "
                  "separation.")
        return None, None, []

    indices_neg = [0]
    indices_pos = [good_angles[0]]
    indices_not_used = []
    for i in range(1, len(angle_list)):
        good_angles = idl_where(angle_list - angle_list[i] >= angmin)
        if len(good_angles) > 0:
            indices_neg.append(i)
            indices_pos.append(good_angles[0])
        else:
            if i not in indices_pos:
                good_angles_back = idl_where(angle_list[i] - angle_list
                                             >= angmin)
                if len(good_angles_back) > 0:
                    indices_neg.append(i)
                    indices_pos.append(good_angles_back[-1])
                else:
                    indices_not_used.append(i)
    return np.array(indices_neg), np.array(indices_pos), indices_not_used


def diff_images(cube_pos, cube_neg, rint, rext, opt_method="lsq",
                variance_pos=None, variance_neg=None, verbose=False):
    """Optimized difference of two image stacks
    (reference andromeda.py:1065-1185); gamma factors vectorized."""
    nimg, npix, _ = cube_pos.shape
    gamma = np.zeros(nimg)
    gamma_prime = np.zeros(nimg)

    distarray = dist_matrix(npix)
    annulus = (distarray > rint) & (distarray <= rext)

    if opt_method in ["no", 1, OptMethod.NO]:
        print("    DIFF_IMAGES: no optimisation is being performed. Note "
              "that keywords rint and rext will be ignored.")
        gamma += 1
    else:
        if verbose:
            print("  DIFF_IMAGES: optimization annulus limits: "
                  "{:.1f} -> {:.1f}".format(rint, rext))
        ann_pos = cube_pos[:, annulus]      # (nimg, n_annulus)
        ann_neg = cube_neg[:, annulus]
        if opt_method in ["total", 2, OptMethod.TOTAL]:
            gamma = ann_pos.sum(axis=1) / ann_neg.sum(axis=1)
        elif opt_method in ["lsq", 3, OptMethod.LSQ]:
            gamma = (ann_pos * ann_neg).sum(axis=1) / (ann_neg**2).sum(axis=1)
        elif opt_method in ["l1", 4, OptMethod.L1]:
            for i in range(nimg):
                gamma[i], gamma_prime[i] = fitaffine(y=ann_pos[i],
                                                     x=ann_neg[i])
        else:
            raise ValueError("opt_method '{}' unknown".format(opt_method))

    if verbose:
        print("    DIFF_IMAGES: median gamma={:.3f}, median gamma_prime"
              "={:.3f}".format(np.median(gamma), np.median(gamma_prime)))
    cube_diff = cube_pos - cube_neg * gamma[:, None, None] \
        - gamma_prime[:, None, None]
    return cube_diff, gamma, gamma_prime


def normalize_snr(snr, nsmooth_snr=1, iwa=None, owa=None, oversampling=None,
                  fast=None, fit=False, show=False):
    """Normalize an SNR map by its radial robust std profile
    (reference andromeda.py:1188-1365)."""
    nsnr = snr.shape[1]
    xcen = ycen = (nsnr - 1) / 2

    prof_snr = couronne_img(image=snr, xcen=xcen, ycen=ycen, verbose=False)

    it_nosmoo = np.zeros(nsnr // 2)
    it_robust = np.zeros(nsnr // 2)
    imaz_robust = np.zeros_like(snr)

    if owa is None or oversampling is None:
        dmax = nsnr // 2
    else:
        dmax = int(np.ceil(owa * 2 * oversampling))
        if dmax > nsnr / 2:
            dmax = nsnr // 2

    if iwa is None or oversampling is None:
        for dm in range(nsnr // 2):
            dmin = dm
            if snr[int(xcen + dm), int(ycen)] != 0:
                break
    else:
        dmin = int(np.round(iwa * 2 * oversampling))

    tempo = dist_matrix(nsnr, xcen, ycen)

    j = 0
    for i in range(dmin, dmax):
        if prof_snr[i] != 0:
            id1 = (tempo >= i) & (tempo <= i + nsmooth_snr)
            id2 = (tempo >= i - 0.5) & (tempo <= i + 0.5)
            id3 = (tempo >= i) & (tempo <= i + 1)
            it_nosmoo[i] = robust_std(snr[id3])
            it_robust[i] = robust_std(snr[id1])
            if nsmooth_snr == 0:
                imaz_robust[id3] = it_nosmoo[i]
            else:
                imaz_robust[id2] = it_robust[i]
        else:
            j = i
            break

    dfast = 450  # [px] for SPHERE-IRDIS data (reference andromeda.py:1301)
    dnozero = snr[int(ycen), int(xcen):].nonzero()[0][-1].item()

    if dnozero == dmax:
        id5 = (tempo >= (dnozero - nsmooth_snr - 1)) & (tempo <= nsnr / 2 - 1)
        for i in range(dnozero - nsmooth_snr - 1, nsnr // 2):
            it_robust[i] = robust_std(snr[id5])
            imaz_robust[id5] = it_robust[i]
    else:
        if fast and (dnozero >= dfast):
            for i in range(dfast - nsmooth_snr - 1, nsnr // 2):
                id3 = (tempo >= i) & (tempo <= i + 1)
                it_robust[i] = it_robust[dnozero - nsmooth_snr - 1]
                imaz_robust[id3] = it_robust[dnozero - nsmooth_snr - 1]
        else:
            k = None
            for i in range(j - nsmooth_snr, dnozero):
                if prof_snr[i] != 0:
                    k = i
            if k is None:
                raise RuntimeError("prof_snr is zero!")
            for i in range(j - nsmooth_snr, k):
                id1 = (tempo >= i) & (tempo <= dnozero)
                id2 = (tempo >= i - 0.5) & (tempo <= i + 0.5)
                id3 = (tempo >= i) & (tempo <= i + 1)
                id4 = (tempo >= i) & (tempo <= k)
                if id3.sum() > 0:
                    it_nosmoo[i] = robust_std(snr[id3])
                if id4.sum() > 0:
                    it_robust[i] = robust_std(snr[id4])
                if nsmooth_snr == 0:
                    imaz_robust[id3] = it_nosmoo[i]
                else:
                    imaz_robust[id2] = it_robust[i]

    if fit:
        raise NotImplementedError("`fit` parameter is not implemented!")
    if show:
        raise NotImplementedError("`show` parameter is not implemented!")

    snr_norm = np.zeros((nsnr, nsnr))
    zone = imaz_robust != 0
    snr_norm[zone] = snr[zone] / imaz_robust[zone]
    return snr_norm, imaz_robust


def couronne_img(image, xcen, ycen=None, lieu=None, step=0.5, rmax=None,
                 verbose=False):
    """Mean intensity radial profile (reference andromeda.py:1368-1441)."""
    if image.shape[0] != image.shape[1]:
        raise ValueError("`image` should be square")
    if ycen is None:
        ycen = xcen
    if rmax is None:
        rmax = image.shape[0] // 2
    if lieu is None:
        lieu = np.ones_like(image, dtype=bool)

    intenmoy = np.zeros(rmax + 1)
    intenmoy[0] = image[int(ycen), int(xcen)]
    tempo = dist_matrix(image.shape[0], xcen, ycen)
    for i in range(1, rmax + 1):
        mask = (np.abs(tempo - i) <= step) & lieu
        if mask.sum() > 0:
            intenmoy[i] = np.mean(image[mask])
    return intenmoy
