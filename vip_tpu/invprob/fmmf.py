"""Forward Model Matched Filter (FMMF), KLIP or LOCI based.

TPU rebuild of vip_hci/invprob/fmmf.py ([RUF17], [DAH21a]). Same pipeline as
the reference: per-annulus KLIP/LOCI residuals, per-pixel forward models of
an injected unit companion (accounting for over-/self-subtraction), Gaussian
maximum-likelihood flux + SNR. The reference's per-KL-mode Python loop in
the KLIP perturbation (reference fmmf.py:583-687) is reformulated here as
dense matrix products (einsum) — the MXU-friendly form of the Pueyo (2016)
linearized KL perturbation.
"""

from dataclasses import dataclass, field
from enum import Enum

import numpy as np
import numpy.linalg as la

from ..config import time_ini, timing
from ..config.paramenum import ALGO_KEY, Imlib, Interpolation, VarEstim
from ..config.utils_param import separate_kwargs_dict
from ..fm.fakecomp import cube_inject_companions
from ..preproc.cosmetics import cube_crop_frames, frame_crop
from ..preproc.derotation import _find_indices_adi, cube_derotate
from ..var.coords import frame_center
from ..var.shapes import get_annulus_segments

__all__ = ["fmmf", "FMMF_Params"]


@dataclass
class FMMF_Params:
    """Parameters for the FMMF algorithm (reference fmmf.py:76-100)."""

    cube: np.ndarray = None
    angle_list: np.ndarray = None
    psf: np.ndarray = None
    fwhm: float = None
    min_r: int = None
    max_r: int = None
    model: str = "KLIP"
    var: Enum = VarEstim.FR
    param: dict = field(default_factory=lambda: {
        "ncomp": 20, "tolerance": 5e-3, "delta_rot": 0.5})
    crop: int = 5
    imlib: Enum = Imlib.VIPFFT
    interpolation: Enum = Interpolation.LANCZOS4
    nproc: int = 1
    verbose: bool = True


def fmmf(*all_args, **all_kwargs: dict):
    """FMMF detection map: (flux_matrix, snr_matrix)
    (reference fmmf.py:103-246)."""
    class_params, other_options = separate_kwargs_dict(
        initial_kwargs=all_kwargs, parent_class=FMMF_Params)
    algo_params = other_options.pop(ALGO_KEY, None)
    if algo_params is None:
        algo_params = FMMF_Params(*all_args, **class_params)
    p = algo_params
    start_time = time_ini(p.verbose)

    if p.crop >= 2 * round(p.fwhm) + 1:
        raise ValueError("Maximum cropsize should be lower or equal to two"
                         " FWHM,please change accordingly the value of "
                         "'crop'")
    if p.min_r is None:
        p.min_r = int(round(p.fwhm))
    if p.max_r is None:
        p.max_r = p.cube.shape[-1] // 2 - (p.crop // 2 + 1)

    flux_matrix = np.zeros((p.cube.shape[1], p.cube.shape[2]))
    snr_matrix = np.zeros((p.cube.shape[1], p.cube.shape[2]))

    for ann_center in range(p.min_r, p.max_r):
        res_temp = _snr_contrast_esti(
            ann_center, p.cube, p.angle_list, p.psf, p.fwhm, p.model, p.var,
            p.param, p.crop, p.imlib, p.interpolation, p.verbose)
        indices = get_annulus_segments(p.cube[0], res_temp[2], 1)
        flux_matrix[indices[0][0], indices[0][1]] = res_temp[0]
        snr_matrix[indices[0][0], indices[0][1]] = res_temp[1]

    if p.verbose:
        timing(start_time)
    return flux_matrix, snr_matrix


def _snr_contrast_esti(ann_center, cube, angle_list, psf, fwhm, model, var,
                       param, crop, imlib, interpolation, verbose):
    """SNR and contrast for every pixel of one annulus
    (reference fmmf.py:249-486)."""
    n, y, x = cube.shape

    evals_matrix = []
    evecs_matrix = []
    KL_basis_matrix = []
    refs_mean_sub_matrix = []
    sci_mean_sub_matrix = []
    ind_ref_list = None
    coef_list = None

    tolerance = param.get("tolerance", 5e-3)
    delta_rot = param.get("delta_rot", 0.5)
    ncomp = param.get("ncomp", 20)

    pa_threshold = np.rad2deg(2 * np.arctan(delta_rot * fwhm /
                                            (2 * ann_center)))
    mid_range = np.abs(np.amax(angle_list) - np.amin(angle_list)) / 2
    if pa_threshold >= mid_range - mid_range * 0.1:
        pa_threshold = float(mid_range - mid_range * 0.1)

    if model == "KLIP":
        resicube_klip = np.zeros_like(cube)
        indices = get_annulus_segments(
            cube[0], ann_center - int(round(fwhm) / 2), int(round(fwhm)), 1)
        for k in range(n):
            res_temp = KLIP_patch(k, cube[:, indices[0][0], indices[0][1]],
                                  ncomp, angle_list, int(round(fwhm)),
                                  pa_threshold, ann_center)
            resicube_klip[k, indices[0][0], indices[0][1]] = res_temp[3]
            evals_matrix.append(res_temp[0])
            evecs_matrix.append(res_temp[1])
            KL_basis_matrix.append(res_temp[2])
            refs_mean_sub_matrix.append(res_temp[4])
            sci_mean_sub_matrix.append(res_temp[5])
        mcube = cube_derotate(resicube_klip, angle_list, imlib=imlib,
                              interpolation=interpolation)
    elif model == "LOCI":
        resicube, ind_ref_list, coef_list = LOCI_FM(
            cube, psf, ann_center, angle_list, int(round(fwhm)), fwhm,
            tolerance, delta_rot, pa_threshold)
        mcube = cube_derotate(resicube, angle_list, imlib=imlib,
                              interpolation=interpolation)
    else:
        raise ValueError("model should be KLIP or LOCI")

    mcube = np.array(mcube)
    ceny, cenx = frame_center(cube[0])
    indices = get_annulus_segments(mcube[0], ann_center, 1, 1)
    indicesy = indices[0][0]
    indicesx = indices[0][1]

    flux_esti = np.zeros(indicesy.shape)
    prob_esti = np.zeros(indicesy.shape)

    var_f = _var_esti(mcube, angle_list, var, crop, ann_center)

    ann_ind = get_annulus_segments(
        cube[0], ann_center - int(round(fwhm) / 2), int(round(fwhm)), 1)

    if _fmmf_batched_enabled():
        return _pixels_fm_batched(
            ann_center, cube, angle_list, psf, fwhm, model, var,
            ncomp, pa_threshold, crop, imlib, interpolation, verbose,
            mcube, indicesy, indicesx, var_f, ann_ind, evals_matrix,
            evecs_matrix, KL_basis_matrix, refs_mean_sub_matrix,
            sci_mean_sub_matrix, ind_ref_list, coef_list)

    for i in range(len(indicesy)):
        poscenty = indicesy[i]
        poscentx = indicesx[i]

        an_dist = np.sqrt((poscenty - ceny)**2 + (poscentx - cenx)**2)
        theta = np.degrees(np.arctan2(poscenty - ceny, poscentx - cenx))

        model_matrix = cube_inject_companions(
            np.zeros_like(cube), psf, angle_list, flevel=1,
            rad_dists=an_dist, theta=theta, n_branches=1, verbose=False,
            imlib=imlib, interpolation=interpolation)

        if model == "KLIP":
            psf_map = np.zeros_like(model_matrix)
            for b in range(n):
                psf_map_temp = _perturb(
                    b, model_matrix[:, ann_ind[0][0], ann_ind[0][1]], ncomp,
                    evals_matrix, evecs_matrix, KL_basis_matrix,
                    sci_mean_sub_matrix, refs_mean_sub_matrix, angle_list,
                    fwhm, pa_threshold, ann_center)
                psf_map[b, ann_ind[0][0], ann_ind[0][1]] = \
                    psf_map_temp - np.mean(psf_map_temp)
            psf_map_der = cube_derotate(psf_map, angle_list, imlib=imlib,
                                        interpolation=interpolation)
            psfm_temp = cube_crop_frames(np.array(psf_map_der),
                                         int(2 * round(fwhm) + 1),
                                         xy=(poscentx, poscenty),
                                         verbose=False)
        else:  # LOCI
            values_fc = model_matrix[:, ann_ind[0][0], ann_ind[0][1]]
            cube_res_fc = np.zeros_like(model_matrix)
            matrix_res_fc = np.zeros((values_fc.shape[0],
                                      ann_ind[0][0].shape[0]))
            for e in range(values_fc.shape[0]):
                recon_fc = np.dot(coef_list[e], values_fc[ind_ref_list[e]])
                matrix_res_fc[e] = values_fc[e] - recon_fc
            cube_res_fc[:, ann_ind[0][0], ann_ind[0][1]] = matrix_res_fc
            cube_der_fc = cube_derotate(cube_res_fc - np.mean(cube_res_fc),
                                        angle_list, imlib=imlib,
                                        interpolation=interpolation)
            psfm_temp = cube_crop_frames(np.array(cube_der_fc),
                                         int(2 * round(fwhm) + 1),
                                         xy=(poscentx, poscenty),
                                         verbose=False)

        num = []
        denom = []
        for j in range(n):
            if var in ("FR", VarEstim.FR):
                svar = var_f[j]
            else:
                svar = var_f[i, j]
            if psfm_temp.shape[1] == crop:
                psfm = psfm_temp[j]
            else:
                psfm = frame_crop(psfm_temp[j], crop,
                                  xy=[int(psfm_temp.shape[-1] / 2),
                                      int(psfm_temp.shape[-1] / 2)],
                                  verbose=False)
            num.append(np.multiply(
                frame_crop(mcube[j], crop, xy=[poscentx, poscenty],
                           verbose=False), psfm).sum() / svar)
            denom.append(np.multiply(psfm, psfm).sum() / svar)

        flux_esti[i] = sum(num) / np.sqrt(sum(denom))
        prob_esti[i] = sum(num) / sum(denom)

    if verbose:
        print("Radial distance " + "{}".format(ann_center) + " done!")
    return prob_esti, flux_esti, ann_center


def _fmmf_batched_enabled():
    """Batched per-pixel engine on accelerators, serial loop on CPU.

    The rotation count is identical either way (P x n frame rotations);
    on CPU the serial loop wins (~35%) because its per-pixel dispatches
    overlap XLA's threadpool with host prep, while on TPU the batched
    form turns P x n tunnel dispatches into n batched ones and runs the
    perturbation algebra as large matmuls. VIP_TPU_FMMF_BATCHED=0/1
    forces either (the equality test pins batched == serial)."""
    import os

    import jax

    env = os.environ.get("VIP_TPU_FMMF_BATCHED")
    if env is not None:
        return env == "1"
    return jax.default_backend() not in ("cpu",)


def _pixels_fm_batched(ann_center, cube, angle_list, psf, fwhm, model, var,
                       ncomp, pa_threshold, crop, imlib, interpolation,
                       verbose, mcube, indicesy, indicesx, var_f, ann_ind,
                       evals_matrix, evecs_matrix, KL_basis_matrix,
                       refs_mean_sub_matrix, sci_mean_sub_matrix,
                       ind_ref_list, coef_list):
    """The per-pixel loop of :func:`_snr_contrast_esti`, batched.

    The serial form (mirroring reference fmmf.py:249-486) runs, for EVERY
    annulus pixel, n forward-model perturbations and n full-frame
    derotations — ~190 x 61 FFT rotations per annulus, the entire cost
    of FMMF. Here the loop nest is inverted: for each FRAME, the
    perturbation linear algebra runs as one batched matmul over all
    pixels and the derotation runs as ONE batched ``cube_derotate`` call
    (same per-frame kernel, so results are identical —
    tests/test_invprob_parity.py pins batched == serial). The
    injections, crops and KLIP/LOCI eigenbases go through the exact same
    host helpers as the serial path.
    """
    n, y, x = cube.shape
    P = len(indicesy)
    ceny, cenx = frame_center(cube[0])
    band_y, band_x = ann_ind[0][0], ann_ind[0][1]
    band = band_y.shape[0]
    cw = int(2 * round(fwhm) + 1)

    # --- unit-companion model matrices, band-restricted (host, cheap) ---
    models = np.empty((P, n, band))
    for i in range(P):
        an_dist = np.sqrt((indicesy[i] - ceny) ** 2 +
                          (indicesx[i] - cenx) ** 2)
        theta = np.degrees(np.arctan2(indicesy[i] - ceny,
                                      indicesx[i] - cenx))
        mm = cube_inject_companions(
            np.zeros_like(cube), psf, angle_list, flevel=1,
            rad_dists=an_dist, theta=theta, n_branches=1, verbose=False,
            imlib=imlib, interpolation=interpolation)
        models[i] = mm[:, band_y, band_x]

    if pa_threshold != 0:
        idx_lists = [_find_indices_adi(angle_list, j, pa_threshold,
                                       truncate=False) for j in range(n)]
    else:
        idx_lists = [np.arange(n) for _ in range(n)]

    import jax

    import jax.numpy as jnp

    # f32 on accelerators (the TPU-native precision of every other hot
    # path; f64 is software-emulated on TPU), input dtype on CPU
    dt = jnp.float32 if jax.default_backend() not in ("cpu",) \
        else jnp.asarray(models[:1, :1, :1]).dtype

    if model == "LOCI":
        # residual band values for ALL frames first: the global mean of
        # each pixel's model cube couples the frames
        res_fc = np.empty((P, n, band))
        for j in range(n):
            c = np.asarray(coef_list[j])
            refs = models[:, ind_ref_list[j], :]          # (P, K, band)
            res_fc[:, j] = models[:, j] - np.einsum("k,pkb->pb", c, refs)
        mean_fc = res_fc.reshape(P, -1).sum(axis=1) / (n * y * x)
        res_fc_d = jnp.asarray(res_fc, dt)
        mean_fc_d = jnp.asarray(mean_fc, dt)
    else:
        # zero-row-padded per-frame library stacks: padded rows are
        # exactly neutral (their per-row means are 0, they carry zero
        # V/refs rows, so every contraction ignores them)
        K_pad = max(len(i) for i in idx_lists)
        mbs = {KL_basis_matrix[j].shape[0] for j in range(n)}
        mb = max(mbs)
        idx_pad = np.zeros((n, K_pad), np.int32)
        refs_pad = np.zeros((n, K_pad, band))
        V_pad = np.zeros((n, K_pad, mb))
        KL_pad = np.zeros((n, mb, band))
        ev_pad = np.zeros((n, mb))
        sci_ms = np.zeros((n, band))
        for j in range(n):
            k = len(idx_lists[j])
            mbj = KL_basis_matrix[j].shape[0]
            idx_pad[j, :k] = idx_lists[j]
            refs_pad[j, :k] = refs_mean_sub_matrix[j]
            V_pad[j, :k, :mbj] = evecs_matrix[j][:, :mbj]
            KL_pad[j, :mbj] = KL_basis_matrix[j]
            # pad eigenvalues with distinct POSITIVE values above the
            # real spectrum: sqrt stays finite and the W divisor
            # (e_k - e_j) never hits 0 on padding; every padded
            # contribution is annihilated by the zero V/KL rows
            top = float(np.max(np.abs(evals_matrix[j][:mbj]))) + 1.0
            ev_pad[j] = top * np.arange(2.0, mb + 2)
            ev_pad[j, :mbj] = evals_matrix[j][:mbj]
            sci_ms[j] = sci_mean_sub_matrix[j]
        idx_pad_d = jnp.asarray(idx_pad)
        refs_d = jnp.asarray(refs_pad, dt)
        V_d = jnp.asarray(V_pad, dt)
        KL_d = jnp.asarray(KL_pad, dt)
        ev_d = jnp.asarray(ev_pad, dt)
        sci_d = jnp.asarray(sci_ms, dt)

    models_d = jnp.asarray(models, dt)                    # (P, n, band)
    bflat = jnp.asarray((band_y.astype(np.int64) * x
                         + band_x.astype(np.int64)).astype(np.int32))

    # crop windows replicating the serial path's exact get_square
    # arithmetic (cosmetics.frame_crop two-stage incl. the parity size
    # bumps of var/shapes.get_square — an odd crop on an even frame
    # grows by one and shifts, so direct centered windows are WRONG on
    # even frames)
    def _adjust(n_init, size):
        if n_init % 2 == 0 and size % 2 != 0:
            return size + 1
        if n_init % 2 != 0 and size % 2 == 0:
            return size + 1
        return size

    cw1 = _adjust(x, cw)
    wing1 = (cw1 - 1) / 2
    if cw1 == crop:
        i0, S = 0, cw1
    else:
        S = _adjust(cw1, crop)
        i0 = int(int(cw1 / 2) - (S - 1) / 2)
    cm = _adjust(x, crop)
    assert cm == S, (cm, S)
    wingm = (cm - 1) / 2
    sy = np.array([int(py - wing1) + i0 for py in indicesy])
    sx = np.array([int(px - wing1) + i0 for px in indicesx])
    my0 = np.array([int(py - wingm) for py in indicesy])
    mx0 = np.array([int(px - wingm) for px in indicesx])
    assert sy.min() >= 0 and sx.min() >= 0 and my0.min() >= 0
    assert sy.max() + S <= y and sx.max() + S <= x
    assert my0.max() + S <= y and mx0.max() + S <= x
    offs = (np.mgrid[0:S, 0:S][0] * x + np.mgrid[0:S, 0:S][1]).reshape(-1)
    win = jnp.asarray(((sy * x + sx)[:, None]
                       + offs[None, :]).astype(np.int32))
    mwin = jnp.asarray(((my0 * x + mx0)[:, None]
                        + offs[None, :]).astype(np.int32))
    mcube_d = jnp.asarray(mcube, dt).reshape(n, y * x)
    mc_all = jnp.take(mcube_d, mwin.reshape(-1), axis=1,
                      mode="clip").reshape(n, P, S * S)

    if var in ("FR", VarEstim.FR):
        svar_d = jnp.broadcast_to(jnp.asarray(var_f, dt)[None, :], (P, n))
    else:
        svar_d = jnp.asarray(var_f, dt)

    @jax.jit
    def _klip_band_vals(j, md, idxj, refsj, Vj, KLj, evj, scij):
        models_ref = jnp.take(md, idxj, axis=1)           # (P, K, band)
        m_mean = jnp.nanmean(models_ref, axis=2, keepdims=True)
        models_msub = jnp.nan_to_num(models_ref - m_mean)
        sci_m = jnp.nanmean(md[:, j, :], axis=1, keepdims=True)
        model_sci_msub = jnp.nan_to_num(md[:, j, :] - sci_m)

        proj = jnp.matmul(models_msub, refsj.T)           # (P, K, K)
        C = jnp.matmul(jnp.matmul(Vj.T, proj), Vj)        # (P, mb, mb)
        sqrt_e = jnp.sqrt(evj)
        de = evj[:, None] - evj[None, :]
        de = jnp.where(de == 0, 1e-300 if dt == jnp.float64 else 1e-30,
                       de)
        W = (sqrt_e[None, None, :] / de[None]) * (C + C.transpose(0, 2, 1))
        dg = jnp.arange(W.shape[-1])
        W = W.at[:, dg, dg].set(-C[:, dg, dg] / sqrt_e[None, :])
        delta_KL = (jnp.matmul(W, KLj)
                    + jnp.matmul(Vj.T, models_msub)) / sqrt_e[None, :,
                                                              None]
        ip_over = jnp.matmul(model_sci_msub, KLj.T)       # (P, mb)
        s1 = jnp.einsum("b,pmb->pm", scij, delta_KL)
        s2 = KLj @ scij
        oversub = jnp.matmul(ip_over, KLj)
        selfsub = jnp.matmul(s1, KLj) + jnp.einsum("m,pmb->pb", s2,
                                                   delta_KL)
        bv = md[:, j, :] - oversub - selfsub
        return bv - bv.mean(axis=1, keepdims=True)

    @jax.jit
    def _scatter_frames(bv_all, sub_all):
        fr = jnp.zeros((n * P, y * x), dt)
        fr = fr.at[:, bflat].set(bv_all.reshape(n * P, band))
        return (fr - sub_all.reshape(n * P)[:, None]).reshape(n * P, y, x)

    @jax.jit
    def _filter_all(rot):
        rt = jax.vmap(lambda r: jnp.take_along_axis(r, win, axis=1))(
            rot.reshape(n, P, y * x))                     # (n, P, S^2)
        num = jnp.einsum("npc,npc->pn", mc_all, rt) / svar_d
        den = jnp.einsum("npc,npc->pn", rt, rt) / svar_d
        return num, den

    if model == "KLIP":
        bv_all = jnp.stack([
            _klip_band_vals(j, models_d, idx_pad_d[j], refs_d[j],
                            V_d[j], KL_d[j], ev_d[j], sci_d[j])
            for j in range(n)])                           # (n, P, band)
        sub_all = jnp.zeros((n, P), dt)
    else:                                                 # LOCI
        bv_all = jnp.swapaxes(res_fc_d, 0, 1)             # (n, P, band)
        sub_all = jnp.broadcast_to(mean_fc_d[None, :], (n, P))

    frames_all = _scatter_frames(bv_all, sub_all)
    # one derotation dispatch for the whole annulus (n x P frames; the
    # device path lax.maps HBM-sized chunks inside a single program)
    rot = cube_derotate(frames_all, np.repeat(np.asarray(angle_list), P),
                        imlib=imlib, interpolation=interpolation)
    num_d, den_d = _filter_all(jnp.asarray(rot, dt))
    num = np.asarray(num_d, dtype=float)
    denom = np.asarray(den_d, dtype=float)

    flux_esti = num.sum(axis=1) / np.sqrt(denom.sum(axis=1))
    prob_esti = num.sum(axis=1) / denom.sum(axis=1)
    if verbose:
        print("Radial distance " + "{}".format(ann_center) + " done!")
    return prob_esti, flux_esti, ann_center


def _var_esti(mcube, angle_list, var, crop, ann_center):
    """Residual noise variance (FR / FM / TE models)
    (reference fmmf.py:489-580)."""
    n, y, x = mcube.shape

    if var in ("FR", VarEstim.FR):
        var_f = np.zeros(n)
        indices = get_annulus_segments(mcube[0], ann_center - int(crop / 2),
                                       crop, 1)
        for a in range(n):
            var_f[a] = np.var(mcube[a, indices[0][0], indices[0][1]])
    elif var in ("FM", VarEstim.FM):
        indices1 = get_annulus_segments(mcube[0], ann_center, 1, 1)
        indicesy = indices1[0][0]
        indicesx = indices1[0][1]
        var_f = np.zeros((len(indicesy), n))
        indices = get_annulus_segments(mcube[0], ann_center - int(crop / 2),
                                       crop, 1)
        for a in range(len(indicesy)):
            # exclude a disk of radius 3 around the considered pixel
            dy = indices[0][0] - indicesy[a]
            dx = indices[0][1] - indicesx[a]
            keep = dy**2 + dx**2 >= 3**2
            positiony = indices[0][0][keep]
            positionx = indices[0][1][keep]
            for b in range(n):
                var_f[a, b] = np.var(mcube[b, positiony, positionx])
    elif var in ("TE", VarEstim.TE):
        indices1 = get_annulus_segments(mcube[0], ann_center, 1, 1)
        indicesy = indices1[0][0]
        indicesx = indices1[0][1]
        var_f = np.zeros((len(indicesy), n))
        mcube_derot = np.array(cube_derotate(mcube, -angle_list))
        for a in range(len(indicesy)):
            radist = np.sqrt((indicesx[a] - int(x / 2))**2 +
                             (indicesy[a] - int(y / 2))**2)
            if (indicesy[a] - int(y / 2)) >= 0:
                ang_s = np.arccos((indicesx[a] - int(x / 2)) /
                                  radist) / np.pi * 180
            else:
                ang_s = 360 - np.arccos((indicesx[a] - int(x / 2)) /
                                        radist) / np.pi * 180
            for b in range(n):
                twopi = 2 * np.pi
                sigposy = int(y / 2 + np.sin((ang_s - angle_list[b]) /
                                             360 * twopi) * radist)
                sigposx = int(x / 2 + np.cos((ang_s - angle_list[b]) /
                                             360 * twopi) * radist)
                y0 = int(sigposy - int(crop / 2))
                y1 = int(sigposy + int(crop / 2) + 1)
                x0 = int(sigposx - int(crop / 2))
                x1 = int(sigposx + int(crop / 2) + 1)
                mask = np.ones(mcube_derot.shape[0], dtype=bool)
                mask[b] = False
                var_f[a, b] = np.var(np.asarray(
                    mcube_derot[mask, y0:y1, x0:x1]))
    else:
        raise ValueError("var estimation method not recognized")
    return var_f


def _perturb(frame, model_matrix, numbasis, evals_matrix, evecs_matrix,
             KL_basis_matrix, sci_mean_sub_matrix, refs_mean_sub_matrix,
             angle_list, fwhm, pa_threshold, ann_center):
    """Forward-modeled PSF under KLIP, Pueyo (2016) linearization
    (reference fmmf.py:583-687).

    The reference loops over KL modes k with nested j loops; here the
    same linear algebra is computed as dense matrix products:
    with C = evecs^T (models_msub refs_mean_sub^T) evecs,
    W[k,j] = sqrt(e_j)/(e_k-e_j) (C[k,j]+C[j,k]) for j != k and
    W[k,k] = -C[k,k]/sqrt(e_k), the KL perturbation is
    delta_KL = diag(1/sqrt(e)) (W KL_basis + evecs^T models_msub).
    """
    if pa_threshold != 0:
        indices_left = _find_indices_adi(angle_list, frame, pa_threshold,
                                         truncate=False)
        models_ref = model_matrix[indices_left]
    else:
        models_ref = model_matrix

    model_sci = model_matrix[frame]
    KL_basis = KL_basis_matrix[frame]
    sci_mean_sub = sci_mean_sub_matrix[frame]
    refs_mean_sub = refs_mean_sub_matrix[frame]
    evals = evals_matrix[frame]
    evecs = evecs_matrix[frame]

    max_basis = KL_basis.shape[0]
    N_pix = KL_basis.shape[1]

    models_msub = models_ref - np.nanmean(models_ref, axis=1)[:, None]
    models_msub[np.where(np.isnan(models_msub))] = 0
    model_sci_msub = model_sci - np.nanmean(model_sci)
    model_sci_msub[np.where(np.isnan(model_sci_msub))] = 0
    model_sci_msub_rows = np.reshape(model_sci_msub, (1, N_pix))
    sci_mean_sub_rows = np.reshape(sci_mean_sub, (1, N_pix))

    proj_models_T = models_msub.dot(refs_mean_sub.transpose())

    V = evecs[:, :max_basis]                       # (K, max_basis)
    C = V.T @ proj_models_T @ V                    # (max_basis, max_basis)
    sqrt_e = np.sqrt(evals[:max_basis])
    de = evals[:max_basis, None] - evals[None, :max_basis]
    with np.errstate(divide="ignore", invalid="ignore"):
        W = (sqrt_e[None, :] / de) * (C + C.T)
    np.fill_diagonal(W, -np.diag(C) / sqrt_e)
    delta_KL = (W @ KL_basis + V.T @ models_msub) / sqrt_e[:, None]

    oversubtraction_inner_products = np.dot(model_sci_msub_rows, KL_basis.T)
    selfsubtraction_1_inner_products = np.dot(sci_mean_sub_rows, delta_KL.T)
    selfsubtraction_2_inner_products = np.dot(sci_mean_sub_rows, KL_basis.T)

    klipped_oversub = np.dot(oversubtraction_inner_products, KL_basis)
    klipped_selfsub = (np.dot(selfsubtraction_1_inner_products, KL_basis) +
                       np.dot(selfsubtraction_2_inner_products, delta_KL))
    return (model_sci[None, :] - klipped_oversub - klipped_selfsub)[0]


def KLIP_patch(frame, matrix, numbasis, angle_list, fwhm, pa_threshold,
               ann_center, nframes=None):
    """KLIP reference PSF on one annulus patch for one frame
    (reference fmmf.py:690-771)."""
    max_frames_lib = 200

    if pa_threshold != 0:
        if ann_center > fwhm * 20:
            indices_left = _find_indices_adi(angle_list, frame, pa_threshold,
                                             truncate=True,
                                             max_frames=max_frames_lib)
        else:
            indices_left = _find_indices_adi(angle_list, frame, pa_threshold,
                                             truncate=False, nframes=nframes)
        if len(indices_left) == 0:
            raise ValueError("No frame index left matching pa threshold. "
                             "Reduce delta_rot.")
        refs = matrix[indices_left]
    else:
        refs = matrix

    sci = matrix[frame]
    sci_mean_sub = sci - np.nanmean(sci)
    refs_mean_sub = refs - np.nanmean(refs, axis=1)[:, None]

    covar_psfs = np.cov(refs_mean_sub)
    covar_psfs *= np.size(sci) - 1

    tot_basis = covar_psfs.shape[0]
    numbasis = np.clip(numbasis - 1, 0, tot_basis - 1)
    max_basis = np.max(numbasis) + 1

    evals, evecs = la.eigh(covar_psfs)
    evals = np.copy(evals[int(tot_basis - max_basis):int(tot_basis)])[::-1]
    evecs = np.copy(evecs[:, int(tot_basis - max_basis):int(tot_basis)]
                    [:, ::-1])

    KL_basis = np.dot(refs_mean_sub.T, evecs)
    KL_basis = (KL_basis * (1.0 / np.sqrt(evals))[None, :]).T

    N_pix = np.size(sci_mean_sub)
    sci_rows = np.reshape(sci_mean_sub, (1, N_pix))
    inner_products = np.dot(sci_rows, KL_basis.T)
    inner_products[0, int(max_basis):] = 0
    klip_reconstruction = np.dot(inner_products, KL_basis)
    sub_img_rows = sci_rows - klip_reconstruction

    return (evals, evecs, KL_basis, np.reshape(sub_img_rows, N_pix),
            refs_mean_sub, sci_mean_sub)


def LOCI_FM(cube, psf, ann_center, angle_list, asize, fwhm, Tol, delta_rot,
            pa_threshold):
    """LOCI residuals + the coefficients needed for forward modeling
    (reference fmmf.py:774-823)."""
    cube_res = np.zeros_like(cube)
    radius_int = ann_center - int(1.5 * asize)
    if radius_int <= 0:
        radius_int = 1

    ind_ref_list = None
    coef_list = None
    for ann in range(3):
        inner_radius_ann = radius_int + ann * asize
        indices = get_annulus_segments(cube[0],
                                       inner_radius=inner_radius_ann,
                                       width=asize, nsegm=1)
        ind_opt = get_annulus_segments(cube[0],
                                       inner_radius=inner_radius_ann,
                                       width=asize, nsegm=1,
                                       optim_scale_fact=2)
        ayxyx = [inner_radius_ann, pa_threshold, indices[0][0],
                 indices[0][1], ind_opt[0][0], ind_opt[0][1]]
        matrix_res, ind_ref, coef, yy, xx = _leastsq_patch_fm(
            ayxyx, angle_list, fwhm, cube, 100, Tol, psf=psf)
        if ann == 1:
            ind_ref_list = ind_ref
            coef_list = coef
        cube_res[:, yy, xx] = matrix_res
    return cube_res, ind_ref_list, coef_list


def _leastsq_patch_fm(ayxyx, angle_list, fwhm, cube, dist_threshold, tol,
                      psf=None):
    """LOCI least-squares coefficients for one annulus
    (reference fmmf.py:826-872)."""
    ann_center, pa_threshold, yy, xx, yy_opti, xx_opti = ayxyx

    ind_ref_list = []
    coef_list = []

    values = cube[:, yy, xx]
    matrix_res = np.zeros((values.shape[0], yy.shape[0]))
    values_opt = cube[:, yy_opti, xx_opti]
    n_frames = cube.shape[0]

    for i in range(n_frames):
        ind_fr_i = _find_indices_adi(angle_list, i, pa_threshold,
                                     truncate=False)
        if len(ind_fr_i) > 0:
            A = values_opt[ind_fr_i]
            b = values_opt[i]
            coef = np.linalg.lstsq(A.T, b, rcond=tol)[0]
        else:
            raise RuntimeError("No frames left in the reference set. Try "
                               "increasing `dist_threshold` or decreasing "
                               "`delta_rot`.")
        ind_ref_list.append(ind_fr_i)
        coef_list.append(coef)
        recon = np.dot(coef, values[ind_fr_i])
        matrix_res[i] = values[i] - recon
    return matrix_res, ind_ref_list, coef_list, yy, xx
