"""Completeness-based contrast curves and maps ([DAH21b], [JEN18]).

TPU rebuild of vip_hci/metrics/completeness.py. Control flow (bisection on
injected-companion detectability against the first false positive of the
empty SNR map) mirrors the reference; each SNR evaluation reuses the
device-batched psfsub + snr engines.
"""

from inspect import getfullargspec

import numpy as np

from ..config.utils_conf import pool_map, iterable
from ..fm.fakecomp import cube_inject_companions, normalize_psf
from ..fm.utils_negfc import find_nearest
from ..metrics.contrcurve import contrast_curve
from ..metrics.snr_source import snrmap, snr, _snrmap_approx
from ..preproc.cosmetics import cube_crop_frames
from ..var.coords import frame_center
from ..var.shapes import get_annulus_segments

__all__ = ["completeness_curve", "completeness_map"]


def _algo_args(algo):
    """Resolve the argument list of a psfsub algo, looking at its *_Params
    dataclass when the function takes packed args
    (reference completeness.py:92-115)."""
    argl = getfullargspec(algo).args
    if "cube" in argl and "angle_list" in argl and "verbose" in argl:
        return argl
    algo_name = algo.__name__
    idx = algo.__module__.index(".", algo.__module__.index(".") + 1)
    mod = algo.__module__[:idx]
    tmp = __import__(mod, fromlist=[algo_name.upper() + "_Params"])
    algo_params = getattr(tmp, algo_name.upper() + "_Params")
    argl = [attr for attr in vars(algo_params)]
    if "cube" in argl and "angle_list" in argl and "verbose" in argl:
        return argl
    raise TypeError("Ineligible algo for contrast curve function. algo "
                    "should have parameters 'cube', 'angle_list' and "
                    "'verbose'")


def _estimate_snr_fc(a, b, level, n_fc, cube, psf, angle_list, fwhm, algo,
                     algo_dict, snrmap_empty, starphot=1, approximated=True):
    """Inject one fake companion at (r=a, theta=b/n_fc*360) and return
    (max SNR at target - max SNR elsewhere, b)
    (reference completeness.py:52-164)."""
    cubefc = cube_inject_companions(cube, psf, angle_list,
                                    flevel=level * starphot, plsc=0.1,
                                    rad_dists=a, theta=b / n_fc * 360,
                                    n_branches=1, verbose=False)
    if isinstance(fwhm, (np.ndarray, list)):
        fwhm_med = np.median(fwhm)
    else:
        fwhm_med = fwhm

    if cube.ndim == 4:
        cy, cx = frame_center(cube[0, 0, :, :])
    else:
        cy, cx = frame_center(cube[0])

    argl = _algo_args(algo)
    algo_dict = dict(algo_dict)
    if "verbose" in argl:
        algo_dict["verbose"] = False
    if "fwhm" in argl:
        algo_dict["fwhm"] = fwhm_med

    if "radius_int" in argl:
        if algo_dict.get("asize") is None:
            annulus_width = int(np.ceil(fwhm))
        else:
            annulus_width = algo_dict.get("asize")
        if a > 2 * annulus_width:
            n_annuli = 5
            radius_int = (a // annulus_width - 2) * annulus_width
        else:
            n_annuli = 4
            radius_int = (a // annulus_width - 1) * annulus_width
        if 2 * (radius_int + n_annuli * annulus_width) < cube.shape[-1]:
            cubefc_crop = cube_crop_frames(
                cubefc, int(2 * (radius_int + n_annuli * annulus_width)),
                xy=(cx, cy), verbose=False)
        else:
            cubefc_crop = cubefc
        frame_temp = algo(cube=cubefc_crop, angle_list=angle_list,
                          radius_int=radius_int, **algo_dict)
        frame_fin = np.zeros((cube.shape[-2], cube.shape[-1]))
        indices = get_annulus_segments(
            frame_fin, 0, radius_int + n_annuli * annulus_width, 1)
        sub = (frame_fin.shape[0] - frame_temp.shape[0]) // 2
        frame_fin[indices[0][0], indices[0][1]] = frame_temp[
            indices[0][0] - sub, indices[0][1] - sub]
    else:
        frame_fin = algo(cube=cubefc, angle_list=angle_list, **algo_dict)

    frame_fin = np.array(frame_fin)
    snrmap_temp = np.zeros_like(frame_fin)
    cy, cx = frame_center(frame_fin)
    if "radius_int" in argl:
        mask = get_annulus_segments(frame_fin, a - (fwhm_med // 2),
                                    fwhm_med + 1, mode="mask")[0]
    else:
        width = min(frame_fin.shape) / 2 - 1.5 * fwhm_med
        mask = get_annulus_segments(frame_fin, (fwhm_med / 2) + 2, width,
                                    mode="mask")[0]
    bmask = np.ma.make_mask(mask, shrink=False)
    yy, xx = np.where(bmask)

    if approximated:
        snrmap_temp[yy, xx] = _snrmap_approx(frame_fin, yy, xx, fwhm_med,
                                             cy, cx, frame_fin.shape[0],
                                             frame_fin.shape[1])
    else:
        for (y0, x0) in zip(yy, xx):
            res = snr(frame_fin, (x0, y0), fwhm_med, plot=False,
                      exclude_negative_lobes=True, full_output=True,
                      verbose=False)
            snrmap_temp[y0, x0] = res[-1]

    snrmap_fin = np.where(
        abs(np.nan_to_num(snrmap_temp)) > 0.000001, 0, snrmap_empty
    ) + np.nan_to_num(snrmap_temp)

    y, x = frame_fin.shape
    twopi = 2 * np.pi
    sigposy = int(y / 2 + np.sin(b / n_fc * twopi) * a)
    sigposx = int(x / 2 + np.cos(b / n_fc * twopi) * a)

    dy = np.arange(y)[:, None] - sigposy
    dx = np.arange(x)[None, :] - sigposx
    indc = np.where(dy**2 + dx**2 < 4**2)
    max_target = np.nan_to_num(snrmap_fin[indc[0], indc[1]]).max()
    snrmap_fin[indc[0], indc[1]] = 0
    max_map = np.nan_to_num(snrmap_fin).max()
    return max_target - max_map, b


def _run_batch(nproc, a, bs, level, n_fc, cube, psf, angle_list, fwhm, algo,
               algo_dict, snrmap_empty, starphot, approximated):
    """Evaluate _estimate_snr_fc for a list of position indices."""
    return pool_map(nproc, _estimate_snr_fc, a, iterable(bs), level, n_fc,
                    cube, psf, angle_list, fwhm, algo, algo_dict,
                    snrmap_empty, starphot, approximated=approximated)


def _empty_snrmap(cube, angle_list, fwhm_med, fwhm, algo, algo_dict, nproc,
                  snr_approximation):
    """Post-process the empty cube and compute its SNR map."""
    argl = _algo_args(algo)
    if "cube" in argl and "angle_list" in argl:
        if "fwhm" in argl:
            frame_fin = algo(cube=cube, angle_list=angle_list,
                             fwhm=fwhm_med, verbose=False, **algo_dict)
        else:
            frame_fin = algo(cube=cube, angle_list=angle_list,
                             verbose=False, **algo_dict)
    else:
        raise ValueError("'cube' and 'angle_list' must be arguments of algo")
    return snrmap(np.array(frame_fin), fwhm_med,
                  approximated=snr_approximation, plot=False,
                  known_sources=None, nproc=nproc, array2=None,
                  use2alone=False, exclude_negative_lobes=False,
                  verbose=False)


def completeness_curve(cube, angle_list, psf, fwhm, algo, an_dist=None,
                       ini_contrast=None, starphot=1, pxscale=0.1, n_fc=20,
                       completeness=0.95, snr_approximation=True,
                       max_iter=50, nproc=1, algo_dict={}, verbose=True,
                       plot=False, dpi=100, save_plot=None, object_name=None,
                       fix_y_lim=(), figsize=(8, 5), algo_class=None):
    """Completeness-based contrast curve (reference completeness.py:219-755).

    Returns (an_dist, cont_curve).
    """
    angle_list = np.asarray(angle_list)
    if cube.ndim == 3 and (cube.shape[0] != angle_list.shape[0]):
        raise TypeError("Input parallactic angles vector has wrong length")
    if cube.ndim == 4 and (cube.shape[1] != angle_list.shape[0]):
        raise TypeError("Input parallactic angles vector has wrong length")
    if cube.ndim == 3 and psf.ndim != 2:
        raise TypeError("Template PSF is not a frame (for ADI case)")
    if cube.ndim == 4 and psf.ndim != 3:
        raise TypeError("Template PSF is not a cube (for ADI+IFS case)")
    if nproc is None:
        nproc = 1

    if isinstance(fwhm, (np.ndarray, list)):
        fwhm_med = np.median(fwhm)
    else:
        fwhm_med = fwhm

    if an_dist is None:
        an_dist = np.array(range(2 * round(fwhm_med),
                                 int(cube.shape[-1] // 2 - 2 * fwhm_med), 5))
        print("an_dist not provided, the following list will be used:",
              an_dist)
    elif an_dist[-1] > cube.shape[-1] // 2 - 2 * fwhm_med:
        raise TypeError("Please decrease the maximum annular distance")

    if ini_contrast is None:
        print("Contrast curve not provided => will be computed first...")
        ini_cc = contrast_curve(cube, angle_list, psf, fwhm_med, pxscale,
                                starphot, algo, sigma=3, nbranch=1, theta=0,
                                inner_rad=1, wedge=(0, 360), fc_snr=100,
                                plot=False, **algo_dict)
        ini_rads = np.array(ini_cc["distance"])
        ini_cc = np.array(ini_cc["sensitivity_student"])
        if np.amax(an_dist) > np.amax(ini_rads):
            raise ValueError("Max requested annular distance larger than "
                             "covered by contrast curve. Please decrease "
                             "the maximum annular distance")
        ini_contrast = [ini_cc[find_nearest(ini_rads, ad)]
                        for ad in an_dist]

    if verbose:
        print("Calculating initial SNR map with no injected companion...")
    snrmap_empty = _empty_snrmap(cube, angle_list, fwhm_med, fwhm, algo,
                                 algo_dict, nproc, snr_approximation)

    cont_curve = np.zeros((len(an_dist)))
    new_psf_size = int(round(3 * fwhm_med))
    if new_psf_size % 2 == 0:
        new_psf_size += 1
    psf = normalize_psf(psf, fwhm=fwhm, verbose=False,
                        size=min(new_psf_size, psf.shape[1]))

    err_msg = ("Could not converge on a contrast level matching required "
               "completeness within {} iterations. Tested level: {}. Is "
               "there too much self-subtraction? Consider decreasing ncomp "
               "if using PCA, or increasing minimum requested radius.")

    for k in range(len(an_dist)):
        a = an_dist[k]
        level = ini_contrast[k]
        pos_detect = []
        detect_bound = [None, None]
        level_bound = [None, None]
        ii = 0
        if verbose:
            print("*** Calculating contrast at r = {} ***".format(a))

        pos_non_detect_temp = pos_detect_temp = None
        val_non_detect_temp = val_detect_temp = None

        while len(pos_detect) == 0 and ii < max_iter:
            pos_detect, pos_non_detect = [], []
            val_detect, val_non_detect = [], []
            res = _run_batch(nproc, a, range(0, n_fc), level, n_fc, cube,
                             psf, angle_list, fwhm, algo, algo_dict,
                             snrmap_empty, starphot, snr_approximation)
            for res_i in res:
                if res_i[0] > 0:
                    pos_detect.append(res_i[1])
                    val_detect.append(res_i[0])
                else:
                    pos_non_detect.append(res_i[1])
                    val_non_detect.append(res_i[0])
            if len(pos_detect) == 0:
                level = level * 1.5
            ii += 1

        if verbose:
            print("Found contrast level for first TP detection: "
                  "{}".format(level))
        if ii == max_iter:
            raise ValueError(err_msg.format(max_iter, level))

        if len(pos_detect) > round(completeness * n_fc):
            detect_bound[1] = len(pos_detect)
            level_bound[1] = level
        elif len(pos_detect) < round(completeness * n_fc):
            detect_bound[0] = len(pos_detect)
            level_bound[0] = level
            pos_non_detect_temp = pos_non_detect.copy()
            val_non_detect_temp = val_non_detect.copy()
            pos_detect_temp = pos_detect.copy()
            val_detect_temp = val_detect.copy()

        cond1 = detect_bound[0] is None or detect_bound[1] is None
        cond2 = len(pos_detect) != round(completeness * n_fc)
        ii = 0
        while cond1 and cond2 and ii < max_iter:
            if detect_bound[0] is None:
                level = level * 0.5
                pos_detect, pos_non_detect = [], []
                val_detect, val_non_detect = [], []
                res = _run_batch(nproc, a, range(0, n_fc), level, n_fc,
                                 cube, psf, angle_list, fwhm, algo,
                                 algo_dict, snrmap_empty, starphot,
                                 snr_approximation)
                for res_i in res:
                    if res_i[0] > 0:
                        pos_detect.append(res_i[1])
                        val_detect.append(res_i[0])
                    else:
                        pos_non_detect.append(res_i[1])
                        val_non_detect.append(res_i[0])
                comp_temp = round(completeness * n_fc)
                if len(pos_detect) > comp_temp and level_bound[1] > level:
                    detect_bound[1] = len(pos_detect)
                    level_bound[1] = level
                elif len(pos_detect) < comp_temp:
                    detect_bound[0] = len(pos_detect)
                    level_bound[0] = level
                    pos_non_detect_temp = pos_non_detect.copy()
                    val_non_detect_temp = val_non_detect.copy()
                    pos_detect_temp = pos_detect.copy()
                    val_detect_temp = val_detect.copy()
            elif detect_bound[1] is None:
                level = level * 1.5
                res = _run_batch(nproc, a,
                                 -np.sort(-np.array(pos_non_detect)), level,
                                 n_fc, cube, psf, angle_list, fwhm, algo,
                                 algo_dict, snrmap_empty, starphot,
                                 snr_approximation)
                it = len(pos_non_detect) - 1
                for res_i in res:
                    if res_i[0] > 0:
                        pos_detect.append(res_i[1])
                        val_detect.append(res_i[0])
                        del pos_non_detect[it]
                        del val_non_detect[it]
                    it -= 1
                comp_temp = round(completeness * n_fc)
                if len(pos_detect) > comp_temp:
                    detect_bound[1] = len(pos_detect)
                    level_bound[1] = level
                elif len(pos_detect) < comp_temp and level_bound[0] < level:
                    detect_bound[0] = len(pos_detect)
                    level_bound[0] = level
                    pos_non_detect_temp = pos_non_detect.copy()
                    val_non_detect_temp = val_non_detect.copy()
                    pos_detect_temp = pos_detect.copy()
                    val_detect_temp = val_detect.copy()
            cond1 = detect_bound[0] is None or detect_bound[1] is None
            cond2 = len(pos_detect) != round(completeness * n_fc)
            ii += 1

        if verbose:
            print("Found lower and upper bounds of sought contrast: "
                  "{}".format(level_bound))
        if ii == max_iter:
            raise ValueError(err_msg.format(max_iter, level))

        if len(pos_detect) != round(completeness * n_fc):
            pos_non_detect = pos_non_detect_temp.copy()
            val_non_detect = val_non_detect_temp.copy()
            pos_detect = pos_detect_temp.copy()
            val_detect = val_detect_temp.copy()

        ii = 0
        while len(pos_detect) != round(completeness * n_fc) \
                and ii < max_iter:
            fact = (level_bound[1] - level_bound[0]) / (detect_bound[1] -
                                                        detect_bound[0])
            level = level_bound[0] + fact * (completeness * n_fc -
                                             detect_bound[0])
            res = _run_batch(nproc, a, -np.sort(-np.array(pos_non_detect)),
                             level, n_fc, cube, psf, angle_list, fwhm, algo,
                             algo_dict, snrmap_empty, starphot,
                             snr_approximation)
            it = len(pos_non_detect) - 1
            for res_i in res:
                if res_i[0] > 0:
                    pos_detect.append(res_i[1])
                    val_detect.append(res_i[0])
                    del pos_non_detect[it]
                    del val_non_detect[it]
                it -= 1
            comp_temp = round(completeness * n_fc)
            if len(pos_detect) > comp_temp:
                detect_bound[1] = len(pos_detect)
                level_bound[1] = level
            elif len(pos_detect) < comp_temp and level_bound[0] < level:
                detect_bound[0] = len(pos_detect)
                level_bound[0] = level
                pos_non_detect_temp = pos_non_detect.copy()
                val_non_detect_temp = val_non_detect.copy()
                pos_detect_temp = pos_detect.copy()
                val_detect_temp = val_detect.copy()
            if len(pos_detect) != comp_temp:
                pos_non_detect = pos_non_detect_temp.copy()
                val_non_detect = val_non_detect_temp.copy()
                pos_detect = pos_detect_temp.copy()
                val_detect = val_detect_temp.copy()
            ii += 1

        if ii == max_iter:
            raise ValueError(err_msg.format(max_iter, level))
        if verbose:
            print("=> found final contrast for {}% completeness: "
                  "{}".format(completeness * 100, level))
        cont_curve[k] = level

    if plot:
        import matplotlib.pyplot as plt
        an_dist_arcsec = np.asarray(an_dist) * pxscale
        fig = plt.figure(figsize=figsize, dpi=dpi)
        ax1 = fig.add_subplot(111)
        ax1.plot(an_dist_arcsec, cont_curve, "-", alpha=0.2, lw=2,
                 color="green")
        ax1.plot(an_dist_arcsec, cont_curve, ".", alpha=0.2, color="green")
        plt.xlabel("Angular separation [arcsec]")
        plt.ylabel(str(int(completeness * 100)) + "% completeness contrast")
        plt.grid("on", which="both", alpha=0.2, linestyle="solid")
        ax1.set_yscale("log")
        ax1.set_xlim(0, 1.1 * np.max(an_dist_arcsec))
        if save_plot is not None:
            fig.savefig(save_plot, dpi=dpi)

    return an_dist, cont_curve


def completeness_map(cube, angle_list, psf, fwhm, algo, an_dist,
                     ini_contrast, starphot=1, n_fc=20,
                     snr_approximation=True, nproc=1, algo_dict={},
                     verbose=True, algo_class=None):
    """2-d completeness map: contrast vs radius for every completeness level
    (reference completeness.py:758-1208).

    Returns (an_dist, comp_levels, contrast_matrix[:, 1:-1]).
    """
    angle_list = np.asarray(angle_list)
    if cube.ndim == 3 and (cube.shape[0] != angle_list.shape[0]):
        raise TypeError("Input parallactic angles vector has wrong length")
    if cube.ndim == 4 and (cube.shape[1] != angle_list.shape[0]):
        raise TypeError("Input parallactic angles vector has wrong length")
    if cube.ndim == 3 and psf.ndim != 2:
        raise TypeError("Template PSF is not a frame (for ADI case)")
    if cube.ndim == 4 and psf.ndim != 3:
        raise TypeError("Template PSF is not a cube (for ADI+IFS case)")
    if nproc is None:
        nproc = 1

    if isinstance(fwhm, (np.ndarray, list)):
        fwhm_med = np.median(fwhm)
    else:
        fwhm_med = fwhm

    new_psf_size = int(round(3 * fwhm_med))
    if new_psf_size % 2 == 0:
        new_psf_size += 1
    psf = normalize_psf(psf, fwhm=fwhm, verbose=False,
                        size=min(new_psf_size, psf.shape[1]))

    if ini_contrast is None:
        print("Contrast curve not provided => will be computed first...")
        ini_cc = contrast_curve(cube, angle_list, psf, fwhm_med, pxscale=0.1,
                                starphot=starphot, algo=algo, sigma=3,
                                plot=False, **algo_dict)
        ini_rads = np.array(ini_cc["distance"])
        ini_cc = np.array(ini_cc["sensitivity_student"])
        if np.amax(an_dist) > np.amax(ini_rads):
            raise ValueError("Max requested annular distance larger than "
                             "covered by contrast curve. Please decrease "
                             "the maximum annular distance")
        ini_contrast = [ini_cc[find_nearest(ini_rads, ad)]
                        for ad in an_dist]

    snrmap_empty = _empty_snrmap(cube, angle_list, fwhm_med, fwhm, algo,
                                 algo_dict, nproc, snr_approximation)

    contrast_matrix = np.zeros((len(an_dist), n_fc + 1))
    detect_pos_matrix = [[]] * (n_fc + 1)

    for k in range(len(an_dist)):
        a = an_dist[k]
        level = ini_contrast[k]
        pos_detect = []
        det_bound = [None, None]
        lvl_bound = [None, None]
        print("Starting annulus " + "{}".format(a))

        while len(pos_detect) == 0:
            pos_detect, pos_non_detect = [], []
            res = _run_batch(nproc, a, range(0, n_fc), level, n_fc, cube,
                             psf, angle_list, fwhm, algo, algo_dict,
                             snrmap_empty, starphot, snr_approximation)
            for res_i in res:
                if res_i[0] > 0:
                    pos_detect.append(res_i[1])
                else:
                    pos_non_detect.append(res_i[1])
            contrast_matrix[k, len(pos_detect)] = level
            detect_pos_matrix[len(pos_detect)] = [
                list(pos_detect.copy()), list(pos_non_detect.copy())]
            if len(pos_detect) == 0:
                level = level * 1.5

        while contrast_matrix[k, 0] == 0:
            level = level * 0.75
            res = _run_batch(nproc, a, -np.sort(-np.array(pos_detect)),
                             level, n_fc, cube, psf, angle_list, fwhm, algo,
                             algo_dict, snrmap_empty, starphot,
                             snr_approximation)
            it = len(pos_detect) - 1
            for res_i in res:
                if res_i[0] < 0:
                    pos_non_detect.append(res_i[1])
                    del pos_detect[it]
                it -= 1
            contrast_matrix[k, len(pos_detect)] = level
            detect_pos_matrix[len(pos_detect)] = [
                list(pos_detect.copy()), list(pos_non_detect.copy())]

        if verbose:
            print("Lower bound ({:.0f}%) found: {}".format(100 / n_fc,
                                                           level))
        level = contrast_matrix[k, np.where(contrast_matrix[k, :] > 0)
                                [0][-1]]
        pos_detect = []
        pos_non_detect = list(np.arange(0, n_fc))

        while contrast_matrix[k, n_fc] == 0:
            level = level * 1.25
            res = _run_batch(nproc, a, -np.sort(-np.array(pos_non_detect)),
                             level, n_fc, cube, psf, angle_list, fwhm, algo,
                             algo_dict, snrmap_empty, starphot,
                             snr_approximation)
            it = len(pos_non_detect) - 1
            for res_i in res:
                if res_i[0] > 0:
                    pos_detect.append(res_i[1])
                    del pos_non_detect[it]
                it -= 1
            contrast_matrix[k, len(pos_detect)] = level
            detect_pos_matrix[len(pos_detect)] = [
                list(pos_detect.copy()), list(pos_non_detect.copy())]

        if verbose:
            print("Upper bound ({:.0f}%) found: {}".format(
                100 * (n_fc - 1) / n_fc, level))

        missing = np.where(contrast_matrix[k, :] == 0)[0]
        computed = np.where(contrast_matrix[k, :] > 0)[0]
        while len(missing) > 0:
            pos_temp = np.argmax(
                (computed - missing[0])[computed < missing[0]])
            det_bound[0] = computed[pos_temp]
            lvl_bound[0] = contrast_matrix[k, det_bound[0]]
            sort_temp = np.sort((missing[0] - computed))
            sort_temp = sort_temp[np.sort((missing[0] - computed)) < 0]
            det_bound[1] = -np.sort(-computed)[np.argmax(sort_temp)]
            lvl_bound[1] = contrast_matrix[k, det_bound[1]]
            it = 0
            while len(pos_detect) != missing[0]:
                if np.argmin([len(detect_pos_matrix[det_bound[1]][0]),
                              len(detect_pos_matrix[det_bound[0]][1])]) == 0:
                    pos_detect = list(np.sort(
                        detect_pos_matrix[det_bound[1]][0]))
                    pos_non_detect = list(np.sort(
                        detect_pos_matrix[det_bound[1]][1]))
                    num = lvl_bound[1] - lvl_bound[0]
                    denom = det_bound[1] - det_bound[0]
                    level = lvl_bound[1] + num * (missing[0] -
                                                  det_bound[1]) / denom
                    res = _run_batch(nproc, a,
                                     -np.sort(-np.array(pos_detect)), level,
                                     n_fc, cube, psf, angle_list, fwhm,
                                     algo, algo_dict, snrmap_empty,
                                     starphot, snr_approximation)
                    it = len(pos_detect) - 1
                    for res_i in res:
                        if res_i[0] < 0:
                            pos_non_detect.append(res_i[1])
                            del pos_detect[it]
                        it -= 1
                else:
                    pos_detect = list(np.sort(
                        detect_pos_matrix[det_bound[0]][0]))
                    pos_non_detect = list(np.sort(
                        detect_pos_matrix[det_bound[0]][1]))
                    num = lvl_bound[1] - lvl_bound[0]
                    denom = det_bound[1] - det_bound[0]
                    level = lvl_bound[0] + num * (missing[0] -
                                                  det_bound[0]) / denom
                    res = _run_batch(nproc, a,
                                     -np.sort(-np.array(pos_non_detect)),
                                     level, n_fc, cube, psf, angle_list,
                                     fwhm, algo, algo_dict, snrmap_empty,
                                     starphot, snr_approximation)
                    it = len(pos_non_detect) - 1
                    for res_i in res:
                        if res_i[0] > 0:
                            pos_detect.append(res_i[1])
                            del pos_non_detect[it]
                        it -= 1

                if len(pos_detect) > missing[0]:
                    det_bound[1] = len(pos_detect)
                    lvl_bound[1] = level
                elif len(pos_detect) < missing[0] and lvl_bound[0] < level:
                    det_bound[0] = len(pos_detect)
                    lvl_bound[0] = level
                contrast_matrix[k, len(pos_detect)] = level
                detect_pos_matrix[len(pos_detect)] = [
                    list(pos_detect.copy()), list(pos_non_detect.copy())]
                if len(pos_detect) == missing[0]:
                    if verbose:
                        print("Data point "
                              + "{}".format(len(pos_detect) / n_fc)
                              + " found. Still "
                              + "{}".format(len(missing) - it - 1)
                              + " data point(s) missing")
            computed = np.where(contrast_matrix[k, :] > 0)[0]
            missing = np.where(contrast_matrix[k, :] == 0)[0]

    comp_levels = np.linspace(1 / n_fc, 1 - 1 / n_fc, n_fc - 1,
                              endpoint=True)
    return an_dist, comp_levels, contrast_matrix[:, 1:-1]
