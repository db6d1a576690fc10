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
from ..metrics.snr_source import snrmap, snr_multi, _snrmap_approx
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


def _median_fwhm(fwhm):
    """Scalar FWHM: the median over IFS channels when a vector is given."""
    return np.median(fwhm) if isinstance(fwhm, (np.ndarray, list)) else fwhm


def _check_cube_psf(cube, angle_list, psf):
    """Shared input validation for the completeness drivers."""
    n_fr = cube.shape[0] if cube.ndim == 3 else cube.shape[1]
    if n_fr != angle_list.shape[0]:
        raise TypeError("Input parallactic angles vector has wrong length")
    if cube.ndim == 3 and psf.ndim != 2:
        raise TypeError("Template PSF is not a frame (for ADI case)")
    if cube.ndim == 4 and psf.ndim != 3:
        raise TypeError("Template PSF is not a cube (for ADI+IFS case)")


def _estimate_snr_fc(a, b, level, n_fc, cube, psf, angle_list, fwhm, algo,
                     algo_dict, snrmap_empty, starphot=1, approximated=True):
    """Inject one fake companion at (r=a, theta=b/n_fc*360) and return
    (max SNR at target - max SNR elsewhere, b)
    (reference completeness.py:52-164)."""
    cubefc = cube_inject_companions(cube, psf, angle_list,
                                    flevel=level * starphot, plsc=0.1,
                                    rad_dists=a, theta=b / n_fc * 360,
                                    n_branches=1, verbose=False)
    fwhm_med = _median_fwhm(fwhm)
    cy, cx = frame_center(cube[0, 0] if cube.ndim == 4 else cube[0])

    argl = _algo_args(algo)
    algo_dict = dict(algo_dict)
    if "verbose" in argl:
        algo_dict["verbose"] = False
    if "fwhm" in argl:
        algo_dict["fwhm"] = fwhm_med

    annular = "radius_int" in argl
    if annular:
        # annular algos only need a few annuli around the injection radius:
        # crop, reduce, paste the result back onto a full-size frame
        asize = algo_dict.get("asize") or int(np.ceil(fwhm))
        n_annuli = 5 if a > 2 * asize else 4
        radius_int = (a // asize - (2 if a > 2 * asize else 1)) * asize
        extent = int(radius_int + n_annuli * asize)
        work = cubefc
        if 2 * extent < cube.shape[-1]:
            work = cube_crop_frames(cubefc, 2 * extent, xy=(cx, cy),
                                    verbose=False)
        reduced = np.array(algo(cube=work, angle_list=angle_list,
                                radius_int=radius_int, **algo_dict))
        frame_fin = np.zeros(cube.shape[-2:])
        ys, xs = get_annulus_segments(frame_fin, 0, extent, 1)[0]
        off = (frame_fin.shape[0] - reduced.shape[0]) // 2
        frame_fin[ys, xs] = reduced[ys - off, xs - off]
    else:
        frame_fin = np.array(algo(cube=cubefc, angle_list=angle_list,
                                  **algo_dict))

    return _margin_from_frame(frame_fin, a, b, n_fc, fwhm_med, snrmap_empty,
                              annular, approximated), b


def _margin_from_frame(frame_fin, a, b, n_fc, fwhm_med, snrmap_empty,
                       annular, approximated):
    """(max SNR at the injection - max SNR elsewhere) for one reduced frame
    (reference completeness.py:117-164). Shared verbatim by the serial and
    the device-batched paths so their results are identical."""
    cy, cx = frame_center(frame_fin)
    if annular:
        mask = get_annulus_segments(frame_fin, a - (fwhm_med // 2),
                                    fwhm_med + 1, mode="mask")[0]
    else:
        width = min(frame_fin.shape) / 2 - 1.5 * fwhm_med
        mask = get_annulus_segments(frame_fin, (fwhm_med / 2) + 2, width,
                                    mode="mask")[0]
    yy, xx = np.where(np.ma.make_mask(mask, shrink=False))

    snr_new = np.zeros_like(frame_fin)
    if approximated:
        snr_new[yy, xx] = _snrmap_approx(frame_fin, yy, xx, fwhm_med, cy, cx,
                                         *frame_fin.shape)
    else:
        # all test positions through ONE device aperture-photometry
        # dispatch (same Mawet+14 statistics as the reference's
        # per-pixel snr() loop, completeness.py:117-164)
        snr_new[yy, xx] = snr_multi(frame_fin, xx, yy, fwhm_med,
                                    exclude_negative_lobes=True)[0]

    # overlay the injected-region SNR onto the empty map
    snr_new = np.nan_to_num(snr_new)
    merged = np.where(np.abs(snr_new) > 1e-6, 0, snrmap_empty) + snr_new

    # split the map into the aperture around the injection vs the rest
    y, x = frame_fin.shape
    azim = 2 * np.pi * b / n_fc
    at_y = int(y / 2 + np.sin(azim) * a)
    at_x = int(x / 2 + np.cos(azim) * a)
    near = ((np.arange(y)[:, None] - at_y) ** 2
            + (np.arange(x)[None, :] - at_x) ** 2) < 16
    max_target = np.nan_to_num(merged[near]).max()
    max_rest = np.nan_to_num(np.where(near, 0, merged)).max()
    return max_target - max_rest


def _run_batch(nproc, a, bs, level, n_fc, cube, psf, angle_list, fwhm, algo,
               algo_dict, snrmap_empty, starphot, approximated):
    """Evaluate _estimate_snr_fc for a list of position indices.

    When the algo is the native batchable full-frame ``pca``, all ``bs``
    injection cubes stack on a leading axis and reduce in ONE vmapped XLA
    program (the contrcurve._process_patterns machinery, SURVEY §3.3;
    closes VERDICT r2 'batched completeness'). Other algos take the
    reference's serial pool_map shape (completeness.py:52-218)."""
    res = _run_batch_device(a, bs, level, n_fc, cube, psf, angle_list, fwhm,
                            algo, algo_dict, snrmap_empty, starphot,
                            approximated)
    if res is not None:
        return res
    return pool_map(nproc, _estimate_snr_fc, a, iterable(bs), level, n_fc,
                    cube, psf, angle_list, fwhm, algo, algo_dict,
                    snrmap_empty, starphot, approximated=approximated)


def _run_batch_device(a, bs, level, n_fc, cube, psf, angle_list, fwhm, algo,
                      algo_dict, snrmap_empty, starphot, approximated):
    """One-vmapped-program evaluation of all azimuthal positions at once.
    Returns None when the algo/params are not batchable."""
    from .contrcurve import _batched_pca_frames, _batched_pca_frames_lazy

    if cube.ndim != 3 or len(bs) == 0:
        return None
    argl = _algo_args(algo)
    if "radius_int" in argl:        # annular algos take the crop path
        return None
    fwhm_med = _median_fwhm(fwhm)
    run_dict = dict(algo_dict)
    if "verbose" in argl:
        run_dict["verbose"] = False
    if "fwhm" in argl:
        run_dict["fwhm"] = fwhm_med
    probe = {k: v for k, v in run_dict.items()
             if k not in ("verbose", "fwhm")}
    psf_np = np.asarray(psf)
    frames = None
    if psf_np.ndim == 2 and psf_np.shape[-1] <= min(cube.shape[-2:]):
        # device-resident injection (ops/inject.py): one base-cube
        # upload, every azimuthal position rebuilt inside the reducer
        specs = [(np.atleast_1d(np.asarray(a, dtype=float)),
                  np.atleast_1d(np.asarray(level * starphot, dtype=float)),
                  float(np.deg2rad(b / n_fc * 360))) for b in bs]
        frames = _batched_pca_frames_lazy(cube, psf_np, angle_list, specs,
                                          algo, probe)
    if frames is None:
        cubes_fc = [cube_inject_companions(cube, psf, angle_list,
                                           flevel=level * starphot, plsc=0.1,
                                           rad_dists=a, theta=b / n_fc * 360,
                                           n_branches=1, verbose=False)
                    for b in bs]
        frames = _batched_pca_frames(cubes_fc, angle_list, algo, probe)
    if frames is None:
        return None
    return [(_margin_from_frame(np.asarray(fr, dtype=float), a, b, n_fc,
                                fwhm_med, snrmap_empty, False, approximated),
             b)
            for fr, b in zip(frames, bs)]


class _DetectionLedger:
    """Monotonic detection memo over the ``n_fc`` azimuthal injection
    positions at one radius.

    Detectability is assumed monotonic in the injected flux (the same
    assumption that lets the reference re-probe only its non-detected set,
    completeness.py:526-589): once position ``b`` is detected at some
    level it counts as detected at any higher level, and a miss carries
    down to any lower level. ``count(level)`` therefore only needs the
    algorithm re-run for positions whose threshold is still inside the
    queried gap.
    """

    def __init__(self, prober, n_fc):
        self._prober = prober
        self._lowest_hit = np.full(n_fc, np.inf)
        self._highest_miss = np.full(n_fc, -np.inf)

    def count(self, level):
        """Number of detected positions at ``level``, probing only the
        positions whose state is unknown there."""
        unknown = np.where((level < self._lowest_hit)
                           & (level > self._highest_miss))[0]
        if unknown.size:
            hits = self._prober(level, unknown)
            hit_idx = unknown[hits]
            miss_idx = unknown[~hits]
            self._lowest_hit[hit_idx] = np.minimum(
                self._lowest_hit[hit_idx], level)
            self._highest_miss[miss_idx] = np.maximum(
                self._highest_miss[miss_idx], level)
        return int(np.sum(level >= self._lowest_hit))


def _level_for_count(ledger, start_level, target, max_iter, err_msg):
    """Search for a flux level at which exactly ``target`` of the
    positions are detected: geometric expansion to bracket the target
    count, then secant steps on (count, level) with a bisection fallback.
    """
    level = start_level
    lo = hi = None  # (level, count) with count < target / >= target
    for _ in range(max_iter):
        count = ledger.count(level)
        if count == target:
            return level
        if count < target:
            if lo is None or level > lo[0]:
                lo = (level, count)
        else:
            if hi is None or level < hi[0]:
                hi = (level, count)
        if lo is None:
            level = hi[0] * 0.5
        elif hi is None:
            level = lo[0] * 1.5
        else:
            lo_lvl, lo_cnt = lo
            hi_lvl, hi_cnt = hi
            level = lo_lvl + (hi_lvl - lo_lvl) * (target - lo_cnt) \
                / max(hi_cnt - lo_cnt, 1)
            if not lo_lvl < level < hi_lvl:
                level = 0.5 * (lo_lvl + hi_lvl)
    raise ValueError(err_msg.format(max_iter, level))


_ERR_MSG = ("Could not converge on a contrast level matching required "
            "completeness within {} iterations. Tested level: {}. Is "
            "there too much self-subtraction? Consider decreasing ncomp "
            "if using PCA, or increasing minimum requested radius.")


def _empty_snrmap(cube, angle_list, fwhm_med, fwhm, algo, algo_dict, nproc,
                  snr_approximation):
    """Post-process the empty cube and compute its SNR map."""
    argl = _algo_args(algo)
    algo_dict = dict(algo_dict)
    algo_dict["verbose"] = False
    if "cube" in argl and "angle_list" in argl:
        if "fwhm" in argl:
            frame_fin = algo(cube=cube, angle_list=angle_list,
                             fwhm=fwhm_med, **algo_dict)
        else:
            frame_fin = algo(cube=cube, angle_list=angle_list, **algo_dict)
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
                       plot=True, dpi=100, save_plot=None, object_name=None,
                       fix_y_lim=(), figsize=(8, 5), algo_class=None):
    """Completeness-based contrast curve (reference completeness.py:219-755).

    Returns (an_dist, cont_curve).
    """
    angle_list = np.asarray(angle_list)
    _check_cube_psf(cube, angle_list, psf)
    nproc = nproc or 1
    fwhm_med = _median_fwhm(fwhm)

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
                                plot=False, algo_class=algo_class,
                                **algo_dict)
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

    target = round(completeness * n_fc)

    for k, a in enumerate(an_dist):
        if verbose:
            print("*** Calculating contrast at r = {} ***".format(a))

        def prober(level, positions, _a=a):
            res = _run_batch(nproc, _a, positions, level, n_fc, cube, psf,
                             angle_list, fwhm, algo, algo_dict,
                             snrmap_empty, starphot, snr_approximation)
            by_pos = dict((b, margin) for margin, b in res)
            return np.array([by_pos[b] > 0 for b in positions])

        ledger = _DetectionLedger(prober, n_fc)
        level = _level_for_count(ledger, ini_contrast[k], target, max_iter,
                                 _ERR_MSG)
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
        if object_name is not None:
            ncomp = algo_dict.get("ncomp")
            pca_type = "ADI" if algo_dict.get("cube_ref") is None else "RDI"
            plt.title(f"{pca_type} {object_name} {ncomp}pc", fontsize=14)
        if len(fix_y_lim) == 2:
            ax1.set_ylim(min(fix_y_lim), max(fix_y_lim))
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
    _check_cube_psf(cube, angle_list, psf)
    nproc = nproc or 1
    fwhm_med = _median_fwhm(fwhm)

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
    max_iter = 100

    for k, a in enumerate(an_dist):
        if verbose:
            print("Starting annulus {}".format(a))

        def prober(level, positions, _a=a):
            res = _run_batch(nproc, _a, positions, level, n_fc, cube, psf,
                             angle_list, fwhm, algo, algo_dict,
                             snrmap_empty, starphot, snr_approximation)
            by_pos = dict((b, margin) for margin, b in res)
            return np.array([by_pos[b] > 0 for b in positions])

        ledger = _DetectionLedger(prober, n_fc)
        level_of = {}  # detection count -> a level realizing it

        class _Recorder:
            """Ledger adapter noting every (count, level) pair seen, so
            the searches for the remaining counts start pre-bracketed."""

            @staticmethod
            def count(level):
                c = ledger.count(level)
                level_of.setdefault(c, level)
                return c

        # every count in 1..n_fc-1 needs a realizing level; walk outward
        # from the initial contrast, reusing everything discovered en route
        _Recorder.count(ini_contrast[k])
        for c in range(1, n_fc):
            if c in level_of:
                continue
            known = np.array(sorted(level_of))
            nearest = known[np.abs(known - c).argmin()]
            _level_for_count(_Recorder, level_of[nearest], c, max_iter,
                             _ERR_MSG)
            if verbose:
                print("Data point {} found.".format(c / n_fc))
        for c, level in level_of.items():
            contrast_matrix[k, c] = level

    comp_levels = np.linspace(1 / n_fc, 1 - 1 / n_fc, n_fc - 1,
                              endpoint=True)
    return an_dist, comp_levels, contrast_matrix[:, 1:-1]
