"""LOCI — locally optimized combination of images (least-squares ADI).

TPU rebuild of vip_hci/psfsub/loci.py. The per-(annulus, segment) jobs of
the reference's reversed-order fork pool (loci.py:441-454) run as a host
loop; inside each segment ALL per-frame least-squares solves — 'lstsq',
'nnls' (Lawson–Hanson active set) and 'lsq' (box-constrained) — run as a
single batched device program over the frame axis with masked reference
libraries (ops/lsq_solvers.py). Segment pixel counts are padded to
power-of-two buckets so different annuli share compilations (zero pixel
columns leave the Gram, and hence the solution, unchanged).
"""

from dataclasses import dataclass
from enum import Enum
from typing import List, Tuple, Union

import numpy as np
from scipy.spatial.distance import cdist

from ..config import (Adimsdi, Collapse, Imlib, Interpolation,
                      Metric, Solver, time_ini, timing)
from ..config.utils_param import resolve_algo_params, setup_parameters
from ..preproc.derotation import (_define_annuli, _find_indices_adi,
                                  cube_derotate)
from ..preproc.parangles import check_pa_vector
from ..preproc.subsampling import cube_collapse
from ..var.shapes import get_annulus_segments
from ..var.shapes import resolve_n_segments

__all__ = ["xloci", "XLOCI_Params"]

_METRIC_MAP = {
    "manhattan": "cityblock",
    "cityblock": "cityblock",
    "l1": "cityblock",
    "euclidean": "euclidean",
    "l2": "euclidean",
    "cosine": "cosine",
    "correlation": "correlation",
}


@dataclass
class XLOCI_Params:
    """Parameters of ``xloci`` (reference loci.py:40-70)."""

    cube: np.ndarray = None
    angle_list: np.ndarray = None
    scale_list: np.ndarray = None
    fwhm: float = 4
    metric: Enum = Metric.MANHATTAN
    dist_threshold: int = 100
    delta_rot: Union[float, Tuple[float]] = (0.1, 1)
    delta_sep: Union[float, Tuple[float]] = (0.1, 1)
    radius_int: int = 0
    asize: int = 4
    n_segments: int = 4
    nproc: int = 1
    solver: Enum = Solver.LSTSQ
    tol: float = 1e-2
    optim_scale_fact: float = 2
    adimsdi: Enum = Adimsdi.SKIPADI
    imlib: Enum = Imlib.VIPFFT
    interpolation: Enum = Interpolation.LANCZOS4
    collapse: Enum = Collapse.MEDIAN
    verbose: bool = True
    full_output: bool = False


def xloci(*all_args: List, **all_kwargs: dict):
    """LOCI PSF subtraction for ADI (and ADI+mSDI) data
    (reference loci.py:71-334)."""
    algo_params, rot_options = resolve_algo_params(
        XLOCI_Params, all_args, all_kwargs)

    cube = np.asarray(algo_params.cube, dtype=float)

    if algo_params.verbose:
        start_time = time_ini()

    if cube.ndim == 4:
        return _xloci_4d(cube, algo_params, rot_options)

    res = _leastsq_adi(
        cube, check_pa_vector(algo_params.angle_list),
        fwhm=algo_params.fwhm,
        metric=str(getattr(algo_params.metric, "value", algo_params.metric)),
        dist_threshold=algo_params.dist_threshold,
        delta_rot=algo_params.delta_rot,
        radius_int=algo_params.radius_int, asize=algo_params.asize,
        n_segments=algo_params.n_segments, nproc=algo_params.nproc,
        solver=str(getattr(algo_params.solver, "value", algo_params.solver)),
        tol=algo_params.tol,
        optim_scale_fact=algo_params.optim_scale_fact,
        imlib=algo_params.imlib, interpolation=algo_params.interpolation,
        collapse=algo_params.collapse, verbose=algo_params.verbose,
        full_output=algo_params.full_output, **rot_options)
    if algo_params.verbose:
        timing(start_time)
    return res


def _xloci_4d(cube, algo_params, rot_options):
    """4-d LOCI: per-channel ADI ('skipadi' without scale_list), or SDI
    least-squares per temporal frame with optional ADI second stage
    (reference loci.py:225-334)."""
    z, n, y_in, x_in = cube.shape
    fwhm = int(np.round(np.mean(algo_params.fwhm)))
    adimsdi = str(getattr(algo_params.adimsdi, "value",
                          algo_params.adimsdi))
    metric = str(getattr(algo_params.metric, "value", algo_params.metric))
    solver = str(getattr(algo_params.solver, "value", algo_params.solver))
    collapse = algo_params.collapse
    angle_list = check_pa_vector(algo_params.angle_list)

    if adimsdi == "skipadi":
        # reference: 'skipadi' = per-channel ADI least-squares
        # (loci.py:231-260), regardless of scale_list
        cube_res = np.zeros((z, y_in, x_in))
        for ch in range(z):
            cube_res[ch] = _leastsq_adi(
                cube[ch], angle_list, fwhm=fwhm, metric=metric,
                dist_threshold=algo_params.dist_threshold,
                delta_rot=algo_params.delta_rot,
                radius_int=algo_params.radius_int, asize=algo_params.asize,
                n_segments=algo_params.n_segments, nproc=algo_params.nproc,
                solver=solver, tol=algo_params.tol,
                optim_scale_fact=algo_params.optim_scale_fact,
                imlib=algo_params.imlib,
                interpolation=algo_params.interpolation, collapse=collapse,
                verbose=False, full_output=False, **rot_options)
        frame = cube_collapse(cube_res, collapse)
        if algo_params.full_output:
            return cube_res, frame
        return frame

    if algo_params.scale_list is None:
        raise ValueError("Scaling factors vector must be provided")
    scale_list = np.asarray(algo_params.scale_list)
    if scale_list.ndim > 1:
        raise ValueError("Scaling factors vector is not 1d")
    if not scale_list.shape[0] == z:
        raise ValueError("Scaling factors vector has wrong length")

    cube_out = np.array([
        _leastsq_sdi_fr(cube, fr, scale_list, algo_params.radius_int, fwhm,
                        algo_params.asize, algo_params.n_segments,
                        algo_params.delta_sep, algo_params.tol,
                        algo_params.optim_scale_fact, metric,
                        algo_params.dist_threshold, solver,
                        algo_params.imlib, algo_params.interpolation,
                        collapse)
        for fr in range(n)
    ])

    if adimsdi == "single":
        cube_der = cube_derotate(cube_out, angle_list,
                                 imlib=algo_params.imlib,
                                 interpolation=algo_params.interpolation,
                                 nproc=algo_params.nproc, **rot_options)
        frame = cube_collapse(cube_der, mode=collapse)
    else:
        res = _leastsq_adi(cube_out, angle_list, fwhm=fwhm, metric=metric,
                           dist_threshold=algo_params.dist_threshold,
                           delta_rot=algo_params.delta_rot,
                           radius_int=algo_params.radius_int,
                           asize=algo_params.asize,
                           n_segments=algo_params.n_segments,
                           nproc=algo_params.nproc, solver=solver,
                           tol=algo_params.tol,
                           optim_scale_fact=algo_params.optim_scale_fact,
                           imlib=algo_params.imlib,
                           interpolation=algo_params.interpolation,
                           collapse=collapse, verbose=False,
                           full_output=algo_params.full_output,
                           **rot_options)
        if algo_params.full_output:
            cube_out, cube_der, frame = res
        else:
            frame = res
    if algo_params.full_output:
        return cube_out, cube_der, frame
    return frame


def _leastsq_sdi_fr(cube, fr, scal, radius_int, fwhm, asize, n_segments,
                    delta_sep, tol, optim_scale_fact, metric, dist_threshold,
                    solver, imlib, interpolation, collapse):
    """SDI least-squares on one multi-spectral frame (loci.py:544-654)."""
    from ..preproc.rescaling import (check_scal_vector,
                                     cube_rescaling_wavelengths as scwave)

    z, n, y_in, x_in = cube.shape
    scale_list = check_scal_vector(scal)
    multispec_fr = scwave(cube[:, fr, :, :], scale_list, imlib=imlib,
                          interpolation=interpolation)[0]

    fwhm = int(np.round(np.mean(fwhm)))
    annulus_width = int(np.ceil(asize))
    n_annuli = int(np.floor((y_in / 2 - radius_int) / annulus_width))

    n_segments = resolve_n_segments(n_segments, n_annuli, annulus_width)

    cube_res = np.zeros_like(multispec_fr)

    if isinstance(delta_sep, tuple):
        delta_sep_vec = np.linspace(delta_sep[0], delta_sep[1], n_annuli)
    else:
        delta_sep_vec = [delta_sep] * n_annuli

    for ann in range(n_annuli):
        if ann == n_annuli - 1:
            inner_radius = radius_int + (ann * annulus_width - 1)
        else:
            inner_radius = radius_int + ann * annulus_width
        ann_center = inner_radius + (annulus_width / 2)

        indices = get_annulus_segments(multispec_fr[0], inner_radius,
                                       annulus_width, n_segments[ann])
        ind_opt = get_annulus_segments(multispec_fr[0], inner_radius,
                                       annulus_width, n_segments[ann],
                                       optim_scale_fact=optim_scale_fact)
        for seg in range(n_segments[ann]):
            yy, xx = indices[seg]
            segm_res = _leastsq_patch_ifs(multispec_fr, seg, indices,
                                          ind_opt, scal, ann_center, fwhm,
                                          delta_sep_vec[ann], metric,
                                          dist_threshold, solver, tol)
            cube_res[:, yy, xx] = segm_res

    return scwave(cube_res, scale_list, full_output=False, inverse=True,
                  y_in=y_in, x_in=x_in, imlib=imlib,
                  interpolation=interpolation, collapse=collapse)


def _leastsq_patch_ifs(multispec_fr, nseg, indices, indices_opt, scal,
                       ann_center, fwhm, delta_sep, metric, dist_threshold,
                       solver, tol):
    """SDI least-squares for one segment (loci.py:655-715). Note the
    reference quirk indices_opt[nseg][0] used for BOTH yy_opt and xx_opt —
    replicated."""
    from ..preproc.rescaling import _find_indices_sdi

    yy, xx = indices[nseg]
    values = multispec_fr[:, yy, xx]
    yy_opt = indices_opt[nseg][0]
    xx_opt = indices_opt[nseg][0]
    values_opt = multispec_fr[:, yy_opt, xx_opt]

    n_wls = values.shape[0]

    if dist_threshold < 100:
        mat_dists_ann_full = cdist(values, values,
                                   metric=_METRIC_MAP.get(metric, metric))
    else:
        mat_dists_ann_full = np.ones((values.shape[0], values.shape[0]))

    if delta_sep > 0:
        mat_dists_ann = np.zeros_like(mat_dists_ann_full)
        for zz in range(n_wls):
            ind_fr_i = _find_indices_sdi(scal, ann_center, zz, fwhm,
                                         delta_sep)
            mat_dists_ann[zz][ind_fr_i] = mat_dists_ann_full[zz][ind_fr_i]
    else:
        mat_dists_ann = mat_dists_ann_full

    masks = _library_masks(mat_dists_ann, dist_threshold,
                           "increasing `dist_threshold` or decreasing "
                           "`delta_sep`")
    return _solve_patch_device(values, values_opt, masks, solver, tol)


def _leastsq_adi(cube, angle_list, fwhm=4, metric="manhattan",
                 dist_threshold=50, delta_rot=0.5, radius_int=0, asize=4,
                 n_segments=4, nproc=1, solver="lstsq", tol=1e-2,
                 optim_scale_fact=1, imlib="vip-fft",
                 interpolation="lanczos4", collapse="median", verbose=True,
                 full_output=False, **rot_options):
    """Least-squares model PSF subtraction for ADI (loci.py:337-471)."""
    y = cube.shape[1]
    if not asize < y // 2:
        raise ValueError("asize is too large")

    angle_list = check_pa_vector(angle_list)
    n_annuli = int((y / 2 - radius_int) / asize)
    if verbose:
        print(f"Building {n_annuli} annuli:")

    if isinstance(delta_rot, tuple):
        delta_rot = np.linspace(delta_rot[0], delta_rot[1], num=n_annuli)
    elif isinstance(delta_rot, (int, float)):
        delta_rot = [delta_rot] * n_annuli

    annulus_width = asize
    n_segments = resolve_n_segments(n_segments, n_annuli, annulus_width)

    cube_res = np.zeros_like(cube)

    ayxyx = []
    pa_thresholds = []
    for ann in range(n_annuli):
        n_segments_ann = n_segments[ann]
        inner_radius_ann = radius_int + ann * annulus_width
        pa_threshold = _define_annuli(angle_list, ann, n_annuli, fwhm,
                                      radius_int, asize, delta_rot[ann],
                                      n_segments_ann, verbose)[0]
        indices = get_annulus_segments(cube[0],
                                       inner_radius=inner_radius_ann,
                                       width=asize, nsegm=n_segments_ann)
        ind_opt = get_annulus_segments(cube[0],
                                       inner_radius=inner_radius_ann,
                                       width=asize, nsegm=n_segments_ann,
                                       optim_scale_fact=optim_scale_fact)
        ayxyx += [(ann, indices[nseg][0], indices[nseg][1],
                   ind_opt[nseg][0], ind_opt[nseg][1])
                  for nseg in range(n_segments_ann)]
        pa_thresholds.append(pa_threshold)

    if verbose:
        print("Patch-wise least-square combination and subtraction:")
    for seg_data in ayxyx[::-1]:
        matrix_res, yy, xx = _leastsq_patch(cube, seg_data, pa_thresholds,
                                            angle_list, metric,
                                            dist_threshold, solver, tol)
        cube_res[:, yy, xx] = matrix_res

    cube_der = cube_derotate(cube_res, angle_list, imlib, interpolation,
                             nproc=nproc, **rot_options)
    frame_der_median = cube_collapse(cube_der, collapse)

    if verbose:
        print("Done processing annuli")

    if full_output:
        return cube_res, cube_der, frame_der_median
    return frame_der_median


def _leastsq_patch(cube, ayxyx, pa_thresholds, angles, metric,
                   dist_threshold, solver, tol):
    """Per-segment similarity filter + per-frame least-squares solve
    (reference loci.py:474-541)."""
    iann, yy, xx, yy_opt, xx_opt = ayxyx
    pa_threshold = pa_thresholds[iann]

    values = cube[:, yy, xx]
    values_opt = cube[:, yy_opt, xx_opt]
    n_frames = cube.shape[0]

    if dist_threshold < 100:
        mat_dists_ann_full = cdist(values, values,
                                   metric=_METRIC_MAP.get(metric, metric))
    else:
        mat_dists_ann_full = np.ones((values.shape[0], values.shape[0]))

    if pa_threshold > 0:
        mat_dists_ann = np.zeros_like(mat_dists_ann_full)
        for i in range(n_frames):
            ind_fr_i = _find_indices_adi(angles, i, pa_threshold, None, False)
            mat_dists_ann[i][ind_fr_i] = mat_dists_ann_full[i][ind_fr_i]
    else:
        mat_dists_ann = mat_dists_ann_full

    masks = _library_masks(mat_dists_ann, dist_threshold,
                           "increasing `dist_threshold` or decreasing "
                           "`delta_rot`")
    matrix_res = _solve_patch_device(values, values_opt, masks, solver, tol)
    return matrix_res, yy, xx


def _library_masks(mat_dists_ann, dist_threshold, hint):
    """Percentile-threshold the distance matrix into per-frame boolean
    library masks (reference loci.py:506-516); raise the reference's
    empty-library error per frame."""
    mat = mat_dists_ann.copy()
    threshold = np.percentile(mat[mat != 0], dist_threshold)
    mat[mat > threshold] = np.nan
    mat[mat == 0] = np.nan
    masks = ~np.isnan(mat)
    if not masks.any(axis=1).all():
        raise RuntimeError("No frames left in the reference set. Try "
                           + hint + ".")
    return masks


def _solve_patch_device(values, values_opt, masks, solver, tol):
    """All of a segment's per-frame solves as one batched device call,
    with pixel axes padded to power-of-two buckets for compile reuse."""
    from ..ops.lsq_solvers import loci_segment_residuals

    import jax.numpy as jnp

    p = values.shape[1]
    p_pad = 1 << (p - 1).bit_length()
    po = values_opt.shape[1]
    po_pad = 1 << (po - 1).bit_length()
    v = np.pad(values, ((0, 0), (0, p_pad - p)))
    vo = np.pad(values_opt, ((0, 0), (0, po_pad - po)))
    res = loci_segment_residuals(jnp.asarray(v), jnp.asarray(vo),
                                 jnp.asarray(masks), tol, solver=solver)
    return np.asarray(res)[:, :p]
