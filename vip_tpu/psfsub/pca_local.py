"""Annular PCA (PCA on annuli / annular sectors, ADI / RDI).

TPU rebuild of vip_hci/psfsub/pca_local.py. The reference's
frame-per-process pool (pca_local.py:726-742) becomes one vmapped,
masked, batched SVD per (annulus, segment) — see
``vip_tpu.ops.annular.batched_pca_patch_residuals`` for why zero-masked
libraries are mathematically exact. PA thresholds, annulus geometry and
library truncation (≤ max_frames_lib by ΔPA sort) are the reference's host
logic emitted as static masks.
"""

from dataclasses import dataclass
from enum import Enum
from typing import List, Tuple, Union

import numpy as np
import jax.numpy as jnp

from ..config import (Collapse, Imlib, Interpolation, SvdMode,
                      time_ini, timing)
from ..config.utils_param import resolve_algo_params, setup_parameters
from ..ops.annular import (batched_pca_patch_residuals,
                           batched_pca_patch_residuals_gram,
                           resident_annulus_update)

from ..preproc.derotation import (_define_annuli, _find_indices_adi,
                                  cube_derotate)
from ..preproc.parangles import check_pa_vector
from ..preproc.subsampling import cube_collapse
from ..var.shapes import get_annulus_segments, matrix_scaling
from ..var.shapes import resolve_n_segments
from .svd import MODE_TO_METHOD, get_eigenvectors

__all__ = ["pca_annular", "PCA_ANNULAR_Params"]

# Frames threshold above which the Gram-space scale path takes over (the
# masked path is cubic in frames; see ops/annular.py). Override with
# VIP_TPU_ANNULAR_GRAM=1/0 to force either path (used by the parity test).
_GRAM_PATH_MIN_FRAMES = 128

# Frames threshold above which the resident path switches from the exact
# per-frame (L, L) eigh to the matmul-dominated subspace iteration
# (ops/annular._subspace_topk) — ~3.5x faster per annulus at 1000
# frames / L=200 (docs/PROFILING.md annular table; QDWH eigh's QR
# panels are the cost) and converged to float resolution on the
# decaying spectra PCA libraries produce. Force either with
# VIP_TPU_ANNULAR_METHOD=eigh|subspace.
_SUBSPACE_MIN_FRAMES = 512


def _resident_method(n, svd_val):
    import os

    env = os.environ.get("VIP_TPU_ANNULAR_METHOD")
    if env in ("eigh", "subspace"):
        return env
    if MODE_TO_METHOD.get(svd_val) == "randsvd":
        return "subspace"
    return "subspace" if n >= _SUBSPACE_MIN_FRAMES else "eigh"


def _gram_path_enabled(n):
    import os

    env = os.environ.get("VIP_TPU_ANNULAR_GRAM")
    if env is not None:
        return env == "1"
    return n >= _GRAM_PATH_MIN_FRAMES


def _build_lib_masks(angle_list, pa_thr, n, min_frames_lib, max_frames_lib,
                     have_ref):
    """Per-frame library masks for one annulus (reference PA-threshold +
    dPA-sort truncation, derotation.py:410-496)."""
    if pa_thr != 0:
        lib_mask = np.zeros((n, n), dtype=bool)
        lib_sizes = np.zeros(n, dtype=int)
        for fr in range(n):
            idx = _find_indices_adi(angle_list, fr, pa_thr, truncate=True,
                                    max_frames=max_frames_lib)
            lib_mask[fr, idx] = True
            lib_sizes[fr] = len(idx)
        if not have_ref and lib_sizes.min() < min_frames_lib:
            raise RuntimeError(
                "Too few frames left in the PCA library. Accepted "
                f"indices length ({lib_sizes.min():.0f}) less than "
                f"{min_frames_lib:.0f}. Try decreasing either delta_rot "
                "or min_frames_lib.")
        return lib_mask, lib_sizes
    return np.ones((n, n), dtype=bool), np.full(n, n)


def _pad_lib_arrays(lib_mask, lib_sizes, n, npc_max, max_frames_lib, dtype):
    """(lib_idx, lib_w) padded to the shared L bucket (see the bucketing
    note in _pca_adi_rdi)."""
    L = int(lib_sizes.max())
    L_pad = 64 * ((L + 63) // 64)
    if L <= max_frames_lib < L_pad:
        L_pad = int(max_frames_lib)
    L_pad = min(n, max(npc_max, L_pad))
    lib_idx = np.zeros((n, L_pad), dtype=np.int32)
    lib_w = np.zeros((n, L_pad), dtype=dtype)
    for fr in range(n):
        idx = np.flatnonzero(lib_mask[fr])
        lib_idx[fr, :idx.size] = idx
        lib_w[fr, :idx.size] = 1.0
    return lib_idx, lib_w


def _pca_adi_resident(array, angle_list, radius_int, fwhm, asize,
                      n_segments, delta_rot, ncomp, min_frames_lib,
                      max_frames_lib, collapse, rot_mode, theta_init,
                      full_output, verbose, start_time, method="eigh"):
    """Device-resident annular ADI PCA at scale.

    The host-orchestrated loop below ships every segment matrix over the
    host<->device link twice and derotates through host numpy — at
    1000x512x512 that wire traffic (~2 GB per run over the bench link)
    plus the per-frame host library scans dominate the wall time. Here
    the cube is uploaded ONCE; segment extraction (device gather),
    per-frame library PCA (ops/annular.py Gram path), residual scatter
    and the final derotate+collapse all stay on device, so only the
    final frame (or, with full_output, the residual cubes) crosses back.
    Numerics are identical to the host path (same Gram kernel, same
    derotation kernel: tests/test_psfsub_parity.py, tests/test_sharding
    pipeline-parity)."""
    import jax

    from ..ops.pipeline import _derotate_frames
    from ..preproc.subsampling import collapse_jax

    n, y, x = array.shape
    n_annuli = len(n_segments)
    cube_dev = jnp.asarray(array)
    cube_out_dev = jnp.zeros_like(cube_dev)

    if verbose:
        print(f"N annuli = {n_annuli}, FWHM = {fwhm:.3f}")
        print("PCA per annulus (or annular sectors) [device-resident]:")

    for ann in range(n_annuli):
        ncompann = int(ncomp)
        n_segments_ann = n_segments[ann]
        pa_thr, inner_radius, ann_center = _define_annuli(
            angle_list, ann, n_annuli, fwhm, radius_int, asize,
            delta_rot[ann], n_segments_ann, verbose, True)
        indices = get_annulus_segments((y, x), inner_radius, asize,
                                       n_segments_ann, theta_init)
        lib_mask, lib_sizes = _build_lib_masks(
            angle_list, pa_thr, n, min_frames_lib, max_frames_lib, False)
        lib_idx, lib_w = _pad_lib_arrays(lib_mask, lib_sizes, n, ncompann,
                                         max_frames_lib,
                                         np.dtype(cube_dev.dtype))
        k_eff = np.minimum(ncompann, lib_sizes)
        lib_idx_d = jnp.asarray(lib_idx)
        lib_w_d = jnp.asarray(lib_w)
        k_eff_d = jnp.asarray(k_eff)

        for j in range(n_segments_ann):
            yy, xx = indices[j]
            p = len(yy)
            k_seg = np.minimum(k_eff, p)
            # bucket the segment width so all annuli share a handful of
            # compiled programs (see resident_annulus_update)
            p_pad = 1024 * ((p + 1023) // 1024)
            # out-of-bounds padding: clamped on gather (then zeroed via
            # colmask), dropped on scatter — see resident_annulus_update
            flat = np.asarray(yy, np.int64) * x + np.asarray(xx, np.int64)
            flat_pad = np.pad(flat, (0, p_pad - p),
                              constant_values=y * x).astype(np.int32)
            colmask = np.zeros(p_pad, dtype=np.dtype(cube_dev.dtype))
            colmask[:p] = 1.0
            cube_out_dev = resident_annulus_update(
                cube_dev, cube_out_dev, jnp.asarray(flat_pad),
                jnp.asarray(colmask), lib_idx_d, lib_w_d,
                jnp.asarray(k_seg) if (k_seg != k_eff).any() else k_eff_d,
                ncompann, method=method)

        if verbose == 1:
            print("Done PCA with lapack for current annulus")
            timing(start_time)

    # chunk the derotation to bound the padded-canvas HBM footprint
    canvas = (4 * y) ** 2 * 8 if rot_mode == "fft" \
        else (int(1.25 * y) + 2) ** 2 * 8
    chunk = int(min(n, 128, max(8, 1.6e9 // canvas)))
    ang_dev = jnp.asarray(np.asarray(angle_list,
                                     dtype=np.dtype(cube_dev.dtype)))
    der_dev = _derotate_frames(cube_out_dev, ang_dev, chunk=chunk,
                               rot_mode=rot_mode)
    frame = np.asarray(collapse_jax(der_dev, mode=collapse))

    if verbose:
        print("Done derotating and combining.")
        timing(start_time)

    if full_output:
        return np.asarray(cube_out_dev), np.asarray(der_dev), frame
    return None, None, frame


@dataclass
class PCA_ANNULAR_Params:
    """Parameters of ``pca_annular`` (reference pca_local.py:39-70)."""

    cube: np.ndarray = None
    angle_list: np.ndarray = None
    cube_ref: np.ndarray = None
    scale_list: np.ndarray = None
    radius_int: int = 0
    fwhm: float = 4
    asize: float = 4
    n_segments: Union[int, List[int], str] = 1
    delta_rot: Union[float, Tuple[float], List[float]] = (0.1, 1)
    delta_sep: Union[float, Tuple[float], List[float]] = (0.1, 1)
    ncomp: Union[int, Tuple, np.ndarray, str] = 1
    svd_mode: Enum = SvdMode.LAPACK
    nproc: int = 1
    min_frames_lib: int = 2
    max_frames_lib: int = 200
    tol: float = 1e-1
    scaling: Enum = None
    imlib: Enum = Imlib.VIPFFT
    interpolation: Enum = Interpolation.LANCZOS4
    collapse: Enum = Collapse.MEDIAN
    collapse_ifs: Enum = Collapse.MEAN
    ifs_collapse_range: Union[str, Tuple[int]] = "all"
    theta_init: int = 0
    weights: np.ndarray = None
    cube_sig: np.ndarray = None
    full_output: bool = False
    verbose: bool = True
    left_eigv: bool = False


def pca_annular(*all_args: List, **all_kwargs: dict):
    """PCA on concentric annuli (or annular sectors) with a parallactic-angle
    rejection threshold (reference pca_local.py:73-462)."""
    algo_params, rot_options = resolve_algo_params(
        PCA_ANNULAR_Params, all_args, all_kwargs)

    if algo_params.radius_int and len(rot_options) == 0:
        rot_options["mask_val"] = 0
        rot_options["ker"] = 1
        rot_options["interp_zeros"] = True

    if algo_params.verbose:
        global start_time
        start_time = time_ini()

    if algo_params.cube.ndim == 3:
        # pass the USER's full_output down: the device-resident path
        # (_pca_adi_resident) only ships the residual cubes back over
        # the link when they are actually requested
        add_params = {"start_time": time_ini(False),
                      "full_output": bool(algo_params.full_output)}
        func_params = setup_parameters(params_obj=algo_params,
                                       fkt=_pca_adi_rdi, **add_params)
        res = _pca_adi_rdi(**func_params, **rot_options)
        if algo_params.full_output:
            cube_out, cube_der, frame = res
            return cube_out, cube_der, frame
        return res[2] if isinstance(res, tuple) else res

    elif algo_params.cube.ndim == 4 and algo_params.scale_list is None:
        # per-channel annular ADI + channel collapse (pca_local.py:281-330)
        nch, nz, ny, nx = algo_params.cube.shape
        ifs_adi_frames = np.zeros([nch, ny, nx])
        ncomp = algo_params.ncomp
        if not isinstance(ncomp, list) or len(ncomp) != nch:
            ncomp = [algo_params.ncomp] * nch
        fwhm = algo_params.fwhm
        if np.isscalar(fwhm):
            fwhm = [fwhm] * nch

        cube_out = []
        cube_der = []
        for ch in range(nch):
            cube_ref_tmp = None
            if algo_params.cube_ref is not None:
                if np.asarray(algo_params.cube_ref[ch]).ndim != 3:
                    raise TypeError("Ref cube has wrong format for 4d input "
                                    "cube")
                cube_ref_tmp = algo_params.cube_ref[ch]
            add_params = {"cube": algo_params.cube[ch], "fwhm": fwhm[ch],
                          "ncomp": ncomp[ch], "full_output": True,
                          "cube_ref": cube_ref_tmp,
                          "start_time": time_ini(False)}
            func_params = setup_parameters(params_obj=algo_params,
                                           fkt=_pca_adi_rdi, **add_params)
            res_pca = _pca_adi_rdi(**func_params, **rot_options)
            cube_out.append(res_pca[0])
            cube_der.append(res_pca[1])
            ifs_adi_frames[ch] = res_pca[-1]

        collapse_ifs = str(getattr(algo_params.collapse_ifs, "value",
                                   algo_params.collapse_ifs))
        frame = cube_collapse(ifs_adi_frames, mode=collapse_ifs) \
            if algo_params.collapse_ifs is not None else ifs_adi_frames
        if algo_params.full_output:
            return np.array(cube_out), np.array(cube_der), frame
        return frame

    elif algo_params.cube.ndim == 4:
        # SDI (per-frame spectral annular PCA) + optional ADI second stage
        # (pca_local.py:333-462)
        z, n, y_in, x_in = algo_params.cube.shape
        fwhm = int(np.round(np.mean(algo_params.fwhm)))
        scale_list = np.asarray(algo_params.scale_list)
        if scale_list.ndim > 1:
            raise ValueError("Scaling factors vector is not 1d")
        if not scale_list.shape[0] == z:
            raise ValueError("Scaling factors vector has wrong length")
        if not isinstance(algo_params.ncomp, tuple):
            raise TypeError("`ncomp` must be a tuple of two integers when "
                            "`cube` is a 4d array")
        ncomp1, ncomp2 = algo_params.ncomp

        svd_mode = str(getattr(algo_params.svd_mode, "value",
                               algo_params.svd_mode))
        collapse_ifs = str(getattr(algo_params.collapse_ifs, "value",
                                   algo_params.collapse_ifs))
        if algo_params.verbose:
            print("First PCA subtraction exploiting the spectral "
                  "variability")
            print(f"{z} spectral channels per IFS frame")

        residuals_cube_channels = np.array([
            _pca_sdi_fr(algo_params.cube, fr, scale_list,
                        algo_params.radius_int, fwhm, algo_params.asize,
                        algo_params.n_segments, algo_params.delta_sep,
                        ncomp1, svd_mode, algo_params.tol,
                        algo_params.scaling, algo_params.imlib,
                        algo_params.interpolation, collapse_ifs,
                        algo_params.ifs_collapse_range,
                        algo_params.theta_init)
            for fr in range(n)
        ])

        if ncomp2 is None:
            cube_out = residuals_cube_channels
            cube_der = cube_derotate(cube_out, angle_list=check_pa_vector(
                algo_params.angle_list), nproc=algo_params.nproc,
                imlib=algo_params.imlib,
                interpolation=algo_params.interpolation, **rot_options)
            frame = cube_collapse(cube_der, mode=algo_params.collapse,
                                  w=algo_params.weights)
        else:
            residuals_cube_channels_ref = None
            if algo_params.cube_ref is not None:
                nr = algo_params.cube_ref.shape[1]
                residuals_cube_channels_ref = np.array([
                    _pca_sdi_fr(algo_params.cube_ref, fr, scale_list,
                                algo_params.radius_int, fwhm,
                                algo_params.asize, algo_params.n_segments,
                                algo_params.delta_sep, ncomp1, svd_mode,
                                algo_params.tol, algo_params.scaling,
                                algo_params.imlib,
                                algo_params.interpolation, collapse_ifs,
                                algo_params.ifs_collapse_range,
                                algo_params.theta_init)
                    for fr in range(nr)
                ])
            add_params = {"cube": residuals_cube_channels, "ncomp": ncomp2,
                          "cube_ref": residuals_cube_channels_ref,
                          "fwhm": fwhm, "start_time": time_ini(False),
                          "full_output": True}
            func_params = setup_parameters(params_obj=algo_params,
                                           fkt=_pca_adi_rdi, **add_params)
            cube_out, cube_der, frame = _pca_adi_rdi(**func_params,
                                                     **rot_options)

        if algo_params.full_output:
            return cube_out, cube_der, frame
        return frame

    raise TypeError("Input array is not a 4d or 3d array")


def _pca_sdi_fr(array, fr, scal, radius_int, fwhm, asize, n_segments,
                delta_sep, ncomp, svd_mode, tol, scaling, imlib,
                interpolation, collapse, ifs_collapse_range, theta_init):
    """Optimized spectral PCA subtraction on one multi-spectral frame
    (reference pca_local.py:470-591)."""
    from ..preproc.rescaling import (_find_indices_sdi, check_scal_vector,
                                     cube_rescaling_wavelengths as scwave)

    scale_list = check_scal_vector(scal)
    z, n, y_in, x_in = array.shape
    multispec_fr = scwave(array[:, fr, :, :], scale_list, imlib=imlib,
                          interpolation=interpolation)[0]

    fwhm = int(np.round(np.mean(fwhm)))
    n_annuli = int((y_in / 2 - radius_int) / asize)

    n_segments = resolve_n_segments(n_segments, n_annuli, asize)

    cube_res = np.zeros_like(multispec_fr)

    if isinstance(delta_sep, (tuple, list)):
        delta_sep_vec = np.linspace(delta_sep[0], delta_sep[1], n_annuli)
    elif np.isscalar(delta_sep):
        delta_sep_vec = [delta_sep] * n_annuli
    else:
        if len(delta_sep) != n_annuli:
            raise TypeError("If delta_sep is a list it should have n_annuli "
                            "elements.")
        delta_sep_vec = delta_sep

    for ann in range(n_annuli):
        if ann == n_annuli - 1:
            inner_radius = radius_int + (ann * asize - 1)
        else:
            inner_radius = radius_int + ann * asize
        ann_center = inner_radius + (asize / 2)

        indices = get_annulus_segments(multispec_fr[0], inner_radius, asize,
                                       n_segments[ann], theta_init)
        for seg in range(n_segments[ann]):
            yy, xx = indices[seg]
            matrix = matrix_scaling(multispec_fr[:, yy, xx], scaling)

            for j in range(z):
                indices_left = _find_indices_sdi(scal, ann_center, j, fwhm,
                                                 delta_sep_vec[ann])
                matrix_ref = matrix[indices_left]
                curr_frame = matrix[j]
                V = get_eigenvectors(ncomp, matrix_ref, svd_mode,
                                     noise_error=tol, debug=False,
                                     scaling=scaling)
                transformed = np.dot(curr_frame, V.T)
                reconstructed = np.dot(transformed.T, V)
                cube_res[j, yy, xx] = curr_frame - reconstructed

    if ifs_collapse_range == "all":
        idx_ini, idx_fin = 0, z
    else:
        idx_ini, idx_fin = ifs_collapse_range

    frame_desc = scwave(cube_res[idx_ini:idx_fin],
                        scale_list[idx_ini:idx_fin], full_output=False,
                        inverse=True, y_in=y_in, x_in=x_in, imlib=imlib,
                        interpolation=interpolation, collapse=collapse)
    return frame_desc


def _pca_adi_rdi(cube, angle_list, radius_int=0, fwhm=4, asize=2,
                 n_segments=1, delta_rot=1, ncomp=1, svd_mode="lapack",
                 nproc=None, min_frames_lib=2, max_frames_lib=200, tol=1e-1,
                 scaling=None, imlib="vip-fft", interpolation="lanczos4",
                 collapse="median", full_output=False, verbose=1,
                 cube_ref=None, theta_init=0, weights=None, cube_sig=None,
                 left_eigv=False, start_time=None, **rot_options):
    """Annular ADI/RDI PCA core (reference pca_local.py:594-827)."""
    # a jax-Array cube stays on device until a host-orchestrated branch
    # actually needs it (the resident path never does — passing a
    # device-resident cube skips the host round-trip entirely)
    device_in = isinstance(cube, jnp.ndarray) \
        and not isinstance(cube, np.ndarray)
    array = cube if device_in else np.asarray(cube, dtype=float)
    if array.ndim != 3:
        raise TypeError("Input array is not a cube or 3d array")
    if array.shape[0] != np.asarray(angle_list).shape[0]:
        raise TypeError("Input vector or parallactic angles has wrong length")
    if start_time is None:
        start_time = time_ini(False)

    n, y, x = array.shape
    angle_list = check_pa_vector(angle_list)
    n_annuli = int((y / 2 - radius_int) / asize)

    if isinstance(delta_rot, tuple):
        delta_rot = np.linspace(delta_rot[0], delta_rot[1], num=n_annuli)
    elif np.isscalar(delta_rot):
        delta_rot = [delta_rot] * n_annuli
    elif len(delta_rot) != n_annuli:
        raise TypeError("If delta_rot is a list it should have n_annuli "
                        "elements.")

    if isinstance(n_segments, int):
        n_segments = [n_segments for _ in range(n_annuli)]
    elif n_segments == "auto":
        n_segments = resolve_n_segments("auto", n_annuli, asize)

    # Device-resident dispatch (see _pca_adi_resident): big-cube ADI
    # configs with the default FFT derotation never leave the device.
    imlib_val = str(getattr(imlib, "value", imlib))
    collapse_val = str(getattr(collapse, "value", collapse))
    if (_gram_path_enabled(n) and cube_ref is None and cube_sig is None
            and weights is None and not left_eigv
            and isinstance(ncomp, (int, np.integer))
            and scaling is None and not rot_options
            and imlib_val in ("vip-fft", "vip-fft-small")
            and not (imlib_val == "vip-fft-small"
                     and (y != x or x % 2 != 0))
            and collapse_val in ("median", "mean", "sum")):
        rot_mode = "fft-small" if imlib_val == "vip-fft-small" else "fft"
        # per-frame (L, L) Gram eigh below _SUBSPACE_MIN_FRAMES; above
        # it (and for the reference's randomized modes, svd.py:705-840)
        # the QR-reorthonormalized subspace iteration — converged to
        # float resolution on PCA spectra (see _resident_method)
        svd_val = str(getattr(svd_mode, "value", svd_mode))
        res_method = _resident_method(n, svd_val)
        return _pca_adi_resident(
            array, angle_list, radius_int, fwhm, asize, n_segments,
            delta_rot, ncomp, min_frames_lib, max_frames_lib,
            collapse_val, rot_mode, theta_init, full_output, verbose,
            start_time, method=res_method)

    if device_in:
        array = np.asarray(cube, dtype=float)

    if verbose:
        print(f"N annuli = {n_annuli}, FWHM = {fwhm:.3f}")
        print("PCA per annulus (or annular sectors):")

    ncomp_list = isinstance(ncomp, list)
    if ncomp_list:
        cube_out = np.zeros([len(ncomp), n, y, x])
    else:
        cube_out = np.zeros_like(array)

    verbose_ann = int(verbose) + int(cube_ref is None) if verbose else verbose

    method = MODE_TO_METHOD.get(str(getattr(svd_mode, "value", svd_mode)),
                                "lapack")

    for ann in range(n_annuli):
        if isinstance(ncomp, (tuple, np.ndarray)):
            if len(ncomp) == n_annuli:
                ncompann = ncomp[ann]
            else:
                raise TypeError("If `ncomp` is a tuple, its length must "
                                "match the number of annuli")
        else:
            ncompann = ncomp

        n_segments_ann = n_segments[ann]
        pa_thr, inner_radius, ann_center = _define_annuli(
            angle_list, ann, n_annuli, fwhm, radius_int, asize,
            delta_rot[ann], n_segments_ann, verbose_ann, True)
        indices = get_annulus_segments(array[0], inner_radius, asize,
                                       n_segments_ann, theta_init)
        if left_eigv:
            indices_out = get_annulus_segments(array[0], inner_radius, asize,
                                               n_segments_ann, theta_init,
                                               out=True)

        # static per-frame library masks for this annulus
        if pa_thr != 0:
            lib_mask = np.zeros((n, n), dtype=bool)
            lib_sizes = np.zeros(n, dtype=int)
            for fr in range(n):
                idx = _find_indices_adi(angle_list, fr, pa_thr, truncate=True,
                                        max_frames=max_frames_lib)
                lib_mask[fr, idx] = True
                lib_sizes[fr] = len(idx)
            if cube_ref is None and lib_sizes.min() < min_frames_lib:
                raise RuntimeError(
                    "Too few frames left in the PCA library. Accepted "
                    f"indices length ({lib_sizes.min():.0f}) less than "
                    f"{min_frames_lib:.0f}. Try decreasing either delta_rot "
                    "or min_frames_lib.")
        else:
            lib_mask = np.ones((n, n), dtype=bool)
            lib_sizes = np.full(n, n)

        for j in range(n_segments_ann):
            yy, xx = indices[j]
            matrix_segm = matrix_scaling(array[:, yy, xx], scaling)
            matrix_segm_ref = None
            if cube_ref is not None:
                matrix_segm_ref = matrix_scaling(cube_ref[:, yy, xx], scaling)
            matrix_sig_segm = cube_sig[:, yy, xx] if cube_sig is not None \
                else None

            if left_eigv:
                yy_o, xx_o = indices_out[j]
                matrix_out_segm = matrix_scaling(array[:, yy_o, xx_o],
                                                 scaling)
                npc = max(ncomp) if ncomp_list else ncomp
                V = get_eigenvectors(npc, matrix_out_segm,
                                     str(getattr(svd_mode, "value",
                                                 svd_mode)),
                                     noise_error=tol, left_eigv=True)
                if ncomp_list:
                    for nn, npc_tmp in enumerate(ncomp):
                        transformed = np.dot(V[:npc_tmp], matrix_segm)
                        reconstructed = np.dot(transformed.T, V[:npc_tmp])
                        cube_out[nn][:, yy, xx] = \
                            matrix_segm - reconstructed.T
                else:
                    transformed = np.dot(V, matrix_segm)
                    reconstructed = np.dot(transformed.T, V)
                    residuals = matrix_segm - reconstructed.T
                    cube_out[:, yy, xx] = residuals
                continue

            matrix_emp = matrix_segm if matrix_sig_segm is None \
                else matrix_segm - matrix_sig_segm

            if ncompann == "auto":
                # data-dependent truncation: host loop per frame
                residuals = np.empty_like(matrix_segm)
                for fr in range(n):
                    data_ref = matrix_emp[lib_mask[fr]]
                    if matrix_segm_ref is not None:
                        data_ref = np.vstack((matrix_segm_ref, data_ref))
                    V = get_eigenvectors(
                        "auto", data_ref,
                        str(getattr(svd_mode, "value", svd_mode)),
                        noise_error=tol)
                    transformed = np.dot(matrix_emp[fr], V.T)
                    residuals[fr] = matrix_segm[fr] - np.dot(transformed.T, V)
                cube_out[:, yy, xx] = residuals
                continue

            npc_max = max(ncompann) if isinstance(ncompann, list) \
                else int(ncompann)
            n_ref_rows = 0 if matrix_segm_ref is None \
                else matrix_segm_ref.shape[0]
            # per-frame effective ncomp: min(ncomp, library rows, n_px)
            # (reference get_eigenvectors svd.py:696-698)
            k_eff = np.minimum(npc_max,
                               np.minimum(lib_sizes + n_ref_rows,
                                          matrix_segm.shape[1]))

            # Scale path: the masked formulation re-forms an (n, n) Gram
            # under every frame's mask (O(n^2 p) PER FRAME) — cubic in
            # frames. Above _GRAM_PATH_MIN_FRAMES, switch to the
            # Gram-space path (one segment Gram + per-frame (L, L)
            # gathers, L = max library size; ops/annular.py) — identical
            # residuals, tested at 1e-8 (tests/test_psfsub_parity.py).
            use_gram = (matrix_segm_ref is None
                        and not isinstance(ncompann, list)
                        and _gram_path_enabled(n))
            if use_gram:
                # Shape bucketing: every annulus has its own segment
                # width p and max library size L; compiling one program
                # per annulus costs ~64 XLA compiles at bench scale.
                # Zero-padded pixel columns leave the Gram — and thus
                # the residuals — exactly unchanged, and zero-weight
                # library rows are already the padding contract, so pad
                # p up to a multiple of 1024 and L to a multiple of 64:
                # a handful of compiled programs serve all annuli.
                L = int(lib_sizes.max())
                L_pad = 64 * ((L + 63) // 64)
                if L <= max_frames_lib < L_pad:
                    # the dPA truncation cap is the common max — use it
                    # as its own bucket instead of rounding past it (the
                    # eigh cost is cubic in L)
                    L_pad = int(max_frames_lib)
                L_pad = min(n, max(npc_max, L_pad))
                lib_idx = np.zeros((n, L_pad), dtype=np.int32)
                lib_w = np.zeros((n, L_pad), dtype=matrix_segm.dtype)
                for fr in range(n):
                    idx = np.flatnonzero(lib_mask[fr])
                    lib_idx[fr, :idx.size] = idx
                    lib_w[fr, :idx.size] = 1.0
                p = matrix_segm.shape[1]
                p_pad = 1024 * ((p + 1023) // 1024)
                if p_pad != p:
                    pad = ((0, 0), (0, p_pad - p))
                    m_in = np.pad(matrix_segm, pad)
                    m_emp_in = np.pad(matrix_emp, pad) \
                        if matrix_emp is not matrix_segm else m_in
                else:
                    m_in, m_emp_in = matrix_segm, matrix_emp
                res = batched_pca_patch_residuals_gram(
                    jnp.asarray(m_in), jnp.asarray(m_emp_in),
                    jnp.asarray(lib_idx), jnp.asarray(lib_w), npc_max,
                    k_eff=jnp.asarray(k_eff))[:, :p]
            else:
                res, V_all = batched_pca_patch_residuals(
                    jnp.asarray(matrix_segm), jnp.asarray(matrix_emp),
                    jnp.asarray(lib_mask), npc_max, method=method,
                    matrix_ref=None if matrix_segm_ref is None
                    else jnp.asarray(matrix_segm_ref),
                    k_eff=jnp.asarray(k_eff))

            if isinstance(ncompann, list):
                V_all = np.asarray(V_all)
                for nn, npc_tmp in enumerate(ncompann):
                    for fr in range(n):
                        V = V_all[fr][:min(npc_tmp, k_eff[fr])]
                        transformed = np.dot(matrix_emp[fr], V.T)
                        cube_out[nn, fr][yy, xx] = \
                            matrix_segm[fr] - np.dot(transformed.T, V)
            else:
                cube_out[:, yy, xx] = np.asarray(res)

        if verbose == 1:
            print(f"Done PCA with {svd_mode} for current annulus")
            timing(start_time)

    if ncomp_list:
        cube_der = np.zeros_like(cube_out)
        frame = []
        for nn in range(len(ncomp)):
            cube_der[nn] = cube_derotate(cube_out[nn], angle_list,
                                         nproc=nproc, imlib=imlib,
                                         interpolation=interpolation,
                                         **rot_options)
            frame.append(cube_collapse(cube_der[nn], mode=collapse,
                                       w=weights))
    else:
        cube_der = cube_derotate(cube_out, angle_list, nproc=nproc,
                                 imlib=imlib, interpolation=interpolation,
                                 **rot_options)
        frame = cube_collapse(cube_der, mode=collapse, w=weights)

    if verbose:
        print("Done derotating and combining.")
        timing(start_time)

    if full_output:
        return cube_out, cube_der, frame
    return frame


def do_pca_patch(matrix, frame, angle_list, fwhm, pa_threshold, ann_center,
                 svd_mode, ncomp, min_frames_lib, max_frames_lib, tol,
                 matrix_ref, matrix_sig_segm):
    """SVD/PCA of one frame's annulus patch against its PA-thresholded
    library (reference pca_local.py:830-910). Public for API parity — the
    batched annular path (``pca_annular``) supersedes it; this helper
    serves external callers that drive the per-frame decomposition
    themselves.

    Returns (residuals, ncomp_used, library_size) like the reference.
    """
    from .svd import get_eigenvectors

    msg = "Too few frames left in the PCA library. "
    msg += "Accepted indices length ({:.0f}) less than {:.0f}. "
    msg += "Try decreasing either delta_rot or min_frames_lib."
    if pa_threshold != 0:
        indices_left = _find_indices_adi(angle_list, frame, pa_threshold,
                                         truncate=True,
                                         max_frames=max_frames_lib)
        if matrix_sig_segm is not None:
            data_ref = matrix[indices_left] - matrix_sig_segm[indices_left]
        else:
            data_ref = matrix[indices_left]
        if data_ref.shape[0] < min_frames_lib and matrix_ref is None:
            raise RuntimeError(msg.format(len(indices_left), min_frames_lib))
    else:
        if matrix_sig_segm is not None:
            data_ref = matrix - matrix_sig_segm
        else:
            data_ref = matrix

    if matrix_ref is not None:
        if data_ref is not None:
            data_ref = np.vstack((matrix_ref, data_ref))
        else:
            data_ref = matrix_ref

    curr_frame = matrix[frame]
    if matrix_sig_segm is not None:
        curr_frame_emp = matrix[frame] - matrix_sig_segm[frame]
    else:
        curr_frame_emp = curr_frame
    npc = max(ncomp) if isinstance(ncomp, list) else ncomp
    V = get_eigenvectors(npc, data_ref, svd_mode, noise_error=tol)

    if isinstance(ncomp, list):
        residuals = []
        for npc_tmp in ncomp:
            transformed = np.dot(curr_frame_emp, V[:npc_tmp].T)
            residuals.append(curr_frame - np.dot(transformed.T, V[:npc_tmp]))
    else:
        transformed = np.dot(curr_frame_emp, V.T)
        residuals = curr_frame - np.dot(transformed.T, V)
    return residuals, V.shape[0], data_ref.shape[0]
