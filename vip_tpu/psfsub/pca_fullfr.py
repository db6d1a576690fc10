"""Full-frame PCA for ADI / RDI / ARDI (3-d cubes).

TPU rebuild of vip_hci/psfsub/pca_fullfr.py. Same public surface —
``pca(*args, **kwargs)`` with the dataclass-params convention
(pca_fullfr.py:398-409), same return-shape dispatch — but the pipeline
prepare-matrix → SVD → project/subtract → derotate → collapse executes as
batched device computation: one (or a few) XLA programs instead of
LAPACK + a fork pool.

4-d (ADI+mSDI) modes and incremental (batch) PCA are provided by
``pca_multispectral`` / ``pca_incremental`` (see utils_pca / pca_4d
modules as they land).
"""

from dataclasses import dataclass
from enum import Enum
from typing import List, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..config import (Adimsdi, Collapse, Imlib, Interpolation,
                      SvdMode, check_array, check_enough_memory, time_ini,
                      timing)
from ..config.utils_param import resolve_algo_params, setup_parameters
from ..ops.linalg import project_subtract, svd_top
from ..preproc.derotation import (_compute_pa_thresh, _find_indices_adi,
                                  cube_derotate)
from ..preproc.parangles import check_pa_vector
from ..preproc.subsampling import cube_collapse
from ..var.coords import dist, frame_center
from ..var.shapes import mask_circle, prepare_matrix, reshape_matrix
from .svd import MODE_TO_METHOD, SVDecomposer, svd_wrapper

__all__ = ["pca", "PCA_Params"]


@dataclass
class PCA_Params:
    """Parameters of the ``pca`` algorithm (reference pca_fullfr.py:93-135)."""

    cube: np.ndarray = None
    angle_list: np.ndarray = None
    cube_ref: np.ndarray = None
    scale_list: np.ndarray = None
    ncomp: Union[Tuple, List, float, int] = 1
    svd_mode: Enum = SvdMode.LAPACK
    scaling: Enum = None
    mask_center_px: int = None
    source_xy: Tuple[int] = None
    delta_rot: int = None
    fwhm: float = 4
    adimsdi: Enum = Adimsdi.SINGLE
    crop_ifs: bool = True
    imlib: Enum = Imlib.VIPFFT
    imlib2: Enum = Imlib.VIPFFT
    interpolation: Enum = Interpolation.LANCZOS4
    collapse: Enum = Collapse.MEDIAN
    collapse_ifs: Enum = Collapse.MEAN
    ifs_collapse_range: Union[str, Tuple[int]] = "all"
    smooth: float = None
    smooth_first_pass: float = None
    mask_rdi: np.ndarray = None
    ref_strategy: str = "RDI"
    check_memory: bool = True
    batch: Union[int, float] = None
    nproc: int = 1
    full_output: bool = False
    verbose: bool = True
    weights: np.ndarray = None
    left_eigv: bool = False
    min_frames_pca: int = 10
    max_frames_pca: int = None
    cube_sig: np.ndarray = None
    med_of_npcs: bool = False


def pca(*all_args: List, **all_kwargs: dict):
    """Full-frame PCA PSF subtraction (ADI / RDI / ARDI).

    Signature, parameter names and return-shape matrix follow the reference
    ``pca`` (pca_fullfr.py:137-798). Keyword arguments not belonging to
    ``PCA_Params`` are treated as ``rot_options`` for the derotation; a
    pre-built params object may be passed as ``algo_params=``.
    """
    algo_params, rot_options = resolve_algo_params(
        PCA_Params, all_args, all_kwargs)

    if algo_params.mask_center_px and len(rot_options) == 0:
        rot_options["mask_val"] = 0
        rot_options["ker"] = 1
        rot_options["interp_zeros"] = True

    start_time = time_ini(algo_params.verbose)

    if algo_params.batch is None:
        check_array(algo_params.cube, (3, 4), msg="cube")
    elif not isinstance(algo_params.cube, (str, np.ndarray)):
        raise TypeError("`cube` must be a numpy (3d or 4d) array or a str "
                        "with the full path on disk")

    # memory guard for in-memory cubes (reference pca_fullfr.py:438-457)
    if not isinstance(algo_params.cube, str):
        input_bytes = (algo_params.cube_ref.nbytes
                       if algo_params.cube_ref is not None
                       else algo_params.cube.nbytes)
        check_enough_memory(
            input_bytes, 1.0, raise_error=algo_params.check_memory,
            error_msg=(" Set check_memory=False to override this memory "
                       "check or set `batch` to run incremental PCA"),
            verbose=algo_params.verbose)

    if algo_params.left_eigv:
        if (algo_params.batch is not None or algo_params.mask_rdi is not None
                or algo_params.cube_ref is not None):
            raise NotImplementedError(
                "left_eigv is not compatible with 'mask_rdi' nor 'batch'"
            )

    # ------------------------------------------------------------------
    # ADI+mSDI (4D cube with scale_list)
    # ------------------------------------------------------------------
    if algo_params.scale_list is not None:
        if algo_params.cube.ndim != 4:
            raise ValueError("`scale_list` requires a 4D input cube")
        adimsdi = str(getattr(algo_params.adimsdi, "value",
                              algo_params.adimsdi))
        add_params = {"start_time": start_time,
                      "full_output": algo_params.full_output}
        if algo_params.cube_ref is not None:
            # reference pca_fullfr.py:499-509: mSDI refs must be 4D; 'A'
            # strategies fold the science frames into the library
            if algo_params.cube_ref.ndim != 4:
                raise TypeError("Ref cube has wrong format for 4d input "
                                "cube")
            if "A" in str(algo_params.ref_strategy):
                add_params["ref_strategy"] = "ARSDI"
                if adimsdi == "single":
                    add_params["cube_ref"] = np.concatenate(
                        (algo_params.cube, algo_params.cube_ref), axis=1)
            else:
                add_params["ref_strategy"] = "RSDI"
        if adimsdi == "double":
            func_params = setup_parameters(params_obj=algo_params,
                                           fkt=_adimsdi_doublepca,
                                           **add_params)
            res_pca = _adimsdi_doublepca(**func_params, **rot_options)
            res_cube_channels, residuals_cube_channels_, frame = res_pca
            if algo_params.full_output:
                return frame, res_cube_channels, residuals_cube_channels_
            return frame
        elif adimsdi == "single":
            func_params = setup_parameters(params_obj=algo_params,
                                           fkt=_adimsdi_singlepca,
                                           **add_params)
            res_pca = _adimsdi_singlepca(**func_params, **rot_options)
            if np.isscalar(algo_params.ncomp):
                (cube_allfr_residuals, cube_desc_residuals,
                 cube_adi_residuals, frame) = res_pca
                if algo_params.full_output:
                    return (frame, cube_allfr_residuals, cube_desc_residuals,
                            cube_adi_residuals)
                return frame
            else:  # grid
                return res_pca
        raise ValueError("ADIMSDI value should be 'single' or 'double'.")

    # ------------------------------------------------------------------
    # 4D cube without scale_list: per-channel ADI, collapse over channels
    # (reference pca_fullfr.py:543-657)
    # ------------------------------------------------------------------
    if not isinstance(algo_params.cube, str) and algo_params.cube.ndim == 4:
        nch, nz, ny, nx = algo_params.cube.shape
        collapse_ifs = str(getattr(algo_params.collapse_ifs, "value",
                                   algo_params.collapse_ifs))

        # per-channel ncomp: a len-nch list maps one scalar per channel;
        # any other list/tuple is a PCA grid shared by every channel
        nc = algo_params.ncomp
        if isinstance(nc, tuple):
            nc = list(nc)
        if not isinstance(nc, list):
            ncomp_ch = [nc] * nch
        elif len(nc) != nch:
            ncomp_ch = [nc] * nch
        else:
            ncomp_ch = nc
        grid_case = isinstance(ncomp_ch[0], (tuple, list))
        fwhm_ch = ([algo_params.fwhm] * nch
                   if np.isscalar(algo_params.fwhm) else algo_params.fwhm)

        grid_no_src = grid_case and algo_params.source_xy is None
        if grid_no_src:
            ifs_adi_frames = np.zeros((nch, len(ncomp_ch[0]), ny, nx))
        else:
            ifs_adi_frames = np.zeros((nch, ny, nx))
        pcs, recon, residuals_cube, residuals_cube_ = [], [], [], []
        recon_cube, table, pclist, fr_cube_list = [], [], [], []

        for ch in range(nch):
            ref_ch = None
            if algo_params.cube_ref is not None:
                if algo_params.cube_ref[ch].ndim != 3:
                    raise TypeError("Ref cube has wrong format for 4d "
                                    "input cube")
                if algo_params.ref_strategy == "RDI":
                    ref_ch = algo_params.cube_ref[ch]
                elif algo_params.ref_strategy == "ARDI":
                    ref_ch = np.concatenate((algo_params.cube[ch],
                                             algo_params.cube_ref[ch]))
                else:
                    raise TypeError("ref_strategy argument not recognized."
                                    " Should be 'RDI' or 'ARDI'")
            res_ch = pca(
                algo_params.cube[ch], algo_params.angle_list,
                cube_ref=ref_ch, ncomp=ncomp_ch[ch],
                svd_mode=algo_params.svd_mode, scaling=algo_params.scaling,
                mask_center_px=algo_params.mask_center_px,
                source_xy=algo_params.source_xy,
                delta_rot=algo_params.delta_rot, fwhm=fwhm_ch[ch],
                imlib=algo_params.imlib,
                interpolation=algo_params.interpolation,
                collapse=algo_params.collapse,
                weights=algo_params.weights, verbose=False,
                full_output=True, **rot_options)
            if algo_params.source_xy is not None:
                if grid_case:
                    fr_cube_list.append(res_ch[0])
                    ifs_adi_frames[ch] = res_ch[1]
                    table.append(res_ch[2])
                else:
                    ifs_adi_frames[ch] = res_ch[0]
                    recon_cube.append(res_ch[1])
                    residuals_cube.append(res_ch[2])
                    residuals_cube_.append(res_ch[3])
            elif grid_case:
                ifs_adi_frames[ch] = res_ch[0]
                pclist.append(res_ch[1])
            else:
                ifs_adi_frames[ch] = res_ch[0]
                pcs.append(res_ch[1])
                recon.append(res_ch[2])
                residuals_cube.append(res_ch[3])
                residuals_cube_.append(res_ch[4])

        if grid_no_src:
            final_residuals_cube = np.stack([
                cube_collapse(ifs_adi_frames[:, i], mode=collapse_ifs)
                for i in range(len(ncomp_ch[0]))])
        else:
            final_residuals_cube = (np.array(fr_cube_list)
                                    if fr_cube_list else None)
            frame = cube_collapse(ifs_adi_frames, mode=collapse_ifs)
        if final_residuals_cube is not None and algo_params.med_of_npcs:
            final_residuals_cube = np.median(final_residuals_cube, axis=0)

        if algo_params.full_output and algo_params.source_xy is None:
            if grid_case:
                return final_residuals_cube, pclist, ifs_adi_frames
            return (frame, np.array(pcs), np.array(recon),
                    np.array(residuals_cube), np.array(residuals_cube_),
                    ifs_adi_frames)
        if algo_params.full_output:
            if grid_case:
                return final_residuals_cube, frame, table, ifs_adi_frames
            return (frame, np.array(recon_cube), np.array(residuals_cube),
                    np.array(residuals_cube_), ifs_adi_frames)
        return final_residuals_cube if grid_no_src else frame

    if algo_params.batch is not None:
        if algo_params.cube_ref is not None:
            raise ValueError("RDI not compatible with batch mode")
        from .utils_pca import pca_incremental

        res_inc = pca_incremental(
            algo_params.cube, algo_params.angle_list,
            batch=algo_params.batch, ncomp=algo_params.ncomp,
            collapse=algo_params.collapse, verbose=algo_params.verbose,
            full_output=algo_params.full_output, start_time=start_time,
            weights=algo_params.weights, nproc=algo_params.nproc,
            imlib=algo_params.imlib,
            interpolation=algo_params.interpolation, **rot_options)
        if algo_params.full_output:
            frame, _, pcs, medians = res_inc
            return frame, pcs, medians     # reference pca_fullfr.py:763-765
        return res_inc

    if algo_params.cube_ref is not None:
        if algo_params.ref_strategy == "ARDI":
            algo_params.cube_ref = np.concatenate(
                (algo_params.cube, algo_params.cube_ref)
            )
        elif algo_params.ref_strategy != "RDI":
            raise TypeError("ref_strategy argument not recognized. Should be "
                            "'RDI' or 'ARDI'")

    add_params = {"start_time": start_time, "full_output": True}
    func_params = setup_parameters(params_obj=algo_params, fkt=_adi_rdi_pca,
                                   **add_params)
    res_pca = _adi_rdi_pca(**func_params, **rot_options)

    if algo_params.source_xy is not None:
        if isinstance(algo_params.ncomp, (tuple, list)):
            from .utils_pca import pca_grid  # noqa: F401 — grid path

            if algo_params.full_output:
                final_residuals_cube, frame, table, _ = res_pca
                if algo_params.med_of_npcs:
                    final_residuals_cube = np.median(final_residuals_cube,
                                                     axis=0)
                return final_residuals_cube, frame, table
            return res_pca[1]
        recon_cube, residuals_cube, residuals_cube_, frame = res_pca
        if algo_params.full_output:
            return frame, recon_cube, residuals_cube, residuals_cube_
        return frame
    else:
        if isinstance(algo_params.ncomp, (tuple, list)):
            final_residuals_cube, pclist = res_pca
            if algo_params.med_of_npcs:
                final_residuals_cube = np.median(final_residuals_cube, axis=0)
            if algo_params.full_output:
                return final_residuals_cube, pclist
            return final_residuals_cube
        pcs, recon, residuals_cube, residuals_cube_, frame = res_pca
        if algo_params.full_output:
            return frame, pcs, recon, residuals_cube, residuals_cube_
        return frame


def _adi_rdi_pca(cube, cube_ref, angle_list, ncomp, source_xy, delta_rot,
                 fwhm, scaling, mask_center_px, svd_mode, imlib,
                 interpolation, collapse, verbose, start_time, nproc,
                 full_output, weights=None, mask_rdi=None, cube_sig=None,
                 left_eigv=False, min_frames_pca=10, max_frames_pca=None,
                 smooth=None, **rot_options):
    """ADI/RDI full-frame PCA core (reference pca_fullfr.py:801-1035)."""
    n, y, x = cube.shape
    angle_list = check_pa_vector(angle_list)
    if not n == angle_list.shape[0]:
        raise ValueError("`angle_list` vector has wrong length. It must equal "
                         "the number of frames in the cube")

    if not np.isscalar(ncomp) and not isinstance(ncomp, (tuple, list)):
        raise TypeError("`ncomp` must be an int, float, tuple or list in the "
                        "ADI case")

    if isinstance(ncomp, (tuple, list)):
        from .utils_pca import pca_grid

        return pca_grid(cube, angle_list, fwhm, range_pcs=ncomp,
                        source_xy=source_xy, cube_ref=cube_ref, mode="fullfr",
                        svd_mode=svd_mode, scaling=scaling,
                        mask_center_px=mask_center_px, fmerit="mean",
                        collapse=collapse, verbose=verbose,
                        full_output=full_output, start_time=start_time,
                        weights=weights, nproc=nproc, imlib=imlib,
                        interpolation=interpolation, **rot_options)

    nref = cube_ref.shape[0] if cube_ref is not None else n
    if isinstance(ncomp, (int, np.integer)) and ncomp > nref:
        ncomp = min(int(ncomp), nref)
        print(f"Number of PCs too high (max PCs={nref}), using {ncomp} PCs "
              "instead.")
    elif np.isscalar(ncomp) and ncomp <= 0:
        raise ValueError("Number of PCs too low. It should be > 0.")

    if mask_rdi is not None:
        from ..preproc.skysubtraction import cube_subtract_sky_pca

        res = cube_subtract_sky_pca(cube, cube_ref, mask_rdi, ncomp=ncomp,
                                    full_output=True)
        residuals_cube = res[0]
        pcs = res[2]
        recon = res[-1]
        recon_cube = None
    elif source_xy is None:
        residuals_result = _project_subtract(
            cube, cube_ref, ncomp, scaling, mask_center_px, svd_mode, verbose,
            True, cube_sig=cube_sig, left_eigv=left_eigv,
        )
        if verbose:
            timing(start_time)
        residuals_cube = residuals_result[0]
        reconstructed = residuals_result[1]
        V = residuals_result[2]
        # .reshape keeps device arrays device-resident (reshape_matrix
        # would force a host transfer of the full reconstruction cube)
        pcs = V.reshape(-1, y, x) if not left_eigv else V.T
        recon = reconstructed.reshape(-1, y, x)
        recon_cube = None
    else:
        # Rotation-threshold path: per-frame libraries (static host indices),
        # per-frame SVD+projection on device.
        if delta_rot is None or fwhm is None:
            raise TypeError("Delta_rot or fwhm parameters missing. Needed for"
                            "PA-based rejection of frames from the library")
        nfrslib = []
        residuals_cube = np.zeros_like(cube)
        recon_cube = np.zeros_like(cube)
        yc, xc = frame_center(cube[0], False)
        x1, y1 = source_xy
        ann_center = dist(yc, xc, y1, x1)
        pa_thr = _compute_pa_thresh(ann_center, fwhm, delta_rot)
        truncate = max_frames_pca is not None

        for frame in range(n):
            ind = _find_indices_adi(angle_list, frame, pa_thr,
                                    truncate=truncate,
                                    max_frames=max_frames_pca)
            res_result = _project_subtract(
                cube, cube_ref, ncomp, scaling, mask_center_px, svd_mode,
                verbose, True, ind, frame, cube_sig=cube_sig,
                left_eigv=left_eigv, min_frames_pca=min_frames_pca,
            )
            nfrslib.append(res_result[0])
            residuals_cube[frame] = res_result[1].reshape((y, x))
            recon_cube[frame] = res_result[2].reshape((y, x))

        if verbose:
            from ..stats import descriptive_stats

            descriptive_stats(nfrslib, verbose=verbose, label="Size LIB: ")
        pcs = None
        recon = None

    residuals_cube_ = cube_derotate(residuals_cube, angle_list, nproc=nproc,
                                    imlib=imlib, interpolation=interpolation,
                                    **rot_options)
    frame = cube_collapse(residuals_cube_, mode=collapse, w=weights)
    if smooth is not None:
        from ..var.filters import frame_filter_lowpass

        frame = frame_filter_lowpass(frame, mode="gauss", fwhm_size=smooth)
    if mask_center_px:
        residuals_cube_ = mask_circle(residuals_cube_, mask_center_px)
        frame = mask_circle(frame, mask_center_px)
    if verbose:
        print("Done de-rotating and combining")
        timing(start_time)

    if source_xy is not None:
        return recon_cube, residuals_cube, residuals_cube_, frame
    return pcs, recon, residuals_cube, residuals_cube_, frame


def _adimsdi_singlepca(cube, cube_ref, angle_list, scale_list, ncomp, fwhm,
                       source_xy, scaling, mask_center_px, svd_mode, imlib,
                       imlib2, interpolation, collapse, collapse_ifs,
                       ifs_collapse_range, verbose, start_time, nproc,
                       crop_ifs, batch, full_output, weights=None,
                       left_eigv=False, min_frames_pca=10,
                       ref_strategy="RSDI", **rot_options):
    """Single-pass ADI+mSDI PCA: rescale all channels to align speckles,
    one big PCA, descale, derotate, collapse
    (reference pca_fullfr.py:1038-1242)."""
    from ..preproc.cosmetics import cube_crop_frames
    from ..preproc.rescaling import cube_rescaling_wavelengths as scwave

    cube = np.asarray(cube, dtype=float)
    z, n, y_in, x_in = cube.shape
    angle_list = check_pa_vector(angle_list)
    if not angle_list.shape[0] == n:
        raise ValueError("Angle list vector has wrong length. It must equal "
                         "the number frames in the cube")
    if scale_list is None:
        raise ValueError("`scale_list` must be provided")
    scale_list = np.asarray(scale_list)
    if not scale_list.shape[0] == z:
        raise ValueError("`scale_list` has wrong length")

    big_cube = []
    if verbose:
        print("Rescaling the spectral channels to align the speckles")
    for i in range(n):
        cube_resc = scwave(cube[:, i, :, :], scale_list, imlib=imlib2,
                           interpolation=interpolation, nproc=nproc)[0]
        if crop_ifs:
            cube_resc = cube_crop_frames(cube_resc, size=y_in, verbose=False)
        big_cube.append(cube_resc)
    big_cube = np.array(big_cube)
    big_cube = big_cube.reshape(z * n, big_cube.shape[2], big_cube.shape[3])

    if cube_ref is not None:
        zr, nr, _, _ = cube_ref.shape
        big_cube_ref = []
        for i in range(nr):
            cube_resc = scwave(cube_ref[:, i, :, :], scale_list, imlib=imlib2,
                               interpolation=interpolation, nproc=nproc)[0]
            if crop_ifs:
                cube_resc = cube_crop_frames(cube_resc, size=y_in,
                                             verbose=False)
            big_cube_ref.append(cube_resc)
        big_cube_ref = np.array(big_cube_ref)
        big_cube_ref = big_cube_ref.reshape(zr * nr, big_cube_ref.shape[2],
                                            big_cube_ref.shape[3])
    else:
        big_cube_ref = None

    if verbose:
        timing(start_time)
        print(f"{n * z} total frames")
        print("Performing single-pass PCA")

    if np.isscalar(ncomp):
        res_cube = _project_subtract(big_cube, big_cube_ref, ncomp, scaling,
                                     mask_center_px, svd_mode, verbose,
                                     False, left_eigv=left_eigv,
                                     min_frames_pca=min_frames_pca)
        if verbose:
            timing(start_time)

        resadi_cube = np.zeros((n, y_in, x_in))
        if ifs_collapse_range == "all":
            idx_ini, idx_fin = 0, z
        else:
            idx_ini, idx_fin = ifs_collapse_range

        cube_desc_residuals = np.zeros_like(cube[idx_ini:idx_fin])
        for i in range(n):
            res_i = scwave(res_cube[i * z + idx_ini:i * z + idx_fin],
                           scale_list[idx_ini:idx_fin], full_output=True,
                           inverse=True, y_in=y_in, x_in=x_in, imlib=imlib2,
                           interpolation=interpolation,
                           collapse=collapse_ifs, nproc=nproc)
            cube_desc_residuals[:, i] = res_i[0]
            resadi_cube[i] = res_i[1]

        if verbose:
            print("De-rotating and combining residuals")
            timing(start_time)
        der_res = cube_derotate(resadi_cube, angle_list, nproc=nproc,
                                imlib=imlib, interpolation=interpolation,
                                **rot_options)
        if mask_center_px:
            der_res = mask_circle(der_res, mask_center_px)
        frame = cube_collapse(der_res, mode=collapse, w=weights)
        return res_cube, cube_desc_residuals, resadi_cube, frame
    elif isinstance(ncomp, (tuple, list)):
        from .utils_pca import pca_grid

        return pca_grid(big_cube, angle_list, fwhm, range_pcs=ncomp,
                        source_xy=source_xy, cube_ref=None, mode="fullfr",
                        svd_mode=svd_mode, scaling=scaling,
                        mask_center_px=mask_center_px, fmerit="mean",
                        collapse=collapse,
                        ifs_collapse_range=ifs_collapse_range,
                        verbose=verbose, full_output=full_output,
                        start_time=start_time, scale_list=scale_list,
                        initial_4dshape=cube.shape, weights=weights,
                        nproc=nproc, imlib=imlib,
                        interpolation=interpolation, **rot_options)
    raise TypeError("`ncomp` must be an int, float, tuple or list for "
                    "single-pass PCA")


def _adimsdi_doublepca(cube, cube_ref, angle_list, scale_list, ncomp,
                       scaling, mask_center_px, svd_mode, imlib, imlib2,
                       interpolation, collapse, collapse_ifs,
                       ifs_collapse_range, verbose, start_time, nproc,
                       weights=None, fwhm=4, source_xy=None, delta_rot=None,
                       smooth_first_pass=None, min_frames_pca=10,
                       max_frames_pca=None, mask_rdi=None, cube_sig=None,
                       left_eigv=False, ref_strategy="RSDI", **rot_options):
    """Double-pass ADI+mSDI PCA: per-frame spectral PCA, then ADI-stage PCA
    (reference pca_fullfr.py:1245-1475)."""
    cube = np.asarray(cube, dtype=float)
    z, n, y_in, x_in = cube.shape

    if cube_ref is not None:
        cube = np.concatenate((cube, cube_ref), axis=1)
        nr = cube_ref.shape[1]
    else:
        nr = 0

    if not isinstance(ncomp, tuple):
        raise TypeError("`ncomp` must be a tuple when a double pass PCA is "
                        "performed")
    ncomp_ifs, ncomp_adi = ncomp

    angle_list = check_pa_vector(angle_list)
    if not angle_list.shape[0] == n:
        raise ValueError("Angle list vector has wrong length. It must equal "
                         "the number frames in the cube")
    if scale_list is None:
        raise ValueError("Scaling factors vector must be provided")
    scale_list = np.asarray(scale_list)
    if scale_list.ndim > 1:
        raise ValueError("Scaling factors vector is not 1d")
    if not scale_list.shape[0] == cube.shape[0]:
        raise ValueError("Scaling factors vector has wrong length")

    if type(scaling) is not tuple:
        scaling = (scaling, scaling)

    if verbose:
        print(f"{z} spectral channels in IFS cube")
        if ncomp_ifs is None:
            print("Combining multi-spectral frames (skipping PCA)")
        else:
            print("First PCA stage exploiting spectral variability")

    if ncomp_ifs is not None and ncomp_ifs > z:
        ncomp_ifs = min(ncomp_ifs, z)
        print(f"Number of PCs too high (max PCs={z}), using {ncomp_ifs} PCs "
              "instead")

    res_cube_channels = np.array([
        _adimsdi_doublepca_ifs(cube, fr, ncomp_ifs, scale_list, scaling[0],
                               mask_center_px, svd_mode, imlib2,
                               interpolation, collapse_ifs,
                               ifs_collapse_range, fwhm, mask_rdi, left_eigv)
        for fr in range(n + nr)
    ])
    if verbose:
        timing(start_time)

    if smooth_first_pass is not None:
        from ..var.filters import cube_filter_lowpass

        res_cube_channels = cube_filter_lowpass(
            res_cube_channels, mode="gauss", fwhm_size=smooth_first_pass,
            verbose=False)

    residuals_cube_channels_ = None
    if ncomp_adi is None:
        if verbose:
            print(f"{n} ADI frames")
            print("De-rotating and combining frames (skipping PCA)")
        residuals_cube_channels_ = cube_derotate(
            res_cube_channels[:n], angle_list, nproc=nproc, imlib=imlib,
            interpolation=interpolation, **rot_options)
        frame = cube_collapse(residuals_cube_channels_, mode=collapse,
                              w=weights)
    else:
        if ncomp_adi > n + nr:
            ncomp_adi = n + nr
            print(f"Number of PCs too high, using maximum of {n} PCs instead")
        if verbose:
            print(f"{n} ADI frames")
            print("Second PCA stage exploiting rotational variability")

        if source_xy is None:
            if "A" in ref_strategy or cube_ref is None:
                res_ifs_adi = _project_subtract(
                    res_cube_channels, None, ncomp_adi, scaling[1],
                    mask_center_px, svd_mode, verbose, False,
                    cube_sig=cube_sig, left_eigv=left_eigv)
            else:
                res_ifs_adi = _project_subtract(
                    res_cube_channels[:n], res_cube_channels[n:], ncomp_adi,
                    scaling[1], mask_center_px, svd_mode, verbose, False,
                    cube_sig=cube_sig, left_eigv=left_eigv)
        else:
            if delta_rot is None or fwhm is None:
                raise TypeError("Delta_rot or fwhm parameters missing. "
                                "Needed for PA-based rejection of frames "
                                "from the library")
            yc, xc = frame_center(cube[0, 0], False)
            x1, y1 = source_xy
            ann_center = dist(yc, xc, y1, x1)
            pa_thr = _compute_pa_thresh(ann_center, fwhm, delta_rot)
            res_ifs_adi = np.zeros((n, y_in, x_in))
            truncate = max_frames_pca is not None
            for fr in range(n):
                ind = _find_indices_adi(angle_list, fr, pa_thr,
                                        truncate=truncate,
                                        max_frames=max_frames_pca)
                res_result = _project_subtract(
                    res_cube_channels[:n],
                    res_cube_channels[n:] if nr else None, ncomp_adi,
                    scaling[1], mask_center_px, svd_mode, verbose, False,
                    ind, fr, cube_sig=cube_sig, left_eigv=left_eigv,
                    min_frames_pca=min_frames_pca)
                res_ifs_adi[fr] = res_result[-1].reshape((y_in, x_in))
        if verbose:
            print("De-rotating and combining residuals")
        if res_ifs_adi.ndim == 2:
            res_ifs_adi = res_ifs_adi.reshape((-1, y_in, x_in))
        residuals_cube_channels_ = cube_derotate(
            res_ifs_adi[:n], angle_list, nproc=nproc, imlib=imlib,
            interpolation=interpolation, **rot_options)
        frame = cube_collapse(residuals_cube_channels_, mode=collapse,
                              w=weights)
        if verbose:
            timing(start_time)
    return res_cube_channels, residuals_cube_channels_, frame


def _adimsdi_doublepca_ifs(array, fr, ncomp, scale_list, scaling,
                           mask_center_px, svd_mode, imlib, interpolation,
                           collapse, ifs_collapse_range, fwhm, mask_rdi=None,
                           left_eigv=False):
    """Per-temporal-frame spectral PCA (reference pca_fullfr.py:1478-1549)."""
    from ..preproc.rescaling import cube_rescaling_wavelengths as scwave
    from ..preproc.skysubtraction import cube_subtract_sky_pca

    z, n, y_in, x_in = array.shape
    multispec_fr = array[:, fr, :, :]

    if ifs_collapse_range == "all":
        idx_ini, idx_fin = 0, z
    else:
        idx_ini, idx_fin = ifs_collapse_range

    if ncomp is None:
        return cube_collapse(multispec_fr[idx_ini:idx_fin])

    cube_resc = scwave(multispec_fr, scale_list, imlib=imlib,
                       interpolation=interpolation, nproc=1)[0]
    if mask_rdi is None:
        residuals = _project_subtract(cube_resc, None, ncomp, scaling,
                                      mask_center_px, svd_mode,
                                      verbose=False, full_output=False,
                                      left_eigv=left_eigv)
    else:
        residuals = np.zeros_like(cube_resc)
        for i in range(z):
            cube_tmp = np.array([cube_resc[i]])
            ref = np.array([cube_resc[j] for j in range(z) if j != i])
            residuals[i] = cube_subtract_sky_pca(cube_tmp, ref, mask_rdi,
                                                 ncomp=ncomp,
                                                 full_output=False)
    frame_i = scwave(residuals[idx_ini:idx_fin], scale_list[idx_ini:idx_fin],
                     full_output=False, inverse=True, y_in=y_in, x_in=x_in,
                     imlib=imlib, interpolation=interpolation,
                     collapse=collapse, nproc=1)
    if mask_center_px:
        frame_i = mask_circle(frame_i, mask_center_px)
    return frame_i


def _project_subtract(cube, cube_ref, ncomp, scaling, mask_center_px,
                      svd_mode, verbose, full_output, indices=None,
                      frame=None, cube_sig=None, left_eigv=False,
                      min_frames_pca=10):
    """PCA projection + model-PSF subtraction (pca_fullfr.py:1552-1737).

    Whole-matrix path runs as one device computation; the per-frame
    (rotation-threshold) path computes a library-sized SVD on device.
    """
    _, y, x = cube.shape

    if not isinstance(ncomp, (int, np.integer, float, np.floating)):
        raise TypeError("Type not recognized for ncomp, should be int or "
                        "float")

    if isinstance(ncomp, (float, np.floating)):
        if not 1 > ncomp > 0:
            raise ValueError("if `ncomp` is float, it must lie in the "
                             "interval (0,1]")
        svdecomp = SVDecomposer(cube, mode="fullfr", svd_mode=svd_mode,
                                scaling=scaling, verbose=verbose)
        _ = svdecomp.get_cevr(plot=False)
        ncomp = svdecomp.cevr_to_ncomp(ncomp)
        if verbose:
            print(f"Components used : {ncomp}")

    ncomp = int(ncomp)
    method = MODE_TO_METHOD.get(str(getattr(svd_mode, "value", svd_mode)))
    if method is None:
        raise ValueError("The SVD `mode` is not recognized")

    discard = bool(left_eigv) and indices is None and frame is None
    matrix = prepare_matrix(cube, scaling, mask_center_px, mode="fullfr",
                            verbose=verbose and indices is None,
                            discard_mask_pix=discard)
    if cube_sig is None:
        matrix_emp = matrix
    else:
        if discard:
            matrix_sig = prepare_matrix(cube_sig, scaling, mask_center_px,
                                        mode="fullfr", verbose=False,
                                        discard_mask_pix=True)
        else:
            matrix_sig = cube_sig.reshape(cube_sig.shape[0], -1)
        matrix_emp = matrix - matrix_sig

    if cube_ref is not None:
        matrix_ref = prepare_matrix(cube_ref, scaling, mask_center_px,
                                    mode="fullfr", verbose=False,
                                    discard_mask_pix=discard)
    else:
        matrix_ref = None

    # per-frame (rotation-threshold) branch
    if indices is not None and frame is not None:
        try:
            ref_lib = matrix_emp[indices]
        except IndexError:
            indices = None
        if cube_ref is None and indices is None:
            raise RuntimeError(
                f"0 frames comply to delta_rot condition < less than "
                f"min_frames_pca ({min_frames_pca}). Try decreasing delta_rot"
                f" or min_frames_pca")
        if cube_ref is not None:
            ref_lib = np.concatenate((ref_lib, matrix_ref))
        if ref_lib.shape[0] < min_frames_pca:
            raise RuntimeError(
                f"{ref_lib.shape[0]} frames comply to delta_rot condition < "
                f"less than min_frames_pca ({min_frames_pca}). Try decreasing"
                f" delta_rot or min_frames_pca")
        if ref_lib.shape[0] < ncomp:
            raise RuntimeError(
                f"{ref_lib.shape[0]} frames comply to delta_rot condition < "
                f"less than ncomp ({ncomp}). Try decreasing the parameter "
                f"delta_rot or ncomp")
        curr_frame = matrix[frame]
        curr_frame_emp = matrix_emp[frame]
        if left_eigv:
            V = svd_wrapper(ref_lib, str(getattr(svd_mode, "value", svd_mode)),
                            ncomp, False, left_eigv=True)
            transformed = np.dot(curr_frame_emp.T, V)
            reconstructed = np.dot(V, transformed.T)
        else:
            V = np.asarray(svd_top(jnp.asarray(ref_lib), ncomp,
                                   method=method))
            transformed = np.dot(curr_frame_emp, V.T)
            reconstructed = np.dot(transformed.T, V)
        residuals = curr_frame - reconstructed
        if full_output:
            return ref_lib.shape[0], residuals, reconstructed
        return ref_lib.shape[0], residuals

    # whole-matrix branch — one device computation
    if left_eigv:
        ref_lib = matrix_emp if matrix_ref is None else matrix_ref
        V = svd_wrapper(ref_lib, str(getattr(svd_mode, "value", svd_mode)),
                        ncomp, verbose, left_eigv=True)
        transformed = np.dot(matrix_emp.T, V)
        reconstructed = np.dot(V, transformed.T)
        residuals = matrix - reconstructed
        residuals_res = reshape_matrix(residuals, y, x)
        if full_output:
            return residuals_res, reconstructed, V
        return residuals_res

    res = project_subtract(
        jnp.asarray(matrix),
        None if matrix_ref is None else jnp.asarray(matrix_ref),
        ncomp, method=method,
        matrix_sig=None,
        full_output=True,
    ) if cube_sig is None else project_subtract(
        jnp.asarray(matrix),
        None if matrix_ref is None else jnp.asarray(matrix_ref),
        ncomp, method=method,
        matrix_sig=jnp.asarray(matrix_sig),
        full_output=True,
    )
    # keep the results device-resident: the residual cube feeds straight
    # into the (device) derotation+collapse, so converting to numpy here
    # would round-trip ~3 cube-sized transfers over the host<->device link
    # per pca() call. Consumers materialize lazily via np.asarray.
    residuals, reconstructed, V = res
    residuals_res = residuals.reshape(residuals.shape[0], y, x)
    if full_output:
        return residuals_res, reconstructed, V
    return residuals_res


def get_pca_coeffs(cube, pcs, ncomp, scaling=None, mask_center_px=None,
                   verbose=True):
    """Weights of each PC for each frame (pca_fullfr.py:1740-1799)."""
    z, y, x = np.shape(cube)
    matrix = prepare_matrix(cube, scaling=scaling,
                            mask_center_px=mask_center_px, mode="fullfr",
                            verbose=verbose)
    V = pcs.reshape(ncomp, -1)
    return np.dot(V, matrix.T)
