"""Contrast curves, throughput and annulus-noise sampling.

TPU rebuild of vip_hci/metrics/contrcurve.py. All aperture photometry
(noise_per_annulus and throughput recovery) runs through the batched exact
device photometry (vip_tpu.ops.apertures); the per-pattern fake-companion
injections use the batched injector. The `algo` stays a black-box callable
for API parity (contrcurve.py:36,86).
"""

from inspect import getfullargspec

import numpy as np
import jax.numpy as jnp
from scipy import stats
from scipy.interpolate import InterpolatedUnivariateSpline
from scipy.signal import savgol_filter

from ..config import time_ini, timing
from ..fm.fakecomp import (cube_inject_companions, frame_inject_companion,
                           normalize_psf)
from ..ops.apertures import aperture_flux as _aperture_flux_device
from ..var.coords import dist, frame_center
from ..var.shapes import disk_coords

__all__ = ["contrast_curve", "throughput", "noise_per_annulus",
           "aperture_flux"]


def aperture_flux(array, yc, xc, fwhm, ap_factor=1, mean=False,
                  verbose=False):
    """Sum (or mean) of pixels in circular apertures (exact overlap;
    reference contrcurve.py:1213-1263)."""
    array = np.asarray(array, dtype=float)
    yc = np.asarray(yc, dtype=float).reshape(-1)
    xc = np.asarray(xc, dtype=float).reshape(-1)
    if mean:
        flux = np.zeros(len(yc))
        for i, (y, x) in enumerate(zip(yc, xc)):
            ind = disk_coords((y, x), (ap_factor * fwhm) / 2, array.shape)
            flux[i] = np.mean(array[ind])
        return flux
    r = (ap_factor * fwhm) / 2
    flux = np.asarray(_aperture_flux_device(jnp.asarray(array), yc, xc, r))
    if verbose:
        for i in range(len(yc)):
            print(f"Coordinates of object {i} : ({yc[i]},{xc[i]})")
            print(f"Object Flux = {flux[i]:.2f}")
    return flux


def noise_per_annulus(array, separation, fwhm, init_rad=None, wedge=(0, 360),
                      verbose=False, debug=False):
    """Noise (std) and mean residual level of FWHM apertures per annulus
    (reference contrcurve.py:1097-1210); photometry batched on device."""
    if array.ndim != 2:
        raise TypeError("Input array is not a frame or 2d array")
    if not isinstance(wedge, tuple):
        raise TypeError("Wedge must be a tuple with the initial and final "
                        "angles")

    def find_coords(rad, sep, init_angle, fin_angle):
        angular_range = fin_angle - init_angle
        npoints = (np.deg2rad(angular_range) * rad) / sep
        ang_step = angular_range / npoints
        i = np.arange(int(npoints))
        x = rad * np.cos(np.deg2rad(ang_step * i + init_angle))
        y = rad * np.sin(np.deg2rad(ang_step * i + init_angle))
        return y, x

    if init_rad is None:
        init_rad = fwhm

    init_angle, fin_angle = wedge
    centery, centerx = frame_center(array)
    n_annuli = int(np.floor((centery - init_rad) / separation)) - 1
    noise = []
    res_level = []
    vector_radd = []
    if verbose:
        print(f"{n_annuli} annuli")

    if debug:
        import matplotlib.pyplot as plt

        _, dbg_ax = plt.subplots(figsize=(6, 6))
        dbg_ax.imshow(array, origin="lower", interpolation="nearest",
                      alpha=0.5, cmap="gray")

    # gather every annulus' aperture centers first so the exact-aperture
    # photometry crosses the host<->device link ONCE (the per-annulus
    # route pays the ~30 ms dispatch round-trip n_annuli times through
    # the remote tunnel)
    ys_all, xs_all, counts = [], [], []
    for i in range(n_annuli):
        y = centery + init_rad + separation * i
        rad = dist(centery, centerx, y, centerx)
        yy, xx = find_coords(rad, fwhm, init_angle, fin_angle)
        ys_all.append(yy + centery)
        xs_all.append(xx + centerx)
        counts.append(yy.shape[0])
        vector_radd.append(rad)

    if n_annuli <= 0:
        return np.array(noise), np.array(res_level), np.array(vector_radd)

    arr_dev = jnp.asarray(np.asarray(array, float))
    fluxes_all = np.asarray(_aperture_flux_device(
        arr_dev, np.concatenate(ys_all), np.concatenate(xs_all), fwhm / 2))

    pos = 0
    for i in range(n_annuli):
        fluxes = fluxes_all[pos:pos + counts[i]]
        pos += counts[i]
        noise.append(np.std(fluxes))
        res_level.append(np.mean(fluxes))
        if debug:
            import matplotlib.pyplot as plt

            for yj, xj in zip(ys_all[i], xs_all[i]):
                dbg_ax.add_patch(plt.Circle((xj, yj), radius=fwhm / 2,
                                            color="r", fill=False,
                                            alpha=0.8))
        if verbose:
            print(f"Radius(px) = {vector_radd[i]}, "
                  f"Noise = {noise[-1]:.3f} ")

    return np.array(noise), np.array(res_level), np.array(vector_radd)


def _check_algo(algo, algo_class):
    argl = getfullargspec(algo).args
    if "cube" in argl and "angle_list" in argl and "verbose" in argl:
        return argl
    algo_name = algo.__name__
    idx = algo.__module__.index(".", algo.__module__.index(".") + 1)
    mod = algo.__module__[:idx]
    tmp = __import__(mod, fromlist=[algo_name.upper() + "_Params"])
    algo_params = getattr(tmp, algo_name.upper() + "_Params")
    argl = [attr for attr in dir(algo_params)]
    if "cube" in argl and "angle_list" in argl and "verbose" in argl:
        return argl
    raise TypeError("Ineligible algo for contrast curve function. algo "
                    "should have parameters 'cube', 'angle_list' and "
                    "'verbose'")


def _process_patterns(cubes_fc, algo, argl, parangles, fwhm_med, algo_dict,
                      batch_patterns, verbose, start_time,
                      pattern_mesh=None):
    """Run ``algo`` over every injected pattern cube.

    Serial black-box calls by default (API parity with reference
    contrcurve.py:584-1096). With ``batch_patterns`` and the native
    full-frame ``pca``, the injected cubes stack on a leading pattern
    axis and reduce in ONE vmapped XLA program (SURVEY §3.3); with a
    ``pattern_mesh`` the pattern axis is laid over the device mesh
    instead (metrics.sharded.sharded_pattern_frames)."""
    if pattern_mesh is not None:
        parsed = _parse_batchable_pca(cubes_fc[0].shape, algo, algo_dict)
        if parsed is not None and parsed["scaling"] is None:
            from .sharded import sharded_pattern_frames

            out = sharded_pattern_frames(
                cubes_fc, np.asarray(parangles, float),
                mesh=pattern_mesh, ncomp=parsed["ncomp"],
                method=parsed["method"], collapse=parsed["collapse"],
                rot_mode=parsed["rot_mode"])
            if verbose:
                print(f"{len(cubes_fc)} patterns processed sharded over "
                      f"{len(pattern_mesh.devices.ravel())} devices")
                timing(start_time)
            return list(np.asarray(out))
        if verbose:
            print("pattern_mesh: algo/params not shardable, falling back")
    if batch_patterns:
        frames = _batched_pca_frames(cubes_fc, parangles, algo, algo_dict)
        if frames is not None:
            if verbose:
                print(f"{len(cubes_fc)} patterns processed in one batched "
                      "program")
                timing(start_time)
            return frames
        if verbose:
            print("batch_patterns: algo/params not batchable, running "
                  "serially")
    frames = []
    for cfc in cubes_fc:
        kwargs = dict(cube=cfc, angle_list=parangles, verbose=False,
                      **algo_dict)
        if "fwhm" in argl:
            kwargs["fwhm"] = fwhm_med
        frames.append(np.asarray(algo(**kwargs)))
        if verbose:
            print(f"Cube with fake companions processed with "
                  f"{algo.__name__}\nMeasuring its annulus-wise throughput")
            timing(start_time)
    return frames


_BATCHABLE_PCA_KEYS = {"ncomp", "scaling", "collapse", "svd_mode", "imlib",
                       "nproc", "interpolation"}


def _parse_batchable_pca(cube_shape, algo, algo_dict):
    """Eligibility + parameter parse shared by the vmapped and sharded
    pattern fast paths; None when not batchable. ``cube_shape`` is the
    shape tuple of one injected cube."""
    if getattr(algo, "__name__", "") != "pca" \
            or not getattr(algo, "__module__", "").startswith("vip_tpu"):
        return None
    if len(cube_shape) != 3:
        return None
    if not set(algo_dict) <= _BATCHABLE_PCA_KEYS:
        return None
    ncomp = algo_dict.get("ncomp", 1)
    if not isinstance(ncomp, (int, np.integer)):
        return None
    svd_mode = str(algo_dict.get("svd_mode", "lapack"))
    method = {"lapack": "lapack", "eigen": "eigen",
              "randsvd": "rand"}.get(svd_mode)
    if method is None:
        return None
    collapse = str(getattr(algo_dict.get("collapse", "median"), "value",
                           algo_dict.get("collapse", "median")))
    imlib = algo_dict.get("imlib", "vip-fft")
    if imlib not in ("vip-fft", "vip-fft-small"):
        return None        # interpolation backends -> serial fallback
    rot_mode = "fft-small" if imlib == "vip-fft-small" else "fft"
    ny, nx = cube_shape[-2:]
    if rot_mode == "fft-small" and (nx % 2 != 0 or ny != nx):
        rot_mode = "fft"   # same even-square guard as cube_derotate
    return dict(ncomp=int(ncomp), method=method, collapse=collapse,
                rot_mode=rot_mode, scaling=algo_dict.get("scaling"))


def _auto_rot_chunk(n_frames, sz, k_patterns, rot_mode):
    """Derotation frame-chunk bounding the FFT shear canvas to ~2 GB
    across the ``k_patterns`` vmapped patterns: the exact mode shears on
    a 4x-padded complex canvas ((4*sz)^2 * 8 B per frame), fft-small on
    a 1.25x one. None (no chunking) when the whole cube fits — small
    test cubes keep their unchunked compiled programs."""
    fac = 4.0 if rot_mode == "fft" else 1.25
    per_frame = (fac * sz) ** 2 * 8
    c = int(2e9 / max(1.0, k_patterns * per_frame))
    if c >= n_frames:
        return None
    return max(1, c)


def _batched_pca_frames(cubes_fc, parangles, algo, algo_dict):
    """All injection patterns through one vmapped full-frame PCA program.
    Returns None when the algo/params combination is not batchable."""
    parsed = _parse_batchable_pca(cubes_fc[0].shape, algo, algo_dict)
    if parsed is None:
        return None
    ncomp, method = parsed["ncomp"], parsed["method"]
    collapse, rot_mode = parsed["collapse"], parsed["rot_mode"]

    import jax

    from ..ops.pipeline import pca_adi_pipeline

    def reduce_one(cube_fc, angs):
        return pca_adi_pipeline(cube_fc, angs, ncomp=int(ncomp),
                                method=method, collapse=collapse,
                                scaling=algo_dict.get("scaling"),
                                chunk=rot_chunk, rot_mode=rot_mode)

    # HBM-aware pattern chunking: vmapping the whole pattern stack
    # multiplies the pipeline's working set (cube + residuals + padded
    # rotation canvases, ~4x the cube) by n_patterns — fine at test
    # scale, OOM at the 1000x512x512 bench scale. Budget ~6 GB of the
    # 16 GB HBM for the vmapped batch; each chunk reuses one compiled
    # program (the tail chunk pads by repeating its last cube).
    bytes_per = int(np.asarray(cubes_fc[0]).nbytes)
    if np.asarray(cubes_fc[0]).dtype.itemsize == 8:
        bytes_per //= 2            # device arrays are f32
    k = max(1, min(len(cubes_fc), int(6e9 / max(1, 4 * bytes_per))))
    n_fr, sz = cubes_fc[0].shape[0], cubes_fc[0].shape[-1]
    rot_chunk = _auto_rot_chunk(n_fr, sz, k, rot_mode)
    fn = jax.jit(jax.vmap(reduce_one, in_axes=(0, None)))
    outs = []
    for lo in range(0, len(cubes_fc), k):
        blk = cubes_fc[lo:lo + k]
        npad = k - len(blk)
        stack = jnp.asarray(np.stack(
            [np.asarray(c, float) for c in blk]
            + [np.asarray(blk[-1], float)] * npad))
        angs = jnp.asarray(np.asarray(parangles, dtype=stack.dtype))
        out = np.asarray(fn(stack, angs))
        outs.extend(list(out if npad == 0 else out[:-npad]))
    return outs


def _batched_pca_frames_lazy(base_cube, psf_stamp, parangles, specs, algo,
                             algo_dict):
    """Injection patterns built ON DEVICE and reduced in one vmapped
    program per chunk.

    Instead of materializing each injected cube on host and shipping it
    over the link (~cube-size per pattern; the tunnel runs at 33-44 MB/s,
    docs/PROFILING.md), the base cube crosses once and every pattern is
    rebuilt inside the jitted program from its ``(rads, fluxes, theta)``
    ladder spec via :func:`vip_tpu.ops.inject.inject_ladder_adi` (exact
    parity with the host injector). ``specs`` is a list of
    ``(rads, fluxes, ang_rad)`` per pattern; ladders are zero-flux padded
    to a common length (an exact no-op). Returns None when the
    algo/params are not batchable."""
    parsed = _parse_batchable_pca(tuple(base_cube.shape), algo, algo_dict)
    if parsed is None:
        return None

    import jax

    from ..ops.inject import inject_ladder_adi
    from ..ops.pipeline import pca_adi_pipeline

    n_pat = len(specs)
    kmax = max(len(s[0]) for s in specs)
    rads = np.zeros((n_pat, kmax))
    flxs = np.zeros((n_pat, kmax))
    angp = np.zeros(n_pat)
    for i, (r, f, a) in enumerate(specs):
        rads[i, :len(r)] = r
        flxs[i, :len(f)] = f
        angp[i] = a

    if isinstance(base_cube, jax.Array) and not isinstance(base_cube,
                                                           np.ndarray):
        base = base_cube           # already device-resident: upload once
    else:
        base = jnp.asarray(np.asarray(base_cube, dtype=float))
    stamp = jnp.asarray(np.asarray(psf_stamp, dtype=float))
    angs = jnp.asarray(np.asarray(parangles, dtype=base.dtype))

    # same HBM budget as _batched_pca_frames (~4x the cube per pattern)
    k = max(1, min(n_pat, int(6e9 / max(1, 4 * base.nbytes))))
    rot_chunk = _auto_rot_chunk(base.shape[0], base.shape[-1], k,
                                parsed["rot_mode"])

    def reduce_one(r, f, a, base, stamp, angs):
        cube_fc = inject_ladder_adi(base, stamp, angs, r, f, a)
        return pca_adi_pipeline(cube_fc, angs, ncomp=int(parsed["ncomp"]),
                                method=parsed["method"],
                                collapse=parsed["collapse"],
                                scaling=parsed["scaling"],
                                chunk=rot_chunk,
                                rot_mode=parsed["rot_mode"])

    fn = jax.jit(jax.vmap(reduce_one, in_axes=(0, 0, 0, None, None, None)))
    outs = []
    for lo in range(0, n_pat, k):
        sl = slice(lo, min(lo + k, n_pat))
        npad = k - (sl.stop - sl.start)
        pad = ((0, npad), (0, 0))
        out = np.asarray(fn(
            jnp.asarray(np.pad(rads[sl], pad, mode="edge")),
            jnp.asarray(np.pad(flxs[sl], pad, mode="edge")),
            jnp.asarray(np.pad(angp[sl], pad[:1], mode="edge")),
            base, stamp, angs))
        outs.extend(list(out if npad == 0 else out[:-npad]))
    return outs


def throughput(cube, angle_list, psf_template, fwhm, algo, nbranch=1,
               theta=0, inner_rad=1, fc_rad_sep=3, wedge=(0, 360), fc_snr=100,
               noise_sep=1, full_output=False, verbose=True,
               algo_class=None, batch_patterns=True, pattern_mesh=None,
               **algo_dict):
    """Algorithm throughput by injection-recovery on radial patterns
    (reference contrcurve.py:584-1096; 4D/IFS branch :950-1077).

    ``batch_patterns`` (default True) uses the one-vmapped-program fast
    path for the native full-frame ``pca`` (all nbranch x fc_rad_sep
    injected cubes reduced at once), falling back to the serial
    per-pattern loop when the algo/params are not batchable; the two
    paths agree to 1e-8 (tests/test_metrics_contrcurve.py)."""
    array = cube
    parangles = np.asarray(angle_list)
    # injection settings ride inside algo_dict exactly as in the reference
    # (contrcurve.py:683-687): shared between the injector and the algo
    nproc = algo_dict.get("nproc", 1)
    imlib = algo_dict.get("imlib", "vip-fft")
    interpolation = algo_dict.get("interpolation", "lanczos4")
    scaling = algo_dict.get("scaling", None)

    if array.ndim not in (3, 4):
        raise TypeError("The input array is not a 3d or 4d cube")
    if array.ndim == 3:
        if array.shape[0] != parangles.shape[0]:
            raise TypeError("Input parallactic angles vector has wrong "
                            "length")
        if psf_template.ndim != 2:
            raise TypeError("Template PSF is not a frame or 2d array")
        maxfcsep = int((array.shape[1] / 2.0) / fwhm) - 1
        if fc_rad_sep < 3 or fc_rad_sep > maxfcsep:
            raise ValueError("Too large separation between companions in the "
                             f"radial patterns. Should lie between 3 and "
                             f"{maxfcsep}")
    else:
        if array.shape[1] != parangles.shape[0]:
            raise TypeError("Input parallactic angles vector has wrong "
                            "length")
        if psf_template.ndim != 3:
            raise TypeError("Template PSF is not a frame, 3d array")

    if psf_template.shape[1] % 2 == 0:
        raise ValueError("Only odd-sized PSF is accepted")
    if not hasattr(algo, "__call__"):
        raise TypeError("Parameter `algo` must be a callable function")
    if not isinstance(inner_rad, int):
        raise TypeError("inner_rad must be an integer")
    angular_range = wedge[1] - wedge[0]
    if nbranch > 1 and angular_range < 360:
        raise RuntimeError("Only a single branch is allowed when working on "
                           "a wedge")

    fwhm_med = np.median(fwhm) if isinstance(fwhm, (np.ndarray, list)) \
        else fwhm

    start_time = time_ini(verbose) if verbose else None

    argl = _check_algo(algo, algo_class)
    # Algo/params eligibility for the device-resident fast paths (the
    # psf-stamp conditions are checked after normalize_psf below). When
    # eligible, the EMPTY reduction also runs through the device reducer
    # (a zero-flux ladder on the already-uploaded base cube) instead of
    # the black-box call — one cube-sized transfer instead of two, and
    # the fused pipeline instead of the host-routed public path. The
    # batched==serial contract (tests/test_metrics_contrcurve.py) pins
    # the equivalence.
    lazy_algo = (batch_patterns and pattern_mesh is None and cube.ndim == 3
                 and algo_dict.get("imlib", "vip-fft") == "vip-fft"
                 and algo_dict.get("scaling") is None
                 and _parse_batchable_pca(tuple(array.shape), algo,
                                          algo_dict) is not None)
    base_dev = None
    if lazy_algo:
        import jax
        import jax.numpy as jnp

        if isinstance(array, jax.Array) and not isinstance(array,
                                                           np.ndarray):
            base_dev = array
        else:
            base_dev = jnp.asarray(np.asarray(array, dtype=float))
        frame_nofc = np.asarray(_batched_pca_frames_lazy(
            base_dev, np.zeros((1, 1)), parangles,
            [(np.zeros(1), np.zeros(1), 0.0)], algo, algo_dict)[0])
    elif "fwhm" in argl:
        frame_nofc = algo(cube=array, angle_list=parangles, fwhm=fwhm_med,
                          verbose=False, **algo_dict)
    else:
        frame_nofc = algo(cube=array, angle_list=parangles, verbose=False,
                          **algo_dict)
    if algo_dict.pop("scaling", None):
        new_algo_dict = algo_dict.copy()
        new_algo_dict["scaling"] = None
        if "fwhm" in argl:
            frame_nofc_noscal = algo(cube=array, angle_list=parangles,
                                     fwhm=fwhm_med, verbose=False,
                                     **new_algo_dict)
        else:
            frame_nofc_noscal = algo(cube=array, angle_list=parangles,
                                     verbose=False, **new_algo_dict)
    else:
        frame_nofc_noscal = frame_nofc

    if verbose:
        print(f"Cube without fake companions processed with {algo.__name__}")
        timing(start_time)

    sep = fwhm_med if noise_sep is None else noise_sep
    noise, res_level, vector_radd = noise_per_annulus(frame_nofc,
                                                      separation=sep,
                                                      fwhm=fwhm_med,
                                                      wedge=wedge)
    noise_noscal, _, _ = noise_per_annulus(frame_nofc_noscal, separation=sep,
                                           fwhm=fwhm_med, wedge=wedge)

    vector_radd = vector_radd[inner_rad - 1:]
    noise = noise[inner_rad - 1:]
    res_level = res_level[inner_rad - 1:]
    noise_noscal = noise_noscal[inner_rad - 1:]
    if verbose:
        print("Measured annulus-wise noise in resulting frame")
        timing(start_time)

    new_psf_size = int(round(3 * fwhm_med))
    if new_psf_size % 2 == 0:
        new_psf_size += 1

    if cube.ndim == 4 and isinstance(fwhm, (int, float)):
        fwhm = [fwhm] * array.shape[0]
    psf_template = normalize_psf(
        psf_template, fwhm=fwhm, verbose=verbose,
        size=min(new_psf_size, psf_template.shape[-1]))

    y, x = array.shape[-2:]
    angle_branch = angular_range / nbranch
    # Device-resident injection fast path (ops/inject.py): eligible for
    # the same algo/params as the batched reducer, 3D cubes, the exact
    # FFT shift backend and a stamp that fits the frame. Injected cubes
    # are then never materialized on host.
    lazy = (batch_patterns and pattern_mesh is None and cube.ndim == 3
            and imlib == "vip-fft" and psf_template.ndim == 2
            and psf_template.shape[-1] <= min(y, x)
            and _parse_batchable_pca(tuple(array.shape), algo,
                                     algo_dict) is not None)
    thruput_arr = np.zeros((nbranch, noise.shape[0]))
    frame_fc_all = np.zeros((nbranch * fc_rad_sep, y, x))
    if cube.ndim == 3:
        fc_map_all = np.zeros((nbranch * fc_rad_sep, y, x))
        cy, cx = frame_center(array[0])
    else:
        fc_map_all = np.zeros((nbranch * fc_rad_sep, array.shape[0], y, x))
        cy, cx = frame_center(array[0, 0])

    def build_pattern(br, irad):
        """Inject the (branch, radial-pattern) companion ladder; returns
        (cube_fc, fc_map, fcy, fcx, fluxes). 3D keeps one azimuth per
        branch (reference contrcurve.py:780-830); 4D steps the azimuth
        with radius, and its injection ignores the branch offset while
        the photometry keeps it (reference contrcurve.py:976-1007,
        reproduced)."""
        radvec = vector_radd[irad::fc_rad_sep]
        if cube.ndim == 4:
            thetavec = list(range(int(theta), int(theta) + 360,
                                  360 // len(radvec)))
        else:
            thetavec = [theta] * len(radvec)
        cube_fc = None if lazy else array.copy()
        fc_map = np.ones_like(fc_map_all[0]) * 1e-6
        fcy, fcx, fluxes = [], [], []
        for i, rad in enumerate(radvec):
            flux = fc_snr * noise_noscal[irad + i * fc_rad_sep]
            inj_theta = thetavec[i] if cube.ndim == 4 \
                else br * angle_branch + thetavec[i]
            if not lazy:
                cube_fc = cube_inject_companions(
                    cube_fc, psf_template, parangles, flux, rad_dists=[rad],
                    theta=inj_theta, nproc=nproc, imlib=imlib,
                    interpolation=interpolation, copy_array=False,
                    verbose=False)
            ang = np.deg2rad(br * angle_branch + thetavec[i])
            yi = cy + rad * np.sin(ang)
            xi = cx + rad * np.cos(ang)
            fc_map = frame_inject_companion(fc_map, psf_template, yi, xi,
                                            flux, imlib, interpolation)
            fcy.append(yi)
            fcx.append(xi)
            fluxes.append(flux)
        if lazy:
            spec = (np.asarray(radvec, dtype=float),
                    np.asarray(fluxes, dtype=float),
                    float(np.deg2rad(br * angle_branch + theta)))
            return spec, fc_map, fcy, fcx
        return cube_fc, fc_map, fcy, fcx

    patterns = [(br, irad) for br in range(nbranch)
                for irad in range(fc_rad_sep)]
    built = []
    for br, irad in patterns:
        built.append(build_pattern(br, irad))
        if verbose:
            print(f"Fake companions injected in branch {br + 1} "
                  f"(pattern {irad + 1}/{fc_rad_sep})")
            timing(start_time)

    if lazy:
        frames_fc = _batched_pca_frames_lazy(
            array if base_dev is None else base_dev, psf_template,
            parangles, [b[0] for b in built], algo, algo_dict)
        if verbose:
            print(f"{len(built)} patterns injected on device and processed "
                  "in one batched program")
            timing(start_time)
    else:
        frames_fc = _process_patterns(
            [b[0] for b in built], algo, argl, parangles, fwhm_med,
            algo_dict, batch_patterns, verbose, start_time,
            pattern_mesh=pattern_mesh)

    # annulus-wise throughput of every pattern; photometry of ALL
    # patterns batches into a constant number of device dispatches
    # (reference does 2 per pattern, contrcurve.py:1030-1068)
    from ..ops.apertures import aperture_flux_images

    fcys = [b[2] for b in built]
    fcxs = [b[3] for b in built]
    recovered = aperture_flux_images(
        [np.asarray(frames_fc[k]) - frame_nofc for k in
         range(len(patterns))], fcys, fcxs, fwhm_med / 2)
    if cube.ndim == 4:
        inj_per_ch = [aperture_flux_images([b[1][ch] for b in built],
                                           fcys, fcxs, fwhm[ch] / 2)
                      for ch in range(array.shape[0])]
        injected = [np.mean([inj_per_ch[ch][k]
                             for ch in range(array.shape[0])], axis=0)
                    for k in range(len(patterns))]
    else:
        injected = aperture_flux_images([b[1] for b in built], fcys, fcxs,
                                        fwhm_med / 2)

    for k, (br, irad) in enumerate(patterns):
        ratio = recovered[k] / injected[k]
        thruput_arr[br, irad::fc_rad_sep] = np.where(ratio < 0, 0, ratio)
        fc_map_all[br * fc_rad_sep + irad] = built[k][1]
        frame_fc_all[br * fc_rad_sep + irad] = frames_fc[k]

    if verbose:
        print(f"Finished measuring the throughput in {nbranch} branches")
        timing(start_time)

    if full_output:
        return (thruput_arr, noise, res_level, vector_radd, frame_fc_all,
                frame_nofc, fc_map_all)
    return thruput_arr, vector_radd


def contrast_curve(cube, angle_list, psf_template, fwhm, pxscale, starphot,
                   algo, sigma=5, nbranch=1, theta=0, inner_rad=1,
                   fc_rad_sep=3, noise_sep=1, wedge=(0, 360), fc_snr=100,
                   student=True, transmission=None, smooth=True,
                   interp_order=2, plot=True, dpi=100, debug=False,
                   verbose=True, full_output=False, save_plot=None,
                   object_name=None, frame_size=None, fix_y_lim=(),
                   figsize=(8, 5), algo_class=None, batch_patterns=True,
                   pattern_mesh=None, **algo_dict):
    """Contrast curve at ``sigma`` confidence with the [MAW14] small-sample
    correction (reference contrcurve.py:29-580)."""
    import pandas as pd

    if cube.ndim != 3 and cube.ndim != 4:
        raise TypeError("The input array is not a 3d or 4d cube")
    if cube.ndim == 3 and cube.shape[0] != angle_list.shape[0]:
        raise TypeError("Input parallactic angles vector has wrong length")
    if cube.ndim == 4 and cube.shape[1] != angle_list.shape[0]:
        raise TypeError("Input parallactic angles vector has wrong length")
    if cube.ndim == 3 and psf_template.ndim != 2:
        raise TypeError("Template PSF is not a frame (for ADI case)")
    if cube.ndim == 4 and psf_template.ndim != 3:
        raise TypeError("Template PSF is not a cube (for ADI+IFS case)")
    if transmission is not None:
        transmission = np.asarray(transmission, dtype=float)
        if len(transmission) != 2 and len(transmission) != cube.shape[0] + 1:
            raise TypeError("transmission vector should have 2 or 1+n_ch "
                            "rows")

    if isinstance(fwhm, (np.ndarray, list)):
        fwhm_med = np.median(fwhm)
    else:
        fwhm_med = fwhm

    if verbose:
        start_time = time_ini()
        if isinstance(starphot, float) or isinstance(starphot, int):
            msg0 = "ALGO : {}, FWHM = {}, # BRANCHES = {}, SIGMA = {}, "
            msg0 += "STARPHOT = {}"
            print(msg0.format(algo.__name__, fwhm_med, nbranch, sigma,
                              starphot))
        else:
            msg0 = "ALGO : {}, FWHM = {}, # BRANCHES = {}, SIGMA = {}"
            print(msg0.format(algo.__name__, fwhm_med, nbranch, sigma))

    verbose_thru = False
    if verbose == 2:
        verbose_thru = True

    res_throug = throughput(cube, angle_list, psf_template, fwhm, algo=algo,
                            nbranch=nbranch, theta=theta, inner_rad=inner_rad,
                            fc_rad_sep=fc_rad_sep, wedge=wedge, fc_snr=fc_snr,
                            noise_sep=noise_sep, full_output=True,
                            verbose=verbose_thru, algo_class=algo_class,
                            batch_patterns=batch_patterns,
                            pattern_mesh=pattern_mesh, **algo_dict)
    vector_radd = res_throug[3]
    if res_throug[0].shape[0] > 1:
        thruput_mean = np.nanmean(res_throug[0], axis=0)
    else:
        thruput_mean = res_throug[0][0]
    frame_fc_all = res_throug[4]
    frame_nofc = res_throug[5]
    fc_map_all = res_throug[6]

    if verbose:
        print("Finished the throughput calculation")
        timing(start_time)

    if transmission is not None:
        t_nz = transmission.shape[0]
        diag = np.sqrt(2) * cube.shape[-1]
        if transmission[0, 0] != 0 or transmission[0, -1] < diag:
            trans_rad_list = transmission[0].tolist()
            ntransmission = None
            for j in range(t_nz - 1):
                trans_list = transmission[j + 1].tolist()
                if transmission[0, 0] != 0:
                    if j == 0:
                        trans_rad_list = [0] + trans_rad_list
                    trans_list = [0] + trans_list
                if transmission[0, -1] < np.sqrt(2) * cube.shape[-1] / 2.0:
                    if j == 0:
                        trans_rad_list = trans_rad_list + [diag]
                    trans_list = trans_list + [1]
                if j == 0:
                    ntransmission = np.zeros([t_nz, len(trans_rad_list)])
                    ntransmission[0] = trans_rad_list
                ntransmission[j + 1] = trans_list
            transmission = ntransmission.copy()
        if t_nz > 2:
            ntransmission = np.zeros([2, transmission.shape[1]])
            ntransmission[0] = transmission[0]
            ntransmission[1] = np.mean(transmission[1:], axis=0)
            transmission = ntransmission.copy()

    if interp_order is not None or noise_sep is not None:
        if noise_sep is None:
            rad_samp = vector_radd
            noise_samp = res_throug[1]
            res_lev_samp = res_throug[2]
        else:
            noise_samp, res_lev_samp, rad_samp = noise_per_annulus(
                frame_nofc, separation=noise_sep, fwhm=fwhm_med,
                init_rad=fwhm_med, wedge=wedge)
        radmin = vector_radd.astype(int).min()
        cutin1 = np.where(rad_samp.astype(int) == radmin)[0][0]
        noise_samp = noise_samp[cutin1:]
        res_lev_samp = res_lev_samp[cutin1:]
        rad_samp = rad_samp[cutin1:]
        radmax_fwhm = int(((cube.shape[-1] - 1) // 2) - fwhm_med / 2)
        radmax = min(vector_radd.astype(int).max(), radmax_fwhm)
        radtmp = radmax
        if len(np.where(rad_samp.astype(int) == radmax)[0]) == 0:
            while len(np.where(rad_samp.astype(int) == radtmp)[0]) == 0:
                radtmp -= 1
        cutin2 = np.where(rad_samp.astype(int) == radtmp)[0][0]
        noise_samp = noise_samp[: cutin2 + 1]
        res_lev_samp = res_lev_samp[: cutin2 + 1]
        rad_samp = rad_samp[: cutin2 + 1]

        if interp_order is not None:
            f = InterpolatedUnivariateSpline(vector_radd, thruput_mean,
                                             k=interp_order)
            thruput_interp = f(rad_samp)
        else:
            thruput_interp = thruput_mean.copy()

        if transmission is not None:
            f2 = InterpolatedUnivariateSpline(transmission[0],
                                              transmission[1], k=1)
            thruput_interp *= f2(rad_samp)
    else:
        rad_samp = vector_radd
        noise_samp = res_throug[1]
        res_lev_samp = res_throug[2]
        thruput_interp = thruput_mean
        if transmission is not None:
            if not transmission[1].shape == thruput_interp.shape:
                raise ValueError("Transmiss. and throughput vectors have "
                                 "different length")
            thruput_interp *= transmission[1]

    rad_samp_arcsec = rad_samp * pxscale

    # reference zeroes the residual level (contrcurve.py:356-358)
    res_lev_samp = np.zeros_like(res_lev_samp)

    if smooth:
        win = min(noise_samp.shape[0] - 2, int(2 * fwhm_med))
        if win % 2 == 0:
            win += 1
        noise_samp_sm = savgol_filter(noise_samp, polyorder=2,
                                      mode="nearest", window_length=win)
        res_lev_samp_sm = savgol_filter(res_lev_samp, polyorder=2,
                                        mode="nearest", window_length=win)
    else:
        noise_samp_sm = noise_samp
        res_lev_samp_sm = res_lev_samp

    starphot_val = starphot if isinstance(starphot, (float, int)) \
        else np.median(starphot)
    cont_curve_samp = ((sigma * noise_samp_sm + res_lev_samp_sm)
                       / thruput_interp) / starphot_val
    cont_curve_samp[np.where(cont_curve_samp < 0)] = 1
    cont_curve_samp[np.where(cont_curve_samp > 1)] = 1

    if student:
        n_res_els = np.floor(rad_samp / fwhm_med * 2 * np.pi)
        ss_corr = np.sqrt(1 + 1 / n_res_els)
        sigma_corr = stats.t.ppf(stats.norm.cdf(sigma),
                                 n_res_els - 1) * ss_corr
        cont_curve_samp_corr = ((sigma_corr * noise_samp_sm
                                 + res_lev_samp_sm)
                                / thruput_interp) / starphot_val
        cont_curve_samp_corr[np.where(cont_curve_samp_corr < 0)] = 1
        cont_curve_samp_corr[np.where(cont_curve_samp_corr > 1)] = 1

    if debug:
        import matplotlib.pyplot as plt

        # throughput: computed samples vs interpolation
        plt.figure(figsize=figsize, dpi=dpi)
        plt.plot(np.asarray(vector_radd) * pxscale, thruput_mean, ".",
                 label="computed", alpha=0.6)
        plt.plot(rad_samp_arcsec, thruput_interp, ",-",
                 label="interpolated", lw=2, alpha=0.5)
        plt.grid("on", which="both", alpha=0.2, linestyle="solid")
        plt.xlabel("Angular separation [arcsec]")
        plt.ylabel("Throughput")
        plt.legend(loc="best")
        plt.xlim(0, np.max(rad_samp_arcsec))
        # noise: raw vs smoothed
        plt.figure(figsize=figsize, dpi=dpi)
        plt.plot(rad_samp_arcsec, noise_samp, ".", label="computed",
                 alpha=0.6)
        if smooth:
            plt.plot(rad_samp_arcsec, noise_samp_sm, ",-",
                     label="noise smoothed", lw=2, alpha=0.5)
        plt.grid("on", alpha=0.2, linestyle="solid")
        plt.xlabel("Angular separation [arcsec]")
        plt.ylabel("Noise")
        plt.legend(loc="best")
        plt.xlim(0, np.max(rad_samp_arcsec))

    if plot or debug:
        import matplotlib.pyplot as plt

        plt.figure(figsize=figsize, dpi=dpi)
        plt.plot(rad_samp_arcsec, cont_curve_samp, "-",
                 label=f"{sigma} sigma contrast")
        if student:
            plt.plot(rad_samp_arcsec, cont_curve_samp_corr, "--",
                     label=f"{sigma} sigma contrast (Student)")
        plt.yscale("log")
        plt.xlabel("Angular separation [arcsec]")
        plt.ylabel(f"{sigma} sigma contrast")
        plt.legend()
        if object_name is not None and frame_size is not None:
            ncomp = algo_dict.get("ncomp")
            pca_type = "ADI" if algo_dict.get("cube_ref") is None else "RDI"
            plt.title(f"{pca_type} {object_name} {ncomp}pc {frame_size} "
                      f"+ {inner_rad}", fontsize=14)
        if len(fix_y_lim) == 2:
            plt.ylim(min(fix_y_lim), max(fix_y_lim))
        if save_plot is not None:
            plt.savefig(save_plot, dpi=dpi)

    if debug:
        import matplotlib.pyplot as plt

        # delta-magnitude view of the same sensitivity curves
        plt.figure(figsize=figsize, dpi=dpi)
        with np.errstate(divide="ignore"):
            plt.plot(rad_samp_arcsec, -2.5 * np.log10(cont_curve_samp),
                     ".-", alpha=0.4, color="green",
                     label="Sensitivity (Gaussian)")
            if student:
                plt.plot(rad_samp_arcsec,
                         -2.5 * np.log10(cont_curve_samp_corr), ".-",
                         alpha=0.4, color="blue",
                         label="Sensitivity (Student-t correction)")
        plt.legend(fancybox=True, fontsize="medium")
        plt.xlabel("Angular separation [arcsec]")
        plt.ylabel("Delta magnitude")
        plt.gca().invert_yaxis()
        plt.grid("on", which="both", alpha=0.2, linestyle="solid")

    if student:
        datafr = pd.DataFrame({
            "sensitivity_gaussian": cont_curve_samp,
            "sensitivity_student": cont_curve_samp_corr,
            "throughput": thruput_interp,
            "distance": rad_samp,
            "distance_arcsec": rad_samp_arcsec,
            "noise": noise_samp_sm,
            "residual_level": res_lev_samp_sm,
            "sigma corr": sigma_corr,
        })
    else:
        datafr = pd.DataFrame({
            "sensitivity_gaussian": cont_curve_samp,
            "throughput": thruput_interp,
            "distance": rad_samp,
            "distance_arcsec": rad_samp_arcsec,
            "noise": noise_samp_sm,
            "residual_level": res_lev_samp_sm,
        })

    if full_output:
        return datafr, frame_fc_all, frame_nofc, fc_map_all
    return datafr
