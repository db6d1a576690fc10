"""Sub-pixel shifting and cube recentering.

TPU rebuild of vip_hci/preproc/recentering.py. ``frame_shift`` ('vip-fft')
reproduces the reference's pad→phase-ramp→ifft→crop math
(recentering.py:66-254) on device; ``cube_shift`` batches all frames in one
vmapped computation with a shared pad margin. Registration methods:
DFT upsampling (GUI08, batched on device; masked Padfield variant),
satellite spots, radon transform (PUE15, vmapped device program), per-frame
2-d fits, and speckle cross-correlation.
"""

import jax
import numpy as np
import jax.numpy as jnp

from ..config.utils_conf import check_array
from ..ops.fft import fourier_shift, fourier_shift_batch, fourier_shift_np
from ..var.coords import frame_center

__all__ = ["frame_shift", "cube_shift", "frame_center_radon",
           "frame_center_satspots", "cube_recenter_2dfit",
           "cube_recenter_dft_upsampling", "cube_recenter_radon",
           "cube_recenter_satspots", "cube_recenter_via_speckles"]


def frame_shift(array, shift_y, shift_x, imlib="vip-fft",
                interpolation="lanczos4", border_mode="reflect"):
    """Shift a 2d array by (shift_y, shift_x) px.

    'vip-fft' is bit-parity with the reference path (per-call pad margin
    ceil(max|shift|), recentering.py:127); 'ndimage-fourier' and
    'ndimage-interp' use scipy on host; 'opencv' uses cv2.
    """
    check_array(array, dim=2)
    array = np.asarray(array)

    if imlib == "vip-fft":
        npad = int(np.ceil(np.amax(np.abs([shift_y, shift_x]))))
        # host numpy path: eager per-call pads (ceil(max|shift|)) would
        # compile one device program PER distinct canvas size — see
        # fourier_shift_np's docstring. Same geometry, float64 like the
        # reference (recentering.py:126-189).
        return fourier_shift_np(array, shift_y, shift_x, npad)
    elif imlib == "ndimage-fourier":
        from scipy.ndimage import fourier_shift as sp_fourier_shift

        shifted = sp_fourier_shift(np.fft.fftn(array), (shift_y, shift_x))
        return np.fft.ifftn(shifted).real
    elif imlib == "ndimage-interp":
        from scipy.ndimage import shift as sp_shift

        order = {"nearneig": 0, "bilinear": 1, "biquadratic": 2, "bicubic": 3,
                 "biquartic": 4, "lanczos4": 4, "biquintic": 5}[interpolation]
        return sp_shift(array, (shift_y, shift_x), order=order,
                        mode=border_mode)
    elif imlib == "opencv":
        import cv2

        intp = {"bilinear": cv2.INTER_LINEAR, "bicubic": cv2.INTER_CUBIC,
                "nearneig": cv2.INTER_NEAREST,
                "lanczos4": cv2.INTER_LANCZOS4}[interpolation]
        bormo = {"mirror": cv2.BORDER_REFLECT_101,
                 "reflect": cv2.BORDER_REFLECT, "wrap": cv2.BORDER_WRAP,
                 "constant": cv2.BORDER_CONSTANT,
                 "nearest": cv2.BORDER_REPLICATE}[border_mode]
        image = np.float32(array)
        yy, xx = image.shape
        M = np.float32([[1, 0, shift_x], [0, 1, shift_y]])
        return cv2.warpAffine(image, M, (xx, yy), flags=intp,
                              borderMode=bormo)
    raise ValueError("Image transformation library not recognized")


def cube_shift(cube, shift_y, shift_x, imlib="vip-fft",
               interpolation="lanczos4", border_mode="reflect", nproc=None):
    """Shift every frame of a cube; scalar or per-frame shift values.

    The 'vip-fft' path runs one batched device computation. To keep XLA
    shapes static the pad margin is shared (max over frames) — the FFT
    shift itself is identical; only the zero-pad halo differs, which for
    per-frame margins matches the reference to ~machine precision of the
    wrap-around leakage.

    Precision note (ADVICE r4): ``frame_shift`` computes on host in
    float64 while this batched path runs the device kernel, which is
    float32 unless ``jax_enable_x64`` is on — a scalar and a batched
    shift of the same frame can differ by ~1e-6 in f32 production runs.
    """
    check_array(cube, dim=3)
    cube = np.asarray(cube)
    n = cube.shape[0]
    shift_y = np.broadcast_to(np.asarray(shift_y, float), (n,)).copy()
    shift_x = np.broadcast_to(np.asarray(shift_x, float), (n,)).copy()

    if imlib == "vip-fft":
        # group frames by per-frame pad margin for bit-parity with the
        # reference's per-call npad (few distinct values in practice)
        npads = np.ceil(np.maximum(np.abs(shift_y),
                                   np.abs(shift_x))).astype(int)
        out = np.empty_like(cube, dtype=float)
        for npad in np.unique(npads):
            sel = npads == npad
            res = fourier_shift_batch(jnp.asarray(cube[sel]),
                                      jnp.asarray(shift_y[sel]),
                                      jnp.asarray(shift_x[sel]), int(npad))
            out[sel] = np.asarray(res)
        return out
    return np.stack([
        frame_shift(cube[i], shift_y[i], shift_x[i], imlib=imlib,
                    interpolation=interpolation, border_mode=border_mode)
        for i in range(n)
    ])


def _plot_shifts(shift_x, shift_y, extra=None):
    """The two diagnostic figures every cube_recenter_* draws when
    plot=True (reference recentering.py:649-666,1359-1375,1624-1648,
    2113-2129): per-frame shift curves + shift histograms."""
    import matplotlib.pyplot as plt

    plt.figure(figsize=(8, 4))
    plt.plot(shift_x, "o-", label="Shifts in x", alpha=0.5)
    plt.plot(shift_y, "o-", label="Shifts in y", alpha=0.5)
    plt.legend(loc="best")
    plt.grid("on", alpha=0.2)
    plt.ylabel("Pixels")
    plt.xlabel("Frame number")

    plt.figure(figsize=(8, 4))
    b = max(1, int(np.sqrt(len(shift_x))))
    plt.hist(shift_x, bins=b, alpha=0.5, label="Histogram shifts X")
    plt.hist(shift_y, bins=b, alpha=0.5, label="Histogram shifts Y")
    if extra is not None:
        for vec, lab in extra:
            plt.hist(vec, bins=b, alpha=0.5, label=f"Histogram {lab}")
    plt.legend(loc="best")
    plt.ylabel("Bin counts")
    plt.xlabel("Pixels")


def cube_recenter_dft_upsampling(array, center_fr1=None, negative=False,
                                 fwhm=4, subi_size=None, upsample_factor=100,
                                 imlib="vip-fft", interpolation="lanczos4",
                                 mask=None, border_mode="reflect",
                                 log=False, collapse="median",
                                 full_output=False, verbose=True, nproc=None,
                                 save_shifts=False, debug=False, plot=True):
    """Register a cube against its first frame with upsampled
    cross-correlation ([GUI08]; reference recentering.py:1142-1410).

    The cross-correlation and the matrix-multiply DFT refinement run
    batched on device. With ``mask``, the masked normalized
    cross-correlation (Padfield 2012) is used instead. With ``subi_size``,
    an extra 2-d Gaussian fit of the collapsed registered cube absolutely
    centers the whole sequence.
    """
    from ..ops.registration import (dft_registration_batch,
                                    masked_register_translation)

    check_array(array, dim=3)
    array = np.asarray(array, dtype=float)
    n = array.shape[0]
    cy, cx = frame_center(array[0])

    if mask is not None and mask.shape != array.shape[-2:]:
        raise TypeError("If provided, mask should have same shape as "
                        "frames")
    if subi_size is not None:
        if center_fr1 is None:
            print("`center_fr1` not provided")
            print("Using the coordinates of the 1st frame center for "
                  "the Gaussian 2d fit")
            cy_1, cx_1 = frame_center(array[0])
        else:
            cy_1, cx_1 = center_fr1
        if not isinstance(subi_size, int):
            raise ValueError("subi_size must be an integer or None")
        if subi_size < fwhm:
            raise ValueError("`subi_size` (value in pixels) is too small")
        if array.shape[-1] % 2 == subi_size % 2:
            subi_size += 1

    array_reg = array.copy()
    if log:
        array_reg -= np.nanmin(array_reg) - 1
        array_reg = np.log(array_reg)

    if mask is not None:
        shifts = np.zeros((n, 2))
        for i in range(1, n):
            shifts[i] = masked_register_translation(array_reg[0],
                                                    array_reg[i], mask)
    else:
        ref = array_reg[0]
        shifts = dft_registration_batch(jnp.asarray(ref),
                                        jnp.asarray(array_reg[1:]),
                                        upsample_factor=int(
                                            upsample_factor))
        # dft_registration returns the (skimage-convention) shift to apply
        # to each frame to register it onto the reference
        shifts = np.vstack([np.zeros((1, 2)), np.asarray(shifts)])

    y = shifts[:, 0].copy()
    x = shifts[:, 1].copy()

    if subi_size is not None:
        from ..preproc.subsampling import cube_collapse

        array_shifted = cube_shift(array, y, x, imlib=imlib,
                                   interpolation=interpolation,
                                   border_mode=border_mode)
        marray_al = cube_collapse(array_shifted, mode=collapse)
        y1, x1 = _centroid_2dg_frame([np.asarray(marray_al)], 0, subi_size,
                                     cy_1, cx_1, negative, debug, fwhm)
        x[:] += cx - x1
        y[:] += cy - y1
        if verbose:
            print("Shift for first frame X,Y=({:.3f}, {:.3f})".format(
                x[0], y[0]))

    array_rec = cube_shift(array, y, x, imlib=imlib,
                           interpolation=interpolation,
                           border_mode=border_mode)
    if verbose:
        print("Median shifts: dy={:.3f}, dx={:.3f}".format(np.median(y),
                                                           np.median(x)))
    if plot:
        _plot_shifts(x, y)
    if save_shifts:
        np.savetxt("recent_dft_shifts.txt", np.transpose([y, x]), fmt="%f")
    if full_output:
        return array_rec, y, x
    return array_rec


# ----------------------------------------------------------------------
# satellite-spot centering


def frame_center_satspots(array, xy, subi_size=19, sigfactor=6, shift=False,
                          fit_type="moff", filter_freq=(0, 0),
                          border_mode="reflect", imlib="vip-fft",
                          interpolation="lanczos4", debug=False,
                          verbose=True):
    """Find the frame center from four satellite spots: 2-d fits of the
    spots, then the intersection of the two diagonals via Cramer's rule
    (reference recentering.py:308-519)."""
    from ..var.fit_2d import fit_2dgaussian, fit_2dmoffat
    from ..var.filters import frame_filter_highpass, frame_filter_lowpass
    from ..var.shapes import get_square

    def line(p1, p2):
        A = p1[1] - p2[1]
        B = p2[0] - p1[0]
        C = p1[0] * p2[1] - p2[0] * p1[1]
        return A, B, -C

    def intersection(L1, L2):
        D = L1[0] * L2[1] - L1[1] * L2[0]
        Dx = L1[2] * L2[1] - L1[1] * L2[2]
        Dy = L1[0] * L2[2] - L1[2] * L2[0]
        if D != 0:
            return Dx / D, Dy / D
        return None

    check_array(array, dim=2)
    if fit_type not in ["gaus", "moff"]:
        raise TypeError("fit_type is not recognized")
    if not isinstance(xy, (tuple, list)) or len(xy) != 4:
        raise TypeError("Input waffle spot coordinates in wrong format "
                        "(must be a tuple of 4 tuples")

    cy, cx = frame_center(array)
    centx, centy, subims = [], [], []

    if filter_freq[0] > 0:
        array = frame_filter_highpass(array, mode="gauss-subt",
                                      fwhm_size=filter_freq[0])
    if filter_freq[1] > 0:
        array = frame_filter_lowpass(array, fwhm_size=filter_freq[1])

    for i in range(len(xy)):
        sim, y, x = get_square(array, subi_size, xy[i][1], xy[i][0],
                               position=True, verbose=False)
        if fit_type == "gaus":
            cent2dgy, cent2dgx = fit_2dgaussian(
                sim, crop=False, threshold=True, sigfactor=sigfactor,
                debug=debug, full_output=False)
        else:
            cent2dgy, cent2dgx = fit_2dmoffat(
                sim, crop=False, threshold=True, sigfactor=sigfactor,
                debug=debug, full_output=False)
        centx.append(cent2dgx + x)
        centy.append(cent2dgy + y)
        subims.append(sim)

    L1 = line([centx[0], centy[0]], [centx[3], centy[3]])
    L2 = line([centx[1], centy[1]], [centx[2], centy[2]])
    R = intersection(L1, L2)

    msgerr = "Check that the order of the tuples in `xy` is correct and" \
             " the satellite spots have good S/N"
    if R is not None:
        shiftx = cx - R[0]
        shifty = cy - R[1]
        if np.abs(shiftx) < cx * 2 and np.abs(shifty) < cy * 2:
            if debug or verbose:
                print("Intersection coordinates (X,Y):", R[0], R[1], "\n")
                print("Shifts (X,Y): {:.3f}, {:.3f}".format(shiftx, shifty))
            if shift:
                array_rec = frame_shift(array, shifty, shiftx, imlib=imlib,
                                        interpolation=interpolation,
                                        border_mode=border_mode)
                return array_rec, shifty, shiftx, centy, centx
            return shifty, shiftx
        raise RuntimeError("Too large shifts. " + msgerr)
    raise RuntimeError("Something went wrong, no intersection found. " +
                       msgerr)


def cube_recenter_satspots(array, xy, subi_size=19, sigfactor=6, plot=True,
                           fit_type="moff", lbda=None, filter_freq=(0, 0),
                           border_mode="constant", imlib="vip-fft",
                           interpolation="lanczos4", debug=False,
                           verbose=True, full_output=False):
    """Recenter a cube using the satellite spots of every frame
    (reference recentering.py:522-680)."""
    check_array(array, dim=3)
    n_frames = array.shape[0]
    shift_x = np.zeros(n_frames)
    shift_y = np.zeros(n_frames)
    sat_y = np.zeros([n_frames, 4])
    sat_x = np.zeros([n_frames, 4])
    array_rec = []

    if lbda is not None:
        cy, cx = frame_center(array[0])
        final_xy = []
        rescal = np.asarray(lbda) / lbda[0]
        for i in range(n_frames):
            xy_new = tuple((cx + rescal[i] * (xy[s][0] - cx),
                            cy + rescal[i] * (xy[s][1] - cy))
                           for s in range(4))
            final_xy.append(xy_new)
    else:
        final_xy = [xy for _ in range(n_frames)]

    if verbose:
        print("Final xy positions for sat spots:", final_xy)
        print("Looping through the frames, fitting the intersections:")
    for i in range(n_frames):
        res = frame_center_satspots(array[i], final_xy[i], debug=debug,
                                    shift=True, subi_size=subi_size,
                                    sigfactor=sigfactor, fit_type=fit_type,
                                    filter_freq=filter_freq, imlib=imlib,
                                    interpolation=interpolation,
                                    verbose=False, border_mode=border_mode)
        array_rec.append(res[0])
        shift_y[i] = res[1]
        shift_x[i] = res[2]
        sat_y[i] = res[3]
        sat_x[i] = res[4]

    if verbose:
        print("MEAN X,Y: {:.3f}, {:.3f}".format(np.mean(shift_x),
                                                np.mean(shift_y)))
        print("MEDIAN X,Y: {:.3f}, {:.3f}".format(np.median(shift_x),
                                                  np.median(shift_y)))
        print("STDDEV X,Y: {:.3f}, {:.3f}".format(np.std(shift_x),
                                                  np.std(shift_y)))
    if plot:
        _plot_shifts(shift_x, shift_y)
    array_rec = np.array(array_rec)
    if full_output:
        return array_rec, shift_y, shift_x, sat_y, sat_x
    return array_rec


# ----------------------------------------------------------------------
# radon-transform centering ([PUE15])


def radon(image, theta, circle=True):
    """Radon transform (skimage.transform.radon semantics: order-1 warp
    about shape//2, column sums), evaluated as one batched device program
    over all angles."""
    img = jnp.asarray(image, dtype=float)
    n = img.shape[0]
    center = n // 2
    theta = jnp.atleast_1d(jnp.asarray(theta, dtype=float))

    yy, xx = jnp.mgrid[0:n, 0:n]

    def rotate_sum(angle):
        a = jnp.deg2rad(angle)
        cos_a = jnp.cos(a)
        sin_a = jnp.sin(a)
        x0 = xx - center
        y0 = yy - center
        xs = cos_a * x0 + sin_a * y0 + center
        ys = -sin_a * x0 + cos_a * y0 + center
        x0f = jnp.floor(xs).astype(int)
        y0f = jnp.floor(ys).astype(int)
        wx = xs - x0f
        wy = ys - y0f

        def sample(yi, xi):
            valid = (yi >= 0) & (yi < n) & (xi >= 0) & (xi < n)
            return jnp.where(valid,
                             img[jnp.clip(yi, 0, n - 1),
                                 jnp.clip(xi, 0, n - 1)], 0.0)

        rot = ((1 - wy) * (1 - wx) * sample(y0f, x0f)
               + (1 - wy) * wx * sample(y0f, x0f + 1)
               + wy * (1 - wx) * sample(y0f + 1, x0f)
               + wy * wx * sample(y0f + 1, x0f + 1))
        return jnp.sum(rot, axis=0)

    sino = jax.vmap(rotate_sum)(theta).T
    return np.asarray(sino)


def _satspots_theta(satspots_cfg, theta_0, delta_theta, samples=10):
    """Angle samples around the satellite-spot directions
    (reference recentering.py:1017-1049)."""
    if satspots_cfg == "+":
        starts = [0, 90, 180, 270]
        return np.hstack([np.linspace(s - delta_theta, s + delta_theta,
                                      samples, endpoint=False)
                          for s in starts])
    if satspots_cfg == "x":
        starts = [45, 135, 225, 315]
        return np.hstack([np.linspace(s - delta_theta, s + delta_theta,
                                      samples, endpoint=False)
                          for s in starts])
    if satspots_cfg == "custom":
        starts = [theta_0, theta_0 + 90, theta_0 + 180, theta_0 + 270]
        return np.hstack([np.linspace(s - delta_theta, s + delta_theta,
                                      samples, endpoint=False)
                          for s in starts])
    raise ValueError("If not None, satspots_cfg can only be 'x', '+' or "
                     "'custom'.")


def _radon_costf(frame, cent, radint, coords, satspots_cfg=None, theta_0=0,
                 delta_theta=5, imlib="vip-fft", interpolation="lanczos4"):
    """Radon cost function of frame_center_radon
    (reference recentering.py:997-1057)."""
    from ..var.shapes import get_annulus_segments

    frame_shifted = frame_shift(frame, coords[0], coords[1], imlib=imlib,
                                interpolation=interpolation)
    frame_shifted_ann = get_annulus_segments(frame_shifted, radint,
                                             cent - radint, mode="mask")[0]
    if satspots_cfg is None:
        theta = np.linspace(0, 360, num=frame_shifted_ann.shape[0],
                            endpoint=False)
    else:
        theta = _satspots_theta(satspots_cfg, theta_0, delta_theta)
    sinogram = radon(frame_shifted_ann, theta=theta, circle=True)
    qstep = len(theta) // 4
    sort_sin = [np.nanmax(sinogram[int(cent), i * qstep:(i + 1) * qstep])
                for i in range(4)]
    return np.nansum(sort_sin)


def frame_center_radon(array, cropsize=None, hsize_ini=1., step_ini=0.1,
                       n_iter=5, tol=0.1, mask_center=None, nproc=None,
                       satspots_cfg=None, theta_0=0, delta_theta=5,
                       gauss_fit=True, hpf=True, filter_fwhm=8,
                       imlib="vip-fft", interpolation="lanczos4",
                       full_output=False, verbose=True, plot=True,
                       debug=False):
    """Find the star center behind a coronagraph via iterative Radon-cost
    grid search ([PUE15]; reference recentering.py:683-994)."""
    from ..var.fit_2d import fit_2dgaussian
    from ..var.filters import frame_filter_highpass
    from ..var.shapes import get_annulus_segments
    from ..preproc.cosmetics import frame_crop

    if array.ndim != 2:
        raise TypeError("Input array is not a frame or 2d array")

    def _center_radon(array, cropsize, hsize, step):
        frame = array.copy()
        ori_cent_y, ori_cent_x = frame_center(frame)
        if cropsize is not None:
            if not cropsize % 2:
                raise TypeError("If not None, cropsize should be odd "
                                "integer")
            frame = frame_crop(frame, cropsize, verbose=False)
        listyx = np.linspace(start=-hsize, stop=hsize,
                             num=int(2 * hsize / step) + 1, endpoint=True)
        if not mask_center:
            radint = 0
        else:
            if not isinstance(mask_center, int):
                raise TypeError
            radint = mask_center
        coords = [(y, x) for y in listyx for x in listyx]
        cent, _ = frame_center(frame)
        frame = get_annulus_segments(frame, radint, cent - radint,
                                     mode="mask")[0]
        # grid-point costs through the pool_map shim (threaded when
        # nproc>1, mirroring the reference's pool at recentering.py:877)
        from ..config.utils_conf import iterable, pool_map

        costf = np.array(pool_map(
            nproc, _radon_costf, frame, cent, radint, iterable(coords),
            satspots_cfg, theta_0, delta_theta, imlib, interpolation))
        cost_bound = costf.reshape(listyx.shape[0], listyx.shape[0])

        if plot:
            import matplotlib.pyplot as plt

            plt.contour(cost_bound, cmap="CMRmap", origin="lower")
            plt.imshow(cost_bound, cmap="CMRmap", origin="lower",
                       interpolation="nearest")
            plt.colorbar()
            plt.grid("off")
            plt.show()

        if gauss_fit:
            fit_res = fit_2dgaussian(cost_bound - np.amin(cost_bound),
                                     crop=False, threshold=False,
                                     sigfactor=3, debug=debug,
                                     full_output=True)
            opt_yind = float(fit_res["centroid_y"].iloc[0])
            opt_xind = float(fit_res["centroid_x"].iloc[0])
            opt_yshift = -hsize + opt_yind * step
            opt_xshift = -hsize + opt_xind * step
            unc_y = float(fit_res["fwhm_y"].iloc[0]) * step
            unc_x = float(fit_res["fwhm_x"].iloc[0]) * step
            dyx = (unc_y, unc_x)
        else:
            argm = np.argmax(costf)
            opt_yshift, opt_xshift = coords[argm]
            dyx = (step, step)

        optimy = ori_cent_y - opt_yshift
        optimx = ori_cent_x - opt_xshift
        if verbose:
            print("Cost function max: {}".format(costf.max()))
            print("Finished grid search radon optimization: dy={:.3f}, "
                  "dx={:.3f}".format(opt_yshift, opt_xshift))
        return optimy, optimx, opt_yshift, opt_xshift, dyx, cost_bound

    if hpf:
        array = frame_filter_highpass(array, mode="gauss-subt",
                                      fwhm_size=filter_fwhm)

    ori_cent_y, ori_cent_x = frame_center(array)
    hsize = hsize_ini
    step = step_ini
    opt_yshift = 0
    opt_xshift = 0
    dyx = (step, step)
    cost_bound = None
    for i in range(n_iter):
        if verbose:
            print("*** Iteration {}/{} ***".format(i + 1, n_iter))
        res = _center_radon(array, cropsize, hsize, step)
        _, _, y_shift, x_shift, dyx, cost_bound = res
        array = frame_shift(array, y_shift, x_shift, imlib=imlib,
                            interpolation=interpolation)
        opt_yshift += y_shift
        opt_xshift += x_shift

        abs_shift = np.sqrt(y_shift**2 + x_shift**2)
        if abs_shift < tol:
            if i == 0:
                raise ValueError("Null shifts found at first iteration for "
                                 "step = {}. Try with a finer step."
                                 .format(step))
            print("Convergence found after {} iterations (final step = {})."
                  .format(i + 1, step))
            break
        hsize *= 0.75
        step *= 0.75

    optimy = ori_cent_y + opt_yshift
    optimx = ori_cent_x + opt_xshift
    if verbose:
        print("Star (x,y) location: {:.2f}, {:.2f}".format(optimx, optimy))
        print("Final (x,y) shifts: {:.2f}, {:.2f}".format(opt_xshift,
                                                          opt_yshift))
    if full_output:
        return optimy, optimx, dyx, cost_bound
    return optimy, optimx


def cube_recenter_radon(array, full_output=False, verbose=True,
                        imlib="vip-fft", interpolation="lanczos4",
                        border_mode="reflect", nproc=None, **kwargs):
    """Recenter a cube frame by frame with the Radon method
    (reference recentering.py:1060-1139)."""
    check_array(array, dim=3)
    n_frames = array.shape[0]
    x = np.zeros(n_frames)
    y = np.zeros(n_frames)
    dyx = np.zeros((n_frames, 2))
    cy, cx = frame_center(array[0])
    array_rec = array.copy()
    for i in range(n_frames):
        res = frame_center_radon(array[i], verbose=False, plot=False,
                                 imlib=imlib, interpolation=interpolation,
                                 full_output=True, nproc=nproc, **kwargs)
        y[i] = res[0]
        x[i] = res[1]
        dyx[i] = res[2]
        array_rec[i] = frame_shift(array[i], cy - y[i], cx - x[i],
                                   imlib=imlib, interpolation=interpolation,
                                   border_mode=border_mode)
    if full_output:
        return array_rec, y - cy, x - cx, dyx
    return array_rec


# ----------------------------------------------------------------------
# 2-d fit centering


def _centroid_2dg_frame(cube, frnum, size, pos_y, pos_x, negative, debug,
                        fwhm, threshold=False, sigfactor=1):
    """2-d Gaussian centroid of one frame (reference
    recentering.py:1662-1679)."""
    from ..var.fit_2d import fit_2dgaussian
    from ..var.shapes import get_square

    sub_image, y1, x1 = get_square(cube[frnum], size=size, y=pos_y, x=pos_x,
                                   position=True)
    if negative:
        sub_image = -sub_image + np.abs(np.min(-sub_image))
    y_i, x_i = fit_2dgaussian(sub_image, crop=False, fwhmx=fwhm, fwhmy=fwhm,
                              threshold=threshold, sigfactor=sigfactor,
                              debug=debug, full_output=False)
    return y1 + y_i, x1 + x_i


def _centroid_2dm_frame(cube, frnum, size, pos_y, pos_x, negative, debug,
                        fwhm, threshold=False, sigfactor=1):
    """2-d Moffat centroid of one frame (reference
    recentering.py:1680-1696)."""
    from ..var.fit_2d import fit_2dmoffat
    from ..var.shapes import get_square

    sub_image, y1, x1 = get_square(cube[frnum], size=size, y=pos_y, x=pos_x,
                                   position=True)
    if negative:
        sub_image = -sub_image + np.abs(np.min(-sub_image))
    y_i, x_i = fit_2dmoffat(sub_image, crop=False, fwhm=fwhm, debug=debug,
                            threshold=threshold, sigfactor=sigfactor,
                            full_output=False)
    return y1 + y_i, x1 + x_i


def _centroid_2da_frame(cube, frnum, size, pos_y, pos_x, negative, debug,
                        fwhm, threshold=False, sigfactor=1):
    """2-d Airy centroid of one frame (reference
    recentering.py:1697-1713)."""
    from ..var.fit_2d import fit_2dairydisk
    from ..var.shapes import get_square

    sub_image, y1, x1 = get_square(cube[frnum], size=size, y=pos_y, x=pos_x,
                                   position=True)
    if negative:
        sub_image = -sub_image + np.abs(np.min(-sub_image))
    y_i, x_i = fit_2dairydisk(sub_image, crop=False, fwhm=fwhm,
                              threshold=threshold, sigfactor=sigfactor,
                              full_output=False, debug=debug)
    return y1 + y_i, x1 + x_i


def _centroid_2d2g_frame(cube, frnum, size, pos_y, pos_x, debug=False,
                         fwhm=4, fix_neg=True, params_2g=None,
                         threshold=False, sigfactor=1):
    """2-d double-Gaussian centroid of one frame (reference
    recentering.py:1714-1748)."""
    from ..var.fit_2d import fit_2d2gaussian

    size = min(cube[frnum].shape[0], cube[frnum].shape[1], size)
    fwhm_neg, fwhm_pos = 0.8 * fwhm, 2 * fwhm
    theta_neg, theta_pos, neg_amp = 0., 0., 1
    if isinstance(params_2g, dict):
        fwhm_neg = params_2g.get("fwhm_neg", 0.8 * fwhm)
        fwhm_pos = params_2g.get("fwhm_pos", 2 * fwhm)
        theta_neg = params_2g.get("theta_neg", 0.)
        theta_pos = params_2g.get("theta_pos", 0.)
        neg_amp = params_2g.get("neg_amp", 1)
    res_DF = fit_2d2gaussian(cube[frnum], crop=True, cent=(pos_x, pos_y),
                             cropsize=size, fwhm_neg=fwhm_neg,
                             fwhm_pos=fwhm_pos, neg_amp=neg_amp,
                             fix_neg=fix_neg, theta_neg=theta_neg,
                             theta_pos=theta_pos, threshold=threshold,
                             sigfactor=sigfactor, full_output=True,
                             debug=debug)
    y_i = res_DF["centroid_y"]
    x_i = res_DF["centroid_x"]
    if not fix_neg:
        return (y_i, x_i, res_DF["centroid_y_neg"],
                res_DF["centroid_x_neg"], res_DF["fwhm_x"],
                res_DF["fwhm_y"], res_DF["fwhm_x_neg"],
                res_DF["fwhm_y_neg"], res_DF["theta"],
                res_DF["theta_neg"], res_DF["amplitude"],
                res_DF["amplitude_neg"])
    return y_i, x_i


def cube_recenter_2dfit(array, xy=None, fwhm=4, subi_size=5, model="gauss",
                        nproc=1, imlib="vip-fft", interpolation="lanczos4",
                        offset=None, negative=False, threshold=False,
                        sigfactor=2, fix_neg=False, params_2g=None,
                        border_mode="reflect", save_shifts=False,
                        full_output=False, verbose=True, debug=False,
                        plot=True):
    """Recenter a cube with per-frame 2-d fits (gauss/moff/airy/2gauss)
    (reference recentering.py:1411-1659)."""
    if verbose:
        from ..config import time_ini, timing
        start_time = time_ini()
    check_array(array, dim=3)
    n_frames, sizey, sizex = array.shape
    if not isinstance(subi_size, int):
        raise ValueError("`subi_size` must be an integer")
    if sizey % 2 == 0:
        if subi_size % 2 != 0:
            subi_size += 1
            print("`subi_size` is odd (while frame size is even)")
            print("Setting `subi_size` to {} pixels".format(subi_size))
    else:
        if subi_size % 2 == 0:
            subi_size += 1
            print("`subi_size` is even (while frame size is odd)")
            print("Setting `subi_size` to {} pixels".format(subi_size))
    if isinstance(fwhm, (float, int, np.float32, np.float64)):
        fwhm = np.ones(n_frames) * fwhm
    if debug and array.shape[0] > 20:
        raise RuntimeWarning("Debug with a big array will produce a very "
                             "long output. Try with less than 20 frames in "
                             "debug mode")

    if xy is not None:
        pos_x, pos_y = xy
        cond = model != "2gauss"
        if (not isinstance(pos_x, int) or not isinstance(pos_y, int)) \
                and cond:
            raise TypeError("`xy` must be a tuple of integers")
    else:
        pos_y, pos_x = frame_center(array[0])

    cy, cx = frame_center(array[0])
    array_rec = np.empty_like(array)

    if model == "gauss":
        func = _centroid_2dg_frame
    elif model == "moff":
        func = _centroid_2dm_frame
    elif model == "airy":
        func = _centroid_2da_frame
    elif model == "2gauss":
        func = _centroid_2d2g_frame
    else:
        raise ValueError("model not recognized")

    if verbose:
        print("2d {}-fitting".format(model))
    # per-frame host fits ride the pool_map shim (threaded when nproc>1,
    # mirroring the reference's fork pool at recentering.py:1583-1591)
    from ..config.utils_conf import iterable, pool_map

    if model == "2gauss":
        args = [array, iterable(range(n_frames)), subi_size, pos_y, pos_x,
                debug, iterable(fwhm), fix_neg, params_2g, threshold,
                sigfactor]
    else:
        args = [array, iterable(range(n_frames)), subi_size, pos_y, pos_x,
                negative, debug, iterable(fwhm), threshold, sigfactor]
    res = pool_map(nproc, func, *args)

    y = cy - np.array([res[i][0] for i in range(len(res))])
    x = cx - np.array([res[i][1] for i in range(len(res))])

    if model == "2gauss" and not fix_neg:
        y_neg = np.array([res[i][2] for i in range(len(res))])
        x_neg = np.array([res[i][3] for i in range(len(res))])
        fwhm_x = np.array([res[i][4] for i in range(len(res))])
        fwhm_y = np.array([res[i][5] for i in range(len(res))])
        fwhm_neg_x = np.array([res[i][6] for i in range(len(res))])
        fwhm_neg_y = np.array([res[i][7] for i in range(len(res))])
        theta = np.array([res[i][8] for i in range(len(res))])
        theta_neg = np.array([res[i][9] for i in range(len(res))])
        amp_pos = np.array([res[i][10] for i in range(len(res))])
        amp_neg = np.array([res[i][11] for i in range(len(res))])

    if offset is not None:
        offx, offy = offset
        y -= offy
        x -= offx

    for i in range(n_frames):
        if debug:
            print("\nShifts in X and Y")
            print(x[i], y[i])
        array_rec[i] = frame_shift(array[i], y[i], x[i], imlib=imlib,
                                   interpolation=interpolation,
                                   border_mode=border_mode)
    if verbose:
        timing(start_time)
    if plot:
        extra = None
        if model == "2gauss" and not fix_neg:
            extra = [(cx - x_neg, "shifts X (neg gaussian)"),
                     (cy - y_neg, "shifts Y (neg gaussian)")]
        _plot_shifts(x, y, extra=extra)
    if save_shifts:
        np.savetxt("recent_gauss_shifts.txt", np.transpose([y, x]),
                   fmt="%f")
    if full_output:
        if model == "2gauss" and not fix_neg:
            return (array_rec, y, x, y_neg, x_neg, fwhm_x, fwhm_y,
                    fwhm_neg_x, fwhm_neg_y, theta, theta_neg, amp_pos,
                    amp_neg)
        return array_rec, y, x
    return array_rec


def _fit_2dannulus(array, fwhm=4, crop=False, cent=None, cropsize=15,
                   ann_rad=0.5, ann_width=0.5, sampl_cen=0.1, sampl_rad=None,
                   unc_in=2.):
    """Donut-PSF center from an annulus-flux grid search
    (reference recentering.py:2154-2247)."""
    from ..stats.utils_stats import frame_basic_stats
    from ..var.shapes import get_square

    if cent is None:
        ceny, cenx = frame_center(array)
    else:
        cenx, ceny = cent
    if crop:
        x_sub_px = cenx % 1
        y_sub_px = ceny % 1
        imside = array.shape[0]
        psf_subimage, suby, subx = get_square(array, min(cropsize, imside),
                                              int(ceny), int(cenx),
                                              position=True)
        ceny, cenx = frame_center(psf_subimage)
        ceny += y_sub_px
        cenx += x_sub_px
        array = psf_subimage

    ann_sz = ann_width * fwhm
    grid_sh_x = np.arange(-unc_in, unc_in, sampl_cen)
    grid_sh_y = np.arange(-unc_in, unc_in, sampl_cen)
    if sampl_rad is None:
        rads = [ann_rad * fwhm]
    else:
        rads = np.arange(0.5 * ann_rad * fwhm, 2 * ann_rad * fwhm,
                         sampl_rad)
    flux_ann = np.zeros([grid_sh_x.shape[0], grid_sh_y.shape[0]])
    best_rad = np.zeros([grid_sh_x.shape[0], grid_sh_y.shape[0]])

    for ii, xx in enumerate(grid_sh_x):
        for jj, yy in enumerate(grid_sh_y):
            tmp_tmp = frame_shift(array, yy, xx)
            for rad in rads:
                tmp = frame_basic_stats(tmp_tmp, "annulus",
                                        inner_radius=rad, size=ann_sz,
                                        plot=False)
                if tmp > flux_ann[ii, jj]:
                    flux_ann[ii, jj] = tmp
                    best_rad[ii, jj] = rad
    i_max, j_max = np.unravel_index(np.argmax(flux_ann), flux_ann.shape)
    mean_x = cenx - grid_sh_x[i_max]
    mean_y = ceny - grid_sh_y[j_max]
    if sampl_rad is None:
        return mean_y, mean_x, ann_rad * fwhm
    return mean_y, mean_x, best_rad[i_max, j_max] / fwhm


def cube_recenter_via_speckles(cube_sci, cube_ref=None, alignment_iter=5,
                               gammaval=1, min_spat_freq=0.5,
                               max_spat_freq=3, fwhm=4, upsample_factor=100,
                               debug=False, recenter_median=False,
                               fit_type="gaus", negative=True, crop=True,
                               subframesize=25, mask=None, ann_rad=0.5,
                               ann_rad_search=False, ann_width=0.5,
                               collapse="median", imlib="vip-fft",
                               interpolation="lanczos4",
                               border_mode="reflect", log=True, plot=True,
                               full_output=False, nproc=1, **collapse_args):
    """Recenter a cube with speckle-pattern cross-correlation
    (reference recentering.py:1751-2151)."""
    from ..preproc.cosmetics import cube_crop_frames, frame_crop
    from ..preproc.subsampling import cube_collapse
    from ..var.filters import cube_filter_highpass, cube_filter_lowpass
    from ..var.fit_2d import fit_2dgaussian
    from ..var.shapes import get_square

    check_array(cube_sci, dim=3)
    n, y, x = cube_sci.shape
    gam = gammaval

    if recenter_median and fit_type not in {"gaus", "ann"}:
        raise TypeError("fit type not recognized. Should be 'ann' or "
                        "'gaus'")
    if crop and not subframesize < y:
        raise ValueError("`Subframesize` is too large")

    if cube_ref is not None:
        ref_star = True
        nref = cube_ref.shape[0]
    else:
        ref_star = False

    if crop:
        cube_sci_subframe = cube_crop_frames(cube_sci, subframesize,
                                             force=True, verbose=False)
        if ref_star:
            cube_ref_subframe = cube_crop_frames(cube_ref, subframesize,
                                                 force=True, verbose=False)
    else:
        subframesize = cube_sci.shape[-1]
        cube_sci_subframe = np.copy(cube_sci)
        if ref_star:
            cube_ref_subframe = np.copy(cube_ref)

    ceny, cenx = frame_center(cube_sci_subframe[0])
    print("Sub frame shape: {}".format(cube_sci_subframe.shape))
    print("Center pixel: ({}, {})".format(ceny, cenx))

    cube_sci_lpf = np.copy(cube_sci_subframe)
    if ref_star:
        cube_ref_lpf = np.copy(cube_ref_subframe)
    cube_sci_lpf = cube_sci_lpf - np.min(cube_sci_lpf)
    if ref_star:
        cube_ref_lpf = cube_ref_lpf - np.min(cube_ref_lpf)

    median_size = int(fwhm * max_spat_freq)
    if max_spat_freq > 0:
        cube_sci_hpf = cube_filter_highpass(cube_sci_lpf, "median-subt",
                                            median_size=median_size,
                                            verbose=False)
    else:
        cube_sci_hpf = cube_sci_lpf
    if min_spat_freq > 0:
        cube_sci_lpf = cube_filter_lowpass(cube_sci_hpf, "gauss",
                                           fwhm_size=min_spat_freq * fwhm,
                                           verbose=False)
    else:
        cube_sci_lpf = np.copy(cube_sci_hpf)

    if ref_star:
        if max_spat_freq > 0:
            cube_ref_hpf = cube_filter_highpass(cube_ref_lpf, "median-subt",
                                                median_size=median_size,
                                                verbose=False)
        else:
            cube_ref_hpf = cube_ref_lpf
        if min_spat_freq > 0:
            cube_ref_lpf = cube_filter_lowpass(
                cube_ref_hpf, "gauss", fwhm_size=min_spat_freq * fwhm,
                verbose=False)
        else:
            cube_ref_lpf = np.copy(cube_ref_hpf)

    if ref_star:
        align_cube = np.zeros((1 + n + nref, subframesize, subframesize))
        align_cube[1:(n + 1)] = cube_sci_lpf
        align_cube[(n + 1):(n + 1 + nref)] = cube_ref_lpf
    else:
        align_cube = np.zeros((1 + n, subframesize, subframesize))
        align_cube[1:(n + 1)] = cube_sci_lpf

    n_frames = align_cube.shape[0]
    cum_y_shifts = 0
    cum_x_shifts = 0
    cube_stret = None

    def _recenter_median_frame(frame0):
        if fit_type == "gaus" and negative:
            crop_sz = int(fwhm)
        elif fit_type == "gaus":
            crop_sz = int(3 * fwhm)
        else:
            crop_sz = int(6 * fwhm)
        if not crop_sz % 2:
            if crop_sz > 7:
                crop_sz -= 1
            else:
                crop_sz += 1
        sub_image, y1, x1 = get_square(frame0, size=crop_sz, y=ceny, x=cenx,
                                       position=True)
        if fit_type == "gaus":
            if negative:
                sub_image = -sub_image + np.abs(np.min(-sub_image))
            y_i, x_i = fit_2dgaussian(sub_image, crop=False,
                                      threshold=False, sigfactor=1,
                                      debug=debug, full_output=False)
        else:
            sampl_cen = 1. / upsample_factor
            sampl_rad = fwhm * ann_rad / 10 if ann_rad_search else None
            y_i, x_i, _ = _fit_2dannulus(sub_image, fwhm=fwhm, crop=False,
                                         ann_rad=ann_rad,
                                         sampl_cen=sampl_cen,
                                         sampl_rad=sampl_rad,
                                         ann_width=ann_width, unc_in=2.)
        return ceny - (y1 + y_i), cenx - (x1 + x_i)

    for it in range(alignment_iter):
        align_cube[0] = cube_collapse(align_cube[1:(n + 1)], mode=collapse,
                                      **collapse_args)
        if recenter_median:
            yshift, xshift = _recenter_median_frame(align_cube[0])
            align_cube[0] = frame_shift(align_cube[0], yshift, xshift,
                                        imlib=imlib,
                                        interpolation=interpolation,
                                        border_mode=border_mode)
        if log:
            cube_stret = np.log10((align_cube - np.min(align_cube)
                                   + 1)**gam)
        else:
            cube_stret = align_cube.copy()
        if mask is not None and crop:
            mask_tmp = frame_crop(mask, subframesize)
        else:
            mask_tmp = mask
        res = cube_recenter_dft_upsampling(
            cube_stret, center_fr1=(ceny, cenx),
            upsample_factor=upsample_factor, fwhm=fwhm, subi_size=None,
            full_output=True, verbose=False, plot=False, mask=mask_tmp,
            imlib=imlib, interpolation=interpolation, nproc=nproc)
        cube_stret, y_shift, x_shift = res
        sqsum_shifts = np.sum(np.sqrt(y_shift**2 + x_shift**2))
        print("Square sum of shift vecs: " + str(sqsum_shifts))

        for j in range(1, n_frames):
            align_cube[j] = frame_shift(align_cube[j], y_shift[j],
                                        x_shift[j], imlib=imlib,
                                        interpolation=interpolation,
                                        border_mode=border_mode)
        cum_y_shifts += y_shift
        cum_x_shifts += x_shift

    cum_y_shifts_sci = cum_y_shifts[1:(n + 1)]
    cum_x_shifts_sci = cum_x_shifts[1:(n + 1)]
    cube_reg_sci = cube_shift(cube_sci, cum_y_shifts_sci, cum_x_shifts_sci,
                              imlib=imlib, interpolation=interpolation,
                              border_mode=border_mode)
    if plot:
        _plot_shifts(cum_x_shifts_sci, cum_y_shifts_sci)
    if ref_star:
        cum_y_shifts_ref = cum_y_shifts[(n + 1):]
        cum_x_shifts_ref = cum_x_shifts[(n + 1):]
        cube_reg_ref = cube_shift(cube_ref, cum_y_shifts_ref,
                                  cum_x_shifts_ref, imlib=imlib,
                                  interpolation=interpolation,
                                  border_mode=border_mode)
        if full_output:
            return (cube_reg_sci, cube_reg_ref, cube_sci_lpf, cube_stret,
                    cum_x_shifts_sci, cum_y_shifts_sci, cum_x_shifts_ref,
                    cum_y_shifts_ref)
        return cube_reg_sci, cube_reg_ref
    if full_output:
        return (cube_reg_sci, cube_sci_lpf, cube_stret, cum_x_shifts_sci,
                cum_y_shifts_sci)
    return cube_reg_sci
