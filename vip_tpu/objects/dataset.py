"""High-contrast dataset objects: Frame and Dataset
(reference vip_hci/objects/dataset.py)."""

import numpy as np

from ..config.utils_conf import Saveable, check_array, print_precision
from ..fits import open_fits
from ..fm.fakecomp import (cube_inject_companions,
                           generate_cube_copies_with_injections,
                           normalize_psf)
from ..metrics.detection import detection
from ..metrics.snr_source import frame_report, snr, snrmap
from ..preproc.badframes import (cube_detect_badfr_correlation,
                                 cube_detect_badfr_ellipticity,
                                 cube_detect_badfr_pxstats)
from ..preproc.cosmetics import cube_crop_frames, cube_drop_frames, frame_crop
from ..preproc.derotation import cube_derotate, frame_rotate
from ..preproc.recentering import (cube_recenter_2dfit,
                                   cube_recenter_dft_upsampling,
                                   cube_recenter_radon,
                                   cube_recenter_satspots,
                                   cube_recenter_via_speckles,
                                   frame_center_satspots, frame_shift)
from ..preproc.rescaling import cube_px_resampling, frame_px_resampling
from ..preproc.subsampling import cube_collapse, cube_subsample
from ..stats.distances import cube_distance
from ..stats.im_stats import frame_average_radprofile
from ..stats.utils_stats import (cube_basic_stats, descriptive_stats,
                                 frame_basic_stats)
from ..var.coords import frame_center
from ..var.filters import (cube_filter_highpass, cube_filter_lowpass,
                           frame_filter_highpass, frame_filter_lowpass)
from ..var.shapes import mask_circle

__all__ = ["Dataset", "Frame"]


class Frame:
    """2-d image object with convenience methods
    (reference dataset.py:61-456)."""

    def __init__(self, data, hdu=0, fwhm=None):
        if isinstance(data, str):
            self.data = open_fits(data, hdu, verbose=False)
        else:
            self.data = data
        check_array(self.data, dim=2, msg="Image.data")
        print("Frame shape: {}".format(self.data.shape))
        self.fwhm = fwhm
        if self.fwhm is not None:
            print("FWHM: {}".format(self.fwhm))

    def crop(self, size, xy=None, force=False):
        """Crop the frame (reference dataset.py:90-105)."""
        self.data = frame_crop(self.data, size, xy, force, verbose=True)

    def detect_blobs(self, psf, bkg_sigma=1, method="lpeaks",
                     matched_filter=False, mask=True, snr_thresh=5,
                     plot=True, debug=False, verbose=False,
                     save_plot=None, plot_title=None, angscale=False):
        """Detect point-like sources (reference dataset.py:106-138)."""
        self.detection_results = detection(
            self.data, psf=psf, bkg_sigma=bkg_sigma, mode=method,
            matched_filter=matched_filter, mask=mask,
            snr_thresh=snr_thresh, plot=plot, debug=debug,
            full_output=True, verbose=verbose, save_plot=save_plot,
            plot_title=plot_title)

    def filter(self, method, mode, median_size=5, kernel_size=5,
               fwhm_size=5, btw_cutoff=0.2, btw_order=2, hann_cutoff=5,
               gauss_mode="conv"):
        """Low/high-pass filter the frame (reference dataset.py:139-214)."""
        if method == "hp":
            self.data = frame_filter_highpass(
                self.data, mode, median_size, kernel_size, fwhm_size,
                btw_cutoff, btw_order, hann_cutoff, conv_mode=gauss_mode)
        elif method == "lp":
            self.data = frame_filter_lowpass(self.data, mode, median_size,
                                             fwhm_size, gauss_mode)
        else:
            raise ValueError("Filtering mode not recognized")
        print("Image successfully filtered")

    def get_center(self, verbose=True):
        """Frame center coordinates (reference dataset.py:215-224)."""
        return frame_center(self.data, verbose)

    def plot(self, **kwargs):
        """Plot the frame with matplotlib."""
        import matplotlib.pyplot as plt
        plt.figure()
        plt.imshow(self.data, origin="lower", **kwargs)
        plt.colorbar()
        plt.show()

    def radial_profile(self, sep=1):
        """Average radial profile (reference dataset.py:236-246)."""
        return frame_average_radprofile(self.data, sep=sep, plot=False)

    def recenter(self, method="satspots", xy=None, subi_size=19,
                 sigfactor=6, imlib="vip-fft", interpolation="lanczos4",
                 debug=False, verbose=True):
        """Recenter the frame (reference dataset.py:247-290)."""
        if method == "satspots":
            if xy is None:
                raise ValueError("`xy` must be a tuple of 4 tuples")
            self.data, _, _, _, _ = frame_center_satspots(
                self.data, xy, subi_size, sigfactor, True, "moff", (0, 0),
                "reflect", imlib, interpolation, debug, verbose)
        elif method == "radon":
            pass
        else:
            raise ValueError("Recentering method not recognized")

    def rescale(self, scale, imlib="vip-fft", interpolation="bicubic",
                verbose=True):
        """Resample the frame (reference dataset.py:291-313)."""
        self.data = frame_px_resampling(self.data, scale, imlib,
                                        interpolation, verbose=verbose)

    def rotate(self, angle, imlib="vip-fft", interpolation="lanczos4",
               cxy=None):
        """Rotate the frame (reference dataset.py:314-339)."""
        self.data = frame_rotate(self.data, angle, imlib, interpolation,
                                 cxy)
        print("Image successfully rotated")

    def shift(self, shift_y, shift_x, imlib="vip-fft",
              interpolation="lanczos4"):
        """Shift the frame (reference dataset.py:340-367)."""
        self.data = frame_shift(self.data, shift_y, shift_x, imlib,
                                interpolation)
        print("Image successfully shifted")

    def snr(self, source_xy, plot=False, verbose=True):
        """S/N at a position (reference dataset.py:368-388)."""
        if self.fwhm is None:
            raise ValueError("FWHM has not been set")
        return snr(self.data, source_xy, self.fwhm, False, plot=plot,
                   verbose=verbose)

    def stats(self, region="circle", radius=5, xy=None, annulus_inner_radius=0,
              annulus_width=5, source_xy=None, verbose=True, plot=True):
        """Region statistics + frame report (reference dataset.py:389-456)."""
        res_region = frame_basic_stats(self.data, region, radius, xy,
                                       annulus_inner_radius, annulus_width,
                                       plot=plot, full_output=True)
        if verbose:
            if region == "circle":
                msg = "Stats in circular aperture of radius: {}pxs"
                print(msg.format(radius))
            elif region == "annulus":
                msg = "Stats in annulus. Inner_rad: {}pxs, width: {}pxs"
                print(msg.format(annulus_inner_radius, annulus_width))
            mean_, std_dev, median, maxi = res_region
            msg = "Mean: {:.3f}, Stddev: {:.3f}, Median: {:.3f}, Max: {:.3f}"
            print(msg.format(mean_, std_dev, median, maxi))
        if source_xy is not None and self.fwhm is not None:
            print("Frame S/N info:")
            _ = frame_report(self.data, self.fwhm, source_xy,
                             verbose=verbose)
        return res_region


class Dataset(Saveable):
    """High-contrast imaging dataset: cube + angles + PSF (+ wavelengths)
    (reference dataset.py:459-1604)."""

    _saved_attributes = ["cube", "psf", "psfn", "angles", "fwhm",
                         "wavelengths", "px_scale", "cuberef",
                         "injections_yx"]

    def _set_shape_attrs(self):
        """Derive (w, n, y, x) from the cube shape."""
        if self.cube.ndim == 3:
            self.n, self.y, self.x = self.cube.shape
            self.w = 1
        else:
            self.w, self.n, self.y, self.x = self.cube.shape

    def _post_load(self):
        """Recompute shape-derived attributes after ``Saveable.load``
        (which restores only ``_saved_attributes``)."""
        if isinstance(self.cube, np.ndarray):
            self._set_shape_attrs()

    def __init__(self, cube, hdu=0, angles=None, wavelengths=None,
                 fwhm=None, px_scale=None, psf=None, psfn=None,
                 cuberef=None):
        if isinstance(cube, str):
            self.cube = open_fits(cube, hdu, verbose=False)
        elif isinstance(cube, np.ndarray):
            if not (cube.ndim == 3 or cube.ndim == 4):
                raise ValueError("`Cube` array has wrong dimensions")
            self.cube = cube
        else:
            raise TypeError("`Cube` has a wrong type")

        self._set_shape_attrs()

        if isinstance(cuberef, str):
            self.cuberef = open_fits(cuberef, hdu, verbose=False)
        elif isinstance(cuberef, np.ndarray):
            if cuberef.ndim != self.cube.ndim or \
                    cuberef.shape[-1] != self.cube.shape[-1]:
                raise ValueError("`Cuberef` array has wrong dimensions")
            self.cuberef = cuberef
        elif isinstance(cuberef, Dataset):
            self.cuberef = cuberef.cube
        else:
            self.cuberef = None

        if angles is not None:
            if isinstance(angles, str):
                self.angles = open_fits(angles, verbose=False)
            else:
                self.angles = np.asarray(angles)
            check_array(self.angles, dim=1,
                        msg="Parallactic angles vector")
            if self.angles.shape[0] != self.n:
                raise ValueError("Parallactic angles vector has a wrong "
                                 "shape")
        else:
            self.angles = angles

        if wavelengths is not None:
            if isinstance(wavelengths, str):
                self.wavelengths = open_fits(wavelengths, verbose=False)
            else:
                self.wavelengths = np.asarray(wavelengths)
            check_array(self.wavelengths, dim=1, msg="Wavelengths vector")
        else:
            self.wavelengths = wavelengths

        if psf is not None:
            if isinstance(psf, str):
                self.psf = open_fits(psf, hdu, verbose=False)
            else:
                self.psf = psf
        else:
            self.psf = psf
        self.psfn = psfn
        self.fwhm = fwhm
        self.px_scale = px_scale
        self.injections_yx = None

    def collapse(self, mode="median", n=50):
        """Collapse the cube into a Frame (reference dataset.py:613-618)."""
        frame = cube_collapse(self.cube, mode, n)
        print("Cube successfully collapsed")
        return Frame(np.asarray(frame), fwhm=self.fwhm)

    def crop_frames(self, size, xy=None, force=False):
        """Crop every frame of the cube (reference dataset.py:619-634)."""
        self.cube = cube_crop_frames(self.cube, size, xy, force,
                                     verbose=True)
        if self.cube.ndim == 3:
            self.n, self.y, self.x = self.cube.shape
        else:
            self.w, self.n, self.y, self.x = self.cube.shape

    def derotate(self, imlib="vip-fft", interpolation="lanczos4", cxy=None,
                 nproc=1, border_mode="constant", mask_val=np.nan,
                 edge_blend=None, interp_zeros=False, ker=1):
        """Derotate the cube with the stored angles
        (reference dataset.py:635-704)."""
        if self.angles is None:
            raise ValueError("Parallactic angles vector has not been set")
        self.cube = cube_derotate(self.cube, self.angles, imlib,
                                  interpolation, cxy, nproc, border_mode,
                                  mask_val, edge_blend, interp_zeros, ker)
        print("Cube successfully derotated")

    def drop_frames(self, n, m, verbose=True):
        """Keep only frames n..m (reference dataset.py:705-723)."""
        res = cube_drop_frames(self.cube, n, m, self.angles,
                               verbose=verbose)
        self.cube, self.angles = res
        if self.cube.ndim == 3:
            self.n = self.cube.shape[0]

    def filter(self, method, mode, median_size=5, kernel_size=5,
               fwhm_size=5, btw_cutoff=0.2, btw_order=2, hann_cutoff=5,
               gauss_mode="conv", verbose=True):
        """Filter every frame of the cube (reference dataset.py:724-800)."""
        if method == "hp":
            self.cube = cube_filter_highpass(
                self.cube, mode, verbose=verbose, median_size=median_size,
                kernel_size=kernel_size, fwhm_size=fwhm_size,
                btw_cutoff=btw_cutoff, btw_order=btw_order,
                hann_cutoff=hann_cutoff, conv_mode=gauss_mode)
        elif method == "lp":
            self.cube = cube_filter_lowpass(self.cube, mode,
                                            median_size=median_size,
                                            fwhm_size=fwhm_size,
                                            conv_mode=gauss_mode,
                                            verbose=verbose)
        else:
            raise ValueError("Filtering method not recognized")

    def frame_distances(self, frame, region="full", dist="sad",
                        inner_radius=None, width=None, plot=True):
        """Distances of each frame to a reference frame
        (reference dataset.py:801-823)."""
        return cube_distance(self.cube, frame, region, dist, inner_radius,
                             width, plot=plot)

    def frame_stats(self, region="circle", radius=5, xy=None,
                    annulus_inner_radius=0, annulus_width=5, wavelength=0,
                    plot=True):
        """Per-frame statistics in a region (reference
        dataset.py:824-880)."""
        if self.cube.ndim == 3:
            cube = self.cube
        else:
            cube = self.cube[wavelength]
        return cube_basic_stats(cube, region, radius, xy,
                                annulus_inner_radius, annulus_width,
                                plot=plot, full_output=True)

    def inject_companions(self, flux, rad_dists, n_branches=1, theta=0,
                          imlib="vip-fft", interpolation="lanczos4",
                          full_output=False, verbose=True):
        """Inject fake companions into the cube
        (reference dataset.py:881-972)."""
        if self.angles is None:
            raise ValueError("The PA angles have not been set")
        if self.psfn is None:
            raise ValueError("The normalized PSF array cannot be found")
        if self.px_scale is None:
            raise ValueError("Pixel/plate scale has not been set")
        if self.cube.ndim == 4 and self.wavelengths is None:
            raise ValueError("The wavelengths vector has not been set")

        self.cube, yx = cube_inject_companions(
            self.cube, self.psfn, self.angles, flux, rad_dists,
            self.px_scale, n_branches, theta, imlib, interpolation,
            full_output=True, verbose=verbose)
        if self.injections_yx is None:
            self.injections_yx = []
        self.injections_yx += yx
        if verbose:
            print("Coordinates of the injections stored in "
                  "self.injections_yx")
        if full_output:
            return yx

    def generate_copies_with_injections(self, n_copies, inrad=8, outrad=12,
                                        dist_flux=("uniform", 2, 500)):
        """Yield dataset copies with random injections
        (reference dataset.py:973-1020)."""
        for data in generate_cube_copies_with_injections(
                self.cube, self.psf, self.angles, self.px_scale,
                n_copies=n_copies, inrad=inrad, outrad=outrad,
                dist_flux=dist_flux):
            dsi = self.copy()
            dsi.cube = data["cube"]
            dsi.injections_yx = data["positions"]
            yield dsi

    def get_nbytes(self):
        """Total bytes of the stored arrays (reference
        dataset.py:1021-1035)."""
        return sum(arr.nbytes for arr in
                   [self.cube, self.cuberef, self.angles, self.wavelengths,
                    self.psf, self.psfn]
                   if arr is not None and hasattr(arr, "nbytes"))

    def copy(self, deep=True, check_mem=True):
        """Copy the Dataset (reference dataset.py:1036-1072)."""
        import copy as copy_mod
        if deep:
            if check_mem:
                from ..config.mem import check_enough_memory

                if not check_enough_memory(self.get_nbytes(), 1.5,
                                           verbose=False):
                    raise RuntimeError("copy would require more memory "
                                       "than available.")
            return copy_mod.deepcopy(self)
        return copy_mod.copy(self)

    def load_angles(self, angles, hdu=0):
        """Load the parallactic angles (reference dataset.py:1073-1091)."""
        if isinstance(angles, str):
            self.angles = open_fits(angles, hdu, verbose=False)
        elif isinstance(angles, (list, np.ndarray)):
            self.angles = np.asarray(angles)
        else:
            raise ValueError("Angles format not recognized")

    def load_wavelengths(self, wavelengths, hdu=0):
        """Load the wavelengths vector (reference dataset.py:1092-1113)."""
        if isinstance(wavelengths, str):
            self.wavelengths = open_fits(wavelengths, hdu, verbose=False)
        elif isinstance(wavelengths, (list, np.ndarray)):
            self.wavelengths = np.asarray(wavelengths)
        else:
            raise ValueError("Wavelengths format not recognized")

    def mask_center(self, radius, fillwith=0, mode="in"):
        """Mask the center of every frame (reference
        dataset.py:1114-1131)."""
        self.cube = mask_circle(self.cube, radius, fillwith, mode)

    def normalize_psf(self, fit_fwhm=True, size=None, threshold=None,
                      mask_core=None, model="gauss", imlib="vip-fft",
                      interpolation="lanczos4", force_odd=True,
                      verbose=True):
        """Normalize the PSF template; sets psfn/fwhm
        (reference dataset.py:1132-1214)."""
        if self.psf is None:
            raise ValueError("PSF array has not been loaded")
        if fit_fwhm is True:
            fwhm = "fit"
        elif fit_fwhm:
            fwhm = fit_fwhm
        elif self.fwhm:
            fwhm = self.fwhm
        else:
            fwhm = "fit"
        res = normalize_psf(self.psf, fwhm, size, threshold, mask_core,
                            model, imlib, interpolation, force_odd,
                            full_output=True, verbose=verbose)
        self.psfn, self.aperture_flux, self.fwhm = res
        print("Normalized PSF array shape: {}".format(self.psfn.shape))
        print("The attribute `psfn` contains the normalized PSF")
        print("`fwhm` attribute set to")
        print_precision(self.fwhm)

    def plot(self, **kwargs):
        """Plot frames of the cube with matplotlib."""
        import matplotlib.pyplot as plt
        cube = self.cube if self.cube.ndim == 3 else self.cube[0]
        ncols = min(4, cube.shape[0])
        nrows = int(np.ceil(cube.shape[0] / ncols))
        fig, axes = plt.subplots(nrows, ncols,
                                 figsize=(3 * ncols, 3 * nrows))
        for i, ax in enumerate(np.atleast_1d(axes).ravel()):
            if i < cube.shape[0]:
                ax.imshow(cube[i], origin="lower", **kwargs)
            ax.axis("off")
        plt.show()

    def recenter(self, method="2dfit", xy=None, subi_size=5, model="gauss",
                 nproc=1, imlib="vip-fft", interpolation="lanczos4",
                 offset=None, negative=False, threshold=False,
                 save_shifts=False, cy_1=None, cx_1=None,
                 upsample_factor=100, alignment_iter=5, gamma=1,
                 min_spat_freq=0.5, max_spat_freq=3, recenter_median=False,
                 sigfactor=6, cropsize=101, hsize=0.4, step=0.01,
                 mask_center=None, verbose=True, debug=False, plot=True):
        """Recenter the cube in place (reference dataset.py:1226-1442)."""
        if method == "2dfit":
            if self.fwhm is None:
                raise ValueError("FWHM has not been set")
            self.cube = cube_recenter_2dfit(
                self.cube, xy, self.fwhm, subi_size, model, nproc, imlib,
                interpolation, offset, negative, threshold,
                save_shifts=save_shifts, full_output=False,
                verbose=verbose, debug=debug, plot=plot)
        elif method == "dftups":
            if self.fwhm is None:
                raise ValueError("FWHM has not been set")
            center_fr1 = (cy_1, cx_1) if cy_1 is not None else None
            self.cube = cube_recenter_dft_upsampling(
                self.cube, center_fr1=center_fr1, negative=negative,
                fwhm=self.fwhm, subi_size=subi_size,
                upsample_factor=upsample_factor, imlib=imlib,
                interpolation=interpolation, full_output=False,
                verbose=verbose, save_shifts=save_shifts, debug=debug,
                plot=plot)
        elif method == "dftupspeckles":
            if self.fwhm is None:
                raise ValueError("FWHM has not been set")
            res = cube_recenter_via_speckles(
                self.cube, self.cuberef, alignment_iter, gamma,
                min_spat_freq, max_spat_freq, self.fwhm, upsample_factor,
                debug, recenter_median, "gaus", negative, True, subi_size,
                imlib=imlib, interpolation=interpolation, plot=plot)
            if self.cuberef is None:
                self.cube = res[0]
            else:
                self.cube = res[0]
                self.cuberef = res[1]
        elif method == "satspots":
            self.cube, _, _, _, _ = cube_recenter_satspots(
                self.cube, xy, subi_size, sigfactor, plot, debug=debug,
                verbose=verbose, full_output=True)
        elif method == "radon":
            self.cube = cube_recenter_radon(
                self.cube, full_output=False, verbose=verbose, imlib=imlib,
                interpolation=interpolation, cropsize=cropsize,
                hsize_ini=hsize, step_ini=step, mask_center=mask_center,
                nproc=nproc, debug=debug)
        else:
            raise ValueError("Method not recognized")

    def remove_badframes(self, method="corr", frame_ref=None, crop_size=30,
                         dist="pearson", percentile=20,
                         stat_region="annulus", inner_radius=10, width=10,
                         top_sigma=1.0, low_sigma=1.0, window=None,
                         roundlo=-0.2, roundhi=0.2, lambda_ref=0,
                         plot=True, verbose=True):
        """Identify and remove bad frames (reference
        dataset.py:1443-1564)."""
        if self.cube.ndim == 4:
            cube = self.cube[lambda_ref]
        else:
            cube = self.cube

        if method == "corr":
            if frame_ref is None:
                print("Correlation method selected but `frame_ref` is "
                      "missing")
                print("Setting the 1st frame as the reference")
                frame_ref = 0
            self.good_indices, _ = cube_detect_badfr_correlation(
                cube, frame_ref, crop_size, dist, percentile, plot=plot,
                verbose=verbose)
        elif method == "pxstats":
            self.good_indices, _ = cube_detect_badfr_pxstats(
                cube, stat_region, inner_radius, width, top_sigma,
                low_sigma, window, plot=plot, verbose=verbose)
        elif method == "ellip":
            if self.fwhm is None:
                raise ValueError("FWHM has not been set")
            self.good_indices, _ = cube_detect_badfr_ellipticity(
                cube, self.fwhm, crop_size, roundlo, roundhi, plot=plot,
                verbose=verbose)
        else:
            raise ValueError("Bad frames detection method not recognized")

        if self.cube.ndim == 4:
            self.cube = self.cube[:, self.good_indices]
        else:
            self.cube = self.cube[self.good_indices]
        if verbose:
            print("New cube shape: {}".format(self.cube.shape))
        if self.angles is not None:
            self.angles = self.angles[self.good_indices]
            if verbose:
                print("New parallactic angles vector shape: "
                      "{}".format(self.angles.shape))

    def rescale(self, scale, imlib="ndimage", interpolation="bicubic",
                verbose=True):
        """Resample the cube (reference dataset.py:1565-1588)."""
        self.cube = cube_px_resampling(self.cube, scale, imlib,
                                       interpolation, verbose=verbose)
        if self.cube.ndim == 3:
            self.n, self.y, self.x = self.cube.shape

    def subsample(self, window, mode="mean"):
        """Temporally subsample the cube (reference
        dataset.py:1589-1604)."""
        if self.angles is not None:
            self.cube, self.angles = cube_subsample(
                self.cube, window, mode, parallactic=self.angles)
        else:
            self.cube = cube_subsample(self.cube, window, mode)
