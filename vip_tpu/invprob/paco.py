"""PACO: PAtch COvariance exoplanet detection ([FLA18]).

TPU rebuild of vip_hci/invprob/paco.py. Same class API (PACO / FastPACO /
FullPACO) and identical statistics (shrinkage covariance per pixel track),
but the per-pixel statistics of FastPACO — the reference's serial Python
loop over every pixel (reference paco.py:821-878) — are computed as one
batched device program: patch gathering is a vectorized window gather and
the per-pixel shrinkage covariance + inverse is a chunked vmapped
cholesky-solve on the accelerator.
"""

import sys
from typing import Callable, Optional, Tuple, Union

import numpy as np
import jax.numpy as jnp
from jax import jit, vmap
from functools import partial

from ..fm.fakecomp import normalize_psf
from ..preproc.recentering import frame_shift
from ..preproc.rescaling import cube_px_resampling, frame_px_resampling
from ..var.coords import cart_to_pol, pol_to_cart
from ..metrics.detection import detection

__all__ = ["FastPACO", "FullPACO"]


class PACO:
    """Base PACO class (reference paco.py:49-878): patch statistics and
    ML flux/SNR estimation along rotation tracks."""

    def __init__(self, cube, angles, psf, dit_psf=1.0, dit_science=1.0,
                 nd_transmission=1.0, fwhm=4.0, pixscale=1.0,
                 rescaling_factor=1.0, verbose=False):
        self.cube = np.asarray(cube, dtype=float)
        self.num_frames = self.cube.shape[0]
        self.width = self.cube.shape[2]
        self.height = self.cube.shape[1]
        self.angles = np.asarray(angles, dtype=float)
        self.pixscale = pixscale
        self.rescaling_factor = rescaling_factor
        self.fwhm = int(fwhm / pixscale)

        psf = np.asarray(psf, dtype=float)
        if psf.ndim > 2:
            psf = np.nanmedian(psf, axis=0)
        self.psf = psf * dit_science / dit_psf / nd_transmission
        self.dit_science = dit_science
        self.dit_psf = dit_psf

        mask = create_boolean_circular_mask(self.cube[0].shape,
                                            radius=self.fwhm)
        self.patch_area_pixels = self.cube[0][mask].ravel().shape[0]
        self.patch_width = 2 * int(self.fwhm) + 3
        self.verbose = verbose
        self.snr = None
        self.flux = None
        self.std = None
        if self.verbose:
            print("---------------------- ")
            print("Summary of PACO setup: \n")
            print(f"Image Cube shape = {self.cube.shape}")
            print(f"PIXSCALE = {self.pixscale:06}")
            print(f"Patch width: {self.patch_width}")
            print("---------------------- \n")
            sys.stdout.flush()

    def PACOCalc(self, phi0s, use_subpixel_psf_astrometry=True, cpu=1):
        """Algorithm-specific computation of (a, b)."""
        raise NotImplementedError

    def run(self, cpu=1, imlib="vip-fft", interpolation="lanczos4",
            keep_center=True, use_subpixel_psf_astrometry=True):
        """Full PACO run: returns (snr, flux) maps
        (reference paco.py:202-283)."""
        if self.rescaling_factor != 1:
            self.rescale_cube_and_psf(imlib=imlib,
                                      interpolation=interpolation,
                                      keep_center=keep_center)
        x, y = np.meshgrid(np.arange(0, self.height),
                           np.arange(0, self.width))
        phi0s = np.column_stack((x.flatten(), y.flatten()))

        # NOTE: like the reference (paco.py:223), run() does NOT forward
        # use_subpixel_psf_astrometry to PACOCalc — the PACOCalc default
        # (True) always applies; call PACOCalc directly to override.
        a, b = self.PACOCalc(np.array(phi0s), cpu=cpu)
        a = np.reshape(a, (self.height, self.width))
        b = np.reshape(b, (self.height, self.width))
        snr = b / np.sqrt(a)
        flux = b / a
        self.snr = snr
        self.flux = flux
        self.std = 1 / np.sqrt(a)
        return snr, flux

    def set_cube(self, cube):
        """Replace the science cube."""
        self.cube = np.array(cube)
        self.num_frames = self.cube.shape[0]
        self.width = self.cube.shape[2]
        self.height = self.cube.shape[1]

    def set_psf(self, psf):
        """Replace the PSF template."""
        self.psf = psf

    def set_angles(self, angles):
        """Replace the derotation angles."""
        self.angles = angles

    def get_patch(self, px, width=None, mask=None):
        """Column of circular patches through time at pixel ``px``
        (reference paco.py:329-367)."""
        if width is None:
            width = self.patch_width
        if mask is None:
            mask = create_boolean_circular_mask(self.cube[0].shape,
                                                radius=self.fwhm, center=px)
        k = int(width / 2)
        k2 = k + 1 if width % 2 != 0 else k
        nx, ny = np.shape(self.cube[0])[:2]
        if px[0] + k2 > nx or px[0] - k < 0 or px[1] + k2 > ny \
                or px[1] - k < 0:
            return np.ones((self.num_frames, self.patch_area_pixels)) * np.nan
        return self.cube[np.broadcast_to(mask, self.cube.shape)].reshape(
            self.num_frames, self.patch_area_pixels)

    def set_scale(self, scale):
        """Set the subpixel rescaling factor."""
        self.rescaling_factor = scale

    def rescale_cube_and_psf(self, imlib="vip-fft",
                             interpolation="lanczos4", keep_center=True):
        """Resample cube and PSF by the rescaling factor
        (reference paco.py:381-438)."""
        if self.rescaling_factor == 1:
            if self.verbose:
                print("Scale is 1, no scaling applied.")
            return
        cube_px_resampling(self.cube, self.rescaling_factor, imlib=imlib,
                           interpolation=interpolation,
                           keep_center=keep_center, verbose=False)
        self.pixscale = self.pixscale / self.rescaling_factor
        self.fwhm = int(self.fwhm * self.rescaling_factor)
        if self.psf is not None:
            self.psf = frame_px_resampling(self.psf, self.rescaling_factor,
                                           imlib=imlib,
                                           interpolation=interpolation,
                                           keep_center=keep_center,
                                           verbose=False)
        mask = create_boolean_circular_mask(self.psf.shape, self.fwhm)
        self.patch_area_pixels = self.psf[mask].shape[0]
        self.patch_width = 2 * int(self.fwhm) + 3

    def psf_model_function(self, mean, model: Callable, params: dict):
        """Deprecated analytic-PSF hook (reference paco.py:439-475)."""
        if self.psf is not None:
            return self.psf
        if model is None:
            raise ValueError("Please input either a 2D PSF or a model "
                             "function.")
        self.psf = model(mean, params)
        return self.psf

    def al(self, hfl, Cfl_inv, method=""):
        """a_l sum, eq. 15 of [FLA18] (reference paco.py:476-508)."""
        hfl = np.asarray(hfl)
        Cfl_inv = np.asarray(Cfl_inv)
        return np.einsum("lk,lkj,lj->", hfl, Cfl_inv, hfl)

    def bl(self, hfl, Cfl_inv, r_fl, m_fl, method=""):
        """b_l sum, eq. 16 of [FLA18] (reference paco.py:509-551)."""
        hfl = np.asarray(hfl)
        Cfl_inv = np.asarray(Cfl_inv)
        d = np.asarray(r_fl) - np.asarray(m_fl)
        return np.einsum("lk,lkj,lj->", hfl, Cfl_inv, d)

    def flux_estimate(self, phi0s, eps=0.1, initial_est=[0.0]):
        """Unbiased iterative flux estimate, algorithm 3 of [FLA18]
        (reference paco.py:552-687)."""
        print("Computing unbiased flux estimate...")
        if self.verbose:
            print("Initial guesses:")
            print("Positions: ", phi0s)
            print("Contrasts: ", initial_est)
        dim = self.width / 2
        normalised_psf, norm, fwhm = normalize_psf(
            self.psf, fwhm="fit", size=None, threshold=None, mask_core=None,
            model="airy", imlib="vip-fft", interpolation="lanczos4",
            force_odd=False, full_output=True, verbose=self.verbose,
            debug=False)
        psf_mask = create_boolean_circular_mask(normalised_psf.shape,
                                                radius=self.fwhm)
        hoff = np.zeros((self.num_frames, self.num_frames,
                         self.patch_area_pixels))
        x, y = np.meshgrid(np.arange(-dim, dim), np.arange(-dim, dim))
        ests, stds = [], []
        for i, p0 in enumerate(phi0s):
            p0 = (p0[1], p0[0])
            angles_px = np.array(get_rotated_pixel_coords(x, y, p0,
                                                          self.angles))
            hon = []
            for ll, ang in enumerate(angles_px):
                offax = frame_shift(normalised_psf, ang[1] - int(ang[1]),
                                    ang[0] - int(ang[0]), imlib="vip-fft",
                                    interpolation="lanczos4",
                                    border_mode="reflect")[psf_mask]
                hoff[ll, ll] = offax
                hon.append(offax)
            Cinv, m, patches = self.compute_statistics(
                np.array(angles_px).astype(int))
            Cinlst, mlst, patch = [], [], []
            for ll, ang in enumerate(angles_px):
                Cinlst.append(Cinv[int(ang[0]), int(ang[1])])
                mlst.append(m[int(ang[0]), int(ang[1])])
                patch.append(patches[int(ang[0]), int(ang[1]), ll])
            a = self.al(hon, Cinlst)
            b = self.bl(hon, Cinlst, patch, mlst)
            if self.verbose:
                print(b / a)

            ahat = initial_est[i]
            aprev = 1e10
            while np.abs(ahat - aprev) > np.abs(ahat * eps):
                m_it = np.zeros((self.num_frames, self.patch_area_pixels))
                Cinv_it = np.zeros((self.num_frames, self.patch_area_pixels,
                                    self.patch_area_pixels))
                for ll, ang in enumerate(angles_px):
                    apatch = self.get_patch(ang.astype(int))
                    m_it[ll], Cinv_it[ll] = self.iterate_flux_calc(
                        ahat, apatch, hoff[ll])
                a = self.al(hon, Cinv_it)
                b = self.bl(hon, Cinv_it, patch, m_it)
                aprev = ahat
                ahat = b / a
                if self.verbose:
                    print(f"Flux estimate: {ahat / norm}")
            ests.append(np.abs(ahat / norm))
            stds.append(1 / np.sqrt(a) / norm)
        print("Extracted contrasts")
        print("-------------------")
        for i in range(len(phi0s)):
            print(f"x: {phi0s[i][0]}, y: {phi0s[i][1]}, flux: {ests[i]}"
                  f"±{stds[i]}")
        return ests, stds, norm

    def iterate_flux_calc(self, est, patch, model):
        """Iterative mean/covariance update after removing ``est * model``
        (reference paco.py:688-717)."""
        if patch is None:
            return None, None
        unbiased = np.array([apatch - est * model
                             for apatch in patch])
        return compute_statistics_at_pixel(unbiased)

    def subpixel_threshold_detect(self, snr_map, threshold, mode="lpeaks",
                                  bkg_sigma=5.0, matched_filter=False,
                                  mask=True, full_output=False, cpu=1):
        """Blob detection on the SNR map via vip detection
        (reference paco.py:718-786)."""
        peaks = detection(snr_map, fwhm=self.fwhm,
                          psf=self.psf / np.nanmax(self.psf), mode=mode,
                          bkg_sigma=bkg_sigma, matched_filter=matched_filter,
                          mask=mask, snr_thresh=threshold, nproc=cpu,
                          plot=False, debug=False, full_output=full_output,
                          verbose=self.verbose)
        if full_output:
            return peaks.T
        return peaks

    def pixel_threshold_detection(self, snr_map, threshold):
        """Local maxima above a threshold (reference paco.py:787-820)."""
        from scipy.ndimage import maximum_filter
        from scipy import ndimage
        data_max = maximum_filter(snr_map, size=self.fwhm)
        maxima = snr_map == data_max
        diff = data_max > threshold
        maxima[diff == 0] = 0
        labeled, _ = ndimage.label(maxima)
        slices = ndimage.find_objects(labeled)
        x, y = [], []
        for dy, dx in slices:
            x.append((dx.start + dx.stop - 1) / 2)
            y.append((dy.start + dy.stop - 1) / 2)
        return np.array(list(zip(x, y)))

    def _statistics_flat(self):
        """Device-resident per-pixel statistics in the dense layout's FLAT
        index space.

        Cell ``f = r*W + c`` of the dense arrays holds the patch of IMAGE
        pixel (row=c, col=r) (the historical transposed storage of
        ``compute_statistics``, mirrored from the reference's index
        plumbing) — preserved here so track lookups
        ``Cinv[ang0, ang1]`` keep meaning ``flat = ang0*W + ang1``.

        Returns device arrays (patches (n, HW, A), m (HW, A),
        Cinv (HW, A, A)); invalid (border) cells are NaN. Nothing is
        shipped to the host — at 101^2 x 61 the dense f64 materialization
        alone is ~1.3 GB over the device link.
        """
        n, H, W = self.cube.shape
        A = self.patch_area_pixels
        k = int(self.patch_width / 2)
        k2 = k + 1 if self.patch_width % 2 != 0 else k

        # circular-mask offsets from an interior template
        cpix = (H // 2, W // 2)
        tmpl = create_boolean_circular_mask((H, W), radius=self.fwhm,
                                            center=cpix)
        oy, ox = np.nonzero(tmpl)
        oy = oy - cpix[0]
        ox = ox - cpix[1]
        assert oy.shape[0] == A

        f = np.arange(H * W)
        row_img = f % W                      # cell (r, c) -> image (c, r)
        col_img = f // W
        valid = ((row_img - k >= 0) & (row_img + k2 <= H)
                 & (col_img - k >= 0) & (col_img + k2 <= W))
        # clamp invalid centers so the gather stays in bounds; NaN after
        rc = np.clip(row_img, k, H - k2)
        cc = np.clip(col_img, k, W - k2)
        img_flat = (rc[:, None] + oy[None, :]) * W + (cc[:, None]
                                                      + ox[None, :])

        cube_flat = jnp.asarray(self.cube).reshape(n, H * W)
        patches = jnp.take(cube_flat, jnp.asarray(img_flat.reshape(-1)),
                           axis=1, mode="clip").reshape(n, H * W, A)
        valid_d = jnp.asarray(valid)
        patches = jnp.where(valid_d[None, :, None], patches, jnp.nan)

        # zeros (not NaN) into the covariance/eigh pipeline — NaN inputs
        # can derail the SPD inverse; invalid cells are NaN-masked after
        vp = jnp.swapaxes(jnp.nan_to_num(patches), 0, 1)   # (HW, n, A)
        m, Cinv = _batch_statistics_chunked(vp)
        m = jnp.where(valid_d[:, None], m, jnp.nan)
        Cinv = jnp.where(valid_d[:, None, None], Cinv, jnp.nan)
        return patches, m, Cinv

    def compute_statistics(self, phi0s):
        """Mean + inverse shrinkage covariance for each pixel's patch column
        (reference paco.py:821-878), batched on device. Returns the dense
        host layouts (Cinv (H, W, A, A), m (H, W, A), patch (H, W, n, A));
        the run path uses :meth:`_statistics_flat` to avoid materializing
        them."""
        if self.verbose:
            print("Precomputing Statistics...")
        n, H, W = self.cube.shape
        A = self.patch_area_pixels
        patches, m, Cinv = self._statistics_flat()
        patch = np.asarray(jnp.swapaxes(patches, 0, 1),
                           dtype=float).reshape(H, W, n, A)
        m = np.asarray(m, dtype=float).reshape(H, W, A)
        Cinv = np.asarray(Cinv, dtype=float).reshape(H, W, A, A)
        return Cinv, m, patch


def _subpixel_psf_bank(psf, angs, mask, chunk=8192):
    """Batched subpixel PSF shifts for every (pixel, frame) rotated
    coordinate (angs: (nv, nf, 2)); replaces the reference's per-call
    ``frame_shift`` (one device dispatch per pixel x frame — paco.py:931)
    with a handful of ``fourier_shift_batch`` calls. All fractional
    shifts share the pad margin 1 (exact-zero shifts are identity either
    way, so the per-call ceil(max|shift|) pad is matched to roundoff)."""
    from ..ops.fft import fourier_shift_batch

    nv, nf, _ = angs.shape
    sy = (angs[..., 1] - angs[..., 1].astype(int)).ravel()
    sx = (angs[..., 0] - angs[..., 0].astype(int)).ravel()
    K = sy.shape[0]
    psf_j = jnp.asarray(psf)
    mask_d = jnp.asarray(mask)
    pieces = []
    for k0 in range(0, K, chunk):
        n_k = min(chunk, K - k0)
        sy_k = np.zeros(chunk, sy.dtype)
        sx_k = np.zeros(chunk, sx.dtype)
        sy_k[:n_k] = sy[k0:k0 + n_k]
        sx_k[:n_k] = sx[k0:k0 + n_k]
        block = fourier_shift_batch(
            jnp.broadcast_to(psf_j, (chunk, *psf.shape)),
            jnp.asarray(sy_k), jnp.asarray(sx_k), 1)
        # mask per chunk on device (device-resident bank: the run path's
        # a/b einsums consume it without a host round-trip)
        pieces.append(block[:n_k][:, mask_d])
    bank = jnp.concatenate(pieces, axis=0)
    return bank.reshape(nv, nf, -1)


class FastPACO(PACO):
    """Algorithm 2 of [FLA18] (reference paco.py:881-1083): precompute
    the patch statistics once, then evaluate every rotation track."""

    def PACOCalc(self, phi0s, use_subpixel_psf_astrometry=True, cpu=1):
        """Fast PACO (a, b) maps (reference paco.py:886-990).

        Fully device-resident: patch statistics (``_statistics_flat``),
        the subpixel PSF bank, the per-track gathers and the a/b
        einsums all stay on device; only the final (a, b) maps cross
        back. The host form of this loop shipped ~1.3 GB of statistics
        to the host and ran ~8k pixels x n_frames of per-pixel numpy —
        105 s of transfers + 37 s of host algebra at the 61x101x101
        golden config (profiled 2026-08-20)."""
        npx = len(phi0s)
        dim = self.width / 2
        a = np.zeros(npx)
        b = np.zeros(npx)
        phi0s = np.array([phi0s[:, 1], phi0s[:, 0]]).T

        patches_d, m_d, Cinv_d = self._statistics_flat()

        normalised_psf = normalize_psf(
            self.psf, fwhm="fit", size=None, threshold=None, mask_core=None,
            model="airy", imlib="vip-fft", interpolation="lanczos4",
            force_odd=False, full_output=False, verbose=self.verbose,
            debug=False)
        psf_mask = create_boolean_circular_mask(normalised_psf.shape,
                                                radius=self.fwhm)
        x, y = np.meshgrid(np.arange(-dim, dim), np.arange(-dim, dim))
        if self.verbose:
            print("Running Fast PACO...")

        # pass 1: rotation-track geometry + validity, vectorized over
        # pixels (same math as get_rotated_pixel_coords per pixel)
        n_f = len(self.angles)
        px_x = x[phi0s[:, 0].astype(int), phi0s[:, 1].astype(int)]
        px_y = y[phi0s[:, 0].astype(int), phi0s[:, 1].astype(int)]
        rad = np.sqrt(px_x**2 + px_y**2)
        # replicate get_rotated_pixel_coords' exact deg round-trip so the
        # int() cell assignments match bit-for-bit
        theta_deg = np.rad2deg(np.arctan2(px_y, px_x))
        ang_r = np.deg2rad(-np.asarray(self.angles)[None, :]
                           + theta_deg[:, None])
        half = int(x.shape[0] / 2)
        tracks = np.stack([rad[:, None] * np.cos(ang_r) + half,
                           rad[:, None] * np.sin(ang_r) + half], axis=-1)
        tmin = np.min(tracks.reshape(npx, -1), axis=1)
        tmax = np.max(tracks.reshape(npx, -1), axis=1)
        valid = (tmax.astype(int) < self.width) & (tmin.astype(int) >= 0)
        a[~valid] = np.nan
        b[~valid] = np.nan

        # pass 2: batched subpixel PSF bank for all valid tracks
        vidx = np.where(valid)[0]
        nv = len(vidx)
        if use_subpixel_psf_astrometry and nv:
            bank = _subpixel_psf_bank(normalised_psf, tracks[vidx],
                                      psf_mask)                # (nv, n, A)
        else:
            bank = jnp.broadcast_to(
                jnp.asarray(normalised_psf[psf_mask]),
                (nv, n_f, int(psf_mask.sum())))

        # pass 3: chunked device gathers + ML einsums
        flat_t = (tracks[vidx, :, 0].astype(np.int32) * self.width
                  + tracks[vidx, :, 1].astype(np.int32))       # (nv, n)
        patches_nA = patches_d                                  # (n, HW, A)
        A = self.patch_area_pixels

        @jit
        def _ab_chunk(ft, h, Cinv_a, m_a, patches_a):
            C = Cinv_a[ft]                                     # (c, n, A, A)
            mt = m_a[ft]                                       # (c, n, A)
            rt = jnp.swapaxes(
                vmap(lambda pl, fl: jnp.take(pl, fl, axis=0, mode="clip"),
                     in_axes=(0, 1))(patches_a, ft), 0, 1)
            av = jnp.einsum("pla,plab,plb->p", h, C, h)
            bv = jnp.einsum("pla,plab,plb->p", h, C, rt - mt)
            return av, bv

        chunk = 1024
        av_all = np.zeros(nv)
        bv_all = np.zeros(nv)
        for lo in range(0, nv, chunk):
            hi = min(lo + chunk, nv)
            ft = np.full((chunk, n_f), 0, np.int32)
            ft[:hi - lo] = flat_t[lo:hi]
            hk = jnp.zeros((chunk, n_f, A), bank.dtype)
            hk = hk.at[:hi - lo].set(bank[lo:hi])
            av, bv = _ab_chunk(jnp.asarray(ft), hk, Cinv_d, m_d,
                               patches_nA)
            av_all[lo:hi] = np.asarray(av)[:hi - lo]
            bv_all[lo:hi] = np.asarray(bv)[:hi - lo]
        a[vidx] = av_all
        b[vidx] = bv_all
        if self.verbose:
            print("Done")
        return a, b

    def compute_statistics_parallel(self, phi0s, cpu):
        """Kept for API compatibility — the batched device path in
        compute_statistics replaces multiprocessing."""
        return self.compute_statistics(phi0s)


class FullPACO(PACO):
    """Algorithm 1 of [FLA18] (reference paco.py:1086-1223): statistics
    computed lazily along each track."""

    def PACOCalc(self, phi0s, use_subpixel_psf_astrometry=True, cpu=1):
        """Full PACO (a, b) maps (reference paco.py:1091-1223)."""
        npx = len(phi0s)
        dim = self.width / 2
        a = np.zeros(npx)
        b = np.zeros(npx)

        normalised_psf = normalize_psf(
            self.psf, fwhm="fit", size=None, threshold=None, mask_core=None,
            model="airy", imlib="vip-fft", interpolation="lanczos4",
            force_odd=False, full_output=False, verbose=self.verbose,
            debug=False)
        psf_mask = create_boolean_circular_mask(normalised_psf.shape,
                                                radius=self.fwhm)
        if self.verbose:
            print("Running Full PACO...")
        x, y = np.meshgrid(np.arange(-dim, dim), np.arange(-dim, dim))
        if cpu > 1:
            print("Multiprocessing for full PACO is not yet implemented!")

        patch = np.zeros((self.width, self.height, self.num_frames,
                          self.patch_area_pixels))
        m = np.zeros((self.height, self.width, self.patch_area_pixels))
        Cinv = np.zeros((self.height, self.width, self.patch_area_pixels,
                         self.patch_area_pixels))

        # rotation-track geometry + validity, then one batched PSF bank
        n_f = len(self.angles)
        tracks = np.zeros((npx, n_f, 2))
        valid = np.zeros(npx, dtype=bool)
        for i, p0 in enumerate(phi0s):
            angles_px = get_rotated_pixel_coords(x, y, (p0[1], p0[0]),
                                                 self.angles)
            tracks[i] = angles_px
            valid[i] = (int(np.max(angles_px.flatten())) < self.width
                        and int(np.min(angles_px.flatten())) >= 0)
        a[~valid] = np.nan
        b[~valid] = np.nan
        vidx = np.where(valid)[0]
        if use_subpixel_psf_astrometry and len(vidx):
            bank = _subpixel_psf_bank(normalised_psf, tracks[vidx],
                                      psf_mask)
        else:
            bank = None
        base_psf = normalised_psf[psf_mask]

        for k, i in enumerate(vidx):
            angles_px = tracks[i]
            current_patch, mlst, h, clst = [], [], [], []
            for ll, ang in enumerate(angles_px):
                if np.max(patch[int(ang[0]), int(ang[1])]) == 0:
                    apatch = self.get_patch((int(ang[1]), int(ang[0])))
                    patch[int(ang[0]), int(ang[1])] = apatch
                    m[int(ang[0]), int(ang[1])], \
                        Cinv[int(ang[0]), int(ang[1])] = \
                        compute_statistics_at_pixel(apatch)
                else:
                    apatch = patch[int(ang[0]), int(ang[1])]
                if apatch is None:
                    continue
                mlst.append(m[int(ang[0]), int(ang[1])])
                clst.append(Cinv[int(ang[0]), int(ang[1])])
                current_patch.append(apatch)
                h.append(bank[k, ll] if bank is not None else base_psf)
            current_patch = np.array(current_patch)
            patches = np.array([current_patch[ll, ll]
                                for ll in range(len(angles_px))])
            a[i] = self.al(np.array(h), np.array(clst))
            b[i] = self.bl(np.array(h), np.array(clst), patches,
                           np.array(mlst))
        if self.verbose:
            print("Done")
        return a, b


# ----------------------------------------------------------------------
# patch statistics


@jit
def _stats_one(patch):
    """Mean + inverse shrinkage covariance of one patch column (T, A);
    the reference's per-frame np.cov loop (paco.py:1283-1306) reduces to
    S = sum_l (p_l - m)(p_l - m)^T / (2T)."""
    T = patch.shape[0]
    m = jnp.mean(patch, axis=0)
    d = patch - m
    S = (d.T @ d) / (2 * T)
    diag_S = jnp.diag(S)
    trS2 = jnp.sum(S * S.T)       # trace(S @ S) for symmetric S
    top = trS2 + jnp.trace(S)**2 - 2.0 * jnp.sum(S**2)
    bot = (T + 1.0) * (trS2 - jnp.sum(diag_S**2))
    rho = jnp.clip(top / bot, 0.0, 1.0)
    C = (1.0 - rho) * S + rho * jnp.diag(diag_S)
    # eigh-based SPD inverse: XLA's LU inverse lowers to a
    # triangular-solve custom call whose fixed stack buffer busts the
    # 16 MB scoped-VMEM limit on TPU for 81x81 blocks (batch-size
    # independent); C is a shrinkage covariance (symmetric PD), so
    # V diag(1/w) V^T is exact and lowers to the native eigh path
    w, V = jnp.linalg.eigh(C)
    Cinv = (V / w[None, :]) @ V.T
    return m, Cinv


@jit
def _batch_statistics(patches):
    """vmapped patch statistics over pixels: (P, T, A) -> (P, A), (P, A, A)."""
    return vmap(_stats_one)(patches)


def _batch_statistics_chunked(patches, chunk=2048):
    """`_batch_statistics` in fixed-size pixel chunks: XLA's batched
    triangular-solve custom call busts the 16 MB scoped-VMEM limit on
    TPU when the whole frame's pixels (~8k x 81 x 81) invert in one
    call. The last chunk is zero-padded to the chunk size so every
    dispatch shares one compiled program."""
    P = patches.shape[0]
    if P <= chunk:
        return _batch_statistics(patches)
    ms, cs = [], []
    for lo in range(0, P, chunk):
        blk = patches[lo:lo + chunk]
        n = blk.shape[0]
        if n < chunk:
            pad = jnp.concatenate(
                [blk, jnp.broadcast_to(blk[-1:], (chunk - n,) + blk.shape[1:])])
            mb, cb = _batch_statistics(pad)
            mb, cb = mb[:n], cb[:n]
        else:
            mb, cb = _batch_statistics(blk)
        ms.append(mb)
        cs.append(cb)
    return jnp.concatenate(ms), jnp.concatenate(cs)


def compute_statistics_at_pixel(patch):
    """Mean and inverse shrinkage covariance of one patch column
    (reference paco.py:1226-1254)."""
    if patch is None:
        return None, None
    T = patch.shape[0]
    m = np.mean(patch, axis=0)
    S = sample_covariance(patch, m, T)
    rho = shrinkage_factor(S, T)
    F = diagsample_covariance(S)
    C = covariance(rho, S, F)
    Cinv = np.linalg.inv(C)
    return m, Cinv


def covariance(rho, S, F):
    """Shrinkage covariance (reference paco.py:1255-1282)."""
    return (1.0 - rho) * S + rho * F


def sample_covariance(r, m, T):
    """Sample covariance; equivalent closed form of the reference's
    per-frame 2-observation np.cov sum (reference paco.py:1283-1306):
    S = sum_l outer(p_l - m) / (2T)."""
    d = np.asarray(r) - m
    return np.einsum("lk,lj->kj", d, d) / (2.0 * T)


def diagsample_covariance(S):
    """Diagonal of the sample covariance (reference paco.py:1309-1326)."""
    return np.diag(np.diag(S))


def shrinkage_factor(S, T):
    """Shrinkage weight rho (reference paco.py:1327-1351)."""
    top = np.trace(np.dot(S, S)) + np.trace(S)**2 - 2.0 * np.sum(S**2.0)
    bot = (T + 1.0) * (np.trace(np.dot(S, S)) - np.sum(np.diag(S)**2.0))
    p = top / bot
    return max(min(p, 1.0), 0.0)


def get_rotated_pixel_coords(x, y, p0, angles, astro_convention=False):
    """Track of a pixel across rotations (reference paco.py:1352-1401)."""
    phi0 = np.array([x[int(p0[0]), int(p0[1])], y[int(p0[0]), int(p0[1])]])
    rad, theta = cart_to_pol(phi0[0], phi0[1],
                             astro_convention=astro_convention)
    angles_rad = -1 * angles + theta
    nx, ny = pol_to_cart(rad * np.ones_like(angles_rad), angles_rad,
                         astro_convention=astro_convention)
    nx = nx + int(x.shape[0] / 2)
    ny = ny + int(x.shape[0] / 2)
    return np.array([nx, ny]).T


def create_boolean_circular_mask(shape, radius=4, center=None):
    """Boolean disk mask (reference paco.py:1402-1435)."""
    w = shape[0]
    h = shape[1]
    if center is None:
        center = [int(w / 2), int(h / 2)]
    if radius is None:
        radius = min(center[0], center[1], w - center[0], h - center[1])
    X, Y = np.ogrid[:w, :h]
    dist2 = (X - center[0])**2 + (Y - center[1])**2
    return dist2 <= radius**2
