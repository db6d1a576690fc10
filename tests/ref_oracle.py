"""Load the mounted read-only reference (vip_hci at /root/reference) as a
numerical parity oracle.

The test image lacks several of the reference's dependencies (astropy,
skimage, photutils, bottleneck, numba, emcee, nestle, hciplot, corner,
dataclass_builder). This module installs *functional stubs* for the pieces
the reference actually executes on our test paths (e.g. skimage.draw.disk,
bottleneck nan-reductions) and inert placeholders for the rest, then imports
reference modules on demand.

Only used by tests. Never imported by vip_tpu itself.
"""

import sys
import types
import numpy as np

REF_SRC = "/root/reference/src"

_installed = False


def _mod(name):
    m = types.ModuleType(name)
    m.__version__ = "99.0.0"
    m.__path__ = []  # mark as package so sub-imports resolve to stubs
    sys.modules[name] = m
    return m


class _Placeholder:
    """Inert stand-in for a stubbed symbol; raises only if actually used."""

    def __init__(self, name):
        self._name = name

    def __call__(self, *a, **k):
        raise NotImplementedError(f"oracle stub placeholder used: {self._name}")

    def __getattr__(self, item):
        return _Placeholder(f"{self._name}.{item}")

    def __mro_entries__(self, bases):
        return (object,)


class _AutoModule(types.ModuleType):
    """Module that fabricates placeholder attributes on demand."""

    __version__ = "99.0.0"
    __path__ = []

    def __getattr__(self, item):
        if item.startswith("__"):
            raise AttributeError(item)
        return _Placeholder(f"{self.__name__}.{item}")


_STUB_ROOTS = ("astropy", "skimage", "photutils", "hciplot", "bottleneck",
               "numba", "emcee", "nestle", "corner", "dataclass_builder",
               "pyprind")


class _StubLoader:
    def create_module(self, spec):
        m = _AutoModule(spec.name)
        return m

    def exec_module(self, module):
        fullname = module.__name__
        if "." in fullname:
            parent, leaf = fullname.rsplit(".", 1)
            if parent in sys.modules:
                setattr(sys.modules[parent], leaf, module)


class _StubFinder:
    """Meta-path fallback: auto-create stub submodules under stub roots that
    aren't explicitly provided above (e.g. astropy.io.fits.hdu.hdulist)."""

    def find_spec(self, fullname, path=None, target=None):
        import importlib.util

        root = fullname.split(".")[0]
        if root in _STUB_ROOTS and fullname not in sys.modules:
            return importlib.util.spec_from_loader(fullname, _StubLoader(),
                                                   is_package=True)
        return None


def _install_stubs():
    global _installed
    if _installed:
        return

    # ------------------------------------------------------------------ astropy
    if "astropy" not in sys.modules:
        astropy = _mod("astropy")
        stats = _mod("astropy.stats")
        astropy.stats = stats
        stats.gaussian_sigma_to_fwhm = 2.0 * np.sqrt(2.0 * np.log(2.0))
        stats.gaussian_fwhm_to_sigma = 1.0 / stats.gaussian_sigma_to_fwhm

        def sigma_clipped_stats(data, sigma=3.0, maxiters=5, cenfunc=np.nanmedian,
                                stdfunc=np.nanstd, **kw):
            d = np.asarray(data, dtype=float).ravel()
            d = d[np.isfinite(d)]
            for _ in range(maxiters or 5):
                med = cenfunc(d)
                std = stdfunc(d)
                keep = np.abs(d - med) <= sigma * std
                if keep.all():
                    break
                d = d[keep]
            return np.nanmean(d), cenfunc(d), stdfunc(d)

        def sigma_clip(data, sigma=3.0, maxiters=5, **kw):
            d = np.ma.masked_invalid(np.asarray(data, dtype=float))
            for _ in range(maxiters or 5):
                med = np.ma.median(d)
                std = np.ma.std(d)
                newmask = np.abs(d - med) > sigma * std
                if not np.any(newmask & ~d.mask):
                    break
                d = np.ma.masked_where(newmask, d)
            return d

        stats.sigma_clipped_stats = sigma_clipped_stats
        stats.sigma_clip = sigma_clip

        def median_absolute_deviation(data, axis=None):
            data = np.asarray(data)
            med = np.median(data, axis=axis, keepdims=axis is not None)
            return np.median(np.abs(data - med), axis=axis)

        def mad_std(data, axis=None):
            return median_absolute_deviation(data, axis=axis) * 1.482602218505602

        stats.median_absolute_deviation = median_absolute_deviation
        stats.mad_std = mad_std

        utils = _mod("astropy.utils")
        astropy.utils = utils
        exceptions = _mod("astropy.utils.exceptions")
        utils.exceptions = exceptions

        class AstropyWarning(Warning):
            pass

        class AstropyUserWarning(AstropyWarning):
            pass

        exceptions.AstropyWarning = AstropyWarning
        exceptions.AstropyUserWarning = AstropyUserWarning

        conv = _mod("astropy.convolution")
        astropy.convolution = conv

        class Gaussian2DKernel:
            def __init__(self, x_stddev, y_stddev=None, **kw):
                from scipy.signal.windows import gaussian

                y_stddev = x_stddev if y_stddev is None else y_stddev
                size = int(8 * max(x_stddev, y_stddev) + 1) | 1
                gx = gaussian(size, x_stddev)
                gy = gaussian(size, y_stddev)
                arr = np.outer(gy, gx)
                self.array = arr / arr.sum()

        def convolve(image, kernel, normalize_kernel=True, mask=None, **kw):
            from scipy.ndimage import convolve as sconv

            karr = kernel.array if hasattr(kernel, "array") else np.asarray(kernel)
            im = np.asarray(image, dtype=float)
            if mask is not None:  # astropy: True = invalid, interpolated
                im = np.where(np.asarray(mask, bool), np.nan, im)
            nanmask = ~np.isfinite(im)
            im0 = np.where(nanmask, 0.0, im)
            if not normalize_kernel:
                # astropy normalize_kernel=False + nan_treatment='fill':
                # plain convolution over zero-filled NaNs (needed for the
                # zero-sum laplacian kernels, whose coverage weight is 0)
                return sconv(im0, karr, mode="constant")
            wt = sconv((~nanmask).astype(float), karr, mode="constant")
            num = sconv(im0, karr, mode="constant")
            with np.errstate(invalid="ignore", divide="ignore"):
                out = num / wt
            return out

        def convolve_fft(image, kernel, normalize_kernel=True, **kw):
            return convolve(image, kernel,
                            normalize_kernel=normalize_kernel)

        def interpolate_replace_nans(image, kernel, **kw):
            im = np.asarray(image, dtype=float)
            filled = convolve(im, kernel)
            out = im.copy()
            bad = ~np.isfinite(im)
            out[bad] = filled[bad]
            return out

        class Tophat2DKernel:
            # astropy Tophat2DKernel: disk of given radius, normalized
            def __init__(self, radius, **kw):
                size = int(2 * np.ceil(radius) + 1)
                yk, xk = np.mgrid[:size, :size] - size // 2
                arr = ((yk**2 + xk**2) <= radius**2).astype(float)
                self.array = arr / arr.sum()

        conv.Gaussian2DKernel = Gaussian2DKernel
        conv.Tophat2DKernel = Tophat2DKernel
        conv.convolve = convolve
        conv.convolve_fft = convolve_fft
        conv.interpolate_replace_nans = interpolate_replace_nans

        modeling = _mod("astropy.modeling")
        astropy.modeling = modeling
        models_m = _mod("astropy.modeling.models")
        fitting_m = _mod("astropy.modeling.fitting")
        modeling.models = models_m
        modeling.fitting = fitting_m

        class _Param:
            def __init__(self, value):
                self.value = float(value)

        class _Model2D:
            _pnames = ()

            def __init__(self, **kw):
                for name, default in zip(self._pnames, self._defaults):
                    setattr(self, name, _Param(kw.get(name, default)))

            def parameters(self):
                return np.array([getattr(self, n).value
                                 for n in self._pnames])

            def with_parameters(self, p):
                new = type(self)()
                for name, val in zip(self._pnames, p):
                    setattr(new, name, _Param(val))
                return new

            def __call__(self, x, y):
                return self.evaluate(np.asarray(x, float),
                                     np.asarray(y, float),
                                     *self.parameters())

        class Gaussian2D(_Model2D):
            _pnames = ("amplitude", "x_mean", "y_mean", "x_stddev",
                       "y_stddev", "theta")
            _defaults = (1.0, 0.0, 0.0, 1.0, 1.0, 0.0)

            @staticmethod
            def evaluate(x, y, amplitude, x_mean, y_mean, x_stddev, y_stddev,
                         theta):
                cost2 = np.cos(theta) ** 2
                sint2 = np.sin(theta) ** 2
                sin2t = np.sin(2 * theta)
                a = 0.5 * (cost2 / x_stddev**2 + sint2 / y_stddev**2)
                b = 0.5 * (sin2t / x_stddev**2 - sin2t / y_stddev**2)
                c = 0.5 * (sint2 / x_stddev**2 + cost2 / y_stddev**2)
                xd = x - x_mean
                yd = y - y_mean
                return amplitude * np.exp(-(a * xd**2 + b * xd * yd
                                            + c * yd**2))

        class Moffat2D(_Model2D):
            _pnames = ("amplitude", "x_0", "y_0", "gamma", "alpha")
            _defaults = (1.0, 0.0, 0.0, 1.0, 1.0)

            @staticmethod
            def evaluate(x, y, amplitude, x_0, y_0, gamma, alpha):
                rr_gg = ((x - x_0) ** 2 + (y - y_0) ** 2) / gamma**2
                return amplitude * (1 + rr_gg) ** (-alpha)

            @property
            def fwhm(self):
                # astropy Moffat2D.fwhm
                return 2.0 * np.abs(self.gamma.value) * np.sqrt(
                    2 ** (1.0 / self.alpha.value) - 1)

        class AiryDisk2D(_Model2D):
            _pnames = ("amplitude", "x_0", "y_0", "radius")
            _defaults = (1.0, 0.0, 0.0, 1.0)

            @staticmethod
            def evaluate(x, y, amplitude, x_0, y_0, radius):
                from scipy.special import j1

                RZ = 1.2196698912665045
                r = np.hypot(x - x_0, y - y_0) / (radius / RZ)
                out = np.ones_like(r, dtype=float)
                mask = r > 0
                rt = np.pi * r[mask]
                out[mask] = (2.0 * j1(rt) / rt) ** 2
                return amplitude * out

        class Const2D(_Model2D):
            _pnames = ("amplitude",)
            _defaults = (0.0,)

            @staticmethod
            def evaluate(x, y, amplitude):
                return np.full_like(np.asarray(x, float), amplitude)

        models_m.Gaussian2D = Gaussian2D
        models_m.Moffat2D = Moffat2D
        models_m.AiryDisk2D = AiryDisk2D
        models_m.Const2D = Const2D

        class LevMarLSQFitter:
            def __init__(self, *a, **k):
                self.fit_info = {}

            def __call__(self, model, x, y, data, **kw):
                from scipy.optimize import least_squares

                x = np.asarray(x, float).ravel()
                y = np.asarray(y, float).ravel()
                data = np.asarray(data, float).ravel()
                p0 = model.parameters()

                def resid(p):
                    return model.evaluate(x, y, *p) - data

                try:
                    res = least_squares(resid, p0, method="lm",
                                        max_nfev=5000)
                except Exception:
                    res = least_squares(resid, p0, max_nfev=5000)
                try:
                    _, s, VT = np.linalg.svd(res.jac, full_matrices=False)
                    thr = np.finfo(float).eps * max(res.jac.shape) * s[0]
                    s_ = s[s > thr]
                    VT = VT[: s_.size]
                    dof = max(res.fun.size - res.x.size, 1)
                    cov = (VT.T / s_**2) @ VT * 2 * res.cost / dof
                    self.fit_info["param_cov"] = cov
                except Exception:
                    self.fit_info["param_cov"] = None
                return model.with_parameters(res.x)

        fitting_m.LevMarLSQFitter = LevMarLSQFitter

        io = _mod("astropy.io")
        astropy.io = io
        fits = _mod("astropy.io.fits")
        io.fits = fits
        convenience = _mod("astropy.io.fits.convenience")
        fits.convenience = convenience

        def _unavailable(*a, **k):
            raise NotImplementedError("astropy.io.fits stub")

        convenience.writeto = _unavailable
        fits.writeto = _unavailable
        fits.open = _unavailable
        fits.getheader = _unavailable
        fits.getdata = _unavailable

        class Header(dict):
            pass

        class PrimaryHDU:
            def __init__(self, data=None, header=None):
                self.data = data
                self.header = header or Header()

        fits.Header = Header
        fits.PrimaryHDU = PrimaryHDU
        fits.HDUList = list
        fits.verify = _mod("astropy.io.fits.verify")
        fits.verify.VerifyWarning = type("VerifyWarning", (Warning,), {})

        units = _mod("astropy.units")
        astropy.units = units
        coords_m = _mod("astropy.coordinates")
        astropy.coordinates = coords_m
        time_m = _mod("astropy.time")
        astropy.time = time_m

    # ------------------------------------------------------------------ skimage
    if "skimage" not in sys.modules:
        skimage = _mod("skimage")
        draw = _mod("skimage.draw")
        skimage.draw = draw

        def _ellipse_in_shape(shape, center, radii):
            r_lim, c_lim = np.ogrid[0:float(shape[0]), 0:float(shape[1])]
            r_org, c_org = center
            r_rad, c_rad = radii
            distances = ((r_lim - r_org) / r_rad) ** 2 + \
                        ((c_lim - c_org) / c_rad) ** 2
            return np.nonzero(distances < 1)

        def disk(center, radius, shape=None):
            # skimage.draw.disk semantics: strict '< 1' normalized distance
            if shape is None:
                cy, cx = center
                size = int(np.ceil(max(cy, cx) + radius + 1))
                shape = (size, size)
            return _ellipse_in_shape(shape, center, (radius, radius))

        def ellipse(r, c, r_radius, c_radius, shape=None, rotation=0.0):
            # skimage.draw.ellipse semantics: strict <1 membership with the
            # (row, col) rotation transform of skimage/draw/draw.py
            if shape is None:
                size = int(np.ceil(max(r + r_radius, c + c_radius) + 1))
                shape = (size, size)
            rotation = rotation % np.pi
            sin_a, cos_a = np.sin(rotation), np.cos(rotation)
            rr, cc = np.mgrid[:shape[0], :shape[1]]
            dr = rr - r
            dc = cc - c
            distances = ((dr * cos_a + dc * sin_a) / r_radius) ** 2 \
                + ((dr * sin_a - dc * cos_a) / c_radius) ** 2
            return np.nonzero(distances < 1)

        def polygon(r, c, shape=None):
            from matplotlib.path import Path

            r = np.asarray(r)
            c = np.asarray(c)
            if shape is None:
                shape = (int(np.ceil(r.max())) + 1, int(np.ceil(c.max())) + 1)
            rr, cc = np.mgrid[: shape[0], : shape[1]]
            pts = np.column_stack([r, c])
            mask = Path(pts).contains_points(
                np.column_stack([rr.ravel(), cc.ravel()])
            ).reshape(shape)
            return np.nonzero(mask)

        def circle_perimeter(cy, cx, radius, **kw):
            # skimage.draw.circle_perimeter (midpoint/Bresenham circle)
            yy, xx = [], []
            y = radius
            x = 0
            d = 3 - 2 * radius
            while y >= x:
                for dy, dx in ((y, x), (x, y), (-x, y), (-y, x),
                               (-y, -x), (-x, -y), (x, -y), (y, -x)):
                    yy.append(cy + dy)
                    xx.append(cx + dx)
                if d < 0:
                    d += 4 * x + 6
                else:
                    d += 4 * (x - y) + 10
                    y -= 1
                x += 1
            coords = np.unique(np.column_stack([yy, xx]), axis=0)
            return coords[:, 0], coords[:, 1]

        draw.disk = disk
        draw.circle_perimeter = circle_perimeter
        draw.ellipse = ellipse
        draw.polygon = polygon

        transform = _mod("skimage.transform")
        skimage.transform = transform

        def rotate(image, angle, order=1, center=None, cval=0, mode="constant",
                   **kw):
            import cv2

            intp = {0: cv2.INTER_NEAREST, 1: cv2.INTER_LINEAR,
                    2: cv2.INTER_CUBIC, 3: cv2.INTER_CUBIC,
                    4: cv2.INTER_LANCZOS4, 5: cv2.INTER_LANCZOS4}[order]
            bormo = {"constant": cv2.BORDER_CONSTANT,
                     "edge": cv2.BORDER_REPLICATE,
                     "symmetric": cv2.BORDER_REFLECT,
                     "reflect": cv2.BORDER_REFLECT_101,
                     "wrap": cv2.BORDER_WRAP}[mode]
            y, x = image.shape
            if center is None:
                center = ((x - 1) / 2, (y - 1) / 2)
            M = cv2.getRotationMatrix2D(center, angle, 1)
            return cv2.warpAffine(np.asarray(image, np.float64), M, (x, y),
                                  flags=intp, borderMode=bormo)

        def radon(image, theta=None, circle=True):
            # skimage.transform.radon: order-1 warp about shape//2 and
            # column sums
            img = np.asarray(image, dtype=float)
            n = img.shape[0]
            center = n // 2
            if theta is None:
                theta = np.arange(180)
            theta = np.atleast_1d(np.asarray(theta, dtype=float))
            yy, xx = np.mgrid[0:n, 0:n]
            out = np.zeros((n, len(theta)))
            for i, ang in enumerate(np.deg2rad(theta)):
                cos_a, sin_a = np.cos(ang), np.sin(ang)
                x0 = xx - center
                y0 = yy - center
                xs = cos_a * x0 + sin_a * y0 + center
                ys = -sin_a * x0 + cos_a * y0 + center
                x0f = np.floor(xs).astype(int)
                y0f = np.floor(ys).astype(int)
                wx = xs - x0f
                wy = ys - y0f

                def sample(yi, xi):
                    valid = (yi >= 0) & (yi < n) & (xi >= 0) & (xi < n)
                    return np.where(valid, img[np.clip(yi, 0, n - 1),
                                               np.clip(xi, 0, n - 1)], 0.0)

                rot = ((1 - wy) * (1 - wx) * sample(y0f, x0f)
                       + (1 - wy) * wx * sample(y0f, x0f + 1)
                       + wy * (1 - wx) * sample(y0f + 1, x0f)
                       + wy * wx * sample(y0f + 1, x0f + 1))
                out[:, i] = rot.sum(0)
            return out

        transform.rotate = rotate
        transform.radon = radon

        registration = _mod("skimage.registration")
        skimage.registration = registration

        def phase_cross_correlation(reference_image, moving_image,
                                    upsample_factor=1, reference_mask=None,
                                    moving_mask=None, overlap_ratio=0.3,
                                    **kw):
            if reference_mask is not None:
                # Padfield (2012) masked normalized cross-correlation
                m1 = np.asarray(reference_mask, dtype=float)
                m2 = m1 if moving_mask is None else np.asarray(moving_mask,
                                                               float)
                ref = np.asarray(reference_image, float) * m1
                mov = np.asarray(moving_image, float) * m2
                rot_mov = mov[::-1, ::-1]
                rot_m2 = m2[::-1, ::-1]
                fshape = tuple(2 * s - 1 for s in ref.shape)
                F = lambda x: np.fft.fft2(x, fshape)
                IF = lambda x: np.fft.ifft2(x).real
                eps = np.finfo(float).eps
                f_fft, rm_fft = F(ref), F(rot_mov)
                m1_fft, rm2_fft = F(m1), F(rot_m2)
                n_ov = np.maximum(IF(rm2_fft * m1_fft), eps)
                cf = IF(rm2_fft * f_fft)
                cm = IF(m1_fft * rm_fft)
                num = IF(rm_fft * f_fft) - cf * cm / n_ov
                fd = IF(rm2_fft * F(ref * ref)) - cf**2 / n_ov
                md = IF(m1_fft * F(rot_mov * rot_mov)) - cm**2 / n_ov
                den = np.sqrt(np.maximum(fd, 0) * np.maximum(md, 0))
                tol = 1e3 * eps * np.max(np.abs(den))
                xcorr = np.where(den > tol,
                                 np.clip(num / np.maximum(den, tol),
                                         -1, 1), 0.0)
                xcorr[n_ov <= overlap_ratio * n_ov.max()] = 0.0
                idx = np.unravel_index(np.argmax(xcorr), xcorr.shape)
                shifts = np.asarray(idx) - (np.asarray(ref.shape) - 1)
                return shifts.astype(float)
            # Guizar-Sicairos matrix-multiply DFT registration
            ref_f = np.fft.fft2(reference_image)
            mov_f = np.fft.fft2(moving_image)
            shape = ref_f.shape
            cross = ref_f * mov_f.conj()
            cc = np.fft.ifft2(cross)
            maxima = np.unravel_index(np.argmax(np.abs(cc)), shape)
            midpoints = np.array([np.fix(s / 2) for s in shape])
            shifts = np.array(maxima, dtype=np.float64)
            shifts[shifts > midpoints] -= np.array(shape)[shifts > midpoints]
            if upsample_factor > 1:
                # refine by upsampled DFT around the peak
                upsample_factor = int(upsample_factor)
                upsampled_region_size = int(np.ceil(upsample_factor * 1.5))
                dftshift = np.fix(upsampled_region_size / 2.0)
                shifts = np.round(shifts * upsample_factor) / upsample_factor
                sample_region_offset = dftshift - shifts * upsample_factor
                data = _upsampled_dft(cross.conj(), upsampled_region_size,
                                      upsample_factor, sample_region_offset
                                      ).conj()
                maxima = np.unravel_index(np.argmax(np.abs(data)), data.shape)
                maxima = np.array(maxima, dtype=np.float64) - dftshift
                shifts += maxima / upsample_factor
            return shifts, None, None

        def _upsampled_dft(data, upsampled_region_size, upsample_factor,
                           axis_offsets):
            upsampled_region_size = [upsampled_region_size] * data.ndim
            im2pi = 1j * 2 * np.pi
            dim_properties = list(zip(data.shape, upsampled_region_size,
                                      axis_offsets))
            for n_items, ups_size, ax_offset in dim_properties[::-1]:
                kernel = (np.arange(ups_size) - ax_offset)[:, None] \
                    * np.fft.fftfreq(n_items, upsample_factor)
                kernel = np.exp(-im2pi * kernel)
                data = np.tensordot(kernel, data, axes=(1, -1))
            return data

        registration.phase_cross_correlation = phase_cross_correlation

        metrics_m = _mod("skimage.metrics")
        skimage.metrics = metrics_m

        def structural_similarity(a, b, win_size=7, data_range=None,
                                  gaussian_weights=False, sigma=1.5,
                                  use_sample_covariance=True, K1=0.01,
                                  K2=0.03, **kw):
            # skimage SSIM (Wang et al. 2004) with gaussian or uniform
            # windows
            from scipy.ndimage import gaussian_filter, uniform_filter

            a = np.asarray(a, float)
            b = np.asarray(b, float)
            if data_range is None:
                data_range = a.max() - a.min()
            if gaussian_weights:
                truncate = 3.5
                if win_size is None:
                    r = int(truncate * sigma + 0.5)
                    win_size = 2 * r + 1
                filt = lambda x: gaussian_filter(x, sigma,
                                                 truncate=truncate)
            else:
                if win_size is None:
                    win_size = 7
                filt = lambda x: uniform_filter(x, win_size)
            NP = win_size ** a.ndim
            cov_norm = NP / (NP - 1) if use_sample_covariance else 1.0
            ux, uy = filt(a), filt(b)
            uxx, uyy, uxy = filt(a * a), filt(b * b), filt(a * b)
            vx = cov_norm * (uxx - ux * ux)
            vy = cov_norm * (uyy - uy * uy)
            vxy = cov_norm * (uxy - ux * uy)
            C1 = (K1 * data_range) ** 2
            C2 = (K2 * data_range) ** 2
            S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
                (ux**2 + uy**2 + C1) * (vx + vy + C2))
            pad = (win_size - 1) // 2
            return S[pad:-pad, pad:-pad].mean()

        metrics_m.structural_similarity = structural_similarity

        restoration = _mod("skimage.restoration")
        skimage.restoration = restoration

        def richardson_lucy(image, psf, num_iter=50, clip=True):
            from scipy.signal import convolve as sconvolve

            im_deconv = np.full(image.shape, 0.5)
            psf_mirror = psf[::-1, ::-1]
            for _ in range(num_iter):
                conv = sconvolve(im_deconv, psf, mode="same")
                relative_blur = image / np.where(conv == 0, 1e-12, conv)
                im_deconv *= sconvolve(relative_blur, psf_mirror, mode="same")
            if clip:
                im_deconv[im_deconv > 1] = 1
                im_deconv[im_deconv < -1] = -1
            return im_deconv

        restoration.richardson_lucy = richardson_lucy

        feature = _mod("skimage.feature")
        skimage.feature = feature

        def blob_log(*a, **k):
            raise NotImplementedError

        def blob_dog(*a, **k):
            raise NotImplementedError

        def peak_local_max(image, min_distance=1, threshold_abs=None,
                           threshold_rel=None, exclude_border=True,
                           num_peaks=np.inf, **kw):
            # skimage.feature.peak_local_max semantics: maxima of a
            # (2*min_distance+1) square max-filter, thresholded, border
            # exclusion, sorted by decreasing intensity
            from scipy.ndimage import maximum_filter

            img = np.asarray(image, dtype=float)
            size = 2 * min_distance + 1
            maxf = maximum_filter(img, size=size, mode="constant",
                                  cval=-np.inf)
            mask = img == maxf
            thr = -np.inf
            if threshold_abs is not None:
                thr = max(thr, threshold_abs)
            if threshold_rel is not None:
                thr = max(thr, threshold_rel * img.max())
            mask &= img > thr
            if exclude_border:
                border = min_distance if exclude_border is True \
                    else int(exclude_border)
                if border:
                    inner = np.zeros_like(mask)
                    inner[border:-border, border:-border] = True
                    mask &= inner
            coords = np.column_stack(np.nonzero(mask))
            order = np.argsort(img[coords[:, 0], coords[:, 1]])[::-1]
            coords = coords[order]
            if np.isfinite(num_peaks) and len(coords) > int(num_peaks):
                coords = coords[: int(num_peaks)]
            return coords

        feature.blob_log = blob_log
        feature.blob_dog = blob_dog
        feature.peak_local_max = peak_local_max

    # ------------------------------------------------------------------ misc
    if "hciplot" not in sys.modules:
        hciplot = _mod("hciplot")
        hciplot.plot_frames = lambda *a, **k: None
        hciplot.plot_cubes = lambda *a, **k: None

    if "bottleneck" not in sys.modules:
        bn = _mod("bottleneck")
        bn.nanmean = np.nanmean
        bn.nanmedian = np.nanmedian
        bn.nansum = np.nansum
        bn.nanmax = np.nanmax
        bn.nanmin = np.nanmin
        bn.nanstd = np.nanstd
        bn.median = np.median

    if "numba" not in sys.modules:
        numba = _mod("numba")

        def njit(*args, **kwargs):
            if args and callable(args[0]):
                return args[0]
            return lambda f: f

        numba.njit = njit
        numba.jit = njit

    if "photutils" not in sys.modules:
        photutils = _mod("photutils")
        aperture = _mod("photutils.aperture")
        photutils.aperture = aperture
        from circ_overlap import (CircularAperture, CircularAnnulus,
                                  aperture_photometry)

        aperture.CircularAperture = CircularAperture
        aperture.CircularAnnulus = CircularAnnulus
        aperture.aperture_photometry = aperture_photometry
        photutils.CircularAperture = CircularAperture
        photutils.aperture_photometry = aperture_photometry
        centroids = _mod("photutils.centroids")
        photutils.centroids = centroids

        def centroid_com(data, mask=None):
            d = np.asarray(data, dtype=float)
            if mask is not None:
                d = np.where(mask, 0.0, d)
            total = d.sum()
            yy, xx = np.mgrid[: d.shape[0], : d.shape[1]]
            return np.array([(d * xx).sum() / total, (d * yy).sum() / total])

        centroids.centroid_com = centroid_com

    for name in ("emcee", "nestle", "corner", "dataclass_builder", "pyprind"):
        if name not in sys.modules:
            m = _mod(name)
            if name == "dataclass_builder":
                def dataclass_builder(cls):  # noqa
                    return cls

                m.dataclass_builder = dataclass_builder

    if not any(isinstance(f, _StubFinder) for f in sys.meta_path):
        sys.meta_path.append(_StubFinder())

    _installed = True


def load_ref(module_name):
    """Import a reference module (e.g. 'vip_hci.preproc.derotation')."""
    _install_stubs()
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    here = "/root/repo/tests"
    if here not in sys.path:
        sys.path.insert(0, here)
    import importlib

    mod = importlib.import_module(module_name)
    # this image exposes a single CPU; the reference computes
    # nproc = cpu_count()//2 = 0 and then hits an UnboundLocalError
    # (e.g. recentering.py:293-305). Report 2 CPUs so it takes its
    # serial nproc=1 path.
    for sub in list(sys.modules.values()):
        if getattr(sub, "__name__", "").startswith("vip_hci") \
                and getattr(sub, "cpu_count", None) is not None:
            sub.cpu_count = lambda: 2
    return mod
