"""High-fidelity replica of the NACO beta Pic ADI dataset.

The reference's fidelity contract runs on the downloaded NACO beta Pic cube
(61x101x101 + 39x39 PSF + 61 derot angles; reference tests/conftest.py:15-55).
This sandbox has no network access, so we rebuild an equivalent dataset from
first principles plus the one real NACO frame that ships inside the reference
repo (tests/pre_3_10/naco_betapic_single.fits, a genuine 101x101 L'-band AGPM
frame of beta Pic):

- **Speckle field**: the real frame is used as the static (pupil-stabilised)
  speckle+halo component. Quasi-static speckle evolution is modelled as an
  AR(1) process of FWHM-smoothed Gaussian fields whose radial std profile is
  matched to a fraction of the real frame's azimuthal std profile, plus white
  sensor noise. This reproduces the radial noise statistics PCA actually sees.
- **Parallactic angles**: computed physically for beta Pic (RA 5h47m17.1s,
  dec -51d03'59") observed from Paranal (lat -24.6270 deg) across meridian
  transit with uniform time sampling, via the standard
  tan(PA) = sin(H) / (tan(lat) cos(dec) - sin(dec) cos(H)) relation -- the
  same formula the reference evaluates through astropy in
  preproc/parangles.py:34-226. This yields the characteristic non-uniform
  fast-through-transit rotation of the real Absil et al. (2013) sequence
  (~80 deg total).
- **Companion**: beta Pic b is baked in at its documented position
  (sep 0.452" = 16.62 px at NACO plsc 0.02719"/px; the reference tutorial's
  pca_annular detection lands at (y=35.70, x=58.49)) with L'-band contrast
  ~7.7e-4 of the tutorial-documented starphot 764939.6.
- **PSF**: an unsaturated off-axis PSF modelled as a Moffat with the
  documented NACO L' FWHM of 4.800919 px (reference tutorial 04_metrics:
  "FWHM = 4.800919383981533") on a 39x39 grid, matching
  naco_betapic_psf.fits's shape.

Everything is deterministic (fixed PCG64 seed), so the golden snapshots
regenerated from the in-process reference (tests/gen_golden.py) stay valid.
"""

import os

import numpy as np

_REAL_FRAME = "/root/reference/tests/pre_3_10/naco_betapic_single.fits"

PLSC = 0.02719  # arcsec/px, VLT_NACO plsc (reference config/param.py)
FWHM = 4.800919383981533  # documented NACO L' FWHM in px
STARPHOT = 764939.6  # documented 1-FWHM aperture star flux
SEP_PX = 0.452 / PLSC  # beta Pic b separation -> 16.62 px
# theta convention of the final (derotated, north-up) frame: trig angle from
# +x axis, counterclockwise.  Documented detection (35.70, 58.49) about the
# (50, 50) center -> atan2(-14.3, 8.49).
THETA_DEG = np.degrees(np.arctan2(35.70 - 50.0, 58.49 - 50.0))
PLANET_FLUX = 7.7e-4 * STARPHOT  # ~589 cts: L' contrast ~7.7e-4

N_FRAMES = 61
SIZE = 101


def _read_real_frame():
    from vip_tpu.fits import open_fits

    return np.asarray(open_fits(_REAL_FRAME, verbose=False), dtype=np.float64)


def beta_pic_parallactic_angles(n=N_FRAMES, span_hours=3.0):
    """Physical parallactic-angle vector across meridian transit.

    Mirrors the math of reference preproc/parangles.py:99-225 (which goes
    through astropy): PA(H) = atan2(sin H, tan(lat) cos(dec) - sin(dec) cos H).
    Returns *derotation* angles (the negated PA, VIP convention, see tutorial
    01A "derotation angles are essentially the opposite of parallactic
    angles"), shifted by a constant instrument offset so the vector is not
    centred on zero (true-north / rotator offset, as for real NACO data).
    """
    lat = np.radians(-24.6270)  # Paranal
    dec = np.radians(-(51 + 3 / 60 + 59.0 / 3600))  # beta Pic
    hour_angles = np.linspace(-span_hours / 2, span_hours / 2, n)
    H = np.radians(hour_angles * 15.0)
    pa = np.degrees(np.arctan2(np.sin(H),
                               np.tan(lat) * np.cos(dec) - np.sin(dec) * np.cos(H)))
    tn_offset = 36.0  # constant instrumental offset (arbitrary but fixed)
    derot = -pa + tn_offset
    return derot.astype(np.float64)


def moffat_psf(size=39, fwhm=FWHM, alpha=2.5, peak=1680.0):
    """Unsaturated off-axis PSF stand-in for naco_betapic_psf.fits."""
    gamma = fwhm / (2.0 * np.sqrt(2.0 ** (1.0 / alpha) - 1.0))
    yy, xx = np.mgrid[:size, :size].astype(np.float64)
    c = (size - 1) / 2.0
    rr_gg = ((xx - c) ** 2 + (yy - c) ** 2) / gamma**2
    return peak * (1.0 + rr_gg) ** (-alpha)


def _radial_std_profile(frame):
    yy, xx = np.mgrid[: frame.shape[0], : frame.shape[1]]
    c = (frame.shape[0] - 1) / 2.0
    r = np.hypot(yy - c, xx - c)
    rbin = np.round(r).astype(int)
    prof = np.zeros(rbin.max() + 1)
    for k in range(prof.size):
        m = rbin == k
        if m.any():
            prof[k] = frame[m].std()
    return prof, rbin


def _fft_shift(frame, dy, dx):
    ny, nx = frame.shape
    fy = np.fft.fftfreq(ny)[:, None]
    fx = np.fft.fftfreq(nx)[None, :]
    ramp = np.exp(-2j * np.pi * (fy * dy + fx * dx))
    return np.real(np.fft.ifft2(np.fft.fft2(frame) * ramp))


def make_naco_replica(seed=20260817, n=N_FRAMES, evol_frac=0.25, ar_rho=0.9,
                      inject_planet=True):
    """Build (cube, derot_angles, psf, fwhm, planet_yx).

    cube : (61, 101, 101) float64, companion baked in (rotating with PA).
    psf  : raw 39x39 Moffat PSF (un-normalised, like naco_betapic_psf.fits).
    """
    rng = np.random.default_rng(seed)
    static = _read_real_frame()
    angles = beta_pic_parallactic_angles(n=n)
    prof, rbin = _radial_std_profile(static)
    target_std = evol_frac * prof[rbin]

    try:
        from scipy.ndimage import gaussian_filter
    except ImportError:  # pragma: no cover
        gaussian_filter = None

    sigma_px = FWHM / (2.0 * np.sqrt(2.0 * np.log(2.0)))
    cube = np.empty((n, SIZE, SIZE), dtype=np.float64)
    evol = np.zeros((SIZE, SIZE))
    for i in range(n):
        white = rng.standard_normal((SIZE, SIZE))
        smooth = gaussian_filter(white, sigma_px)
        smooth /= smooth.std()
        evol = ar_rho * evol + np.sqrt(1.0 - ar_rho**2) * smooth
        frame = static * (1.0 + 0.01 * rng.standard_normal())
        frame = frame + evol * target_std
        frame = frame + 0.8 * rng.standard_normal((SIZE, SIZE))
        # sub-pixel pointing jitter (<0.05 px), as in real centred sequences
        frame = _fft_shift(frame, 0.05 * rng.standard_normal(),
                           0.05 * rng.standard_normal())
        cube[i] = frame

    psf = moffat_psf()

    planet_yx = None
    if inject_planet:
        # flux-normalised PSF for injection: unit flux in a 1-FWHM aperture
        psfn = psf / _aperture_flux(psf, FWHM)
        cy = cx = (SIZE - 1) / 2.0
        big = np.zeros((SIZE, SIZE))
        p = psfn.shape[0]
        y0 = SIZE // 2 - p // 2
        big[y0:y0 + p, y0:y0 + p] = psfn
        for i in range(n):
            # in frame i the companion sits at theta_i = THETA - angle_i so
            # that derotating by angle_i lands it at THETA (VIP convention,
            # reference fm/fakecomp.py:336-337)
            th = np.radians(THETA_DEG - angles[i])
            dy = SEP_PX * np.sin(th)
            dx = SEP_PX * np.cos(th)
            cube[i] += PLANET_FLUX * _fft_shift(big, dy, dx)
        planet_yx = (cy + SEP_PX * np.sin(np.radians(THETA_DEG)),
                     cx + SEP_PX * np.cos(np.radians(THETA_DEG)))

    return cube, angles, psf, FWHM, planet_yx


def _aperture_flux(frame, fwhm):
    """Flux in a centred 1-FWHM-diameter aperture (simple subpixel grid)."""
    ny, nx = frame.shape
    c = (ny - 1) / 2.0
    yy, xx = np.mgrid[:ny, :nx].astype(np.float64)
    rad = fwhm / 2.0
    # 5x5 subpixel sampling of the aperture boundary
    acc = np.zeros((ny, nx))
    for oy in np.linspace(-0.4, 0.4, 5):
        for ox in np.linspace(-0.4, 0.4, 5):
            acc += (np.hypot(yy + oy - c, xx + ox - c) <= rad)
    return float((frame * acc / 25.0).sum())


_CACHE = {}


def get_replica():
    """Cached deterministic replica (module-level, tests share it)."""
    if "ds" not in _CACHE:
        _CACHE["ds"] = make_naco_replica()
    return _CACHE["ds"]


def make_ifs_replica(seed=20260818, n_ch=13, n_fr=20, size=101):
    """4-D SPHERE-IFS-like replica for the mSDI paths.

    Mirrors the shape regime of the reference's example_dataset_ifs fixture
    (sphere_v471tau_cube 4-D cube cropped to 100x100; reference
    tests/conftest.py:84-131): (n_ch, n_fr, y, x) with wavelengths spanning
    the YJ band and the same physically-computed PA law.
    """
    rng = np.random.default_rng(seed)
    static = _read_real_frame()
    scl = 40.0 / static[50, 50] if static[50, 50] else 1.0
    wavelengths = np.linspace(0.95, 1.35, n_ch)
    angles = beta_pic_parallactic_angles(n=n_fr, span_hours=2.0)
    prof, rbin = _radial_std_profile(static)

    from scipy.ndimage import gaussian_filter, zoom

    cube = np.empty((n_ch, n_fr, size, size), dtype=np.float64)
    for c in range(n_ch):
        # speckles scale radially with wavelength: emulate by zooming the
        # static field by lambda/lambda_0 about the center
        factor = wavelengths[c] / wavelengths[0]
        zoomed = zoom(static, factor, order=3)
        zy = (zoomed.shape[0] - size) // 2
        if zy >= 0:
            ch_static = zoomed[zy:zy + size, zy:zy + size]
        else:  # pragma: no cover
            ch_static = static
        evol = np.zeros((size, size))
        for i in range(n_fr):
            white = gaussian_filter(rng.standard_normal((size, size)), 2.0)
            white /= white.std()
            evol = 0.9 * evol + np.sqrt(1 - 0.81) * white
            cube[c, i] = (ch_static + evol * 0.15 * prof[rbin]
                          + 0.5 * rng.standard_normal((size, size)))
    psf = np.stack([moffat_psf(size=31, fwhm=4.0 * w / wavelengths[0],
                               peak=900.0) for w in wavelengths])
    return cube, angles, wavelengths, psf
