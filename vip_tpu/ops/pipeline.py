"""Fused end-to-end device pipelines.

The flagship computation — full-frame PCA-ADI: prepare matrix → SVD →
project/subtract → FFT-derotate every frame → collapse — expressed as ONE
jittable XLA program (the reference executes it as LAPACK + fork pools:
pca_fullfr.py:801-1035). Used by the benchmark, the graft entry point, and
the high-throughput APIs (e.g. batched contrast-curve injections).
"""

import functools

import jax
import jax.numpy as jnp

from .fft import rotate_fft
from .linalg import matrix_scaling_jax, svd_top
from ..preproc.derotation import _fft_rotate_geometry

__all__ = ["pca_adi_pipeline", "derotate_collapse", "median_adi_pipeline"]


def _derotate_frames(cube, angles, chunk=None, rot_mode="fft",
                     interpolation="bicubic"):
    """Derotate (rotate by -angles). rot_mode='fft' uses the reference's
    exact flux-preserving 3-shear pad pipeline; rot_mode='interp' uses the
    batched gather rotation (speed mode — the analog of the reference's
    OpenCV path, reference README.rst:183), optionally chunked to bound
    HBM."""
    if rot_mode == "interp":
        from ..config.parallel import chunked_vmap
        from .interp_rotation import rotate_interp_batch

        if chunk is None or chunk >= cube.shape[0]:
            return rotate_interp_batch(cube, -angles, mode=interpolation)
        return chunked_vmap(
            lambda f, a: rotate_interp_batch(f[None], -a[None],
                                             mode=interpolation)[0],
            batch_size=chunk)(cube, angles)
    if rot_mode == "fft-small":
        # 1.25x-padded, packed 3-shear FFT rotation restricted to the
        # inscribed circular FoV: for circle-masked content the shear
        # intermediates reach at most 1.082R (|x| <= R sqrt(1+tan(22.5)^2))
        # for the |angle|<=45 deg quadrant-reduced rotations, so a 1.25x
        # canvas is wrap-free and the exact mode's 4x flux-preserving
        # canvas is unnecessary. Pixels outside the inscribed circle are
        # zeroed (the corners are outside the scientific FoV).
        import os

        from .fft import rotate_fft_fast_batch
        from .pallas_shear import (fused_small_supported,
                                   rotate_fft_small_fused)

        sz = cube.shape[-1]
        pad_to = -(-int(sz * 1.25) // 2) * 2  # even ceil
        # Opt-in fused Pallas matmul-DFT shears on a 128-foldable canvas
        # (>= 1.25x stays wrap-free). Measured SLOWER than the packed
        # jnp.fft path on v5e at 512^2 (1481 vs 1636 frames/s: the pack
        # rides two real frames per complex FFT and the small canvas
        # keeps XLA's FFT efficient), so the default stays "packed";
        # the fused variant is kept for other geometries and as the
        # more accurate option (it carries complex intermediates).
        pad_fused = -(-int(sz * 1.25) // 128) * 128
        use_fused = (
            os.environ.get("VIP_SMALL_SHEAR", "packed") == "fused"
            and cube.dtype == jnp.float32
            and fused_small_supported(pad_fused)
            and jax.default_backend() not in ("cpu",)
        )
        if use_fused:
            pad_to = pad_fused
        m0 = (pad_to - sz) // 2
        m1 = pad_to - sz - m0
        qq = jnp.arange(sz) - sz / 2
        fov = (qq[:, None]**2 + qq[None, :]**2) < (sz / 2) ** 2

        def _rot_small(frames, angs):
            frames = jnp.where(fov[None], frames, 0.0)
            padded = jnp.pad(frames, ((0, 0), (m0, m1), (m0, m1)))
            if use_fused:
                out = rotate_fft_small_fused(padded, angs)
            else:
                # prune the two x-shears to the content/crop row slab
                # (+1 for the quadrant-rot90 shift) — exactness-preserving
                out = rotate_fft_fast_batch(
                    padded, angs,
                    support_rows=(m0, min(pad_to - m0, sz + 1)))
            return out[:, m0:m0 + sz, m0:m0 + sz]

        if chunk is None or chunk >= cube.shape[0]:
            return _rot_small(cube, -angles)
        n = cube.shape[0]
        nch = -(-n // chunk)
        pad_n = nch * chunk - n
        cube_p = jnp.pad(cube, ((0, pad_n), (0, 0), (0, 0)))
        ang_p = jnp.pad(-angles, (0, pad_n))
        cube_c = cube_p.reshape(nch, chunk, *cube.shape[1:])
        ang_c = ang_p.reshape(nch, chunk)
        out = jax.lax.map(lambda fa: _rot_small(fa[0], fa[1]),
                          (cube_c, ang_c))
        return out.reshape(nch * chunk, *cube.shape[1:])[:n]
    # exact mode: the reference's 4x flux-preserving pipeline with
    # support pruning (bit-identical; see ops.fft.rotate_fft_exact_pruned)
    from ..preproc.derotation import _fft_rotate_geometry
    from .fft import rotate_fft_exact_pruned

    n, y, x = cube.shape
    if y == x and y % 2 == 0:
        (pad_y, pad_x, py0, px0, cy0, cy1, cx0, cx1) = \
            _fft_rotate_geometry(y, x)

        # On TPU at float32, run the three shears as fused Pallas
        # matmul-DFT kernels (same math, ~equal f32 accuracy, no HBM
        # canvas). Default "auto" = the per-shear kernels ("fused").
        # "fused3" = the canvas-resident single-kernel variant
        # (rotate_fft_exact_fused3): intermediates stay in VMEM, saving
        # ~84 MB/frame of HBM round-trips at 512^2 — but the Mosaic
        # compile of the 3-stage kernel runs >1 h on the remote
        # compiler (measured 2026-08-20), so it is opt-in until the
        # program size is tamed. "pruned" = the jnp.fft path (CPU/x64
        # parity). Env override VIP_EXACT_SHEAR.
        import os

        from .pallas_shear import (fused_shear_supported,
                                   rotate_fft_exact_fused,
                                   rotate_fft_exact_fused3)

        shear_impl = os.environ.get("VIP_EXACT_SHEAR", "auto")
        use_fused = (
            shear_impl != "pruned"
            and cube.dtype == jnp.float32
            and fused_shear_supported(y, pad_y)
            and jax.default_backend() not in ("cpu",)
        )

        def _rot_exact(frames, angs):
            if use_fused and shear_impl == "fused3":
                return rotate_fft_exact_fused3(frames, angs, pad_y, py0,
                                               px0, cy0, cy1, cx0, cx1)
            if use_fused:
                return rotate_fft_exact_fused(frames, angs, pad_y, py0,
                                              px0, cy0, cy1, cx0, cx1)
            return rotate_fft_exact_pruned(frames, angs, pad_y, py0, px0,
                                           cy0, cy1, cx0, cx1)

        if chunk is None or chunk >= n:
            return _rot_exact(cube, -angles)
        nch = -(-n // chunk)
        pad_n = nch * chunk - n
        cube_p = jnp.pad(cube, ((0, pad_n), (0, 0), (0, 0)))
        ang_p = jnp.pad(-angles, (0, pad_n))
        out = jax.lax.map(
            lambda fa: _rot_exact(fa[0], fa[1]),
            (cube_p.reshape(nch, chunk, y, x), ang_p.reshape(nch, chunk)))
        return out.reshape(nch * chunk, y, x)[:n]

    from ..preproc.derotation import rotate_fft_pruned_batch

    if chunk is None or chunk >= cube.shape[0]:
        return rotate_fft_pruned_batch(cube, -angles)
    nch = -(-n // chunk)
    pad_n = nch * chunk - n
    cube_p = jnp.pad(cube, ((0, pad_n), (0, 0), (0, 0)))
    ang_p = jnp.pad(-angles, (0, pad_n))
    out = jax.lax.map(
        lambda fa: rotate_fft_pruned_batch(fa[0], fa[1]),
        (cube_p.reshape(nch, chunk, y, x), ang_p.reshape(nch, chunk)))
    return out.reshape(nch * chunk, y, x)[:n]


@functools.partial(
    jax.jit,
    static_argnames=("ncomp", "method", "collapse", "scaling", "chunk",
                     "rot_mode", "interpolation"),
)
def pca_adi_pipeline(cube, angles, ncomp=10, method="eigen", collapse="median",
                     scaling=None, chunk=None, rot_mode="fft",
                     interpolation="bicubic"):
    """Full-frame PCA-ADI reduction as a single XLA program.

    cube: (n, y, x); angles: (n,) derotation angles [deg]. Returns the
    collapsed residual frame (y, x).
    """
    n, y, x = cube.shape
    M = matrix_scaling_jax(cube.reshape(n, -1), scaling)
    V = svd_top(M, ncomp, method=method)
    recon = (M @ V.T) @ V
    # residuals live in the SCALED space, like the reference's
    # _project_subtract (pca_fullfr.py:1727-1732) — subtracting recon
    # from the raw cube would leave the stellar halo in when scaling
    # is not None
    resid = (M - recon).reshape(n, y, x)
    der = _derotate_frames(resid, angles, chunk=chunk, rot_mode=rot_mode,
                           interpolation=interpolation)
    from ..preproc.subsampling import collapse_jax

    return collapse_jax(der, mode=collapse)


@functools.partial(jax.jit, static_argnames=("collapse", "chunk", "rot_mode",
                                             "interpolation"))
def derotate_collapse(cube, angles, collapse="median", chunk=None,
                      rot_mode="fft", interpolation="bicubic"):
    """Derotate + collapse only (the tail of every ADI algorithm)."""
    from ..preproc.subsampling import collapse_jax

    der = _derotate_frames(cube, angles, chunk=chunk, rot_mode=rot_mode,
                           interpolation=interpolation)
    return collapse_jax(der, mode=collapse)


@functools.partial(jax.jit, static_argnames=("collapse", "chunk"))
def median_adi_pipeline(cube, angles, collapse="median", chunk=None):
    """Full-frame median-ADI as a single XLA program."""
    from .pallas_median import nanmedian_axis0, nanmedian_supported

    if nanmedian_supported(cube, 0):
        model = nanmedian_axis0(cube, propagate=True)
    else:
        model = jnp.median(cube, axis=0)
    resid = cube - model
    return derotate_collapse(resid, angles, collapse=collapse, chunk=chunk)
