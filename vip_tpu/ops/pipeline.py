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


def _derotate_frames(cube, angles, chunk=None):
    """Derotate (rotate by -angles) with the reference's pad pipeline,
    optionally chunked to bound HBM."""
    from ..preproc.derotation import rotate_fft_pipeline

    if chunk is None or chunk >= cube.shape[0]:
        return jax.vmap(rotate_fft_pipeline)(cube, -angles)
    return jax.lax.map(lambda fa: rotate_fft_pipeline(fa[0], -fa[1]),
                       (cube, angles), batch_size=chunk)


@functools.partial(
    jax.jit,
    static_argnames=("ncomp", "method", "collapse", "scaling", "chunk"),
)
def pca_adi_pipeline(cube, angles, ncomp=10, method="eigen", collapse="median",
                     scaling=None, chunk=None):
    """Full-frame PCA-ADI reduction as a single XLA program.

    cube: (n, y, x); angles: (n,) derotation angles [deg]. Returns the
    collapsed residual frame (y, x).
    """
    n, y, x = cube.shape
    M = cube.reshape(n, -1)
    M = matrix_scaling_jax(M, scaling)
    V = svd_top(M, ncomp, method=method)
    recon = (M @ V.T) @ V
    resid = (cube.reshape(n, -1) - recon).reshape(n, y, x)
    der = _derotate_frames(resid, angles, chunk=chunk)
    from ..preproc.subsampling import collapse_jax

    return collapse_jax(der, mode=collapse)


@functools.partial(jax.jit, static_argnames=("collapse", "chunk"))
def derotate_collapse(cube, angles, collapse="median", chunk=None):
    """Derotate + collapse only (the tail of every ADI algorithm)."""
    from ..preproc.subsampling import collapse_jax

    der = _derotate_frames(cube, angles, chunk=chunk)
    return collapse_jax(der, mode=collapse)


@functools.partial(jax.jit, static_argnames=("collapse", "chunk"))
def median_adi_pipeline(cube, angles, collapse="median", chunk=None):
    """Full-frame median-ADI as a single XLA program."""
    resid = cube - jnp.median(cube, axis=0)
    return derotate_collapse(resid, angles, collapse=collapse, chunk=chunk)
