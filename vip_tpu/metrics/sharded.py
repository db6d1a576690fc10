"""Multi-chip S/N map: radius rows of the polar engine sharded over the
device mesh.

The reference parallelizes its S/N map with one fork-pool task per pixel
(snr_source.py:121-122, the P3 workload of SURVEY §2.c). Here the polar
reformulation (ops.apertures.snrmap_polar_engine) makes radius rows the
natural shard axis: each device computes the ring statistics of its
radius band locally (the frame is replicated — it is tiny next to the
polar grid work), one all_gather assembles the (n_r, n_theta) S/N grid,
and the cartesian resampling is sharded over output rows.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config.parallel import frame_mesh, shard_cube

__all__ = ["make_sharded_snrmap", "sharded_snrmap",
           "sharded_pattern_frames"]


def make_sharded_snrmap(mesh, shape, fwhm, n_theta=0,
                        exclude_negative_lobes=False, axis="px"):
    """Build the jitted sharded S/N-map step for frames of ``shape``.

    Returns a function (frame,) -> snrmap, both full arrays (the frame is
    consumed replicated, the map produced replicated).
    """
    from ..ops.apertures import polar_snr_rows, polar_snr_to_cart

    ny, nx = shape
    cy = ny / 2 if ny % 2 == 0 else (ny - 1) / 2
    cx = nx / 2 if nx % 2 == 0 else (nx - 1) / 2
    r_ap = fwhm / 2.0
    n_r = int(min(cy, cx, ny - cy, nx - cx)) - int(np.ceil(r_ap)) - 1
    if n_theta == 0:
        n_theta = 4 * max(ny, nx)
    n_dev = len(mesh.devices.ravel())
    band = -(-n_r // n_dev)  # radius rows per device (last band padded)
    # pad with duplicate radii; padded rows are discarded after the gather
    radii_full = np.arange(1, n_r + 1, dtype=float)
    radii_pad = np.pad(radii_full, (0, band * n_dev - n_r), mode="edge")

    def step(frame):
        idx = jax.lax.axis_index(axis)
        radii_loc = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(radii_pad, frame.dtype), idx * band, band)
        rows_loc = polar_snr_rows(frame, radii_loc, fwhm, n_theta,
                                  exclude_negative_lobes)
        snr_p = jax.lax.all_gather(rows_loc, axis, tiled=True)[:n_r]
        return polar_snr_to_cart(snr_p, (ny, nx), fwhm, n_theta)

    sharded = shard_map(step, mesh=mesh, in_specs=P(), out_specs=P(),
                        check_vma=False)
    return jax.jit(sharded)


def sharded_snrmap(frame, fwhm, mesh=None, **kwargs):
    """Convenience wrapper: replicate the frame, run the sharded polar
    S/N engine, return a numpy map."""
    if mesh is None:
        mesh = frame_mesh(axis_name="px")
    frame = np.asarray(frame, dtype=np.float32)
    fn = make_sharded_snrmap(mesh, frame.shape, float(fwhm), **kwargs)
    rep = jax.device_put(frame, NamedSharding(mesh, P()))
    return np.asarray(fn(rep))


def sharded_pattern_frames(cubes_fc, angles, mesh=None, ncomp=5,
                           method="eigen", collapse="median",
                           rot_mode="fft", chunk=None):
    """Contrast-curve injection patterns sharded across the device mesh.

    The throughput stage reduces one injected cube per (radial pattern,
    branch) — embarrassingly parallel work the reference loops serially
    (contrcurve.py:584-1096) and the single-chip fast path vmaps
    (metrics.contrcurve._batched_pca_frames). Here the pattern axis is
    laid over the mesh so each device runs the full PCA-ADI pipeline on
    its share of the injected cubes; no collectives are needed until the
    (tiny) final frames are gathered. Patterns are padded to a multiple
    of the mesh size and the padding sliced off after.
    """
    from ..ops.pipeline import pca_adi_pipeline

    if mesh is None:
        mesh = frame_mesh(axis_name="patterns")
    axis = mesh.axis_names[0]
    n_dev = len(mesh.devices.ravel())

    # keep the caller's precision: under the x64 parity configuration the
    # pattern frames must match the vmapped/serial paths bit-for-bit
    dtype = np.result_type(np.float32, *[np.asarray(c).dtype
                                         for c in cubes_fc])
    stack = np.stack([np.asarray(c, dtype) for c in cubes_fc])
    n_pat = stack.shape[0]
    n_pad = -(-n_pat // n_dev) * n_dev - n_pat
    if n_pad:
        stack = np.concatenate([stack, np.repeat(stack[-1:], n_pad, 0)])

    stack_sh = shard_cube(jnp.asarray(stack), mesh, axis_name=axis)
    angs = jax.device_put(jnp.asarray(np.asarray(angles, dtype)),
                          NamedSharding(mesh, P()))

    @jax.jit
    def _reduce_all(cubes, a):
        return jax.vmap(lambda c: pca_adi_pipeline(
            c, a, ncomp=ncomp, method=method, collapse=collapse,
            chunk=chunk, rot_mode=rot_mode))(cubes)

    out = _reduce_all(stack_sh, angs)
    return np.asarray(out)[:n_pat]
