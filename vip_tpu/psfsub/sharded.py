"""Multi-chip PCA-ADI via shard_map over a frame-axis device mesh.

The reference's only scaling mechanism is a single-host fork pool
(SURVEY.md §2.c); this module is the ICI-native replacement: the cube's
frame axis is sharded across devices, the per-frame FFT derotation stays
local, and the PCA stages communicate with XLA collectives:

  Gram matrix   C = M Mᵀ       — all_gather(M) + local matmul (rows of C)
  eigh(C)                      — replicated (n_frames × n_frames is small)
  PCs           V = EVᵀ M      — local partial matmul + psum over ICI
  projection    M - (M Vᵀ) V   — fully local
  collapse                     — psum (mean) over the frame axis

This is the step exercised by ``__graft_entry__.dryrun_multichip`` on a
virtual CPU mesh and by real pods on ICI.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..preproc.derotation import rotate_fft_pipeline

__all__ = ["sharded_pca_adi", "make_sharded_pca_adi",
           "make_sharded_median_adi"]


def make_sharded_pca_adi(mesh, ncomp, axis="frames", collapse="mean"):
    """Build the jitted, sharded PCA-ADI step for ``mesh``.

    Returns a function (cube, angles) -> collapsed frame, where cube/angles
    are (globally) the full arrays; they will be consumed sharded along the
    frame axis.
    """
    if collapse not in ("mean", "median"):
        raise ValueError("sharded collapse supports 'mean' and 'median'")

    def step(cube_loc, angles_loc):
        n_loc, y, x = cube_loc.shape
        M_loc = cube_loc.reshape(n_loc, -1)

        # ---- distributed Gram matrix ----
        M_full = jax.lax.all_gather(M_loc, axis, tiled=True)       # (n, p)
        C_loc = M_loc @ M_full.T                                   # (n_loc, n)
        C = jax.lax.all_gather(C_loc, axis, tiled=True)            # (n, n)

        # ---- replicated small eigendecomposition ----
        e, EV = jnp.linalg.eigh(C)

        # ---- distributed principal components: V = EVᵀ M ----
        idx = jax.lax.axis_index(axis)
        EV_loc = jax.lax.dynamic_slice_in_dim(EV, idx * n_loc, n_loc, 0)
        V_part = EV_loc.T @ M_loc                                  # (n, p)
        V = jax.lax.psum(V_part, axis)
        V = V[::-1]
        S = jnp.sqrt(jnp.abs(e))[::-1]
        V = V / S[:, None]
        V = V[:ncomp]                                              # (k, p)

        # ---- local projection / subtraction ----
        recon = (M_loc @ V.T) @ V
        resid = (M_loc - recon).reshape(n_loc, y, x)

        # ---- local FFT derotation ----
        der = jax.vmap(rotate_fft_pipeline)(resid, -angles_loc)

        # ---- cross-device collapse ----
        if collapse == "median":
            return _sharded_median(der, axis)
        n_total = n_loc * jax.lax.psum(jnp.ones(()), axis)
        return jax.lax.psum(jnp.sum(der, axis=0), axis) / n_total

    sharded = shard_map(step, mesh=mesh, in_specs=(P("frames"), P("frames")),
                        out_specs=P(), check_vma=False)
    return jax.jit(sharded)


def sharded_pca_adi(cube, angles, ncomp=5, mesh=None):
    """Convenience wrapper: shard, run, return numpy frame."""
    import numpy as np

    if mesh is None:
        devices = np.array(jax.devices())
        mesh = Mesh(devices, axis_names=("frames",))
    n_dev = len(mesh.devices.ravel())
    n = cube.shape[0]
    if n % n_dev:
        raise ValueError(f"n_frames ({n}) must divide evenly over "
                         f"{n_dev} devices")
    fn = make_sharded_pca_adi(mesh, ncomp)
    cube_sh = jax.device_put(cube, NamedSharding(mesh, P("frames")))
    ang_sh = jax.device_put(angles, NamedSharding(mesh, P("frames")))
    return np.asarray(fn(cube_sh, ang_sh))


def _sharded_median(der_loc, axis):
    """Median over the (sharded) frame axis via an all_to_all reshard:
    frame-sharded (n_loc, y, x) -> pixel-sharded (n, y_loc, x) so every
    device holds all frames of its row slab, local median, then
    all_gather back to the full frame. Collectives ride ICI."""
    full = jax.lax.all_to_all(der_loc, axis, split_axis=1, concat_axis=0,
                              tiled=True)            # (n, y_loc, x)
    med_loc = jnp.median(full, axis=0)               # (y_loc, x)
    return jax.lax.all_gather(med_loc, axis, tiled=True)  # (y, x)


def make_sharded_median_adi(mesh, axis="frames", collapse="median"):
    """Sharded full-frame median-ADI: the temporal median model needs all
    frames per pixel, so it runs pixel-sharded (all_to_all), the residual
    derotation runs frame-sharded, and the final collapse reshards again.
    """

    def step(cube_loc, angles_loc):
        n_loc, y, x = cube_loc.shape
        # temporal median per pixel: reshard to (n, y_loc, x)
        full = jax.lax.all_to_all(cube_loc, axis, split_axis=1,
                                  concat_axis=0, tiled=True)
        med_loc = jnp.median(full, axis=0)                 # (y_loc, x)
        med = jax.lax.all_gather(med_loc, axis, tiled=True)  # (y, x)
        resid = cube_loc - med[None]
        der = jax.vmap(rotate_fft_pipeline)(resid, -angles_loc)
        if collapse == "median":
            return _sharded_median(der, axis)
        n_total = n_loc * jax.lax.psum(jnp.ones(()), axis)
        return jax.lax.psum(jnp.sum(der, axis=0), axis) / n_total

    sharded = shard_map(step, mesh=mesh,
                        in_specs=(P("frames"), P("frames")), out_specs=P(),
                        check_vma=False)
    return jax.jit(sharded)
