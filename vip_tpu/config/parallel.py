"""TPU-native parallel backend.

This module is the architectural replacement of the reference's
``pool_map`` fork-Pool layer (vip_hci/config/utils_conf.py:445-551) and its
nine parallelism strategies (SURVEY.md §2.c). The mapping:

- frame-/annulus-/pixel-level fork pools  →  ``jax.vmap`` (one fused XLA op)
- memory-bounded batching                 →  ``chunked_vmap`` (lax.map with
  ``batch_size``), replacing the reference's memmap/IncrementalPCA batching
- multi-node scaling                      →  ``jax.sharding.Mesh`` +
  ``shard_map`` over the frame axis, XLA collectives over ICI
- BLAS-thread pinning                     →  n/a (XLA owns the device)

Single-chip ``vmap`` saturates the MXU/VPU for the baseline cube sizes;
``frame_mesh``/``shard_cube`` provide the multi-chip path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "chunked_vmap",
    "frame_mesh",
    "shard_cube",
    "device_put_sharded_frames",
    "sharded_frame_map",
]


def chunked_vmap(fun, batch_size=None):
    """Vectorize ``fun`` over a leading axis, processing ``batch_size``
    elements at a time to bound peak device memory.

    Equivalent to ``jax.vmap(fun)`` when ``batch_size`` is None. With a
    batch size, uses ``lax.map``'s chunked vectorization: each chunk is
    vmapped, chunks run sequentially — the device-memory analogue of the
    reference's out-of-core batching (utils_pca.py:431-614).
    """
    if batch_size is None:
        return jax.vmap(fun)

    def mapped(*args):
        return jax.lax.map(lambda xs: fun(*xs), args, batch_size=batch_size)

    return mapped


def frame_mesh(n_devices=None, axis_name="frames", devices=None):
    """Build a 1-D device mesh over which cube frame axes are sharded.

    ADI/SDI workloads are data-parallel over frames (SURVEY.md §2.c P1): the
    natural multi-chip layout shards the frame axis so per-frame FFT work is
    local and only the SVD/collapse stages need collectives over ICI.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices), axis_names=(axis_name,))


def shard_cube(cube, mesh, axis_name=None, spec=None):
    """Place a cube on ``mesh`` sharded along its leading (frame) axis,
    or along an explicit PartitionSpec ``spec``."""
    if spec is None:
        spec = P(mesh.axis_names[0] if axis_name is None else axis_name)
    return jax.device_put(cube, NamedSharding(mesh, spec))


def device_put_sharded_frames(cube, mesh=None):
    """Convenience: shard ``cube`` over all local devices along frames."""
    if mesh is None:
        mesh = frame_mesh()
    return shard_cube(cube, mesh)


def sharded_frame_map(fun, mesh, axis_name="frames", out_specs=None):
    """Wrap a per-shard function with ``shard_map`` over the frame axis.

    ``fun`` receives the local block of each input (frames split across
    devices) and may use collectives (``jax.lax.psum`` etc.) over
    ``axis_name``. This is the multi-chip analogue of the reference's
    frame-level ``pool_map`` parallelism.
    """
    from jax import shard_map

    if out_specs is None:
        out_specs = P(axis_name)
    return shard_map(
        fun,
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=out_specs,
    )


def tree_to_numpy(tree):
    """Pull a pytree of device arrays back to host numpy arrays."""
    import numpy as np

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
