"""Multi-chip NEGFC MCMC: the walker axis sharded over the device mesh.

The reference evaluates emcee walkers in a fork pool
(negfc_mcmc.py:950-963, the P5 workload of SURVEY §2.c). On device the
log-probability is already one vmapped inject->PCA-annulus->chi^2
program per walker batch (ops.negfc_model); here that batch axis is
sharded with shard_map, so each chip evaluates its own walkers and the
host stretch-move loop sees one global (nwalkers,) vector per sweep. No
collectives are needed inside the likelihood — walkers are independent.
"""

import numpy as np

import jax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_sharded_batched_lnprob"]


def make_sharded_batched_lnprob(mesh, *args, axis="walkers", **kwargs):
    """Sharded drop-in for ``ops.negfc_model.make_batched_lnprob``:
    (nwalkers, ndim) -> (nwalkers,), with walkers spread over ``mesh``.

    The returned callable accepts global coordinate arrays; nwalkers must
    divide evenly over the mesh devices. Pass it directly to
    ``run_stretch_mcmc`` or the ``mcmc_negfc_sampling`` loop.
    """
    from ..ops.negfc_model import make_negfc_lnprob

    lnprob = make_negfc_lnprob(*args, **kwargs)

    def step(coords_loc):
        return jax.vmap(lnprob)(coords_loc)

    sharded = shard_map(step, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
                        check_vma=False)
    jitted = jax.jit(sharded)
    spec = NamedSharding(mesh, P(axis))

    def lnprob_batched(coords):
        coords = jax.device_put(np.asarray(coords, dtype=float), spec)
        return jitted(coords)

    return lnprob_batched
