"""vip_tpu — TPU-native high-contrast direct-imaging framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``vortex-exoplanet/VIP`` (reference layout mirrored for user familiarity;
see /root/reference/src/vip_hci/__init__.py:19-23 for the lazy-subpackage
convention reproduced here). All hot compute paths are expressed as batched,
jit-compiled device computation: vmapped FFT transforms over image cubes,
batched SVDs over stacked (annular) matrices, vectorized aperture photometry,
and on-device MCMC walker batches — replacing the reference's per-frame /
per-annulus ``multiprocessing`` pools and LAPACK/CuPy offload.
"""

__version__ = "0.1.0"

_SUBPACKAGES = (
    "config",
    "fits",
    "var",
    "stats",
    "preproc",
    "ops",
    "psfsub",
    "metrics",
    "fm",
    "invprob",
    "greedy",
    "objects",
)


def __getattr__(name):
    if name in _SUBPACKAGES:
        import importlib

        return importlib.import_module(f"{__name__}.{name}")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_SUBPACKAGES))
