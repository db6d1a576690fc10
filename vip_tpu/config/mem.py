"""Host and device memory guards.

The reference guards host RAM via psutil (config/mem.py:12-66). On TPU the
relevant budget is device HBM, so this module guards both: host RAM for
numpy staging arrays, and HBM for the device-resident cubes.
"""

__all__ = ["check_enough_memory", "get_available_memory", "get_available_hbm"]


def get_available_memory(verbose=True):
    """Return available host memory in bytes."""
    from psutil import virtual_memory

    mem = virtual_memory()
    if verbose:
        print("System total memory = {:.3f} GB".format(mem.total / 1e9))
        print("System available memory = {:.3f} GB".format(mem.available / 1e9))
    return mem.available


def get_available_hbm(device=None, verbose=False):
    """Return (an estimate of) available HBM bytes on a JAX device.

    Falls back to the device's total memory when per-allocation stats are
    unavailable (e.g. CPU backend, where the answer is host RAM).
    """
    import jax

    if device is None:
        device = jax.devices()[0]
    try:
        stats = device.memory_stats()
        if stats is not None and "bytes_limit" in stats:
            avail = stats["bytes_limit"] - stats.get("bytes_in_use", 0)
            if verbose:
                print("Device HBM available = {:.3f} GB".format(avail / 1e9))
            return avail
    except Exception:
        pass
    return get_available_memory(verbose=verbose)


def check_enough_memory(input_bytes, factor=1, raise_error=True, error_msg="",
                        verbose=True):
    """Check ``input_bytes`` against available host memory × ``factor``."""
    available_memory = get_available_memory(verbose=verbose)
    if input_bytes > factor * available_memory:
        if raise_error:
            raise RuntimeError(
                "Input is larger than available system memory" + error_msg
            )
        return False
    return True
