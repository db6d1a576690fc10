"""Wall-clock timing helpers (reference: config/timing.py:14-47)."""

from datetime import datetime

from .utils_conf import sep

__all__ = ["time_ini", "timing", "time_fin", "device_trace",
           "annotate_trace"]


def time_ini(verbose=True):
    """Set (and optionally print) the start time."""
    start_time = datetime.now()
    if verbose:
        print(sep)
        print("Starting time: " + start_time.strftime("%Y-%m-%d %H:%M:%S"))
        print(sep)
    return start_time


def timing(start_time):
    """Print elapsed time since ``start_time``."""
    print("Running time:  " + str(datetime.now() - start_time))
    print(sep)


def time_fin(start_time):
    """Return elapsed time since ``start_time`` as a string."""
    return str(datetime.now() - start_time)


class device_trace:
    """Optional device profiling hook (SURVEY §5): context manager wrapping
    ``jax.profiler.trace`` so any algorithm section can be captured for
    TensorBoard/XProf. The reference only offers wall-clock prints
    (reference config/timing.py:14-47); on TPU the XLA trace shows per-op
    HBM/MXU utilisation.

    Usage::

        with device_trace("/tmp/vip-trace"):
            pca(cube, angs, ncomp=10)
    """

    def __init__(self, log_dir, create_perfetto_link=False):
        self.log_dir = log_dir
        self.create_perfetto_link = create_perfetto_link

    def __enter__(self):
        import jax

        jax.profiler.start_trace(
            self.log_dir, create_perfetto_link=self.create_perfetto_link)
        return self

    def __exit__(self, *exc):
        import jax

        jax.profiler.stop_trace()
        return False


def annotate_trace(name):
    """Named sub-span inside a ``device_trace`` capture
    (jax.profiler.TraceAnnotation passthrough)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
