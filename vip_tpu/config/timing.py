"""Wall-clock timing helpers (reference: config/timing.py:14-47)."""

from datetime import datetime

from .utils_conf import sep

__all__ = ["time_ini", "timing", "time_fin"]


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
