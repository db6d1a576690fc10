"""Utility functions for the NEGFC algorithms
(reference vip_hci/fm/utils_negfc.py)."""

import numpy as np

__all__ = ["find_nearest"]


def find_nearest(array, value, output="index", constraint=None, n=1):
    """Find the index/value of an array's n closest elements to ``value``
    (reference utils_negfc.py:12-76).

    ``constraint``: None, 'ceil', 'floor', 'ceil=' or 'floor=' restricts the
    search to elements above/below (or equal to) ``value``.
    """
    array = np.asarray(array)
    if constraint is None:
        fm = np.abs(array - value)
        idx = np.argpartition(fm, n)[:n]
    elif "floor" in constraint or "ceil" in constraint:
        indices = np.arange(len(array), dtype=np.int32)
        if "floor" in constraint:
            fm = -(array - value)
        else:
            fm = array - value
        if "=" in constraint:
            crop_indices = indices[fm >= 0]
            fm = fm[fm >= 0]
        else:
            crop_indices = indices[fm > 0]
            fm = fm[fm > 0]
        if len(fm) == 0:
            print("No indices match the constraint ({} w.r.t {:.2f})"
                  .format(constraint, value))
            raise ValueError("No indices match the constraint")
        nn = min(n, len(fm) - 1) if len(fm) > 1 else 0
        if nn == 0:
            idx = np.array([np.argmin(fm)])
        else:
            idx = np.argpartition(fm, nn)[:n]
        idx = crop_indices[idx]
    else:
        raise ValueError("Constraint not recognised")

    if n == 1:
        idx = idx[0]
    if output == "index":
        return idx
    elif output == "value":
        return array[idx]
    return array[idx], idx
