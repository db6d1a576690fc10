"""Image statistics (reference vip_hci/stats/im_stats.py)."""

import numpy as np

from ..config.utils_conf import check_array
from ..var.coords import frame_center
from ..var.shapes import mask_circle

__all__ = ["frame_histo_stats", "frame_average_radprofile"]


def frame_average_radprofile(frame, sep=1, init_rad=None,
                             subtr_profile=False, plot=True):
    """Average radial profile of a frame via integer-radius bincount
    (reference im_stats.py:18-87)."""
    import pandas as pd

    check_array(frame, dim=2)
    cy, cx = frame_center(frame)
    init_rad = 1 if init_rad is None else init_rad
    x, y = np.indices(frame.shape)
    r = np.hypot(x - cx, y - cy).astype(int)
    npx_per_rad = np.bincount(r.ravel())
    radprofile = np.bincount(r.ravel(), frame.ravel()) / npx_per_rad
    nr = npx_per_rad

    radists = np.arange(init_rad + 1, int(cy), sep) - 1
    df = pd.DataFrame({"rad": radists, "radprof": radprofile[radists],
                       "npx": nr[radists]})
    if plot:
        import matplotlib.pyplot as plt
        plt.figure()
        plt.plot(radists, radprofile[radists], ".-", alpha=0.6)
        plt.grid(which="both", alpha=0.4)
        plt.xlabel("Pixels")
        plt.ylabel("Counts")

    if subtr_profile:
        radprofile_img = radprofile[r]
        subtr_frame = frame - radprofile_img
        if init_rad > 1:
            subtr_frame = mask_circle(subtr_frame, radius=init_rad)
        return df, subtr_frame
    return df


def frame_histo_stats(image_array, plot=True):
    """Basic frame statistics (mean, median, std, max, min)
    (reference im_stats.py:88-142)."""
    vector = image_array.ravel()
    mean, median, std = vector.mean(), np.median(vector), vector.std()
    maxim, minim = vector.max(), vector.min()
    if plot:
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(nrows=1, ncols=2, figsize=(10, 4))
        axes[0].imshow(image_array, origin="lower", interpolation="nearest")
        axes[1].hist(vector, bins=int(np.sqrt(vector.size)))
        plt.show()
    return mean, median, std, maxim, minim
