"""ROC curve generation (reference vip_hci/metrics/roc.py).

``detect_sources`` (photutils) is replaced by a scipy.ndimage connected
-component labeling with the same (connectivity, npix) semantics.
"""

import copy

import numpy as np
from scipy import ndimage, stats

from ..config import time_ini, timing
from ..config.utils_conf import Progressbar
from ..fm.fakecomp import cube_inject_companions
from ..psfsub.svd import SVDecomposer
from ..var.coords import frame_center
from ..var.shapes import get_annulus_segments, get_circle

__all__ = ["EvalRoc", "compute_binary_map"]


class _Segment:
    def __init__(self, label, area):
        self.label = label
        self.area = area


class _SegmentationImage:
    """Minimal stand-in for photutils SegmentationImage: labeled array +
    per-label areas."""

    def __init__(self, data):
        self.data = data
        labels = np.unique(data)
        labels = labels[labels != 0]
        self.segments = [_Segment(int(lab), int((data == lab).sum()))
                         for lab in labels]


def detect_sources(frame, threshold, npix, connectivity=4):
    """Connected components above ``threshold`` with at least ``npix``
    pixels (photutils detect_sources equivalent)."""
    mask = frame > threshold
    if not mask.any():
        return None
    if connectivity == 4:
        structure = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    else:
        structure = np.ones((3, 3))
    labeled, nlab = ndimage.label(mask, structure=structure)
    # drop too-small blobs, relabel sequentially
    out = np.zeros_like(labeled)
    nxt = 1
    for lab in range(1, nlab + 1):
        blob = labeled == lab
        if blob.sum() >= npix:
            out[blob] = nxt
            nxt += 1
    if nxt == 1:
        return None
    return _SegmentationImage(out)


class EvalRoc:
    """Generator of receiver operating characteristic curves
    (reference roc.py:19-412)."""

    def __init__(self, dataset, plsc=0.0272, n_injections=100, inrad=8,
                 outrad=12, dist_flux=("uniform", 2, 500), mask=None):
        self.dataset = dataset
        self.plsc = plsc
        self.n_injections = n_injections
        self.inrad = inrad
        self.outrad = outrad
        self.dist_flux = dist_flux
        self.mask = mask
        self.methods = []

    def add_algo(self, name, algo, color, symbol, thresholds):
        """Register a PostProc algo with plotting metadata and thresholds."""
        self.methods.append(dict(algo=algo, name=name, color=color,
                                 symbol=symbol, thresholds=thresholds))

    def inject_and_postprocess(self, patch_size=None, cevr=0.9,
                               expvar_mode="annular", nproc=1):
        """Inject companions at random positions/fluxes and run every
        registered algo (reference roc.py:71-173)."""
        starttime = time_ini()

        if cevr is not None:
            svdecomp = SVDecomposer(self.dataset.cube, mode=expvar_mode,
                                    inrad=self.inrad, outrad=self.outrad,
                                    svd_mode="lapack", verbose=False)
            _ = svdecomp.get_cevr(ncomp_list=None)
            ratio_cumsum = svdecomp.cevr
            self.optpcs = np.searchsorted(ratio_cumsum, cevr) + 1
            print("{}% of CEVR with {} PCs".format(cevr, self.optpcs))

        width = self.outrad - self.inrad
        yy, xx = get_annulus_segments(self.dataset.cube[0], self.inrad,
                                      width)[0]
        num_patches = yy.shape[0]

        dist_fkt = dict(skewnormal=stats.skewnorm.rvs,
                        normal=np.random.normal,
                        uniform=np.random.uniform).get(self.dist_flux[0],
                                                       self.dist_flux[0])
        self.fluxes = dist_fkt(*self.dist_flux[1:], size=self.n_injections)
        self.fluxes.sort()
        inds_inj = np.random.randint(0, num_patches,
                                     size=self.n_injections)

        self.dists = []
        self.thetas = []
        for m in range(self.n_injections):
            injx = xx[inds_inj[m]] - frame_center(self.dataset.cube[0])[1]
            injy = yy[inds_inj[m]] - frame_center(self.dataset.cube[0])[0]
            self.dists.append(np.sqrt(injx**2 + injy**2))
            self.thetas.append(np.mod(np.arctan2(injy, injx) /
                                      np.pi * 180, 360))

        for m in self.methods:
            m["frames"] = []
            m["probmaps"] = []

        self.list_xy = []
        for n in Progressbar(range(self.n_injections), desc="injecting"):
            cufc, cox, coy = _create_synt_cube(self.dataset.cube,
                                               self.dataset.psf,
                                               self.dataset.angles,
                                               self.plsc,
                                               theta=self.thetas[n],
                                               flux=self.fluxes[n],
                                               dist=self.dists[n],
                                               verbose=False)
            self.list_xy.append((int(np.round(cox)), int(np.round(coy))))

            for m in self.methods:
                algo = copy.copy(m["algo"])
                _dataset = copy.copy(self.dataset)
                _dataset.cube = cufc
                if hasattr(algo, "ncomp") and cevr is not None:
                    algo.ncomp = self.optpcs
                algo.run(dataset=_dataset, verbose=False)
                algo.make_snrmap(approximated=True, nproc=nproc,
                                 verbose=False)
                m["frames"].append(algo.frame_final)
                m["probmaps"].append(algo.snr_map)
        timing(starttime)

    def compute_tpr_fps(self, **kwargs):
        """Detections / false positives per injection, method and threshold
        (reference roc.py:174-210)."""
        starttime = time_ini()
        for m in self.methods:
            m["detections"] = []
            m["fps"] = []
            m["bmaps"] = []
        print("Evaluating injections:")
        for i in Progressbar(range(self.n_injections)):
            x, y = self.list_xy[i]
            for m in self.methods:
                dets, fps, bmaps = compute_binary_map(
                    m["probmaps"][i], m["thresholds"],
                    fwhm=self.dataset.fwhm, injections=(x, y), **kwargs)
                m["detections"].append(dets)
                m["fps"].append(fps)
                m["bmaps"].append(bmaps)
        timing(starttime)

    def plot_detmaps(self, i=None, thr=9, dpi=100, axis=True, grid=False,
                     vmin=-10, vmax="max", plot_type="horiz"):
        """Plot the detection maps for one injection
        (reference roc.py:211-288)."""
        import matplotlib.pyplot as plt
        if i is None:
            i = self.n_injections // 2
        for m in self.methods:
            if plot_type in (1, "horiz"):
                fig, axes = plt.subplots(1, 3, figsize=(12, 4), dpi=dpi)
            elif plot_type in (2, "vert"):
                fig, axes = plt.subplots(3, 1, figsize=(4, 12), dpi=dpi)
            else:
                raise ValueError("`plot_type` not recognized")
            vmax_val = np.nanmax(m["frames"][i]) if vmax == "max" else vmax
            axes[0].imshow(m["frames"][i], origin="lower", vmin=vmin,
                           vmax=vmax_val)
            axes[0].set_title(f"{m['name']} frame")
            axes[1].imshow(m["probmaps"][i], origin="lower")
            axes[1].set_title("detection map")
            if thr < len(m["bmaps"][i]):
                axes[2].imshow(m["bmaps"][i][thr], origin="lower",
                               cmap="binary")
            axes[2].set_title(f"binary map (thr #{thr})")
            for ax in axes:
                if not axis:
                    ax.set_axis_off()
                ax.grid(grid)
            plt.show()

    def plot_roc_curves(self, dpi=100, figsize=(5, 5), xmin=None, xmax=None,
                        ymin=-0.05, ymax=1.02, xlog=True, label_skip_one=False,
                        legend_loc="lower right", legend_size=6,
                        show_data_labels=True, hide_overlap_label=True,
                        label_gap=(0, -0.028), save_plot=False,
                        label_params={}, line_params={}, marker_params={},
                        verbose=True):
        """Plot TPR vs mean FPs per threshold (reference roc.py:289-412)."""
        import matplotlib.pyplot as plt
        n_thresholds = len(self.methods[0]["thresholds"])
        fig = plt.figure(figsize=figsize, dpi=dpi)
        ax = fig.add_subplot(111)
        for m in self.methods:
            dets = np.asarray(m["detections"], dtype=float)
            fps = np.asarray(m["fps"], dtype=float)
            tpr = dets.mean(axis=0)
            mean_fps = fps.mean(axis=0)
            ax.plot(mean_fps, tpr, "--", color=m["color"], **line_params)
            ax.plot(mean_fps, tpr, m["symbol"], color=m["color"],
                    label=m["name"], **marker_params)
        if xlog:
            ax.set_xscale("symlog")
        ax.set_ylim(ymin, ymax)
        if xmin is not None or xmax is not None:
            ax.set_xlim(xmin, xmax)
        ax.set_xlabel("Full-frame mean FPs")
        ax.set_ylabel("TPR")
        ax.legend(loc=legend_loc, prop={"size": legend_size})
        if save_plot:
            fig.savefig(save_plot if isinstance(save_plot, str)
                        else "roc_curve.pdf", dpi=dpi)
        plt.show()


def compute_binary_map(frame, thresholds, injections, fwhm, npix=1,
                       overlap_threshold=0.7, max_blob_fact=2, plot=False,
                       debug=False):
    """Binary maps + detection/fps counts per threshold
    (reference roc.py:415-606)."""
    def _overlap_injection_blob(injection, fwhm, blob_mask):
        if len(injections[0]) > 0:
            injection_mask = get_circle(np.ones_like(blob_mask, dtype=float),
                                        radius=fwhm, cy=injection[1],
                                        cx=injection[0], mode="mask")
            injection_mask = injection_mask.astype(bool)
        else:
            injection_mask = np.zeros_like(blob_mask)
        intersection = injection_mask & blob_mask
        smallest_area = min(blob_mask.sum(), injection_mask.sum())
        return intersection.sum() / smallest_area

    list_detections = []
    list_fps = []
    list_binmaps = []
    sizey, sizex = frame.shape
    cy, cx = frame_center(frame)
    reselem_mask = get_circle(frame, radius=fwhm, cy=cy, cx=cx, mode="val")
    npix_circ_aperture = reselem_mask.shape[0]

    injections = np.asarray(injections)
    if injections.ndim == 1:
        injections = np.array([injections])

    for ithr, threshold in enumerate(thresholds):
        if debug:
            print("\nprocessing threshold #{}: {}".format(ithr + 1,
                                                          threshold))
        segments = detect_sources(frame, threshold, npix, connectivity=4)
        if segments is None:
            list_detections.append(0)
            list_binmaps.append(np.zeros_like(frame))
            list_fps.append(0)
            continue

        binmap = segments.data != 0
        detections = 0
        fps = 0
        for segment in segments.segments:
            blob_mask = segments.data == segment.label
            blob_area = segment.area
            for iinj, injection in enumerate(injections):
                if len(injections[0]) > 0:
                    if injection[0] > sizex or injection[1] > sizey:
                        raise ValueError("Wrong coordinates in "
                                         "`injections`")
                if blob_area > max_blob_fact * npix_circ_aperture:
                    fps += blob_area / npix_circ_aperture
                    break
                overlap = _overlap_injection_blob(injection, fwhm,
                                                  blob_mask)
                if overlap > overlap_threshold:
                    detections += 1
                    break
            else:
                fps += 1
        fps = np.round(fps).astype(int).item()
        list_detections.append(detections)
        list_binmaps.append(binmap)
        list_fps.append(fps)

    if plot:
        import matplotlib.pyplot as plt

        nmaps = len(list_binmaps)
        fig, axes = plt.subplots(1, max(nmaps, 1),
                                 figsize=(3 * max(nmaps, 1), 3),
                                 squeeze=False)
        fig.suptitle("Final binary maps")
        for k, bmap in enumerate(list_binmaps):
            ax = axes[0, k]
            ax.imshow(bmap, origin="lower", cmap="binary",
                      interpolation="nearest")
            ax.set_title(f"thr={thresholds[k]:.1f} "
                         f"({list_detections[k]} det, {list_fps[k]} fps)",
                         fontsize=8)
            for inj in injections:
                if len(inj) > 0:
                    ax.add_patch(plt.Circle((inj[0], inj[1]), radius=fwhm,
                                            color="deepskyblue", fill=False,
                                            alpha=0.8))
            ax.set_axis_off()
        plt.show()

    return list_detections, list_fps, list_binmaps


def _create_synt_cube(cube, psf, ang, plsc, dist, flux, theta=None,
                      verbose=False):
    """Inject one synthetic companion (reference roc.py:609-626)."""
    centy_fr, centx_fr = frame_center(cube[0])
    if theta is None:
        np.random.seed()
        theta = np.random.randint(0, 360)
    posy = dist * np.sin(np.deg2rad(theta)) + centy_fr
    posx = dist * np.cos(np.deg2rad(theta)) + centx_fr
    if verbose:
        print("Theta:", theta)
        print("Flux_inj:", flux)
    cubefc = cube_inject_companions(cube, psf, ang, flevel=flux, plsc=plsc,
                                    rad_dists=[dist], n_branches=1,
                                    theta=theta, verbose=verbose)
    return cubefc, posx, posy
