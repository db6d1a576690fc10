"""SVD abstraction layer.

TPU rebuild of vip_hci/psfsub/svd.py. The reference's ten backend modes
(LAPACK/ARPACK/eigen/randomized × CPU/CuPy/PyTorch; svd.py:342-620) collapse
onto three device-native methods executed by ``vip_tpu.ops.linalg``:

==================  =======================================
reference SvdMode    device method
==================  =======================================
lapack/cupy/pytorch  full ``jnp.linalg.svd``
eigen/eigencupy/...  covariance ``eigh`` trick (MXU Gram)
randsvd/randcupy/... Halko randomized SVD (jittable, keyed)
arpack               randomized SVD (truncated)
==================  =======================================

``svd_wrapper`` keeps the reference's exact signature, per-mode output
orientation (svd.py:597-620) and ncomp guard; ``get_eigenvectors`` keeps the
'auto'-ncomp noise-decay / CEVR selection loops (svd.py:623-702) as host
loops over device results.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Progressbar, check_array, sep, time_ini, timing
from ..config.utils_conf import vip_figsize
from ..ops.linalg import svd_top, randomized_svd
from ..var.shapes import matrix_scaling, prepare_matrix

__all__ = ["SVDecomposer", "svd_wrapper", "get_eigenvectors",
           "randomized_svd_gpu", "MODE_TO_METHOD"]

MODE_TO_METHOD = {
    "lapack": "lapack",
    "cupy": "lapack",
    "pytorch": "lapack",
    "eigen": "eigen",
    "eigencupy": "eigen",
    "eigenpytorch": "eigen",
    "randsvd": "randsvd",
    "randcupy": "randsvd",
    "randpytorch": "randsvd",
    "arpack": "randsvd",
}


def svd_wrapper(matrix, mode, ncomp, verbose=False, full_output=False,
                random_state=None, to_numpy=True, left_eigv=False):
    """Top-``ncomp`` SVD with reference-compatible output orientation.

    Returns V (ncomp, n_px) by default; (U, S, V) with ``full_output``;
    U (n, ncomp)ᵀ-oriented left vectors with ``left_eigv`` — matching the
    reference's per-mode return matrix (svd.py:597-620).
    """
    matrix = np.asarray(matrix)
    if matrix.ndim != 2:
        raise TypeError("Input matrix is not a 2d array")
    if ncomp > min(matrix.shape[0], matrix.shape[1]):
        msg = "{} PCs cannot be obtained from a matrix with size [{},{}]."
        msg += " Increase the size of the patches or request less PCs"
        raise RuntimeError(msg.format(ncomp, matrix.shape[0], matrix.shape[1]))

    method = MODE_TO_METHOD.get(mode)
    if method is None:
        raise ValueError("The SVD `mode` is not recognized")

    key = None
    if method == "randsvd":
        if isinstance(random_state, (int, np.integer)):
            seed = int(random_state)
        elif isinstance(random_state, np.random.RandomState):
            seed = int(random_state.randint(2 ** 31))
        elif isinstance(random_state, np.random.Generator):
            seed = int(random_state.integers(2 ** 31))
        else:
            seed = 0
        key = jax.random.PRNGKey(seed)

    U, S, V = svd_top(jnp.asarray(matrix), int(ncomp), method=method, key=key,
                      full_output=True)
    U, S, V = np.asarray(U), np.asarray(S), np.asarray(V)

    if verbose:
        print(f"Done SVD/PCA with the {method} method on device")

    if full_output:
        return U, S[: int(ncomp)], V
    elif left_eigv:
        return U
    else:
        return V


def randomized_svd_gpu(M, n_components, n_oversamples=10, n_iter="auto",
                       transpose="auto", random_state=0, lib="jax"):
    """Randomized SVD on device (reference svd.py:705-840 GPU variant)."""
    if n_iter == "auto":
        n_iter = 7 if n_components < 0.1 * min(M.shape) else 4
    key = jax.random.PRNGKey(random_state or 0)
    U, S, Vh = randomized_svd(jnp.asarray(M), int(n_components), key,
                              n_oversamples=n_oversamples, n_iter=int(n_iter))
    return np.asarray(U), np.asarray(S), np.asarray(Vh)


def get_eigenvectors(ncomp, data, svd_mode, mode="noise", noise_error=1e-3,
                     cevr=0.9, max_evs=None, data_ref=None, debug=False,
                     collapse=False, scaling=None, left_eigv=False):
    """``ncomp`` eigenvectors, with 'auto' truncation by noise decay or CEVR.

    Exact port of reference svd.py:623-702 (host control loop; each step's
    linear algebra runs on device).
    """
    no_dataref = False
    if data_ref is None:
        no_dataref = True
        data_ref = data

    if max_evs is None:
        max_evs = min(data_ref.shape[0], data_ref.shape[1])

    if ncomp is None:
        raise ValueError("ncomp must be an integer or `auto`")

    if ncomp == "auto":
        ncomp = 0
        V_big = svd_wrapper(data_ref, svd_mode, max_evs, False)

        if mode == "noise":
            data_ref_sc = matrix_scaling(data_ref, scaling)
            data_sc = matrix_scaling(data, scaling)
            V_sc = svd_wrapper(data_ref_sc, svd_mode, max_evs, False)

            px_noise = []
            px_noise_decay = 1
            while px_noise_decay >= noise_error:
                ncomp += 1
                V = V_sc[:ncomp]
                if no_dataref:
                    transformed = np.dot(data_sc, V.T)
                    reconstructed = np.dot(transformed, V)
                else:
                    transformed = np.dot(V, data_sc)
                    reconstructed = np.dot(transformed.T, V).T
                residuals = data_sc - reconstructed
                if not collapse:
                    curr_noise = np.std(residuals)
                else:
                    curr_noise = np.std(np.median(residuals, axis=0))
                px_noise.append(curr_noise)
                if ncomp > 1:
                    px_noise_decay = px_noise[-2] - curr_noise
            V = V_big[:ncomp]

        elif mode == "cevr":
            data_sc = matrix_scaling(data, scaling)
            _, S, _ = svd_wrapper(
                data_sc, svd_mode, min(data_sc.shape[0], data_sc.shape[1]),
                False, full_output=True
            )
            exp_var = (S**2) / (S.shape[0] - 1)
            full_var = np.sum(exp_var)
            explained_variance_ratio = exp_var / full_var
            ratio_cumsum = np.cumsum(explained_variance_ratio)
            ncomp = int(np.searchsorted(ratio_cumsum, cevr) + 1)
            V = V_big[:ncomp]

        if debug:
            print("ncomp", ncomp)
    else:
        ncomp = min(ncomp, min(data_ref.shape[0], data_ref.shape[1]))
        V = svd_wrapper(data_ref, svd_mode, ncomp, verbose=False,
                        left_eigv=left_eigv)
        if left_eigv:
            V = V.T

    return V


class SVDecomposer:
    """SVD decomposition of 2d/3d/4d HCI arrays with CEVR tooling.

    Port of reference svd.py:41-339 (plots optional, pandas table output).
    """

    def __init__(self, data, mode="fullfr", inrad=None, outrad=None,
                 svd_mode="lapack", scaling="temp-standard", scale_list=None,
                 verbose=True):
        check_array(data, (2, 3, 4), msg="data")
        self.data = data
        self.mode = mode
        self.svd_mode = svd_mode
        self.inrad = inrad
        self.outrad = outrad
        self.scaling = scaling
        self.scale_list = scale_list
        self.verbose = verbose

        if self.mode == "annular":
            if inrad is None:
                raise ValueError("`inrad` must be a positive integer")
            if outrad is None:
                raise ValueError("`outrad` must be a positive integer")
        if self.verbose:
            print(sep)

    def generate_matrix(self):
        """Build (and scale) the matrix from ``data``; 4d cubes are first
        rescaled per wavelength to align the speckles."""
        start_time = time_ini(False)
        if self.data.ndim == 2:
            print("`data` is already a 2d array")
            self.matrix = matrix_scaling(self.data, self.scaling)
        elif self.data.ndim in [3, 4]:
            if self.data.ndim == 3:
                cube_ = self.data
            else:
                from ..preproc.rescaling import (check_scal_vector,
                                                 cube_rescaling_wavelengths)
                from ..preproc.cosmetics import cube_crop_frames

                if self.scale_list is None:
                    raise ValueError("`scale_list` must be provided when "
                                     "`data` is a 4D array")
                z, n_frames, y_in, x_in = self.data.shape
                scale_list = check_scal_vector(self.scale_list)
                if not scale_list.shape[0] == z:
                    raise ValueError(f"`scale_list` length is "
                                     f"{scale_list.shape[0]} instead of {z}")
                big_cube = []
                if self.verbose:
                    print("Rescaling the spectral channels to align the "
                          "speckles")
                for i in Progressbar(range(n_frames), verbose=self.verbose):
                    cube_resc = cube_rescaling_wavelengths(
                        self.data[:, i, :, :], scale_list)[0]
                    cube_resc = cube_crop_frames(cube_resc, size=y_in,
                                                 verbose=False)
                    big_cube.append(cube_resc)
                big_cube = np.array(big_cube)
                cube_ = big_cube.reshape(z * n_frames, y_in, x_in)
                self.cube4dto3d_shape = cube_.shape

            result = prepare_matrix(cube_, self.scaling, mode=self.mode,
                                    inner_radius=self.inrad,
                                    outer_radius=self.outrad,
                                    verbose=self.verbose)
            if self.mode == "annular":
                self.matrix, pxind = result
                self.yy, self.xx = pxind
            else:
                self.matrix = result
        if self.verbose:
            timing(start_time)

    def run(self):
        """Decompose the matrix (full SVD, all components kept)."""
        start_time = time_ini(False)
        if not hasattr(self, "matrix"):
            self.generate_matrix()
        max_pcs = min(self.matrix.shape[0], self.matrix.shape[1])
        self.u, self.s, self.v = svd_wrapper(self.matrix, self.svd_mode,
                                             max_pcs, verbose=self.verbose,
                                             full_output=True)
        if self.verbose:
            timing(start_time)

    def get_cevr(self, ncomp_list=None, plot=True, plot_save=False,
                 plot_dpi=90, plot_truncation=None):
        """Cumulative explained-variance-ratio table (pandas DataFrame)."""
        from pandas import DataFrame

        start_time = time_ini(False)
        if not hasattr(self, "v"):
            self.run()

        if self.verbose:
            print("Computing the cumulative explained variance ratios")

        self.ncomp_list = ncomp_list
        exp_var = (self.s**2) / (self.s.shape[0] - 1)
        full_var = np.sum(exp_var)
        self.explained_variance_ratio = exp_var / full_var
        self.cevr = np.cumsum(self.explained_variance_ratio)

        df_allks = DataFrame({"ncomp": range(1, self.s.shape[0] + 1),
                              "expvar_ratio": self.explained_variance_ratio,
                              "cevr": self.cevr})
        self.table_cevr = df_allks

        if plot:
            import matplotlib.pyplot as plt

            fig = plt.figure(figsize=vip_figsize, dpi=plot_dpi)
            # 2/3 + 1/3 grid like the reference (svd.py:269,283) so the
            # zoom panel stays inside the canvas
            if plot_truncation is not None:
                ax1 = plt.subplot2grid((1, 3), (0, 0), colspan=2, fig=fig)
            else:
                ax1 = fig.add_subplot(111)
            ax1.step(range(self.explained_variance_ratio.shape[0]),
                     self.explained_variance_ratio, where="mid",
                     label="Individual EVR")
            ax1.plot(self.cevr, ".-", label="Cumulative EVR")
            ax1.legend(loc="best", frameon=False)
            ax1.set_ylabel("Explained variance ratio (EVR)")
            ax1.set_xlabel("Principal components")
            if plot_truncation is not None:
                # second panel zoomed on the first `plot_truncation` PCs
                # (reference svd.py:282-291)
                ax2 = plt.subplot2grid((1, 3), (0, 2), colspan=1, fig=fig)
                ax2.step(range(plot_truncation),
                         self.explained_variance_ratio[:plot_truncation],
                         where="mid")
                ax2.plot(self.cevr[:plot_truncation], ".-")
                ax2.set_xlabel("Principal components")
                ax2.grid(linestyle="solid", alpha=0.2)
                ax2.set_xlim(-2, plot_truncation + 2)
                ax2.set_ylim(0, 1)
            if plot_save:
                plt.savefig("figure.pdf", dpi=300, bbox_inches="tight")

        if self.ncomp_list is not None:
            cevr_klist = [self.cevr[k - 1] for k in self.ncomp_list]
            expvar_ratio_klist = [self.explained_variance_ratio[k - 1]
                                  for k in self.ncomp_list]
            df_klist = DataFrame({"ncomp": self.ncomp_list,
                                  "exp_var_ratio": expvar_ratio_klist,
                                  "cevr": cevr_klist})
            self.cevr_ncomp = cevr_klist
            self.table_cevr_ncomp = df_klist
            if self.verbose:
                timing(start_time)
            return df_klist
        if self.verbose:
            timing(start_time)
        return df_allks

    def cevr_to_ncomp(self, cevr=0.9):
        """Number of PCs reaching a given CEVR."""
        if not hasattr(self, "cevr"):
            self.get_cevr(plot=False)
        if isinstance(cevr, float):
            return int(np.searchsorted(self.cevr, cevr) + 1)
        elif isinstance(cevr, tuple):
            return [int(np.searchsorted(self.cevr, c) + 1) for c in cevr]
        return cevr
