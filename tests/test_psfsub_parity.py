"""End-to-end parity of median_sub and full-frame pca vs the reference."""

import numpy as np
import pytest

from conftest import make_adi_cube
from ref_oracle import load_ref


@pytest.fixture(scope="module")
def cube_angles():
    return make_adi_cube(n=25, size=61)


@pytest.fixture(scope="module")
def ref_psfsub():
    return load_ref("vip_hci.psfsub")


def test_median_sub_fullfr_parity(ref_psfsub, cube_angles):
    from vip_tpu.psfsub import median_sub

    cube, angles = cube_angles
    ref = ref_psfsub.median_sub(cube.copy(), angles, verbose=False)
    got = median_sub(cube.copy(), angles, verbose=False)
    assert np.max(np.abs(ref - got)) < 1e-8


def test_median_sub_annular_parity(ref_psfsub, cube_angles):
    from vip_tpu.psfsub import median_sub

    cube, angles = cube_angles
    kwargs = dict(mode="annular", fwhm=4, asize=6, delta_rot=0.5, nframes=4,
                  verbose=False)
    ref = ref_psfsub.median_sub(cube.copy(), angles, **kwargs)
    got = median_sub(cube.copy(), angles, **kwargs)
    assert np.max(np.abs(ref - got)) < 1e-8


@pytest.mark.parametrize("svd_mode", ["lapack", "eigen"])
@pytest.mark.parametrize("scaling", [None, "temp-mean", "temp-standard"])
def test_pca_fullfr_parity(ref_psfsub, cube_angles, svd_mode, scaling):
    from vip_tpu.psfsub import pca

    cube, angles = cube_angles
    kwargs = dict(ncomp=7, svd_mode=svd_mode, scaling=scaling, verbose=False)
    ref = ref_psfsub.pca(cube.copy(), angles, **kwargs)
    got = pca(cube.copy(), angles, **kwargs)
    assert np.max(np.abs(ref - got)) < 1e-7


def test_pca_full_output_parity(ref_psfsub, cube_angles):
    from vip_tpu.psfsub import pca

    cube, angles = cube_angles
    ref = ref_psfsub.pca(cube.copy(), angles, ncomp=5, verbose=False,
                         full_output=True)
    got = pca(cube.copy(), angles, ncomp=5, verbose=False, full_output=True)
    # frame, pcs, recon, residuals_cube, residuals_cube_
    assert np.max(np.abs(ref[0] - got[0])) < 1e-7       # final frame
    assert np.max(np.abs(np.abs(ref[1]) - np.abs(got[1]))) < 1e-6  # |pcs|
    assert np.max(np.abs(ref[3] - got[3])) < 1e-7       # residuals cube


def test_pca_rdi_parity(ref_psfsub, cube_angles):
    from vip_tpu.psfsub import pca

    cube, angles = cube_angles
    rng = np.random.default_rng(7)
    cube_ref_arr = cube + 0.1 * rng.standard_normal(cube.shape)
    ref = ref_psfsub.pca(cube.copy(), angles, cube_ref=cube_ref_arr.copy(),
                         ncomp=5, verbose=False)
    got = pca(cube.copy(), angles, cube_ref=cube_ref_arr.copy(), ncomp=5,
              verbose=False)
    assert np.max(np.abs(ref - got)) < 1e-7


def test_pca_source_xy_parity(ref_psfsub, cube_angles):
    from vip_tpu.psfsub import pca

    cube, angles = cube_angles
    kwargs = dict(ncomp=4, source_xy=(40, 35), fwhm=4, delta_rot=0.5,
                  verbose=False)
    ref = ref_psfsub.pca(cube.copy(), angles, **kwargs)
    got = pca(cube.copy(), angles, **kwargs)
    assert np.max(np.abs(ref - got)) < 1e-7


def test_pca_cevr_parity(ref_psfsub, cube_angles):
    from vip_tpu.psfsub import pca

    cube, angles = cube_angles
    ref = ref_psfsub.pca(cube.copy(), angles, ncomp=0.95, verbose=False)
    got = pca(cube.copy(), angles, ncomp=0.95, verbose=False)
    assert np.max(np.abs(ref - got)) < 1e-7


def test_svd_wrapper_parity(ref_psfsub, cube_angles):
    from vip_tpu.psfsub.svd import svd_wrapper

    cube, _ = cube_angles
    matrix = cube.reshape(cube.shape[0], -1)
    for mode in ["lapack", "eigen"]:
        ref_v = ref_psfsub.svd.svd_wrapper(matrix, mode, 6, False)
        got_v = svd_wrapper(matrix, mode, 6, False)
        # singular vectors have a sign ambiguity; compare projections
        assert np.allclose(np.abs(ref_v), np.abs(got_v), atol=1e-7)
        ref_proj = matrix @ ref_v.T @ ref_v
        got_proj = matrix @ got_v.T @ got_v
        assert np.max(np.abs(ref_proj - got_proj)) < 1e-7


@pytest.mark.parametrize("nseg", [1, 4])
def test_pca_annular_parity(ref_psfsub, cube_angles, nseg):
    from vip_tpu.psfsub import pca_annular

    cube, angles = cube_angles
    kwargs = dict(ncomp=3, asize=8, fwhm=4, delta_rot=0.5, n_segments=nseg,
                  radius_int=2, verbose=False)
    ref = ref_psfsub.pca_annular(cube.copy(), angles, **kwargs)
    got = pca_annular(cube.copy(), angles, **kwargs)
    assert np.max(np.abs(ref - got)) < 1e-7


@pytest.mark.parametrize("nseg", [1, 4])
def test_pca_annular_gram_path_parity(ref_psfsub, cube_angles, nseg,
                                      monkeypatch):
    """The Gram-space scale path (ops/annular.py
    batched_pca_patch_residuals_gram, used above 128 frames) must match
    the reference exactly like the masked path does. radius_int=2 sets
    rot_options, so this exercises the host-orchestrated gram branch."""
    from vip_tpu.psfsub import pca_annular

    monkeypatch.setenv("VIP_TPU_ANNULAR_GRAM", "1")
    cube, angles = cube_angles
    kwargs = dict(ncomp=3, asize=8, fwhm=4, delta_rot=0.5, n_segments=nseg,
                  radius_int=2, verbose=False)
    ref = ref_psfsub.pca_annular(cube.copy(), angles, **kwargs)
    got = pca_annular(cube.copy(), angles, **kwargs)
    assert np.max(np.abs(ref - got)) < 1e-7


@pytest.mark.parametrize("nseg,collapse", [(1, "median"), (3, "mean")])
def test_pca_annular_resident_path_parity(ref_psfsub, cube_angles, nseg,
                                          collapse, monkeypatch):
    """The device-resident scale path (_pca_adi_resident: device segment
    gathers + Gram PCA + device derotate/collapse) must match the
    reference like the host-orchestrated paths do."""
    from vip_tpu.psfsub import pca_annular
    from vip_tpu.psfsub.pca_local import _pca_adi_resident  # noqa: F401

    monkeypatch.setenv("VIP_TPU_ANNULAR_GRAM", "1")
    cube, angles = cube_angles
    kwargs = dict(ncomp=3, asize=8, fwhm=4, delta_rot=0.2, n_segments=nseg,
                  collapse=collapse, verbose=False)
    ref = ref_psfsub.pca_annular(cube.copy(), angles, **kwargs)
    got = pca_annular(cube.copy(), angles, **kwargs)
    assert np.max(np.abs(ref - got)) < 1e-7


def test_pca_annular_resident_full_output_parity(ref_psfsub, cube_angles,
                                                 monkeypatch):
    """full_output residual cubes from the resident path equal the
    reference's (cube_out, cube_der, frame)."""
    from vip_tpu.psfsub import pca_annular

    monkeypatch.setenv("VIP_TPU_ANNULAR_GRAM", "1")
    cube, angles = cube_angles
    kwargs = dict(ncomp=2, asize=10, fwhm=4, delta_rot=0.2, verbose=False,
                  full_output=True)
    ref = ref_psfsub.pca_annular(cube.copy(), angles, **kwargs)
    got = pca_annular(cube.copy(), angles, **kwargs)
    for r, g in zip(ref, got):
        assert np.max(np.abs(np.asarray(r) - np.asarray(g))) < 1e-7


def test_pca_annular_eigen_rdi_parity(ref_psfsub, cube_angles):
    from vip_tpu.psfsub import pca_annular

    cube, angles = cube_angles
    rng = np.random.default_rng(11)
    cref = cube + 0.05 * rng.standard_normal(cube.shape)
    kwargs = dict(ncomp=4, asize=10, fwhm=4, delta_rot=0.3, svd_mode="eigen",
                  verbose=False)
    ref = ref_psfsub.pca_annular(cube.copy(), angles, cube_ref=cref.copy(),
                                 **kwargs)
    got = pca_annular(cube.copy(), angles, cube_ref=cref.copy(), **kwargs)
    assert np.max(np.abs(ref - got)) < 1e-7


def test_pca_grid_fullfr_parity(ref_psfsub, cube_angles):
    """pca_grid batched-derotation fast path vs the reference's per-pc loop
    (reference utils_pca.py:254-321), incl. the S/N-optimization branch."""
    from vip_tpu.psfsub.utils_pca import pca_grid

    cube, angles = cube_angles
    # plant a companion so the S/N grid has a real optimum
    from vip_tpu.fm.fakecomp import cube_inject_companions, normalize_psf
    from vip_tpu.var.fit_2d import create_synth_psf
    psfn = normalize_psf(np.asarray(create_synth_psf("gauss", shape=(11, 11),
                                                     fwhm=4.0)),
                         fwhm=4.0, verbose=False)
    cube_fc = cube_inject_companions(cube, psfn, angles, flevel=30,
                                     rad_dists=[14], theta=0, verbose=False)
    kwargs = dict(fwhm=4.0, range_pcs=(1, 6, 1), source_xy=(44, 30),
                  mode="fullfr", full_output=True, verbose=False)
    ref = ref_psfsub.pca_grid(cube_fc.copy(), angles, **kwargs)
    got = pca_grid(cube_fc.copy(), angles, **kwargs)
    # (cubeout, finalfr, df, opt_npc)
    assert np.max(np.abs(np.asarray(ref[0]) - np.asarray(got[0]))) < 1e-7
    assert ref[3] == got[3]
    assert np.allclose(np.asarray(ref[2]["S/Ns"]),
                       np.asarray(got[2]["S/Ns"]), atol=1e-6)


def test_pca_grid_annular_parity(ref_psfsub, cube_angles):
    from vip_tpu.psfsub.utils_pca import pca_grid

    cube, angles = cube_angles
    kwargs = dict(range_pcs=(1, 5, 1), mode="annular", annulus_width=12,
                  fwhm=4.0, source_xy=(44, 30), full_output=True,
                  verbose=False)
    ref = ref_psfsub.pca_grid(cube.copy(), angles, **kwargs)
    got = pca_grid(cube.copy(), angles, **kwargs)
    assert np.max(np.abs(np.asarray(ref[0]) - np.asarray(got[0]))) < 1e-7


def test_gather_lib_grams_exact():
    """The double-row-gather formulation of the per-frame library Grams
    (ops/annular._gather_lib_grams — two major-axis gathers + transpose,
    replacing the per-element two-axis gather) is bit-identical to the
    naive gather, including the ragged chunk tail."""
    import jax.numpy as jnp

    from vip_tpu.ops.annular import _gather_lib_grams

    rng = np.random.default_rng(3)
    n, L = 130, 24
    G0 = rng.standard_normal((n, n))
    G = jnp.asarray(G0 + G0.T)
    lib_idx = jnp.asarray(rng.integers(0, n, size=(n, L)), jnp.int32)
    got = _gather_lib_grams(G, lib_idx, chunk=48)      # 130 = 2*48 + 34
    ref = G[lib_idx[:, :, None], lib_idx[:, None, :]]
    assert float(jnp.max(jnp.abs(got - ref))) == 0.0


def test_pca_annular_resident_forced_subspace_parity(ref_psfsub, cube_angles,
                                                     monkeypatch):
    """Forcing the scale default (VIP_TPU_ANNULAR_METHOD=subspace — what
    the resident path auto-selects above _SUBSPACE_MIN_FRAMES) must
    still match the reference end to end."""
    from vip_tpu.psfsub import pca_annular

    monkeypatch.setenv("VIP_TPU_ANNULAR_GRAM", "1")
    monkeypatch.setenv("VIP_TPU_ANNULAR_METHOD", "subspace")
    cube, angles = cube_angles
    kwargs = dict(ncomp=3, asize=8, fwhm=4, delta_rot=0.2, verbose=False)
    ref = ref_psfsub.pca_annular(cube.copy(), angles, **kwargs)
    got = pca_annular(cube.copy(), angles, **kwargs)
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(ref - got)) < 1e-5 * scale


def test_pca_annular_resident_subspace_mode(cube_angles, monkeypatch):
    """svd_mode='randsvd' maps the resident path to the matmul-only
    subspace iteration (ops/annular._subspace_topk). With 30 power
    iterations it should agree with the exact eigh path to float
    resolution on realistic spectra — assert well past the reference's
    own randomized-mode expectations."""
    from vip_tpu.psfsub import pca_annular

    monkeypatch.setenv("VIP_TPU_ANNULAR_GRAM", "1")
    cube, angles = cube_angles
    kwargs = dict(ncomp=3, asize=8, fwhm=4, delta_rot=0.2, verbose=False)
    exact = pca_annular(cube.copy(), angles, **kwargs)
    rand = pca_annular(cube.copy(), angles, svd_mode="randsvd", **kwargs)
    scale = np.max(np.abs(exact))
    assert np.max(np.abs(exact - rand)) < 1e-5 * scale
