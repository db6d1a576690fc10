"""Multi-chip sharding correctness on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_sharded_pca_adi_matches_single_device():
    from vip_tpu.psfsub.sharded import sharded_pca_adi
    from vip_tpu.ops.pipeline import pca_adi_pipeline

    rng = np.random.default_rng(0)
    n, size = 16, 32
    cube = rng.standard_normal((n, size, size))
    angles = np.linspace(0, 40, n)

    single = np.asarray(pca_adi_pipeline(jnp.asarray(cube),
                                         jnp.asarray(angles), ncomp=3,
                                         method="eigen", collapse="mean"))
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("frames",))
    multi = sharded_pca_adi(cube, angles, ncomp=3, mesh=mesh)
    assert np.max(np.abs(single - multi)) < 1e-8


def test_graft_entry():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft", "/root/repo/__graft_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == args[0].shape[1:]
    m.dryrun_multichip(8)


def test_pipeline_matches_functional_pca():
    """The fused pipeline equals the modular pca() with eigen mode."""
    from vip_tpu.ops.pipeline import pca_adi_pipeline
    from vip_tpu.psfsub import pca
    from vip_tpu.preproc.parangles import check_pa_vector

    rng = np.random.default_rng(1)
    n, size = 12, 40
    cube = rng.standard_normal((n, size, size))
    angles = np.linspace(0, 35, n)

    modular = pca(cube, angles, ncomp=4, svd_mode="eigen", verbose=False)
    fused = np.asarray(pca_adi_pipeline(jnp.asarray(cube),
                                        jnp.asarray(check_pa_vector(angles)),
                                        ncomp=4, method="eigen",
                                        collapse="median"))
    assert np.max(np.abs(modular - fused)) < 1e-8


def test_sharded_median_collapse_and_median_adi():
    """Sharded median collapse (all_to_all reshard) matches single-device."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from vip_tpu.psfsub.sharded import (make_sharded_median_adi,
                                        make_sharded_pca_adi)
    from vip_tpu.psfsub.medsub import median_sub

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, axis_names=("frames",))
    rng = np.random.default_rng(0)
    n, sz = 16, 32
    cube = rng.standard_normal((n, sz, sz)).astype(np.float32)
    angles = np.linspace(0, 40, n).astype(np.float32)
    cube_sh = jax.device_put(cube, NamedSharding(mesh, P("frames")))
    ang_sh = jax.device_put(angles, NamedSharding(mesh, P("frames")))

    fn = make_sharded_pca_adi(mesh, ncomp=3, collapse="median")
    frame = np.asarray(fn(cube_sh, ang_sh))
    assert frame.shape == (sz, sz)
    assert np.isfinite(frame).all()

    fn2 = make_sharded_median_adi(mesh)
    frame2 = np.asarray(fn2(cube_sh, ang_sh))
    ref = median_sub(cube, angles, verbose=False)
    assert np.allclose(frame2, np.asarray(ref), atol=1e-4)


def test_sharded_pca_annular_matches_single_device():
    """P2 workload: per-frame masked SVDs sharded over the frame axis
    must reproduce the single-device pca_annular."""
    from jax.sharding import Mesh

    from vip_tpu.psfsub import pca_annular
    from vip_tpu.psfsub.sharded import sharded_pca_annular

    rng = np.random.default_rng(2)
    n, size = 16, 40
    cube = rng.standard_normal((n, size, size))
    angles = np.linspace(0, 60, n)

    single = pca_annular(cube, angles, ncomp=3, fwhm=4.0, asize=4,
                         delta_rot=0.1, radius_int=2, n_segments=2,
                         svd_mode="eigen", scaling=None, verbose=False)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("frames",))
    multi = sharded_pca_annular(cube, angles, ncomp=3, fwhm=4.0, asize=4,
                                delta_rot=0.1, radius_int=2, n_segments=2,
                                mesh=mesh, method="eigen", scaling=None)
    assert np.max(np.abs(single - multi)) < 1e-8


def test_sharded_snrmap_matches_single_device():
    """P3 workload: polar-engine radius rows sharded across devices."""
    from jax.sharding import Mesh

    from vip_tpu.metrics.sharded import sharded_snrmap
    from vip_tpu.metrics.snr_source import snrmap_fast

    rng = np.random.default_rng(3)
    frame = rng.standard_normal((64, 64)).astype(np.float32)
    single = snrmap_fast(frame, 4.0)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("px",))
    multi = sharded_snrmap(frame, 4.0, mesh=mesh)
    assert np.max(np.abs(single - multi)) < 1e-5


def test_sharded_mcmc_lnprob_matches_single_device():
    """P5 workload: walker batches sharded over the mesh."""
    from jax.sharding import Mesh

    from conftest import make_adi_cube
    from vip_tpu.fm.fakecomp import cube_inject_companions, normalize_psf
    from vip_tpu.fm.sharded import make_sharded_batched_lnprob
    from vip_tpu.ops.negfc_model import make_batched_lnprob

    cube, angs = make_adi_cube(n=16, size=48)
    yy, xx = np.mgrid[:13, :13]
    psf = np.exp(-((yy - 6) ** 2 + (xx - 6) ** 2) / (2 * (4 / 2.355) ** 2))
    psfn = normalize_psf(psf, fwhm=4.0, verbose=False)
    cubefc = cube_inject_companions(cube, psfn, angs, flevel=30, plsc=0.1,
                                    rad_dists=12, theta=30, n_branches=1,
                                    verbose=False)
    bounds = [(8.0, 16.0), (10.0, 50.0), (1.0, 100.0)]
    args = (cubefc, angs, psfn, 3, 4, 12.0, 30.0, 2.0, 4.0,
            np.zeros(1), 1.0, bounds)
    serial = make_batched_lnprob(*args)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("walkers",))
    sharded = make_sharded_batched_lnprob(mesh, *args)

    rng = np.random.default_rng(4)
    walkers = np.column_stack([rng.uniform(10, 14, 16),
                               rng.uniform(20, 40, 16),
                               rng.uniform(10, 60, 16)])
    a = np.asarray(serial(jnp.asarray(walkers)))
    b = np.asarray(sharded(walkers))
    assert np.allclose(a, b, atol=1e-8)


def test_mcmc_walker_mesh_public_api_matches_single_device():
    """VERDICT r3 #2: the PUBLIC sampler with walker_mesh= must produce
    the same chain as the single-device run for the same rng_seed."""
    from jax.sharding import Mesh

    from conftest import make_adi_cube
    from vip_tpu.fm.fakecomp import cube_inject_companions, normalize_psf
    from vip_tpu.fm.negfc_mcmc import mcmc_negfc_sampling

    cube, angs = make_adi_cube(n=12, size=48)
    yy, xx = np.mgrid[:13, :13]
    psf = np.exp(-((yy - 6) ** 2 + (xx - 6) ** 2) / (2 * (4 / 2.355) ** 2))
    psfn = normalize_psf(psf, fwhm=4.0, verbose=False)
    cubefc = cube_inject_companions(cube, psfn, angs, flevel=30, plsc=0.1,
                                    rad_dists=12, theta=30, n_branches=1,
                                    verbose=False)
    kwargs = dict(ncomp=3, annulus_width=4, aperture_radius=2, fwhm=4.0,
                  nwalkers=16, niteration_limit=6, niteration_min=6,
                  conv_test="ac", verbosity=0, rng_seed=7)
    single = mcmc_negfc_sampling(cubefc, angs, psfn, (12.0, 30.0, 30.0),
                                 **kwargs)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("walkers",))
    multi = mcmc_negfc_sampling(cubefc, angs, psfn, (12.0, 30.0, 30.0),
                                walker_mesh=mesh, **kwargs)
    assert single.shape == multi.shape
    assert np.max(np.abs(single - multi)) < 1e-8

    # host-fallback configurations must refuse the mesh loudly
    with pytest.raises(ValueError, match="walker_mesh"):
        mcmc_negfc_sampling(cubefc, angs, psfn, (12.0, 30.0, 30.0),
                            radial_gradient=True, walker_mesh=mesh,
                            **kwargs)


def test_sharded_pattern_frames_matches_single_device():
    """Pattern-axis-sharded contrast reductions == per-cube pipeline."""
    from jax.sharding import Mesh
    from vip_tpu.metrics.sharded import sharded_pattern_frames
    from vip_tpu.ops.pipeline import pca_adi_pipeline

    rng = np.random.default_rng(5)
    n, sz = 8, 32
    base = rng.standard_normal((n, sz, sz)).astype(np.float32)
    angles = np.linspace(0, 40, n).astype(np.float32)
    pats = [base + 0.1 * i for i in range(5)]  # odd count -> padding path

    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("patterns",))
    got = sharded_pattern_frames(pats, angles, mesh=mesh, ncomp=3)

    for i, p in enumerate(pats):
        ref = np.asarray(pca_adi_pipeline(
            jnp.asarray(p), jnp.asarray(angles), ncomp=3, method="eigen",
            collapse="median"))
        assert np.allclose(got[i], ref, atol=1e-5), i


def test_scale_fft_matrix_matches_scale_fft():
    """The dense exact-zoom operator == scale_fft on random frames,
    across up/down scales, including the rank-1 Nyquist correction and
    the reference's float32-embed quirk (rescaling.py:1168)."""
    from vip_tpu.preproc.rescaling import (apply_scale_matrix, scale_fft,
                                           scale_fft_matrix)

    rng = np.random.default_rng(11)
    for dim in (32, 40):
        f = rng.standard_normal((dim, dim))
        f32 = f.astype(np.float32).astype(np.float64)
        for s in (1.05, 1.3, 2.0, 1 / 1.3, 0.5):
            ref = np.asarray(scale_fft(f, s, ori_dim=True))
            got = apply_scale_matrix(f32, *scale_fft_matrix(dim, s))
            assert np.max(np.abs(ref - got)) < 1e-10, (dim, s)


@pytest.mark.parametrize("crop_ifs", [True, False])
def test_sharded_pca_sdi_single_matches_public_pca(crop_ifs):
    """CROSS-PATH parity (VERDICT r3 #1): the channel-sharded single-pass
    mSDI PCA must reproduce the public single-chip
    pca(adimsdi='single', imlib2='vip-fft') — same exact scale_fft
    numerics, not a self-consistent approximation."""
    from jax.sharding import Mesh
    from scipy.ndimage import gaussian_filter

    from vip_tpu.psfsub import pca
    from vip_tpu.psfsub.sharded import sharded_pca_sdi_single

    rng = np.random.default_rng(6)
    z, n, sz = 4, 8, 40
    lbdas = np.linspace(1.0, 1.3, z)
    scal = lbdas[-1] / lbdas
    speck = gaussian_filter(rng.standard_normal((sz, sz)), 2.0) * 5
    cube = np.empty((z, n, sz, sz))
    from vip_tpu.preproc.rescaling import frame_rescaling

    for ch in range(z):
        sp = frame_rescaling(speck.copy(), scale=1 / scal[ch])
        for fr in range(n):
            cube[ch, fr] = sp + gaussian_filter(
                rng.standard_normal((sz, sz)), 1.0) * 0.3
    angles = np.linspace(0, 40, n)

    single = pca(cube.copy(), angles, scale_list=scal, ncomp=3,
                 adimsdi="single", crop_ifs=crop_ifs, verbose=False)
    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("channels",))
    multi = sharded_pca_sdi_single(cube, angles, scal, ncomp=3, mesh=mesh,
                                   crop_ifs=crop_ifs)
    assert single.shape == multi.shape
    assert np.max(np.abs(single - multi)) < 1e-5


def test_sharded_pca_incremental_matches_single_device():
    """P6 workload: out-of-core streaming PCA with the pixel axis sharded
    (psum'd Gram merges, all_to_all pass-2 reshard) must reproduce the
    single-device pca_incremental — including a ragged tail batch
    (30 = 4x7 + 2) and a non-mesh-divisible pixel count (45^2 = 2025)."""
    from jax.sharding import Mesh

    from vip_tpu.psfsub.utils_pca import pca_incremental

    rng = np.random.default_rng(7)
    n, sz = 30, 45
    cube = rng.standard_normal((n, sz, sz))
    ang = np.linspace(0, 50, n)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("px",))

    for col in ("median", "mean"):
        single = pca_incremental(cube, ang, batch=7, ncomp=3, collapse=col,
                                 verbose=False)
        multi = pca_incremental(cube, ang, batch=7, ncomp=3, collapse=col,
                                verbose=False, pixel_mesh=mesh)
        assert np.max(np.abs(single - multi)) < 1e-8, col

    # full_output principal components agree up to sign
    _, _, pcs_s, meds_s = pca_incremental(cube, ang, batch=7, ncomp=3,
                                          verbose=False, full_output=True)
    _, _, pcs_m, meds_m = pca_incremental(cube, ang, batch=7, ncomp=3,
                                          verbose=False, full_output=True,
                                          pixel_mesh=mesh)
    assert np.max(np.abs(np.abs(pcs_s) - np.abs(pcs_m))) < 1e-8
    assert np.max(np.abs(meds_s - meds_m)) < 1e-8

    # host-fallback configurations must refuse the mesh loudly
    with pytest.raises(ValueError, match="pixel_mesh"):
        pca_incremental(cube, ang, batch=7, ncomp=3, pixel_mesh=mesh,
                        imlib="skimage", verbose=False)
