"""Multi-chip PCA-ADI via shard_map over a frame-axis device mesh.

The reference's only scaling mechanism is a single-host fork pool
(SURVEY.md §2.c); this module is the ICI-native replacement: the cube's
frame axis is sharded across devices, the per-frame FFT derotation stays
local, and the PCA stages communicate with XLA collectives:

  Gram matrix   C = M Mᵀ       — all_gather(M) + local matmul (rows of C)
  eigh(C)                      — replicated (n_frames × n_frames is small)
  PCs           V = EVᵀ M      — local partial matmul + psum over ICI
  projection    M - (M Vᵀ) V   — fully local
  collapse                     — psum (mean) over the frame axis

This is the step exercised by ``__graft_entry__.dryrun_multichip`` on a
virtual CPU mesh and by real pods on ICI.
"""

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..config.parallel import frame_mesh, shard_cube

from ..preproc.derotation import rotate_fft_pruned_batch

__all__ = ["sharded_pca_adi", "make_sharded_pca_adi",
           "make_sharded_median_adi", "make_sharded_pca_annular",
           "sharded_pca_annular", "make_sharded_pca_sdi_single",
           "sharded_pca_sdi_single", "make_sharded_incremental_merge",
           "make_sharded_incremental_normalize",
           "make_sharded_incremental_pass2"]


def make_sharded_pca_adi(mesh, ncomp, axis="frames", collapse="mean"):
    """Build the jitted, sharded PCA-ADI step for ``mesh``.

    Returns a function (cube, angles) -> collapsed frame, where cube/angles
    are (globally) the full arrays; they will be consumed sharded along the
    frame axis.
    """
    if collapse not in ("mean", "median"):
        raise ValueError("sharded collapse supports 'mean' and 'median'")

    def step(cube_loc, angles_loc):
        n_loc, y, x = cube_loc.shape
        M_loc = cube_loc.reshape(n_loc, -1)

        # ---- distributed Gram matrix ----
        M_full = jax.lax.all_gather(M_loc, axis, tiled=True)       # (n, p)
        C_loc = M_loc @ M_full.T                                   # (n_loc, n)
        C = jax.lax.all_gather(C_loc, axis, tiled=True)            # (n, n)

        # ---- replicated small eigendecomposition ----
        e, EV = jnp.linalg.eigh(C)

        # ---- distributed principal components: V = EVᵀ M ----
        idx = jax.lax.axis_index(axis)
        EV_loc = jax.lax.dynamic_slice_in_dim(EV, idx * n_loc, n_loc, 0)
        V_part = EV_loc.T @ M_loc                                  # (n, p)
        V = jax.lax.psum(V_part, axis)
        V = V[::-1]
        S = jnp.sqrt(jnp.abs(e))[::-1]
        V = V / S[:, None]
        V = V[:ncomp]                                              # (k, p)

        # ---- local projection / subtraction ----
        recon = (M_loc @ V.T) @ V
        resid = (M_loc - recon).reshape(n_loc, y, x)

        # ---- local FFT derotation ----
        der = rotate_fft_pruned_batch(resid, -angles_loc)

        # ---- cross-device collapse ----
        if collapse == "median":
            return _sharded_median(der, axis)
        n_total = n_loc * jax.lax.psum(jnp.ones(()), axis)
        return jax.lax.psum(jnp.sum(der, axis=0), axis) / n_total

    sharded = shard_map(step, mesh=mesh, in_specs=(P("frames"), P("frames")),
                        out_specs=P(), check_vma=False)
    return jax.jit(sharded)


def sharded_pca_adi(cube, angles, ncomp=5, mesh=None):
    """Convenience wrapper: shard, run, return numpy frame."""
    import numpy as np

    if mesh is None:
        mesh = frame_mesh()
    n_dev = len(mesh.devices.ravel())
    n = cube.shape[0]
    if n % n_dev:
        raise ValueError(f"n_frames ({n}) must divide evenly over "
                         f"{n_dev} devices")
    fn = make_sharded_pca_adi(mesh, ncomp)
    cube_sh = shard_cube(cube, mesh)
    ang_sh = shard_cube(angles, mesh)
    return np.asarray(fn(cube_sh, ang_sh))


def make_sharded_pca_annular(mesh, segments, ncomp, axis="frames",
                             collapse="median", method="eigen",
                             scaling=None, frame_shape=None):
    """Sharded annular PCA (the reference's P2 workload: per-frame SVDs
    over annulus segments, pca_local.py:726-742).

    The cube's frame axis is sharded; per (annulus, segment) every device
    all_gathers the small segment matrix (n x n_seg_px rides ICI, the
    full cube never moves), then runs the masked per-frame SVD+projection
    of ``ops.annular`` locally for its own frames. Derotation stays
    frame-local; the collapse reshards.

    ``segments``: list of (yy, xx) static pixel index arrays, one per
    (annulus, segment). Library masks / effective ranks are passed to the
    returned function as (S, n, n) / (S, n) arrays.
    """
    from ..ops.annular import _masked_top_v

    if collapse not in ("mean", "median"):
        raise ValueError("sharded collapse supports 'mean' and 'median'")
    if scaling not in (None, "temp-mean", "temp-standard"):
        raise ValueError("sharded annular PCA supports scaling in "
                         "(None, 'temp-mean', 'temp-standard')")
    # flat 1-D indices: the 2-D fancy gather costs ~187 s of XLA compile
    # per shape on TPU (docs/PROFILING.md annular table)
    if frame_shape is None:
        fx = int(max(int(np.max(xx)) for _yy, xx in segments)) + 1
    else:
        fx = int(frame_shape[1])
    seg_idx = [jnp.asarray(np.asarray(yy, np.int64) * fx
                           + np.asarray(xx, np.int64), jnp.int32)
               for yy, xx in segments]

    def step(cube_loc, angles_loc, masks_loc, keff_loc):
        n_loc, ny, nx = cube_loc.shape
        resid_loc = jnp.zeros_like(cube_loc).reshape(n_loc, ny * nx)
        cube_flat = cube_loc.reshape(n_loc, ny * nx)
        for s, flat in enumerate(seg_idx):
            seg_loc = jnp.take(cube_flat, flat, axis=1,
                               mode="clip")                   # (n_loc, p)
            if scaling is not None:
                # distributed temporal moments over the frame axis
                n_tot = n_loc * jax.lax.psum(jnp.ones(()), axis)
                mu = jax.lax.psum(jnp.sum(seg_loc, 0), axis) / n_tot
                seg_loc = seg_loc - mu[None]
                if scaling == "temp-standard":
                    var = jax.lax.psum(jnp.sum(seg_loc ** 2, 0),
                                       axis) / n_tot
                    std = jnp.sqrt(var)
                    seg_loc = seg_loc / jnp.where(std == 0, 1.0, std)[None]
            seg_full = jax.lax.all_gather(seg_loc, axis, tiled=True)

            def one(mask_row, curr, k):
                lib = seg_full * mask_row[:, None]
                V = _masked_top_v(lib, ncomp, method)
                V = jnp.where((jnp.arange(ncomp) < k)[:, None], V, 0.0)
                return curr - (curr @ V.T) @ V

            res = jax.vmap(one)(masks_loc[s], seg_loc, keff_loc[s])
            resid_loc = resid_loc.at[:, seg_idx[s]].set(res)
        resid_loc = resid_loc.reshape(n_loc, ny, nx)
        der = rotate_fft_pruned_batch(resid_loc, -angles_loc)
        # pca_annular's mask_val=0 rot_option: pixels that are zero
        # before rotation are reset to zero afterwards
        der = jnp.where(resid_loc == 0, 0.0, der)
        if collapse == "median":
            return _sharded_median(der, axis)
        n_total = cube_loc.shape[0] * jax.lax.psum(jnp.ones(()), axis)
        return jax.lax.psum(jnp.sum(der, axis=0), axis) / n_total

    sharded = shard_map(step, mesh=mesh,
                        in_specs=(P(axis), P(axis), P(None, axis),
                                  P(None, axis)),
                        out_specs=P(), check_vma=False)
    return jax.jit(sharded)


def sharded_pca_annular(cube, angles, ncomp=5, fwhm=4.0, asize=4,
                        delta_rot=0.5, radius_int=0, n_segments=1,
                        max_frames_lib=200, mesh=None, collapse="median",
                        method="eigen", scaling=None):
    """Convenience wrapper: host geometry prep (same rules as
    ``pca_annular``: PA thresholds, segment indices, per-frame library
    masks), then the sharded step."""
    import numpy as np

    from ..preproc.derotation import (_compute_pa_thresh, _define_annuli,
                                      _find_indices_adi)
    from ..var.shapes import get_annulus_segments, resolve_n_segments

    if mesh is None:
        mesh = frame_mesh()
    n_dev = len(mesh.devices.ravel())
    n, y, x = cube.shape
    if n % n_dev:
        raise ValueError(f"n_frames ({n}) must divide evenly over "
                         f"{n_dev} devices")

    n_annuli = int((y / 2 - radius_int) / asize)
    seg_counts = resolve_n_segments(n_segments, n_annuli, asize)
    segments, masks, keffs = [], [], []
    for ann in range(n_annuli):
        pa_thr, inner_radius, _ = _define_annuli(
            angles, ann, n_annuli, fwhm, radius_int, asize, delta_rot,
            seg_counts[ann], False, True)
        indices = get_annulus_segments(cube[0], inner_radius, asize,
                                       seg_counts[ann])
        if pa_thr != 0:
            mask = np.zeros((n, n), dtype=bool)
            sizes = np.zeros(n, dtype=int)
            for fr in range(n):
                idx = _find_indices_adi(angles, fr, pa_thr, truncate=True,
                                        max_frames=max_frames_lib)
                mask[fr, idx] = True
                sizes[fr] = len(idx)
        else:
            mask = np.ones((n, n), dtype=bool)
            sizes = np.full(n, n)
        for yy, xx in indices:
            segments.append((yy, xx))
            masks.append(mask)
            keffs.append(np.minimum(ncomp, np.minimum(sizes, len(yy))))

    fn = make_sharded_pca_annular(mesh, segments, ncomp,
                                  collapse=collapse, method=method,
                                  scaling=scaling,
                                  frame_shape=cube.shape[1:])
    cube_sh = shard_cube(np.asarray(cube, float), mesh)
    ang_sh = shard_cube(np.asarray(angles, float), mesh)
    masks_sh = shard_cube(np.stack(masks), mesh, spec=P(None, "frames"))
    keff_sh = shard_cube(np.stack(keffs), mesh, spec=P(None, "frames"))
    return np.asarray(fn(cube_sh, ang_sh, masks_sh, keff_sh))


def _sharded_median(der_loc, axis):
    """Median over the (sharded) frame axis via an all_to_all reshard:
    frame-sharded (n_loc, y, x) -> pixel-sharded (n, y_loc, x) so every
    device holds all frames of its row slab, local median, then
    all_gather back to the full frame. Collectives ride ICI."""
    full = jax.lax.all_to_all(der_loc, axis, split_axis=1, concat_axis=0,
                              tiled=True)            # (n, y_loc, x)
    med_loc = jnp.median(full, axis=0)               # (y_loc, x)
    return jax.lax.all_gather(med_loc, axis, tiled=True)  # (y, x)


def make_sharded_median_adi(mesh, axis="frames", collapse="median"):
    """Sharded full-frame median-ADI: the temporal median model needs all
    frames per pixel, so it runs pixel-sharded (all_to_all), the residual
    derotation runs frame-sharded, and the final collapse reshards again.
    """

    def step(cube_loc, angles_loc):
        n_loc, y, x = cube_loc.shape
        # temporal median per pixel: reshard to (n, y_loc, x)
        full = jax.lax.all_to_all(cube_loc, axis, split_axis=1,
                                  concat_axis=0, tiled=True)
        med_loc = jnp.median(full, axis=0)                 # (y_loc, x)
        med = jax.lax.all_gather(med_loc, axis, tiled=True)  # (y, x)
        resid = cube_loc - med[None]
        der = rotate_fft_pruned_batch(resid, -angles_loc)
        if collapse == "median":
            return _sharded_median(der, axis)
        n_total = n_loc * jax.lax.psum(jnp.ones(()), axis)
        return jax.lax.psum(jnp.sum(der, axis=0), axis) / n_total

    sharded = shard_map(step, mesh=mesh,
                        in_specs=(P("frames"), P("frames")), out_specs=P(),
                        check_vma=False)
    return jax.jit(sharded)


def _apply_resample(frame, R, g, h):
    """Apply one per-channel exact-zoom operator (see
    ``preproc.rescaling.scale_fft_matrix``): two MXU matmuls plus the
    rank-1 Nyquist correction. R (o, i), g (o,), h (i,), frame (i, i)."""
    corr = h @ frame @ h
    return R @ frame @ R.T - corr * g[:, None] * g[None, :]


def make_sharded_pca_sdi_single(mesh, ncomp, axis="channels",
                                collapse="median", collapse_ifs="mean"):
    """Sharded ADI+mSDI single-step PCA (P4 of SURVEY §2.c), numerically
    EXACT vs the single-chip ``pca(adimsdi='single', imlib2='vip-fft')``.

    The wavelength axis of the 4-D cube is laid over the mesh. Each
    device rescales its channels to the common lambda locally with the
    channel's precomputed exact scale_fft operator (uniform (o, i) shape
    for every channel — reference rescaling.py:1114-1217's per-channel
    KD/KF integer paddings are folded into dense resample matrices by
    ``scale_fft_matrix``, so one compiled SPMD program serves all
    channels). The joint (z·n, p) PCA library's Gram is assembled with
    one all_gather over ICI, projection/subtraction and the inverse
    rescale stay local, the channel collapse is a psum (mean) or an
    all_to_all reshard (median), and the ADI derotation stage reshards
    the frame axis over the same devices before the final collapse — the
    multi-chip rebuild of the reference's single-PCA mSDI mode
    (reference pca_fullfr.py:1038-1242).

    Returns fn(cube4d, angles, A, gA, hA, B, gB, hB) -> (y_out, y_out)
    frame; cube4d is consumed sharded along channels (at the reflect-
    padded size), the per-channel forward operators A (z, p_pca, p_pad)
    and inverse operators B (z, y_out, p_pca) sharded likewise, angles
    broadcast. Requires z % n_dev == 0 and n % n_dev == 0.
    """
    n_dev = len(mesh.devices.ravel())
    if collapse not in ("mean", "median"):
        raise ValueError("sharded collapse supports 'mean' and 'median'")
    if collapse_ifs not in ("mean", "median"):
        raise ValueError("sharded collapse_ifs supports 'mean' and 'median'")

    def step(cube_loc, angles, A_loc, gA_loc, hA_loc, B_loc, gB_loc, hB_loc):
        z_loc, n, _, _ = cube_loc.shape
        z = z_loc * n_dev

        # local channel rescale to the common wavelength (exact zoom)
        resc = jax.vmap(lambda ch, R, g, h: jax.vmap(
            lambda f: _apply_resample(f, R, g, h))(ch))(
                cube_loc, A_loc, gA_loc, hA_loc)
        y_pca = resc.shape[-1]
        M_loc = resc.reshape(z_loc * n, y_pca * y_pca)

        # distributed Gram of the joint (z*n, p) library
        M_full = jax.lax.all_gather(M_loc, axis, tiled=True)
        C_loc = M_loc @ M_full.T
        C = jax.lax.all_gather(C_loc, axis, tiled=True)
        e, EV = jnp.linalg.eigh(C)

        idx = jax.lax.axis_index(axis)
        EV_loc = jax.lax.dynamic_slice_in_dim(EV, idx * z_loc * n,
                                              z_loc * n, 0)
        V = jax.lax.psum(EV_loc.T @ M_loc, axis)[::-1]
        S = jnp.sqrt(jnp.abs(e))[::-1]
        V = (V / S[:, None])[:ncomp]

        # local projection + exact inverse rescale + crop to y_out
        resid = (M_loc - (M_loc @ V.T) @ V).reshape(z_loc, n, y_pca, y_pca)
        desc = jax.vmap(lambda ch, R, g, h: jax.vmap(
            lambda f: _apply_resample(f, R, g, h))(ch))(
                resid, B_loc, gB_loc, hB_loc)

        # channel (IFS) collapse + frame-axis reshard for the ADI stage
        n_loc = n // n_dev
        if collapse_ifs == "median":
            # (z_loc, n, y, x) -> (z, n_loc, y, x): the all_to_all hands
            # every device ALL channels of its own frame slab
            full = jax.lax.all_to_all(desc, axis, split_axis=1,
                                      concat_axis=0, tiled=True)
            fr_loc = jnp.median(full, axis=0)              # (n_loc, y, x)
        else:
            cube_adi = jax.lax.psum(jnp.sum(desc, axis=0), axis) / z
            fr_loc = jax.lax.dynamic_slice_in_dim(cube_adi, idx * n_loc,
                                                  n_loc)
        ang_loc = jax.lax.dynamic_slice_in_dim(angles, idx * n_loc, n_loc)
        der = rotate_fft_pruned_batch(fr_loc, -ang_loc)
        if collapse == "median":
            return _sharded_median(der, axis)
        return jax.lax.psum(jnp.sum(der, axis=0), axis) / n

    sharded = shard_map(step, mesh=mesh,
                        in_specs=(P(axis), P(), P(axis), P(axis), P(axis),
                                  P(axis), P(axis), P(axis)),
                        out_specs=P(), check_vma=False)
    return jax.jit(sharded)


def _compose_crop(R, g, y0, size):
    """Row-crop an exact-zoom operator: out rows [y0:y0+size]."""
    return R[y0:y0 + size], g[y0:y0 + size]


def _channel_resample_ops(dim, scale, crop=None):
    """Exact-zoom operator for one channel at frame size ``dim``
    (odd dims go through frame_rescaling's embed-to-even trick,
    reference rescaling.py:1170-1180), optionally composed with a
    centered row-crop to ``crop`` (reference cosmetics.py:38-111 /
    shapes.py:255-354 conventions via ``get_square``)."""
    from ..preproc.rescaling import scale_fft_matrix
    from ..var.shapes import get_square

    if dim % 2:
        R, g, h = scale_fft_matrix(dim + 1, float(scale))
        # odd frame embedded at [1:, 1:] of an even zero frame, output
        # cropped back: per-axis operator drops row/col 0
        R, g, h = R[1:, 1:], g[1:], h[1:]
    else:
        R, g, h = scale_fft_matrix(dim, float(scale))
    if crop is not None and crop < dim:
        _, y0, _ = get_square(np.zeros((dim, dim)), crop, (dim - 1) / 2.,
                              (dim - 1) / 2., position=True, verbose=False)
        # get_square may bump size by 1 on parity mismatch
        size = crop + 1 if (dim % 2) != (crop % 2) else crop
        R, g = _compose_crop(R, g, y0, size)
    return R, g, h


def sharded_pca_sdi_single(cube, angles, scal_list, ncomp=2, mesh=None,
                           collapse="median", collapse_ifs="mean",
                           crop_ifs=True):
    """Multi-chip ``pca(adimsdi='single')``: host geometry prep (reflect
    pad + per-channel exact resample operators), then the sharded step.

    Mirrors _adimsdi_singlepca (reference pca_fullfr.py:1038-1242):
    reflect-pad to ceil(max_scale * y), forward exact zoom per channel
    (optionally cropped back to y when ``crop_ifs``), one joint PCA over
    all z*n frames, inverse zoom + crop to y, IFS collapse, derotation,
    final collapse.
    """
    if mesh is None:
        mesh = frame_mesh(axis_name="channels")
    n_dev = len(mesh.devices.ravel())
    cube = np.asarray(cube, float)
    z, n, y_in, x_in = cube.shape
    if y_in != x_in:
        raise ValueError("sharded SDI requires square frames")
    if z % n_dev or n % n_dev:
        raise ValueError(f"z ({z}) and n ({n}) must divide evenly over "
                         f"{n_dev} devices")
    scal = np.asarray(scal_list, float)

    # reflect pad (reference rescaling.py:324-477 forward branch)
    max_sc = float(np.max(scal))
    if max_sc > 1:
        new_y = int(np.ceil(max_sc * y_in))
        if (new_y - y_in) % 2 != 0:
            new_y += 1
        p = (new_y - y_in) // 2
        big = np.pad(cube, ((0, 0), (0, 0), (p, p), (p, p)), "reflect")
    else:
        big = cube
    y_pad = big.shape[-1]

    # scale_fft embeds values through float32 (reference
    # rescaling.py:1168 dtype quirk); replicate for bit-parity
    big = big.astype(np.float32).astype(np.float64)

    fwd = [_channel_resample_ops(y_pad, s,
                                 crop=y_in if crop_ifs else None)
           for s in scal]
    y_pca = fwd[0][0].shape[0]
    inv = [_channel_resample_ops(y_pca, 1.0 / s,
                                 crop=y_in if y_pca > y_in else None)
           for s in scal]

    A = np.stack([f[0] for f in fwd])
    gA = np.stack([f[1] for f in fwd])
    hA = np.stack([f[2] for f in fwd])
    B = np.stack([iv[0] for iv in inv])
    gB = np.stack([iv[1] for iv in inv])
    hB = np.stack([iv[2] for iv in inv])

    fn = make_sharded_pca_sdi_single(mesh, ncomp, axis=mesh.axis_names[0],
                                     collapse=collapse,
                                     collapse_ifs=collapse_ifs)
    sh = functools.partial(shard_cube, mesh=mesh)
    return np.asarray(fn(sh(big), jnp.asarray(np.asarray(angles, float)),
                         sh(A), sh(gA), sh(hA), sh(B), sh(gB), sh(hB)))


# ---------------------------------------------------------------------------
# P6: sharded out-of-core incremental PCA (SURVEY.md §2.c P6)
# ---------------------------------------------------------------------------
# The reference's out-of-core engine is a single-host memmap +
# sklearn.IncrementalPCA loop (utils_pca.py:431-614). The TPU-native
# multi-chip layout shards the PIXEL axis: every streamed block is
# device_put split across the mesh (parallel host->device links on a
# real pod), each device holds 1/n_dev of every block, the basis and the
# running mean, and the only cross-device traffic in the streaming merge
# is one psum of the small (k+m+1)^2 Gram per block. Pass 2 reshards the
# residual block pixel->frame (all_to_all over ICI) so the FFT
# derotation stays frame-local, then collapses with a validity mask so
# ragged tail batches need no separate program. Zero-padding the pixel
# axis to a mesh multiple is numerically exact everywhere (zero pixels
# contribute nothing to Gram, mean, or projection).


def make_sharded_incremental_merge(mesh, keep, m_pad, axis=None):
    """One pixel-sharded merge-and-truncate step of the streaming SVD.

    Inputs (global shapes): basis (keep, npx_pad) sharded on the pixel
    axis, blk (m_pad, npx_pad) pixel-sharded with zero rows past
    ``nvalid``, mean (npx_pad,) sharded, count/nvalid replicated
    scalars. Numerics match ``utils_pca._incremental_merge_svd`` (the
    single-device step) up to float reduction order.
    """
    if axis is None:
        axis = mesh.axis_names[0]

    def step(basis_loc, blk_loc, mean_loc, count, nvalid):
        new_count = count + nvalid
        blk_mean = blk_loc.sum(axis=0) / nvalid     # pad rows are zero
        mean_corr = jnp.sqrt(count * nvalid / new_count) \
            * (blk_mean - mean_loc)
        valid = (jnp.arange(m_pad) < nvalid)[:, None]
        centered = jnp.where(valid, blk_loc - blk_mean, 0.0)
        stack = jnp.vstack([basis_loc, centered, mean_corr[None, :]])
        G = jax.lax.psum(stack @ stack.T, axis)     # (q, q), q small
        _, U = jnp.linalg.eigh(G)                   # replicated
        top = U[:, -1:-(keep + 1):-1]               # top-keep, descending
        new_basis = top.T @ stack                   # local pixel slab
        new_mean = (count * mean_loc + nvalid * blk_mean) / new_count
        return new_basis, new_mean, new_count

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(axis), P(), P()),
        out_specs=(P(None, axis), P(axis), P()), check_vma=False)
    return jax.jit(sharded)


def make_sharded_incremental_normalize(mesh, axis=None):
    """Row-normalize the pixel-sharded basis (psum of local sumsq)."""
    if axis is None:
        axis = mesh.axis_names[0]

    def step(basis_loc):
        n2 = jax.lax.psum(jnp.sum(basis_loc ** 2, axis=1), axis)
        norms = jnp.sqrt(n2)[:, None]
        return basis_loc / jnp.where(norms == 0, 1.0, norms)

    sharded = shard_map(step, mesh=mesh, in_specs=(P(None, axis),),
                        out_specs=P(None, axis), check_vma=False)
    return jax.jit(sharded)


def make_sharded_incremental_pass2(mesh, shape, npx, collapse="median",
                                   axis=None):
    """Pass-2 per-block step: pixel-sharded project/subtract, all_to_all
    reshard to frame-local FFT derotation, masked collapse.

    ``shape`` is the (y, x) frame shape; ``npx`` the true pixel count
    before mesh padding. The returned fn maps
    (blk, mean, V, angles_pad, nvalid) -> collapsed (y, x) frame, where
    blk/mean/V are pixel-sharded and angles_pad is replicated with
    padding entries past ``nvalid``. Padded frames carry garbage through
    the rotation and are masked out of the collapse.
    """
    if axis is None:
        axis = mesh.axis_names[0]
    y, x = shape
    if collapse not in ("median", "mean", "sum"):
        raise ValueError("sharded pass-2 collapse supports "
                         "'median'/'mean'/'sum'")

    def step(blk_loc, mean_loc, V_loc, angles_pad, nvalid):
        M = blk_loc - mean_loc
        coef = jax.lax.psum(M @ V_loc.T, axis)          # (m_pad, k)
        resid_loc = M - coef @ V_loc                    # (m_pad, pl)
        # reshard pixels -> frames: each device derotates m_pad/n_dev
        # full frames locally
        resid_f = jax.lax.all_to_all(resid_loc, axis, split_axis=0,
                                     concat_axis=1, tiled=True)
        frames = resid_f[:, :npx].reshape(-1, y, x)
        m_loc = frames.shape[0]
        idx = jax.lax.axis_index(axis)
        ang_loc = jax.lax.dynamic_slice_in_dim(angles_pad, idx * m_loc,
                                               m_loc, 0)
        der = rotate_fft_pruned_batch(frames, -ang_loc)
        # masked collapse across the full batch (replicated: one small
        # (m_pad, y, x) gather; the batch median needs all frames/pixel)
        der_all = jax.lax.all_gather(der, axis, tiled=True)
        valid = (jnp.arange(der_all.shape[0]) < nvalid)[:, None, None]
        if collapse == "median":
            return jnp.nanmedian(jnp.where(valid, der_all, jnp.nan),
                                 axis=0)
        s = jnp.sum(jnp.where(valid, der_all, 0.0), axis=0)
        return s if collapse == "sum" else s / nvalid

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(None, axis), P(axis), P(None, axis), P(), P()),
        out_specs=P(), check_vma=False)
    return jax.jit(sharded)
