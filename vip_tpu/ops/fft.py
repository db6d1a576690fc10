"""Jittable FFT geometric-transform kernels.

TPU-native implementations of the reference's hot preprocessing math:

- 3-shear FFT rotation ([LAR97]; reference ``rotate_fft`` at
  vip_hci/preproc/derotation.py:542-640). Exact same math — including the
  odd/even size juggling, the quadrant ``rot90`` pre-rotation and the
  fftshift choreography — but expressed with traced rotation angles so a
  whole cube derotates as ONE batched XLA computation instead of a process
  pool (derotation.py:394-397).
- Fourier sub-pixel shift (reference ``frame_shift`` 'vip-fft' path at
  vip_hci/preproc/recentering.py:180-189 incl. the pad-to-square-even
  preamble at :126-180).

All kernels are shape-static (pad amounts are Python ints) and dtype
polymorphic: float32 in → complex64 FFTs (TPU speed path), float64 in →
complex128 (parity testing on CPU with x64 enabled).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "fft_shear",
    "rotate_fft",
    "rotate_fft_batch",
    "fourier_shift",
    "fourier_shift_batch",
]


def _shear_phase(N, dtype):
    """(i - N/2)(j - N/2)/N phase grid shared by both shear axes.

    For an even-size square array centered at N/2 the reference's
    ``u ⊗ x`` product (derotation.py:625-640) reduces to this symmetric
    outer product, identical for the x- and y-shears.
    """
    q = jnp.arange(N, dtype=dtype) - N / 2
    return jnp.outer(q, q) / N


def decompose_rotation(angles, real_dtype=jnp.float32):
    """Quadrant reduction shared by every 3-shear rotation path:
    ``angle = 90*k + dangle`` with ``dangle`` in (-45, 45].

    Returns (k, dangle) — k the int32 number of rot90 pre-rotations,
    dangle the residual shear angle. Works on scalars and arrays
    (traced ok). Keeping this in ONE place matters: the subtle quadrant
    placement (the +1-pixel dy/dx shifts downstream) must stay identical
    across the exact, fused and packed speed paths.
    """
    angles = jnp.asarray(angles, real_dtype) % 360.0
    d = angles % 90.0
    dangle_gt = jnp.where(d > 45.0, d - 90.0, d)
    use_rot = angles > 45.0
    k = jnp.where(use_rot, jnp.rint(angles / 90.0),
                  0.0).astype(jnp.int32) % 4
    dangle = jnp.where(use_rot, dangle_gt, angles)
    return k, dangle


def quad_rot90(k, frame):
    """rot90 by a traced quadrant count as a 4-way ``lax.switch``."""
    return jax.lax.switch(k, [lambda a: a,
                              lambda a: jnp.rot90(a, 1),
                              lambda a: jnp.rot90(a, 2),
                              lambda a: jnp.rot90(a, 3)], frame)


def fft_shear(arr, c, ax, phase=None):
    """One linear shear as a 1-D FFT phase multiplication.

    ``arr`` must be an even-size square 2-d array (complex ok); ``c`` is the
    (possibly traced) shear coefficient. Mirrors ``_fft_shear``
    (derotation.py:625-640) with its fftshift sequence.
    """
    N = arr.shape[0]
    real_dtype = jnp.zeros((), jnp.result_type(arr, jnp.float32)).real.dtype
    # shift-free formulation: the reference's fftshift sandwich
    # (derotation.py:625-640) is algebraically identical (for even N) to a
    # signed-integer-frequency phase ramp — same values to 1e-16, but
    # without the four full-array fftshift copies per shear
    kint = jnp.fft.fftfreq(N, d=1.0 / N).astype(real_dtype)
    q = jnp.arange(N, dtype=real_dtype) - N / 2
    if ax == 1:
        ramp = jnp.outer(q, kint) / N       # (row, freq)
    else:
        ramp = jnp.outer(kint, q) / N       # (freq, col)
    s = jnp.fft.fft(arr, axis=ax)
    s = jnp.exp(-2j * jnp.pi * c * ramp) * s
    return jnp.fft.ifft(s, axis=ax)


def rotate_fft(array, angle):
    """Rotate a square 2-d array by ``angle`` degrees (counter-clockwise)
    using three FFT shears.

    Jittable with a traced ``angle``; the data-dependent quadrant
    pre-rotation (derotation.py:589-597) is a 4-way ``lax.switch``. For even
    inputs the rotation center is at (y/2, x/2) — top-right of the central
    2x2 block — exactly like the reference.
    """
    y_ori = array.shape[0]
    if array.ndim != 2 or array.shape[0] != array.shape[1]:
        raise ValueError("rotate_fft expects a square 2d array")

    real_dtype = jnp.result_type(array.dtype, jnp.float32)
    if jnp.issubdtype(real_dtype, jnp.complexfloating):
        raise TypeError("rotate_fft expects a real array")
    cdtype = jnp.complex128 if real_dtype == jnp.float64 else jnp.complex64

    k, dangle = decompose_rotation(angle, real_dtype)

    odd = y_ori % 2
    if not odd:
        arr = jnp.zeros((y_ori + 1, y_ori + 1), array.dtype)
        arr = arr.at[:-1, :-1].set(array)
    else:
        arr = array

    arr = quad_rot90(k, arr)
    arr = arr[:-1, :-1]  # even N x N, center at N/2

    N = arr.shape[0]
    phase = _shear_phase(N, real_dtype)
    a = jnp.tan(jnp.deg2rad(dangle) / 2)
    b = -jnp.sin(jnp.deg2rad(dangle))

    s = fft_shear(arr.astype(cdtype), a, ax=1, phase=phase)
    s = fft_shear(s, b, ax=0, phase=phase)
    s = fft_shear(s, a, ax=1, phase=phase)
    out = jnp.real(s).astype(array.dtype)

    if odd:
        res = jnp.zeros((y_ori, y_ori), array.dtype).at[:-1, :-1].set(out)
    else:
        res = out
    return res


def rotate_fft_batch(cube, angles):
    """vmapped :func:`rotate_fft` over the leading frame axis."""
    return jax.vmap(rotate_fft, in_axes=(0, 0))(cube, angles)


def rotate_fft_exact_pruned(frames, angles, pad_y, py0, px0, cy0, cy1,
                            cx0, cx1):
    """The full 4x-padded 3-shear rotation pipeline (pad -> rotate_fft ->
    crop) with support pruning — bit-identical to the per-frame path, at
    roughly half the FFT work.

    Exactness-preserving structure: the x-shear acts on rows
    independently, so (1) the first shear runs only on the ``y`` rows
    where the placed frame lives (all other rows are exactly zero in and
    out), and (3) the last shear runs only on the rows that survive the
    final crop. Only the middle y-shear needs full-length columns.

    ``frames``: (B, y, x) real, even square; geometry ints from
    ``preproc.derotation._fft_rotate_geometry``.
    """
    frames = jnp.asarray(frames)
    B, y, x = frames.shape
    # Odd canvases (odd input frames keep canvas parity): rotate_fft's odd
    # path rot90s the full odd canvas, then computes the shears on its
    # even (P-1)-size leading subarray. The centrally-placed block
    # satisfies 2*py0 + y == P, so the full-canvas rot90 restricted to the
    # block is a plain rot90 of the small frame at the SAME (py0, px0)
    # for every quadrant (no +1 shifts), and the crop indices all lie
    # inside the even working canvas.
    odd_canvas = pad_y % 2 == 1
    N = pad_y - 1 if odd_canvas else pad_y
    real_dtype = jnp.result_type(frames.dtype, jnp.float32)
    cdtype = jnp.complex128 if real_dtype == jnp.float64 else jnp.complex64

    k, dangle = decompose_rotation(angles, real_dtype)

    # quadrant rot90: the reference rot90s the whole (N+1-extended) canvas
    # about its center; on the centrally-placed block this equals a plain
    # rot90 of the small frame placed one pixel down/right per quadrant
    # (k=1: +row, k=2: +row+col, k=3: +col) — verified bit-exact.
    rot = jax.vmap(quad_rot90)(k, frames).astype(cdtype)
    if odd_canvas:
        dy = dx = jnp.zeros_like(k)
    else:
        dy = jnp.asarray([0, 1, 1, 0])[k]
        dx = jnp.asarray([0, 0, 1, 1])[k]

    a = jnp.tan(jnp.deg2rad(dangle) / 2)[:, None, None]
    b = -jnp.sin(jnp.deg2rad(dangle))[:, None, None]
    kint = jnp.fft.fftfreq(N, d=1.0 / N).astype(real_dtype)
    q = jnp.arange(N, dtype=real_dtype) - N / 2

    # occupied slab: y+1 rows starting at py0 (room for the +1 shifts)
    slab = jnp.zeros((B, y + 1, N), cdtype)

    def _place(sl, fr, dyi, dxi):
        return jax.lax.dynamic_update_slice(sl, fr, (dyi, px0 + dxi))

    work = jax.vmap(_place)(slab, rot, dy, dx)

    # ---- shear 1 (x): only the occupied rows ----
    ramp1 = jnp.outer(q[py0:py0 + y + 1], kint) / N
    s = jnp.fft.fft(work, axis=2)
    s = jnp.exp(-2j * jnp.pi * a * ramp1[None]) * s
    s = jnp.fft.ifft(s, axis=2)

    # ---- shear 2 (y): full columns ----
    canvas = jnp.zeros((B, N, N), cdtype)
    canvas = canvas.at[:, py0:py0 + y + 1, :].set(s)
    ramp2 = jnp.outer(kint, q) / N
    s = jnp.fft.fft(canvas, axis=1)
    s = jnp.exp(-2j * jnp.pi * b * ramp2[None]) * s
    s = jnp.fft.ifft(s, axis=1)

    # ---- shear 3 (x): only the crop rows ----
    s = s[:, cy0:cy1, :]
    ramp3 = jnp.outer(q[cy0:cy1], kint) / N
    s = jnp.fft.fft(s, axis=2)
    s = jnp.exp(-2j * jnp.pi * a * ramp3[None]) * s
    s = jnp.fft.ifft(s, axis=2)

    return jnp.real(s[:, :, cx0:cx1]).astype(frames.dtype)


# ---------------------------------------------------------------------------
# Fourier sub-pixel shift
# ---------------------------------------------------------------------------
def fourier_shift_np(array, shift_y, shift_x, npad):
    """Host-numpy twin of :func:`fourier_shift` (same geometry, float64
    FFTs like the reference's recentering.py:126-189).

    Exists because the jitted version compiles one program PER padded
    canvas size: eager big-shift callers (``frame_shift`` on full frames,
    where ``npad = ceil(max|shift|)`` varies per call) would pay a fresh
    multi-minute tunnel compile for every distinct shift magnitude —
    27 such compiles dominated the at-scale ``contrast_curve`` wall time.
    On host data the numpy FFT is bit-closer to the reference anyway
    (both run float64; the device path computes in f32 when x64 is off).
    """
    ny_ori, nx_ori = array.shape
    cy_ori, cx_ori = _frame_center_static(ny_ori, nx_ori)
    new_y = ny_ori + 2 * npad
    new_x = nx_ori + 2 * npad
    cy, cx = _frame_center_static(new_y, new_x)
    y0 = int(cy - cy_ori)
    x0 = int(cx - cx_ori)

    npix = max(new_y, new_x)
    if new_y > new_x:
        sq_x0 = int(cy - cx)
        sq_y0 = 0
    elif new_x > new_y:
        sq_y0 = int(cx - cy)
        sq_x0 = 0
    else:
        sq_y0 = sq_x0 = 0

    odd = npix % 2
    npix_f = npix + 1 if odd else npix
    if odd:
        off_y = 0 if shift_y > 0 else 1
        off_x = 0 if shift_x > 0 else 1
    else:
        off_y = off_x = 0

    canvas = np.zeros((npix_f, npix_f), dtype=np.float64)
    canvas[sq_y0 + y0 + off_y:sq_y0 + y0 + off_y + ny_ori,
           sq_x0 + x0 + off_x:sq_x0 + x0 + off_x + nx_ori] = array
    p_y0 = npad + sq_y0 + off_y
    p_x0 = npad + sq_x0 + off_x

    ramp = np.arange(npix_f, dtype=np.float64) - npix_f / 2
    rx = np.broadcast_to(ramp, (npix_f, npix_f))
    tilt = (-2 * np.pi / npix_f) * (shift_x * rx + shift_y * rx.T)
    fact = np.fft.fftshift(np.cos(tilt) + 1j * np.sin(tilt))

    shifted = np.fft.ifft2(np.fft.fft2(canvas) * fact).real
    out = shifted[p_y0:p_y0 + ny_ori, p_x0:p_x0 + nx_ori]
    # keep float output for non-float input (the reference's frame_shift
    # always returns float64; casting back to an integer dtype would
    # silently truncate the fractional shifted values — ADVICE r4)
    in_dtype = np.asarray(array).dtype
    if not np.issubdtype(in_dtype, np.floating):
        return out
    return out.astype(in_dtype, copy=False)


@functools.partial(jax.jit, static_argnames=("npad",))
def fourier_shift(array, shift_y, shift_x, npad):
    """Shift a 2-d array by (shift_y, shift_x) pixels via an FFT phase ramp.

    ``npad`` is the *static* zero-pad margin — the reference computes
    ``ceil(max|shift|)`` per call (recentering.py:127); pass that value for
    bit-parity, or a common upper bound when batching frames with different
    shifts. Replicates the pad-to-square / pad-to-even preamble
    (recentering.py:126-180) including the shift-sign-dependent placement
    for the odd→even case. Jitted (eager complex FFTs are unimplemented
    on the tunneled TPU backend).
    """
    ny_ori, nx_ori = array.shape
    real_dtype = jnp.result_type(array.dtype, jnp.float32)
    shift_y = jnp.asarray(shift_y, real_dtype)
    shift_x = jnp.asarray(shift_x, real_dtype)

    # --- static geometry (mirrors recentering.py:128-180) ---
    cy_ori, cx_ori = _frame_center_static(ny_ori, nx_ori)
    new_y = ny_ori + 2 * npad
    new_x = nx_ori + 2 * npad
    cy, cx = _frame_center_static(new_y, new_x)
    y0 = int(cy - cy_ori)
    x0 = int(cx - cx_ori)

    npix = max(new_y, new_x)
    # placement of the (new_y, new_x) canvas inside the square canvas
    if new_y > new_x:
        sq_x0 = int(cy - cx)
        sq_y0 = 0
    elif new_x > new_y:
        sq_y0 = int(cx - cy)
        sq_x0 = 0
    else:
        sq_y0 = sq_x0 = 0

    odd = npix % 2
    npix_f = npix + 1 if odd else npix

    p_y0_base = npad + sq_y0
    p_x0_base = npad + sq_x0

    # --- build padded square even canvas on device ---
    canvas = jnp.zeros((npix_f, npix_f), array.dtype)
    if odd:
        off_y = jnp.where(shift_y > 0, 0, 1)
        off_x = jnp.where(shift_x > 0, 0, 1)
    else:
        off_y = jnp.asarray(0)
        off_x = jnp.asarray(0)
    canvas = jax.lax.dynamic_update_slice(
        canvas, array, (sq_y0 + y0 + off_y, sq_x0 + x0 + off_x)
    )
    p_y0 = p_y0_base + off_y
    p_x0 = p_x0_base + off_x

    # --- FFT phase-ramp shift (recentering.py:181-189) ---
    ramp = jnp.broadcast_to(
        jnp.arange(npix_f, dtype=real_dtype) - npix_f / 2, (npix_f, npix_f)
    )
    tilt = (-2 * jnp.pi / npix_f) * (shift_x * ramp + shift_y * ramp.T)
    fact = jnp.fft.fftshift(jnp.cos(tilt) + 1j * jnp.sin(tilt))

    image_ft = jnp.fft.fft2(canvas)
    shifted = jnp.fft.ifft2(image_ft * fact).real.astype(array.dtype)

    return jax.lax.dynamic_slice(shifted, (p_y0, p_x0), (ny_ori, nx_ori))


@functools.partial(jax.jit, static_argnames=("npad",))
def fourier_shift_batch(cube, shifts_y, shifts_x, npad):
    """vmapped :func:`fourier_shift` with a shared static pad margin.

    Jitted: eager complex FFT ops are unimplemented on the tunneled TPU
    backend, and callers (e.g. ``cube_inject_companions``) invoke this
    outside any jit of their own.
    """
    return jax.vmap(fourier_shift, in_axes=(0, 0, 0, None))(
        cube, shifts_y, shifts_x, npad
    )


def _frame_center_static(ny, nx):
    """frame_center convention on static ints (var/coords.py:61)."""
    cy = ny / 2
    cx = nx / 2
    if ny % 2:
        cy -= 0.5
    if nx % 2:
        cx -= 0.5
    return int(cy), int(cx)


def _packed_shear(z, c1, c2, ax, q0=None):
    """One FFT shear applied to a complex pack ``z = f1 + i f2`` of two
    real frame batches with per-frame shear coefficients c1/c2 (arrays
    broadcastable over the batch).

    Uses the shift-free formulation: translation of line ``q`` by
    ``c * (q - N/2)`` pixels via signed-integer-frequency phase ramps.
    The Hermitian split recovers each frame's spectrum so the two packed
    frames can receive different shear phases, then they are re-packed for
    a single inverse FFT. This halves FFT traffic vs one complex FFT per
    frame (the frames are real) and avoids the 4 fftshift copies per
    shear of the exact-parity path.
    """
    N = z.shape[2 if ax in (2, -1) else 1]         # FFT length
    M = z.shape[1 if ax in (2, -1) else 2]         # perpendicular length
    kint = jnp.fft.fftfreq(N, d=1.0 / N).astype(z.real.dtype)  # signed ints
    # line coordinate along the perpendicular axis; q0 lets callers pass a
    # row/col slab cut out of a larger canvas (support pruning)
    q = jnp.arange(M, dtype=z.real.dtype) + (-M / 2 if q0 is None else q0)

    F = jnp.fft.fft(z, axis=ax)
    # F_rev[k] = F[(N - k) mod N] along ax
    Frev = jnp.roll(jnp.flip(F, axis=ax), 1, axis=ax)
    F1 = 0.5 * (F + jnp.conj(Frev))
    F2 = -0.5j * (F - jnp.conj(Frev))

    if ax == 2 or ax == -1:            # x-shear: shift row i by c*(i-N/2)
        ramp = jnp.einsum("i,k->ik", q, kint) / N    # (row, freq)
    else:                              # y-shear: shift col j by c*(j-N/2)
        ramp = jnp.einsum("k,j->kj", kint, q) / N    # (freq, col)
    ph1 = jnp.exp((-2j * jnp.pi) * c1[:, None, None] * ramp[None])
    ph2 = jnp.exp((-2j * jnp.pi) * c2[:, None, None] * ramp[None])
    G = F1 * ph1 + 1j * (F2 * ph2)
    return jnp.fft.ifft(G, axis=ax)


def rotate_fft_fast_batch(cube, angles, support_rows=None):
    """Rotate a batch of even square real frames by per-frame angles with
    packed, shift-free 3-shear FFTs (speed mode).

    Same rotation math as ``rotate_fft`` (quadrant rot90 + 3 shears about
    the (N/2, N/2) center) but: two real frames ride one complex FFT, the
    fftshift sandwiches are folded into signed-frequency phase ramps, and
    intermediate imaginary residue (Nyquist-bin leakage, ~1e-6 relative) is
    dropped at unpack. Use ``rotate_fft`` for exact reference parity.

    ``support_rows=(r0, h)`` prunes the two x-shears to the row slab
    [r0, r0+h) — exactness-preserving when the caller's content lives in
    that slab and the output is cropped to it (the x-shear acts on rows
    independently: zero rows in means zero rows out for shear 1, and the
    final crop discards the out-of-slab sinc tails shear 3 would have
    produced — the same structure as ``rotate_fft_exact_pruned``). Rows
    outside the slab are returned zeroed.
    """
    cube = jnp.asarray(cube)
    n, N, _ = cube.shape
    real_dtype = jnp.result_type(cube.dtype, jnp.float32)
    k, dangle = decompose_rotation(angles, real_dtype)

    # rot90 about the (N/2, N/2) center of an even frame == rot90 of the
    # (N+1)x(N+1) zero-extended frame, cropped back (cf. rotate_fft)
    ext = jnp.zeros((n, N + 1, N + 1), cube.dtype).at[:, :-1, :-1].set(cube)
    ext = jax.vmap(quad_rot90)(k, ext)
    work = ext[:, :-1, :-1].astype(real_dtype)

    a = jnp.tan(jnp.deg2rad(dangle) / 2)
    b = -jnp.sin(jnp.deg2rad(dangle))

    # pack frame pairs into complex (pad an extra zero frame if n is odd)
    if n % 2:
        work = jnp.concatenate([work, jnp.zeros((1, N, N), real_dtype)])
        a = jnp.concatenate([a, jnp.zeros((1,), real_dtype)])
        b = jnp.concatenate([b, jnp.zeros((1,), real_dtype)])
    z = work[0::2] + 1j * work[1::2]
    a1, a2 = a[0::2], a[1::2]
    b1, b2 = b[0::2], b[1::2]

    if support_rows is None:
        z = _packed_shear(z, a1, a2, ax=2)
        z = _packed_shear(z, b1, b2, ax=1)
        z = _packed_shear(z, a1, a2, ax=2)
    else:
        r0, h = support_rows
        zs = _packed_shear(z[:, r0:r0 + h, :], a1, a2, ax=2, q0=r0 - N / 2)
        z = jnp.zeros_like(z).at[:, r0:r0 + h, :].set(zs)
        z = _packed_shear(z, b1, b2, ax=1)
        zs = _packed_shear(z[:, r0:r0 + h, :], a1, a2, ax=2, q0=r0 - N / 2)
        z = jnp.zeros_like(z).at[:, r0:r0 + h, :].set(zs)

    out = jnp.empty((z.shape[0] * 2, N, N), real_dtype)
    out = out.at[0::2].set(jnp.real(z))
    out = out.at[1::2].set(jnp.imag(z))
    return out[:n].astype(cube.dtype)
