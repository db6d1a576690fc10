"""Fused FFT-shear Pallas kernels for the exact 4x-padded rotation.

The reference's flux-preserving rotation (vip_hci/preproc/derotation.py:
542-640) runs three circular shears on a ~4x zero-padded canvas; each
shear is ``ifft(phase * fft(x))`` along one axis. Executed with stock XLA
FFTs this is HBM-pass bound: every transform round-trips the 2048^2
complex canvas through HBM several times (measured ~10% of v5e HBM
bandwidth).

These kernels instead keep the whole per-block spectrum in VMEM and
express the length-N DFT as a *folded two-stage matmul DFT* so the heavy
stages are MXU matmuls with a 128-deep contraction:

  n = Q*n2 + n1  (Q=128 lanes-inner),  k = P*k1 + k2,  N = P*Q
  fwd:  A[k2,n1] = sum_n2 W_P[k2,n2] x[n2,n1]         (small, P<=16)
        Z[k2,k1] = sum_n1 (A*T)[k2,n1] W_Q[n1,k1]     (MXU, K=128)
  phase applied in folded (k2,k1) coordinates
  inv:  mirror with conjugated matrices (and 1/N in the last stage)

Because the DFT is a matmul, *support pruning is exact on both ends*:
input bands (the canvas is zero outside the placed frame) slice W_P's
columns and output bands (only the crop survives) slice W_P's rows.
The 4x canvas is never materialized in HBM — the y-shear reads only the
occupied row band and writes only the crop rows; the full-height
spectrum lives in VMEM one column block at a time.

Numerics: matmul DFTs at f32 are slightly *more* accurate than XLA's
f32 FFT vs a float64 oracle (measured 3.1e-5 vs 6.1e-5 max abs on a
unit-variance 2048^2 spectrum). ``tests/test_pallas_shear.py`` asserts
agreement with the jnp.fft reference path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rotate_fft_exact_fused", "fused_shear_supported"]

_Q = 128          # inner fold length (lane-friendly)
_TWO_PI = 2.0 * np.pi


def fused_shear_supported(y, pad_y):
    """The fused path handles even square frames whose padded canvas
    folds as N = P*Q with Q=128 (all power-of-two sizes >= 64)."""
    return y % 2 == 0 and pad_y % _Q == 0 and pad_y // _Q <= 16


@functools.lru_cache(maxsize=None)
def _consts(N):
    """DFT basis, twiddle and folded-frequency tables (float64-built)."""
    P = N // _Q
    k2 = np.arange(P)
    n1 = np.arange(_Q)
    WP = np.exp(-2j * np.pi * np.outer(k2, k2) / P)
    WQ = np.exp(-2j * np.pi * np.outer(n1, n1) / _Q)
    T = np.exp(-2j * np.pi * np.outer(k2, n1) / N)
    kk = (np.arange(N) + N // 2) % N - N // 2        # fftfreq(N, 1/N)
    kv = kk.reshape(_Q, P).T                         # kv[k2,k1] = kk[P*k1+k2]

    def f32(arr):
        return np.ascontiguousarray(arr, np.float32)

    return (f32(WP.real), f32(WP.imag), f32(WQ.real), f32(WQ.imag),
            f32(T.real), f32(T.imag), f32(kv / N))


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _phase(shift, kvn, N):
    """cos/sin of -2*pi*shift*kv with exact f32 range reduction.

    ``kvn`` holds kv/N (kv integer-valued). Naively theta reaches ~4500
    rad (shear 2: |shift|<=724, |kv/N|<=0.5) where f32 trig range
    reduction has already lost most mantissa bits. Split shift into
    integer + fraction: the integer product S*kv stays below 2^24 so it
    is exact in f32 and reduces mod N exactly; the fractional product is
    <= kv/N * 1 <= 0.5. Residual error ~1e-7 cycles.
    """
    s_int = jnp.floor(shift)
    s_frac = shift - s_int                       # exact in f32
    cyc = jnp.mod(s_int * (kvn * N), N) * (1.0 / N) + s_frac * kvn
    theta = (-_TWO_PI) * (cyc - jnp.rint(cyc))
    return jnp.cos(theta), jnp.sin(theta)


def _split(a):
    """Split f32 into bf16 high + bf16 low parts (a ~= hi + lo)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(sub, a, b):
    """f32 matmul as a manual 3-pass bf16 split with f32 accumulation.

    Mosaic's default f32 dot is a single bf16 pass (~1e-2 relative error
    — measured) and only DEFAULT/HIGHEST are supported in kernels;
    HIGHEST (6 passes) doubles the needed work. The hi*hi + hi*lo +
    lo*hi split restores ~2^-22 relative accuracy at 3 bf16 passes.
    """
    dot = functools.partial(jnp.einsum, sub,
                            preferred_element_type=jnp.float32)
    a_hi, a_lo = _split(a)
    b_hi, b_lo = _split(b)
    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def _cmm(ar, ai, wr, wi):
    """complex (M, Q) @ (Q, Q) as 2D MXU dots (Karatsuba x 3-pass)."""

    def dot(a, b):
        a_hi, a_lo = _split(a)
        b_hi, b_lo = _split(b)
        mm = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
        return mm(a_hi, b_hi) + mm(a_hi, b_lo) + mm(a_lo, b_hi)

    p1 = dot(ar, wr)
    p2 = dot(ai, wi)
    p3 = dot(ar + ai, wr + wi)
    return p1 - p2, p3 - p1 - p2


def _cdot(sub, wr, wi, ar, ai):
    """complex einsum (constant operand first in ``sub``); ai=None means
    the tensor is real-valued. Complex product via 3-mult Karatsuba."""
    if ai is None:
        return _dot3(sub, wr, ar), _dot3(sub, wi, ar)
    p1 = _dot3(sub, wr, ar)
    p2 = _dot3(sub, wi, ai)
    p3 = _dot3(sub, wr + wi, ar + ai)
    return p1 - p2, p3 - p1 - p2


def _cdot_rhs(sub, ar, ai, wr, wi):
    """complex einsum, constant matrix second in ``sub`` (Karatsuba)."""
    p1 = _dot3(sub, ar, wr)
    p2 = _dot3(sub, ai, wi)
    p3 = _dot3(sub, ar + ai, wr + wi)
    return p1 - p2, p3 - p1 - p2


# ---------------------------------------------------------------------------
# kernel bodies (operate on squeezed 2-d blocks)
# ---------------------------------------------------------------------------
def _shear_rows_body(c, coords, WPr, WPi, WQr, WQi, Tr, Ti, kv,
                     xr, xi, outr, outi, *, N, n2lo, n2hi, m2lo, m2hi):
    """Shear along the LAST axis (x): rows transform independently.

    x: (RB, (n2hi-n2lo)*Q) planar; out: (RB, (m2hi-m2lo)*Q); c: (1,1)
    SMEM shear coefficient; coords: (RB, 1) row coordinate (row - N/2).
    """
    n2sel = n2hi - n2lo
    m2sel = m2hi - m2lo
    RB = coords.shape[0]

    P = N // _Q
    X_r = xr[:].reshape(RB, n2sel, _Q)
    X_i = None if xi is None else xi[:].reshape(RB, n2sel, _Q)

    WPf_r = WPr[:, n2lo:n2hi]
    WPf_i = WPi[:, n2lo:n2hi]
    A_r, A_i = _cdot("kn,rnq->rkq", WPf_r, WPf_i, X_r, X_i)
    T_r = Tr[:][None]
    T_i = Ti[:][None]
    A_r, A_i = _cmul(A_r, A_i, T_r, T_i)

    # heavy stages as plain (RB*P, Q) @ (Q, Q) MXU matmuls
    Z_r, Z_i = _cmm(A_r.reshape(RB * P, _Q), A_i.reshape(RB * P, _Q),
                    WQr[:], WQi[:])
    Z_r = Z_r.reshape(RB, P, _Q)
    Z_i = Z_i.reshape(RB, P, _Q)

    shift = c * coords[:]                            # (RB, 1)
    ph_r, ph_i = _phase(shift[:, :, None], kv[:][None], N)
    Z_r, Z_i = _cmul(Z_r, Z_i, ph_r, ph_i)

    # inverse: conj(WQ) = (WQr, -WQi); conj(WP)[band]/N ; conj(T)
    B_r, B_i = _cmm(Z_r.reshape(RB * P, _Q), Z_i.reshape(RB * P, _Q),
                    WQr[:], -WQi[:])
    B_r = B_r.reshape(RB, P, _Q)
    B_i = B_i.reshape(RB, P, _Q)
    B_r, B_i = _cmul(B_r, B_i, T_r, -T_i)

    WPb_r = WPr[m2lo:m2hi, :] * (1.0 / N)
    WPb_i = WPi[m2lo:m2hi, :] * (-1.0 / N)
    O_r, O_i = _cdot("nk,rkq->rnq", WPb_r, WPb_i, B_r, B_i)
    outr[:] = O_r.reshape(RB, m2sel * _Q)
    if outi is not None:
        outi[:] = O_i.reshape(RB, m2sel * _Q)


def _shear_cols_body(c, coords, WPr, WPi, WQr, WQi, Tr, Ti, kv,
                     xr, xi, outr, outi, *, N, n2lo, n2hi, m2lo, m2hi):
    """Shear along the FIRST (sublane) axis (y): columns independent.

    x: ((n2hi-n2lo)*Q, CB) planar; out: ((m2hi-m2lo)*Q, CB);
    coords: (1, CB) column coordinate (col - N/2).
    """
    n2sel = n2hi - n2lo
    m2sel = m2hi - m2lo
    CB = coords.shape[1]

    P = N // _Q
    # fold and move the transform axis to lanes: (n2, c, n1)
    X_r = jnp.swapaxes(xr[:].reshape(n2sel, _Q, CB), 1, 2)
    X_i = None if xi is None else jnp.swapaxes(
        xi[:].reshape(n2sel, _Q, CB), 1, 2)

    WPf_r = WPr[:, n2lo:n2hi]
    WPf_i = WPi[:, n2lo:n2hi]
    A_r, A_i = _cdot("kn,ncq->kcq", WPf_r, WPf_i, X_r, X_i)
    T_r = Tr[:][:, None, :]
    T_i = Ti[:][:, None, :]
    A_r, A_i = _cmul(A_r, A_i, T_r, T_i)

    Z_r, Z_i = _cmm(A_r.reshape(P * CB, _Q), A_i.reshape(P * CB, _Q),
                    WQr[:], WQi[:])
    Z_r = Z_r.reshape(P, CB, _Q)
    Z_i = Z_i.reshape(P, CB, _Q)

    shift = c * coords[:]                            # (1, CB)
    ph_r, ph_i = _phase(shift[:, :, None], kv[:][:, None, :], N)
    Z_r, Z_i = _cmul(Z_r, Z_i, ph_r, ph_i)

    B_r, B_i = _cmm(Z_r.reshape(P * CB, _Q), Z_i.reshape(P * CB, _Q),
                    WQr[:], -WQi[:])
    B_r = B_r.reshape(P, CB, _Q)
    B_i = B_i.reshape(P, CB, _Q)
    B_r, B_i = _cmul(B_r, B_i, T_r, -T_i)

    WPb_r = WPr[m2lo:m2hi, :] * (1.0 / N)
    WPb_i = WPi[m2lo:m2hi, :] * (-1.0 / N)
    O_r, O_i = _cdot("nk,kcq->ncq", WPb_r, WPb_i, B_r, B_i)
    # back to (rows, cols)
    outr[:] = jnp.swapaxes(O_r, 1, 2).reshape(m2sel * _Q, CB)
    if outi is not None:
        outi[:] = jnp.swapaxes(O_i, 1, 2).reshape(m2sel * _Q, CB)


class _Squeezed:
    """View of a (1, A, B) block ref as (A, B) for the kernel bodies."""

    def __init__(self, ref):
        self._ref = ref
        self.shape = ref.shape[1:]

    def __getitem__(self, idx):
        assert idx == slice(None)
        return self._ref[0]

    def __setitem__(self, idx, val):
        assert idx == slice(None)
        self._ref[0] = val


class _Loaded:
    """Constant ref wrapper: loads eagerly, supports static slicing."""

    def __init__(self, ref):
        self._ref = ref
        self.shape = ref.shape

    def __getitem__(self, idx):
        return self._ref[:].__getitem__(idx) if idx != slice(None) \
            else self._ref[:]


def _run_shear(body, grid, in_specs, out_specs, out_shapes, ins,
               real_in, real_out, interpret):
    def wrapped(c_ref, q_ref, *refs):
        w = [_Loaded(r) for r in refs[:7]]
        refs = refs[7:]
        n_in = 1 if real_in else 2
        xr_ = _Squeezed(refs[0])
        xi_ = None if real_in else _Squeezed(refs[1])
        or_ = _Squeezed(refs[n_in])
        oi_ = None if real_out else _Squeezed(refs[n_in + 1])
        c = c_ref[pl.program_id(0), 0]
        body(c, q_ref, *w, xr_, xi_, or_, oi_)

    return pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ins)


def _const_specs(N):
    P = N // _Q
    shapes = [(P, P), (P, P), (_Q, _Q), (_Q, _Q), (P, _Q), (P, _Q),
              (P, _Q)]
    return [pl.BlockSpec(s, lambda *_: (0,) * len(s),
                         memory_space=pltpu.VMEM) for s in shapes]


def _shear_x(xr, xi, coef, row0, N, n2lo, n2hi, m2lo, m2hi,
             real_out=False, rb=64, interpret=False):
    """x-shear of (B, R, (n2hi-n2lo)*Q) planar bands."""
    B, R, in_w = xr.shape
    real_in = xi is None
    n_rb = -(-R // rb)
    Rp = n_rb * rb
    if Rp != R:
        padr = ((0, 0), (0, Rp - R), (0, 0))
        xr = jnp.pad(xr, padr)
        xi = None if real_in else jnp.pad(xi, padr)
    out_w = (m2hi - m2lo) * _Q
    coords = (np.arange(Rp, dtype=np.float32) + row0 - N / 2).reshape(Rp, 1)

    body = functools.partial(_shear_rows_body, N=N, n2lo=n2lo, n2hi=n2hi,
                             m2lo=m2lo, m2hi=m2hi)

    tensor_spec = pl.BlockSpec((1, rb, in_w), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((rb, 1), lambda b, r: (r, 0), memory_space=pltpu.VMEM),
        *_const_specs(N),
        tensor_spec,
    ]
    if not real_in:
        in_specs.append(tensor_spec)
    out_spec = pl.BlockSpec((1, rb, out_w), lambda b, r: (b, r, 0),
                            memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((B, Rp, out_w), jnp.float32)]
    out_specs = [out_spec]
    if not real_out:
        out_shapes.append(jax.ShapeDtypeStruct((B, Rp, out_w), jnp.float32))
        out_specs.append(out_spec)

    ins = [coef.reshape(B, 1).astype(jnp.float32), jnp.asarray(coords),
           *(jnp.asarray(c) for c in _consts(N)), xr]
    if not real_in:
        ins.append(xi)

    out = _run_shear(body, (B, n_rb), in_specs, out_specs, out_shapes, ins,
                     real_in, real_out, interpret)
    res = [o if Rp == R else o[:, :R] for o in out]
    return (res[0], None) if real_out else (res[0], res[1])


def _shear_y(xr, xi, coef, N, n2lo, n2hi, m2lo, m2hi,
             real_out=False, cb=128, interpret=False):
    """y-shear of (B, (n2hi-n2lo)*Q, C) planar bands."""
    B, in_h, C = xr.shape
    real_in = xi is None
    n_cb = -(-C // cb)
    coords = (np.arange(C, dtype=np.float32) - N / 2).reshape(1, C)
    out_h = (m2hi - m2lo) * _Q

    body = functools.partial(_shear_cols_body, N=N, n2lo=n2lo, n2hi=n2hi,
                             m2lo=m2lo, m2hi=m2hi)

    tensor_spec = pl.BlockSpec((1, in_h, cb), lambda b, cblk: (b, 0, cblk),
                               memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, cb), lambda b, cblk: (0, cblk),
                     memory_space=pltpu.VMEM),
        *_const_specs(N),
        tensor_spec,
    ]
    if not real_in:
        in_specs.append(tensor_spec)
    out_spec = pl.BlockSpec((1, out_h, cb), lambda b, cblk: (b, 0, cblk),
                            memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((B, out_h, C), jnp.float32)]
    out_specs = [out_spec]
    if not real_out:
        out_shapes.append(jax.ShapeDtypeStruct((B, out_h, C), jnp.float32))
        out_specs.append(out_spec)

    ins = [coef.reshape(B, 1).astype(jnp.float32), jnp.asarray(coords),
           *(jnp.asarray(c) for c in _consts(N)), xr]
    if not real_in:
        ins.append(xi)

    out = _run_shear(body, (B, n_cb), in_specs, out_specs, out_shapes, ins,
                     real_in, real_out, interpret)
    return (out[0], None) if real_out else (out[0], out[1])


# ---------------------------------------------------------------------------
# full rotation pipeline
# ---------------------------------------------------------------------------
def rotate_fft_exact_fused(frames, angles, pad_y, py0, px0, cy0, cy1,
                           cx0, cx1, interpret=False):
    """The reference-exact 4x-padded 3-shear rotation (same math as
    ``ops.fft.rotate_fft_exact_pruned``) as three fused Pallas shears.

    frames: (B, y, y) float32, even square, with
    ``fused_shear_supported(y, pad_y)`` true. The zero canvas never
    exists in HBM: shear inputs/outputs are fold-tile-aligned occupied
    bands only.
    """
    frames = jnp.asarray(frames, jnp.float32)
    B, y, x = frames.shape
    N = pad_y
    if not fused_shear_supported(y, N):
        raise ValueError("unsupported geometry for the fused shear path")

    angles = jnp.asarray(angles, jnp.float32) % 360.0
    d = angles % 90.0
    dangle_gt = jnp.where(d > 45.0, d - 90.0, d)
    use_rot = angles > 45.0
    k = jnp.where(use_rot, jnp.rint(angles / 90.0),
                  0.0).astype(jnp.int32) % 4
    dangle = jnp.where(use_rot, dangle_gt, angles)

    def _quad(km, fr):
        return jax.lax.switch(km, [lambda a: a,
                                   lambda a: jnp.rot90(a, 1),
                                   lambda a: jnp.rot90(a, 2),
                                   lambda a: jnp.rot90(a, 3)], fr)

    rot = jax.vmap(_quad)(k, frames)
    dy = jnp.asarray([0, 1, 1, 0])[k]
    dx = jnp.asarray([0, 0, 1, 1])[k]

    a = jnp.tan(jnp.deg2rad(dangle) / 2)
    b = -jnp.sin(jnp.deg2rad(dangle))

    # fold-tile-aligned bands (slab rows/cols carry the +1 shift room)
    rn2lo, rn2hi = py0 // _Q, -(-(py0 + y + 1) // _Q)
    cn2lo, cn2hi = px0 // _Q, -(-(px0 + y + 1) // _Q)
    on2lo, on2hi = cy0 // _Q, -(-cy1 // _Q)
    ox2lo, ox2hi = cx0 // _Q, -(-cx1 // _Q)

    band_h = (rn2hi - rn2lo) * _Q
    band_w = (cn2hi - cn2lo) * _Q

    slab = jnp.zeros((B, band_h, band_w), jnp.float32)

    def _place(sl, fr, dyi, dxi):
        return jax.lax.dynamic_update_slice(
            sl, fr, (py0 - rn2lo * _Q + dyi, px0 - cn2lo * _Q + dxi))

    work = jax.vmap(_place)(slab, rot, dy, dx)

    # shear 1 (x): slab rows; input band = occupied cols, full-x output
    s1r, s1i = _shear_x(work, None, a, row0=rn2lo * _Q, N=N,
                        n2lo=cn2lo, n2hi=cn2hi, m2lo=0, m2hi=N // _Q,
                        interpret=interpret)

    # shear 2 (y): occupied row band in, crop row band out
    s2r, s2i = _shear_y(s1r, s1i, b, N=N, n2lo=rn2lo, n2hi=rn2hi,
                        m2lo=on2lo, m2hi=on2hi, interpret=interpret)

    r_off = cy0 - on2lo * _Q
    s2r = jax.lax.slice_in_dim(s2r, r_off, r_off + (cy1 - cy0), axis=1)
    s2i = jax.lax.slice_in_dim(s2i, r_off, r_off + (cy1 - cy0), axis=1)

    # shear 3 (x): full x in, crop x band out, real part only
    s3r, _ = _shear_x(s2r, s2i, a, row0=cy0, N=N,
                      n2lo=0, n2hi=N // _Q, m2lo=ox2lo, m2hi=ox2hi,
                      real_out=True, interpret=interpret)

    c_off = cx0 - ox2lo * _Q
    out = jax.lax.slice_in_dim(s3r, c_off, c_off + (cx1 - cx0), axis=2)
    return out.astype(frames.dtype)
