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

Performance notes (per-stage ablations on v5e): the MXU passes are
essentially free (overlapped) — in-kernel time is VPU elementwise work.
Three measures attack it:

* **separable phase**: the shift phase factors exactly as
  ``exp(-2pi i s kv/N) = u[k2] * v[k1]`` with ``kv = P*k1s + k2``
  (k1s the *signed* lane frequency), so the per-element trig over the
  whole spectrum collapses to P+Q small trig evaluations per row plus
  two cheap complex multiplies.
* **K-concat small stages**: the P-point DFT stages have contraction
  depth <= 16; the 3-pass bf16 split is packed along the contraction
  dim (``[xh, xh, xl]`` against ``[wh, wl, wh]``) so each complex
  output needs ONE MXU pass (K_eff = 6P <= 128) instead of nine, with
  the split results stored straight into a stacked VMEM scratch.
* **pre-split heavy weights**: the 128-deep stages use host-presplit
  bf16 hi/lo weight tables and a naive 4-mult complex product — more
  (free) MXU passes, fewer VPU splits and adds than Karatsuba.

Numerics: matmul DFTs at f32 are slightly *more* accurate than XLA's
f32 FFT vs a float64 oracle (measured 3.1e-5 vs 6.1e-5 max abs on a
unit-variance 2048^2 spectrum). ``tests/test_pallas_shear.py`` asserts
agreement with the jnp.fft reference path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rotate_fft_exact_fused", "rotate_fft_small_fused",
           "rotate_fft_exact_fused3", "rotate_fft_small_fused3",
           "fused_shear_supported", "fused_small_supported"]

_Q = 128          # inner fold length (lane-friendly)
_TWO_PI = 2.0 * np.pi


def fused_shear_supported(y, pad_y):
    """The fused path handles even square frames whose padded canvas
    folds as N = P*Q with Q=128 and 6P <= 128 (all power-of-two sizes
    >= 64 up to 2048-wide canvases)."""
    return y % 2 == 0 and pad_y % _Q == 0 and pad_y // _Q <= 16


def _bsplit(a):
    """numpy f32/f64 -> (hi, lo) bf16 pair with a ~= hi + lo (host-side)."""
    import ml_dtypes

    a = np.asarray(a, np.float32)
    hi = a.astype(ml_dtypes.bfloat16)
    lo = (a - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


@functools.lru_cache(maxsize=None)
def _consts(N, n2lo, n2hi, m2lo, m2hi, real_in, real_out):
    """Host-built tables for one shear geometry.

    Returns a dict of numpy arrays:
      sfw_r/sfw_i: stacked fwd small-stage weights (P, 3*n2sel) for real
        input or (P, 6*n2sel) for complex input (K-concat 3-pass layout)
      hw: presplit heavy weights (WQ fwd + conj inv), 8x (Q, Q) bf16
      t_r/t_i: twiddle (P, Q) f32
      siw_r/siw_i: stacked inv small-stage weights (m2sel, 6*P) bf16,
        1/N folded in (siw_i absent when real_out)
      idxp: (1, P) f32 unsigned k2 indices
      idxq: (1, Q) f32 SIGNED k1 frequencies
    """
    P = N // _Q
    n2sel = n2hi - n2lo
    m2sel = m2hi - m2lo
    k2 = np.arange(P)
    n1 = np.arange(_Q)
    WP = np.exp(-2j * np.pi * np.outer(k2, k2) / P)
    WQ = np.exp(-2j * np.pi * np.outer(n1, n1) / _Q)
    T = np.exp(-2j * np.pi * np.outer(k2, n1) / N)

    out = {}
    # ---- fwd small stage: A[k2] = sum_n2 WP[k2, n2lo+n2] x[n2] ----
    wf = WP[:, n2lo:n2hi]
    frh, frl = _bsplit(wf.real)
    fih, fil = _bsplit(wf.imag)
    if real_in:
        # S1 = [xh, xh, xl]
        out["sfw_r"] = np.concatenate([frh, frl, frh], axis=1)
        out["sfw_i"] = np.concatenate([fih, fil, fih], axis=1)
    else:
        # S1 = [xrh, xrh, xrl, xih, xih, xil]
        out["sfw_r"] = np.concatenate(
            [frh, frl, frh, -fih, -fil, -fih], axis=1)
        out["sfw_i"] = np.concatenate(
            [fih, fil, fih, frh, frl, frh], axis=1)

    # ---- heavy stages: presplit WQ (fwd) and conj(WQ) (inv) ----
    qrh, qrl = _bsplit(WQ.real)
    qih, qil = _bsplit(WQ.imag)
    out["hw"] = (qrh, qrl, qih, qil)          # inv uses (qrh, qrl, -qih, -qil)

    out["t_r"] = np.ascontiguousarray(T.real, np.float32)
    out["t_i"] = np.ascontiguousarray(T.imag, np.float32)

    # ---- inv small stage: O[n] = (1/N) sum_k2 conj(WP)[n+m2lo, k2] B[k2]
    wb = np.conj(WP)[m2lo:m2hi, :] / N
    brh, brl = _bsplit(wb.real)
    bih, bil = _bsplit(wb.imag)
    # S2 = [Brh, Brh, Brl, Bih, Bih, Bil]
    out["siw_r"] = np.concatenate([brh, brl, brh, -bih, -bil, -bih], axis=1)
    if not real_out:
        out["siw_i"] = np.concatenate([bih, bil, bih, brh, brl, brh], axis=1)

    out["idxp"] = np.arange(P, dtype=np.float32).reshape(1, P)
    out["idxq"] = (((np.arange(_Q) + _Q // 2) % _Q) - _Q // 2
                   ).astype(np.float32).reshape(1, _Q)
    return out


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _split(a):
    """Split f32 into bf16 high + bf16 low parts (a ~= hi + lo)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _trig(shift, idx, denom):
    """cos/sin of -2*pi*shift*idx/denom with exact f32 range reduction.

    ``idx`` and ``floor(shift)`` are integer-valued f32 with
    |floor(shift)*idx| < 2^24, so the integer product reduces mod
    ``denom`` exactly; the fractional product stays <= |idx|/denom.
    """
    si = jnp.floor(shift)
    sf = shift - si                              # exact in f32
    cyc = jnp.mod(si * idx, denom) * (1.0 / denom) + sf * (idx / denom)
    th = (-_TWO_PI) * (cyc - jnp.rint(cyc))
    return jnp.cos(th), jnp.sin(th)


def _cmm_ns(ar, ai, hw):
    """complex (M, Q) @ WQ-ish via naive 4-mult with presplit weights.

    12 bf16 MXU passes (overlapped/free on TPU), only two data splits.
    """
    wrh, wrl, wih, wil = hw
    mm = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)

    arh, arl = _split(ar)
    aih, ail = _split(ai)

    def d3(xh, xl, yh, yl):
        return mm(xh, yh) + mm(xh, yl) + mm(xl, yh)

    rr = d3(arh, arl, wrh, wrl)
    ii = d3(aih, ail, wih, wil)
    ri = d3(arh, arl, wih, wil)
    ir = d3(aih, ail, wrh, wrl)
    return rr - ii, ri + ir


def _stack_fwd(scr, xr, xi, n2sel):
    """Write split input pieces into the stacked K-concat scratch.

    Slot layout along the leading (contraction) axis is [hi, hi, lo]
    per part, pairing with the weight stack [wh, wl, wh] built in
    ``_consts`` to realize the 3-pass xh*wh + xh*wl + xl*wh in a
    single MXU pass.
    """
    xrh, xrl = _split(xr)
    scr[0 * n2sel:1 * n2sel] = xrh
    scr[1 * n2sel:2 * n2sel] = xrh
    scr[2 * n2sel:3 * n2sel] = xrl
    if xi is not None:
        xih, xil = _split(xi)
        scr[3 * n2sel:4 * n2sel] = xih
        scr[4 * n2sel:5 * n2sel] = xih
        scr[5 * n2sel:6 * n2sel] = xil


# ---------------------------------------------------------------------------
# kernel bodies (operate on squeezed 2-d blocks)
# ---------------------------------------------------------------------------
def _shear_rows_body(c, coords, sfw_r, sfw_i, qrh, qrl, qih, qil,
                     t_r, t_i, siw_r, siw_i, idxp, idxq,
                     xr, xi, outr, outi, s1, s2,
                     *, N, n2lo, n2hi, m2lo, m2hi):
    """Shear along the LAST axis (x): rows transform independently.

    x: (RB, (n2hi-n2lo)*Q) planar; out: (RB, (m2hi-m2lo)*Q); c: (1,1)
    SMEM shear coefficient; coords: (RB, 1) row coordinate (row - N/2).
    s1: (RB, 3or6*n2sel, Q) bf16 scratch; s2: (RB, 6*P, Q) bf16 scratch.
    """
    n2sel = n2hi - n2lo
    m2sel = m2hi - m2lo
    RB = coords.shape[0]
    P = N // _Q
    real_in = xi is None

    X_r = xr[:].reshape(RB, n2sel, _Q)
    X_i = None if real_in else xi[:].reshape(RB, n2sel, _Q)

    # fwd small stage: stacked K-concat, one MXU pass per output part
    _stack_fwd_rows(s1, X_r, X_i, n2sel)
    e = functools.partial(jnp.einsum, "kn,rnq->rkq",
                          preferred_element_type=jnp.float32)
    A_r = e(sfw_r[:], s1[:])
    A_i = e(sfw_i[:], s1[:])

    # twiddle
    A_r, A_i = _cmul(A_r, A_i, t_r[:][None], t_i[:][None])

    # heavy fwd: (RB*P, Q) @ WQ
    hw = (qrh[:], qrl[:], qih[:], qil[:])
    Z_r, Z_i = _cmm_ns(A_r.reshape(RB * P, _Q), A_i.reshape(RB * P, _Q), hw)
    Z_r = Z_r.reshape(RB, P, _Q)
    Z_i = Z_i.reshape(RB, P, _Q)

    # separable phase: u over k2 (unsigned /N), v over signed k1 (/Q)
    shift = c * coords[:]                        # (RB, 1)
    u_r, u_i = _trig(shift, idxp[:], float(N))   # (RB, P)
    v_r, v_i = _trig(shift, idxq[:], float(_Q))  # (RB, Q)
    Z_r, Z_i = _cmul(Z_r, Z_i, u_r[:, :, None], u_i[:, :, None])
    Z_r, Z_i = _cmul(Z_r, Z_i, v_r[:, None, :], v_i[:, None, :])

    # heavy inv: conj weights
    hwc = (qrh[:], qrl[:], -qih[:], -qil[:])
    B_r, B_i = _cmm_ns(Z_r.reshape(RB * P, _Q), Z_i.reshape(RB * P, _Q), hwc)
    B_r = B_r.reshape(RB, P, _Q)
    B_i = B_i.reshape(RB, P, _Q)
    B_r, B_i = _cmul(B_r, B_i, t_r[:][None], -t_i[:][None])

    # inv small stage: stacked K-concat (conj(WP)/N folded into weights)
    _stack_inv_rows(s2, B_r, B_i, P)
    ei = functools.partial(jnp.einsum, "nk,rkq->rnq",
                           preferred_element_type=jnp.float32)
    O_r = ei(siw_r[:], s2[:])
    outr[:] = O_r.reshape(RB, m2sel * _Q)
    if outi is not None:
        O_i = ei(siw_i[:], s2[:])
        outi[:] = O_i.reshape(RB, m2sel * _Q)


def _stack_fwd_rows(scr, xr, xi, n2sel):
    """Row-body variant of :func:`_stack_fwd` (stack on axis 1)."""
    xrh, xrl = _split(xr)
    scr[:, 0 * n2sel:1 * n2sel] = xrh
    scr[:, 1 * n2sel:2 * n2sel] = xrh
    scr[:, 2 * n2sel:3 * n2sel] = xrl
    if xi is not None:
        xih, xil = _split(xi)
        scr[:, 3 * n2sel:4 * n2sel] = xih
        scr[:, 4 * n2sel:5 * n2sel] = xih
        scr[:, 5 * n2sel:6 * n2sel] = xil


def _stack_inv_rows(scr, br, bi, P):
    brh, brl = _split(br)
    scr[:, 0 * P:1 * P] = brh
    scr[:, 1 * P:2 * P] = brh
    scr[:, 2 * P:3 * P] = brl
    bih, bil = _split(bi)
    scr[:, 3 * P:4 * P] = bih
    scr[:, 4 * P:5 * P] = bih
    scr[:, 5 * P:6 * P] = bil


def _shear_cols_body(c, coords, sfw_r, sfw_i, qrh, qrl, qih, qil,
                     t_r, t_i, siw_r, siw_i, idxp, idxq,
                     xr, xi, outr, outi, s1, s2,
                     *, N, n2lo, n2hi, m2lo, m2hi):
    """Shear along the FIRST (sublane) axis (y): columns independent.

    x: ((n2hi-n2lo)*Q, CB) planar; out: ((m2hi-m2lo)*Q, CB);
    coords: (1, CB) column coordinate (col - N/2).
    s1: (3or6*n2sel, CB, Q) bf16; s2: (6*P, CB, Q) bf16.
    """
    n2sel = n2hi - n2lo
    m2sel = m2hi - m2lo
    CB = coords.shape[1]
    P = N // _Q
    real_in = xi is None

    # fold and move the transform axis to lanes: (n2, c, n1)
    X_r = jnp.swapaxes(xr[:].reshape(n2sel, _Q, CB), 1, 2)
    X_i = None if real_in else jnp.swapaxes(
        xi[:].reshape(n2sel, _Q, CB), 1, 2)

    _stack_fwd(s1, X_r, X_i, n2sel)
    e = functools.partial(jnp.einsum, "kn,ncq->kcq",
                          preferred_element_type=jnp.float32)
    A_r = e(sfw_r[:], s1[:])
    A_i = e(sfw_i[:], s1[:])

    A_r, A_i = _cmul(A_r, A_i, t_r[:][:, None, :], t_i[:][:, None, :])

    hw = (qrh[:], qrl[:], qih[:], qil[:])
    Z_r, Z_i = _cmm_ns(A_r.reshape(P * CB, _Q), A_i.reshape(P * CB, _Q), hw)
    Z_r = Z_r.reshape(P, CB, _Q)
    Z_i = Z_i.reshape(P, CB, _Q)

    shift = c * coords[:]                           # (1, CB)
    u_r, u_i = _trig(shift.reshape(CB, 1), idxp[:], float(N))   # (CB, P)
    v_r, v_i = _trig(shift.reshape(CB, 1), idxq[:], float(_Q))  # (CB, Q)
    u_r = jnp.swapaxes(u_r, 0, 1)[:, :, None]       # (P, CB, 1)
    u_i = jnp.swapaxes(u_i, 0, 1)[:, :, None]
    Z_r, Z_i = _cmul(Z_r, Z_i, u_r, u_i)
    Z_r, Z_i = _cmul(Z_r, Z_i, v_r[None], v_i[None])

    hwc = (qrh[:], qrl[:], -qih[:], -qil[:])
    B_r, B_i = _cmm_ns(Z_r.reshape(P * CB, _Q), Z_i.reshape(P * CB, _Q), hwc)
    B_r = B_r.reshape(P, CB, _Q)
    B_i = B_i.reshape(P, CB, _Q)
    B_r, B_i = _cmul(B_r, B_i, t_r[:][:, None, :], -t_i[:][:, None, :])

    _stack_fwd(s2, B_r, B_i, P)
    ei = functools.partial(jnp.einsum, "nk,kcq->ncq",
                           preferred_element_type=jnp.float32)
    O_r = ei(siw_r[:], s2[:])
    outr[:] = jnp.swapaxes(O_r, 1, 2).reshape(m2sel * _Q, CB)
    if outi is not None:
        O_i = ei(siw_i[:], s2[:])
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


class _SqueezedScratch:
    """View of a (A, B, C) scratch ref supporting leading-axis slices."""

    def __init__(self, ref):
        self._ref = ref
        self.shape = ref.shape

    def __getitem__(self, idx):
        return self._ref[idx]

    def __setitem__(self, idx, val):
        self._ref[idx] = val


class _Loaded:
    """Constant ref wrapper: loads eagerly, supports static slicing."""

    def __init__(self, ref):
        self._ref = ref
        self.shape = ref.shape

    def __getitem__(self, idx):
        return self._ref[:].__getitem__(idx) if idx != slice(None) \
            else self._ref[:]


def _run_shear(body, grid, in_specs, out_specs, out_shapes, scratch_shapes,
               ins, real_in, real_out, n_const, interpret):
    def wrapped(c_ref, q_ref, *refs):
        w = [_Loaded(r) for r in refs[:n_const]]
        if real_out:
            w.insert(n_const - 2, None)        # siw_i slot
        refs = refs[n_const:]
        n_in = 1 if real_in else 2
        n_out = 1 if real_out else 2
        xr_ = _Squeezed(refs[0])
        xi_ = None if real_in else _Squeezed(refs[1])
        or_ = _Squeezed(refs[n_in])
        oi_ = None if real_out else _Squeezed(refs[n_in + 1])
        s1 = _SqueezedScratch(refs[n_in + n_out])
        s2 = _SqueezedScratch(refs[n_in + n_out + 1])
        c = c_ref[pl.program_id(0), 0]
        body(c, q_ref, *w, xr_, xi_, or_, oi_, s1, s2)

    return pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ins)


def _const_arrays(N, n2lo, n2hi, m2lo, m2hi, real_in, real_out):
    """Ordered constant tensors + their VMEM BlockSpecs."""
    cst = _consts(N, n2lo, n2hi, m2lo, m2hi, real_in, real_out)
    arrs = [cst["sfw_r"], cst["sfw_i"], *cst["hw"], cst["t_r"], cst["t_i"],
            cst["siw_r"]]
    if not real_out:
        arrs.append(cst["siw_i"])
    arrs += [cst["idxp"], cst["idxq"]]
    specs = [pl.BlockSpec(a.shape, lambda *_, _nd=a.ndim: (0,) * _nd,
                          memory_space=pltpu.VMEM) for a in arrs]
    return [jnp.asarray(a) for a in arrs], specs


def _shear_x(xr, xi, coef, row0, N, n2lo, n2hi, m2lo, m2hi,
             real_out=False, rb=64, interpret=False):
    """x-shear of (B, R, (n2hi-n2lo)*Q) planar bands."""
    B, R, in_w = xr.shape
    real_in = xi is None
    n2sel = n2hi - n2lo
    P = N // _Q
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

    consts, const_specs = _const_arrays(N, n2lo, n2hi, m2lo, m2hi,
                                        real_in, real_out)
    tensor_spec = pl.BlockSpec((1, rb, in_w), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((rb, 1), lambda b, r: (r, 0), memory_space=pltpu.VMEM),
        *const_specs,
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

    s1_k = (3 if real_in else 6) * n2sel
    scratch_shapes = [pltpu.VMEM((rb, s1_k, _Q), jnp.bfloat16),
                      pltpu.VMEM((rb, 6 * P, _Q), jnp.bfloat16)]

    ins = [coef.reshape(B, 1).astype(jnp.float32), jnp.asarray(coords),
           *consts, xr]
    if not real_in:
        ins.append(xi)

    out = _run_shear(body, (B, n_rb), in_specs, out_specs, out_shapes,
                     scratch_shapes, ins, real_in, real_out,
                     len(consts), interpret)
    res = [o if Rp == R else o[:, :R] for o in out]
    return (res[0], None) if real_out else (res[0], res[1])


def _shear_y(xr, xi, coef, N, n2lo, n2hi, m2lo, m2hi,
             real_out=False, cb=128, interpret=False):
    """y-shear of (B, (n2hi-n2lo)*Q, C) planar bands."""
    B, in_h, C = xr.shape
    real_in = xi is None
    n2sel = n2hi - n2lo
    P = N // _Q
    n_cb = -(-C // cb)
    coords = (np.arange(C, dtype=np.float32) - N / 2).reshape(1, C)
    out_h = (m2hi - m2lo) * _Q

    body = functools.partial(_shear_cols_body, N=N, n2lo=n2lo, n2hi=n2hi,
                             m2lo=m2lo, m2hi=m2hi)

    consts, const_specs = _const_arrays(N, n2lo, n2hi, m2lo, m2hi,
                                        real_in, real_out)
    tensor_spec = pl.BlockSpec((1, in_h, cb), lambda b, cblk: (b, 0, cblk),
                               memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, cb), lambda b, cblk: (0, cblk),
                     memory_space=pltpu.VMEM),
        *const_specs,
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

    s1_k = (3 if real_in else 6) * n2sel
    scratch_shapes = [pltpu.VMEM((s1_k, cb, _Q), jnp.bfloat16),
                      pltpu.VMEM((6 * P, cb, _Q), jnp.bfloat16)]

    ins = [coef.reshape(B, 1).astype(jnp.float32), jnp.asarray(coords),
           *consts, xr]
    if not real_in:
        ins.append(xi)

    out = _run_shear(body, (B, n_cb), in_specs, out_specs, out_shapes,
                     scratch_shapes, ins, real_in, real_out,
                     len(consts), interpret)
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

    from .fft import decompose_rotation, quad_rot90

    k, dangle = decompose_rotation(angles)
    rot = jax.vmap(quad_rot90)(k, frames)
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


# ---------------------------------------------------------------------------
# canvas-resident fused 3-shear rotation (one kernel, zero intermediate HBM)
# ---------------------------------------------------------------------------
class _Val:
    """Concrete-value stand-in for the bodies' ref protocol."""

    def __init__(self, v):
        self._v = v
        self.shape = v.shape

    def __getitem__(self, idx):
        return self._v if idx == slice(None) else self._v[idx]


class _View:
    """Slice view of a (possibly leading-1) VMEM ref. ``rs``/``cs`` may
    be static slices or ``pl.ds`` dynamic slices (sublane-dim loops)."""

    def __init__(self, ref, rs, cs, lead=None, shape=None):
        self._ref, self._rs, self._cs, self._lead = ref, rs, cs, lead
        self.shape = shape

    def __getitem__(self, idx):
        assert idx == slice(None)
        if self._lead is None:
            return self._ref[self._rs, self._cs]
        return self._ref[self._lead, self._rs, self._cs]

    def __setitem__(self, idx, val):
        assert idx == slice(None)
        if self._lead is None:
            self._ref[self._rs, self._cs] = val
        else:
            self._ref[self._lead, self._rs, self._cs] = val


class _PartialRows:
    """Leading-rows view of a scratch ref (ragged last row block)."""

    def __init__(self, ref, n):
        self._ref, self._n = ref, n
        self.shape = (n,) + tuple(ref.shape[1:])

    def _fix(self, idx):
        if idx == slice(None):
            return slice(0, self._n)
        if isinstance(idx, tuple):
            assert idx[0] == slice(None)
            return (slice(0, self._n),) + tuple(idx[1:])
        return idx

    def __getitem__(self, idx):
        return self._ref[self._fix(idx)]

    def __setitem__(self, idx, val):
        self._ref[self._fix(idx)] = val


def _stage_consts(N, n2lo, n2hi, m2lo, m2hi, real_in, real_out):
    """(ordered arrays, views builder) for one shear geometry."""
    cst = _consts(N, n2lo, n2hi, m2lo, m2hi, real_in, real_out)
    arrs = [cst["sfw_r"], cst["sfw_i"], *cst["hw"], cst["t_r"], cst["t_i"],
            cst["siw_r"]]
    if not real_out:
        arrs.append(cst["siw_i"])
    arrs += [cst["idxp"], cst["idxq"]]
    return arrs


def _coords_val(start, size, center):
    """(size, 1) f32 row coordinates start+i-center via iota (exact:
    integer-valued f32 below 2^24; Mosaic only supports integer iota).
    ``start`` may be a traced scalar (fori-loop block offset)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (size, 1), 0)
    off = jnp.asarray(start, jnp.float32) - jnp.float32(center)
    return _Val(i.astype(jnp.float32) + off)


def _fused3_call(work, acoef, bcoef, N, bands, out_h, out_w, interpret=False):
    """One Pallas kernel running all three shears of the [LAR97] rotation
    with the canvas bands resident in VMEM — intermediates never touch
    HBM (the two per-shear HBM round-trips of the split kernels are
    ~84 MB/frame at the 512^2 exact geometry).

    work : (B, in_h, in_w) f32 — the occupied input row/col band.
    bands = (rn2lo, rn2hi, cn2lo, cn2hi, on2lo, on2hi, ox2lo, ox2hi, cy0)
    out : (B, out_h, out_w) f32 — rows [cy0, cy0+out_h) x col fold band
    [ox2lo*Q, ox2hi*Q) of the rotated canvas (caller slices columns).
    """
    B, in_h, in_w = work.shape
    (rn2lo, rn2hi, cn2lo, cn2hi, on2lo, on2hi, ox2lo, ox2hi, cy0) = bands
    P = N // _Q
    c_n2sel = cn2hi - cn2lo
    r_n2sel = rn2hi - rn2lo
    ob_h = (on2hi - on2lo) * _Q
    r_off = cy0 - on2lo * _Q

    # block sizes chosen to keep the PROGRAM small (the remote Mosaic
    # compiler OOMs past ~a dozen shear-body instantiations): stages 1/3
    # run ONE body inside a fori_loop over dynamic sublane blocks; stage
    # 2 (lane blocks — dynamic lane offsets are not sliceable) unrolls
    # statically at a wide cb
    rb1 = 128
    cb = 512 if N % 512 == 0 else (256 if N % 256 == 0 else _Q)
    rb3 = 128
    n_rb1 = in_h // rb1
    assert in_h % rb1 == 0, (in_h, rb1)   # band heights are Q-multiples
    n_cb = N // cb
    n_rb3 = out_h // rb3
    tail3 = out_h - n_rb3 * rb3

    c1 = _stage_consts(N, cn2lo, cn2hi, 0, P, True, False)
    c2 = _stage_consts(N, rn2lo, rn2hi, on2lo, on2hi, False, False)
    c3 = _stage_consts(N, 0, P, ox2lo, ox2hi, False, True)
    consts = [jnp.asarray(a) for a in (*c1, *c2, *c3)]
    const_specs = [pl.BlockSpec(a.shape, lambda *_, _nd=a.ndim: (0,) * _nd,
                                memory_space=pltpu.VMEM) for a in consts]
    n1, n2, n3 = len(c1), len(c2), len(c3)

    def kernel(aref, bref, *refs):
        cw1 = [_Loaded(r) for r in refs[:n1]]
        cw2 = [_Loaded(r) for r in refs[n1:n1 + n2]]
        cw3 = [_Loaded(r) for r in refs[n1 + n2:n1 + n2 + n3]]
        cw3.insert(n3 - 2, None)                     # siw_i slot (real_out)
        (in_ref, out_ref, C1r, C1i, C2r, C2i,
         sA, sB, sC, sD, sE, sF) = refs[n1 + n2 + n3:]

        g = pl.program_id(0)
        a = aref[g, 0]
        bc = bref[g, 0]

        # stage 1: x-shear of the input band rows -> C1 (full width);
        # ONE body instantiation, fori over dynamic sublane blocks
        def stage1(i, carry):
            r0 = i * rb1
            rs = pl.ds(r0, rb1)
            _shear_rows_body(
                a, _coords_val(rn2lo * _Q + r0, rb1, N / 2), *cw1,
                _View(in_ref, rs, slice(None), lead=0, shape=(rb1, in_w)),
                None,
                _View(C1r, rs, slice(None)), _View(C1i, rs, slice(None)),
                sA, sB,
                N=N, n2lo=cn2lo, n2hi=cn2hi, m2lo=0, m2hi=P)
            return carry

        jax.lax.fori_loop(0, n_rb1, stage1, 0)

        # stage 2: y-shear of C1 column blocks -> C2 (crop fold band);
        # lane-dim blocks cannot use dynamic offsets, so unroll at a
        # wide cb
        for i in range(n_cb):
            cs = slice(i * cb, (i + 1) * cb)
            ic = jax.lax.broadcasted_iota(jnp.int32, (1, cb), 1)
            _shear_cols_body(
                bc, _Val(ic.astype(jnp.float32) + jnp.float32(i * cb - N / 2)),
                *cw2,
                _View(C1r, slice(None), cs, shape=(in_h, cb)),
                _View(C1i, slice(None), cs, shape=(in_h, cb)),
                _View(C2r, slice(None), cs), _View(C2i, slice(None), cs),
                sC, sD,
                N=N, n2lo=rn2lo, n2hi=rn2hi, m2lo=on2lo, m2hi=on2hi)

        # stage 3: x-shear of the crop rows -> real output col band;
        # fori over full blocks + one static ragged tail
        def stage3(i, carry):
            r0 = i * rb3
            _shear_rows_body(
                a, _coords_val(cy0 + r0, rb3, N / 2), *cw3,
                _View(C2r, pl.ds(r_off + r0, rb3), slice(None),
                      shape=(rb3, N)),
                _View(C2i, pl.ds(r_off + r0, rb3), slice(None),
                      shape=(rb3, N)),
                _View(out_ref, pl.ds(r0, rb3), slice(None), lead=0),
                None,
                sE, sF,
                N=N, n2lo=0, n2hi=P, m2lo=ox2lo, m2hi=ox2hi)
            return carry

        if n_rb3 > 0:                 # fori bodies trace even for 0 trips
            jax.lax.fori_loop(0, n_rb3, stage3, 0)
        if tail3:
            r0 = n_rb3 * rb3
            _shear_rows_body(
                a, _coords_val(cy0 + r0, tail3, N / 2), *cw3,
                _View(C2r, slice(r_off + r0, r_off + r0 + tail3),
                      slice(None), shape=(tail3, N)),
                _View(C2i, slice(r_off + r0, r_off + r0 + tail3),
                      slice(None), shape=(tail3, N)),
                _View(out_ref, slice(r0, r0 + tail3), slice(None), lead=0),
                None,
                _PartialRows(sE, tail3), _PartialRows(sF, tail3),
                N=N, n2lo=0, n2hi=P, m2lo=ox2lo, m2hi=ox2hi)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        *const_specs,
        pl.BlockSpec((1, in_h, in_w), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec((1, out_h, out_w), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    scratch_shapes = [
        pltpu.VMEM((in_h, N), jnp.float32),          # C1r
        pltpu.VMEM((in_h, N), jnp.float32),          # C1i
        pltpu.VMEM((ob_h, N), jnp.float32),          # C2r
        pltpu.VMEM((ob_h, N), jnp.float32),          # C2i
        pltpu.VMEM((rb1, 3 * c_n2sel, _Q), jnp.bfloat16),   # sA
        pltpu.VMEM((rb1, 6 * P, _Q), jnp.bfloat16),         # sB
        pltpu.VMEM((6 * r_n2sel, cb, _Q), jnp.bfloat16),    # sC
        pltpu.VMEM((6 * P, cb, _Q), jnp.bfloat16),          # sD
        pltpu.VMEM((rb3, 6 * P, _Q), jnp.bfloat16),         # sE
        pltpu.VMEM((rb3, 6 * P, _Q), jnp.bfloat16),         # sF
    ]

    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((B, out_h, out_w), jnp.float32),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(acoef.reshape(B, 1).astype(jnp.float32),
      bcoef.reshape(B, 1).astype(jnp.float32), *consts, work)


def rotate_fft_exact_fused3(frames, angles, pad_y, py0, px0, cy0, cy1,
                            cx0, cx1, interpret=False):
    """Canvas-resident single-kernel variant of
    :func:`rotate_fft_exact_fused`: the three shears run back-to-back in
    VMEM, so the complex intermediates never round-trip HBM."""
    frames = jnp.asarray(frames, jnp.float32)
    B, y, x = frames.shape
    N = pad_y
    if not fused_shear_supported(y, N):
        raise ValueError("unsupported geometry for the fused shear path")

    from .fft import decompose_rotation, quad_rot90

    k, dangle = decompose_rotation(angles)
    rot = jax.vmap(quad_rot90)(k, frames)
    dy = jnp.asarray([0, 1, 1, 0])[k]
    dx = jnp.asarray([0, 0, 1, 1])[k]

    a = jnp.tan(jnp.deg2rad(dangle) / 2)
    b = -jnp.sin(jnp.deg2rad(dangle))

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

    bands = (rn2lo, rn2hi, cn2lo, cn2hi, on2lo, on2hi, ox2lo, ox2hi, cy0)
    out = _fused3_call(work, a, b, N, bands, cy1 - cy0,
                       (ox2hi - ox2lo) * _Q, interpret=interpret)
    c_off = cx0 - ox2lo * _Q
    out = jax.lax.slice_in_dim(out, c_off, c_off + (cx1 - cx0), axis=2)
    return out.astype(frames.dtype)


def rotate_fft_small_fused3(cube, angles, interpret=False):
    """Canvas-resident single-kernel variant of
    :func:`rotate_fft_small_fused` (speed mode, full canvas bands)."""
    cube = jnp.asarray(cube, jnp.float32)
    B, N, _x = cube.shape
    if not fused_small_supported(N):
        raise ValueError("unsupported canvas for the fused small path")
    P = N // _Q

    from .fft import decompose_rotation, quad_rot90

    k, dangle = decompose_rotation(angles)
    ext = jnp.zeros((B, N + 1, N + 1), cube.dtype).at[:, :-1, :-1].set(cube)
    work = jax.vmap(quad_rot90)(k, ext)[:, :-1, :-1]

    a = jnp.tan(jnp.deg2rad(dangle) / 2)
    b = -jnp.sin(jnp.deg2rad(dangle))

    bands = (0, P, 0, P, 0, P, 0, P, 0)
    return _fused3_call(work, a, b, N, bands, N, N,
                        interpret=interpret).astype(cube.dtype)


def fused_small_supported(pad_to):
    """Speed-mode canvases the fused kernels accept: fold as P*128."""
    return pad_to % _Q == 0 and pad_to // _Q <= 16


def rotate_fft_small_fused(cube, angles, interpret=False):
    """Speed-mode 3-shear rotation of a full (already padded) canvas as
    fused Pallas shears — the kernel-space analog of
    ``ops.fft.rotate_fft_fast_batch`` (same rotation math, final
    imaginary residue dropped at the real-part output).

    cube: (B, N, N) float32 with ``fused_small_supported(N)``; rotation
    center (N/2, N/2) as in the exact path. Intended for the
    ``rot_mode='fft-small'`` pipeline where the frame was FoV-masked and
    padded onto a wrap-free 1.25x+ canvas.
    """
    cube = jnp.asarray(cube, jnp.float32)
    B, N, _ = cube.shape
    if not fused_small_supported(N):
        raise ValueError("unsupported canvas for the fused small path")
    P = N // _Q

    from .fft import decompose_rotation, quad_rot90

    k, dangle = decompose_rotation(angles)

    # rot90 about the (N/2, N/2) center of the even canvas == rot90 of
    # the (N+1)^2 zero-extended canvas, cropped back (cf. rotate_fft)
    ext = jnp.zeros((B, N + 1, N + 1), cube.dtype).at[:, :-1, :-1].set(cube)
    work = jax.vmap(quad_rot90)(k, ext)[:, :-1, :-1]

    a = jnp.tan(jnp.deg2rad(dangle) / 2)
    b = -jnp.sin(jnp.deg2rad(dangle))

    s1r, s1i = _shear_x(work, None, a, row0=0, N=N,
                        n2lo=0, n2hi=P, m2lo=0, m2hi=P, interpret=interpret)
    s2r, s2i = _shear_y(s1r, s1i, b, N=N, n2lo=0, n2hi=P,
                        m2lo=0, m2hi=P, interpret=interpret)
    s3r, _ = _shear_x(s2r, s2i, a, row0=0, N=N,
                      n2lo=0, n2hi=P, m2lo=0, m2hi=P, real_out=True,
                      interpret=interpret)
    return s3r.astype(cube.dtype)
