"""Batched device solvers for LOCI's per-frame least-squares problems.

TPU rebuild of the solver kernel inside vip_hci/psfsub/loci.py:474-541
(`_leastsq_patch`) and :655-715 (`_leastsq_patch_ifs`). The reference
solves, for every frame i of a segment, ``min_x ||A_i^T x - b_i||`` where
``A_i = values_opt[ind_ref_i]`` is the similarity/PA-filtered reference
library — one host scipy call per frame (``scipy.linalg.lstsq`` /
``scipy.optimize.nnls`` / ``scipy.optimize.lsq_linear``).

Here the whole segment is ONE device program. All three solvers consume
only the segment Gram matrix ``G = F F^T`` (a single MXU matmul over the
optimisation pixels) plus per-frame boolean library masks; they are
vmapped over the frame axis:

- ``masked_lstsq_coeffs``: minimum-norm SVD lstsq with scipy's
  ``cond=tol`` cutoff, computed from the masked Gram's eigh (zero-padded
  library rows produce zero eigenvalues which fall under the cutoff, so
  masking leaves the solution of the dense subproblem intact).
- ``batched_nnls_coeffs``: Lawson–Hanson active-set NNLS on the normal
  equations (FNNLS, Bro & de Jong 1997) with ``lax.while_loop`` outer and
  inner loops; the active set is a boolean mask so every iteration is a
  fixed-shape ``(k, k)`` solve.
- ``batched_box_lsq_coeffs``: box-constrained [0, 1] least squares via
  projected FISTA with adaptive restart (the device equivalent of
  ``lsq_linear(bounds=(0, 1))``).

All functions return a dense (n, n) coefficient matrix with zeros outside
each frame's library mask, so the reconstruction of the whole segment is
one more matmul: ``recon = coeffs @ values``.
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ["masked_lstsq_coeffs", "batched_nnls_coeffs",
           "batched_box_lsq_coeffs", "loci_segment_residuals"]


def _masked_system(G, masks):
    """Per-frame masked normal-equation systems from the shared Gram.

    G : (n, n) Gram of the optimisation-segment pixel vectors.
    masks : (n, n) bool, masks[i, j] = frame j in frame i's library.
    Returns Gm (n, n, n) masked Grams and c (n, n) right-hand sides
    ``c[i] = masks[i] * G[:, i]`` (= A_i b_i zero-padded).
    """
    m = masks.astype(G.dtype)
    Gm = m[:, :, None] * G[None] * m[:, None, :]
    c = m * G.T  # c[i, j] = masks[i, j] * G[j, i]
    return Gm, c


def masked_lstsq_coeffs(G, masks, tol):
    """Batched minimum-norm lstsq with scipy's ``cond`` cutoff semantics.

    Solves every frame's ``lstsq(A_i^T, b_i, cond=tol)`` through the
    eigendecomposition of the masked Gram: singular values are
    ``sqrt(eigvals)`` and components with ``s <= tol * s_max`` are
    dropped (scipy.linalg.lstsq cond semantics, reference
    loci.py:520-522).
    """
    Gm, c = _masked_system(G, masks)
    lam, V = jnp.linalg.eigh(Gm)                      # (n, k), (n, k, k)
    lam = jnp.maximum(lam, 0.0)
    s = jnp.sqrt(lam)
    smax = jnp.max(s, axis=1, keepdims=True)
    keep = s > tol * smax
    inv = jnp.where(keep, 1.0 / jnp.where(lam == 0, 1.0, lam), 0.0)
    # x_i = V diag(inv) V^T c_i  (zeroed outside the library mask: the
    # solution lies in the masked subspace analytically, but the eigh
    # rotation reintroduces fp-level leakage)
    proj = jnp.einsum("nkj,nk->nj", V, c)             # V^T c
    x = jnp.einsum("nkj,nj->nk", V * inv[:, None, :], proj)
    return x * masks.astype(x.dtype)


def _nnls_one(G, c, allowed, max_outer):
    """Lawson–Hanson NNLS for one frame: min ||A^T x - b||, x >= 0,
    restricted to ``allowed`` indices. G = A A^T (full), c = A b."""
    k = G.shape[0]
    dtype = G.dtype
    eps = jnp.finfo(dtype).eps
    wtol = 10 * eps * jnp.maximum(jnp.max(jnp.abs(G)), 1.0) * k

    def solve_P(P):
        """Masked k×k solve of G[P,P] z_P = c[P]; z zero outside P."""
        Pf = P.astype(dtype)
        Gp = Pf[:, None] * G * Pf[None, :] + jnp.diag(1.0 - Pf)
        z = jnp.linalg.solve(Gp, Pf * c)
        return jnp.where(P, z, 0.0)

    def inner_cond(state):
        z, x, P, it = state
        return jnp.logical_and(jnp.any(jnp.logical_and(P, z <= 0)),
                               it < k + 1)

    def inner_body(state):
        z, x, P, it = state
        neg = jnp.logical_and(P, z <= 0)
        ratio = jnp.where(neg, x / jnp.where(x == z, 1.0, x - z), jnp.inf)
        alpha = jnp.min(ratio)
        x = x + alpha * (z - x)
        P = jnp.logical_and(P, x > eps)
        x = jnp.where(P, x, 0.0)
        return solve_P(P), x, P, it + 1

    def outer_cond(state):
        x, P, w, it = state
        cand = jnp.logical_and(allowed, jnp.logical_not(P))
        return jnp.logical_and(jnp.any(jnp.logical_and(cand, w > wtol)),
                               it < max_outer)

    def outer_body(state):
        x, P, w, it = state
        cand = jnp.logical_and(allowed, jnp.logical_not(P))
        j = jnp.argmax(jnp.where(cand, w, -jnp.inf))
        P = P.at[j].set(True)
        z = solve_P(P)
        z, x, P, _ = jax.lax.while_loop(inner_cond, inner_body,
                                        (z, x, P, 0))
        x = z
        w = c - G @ x
        return x, P, w, it + 1

    x0 = jnp.zeros(k, dtype)
    P0 = jnp.zeros(k, bool)
    x, _, _, _ = jax.lax.while_loop(outer_cond, outer_body,
                                    (x0, P0, c, 0))
    return x


def batched_nnls_coeffs(G, masks, max_outer=None):
    """Batched Lawson–Hanson NNLS over all frames of a segment
    (device replacement for per-frame scipy.optimize.nnls,
    reference loci.py:523-524)."""
    n = G.shape[0]
    if max_outer is None:
        max_outer = 3 * n
    c = masks.astype(G.dtype) * G.T
    return jax.vmap(lambda ci, mi: _nnls_one(G, ci, mi, max_outer))(c, masks)


def batched_box_lsq_coeffs(G, masks, lo=0.0, hi=1.0, block=500,
                           max_blocks=400, kkt_rtol=1e-12):
    """Batched box-constrained least squares via projected FISTA with
    adaptive restart (device equivalent of
    ``scipy.optimize.lsq_linear(A.T, b, bounds=(0, 1))``,
    reference loci.py:525-531).

    Speckle-cube Grams can be very ill-conditioned (κ ~ 1e7+), so the
    iteration is convergence-driven: FISTA runs in ``block``-step scans
    inside a ``while_loop`` until the worst per-frame KKT residual of the
    box-QP drops below ``kkt_rtol`` (relative to ``|c|``) or
    ``block * max_blocks`` steps elapse. Well-conditioned segments exit
    after a few blocks; the default budget (200k) covers κ ~ 1e8.
    """
    Gm, c = _masked_system(G, masks)
    # Lipschitz constant per frame: largest eigenvalue of the masked Gram
    L = jnp.maximum(jnp.linalg.eigvalsh(Gm)[:, -1],
                    jnp.finfo(G.dtype).tiny)
    mf = masks.astype(G.dtype)
    step = (1.0 / L)[:, None]
    cscale = jnp.maximum(jnp.max(jnp.abs(c)), jnp.finfo(G.dtype).tiny)

    def proj(x):
        return jnp.clip(x, lo, hi) * mf

    def fista_block(carry, _):
        x, y, t = carry
        grad = jnp.einsum("nij,nj->ni", Gm, y) - c
        x_new = proj(y - step * grad)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        mom = (t - 1.0) / t_new
        # adaptive restart (O'Donoghue & Candès): kill momentum when the
        # update opposes the previous direction, per frame
        restart = jnp.sum((y - x_new) * (x_new - x), axis=1) > 0
        y_new = jnp.where(restart[:, None], x_new,
                          x_new + mom[:, None] * (x_new - x))
        t_new = jnp.where(restart, 1.0, t_new)
        return (x_new, y_new, t_new), None

    def kkt_residual(x):
        g = jnp.einsum("nij,nj->ni", Gm, x) - c
        at_lo = x <= lo + 1e-14
        at_hi = x >= hi - 1e-14
        viol = jnp.where(at_lo, jnp.maximum(-g, 0.0),
                         jnp.where(at_hi, jnp.maximum(g, 0.0),
                                   jnp.abs(g)))
        return jnp.max(viol * mf)

    def cond(state):
        (x, _, _), it = state
        return jnp.logical_and(it < max_blocks,
                               kkt_residual(x) > kkt_rtol * cscale)

    def body(state):
        carry, it = state
        carry, _ = jax.lax.scan(fista_block, carry, None, length=block)
        return carry, it + 1

    x0 = jnp.zeros_like(c)
    (x, _, _), _ = jax.lax.while_loop(cond, body, ((x0, x0, jnp.ones(
        c.shape[0], G.dtype)), 0))
    return x


@functools.partial(jax.jit, static_argnames=("solver",))
def loci_segment_residuals(values, values_opt, masks, tol, solver="lstsq"):
    """One whole LOCI segment on device: Gram build, batched per-frame
    solve, reconstruction and subtraction (reference loci.py:474-541).

    values : (n, p) subtraction-segment pixel matrix.
    values_opt : (n, p_opt) optimisation-segment pixel matrix.
    masks : (n, n) bool library masks (similarity + PA filtered).
    Returns (n, p) residuals ``values - coeffs @ values``.
    """
    G = values_opt @ values_opt.T
    if solver == "lstsq":
        coeffs = masked_lstsq_coeffs(G, masks, tol)
    elif solver == "nnls":
        coeffs = batched_nnls_coeffs(G, masks)
    elif solver == "lsq":
        coeffs = batched_box_lsq_coeffs(G, masks)
    else:
        raise ValueError("`solver` not recognized")
    return values - coeffs @ values
