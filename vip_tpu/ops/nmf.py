"""Device-native non-negative matrix factorization (multiplicative updates).

Replaces the reference's sklearn ``NMF(solver='mu')`` dependency
(vip_hci/psfsub/nmf_fullfr.py:423-436) with a jitted JAX implementation of
the exact same algorithm: NNDSVD(a) initialization from the device SVD,
Frobenius multiplicative updates with sklearn's epsilon guards and its
every-10-iterations relative-tolerance stopping rule — so results agree
with the reference to numerical tolerance while every matmul rides the MXU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = float(np.finfo(np.float32).eps)

__all__ = ["nndsvd_init", "nmf_fit", "nmf_transform",
           "nmf_patch_batched"]


def nndsvd_init(X, n_components, variant="nndsvda"):
    """NNDSVD(a) initialization (sklearn _initialize_nmf semantics)."""
    U, S, V = jnp.linalg.svd(X, full_matrices=False)
    U = U[:, :n_components]
    S = S[:n_components]
    V = V[:n_components]

    W = jnp.zeros((X.shape[0], n_components), X.dtype)
    H = jnp.zeros((n_components, X.shape[1]), X.dtype)
    W = W.at[:, 0].set(jnp.sqrt(S[0]) * jnp.abs(U[:, 0]))
    H = H.at[0, :].set(jnp.sqrt(S[0]) * jnp.abs(V[0, :]))

    def fill(j, WH):
        W, H = WH
        x = U[:, j]
        y = V[j, :]
        x_p = jnp.maximum(x, 0)
        y_p = jnp.maximum(y, 0)
        x_n = jnp.abs(jnp.minimum(x, 0))
        y_n = jnp.abs(jnp.minimum(y, 0))
        x_p_nrm = jnp.linalg.norm(x_p)
        y_p_nrm = jnp.linalg.norm(y_p)
        x_n_nrm = jnp.linalg.norm(x_n)
        y_n_nrm = jnp.linalg.norm(y_n)
        m_p = x_p_nrm * y_p_nrm
        m_n = x_n_nrm * y_n_nrm
        pos = m_p > m_n
        u = jnp.where(pos, x_p / jnp.where(x_p_nrm == 0, 1, x_p_nrm),
                      x_n / jnp.where(x_n_nrm == 0, 1, x_n_nrm))
        v = jnp.where(pos, y_p / jnp.where(y_p_nrm == 0, 1, y_p_nrm),
                      y_n / jnp.where(y_n_nrm == 0, 1, y_n_nrm))
        sigma = jnp.where(pos, m_p, m_n)
        lbd = jnp.sqrt(S[j] * sigma)
        W = W.at[:, j].set(lbd * u)
        H = H.at[j, :].set(lbd * v)
        return W, H

    W, H = jax.lax.fori_loop(1, n_components, fill, (W, H))

    eps = 1e-6
    W = jnp.where(W < eps, 0.0, W)
    H = jnp.where(H < eps, 0.0, H)
    if variant == "nndsvda":
        avg = X.mean()
        W = jnp.where(W == 0, avg, W)
        H = jnp.where(H == 0, avg, H)
    elif variant == "nndsvdar":
        # sklearn: zeros -> |avg * N(0,1) / 100| (different RNG stream here;
        # the reference treats nndsvdar frames as non-reproducible anyway,
        # its snapshot script keeps only their detections)
        avg = X.mean()
        kW, kH = jax.random.split(jax.random.PRNGKey(0))
        rW = jnp.abs(avg * jax.random.normal(kW, W.shape, X.dtype) / 100)
        rH = jnp.abs(avg * jax.random.normal(kH, H.shape, X.dtype) / 100)
        W = jnp.where(W == 0, rW, W)
        H = jnp.where(H == 0, rH, H)
    return W, H


def _mu_update_w(X, W, H):
    num = X @ H.T
    den = W @ (H @ H.T)
    den = jnp.where(den == 0, EPSILON, den)
    return W * (num / den)


def _mu_update_h(X, W, H):
    num = W.T @ X
    den = (W.T @ W) @ H
    den = jnp.where(den == 0, EPSILON, den)
    return H * (num / den)


def _frob_err(X, W, H):
    return jnp.linalg.norm(X - W @ H)


@functools.partial(jax.jit,
                   static_argnames=("n_components", "max_iter", "update_H",
                                    "variant"))
def _nmf_mu(X, n_components, max_iter=100, tol=1e-4, update_H=True,
            W0=None, H0=None, variant="nndsvda"):
    """Multiplicative-update NMF with sklearn's stopping rule."""
    if H0 is None or W0 is None:
        W, H = nndsvd_init(X, n_components, variant=variant)
    else:
        W, H = W0, H0

    error_at_init = _frob_err(X, W, H)

    def cond(state):
        W, H, it, prev_err, done = state
        return (~done) & (it < max_iter)

    def body(state):
        W, H, it, prev_err, done = state

        def one(i, WH):
            W, H = WH
            W = _mu_update_w(X, W, H)
            if update_H:
                H = _mu_update_h(X, W, H)
            return W, H

        # sklearn checks convergence every 10 iterations
        n_steps = jnp.minimum(10, max_iter - it)
        W, H = jax.lax.fori_loop(0, n_steps, one, (W, H))
        it = it + n_steps
        err = _frob_err(X, W, H)
        done = (prev_err - err) / error_at_init < tol
        return W, H, it, err, done

    W, H, it, err, done = jax.lax.while_loop(
        cond, body, (W, H, jnp.array(0), error_at_init, jnp.array(False))
    )
    return W, H, it


def nmf_fit(X, n_components, max_iter=100, tol=1e-4, init="nndsvda"):
    """Fit NMF: X ≈ W H with W, H >= 0. Returns (W, H, n_iter)."""
    X = jnp.asarray(X)
    if init in ("nndsvd", "nndsvda", "nndsvdar"):
        W, H, it = _nmf_mu(X, int(n_components), int(max_iter), tol,
                           update_H=True, variant=init)
    elif init == "random":
        # sklearn random init: avg * |N(0,1)|? -> sqrt(X.mean()/k) * randn
        key = jax.random.PRNGKey(0)
        avg = jnp.sqrt(X.mean() / n_components)
        kW, kH = jax.random.split(key)
        W0 = jnp.abs(avg * jax.random.normal(kW, (X.shape[0], n_components),
                                             X.dtype))
        H0 = jnp.abs(avg * jax.random.normal(kH, (n_components, X.shape[1]),
                                             X.dtype))
        W, H, it = _nmf_mu(X, int(n_components), int(max_iter), tol,
                           update_H=True, W0=W0, H0=H0)
    else:
        raise ValueError(f"init {init!r} not recognized")
    return W, H, it


def _nndsvd_init_masked(X, row_valid, n_valid, n_components, variant):
    """:func:`nndsvd_init` on a zero-row-padded library.

    Zero rows leave the SVD unchanged (svd([X; 0]) = [U; 0] S V), so the
    valid rows of W match the unpadded init exactly; the only places the
    padding could leak in are the mean (computed over valid entries
    only) and the zero-fill variants (gated to valid W rows so padding
    rows stay exactly zero — a zero W row is neutral in every MU
    update: it contributes nothing to W^T X or W^T W and stays zero
    under its own multiplicative update)."""
    U, S, V = jnp.linalg.svd(X, full_matrices=False)
    U = U[:, :n_components]
    S = S[:n_components]
    V = V[:n_components]

    W = jnp.zeros((X.shape[0], n_components), X.dtype)
    H = jnp.zeros((n_components, X.shape[1]), X.dtype)
    W = W.at[:, 0].set(jnp.sqrt(S[0]) * jnp.abs(U[:, 0]))
    H = H.at[0, :].set(jnp.sqrt(S[0]) * jnp.abs(V[0, :]))

    def fill(j, WH):
        W, H = WH
        x = U[:, j]
        y = V[j, :]
        x_p = jnp.maximum(x, 0)
        y_p = jnp.maximum(y, 0)
        x_n = jnp.abs(jnp.minimum(x, 0))
        y_n = jnp.abs(jnp.minimum(y, 0))
        x_p_nrm = jnp.linalg.norm(x_p)
        y_p_nrm = jnp.linalg.norm(y_p)
        x_n_nrm = jnp.linalg.norm(x_n)
        y_n_nrm = jnp.linalg.norm(y_n)
        m_p = x_p_nrm * y_p_nrm
        m_n = x_n_nrm * y_n_nrm
        pos = m_p > m_n
        u = jnp.where(pos, x_p / jnp.where(x_p_nrm == 0, 1, x_p_nrm),
                      x_n / jnp.where(x_n_nrm == 0, 1, x_n_nrm))
        v = jnp.where(pos, y_p / jnp.where(y_p_nrm == 0, 1, y_p_nrm),
                      y_n / jnp.where(y_n_nrm == 0, 1, y_n_nrm))
        sigma = jnp.where(pos, m_p, m_n)
        lbd = jnp.sqrt(S[j] * sigma)
        W = W.at[:, j].set(lbd * u)
        H = H.at[j, :].set(lbd * v)
        return W, H

    W, H = jax.lax.fori_loop(1, n_components, fill, (W, H))

    eps = 1e-6
    W = jnp.where(W < eps, 0.0, W)
    H = jnp.where(H < eps, 0.0, H)
    avg = X.sum() / (jnp.maximum(n_valid, 1) * X.shape[1])
    wrow = row_valid[:, None].astype(bool)
    if variant == "nndsvda":
        W = jnp.where((W == 0) & wrow, avg, W)
        H = jnp.where(H == 0, avg, H)
    elif variant == "nndsvdar":
        kW, kH = jax.random.split(jax.random.PRNGKey(0))
        rW = jnp.abs(avg * jax.random.normal(kW, W.shape, X.dtype) / 100)
        rH = jnp.abs(avg * jax.random.normal(kH, H.shape, X.dtype) / 100)
        W = jnp.where((W == 0) & wrow, rW, W)
        H = jnp.where(H == 0, rH, H)
    else:
        W = W * row_valid[:, None]
    return W, H


@functools.partial(jax.jit, static_argnames=("n_components", "max_iter",
                                             "variant"))
def nmf_patch_batched(X, row_valid, curr, n_components, max_iter=100,
                      tol=1e-4, variant="nndsvda"):
    """Per-frame NMF patch (fit library -> transform frame), batched.

    The reference's annular NMF runs one sklearn fit per (frame, annulus)
    patch in a fork pool (reference nmf_local.py:346-382). Here every
    frame of a segment is one batch row: libraries are zero-row-padded
    to a common L (exactly neutral — see _nndsvd_init_masked), the MU
    updates run as batched einsums, and sklearn's per-fit stopping rule
    is preserved by freezing each frame's (W, H) once its own
    every-10-iterations tolerance check fires.

    Parameters
    ----------
    X : (B, L, p) zero-row-padded per-frame libraries.
    row_valid : (B, L) 1.0 for real library rows, 0.0 for padding.
    curr : (B, p) the frame row to project (handle_neg pre-applied).
    n_components, max_iter, tol, variant : as in :func:`nmf_fit`.

    Returns
    -------
    recon : (B, p) reconstructions W1 @ H ; H_all : (B, k, p).
    """
    B = X.shape[0]
    n_valid = row_valid.sum(axis=1)
    W, H = jax.vmap(_nndsvd_init_masked,
                    in_axes=(0, 0, 0, None, None))(
        X, row_valid, n_valid, n_components, variant)

    bmm = functools.partial(jnp.einsum)

    def upd_w(X, W, H):
        num = bmm("blp,bkp->blk", X, H)
        den = bmm("blk,bkj->blj", W, bmm("bkp,bjp->bkj", H, H))
        den = jnp.where(den == 0, EPSILON, den)
        return W * (num / den)

    def upd_h(X, W, H):
        num = bmm("blk,blp->bkp", W, X)
        den = bmm("bkj,bjp->bkp", bmm("blk,blj->bkj", W, W), H)
        den = jnp.where(den == 0, EPSILON, den)
        return H * (num / den)

    def frob(X, W, H):
        R = X - bmm("blk,bkp->blp", W, H)
        return jnp.sqrt(jnp.sum(R * R, axis=(1, 2)))

    err0 = frob(X, W, H)

    def cond(state):
        _W, _H, it, _e, done = state
        return (~jnp.all(done)) & (it < max_iter)

    def body(state):
        W, H, it, prev_err, done = state
        keep = done[:, None, None]

        def one(_, WH):
            W, H = WH
            Wn = upd_w(X, W, H)
            Hn = upd_h(X, Wn, H)
            return (jnp.where(keep, W, Wn), jnp.where(keep, H, Hn))

        n_steps = jnp.minimum(10, max_iter - it)
        W, H = jax.lax.fori_loop(0, n_steps, one, (W, H))
        it = it + n_steps
        err = frob(X, W, H)
        done = done | ((prev_err - err) / jnp.where(err0 == 0, 1.0, err0)
                       < tol)
        return W, H, it, err, done

    W, H, _, _, _ = jax.lax.while_loop(
        cond, body, (W, H, jnp.array(0), err0, jnp.zeros(B, bool)))

    # transform: MU on W only, W0 = sqrt(mean(curr)/k) (sklearn semantics)
    avg = jnp.sqrt(jnp.maximum(curr.mean(axis=1), 0) / n_components)
    W1 = jnp.broadcast_to(avg[:, None, None],
                          (B, 1, n_components)).astype(X.dtype)
    Xc = curr[:, None, :]
    e1 = frob(Xc, W1, H)

    def cond_t(state):
        _W, it, _e, done = state
        return (~jnp.all(done)) & (it < max_iter)

    def body_t(state):
        W1, it, prev_err, done = state
        keep = done[:, None, None]

        def one(_, W):
            return jnp.where(keep, W, upd_w(Xc, W, H))

        n_steps = jnp.minimum(10, max_iter - it)
        W1 = jax.lax.fori_loop(0, n_steps, one, W1)
        it = it + n_steps
        err = frob(Xc, W1, H)
        done = done | ((prev_err - err) / jnp.where(e1 == 0, 1.0, e1) < tol)
        return W1, it, err, done

    W1, _, _, _ = jax.lax.while_loop(
        cond_t, body_t, (W1, jnp.array(0), e1, jnp.zeros(B, bool)))

    recon = bmm("blk,bkp->blp", W1, H)[:, 0]
    return recon, H


def nmf_transform(X, H, max_iter=100, tol=1e-4):
    """Project X onto fixed components H (sklearn NMF.transform semantics:
    W initialized to sqrt(mean(X)/k), MU updates on W only)."""
    X = jnp.asarray(X)
    H = jnp.asarray(H)
    n_components = H.shape[0]
    avg = jnp.sqrt(jnp.maximum(X.mean(), 0) / n_components)
    W0 = jnp.full((X.shape[0], n_components), avg, X.dtype)
    W, _, _ = _nmf_mu(X, int(n_components), int(max_iter), tol,
                      update_H=False, W0=W0, H0=H)
    return W
