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

__all__ = ["nndsvd_init", "nmf_fit", "nmf_transform"]


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
