"""Unit parity of the batched device LOCI solvers (ops/lsq_solvers.py)
against the scipy solvers the reference calls per frame
(vip_hci/psfsub/loci.py:520-531)."""

import numpy as np
import pytest
import scipy as sp

import jax.numpy as jnp

from vip_tpu.ops.lsq_solvers import (batched_box_lsq_coeffs,
                                     batched_nnls_coeffs,
                                     loci_segment_residuals,
                                     masked_lstsq_coeffs)


@pytest.fixture(scope="module")
def segment():
    """A random LOCI-like segment: frames × pixels with per-frame masks."""
    rng = np.random.default_rng(0)
    n, p, po = 25, 180, 420
    F = rng.standard_normal((n, p))
    Fo = rng.standard_normal((n, po)) + 2.0 * rng.standard_normal((1, po))
    masks = np.zeros((n, n), bool)
    for i in range(n):
        k = rng.integers(5, n - 1)
        sel = rng.choice([j for j in range(n) if j != i], size=k,
                         replace=False)
        masks[i, sel] = True
    return F, Fo, masks


@pytest.fixture(scope="module")
def ill_conditioned_segment():
    """Highly correlated frames (speckle-like, κ(G) ≳ 1e7)."""
    rng = np.random.default_rng(3)
    n, po = 20, 300
    base = rng.standard_normal(po)
    Fo = base[None] + 1e-3 * rng.standard_normal((n, po))
    masks = ~np.eye(n, dtype=bool)
    return Fo, masks


def test_masked_lstsq_matches_scipy(segment):
    F, Fo, masks = segment
    G = Fo @ Fo.T
    tol = 1e-2
    coeffs = np.asarray(masked_lstsq_coeffs(jnp.asarray(G),
                                            jnp.asarray(masks), tol))
    for i in range(F.shape[0]):
        ind = np.where(masks[i])[0]
        ref = sp.linalg.lstsq(Fo[ind].T, Fo[i], cond=tol)[0]
        np.testing.assert_allclose(coeffs[i, ind], ref, atol=1e-9)
        assert np.all(coeffs[i, ~masks[i]] == 0)


def test_batched_nnls_matches_scipy(segment):
    F, Fo, masks = segment
    G = Fo @ Fo.T
    coeffs = np.asarray(batched_nnls_coeffs(jnp.asarray(G),
                                            jnp.asarray(masks)))
    for i in range(F.shape[0]):
        ind = np.where(masks[i])[0]
        ref = sp.optimize.nnls(Fo[ind].T, Fo[i])[0]
        np.testing.assert_allclose(coeffs[i, ind], ref, atol=1e-8)
        assert np.all(coeffs[i] >= 0)


def test_box_lsq_matches_scipy_well_conditioned(segment):
    F, Fo, masks = segment
    G = Fo @ Fo.T
    coeffs = np.asarray(batched_box_lsq_coeffs(jnp.asarray(G),
                                               jnp.asarray(masks)))
    for i in range(F.shape[0]):
        ind = np.where(masks[i])[0]
        A, b = Fo[ind].T, Fo[i]
        ref = sp.optimize.lsq_linear(A, b, bounds=(0, 1),
                                     method="trf", lsq_solver="lsmr")["x"]
        # scipy stops at its default tolerance; agree to ~its accuracy
        # and never leave a higher objective than it does
        np.testing.assert_allclose(coeffs[i, ind], ref, atol=1e-4)
        cost_dev = 0.5 * np.sum((A @ coeffs[i, ind] - b) ** 2)
        cost_ref = 0.5 * np.sum((A @ ref - b) ** 2)
        assert cost_dev <= cost_ref * (1 + 1e-12) + 1e-12
        assert np.all((coeffs[i] >= 0) & (coeffs[i] <= 1))


def test_box_lsq_objective_dominates_scipy(ill_conditioned_segment):
    """On ill-conditioned speckle Grams scipy's trf/lsmr stops at its
    default tolerance; the device solver's objective must be at least as
    low for every frame."""
    Fo, masks = ill_conditioned_segment
    G = Fo @ Fo.T
    assert np.linalg.cond(G) > 1e6
    coeffs = np.asarray(batched_box_lsq_coeffs(jnp.asarray(G),
                                               jnp.asarray(masks)))
    for i in range(Fo.shape[0]):
        ind = np.where(masks[i])[0]
        A, b = Fo[ind].T, Fo[i]
        ref = sp.optimize.lsq_linear(A, b, bounds=(0, 1), method="trf",
                                     lsq_solver="lsmr")
        cost_dev = 0.5 * np.sum((A @ coeffs[i, ind] - b) ** 2)
        cost_ref = 0.5 * np.sum((A @ ref.x - b) ** 2)
        assert cost_dev <= cost_ref * (1 + 1e-12) + 1e-12


def test_segment_residuals_empty_mask_column_ignored(segment):
    """Frames excluded from every library contribute zero coefficients."""
    F, Fo, masks = segment
    masks = masks.copy()
    masks[:, 7] = False
    res = np.asarray(loci_segment_residuals(
        jnp.asarray(F), jnp.asarray(Fo), jnp.asarray(masks), 1e-2,
        solver="lstsq"))
    i = 2
    ind = np.where(masks[i])[0]
    ref = sp.linalg.lstsq(Fo[ind].T, Fo[i], cond=1e-2)[0]
    np.testing.assert_allclose(res[i], F[i] - ref @ F[ind], atol=1e-9)
