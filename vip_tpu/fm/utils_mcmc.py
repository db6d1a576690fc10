"""MCMC convergence utilities (reference vip_hci/fm/utils_mcmc.py)."""

import numpy as np

__all__ = ["gelman_rubin", "gelman_rubin_from_chain", "autocorr",
           "autocorr_test"]


def gelman_rubin(x):
    """Gelman-Rubin R̂ between Markov chains (utils_mcmc.py:18-71)."""
    if np.shape(x) < (2,):
        raise ValueError("Gelman-Rubin diagnostic requires multiple chains "
                         "of the same length")
    m, n = np.shape(x)
    B_over_n = np.sum((np.mean(x, 1) - np.mean(x)) ** 2) / (m - 1)
    W = np.sum([(x[i] - xbar) ** 2 for i, xbar in
                enumerate(np.mean(x, 1))]) / (m * (n - 1))
    s2 = W * (n - 1) / n + B_over_n
    V = s2 + B_over_n / m
    return V / W


def gelman_rubin_from_chain(chain, burnin):
    """R̂ per parameter from a (walkers, steps, ndim) chain
    (utils_mcmc.py:74-103)."""
    dim = chain.shape[2]
    k = chain.shape[1]
    thr0 = int(np.floor(burnin * k))
    thr1 = int(np.floor((1 - burnin) * k * 0.25))
    rhat = np.zeros(dim)
    for j in range(dim):
        part1 = chain[:, thr0:thr0 + thr1, j].reshape((-1))
        part2 = chain[:, thr0 + 3 * thr1:thr0 + 4 * thr1, j].reshape((-1))
        series = np.vstack((part1, part2))
        rhat[j] = gelman_rubin(series)
    return rhat


def _next_pow_two(n):
    i = 1
    while i < n:
        i = i << 1
    return i


def autocorr_func_1d(x, norm=True):
    x = np.atleast_1d(x)
    if len(x.shape) != 1:
        raise ValueError("invalid dimensions for 1D autocorrelation function")
    n = _next_pow_two(len(x))
    f = np.fft.fft(x - np.mean(x), n=2 * n)
    acf = np.fft.ifft(f * np.conjugate(f))[: len(x)].real
    acf /= 4 * n
    if norm:
        acf /= acf[0]
    return acf


def _auto_window(taus, c):
    m = np.arange(len(taus)) < c * taus
    if np.any(m):
        return np.argmin(m)
    return len(taus) - 1


def autocorr(y, c=5.0):
    """Integrated autocorrelation time estimate (emcee recipe)."""
    f = np.zeros(y.shape[1])
    for yy in y:
        f += autocorr_func_1d(yy)
    f /= len(y)
    taus = 2.0 * np.cumsum(f) - 1.0
    window = _auto_window(taus, c)
    return taus[window]


def autocorr_test(chain):
    """tau/N — chain considered converged when below 1/ac_c."""
    N = chain.shape[1]
    tau = autocorr(chain)
    return tau / N


def next_pow_two(n):
    """Smallest power of two >= n (reference fm/utils_mcmc.py:106-110)."""
    return _next_pow_two(n)


def auto_window(taus, c):
    """Sokal auto-windowing for the integrated autocorrelation time
    (reference fm/utils_mcmc.py:131-135)."""
    return _auto_window(taus, c)
