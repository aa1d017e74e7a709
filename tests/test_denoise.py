"""Denoiser unit tests: closed-form posteriors and oracle parity."""
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from amp_sparc_spatialmodulation_tpu.ops import denoise


def _symbols(K):
    s = np.exp(2j * np.pi * np.arange(K) / K)
    return s / np.sqrt(np.mean(np.abs(s) ** 2))


@pytest.mark.parametrize("halve", [True, False])
def test_segmented_posterior_matches_oracle(halve):
    rng = np.random.default_rng(0)
    L, M, K, B = 6, 4, 4, 3
    symbols = _symbols(K)
    r = (rng.normal(size=(B, L * M)) + 1j * rng.normal(size=(B, L * M)))
    tau = rng.uniform(0.05, 0.5, size=(B, L * M))
    mean, var = denoise.segmented_posterior(
        jnp.asarray(r, jnp.complex64), jnp.asarray(tau, jnp.float32),
        jnp.asarray(symbols, jnp.complex64), L, M, halve_tau=halve)
    for b in range(B):
        m_ref, v_ref = oracle.segmented_denoiser(r[b], tau[b], symbols,
                                                 L, M, halve)
        np.testing.assert_allclose(np.asarray(mean[b]), m_ref, atol=2e-4)
        np.testing.assert_allclose(np.asarray(var[b]), v_ref, atol=2e-4)


def test_segmented_posterior_brute_force():
    """Posterior mean/var against explicit enumeration of the
    one-active-per-segment prior with Gaussian likelihood.

    With ``halve_tau=True`` (the BAMP/SCAMP calibration, `bamp.py:68`) the
    softmax ``exp(Re(r conj(s))/(tau/2))`` equals the exact posterior
    ``exp(2 Re(r conj(s))/tau)`` for constant-modulus alphabets — the
    unhalved VAMP form is a temperature-2 variant.
    """
    rng = np.random.default_rng(1)
    L, M, K = 1, 3, 2
    symbols = _symbols(K)
    tau = 0.3
    r = rng.normal(size=(1, L * M)) + 1j * rng.normal(size=(1, L * M))
    mean, var = denoise.segmented_posterior(
        jnp.asarray(r, jnp.complex64), tau,
        jnp.asarray(symbols, jnp.complex64), L, M, halve_tau=True)
    # enumeration: hypothesis (m, k) -> x has symbols[k] at position m
    logp = np.zeros((M, K))
    for m in range(M):
        for k in range(K):
            x = np.zeros(M, complex)
            x[m] = symbols[k]
            logp[m, k] = -np.sum(np.abs(r[0] - x) ** 2) / tau
    p = np.exp(logp - logp.max())
    p /= p.sum()
    mean_ref = np.zeros(M, complex)
    second = np.zeros(M)
    for m in range(M):
        for k in range(K):
            mean_ref[m] += p[m, k] * symbols[k]
            second[m] += p[m, k] * np.abs(symbols[k]) ** 2
    var_ref = second - np.abs(mean_ref) ** 2
    np.testing.assert_allclose(np.asarray(mean[0]), mean_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(var[0]), var_ref, atol=1e-4)


def test_bernoulli_mixture_brute_force():
    rng = np.random.default_rng(2)
    K = 4
    symbols = _symbols(K)
    Ps, P0 = 0.02, 0.92  # P0 = 1 - K*Ps
    cov = 0.2
    r = rng.normal(size=(2, 5)) + 1j * rng.normal(size=(2, 5))
    mean, var = denoise.bernoulli_mixture_posterior(
        jnp.asarray(r, jnp.complex64), cov,
        jnp.asarray(symbols, jnp.complex64), Ps, P0)
    # scalar enumeration: p(x=0) ~ P0*G0, p(x=s_k) ~ Ps*G(s_k)
    G0 = np.exp(-np.abs(r) ** 2 / cov)
    Gs = np.exp(-np.abs(r[..., None] - symbols) ** 2 / cov)
    norm = P0 * G0 + Ps * Gs.sum(-1)
    mean_ref = Ps * (symbols * Gs).sum(-1) / norm
    var_ref = Ps * (np.abs(symbols) ** 2 * Gs).sum(-1) / norm \
        - np.abs(mean_ref) ** 2
    np.testing.assert_allclose(np.asarray(mean), mean_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), var_ref, atol=1e-5)


def test_second_moment_variance_form():
    rng = np.random.default_rng(3)
    L, M, K = 2, 4, 2
    symbols = _symbols(K)
    r = rng.normal(size=(1, L * M)) + 1j * rng.normal(size=(1, L * M))
    _, var_sm = denoise.segmented_posterior(
        jnp.asarray(r, jnp.complex64), 0.4,
        jnp.asarray(symbols, jnp.complex64), L, M, halve_tau=False,
        variance="second_moment")
    mean, _ = denoise.segmented_posterior(
        jnp.asarray(r, jnp.complex64), 0.4,
        jnp.asarray(symbols, jnp.complex64), L, M, halve_tau=False)
    # var_sm = E[|x|^2] - |E x|^2 with E over the (m,k) posterior restricted
    # per element: check nonnegativity and shape only (formula parity is in
    # the decoder-level oracle tests).
    assert np.asarray(var_sm).shape == (1, L * M)
    assert np.all(np.asarray(var_sm) > -1e-6)


def test_shrink_ook_llr_form():
    # For OOK (symbols={1}), the LLR-form posterior must match the
    # Bernoulli-mixture posterior mean.
    rng = np.random.default_rng(4)
    Ps, P0 = 0.1, 0.9
    cov = 0.5
    r = (rng.normal(size=(1, 8)) * 0.5 + 0.5).astype(np.complex64)
    mean_llr, _ = denoise.shrink_ook(jnp.asarray(r), cov, Ps, P0)
    mean_bm, _ = denoise.bernoulli_mixture_posterior(
        jnp.asarray(r), cov, jnp.asarray([1.0 + 0j], jnp.complex64), Ps, P0)
    np.testing.assert_allclose(np.asarray(mean_llr).real,
                               np.asarray(mean_bm).real, atol=1e-4)


def test_sw_shrink_ook_segment_posterior():
    rng = np.random.default_rng(5)
    L, M = 3, 4
    r = jnp.asarray(rng.normal(size=(2, L * M)), jnp.complex64)
    mean, var = denoise.sw_shrink_ook(r, 0.3, L, M)
    assert mean.shape == (2, L * M) and var.shape == (2, L * M)
    m = np.asarray(mean).real
    assert np.all((m >= 0) & (m <= 1))
