"""Shrinkage / denoiser library — pure functions over (B, N) pseudo-data.

Capability parity with the reference's ``Shrink`` module
(``/root/reference/shrink.py``) plus the denoisers inlined in the decoders
(`bamp.py:66-97`, `vamp.py:96-119`, `vamp2.py:79-88`, `scamp.py:61-68`):

* :func:`segmented_posterior`   — softmax posterior over (antenna, symbol)
  per segment; the workhorse of BAMP/VAMP/SCAMP in segmented/sparc mode.
  Per-algorithm calibration differences are explicit flags: BAMP and SCAMP
  halve ``tau`` (`bamp.py:68`, `scamp.py:63`) while VAMP does not
  (`vamp.py:110` — commented out); the Rangan VAMP uses the second-moment
  variance form (`vamp2.py:87`) instead of the decomposed one
  (`bamp.py:74-76`).
* :func:`bernoulli_mixture_posterior` — i.i.d. Bernoulli-symbol-mixture
  posterior for ``random`` mode (`bamp.py:79-97`, `shrink.py:78-96`).
* :func:`shrink_with_derivative` — posterior mean + analytic derivative for
  scalar Onsager terms (`shrink.py:98-119`).
* :func:`lasso`                 — soft threshold (`shrink.py:121-137`).
* :func:`shrink_ook`            — LLR-form OOK posterior (`shrink.py:139-157`).
* :func:`sw_shrink_ook`         — segment-wise OOK softmax (`shrink.py:58-76`).

Numerics: the reference stabilizes its softmax by subtracting the GLOBAL
``x.abs().max()`` (`bamp.py:70`) — a constant shift that cancels exactly in
the normalized posterior.  We instead subtract the per-segment maximum,
which is mathematically identical but immune to cross-segment underflow;
overflow clamps follow ``regularize_exp`` (`shrink.py:163-166`).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EXP_MAX = float(np.log(np.finfo(np.float32).max)) - 1.0  # `shrink.py:163-166`
_TOL = 1e-9


def regularize_exp(a):
    """Clamp exponent arguments below float32 overflow (`shrink.py:163-166`)."""
    return jnp.minimum(a, _EXP_MAX)


def regularize_zero(a, tol=_TOL):
    """Replace exact zeros to avoid 0/0 (`shrink.py:159-161`)."""
    return jnp.where(a == 0.0, tol, a)


def segmented_posterior(r: jnp.ndarray, tau, symbols: jnp.ndarray,
                        L: int, M: int, *, halve_tau: bool,
                        variance: str | None = "decomposed",
                        ) -> Tuple[jnp.ndarray, jnp.ndarray | None]:
    """Posterior mean (and variance) under the one-active-per-segment prior.

    Args:
        r: pseudo-data, shape (B, N) with N = L*M, complex.
        tau: effective noise variance — scalar, (B, 1)-broadcastable, or
            per-element (B, N).
        symbols: (K,) complex symbol table.
        L, M: segment count / segment size.
        halve_tau: apply the ``tau/2`` calibration of BAMP/SCAMP
            (`bamp.py:68`, `scamp.py:63`).
        variance: None (mean only, `scamp.py:61-68`), "decomposed"
            (`bamp.py:74-76`), or "second_moment" (`vamp2.py:87`).

    Exp stabilization is the numerically proper PER-SEGMENT max.  The
    reference instead subtracts one ``x.abs().max()`` scalar per trial
    (`scamp.py:66`, `bamp.py:70`), which parks weak segments' etas in
    the CPU f32 subnormal range; the resulting quantization freezes
    weak-section posteriors early and is load-bearing for the published
    SCAMP 8PSK iteration counts (~15-20% below ours, FER matching).
    That behavior is unreproducible in kind on TPU: subnormals flush to
    zero (the literal global-max form NaNs out — measured meanT=cap,
    FER=1), and an explicit 2^-149-grid emulation perturbs the chaotic
    trajectory the other way (measured meanT 127 vs the reference 47 at
    the 8 dB point).  Documented divergence — see PARITY.md.

    Returns:
        (xmmse, var): (B, N) complex64 posterior mean and (B, N) float32
        posterior variance (or None when ``variance`` is None).
    """
    B = r.shape[0]
    K = symbols.shape[0]
    if K == 1:
        return _segmented_posterior_k1(r, tau, symbols, L, M,
                                       halve_tau=halve_tau,
                                       variance=variance)
    s = r.reshape(B, L, M, 1)
    tau = jnp.asarray(tau)
    tau_e = jnp.broadcast_to(tau, r.shape).reshape(B, L, M, 1)
    if halve_tau:
        tau_e = tau_e / 2.0
    # t[b,l,m,k] = Re( (r/tau) * conj(s_k) )
    t = ((s / tau_e) * jnp.conj(symbols)).real
    t = t - jax.lax.stop_gradient(jnp.max(t, axis=(2, 3), keepdims=True))
    eta = jnp.exp(regularize_exp(t))                       # (B, L, M, K)
    eta_mk = eta.sum(axis=-1)                              # (B, L, M)
    eta2 = eta_mk.sum(axis=2, keepdims=True)               # (B, L, 1)
    xmmse = (symbols * eta).sum(axis=-1) / eta2            # (B, L, M) complex
    out = xmmse.reshape(B, L * M)
    out = (out.astype(jnp.complex64) if jnp.iscomplexobj(r)
           else out.real.astype(jnp.float32))
    if variance is None:
        return out, None
    if variance == "decomposed":
        var0 = jnp.abs(xmmse) ** 2 * (1.0 - eta_mk / eta2)
        vars_ = (jnp.abs(xmmse[..., None] - symbols) ** 2 * eta
                 ).sum(axis=-1) / eta2
        var = var0 + vars_
    elif variance == "second_moment":
        var = ((jnp.abs(symbols) ** 2 * eta).sum(axis=-1) / eta2
               - jnp.abs(xmmse) ** 2)
    else:
        raise ValueError(f"unknown variance form {variance!r}")
    return out, var.reshape(B, L * M).astype(jnp.float32)


def _segmented_posterior_k1(r: jnp.ndarray, tau, symbols: jnp.ndarray,
                            L: int, M: int, *, halve_tau: bool,
                            variance: str | None):
    """Single-symbol (OOK-style) fast path of :func:`segmented_posterior`.

    Mathematically identical to the general ``K`` code with ``K == 1``, but
    every elementwise op runs on the flat ``(B, N)`` layout instead of
    ``(B, L, M, 1)`` — the trailing singleton puts the TPU lane dimension at
    width 1, wasting 127/128 of the VPU on every op (~2x BAMP iteration
    cost at the flagship config).  Only the per-segment max/sum reductions
    see the ``(B, L, M)`` view.
    """
    B = r.shape[0]
    s0 = symbols[0]
    tau_e = jnp.broadcast_to(jnp.asarray(tau), r.shape)
    if halve_tau:
        tau_e = tau_e / 2.0
    # t = Re( (r/tau) * conj(s0) )  on (B, N)
    t = ((r / tau_e) * jnp.conj(s0)).real
    seg_max = jax.lax.stop_gradient(
        jnp.max(t.reshape(B, L, M), axis=-1))              # (B, L)
    t = t - jnp.repeat(seg_max, M, axis=-1)
    eta = jnp.exp(regularize_exp(t))                       # (B, N)
    eta2 = jnp.repeat(eta.reshape(B, L, M).sum(axis=-1), M, axis=-1)
    post = eta / eta2                                      # (B, N) real
    xmmse = s0 * post
    out = (xmmse.astype(jnp.complex64) if jnp.iscomplexobj(r)
           else xmmse.real.astype(jnp.float32))
    if variance is None:
        return out, None
    abs_x2 = jnp.abs(xmmse) ** 2
    if variance == "decomposed":
        var = abs_x2 * (1.0 - post) + jnp.abs(xmmse - s0) ** 2 * post
    elif variance == "second_moment":
        var = jnp.abs(s0) ** 2 * post - abs_x2
    else:
        raise ValueError(f"unknown variance form {variance!r}")
    return out, var.astype(jnp.float32)


def bernoulli_mixture_posterior(r: jnp.ndarray, cov, symbols: jnp.ndarray,
                                Ps: float, P0: float,
                                with_variance: bool = True):
    """i.i.d. Bernoulli-symbol-mixture posterior (`bamp.py:79-97`).

    ``p(x) = P0*delta(x) + Ps*sum_k delta(x - s_k)`` with Gaussian likelihood
    of variance ``cov``.
    """
    cov = jnp.broadcast_to(jnp.asarray(cov), r.shape)
    d = r[..., None] - symbols                              # (..., K)
    Gs = jnp.exp(-regularize_exp(jnp.abs(d) ** 2 / cov[..., None]))
    G0 = jnp.exp(-regularize_exp(jnp.abs(r) ** 2 / cov))
    norm = regularize_zero(P0 * G0 + Ps * Gs.sum(axis=-1))
    mean = Ps * (symbols * Gs).sum(axis=-1) / norm
    mean = (mean.astype(jnp.complex64) if jnp.iscomplexobj(r)
            else mean.real.astype(jnp.float32))
    if not with_variance:
        return mean, None
    second = Ps * (jnp.abs(symbols) ** 2 * Gs).sum(axis=-1) / norm
    var = second - jnp.abs(mean) ** 2
    return mean, var.astype(jnp.float32)


def shrink_with_derivative(r: jnp.ndarray, cov, symbols: jnp.ndarray,
                           Ps: float, P0: float):
    """Posterior mean + analytic derivative for Onsager terms
    (`shrink.py:98-119`)."""
    cov = jnp.broadcast_to(jnp.asarray(cov), r.shape)

    def G(s):
        return jnp.exp(-regularize_exp(jnp.abs(r[..., None] - s) ** 2
                                       / cov[..., None]))

    def dG(s):
        return (2.0 * jnp.abs(r[..., None] - s)
                * jnp.sign((s - r[..., None]).real) / cov[..., None])

    G0 = jnp.exp(-regularize_exp(jnp.abs(r) ** 2 / cov))
    d0 = 2.0 * jnp.abs(r) * jnp.sign(-r.real) / cov
    Gs, ds = G(symbols), dG(symbols)
    dG0, dGs = d0 * G0, ds * Gs
    norm = P0 * G0 + Ps * Gs.sum(axis=-1) + _TOL
    mean = Ps * (symbols * Gs).sum(axis=-1) / norm
    dnorm = P0 * dG0 + Ps * dGs.sum(axis=-1)
    sdGs = Ps * (symbols * dGs).sum(axis=-1)
    der = (sdGs * norm - mean * dnorm) / norm ** 2
    return mean, der


def lasso(r: jnp.ndarray, cov, lmda: float = 1.0):
    """Soft-threshold shrinkage (`shrink.py:121-137`)."""
    F = jnp.sign(r.real) * jnp.maximum(jnp.abs(r), lmda * cov)
    G = cov * jnp.where(jnp.abs(r) < cov, 0.0, 1.0)
    return F, G


def shrink_ook(r: jnp.ndarray, cov, Ps: float, P0: float):
    """LLR-form OOK posterior mean + mean derivative (`shrink.py:139-157`)."""
    theta = float(np.log(P0 / Ps))
    eta = jnp.exp(regularize_exp(theta + (1.0 - 2.0 * r.real) / cov))
    mean = 1.0 / (1.0 + eta + _TOL)
    der = jnp.nan_to_num(2.0 * eta * mean ** 2 / cov, nan=0.0)
    return mean.astype(jnp.complex64), der.mean()


def sw_shrink_ook(r: jnp.ndarray, cov, L: int, M: int):
    """Segment-wise OOK softmax posterior (`shrink.py:58-76`)."""
    B = r.shape[0]
    cov = jnp.broadcast_to(jnp.asarray(cov), r.shape)
    Lr = ((2.0 * r.real - 1.0) / cov).reshape(B, L, M)
    exp_Lr = jnp.exp(regularize_exp(Lr))
    sum_exp = exp_Lr.sum(axis=-1, keepdims=True)
    Le = -jnp.log(jnp.maximum(sum_exp - exp_Lr, _TOL))
    Lx = Lr + Le
    eta = jnp.exp(regularize_exp(Lx))
    mean = eta / (1.0 + eta)
    var = mean * (1.0 - mean)
    return (mean.reshape(B, L * M).astype(jnp.complex64),
            var.reshape(B, L * M).astype(jnp.float32))
