"""NumPy oracles: independent single-trial reimplementations of the
reference algorithms' math, used to cross-check the JAX decoders.

These mirror the update equations documented in SURVEY.md §2b (BAMP:
`bamp.py:48-64`; VAMP: `vamp.py:56-94`; SCAMP: `scamp.py:43-59`) as plain
NumPy loops at batch size 1 — the same cross-implementation-redundancy
oracle strategy the reference itself used (torch vs `sparc.py`, SURVEY §4).
"""
from __future__ import annotations

import numpy as np


def segmented_denoiser(r, tau, symbols, L, M, halve_tau):
    """Softmax posterior over (antenna, symbol) per segment; global-max
    stabilized like `bamp.py:66-77`."""
    K = len(symbols)
    s = r.reshape(L, M, 1)
    tau = np.broadcast_to(tau, r.shape).reshape(L, M, 1).copy()
    if halve_tau:
        tau = tau / 2.0
    t = np.real((s / tau) * np.conj(symbols))           # (L, M, K)
    eta = np.exp(t - np.abs(t).max())
    eta_mk = eta.sum(-1)                                # (L, M)
    eta2 = eta_mk.sum(-1, keepdims=True)                # (L, 1)
    xmmse = (symbols * eta).sum(-1) / eta2              # (L, M)
    var0 = np.abs(xmmse) ** 2 * (1 - eta_mk / eta2)
    vars_ = (np.abs(xmmse[..., None] - symbols) ** 2 * eta).sum(-1) / eta2
    return xmmse.reshape(-1), (var0 + vars_).reshape(-1)


def bamp(H, y, sigma2, symbols, L, M, n_iter, rtol=1e-5, atol=1e-8):
    """Single-trial BAMP with allclose early stop (`bamp.py:48-64,136-141`)."""
    n, N = H.shape
    adj = H.conj().T
    abs2 = np.abs(H) ** 2
    xmmse = np.zeros(N, complex)
    var = np.ones(N)
    z = y.copy()
    u = np.full(n, sigma2)
    xmap = None
    T = 0
    for t in range(n_iter):
        v = abs2 @ var
        z = H @ xmmse - v * (y - z) / u
        u = v + sigma2
        cov = 1.0 / (abs2.T @ (1.0 / u))
        xmap = xmmse + cov * (adj @ ((y - z) / u))
        var_prev = var
        xmmse, var = segmented_denoiser(xmap, cov, symbols, L, M,
                                        halve_tau=True)
        T = t + 1
        if np.all(np.abs(var - var_prev) <= atol + rtol * np.abs(var_prev)):
            break
    return xmap, xmmse, var, T


def vamp(U, s, Vh, y, sigma2, sparsity, symbols, L, M, n_iter,
         rtol=1e-5, atol=1e-8):
    """Single-trial Kuehn VAMP (`vamp.py:56-94,179-186`)."""
    p, N = Vh.shape
    V = Vh.conj().T
    y_tilde = s * (U.conj().T @ y)
    r_tilde = np.full(N, sparsity, complex)
    sigma2_tilde = sparsity ** 2 * (1 - sparsity) + (1 - sparsity) ** 2 * sparsity
    var = np.ones(N)
    eta = p / N
    r = np.zeros(N, complex)
    xmmse = np.zeros(N, complex)
    T = 0
    for t in range(n_iter):
        var_ratio = sigma2 / sigma2_tilde
        q = Vh @ r_tilde
        scale = 1.0 / (s ** 2 + var_ratio)
        x_sv = scale * (y_tilde + var_ratio * q)
        var_lmmse = scale.mean() * sigma2
        x_tilde = V @ (x_sv - q) + r_tilde
        x_tilde_var = eta * var_lmmse + (1 - eta) * sigma2_tilde
        alpha = np.clip(x_tilde_var / sigma2_tilde, 1e-5, 1 - 1e-5)
        r = (x_tilde - alpha * r_tilde) / (1 - alpha)
        sig2 = np.clip(alpha / (1 - alpha) * sigma2_tilde, 1e-9, 1e5)
        var_prev = var
        xmmse, var = segmented_denoiser(r, sig2, symbols, L, M,
                                        halve_tau=False)
        dxdr = np.clip(var.mean() / sig2, 1e-5, 1 - 1e-5)
        ns = 1.0 / (1.0 - dxdr)
        r_tilde = (xmmse - dxdr * r) * ns
        sigma2_tilde = float(np.clip(sig2 * dxdr * ns, 1e-9, 1e5))
        T = t + 1
        if np.all(np.abs(var - var_prev) <= atol + rtol * np.abs(var_prev)):
            break
    return r, xmmse, var, T


def scamp(W, A, y, sigma2, symbols, Na, Lc, Lr, Mc, Mr, n_iter,
          rtol=1e-5, atol=1e-8):
    """Single-trial SCAMP (`scamp.py:43-68,101-106`)."""
    N = A.shape[1]
    L = Na * Lc
    M = Mc // Na
    xmmse = np.zeros(N, complex)
    psi = np.ones(Lc)
    phi = np.full(Lr, np.inf)
    z = y.copy()
    xmap = None
    T = 0
    for t in range(n_iter):
        gma = W @ psi / Lc
        b = gma / phi
        z = y - A @ xmmse + np.repeat(b, Mr) * z
        phi = sigma2 + gma
        tau = L / (W.T @ (1.0 / phi)) / Mr
        tau_use = np.repeat(tau, Mc)
        phi_use = np.repeat(phi, Mr)
        xmap = xmmse + tau_use * (A.conj().T @ (z / phi_use))
        xmmse, _ = segmented_denoiser(xmap, tau_use, symbols, L, M,
                                      halve_tau=True)
        psi_prev = psi
        psi = 1.0 - (np.abs(xmmse) ** 2).reshape(Lc, Mc).sum(-1) / Na
        T = t + 1
        if np.all(np.abs(psi - psi_prev) <= atol + rtol * np.abs(psi_prev)):
            break
    return xmap, xmmse, psi, T


def dense_toeplitz(h, Lin, Lout, trunc):
    """Reference-style kron assembly (`channel.py:56-72`), h: (Lh, Nr, Nt)."""
    Lh, Nr, Nt = h.shape
    H = np.zeros((Lout * Nr, Lin * Nt), complex)
    for l in range(Lh):
        for c in range(Lin):
            r = c + l
            if trunc == "cyclic":
                r = r % Lin
            elif r >= Lout:
                continue
            H[r * Nr:(r + 1) * Nr, c * Nt:(c + 1) * Nt] += h[l]
    return H


def dense_sparc(h, W, Lin, Lout):
    Lh, Nr, Nt = h.shape
    A = np.zeros((Lout * Nr, Lin * Nt), complex)
    for l in range(Lh):
        for c in range(Lin):
            r = c + l
            if r >= Lout:
                continue
            A[r * Nr:(r + 1) * Nr, c * Nt:(c + 1) * Nt] += np.sqrt(W[r, c]) * h[l]
    return A
