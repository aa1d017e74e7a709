"""Frequency-selective Rayleigh MIMO channel generation — on device.

Capability parity with the reference ``Channel`` (``/root/reference/channel.py``):

* ``generate_channel``  — block-Toeplitz ``H = sum_l kron(eye(Lin,Lin,-l), h_l)``
  with ``trunc`` / ``tail`` / ``cyclic`` truncation (`channel.py:40-73`).
* ``generate_as_sparc`` — SPARC base matrix ``W`` and measurement matrix
  ``A = sum_l kron(eye(Lout,Lin,-l)*sqrt(W), h_l)`` (`channel.py:75-95`).
* ``generate_as_random`` — i.i.d. Gaussian matrix (`channel.py:97-101`).
* ``awgn``              — complex AWGN with ``sigma2 = (Na/Nr)/SNR``
  (`channel.py:103-116`).

TPU-first design: everything runs under ``jit`` with ``jax.random`` keys
(counter-based, reproducible, vectorizable) instead of host-side NumPy + H2D
copies.  Matrices are assembled as ``(Lout, Lin, Nr, Nt)`` block tensors via
static scatter-adds over the ``Lh`` taps (``Lh`` is a small static constant),
then reshaped — no Python ``kron`` loops, no host transfers.  The tap tensor
``h`` is also the input of the banded (tap-form) operators in
:mod:`..ops.banded`, which never materialize the dense matrix.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config


def _crandn(key, shape, is_complex: bool):
    """Standard normal per real dimension: CN(0, 2) complex / N(0, 1) real.

    Callers apply their own per-dimension scaling, matching the reference's
    ``(randn + 1j * randn) * scale`` pattern.
    """
    if is_complex:
        kr, ki = jax.random.split(key)
        return (jax.random.normal(kr, shape, dtype=jnp.float32)
                + 1j * jax.random.normal(ki, shape, dtype=jnp.float32))
    return jax.random.normal(key, shape, dtype=jnp.float32)


def sample_taps(key, cfg: Config) -> jnp.ndarray:
    """Channel taps ``h[l] ~ CN(0, pdp[l] * Lout / (Nr * Lin))``.

    Returns shape ``(Lh, Nr, Nt)``; scaling per `channel.py:53-55`.
    In the real-valued mode the same total per-tap variance is kept.
    """
    scale = np.sqrt(cfg.pdp * cfg.Lout / cfg.Nr / cfg.Lin
                    / (2.0 if cfg.is_complex else 1.0)).astype(np.float32)
    h = _crandn(key, (cfg.Lh, cfg.Nr, cfg.Nt), cfg.is_complex)
    return h * scale[:, None, None]


def sample_sparc_taps(key, cfg: Config) -> jnp.ndarray:
    """SPARC-normalized taps ``h ~ CN(0, 1/(Na*Lin))`` (`channel.py:85-87`)."""
    scale = 1.0 / np.sqrt((2.0 if cfg.is_complex else 1.0) * cfg.Na * cfg.Lin)
    h = _crandn(key, (cfg.Lh, cfg.Nr, cfg.Nt), cfg.is_complex)
    return h * np.float32(scale)


def _band_indices(cfg: Config, l: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static (rows, cols) block coordinates of tap ``l`` in the operator.

    trunc:  block (c+l, c) kept only when c+l < Lin   (`channel.py:56-58`)
    tail:   all Lin blocks present, Lout = Lin+Lh-1   (`channel.py:60-66`)
    cyclic: block ((c+l) mod Lin, c)                  (`channel.py:68-72`)
    """
    cols = np.arange(cfg.Lin)
    rows = cols + l
    if cfg.trunc == "cyclic":
        rows = rows % cfg.Lin
    else:
        keep = rows < cfg.Lout
        rows, cols = rows[keep], cols[keep]
    return rows, cols


def _assemble(blocks_fn, cfg: Config, dtype) -> jnp.ndarray:
    """Assemble a dense ``(Nr*Lout, Nt*Lin)`` matrix from per-tap blocks.

    ``blocks_fn(l, rows, cols)`` returns the ``(len(rows), Nr, Nt)`` (or
    broadcastable) block values for tap ``l``.
    """
    blocks = jnp.zeros((cfg.Lout, cfg.Lin, cfg.Nr, cfg.Nt), dtype=dtype)
    for l in range(cfg.Lh):
        rows, cols = _band_indices(cfg, l)
        blocks = blocks.at[rows, cols].add(blocks_fn(l, rows, cols))
    return blocks.transpose(0, 2, 1, 3).reshape(cfg.Nr * cfg.Lout,
                                                cfg.Nt * cfg.Lin)


def dense_from_taps(h: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """Dense block-Toeplitz ``H`` from taps (`channel.py:56-72`)."""
    return _assemble(lambda l, r, c: h[l][None], cfg, h.dtype)


def generate_channel(key, cfg: Config) -> jnp.ndarray:
    """Dense frequency-selective MIMO matrix ``H`` (`channel.py:40-73`)."""
    return dense_from_taps(sample_taps(key, cfg), cfg)


def base_matrix(cfg: Config) -> np.ndarray:
    """SPARC base matrix ``W`` (Lout, Lin), normalized so its mean equals
    ``Na/Nr`` (`channel.py:80-83`).  Deterministic → plain NumPy."""
    W = np.zeros((cfg.Lout, cfg.Lin))
    for l in range(cfg.Lh):
        W += np.eye(cfg.Lout, cfg.Lin, -l) * cfg.pdp[l]
    W = W / W.mean() * cfg.Na / cfg.Nr
    return W.astype(np.float32)


def dense_sparc_from_taps(h: jnp.ndarray, W: np.ndarray,
                          cfg: Config) -> jnp.ndarray:
    """Dense SPARC measurement matrix ``A`` from taps + base matrix
    (`channel.py:89-92`): block ``(c+l, c)`` equals ``sqrt(W[c+l,c]) h_l``."""
    sqrtW = jnp.asarray(np.sqrt(W), dtype=jnp.float32)

    def blk(l, rows, cols):
        return sqrtW[rows, cols][:, None, None] * h[l][None]

    return _assemble(blk, cfg, h.dtype)


def generate_as_sparc(key, cfg: Config) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(W, A) pair (`channel.py:75-95`)."""
    W = base_matrix(cfg)
    h = sample_sparc_taps(key, cfg)
    return jnp.asarray(W), dense_sparc_from_taps(h, W, cfg)


def generate_as_random(key, cfg: Config) -> jnp.ndarray:
    """i.i.d. ``CN(0, 1/(Lin*Nr))`` matrix (`channel.py:97-101`)."""
    scale = 1.0 / np.sqrt((2.0 if cfg.is_complex else 1.0) * cfg.Lin * cfg.Nr)
    H = _crandn(key, (cfg.Nr * cfg.Lout, cfg.Nt * cfg.Lin), cfg.is_complex)
    return H * np.float32(scale)


def awgn(key, cfg: Config, snr, batch: int | None = None) -> jnp.ndarray:
    """AWGN with total variance ``sigma2 = (Na/Nr)/SNR`` per entry
    (`channel.py:103-116`).  Returns shape ``(batch, Nr*Lout)``."""
    B = cfg.B if batch is None else batch
    scale = jnp.sqrt(jnp.asarray(cfg.Na / cfg.Nr / snr
                                 / (2.0 if cfg.is_complex else 1.0),
                                 dtype=jnp.float32))
    w = _crandn(key, (B, cfg.Nr * cfg.Lout), cfg.is_complex)
    return w * scale
