"""Measurement-operator abstraction: dense and banded (tap-form) forms.

The decoders need exactly four linear maps per AMP iteration
(`bamp.py:59-63`):

    apply(x)      = H @ x          (B, N) -> (B, n)
    apply_adj(r)  = H^H @ r        (B, n) -> (B, N)
    apply_abs2(v) = |H|^2 @ v      (B, N) -> (B, n)   real
    apply_abs2T(u)= |H|^2^T @ u    (B, n) -> (B, N)   real

``DenseOperator`` wraps the materialized matrix (needed for VAMP's SVD and
for exact parity tests).  ``BandedOperator`` exploits the block-banded
structure of the frequency-selective channel (`channel.py:56-58,89-92`):
block ``(c+l, c)`` of the operator is ``gains[l, c] * h_l`` (gains are ones
for the Toeplitz form, ``sqrt(W[c+l, c])`` for the SPARC form), so every
map is ``Lh`` batched ``(Nr, Nt)`` matmuls plus a shifted accumulation —
``~Lh/Lout`` of the dense FLOPs and ``O(Lh*Nr*Nt)`` instead of ``O(n*N)``
memory.  This is what makes the massive-MIMO config (Nt=1344, Lin=32:
dense A is ~0.9 GB complex64, SURVEY §7) cheap: the taps are ~4.6 MB.

TPU mapping: the einsum over taps is a batched MXU matmul with the trial
batch as the contraction-free major dimension; the shift-accumulate is a
static unrolled loop over ``Lh`` (small) that XLA fuses into adds.
Operators are plain Python objects constructed *inside* a trace (their
arrays become loop constants hoisted out of ``while_loop`` bodies) — they
are not pytrees and must not cross jit boundaries.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import Config
from . import channel as channel_ops


class DenseOperator:
    """Materialized (n, N) measurement matrix with precomputed constants."""

    def __init__(self, H, precision=lax.Precision.HIGHEST):
        self.H = H
        self.Ht = H.T
        self.Hc = jnp.conj(H)
        self.abs2 = jnp.abs(H) ** 2
        self.abs2T = self.abs2.T
        self.precision = precision

    @property
    def shape(self):
        return self.H.shape

    def apply(self, x):
        return jnp.matmul(x, self.Ht, precision=self.precision)

    def apply_adj(self, r):
        return jnp.matmul(r, self.Hc, precision=self.precision)

    def apply_abs2(self, v):
        return jnp.matmul(v, self.abs2T, precision=self.precision)

    def apply_abs2T(self, u):
        return jnp.matmul(u, self.abs2, precision=self.precision)


class BandedOperator:
    """Tap-form block-banded operator.

    Args:
        h: (Lh, Nr, Nt) channel taps.
        gains: (Lh, Lin) per-(tap, column-block) gains; block (c+l, c) of
            the dense operator equals ``gains[l, c] * h[l]``.
        Lin, Lout, trunc: block geometry (`channel.py:60-72`).
    """

    def __init__(self, h, gains, Lin: int, Lout: int, trunc: str,
                 precision=lax.Precision.HIGHEST):
        self.h = h
        self.abs_h2 = jnp.abs(h) ** 2
        self.gains = gains
        self.gains2 = gains ** 2
        self.Lin, self.Lout, self.trunc = Lin, Lout, trunc
        self.Lh, self.Nr, self.Nt = h.shape
        self.precision = precision
        # Tap-stacked forms: one (Nt, Lh*Nr) matmul instead of Lh small
        # (Nt, Nr) ones — Nr alone underfills the MXU's 128 lanes.
        self.h_stack = h.transpose(2, 0, 1).reshape(self.Nt,
                                                    self.Lh * self.Nr)
        self.abs_h2_stack = jnp.abs(self.h_stack) ** 2

    @property
    def shape(self):
        return (self.Nr * self.Lout, self.Nt * self.Lin)

    def _rows(self, l):
        """Static (row_block, col_block) index arrays for tap ``l``."""
        cols = np.arange(self.Lin)
        rows = cols + l
        if self.trunc == "cyclic":
            rows = rows % self.Lin
        else:
            keep = rows < self.Lout
            rows, cols = rows[keep], cols[keep]
        return rows, cols

    def _fwd(self, x, taps_stack, gains):
        """``y[r] = sum_l gains[l, r-l] * taps[l] @ x[r-l]``.

        One ``(B*Lin, Nt) @ (Nt, Lh*Nr)`` MXU matmul computes every
        per-(column-block, tap) product; the gain-weighted shift-accumulate
        over ``Lh`` is a static unrolled add chain XLA fuses.
        """
        B = x.shape[0]
        xb = x.reshape(B * self.Lin, self.Nt)
        # P[b, c, l, m] = sum_n taps[l, m, n] * x[b, c, n]
        P = jnp.matmul(xb, taps_stack, precision=self.precision).reshape(
            B, self.Lin, self.Lh, self.Nr)
        if self.trunc == "cyclic":
            # wrapped rows need the general scatter
            y = jnp.zeros((B, self.Lout, self.Nr), P.dtype)
            for l in range(self.Lh):
                rows, cols = self._rows(l)
                contrib = gains[l, cols][None, :, None] * P[:, cols, l]
                y = y.at[:, rows].add(contrib)
            return y.reshape(B, self.Lout * self.Nr)
        # tail/trunc rows are contiguous: build each tap's contribution as
        # a zero-padded full-height plane and ADD — XLA fuses the Lh adds
        # into one elementwise pass (the index-array scatter form blew the
        # scoped-VMEM stack at large batches, e.g. QPSK res=32768, and a
        # dynamic-update-slice chain serialized ~7% of the flagship
        # realization).
        z = lambda n: jnp.zeros((B, n, self.Nr), P.dtype)
        acc = None
        for l in range(self.Lh):
            rows, cols = self._rows(l)
            r0, c0, k = int(rows[0]), int(cols[0]), len(cols)
            contrib = (gains[l, c0:c0 + k][None, :, None]
                       * P[:, c0:c0 + k, l])
            parts = []
            if r0:
                parts.append(z(r0))
            parts.append(contrib)
            if self.Lout - r0 - k:
                parts.append(z(self.Lout - r0 - k))
            plane = (parts[0] if len(parts) == 1
                     else jnp.concatenate(parts, axis=1))
            acc = plane if acc is None else acc + plane
        return acc.reshape(B, self.Lout * self.Nr)

    def _bwd(self, z, taps_stack, gains):
        """Adjoint of :meth:`_fwd` (conjugate taps)."""
        B = z.shape[0]
        zb = z.reshape(B, self.Lout, self.Nr)
        if self.trunc == "cyclic":
            Zl = jnp.zeros((B, self.Lin, self.Lh, self.Nr), zb.dtype)
            for l in range(self.Lh):
                rows, cols = self._rows(l)
                Zl = Zl.at[:, cols, l].set(gains[l, cols][None, :, None]
                                           * zb[:, rows])
        else:
            # contiguous ranges: per-tap zero-padded slices STACKED on
            # the tap axis — no scatter, no update-slice chain (see _fwd)
            zpad = lambda n: jnp.zeros((B, n, self.Nr), zb.dtype)
            planes = []
            for l in range(self.Lh):
                rows, cols = self._rows(l)
                r0, c0, k = int(rows[0]), int(cols[0]), len(cols)
                g = gains[l, c0:c0 + k][None, :, None] * zb[:, r0:r0 + k]
                parts = []
                if c0:
                    parts.append(zpad(c0))
                parts.append(g)
                if self.Lin - c0 - k:
                    parts.append(zpad(self.Lin - c0 - k))
                planes.append(parts[0] if len(parts) == 1
                              else jnp.concatenate(parts, axis=1))
            Zl = jnp.stack(planes, axis=2)    # (B, Lin, Lh, Nr)
        r = jnp.matmul(Zl.reshape(B * self.Lin, self.Lh * self.Nr),
                       jnp.conj(taps_stack).T, precision=self.precision)
        return r.reshape(B, self.Lin * self.Nt)

    def apply(self, x):
        return self._fwd(x, self.h_stack, self.gains)

    def apply_adj(self, r):
        return self._bwd(r, self.h_stack, self.gains)

    def apply_abs2(self, v):
        return self._fwd(v, self.abs_h2_stack, self.gains2).real

    def apply_abs2T(self, u):
        return self._bwd(u, self.abs_h2_stack, self.gains2).real

    def densify(self) -> jnp.ndarray:
        """Materialize the dense matrix (tests / SVD path)."""
        blocks = jnp.zeros((self.Lout, self.Lin, self.Nr, self.Nt),
                           self.h.dtype)
        for l in range(self.Lh):
            rows, cols = self._rows(l)
            blocks = blocks.at[rows, cols].add(
                self.gains[l, cols][:, None, None] * self.h[l][None])
        return blocks.transpose(0, 2, 1, 3).reshape(self.Nr * self.Lout,
                                                    self.Nt * self.Lin)


def as_operator(H, precision=lax.Precision.HIGHEST):
    """Wrap a raw matrix; pass operators through unchanged."""
    if hasattr(H, "apply_abs2T"):
        return H
    return DenseOperator(H, precision=precision)


def banded_toeplitz(key, cfg: Config,
                    precision=lax.Precision.HIGHEST) -> BandedOperator:
    """Tap-form equivalent of ``generate_channel`` (`channel.py:40-73`)."""
    h = channel_ops.sample_taps(key, cfg)
    # numpy (not jnp): gains are cfg-deterministic, and the Pallas kernels
    # inspect them host-side to fold per-tap-constant gains into the tap
    # planes (fused_bamp._gains_per_tap).
    gains = np.ones((cfg.Lh, cfg.Lin), np.float32)
    return BandedOperator(h=h, gains=gains, Lin=cfg.Lin, Lout=cfg.Lout,
                          trunc=cfg.trunc, precision=precision)


def sparc_gains(cfg: Config, W: np.ndarray) -> np.ndarray:
    """(Lh, Lin) gains ``sqrt(W[c+l, c])`` of the SPARC operator."""
    cols = np.arange(cfg.Lin)
    gains = np.zeros((cfg.Lh, cfg.Lin), np.float32)
    for l in range(cfg.Lh):
        rows = cols + l
        keep = rows < cfg.Lout
        gains[l, cols[keep]] = np.sqrt(W[rows[keep], cols[keep]])
    return gains


def banded_sparc(key, cfg: Config, precision=lax.Precision.HIGHEST):
    """Tap-form equivalent of ``generate_as_sparc`` (`channel.py:75-95`).

    Returns ``(W, op)`` with the base matrix for SCAMP bookkeeping.
    """
    W = channel_ops.base_matrix(cfg)
    h = channel_ops.sample_sparc_taps(key, cfg)
    # gains stay numpy (cfg-deterministic) so the Pallas kernels can fold
    # per-tap-constant gains host-side (fused_bamp._gains_per_tap).
    op = BandedOperator(h=h, gains=sparc_gains(cfg, W),
                        Lin=cfg.Lin, Lout=cfg.Lout, trunc=cfg.trunc,
                        precision=precision)
    return jnp.asarray(W), op
