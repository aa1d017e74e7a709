"""Sparse spatial-modulation message generation — on device.

Capability parity with the reference ``Data`` (``/root/reference/data.py``):

* ``segmented`` (also used for ``sparc`` mode, `data.py:39-43`): ``Nt`` is
  split into ``Na`` segments of ``M = Nt/Na``; each of the ``L = Na*Lin``
  segments activates one uniformly-random antenna carrying one
  uniformly-random symbol (`data.py:74-91`).
* ``random``: each channel use activates ``Na`` of ``Nt`` antennas without
  replacement, all carrying the SAME uniformly-random symbol
  (`data.py:55-72` — note `mod_index` is a scalar per channel use).

TPU-first design: the reference's Python double loop over ``(B, L)`` with
``np.random.choice`` is replaced by fully vectorized ``jax.random`` draws —
uniform integers for segment/symbol choice, and the top-``Na``-of-uniform
trick for sampling antenna subsets without replacement.  The dense ``x`` is
built by one-hot scatter.  Besides ``x``, structured ground truth (antenna
indices, symbol indices, Gray labels, flat nonzero positions) is returned so
the metrics layer never has to re-derive them from the dense vector.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config


class Message(NamedTuple):
    """Ground truth for one batch of frames.

    Attributes:
        x:    dense transmit vector, shape (B, N) with N = Lin*Nt, flattened
              channel-use-major (flat index = l*Nt + antenna), matching the
              reference's ``(B, Lin*Nt, 1)`` layout (`data.py:69,88`).
        ant:  active antenna indices.  segmented/sparc: (B, L) in [0, M);
              random: (B, Lin, Na) sorted ascending in [0, Nt).
        sym:  symbol table indices.  segmented/sparc: (B, L); random: (B, Lin)
              (one shared symbol per channel use).
        gray: Gray labels of the active symbols, same shape as ``flat``.
        flat: flat indices of nonzeros into ``x.ravel()`` (global over the
              batch), sorted ascending per frame — the reference's
              ``x.ravel().nonzero()[0]`` (`data.py:70,89`).
    """

    x: jnp.ndarray
    ant: jnp.ndarray
    sym: jnp.ndarray
    gray: jnp.ndarray
    flat: jnp.ndarray


def _segmented(key, cfg: Config, batch: int) -> Message:
    B, L, M, K = batch, cfg.L, cfg.M, cfg.K
    k_ant, k_sym = jax.random.split(key)
    ant = jax.random.randint(k_ant, (B, L), 0, M, dtype=jnp.int32)
    sym = jax.random.randint(k_sym, (B, L), 0, K, dtype=jnp.int32)
    symbols = jnp.asarray(cfg.symbols)          # (K,) complex64
    gray_tab = jnp.asarray(cfg.gray)            # (K,) int32
    onehot = jax.nn.one_hot(ant, M, dtype=jnp.float32)       # (B, L, M)
    vals = symbols[sym]                                       # (B, L)
    if not cfg.is_complex:
        vals = vals.real                        # real-channel mode
    x = (onehot.astype(vals.dtype) * vals[..., None]).reshape(B, L * M)
    gray = gray_tab[sym]                                      # (B, L)
    base = (jnp.arange(B, dtype=jnp.int32)[:, None] * L
            + jnp.arange(L, dtype=jnp.int32)[None, :]) * M
    flat = base + ant                                         # (B, L) sorted
    return Message(x=x, ant=ant, sym=sym, gray=gray, flat=flat)


def _random(key, cfg: Config, batch: int) -> Message:
    B, Lin, Nt, Na, K = batch, cfg.Lin, cfg.Nt, cfg.Na, cfg.K
    k_set, k_sym = jax.random.split(key)
    # Uniform Na-subset of Nt per channel use: indices of the Na largest of
    # Nt i.i.d. uniforms (exchangeability => uniform over subsets).
    scores = jax.random.uniform(k_set, (B, Lin, Nt))
    _, idx = jax.lax.top_k(scores, Na)                        # (B, Lin, Na)
    ant = jnp.sort(idx.astype(jnp.int32), axis=-1)
    sym = jax.random.randint(k_sym, (B, Lin), 0, K, dtype=jnp.int32)
    symbols = jnp.asarray(cfg.symbols)
    gray_tab = jnp.asarray(cfg.gray)
    mask = jnp.zeros((B, Lin, Nt), dtype=jnp.float32)
    mask = jax.vmap(jax.vmap(lambda m, i: m.at[i].set(1.0)))(mask, ant)
    vals = symbols[sym]                                       # (B, Lin)
    if not cfg.is_complex:
        vals = vals.real
    x = (mask.astype(vals.dtype) * vals[..., None]).reshape(B, Lin * Nt)
    gray = jnp.broadcast_to(gray_tab[sym][..., None], ant.shape)
    base = (jnp.arange(B, dtype=jnp.int32)[:, None] * Lin
            + jnp.arange(Lin, dtype=jnp.int32)[None, :]) * Nt
    flat = base[..., None] + ant                              # (B, Lin, Na)
    return Message(x=x, ant=ant, sym=sym, gray=gray, flat=flat)


def generate_message(key, cfg: Config, batch: int | None = None) -> Message:
    """Draw one batch of sparse spatial-modulation frames (`data.py:45-53`)."""
    B = cfg.B if batch is None else batch
    if cfg.mode in ("segmented", "sparc"):
        return _segmented(key, cfg, B)
    return _random(key, cfg, B)
