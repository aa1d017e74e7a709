"""Rangan-style VAMP decoder with damping (the reference's side-by-side
alternative implementation).

Capability parity with ``/root/reference/vamp2.py``: denoiser-first
iteration with damping ``rho = 0.97`` on ``xmmse`` and ``gamma``
(`vamp2.py:29,63,73`), gamma-precision bookkeeping with clips to
``[1e-11, 1e11]`` (`vamp2.py:48-49`), whitened data ``y_tilde = (U^H y)/s``
(`vamp2.py:22`), the segmented denoiser WITHOUT ``tau/2`` and with the
second-moment variance form (`vamp2.py:79-88`), and the LMMSE correction
``r = r_tilde + eta * V((d/mean(d)) (y_tilde - Vh r_tilde))``
(`vamp2.py:77`).  Selectable in the drivers exactly like the reference's
``# from vamp2 import VAMP`` swap (`vamp_model.py:13`).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from ..config import Config
from ..ops import denoise
from .bamp import DecodeResult, _allclose_rows, _freeze
from .vamp import SVD

_VAR_MIN = 1e-11        # `vamp2.py:48-49`
_VAR_MAX = 1e11


class VAMP2State(NamedTuple):
    r: jnp.ndarray          # (B, N) complex
    gamma: jnp.ndarray      # (B, 1) f32
    var: jnp.ndarray        # (B, N) f32
    xmmse: jnp.ndarray      # (B, N) complex
    active: jnp.ndarray
    T: jnp.ndarray
    t: jnp.ndarray


def make_denoiser(cfg: Config):
    symbols = jnp.asarray(cfg.symbols)
    if cfg.mode in ("segmented", "sparc"):
        return partial(denoise.segmented_posterior, symbols=symbols,
                       L=cfg.L, M=cfg.M, halve_tau=False,
                       variance="second_moment")
    # `vamp2.py:46` uses Shrink(config, 'bayes'); completed with variance.
    return partial(denoise.bernoulli_mixture_posterior, symbols=symbols,
                   Ps=cfg.Ps, P0=cfg.P0)


def decode(dec: SVD, y: jnp.ndarray, sigma2, cfg: Config, *,
           damping: float = 0.97,
           state0: VAMP2State | None = None,
           iter_cap: int | None = None,
           return_state: bool = False,
           precision=lax.Precision.HIGHEST):
    """Run damped Rangan VAMP on a batch of trials sharing one SVD.

    ``state0`` / ``iter_cap`` / ``return_state`` make the decode resumable
    (identical trajectory when split at any cap)."""
    B = y.shape[0]
    U, s, Vh = dec
    p, N = Vh.shape
    mm = partial(jnp.matmul, precision=precision)
    denoiser = make_denoiser(cfg)
    rho = damping

    s2 = (s ** 2)[None, :]
    eta = N / p                                     # `vamp2.py:26` (N/p!)
    noise_var = jnp.asarray(sigma2, jnp.float32)
    y_tilde = mm(y, jnp.conj(U)) / s[None, :].astype(y.dtype)  # `vamp2.py:22`
    Vh_t, Vh_c = Vh.T, jnp.conj(Vh)

    if state0 is None:
        state0 = VAMP2State(
            r=jnp.zeros((B, N), y.dtype),
            gamma=jnp.ones((B, 1), jnp.float32),
            var=jnp.ones((B, N), jnp.float32),
            xmmse=jnp.zeros((B, N), y.dtype),
            active=jnp.ones((B,), bool),
            T=jnp.zeros((B,), jnp.int32),
            t=jnp.zeros((), jnp.int32),
        )
    cap = cfg.N_Layers if iter_cap is None else iter_cap

    def cond(st: VAMP2State):
        return jnp.logical_and(st.t < cap, jnp.any(st.active))

    def body(st: VAMP2State) -> VAMP2State:
        # Denoiser + damping (`vamp2.py:62-63`).
        xmmse_new, var = denoiser(st.r, st.gamma)
        xmmse = rho * xmmse_new + (1.0 - rho) * st.xmmse
        alpha = var.mean(axis=1, keepdims=True) * st.gamma       # (B, 1)

        r_tilde = ((xmmse - alpha.astype(y.dtype) * st.r)
                   / (1.0 - alpha))                              # `vamp2.py:66`
        gamma_tilde = jnp.clip(st.gamma * (1.0 - alpha) / alpha,
                               _VAR_MIN, _VAR_MAX)

        d = s2 / (s2 + noise_var * gamma_tilde)                  # (B, p)
        d_mean = d.mean(axis=1, keepdims=True)
        gamma_new = gamma_tilde * d_mean / (eta - d_mean)        # `vamp2.py:72`
        gamma = rho * gamma_new + (1.0 - rho) * st.gamma

        w = (d / d_mean).astype(y.dtype) * (y_tilde - mm(r_tilde, Vh_t))
        r = r_tilde + eta * mm(w, Vh_c)                          # `vamp2.py:77`

        converged = _allclose_rows(var, st.var)
        return VAMP2State(
            r=_freeze(st.active, r, st.r),
            gamma=_freeze(st.active, gamma, st.gamma),
            var=_freeze(st.active, var, st.var),
            xmmse=_freeze(st.active, xmmse, st.xmmse),
            active=st.active & ~converged,
            T=jnp.where(st.active, st.t + 1, st.T),
            t=st.t + 1,
        )

    st = lax.while_loop(cond, body, state0)
    result = DecodeResult(xmap=st.r, xmmse=st.xmmse, var=st.var, T=st.T)
    if return_state:
        return result, st
    return result
