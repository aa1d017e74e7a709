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


def _fused_whole_decode(fused, s0: "VAMP2State", y_tilde, s2_row, eta,
                        noise_var, cap) -> "VAMP2State":
    """Run the entire vamp2 decode as ONE pallas_call (in-kernel iteration
    loop; see :mod:`..ops.pallas.fused_vamp2`)."""
    cap_rem = jnp.maximum(jnp.asarray(cap, jnp.int32) - s0.t, 0)
    act = s0.active.astype(jnp.float32)[:, None]
    T0 = s0.T.astype(jnp.float32)[:, None]
    out = fused.decode_call(
        noise_var, cap_rem, act, T0,
        jnp.real(s0.r), jnp.imag(s0.r), s0.gamma, s0.var,
        jnp.real(s0.xmmse), jnp.imag(s0.xmmse),
        jnp.real(y_tilde), jnp.imag(y_tilde), s2_row, eta)
    r_re, r_im, gamma, var, xm_re, xm_im, act_o, T_o = out
    active = act_o[:, 0] > 0.0
    T = T_o[:, 0].astype(jnp.int32)
    t = jnp.maximum(s0.t, jnp.where(jnp.any(active),
                                    jnp.asarray(cap, jnp.int32), T.max()))
    return VAMP2State(
        r=lax.complex(r_re, r_im), gamma=gamma, var=var,
        xmmse=lax.complex(xm_re, xm_im), active=active, T=T, t=t)


def decode(dec: SVD, y: jnp.ndarray, sigma2, cfg: Config, *,
           damping: float = 0.97,
           use_pallas: bool = False,
           state0: VAMP2State | None = None,
           iter_cap: int | None = None,
           return_state: bool = False,
           precision=lax.Precision.HIGHEST):
    """Run damped Rangan VAMP on a batch of trials sharing one SVD.

    ``use_pallas`` runs the whole decode as one fused Pallas kernel with
    the ``Vh`` tap combos VMEM-resident (complex segmented/sparc
    alphabets; the whitening stays outside — it needs the direct SVD).

    ``state0`` / ``iter_cap`` / ``return_state`` make the decode resumable
    (identical trajectory when split at any cap)."""
    B = y.shape[0]
    U, s, Vh = dec
    p, N = Vh.shape
    mm = partial(jnp.matmul, precision=precision)
    denoiser = make_denoiser(cfg)
    rho = damping

    whole = None
    if use_pallas:
        import os

        import jax

        from ..ops.pallas.fused_bamp import NoVmemTileError
        from ..ops.pallas.fused_vamp2 import FusedVamp2Decode

        if not FusedVamp2Decode.covers(cfg):
            # Honest knob: never silently run XLA under use_pallas=True.
            raise ValueError(
                "use_pallas: the fused vamp2 kernel covers complex "
                f"segmented/sparc alphabets, not mode={cfg.mode!r} "
                f"is_complex={cfg.is_complex}")
        if os.environ.get("AMP_PALLAS_MODE", "whole") == "whole":
            try:
                whole = FusedVamp2Decode(
                    Vh, B, interpret=jax.default_backend() != "tpu",
                    symbols=cfg.symbols, M=cfg.M, precision=precision,
                    damping=rho)
            except NoVmemTileError:
                whole = None

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

    if whole is not None:
        st = _fused_whole_decode(whole, state0, y_tilde, s2, eta,
                                 noise_var, cap)
        result = DecodeResult(xmap=st.r, xmmse=st.xmmse, var=st.var,
                              T=st.T)
        if return_state:
            return result, st
        return result

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
