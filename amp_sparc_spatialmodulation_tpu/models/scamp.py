"""Spatially-coupled SPARC AMP (SCAMP) decoder.

Capability parity with the reference ``/root/reference/scamp.py``: AMP on
the base matrix ``W (Lout, Lin)`` + measurement matrix ``A`` with section
variances ``psi (B, Lin)``, residual variances ``phi (B, Lout)`` initialized
to infinity (`scamp.py:21-22`), the Onsager-corrected residual
``z = y - A xmmse + (gma/phi) (x) z`` (`scamp.py:45-48`), effective noise
``tau = L / (W^T (1/phi)) / Mr`` (`scamp.py:52`), the posterior-mean-only
segmented denoiser with ``tau/2`` (`scamp.py:61-68`), section-variance
update ``psi = 1 - sum |xmmse|^2 / Na`` per channel use (`scamp.py:59`),
and ``allclose`` early stop on ``psi`` (`scamp.py:101-106`).

Additionally implements the empirical-residual-variance variant
(``estimate_phi=True``) from the reference's NumPy twin ``estSCAMP``
(`sparc.py:180-204`): ``phi = mean(|z|^2)`` per output block instead of
``sigma2 + gma`` — a capability absent from the reference's torch SCAMP.

TPU-first design: same batched-trial, per-trial-early-stop structure as the
other decoders; the small ``(Lout, Lin)`` base-matrix products and the two
big ``A`` mat-vecs are MXU matmuls over the trial batch; block
``repeat_interleave`` expansions become reshapes/broadcasts.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from ..config import Config
from ..ops import denoise
from .bamp import DecodeResult, _allclose_rows, _freeze


class SCAMPState(NamedTuple):
    xmap: jnp.ndarray    # (B, N) complex
    xmmse: jnp.ndarray   # (B, N) complex
    psi: jnp.ndarray     # (B, Lin) f32 section variances
    phi: jnp.ndarray     # (B, Lout) f32 residual variances
    z: jnp.ndarray       # (B, n) complex
    active: jnp.ndarray
    T: jnp.ndarray
    t: jnp.ndarray


def _expand(v: jnp.ndarray, reps: int) -> jnp.ndarray:
    """``repeat_interleave`` along the last axis (`scamp.py:48,53-54`)."""
    B, L = v.shape
    return jnp.broadcast_to(v[:, :, None], (B, L, reps)).reshape(B, L * reps)


def _fused_whole_decode(fused, s0: "SCAMPState", y, sigma2,
                        cap) -> "SCAMPState":
    """Run the entire SCAMP decode as ONE pallas_call (in-kernel iteration
    loop, per-tile early exit; see :mod:`..ops.pallas.fused_scamp`)."""
    tx, ty = fused._to_x, fused._to_y
    sigma2 = jnp.asarray(sigma2, jnp.float32)
    cap_rem = jnp.maximum(jnp.asarray(cap, jnp.int32) - s0.t, 0)
    act = s0.active.astype(jnp.float32)[:, None]
    T0 = s0.T.astype(jnp.float32)[:, None]
    out = fused.decode_call(
        sigma2, cap_rem, act, T0,
        tx(jnp.real(s0.xmap)), tx(jnp.imag(s0.xmap)),
        tx(jnp.real(s0.xmmse)), tx(jnp.imag(s0.xmmse)),
        s0.psi, s0.phi,
        ty(jnp.real(s0.z)), ty(jnp.imag(s0.z)),
        ty(jnp.real(y)), ty(jnp.imag(y)))
    xmap_re, xmap_im, xn_re, xn_im, psi, phi, zr, zi, act_o, T_o = out
    active = act_o[:, 0] > 0.0
    T = T_o[:, 0].astype(jnp.int32)
    t = jnp.maximum(s0.t, jnp.where(jnp.any(active),
                                    jnp.asarray(cap, jnp.int32), T.max()))
    cx = lambda re, im: lax.complex(fused._from_x(re), fused._from_x(im))
    return SCAMPState(
        xmap=cx(xmap_re, xmap_im), xmmse=cx(xn_re, xn_im),
        psi=psi, phi=phi,
        z=lax.complex(fused._from_y(zr), fused._from_y(zi)),
        active=active, T=T, t=t)


def decode(W: jnp.ndarray, A, y: jnp.ndarray, sigma2,
           cfg: Config, *, estimate_phi: bool = False,
           use_pallas: bool = False,
           state0: SCAMPState | None = None,
           iter_cap: int | None = None,
           return_state: bool = False,
           precision=lax.Precision.HIGHEST):
    """Run SCAMP on a batch of trials sharing one (W, A) realization.

    ``A`` may be the dense matrix or a tap-form operator from
    :mod:`..ops.operators`.

    ``use_pallas`` runs the whole decode as one fused Pallas kernel
    (banded operator, complex segmented/sparc alphabets; falls back to the
    XLA path per-geometry when no trial tile fits VMEM).

    ``state0`` / ``iter_cap`` / ``return_state`` make the decode resumable
    (identical trajectory when split at any cap — the basis of the sweep
    engine's continuation batching, as in :func:`.bamp.decode`).
    """
    from ..ops import operators

    op = operators.as_operator(A, precision=precision)
    B = y.shape[0]
    n, N = op.shape

    whole = None
    if use_pallas:
        import os

        import jax

        from ..ops.pallas.fused_bamp import NoVmemTileError
        from ..ops.pallas.fused_scamp import FusedScampDecode

        if not isinstance(op, operators.BandedOperator):
            raise ValueError("use_pallas requires a BandedOperator")
        if not FusedScampDecode.covers(cfg):
            # Honest knob: never silently run XLA under use_pallas=True.
            raise ValueError(
                "use_pallas: the fused SCAMP kernel covers complex "
                f"segmented/sparc alphabets, not mode={cfg.mode!r} "
                f"is_complex={cfg.is_complex}")
        if os.environ.get("AMP_PALLAS_MODE", "whole") == "whole":
            try:
                whole = FusedScampDecode(
                    op, W, B, interpret=jax.default_backend() != "tpu",
                    symbols=cfg.symbols, M=cfg.M, Na=cfg.Na,
                    estimate_phi=estimate_phi)
            except NoVmemTileError:
                whole = None
    Lc, Lr, Mc, Mr = cfg.Lc, cfg.Lr, cfg.Mc, cfg.Mr
    L = cfg.L
    mm = partial(jnp.matmul, precision=precision)
    # `scamp.py:61-68`; tau/2 is the complex-Gaussian calibration (see
    # bamp.make_denoiser) — unhalved in the real-valued channel mode.
    denoiser = partial(denoise.segmented_posterior,
                       symbols=jnp.asarray(cfg.symbols), L=cfg.L, M=cfg.M,
                       halve_tau=cfg.is_complex, variance=None)

    W = jnp.asarray(W, jnp.float32)
    Wt = W.T                      # psi @ Wt == W @ psi  per trial
    sigma2 = jnp.asarray(sigma2, jnp.float32)

    if state0 is None:
        state0 = SCAMPState(
            xmap=jnp.zeros((B, N), y.dtype),
            xmmse=jnp.zeros((B, N), y.dtype),
            psi=jnp.ones((B, Lc), jnp.float32),
            phi=jnp.full((B, Lr), jnp.inf, jnp.float32),
            z=y,
            active=jnp.ones((B,), bool),
            T=jnp.zeros((B,), jnp.int32),
            t=jnp.zeros((), jnp.int32),
        )
    cap = cfg.N_Layers if iter_cap is None else iter_cap

    if whole is not None:
        st = _fused_whole_decode(whole, state0, y, sigma2, cap)
        result = DecodeResult(xmap=st.xmap, xmmse=st.xmmse,
                              var=1.0 - st.psi, T=st.T)
        if return_state:
            return result, st
        return result

    def cond(st: SCAMPState):
        return jnp.logical_and(st.t < cap, jnp.any(st.active))

    def body(st: SCAMPState) -> SCAMPState:
        gma = mm(st.psi, Wt) / Lc                                # (B, Lr)
        b = gma / st.phi            # 0 on first iter (phi = inf)
        z = (y - op.apply(st.xmmse)
             + _expand(b, Mr).astype(y.dtype) * st.z)            # (B, n)
        if estimate_phi:
            # `sparc.py:199`: empirical residual variance per output block.
            phi = (jnp.abs(z) ** 2).reshape(B, Lr, Mr).mean(axis=-1)
        else:
            phi = sigma2 + gma                                   # `scamp.py:50`
        tau = L / mm(1.0 / phi, W) / Mr                          # (B, Lc)
        tau_use = _expand(tau, Mc)                               # (B, N)
        phi_use = _expand(phi, Mr)                               # (B, n)
        xmap = st.xmmse + tau_use * op.apply_adj(
            (z / phi_use).astype(y.dtype))
        xmmse, _ = denoiser(xmap, tau_use)
        psi = 1.0 - (jnp.abs(xmmse) ** 2).reshape(B, Lc, Mc).sum(-1) / cfg.Na

        converged = _allclose_rows(psi, st.psi)
        return SCAMPState(
            xmap=_freeze(st.active, xmap, st.xmap),
            xmmse=_freeze(st.active, xmmse, st.xmmse),
            psi=_freeze(st.active, psi, st.psi),
            phi=_freeze(st.active, phi, st.phi),
            z=_freeze(st.active, z, st.z),
            active=st.active & ~converged,
            T=jnp.where(st.active, st.t + 1, st.T),
            t=st.t + 1,
        )

    st = lax.while_loop(cond, body, state0)
    result = DecodeResult(xmap=st.xmap, xmmse=st.xmmse,
                          var=1.0 - st.psi, T=st.T)
    if return_state:
        return result, st
    return result
